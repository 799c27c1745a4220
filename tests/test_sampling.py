"""Sampling (serve/sampling.py) and its wiring into both engines.

The reference samples via HF GenerationMixin (ref: examples/test_model.py:51);
here sampling is a pure jittable function with per-row parameters so one
compiled decode step serves a mixed greedy/sampled continuous batch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.serve.sampling import sample, sample_per_row


def _logits(B=4, V=64, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=(B, V)) * 3,
                       jnp.float32)


class TestSampleMath:
    def test_temperature_zero_is_argmax(self):
        lg = _logits()
        got = sample(lg, jax.random.PRNGKey(0), temperature=0.0)
        np.testing.assert_array_equal(got, jnp.argmax(lg, -1))

    def test_top_k_1_is_argmax_any_temperature(self):
        lg = _logits()
        got = sample(lg, jax.random.PRNGKey(3), temperature=5.0, top_k=1)
        np.testing.assert_array_equal(got, jnp.argmax(lg, -1))

    def test_tiny_top_p_is_argmax(self):
        lg = _logits()
        got = sample(lg, jax.random.PRNGKey(3), temperature=5.0, top_p=1e-9)
        np.testing.assert_array_equal(got, jnp.argmax(lg, -1))

    def test_top_k_restricts_support(self):
        lg = _logits(B=1, V=32)
        top4 = set(np.asarray(jnp.argsort(lg[0])[-4:]).tolist())
        draws = {int(sample(lg, jax.random.PRNGKey(i), temperature=2.0,
                            top_k=4)[0]) for i in range(64)}
        assert draws <= top4
        assert len(draws) > 1  # actually samples, not greedy

    def test_top_p_nucleus_semantics(self):
        # probs [0.6, 0.3, 0.1]: nucleus at p=0.5 = {tok0} (first token always
        # kept); at p=0.65 = {tok0, tok1} (the crossing token is included)
        lg = jnp.log(jnp.asarray([[0.6, 0.3, 0.1]], jnp.float32))
        d_half = {int(sample(lg, jax.random.PRNGKey(i), temperature=1.0,
                             top_p=0.5)[0]) for i in range(32)}
        assert d_half == {0}
        d_65 = {int(sample(lg, jax.random.PRNGKey(i), temperature=1.0,
                           top_p=0.65)[0]) for i in range(64)}
        assert d_65 == {0, 1}

    def test_per_row_mixed_greedy_and_sampled(self):
        lg = _logits(B=3, V=32)
        temps = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
        topks = jnp.asarray([0, 1, 0], jnp.int32)
        topps = jnp.ones((3,), jnp.float32)
        got = sample_per_row(lg, jax.random.PRNGKey(0), temps, topks, topps)
        # row 1 has top_k=1 so ALL rows must equal argmax here
        np.testing.assert_array_equal(got, jnp.argmax(lg, -1))

    def test_per_row_matches_static(self):
        lg = _logits(B=4, V=48, seed=2)
        key = jax.random.PRNGKey(7)
        a = sample(lg, key, temperature=1.3, top_k=8, top_p=0.9)
        b = sample_per_row(lg, key,
                           jnp.full((4,), 1.3, jnp.float32),
                           jnp.full((4,), 8, jnp.int32),
                           jnp.full((4,), 0.9, jnp.float32))
        np.testing.assert_array_equal(a, b)

    def test_deterministic_given_key(self):
        lg = _logits(B=2, V=128, seed=5)
        k = jax.random.PRNGKey(11)
        a = sample(lg, k, temperature=0.8, top_p=0.95)
        b = sample(lg, k, temperature=0.8, top_p=0.95)
        np.testing.assert_array_equal(a, b)


# -- engine wiring -----------------------------------------------------------

def _tiny():
    from autosmoothquant_tpu.models import llama as L

    cfg = L.LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, max_position_embeddings=128)
    return L, cfg, L.init_params(cfg, jax.random.PRNGKey(0))


def _prompts(n=3, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(1, 128, size=5 + 3 * i).tolist() for i in range(n)]


class TestEngineSampling:
    def test_top_p_one_hot_equals_greedy(self):
        from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

        L, cfg, params = _tiny()
        eng = Engine(L, params, cfg, max_batch=2, max_seq=64,
                     kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        ps = _prompts(2)
        greedy = eng.generate(ps, GenerationConfig(max_new_tokens=8))
        forced = eng.generate(ps, GenerationConfig(
            max_new_tokens=8, temperature=1.0, top_p=1e-9))
        assert greedy == forced

    def test_sampled_deterministic_per_seed(self):
        from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

        L, cfg, params = _tiny()
        eng = Engine(L, params, cfg, max_batch=1, max_seq=64,
                     kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        gc = GenerationConfig(max_new_tokens=8, temperature=1.0, top_k=20,
                              top_p=0.9)
        a = eng.generate(_prompts(1), gc, seed=123)
        b = eng.generate(_prompts(1), gc, seed=123)
        c = eng.generate(_prompts(1), gc, seed=124)
        assert a == b
        assert a != c  # 8 tokens of top-20 sampling colliding is ~impossible


class TestContinuousSampling:
    def test_mixed_batch_forced_sampling_equals_greedy(self):
        """top_k=1 'sampled' requests interleaved with greedy ones must
        reproduce the all-greedy engine's outputs exactly (same compiled
        step serves both row kinds)."""
        from autosmoothquant_tpu.serve.batching import ContinuousEngine

        L, cfg, params = _tiny()
        ps = _prompts(4, seed=1)
        plain = ContinuousEngine(L, params, cfg, max_batch=4, max_seq=64,
                                 kv_dtype=jnp.float32,
                                 compute_dtype=jnp.float32)
        for i, p in enumerate(ps):
            plain.submit(i, p, max_new_tokens=6)
        want = plain.run()

        mixed = ContinuousEngine(L, params, cfg, max_batch=4, max_seq=64,
                                 kv_dtype=jnp.float32,
                                 compute_dtype=jnp.float32)
        for i, p in enumerate(ps):
            if i % 2:
                mixed.submit(i, p, max_new_tokens=6, temperature=1.0, top_k=1)
            else:
                mixed.submit(i, p, max_new_tokens=6)
        got = mixed.run()
        assert got == want

    def test_seeded_run_reproducible(self):
        from autosmoothquant_tpu.serve.batching import ContinuousEngine

        L, cfg, params = _tiny()
        ps = _prompts(3, seed=2)

        def run(seed):
            eng = ContinuousEngine(L, params, cfg, max_batch=4, max_seq=64,
                                   kv_dtype=jnp.float32,
                                   compute_dtype=jnp.float32, seed=seed)
            for i, p in enumerate(ps):
                eng.submit(i, p, max_new_tokens=6, temperature=1.0, top_p=0.9)
            return eng.run()

        assert run(0) == run(0)
        a, b = run(0), run(7)
        assert any(a[k] != b[k] for k in a)

    def test_multihost_broadcast_carries_sampling(self):
        from autosmoothquant_tpu.serve.batching import Request
        from autosmoothquant_tpu.serve.multihost import broadcast_requests

        reqs = [Request(uid=0, prompt=[1, 2, 3], max_new_tokens=4,
                        temperature=0.7, top_k=5, top_p=0.9)]
        out = broadcast_requests(reqs, max_prompt=16)
        assert out[0].temperature == pytest.approx(0.7)
        assert out[0].top_k == 5
        assert out[0].top_p == pytest.approx(0.9)


class TestRepetitionPenalty:
    def test_penalty_math(self):
        from autosmoothquant_tpu.serve.sampling import apply_repetition_penalty

        lg = jnp.asarray([[2.0, -1.0, 0.5, -3.0]], jnp.float32)
        seen = jnp.asarray([[True, True, False, False]])
        out = apply_repetition_penalty(lg, seen, jnp.asarray([2.0]))
        np.testing.assert_allclose(np.asarray(out[0]),
                                   [1.0, -2.0, 0.5, -3.0])
        # penalty 1 = identity even on seen entries
        out1 = apply_repetition_penalty(lg, seen, jnp.asarray([1.0]))
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(lg))

    def test_engine_penalty_breaks_repetition(self):
        from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

        L, cfg, params = _tiny()
        eng = Engine(L, params, cfg, max_batch=1, max_seq=128,
                     kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        ps = [[7, 8] * 10]  # drives the tiny model into a loop
        plain = eng.generate(ps, GenerationConfig(max_new_tokens=16))[0]
        pen = eng.generate(ps, GenerationConfig(
            max_new_tokens=16, repetition_penalty=5.0))[0]
        assert pen != plain
        # a strong penalty shortens the longest repeated run
        def longest_run(xs):
            best = cur = 1
            for a, b in zip(xs, xs[1:]):
                cur = cur + 1 if a == b else 1
                best = max(best, cur)
            return best
        assert len(set(pen)) >= len(set(plain))

    def test_continuous_mixed_penalty_batch(self):
        """A penalized row must not perturb plain rows sharing the step."""
        from autosmoothquant_tpu.serve.batching import ContinuousEngine

        L, cfg, params = _tiny()
        ps = _prompts(3, seed=4)
        plain = ContinuousEngine(L, params, cfg, max_batch=4, max_seq=64,
                                 kv_dtype=jnp.float32,
                                 compute_dtype=jnp.float32)
        for i, p in enumerate(ps):
            plain.submit(i, p, max_new_tokens=6)
        want = plain.run()

        mixed = ContinuousEngine(L, params, cfg, max_batch=4, max_seq=64,
                                 kv_dtype=jnp.float32,
                                 compute_dtype=jnp.float32)
        mixed.submit(0, ps[0], max_new_tokens=6)
        mixed.submit(1, ps[1], max_new_tokens=6, repetition_penalty=4.0)
        mixed.submit(2, ps[2], max_new_tokens=6)
        got = mixed.run()
        assert got[0] == want[0] and got[2] == want[2]
        assert len(got[1]) == 6

    def test_engine_vs_continuous_penalty_agree(self):
        """Same greedy penalized request through both engines -> same tokens
        (both apply the penalty to prompt+generated context in f32)."""
        from autosmoothquant_tpu.serve.batching import ContinuousEngine
        from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

        L, cfg, params = _tiny()
        p = [5, 6, 7] * 6
        eng = Engine(L, params, cfg, max_batch=1, max_seq=64,
                     kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        want = eng.generate([p], GenerationConfig(
            max_new_tokens=10, repetition_penalty=3.0))[0]
        ce = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=64,
                              kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        ce.submit(0, p, max_new_tokens=10, repetition_penalty=3.0)
        got = ce.run()[0]
        assert got == want

    def test_multihost_broadcast_carries_penalty(self):
        from autosmoothquant_tpu.serve.batching import Request
        from autosmoothquant_tpu.serve.multihost import broadcast_requests

        out = broadcast_requests([Request(uid=0, prompt=[1, 2], max_new_tokens=2,
                                          repetition_penalty=1.3)],
                                 max_prompt=8)
        assert abs(out[0].repetition_penalty - 1.3) < 1e-6


class TestStopSequences:
    def test_engine_stop_truncates(self):
        from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

        L, cfg, params = _tiny()
        eng = Engine(L, params, cfg, max_batch=1, max_seq=64,
                     kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        p = _prompts(1)[0]
        base = eng.generate([p], GenerationConfig(max_new_tokens=12))[0]
        # pick a bigram at its FIRST occurrence (truncation is first-match)
        j = next(j for j in range(2, 10)
                 if base[j:j + 2] not in [base[i:i + 2] for i in range(j)])
        stop = (tuple(base[j:j + 2]),)
        got = eng.generate([p], GenerationConfig(max_new_tokens=12,
                                                 stop=stop))[0]
        assert got == base[:j]

    def test_continuous_stop_matches_engine(self):
        from autosmoothquant_tpu.serve.batching import ContinuousEngine
        from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

        L, cfg, params = _tiny()
        p = _prompts(1)[0]
        eng = Engine(L, params, cfg, max_batch=1, max_seq=64,
                     kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        base = eng.generate([p], GenerationConfig(max_new_tokens=12))[0]
        j = next(j for j in range(2, 10)
                 if base[j:j + 2] not in [base[i:i + 2] for i in range(j)])
        stop = [base[j:j + 2]]
        ce = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=64,
                              kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        ce.submit(0, p, max_new_tokens=12, stop=stop)
        got = ce.run()[0]
        assert got == base[:j]

    def test_no_stop_unchanged(self):
        from autosmoothquant_tpu.serve.batching import ContinuousEngine

        L, cfg, params = _tiny()
        p = _prompts(1)[0]
        a = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=64,
                             kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        a.submit(0, p, max_new_tokens=8)
        b = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=64,
                             kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        b.submit(0, p, max_new_tokens=8, stop=[[999]])  # never occurs
        assert a.run()[0] == b.run()[0]


class TestLogprobs:
    def test_engine_logprobs_match_forward(self):
        """Greedy logprobs must equal log_softmax of the cacheless forward's
        logits at each emitted position."""
        from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig
        from autosmoothquant_tpu.models import llama as L

        Lm, cfg, params = _tiny()
        eng = Engine(Lm, params, cfg, max_batch=1, max_seq=64,
                     kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        p = _prompts(1)[0]
        (toks, lps), = eng.generate([p], GenerationConfig(
            max_new_tokens=6, return_logprobs=True))
        assert len(lps) == len(toks) == 6
        full = jnp.asarray([p + toks], jnp.int32)
        h, _, _ = Lm.forward(params, full, cfg, compute_dtype=jnp.float32)
        lg = np.asarray(Lm.logits(params, h), np.float32)[0]
        for i, (t, lp) in enumerate(zip(toks, lps)):
            pos = len(p) - 1 + i
            ref = jax.nn.log_softmax(jnp.asarray(lg[pos]))[t]
            assert abs(lp - float(ref)) < 1e-3, (i, lp, float(ref))

    def test_continuous_logprobs_match_engine(self):
        from autosmoothquant_tpu.serve.batching import ContinuousEngine
        from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

        L, cfg, params = _tiny()
        p = _prompts(1)[0]
        eng = Engine(L, params, cfg, max_batch=1, max_seq=64,
                     kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        (toks, lps), = eng.generate([p], GenerationConfig(
            max_new_tokens=6, return_logprobs=True))
        ce = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=64,
                              kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        req = ce.submit(0, p, max_new_tokens=6, want_logprobs=True)
        out = ce.run()
        assert out[0] == toks
        assert len(req.logprobs) == 6
        np.testing.assert_allclose(req.logprobs, lps, atol=1e-3)

    def test_plain_requests_unaffected(self):
        from autosmoothquant_tpu.serve.batching import ContinuousEngine

        L, cfg, params = _tiny()
        ps = _prompts(2, seed=9)
        a = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=64,
                             kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        for i, p in enumerate(ps):
            a.submit(i, p, max_new_tokens=5)
        want = a.run()
        b = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=64,
                             kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        b.submit(0, ps[0], max_new_tokens=5, want_logprobs=True)
        b.submit(1, ps[1], max_new_tokens=5)
        got = b.run()
        assert got == want
