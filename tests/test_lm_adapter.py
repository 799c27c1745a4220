"""LM adapter + native harness: loglikelihood vs direct-forward oracle,
rolling == ppl harness, multiple-choice accuracy plumbing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.eval.lm_adapter import JaxLM, shard_requests
from autosmoothquant_tpu.eval.harness import (
    MultipleChoiceTask, bootstrap_stderr, evaluate, make_table,
)

TINY = dict(
    vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def lm():
    cfg = L.LlamaConfig(**TINY)
    params = L.init_params(cfg, jax.random.PRNGKey(7))
    return JaxLM(L, params, cfg, batch_size=4, max_length=64)


def direct_ll(lm, ctx, cont):
    ids = jnp.asarray(np.asarray(ctx + cont, np.int32)[None])
    h, _, _ = L.forward_jit(lm.params, ids, lm.cfg)
    logits = np.asarray(L.logits(lm.params, h))[0]
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True))
                           .sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
    total = 0.0
    for t in range(len(ctx) - 1, len(ctx) - 1 + len(cont)):
        total += logp[t, (ctx + cont)[t + 1]]
    return total


def test_loglikelihood_matches_oracle(lm):
    reqs = [([1, 2, 3], [4, 5]), ([9], [8, 7, 6]), ([3, 3, 3, 3], [2])]
    results = lm.loglikelihood(reqs)
    for (ctx, cont), (ll, greedy) in zip(reqs, results):
        expected = direct_ll(lm, list(ctx), list(cont))
        assert abs(ll - expected) < 1e-3, (ll, expected)
        assert isinstance(greedy, bool)


def test_loglikelihood_truncated_context(lm):
    """Requests longer than max_length are LEFT-truncated; the continuation
    must be sliced from the END of the effective sequence (regression: the
    round-1 slice used the pre-truncation ctx_len and silently returned 0.0)."""
    rng = np.random.default_rng(11)
    ctx = list(rng.integers(1, 128, size=100))  # 100 > max_length=64
    cont = list(rng.integers(1, 128, size=5))
    (ll, _), = lm.loglikelihood([(ctx, cont)])
    # oracle: score the same left-truncated window directly
    eff_ctx = (ctx + cont)[-64:][:-5]
    expected = direct_ll(lm, eff_ctx, cont)
    assert abs(ll - expected) < 1e-3, (ll, expected)
    assert ll < -1e-3  # a real logprob, not the old silent 0.0


def test_loglikelihood_oversized_continuation_raises(lm):
    cont = list(range(1, 70))  # 69 > max_length-1
    with pytest.raises(ValueError):
        lm.loglikelihood([([1, 2], cont)])


def test_batching_order_preserved(lm):
    # mixed lengths: results must come back in request order
    reqs = [([i] * (1 + i % 5), [i % 7 + 1]) for i in range(11)]
    batched = lm.loglikelihood(reqs)
    singles = [lm.loglikelihood([r])[0] for r in reqs]
    for (a, _), (b, _) in zip(batched, singles):
        assert abs(a - b) < 1e-3


def test_rolling_matches_sum(lm):
    stream = list(np.random.default_rng(3).integers(1, 128, size=40))
    (total,) = lm.loglikelihood_rolling([stream])
    # stream fits one window: rolling == scoring the whole stream after the
    # prefix token in one shot
    (expected, _), = lm.loglikelihood([([0], stream)])
    assert abs(total - expected) < 1e-2


def test_generate_until_stop_sequences(lm):
    out = lm.generate_until([[5, 6, 7]], max_new_tokens=8)[0]
    assert len(out) == 8
    stop = out[2:4]
    trunc = lm.generate_until([[5, 6, 7]], max_new_tokens=8,
                              stop_sequences=[stop])[0]
    assert trunc == out[:2]


def test_multiple_choice_task(lm):
    rng = np.random.default_rng(0)
    docs = []
    for _ in range(6):
        ctx = list(rng.integers(1, 128, size=4))
        choices = [list(rng.integers(1, 128, size=2)) for _ in range(3)]
        docs.append((ctx, choices, int(rng.integers(0, 3))))
    task = MultipleChoiceTask("synthetic", docs)
    results = evaluate(lm, [task])
    assert "synthetic" in results
    assert 0.0 <= results["synthetic"]["acc"] <= 1.0
    table = make_table(results)
    assert "synthetic" in table and "acc" in table


def test_shard_requests_partition():
    reqs = list(range(10))
    parts = [shard_requests(reqs, r, 3) for r in range(3)]
    assert sorted(sum(parts, [])) == reqs


def test_gather_results_marshalling(monkeypatch):
    """Exercise the byte-buffer marshalling path with a fake 2-rank
    process_allgather: rank buffers of DIFFERENT lengths must round-trip
    (VERDICT r1 item 7 — object arrays can't cross process_allgather)."""
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils
    from autosmoothquant_tpu.eval.lm_adapter import gather_results

    rank0 = [(0.5, True), (-1.25, False)]
    rank1 = [(2.0, True), (3.5, False), ("longer-string-payload", None)]
    payloads = [np.frombuffer(pickle.dumps(r), np.uint8) for r in (rank0, rank1)]

    calls = {"n": 0}

    def fake_allgather(x, **kw):
        # lengths gather, then padded-buffer gather
        if calls["n"] == 0:
            calls["n"] += 1
            return np.asarray([[p.size] for p in payloads])
        m = max(p.size for p in payloads)
        out = np.zeros((2, m), np.uint8)
        for i, p in enumerate(payloads):
            out[i, : p.size] = p
        return out

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    got = gather_results(rank0, world_size=2)
    assert got == rank0 + rank1


def test_gather_results_single_rank_passthrough():
    from autosmoothquant_tpu.eval.lm_adapter import gather_results

    res = [("a", 1)]
    assert gather_results(res, 1) is res


def test_bootstrap_stderr():
    assert bootstrap_stderr([1.0] * 10) == 0.0
    s = bootstrap_stderr([0.0, 1.0] * 20)
    assert 0.02 < s < 0.2
