"""Perplexity harness: reference-procedure math, fp-vs-int8 delta
(the TPU analog of the reference's eval_model.py ppl regression)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.eval.ppl import perplexity_from_tokens
from autosmoothquant_tpu.quant.config import QuantConfig
from autosmoothquant_tpu.utils.datautils import synthetic_stream, random_windows


@pytest.fixture(scope="module")
def setup():
    cfg = L.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128)
    params = L.init_params(cfg, jax.random.PRNGKey(1))
    stream = synthetic_stream(128, 2048, seed=3)
    return cfg, params, stream


def test_ppl_matches_manual_computation(setup):
    cfg, params, stream = setup
    max_len = 64
    ppl = perplexity_from_tokens(L, params, cfg, stream[:256], max_length=max_len)
    # manual oracle over the same windows
    nlls = []
    for i in range(256 // max_len):
        w = jnp.asarray(stream[i * max_len:(i + 1) * max_len][None], jnp.int32)
        h, _, _ = L.forward_jit(params, w, cfg)
        logits = np.asarray(L.logits(params, h))[0]
        logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
        labels = np.asarray(w)[0, 1:]
        nll = -logp[np.arange(max_len - 1), labels].mean()
        nlls.append(nll * max_len)
    expected = float(np.exp(np.sum(nlls) / (4 * max_len)))
    assert abs(ppl - expected) / expected < 1e-4


def test_int8_ppl_close_to_fp(setup):
    cfg, params, stream = setup
    from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize

    calib = random_windows(stream, 4, 64, seed=0)
    qcfg = QuantConfig(type="int8")
    qparams, _ = calibrate_smooth_quantize(
        L, params, cfg, qcfg, lambda: [calib])
    ppl_fp = perplexity_from_tokens(L, params, cfg, stream, max_length=64)
    ppl_q = perplexity_from_tokens(L, qparams, cfg, stream, max_length=64,
                                   qcfg=qcfg)
    # random model ppl ~ vocab size; int8 delta must be small in relative terms
    assert abs(ppl_q - ppl_fp) / ppl_fp < 0.02, (ppl_fp, ppl_q)


def test_short_stream_raises(setup):
    cfg, params, _ = setup
    with pytest.raises(ValueError):
        perplexity_from_tokens(L, params, cfg, np.arange(10), max_length=64)


def test_generate_until_task(setup):
    """Generation-scored harness task: a prompt whose greedy continuation we
    precompute becomes a doc with exact_match 1.0; a doc expecting garbage
    scores 0."""
    cfg, params, _ = setup
    from autosmoothquant_tpu.eval.lm_adapter import JaxLM
    from autosmoothquant_tpu.eval.harness import GenerateUntilTask, evaluate

    lm = JaxLM(L, params, cfg, max_length=64, batch_size=2,
               compute_dtype=jnp.float32)
    ctx = [3, 1, 4, 1, 5]
    expected = lm.generate_until([ctx], max_new_tokens=4)[0]
    task = GenerateUntilTask(
        name="gen", docs=[(ctx, expected), (ctx, [999] * 4)], max_new_tokens=4)
    res = evaluate(lm, [task])["gen"]
    assert res["exact_match"] == 0.5


def test_generate_until_stop_sequences(setup):
    cfg, params, _ = setup
    from autosmoothquant_tpu.eval.lm_adapter import JaxLM
    from autosmoothquant_tpu.eval.harness import GenerateUntilTask, evaluate

    lm = JaxLM(L, params, cfg, max_length=64, batch_size=2,
               compute_dtype=jnp.float32)
    ctx = [7, 7, 7]
    full = lm.generate_until([ctx], max_new_tokens=6)[0]
    stop = [full[2]]  # stop at the 3rd generated token
    task = GenerateUntilTask(name="gen2", docs=[(ctx, full[:2])],
                             max_new_tokens=6, stop_sequences=[stop])
    res = evaluate(lm, [task])["gen2"]
    assert res["exact_match"] == 1.0


def test_rolling_ppl_task_matches_ppl_harness(setup):
    """RollingPPLTask over one stream must agree with the adapter's rolling
    loglikelihood converted to perplexity."""
    cfg, params, stream = setup
    from autosmoothquant_tpu.eval.lm_adapter import JaxLM
    from autosmoothquant_tpu.eval.harness import RollingPPLTask, evaluate

    lm = JaxLM(L, params, cfg, max_length=64, batch_size=1,
               compute_dtype=jnp.float32)
    doc = stream[:128].tolist()
    task = RollingPPLTask(name="ppl", docs=[doc])
    res = evaluate(lm, [task])["ppl"]
    ll = lm.loglikelihood_rolling([doc])[0]
    expect = float(np.exp(-ll / len(doc)))
    assert abs(res["perplexity"] - expect) / expect < 1e-6
    assert res["bits_per_token"] > 0


def test_evaluate_multirank_merge(setup, monkeypatch):
    """world_size=2 path: each rank computes its request slice; gather merges
    by request id; aggregate sees the full ordered results. The gather is
    faked (single process) to exercise the merge logic for all task types."""
    cfg, params, stream = setup
    from autosmoothquant_tpu.eval import harness
    from autosmoothquant_tpu.eval.lm_adapter import JaxLM
    from autosmoothquant_tpu.eval.harness import (
        MultipleChoiceTask, RollingPPLTask, evaluate)

    lm = JaxLM(L, params, cfg, max_length=64, batch_size=2,
               compute_dtype=jnp.float32)
    docs = [([1, 2, 3], [[4, 5], [6]], 0), ([7, 8], [[9], [10, 11]], 1)]
    task = MultipleChoiceTask(name="mc", docs=docs)
    expect = evaluate(lm, [task])["mc"]

    # fake 2-rank gather: run both rank slices locally and concatenate
    store = {}

    def fake_gather(local, world_size):
        key = tuple(i for i, _ in local)
        store[key] = local
        # emulate the other rank by computing its slice here
        reqs, _ = task.build_requests()
        other_rank = 1 if key and key[0] == 0 else 0
        other_ids = [i for i in range(len(reqs)) if i % 2 == other_rank]
        other = lm.loglikelihood([reqs[i] for i in other_ids])
        return local + list(zip(other_ids, other))

    monkeypatch.setattr(harness, "gather_results", fake_gather)
    got = evaluate(lm, [task], rank=0, world_size=2)["mc"]
    assert got == expect


def test_evaluate_multirank_rolling(setup, monkeypatch):
    cfg, params, stream = setup
    from autosmoothquant_tpu.eval import harness
    from autosmoothquant_tpu.eval.lm_adapter import JaxLM
    from autosmoothquant_tpu.eval.harness import RollingPPLTask, evaluate

    lm = JaxLM(L, params, cfg, max_length=64, batch_size=1,
               compute_dtype=jnp.float32)
    docs = [stream[:64].tolist(), stream[64:128].tolist()]
    task = RollingPPLTask(name="ppl2", docs=docs)
    expect = evaluate(lm, [task])["ppl2"]

    def fake_gather(local, world_size):
        reqs, _ = task.build_requests()
        done = {i for i, _ in local}
        other_ids = [i for i in range(len(reqs)) if i not in done]
        other = task.run(lm, [reqs[i] for i in other_ids])
        return local + list(zip(other_ids, other))

    monkeypatch.setattr(harness, "gather_results", fake_gather)
    got = evaluate(lm, [task], rank=1, world_size=2)["ppl2"]
    assert abs(got["perplexity"] - expect["perplexity"]) < 1e-9


def test_masked_forward_matches_maskless_scoring():
    """The eval scorer no longer passes attention_mask; keep the masked
    cacheless path covered: left-padded batch + mask must reproduce each
    sequence's unpadded logits at valid positions."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from autosmoothquant_tpu.models import llama as L

    cfg = L.LlamaConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, max_position_embeddings=64)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    seqs = [rng.integers(1, 64, size=n).tolist() for n in (7, 12)]
    t = max(map(len, seqs))
    ids = np.zeros((2, t), np.int32)
    mask = np.zeros((2, t), np.int32)
    pos = np.zeros((2, t), np.int32)
    for i, s in enumerate(seqs):
        pad = t - len(s)
        ids[i, pad:] = s
        mask[i, pad:] = 1
        pos[i, pad:] = np.arange(len(s))
    h, _, _ = L.forward(params, jnp.asarray(ids), cfg,
                        attention_mask=jnp.asarray(mask),
                        positions=jnp.asarray(pos),
                        compute_dtype=jnp.float32)
    lg = np.asarray(L.logits(params, h), np.float32)
    for i, s in enumerate(seqs):
        h1, _, _ = L.forward(params, jnp.asarray([s], jnp.int32), cfg,
                             compute_dtype=jnp.float32)
        want = np.asarray(L.logits(params, h1), np.float32)[0]
        got = lg[i, t - len(s):]
        assert np.abs(got - want).max() < 2e-4
