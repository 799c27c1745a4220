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
