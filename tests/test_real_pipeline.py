"""Full-pipeline validation on an HF-initialized (not hand-rolled) mid-size
model: HF state_dict -> convert -> calibrate -> smooth -> quantize -> save ->
load -> generate + perplexity delta vs fp.

No real pretrained checkpoint exists in this air-gapped environment (zero
egress; documented in BENCHMARKS.md), so this is the closest executable
analog of BASELINE's "run the reference ppl procedure on a real model":
weights come from HF's own initializer through the exact CLI pipeline code
paths, at a size big enough (8 layers / 512 hidden / GQA) to exercise the
stacked-layout conversion non-trivially."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.quant.config import QuantConfig

MID = dict(
    vocab_size=1024, hidden_size=512, intermediate_size=1024,
    num_hidden_layers=8, num_attention_heads=8, num_key_value_heads=4,
    max_position_embeddings=256,
)


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        attn_implementation="eager", tie_word_embeddings=False, **MID)
    ).eval().float()
    return hf


def test_full_pipeline_on_hf_initialized_model(hf_model, tmp_path):
    from autosmoothquant_tpu.convert.hf import llama_params_from_state_dict
    from autosmoothquant_tpu.convert.pipeline import (
        calibrate_smooth_quantize, load_quantized, save_quantized)
    from autosmoothquant_tpu.eval.ppl import perplexity_from_tokens
    from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig
    from autosmoothquant_tpu.utils.datautils import (
        random_windows, synthetic_stream)

    cfg = L.LlamaConfig(**MID)
    params = llama_params_from_state_dict(
        dict(hf_model.state_dict()), cfg.num_hidden_layers)

    stream = synthetic_stream(MID["vocab_size"], 8192, seed=11)
    calib = random_windows(stream, 8, 128, seed=1)
    qcfg = QuantConfig(type="int8")
    qparams, art = calibrate_smooth_quantize(
        L, params, cfg, qcfg, lambda: [calib[:4], calib[4:]])

    # save / load round-trip through the real checkpoint container
    ckpt = str(tmp_path / "mid_int8")
    save_quantized(ckpt, qparams, qcfg, artifacts=art)
    p2, qcfg2, _ = load_quantized(ckpt)

    # logits quality: softmax KL fp vs int8
    ids = jnp.asarray(np.random.default_rng(3).integers(
        0, MID["vocab_size"], size=(2, 64)), jnp.int32)
    lg_fp = np.asarray(L.logits(params, L.forward_jit(params, ids, cfg)[0]))
    lg_q = np.asarray(L.logits(p2, L.forward_jit(p2, ids, cfg, qcfg2)[0]))
    p = np.exp(lg_fp - lg_fp.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    q = np.exp(lg_q - lg_q.max(-1, keepdims=True))
    q /= q.sum(-1, keepdims=True)
    kl = float((p * (np.log(p + 1e-12) - np.log(q + 1e-12))).sum(-1).mean())
    assert kl < 5e-3, kl

    # reference ppl procedure (eval_model.py:56-105 analog): fp vs int8 delta
    ppl_fp = perplexity_from_tokens(L, params, cfg, stream[:1024], max_length=128)
    ppl_q = perplexity_from_tokens(L, p2, cfg, stream[:1024], max_length=128,
                                   qcfg=qcfg2)
    rel = abs(ppl_q - ppl_fp) / ppl_fp
    assert rel < 0.05, (ppl_fp, ppl_q)

    # generation smoke through the engine (test_model.py analog)
    eng = Engine(L, p2, cfg, qcfg2, max_batch=2, max_seq=128,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    toks = eng.generate([[5, 9, 2, 11]], GenerationConfig(max_new_tokens=8))
    assert len(toks[0]) == 8


def test_hf_parity_mid_size(hf_model):
    """Float logits parity with HF at mid size (stacked-scan conversion)."""
    import torch

    cfg = L.LlamaConfig(**MID)
    from autosmoothquant_tpu.convert.hf import llama_params_from_state_dict

    params = llama_params_from_state_dict(
        dict(hf_model.state_dict()), cfg.num_hidden_layers)
    ids = np.random.default_rng(0).integers(0, MID["vocab_size"], size=(2, 24))
    with torch.no_grad():
        theirs = hf_model(torch.tensor(ids)).logits.numpy()
    h, _, _ = L.forward_jit(params, jnp.asarray(ids, jnp.int32), cfg)
    ours = np.asarray(L.logits(params, h))
    np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-3)


def test_full_pipeline_int4_on_hf_initialized_model(hf_model, tmp_path):
    """The int8 pipeline test's W4A16/W4A8 twin: HF-initialized 8-layer GQA
    Llama through calibrate->smooth->quantize(int4)->save->load->ppl->
    generate, with the reference ppl-procedure delta as the quality gate
    (int4 group=64 carries more noise than int8 — the bound reflects it)."""
    from autosmoothquant_tpu.convert.hf import llama_params_from_state_dict
    from autosmoothquant_tpu.convert.pipeline import (
        calibrate_smooth_quantize, load_quantized, save_quantized)
    from autosmoothquant_tpu.eval.ppl import perplexity_from_tokens
    from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig
    from autosmoothquant_tpu.utils.datautils import (
        random_windows, synthetic_stream)

    cfg = L.LlamaConfig(**MID)
    params = llama_params_from_state_dict(
        dict(hf_model.state_dict()), cfg.num_hidden_layers)

    stream = synthetic_stream(MID["vocab_size"], 8192, seed=11)
    calib = random_windows(stream, 8, 128, seed=1)
    qcfg = QuantConfig(type="int4", group_size=64)
    qparams, art = calibrate_smooth_quantize(
        L, params, cfg, qcfg, lambda: [calib[:4], calib[4:]])
    assert qparams["layers"]["attn"]["q"]["w"].dtype == jnp.uint8

    ckpt = str(tmp_path / "mid_int4")
    save_quantized(ckpt, qparams, qcfg, artifacts=art)
    p2, qcfg2, _ = load_quantized(ckpt)
    assert qcfg2.group_size == 64

    ids = jnp.asarray(np.random.default_rng(3).integers(
        0, MID["vocab_size"], size=(2, 64)), jnp.int32)
    lg_fp = np.asarray(L.logits(params, L.forward_jit(params, ids, cfg)[0]))
    lg_q = np.asarray(L.logits(p2, L.forward_jit(p2, ids, cfg, qcfg2)[0]))
    p = np.exp(lg_fp - lg_fp.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    q = np.exp(lg_q - lg_q.max(-1, keepdims=True))
    q /= q.sum(-1, keepdims=True)
    kl = float((p * (np.log(p + 1e-12) - np.log(q + 1e-12))).sum(-1).mean())
    assert kl < 2e-2, kl

    ppl_fp = perplexity_from_tokens(L, params, cfg, stream[:1024],
                                    max_length=128)
    ppl_q = perplexity_from_tokens(L, p2, cfg, stream[:1024], max_length=128,
                                   qcfg=qcfg2)
    rel = abs(ppl_q - ppl_fp) / ppl_fp
    assert rel < 0.10, (ppl_fp, ppl_q)

    eng = Engine(L, p2, cfg, qcfg2, max_batch=2, max_seq=128,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    toks = eng.generate([[5, 9, 2, 11]], GenerationConfig(max_new_tokens=8))
    assert len(toks[0]) == 8
