"""Baichuan family: parity vs the reference's vendored torch implementation
(used read-only as an oracle), RoPE-mode self-consistency vs the Llama
implementation, W_pack per-section quantization, generation."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.models import baichuan as M
from autosmoothquant_tpu.convert.hf import baichuan_params_from_state_dict
from autosmoothquant_tpu.quant.config import QuantConfig

REF = "/root/reference"

TINY = dict(
    vocab_size=256, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, model_max_length=128,
)


@pytest.fixture(scope="module")
def torch_oracle():
    """The reference's vendored 13B (ALiBi) torch model as a parity oracle."""
    if not os.path.isdir(REF):
        pytest.skip("reference tree unavailable")
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        from autosmoothquant.thirdparty.baichuan.configuration_baichuan import (
            BaichuanConfig,
        )
        from autosmoothquant.thirdparty.baichuan.modeling_baichuan import (
            BaichuanForCausalLM,
        )
    finally:
        sys.path.remove(REF)
    torch.manual_seed(0)
    cfg = BaichuanConfig(**TINY)
    model = BaichuanForCausalLM(cfg).eval().float()
    # the vendored model's default init (kaiming on NormHead etc.) produces
    # activation overflow -> NaN even in its own torch forward on some ids;
    # re-init all 2-D weights to a sane scale for a usable oracle
    # (RMSNorm weights are torch.empty -> uninitialized garbage ~1e31)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim == 2:
                torch.nn.init.normal_(p, std=0.05)
            elif p.ndim == 1:
                p.fill_(1.0)
    return model


def test_alibi_logits_match_reference_torch(torch_oracle):
    import torch

    cfg = M.BaichuanConfig(**TINY)
    assert cfg.position_embedding == "ALIBI"  # hidden != 4096
    params = baichuan_params_from_state_dict(
        dict(torch_oracle.state_dict()), cfg.num_hidden_layers)
    ids = np.random.default_rng(0).integers(0, 256, size=(2, 16))
    with torch.no_grad():
        theirs = torch_oracle(torch.tensor(ids)).logits.numpy()
    h, _, _ = M.forward_jit(params, jnp.asarray(ids), cfg)
    ours = np.asarray(M.logits(params, h))
    np.testing.assert_allclose(ours, theirs, rtol=5e-4, atol=5e-3)


def test_rope_mode_matches_llama_equivalent():
    """Baichuan-7B attention == Llama (no GQA) with W_pack split into
    q/k/v — construct equivalent llama params and compare."""
    from autosmoothquant_tpu.models import llama as L

    cfg = M.BaichuanConfig(**TINY, force_position_embedding="ROPE")
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    D = cfg.hidden_size
    wp = params["layers"]["attn"]["wpack"]["w"]
    lcfg = L.LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=D,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_attention_heads,
        max_position_embeddings=cfg.model_max_length,
        rms_norm_eps=cfg.rms_norm_eps)
    lparams = {
        "embed": params["embed"],
        "layers": {
            "ln1": params["layers"]["ln1"],
            "attn": {
                "q": {"w": wp[:, :, 0 * D:1 * D]},
                "k": {"w": wp[:, :, 1 * D:2 * D]},
                "v": {"w": wp[:, :, 2 * D:3 * D]},
                "o": params["layers"]["attn"]["o"],
            },
            "ln2": params["layers"]["ln2"],
            "mlp": params["layers"]["mlp"],
        },
        "final_norm": params["final_norm"],
        "lm_head": params["lm_head"],
    }
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, size=(2, 12)))
    hb, _, _ = M.forward_jit(params, ids, cfg)
    hl, _, _ = L.forward_jit(lparams, ids, lcfg)
    np.testing.assert_allclose(np.asarray(hb), np.asarray(hl), rtol=1e-5, atol=1e-5)


def test_alibi_slopes_formula():
    # 4 heads: start = 2^(-2^-(log2(4)-3)) = 2^(-1/2)... check against the
    # reference's _get_interleave directly
    if not os.path.isdir(REF):
        pytest.skip("reference tree unavailable")
    sys.path.insert(0, REF)
    try:
        from autosmoothquant.thirdparty.baichuan.modeling_baichuan import (
            _get_interleave,
        )
    finally:
        sys.path.remove(REF)
    for n in (4, 8, 6, 40):
        np.testing.assert_allclose(
            np.asarray(M.alibi_slopes(n)), _get_interleave(n), rtol=1e-6)


@pytest.fixture(scope="module")
def quant_setup(torch_oracle):
    cfg = M.BaichuanConfig(**TINY)
    params = baichuan_params_from_state_dict(
        dict(torch_oracle.state_dict()), cfg.num_hidden_layers)
    ids = np.random.default_rng(2).integers(0, 256, size=(2, 16))
    return cfg, params, ids


@pytest.mark.parametrize("gran", ["per-tensor", "per-token"])
def test_int8_pipeline(quant_setup, gran):
    cfg, params, ids = quant_setup
    from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize

    qcfg = QuantConfig(type="int8", qkv=gran, out=gran, fc1=gran, fc2=gran)
    qparams, _ = calibrate_smooth_quantize(M, params, cfg, qcfg,
                                           lambda: [np.asarray(ids)])
    wp = qparams["layers"]["attn"]["wpack"]
    assert wp["w"].dtype == jnp.int8
    assert wp["dequant_scale"].shape == (cfg.num_hidden_layers, 3 * cfg.hidden_size)

    h, _, _ = M.forward_jit(params, jnp.asarray(ids), cfg)
    ref = np.asarray(M.logits(params, h))
    hq, _, _ = M.forward_jit(qparams, jnp.asarray(ids), cfg, qcfg)
    got = np.asarray(M.logits(qparams, hq))

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    p, q = softmax(ref), softmax(got)
    kl = (p * (np.log(p + 1e-12) - np.log(q + 1e-12))).sum(-1).mean()
    assert kl < 5e-3, kl


def test_wpack_per_section_scales(quant_setup):
    """Each third of the fused dequant vector must equal that section's own
    per-tensor weight scale (ref QKVLinear alpha/beta/gamma semantics)."""
    cfg, params, ids = quant_setup
    from autosmoothquant_tpu.quant import math as qmath

    qcfg = QuantConfig(type="int8", qkv="per-token", out="per-token",
                       fc1="per-token", fc2="per-token")
    scales = {k: jnp.ones(cfg.num_hidden_layers) for k in (
        "attn_input_scale", "attn_output_scale", "out_input_scale",
        "gate_input_scale", "down_input_scale")}
    qp = M.quantize(params, qcfg, scales)
    D = cfg.hidden_size
    w0 = np.asarray(params["layers"]["attn"]["wpack"]["w"][0])
    col = np.asarray(qp["layers"]["attn"]["wpack"]["dequant_scale"][0])
    for s in range(3):
        expected = np.abs(w0[:, s * D:(s + 1) * D]).max() / 127.0
        np.testing.assert_allclose(col[s * D:(s + 1) * D], expected, rtol=1e-6)


def test_generation_and_cache_consistency(quant_setup):
    cfg, params, ids = quant_setup
    from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

    eng = Engine(M, params, cfg, max_batch=2, max_seq=64,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    out = eng.generate([[3, 1, 4, 1, 5]], GenerationConfig(max_new_tokens=6))
    assert len(out[0]) == 6
    # incremental decode equals full forward argmax chain (ALiBi + cache)
    jids = jnp.asarray(ids[:1])
    h_full, _, _ = M.forward_jit(params, jids, cfg)
    nxt_full = int(np.asarray(M.logits(params, h_full))[0, -1].argmax())
    cached = jax.jit(lambda p, i, c, idx: M.forward(
        p, i, cfg, kv_cache=c, cache_index=idx)[:2])
    cache = M.init_kv_cache(cfg, 1, 32, jnp.float32)
    h, cache = cached(params, jids, cache, 0)
    nxt_inc = int(np.asarray(M.logits(params, h))[0, -1].argmax())
    assert nxt_full == nxt_inc
