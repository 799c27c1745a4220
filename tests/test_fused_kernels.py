"""Fused add+norm+quant kernels vs jnp oracle (interpret on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from autosmoothquant_tpu.kernels.fused import (
    fused_add_layernorm_quant,
    fused_add_rmsnorm_quant,
)

INTERPRET = jax.default_backend() != "tpu"


def test_add_rmsnorm_quant():
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    g = jnp.asarray(rng.normal(size=128) * 40, jnp.float32)  # scale-folded
    out_h, q = fused_add_rmsnorm_quant(h, x, g, eps=1e-6, block_rows=128,
                                       interpret=INTERPRET)
    s = np.asarray(h) + np.asarray(x)
    np.testing.assert_allclose(np.asarray(out_h), s, rtol=1e-6)
    var = (s * s).mean(-1, keepdims=True)
    y = s / np.sqrt(var + 1e-6) * np.asarray(g)
    expected_q = np.clip(np.round(y), -128, 127).astype(np.int8)
    # rsqrt approximation may flip values on exact .5 boundaries; allow <=1 lsb
    diff = np.abs(np.asarray(q).astype(np.int32) - expected_q.astype(np.int32))
    assert (diff <= 1).all() and (diff > 0).mean() < 0.01


def test_add_layernorm_quant():
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
    g = jnp.asarray(rng.normal(size=256) * 30, jnp.float32)
    b = jnp.asarray(rng.normal(size=256) * 5, jnp.float32)
    out_h, q = fused_add_layernorm_quant(h, x, g, b, eps=1e-5, block_rows=64,
                                         interpret=INTERPRET)
    s = np.asarray(h) + np.asarray(x)
    np.testing.assert_allclose(np.asarray(out_h), s, rtol=1e-6)
    mean = s.mean(-1, keepdims=True)
    c = s - mean
    y = c / np.sqrt((c * c).mean(-1, keepdims=True) + 1e-5) * np.asarray(g) + np.asarray(b)
    expected_q = np.clip(np.round(y), -128, 127).astype(np.int8)
    diff = np.abs(np.asarray(q).astype(np.int32) - expected_q.astype(np.int32))
    assert (diff <= 1).all() and (diff > 0).mean() < 0.01


def test_unaligned_rows_fallback():
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.normal(size=(100, 128)), jnp.float32)  # 100 not pow2
    x = jnp.asarray(rng.normal(size=(100, 128)), jnp.float32)
    g = jnp.ones(128, jnp.float32) * 50
    out_h, q = fused_add_rmsnorm_quant(h, x, g, interpret=INTERPRET)
    assert out_h.shape == (100, 128) and q.dtype == jnp.int8


def test_fused_block_in_llama_matches_unfused(monkeypatch):
    """Integration: the per-tensor decoder block with the fused
    add+norm+quant kernel (ASQ_FUSED_BLOCK=force, interpret off-TPU) must
    match the unfused path exactly — both quantize with round+clip after an
    f32 RMSNorm."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from autosmoothquant_tpu.models import llama as L
    from autosmoothquant_tpu.quant.config import QuantConfig

    cfg = L.LlamaConfig(vocab_size=256, hidden_size=128, intermediate_size=256,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, max_position_embeddings=64)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    qcfg = QuantConfig(type="int8")
    ones = jnp.ones((2,), jnp.float32)
    scales = {k: ones * 0.05 for k in (
        "attn_input_scale", "q_output_scale", "k_output_scale",
        "v_output_scale", "out_input_scale", "gate_input_scale",
        "down_input_scale")}
    qp = L.quantize(params, qcfg, scales)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, size=(2, 16)),
                      jnp.int32)

    outs = {}
    for mode in ("off", "force"):
        monkeypatch.setenv("ASQ_FUSED_BLOCK", mode)
        jax.clear_caches()
        h, _, _ = L.forward_jit(qp, ids, cfg, qcfg)
        outs[mode] = np.asarray(L.logits(qp, h))
    np.testing.assert_allclose(outs["force"], outs["off"], rtol=2e-5, atol=2e-5)


def test_fused_block_with_fused_projections(monkeypatch):
    """Fused gate|up weights + prequantized input path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from autosmoothquant_tpu.models import llama as L
    from autosmoothquant_tpu.quant.config import QuantConfig

    cfg = L.LlamaConfig(vocab_size=128, hidden_size=128, intermediate_size=256,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, max_position_embeddings=64)
    params = L.init_params(cfg, jax.random.PRNGKey(1))
    qcfg = QuantConfig(type="int8")
    ones = jnp.ones((2,), jnp.float32)
    scales = {k: ones * 0.05 for k in (
        "attn_input_scale", "q_output_scale", "k_output_scale",
        "v_output_scale", "out_input_scale", "gate_input_scale",
        "down_input_scale")}
    qp = L.fuse_decode_projections(L.quantize(params, qcfg, scales))
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    outs = {}
    for mode in ("off", "force"):
        monkeypatch.setenv("ASQ_FUSED_BLOCK", mode)
        jax.clear_caches()
        h, _, _ = L.forward_jit(qp, ids, cfg, qcfg)
        outs[mode] = np.asarray(L.logits(qp, h))
    np.testing.assert_allclose(outs["force"], outs["off"], rtol=2e-5, atol=2e-5)


def test_fused_block_in_opt_matches_unfused(monkeypatch):
    """OPT pre-LN per-tensor path with the fused LayerNorm block."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from autosmoothquant_tpu.models import opt as O
    from autosmoothquant_tpu.quant.config import QuantConfig

    cfg = O.OPTConfig(vocab_size=256, hidden_size=128, word_embed_proj_dim=128,
                      ffn_dim=256, num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=64)
    params = O.init_params(cfg, jax.random.PRNGKey(0))
    qcfg = QuantConfig(type="int8")
    ones = jnp.ones((2,), jnp.float32)
    scales = {k: ones * 0.05 for k in (
        "attn_input_scale", "q_output_scale", "k_output_scale",
        "v_output_scale", "out_input_scale", "fc1_input_scale",
        "fc2_input_scale")}
    qp = O.quantize(params, qcfg, scales, cfg=cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, size=(2, 16)),
                      jnp.int32)
    outs = {}
    for mode in ("off", "force"):
        monkeypatch.setenv("ASQ_FUSED_BLOCK", mode)
        jax.clear_caches()
        h, _, _ = O.forward_jit(qp, ids, cfg, qcfg)
        outs[mode] = np.asarray(O.logits(qp, h))
    np.testing.assert_allclose(outs["force"], outs["off"], rtol=2e-5, atol=2e-5)
