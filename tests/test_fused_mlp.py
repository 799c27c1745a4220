"""Fused int8 MLP kernel (kernels/mlp.py): exact vs a float64 numpy oracle,
and end-to-end equality through the per-tensor Llama decode path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.kernels.mlp import fused_mlp_int8, fused_mlp_supported


def _oracle(x_q, w, scales, qs):
    """float64 silu-mul-requant over exact int32 accumulators."""
    inter = w.shape[1] // 2
    acc = x_q.astype(np.int64) @ w.astype(np.int64)            # exact
    g = acc[:, :inter].astype(np.float64) * scales[:inter]
    u = acc[:, inter:].astype(np.float64) * scales[inter:]
    y = g / (1 + np.exp(-g)) * u
    return np.clip(np.round(y / qs), -128, 127).astype(np.int8)


@pytest.mark.parametrize("m,k,inter", [(256, 512, 1024), (32, 256, 512)])
def test_kernel_matches_oracle(m, k, inter):
    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, size=(m, k)).astype(np.int8)
    w = rng.integers(-127, 128, size=(k, 2 * inter)).astype(np.int8)
    scales = (rng.uniform(0.5, 2.0, size=2 * inter) * 1e-4).astype(np.float32)
    qs = np.float32(3e-3)
    assert fused_mlp_supported(m, k, inter)
    got = np.asarray(fused_mlp_int8(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(scales), jnp.asarray(qs),
        interpret=True))
    want = _oracle(x, w, scales.astype(np.float64), float(qs))
    # f32 kernel vs f64 oracle can differ by one quantum at round boundaries
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1
    assert (got == want).mean() > 0.995


def test_unsupported_shapes_rejected():
    assert not fused_mlp_supported(8, 512, 1024)      # decode-sized M
    assert not fused_mlp_supported(256, 500, 1024)    # K not 128-aligned
    assert not fused_mlp_supported(256, 512, 1000)    # I not 128-aligned


def test_end_to_end_matches_unfused(monkeypatch):
    """ASQ_FUSED_MLP=force through the quantized Llama per-tensor decode
    path must agree with the unfused path (same greedy tokens; the kernel
    computes silu from exact int32 accumulators so logits match to fp
    tolerance)."""
    from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize
    from autosmoothquant_tpu.models import llama as L
    from autosmoothquant_tpu.quant.config import QuantConfig

    cfg = L.LlamaConfig(vocab_size=128, hidden_size=128, intermediate_size=256,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, max_position_embeddings=128)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    calib = [rng.integers(1, 128, size=(2, 16)).astype(np.int32)
             for _ in range(2)]
    qcfg = QuantConfig(type="int8")
    qparams, _ = calibrate_smooth_quantize(L, params, cfg, qcfg,
                                           lambda: iter(calib))
    qparams = L.fuse_decode_projections(qparams)
    ids = jnp.asarray(rng.integers(1, 128, size=(2, 32)), jnp.int32)

    def logits(fused: str):
        monkeypatch.setenv("ASQ_FUSED_MLP", fused)
        monkeypatch.setenv("ASQ_FUSED_BLOCK", "force")
        h, _, _ = jax.jit(lambda p, i: L.forward(
            p, i, cfg, qcfg, compute_dtype=jnp.float32))(qparams, ids)
        return np.asarray(L.logits(qparams, h), np.float32)

    a = logits("off")
    b = logits("force")
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
    assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.95
