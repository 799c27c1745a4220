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
