"""Fused (residual-add + norm + int8-quantize) Pallas kernels.

TPU-native equivalent of the reference's vestigial fused CUDA op
(ref: csrc/kernels/fused.cu:5-25 dq_add_layernorm_q: int32-dequant +
residual add + layernorm + int8 requant in one kernel; Python caller
layers/functional/fused.py:5-25). On TPU the int32->fp dequant is already
fused into the GEMM epilogue (kernels/gemm.py), so the remaining fusion is

    h'   = h + x                 (residual)
    y    = norm(h') * gamma      (RMSNorm or LayerNorm, f32)
    q    = clip(round(y), -128, 127).int8   (per-tensor, scale pre-folded
                                             into gamma)

emitted in ONE pass over HBM: reads h and x once, writes h' and q once.
XLA usually fuses this chain well on its own; the kernel pins the fusion and
serves as the building block for a fully-fused per-tensor decoder block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _add_rmsnorm_quant_kernel(h_ref, x_ref, g_ref, out_h_ref, out_q_ref, *, eps):
    h = h_ref[...].astype(jnp.float32)
    x = x_ref[...].astype(jnp.float32)
    s = h + x
    out_h_ref[...] = s.astype(out_h_ref.dtype)
    var = jnp.mean(s * s, axis=-1, keepdims=True)
    y = s * jax.lax.rsqrt(var + eps) * g_ref[...].astype(jnp.float32)
    out_q_ref[...] = jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def fused_add_rmsnorm_quant(h: jnp.ndarray, x: jnp.ndarray, gamma: jnp.ndarray,
                            *, eps: float = 1e-6, block_rows: int = 256,
                            interpret: bool = False):
    """h, x: [T, D]; gamma: [D] (per-tensor input scale folded in).
    Returns (h + x in h.dtype, int8 quantized norm output)."""
    t, d = h.shape
    block_rows = min(block_rows, t)
    if t % block_rows != 0:
        # row counts are pow2-padded upstream; fall back for odd shapes
        s = h.astype(jnp.float32) + x.astype(jnp.float32)
        var = jnp.mean(s * s, axis=-1, keepdims=True)
        y = s * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32)
        return s.astype(h.dtype), jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
    grid = (t // block_rows,)
    out_h, out_q = pl.pallas_call(
        functools.partial(_add_rmsnorm_quant_kernel, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((t, d), h.dtype),
                   jax.ShapeDtypeStruct((t, d), jnp.int8)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
                pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
            ],
            out_specs=(pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
                       pl.BlockSpec((block_rows, d), lambda i: (i, 0))),
        ),
        interpret=interpret,
    )(h, x, gamma.reshape(1, d))
    return out_h, out_q


def _add_layernorm_quant_kernel(h_ref, x_ref, g_ref, b_ref, out_h_ref,
                                out_q_ref, *, eps):
    h = h_ref[...].astype(jnp.float32)
    x = x_ref[...].astype(jnp.float32)
    s = h + x
    out_h_ref[...] = s.astype(out_h_ref.dtype)
    mean = jnp.mean(s, axis=-1, keepdims=True)
    c = s - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    y = c * jax.lax.rsqrt(var + eps) * g_ref[...].astype(jnp.float32) \
        + b_ref[...].astype(jnp.float32)
    out_q_ref[...] = jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def fused_add_layernorm_quant(h: jnp.ndarray, x: jnp.ndarray,
                              gamma: jnp.ndarray, beta: jnp.ndarray, *,
                              eps: float = 1e-5, block_rows: int = 256,
                              interpret: bool = False):
    """LayerNorm variant (OPT family; gamma AND beta carry the folded input
    scale, ref models/opt.py:20-29). Returns (h + x, int8)."""
    t, d = h.shape
    block_rows = min(block_rows, t)
    if t % block_rows != 0:
        s = h.astype(jnp.float32) + x.astype(jnp.float32)
        mean = jnp.mean(s, axis=-1, keepdims=True)
        c = s - mean
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        y = c * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32) \
            + beta.astype(jnp.float32)
        return s.astype(h.dtype), jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
    grid = (t // block_rows,)
    out_h, out_q = pl.pallas_call(
        functools.partial(_add_layernorm_quant_kernel, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((t, d), h.dtype),
                   jax.ShapeDtypeStruct((t, d), jnp.int8)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
                pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
            ],
            out_specs=(pl.BlockSpec((block_rows, d), lambda i: (i, 0)),
                       pl.BlockSpec((block_rows, d), lambda i: (i, 0))),
        ),
        interpret=interpret,
    )(h, x, gamma.reshape(1, d), beta.reshape(1, d))
    return out_h, out_q
