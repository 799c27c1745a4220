"""Pallas MXU int8 GEMM family with fused dequant epilogues.

TPU-native replacement for the reference's native GEMM stack:
  - csrc/int8gemm/cublasINT8MMWrapper.cc:224-354 (linear_a8_w8_o32_, the one
    entry point the Python layers actually call, layers/nn/linear.py:103)
  - csrc/kernels/linear.cu:13-491 (CUTLASS epilogue menu: +bias, x alpha,
    ReLU fuse, int8 requant) — here a single kernel core with epilogue flags.

Design: one K-tiled int8 x int8 -> int32 kernel on a (M/bm, N/bn, K/bk) grid
with an int32 VMEM accumulator; the dequant epilogue

    out = acc * row_scale[M,1] * col_scale[1,N] (+ bias[1,N]) (relu?) (requant?)

runs on the final K step while the tile is still in VMEM/registers. Per-token
activation scales are the row vector, per-channel / per-section weight scales
the column vector — scales never touch the host (the reference's per-call
``.item()`` syncs, linear.py:93-96, are an anti-pattern on TPU).

Unaligned shapes fall back to an XLA int8 dot_general (still MXU int8; XLA
fuses the scale multiply) so every shape works on every backend, including the
CPU test mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tuning import pallas_wins, pick_blocks

import os

from ..runtime import flags  # runtime kernel gates (env-seeded)

INT8_MIN = -128.0
INT8_MAX = 127.0


def _epilogue(acc_f32, row_scale, col_scale, bias, activation, out_dtype):
    out = acc_f32 * row_scale * col_scale
    if bias is not None:
        out = out + bias
    if activation == "relu":
        out = jnp.maximum(out, 0.0)
    elif activation == "silu":
        out = out * jax.nn.sigmoid(out)
    if out_dtype == jnp.int8:
        out = jnp.clip(jnp.round(out), INT8_MIN, INT8_MAX)
    return out.astype(out_dtype)


def _int8_matmul_kernel(x_ref, w_ref, rs_ref, cs_ref, *rest, activation, out_dtype,
                        has_bias):
    if has_bias:
        b_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest
        b_ref = None
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...],
        w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _done():
        o_ref[...] = _epilogue(
            acc_ref[...].astype(jnp.float32),
            rs_ref[...],
            cs_ref[...],
            b_ref[...] if has_bias else None,
            activation,
            out_dtype,
        )


@functools.partial(
    jax.jit,
    static_argnames=("activation", "out_dtype", "block_m", "block_n", "block_k", "interpret"),
)
def _int8_matmul_pallas(x_q, w_q, row_scale, col_scale, bias=None, *,
                        activation=None, out_dtype=jnp.float32,
                        block_m, block_n, block_k, interpret=False):
    m, k = x_q.shape
    _, n = w_q.shape
    grid = (m // block_m, n // block_n, k // block_k)
    kernel = functools.partial(
        _int8_matmul_kernel,
        activation=activation,
        out_dtype=out_dtype,
        has_bias=bias is not None,
    )
    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
        pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0)),
        pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
    ]
    args = [x_q, w_q, row_scale, col_scale]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)))
        args.append(bias)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + k * n + m * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def int8_matmul_xla(x_q: jnp.ndarray, w_q: jnp.ndarray) -> jnp.ndarray:
    """int8 x int8 -> int32 via XLA dot_general (MXU int8 mode on TPU).
    Oracle for kernel tests and fallback for unaligned shapes / CPU."""
    return jax.lax.dot_general(
        x_q,
        w_q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _as_row_scale(row_scale, m):
    rs = jnp.asarray(row_scale, jnp.float32)
    if rs.ndim == 0:
        rs = jnp.full((m, 1), rs, jnp.float32)
    return rs.reshape(m, 1)


def _as_col_scale(col_scale, n):
    cs = jnp.asarray(col_scale, jnp.float32)
    if cs.ndim == 0:
        cs = jnp.full((1, n), cs, jnp.float32)
    return cs.reshape(1, n)


def int8_matmul(x_q: jnp.ndarray, w_q: jnp.ndarray,
                row_scale=1.0, col_scale=1.0, bias: Optional[jnp.ndarray] = None,
                *, activation: Optional[str] = None, out_dtype=jnp.float32,
                use_pallas: Optional[bool] = None,
                interpret: bool = False) -> jnp.ndarray:
    """Dequantizing int8 matmul: ``(x_q @ w_q) * row_scale * col_scale + bias``.

    x_q: int8 [M, K]; w_q: int8 [K, N]; row_scale: f32 scalar or [M]/[M,1];
    col_scale: f32 scalar or [N]/[1,N]; bias: f32 [N] or None;
    out_dtype int8 adds the round+clamp requant epilogue (the CUTLASS o8
    variants, csrc/kernels/linear.cu:linear_a8_w8_b8_o8).
    """
    assert x_q.dtype == jnp.int8 and w_q.dtype == jnp.int8
    m, k = x_q.shape
    k2, n = w_q.shape
    assert k == k2, f"inner dims mismatch: {x_q.shape} @ {w_q.shape}"

    blocks = pick_blocks(m, n, k)
    if use_pallas is None:
        # Backend policy (ASQ_INT8_BACKEND): "auto" uses the Pallas kernel on
        # shapes where the offline autotune table measured it faster than
        # XLA's int8 dot (traffic-minimizing big tiles win on prefill-sized
        # GEMMs; XLA keeps small/decode shapes), "pallas"/"xla" force one.
        backend = flags().int8_backend
        want = backend == "pallas" or (backend == "auto"
                                       and pallas_wins(m, n, k))
        use_pallas = (
            want and jax.default_backend() == "tpu" and blocks is not None
        )
    if use_pallas and blocks is not None:
        bm, bn, bk = blocks
        rs = _as_row_scale(row_scale, m)
        cs = _as_col_scale(col_scale, n)
        b = bias.reshape(1, n).astype(jnp.float32) if bias is not None else None
        return _int8_matmul_pallas(
            x_q, w_q, rs, cs, b,
            activation=activation, out_dtype=out_dtype,
            block_m=bm, block_n=bn, block_k=bk, interpret=interpret,
        )

    # XLA fallback: same math, compiler-fused epilogue.
    acc = int8_matmul_xla(x_q, w_q).astype(jnp.float32)
    out = acc * _as_row_scale(row_scale, m) * _as_col_scale(col_scale, n)
    if bias is not None:
        out = out + bias.reshape(1, n).astype(jnp.float32)
    if activation == "relu":
        out = jnp.maximum(out, 0.0)
    elif activation == "silu":
        out = out * jax.nn.sigmoid(out)
    if out_dtype == jnp.int8:
        out = jnp.clip(jnp.round(out), INT8_MIN, INT8_MAX)
    return out.astype(out_dtype)


def w8a8_linear_int8(x_q: jnp.ndarray, w_q: jnp.ndarray, dequant_scale,
                     bias: Optional[jnp.ndarray] = None, out_dtype=jnp.float32,
                     per_token_scale=None) -> jnp.ndarray:
    """The reference's single live GEMM entry point, TPU-style:
    linear_a8_w8_o32_ + python-side dequant (ref: layers/nn/linear.py:96-105)
    collapsed into one fused call.

    dequant_scale: scalar (weight_scale, or input_scale*weight_scale for
    per-tensor) — broadcast as col_scale; per_token_scale: [M,1] dynamic
    activation scales or None.
    """
    row = per_token_scale if per_token_scale is not None else 1.0
    return int8_matmul(
        x_q, w_q, row_scale=row, col_scale=dequant_scale, bias=bias,
        out_dtype=out_dtype,
    )


@functools.lru_cache(maxsize=4)
def _fp8_dot_native_supported(dtype_name: str) -> bool:
    """One-time probe: can THIS backend compile + run a dot_general with fp8
    operands natively? True on TPU generations with an fp8 MXU mode; v5e and
    CPU reject or mis-handle it, selecting the upcast fallback (the
    reference's easy_fp8_gemm situation, layers/nn/linear.py:336-369, whose
    native _scaled_mm path is likewise hard-disabled)."""
    import numpy as np

    if flags().fp8_native == "off":
        return False
    dtype = getattr(jnp, dtype_name)
    try:
        a = jnp.ones((16, 128), dtype)
        b = jnp.ones((128, 16), dtype)
        out = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))(a, b)
        return bool(np.isfinite(np.asarray(out)).all()
                    and np.allclose(np.asarray(out), 128.0))
    except Exception:
        return False


def fp8_matmul(x_f8: jnp.ndarray, w_f8: jnp.ndarray, row_scale=1.0, col_scale=1.0,
               bias: Optional[jnp.ndarray] = None, out_dtype=jnp.float32,
               layer=None) -> jnp.ndarray:
    """FP8 matmul with scale epilogue. Backend order: native fp8 dot (probed
    once per process; TPU gens with an fp8 MXU mode), then the Pallas
    byte-streaming kernel for decode-shaped M (kernels/fp8.py — the XLA
    upcast materializes a bf16 weight and runs at bf16 speed, measured),
    then the bf16 upcast dot.

    ``w_f8`` is [K, N] or STACKED [L, K, N] with ``layer`` the traced index
    (the model's layer scan keeps fp8 weights stacked so the Pallas kernel
    can index them via scalar prefetch — see kernels/int4.py for why a
    sliced operand would cost a full copy per step)."""
    m, _ = x_f8.shape
    n = w_f8.shape[-1]
    acc = None
    stacked = w_f8.ndim == 3
    if _fp8_dot_native_supported(jnp.dtype(x_f8.dtype).name):
        w2 = _layer_slice(w_f8, layer) if stacked else w_f8
        acc = jax.lax.dot_general(
            x_f8, w2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if acc is None:
        from .fp8 import fp8_stream_matmul

        acc = fp8_stream_matmul(x_f8, w_f8, layer)
    if acc is None:
        w2 = _layer_slice(w_f8, layer) if stacked else w_f8
        acc = jax.lax.dot_general(
            x_f8.astype(jnp.bfloat16),
            w2.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out = acc * _as_row_scale(row_scale, m) * _as_col_scale(col_scale, n)
    if bias is not None:
        out = out + bias.reshape(1, n).astype(jnp.float32)
    return out.astype(out_dtype)


def _layer_slice(w, layer):
    if w.shape[0] == 1:
        return w[0]
    return jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
