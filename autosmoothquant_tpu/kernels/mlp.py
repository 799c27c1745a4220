"""Fused int8 MLP-up kernel: silu(x@Wg) * (x@Wu) -> int8, one HBM pass.

The per-tensor decode/prefill path computes gate|up with ONE int8 GEMM over
the fused [K, 2I] weight, then silu-multiplies in fp and re-quantizes for
the (SCALED, per-tensor) down projection. XLA materializes the [M, 2I]
fp intermediate in HBM and re-reads it; this kernel keeps both accumulators
in VMEM and writes only the final int8 [M, I] activation — the complete
TPU realization of the epilogue menu the reference's CUTLASS tree promised
(ref: csrc/kernels/linear.cu silu/requant epilogues, never wired there).

out[m, j] = clamp(round(silu(acc_g[m,j] * sg[j]) * acc_u[m,j] * su[j] / qs))

where acc_g/acc_u are int32 x@Wg / x@Wu accumulators, sg/su the per-column
dequant scales of the fused weight's two halves, qs the down projection's
static input quant scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_mlp_kernel(x_ref, wg_ref, wu_ref, sg_ref, su_ref, qs_ref, o_ref,
                      accg_ref, accu_ref):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        accg_ref[...] = jnp.zeros_like(accg_ref)
        accu_ref[...] = jnp.zeros_like(accu_ref)

    x = x_ref[...]
    accg_ref[...] += jax.lax.dot_general(
        x, wg_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    accu_ref[...] += jax.lax.dot_general(
        x, wu_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _done():
        g = accg_ref[...].astype(jnp.float32) * sg_ref[...]
        u = accu_ref[...].astype(jnp.float32) * su_ref[...]
        y = g * jax.nn.sigmoid(g) * u
        q = jnp.round(y / qs_ref[0])
        o_ref[...] = jnp.clip(q, -128, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "interpret"))
def fused_mlp_int8(x_q: jnp.ndarray, w_gateup: jnp.ndarray,
                   col_scales: jnp.ndarray, quant_scale: jnp.ndarray, *,
                   block_m: int = 512, block_n: int = 512,
                   block_k: int = 2048, interpret: bool = False) -> jnp.ndarray:
    """x_q int8 [M, K]; w_gateup int8 [K, 2I] (gate columns first);
    col_scales f32 [2I]; quant_scale f32 scalar. Returns int8 [M, I]."""
    m, k = x_q.shape
    _, n2 = w_gateup.shape
    inter = n2 // 2
    block_m = min(block_m, m)
    block_n = min(block_n, inter)
    block_k = min(block_k, k)
    n_off = inter // block_n  # up half's block offset in the fused weight
    sc = col_scales.reshape(1, n2).astype(jnp.float32)
    qs = jnp.reshape(quant_scale, (1,)).astype(jnp.float32)
    grid = (m // block_m, inter // block_n, k // block_k)
    return pl.pallas_call(
        _fused_mlp_kernel,
        out_shape=jax.ShapeDtypeStruct((m, inter), jnp.int8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
                pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
                pl.BlockSpec((block_k, block_n),
                             lambda i, j, kk, o=n_off: (kk, j + o)),
                pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
                pl.BlockSpec((1, block_n), lambda i, j, kk, o=n_off: (0, j + o)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((block_m, block_n),
                                   lambda i, j, kk: (i, j)),
            scratch_shapes=[
                pltpu.VMEM((block_m, block_n), jnp.int32),
                pltpu.VMEM((block_m, block_n), jnp.int32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * inter * k,
            bytes_accessed=m * k + k * n2 + m * inter,
            transcendentals=m * inter,
        ),
        interpret=interpret,
    )(x_q, w_gateup, w_gateup, sc, sc, qs)


def fused_mlp_supported(m: int, k: int, inter: int,
                        block_m: int = 512, block_n: int = 512,
                        block_k: int = 2048) -> bool:
    bm, bn, bk = min(block_m, m), min(block_n, inter), min(block_k, k)
    if bm < 32 or bn % 128 or bk % 128:
        return False
    return m % bm == 0 and inter % bn == 0 and k % bk == 0
