"""Pallas MXU matmul over nibble-packed int4 weights (W4A16 decode path).

Beyond the reference (AutoSmoothQuant stops at int8/fp8): a weight-only
4-bit deployment format built TPU-first. Single-chip decode is weight-HBM
bound (BENCHMARKS.md "13B single-chip": int8 runs at ~97% of the
bytes/bandwidth estimate), so halving the weight stream is worth ~2x at
batch 1 — IF the packed bytes are what actually crosses HBM. That rules
out "dequantize then dot" at the XLA level (it materializes a bf16 weight
tensor per call, 4x the packed bytes): the kernel must read the PACKED
tile, unpack + scale on the VPU while it is in VMEM, and feed the MXU.

Layout contract (quant/math.py:quantize_weight_int4_grouped):
  packed  uint8 [K//2, N]  byte k = row 2k (low nibble) | row 2k+1 (high)
  scales  f32   [K//g, N]  symmetric per-(group, column), g even
Rows 2k/2k+1 share a group, so one broadcast scale row covers both nibbles
and the kernel NEVER interleaves the big operand. The activation is split
even/odd OUTSIDE the kernel (x[:, 0::2] / x[:, 1::2] — a cheap strided
slice of the small [M, K] operand) so

    acc += x_even @ (lo * s)  +  x_odd @ (hi * s)

needs only contiguous tiles of the weight stream.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..runtime import flags


def _unpack_scaled(p_u8, s_tile, group: int, dtype):
    """uint8 packed tile [bk/2, bn] + scales [bk/g, bn] -> (lo, hi) weight
    tiles [bk/2, bn] in ``dtype`` with group scales applied."""
    p = p_u8.astype(jnp.int32)
    lo = p & 0xF
    hi = (p >> 4) & 0xF
    lo = lo - ((lo & 0x8) << 1)
    hi = hi - ((hi & 0x8) << 1)
    srep = jnp.repeat(s_tile, group // 2, axis=0)  # [bk/2, bn]
    return ((lo.astype(jnp.float32) * srep).astype(dtype),
            (hi.astype(jnp.float32) * srep).astype(dtype))


def _int4_matmul_kernel(xe_ref, xo_ref, p_ref, s_ref, *rest, group,
                        activation, out_dtype, has_bias, scale_in_epilogue):
    if has_bias:
        b_ref, o_ref, acc_ref = rest
    else:
        o_ref, acc_ref = rest
        b_ref = None
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dn = (((1,), (0,)), ((), ()))
    if scale_in_epilogue:
        # decode variant: the [bk/2, bn] weight tile gets ONLY unpack +
        # convert (2 int ops + 1 cast per nibble); the per-group scale
        # multiplies the tiny [bm, bn] partial instead. The weight stream
        # stays near the packed-bytes speed-of-light at small M.
        p = p_ref[...].astype(jnp.int32)
        wlo = (((p & 0xF) ^ 8) - 8).astype(xe_ref.dtype)
        whi = (((p >> 4) ^ 8) - 8).astype(xe_ref.dtype)
        s = s_ref[...]
        h = group // 2
        for gi in range(s.shape[0]):
            part = jax.lax.dot_general(
                xe_ref[:, gi * h:(gi + 1) * h], wlo[gi * h:(gi + 1) * h],
                dn, preferred_element_type=jnp.float32)
            part += jax.lax.dot_general(
                xo_ref[:, gi * h:(gi + 1) * h], whi[gi * h:(gi + 1) * h],
                dn, preferred_element_type=jnp.float32)
            acc_ref[...] += part * s[gi:gi + 1, :]
    else:
        # prefill variant: scale the weight tile once so each group needs no
        # separate dot — full-k MXU passes win when M is large enough that
        # the dots, not the weight stream, are the cost
        wlo, whi = _unpack_scaled(p_ref[...], s_ref[...], group, xe_ref.dtype)
        acc_ref[...] += jax.lax.dot_general(
            xe_ref[...], wlo, dn, preferred_element_type=jnp.float32)
        acc_ref[...] += jax.lax.dot_general(
            xo_ref[...], whi, dn, preferred_element_type=jnp.float32)

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _done():
        out = acc_ref[...]
        if has_bias:
            out = out + b_ref[...]
        if activation == "silu":
            out = out * jax.nn.sigmoid(out)
        elif activation == "relu":
            out = jnp.maximum(out, 0.0)
        o_ref[...] = out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "activation", "out_dtype",
                     "block_m", "block_n", "block_k", "interpret",
                     "scale_in_epilogue"),
)
def _int4_matmul_pallas(xe, xo, packed, scales, bias=None, *, group,
                        activation=None, out_dtype=jnp.bfloat16,
                        block_m, block_n, block_k, interpret=False,
                        scale_in_epilogue=True):
    m, k2 = xe.shape
    _, n = packed.shape
    grid = (m // block_m, n // block_n, (2 * k2) // block_k)
    kernel = functools.partial(
        _int4_matmul_kernel, group=group, activation=activation,
        out_dtype=out_dtype, has_bias=bias is not None,
        scale_in_epilogue=scale_in_epilogue)
    hk = block_k // 2
    in_specs = [
        pl.BlockSpec((block_m, hk), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((block_m, hk), lambda i, j, kk: (i, kk)),
        pl.BlockSpec((hk, block_n), lambda i, j, kk: (kk, j)),
        pl.BlockSpec((block_k // group, block_n), lambda i, j, kk: (kk, j)),
    ]
    args = [xe, xo, packed, scales]
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
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * 2 * k2,
            bytes_accessed=(2 * m * k2 * xe.dtype.itemsize + k2 * n
                            + m * n * jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def _pick_blocks(m: int, n: int, k: int, group: int):
    """Static tile pick. block_k must be a multiple of the scale group (so a
    scale tile covers whole groups) and even; block_n divides N on lane
    boundaries. Returns None when the shape can't tile (→ XLA fallback)."""
    if k % (2 * group) or n % 128:
        return None
    bm = 8
    while bm < min(m, 256):
        bm *= 2
    if m % bm:
        bm = 8 if m % 8 == 0 else None
        if bm is None:
            return None
    for bn in (512, 256, 128):
        if n % bn == 0:
            break
    else:
        return None
    bk = group
    while bk * 2 <= min(k, 2048) and k % (bk * 2) == 0:
        bk *= 2
    if k % bk:
        return None
    return bm, bn, bk


def int4_matmul_xla(x, packed, scales, group: int, bias=None, *,
                    activation=None, out_dtype=None):
    """Reference/fallback path: unpack + scale in XLA then a bf16 dot.
    Correct everywhere (CPU test mesh included); materializes the bf16
    weights, so it pays ~4x the packed HBM bytes — the Pallas kernel is the
    production path on TPU."""
    from ..quant.math import unpack_int4

    if out_dtype is None:
        out_dtype = x.dtype
    k = x.shape[-1]
    lo, hi = unpack_int4(packed)
    srep = jnp.repeat(scales, group // 2, axis=0)
    # CPU's dot thunk lacks bf16 x bf16 -> f32; upcast off-TPU
    cdt = jnp.bfloat16 if (x.dtype == jnp.bfloat16
                           and jax.default_backend() == "tpu") else jnp.float32
    wlo = (lo.astype(jnp.float32) * srep).astype(cdt)
    whi = (hi.astype(jnp.float32) * srep).astype(cdt)
    dn = (((1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(x[:, 0::2].astype(cdt), wlo, dn,
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(x[:, 1::2].astype(cdt), whi, dn,
                               preferred_element_type=jnp.float32)
    if bias is not None:
        acc = acc + bias.reshape(1, -1).astype(jnp.float32)
    if activation == "silu":
        acc = acc * jax.nn.sigmoid(acc)
    elif activation == "relu":
        acc = jnp.maximum(acc, 0.0)
    return acc.astype(out_dtype)


def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scales: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None, *,
                activation: Optional[str] = None, out_dtype=None,
                use_pallas: Optional[bool] = None,
                interpret: bool = False) -> jnp.ndarray:
    """``x @ dequant(packed, scales) (+ bias)`` with x float [M, K], packed
    uint8 [K/2, N], scales f32 [K/group, N] (group inferred from shapes)."""
    assert packed.dtype == jnp.uint8
    m, k = x.shape
    k2, n = packed.shape
    assert k == 2 * k2, f"inner dims mismatch: {x.shape} @ packed {packed.shape}"
    group = k // scales.shape[0]
    if out_dtype is None:
        out_dtype = x.dtype

    # decode shapes (M=1..7): pad rows to the 8-sublane tile so the kernel
    # applies; the padded rows are zeros and sliced off after
    pad_m = (-m) % 8
    if pad_m and jax.default_backend() == "tpu" and flags().int4_backend != "xla":
        out = int4_matmul(
            jnp.concatenate([x, jnp.zeros((pad_m, k), x.dtype)], axis=0),
            packed, scales, bias, activation=activation, out_dtype=out_dtype,
            use_pallas=use_pallas, interpret=interpret)
        return out[:m]

    blocks = _pick_blocks(m, n, k, group)
    if use_pallas is None:
        backend = flags().int4_backend
        want = backend != "xla"
        use_pallas = want and jax.default_backend() == "tpu" and blocks is not None
    if use_pallas and blocks is not None:
        bm, bn, bk = blocks
        cdt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
        xe = x[:, 0::2].astype(cdt)
        xo = x[:, 1::2].astype(cdt)
        b = bias.reshape(1, n).astype(jnp.float32) if bias is not None else None
        return _int4_matmul_pallas(
            xe, xo, packed, scales, b, group=group, activation=activation,
            out_dtype=out_dtype, block_m=bm, block_n=bn, block_k=bk,
            interpret=interpret, scale_in_epilogue=m <= 64)
    return int4_matmul_xla(x, packed, scales, group, bias,
                           activation=activation, out_dtype=out_dtype)
