"""Pallas MXU matmul over nibble-packed int4 weights (the W4A8 decode path).

Beyond the reference (AutoSmoothQuant stops at int8/fp8): a weight-only
4-bit deployment format built TPU-first. Single-chip decode is weight-HBM
bound (BENCHMARKS.md "13B single-chip": int8 runs at ~97% of the
bytes/bandwidth estimate), so halving the weight stream is worth up to 2x
at batch 1 — IF the packed bytes are what actually crosses HBM. That rules
out "dequantize then dot" at the XLA level (it materializes a bf16 weight
tensor per call, 4x the packed bytes): the kernel must read the PACKED
tile, unpack in VMEM, and feed the MXU.

The kernel is VPU-bound, not DMA-bound, so the design minimizes per-byte
vector work (measured on v5e at M=8, K=N=4096; int8 GEMM = 24.4us,
packed-stream floor = 13.5us):
  - signed-nibble unpack + scale the [K/2, N] tile in bf16:   21.8us
  - int-domain unpack (s8 MXU dots, scale the [M,N] partial): 18.5us
  - OFFSET-BINARY nibbles: mask/shift + s8 convert only,
    sign fix = one tiny (group_sums(x) @ scales) dot outside: 14.8us  <- this

Layout contract (quant/math.py:quantize_weight_int4_grouped):
  packed  uint8 [K//2, N]  byte r = row r (low nibble) | row r+K/2 (high),
                           nibbles stored as q+8 (offset binary, in [0,15])
  scales  f32   [K//g, N]  symmetric per-(group, column)
SPLIT-K packing means a packed row-block maps to two CONTIGUOUS unpacked
row ranges, so the activation and the scale table are addressed with plain
BlockSpec offsets (the array is simply passed twice with index maps K/2
apart) — no strided slice or interleave anywhere, and every per-group dot
runs the full group depth (g = 128 = one MXU pass).

Math (W4A8): activations are quantized per-token int8 (the same dynamic
per-token scheme as the int8 path, ref layers/nn/linear.py:248-329). The
WHOLE step is one pallas_call plus one amax reduce: the kernel quantizes
the x block in VMEM (bit-exact vs quant/math.py), runs s8 MXU dots on the
offset nibbles, and per group g accumulates
  acc += (dot_s8(x_q, n_g) - 8 * gsum_g) * s_g
(gsum_g = per-row sum of x_q over group g, a [bm, 1] reduce), then applies
tok_scale at the flush. Only the per-token absmax (spans full K, can't
live in a k-blocked kernel) and bias/activation stay in XLA. Measured at
M=8 K=N=4096 on v5e: 15.7us vs int8 22.2us (1.41x) — the epilogue-outside
variant was 22.2us, glue-bound; packed-stream floor is 13.5us.

Large-M (prefill-shaped, M > 64) calls run the XLA fallback: prefill is
MXU-bound, dequantize+dot amortizes the unpack over many rows, and the
former in-kernel bf16 (W4A16) variant materialized [hk, bn] dequantized
tiles on Mosaic's 16 MB scoped-VMEM stack — 22-28 MB at 7B/13B prefill
shapes — for no measured win (pruned round 4). The XLA fallback
reproduces the same per-group integer math exactly (integer dots are
exact in f32 up to 2^24).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..runtime import flags

# M at or below this uses the W4A8 per-group-dot Pallas kernel
# (weight-stream bound); above it the XLA fallback (MXU bound).
_A8_MAX_M = 64


def _int4_kernel_a8(l_ref, xl_ref, xh_ref, ts_ref, p_ref, s_ref, o_ref,
                    acc_ref, *, group, gb, ghalf):
    """Fused W4A8 step: per-token act quant, offset-nibble unpack, s8 MXU
    dots, group scales and the -8 offset correction all in VMEM. The only
    XLA work left outside is the per-token absmax reduce (the quant scale
    spans full K, so it cannot live in a k-blocked kernel) and the final
    bias/activation elementwise.

    ``s_ref`` holds ALL group rows for this column block ([G, bn], constant
    across the k grid so it is fetched once per (i, j)); the k-step's rows
    are selected with a one-hot dot (static shapes, no dynamic sublane
    slicing — Mosaic cannot prove alignment for arbitrary gb, and a
    (gb, bn) BlockSpec would require gb % 8 == 0, which llama-7B's
    down_proj K=11008 violates with gb = 1)."""
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dn = (((1,), (0,)), ((), ()))
    ts = ts_ref[:, :1]                                  # [bm, 1] f32
    # same op order as quant/math.py:quantize_act_per_token (f32 divide,
    # round-half-even, clamp) so the kernel is bit-exact vs the XLA path
    ql = jnp.clip(jnp.round(xl_ref[...].astype(jnp.float32) / ts),
                  -128.0, 127.0).astype(jnp.int8)
    qh = jnp.clip(jnp.round(xh_ref[...].astype(jnp.float32) / ts),
                  -128.0, 127.0).astype(jnp.int8)
    p = p_ref[0].astype(jnp.int32)
    lo = (p & 0xF).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    sl_step, sh_step = _select_scales(s_ref, k_idx, gb, ghalf)
    for gi in range(gb):
        r = slice(gi * group, (gi + 1) * group)
        sl = sl_step[gi:gi + 1, :]
        sh = sh_step[gi:gi + 1, :]
        xg = ql[:, r]
        part = jax.lax.dot_general(xg, lo[r], dn,
                                   preferred_element_type=jnp.int32)
        gsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[...] += (part.astype(jnp.float32) - 8.0 * gsum) * sl
        xg = qh[:, r]
        part = jax.lax.dot_general(xg, hi[r], dn,
                                   preferred_element_type=jnp.int32)
        gsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[...] += (part.astype(jnp.float32) - 8.0 * gsum) * sh

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _done():
        o_ref[...] = acc_ref[...] * ts    # tok_scale folded into the flush


def _select_scales(s_ref, k_idx, gb, ghalf):
    """[gb, bn] lo/hi scale rows for k-step ``k_idx``, gathered from the
    resident [1, G, bn] table block with a one-hot f32 dot (static shapes;
    ~gb*G*bn MACs, ~group x smaller than the step's weight dots)."""
    G = s_ref.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (gb, G), 1)
    rows = k_idx * gb + jax.lax.broadcasted_iota(jnp.int32, (gb, G), 0)
    s_all = s_ref[0]
    dn = (((1,), (0,)), ((), ()))
    sl = jax.lax.dot_general((cols == rows).astype(jnp.float32), s_all, dn,
                             preferred_element_type=jnp.float32)
    sh = jax.lax.dot_general((cols == rows + ghalf).astype(jnp.float32),
                             s_all, dn, preferred_element_type=jnp.float32)
    return sl, sh


@functools.partial(
    jax.jit,
    static_argnames=("group", "block_m", "block_n", "block_hk", "interpret",
                     "a8"),
)
def _int4_matmul_pallas(x, packed, scales, tok_scale=None, layer=None, *,
                        group, block_m, block_n, block_hk, interpret=False,
                        a8=True):
    """[M, N] f32 matmul result (bias/activation applied by the caller).
    ``x``: [M, K] float; for a8, ``tok_scale`` is the [M, 1] per-token quant
    scale — quantization AND the tok_scale flush both happen in-kernel.
    block_hk = packed rows per k-step (multiple of group).

    ``packed``/``scales`` are STACKED [L, K/2, N] / [L, G, N] with ``layer``
    the traced index to use (scalar-prefetched into the BlockSpec index
    maps). This is how the kernel runs under the model's layer scan without
    copying: a plain dynamic_slice feeding a pallas_call must be
    materialized by XLA (custom-call operands can't fuse), which would
    re-write every layer's packed bytes each step — the index maps instead
    DMA blocks straight out of the stacked array. Single-weight callers
    reshape to L=1 (free) and pass layer=0."""
    m, k = x.shape
    nl, k2, n = packed.shape
    kt = k2 // block_hk  # k-grid length; also the block offset of the high plane
    grid = (m // block_m, n // block_n, kt)
    gb = block_hk // group
    ghalf = scales.shape[1] // 2   # hi-plane row offset in the scale table
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    x_specs = [
        pl.BlockSpec((block_m, block_hk), lambda i, j, kk, L: (i, kk)),
        pl.BlockSpec((block_m, block_hk),
                     lambda i, j, kk, L, kt=kt: (i, kk + kt)),
    ]
    w_specs = [
        pl.BlockSpec((1, block_hk, block_n),
                     lambda i, j, kk, L: (L[0], kk, j)),
        # full scale table rows for this column block (constant in kk)
        pl.BlockSpec((1, scales.shape[1], block_n),
                     lambda i, j, kk, L: (L[0], 0, j)),
    ]
    assert a8, "the Pallas path is decode-only (W4A8); prefill runs XLA"
    kern = functools.partial(_int4_kernel_a8, group=group, gb=gb,
                             ghalf=ghalf)
    ts = jnp.broadcast_to(tok_scale.astype(jnp.float32), (m, 128))
    in_specs = x_specs + [
        pl.BlockSpec((block_m, 128), lambda i, j, kk, L: (i, 0))] + w_specs
    operands = (lidx, x, x, ts, packed, scales)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_m, block_n),
                                   lambda i, j, kk, L: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * x.dtype.itemsize + k2 * n + 4 * m * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _pick_blocks(m: int, n: int, k: int, group: int):
    """Static tile pick. The packed-row block must cover whole groups;
    block_n divides N on lane boundaries. Returns (bm, bn, block_hk) or
    None when the shape can't tile (→ XLA fallback).

    Tile policy (v5e sweep at 13B decode shapes, BENCHMARKS.md "INT4
    tiles"): deeper k-blocks pipeline the packed DMA stream much better
    than the round-3 power-of-2 walk — e.g. K=13824 was stuck at hk=256
    (27 k-steps) because 6912 has no larger pow2 divisor; the largest
    group-multiple DIVISOR (1152/2304) more than halves the step count.
    bn=1024 similarly helps the wide-N projections when VMEM allows
    (packed block hk x bn <= ~2.5 MB)."""
    if (k // 2) % group or k % 2 or n % 128:
        return None
    bm = 8
    while bm < min(m, 256):
        bm *= 2
    if m % bm:
        if m % 8:
            return None
        bm = 8
    # joint (bn, hk) pick: hk must be a group-multiple divisor of k/2 (the
    # grid needs an integral k-step count). Deep k-blocks dominate the win
    # (v5e sweep), so hk is the primary score and bn breaks ties — e.g.
    # K=11008 (k/2 = 43 groups, 43 prime) is far better as one full-depth
    # 2.8 MB block at bn=512 than as 43 shallow steps at bn=1024. The
    # whole working set must respect Mosaic's 16 MB scoped-VMEM stack:
    # double-buffered x planes (x2), packed block, full scale-table block,
    # out block, plus the acc scratch — budgeted at 10 MB (13B prefill at
    # bm=128/hk=2560/bn=1024 compiled to a 28 MB stack without this).
    nd = (k // 2) // group
    g_rows = nd * 2  # scale table rows resident per (i, j): lo+hi planes

    def vmem_est(bm_, bn_, hk_):
        xblk = bm_ * hk_ * 4 * 2          # two split-K planes, f32 worst
        pblk = hk_ * bn_                  # packed uint8
        sblk = g_rows * bn_ * 4           # full scale table block
        oblk = bm_ * bn_ * 4
        return 2 * (xblk + pblk + sblk + oblk) + oblk

    budget = 10 * 1024 * 1024
    best = None
    for bn in (1024, 512, 256, 128):
        if n % bn or (bn == 1024 and n < 4096):
            continue
        hk = None
        for d in range(1, nd + 1):
            cand = group * d
            # x-plane blocks are [bm, hk]: Mosaic requires the minor dim be
            # a 128-lane multiple (or the full array dim, impossible here
            # since hk <= k/2)
            if (nd % d == 0 and cand % 128 == 0
                    and vmem_est(bm, bn, cand) <= budget):
                hk = cand
        if hk is None:
            continue
        if best is None or (hk, bn) > (best[2], best[1]):
            best = (bm, bn, hk)
    return best


def _epilogue(out, bias, activation, out_dtype):
    if bias is not None:
        out = out + bias.reshape(1, -1).astype(jnp.float32)
    if activation == "silu":
        out = out * jax.nn.sigmoid(out)
    elif activation == "relu":
        out = jnp.maximum(out, 0.0)
    return out.astype(out_dtype)


def _quant_acts(x):
    from ..quant.math import quantize_act_per_token

    return quantize_act_per_token(x)


def int4_matmul_xla(x, packed, scales, group: int, bias=None, *,
                    activation=None, out_dtype=None, a8: Optional[bool] = None,
                    tok_scale=None):
    """Fallback path (CPU / unaligned shapes): reproduces the kernel's math
    with XLA ops. a8=True mirrors the W4A8 per-group integer accumulation
    (exact: integer dots in f32 stay exact below 2^24); a8=False mirrors
    the bf16 W4A16 variant. Materializes unpacked weights, so on TPU the
    Pallas kernel is the production path. ``tok_scale`` overrides the
    per-token act-quant scale (row-parallel TP quantizes against the
    GLOBAL per-token absmax so shards stay bit-consistent)."""
    from ..quant.math import unpack_int4

    if out_dtype is None:
        out_dtype = x.dtype
    m, k = x.shape
    if a8 is None:
        a8 = m <= _A8_MAX_M
    lo, hi = unpack_int4(packed)                       # signed split-K planes
    n = packed.shape[1]
    G = scales.shape[0]
    wq = jnp.concatenate([lo, hi], axis=0)             # [K, N] int8
    if a8:
        if tok_scale is not None:
            from ..quant.math import quantize_act_static_per_token

            q = quantize_act_static_per_token(x.reshape(m, k), tok_scale)
        else:
            q, tok_scale = _quant_acts(x.reshape(m, k))
        xg = q.reshape(m, G, k // G).astype(jnp.float32)
        wg = wq.reshape(G, k // G, n).astype(jnp.float32)
        part = jnp.einsum("mgk,gkn->mgn", xg, wg)      # exact int values
        out = jnp.sum(part * scales[None, :, :], axis=1) * tok_scale
        return _epilogue(out, bias, activation, out_dtype)
    srep = jnp.repeat(scales, group, axis=0)
    cdt = jnp.bfloat16 if (x.dtype == jnp.bfloat16
                           and jax.default_backend() == "tpu") else jnp.float32
    wf = (wq.astype(jnp.float32) * srep).astype(cdt)
    acc = jax.lax.dot_general(x.astype(cdt), wf, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return _epilogue(acc, bias, activation, out_dtype)


def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scales: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None, *,
                activation: Optional[str] = None, out_dtype=None,
                use_pallas: Optional[bool] = None,
                interpret: bool = False, layer=None,
                tok_scale=None, a8: Optional[bool] = None) -> jnp.ndarray:
    """``x @ dequant(packed, scales) (+ bias)`` with x float [M, K], packed
    uint8 [K'/2, N] split-K offset nibbles, scales f32 [K'/group, N] (group
    inferred from shapes). K' >= K is the zero-padded storage depth chosen
    by quant.math.int4_padded_k; x is zero-padded to match here (exact:
    zero activations quantize to 0 and contribute nothing). Decode-shaped M
    quantizes activations per-token int8 (W4A8); prefill-shaped M runs bf16
    (W4A16).

    Under a layer scan, pass the STACKED weights (packed [L, K'/2, N],
    scales [L, G, N]) plus the traced ``layer`` index — the Pallas kernel
    then indexes the stacked array directly (scalar-prefetched index maps),
    avoiding the full-weight copy a dynamic_slice operand would cost."""
    assert packed.dtype == jnp.uint8
    m, k = x.shape
    if packed.ndim == 2:
        packed = packed.reshape((1,) + packed.shape)      # free (metadata)
        scales = scales.reshape((1,) + scales.shape)
        layer = 0
    assert layer is not None, "stacked int4 weights require a layer index"
    nl, k2, n = packed.shape
    assert k <= 2 * k2, f"inner dims mismatch: {x.shape} @ packed {packed.shape}"
    if k < 2 * k2:
        x = jnp.concatenate(
            [x, jnp.zeros((m, 2 * k2 - k), x.dtype)], axis=1)
        k = 2 * k2
    group = k // scales.shape[1]
    if out_dtype is None:
        out_dtype = x.dtype
    if a8 is None:
        # W4A8 (per-token int8 acts) for decode-shaped M, W4A16 for
        # prefill; shard_mapped TP passes the GLOBAL decision explicitly —
        # a per-shard m would flip the route under data sharding
        a8 = m <= _A8_MAX_M

    # decode shapes (M=1..7): pad rows to the 8-sublane tile so the kernel
    # applies; padded rows are zeros and sliced off after
    pad_m = (-m) % 8
    if pad_m and jax.default_backend() == "tpu" and flags().int4_backend != "xla":
        ts_pad = None if tok_scale is None else jnp.concatenate(
            [tok_scale, jnp.ones((pad_m, 1), tok_scale.dtype)], axis=0)
        out = int4_matmul(
            jnp.concatenate([x, jnp.zeros((pad_m, k), x.dtype)], axis=0),
            packed, scales, bias, activation=activation, out_dtype=out_dtype,
            use_pallas=use_pallas, interpret=interpret, layer=layer,
            tok_scale=ts_pad, a8=a8)
        return out[:m]

    # The Pallas kernel serves DECODE-shaped calls only (M <= 64, the
    # weight-stream-bound regime where streaming packed bytes wins — 1.69x
    # at 13B/b1). Prefill-shaped M is MXU-bound: the XLA fallback's
    # dequantize+dot amortizes the unpack over many rows, and the former
    # in-kernel bf16 variant materialized [hk, bn] dequant tiles on the
    # Mosaic stack, blowing the 16 MB scoped-VMEM limit at 7B/13B shapes
    # (measured 22-28 MB stacks) for no measured win.
    blocks = _pick_blocks(m, n, k, group) if a8 else None
    if use_pallas is None:
        backend = flags().int4_backend
        want = backend != "xla"
        use_pallas = want and jax.default_backend() == "tpu" and blocks is not None
    if use_pallas and blocks is not None:
        bm, bn, hk = blocks
        if tok_scale is None:
            absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            tok_scale = jnp.maximum(absmax.astype(jnp.float32), 1e-8) / 127.0
        out = _int4_matmul_pallas(
            x, packed, scales, tok_scale, layer, group=group, block_m=bm,
            block_n=bn, block_hk=hk, interpret=interpret, a8=True)
        return _epilogue(out, bias, activation, out_dtype)
    if packed.shape[0] == 1:
        p2, s2 = packed[0], scales[0]
    else:
        p2 = jax.lax.dynamic_index_in_dim(packed, layer, 0, keepdims=False)
        s2 = jax.lax.dynamic_index_in_dim(scales, layer, 0, keepdims=False)
    return int4_matmul_xla(x, p2, s2, group, bias,
                           activation=activation, out_dtype=out_dtype, a8=a8,
                           tok_scale=tok_scale if a8 else None)
