"""Flash-decode attention over the (optionally INT8) KV cache.

The single-token decode step is KV-bandwidth-bound at long context. The XLA
path dequantizes the whole int8 cache into a bf16 copy before attending
(int8 read + bf16 write + bf16 read ≈ 2.5 B/elt — worse than a plain bf16
cache at 2 B/elt, measured 0.93x in round-1 BENCHMARKS.md). This kernel
restores the int8 win by dequantizing INSIDE VMEM: HBM traffic is 1 B/elt
+ scales.

TPU-native design (successor to the round-1 kernel which ran at 124 GB/s):
the grid is (B, S/block_k) and each cell reads ONE fully-contiguous
[block_k, Hkv*D] slab — all kv heads at once — so the automatic Pallas
pipeline double-buffers maximal contiguous DMAs. Per-kv-head dots run as a
static unroll inside the cell (they share the slab). The round-1 version
instead put kv-heads on the grid, which made every DMA a strided read of
1/Hkv of each row and left the bus idle.

Per-row [start, length) windows support both engine layouts: left-padded
prompts (serve.engine: start = pad_len) and front-filled slots
(serve.batching: start = 0).

Replaces the capability promised by the reference's vestigial int8 BMM stack
(ref: csrc/kernels/bmm.cu:10-211 bmm_s8t_s8n_* for QK^T / PV over an int8
KV cache) — realized as one fused online-softmax kernel rather than two
BMMs with a materialized probability matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _decode_kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, starts_ref,
                   lengths_ref, o_ref, m_ref, l_ref, acc_ref, *, sm_scale,
                   block_k, hkv, groups, quantized, int8_dots):
    # starts/lengths ride as whole [B, 1] SMEM arrays indexed by program_id,
    # NOT scalar prefetch: on this environment's axon runtime a
    # PrefetchScalarGridSpec kernel nested two loop levels deep (the
    # engines' decode scan over the layer scan) hangs at execution time,
    # while the identical kernel with SMEM scalars runs fine.
    b = pl.program_id(0)
    s_idx = pl.program_id(1)
    start = starts_ref[b, 0]
    length = lengths_ref[b, 0]

    @pl.when(s_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    block_lo = s_idx * block_k

    @pl.when((block_lo < length) & (block_lo + block_k > start))
    def _run():
        d = q_ref.shape[-1]
        cols1 = (jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
                 + block_lo)
        valid1 = (cols1 >= start) & (cols1 < length)
        for h in range(hkv):  # static unroll — heads share the DMA'd slab
            # dots run in bf16 (MXU-native) with f32 accumulation for int8/
            # bf16 caches (f32 caches keep f32 dots — exactness for tests);
            # the int8 dequant scales FACTOR OUT of the [block_k, d] matrices
            # into the [*, block_k] score/probability vectors: s_j *= ks_j
            # and p_j *= vs_j — 1/d the VPU work of scaling K/V elementwise.
            # int8_dots additionally row-quantizes q and p so BOTH attention
            # matmuls run int8×int8→int32 on the MXU — the literal semantics
            # of the reference's bmm_s8t_s8n_* stack
            # (ref: csrc/kernels/bmm.cu:10-211).
            ct = jnp.float32 if k_ref.dtype == jnp.float32 else jnp.bfloat16
            rows = slice(h * groups, (h + 1) * groups)
            qf = q_ref[0, h * groups:(h + 1) * groups, :].astype(jnp.float32)
            if quantized and int8_dots:
                k8 = k_ref[0][:, h * d:(h + 1) * d]            # int8
                q_s = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True),
                                  1e-8) / 127.0                # [G, 1]
                q8 = jnp.clip(jnp.round(qf / q_s), -128, 127).astype(jnp.int8)
                acc32 = jax.lax.dot_general(
                    q8, k8, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)          # [G, block_k]
                ks_row = ks_ref[0][h:h + 1, :]                 # [1, block_k]
                s = (acc32.astype(jnp.float32) * q_s
                     * ks_row.astype(jnp.float32) * sm_scale)
            else:
                q = qf.astype(ct)
                k = k_ref[0][:, h * d:(h + 1) * d].astype(ct)
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * sm_scale
                if quantized:
                    s = s * ks_ref[0][h:h + 1, :].astype(jnp.float32)
            s = jnp.where(valid1, s, MASK_VALUE)

            m_prev, l_prev = m_ref[rows], l_ref[rows]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)
            l_ref[rows] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_ref[rows] = m_next
            if quantized:
                vs_row = vs_ref[0][h:h + 1, :]                 # [1, block_k]
                p_eff = p * vs_row.astype(jnp.float32)
                if int8_dots:
                    v8 = v_ref[0][:, h * d:(h + 1) * d]        # int8
                    p_s = jnp.maximum(
                        jnp.max(p_eff, axis=1, keepdims=True), 1e-8) / 127.0
                    p8 = jnp.clip(jnp.round(p_eff / p_s), -128,
                                  127).astype(jnp.int8)
                    pv32 = jax.lax.dot_general(
                        p8, v8, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    acc_ref[rows] = (acc_ref[rows] * alpha
                                     + pv32.astype(jnp.float32) * p_s)
                else:
                    v = v_ref[0][:, h * d:(h + 1) * d].astype(ct)
                    acc_ref[rows] = acc_ref[rows] * alpha + jax.lax.dot(
                        p_eff.astype(ct), v,
                        preferred_element_type=jnp.float32)
            else:
                v = v_ref[0][:, h * d:(h + 1) * d].astype(ct)
                acc_ref[rows] = acc_ref[rows] * alpha + jax.lax.dot(
                    p.astype(ct), v, preferred_element_type=jnp.float32)

    @pl.when(s_idx == pl.num_programs(1) - 1)
    def _store():
        l = l_ref[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_k", "interpret", "int8_dots"))
def flash_decode(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                 lengths: jnp.ndarray, *, sm_scale: float,
                 starts: jnp.ndarray = None,
                 k_scale: jnp.ndarray = None, v_scale: jnp.ndarray = None,
                 block_k: int = 512, interpret: bool = False,
                 int8_dots: bool = False) -> jnp.ndarray:
    """q: [B, Hq, D] (one token per row); k/v_cache: [B, S, Hkv, D] (bf16/f32
    or int8 with k/v_scale [B, S, Hkv]); lengths: int32 [B] end of the valid
    window (exclusive); starts: int32 [B] beginning of the valid window
    (inclusive; None = zeros — left-padded prompts set it to the pad count).
    Returns [B, Hq, D] in q.dtype. S % block_k == 0."""
    b, hq, d = q.shape
    _, s, hkv, _ = k_cache.shape
    g = hq // hkv
    block_k = min(block_k, s)
    assert s % block_k == 0 and hq % hkv == 0

    quantized = k_cache.dtype == jnp.int8
    if quantized:
        # scales ride as [B, Hkv, S]: the minor dim must be lane-aligned —
        # a [.., S, Hkv] block pads Hkv (e.g. 4) to 128 lanes in VMEM, a 32x
        # footprint/bandwidth blowup that measured 3.5x slower end-to-end
        k_scale = jnp.transpose(k_scale, (0, 2, 1))
        v_scale = jnp.transpose(v_scale, (0, 2, 1))
    else:
        # dummies keep the arg list static; blocks never read them
        k_scale = jnp.ones((b, hkv, 1), jnp.float32)
        v_scale = jnp.ones((b, hkv, 1), jnp.float32)
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)

    # [B, S, Hkv, D] -> [B, S, Hkv*D] is free (row-major); one block row is a
    # single contiguous HBM extent covering every kv head
    k2 = k_cache.reshape(b, s, hkv * d)
    v2 = v_cache.reshape(b, s, hkv * d)
    sc_blk = block_k if quantized else 1
    sc_map = (lambda bb, ss, *_: (bb, 0, ss)) if quantized \
        else (lambda bb, ss, *_: (bb, 0, 0))

    grid = (b, s // block_k)
    kernel = functools.partial(_decode_kernel, sm_scale=sm_scale,
                               block_k=block_k, hkv=hkv, groups=g,
                               quantized=quantized,
                               int8_dots=int8_dots and quantized)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, hq, d), lambda bb, ss: (bb, 0, 0)),
                pl.BlockSpec((1, block_k, hkv * d),
                             lambda bb, ss: (bb, ss, 0)),
                pl.BlockSpec((1, block_k, hkv * d),
                             lambda bb, ss: (bb, ss, 0)),
                pl.BlockSpec((1, hkv, sc_blk), sc_map),
                pl.BlockSpec((1, hkv, sc_blk), sc_map),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, hq, d), lambda bb, ss: (bb, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((hq, 1), jnp.float32),
                pltpu.VMEM((hq, 1), jnp.float32),
                pltpu.VMEM((hq, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s * d,
            bytes_accessed=2 * b * s * hkv * d * k_cache.dtype.itemsize,
            transcendentals=b * hq * s,
        ),
        interpret=interpret,
    )(q, k2, v2, k_scale, v_scale,
      starts.reshape(b, 1).astype(jnp.int32),
      lengths.reshape(b, 1).astype(jnp.int32))
    return out


def _whole_row_attend(q_ref, o_ref, k_at, v_at, ks_at, vs_at, start, length,
                      s, kdtype, *, sm_scale, hkv, groups, quantized, row=0,
                      int8_dots=False):
    """Shared whole-row attention math: no online softmax, one pass per kv
    head over the row's full [S, d] K/V slabs. k_at(h)/v_at(h) load head h's
    [S, d] slab; ks_at(h)/vs_at(h) its [1, S] dequant scales (quant caches,
    [Hkv, S] lane-aligned layout). row indexes q_ref/o_ref's leading batch
    dim (kernels whose block holds one row pass 0). int8_dots additionally
    row-quantizes q and the probabilities so BOTH attention matmuls run
    int8x8->int32 on the MXU — the literal semantics of the reference's
    bmm_s8t_s8n_* stack (ref: csrc/kernels/bmm.cu:10-211)."""
    d = q_ref.shape[-1]
    cols1 = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    valid1 = (cols1 >= start) & (cols1 < length)
    for h in range(hkv):
        ct = jnp.float32 if kdtype == jnp.float32 else jnp.bfloat16
        qf = q_ref[row, h * groups:(h + 1) * groups, :].astype(jnp.float32)
        if quantized and int8_dots:
            q_s = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True),
                              1e-8) / 127.0                     # [G, 1]
            q8 = jnp.clip(jnp.round(qf / q_s), -128, 127).astype(jnp.int8)
            acc32 = jax.lax.dot_general(
                q8, k_at(h), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)               # [G, S]
            sc = (acc32.astype(jnp.float32) * q_s * sm_scale
                  * ks_at(h).reshape(1, s).astype(jnp.float32))
        else:
            q = qf.astype(ct)
            k = k_at(h).astype(ct)
            sc = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale  # [G, S]
            if quantized:
                sc = sc * ks_at(h).reshape(1, s).astype(jnp.float32)
        sc = jnp.where(valid1, sc, MASK_VALUE)
        m = jnp.max(sc, axis=1, keepdims=True)
        p = jnp.exp(sc - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        if quantized:
            p_eff = p * vs_at(h).reshape(1, s).astype(jnp.float32)
            if int8_dots:
                p_s = jnp.maximum(jnp.max(p_eff, axis=1, keepdims=True),
                                  1e-8) / 127.0
                p8 = jnp.clip(jnp.round(p_eff / p_s), -128,
                              127).astype(jnp.int8)
                pv32 = jax.lax.dot_general(
                    p8, v_at(h), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                out = pv32.astype(jnp.float32) * p_s
            else:
                out = jax.lax.dot(p_eff.astype(ct), v_at(h).astype(ct),
                                  preferred_element_type=jnp.float32)
        else:
            out = jax.lax.dot(p.astype(ct), v_at(h).astype(ct),
                              preferred_element_type=jnp.float32)
        o_ref[row, h * groups:(h + 1) * groups, :] = (
            out / l).astype(o_ref.dtype)


def _decode_simple_kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, starts_ref,
                          lengths_ref, o_ref, *, sm_scale, hkv, groups,
                          quantized, int8_dots=False):
    """Whole-row variant: grid (B,), each cell holds the row's ENTIRE
    [S, Hkv*D] K and V in VMEM — no cross-step scratch, no online softmax,
    the structurally simplest possible formulation (built as a workaround
    candidate for the axon nested-loop hang; see BENCHMARKS.md)."""
    b = pl.program_id(0)
    start = starts_ref[b, 0]
    length = lengths_ref[b, 0]
    s = k_ref.shape[1]
    d = q_ref.shape[-1]
    _whole_row_attend(
        q_ref, o_ref,
        lambda h: k_ref[0][:, h * d:(h + 1) * d],
        lambda h: v_ref[0][:, h * d:(h + 1) * d],
        lambda h: ks_ref[0][h:h + 1, :],
        lambda h: vs_ref[0][h:h + 1, :],
        start, length, s, k_ref.dtype,
        sm_scale=sm_scale, hkv=hkv, groups=groups, quantized=quantized,
        int8_dots=int8_dots)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "interpret", "int8_dots"))
def flash_decode_simple(q: jnp.ndarray, k_cache: jnp.ndarray,
                        v_cache: jnp.ndarray, lengths: jnp.ndarray, *,
                        sm_scale: float, starts: jnp.ndarray = None,
                        k_scale: jnp.ndarray = None,
                        v_scale: jnp.ndarray = None,
                        interpret: bool = False,
                        int8_dots: bool = False) -> jnp.ndarray:
    """Same contract as flash_decode but whole-row blocks (use
    simple_supported() to check the VMEM budget first)."""
    b, hq, d = q.shape
    _, s, hkv, _ = k_cache.shape
    g = hq // hkv
    quantized = k_cache.dtype == jnp.int8
    if quantized:
        # [B, Hkv, S]: lane-aligned minor dim (see flash_decode)
        k_scale = jnp.transpose(k_scale, (0, 2, 1))
        v_scale = jnp.transpose(v_scale, (0, 2, 1))
    else:
        k_scale = jnp.ones((b, hkv, 1), jnp.float32)
        v_scale = jnp.ones((b, hkv, 1), jnp.float32)
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)
    k2 = k_cache.reshape(b, s, hkv * d)
    v2 = v_cache.reshape(b, s, hkv * d)
    sc_s = s if quantized else 1
    kernel = functools.partial(_decode_simple_kernel, sm_scale=sm_scale,
                               hkv=hkv, groups=g, quantized=quantized,
                               int8_dots=int8_dots and quantized)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, hq, d), lambda bb: (bb, 0, 0)),
                pl.BlockSpec((1, s, hkv * d), lambda bb: (bb, 0, 0)),
                pl.BlockSpec((1, s, hkv * d), lambda bb: (bb, 0, 0)),
                pl.BlockSpec((1, hkv, sc_s), lambda bb: (bb, 0, 0)),
                pl.BlockSpec((1, hkv, sc_s), lambda bb: (bb, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, hq, d), lambda bb: (bb, 0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(q, k2, v2, k_scale, v_scale,
      starts.reshape(b, 1).astype(jnp.int32),
      lengths.reshape(b, 1).astype(jnp.int32))


def _decode_layered_kernel(q_ref, k_hbm, v_hbm, ks_ref, vs_ref, layer_ref,
                           starts_ref, lengths_ref, o_ref, k_vmem, v_vmem,
                           k_sem, v_sem, *, sm_scale, hkv, groups, quantized,
                           nb, depth):
    """Layer-indexed whole-row variant: the FULL [L, B, S, Hkv*D] cache stack
    stays in HBM (memory_space=ANY) and the kernel manually DMAs each row of
    ONE layer — `cache[l, b]`, a single contiguous extent — into a
    depth-slot VMEM scratch pipeline. This removes the per-layer cache copy
    that feeding a [B, S, ...] Pallas operand from inside the layer scan
    forces XLA to materialize (a dynamic-slice of the carried cache cannot
    fuse into a custom call's operand read).

    Single grid cell by design: on this runtime each grid-cell transition of
    a manual-DMA kernel costs ~12 us, so a per-row grid loses to the DMA it
    hides; instead the batch loop is a static unroll with `depth` row copies
    in flight (measured: parallel row DMAs reach ~640 GB/s vs ~350 for one
    big contiguous copy — the DMA engines overlap). Dequant scales stay
    ordinary XLA-sliced operands in lane-aligned [B, Hkv, S] layout (the
    caller slices the small per-layer arrays; they are ~1.5% of the cache
    bytes)."""
    l = layer_ref[0, 0]
    s = k_vmem.shape[1]
    d = q_ref.shape[-1]

    def start_copies(row):
        slot = row % depth
        pltpu.make_async_copy(k_hbm.at[l, row], k_vmem.at[slot],
                              k_sem.at[slot]).start()
        pltpu.make_async_copy(v_hbm.at[l, row], v_vmem.at[slot],
                              v_sem.at[slot]).start()

    for row in range(min(depth, nb)):
        start_copies(row)
    for row in range(nb):
        slot = row % depth
        pltpu.make_async_copy(k_hbm.at[l, row], k_vmem.at[slot],
                              k_sem.at[slot]).wait()
        pltpu.make_async_copy(v_hbm.at[l, row], v_vmem.at[slot],
                              v_sem.at[slot]).wait()
        _whole_row_attend(
            q_ref, o_ref,
            lambda h: k_vmem[slot, :, h * d:(h + 1) * d],
            lambda h: v_vmem[slot, :, h * d:(h + 1) * d],
            lambda h: ks_ref[row][h:h + 1, :],
            lambda h: vs_ref[row][h:h + 1, :],
            starts_ref[row, 0], lengths_ref[row, 0], s, k_vmem.dtype,
            sm_scale=sm_scale, hkv=hkv, groups=groups, quantized=quantized,
            row=row)
        if row + depth < nb:
            start_copies(row + depth)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def flash_decode_layered(q: jnp.ndarray, k_full: jnp.ndarray,
                         v_full: jnp.ndarray, layer: jnp.ndarray,
                         lengths: jnp.ndarray, *, sm_scale: float,
                         starts: jnp.ndarray = None,
                         k_scale: jnp.ndarray = None,
                         v_scale: jnp.ndarray = None,
                         interpret: bool = False) -> jnp.ndarray:
    """flash_decode_simple over one layer of the FULL cache stack without
    slicing the big K/V out on the XLA side. q: [B, Hq, D]; k/v_full: [L, B,
    S, Hkv, D] (bf16/f32 or int8 with PER-LAYER k/v_scale [B, S, Hkv] — the
    caller slices the small scales, the kernel DMAs the big slabs); layer:
    i32 scalar selecting the layer (a scan carry index). Same VMEM contract
    as flash_decode_simple (use simple_supported on per-layer shapes), plus
    (Hkv*D) % 128 == 0 for the HBM slab slice."""
    nl, b, s, hkv, d = k_full.shape
    hq = q.shape[1]
    g = hq // hkv
    quantized = k_full.dtype == jnp.int8
    k2 = k_full.reshape(nl, b, s, hkv * d)
    v2 = v_full.reshape(nl, b, s, hkv * d)
    if quantized:
        # [B, Hkv, S]: lane-aligned minor dim (see flash_decode) — this
        # transpose took the full kernel from 298 to ~20 us/layer-call
        k_scale = jnp.transpose(k_scale, (0, 2, 1))
        v_scale = jnp.transpose(v_scale, (0, 2, 1))
    else:
        k_scale = jnp.ones((b, hkv, 1), jnp.float32)
        v_scale = jnp.ones((b, hkv, 1), jnp.float32)
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)
    sc_s = s if quantized else 1
    # in-flight row copies: as many as fit half the VMEM budget (the other
    # half is working space), >= 2 for overlap when b allows it
    row_bytes = 2 * s * hkv * d * k_full.dtype.itemsize
    depth = max(1, min(b, 4, (5 * 1024 * 1024) // max(row_bytes, 1)))
    kernel = functools.partial(_decode_layered_kernel, sm_scale=sm_scale,
                               hkv=hkv, groups=g, quantized=quantized, nb=b,
                               depth=depth)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        in_specs=[
            pl.BlockSpec((b, hq, d), lambda: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((b, hkv, sc_s), lambda: (0, 0, 0)),
            pl.BlockSpec((b, hkv, sc_s), lambda: (0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((b, hq, d), lambda: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((depth, s, hkv * d), k_full.dtype),
            pltpu.VMEM((depth, s, hkv * d), v_full.dtype),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s * d,
            bytes_accessed=2 * b * s * hkv * d * k_full.dtype.itemsize,
            transcendentals=b * hq * s,
        ),
        interpret=interpret,
    )(q, k2, v2, k_scale, v_scale,
      jnp.reshape(layer, (1, 1)).astype(jnp.int32),
      starts.reshape(b, 1).astype(jnp.int32),
      lengths.reshape(b, 1).astype(jnp.int32))


def simple_supported(q_shape, cache_shape, itemsize: int,
                     vmem_budget: int = 10 * 1024 * 1024) -> bool:
    """Whole-row K+V (double-buffered) must fit the VMEM budget."""
    b, t, hq, d = q_shape
    s, hkv = cache_shape[1], cache_shape[2]
    row_bytes = 2 * s * hkv * d * itemsize          # K + V
    return (t == 1 and d % 64 == 0 and hq % hkv == 0
            and 2 * row_bytes <= vmem_budget)


def decode_attend_supported(q_shape, cache_shape, block_k: int = 512) -> bool:
    """Whether flash_decode's shape constraints hold for this decode step:
    single query token, cache length divisible by a usable block, head_dim
    lane-aligned. Backend choice is the caller's (models/common.py)."""
    b, t, hq, d = q_shape
    s = cache_shape[1]
    hkv = cache_shape[2]
    return (
        t == 1
        # d=64 (e.g. TinyLlama) runs with half-lane per-head tiles; the DMA
        # slab [block_k, hkv*d] stays fully lane-aligned either way
        and d % 64 == 0
        and hq % hkv == 0
        and s % min(block_k, s) == 0
        and s >= 128
    )
