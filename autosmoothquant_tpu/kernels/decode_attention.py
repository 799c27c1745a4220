"""Flash-decode attention over the (optionally INT8) KV cache.

The single-token decode step is KV-bandwidth-bound at long context. The XLA
path dequantizes the whole int8 cache into a bf16 copy before attending
(int8 read + bf16 write + bf16 read ≈ 2.5 B/elt — worse than a plain bf16
cache at 2 B/elt, measured 0.93x in BENCHMARKS.md). This kernel restores the
int8 win by dequantizing INSIDE VMEM: HBM traffic is 1 B/elt + scales.

Layout trick: the cache stays [B, S, H, D]; reshaping to [B, S, H*D] (free,
row-major) lets the per-kv-head BlockSpec slice (1, block_k, D) with an
efficient (block_k, D) trailing tile. All G = Hq/Hkv query heads of a kv
head are processed together (they share the K/V block).

Lengths are per-row (continuous batching): blocks fully past a row's length
are skipped; partial blocks are masked.

STATUS (round 1): correct (vs einsum oracle incl. int8 scales + ragged
lengths) but NOT yet fast — measured 139 us int8 / 80 us bf16 vs ~50 us for
the XLA paths at B8 S2048 Hkv4 D128 (124 GB/s vs 819 peak). The per-cell
work is too small and unpipelined; needs the paged-attention treatment
(manual double-buffered DMA, several kv-heads per cell, deeper K pipeline)
before it replaces the XLA path — ROADMAP item 1. Not wired into models yet.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _decode_kernel(lengths_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                   m_ref, l_ref, acc_ref, *, sm_scale, block_k, groups,
                   quantized):
    b = pl.program_id(0)
    kv_h = pl.program_id(1)
    s_idx = pl.program_id(2)
    length = lengths_ref[b]

    @pl.when(s_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(s_idx * block_k < length)
    def _run():
        q = q_ref[0, 0].astype(jnp.float32)                  # [G, D]
        k = k_ref[0].astype(jnp.float32)                     # [block_k, D]
        v = v_ref[0].astype(jnp.float32)
        if quantized:
            # select this kv-head's scale column via a one-hot lane reduce
            # (a dynamic lane index is not tile-addressable on TPU)
            hkv = ks_ref.shape[-1]
            onehot = (jax.lax.broadcasted_iota(
                jnp.int32, (1, hkv), 1) == kv_h).astype(jnp.float32)
            ks = jnp.sum(ks_ref[0].astype(jnp.float32) * onehot, axis=-1,
                         keepdims=True)                      # [block_k, 1]
            vs = jnp.sum(vs_ref[0].astype(jnp.float32) * onehot, axis=-1,
                         keepdims=True)
            k = k * ks
            v = v * vs
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale    # [G, block_k]
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + s_idx * block_k
        s = jnp.where(cols < length, s, MASK_VALUE)

        m_prev, l_prev = m_ref[...], l_ref[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_ref[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = m_next
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32)

    @pl.when(s_idx == pl.num_programs(2) - 1)
    def _store():
        l = l_ref[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_k", "interpret"))
def flash_decode(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                 lengths: jnp.ndarray, *, sm_scale: float,
                 k_scale: jnp.ndarray = None, v_scale: jnp.ndarray = None,
                 block_k: int = 512, interpret: bool = False) -> jnp.ndarray:
    """q: [B, Hq, D] (one token per row); k/v_cache: [B, S, Hkv, D] (bf16/f32
    or int8 with k/v_scale [B, S, Hkv]); lengths: int32 [B] valid prefix.
    Returns [B, Hq, D] in q.dtype. S % block_k == 0."""
    b, hq, d = q.shape
    _, s, hkv, _ = k_cache.shape
    g = hq // hkv
    block_k = min(block_k, s)
    assert s % block_k == 0 and hq % hkv == 0

    quantized = k_cache.dtype == jnp.int8
    if not quantized:
        k_scale = jnp.ones((b, s, hkv), jnp.float32)
        v_scale = jnp.ones((b, s, hkv), jnp.float32)

    k2 = k_cache.reshape(b, s, hkv * d)
    v2 = v_cache.reshape(b, s, hkv * d)
    # heads are kv-major contiguous: [B, Hq, D] -> [B, Hkv, G, D] is free and
    # makes the per-kv-head group a full (tile-legal) block axis
    q4 = q.reshape(b, hkv, g, d)

    grid = (b, hkv, s // block_k)
    kernel = functools.partial(_decode_kernel, sm_scale=sm_scale,
                               block_k=block_k, groups=g, quantized=quantized)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, g, d), lambda bb, h, ss, *_: (bb, h, 0, 0)),
                pl.BlockSpec((1, block_k, d),
                             lambda bb, h, ss, *_: (bb, ss, h)),
                pl.BlockSpec((1, block_k, d),
                             lambda bb, h, ss, *_: (bb, ss, h)),
                pl.BlockSpec((1, block_k, hkv),
                             lambda bb, h, ss, *_: (bb, ss, 0)),
                pl.BlockSpec((1, block_k, hkv),
                             lambda bb, h, ss, *_: (bb, ss, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, g, d),
                                   lambda bb, h, ss, *_: (bb, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((g, 1), jnp.float32),
                pltpu.VMEM((g, 1), jnp.float32),
                pltpu.VMEM((g, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q4, k2, v2, k_scale, v_scale)
    return out.reshape(b, hq, d)
