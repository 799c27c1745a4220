"""Pallas flash attention (forward, causal) for prefill.

Replaces the reference's eager O(L^2) HF attention (test_model.py forces
attn_implementation="eager"; models/llama.py:283 admits flash unsupported)
with a tiled online-softmax kernel: the [T, S] score matrix never
materializes in HBM. GQA is handled natively — the K/V BlockSpec index map
sends query-head h to kv-head h // group_size, so K/V are never repeated.

Measured on v5e (B=4, T=2048, Hq=16, Hkv=4, D=128, causal): 0.76 ms =
90.8 TF at block_q=512/block_k=1024 vs 4.9 ms for the einsum path (6.4x).

Dispatch: ``flash_attention`` requires aligned shapes and a TPU backend;
``attend`` in models/common.py falls back to the einsum path otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  sm_scale, block_q, block_k, kv_len, causal):
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if causal:
        # skip KV tiles fully above the diagonal
        should_run = (q_idx + 1) * block_q - 1 >= kv_idx * block_k
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0].astype(jnp.float32)            # [block_q, d]
        k = k_ref[0, 0].astype(jnp.float32)            # [block_k, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale                                    # [block_q, block_k]

        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_idx * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
            s = jnp.where(cols <= rows, s, MASK_VALUE)

        m_prev = m_ref[...]                             # [block_q, 1]
        l_prev = l_ref[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[...] = m_next
        l_ref[...] = l_next

        v = v_ref[0, 0].astype(jnp.float32)             # [block_k, d]
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == pl.cdiv(kv_len, block_k) - 1)
    def _store():
        l = l_ref[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "causal", "block_q", "block_k", "interpret"),
)
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    sm_scale: float, causal: bool = True,
                    block_q: int = 512, block_k: int = 1024,
                    interpret: bool = False) -> jnp.ndarray:
    """q: [B, T, Hq, D]; k/v: [B, S, Hkv, D] with Hq % Hkv == 0.
    Returns [B, T, Hq, D] in q.dtype. Requires T % block_q == S % block_k == 0
    (caller checks via flash_supported)."""
    b, t, hq, d = q.shape
    _, s, hkv, _ = k.shape
    groups = hq // hkv
    block_q = min(block_q, t)
    block_k = min(block_k, s)

    qt = q.transpose(0, 2, 1, 3)  # [B, Hq, T, D]
    kt = k.transpose(0, 2, 1, 3)  # [B, Hkv, S, D]
    vt = v.transpose(0, 2, 1, 3)

    grid = (b, hq, t // block_q, s // block_k)
    kernel = functools.partial(
        _flash_kernel, sm_scale=sm_scale, block_q=block_q, block_k=block_k,
        kv_len=s, causal=causal)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda bb, h, qq, kk: (bb, h, qq, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bb, h, qq, kk, g=groups: (bb, h // g, kk, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bb, h, qq, kk, g=groups: (bb, h // g, kk, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d),
                                   lambda bb, h, qq, kk: (bb, h, qq, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),   # m
                pltpu.VMEM((block_q, 1), jnp.float32),   # l
                pltpu.VMEM((block_q, d), jnp.float32),   # acc
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * t * s * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * hq * t * s,
        ),
        interpret=interpret,
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


def _flash_banded_kernel(q_ref, k_ref, v_ref, pos_ref, start_ref, o_ref,
                         m_ref, l_ref, acc_ref, *,
                         sm_scale, block_q, block_k, num_kv_tiles):
    """Banded-causal tile: query i (at absolute cache slot pos+i) attends
    cache cols <= pos + i. pos rides in SMEM (per batch row) — the same
    runtime-proven pattern as the fused-block kernels' scalars (scalar
    prefetch hung on the axon runtime).

    Grid order is (b, q_tile, kv_tile, head) with kv OUTSIDE the head loop:
    each K/V block is DMA'd once per (q_tile, kv_tile) and re-used by all
    heads in its GQA group (head-major order re-read K/V once PER HEAD —
    g x the traffic, measured 0.90x vs eager at g=8). Online-softmax state
    is per-head VMEM scratch indexed by the head grid coordinate."""
    bb = pl.program_id(0)
    q_idx = pl.program_id(1)
    kv_idx = pl.program_id(2)
    h = pl.program_id(3)
    pos = pos_ref[bb]
    start = start_ref[bb]

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[h] = jnp.full_like(m_ref[h], -jnp.inf)
        l_ref[h] = jnp.zeros_like(l_ref[h])
        acc_ref[h] = jnp.zeros_like(acc_ref[h])

    # skip KV tiles fully beyond the band or fully before the row's first
    # valid column (dynamic: pos/start are data)
    should_run = ((kv_idx * block_k <= pos + (q_idx + 1) * block_q - 1)
                  & ((kv_idx + 1) * block_k > start))

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_idx * block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
        s = jnp.where((cols <= rows + pos) & (cols >= start), s, MASK_VALUE)

        # m/l scratch is lane-aligned [1, block_q] (a [block_q, 1] block
        # pads the minor dim to 128 lanes -> 8 MB per scalar at bq=512,
        # the VMEM-OOM lane-padding trap)
        m_prev = m_ref[h]                                  # [1, block_q]
        l_prev = l_ref[h]
        m_curr = jnp.max(s, axis=1)[None, :]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next.reshape(block_q, 1))
        l_ref[h] = alpha * l_prev + jnp.sum(p, axis=1)[None, :]
        m_ref[h] = m_next
        v = v_ref[0, 0].astype(jnp.float32)
        acc_ref[h] = acc_ref[h] * alpha.reshape(block_q, 1) + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == num_kv_tiles - 1)
    def _store():
        l = l_ref[h]                                       # [1, block_q]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l).reshape(block_q, 1)
        o_ref[0, 0] = (acc_ref[h] * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "block_q", "block_k", "interpret"),
)
def flash_attention_banded(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           pos: jnp.ndarray, starts=None, *, sm_scale: float,
                           block_q: int = 512, block_k: int = 1024,
                           interpret: bool = False) -> jnp.ndarray:
    """Chunked-prefill attention: q [B, Tq, Hq, D] are the chunk's queries
    sitting at cache slots [pos_b, pos_b + Tq); k/v [B, S, Hkv, D] are FULL
    cache rows whose [starts_b, pos_b + Tq) window is valid (the chunk's K/V
    already written). Query i attends cols in [starts_b, pos_b + i]. starts
    (default zeros) carries per-row left-pad offsets so ragged left-padded
    batches ride the kernel too. The [Tq, S] score matrix never materializes
    (the eager path's f32 scores dominate chunked admission cost); tiles
    outside the band skip compute.

    The banded generalization of the reference's eager cache-prefill (its
    HF attention re-runs eager O(L^2) math every chunk) — TPU-style."""
    b, t, hq, d = q.shape
    _, s, hkv, _ = k.shape
    groups = hq // hkv
    block_q = min(block_q, t)
    block_k = min(block_k, s)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))
    if starts is None:
        starts = jnp.zeros((b,), jnp.int32)
    starts = jnp.broadcast_to(jnp.asarray(starts, jnp.int32).reshape(-1), (b,))

    num_kv_tiles = s // block_k
    # kv tile OUTSIDE the head loop: each K/V block DMAs once per
    # (q_tile, kv_tile) and serves every head of its GQA group; per-head
    # online-softmax state lives in head-indexed scratch
    grid = (b, t // block_q, num_kv_tiles, hq)
    kernel = functools.partial(
        _flash_banded_kernel, sm_scale=sm_scale, block_q=block_q,
        block_k=block_k, num_kv_tiles=num_kv_tiles)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda bb, qq, kk, h: (bb, h, qq, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bb, qq, kk, h, g=groups: (bb, h // g, kk, 0)),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bb, qq, kk, h, g=groups: (bb, h // g, kk, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d),
                                   lambda bb, qq, kk, h: (bb, h, qq, 0)),
            scratch_shapes=[
                pltpu.VMEM((hq, 1, block_q), jnp.float32),
                pltpu.VMEM((hq, 1, block_q), jnp.float32),
                pltpu.VMEM((hq, block_q, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * t * s * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * hq * t * s,
        ),
        interpret=interpret,
    )(qt, kt, vt, pos, starts)
    return out.transpose(0, 2, 1, 3)


def banded_supported(q_shape, kv_shape, block_q: int = 512,
                     block_k: int = 1024) -> bool:
    """Shape gate for flash_attention_banded. Sub-128 head dims are allowed
    (they lane-pad to 128 — up to 2x DMA waste on K/V, still far below the
    eager path's score materialization)."""
    b, t, hq, d = q_shape
    _, s, hkv, _ = kv_shape
    if hq % hkv != 0 or d % 64 != 0:
        return False
    bq, bk = min(block_q, t), min(block_k, s)
    return t % bq == 0 and s % bk == 0 and t >= 128 and s >= 128


def flash_supported(q_shape, kv_shape, block_q: int = 512,
                    block_k: int = 1024) -> bool:
    b, t, hq, d = q_shape
    _, s, hkv, _ = kv_shape
    if hq % hkv != 0:
        return False
    if d % 128 != 0:
        return False  # sub-lane head dims go through the einsum path
    bq, bk = min(block_q, t), min(block_k, s)
    return t % bq == 0 and s % bk == 0 and t >= 128 and s >= 128
