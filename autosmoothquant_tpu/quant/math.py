"""Pure quantization math over jnp arrays.

TPU-native re-design of the reference's quant/dequant helpers
(ref: autosmoothquant/layers/functional/quantization.py:9-211). Everything is
functional (no in-place mutation), jit-friendly (no host scalars), and keeps
the reference's numeric conventions exactly:

  - symmetric absmax int8: scale = absmax / 127, q = round(x / scale)
  - activation scales clamped at 1e-8 before the /127 divide
  - runtime activation quantization rounds then clamps to [-128, 127]
  - fp8 e4m3: scale = absmax / finfo.max, saturating clamp before the cast

Rounding: the reference relies on torch round (round-half-to-even);
``jnp.round`` is also round-half-to-even, so quantized values match bit-for-bit
on shared inputs.
"""

from __future__ import annotations

import jax.numpy as jnp

INT8_MAX = 127.0
INT8_MIN = -128.0
# jnp.finfo(float8_e4m3fn).max == 448.0, e5m2 max == 57344.0
FP8_E4M3_MAX = float(jnp.finfo(jnp.float8_e4m3fn).max)
FP8_E5M2_MAX = float(jnp.finfo(jnp.float8_e5m2).max)

# ---------------------------------------------------------------------------
# INT8 weight quantization (offline, done once at convert time)
# ---------------------------------------------------------------------------


def quantize_weight_per_tensor_absmax(w: jnp.ndarray):
    """Symmetric per-tensor absmax int8 weight quant.

    ref: functional/quantization.py:10-18 (quantize_per_tensor_absmax).
    Returns (int8 values, f32 scalar scale).
    """
    scale = jnp.max(jnp.abs(w)).astype(jnp.float32) / INT8_MAX
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), INT8_MIN, INT8_MAX)
    return q.astype(jnp.int8), scale


def quantize_weight_fused_absmax(ws):
    """Quantize a list of same-shaped weights with one shared scale
    (used for fused QKV / W_pack where one GEMM serves several logical
    projections). ref: functional/quantization.py:21-36."""
    scale = jnp.float32(0.0)
    for w in ws:
        scale = jnp.maximum(scale, jnp.max(jnp.abs(w)).astype(jnp.float32) / INT8_MAX)
    qs = [
        jnp.clip(jnp.round(w.astype(jnp.float32) / scale), INT8_MIN, INT8_MAX).astype(jnp.int8)
        for w in ws
    ]
    return qs, scale


def quantize_weight_per_channel_absmax(w: jnp.ndarray, axis: int = 0):
    """Per-output-channel absmax int8 weight quant; reduces over ``axis``
    (the *input* dim) so each output channel gets its own scale.

    ref: functional/quantization.py:38-48 (there w is [out, in], reduce dim=1;
    here weights are stored [in, out] so the default reduces axis 0).
    Returns (int8 [..], f32 scales broadcastable against w).
    """
    scales = jnp.max(jnp.abs(w), axis=axis, keepdims=True).astype(jnp.float32) / INT8_MAX
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scales), INT8_MIN, INT8_MAX)
    return q.astype(jnp.int8), scales


# ---------------------------------------------------------------------------
# INT8 activation quantization (runtime, traced under jit)
# ---------------------------------------------------------------------------


def quantize_act_per_token(x: jnp.ndarray):
    """Dynamic per-token absmax quant over the last dim.

    ref: functional/quantization.py:77-84. Returns (int8 x, f32 scales
    [..., 1]) — scales stay on-device (the reference's ``.item()`` host syncs
    are deliberately NOT reproduced, see SURVEY.md §3.2 hot-loop hazards).
    """
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax.astype(jnp.float32), 1e-8) / INT8_MAX
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), INT8_MIN, INT8_MAX)
    return q.astype(jnp.int8), scale


def quantize_act_per_tensor_dynamic(x: jnp.ndarray):
    """Dynamic per-tensor absmax quant. ref: functional/quantization.py:70-74."""
    absmax = jnp.max(jnp.abs(x))
    scale = jnp.maximum(absmax.astype(jnp.float32), 1e-8) / INT8_MAX
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), INT8_MIN, INT8_MAX)
    return q.astype(jnp.int8), scale


def quantize_act_static(x: jnp.ndarray, quant_scale) -> jnp.ndarray:
    """Static per-tensor quant with a known scale (the WithQuantScale path:
    o_proj/down_proj/fc2 whose input is not a norm output).
    ref: layers/nn/linear.py:292-294."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / quant_scale), INT8_MIN, INT8_MAX)
    return q.astype(jnp.int8)


def quantize_act_static_per_token(x: jnp.ndarray, tok_scale) -> jnp.ndarray:
    """Per-token quant against a PROVIDED [..., 1] scale — same op order as
    quantize_act_per_token's quantize step. Used by row-parallel TP where
    each shard sees a K-slice of x but must quantize against the global
    per-token absmax to stay bit-consistent with the unsharded kernel."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / tok_scale),
                 INT8_MIN, INT8_MAX)
    return q.astype(jnp.int8)


def quantize_act_prescaled(x: jnp.ndarray) -> jnp.ndarray:
    """Per-tensor quant for inputs whose 1/scale was folded into the preceding
    RMSNorm/LayerNorm weight — runtime cost is just round+clamp.
    ref: layers/nn/linear.py:95 and models/llama.py:27-37 (the fold)."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32)), INT8_MIN, INT8_MAX)
    return q.astype(jnp.int8)


def fake_quantize_act_per_token(x: jnp.ndarray) -> jnp.ndarray:
    """Simulated per-token quant in fp (research path).
    ref: functional/quantization.py:97-101."""
    q, scale = quantize_act_per_token(x)
    return (q.astype(jnp.float32) * scale).astype(x.dtype)


def fake_quantize_act_per_tensor(x: jnp.ndarray) -> jnp.ndarray:
    """ref: functional/quantization.py:87-93."""
    q, scale = quantize_act_per_tensor_dynamic(x)
    return (q.astype(jnp.float32) * scale).astype(x.dtype)


# ---------------------------------------------------------------------------
# Dequantization
# ---------------------------------------------------------------------------


def dequantize_w_per_channel_a_per_token(q, w_scales, a_scales, dtype=jnp.float32):
    """out[i,j] = q[i,j] * w_scales[j] * a_scales[i].
    ref: functional/quantization.py:104-112."""
    out = q.astype(jnp.float32) * w_scales.reshape(1, -1) * a_scales.reshape(-1, 1)
    return out.astype(dtype)


def dequantize_w_per_channel_a_per_tensor(q, w_scales, a_scale, dtype=jnp.float32):
    """ref: functional/quantization.py:114-120."""
    out = q.astype(jnp.float32) * w_scales.reshape(1, -1) * a_scale
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# FP8 quantization (e4m3 default; e5m2 scale-free variant)
# ---------------------------------------------------------------------------


def quantize_fp8_per_tensor(x: jnp.ndarray, dtype=jnp.float8_e4m3fn):
    """Per-tensor fp8 with saturating clamp (default casts are unsaturated).
    ref: functional/quantization.py:144-171. Returns (fp8 values, f32 scale)."""
    fmax = float(jnp.finfo(dtype).max)
    amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
    # Empty-tensor guard (empty MoE experts): the reference substitutes
    # amax=16.0; with static shapes this only triggers for size-0 arrays.
    if x.size == 0:
        amax = jnp.float32(16.0)
    scale = amax / fmax
    q = jnp.clip(x.astype(jnp.float32) / scale, -fmax, fmax).astype(dtype)
    return q, scale


def quantize_fp8_per_token(x: jnp.ndarray, dtype=jnp.float8_e4m3fn):
    """Per-token fp8. ref: functional/quantization.py:174-192."""
    fmax = float(jnp.finfo(dtype).max)
    scale = (jnp.max(jnp.abs(x), axis=-1, keepdims=True) / fmax).astype(jnp.float32)
    q = jnp.clip(x.astype(jnp.float32) / scale, -fmax, fmax).astype(dtype)
    return q, scale


def quantize_fp8_static(x: jnp.ndarray, scale, dtype=jnp.float8_e4m3fn):
    """Static fp8 with a frozen scale. ref: functional/quantization.py:209-212."""
    fmax = float(jnp.finfo(dtype).max)
    q = jnp.clip(x.astype(jnp.float32) / scale, -fmax, fmax).astype(dtype)
    return q


def fake_quantize_fp8_per_tensor(x: jnp.ndarray, dtype=jnp.float8_e4m3fn):
    """ref: functional/quantization.py:195-199."""
    q, scale = quantize_fp8_per_tensor(x, dtype)
    return (q.astype(jnp.float32) * scale).astype(x.dtype)


def fake_quantize_fp8_per_token(x: jnp.ndarray, dtype=jnp.float8_e4m3fn):
    """ref: functional/quantization.py:201-206."""
    q, scale = quantize_fp8_per_token(x, dtype)
    return (q.astype(jnp.float32) * scale).astype(x.dtype)


# ---------------------------------------------------------------------------
# INT4 weight-only group quantization (beyond the reference: the reference
# stops at int8/fp8 — this is the AWQ/GPTQ-style deployment format re-done
# TPU-first: symmetric per-group scales so dequant is one VPU multiply per
# tile, and 2-per-byte nibble packing so the HBM weight stream is HALF the
# int8 bytes, which is the whole ballgame for bandwidth-bound decode)
# ---------------------------------------------------------------------------

INT4_MAX = 7.0
INT4_GROUP_DEFAULT = 128

# Relative per-byte cost of the W4A8 kernel by k-block depth (block_hk),
# measured on v5e at M=8 N=4096 (kernels/int4.py): small k-blocks cannot
# pipeline the packed-weight DMA. Used to decide how far to zero-pad K so
# K/2 gains large power-of-two factors (e.g. llama-7B down_proj K=11008
# only factors as 128*43 packed rows -> hk=128 runs 3.4x slower per byte
# than hk=2048; padding to K=12288 costs +11.6% bytes but wins 1.44x).
_INT4_HK_COST = {128: 3.4, 256: 2.0, 512: 1.5, 1024: 1.1, 2048: 1.0}


def int4_padded_k(K: int, group_size: int = INT4_GROUP_DEFAULT) -> int:
    """Storage K' >= K minimizing (padded bytes) x (per-byte cost of the
    best k-block the padded shape admits). K' is always a multiple of
    2*group_size so the split-K planes stay group-aligned."""
    best = None
    hk = group_size
    while True:
        kp = -(-K // (2 * hk)) * (2 * hk)           # K' mult of 2*hk
        cost = kp * _INT4_HK_COST.get(hk, 1.0 if hk >= 2048 else 4.0)
        if best is None or cost < best[0] or (cost == best[0] and kp < best[1]):
            best = (cost, kp)
        if hk >= 2048:
            break
        hk *= 2
    return best[1]


def quantize_weight_int4_grouped(w: jnp.ndarray, group_size: int = INT4_GROUP_DEFAULT,
                                 pad: bool = True):
    """Symmetric per-group absmax int4 weight quant + nibble packing.

    ``w``: [K, N] float (K = input dim). Each group of ``group_size``
    consecutive input rows of a column shares one scale (absmax / 7).

    Packing is SPLIT-K, two-per-byte: byte r holds unpacked row r in the
    low nibble and row r + K/2 in the high nibble. Any contiguous packed
    row-block therefore maps to two CONTIGUOUS unpacked row ranges — the
    matmul kernel addresses the activation and the scale table with plain
    block offsets, never a strided slice or interleave.

    Nibbles are stored in OFFSET BINARY (stored = q + 8, in [0, 15]): the
    kernel then unpacks with just mask/shift (no sign-extension ops on the
    big operand) and folds the -8 offset into one tiny
    ``8 * (group_sums(x) @ scales)`` correction dot — measured 14.8us vs
    21.8us for signed nibbles at M=8 K=N=4096 on v5e.

    With ``pad`` (the default), K is first zero-padded to
    ``int4_padded_k(K)`` so the packed planes gain large power-of-two
    factors (fast k-blocks in the kernel). Zero rows quantize to the
    offset-nibble 8 with a clamped epsilon scale, and the matmul entry
    point zero-pads the activation columns to match, so padding is exact.

    Returns (packed uint8 [K'//2, N], scales f32 [K'//group_size, N]).
    """
    K, N = w.shape
    if group_size % 2 or K % group_size or (K // 2) % group_size:
        raise ValueError(
            f"K={K} and K/2 must be multiples of even group_size={group_size}")
    if pad:
        kp = int4_padded_k(K, group_size)
        if kp > K:
            w = jnp.concatenate(
                [w, jnp.zeros((kp - K, N), w.dtype)], axis=0)
            K = kp
    wf = w.astype(jnp.float32).reshape(K // group_size, group_size, N)
    scales = jnp.max(jnp.abs(wf), axis=1) / INT4_MAX          # [G, N]
    scales = jnp.maximum(scales, 1e-8)
    q = jnp.clip(jnp.round(wf / scales[:, None, :]), -8, 7)
    n = (q.reshape(K, N) + 8.0).astype(jnp.int32)             # offset binary
    half = K // 2
    return (n[:half] | (n[half:] << 4)).astype(jnp.uint8), \
        scales.astype(jnp.float32)


def unpack_int4(packed: jnp.ndarray):
    """uint8 [K//2, N] -> (lo, hi) int8 [K//2, N] SIGNED values (offset
    removed). lo = unpacked rows [0, K/2), hi = rows [K/2, K)."""
    p = packed.astype(jnp.int32)
    lo = (p & 0xF) - 8
    hi = (p >> 4) - 8
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def dequantize_int4_grouped(packed: jnp.ndarray, scales: jnp.ndarray,
                            dtype=jnp.bfloat16) -> jnp.ndarray:
    """Inverse of quantize_weight_int4_grouped: full [K, N] weights."""
    lo, hi = unpack_int4(packed)
    K2, N = packed.shape
    q = jnp.concatenate([lo, hi], axis=0)                     # split-K halves
    G = scales.shape[0]
    group = (2 * K2) // G
    qf = q.reshape(G, group, N).astype(jnp.float32) * scales[:, None, :]
    return qf.reshape(2 * K2, N).astype(dtype)
