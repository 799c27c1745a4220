"""Shared functional building blocks for the model zoo.

TPU-first design notes (vs the reference's torch module surgery,
autosmoothquant/models/*.py):
  - models are pure functions over a params pytree; quantization changes the
    *params* (int8 leaves + scale leaves), and the apply function branches on
    the static QuantConfig — everything stays jit-traceable with static shapes
  - per-tensor activation scales live in norm weights (the reference's
    fold-into-norm trick, models/llama.py:27-37) or in a `quant_scale` leaf
    (the WithQuantScale layers, layers/nn/linear.py:248-329); they are
    trace-time constants on device, never host scalars
  - norms run in f32 (TPU VPU native), matmuls in int8/bf16 on the MXU
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..kernels.gemm import fp8_matmul, int8_matmul
from ..quant import math as qmath
from ..quant.config import PER_TENSOR, PER_TOKEN, QuantConfig

# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm in f32. When the consumer is per-tensor int8, ``weight``
    already includes the folded 1/input_scale (ref: models/llama.py:27-37) —
    the output is then directly in int8 units."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return normed * weight.astype(jnp.float32)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float) -> jnp.ndarray:
    """LayerNorm in f32 (OPT family; fold applies to weight AND bias,
    ref: models/opt.py:20-29)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Rotary position embeddings (HF llama convention: rotate-half)
# ---------------------------------------------------------------------------


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float,
                 dtype=jnp.float32):
    """positions: int32 [...]; returns cos/sin [..., head_dim].

    inv_freq is a trace-time host constant computed in float64: an f32 pow
    here costs ~1e-5 in cos/sin which amplifies to ~1e-3 in logits."""
    import numpy as np

    inv_freq = jnp.asarray(
        (1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
         ).astype(np.float32)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, H, Dh]; cos/sin: [B, T, Dh] (broadcast over heads)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    return (x * c + rotated * s).astype(x.dtype)


# ---------------------------------------------------------------------------
# Quantized linear apply — the functional analog of the reference's
# W8A8BFP32OFP32Linear family (layers/nn/linear.py:35-329) and FP8 linears
# (linear.py:373-643)
# ---------------------------------------------------------------------------


class LinearKind:
    """Which runtime quantization recipe a projection uses.

    POST_NORM: input comes straight from a norm; per-tensor scale was folded
               into the norm weight, so per-tensor quant is just round+clamp
               (W8A8BFP32OFP32Linear, linear.py:84-106).
    SCALED:    input is an attention/MLP interior activation; carries an
               explicit quant_scale (W8A8BFP32OFP32LinearWithQuantScale,
               linear.py:278-302).
    """

    POST_NORM = "post_norm"
    SCALED = "scaled"


def quant_linear(x: jnp.ndarray, p: dict, cfg: QuantConfig, granularity: str,
                 kind: str = LinearKind.POST_NORM, out_dtype=None,
                 tp_axis: Optional[str] = None) -> jnp.ndarray:
    """Apply one quantized projection. ``x``: [..., in]; ``p`` holds
    quantized weight + scales produced by convert/quantize.py.

    int8 leaves: w int8 [in,out]; dequant_scale f32 scalar (weight_scale, or
    input_scale*weight_scale for per-tensor); quant_scale f32 scalar (SCALED
    per-tensor only); bias f32 [out] optional.
    fp8 leaves:  w fp8 [in,out]; w_scale f32; input_scale/output_scale for
    static scheme; bias f32 [out] optional.
    """
    if out_dtype is None:
        out_dtype = x.dtype
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    bias = p.get("bias")

    if cfg.type == "int4":
        # weight-only W4A16 (beyond the reference): activations stay in the
        # compute dtype; the kernel streams packed nibbles + group scales
        # (kernels/int4.py) so decode reads HALF the int8 weight bytes.
        # Under a model-axis mesh the GEMM runs shard_mapped so per-device
        # HBM holds 1/mp of the packed bytes (int4_matmul_tp): POST_NORM
        # projections (qkv/gate/up/fc1) are column-parallel, SCALED ones
        # (o/down/fc2) row-parallel — the same split as the float TP specs
        # (shard/sharding.py).
        # tp_axis overrides the kind-derived default: post-LN OPT uses
        # SCALED for its column-stored q/k/v/fc1, where "row" would force
        # a full weight reshard every step (r5 review)
        tp = tp_axis or ("row" if kind == LinearKind.SCALED else "col")
        out = int4_matmul_tp(x2, p, bias=bias, out_dtype=out_dtype, tp=tp)
        return out.reshape(*lead, -1)

    if cfg.type == "int8":
        w = p["w"]
        if granularity == PER_TOKEN:
            q, tok_scale = qmath.quantize_act_per_token(x2)
            out = int8_matmul(
                q, w, row_scale=tok_scale, col_scale=p["dequant_scale"],
                bias=bias, out_dtype=out_dtype,
            )
        else:  # per-tensor
            if kind == LinearKind.SCALED:
                q = qmath.quantize_act_static(x2, p["quant_scale"])
            else:
                q = qmath.quantize_act_prescaled(x2)
            out = int8_matmul(
                q, w, col_scale=p["dequant_scale"], bias=bias, out_dtype=out_dtype,
            )
        return out.reshape(*lead, -1)

    if cfg.type == "fp8_e4m3":
        fdt = jnp.float8_e4m3fn
        if cfg.activation_scheme == "static":
            # frozen input scale from the observer pass (FP8LinearStatic,
            # linear.py:503-580)
            q = qmath.quantize_fp8_static(x2, p["input_scale"], fdt)
            out = fp8_matmul(q, p["w"], row_scale=p["input_scale"],
                             col_scale=p["w_scale"], bias=bias,
                             out_dtype=out_dtype, layer=p.get("layer"))
            if "output_scale" in p:
                # observer-tracked output re-quantization (FP8LinearStatic
                # with quantize_output, ref: linear.py:562-566)
                qo = qmath.quantize_fp8_static(out, p["output_scale"], fdt)
                out = (qo.astype(jnp.float32)
                       * p["output_scale"]).astype(out_dtype)
        else:
            if granularity == PER_TOKEN:
                q, s = qmath.quantize_fp8_per_token(x2, fdt)
            else:
                q, s = qmath.quantize_fp8_per_tensor(x2, fdt)
            out = fp8_matmul(q, p["w"], row_scale=s, col_scale=p["w_scale"],
                             bias=bias, out_dtype=out_dtype,
                             layer=p.get("layer"))
        return out.reshape(*lead, -1)

    if cfg.type == "fp8_e5m2":
        # scale-free cast of act and weight (FP8E5M2Linear, linear.py:583-643)
        q = x2.astype(jnp.float8_e5m2)
        out = fp8_matmul(q, p["w"], bias=bias, out_dtype=out_dtype,
                         layer=p.get("layer"))
        return out.reshape(*lead, -1)

    raise ValueError(f"unknown quant type {cfg.type}")


def fused_linear(x: jnp.ndarray, p: dict, qcfg: Optional[QuantConfig],
                 granularity: str, compute_dtype) -> jnp.ndarray:
    """One GEMM over a fused multi-projection weight [in, sum(outs)] whose
    dequant_scale is a per-COLUMN [sum(outs)] vector (per-section weight
    scales × optional folded input scale) — the generalization of the
    reference's W8A8BFP32OFP32QKVLinear (layers/nn/linear.py:132-245) used
    for Baichuan W_pack, fused Llama QKV, and fused gate|up."""
    from ..kernels.gemm import int8_matmul

    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if qcfg is None or p["w"].dtype not in _QUANT_DTYPES:
        out = jnp.dot(x2, p["w"], preferred_element_type=jnp.float32)
        if p.get("bias") is not None:
            out = out + p["bias"].astype(jnp.float32)
        return out.reshape(*lead, -1).astype(compute_dtype)
    if p["w"].dtype == jnp.uint8:
        # int4 fused path: group scales are already per-column [K/g, N], so
        # per-section scales concatenate for free along N; fused
        # multi-projection weights (qkv | gate|up | W_pack) are always
        # column-parallel under TP
        out = int4_matmul_tp(x2, p, bias=p.get("bias"),
                             out_dtype=compute_dtype, tp="col")
        return out.reshape(*lead, -1)
    if p["w"].dtype != jnp.int8:
        # fp8 fused path: dequant via col vector after the fp8 dot
        from ..kernels.gemm import fp8_matmul

        q = x2.astype(p["w"].dtype) if qcfg.type == "fp8_e5m2" else None
        if q is None:
            if granularity == PER_TOKEN:
                q, s = qmath.quantize_fp8_per_token(x2, p["w"].dtype)
            else:
                q, s = qmath.quantize_fp8_per_tensor(x2, p["w"].dtype)
            out = fp8_matmul(q, p["w"], row_scale=s, col_scale=p["w_scale"],
                             bias=p.get("bias"), out_dtype=compute_dtype,
                             layer=p.get("layer"))
        else:
            out = fp8_matmul(q, p["w"], bias=p.get("bias"),
                             out_dtype=compute_dtype, layer=p.get("layer"))
        return out.reshape(*lead, -1)
    if granularity == PER_TOKEN:
        q, tok_scale = qmath.quantize_act_per_token(x2)
        out = int8_matmul(q, p["w"], row_scale=tok_scale,
                          col_scale=p["dequant_scale"], bias=p.get("bias"),
                          out_dtype=compute_dtype)
    else:
        q = qmath.quantize_act_prescaled(x2)
        out = int8_matmul(q, p["w"], col_scale=p["dequant_scale"],
                          bias=p.get("bias"), out_dtype=compute_dtype)
    return out.reshape(*lead, -1)


def int4_scan_view(tree, l):
    """Per-layer view of a STACKED quantized layer pytree for a lax.scan
    body running with xs=None. Kernel-streamed weights — int4 nibble packs
    (uint8, with their group scales) and fp8 byte tensors — stay stacked
    with the traced layer index attached: kernels/int4.py and
    kernels/fp8.py index them via scalar-prefetched BlockSpec index maps,
    which is the only way to feed a pallas_call from a stacked array
    without XLA materializing a full per-layer copy each step (custom-call
    operands cannot fuse a dynamic_slice). Small leaves (norms, biases,
    per-layer scales) are sliced normally."""
    def idx(a):
        return jax.lax.dynamic_index_in_dim(a, l, 0, keepdims=False)

    def walk(node):
        if isinstance(node, dict):
            w = node.get("w")
            dt = getattr(w, "dtype", None)
            if w is not None and dt == jnp.uint8:
                out = {"w": w, "w_scales": node["w_scales"], "layer": l}
                for k_, v in node.items():
                    if k_ not in ("w", "w_scales"):
                        out[k_] = idx(v)
                return out
            if w is not None and dt in (jnp.float8_e4m3fn, jnp.float8_e5m2):
                out = {"w": w, "layer": l}
                for k_, v in node.items():
                    if k_ != "w":
                        out[k_] = idx(v)
                return out
            return {k_: walk(v) for k_, v in node.items()}
        return idx(node)

    return walk(tree)


quant_scan_view = int4_scan_view  # the view covers int4 AND fp8 leaves


def int4_matmul_tp(x2, p, *, bias, out_dtype, tp):
    """int4 GEMM that MEMORY-SCALES under a model-axis mesh (VERDICT r4
    weak #2: packed custom-call operands replicate under GSPMD — a
    pallas_call cannot be auto-partitioned, so XLA all-gathers the full
    packed bytes every step, defeating TP for big models). Fix: run the
    kernel per-shard via jax.shard_map, the same pattern as
    fused_add_norm_quant.

    tp="col" (qkv/gate/up/fc1 and all fused projections): packed bytes,
    group scales and bias split on the OUTPUT dim; x replicates over
    "model"; each shard's kernel call is bit-identical to a column slice
    of the unsharded one (full-K per-token act quant happens locally on
    identical x), so col TP is EXACT.

    tp="row" (o/down/fc2): packed ROWS split over "model". Split-K nibble
    packing means shard i's packed rows map to TWO x column ranges
    ([i*kh, (i+1)*kh) and [K/2 + i*kh, ...)), so x rides in replicated and
    each shard slices its own planes by axis_index; group scales likewise
    ride replicated (their lo/hi plane rows are non-contiguous per shard —
    scale bytes are 1/16 of packed bytes, an accepted replication).
    Activations quantize against the GLOBAL per-token absmax (computed
    outside, passed in) so shard quantization is bit-consistent; the psum
    over f32 partials is the one place row TP can differ from unsharded
    accumulation order (same property as the int8 row-parallel dot).

    Declines (falls back to the plain call, i.e. GSPMD gather-correctness)
    when the sharded dim is indivisible by the model axis."""
    from ..kernels.int4 import int4_matmul

    mesh = ambient_mesh()
    mp = _mesh_axis(mesh, "model")
    plain = functools.partial(int4_matmul, x2, p["w"], p["w_scales"],
                              bias, out_dtype=out_dtype,
                              layer=p.get("layer"))
    if mesh is None or mp <= 1:
        return plain()
    packed, scales = p["w"], p["w_scales"]
    layer = p.get("layer")
    if packed.ndim == 2:
        packed = packed.reshape((1,) + packed.shape)
        scales = scales.reshape((1,) + scales.shape)
        layer = 0
    # fail fast like the unsharded path: a silent layer-0 default would run
    # every layer with layer 0's weights under a mesh (r5 review)
    assert layer is not None, "stacked int4 weights require a layer index"
    nl, k2, n = packed.shape
    m = x2.shape[0]
    # W4A8-vs-W4A16 routing must follow the GLOBAL m: with x rows sharded
    # over "data" each shard sees m/dp and would flip to the a8 path on
    # prefill shapes, diverging from the unsharded numerics (r5 review)
    from ..kernels.int4 import _A8_MAX_M
    g_a8 = m <= _A8_MAX_M
    dp = _mesh_axis(mesh, "data")
    dn = "data" if dp > 1 and m % dp == 0 else None
    from jax.sharding import PartitionSpec as P

    lidx = jnp.asarray(layer, jnp.int32)
    if tp == "col":
        if n % mp or (bias is not None and bias.shape[-1] % mp):
            return plain()

        def local(x, pk, sc, l, *b):
            return int4_matmul(x, pk, sc, b[0] if b else None,
                               out_dtype=out_dtype, layer=l, a8=g_a8)

        in_specs = [P(dn, None), P(None, None, "model"),
                    P(None, None, "model"), P()]
        operands = [x2, packed, scales, lidx]
        if bias is not None:
            in_specs.append(P("model"))
            operands.append(bias)
        return jax.shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                             out_specs=P(dn, "model"),
                             check_vma=False)(*operands)

    # row-parallel
    if k2 % mp:
        return plain()
    kh = k2 // mp
    g_total = scales.shape[1]
    g2 = g_total // 2
    if g2 % mp:
        return plain()
    gh = g2 // mp
    # pad x to the packed storage depth (int4_padded_k): zero activations
    # quantize to 0 and contribute nothing — same rule as int4_matmul
    if x2.shape[1] < 2 * k2:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((m, 2 * k2 - x2.shape[1]), x2.dtype)], axis=1)
    absmax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    ts = jnp.maximum(absmax.astype(jnp.float32), 1e-8) / 127.0

    def local_row(x, t, pk, sc, l):
        i = jax.lax.axis_index("model")
        xlo = jax.lax.dynamic_slice_in_dim(x, i * kh, kh, 1)
        xhi = jax.lax.dynamic_slice_in_dim(x, k2 + i * kh, kh, 1)
        slo = jax.lax.dynamic_slice_in_dim(sc, i * gh, gh, 1)
        shi = jax.lax.dynamic_slice_in_dim(sc, g2 + i * gh, gh, 1)
        out = int4_matmul(jnp.concatenate([xlo, xhi], axis=1), pk,
                          jnp.concatenate([slo, shi], axis=1), None,
                          out_dtype=jnp.float32, layer=l, tok_scale=t,
                          a8=g_a8)
        return jax.lax.psum(out, "model")

    out = jax.shard_map(
        local_row, mesh=mesh,
        in_specs=(P(dn, None), P(dn, None), P(None, "model", None),
                  P(None, None, None), P()),
        out_specs=P(dn, None), check_vma=False,
    )(x2, ts, packed, scales, lidx)
    if bias is not None:
        out = out + bias.reshape(1, -1).astype(jnp.float32)
    return out.astype(out_dtype)


def linear_prequant(x_q: jnp.ndarray, p: dict, compute_dtype) -> jnp.ndarray:
    """Per-tensor int8 POST_NORM projection whose input is ALREADY int8 —
    fed by the fused add+norm+quant kernel (kernels/fused.py), so the
    activation never round-trips HBM in fp between the norm and the GEMM.
    Works for single ([out]-scalar dequant) and fused ([sum(outs)]-vector
    dequant) weights."""
    from ..kernels.gemm import int8_matmul

    return int8_matmul(x_q, p["w"], col_scale=p["dequant_scale"],
                       bias=p.get("bias"), out_dtype=compute_dtype)


def fused_block_enabled(qcfg: Optional[QuantConfig], capture: bool) -> bool:
    """Whether the per-tensor decoder block should run the fused
    residual+norm+quant kernel: int8 per-tensor fc1, not capturing stats,
    on TPU (or forced for interpret-mode tests via ASQ_FUSED_BLOCK=force)."""
    from ..runtime import flags

    mode = flags().fused_block  # auto | off | force
    if mode == "off" or capture or qcfg is None:
        return False
    if not (qcfg.is_int8 and qcfg.fc1 == PER_TENSOR):
        return False
    # multi-device traces need an ambient mesh (the engines set one) so the
    # kernel can run per-shard via shard_map; a bare >1-device jit would let
    # the partitioner replicate the un-partitioned pallas call
    return mode == "force" or (jax.default_backend() == "tpu"
                               and (jax.device_count() == 1
                                    or ambient_mesh() is not None))


def fused_add_norm_quant(h, x, gamma, beta=None, *, eps, interpret=False):
    """[T, D] fused residual-add + (RMS|Layer)Norm + int8-quantize, routed
    through kernels/fused.py — shard_mapped over the row dim when an ambient
    mesh is present (rows ride the data axis; gamma/beta replicate; each
    model/stage shard computes its replica locally, exactly like XLA would
    for the unfused chain)."""
    from ..kernels.fused import (fused_add_layernorm_quant,
                                 fused_add_rmsnorm_quant)

    if beta is None:
        kern = lambda h_, x_, g_: fused_add_rmsnorm_quant(
            h_, x_, g_, eps=eps, interpret=interpret)
        operands = (h, x, gamma)
    else:
        kern = lambda h_, x_, g_, b_: fused_add_layernorm_quant(
            h_, x_, g_, b_, eps=eps, interpret=interpret)
        operands = (h, x, gamma, beta)
    mesh = ambient_mesh()
    dp = _mesh_axis(mesh, "data")
    if mesh is None or h.shape[0] % dp != 0:
        return kern(*operands)
    from jax.sharding import PartitionSpec as P

    dn = "data" if dp > 1 else None
    row = P(dn, None)
    vec = P(None, )
    in_specs = (row, row, vec) if beta is None else (row, row, vec, vec)
    return jax.shard_map(kern, mesh=mesh, in_specs=in_specs,
                         out_specs=(row, row), check_vma=False)(*operands)


def float_linear(x: jnp.ndarray, p: dict, out_dtype=None) -> jnp.ndarray:
    """Unquantized projection (float model path + lm_head, which the
    reference deliberately keeps fp, models/llama.py:409-410)."""
    if out_dtype is None:
        out_dtype = x.dtype
    out = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if p.get("bias") is not None:
        out = out + p["bias"].astype(jnp.float32)
    return out.astype(out_dtype)


_QUANT_DTYPES = (jnp.int8, jnp.float8_e4m3fn, jnp.float8_e5m2,
                 jnp.uint8)  # uint8 = nibble-packed int4 (kernels/int4.py)


def linear(x, p, cfg: Optional[QuantConfig], granularity=PER_TENSOR,
           kind=LinearKind.POST_NORM, out_dtype=None, tp_axis=None):
    """Dispatch float vs quantized on the weight leaf's dtype."""
    if cfg is None or p["w"].dtype not in _QUANT_DTYPES:
        return float_linear(x, p, out_dtype)
    return quant_linear(x, p, cfg, granularity, kind, out_dtype, tp_axis)


# ---------------------------------------------------------------------------
# Attention (eager math, matching the reference's attn_implementation="eager";
# Pallas flash attention slots in behind the same signature)
# ---------------------------------------------------------------------------


class KVCacheLayer(NamedTuple):
    k: jnp.ndarray  # [B, S_max, H_kv, Dh]
    v: jnp.ndarray  # [B, S_max, H_kv, Dh]


class QuantKVCacheLayer(NamedTuple):
    """INT8 KV cache with per-token-per-head absmax scales — the capability
    the reference's vestigial int8 BMM stack promised (SURVEY.md #18/#35,
    csrc/kernels/bmm.cu) realized TPU-style.

    Current value is CAPACITY: 2x the context length / concurrent slots per
    HBM byte. Measured decode throughput is ~7% below the bf16 cache
    (v5e, 1.1B, ctx 900, b8: 2440 vs 2630 tok/s) because the XLA path
    materializes a dequantized copy before attention (int8 read + bf16
    write/read > plain bf16 read). Recovering the bandwidth win needs a
    decode-attention kernel that reads int8 and dequantizes in VMEM —
    planned (ROADMAP).
    """

    k: jnp.ndarray        # int8 [B, S_max, H_kv, Dh]
    v: jnp.ndarray        # int8 [B, S_max, H_kv, Dh]
    k_scale: jnp.ndarray  # f32  [B, S_max, H_kv]
    v_scale: jnp.ndarray  # f32  [B, S_max, H_kv]


class PagedKVPool(NamedTuple):
    """Block-paged KV store (vLLM-style block tables, TPU-native form).

    Physical pages hold ``block_size`` consecutive tokens of ONE sequence;
    a per-slot block table maps virtual block j of slot b to its physical
    page. Capacity is pooled across slots (total pages can be far below
    max_batch x max_seq worth of contiguous rows) and full prefix blocks
    are SHARED between slots by pointing multiple table rows at the same
    page (copy-free prefix caching — the round-2 prefix cache copied K/V
    into every slot row, serve/batching.py register_prefix).

    Beyond-reference scope: the reference has no serving tier at all
    (SURVEY.md §2.6); this mirrors production TPU serving stacks.

    k, v:  [L, N_pages, block_size, H_kv, Dh]
    table: int32 [B, M] physical page of (slot, virtual block); page 0 is
           the engine's scratch page (inactive rows write there).
    """

    k: jnp.ndarray
    v: jnp.ndarray
    table: jnp.ndarray


class QuantPagedKVPool(NamedTuple):
    """INT8 block-paged KV store: PagedKVPool with per-token-per-head
    absmax scales riding in scale pages — paging's pooled capacity TIMES
    the int8 cache's 2x bytes-per-token win (the reference's vestigial
    int8-BMM promise, SURVEY.md #18/#35, realized at serving scale).

    k, v:               int8 [L, N_pages, block_size, H_kv, Dh]
    k_scale, v_scale:   f32  [L, N_pages, block_size, H_kv]
    table:              int32 [B, M]
    """

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: jnp.ndarray
    v_scale: jnp.ndarray
    table: jnp.ndarray


PAGED_POOL_TYPES = (PagedKVPool, QuantPagedKVPool)


def _paged_write(pages, val, l, table, positions):
    """Scatter val [B, T, H, D] (or scales [B, T, H]) into pages
    [L, N, bs, H(, D)] at layer l; positions [B, T] are absolute token
    positions routed through table."""
    bs = pages.shape[2]
    pid = jnp.take_along_axis(table, positions // bs, axis=1)   # [B, T]
    off = positions % bs
    return pages.at[l, pid, off].set(val.astype(pages.dtype))


def paged_attend(q, k_pages, v_pages, table, pos_q, scale, compute_dtype,
                 m_used=None, ks_pages=None, vs_pages=None,
                 alibi_slopes=None, sliding_window=0):
    """Online-softmax attention over block-paged KV — pure lax (scan over
    virtual blocks), so it runs INSIDE the decode layer-scan without the
    nested-pallas execution hazard this runtime has (ROADMAP "Environment
    gotchas"). Bandwidth-optimal like a flash kernel: each mapped page is
    gathered once; no [B, S_virtual] cache copy is ever materialized.

    q: [B, T, Hq, D] (post-RoPE); k_pages/v_pages: [N, bs, Hkv, D] (layer
    slice); table: [B, M]; pos_q: [B, T] absolute positions of the queries
    (causal mask: key position <= query position). The caller writes the
    new tokens' K/V into the pages FIRST (write-then-attend, same as the
    contiguous path), so self-attention needs no separate in-chunk pass.
    ks_pages/vs_pages: optional int8-cache dequant scale pages
    [N, bs, Hkv] — factored out of the matmuls exactly like the
    contiguous raw-int8 attend (scores *= ks, probs *= vs).

    alibi_slopes: optional f32 [Hq] — adds the Baichuan-13B shift-invariant
    ALiBi bias m_h * key_pos to the scores (models/baichuan.py builds the
    same bias[h, q, k] = m_h * k form for the contiguous path).
    sliding_window: > 0 restricts keys to (pos_q - window, pos_q] — HF
    eager Mistral semantics, matching cache_mask_and_routing's mask."""
    b, t, hq, d = q.shape
    n, bs, hkv, _ = k_pages.shape
    m = table.shape[1] if m_used is None else min(m_used, table.shape[1])
    g = hq // hkv
    qf = (q.astype(jnp.float32) * scale).reshape(b, t, hkv, g, d)
    slp = (alibi_slopes.astype(jnp.float32).reshape(hkv, g)
           if alibi_slopes is not None else None)
    neg = jnp.float32(-1e30)

    def blk(carry, j):
        mx, s, acc = carry                       # [B,T,Hkv,G], same, +[D]
        pid = table[:, j]                        # [B]
        kb = k_pages[pid].astype(jnp.float32)    # [B, bs, Hkv, D]
        vb = v_pages[pid].astype(jnp.float32)
        sc = jnp.einsum("bthgd,bshd->bthgs", qf, kb)   # [B,T,Hkv,G,bs]
        if ks_pages is not None:
            ks = ks_pages[pid]                   # [B, bs, Hkv]
            sc = sc * jnp.transpose(ks, (0, 2, 1))[:, None, :, None, :]
        posk = j * bs + jnp.arange(bs, dtype=jnp.int32)
        if slp is not None:
            sc = sc + (slp[None, None, :, :, None]
                       * posk.astype(jnp.float32)[None, None, None, None, :])
        valid = posk[None, None, :] <= pos_q[:, :, None]        # [B,T,bs]
        if sliding_window:
            valid = valid & (posk[None, None, :]
                             > pos_q[:, :, None] - sliding_window)
        sc = jnp.where(valid[:, :, None, None, :], sc, neg)
        bmx = jnp.max(sc, axis=-1)                              # [B,T,Hkv,G]
        nmx = jnp.maximum(mx, bmx)
        corr = jnp.exp(mx - nmx)
        p = jnp.exp(sc - nmx[..., None])                        # [B,T,Hkv,G,bs]
        s = s * corr + jnp.sum(p, axis=-1)
        if vs_pages is not None:
            vs = vs_pages[pid]
            p = p * jnp.transpose(vs, (0, 2, 1))[:, None, :, None, :]
        acc = acc * corr[..., None] + jnp.einsum(
            "bthgs,bshd->bthgd", p, vb)
        return (nmx, s, acc), None

    init = (jnp.full((b, t, hkv, g), neg, jnp.float32),
            jnp.zeros((b, t, hkv, g), jnp.float32),
            jnp.zeros((b, t, hkv, g, d), jnp.float32))
    (mx, s, acc), _ = jax.lax.scan(blk, init,
                                   jnp.arange(m, dtype=jnp.int32))
    out = acc / jnp.maximum(s, 1e-30)[..., None]
    return out.reshape(b, t, hq, d).astype(compute_dtype)


def paged_update_and_attend(q, k, v, carry, cache_index, scale,
                            compute_dtype, kv_window=None,
                            alibi_slopes=None, sliding_window=0):
    """Carry-mode write+attend against a PagedKVPool (decode steps and
    suffix-chunk prefill). ALiBi (Baichuan-13B) rides as per-head slopes;
    sliding window (Mistral) masks inside the block scan — every model
    family serves paged (VERDICT r3 item 3)."""
    cache_full, l = carry
    b, t = q.shape[:2]
    pos = cache_slots(cache_index, b, t)
    quant = isinstance(cache_full, QuantPagedKVPool)
    if quant:
        kq, ks_new = _quantize_kv(k)
        vq, vs_new = _quantize_kv(v)
        new_cache = QuantPagedKVPool(
            k=_paged_write(cache_full.k, kq, l, cache_full.table, pos),
            v=_paged_write(cache_full.v, vq, l, cache_full.table, pos),
            k_scale=_paged_write(cache_full.k_scale, ks_new, l,
                                 cache_full.table, pos),
            v_scale=_paged_write(cache_full.v_scale, vs_new, l,
                                 cache_full.table, pos),
            table=cache_full.table)
        ks_l = _layer_slice(new_cache.k_scale, l)
        vs_l = _layer_slice(new_cache.v_scale, l)
    else:
        new_cache = PagedKVPool(
            k=_paged_write(cache_full.k, k, l, cache_full.table, pos),
            v=_paged_write(cache_full.v, v, l, cache_full.table, pos),
            table=cache_full.table)
        ks_l = vs_l = None
    kl = _layer_slice(new_cache.k, l)
    vl = _layer_slice(new_cache.v, l)
    # kv_window bounds the block scan to the live virtual blocks (the
    # paged analog of the contiguous static context bucket)
    bs = cache_full.k.shape[2]
    m_used = (-(-kv_window // bs)) if kv_window is not None else None
    ctx = paged_attend(q, kl, vl, new_cache.table, pos, scale, compute_dtype,
                       m_used=m_used, ks_pages=ks_l, vs_pages=vs_l,
                       alibi_slopes=alibi_slopes,
                       sliding_window=sliding_window)
    return new_cache, ctx


def make_kv_cache(num_layers: int, batch: int, max_len: int, num_kv_heads: int,
                  head_dim: int, dtype=jnp.bfloat16):
    """dtype jnp.int8 -> quantized cache; anything else -> plain cache."""
    shape = (num_layers, batch, max_len, num_kv_heads, head_dim)
    if dtype == jnp.int8:
        sshape = shape[:-1]
        return QuantKVCacheLayer(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.ones(sshape, jnp.float32),
            v_scale=jnp.ones(sshape, jnp.float32))
    return KVCacheLayer(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def _quantize_kv(x: jnp.ndarray):
    """x: [B, T, H, Dh] -> (int8 values, f32 scales [B, T, H]); symmetric
    absmax over the head dim, 1e-8 clamp like activation quant."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -128, 127).astype(jnp.int8)
    return q, scale


def _is_vector_index(cache_index) -> bool:
    return getattr(cache_index, "ndim", 0) == 1


def _write(buf, val, cache_index):
    """Write val [B, T, ...] into buf [B, S, ...] at cache_index — a scalar
    (same offset for every row, contiguous dynamic_update_slice) or an int32
    [B] vector (per-row offsets, scatter; the continuous-batching path where
    each slot fills at its own length)."""
    if _is_vector_index(cache_index):
        b, t = val.shape[:2]
        rows = jnp.arange(b, dtype=jnp.int32)[:, None]
        slots = cache_index[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        return buf.at[rows, slots].set(val)
    zeros = (0,) * (buf.ndim - 2)
    return jax.lax.dynamic_update_slice(buf, val, (0, cache_index) + zeros)


def cache_update_and_read(cache, k, v, cache_index, compute_dtype):
    """Write new k/v ([B, T, H, Dh]) at cache_index (scalar or per-row [B]
    vector), return (new_cache, k_all, v_all) with k_all/v_all dequantized to
    compute_dtype. Handles both plain and int8 caches; cache=None passes
    through."""
    if cache is None:
        return None, k, v
    if isinstance(cache, QuantKVCacheLayer):
        kq, ks = _quantize_kv(k)
        vq, vs = _quantize_kv(v)
        k_all = _write(cache.k, kq, cache_index)
        v_all = _write(cache.v, vq, cache_index)
        ks_all = _write(cache.k_scale, ks, cache_index)
        vs_all = _write(cache.v_scale, vs, cache_index)
        new_cache = QuantKVCacheLayer(k=k_all, v=v_all, k_scale=ks_all,
                                      v_scale=vs_all)
        k_de = (k_all.astype(jnp.float32) * ks_all[..., None]).astype(compute_dtype)
        v_de = (v_all.astype(jnp.float32) * vs_all[..., None]).astype(compute_dtype)
        return new_cache, k_de, v_de
    k_all = _write(cache.k, k.astype(cache.k.dtype), cache_index)
    v_all = _write(cache.v, v.astype(cache.v.dtype), cache_index)
    return (KVCacheLayer(k=k_all, v=v_all),
            k_all.astype(compute_dtype), v_all.astype(compute_dtype))


def cache_write(cache, k, v, cache_index):
    """Write-only cache update ([B, T, H, Dh] at cache_index) — no
    dequantized copy is materialized. The int8 fast path: attend() reads
    the int8 values directly, so HBM traffic stays 1 B/elt."""
    if isinstance(cache, QuantKVCacheLayer):
        kq, ks = _quantize_kv(k)
        vq, vs = _quantize_kv(v)
        return QuantKVCacheLayer(
            k=_write(cache.k, kq, cache_index),
            v=_write(cache.v, vq, cache_index),
            k_scale=_write(cache.k_scale, ks, cache_index),
            v_scale=_write(cache.v_scale, vs, cache_index))
    return KVCacheLayer(k=_write(cache.k, k.astype(cache.k.dtype), cache_index),
                        v=_write(cache.v, v.astype(cache.v.dtype), cache_index))


def cache_mask_and_routing(kv_cache, cache_index, b: int, t: int,
                           kv_valid, pad_starts, sliding_window: int = 0):
    """The shared per-family forward prologue for cached attention: returns
    (slots, mask, window, chunk0, chunkN).

    slots: cache-slot indices of the tokens being written [B, T] (also the
    default rope positions when there is no padding). mask: bool
    [B, 1, T, S_max] — attend to col s iff s <= own slot, restricted by
    pad_starts (left-pad: valid keys start at pad_starts[b]) or kv_valid.
    window: decode_window for the t == 1 kernel path. chunk0: prefill into
    an EMPTY cache (static index 0, no pads) — plain causality over the
    chunk, the in-register flash path. chunkN: mid-prompt chunk (scalar
    index, no kv_valid) — the banded flash path (pad_starts rides along as
    the kernel's per-row start)."""
    assert cache_index is not None
    if isinstance(kv_cache, PAGED_POOL_TYPES):
        # paged pool: masking (incl. sliding window) happens inside
        # paged_attend via block-table key positions; no [B, S_max] mask
        # exists. The family passes cfg.sliding_window / ALiBi slopes
        # through to update_and_attend directly.
        assert kv_valid is None and pad_starts is None, \
            "paged KV serves unpadded prompts"
        return cache_slots(cache_index, b, t), None, None, False, False
    s_max = kv_cache.k.shape[2]
    slots = cache_slots(cache_index, b, t)
    col = jnp.arange(s_max, dtype=jnp.int32)[None, None, None, :]
    mask = col <= slots[:, None, :, None]
    if sliding_window:
        # attend only the last `sliding_window` positions (self inclusive) —
        # HF's eager Mistral semantics: col in (slot - window, slot]
        mask = mask & (col > slots[:, None, :, None] - sliding_window)
    if kv_valid is None and pad_starts is not None:
        mask = mask & (col >= pad_starts[:, None, None, None])
    if kv_valid is not None:
        mask = mask & kv_valid[:, None, None, :]
    window = decode_window(cache_index, kv_valid, b,
                           sliding_window) if t == 1 else None
    scalar_index = not _is_vector_index(cache_index)
    # the flash fast paths assume pure causality: chunk0 (pos = 0) keeps
    # the fast path when the window cannot bind (slots < t <= window);
    # chunkN's dynamic pos prevents a static no-bind proof, so any window
    # falls back to the masked eager path there
    chunk0 = (kv_valid is None and t > 1 and pad_starts is None
              and (not sliding_window or t <= sliding_window)
              and isinstance(cache_index, int) and cache_index == 0)
    chunkN = (kv_valid is None and t > 1 and scalar_index
              and not sliding_window and not chunk0)
    return slots, mask, window, chunk0, chunkN


def uncached_mask_and_positions(b: int, t: int, positions, attention_mask,
                                sliding_window: int = 0):
    """The per-family forward prologue for the NO-cache path (the twin of
    cache_mask_and_routing): default rope/embedding positions [B, T], the
    causal (optionally sliding-window) mask merged with an HF-style
    attention_mask, and the plain_causal fast-path flag. One helper, four
    families — the hunk used to be copy-pasted per forward."""
    if positions is None:
        positions = jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.int32)[None, :], (b, t))
    col = jnp.arange(t, dtype=jnp.int32)[None, None, None, :]
    row = jnp.arange(t, dtype=jnp.int32)[None, None, :, None]
    mask = col <= row
    if sliding_window:
        mask = mask & (col > row - sliding_window)
    if attention_mask is not None:
        mask = mask & attention_mask[:, None, None, :].astype(bool)
    plain_causal = attention_mask is None and not sliding_window
    return positions, mask, plain_causal


def decode_window(cache_index, kv_valid, batch: int,
                  sliding_window: int = 0):
    """Per-row [start, length) windows of valid cache slots for the
    single-token decode step. cache_index: scalar or [B] vector of the slot
    being written this step; kv_valid: bool [B, S] AFTER the current slot was
    marked (or None when slots fill from 0 with no padding). A sliding
    window clamps starts to the last `sliding_window` positions."""
    idx = jnp.asarray(cache_index, jnp.int32)
    lengths = jnp.broadcast_to(idx, (batch,)) + 1
    if kv_valid is None:
        starts = jnp.zeros((batch,), jnp.int32)
    else:
        # valid slots are contiguous [start, length): start = length - count
        starts = lengths - jnp.sum(kv_valid, axis=1, dtype=jnp.int32)
    if sliding_window:
        starts = jnp.maximum(starts, lengths - sliding_window)
    return starts, lengths


def ambient_mesh():
    """The mesh made ambient by the serving engines via
    ``jax.sharding.set_mesh`` (None outside any multi-device mesh). Lets the
    functional model code route Pallas kernels through ``jax.shard_map``
    per-shard without threading a mesh argument through every forward."""
    try:
        am = jax.sharding.get_abstract_mesh()
    except Exception:
        return None
    if am is None or am.empty or am.size == 1:
        return None
    return am


def _mesh_axis(mesh, name: str) -> int:
    if mesh is None or name not in mesh.axis_names:
        return 1
    return dict(mesh.shape)[name]


def _kernel_gate(q, full_cache, carry):
    """Shared mesh/shape gate for the Pallas attention kernels: returns
    (mesh, ok_mesh, q_local, cache_local, on_tpu, partitionable) where
    q_local/cache_local are the PER-SHARD shapes under an ambient mesh (the
    data/model axes must divide batch and both head counts congruently so
    each shard keeps whole GQA groups)."""
    mesh = ambient_mesh()
    dp = _mesh_axis(mesh, "data")
    mp = _mesh_axis(mesh, "model")
    bq, tq, hq_, dh = q.shape
    if carry is not None:
        # carry-mode cache leaves are [L, B, S, H, D]
        _, bc, s_max, hkv_, dh_c = full_cache.k.shape
    else:
        bc, s_max, hkv_, dh_c = full_cache.k.shape
    ok_mesh = (bq % dp == 0 and hq_ % mp == 0 and hkv_ % mp == 0)
    q_local = (bq // dp, tq, hq_ // mp, dh)
    cache_local = (bc // dp, s_max, hkv_ // mp, dh_c)
    on_tpu = jax.default_backend() == "tpu"
    # without an ambient mesh a >1-device trace would let the partitioner
    # replicate the un-partitioned pallas call; keep the XLA path there
    partitionable = jax.device_count() == 1 or mesh is not None
    return mesh, ok_mesh, q_local, cache_local, on_tpu, partitionable


def _banded_mode() -> str:
    """auto | off | force (force = interpret off-TPU, for CI equality)."""
    from ..runtime import flags

    return flags().banded_prefill


def _run_banded_kernel(mesh, q, k_row, v_row, pos, starts, *, scale,
                       interpret=False):
    """flash_attention_banded, shard_mapped over (data->batch, model->heads)
    when an ambient mesh is present (embarrassingly parallel, no
    collectives; specs match the KV-cache layout)."""
    from ..kernels.attention import flash_attention_banded

    if mesh is None:
        return flash_attention_banded(q, k_row, v_row, pos, starts,
                                      sm_scale=scale, interpret=interpret)
    from jax.sharding import PartitionSpec as P

    dn = "data" if _mesh_axis(mesh, "data") > 1 else None
    mn = "model" if _mesh_axis(mesh, "model") > 1 else None

    def local(q_, k_, v_, p_, st_):
        return flash_attention_banded(q_, k_, v_, p_, st_, sm_scale=scale,
                                      interpret=interpret)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(dn, None, mn, None), P(dn, None, mn, None),
                  P(dn, None, mn, None), P(dn), P(dn)),
        out_specs=P(dn, None, mn, None), check_vma=False,
    )(q, k_row, v_row, pos, starts)


def update_and_attend(q, k, v, cache, cache_index, mask, scale, compute_dtype,
                      *, window=None, alibi_bias=None, plain_causal=False,
                      carry=None, chunk0_causal=False, banded=False,
                      banded_starts=None, kv_window=None,
                      alibi_slopes=None, sliding_window=0):
    """Cache write + attention for one layer, routing the single-token decode
    step through the flash-decode Pallas kernel when possible (in-VMEM int8
    dequant — the production form of the reference's vestigial int8 BMM
    attention, csrc/kernels/bmm.cu). q/k/v: [B, T, H(,kv), Dh] post-RoPE.

    window: (starts, lengths) int32 [B] from decode_window(); required for
    the kernel path. Falls back to dequant + eager/flash-prefill attention
    everywhere else (prefill, ALiBi, unsupported shapes, non-TPU).

    chunk0_causal: the caller proves this is a PREFILL INTO AN EMPTY CACHE
    (static cache_index == 0, no kv_valid): the cache-slot mask then equals
    plain causality over the chunk itself, so attention runs on the
    in-register K/V through the flash-prefill kernel instead of the eager
    whole-cache path (measured 2.3x on b4/t1024 TinyLlama prefill — the
    eager path materializes f32 [T, S_max] scores per layer)."""
    b, t = q.shape[:2]
    full_cache = carry[0] if carry is not None else cache
    if isinstance(full_cache, PAGED_POOL_TYPES):
        # ALiBi arrives as per-head slopes (alibi_slopes), never as the
        # dense [H, T, S_max] bias tensor — there is no S_max axis paged
        assert carry is not None and alibi_bias is None and window is None
        return paged_update_and_attend(q, k, v, carry, cache_index, scale,
                                       compute_dtype, kv_window=kv_window,
                                       alibi_slopes=alibi_slopes,
                                       sliding_window=sliding_window)
    if chunk0_causal and t > 1 and alibi_bias is None and full_cache is not None:
        if carry is not None:
            cache_full, l = carry
            new_cache = _carry_write(cache_full, l, k, v, cache_index, b, t)
        else:
            new_cache = cache_write(cache, k, v, cache_index)
        if isinstance(full_cache, QuantKVCacheLayer):
            # self-attention must see the int8 round-trip so later steps
            # (reading the quantized cache) agree exactly; XLA CSEs these
            # with the quantization inside the cache write above
            kq, ks = _quantize_kv(k)
            vq, vs = _quantize_kv(v)
            k_att = (kq.astype(jnp.float32) * ks[..., None]).astype(compute_dtype)
            v_att = (vq.astype(jnp.float32) * vs[..., None]).astype(compute_dtype)
        else:
            k_att = k.astype(compute_dtype)
            v_att = v.astype(compute_dtype)
        causal = (jnp.arange(t, dtype=jnp.int32)[None, :]
                  <= jnp.arange(t, dtype=jnp.int32)[:, None])[None, None]
        return new_cache, attend(q, k_att, v_att, causal, scale,
                                 plain_causal=True)
    if banded and t > 1 and alibi_bias is None and full_cache is not None:
        # mid-prompt CHUNK prefill (scalar traced cache_index, no kv_valid):
        # queries at slots [pos, pos+t) attend cache cols <= pos+row — the
        # banded flash kernel; eager materialized f32 [T, S_max] scores
        from ..kernels.attention import banded_supported

        (mesh, mesh_ok, q_local, cache_local, on_tpu,
         partitionable) = _kernel_gate(q, full_cache, carry)
        ok = mesh_ok and banded_supported(q_local, cache_local)
        bmode = _banded_mode()
        if ok and bmode != "off" and ((on_tpu and partitionable)
                                      or bmode == "force"):
            if carry is not None:
                cache_full, l = carry
                new_cache = _carry_write(cache_full, l, k, v, cache_index, b, t)
                k_l = _layer_slice(new_cache.k, l)
                v_l = _layer_slice(new_cache.v, l)
                ks_l = (_layer_slice(new_cache.k_scale, l)
                        if isinstance(new_cache, QuantKVCacheLayer) else None)
                vs_l = (_layer_slice(new_cache.v_scale, l)
                        if isinstance(new_cache, QuantKVCacheLayer) else None)
            else:
                new_cache = cache_write(cache, k, v, cache_index)
                k_l, v_l = new_cache.k, new_cache.v
                ks_l = (new_cache.k_scale
                        if isinstance(new_cache, QuantKVCacheLayer) else None)
                vs_l = (new_cache.v_scale
                        if isinstance(new_cache, QuantKVCacheLayer) else None)
            ct = jnp.float32 if q.dtype == jnp.float32 else jnp.bfloat16
            if ks_l is not None:
                # int8 rows: dequantize into a [S] copy — 2x the int8 bytes,
                # still far below the eager path's f32 score materialization
                k_l = (k_l.astype(jnp.float32) * ks_l[..., None]).astype(ct)
                v_l = (v_l.astype(jnp.float32) * vs_l[..., None]).astype(ct)
            else:
                k_l = k_l.astype(ct)
                v_l = v_l.astype(ct)
            pos = jnp.broadcast_to(jnp.asarray(cache_index, jnp.int32), (b,))
            starts = (jnp.zeros((b,), jnp.int32) if banded_starts is None
                      else jnp.asarray(banded_starts, jnp.int32))
            out = _run_banded_kernel(mesh, q.astype(ct), k_l, v_l, pos,
                                     starts, scale=scale,
                                     interpret=not on_tpu)
            return new_cache, out.astype(q.dtype)
    # The flash-decode Pallas kernels (v2 grid / whole-row simple /
    # layered manual-DMA) were PRUNED in round 4: no measured
    # configuration on this runtime ever selected them. The XLA attend
    # below reads the raw (int8) cache with scales factored into
    # scores/probs and fuses the whole chain — measured faster in the
    # engines' nested loops than every kernel variant (b8/s2048 int8:
    # XLA 2109 tok/s vs kernel-on 1831; layered: 0.392 ms/step XLA vs
    # 1.72 ms unrolled-layered, 25 ms in-scan — BENCHMARKS.md round 4).
    if carry is not None:
        cache_full, l = carry
        new_cache, ctx = carry_update_and_attend(
            q, k, v, cache_full, l, cache_index, mask, scale, compute_dtype,
            alibi_bias=alibi_bias, kv_window=kv_window)
        return new_cache, ctx

    new_cache, k_att, v_att, ks, vs = cache_update_and_read_raw(
        cache, k, v, cache_index)
    return new_cache, attend(q, k_att, v_att, mask, scale,
                             alibi_bias=alibi_bias, plain_causal=plain_causal,
                             k_scale=ks, v_scale=vs)


def cache_update_and_read_raw(cache, k, v, cache_index):
    """Write new k/v, return (new_cache, k_all, v_all, k_scale, v_scale)
    where k_all/v_all are the RAW cache values (int8 for quant caches —
    never dequantized into a copy; scales are returned for attend()'s
    factored dequant) and scales are None for plain caches."""
    if cache is None:
        return None, k, v, None, None
    if isinstance(cache, QuantKVCacheLayer):
        kq, ks = _quantize_kv(k)
        vq, vs = _quantize_kv(v)
        new_cache = QuantKVCacheLayer(
            k=_write(cache.k, kq, cache_index),
            v=_write(cache.v, vq, cache_index),
            k_scale=_write(cache.k_scale, ks, cache_index),
            v_scale=_write(cache.v_scale, vs, cache_index))
        return (new_cache, new_cache.k, new_cache.v,
                new_cache.k_scale, new_cache.v_scale)
    k_all = _write(cache.k, k.astype(cache.k.dtype), cache_index)
    v_all = _write(cache.v, v.astype(cache.v.dtype), cache_index)
    return KVCacheLayer(k=k_all, v=v_all), k_all, v_all, None, None


def _layer_slice(full, l):
    """cache leaf [L, B, S, ...] -> layer l's [B, S, ...] (a leading-dim
    dynamic slice — fuses into the consuming dot's operand read)."""
    return jax.lax.dynamic_index_in_dim(full, l, 0, keepdims=False)


def _scatter_tokens(full, val, l, cache_index, batch, t):
    """Write val [B, T, ...] into full [L, B, S, ...] at layer l, slots
    cache_index..cache_index+T (scalar) or per-row offsets (vector) —
    touching ONLY the new tokens' slices."""
    rows = jnp.arange(batch, dtype=jnp.int32)[:, None]
    slots = cache_slots(cache_index, batch, t)
    return full.at[l, rows, slots].set(val)


def _carry_write(cache, l, k, v, cache_index, b, t):
    """Scatter ONLY the new tokens' (quantized) K/V into the carried
    [L, B, S, ...] cache at layer l."""
    if isinstance(cache, QuantKVCacheLayer):
        kq, ks_new = _quantize_kv(k)
        vq, vs_new = _quantize_kv(v)
        return QuantKVCacheLayer(
            k=_scatter_tokens(cache.k, kq, l, cache_index, b, t),
            v=_scatter_tokens(cache.v, vq, l, cache_index, b, t),
            k_scale=_scatter_tokens(cache.k_scale, ks_new, l, cache_index, b, t),
            v_scale=_scatter_tokens(cache.v_scale, vs_new, l, cache_index, b, t))
    return KVCacheLayer(
        k=_scatter_tokens(cache.k, k.astype(cache.k.dtype), l, cache_index, b, t),
        v=_scatter_tokens(cache.v, v.astype(cache.v.dtype), l, cache_index, b, t))


def carry_update_and_attend(q, k, v, cache, l, cache_index, mask, scale,
                            compute_dtype, *, window=None, alibi_bias=None,
                            kv_window=None):
    """Carry-mode cache update + attention for one layer of a scan whose
    CARRY holds the full [L, B, S, ...] cache (vs the round-1 xs/ys layout,
    which forced a full-cache rewrite into the stacked scan outputs every
    step — ~2x the cache bytes per decode step in pure copy traffic).

    Only the new tokens' K/V (quantized for int8 caches) are scattered into
    the carry; attention runs SPLIT: scores over the untouched cache slice
    (masked to exclude the slots being written) concatenated with scores
    over the in-register new tokens, one softmax across both. No full-cache
    write and no dequantized copy ever materializes.

    q/k/v: [B, T, H(,kv), Dh] post-RoPE. mask: bool [B, 1, T, S] (the
    standard slot mask INCLUDING the new tokens' columns). Returns
    (new_full_cache, ctx [B, T, H*Dh-shaped like attend's output])."""
    b, t = q.shape[:2]
    s_max = cache.k.shape[2]
    quant = isinstance(cache, QuantKVCacheLayer)
    if quant:
        kq, ks_new = _quantize_kv(k)
        vq, vs_new = _quantize_kv(v)
        # self-attention sees the round-tripped values so future steps (which
        # read the quantized cache) agree exactly with the current step
        k_self = (kq.astype(jnp.float32) * ks_new[..., None]).astype(compute_dtype)
        v_self = (vq.astype(jnp.float32) * vs_new[..., None]).astype(compute_dtype)
        new_cache = QuantKVCacheLayer(
            k=_scatter_tokens(cache.k, kq, l, cache_index, b, t),
            v=_scatter_tokens(cache.v, vq, l, cache_index, b, t),
            k_scale=_scatter_tokens(cache.k_scale, ks_new, l, cache_index, b, t),
            v_scale=_scatter_tokens(cache.v_scale, vs_new, l, cache_index, b, t))
        ks_l = _layer_slice(cache.k_scale, l)
        vs_l = _layer_slice(cache.v_scale, l)
    else:
        k_self = k.astype(compute_dtype)
        v_self = v.astype(compute_dtype)
        new_cache = KVCacheLayer(
            k=_scatter_tokens(cache.k, k.astype(cache.k.dtype), l,
                              cache_index, b, t),
            v=_scatter_tokens(cache.v, v.astype(cache.v.dtype), l,
                              cache_index, b, t))
        ks_l = vs_l = None
    if kv_window is not None and kv_window < s_max:
        # STATIC context window (a 256-step bucket covering every live
        # slot): the per-layer dynamic_index of the carried cache
        # materializes an UNFUSED full-length [B, S_max, H, D] copy per
        # layer (measured ~50 us/layer at b8/s2048 even when barely
        # consumed — the dominant long-context decode overhead). The layer
        # index and the window must be ONE dynamic_slice: a static slice
        # stacked on the dynamic index still copies the full length first.
        s_max = kv_window

        def _sl(full):
            sizes = (1, full.shape[1], kv_window) + full.shape[3:]
            start = (l,) + (0,) * (full.ndim - 1)
            return jax.lax.dynamic_slice(full, start, sizes)[0]

        k_l = _sl(cache.k)
        v_l = _sl(cache.v)
        if quant:
            ks_l = _sl(cache.k_scale)
            vs_l = _sl(cache.v_scale)
        mask = mask[..., :s_max]
        if alibi_bias is not None:
            alibi_bias = alibi_bias[..., :s_max]
    else:
        k_l = _layer_slice(cache.k, l)
        v_l = _layer_slice(cache.v, l)

    slots = cache_slots(cache_index, b, t)                      # [B, T]
    # cache-part mask: the base mask minus the columns being written now.
    # t=1 (the decode hot path, executed once per LAYER) uses a broadcast
    # compare instead of a scatter
    if t == 1:
        written = jnp.arange(s_max, dtype=jnp.int32)[None, :] == slots
    else:
        written = jnp.zeros((b, s_max), bool).at[
            jnp.arange(b)[:, None], slots].set(True)
    mask_c = mask & ~written[:, None, None, :]
    # self-part mask: gather the base mask at the written columns — inherits
    # causality, kv_valid and padding semantics in one shot
    mask_s = jnp.take_along_axis(
        mask | jnp.zeros((b, 1, t, s_max), bool),               # broadcast B
        slots[:, None, None, :], axis=3)                        # [B, 1, T, T]

    h = q.shape[2]
    hkv = k_l.shape[2]
    g = h // hkv
    dh = q.shape[3]
    # bf16 MXU dots with f32 accumulation on the bf16 compute path: int8
    # cache values are exact in bf16, and the f32 upcast of the whole layer
    # slice materialized a 2x-bytes copy per layer (see attend())
    ct = jnp.float32 if (q.dtype == jnp.float32
                         or k_l.dtype == jnp.float32) else jnp.bfloat16
    qf = q.astype(ct).reshape(b, t, hkv, g, dh)
    sc = jnp.einsum("bqkgd,bskd->bkgqs", qf, k_l.astype(ct),
                    preferred_element_type=jnp.float32) * scale
    if ks_l is not None:
        sc = sc * jnp.transpose(ks_l.astype(jnp.float32),
                                (0, 2, 1))[:, :, None, None, :]
    ss = jnp.einsum("bqkgd,btkd->bkgqt", qf, k_self.astype(ct),
                    preferred_element_type=jnp.float32) * scale
    if alibi_bias is not None:
        # alibi_bias: [H, Tq, S] (shift-invariant m_h * key_slot form);
        # self-part bias = the bias at the written slots' columns
        sc = sc + alibi_bias.reshape(1, hkv, g, t, s_max)
    sc = jnp.where(mask_c[:, :, None, :, :], sc, -1e30)
    if alibi_bias is not None:
        ali_b = jnp.broadcast_to(alibi_bias[None],
                                 (b,) + alibi_bias.shape)     # [B, H, T, S]
        ss_bias = jnp.take_along_axis(
            ali_b, slots[:, None, None, :], axis=3)           # [B, H, T, T]
        ss = ss + ss_bias.reshape(b, hkv, g, t, t)
    ss = jnp.where(mask_s[:, :, None, :, :], ss, -1e30)
    # joint softmax over (cache scores, self scores) WITHOUT concatenating:
    # concat to S_max+T lanes forced an odd-lane-size relayout of the whole
    # [B,Hkv,G,T,S] score buffer per layer (S+1 pads to the next multiple
    # of 128) plus a slice-copy back — pure context-proportional overhead
    # in the decode hot loop. The two-buffer max/exp/sum form is the same
    # math with every op at the native S_max lane layout.
    m = jnp.maximum(jnp.max(sc, axis=-1, keepdims=True),
                    jnp.max(ss, axis=-1, keepdims=True))
    ec = jnp.exp(sc - m)
    es = jnp.exp(ss - m)
    denom = (jnp.sum(ec, axis=-1, keepdims=True)
             + jnp.sum(es, axis=-1, keepdims=True))
    pc = ec / denom
    ps = es / denom
    if vs_l is not None:
        pc = pc * jnp.transpose(vs_l.astype(jnp.float32),
                                (0, 2, 1))[:, :, None, None, :]
    out = (jnp.einsum("bkgqs,bskd->bqkgd", pc.astype(ct), v_l.astype(ct),
                      preferred_element_type=jnp.float32)
           + jnp.einsum("bkgqt,btkd->bqkgd", ps.astype(ct), v_self.astype(ct),
                        preferred_element_type=jnp.float32))
    ctx = out.reshape(b, t, h * dh).astype(q.dtype)
    return new_cache, ctx


def cache_slots(cache_index, batch: int, t: int) -> jnp.ndarray:
    """Absolute cache-slot indices [B, T] of the tokens being written, for a
    scalar or per-row [B] cache_index."""
    ar = jnp.arange(t, dtype=jnp.int32)
    if _is_vector_index(cache_index):
        return cache_index[:, None] + ar[None, :]
    return jnp.broadcast_to(cache_index + ar[None, :], (batch, t))


def attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
           mask: jnp.ndarray, scale: float,
           alibi_bias: Optional[jnp.ndarray] = None,
           plain_causal: bool = False,
           k_scale: Optional[jnp.ndarray] = None,
           v_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """q: [B, Tq, H, Dh]; k/v: [B, Tk, H_kv, Dh]; mask: bool [B, 1, Tq, Tk]
    (True = attend). GQA via head-group reshape. Softmax in f32.

    k/v may be RAW int8 cache values with per-token-per-head scales
    k_scale/v_scale [B, Tk, H_kv]: the dequant factors OUT of the matmuls
    exactly (ks/vs don't depend on Dh) — scores *= ks, probs *= vs — so no
    dequantized cache copy is ever materialized
    (sum_d q_d·k8_sd·ks_s == ks_s·sum_d q_d·k8_sd).

    plain_causal=True (prefill, no padding, no bias, unquantized) routes to
    the Pallas flash kernel on TPU when shapes align — the [Tq, Tk] score
    matrix then never touches HBM."""
    from ..runtime import flags

    if (plain_causal and alibi_bias is None and k_scale is None
            and not flags().no_flash
            and jax.default_backend() == "tpu"):
        from ..kernels.attention import flash_attention, flash_supported

        if flash_supported(q.shape, k.shape):
            return flash_attention(q, k, v, sm_scale=scale, causal=True)
    b, tq, h, dh = q.shape
    _, tk, h_kv, _ = k.shape
    groups = h // h_kv
    # dot dtype: f32 stays f32 (test/e2e parity); the bf16 compute path runs
    # bf16 MXU dots with f32 accumulation — int8 cache values are EXACT in
    # bf16 (|x| <= 127 < 2^8), and a bf16 operand halves (or fuses away) the
    # int8->fp conversion copy that an f32 upcast of the whole cache
    # materializes per layer (measured ~60 us/layer at b8 s2048)
    ct = jnp.float32 if (q.dtype == jnp.float32
                         or k.dtype == jnp.float32) else jnp.bfloat16
    qf = q.astype(ct).reshape(b, tq, h_kv, groups, dh)
    kf = k.astype(ct)
    scores = jnp.einsum("bqkgd,bskd->bkgqs", qf, kf,
                        preferred_element_type=jnp.float32
                        ) * scale                             # [B,Hkv,G,Tq,Tk]
    if k_scale is not None:
        # [B, Tk, Hkv] -> [B, Hkv, 1, 1, Tk]
        scores = scores * jnp.transpose(
            k_scale.astype(jnp.float32), (0, 2, 1))[:, :, None, None, :]
    if alibi_bias is not None:
        # alibi_bias: [H, Tq, Tk], H = h_kv * groups (Baichuan-13B)
        scores = scores + alibi_bias.reshape(1, h_kv, groups, tq, tk)
    # mask: bool [B, 1, Tq, Tk] -> broadcast over (Hkv, G)
    scores = jnp.where(mask[:, :, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        probs = probs * jnp.transpose(
            v_scale.astype(jnp.float32), (0, 2, 1))[:, :, None, None, :]
    out = jnp.einsum("bkgqs,bskd->bqkgd", probs.astype(ct), v.astype(ct),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, tq, h, dh).astype(q.dtype)
