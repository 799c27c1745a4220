"""Mixtral family (top-2 sparse MoE, GQA attention, fp router).

Functional TPU-native re-design of the reference's Int8Mixtral* surgery
(ref: autosmoothquant/models/mixtral.py). Reference semantics kept:
  - router ``gate`` stays fp deliberately (mixtral.py:139-140)
  - experts share one moe_input_scale (w1/w3, foldable into ln2) and carry
    PER-EXPERT down_input_scales for w2 (mixtral.py:147-159, fed by
    calibration.py:176-180)
  - calibration runs with top_k = num_experts so every expert sees tokens
    (the reference's _model_preprocess hack, calibration.py:23-42 — here a
    ``calibrate_all_experts`` forward flag, no model mutation)
  - routing: softmax over all E router logits, top-k, renormalize (HF
    MixtralSparseMoeBlock convention)

Compute strategy: experts evaluated densely (vmap over E, weighted sum).
Correct everywhere and compiles on any backend; capacity-based ragged
dispatch over an ``expert`` mesh axis is the serving-scale optimization
(SURVEY.md §2.6 EP plan) layered on later without changing this contract.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..quant import math as qmath
from ..quant.config import PER_TENSOR, PER_TOKEN, QuantConfig
from .common import (
    KVCacheLayer,
    int4_scan_view,
    cache_mask_and_routing,
    cache_slots,
    decode_window,
    uncached_mask_and_positions,
    update_and_attend,
    make_kv_cache,
    LinearKind,
    apply_rope,
    attend,
    linear,
    rms_norm,
    rope_cos_sin,
)
from .registry import register_model

FAMILY = "mixtral"

# pipeline/calibrate read this to enable the all-experts trick
CALIBRATION_FORWARD_KWARGS = {"calibrate_all_experts": True}


@dataclasses.dataclass(frozen=True)
class MixtralConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    num_local_experts: int = 8
    num_experts_per_tok: int = 2
    max_position_embeddings: int = 32768
    rms_norm_eps: float = 1e-5
    rope_theta: float = 1e6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf(cls, hf) -> "MixtralConfig":
        g = (lambda k, d=None: hf.get(k, d)) if isinstance(hf, dict) \
            else (lambda k, d=None: getattr(hf, k, d))
        return cls(
            vocab_size=g("vocab_size"),
            hidden_size=g("hidden_size"),
            intermediate_size=g("intermediate_size"),
            num_hidden_layers=g("num_hidden_layers"),
            num_attention_heads=g("num_attention_heads"),
            num_key_value_heads=g("num_key_value_heads"),
            num_local_experts=g("num_local_experts", 8),
            num_experts_per_tok=g("num_experts_per_tok", 2),
            max_position_embeddings=g("max_position_embeddings", 32768),
            rms_norm_eps=g("rms_norm_eps", 1e-5),
            rope_theta=g("rope_theta", 1e6),
        )


config_from_hf = MixtralConfig.from_hf


def init_params(cfg: MixtralConfig, key, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 16))
    L, D, I, V, E = (cfg.num_hidden_layers, cfg.hidden_size,
                     cfg.intermediate_size, cfg.vocab_size,
                     cfg.num_local_experts)
    HD = cfg.num_attention_heads * cfg.head_dim
    KVD = cfg.num_key_value_heads * cfg.head_dim

    def w(k, *shape, scale=None):
        s = scale if scale is not None else 1.0 / math.sqrt(shape[-2])
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)

    return {
        "embed": {"w": w(next(keys), V, D, scale=0.02)},
        "layers": {
            "ln1": {"w": jnp.ones((L, D), dtype)},
            "attn": {
                "q": {"w": w(next(keys), L, D, HD)},
                "k": {"w": w(next(keys), L, D, KVD)},
                "v": {"w": w(next(keys), L, D, KVD)},
                "o": {"w": w(next(keys), L, HD, D)},
            },
            "ln2": {"w": jnp.ones((L, D), dtype)},
            "moe": {
                "router": {"w": w(next(keys), L, D, E)},
                "w1": {"w": w(next(keys), L, E, D, I)},
                "w3": {"w": w(next(keys), L, E, D, I)},
                "w2": {"w": w(next(keys), L, E, I, D)},
            },
        },
        "final_norm": {"w": jnp.ones((D,), dtype)},
        "lm_head": {"w": w(next(keys), D, V, scale=0.02)},
    }


def _expert_int4_matmul(x2, p, e, compute_dtype):
    """Expert e's packed-int4 projection. Under the layer scan the leaves
    stay STACKED [L, E, K/2, N] (common.int4_scan_view attaches the traced
    layer); flattening [L, E] -> [L*E] lets kernels/int4.py's stacked
    index-map contract address expert (l, e) as pseudo-layer l*E + e — the
    packed bytes never materialize per layer OR per expert. Per-layer
    [E, ...] leaves (no scan view) address e directly."""
    from ..kernels.int4 import int4_matmul

    w, sc = p["w"], p["w_scales"]
    if "layer" in p:
        L_, E_ = w.shape[0], w.shape[1]
        w = w.reshape(L_ * E_, *w.shape[2:])
        sc = sc.reshape(L_ * E_, *sc.shape[2:])
        lidx = p["layer"] * E_ + e
    else:
        lidx = e
    return int4_matmul(x2, w, sc, out_dtype=compute_dtype, layer=lidx)


def _expert_linear(x2, p, e_idx, qcfg, gran, kind, compute_dtype):
    """Apply expert e's projection; p leaves have a leading [E] dim."""
    if p["w"].dtype == jnp.uint8:
        return _expert_int4_matmul(x2, p, e_idx, compute_dtype)
    pe = jax.tree.map(lambda a: a[e_idx], p)
    return linear(x2, pe, qcfg, gran, kind, compute_dtype)


def _moe_int4_sharded(xe, mp, compute_dtype):
    """The WHOLE int4 expert MLP (w1/w3 -> silu-mul -> w2) shard_mapped
    over the "expert" mesh axis, so per-device HBM holds E/ep experts'
    packed bytes (VERDICT r4 weak #2's EP half: a pallas_call operand
    cannot be auto-partitioned, so without this GSPMD all-gathers every
    expert's packed bytes on every step).

    ``xe``: [E, R, D] per-expert token rows (R = T on the dense path —
    broadcast — or the capacity bucket C on the sparse path). Returns
    [E, R, D] expert outputs, or None when there is no expert mesh /
    E % ep != 0 (caller falls back to the unsharded loop). Each shard
    flattens its LOCAL [L, El, ...] stack to pseudo-layers l*El + e — the
    same kernels/int4.py stacked-index contract as the unsharded path, just
    over the local expert count. The model axis replicates expert compute
    here (split-K packing cannot row-shard w2 against col-sharded act
    columns — the packed row planes are non-contiguous per shard); expert
    bytes scale by ep only."""
    from .common import _mesh_axis, ambient_mesh

    mesh = ambient_mesh()
    ep = _mesh_axis(mesh, "expert")
    stacked = "layer" in mp["w1"]
    E = mp["w1"]["w"].shape[1] if stacked else mp["w1"]["w"].shape[0]
    if mesh is None or ep <= 1 or E % ep:
        return None
    from jax.sharding import PartitionSpec as P
    from ..kernels.int4 import _A8_MAX_M, int4_matmul

    # shard the token rows over "data" when divisible — otherwise every
    # data shard all-gathers all tokens and recomputes the full expert MLP
    # redundantly (r5 review); the W4A8/W4A16 route follows the GLOBAL row
    # count so sharded and unsharded numerics agree
    dp = _mesh_axis(mesh, "data")
    R = xe.shape[1]
    dn = "data" if dp > 1 and R % dp == 0 else None
    g_a8 = R <= _A8_MAX_M
    lidx = jnp.asarray(mp["w1"]["layer"] if stacked else 0, jnp.int32)

    def local(xl, l, w1p, s1, w3p, s3, w2p, s2):
        El = xl.shape[0]

        def flat(a):
            if stacked:
                return a.reshape(a.shape[0] * a.shape[1], *a.shape[2:])
            return a

        w1f, s1f, w3f, s3f, w2f, s2f = map(
            flat, (w1p, s1, w3p, s3, w2p, s2))
        outs = []
        for e in range(El):
            li = (l * El + e) if stacked else e
            g = int4_matmul(xl[e], w1f, s1f, out_dtype=compute_dtype,
                            layer=li, a8=g_a8)
            u = int4_matmul(xl[e], w3f, s3f, out_dtype=compute_dtype,
                            layer=li, a8=g_a8)
            act = (jax.nn.silu(g.astype(jnp.float32))
                   * u.astype(jnp.float32)).astype(compute_dtype)
            outs.append(int4_matmul(act, w2f, s2f,
                                    out_dtype=compute_dtype, layer=li,
                                    a8=g_a8))
        return jnp.stack(outs)

    wspec = P(None, "expert", None, None) if stacked \
        else P("expert", None, None)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("expert", dn, None), P(), wspec, wspec, wspec,
                  wspec, wspec, wspec),
        out_specs=P("expert", dn, None), check_vma=False,
    )(xe, lidx, mp["w1"]["w"], mp["w1"]["w_scales"],
      mp["w3"]["w"], mp["w3"]["w_scales"],
      mp["w2"]["w"], mp["w2"]["w_scales"])


# ---------------------------------------------------------------------------
# Sparse (capacity-bucketed) expert compute — the TPU-native equivalent of
# the reference's routed index_select expert loop
# (ref: autosmoothquant/models/mixtral.py:142-166 via HF's per-expert token
# gather): per-token FLOPs ∝ top-k, not E. Static shapes throughout: each
# expert processes a fixed-capacity [C] bucket; overflow tokens are dropped
# (standard Switch/GShard capacity semantics), pad slots carry weight 0.
# ---------------------------------------------------------------------------


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def expert_capacity(T: int, E: int, K: int, factor: float = 2.0) -> int:
    """Per-expert token bucket size: factor × the perfectly-balanced load,
    sublane-aligned, never more than T (at C == T nothing can ever drop)."""
    c = _round_up(max(8, int(math.ceil(T * K / E * factor))), 8)
    return min(c, _round_up(T, 8))


def _dispatch_indices(top_idx, top_w, T: int, E: int, K: int, C: int):
    """Build the gather/combine tables. top_idx/top_w: [T, K] (renormalized).
    Returns (gather [E, C] int32 token ids — T means pad —, wtab [E, C] f32
    combine weights)."""
    flat_e = top_idx.reshape(-1)                      # [T*K]
    flat_w = top_w.reshape(-1).astype(jnp.float32)
    flat_t = jnp.repeat(jnp.arange(T, dtype=jnp.int32), K)
    onehot = (flat_e[:, None] == jnp.arange(E, dtype=top_idx.dtype)[None, :])
    pos = jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1     # [T*K, E]
    flat_pos = jnp.take_along_axis(pos, flat_e[:, None].astype(jnp.int32),
                                   axis=1)[:, 0]               # [T*K]
    # slots past capacity index out of bounds -> dropped by mode="drop"
    gather = jnp.full((E, C), T, jnp.int32)
    gather = gather.at[flat_e, flat_pos].set(flat_t, mode="drop")
    wtab = jnp.zeros((E, C), jnp.float32)
    wtab = wtab.at[flat_e, flat_pos].set(flat_w, mode="drop")
    return gather, wtab


def _batched_expert_linear(xe, p, qcfg, gran, kind, compute_dtype):
    """One projection for ALL experts at once: xe [E, C, Din] × w [E, Din,
    Dout] -> [E, C, Dout], with the same quantization recipes as ``linear``
    batched over the expert dim (per-expert dequant/quant scales [E])."""
    w = p["w"]
    if w.dtype == jnp.uint8:
        # int4: one packed-GEMM kernel call per expert (E static, small);
        # xe[e] rows are that expert's capacity bucket
        outs = [_expert_int4_matmul(xe[e], p, e, compute_dtype)
                for e in range(xe.shape[0])]
        return jnp.stack(outs)
    bdims = (((2,), (1,)), ((0,), (0,)))
    if qcfg is None or w.dtype not in (jnp.int8, jnp.float8_e4m3fn,
                                       jnp.float8_e5m2):
        out = jax.lax.dot_general(xe.astype(jnp.float32), w.astype(jnp.float32),
                                  bdims, preferred_element_type=jnp.float32)
        return out.astype(compute_dtype)
    if w.dtype == jnp.int8:
        if gran == PER_TOKEN:
            absmax = jnp.max(jnp.abs(xe.astype(jnp.float32)), axis=-1,
                             keepdims=True)
            scale = jnp.maximum(absmax, 1e-8) / 127.0          # [E, C, 1]
            q = jnp.clip(jnp.round(xe.astype(jnp.float32) / scale),
                         -128, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(q, w, bdims,
                                      preferred_element_type=jnp.int32)
            out = (acc.astype(jnp.float32) * scale
                   * p["dequant_scale"][:, None, None])
        else:
            if kind == LinearKind.SCALED:
                q = jnp.clip(jnp.round(xe.astype(jnp.float32)
                                       / p["quant_scale"][:, None, None]),
                             -128, 127).astype(jnp.int8)
            else:  # POST_NORM: input scale pre-folded into ln2
                q = jnp.clip(jnp.round(xe.astype(jnp.float32)),
                             -128, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(q, w, bdims,
                                      preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * p["dequant_scale"][:, None, None]
        return out.astype(compute_dtype)
    # fp8: upcast dot (mirroring kernels/gemm.fp8_matmul's fallback)
    if qcfg.type == "fp8_e5m2":
        q = xe.astype(jnp.float8_e5m2)
        acc = jax.lax.dot_general(q.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                                  bdims, preferred_element_type=jnp.float32)
        return acc.astype(compute_dtype)
    if qcfg.activation_scheme == "static" and "input_scale" in p:
        # frozen per-expert input scales [E] (FP8LinearStatic semantics)
        s = p["input_scale"][:, None, None]
        q = qmath.quantize_fp8_static(xe, s)
        acc = jax.lax.dot_general(q.astype(jnp.bfloat16),
                                  w.astype(jnp.bfloat16), bdims,
                                  preferred_element_type=jnp.float32)
        out = acc * s * p["w_scale"][:, None, None]
        if "output_scale" in p:
            os_ = p["output_scale"][:, None, None]
            out = qmath.quantize_fp8_static(out, os_).astype(jnp.float32) * os_
        return out.astype(compute_dtype)
    absmax = jnp.max(jnp.abs(xe.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.maximum(absmax, 1e-8) / qmath.FP8_E4M3_MAX
    q = (xe.astype(jnp.float32) / s).astype(jnp.float8_e4m3fn)
    acc = jax.lax.dot_general(q.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                              bdims, preferred_element_type=jnp.float32)
    return (acc * s * p["w_scale"][:, None, None]).astype(compute_dtype)


def _moe_block_sparse(x, mp, cfg: MixtralConfig, qcfg, compute_dtype,
                      weights_and_idx, capacity_factor: float = 2.0):
    """Routed expert compute: gather each expert's bucket, run THREE batched
    GEMMs over [E, C, ·], scatter-add weighted outputs. x: f32 [T, D]."""
    T, D = x.shape
    E, K = cfg.num_local_experts, cfg.num_experts_per_tok
    top_w, top_idx = weights_and_idx
    C = expert_capacity(T, E, K, capacity_factor)
    gather, wtab = _dispatch_indices(top_idx, top_w, T, E, K, C)

    x_pad = jnp.concatenate([x, jnp.zeros((1, D), x.dtype)], axis=0)
    xe = x_pad[gather]                                   # [E, C, D]

    gran1 = qcfg.fc1 if qcfg else PER_TENSOR
    gran2 = qcfg.fc2 if qcfg else PER_TENSOR
    down = None
    if mp["w1"]["w"].dtype == jnp.uint8:
        # int4 EP: whole expert MLP per-shard (packed bytes stay E/ep per
        # device); None when no expert mesh -> per-expert loop below
        down = _moe_int4_sharded(xe, mp, compute_dtype)
    if down is None:
        g = _batched_expert_linear(xe, mp["w1"], qcfg, gran1,
                                   LinearKind.POST_NORM, compute_dtype)
        u = _batched_expert_linear(xe, mp["w3"], qcfg, gran1,
                                   LinearKind.POST_NORM, compute_dtype)
        act = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
               ).astype(compute_dtype)
        down = _batched_expert_linear(act, mp["w2"], qcfg, gran2,
                                      LinearKind.SCALED, compute_dtype)

    contrib = (down.astype(jnp.float32) * wtab[..., None]).reshape(E * C, D)
    out = jnp.zeros((T + 1, D), jnp.float32)
    out = out.at[gather.reshape(-1)].add(contrib)
    return out[:T].astype(compute_dtype)


def _moe_block(x, mp, cfg: MixtralConfig, qcfg, capture, all_experts,
               compute_dtype):
    """x: f32 [T, D] (ln2 output). Returns ([T, D], stats)."""
    T, D = x.shape
    E, K = cfg.num_local_experts, cfg.num_experts_per_tok
    stats = {}

    router_logits = jnp.dot(x.astype(jnp.float32), mp["router"]["w"].astype(jnp.float32))
    probs = jax.nn.softmax(router_logits, axis=-1)  # [T, E]
    k_eff = E if all_experts else K
    top_w, top_idx = jax.lax.top_k(probs, k_eff)
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)

    # routed (capacity-bucketed) compute when serving: per-token FLOPs ∝ K,
    # not E. The dense path remains for calibration (all_experts / capture
    # need every expert's io stats) and for tiny token counts where bucket
    # padding would dominate. ASQ_MOE=dense|sparse overrides the heuristic.
    from ..runtime import flags

    moe_mode = flags().moe
    use_sparse = (
        not all_experts and not capture
        and moe_mode != "dense"
        and (moe_mode == "sparse" or T >= 4 * E)
    )
    if use_sparse:
        out = _moe_block_sparse(x, mp, cfg, qcfg, compute_dtype,
                                (top_w, top_idx))
        return out, stats

    # dense weights: [T, E]
    weights = jnp.zeros((T, E), jnp.float32)
    weights = weights.at[jnp.arange(T)[:, None], top_idx].set(top_w)

    gran1 = qcfg.fc1 if qcfg else PER_TENSOR
    gran2 = qcfg.fc2 if qcfg else PER_TENSOR

    def one_expert(e):
        g = _expert_linear(x, mp["w1"], e, qcfg, gran1, LinearKind.POST_NORM,
                           compute_dtype)
        u = _expert_linear(x, mp["w3"], e, qcfg, gran1, LinearKind.POST_NORM,
                           compute_dtype)
        act = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
               ).astype(compute_dtype)
        down = _expert_linear(act, mp["w2"], e, qcfg, gran2, LinearKind.SCALED,
                              compute_dtype)
        # per-expert down-input stats observe only tokens actually ROUTED to
        # expert e (matching the reference's forward hooks, which fire on the
        # routed index_select slice, ref: mixtral.py:142-166 + HF expert
        # loop); all_experts (= the calibration top_k=E trick) routes every
        # token everywhere so the mask is all-ones there
        routed = (weights[:, e] > 0)[:, None]
        din = jnp.max(jnp.abs(act.astype(jnp.float32)) * routed, axis=0)
        # per-expert OUTPUT absmaxes (fp8 observer contract), routed-masked
        # like din so only tokens the expert actually serves contribute
        outs_abs = (jnp.max(jnp.abs(g.astype(jnp.float32)) * routed),
                    jnp.max(jnp.abs(u.astype(jnp.float32)) * routed),
                    jnp.max(jnp.abs(down.astype(jnp.float32)) * routed))
        return down, din, outs_abs

    # int4 + expert mesh + no stats capture: the shard_mapped whole-MLP
    # path (per-device packed bytes = total/ep); otherwise the static
    # unrolled loop over experts (E small) — masked tokens get weight 0
    expert_out = None
    if not capture and mp["w1"]["w"].dtype == jnp.uint8:
        xe_b = jnp.broadcast_to(x, (E, T, D))
        expert_out = _moe_int4_sharded(xe_b, mp, compute_dtype)
    if expert_out is None:
        outs = []
        down_in_stats = []
        out_stats = []
        for e in range(E):
            down, din, oabs = one_expert(e)
            outs.append(down)
            down_in_stats.append(din)
            out_stats.append(oabs)
        expert_out = jnp.stack(outs)          # [E, T, D]
    out = jnp.einsum("etd,te->td", expert_out.astype(jnp.float32), weights)
    if capture:
        stats["moe_in_ch_absmax"] = jnp.max(jnp.abs(x), axis=0)
        stats["down_in_ch_absmax_per_expert"] = jnp.stack(down_in_stats)  # [E, I]
        stats["w1_out_absmax_per_expert"] = jnp.stack(
            [s[0] for s in out_stats])                                    # [E]
        stats["w3_out_absmax_per_expert"] = jnp.stack(
            [s[1] for s in out_stats])
        stats["w2_out_absmax_per_expert"] = jnp.stack(
            [s[2] for s in out_stats])
    return out.astype(compute_dtype), stats


def _layer_forward(h, lp, cfg, qcfg, cos, sin, mask, cache, cache_index,
                   capture, all_experts, compute_dtype,
                   plain_causal: bool = False, window=None,
                   chunk0: bool = False, banded: bool = False,
                   banded_starts=None, kv_window=None):
    b, t, d = h.shape
    hd = cfg.head_dim
    n_q, n_kv = cfg.num_attention_heads, cfg.num_key_value_heads
    stats = {}

    x = rms_norm(h, lp["ln1"]["w"], cfg.rms_norm_eps)
    if capture:
        stats["qkv_in_ch_absmax"] = jnp.max(jnp.abs(x.reshape(-1, d)), axis=0)
    gran = qcfg.qkv if qcfg else PER_TENSOR
    q = linear(x, lp["attn"]["q"], qcfg, gran, LinearKind.POST_NORM, compute_dtype)
    k = linear(x, lp["attn"]["k"], qcfg, gran, LinearKind.POST_NORM, compute_dtype)
    v = linear(x, lp["attn"]["v"], qcfg, gran, LinearKind.POST_NORM, compute_dtype)
    if capture:
        stats["q_out_absmax"] = jnp.max(jnp.abs(q))
        stats["k_out_absmax"] = jnp.max(jnp.abs(k))
        stats["v_out_absmax"] = jnp.max(jnp.abs(v))
    q = q.reshape(b, t, n_q, hd)
    k = k.reshape(b, t, n_kv, hd)
    v = v.reshape(b, t, n_kv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if isinstance(cache, tuple):  # carry mode: (full [L,...] cache, layer l)
        new_cache, ctx = update_and_attend(
            q, k, v, None, cache_index, mask, 1.0 / math.sqrt(hd),
            compute_dtype, window=window, carry=cache, chunk0_causal=chunk0,
            banded=banded, banded_starts=banded_starts, kv_window=kv_window)
    else:
        new_cache, ctx = update_and_attend(
            q, k, v, cache, cache_index, mask, 1.0 / math.sqrt(hd),
            compute_dtype, window=window, plain_causal=plain_causal)
    ctx = ctx.reshape(b, t, n_q * hd)
    if capture:
        stats["o_in_ch_absmax"] = jnp.max(jnp.abs(ctx.reshape(-1, n_q * hd)), axis=0)
    attn_out = linear(ctx, lp["attn"]["o"], qcfg, qcfg.out if qcfg else PER_TENSOR,
                      LinearKind.SCALED, compute_dtype)
    if capture:
        stats["o_out_absmax"] = jnp.max(jnp.abs(attn_out))
    h = h + attn_out

    x2 = rms_norm(h, lp["ln2"]["w"], cfg.rms_norm_eps)
    moe_out, moe_stats = _moe_block(
        x2.reshape(b * t, d), lp["moe"], cfg, qcfg, capture, all_experts,
        compute_dtype)
    stats.update(moe_stats)
    h = h + moe_out.reshape(b, t, d)
    return h, new_cache, stats


def forward(params, input_ids: jnp.ndarray, cfg: MixtralConfig,
            quant_config: Optional[QuantConfig] = None, *,
            kv_cache=None, cache_index=None,
            kv_valid: Optional[jnp.ndarray] = None,
            pad_starts: Optional[jnp.ndarray] = None,
            positions: Optional[jnp.ndarray] = None,
            attention_mask: Optional[jnp.ndarray] = None,
            capture_stats: bool = False,
            calibrate_all_experts: bool = False,
            kv_window=None,
            compute_dtype=jnp.float32) -> Tuple[jnp.ndarray, Any, Any]:
    b, t = input_ids.shape
    h = params["embed"]["w"][input_ids].astype(compute_dtype)
    window = None
    chunk0 = chunkN = False

    if kv_cache is not None:
        slots, mask, window, chunk0, chunkN = cache_mask_and_routing(
            kv_cache, cache_index, b, t, kv_valid, pad_starts)
        if positions is None:
            positions = slots  # no padding: slot == rope position
    else:
        positions, mask, plain_causal = uncached_mask_and_positions(
            b, t, positions, attention_mask)

    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    plain_causal = kv_cache is None and plain_causal

    def step(carry, layer_in):
        lp, layer_cache = layer_in
        hh, new_cache, stats = _layer_forward(
            carry, lp, cfg, quant_config, cos, sin, mask, layer_cache,
            cache_index, capture_stats, calibrate_all_experts, compute_dtype,
            plain_causal=plain_causal, window=window)
        return hh, (new_cache, stats if capture_stats else None)

    # int4 packed weights must NOT ride the scan xs (per-layer slice
    # materializes the packed bytes each step — see models/llama.py)
    int4_stacked = quant_config is not None and quant_config.is_int4

    if kv_cache is None:
        if int4_stacked:
            def step_nc(carry, _):
                hh, l = carry
                lp = int4_scan_view(params["layers"], l)
                hh, ys = step(hh, (lp, None))
                return (hh, l + 1), ys

            (h, _), (new_caches, stats) = jax.lax.scan(
                step_nc, (h, jnp.int32(0)), None,
                length=cfg.num_hidden_layers)
        else:
            h, (new_caches, stats) = jax.lax.scan(
                lambda c, lp: step(c, (lp, None)), h, params["layers"])
        new_kv = None
    else:
        # cache rides in the scan CARRY with token-only scatter writes
        # (see common.carry_update_and_attend)
        def step_carry(carry, lp):
            hh, cache, l = carry
            if lp is None:          # int4: stacked weights, in-kernel index
                lp = int4_scan_view(params["layers"], l)
            hh, cache, st = _layer_forward(
                hh, lp, cfg, quant_config, cos, sin, mask, (cache, l),
                cache_index, capture_stats, calibrate_all_experts,
                compute_dtype, window=window, chunk0=chunk0, banded=chunkN,
                banded_starts=pad_starts, kv_window=kv_window)
            return (hh, cache, l + 1), (st if capture_stats else None)

        (h, new_kv, _), stats = jax.lax.scan(
            step_carry, (h, kv_cache, jnp.int32(0)),
            None if int4_stacked else params["layers"],
            length=cfg.num_hidden_layers if int4_stacked else None)

    h = rms_norm(h, params["final_norm"]["w"], cfg.rms_norm_eps).astype(compute_dtype)
    return h, new_kv, (stats if capture_stats else None)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "quant_config", "capture_stats",
                     "calibrate_all_experts", "compute_dtype"),
)
def forward_jit(params, input_ids, cfg: MixtralConfig,
                quant_config: Optional[QuantConfig] = None,
                capture_stats: bool = False,
                calibrate_all_experts: bool = False,
                compute_dtype=jnp.float32):
    return forward(params, input_ids, cfg, quant_config,
                   capture_stats=capture_stats,
                   calibrate_all_experts=calibrate_all_experts,
                   compute_dtype=compute_dtype)


def logits(params, hidden: jnp.ndarray) -> jnp.ndarray:
    w = params["lm_head"]["w"]
    return jnp.dot(hidden.astype(w.dtype), w, preferred_element_type=jnp.float32)


def init_kv_cache(cfg: MixtralConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16):
    """dtype=jnp.int8 selects the quantized KV cache (int8 values +
    per-token-per-head scales); see common.make_kv_cache."""
    return make_kv_cache(cfg.num_hidden_layers, batch, max_len,
                         cfg.num_key_value_heads, cfg.head_dim, dtype)


STAT_KEYS = (
    "qkv_in_ch_absmax", "q_out_absmax", "k_out_absmax", "v_out_absmax",
    "o_in_ch_absmax", "o_out_absmax", "moe_in_ch_absmax",
    "down_in_ch_absmax_per_expert", "w1_out_absmax_per_expert",
    "w3_out_absmax_per_expert", "w2_out_absmax_per_expert",
)

# fp8 ignore-pattern resolution. Expert projections use the expert-0 HF
# name as the representative: stacked [L, E] arrays cannot express
# per-expert exemptions, so a pattern ignores a projection for ALL experts
# (match every layer) or none — same all-or-nothing rule the pipeline
# enforces per layer.
HF_PROJ_NAMES = {
    "q": "self_attn.q_proj", "k": "self_attn.k_proj", "v": "self_attn.v_proj",
    "o": "self_attn.o_proj", "w1": "block_sparse_moe.experts.0.w1",
    "w3": "block_sparse_moe.experts.0.w3",
    "w2": "block_sparse_moe.experts.0.w2",
}


def act_scales_dict(stats) -> Dict[str, jnp.ndarray]:
    out = {}
    for i in range(stats["qkv_in_ch_absmax"].shape[0]):
        base = f"model.layers.{i}"
        out[f"{base}.self_attn.q_proj"] = stats["qkv_in_ch_absmax"][i]
        out[f"{base}.self_attn.k_proj"] = stats["qkv_in_ch_absmax"][i]
        out[f"{base}.self_attn.v_proj"] = stats["qkv_in_ch_absmax"][i]
        out[f"{base}.self_attn.o_proj"] = stats["o_in_ch_absmax"][i]
        out[f"{base}.block_sparse_moe.gate"] = stats["moe_in_ch_absmax"][i]
        for e in range(stats["down_in_ch_absmax_per_expert"].shape[1]):
            out[f"{base}.block_sparse_moe.experts.{e}.w2"] = \
                stats["down_in_ch_absmax_per_expert"][i, e]
    return out


def layer_scales(stats) -> Dict[str, jnp.ndarray]:
    """Stacked analog of collect_mixtral_layer_scales
    (ref: calibration.py:160-183): shared moe_input_scale + per-expert
    down_input_scales."""
    return {
        "attn_input_scale": jnp.max(stats["qkv_in_ch_absmax"], axis=-1) / 127.0,
        "q_output_scale": stats["q_out_absmax"] / 127.0,
        "k_output_scale": stats["k_out_absmax"] / 127.0,
        "v_output_scale": stats["v_out_absmax"] / 127.0,
        "out_input_scale": jnp.max(stats["o_in_ch_absmax"], axis=-1) / 127.0,
        "moe_input_scale": jnp.max(stats["moe_in_ch_absmax"], axis=-1) / 127.0,
        "down_input_scales": jnp.max(
            stats["down_in_ch_absmax_per_expert"], axis=-1) / 127.0,  # [L, E]
    }


def fp8_observer_scales(stats) -> Dict[str, jnp.ndarray]:
    """llama's observer contract extended to MoE: attention scales are [L];
    expert scales are [L, E] (w1/w3 share the moe input scale per the
    reference's shared moe_input_scale, w2 is per-expert like the int8
    down_input_scales, ref: calibration.py:176-180)."""
    m = qmath.FP8_E4M3_MAX
    E = stats["down_in_ch_absmax_per_expert"].shape[1]
    moe_in = jnp.max(stats["moe_in_ch_absmax"], axis=-1) / m        # [L]
    out = {
        "q_input_scale": jnp.max(stats["qkv_in_ch_absmax"], axis=-1) / m,
        "k_input_scale": jnp.max(stats["qkv_in_ch_absmax"], axis=-1) / m,
        "v_input_scale": jnp.max(stats["qkv_in_ch_absmax"], axis=-1) / m,
        "o_input_scale": jnp.max(stats["o_in_ch_absmax"], axis=-1) / m,
        "q_output_scale": stats["q_out_absmax"] / m,
        "k_output_scale": stats["k_out_absmax"] / m,
        "v_output_scale": stats["v_out_absmax"] / m,
        "o_output_scale": stats["o_out_absmax"] / m,
        "w1_input_scale": jnp.broadcast_to(moe_in[:, None], (moe_in.shape[0], E)),
        "w3_input_scale": jnp.broadcast_to(moe_in[:, None], (moe_in.shape[0], E)),
        "w2_input_scale": jnp.max(
            stats["down_in_ch_absmax_per_expert"], axis=-1) / m,     # [L, E]
        "w1_output_scale": stats["w1_out_absmax_per_expert"] / m,    # [L, E]
        "w3_output_scale": stats["w3_out_absmax_per_expert"] / m,
        "w2_output_scale": stats["w2_out_absmax_per_expert"] / m,
    }
    return out


def smooth(params, stats, alpha: float = 0.5,
           cfg: Optional[MixtralConfig] = None):
    """smooth_lm Mixtral branch (ref: smooth.py:81-93): ln1 -> q/k/v;
    ln2 -> [router gate] + every expert's w1 and w3."""
    from ..quant.smooth import smooth_norm_fcs

    lay = params["layers"]
    E = lay["moe"]["w1"]["w"].shape[1]

    def one(ln1, qw, kw, vw, ln2, router, w1, w3, qkv_sc, moe_sc):
        ln1n, (q2, k2, v2), _ = smooth_norm_fcs(ln1, [qw, kw, vw], qkv_sc, alpha)
        fcs = [router] + [w1[e] for e in range(E)] + [w3[e] for e in range(E)]
        ln2n, new_fcs, _ = smooth_norm_fcs(ln2, fcs, moe_sc, alpha)
        r2 = new_fcs[0]
        w1n = jnp.stack(new_fcs[1:1 + E])
        w3n = jnp.stack(new_fcs[1 + E:])
        return ln1n, q2, k2, v2, ln2n, r2, w1n, w3n

    ln1, q2, k2, v2, ln2, r2, w1n, w3n = jax.vmap(one)(
        lay["ln1"]["w"], lay["attn"]["q"]["w"], lay["attn"]["k"]["w"],
        lay["attn"]["v"]["w"], lay["ln2"]["w"], lay["moe"]["router"]["w"],
        lay["moe"]["w1"]["w"], lay["moe"]["w3"]["w"],
        stats["qkv_in_ch_absmax"], stats["moe_in_ch_absmax"])
    new_layers = {
        "ln1": {"w": ln1},
        "attn": {**lay["attn"], "q": {"w": q2}, "k": {"w": k2}, "v": {"w": v2}},
        "ln2": {"w": ln2},
        "moe": {"router": {"w": r2}, "w1": {"w": w1n}, "w3": {"w": w3n},
                "w2": dict(lay["moe"]["w2"])},
    }
    return {**params, "layers": new_layers}


def quantize(params, qcfg: QuantConfig, scales=None,
             cfg: Optional[MixtralConfig] = None, *,
             ignore=frozenset(), quantize_output: bool = False,
             observer_scales=None):
    """Int8MixtralForCausalLM.from_float analog (ref: mixtral.py:240-296):
    experts quantized with shared moe_input_scale (w1/w3) and per-expert
    down scales (w2); router left fp. The fp8 branch extends the
    reference's llama-only fp8 recipe (ref: llama.py:143-176) to MoE:
    per-expert fp8 weight scales [L, E], shared moe input scale for w1/w3,
    per-expert static input scales for w2."""
    lay = params["layers"]
    if qcfg.is_int4:
        # weight-only W4A16/W4A8 MoE: per-expert nibble-packed weights
        # [L, E, K/2, N] with per-expert group scales [L, E, K/g, N];
        # attention packs like llama; router stays fp (ref: mixtral.py:139)
        def pack4(proj):
            qw, sc = jax.vmap(lambda w: qmath.quantize_weight_int4_grouped(
                w, qcfg.group_size))(proj["w"])
            return {"w": qw, "w_scales": sc}

        def pack4_experts(proj):
            qw, sc = jax.vmap(jax.vmap(
                lambda w: qmath.quantize_weight_int4_grouped(
                    w, qcfg.group_size)))(proj["w"])
            return {"w": qw, "w_scales": sc}

        new_layers = {
            "ln1": dict(lay["ln1"]),
            "attn": {k: pack4(v) for k, v in lay["attn"].items()},
            "ln2": dict(lay["ln2"]),
            "moe": {
                "router": dict(lay["moe"]["router"]),
                "w1": pack4_experts(lay["moe"]["w1"]),
                "w3": pack4_experts(lay["moe"]["w3"]),
                "w2": pack4_experts(lay["moe"]["w2"]),
            },
        }
        return {**params, "layers": new_layers}
    if not qcfg.is_int8:
        return _quantize_fp8(params, qcfg, scales, ignore=ignore,
                             quantize_output=quantize_output,
                             observer_scales=observer_scales)
    assert scales is not None

    def pack(w, input_scale, gran, kind):
        qw, w_scale = jax.vmap(qmath.quantize_weight_per_tensor_absmax)(w)
        p = {"w": qw}
        if gran == PER_TENSOR:
            p["dequant_scale"] = w_scale * input_scale
            if kind == LinearKind.SCALED:
                p["quant_scale"] = input_scale
        else:
            p["dequant_scale"] = w_scale
        return p

    def pack_experts(w, input_scale, gran, kind):
        """w: [L, E, in, out]; input_scale: [L] (shared) or [L, E]."""
        L, E = w.shape[:2]
        qw, w_scale = jax.vmap(jax.vmap(qmath.quantize_weight_per_tensor_absmax))(w)
        p = {"w": qw}
        isc = input_scale if input_scale.ndim == 2 else input_scale[:, None]
        if gran == PER_TENSOR:
            p["dequant_scale"] = w_scale * isc
            if kind == LinearKind.SCALED:
                p["quant_scale"] = jnp.broadcast_to(isc, (L, E))
        else:
            p["dequant_scale"] = w_scale
        return p

    attn_in = scales["attn_input_scale"]
    out_in = scales["out_input_scale"]
    moe_in = scales["moe_input_scale"]
    down_in = scales["down_input_scales"]  # [L, E]
    new_layers = {
        "ln1": {"w": lay["ln1"]["w"] / attn_in[:, None]
                if qcfg.qkv == PER_TENSOR else lay["ln1"]["w"]},
        "attn": {
            "q": pack(lay["attn"]["q"]["w"], attn_in, qcfg.qkv, LinearKind.POST_NORM),
            "k": pack(lay["attn"]["k"]["w"], attn_in, qcfg.qkv, LinearKind.POST_NORM),
            "v": pack(lay["attn"]["v"]["w"], attn_in, qcfg.qkv, LinearKind.POST_NORM),
            "o": pack(lay["attn"]["o"]["w"], out_in, qcfg.out, LinearKind.SCALED),
        },
        "ln2": {"w": lay["ln2"]["w"] / moe_in[:, None]
                if qcfg.fc1 == PER_TENSOR else lay["ln2"]["w"]},
        "moe": {
            "router": dict(lay["moe"]["router"]),  # fp, ref mixtral.py:139-140
            "w1": pack_experts(lay["moe"]["w1"]["w"], moe_in, qcfg.fc1,
                               LinearKind.POST_NORM),
            "w3": pack_experts(lay["moe"]["w3"]["w"], moe_in, qcfg.fc1,
                               LinearKind.POST_NORM),
            "w2": pack_experts(lay["moe"]["w2"]["w"], down_in, qcfg.fc2,
                               LinearKind.SCALED),
        },
    }
    return {**params, "layers": new_layers}


def _quantize_fp8(params, qcfg: QuantConfig, scales, *, ignore,
                  quantize_output, observer_scales):
    """fp8 packing for Mixtral: attention projections like llama; experts
    double-vmapped to per-expert weight scales [L, E]; router stays fp
    (ref: mixtral.py:139-140)."""
    lay = params["layers"]
    fdt = qcfg.fp8_dtype

    def pack_fp8(key, v):
        if key in ignore:
            return dict(v)
        if qcfg.type == "fp8_e5m2":
            return {"w": v["w"].astype(fdt)}
        qw, w_scale = jax.vmap(
            lambda ww: qmath.quantize_fp8_per_tensor(ww, fdt))(v["w"])
        return {"w": qw, "w_scale": w_scale}

    def pack_experts_fp8(key, v):
        if key in ignore:
            return dict(v)
        if qcfg.type == "fp8_e5m2":
            return {"w": v["w"].astype(fdt)}
        qw, w_scale = jax.vmap(jax.vmap(
            lambda ww: qmath.quantize_fp8_per_tensor(ww, fdt)))(v["w"])
        return {"w": qw, "w_scale": w_scale}  # [L, E, in, out], [L, E]

    new_layers = {
        "ln1": dict(lay["ln1"]),
        "attn": {k: pack_fp8(k, v) for k, v in lay["attn"].items()},
        "ln2": dict(lay["ln2"]),
        "moe": {"router": dict(lay["moe"]["router"]),
                "w1": pack_experts_fp8("w1", lay["moe"]["w1"]),
                "w3": pack_experts_fp8("w3", lay["moe"]["w3"]),
                "w2": pack_experts_fp8("w2", lay["moe"]["w2"])},
    }
    if qcfg.type == "fp8_e4m3" and qcfg.activation_scheme == "static":
        attn_keys = ("q", "k", "v", "o")
        expert_keys = ("w1", "w3", "w2")
        if observer_scales is not None:
            for name in attn_keys:
                if name in ignore:
                    continue
                new_layers["attn"][name]["input_scale"] = \
                    observer_scales[f"{name}_input_scale"]
                if quantize_output:
                    new_layers["attn"][name]["output_scale"] = \
                        observer_scales[f"{name}_output_scale"]
            for name in expert_keys:
                if name in ignore:
                    continue
                new_layers["moe"][name]["input_scale"] = \
                    observer_scales[f"{name}_input_scale"]     # [L, E]
                if quantize_output:
                    new_layers["moe"][name]["output_scale"] = \
                        observer_scales[f"{name}_output_scale"]
        else:
            assert scales is not None, "fp8 static needs observer scales"
            assert not quantize_output, "quantize_output needs observer_scales"
            f = 127.0 / qmath.FP8_E4M3_MAX
            moe_in = scales["moe_input_scale"] * f               # [L]
            L = moe_in.shape[0]
            E = lay["moe"]["w1"]["w"].shape[1]
            legacy_attn = {"q": "attn_input_scale", "k": "attn_input_scale",
                           "v": "attn_input_scale", "o": "out_input_scale"}
            for name, key in legacy_attn.items():
                if name in ignore:
                    continue
                new_layers["attn"][name]["input_scale"] = scales[key] * f
            shared = jnp.broadcast_to(moe_in[:, None], (L, E))
            for name in ("w1", "w3"):
                if name not in ignore:
                    new_layers["moe"][name]["input_scale"] = shared
            if "w2" not in ignore:
                new_layers["moe"]["w2"]["input_scale"] = \
                    scales["down_input_scales"] * f              # [L, E]
    return {**params, "layers": new_layers}


import sys as _sys  # noqa: E402

register_model("MixtralForCausalLM", FAMILY, _sys.modules[__name__])
