"""OPT family (int8, bias-ful linears, LayerNorm, learned positions, ReLU).

Functional TPU-native re-design of the reference's Int8OPT* module surgery
(ref: autosmoothquant/models/opt.py). Same stacked-[L]-and-scan layout as
llama.py. Covers both pre-LN (do_layer_norm_before=True, most OPTs) and
post-LN (opt-350m) orderings (ref: opt.py:118,196-201), and the
word_embed_proj_dim != hidden_size projection pair. Note: the reference's
Int8OPTDecoder.from_float drops project_in (opt.py:214-224, latent bug noted
in SURVEY.md §2.3); here both projections are carried.

Params layout ([in, out] weights):
    {"embed":      {"w": [V, Dw]},
     "embed_pos":  {"w": [P+2, D]},          # learned, offset-2 like HF
     "project_in": {"w": [Dw, D]}            # only when Dw != D
     "project_out":{"w": [D, Dw]}            # only when Dw != D
     "layers":     {"ln1": {"w","b"}, "attn": {q,k,v,o each {"w","b"}},
                    "ln2": {"w","b"}, "mlp": {"fc1","fc2" each {"w","b"}}},
     "final_norm": {"w","b"}                 # only when do_layer_norm_before
     "lm_head":    {"w": [Dw, V]}}
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..quant import math as qmath
from ..quant.config import PER_TENSOR, QuantConfig
from .common import (
    int4_scan_view,
    KVCacheLayer,
    cache_mask_and_routing,
    cache_slots,
    decode_window,
    fused_add_norm_quant,
    fused_block_enabled,
    uncached_mask_and_positions,
    update_and_attend,
    make_kv_cache,
    LinearKind,
    attend,
    layer_norm,
    linear,
    linear_prequant,
)
from .registry import register_model

FAMILY = "transformers"  # the reference's family tag for OPT (models/__init__.py)

POS_OFFSET = 2  # HF OPTLearnedPositionalEmbedding offset


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    word_embed_proj_dim: int = 768
    ffn_dim: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 2048
    do_layer_norm_before: bool = True
    enable_bias: bool = True
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf(cls, hf) -> "OPTConfig":
        g = (lambda k, d=None: hf.get(k, d)) if isinstance(hf, dict) \
            else (lambda k, d=None: getattr(hf, k, d))
        return cls(
            vocab_size=g("vocab_size"),
            hidden_size=g("hidden_size"),
            word_embed_proj_dim=g("word_embed_proj_dim", g("hidden_size")),
            ffn_dim=g("ffn_dim"),
            num_hidden_layers=g("num_hidden_layers"),
            num_attention_heads=g("num_attention_heads"),
            max_position_embeddings=g("max_position_embeddings", 2048),
            do_layer_norm_before=bool(g("do_layer_norm_before", True)),
            enable_bias=bool(g("enable_bias", True)),
        )


config_from_hf = OPTConfig.from_hf


def init_params(cfg: OPTConfig, key, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 16))
    L, D, F, V, Dw = (cfg.num_hidden_layers, cfg.hidden_size, cfg.ffn_dim,
                      cfg.vocab_size, cfg.word_embed_proj_dim)

    def w(k, *shape, scale=None):
        s = scale if scale is not None else 1.0 / math.sqrt(shape[-2])
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)

    def b(*shape):
        return jnp.zeros(shape, dtype)

    p = {
        "embed": {"w": w(next(keys), V, Dw, scale=0.02)},
        "embed_pos": {"w": w(next(keys), cfg.max_position_embeddings + POS_OFFSET,
                             D, scale=0.02)},
        "layers": {
            "ln1": {"w": jnp.ones((L, D), dtype), "b": b(L, D)},
            "attn": {
                "q": {"w": w(next(keys), L, D, D), "b": b(L, D)},
                "k": {"w": w(next(keys), L, D, D), "b": b(L, D)},
                "v": {"w": w(next(keys), L, D, D), "b": b(L, D)},
                "o": {"w": w(next(keys), L, D, D), "b": b(L, D)},
            },
            "ln2": {"w": jnp.ones((L, D), dtype), "b": b(L, D)},
            "mlp": {
                "fc1": {"w": w(next(keys), L, D, F), "b": b(L, F)},
                "fc2": {"w": w(next(keys), L, F, D), "b": b(L, D)},
            },
        },
        "final_norm": {"w": jnp.ones((D,), dtype), "b": b(D)},
        "lm_head": {"w": w(next(keys), Dw, V, scale=0.02)},
    }
    if Dw != D:
        p["project_in"] = {"w": w(next(keys), Dw, D)}
        p["project_out"] = {"w": w(next(keys), D, Dw)}
    return p


def _layer_forward(h, lp, cfg: OPTConfig, qcfg: Optional[QuantConfig],
                   mask, cache, cache_index, capture, compute_dtype,
                   plain_causal: bool = False, window=None,
                   chunk0: bool = False, banded: bool = False,
                   banded_starts=None, kv_window=None):
    b, t, d = h.shape
    hd = cfg.head_dim
    n_h = cfg.num_attention_heads
    stats = {}
    eps = cfg.layer_norm_eps

    # --- attention (pre- or post-LN, ref opt.py honoring config) -----------
    residual = h
    if cfg.do_layer_norm_before:
        x = layer_norm(h, lp["ln1"]["w"], lp["ln1"]["b"], eps)
        qkv_kind = LinearKind.POST_NORM
    else:
        # post-LN (opt-350m): qkv input is NOT a norm output, so the
        # per-tensor input scale cannot be folded — it lives in quant_scale
        x = h.astype(jnp.float32)
        qkv_kind = LinearKind.SCALED
    if capture:
        stats["qkv_in_ch_absmax"] = jnp.max(jnp.abs(x.reshape(-1, d)), axis=0)
    gran = qcfg.qkv if qcfg else PER_TENSOR
    # tp_axis="col": q/k/v are column-stored regardless of kind — post-LN
    # OPT marks them SCALED, which would otherwise route the int4 TP GEMM
    # row-parallel against column shards (full reshard per step)
    q = linear(x, lp["attn"]["q"], qcfg, gran, qkv_kind, compute_dtype,
               tp_axis="col")
    k = linear(x, lp["attn"]["k"], qcfg, gran, qkv_kind, compute_dtype,
               tp_axis="col")
    v = linear(x, lp["attn"]["v"], qcfg, gran, qkv_kind, compute_dtype,
               tp_axis="col")
    if capture:
        stats["q_out_absmax"] = jnp.max(jnp.abs(q))
        stats["k_out_absmax"] = jnp.max(jnp.abs(k))
        stats["v_out_absmax"] = jnp.max(jnp.abs(v))
    q = q.reshape(b, t, n_h, hd)
    k = k.reshape(b, t, n_h, hd)
    v = v.reshape(b, t, n_h, hd)

    if isinstance(cache, tuple):  # carry mode: (full [L,...] cache, layer l)
        new_cache, ctx = update_and_attend(
            q, k, v, None, cache_index, mask, 1.0 / math.sqrt(hd),
            compute_dtype, window=window, carry=cache, chunk0_causal=chunk0, banded=banded,
            banded_starts=banded_starts, kv_window=kv_window)
    else:
        new_cache, ctx = update_and_attend(
            q, k, v, cache, cache_index, mask, 1.0 / math.sqrt(hd),
            compute_dtype, window=window, plain_causal=plain_causal)
    ctx = ctx.reshape(b, t, d)
    if capture:
        stats["o_in_ch_absmax"] = jnp.max(jnp.abs(ctx.reshape(-1, d)), axis=0)
    attn_out = linear(ctx, lp["attn"]["o"], qcfg, qcfg.out if qcfg else PER_TENSOR,
                      LinearKind.SCALED, compute_dtype)
    if capture:
        stats["o_out_absmax"] = jnp.max(jnp.abs(attn_out))
    fused_block = cfg.do_layer_norm_before and fused_block_enabled(qcfg, capture)
    if fused_block:
        # fused residual-add + LayerNorm + int8-quantize feeding a
        # prequantized fc1 (one HBM pass; TPU form of the reference's
        # dq_add_layernorm_q, csrc/kernels/fused.cu:5-25)
        h2, x2_q = fused_add_norm_quant(
            residual.reshape(b * t, d), attn_out.reshape(b * t, d),
            lp["ln2"]["w"], lp["ln2"]["b"], eps=eps,
            interpret=jax.default_backend() != "tpu")
        h = h2.reshape(b, t, d)
        residual = h
        act = linear_prequant(x2_q, lp["mlp"]["fc1"], compute_dtype
                              ).reshape(b, t, -1)
        act = jnp.maximum(act, 0)
        if capture:
            stats["fc2_in_ch_absmax"] = jnp.max(
                jnp.abs(act.reshape(-1, cfg.ffn_dim)), axis=0)
        out = linear(act, lp["mlp"]["fc2"], qcfg, qcfg.fc2 if qcfg else PER_TENSOR,
                     LinearKind.SCALED, compute_dtype)
        h = residual + out
        return h.astype(compute_dtype), new_cache, stats

    h = residual + attn_out
    if not cfg.do_layer_norm_before:  # post-LN (opt-350m)
        h = layer_norm(h, lp["ln1"]["w"], lp["ln1"]["b"], eps).astype(compute_dtype)

    # --- ffn ----------------------------------------------------------------
    residual = h
    if cfg.do_layer_norm_before:
        x2 = layer_norm(h, lp["ln2"]["w"], lp["ln2"]["b"], eps)
        fc1_kind = LinearKind.POST_NORM
    else:
        x2 = h.astype(jnp.float32)
        fc1_kind = LinearKind.SCALED
    if capture:
        stats["fc1_in_ch_absmax"] = jnp.max(jnp.abs(x2.reshape(-1, d)), axis=0)
    act = linear(x2, lp["mlp"]["fc1"], qcfg, qcfg.fc1 if qcfg else PER_TENSOR,
                 fc1_kind, compute_dtype, tp_axis="col")
    if capture:  # pre-ReLU: the Linear module's own output (observer view)
        stats["fc1_out_absmax"] = jnp.max(jnp.abs(act))
    act = jnp.maximum(act, 0)  # OPT uses ReLU
    if capture:
        stats["fc2_in_ch_absmax"] = jnp.max(
            jnp.abs(act.reshape(-1, cfg.ffn_dim)), axis=0)
    out = linear(act, lp["mlp"]["fc2"], qcfg, qcfg.fc2 if qcfg else PER_TENSOR,
                 LinearKind.SCALED, compute_dtype)
    if capture:
        stats["fc2_out_absmax"] = jnp.max(jnp.abs(out))
    h = residual + out
    if not cfg.do_layer_norm_before:
        h = layer_norm(h, lp["ln2"]["w"], lp["ln2"]["b"], eps).astype(compute_dtype)
    return h.astype(compute_dtype), new_cache, stats


def forward(params, input_ids: jnp.ndarray, cfg: OPTConfig,
            quant_config: Optional[QuantConfig] = None, *,
            kv_cache=None, cache_index=None,
            kv_valid: Optional[jnp.ndarray] = None,
            pad_starts: Optional[jnp.ndarray] = None,
            positions: Optional[jnp.ndarray] = None,
            attention_mask: Optional[jnp.ndarray] = None,
            capture_stats: bool = False,
            kv_window=None,
            compute_dtype=jnp.float32) -> Tuple[jnp.ndarray, Any, Any]:
    """Mirrors Int8OPTDecoder.forward (= HF OPTDecoder.forward, ref opt.py)."""
    b, t = input_ids.shape
    h = params["embed"]["w"][input_ids].astype(compute_dtype)
    if "project_in" in params:
        h = jnp.dot(h, params["project_in"]["w"].astype(compute_dtype))

    window = None
    chunk0 = chunkN = False
    if kv_cache is not None:
        slots, mask, window, chunk0, chunkN = cache_mask_and_routing(
            kv_cache, cache_index, b, t, kv_valid, pad_starts)
        if positions is None:
            positions = slots  # no padding: slot == learned-embedding index
    else:
        positions, mask, plain_causal = uncached_mask_and_positions(
            b, t, positions, attention_mask)

    pos_emb = params["embed_pos"]["w"][positions + POS_OFFSET].astype(compute_dtype)
    h = h + pos_emb

    plain_causal = kv_cache is None and plain_causal

    def step(carry, layer_in):
        lp, layer_cache = layer_in
        hh, new_cache, stats = _layer_forward(
            carry, lp, cfg, quant_config, mask, layer_cache, cache_index,
            capture_stats, compute_dtype, plain_causal=plain_causal,
            window=window)
        return hh, (new_cache, stats if capture_stats else None)

    # int4 packed weights must NOT ride the scan xs (the per-layer slice
    # materializes the packed bytes each step — see models/llama.py): scan
    # over nothing and index in-kernel via common.int4_scan_view
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
                hh, lp, cfg, quant_config, mask, (cache, l), cache_index,
                capture_stats, compute_dtype, window=window, chunk0=chunk0, banded=chunkN,
                banded_starts=pad_starts, kv_window=kv_window)
            return (hh, cache, l + 1), (st if capture_stats else None)

        (h, new_kv, _), stats = jax.lax.scan(
            step_carry, (h, kv_cache, jnp.int32(0)),
            None if int4_stacked else params["layers"],
            length=cfg.num_hidden_layers if int4_stacked else None)

    if cfg.do_layer_norm_before and "final_norm" in params:
        h = layer_norm(h, params["final_norm"]["w"], params["final_norm"]["b"],
                       cfg.layer_norm_eps)
    h = h.astype(compute_dtype)
    if "project_out" in params:
        h = jnp.dot(h, params["project_out"]["w"].astype(compute_dtype))
    return h, new_kv, (stats if capture_stats else None)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "quant_config", "capture_stats", "compute_dtype"),
)
def forward_jit(params, input_ids, cfg: OPTConfig,
                quant_config: Optional[QuantConfig] = None,
                capture_stats: bool = False, compute_dtype=jnp.float32):
    return forward(params, input_ids, cfg, quant_config,
                   capture_stats=capture_stats, compute_dtype=compute_dtype)


def logits(params, hidden: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(hidden.astype(jnp.float32),
                   params["lm_head"]["w"].astype(jnp.float32),
                   preferred_element_type=jnp.float32)


def init_kv_cache(cfg: OPTConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16):
    """dtype=jnp.int8 selects the quantized KV cache (int8 values +
    per-token-per-head scales); see common.make_kv_cache."""
    return make_kv_cache(cfg.num_hidden_layers, batch, max_len,
                         cfg.num_attention_heads, cfg.head_dim, dtype)


STAT_KEYS = (
    "qkv_in_ch_absmax", "q_out_absmax", "k_out_absmax", "v_out_absmax",
    "o_in_ch_absmax", "o_out_absmax", "fc1_in_ch_absmax", "fc1_out_absmax",
    "fc2_in_ch_absmax", "fc2_out_absmax",
)

# HF module-name suffix per projection key + OPT's layer-path format, used
# by the pipeline's fp8 ignore-pattern resolution
# (ref: calibration.py:259-278 get_layers_to_ignore)
HF_PROJ_NAMES = {
    "q": "self_attn.q_proj", "k": "self_attn.k_proj", "v": "self_attn.v_proj",
    "o": "self_attn.out_proj", "fc1": "fc1", "fc2": "fc2",
}
HF_LAYER_FMT = "model.decoder.layers.{i}"


def act_scales_dict(stats) -> Dict[str, jnp.ndarray]:
    """ref: calibration.py keys for OPT (model.decoder.layers.{i}....)."""
    out = {}
    for i in range(stats["qkv_in_ch_absmax"].shape[0]):
        base = f"model.decoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj"):
            out[f"{base}.self_attn.{proj}"] = stats["qkv_in_ch_absmax"][i]
        out[f"{base}.self_attn.out_proj"] = stats["o_in_ch_absmax"][i]
        out[f"{base}.fc1"] = stats["fc1_in_ch_absmax"][i]
        out[f"{base}.fc2"] = stats["fc2_in_ch_absmax"][i]
    return out


def layer_scales(stats) -> Dict[str, jnp.ndarray]:
    """Stacked analog of collect_transformers_layer_scales
    (ref: calibration.py:91-112)."""
    return {
        "attn_input_scale": jnp.max(stats["qkv_in_ch_absmax"], axis=-1) / 127.0,
        "q_output_scale": stats["q_out_absmax"] / 127.0,
        "k_output_scale": stats["k_out_absmax"] / 127.0,
        "v_output_scale": stats["v_out_absmax"] / 127.0,
        "out_input_scale": jnp.max(stats["o_in_ch_absmax"], axis=-1) / 127.0,
        "fc1_input_scale": jnp.max(stats["fc1_in_ch_absmax"], axis=-1) / 127.0,
        "fc2_input_scale": jnp.max(stats["fc2_in_ch_absmax"], axis=-1) / 127.0,
    }


def fp8_observer_scales(stats) -> Dict[str, jnp.ndarray]:
    """Per-projection fp8 input AND output scales ([L] each) from an
    observer pass — same contract as llama.fp8_observer_scales (the
    reference's fp8 observers are llama-only, linear.py:455-500; extended
    family-wide here)."""
    m = qmath.FP8_E4M3_MAX
    per_ch_in = {"q": "qkv_in_ch_absmax", "k": "qkv_in_ch_absmax",
                 "v": "qkv_in_ch_absmax", "o": "o_in_ch_absmax",
                 "fc1": "fc1_in_ch_absmax", "fc2": "fc2_in_ch_absmax"}
    out = {}
    for proj, key in per_ch_in.items():
        out[f"{proj}_input_scale"] = jnp.max(stats[key], axis=-1) / m
        out[f"{proj}_output_scale"] = stats[f"{proj}_out_absmax"] / m
    return out


def smooth(params, stats, alpha: float = 0.5, cfg: Optional[OPTConfig] = None):
    """smooth_lm OPT branch (ref: smooth.py:44-55): attn LN -> q/k/v, final
    LN -> fc1; LayerNorm bias divided too (smooth.py:36-38).

    Post-LN models (opt-350m) are skipped: the LNs do not feed the
    projections there, so the migration identity does not hold (the
    reference applies it anyway — a latent bug we do not reproduce)."""
    from ..quant.smooth import smooth_norm_fcs

    if cfg is not None and not cfg.do_layer_norm_before:
        return params

    def one(ln1w, ln1b, qw, kw, vw, ln2w, ln2b, fc1w, qkv_sc, fc1_sc):
        ln1w2, (q2, k2, v2), ln1b2 = smooth_norm_fcs(
            ln1w, [qw, kw, vw], qkv_sc, alpha, norm_bias=ln1b)
        ln2w2, (f2,), ln2b2 = smooth_norm_fcs(
            ln2w, [fc1w], fc1_sc, alpha, norm_bias=ln2b)
        return ln1w2, ln1b2, q2, k2, v2, ln2w2, ln2b2, f2

    lay = params["layers"]
    (ln1w, ln1b, q2, k2, v2, ln2w, ln2b, f2) = jax.vmap(one)(
        lay["ln1"]["w"], lay["ln1"]["b"], lay["attn"]["q"]["w"],
        lay["attn"]["k"]["w"], lay["attn"]["v"]["w"], lay["ln2"]["w"],
        lay["ln2"]["b"], lay["mlp"]["fc1"]["w"],
        stats["qkv_in_ch_absmax"], stats["fc1_in_ch_absmax"])
    new_layers = {
        "ln1": {"w": ln1w, "b": ln1b},
        "attn": {
            "q": {**lay["attn"]["q"], "w": q2},
            "k": {**lay["attn"]["k"], "w": k2},
            "v": {**lay["attn"]["v"], "w": v2},
            "o": dict(lay["attn"]["o"]),
        },
        "ln2": {"w": ln2w, "b": ln2b},
        "mlp": {"fc1": {**lay["mlp"]["fc1"], "w": f2},
                "fc2": dict(lay["mlp"]["fc2"])},
    }
    return {**params, "layers": new_layers}


def quantize(params, qcfg: QuantConfig, scales=None,
             cfg: Optional[OPTConfig] = None, *,
             ignore=frozenset(), quantize_output: bool = False,
             observer_scales=None):
    """Int8OPTForCausalLM.from_float analog (ref: opt.py:240-277). The
    reference is int8-only for OPT; the fp8 branch extends the reference's
    llama-only fp8 recipe (ref: llama.py:143-176 from_float_to_fp8)
    family-wide — same contract as llama.quantize's fp8 path (dynamic /
    static-with-observer / e5m2, ignore keys, optional output quant)."""
    lay = params["layers"]
    if qcfg.is_int4:
        # weight-only W4A16/W4A8 (beyond the int8-only reference OPT):
        # nibble-packed grouped weights with BIASES carried in f32; no
        # activation quant step, so LayerNorms keep weight AND bias
        def pack4(proj):
            qw, sc = jax.vmap(lambda w: qmath.quantize_weight_int4_grouped(
                w, qcfg.group_size))(proj["w"])
            return {"w": qw, "w_scales": sc,
                    "bias": proj["b"].astype(jnp.float32)}

        new_layers = {
            "ln1": dict(lay["ln1"]),
            "attn": {k: pack4(v) for k, v in lay["attn"].items()},
            "ln2": dict(lay["ln2"]),
            "mlp": {k: pack4(v) for k, v in lay["mlp"].items()},
        }
        return {**params, "layers": new_layers}
    if not qcfg.is_int8:
        return _quantize_fp8(params, qcfg, scales, ignore=ignore,
                             quantize_output=quantize_output,
                             observer_scales=observer_scales)
    assert scales is not None
    pre_ln = cfg.do_layer_norm_before if cfg is not None else True

    def pack(p, input_scale, gran, kind):
        qw, w_scale = jax.vmap(qmath.quantize_weight_per_tensor_absmax)(p["w"])
        out = {"w": qw, "bias": p["b"].astype(jnp.float32)}
        if gran == PER_TENSOR:
            out["dequant_scale"] = w_scale * input_scale
            if kind == LinearKind.SCALED:
                out["quant_scale"] = input_scale
        else:
            out["dequant_scale"] = w_scale
        return out

    attn_in, out_in = scales["attn_input_scale"], scales["out_input_scale"]
    fc1_in, fc2_in = scales["fc1_input_scale"], scales["fc2_input_scale"]

    def fold(ln, s, enable):
        if not enable:
            return dict(ln)
        return {"w": ln["w"] / s[:, None], "b": ln["b"] / s[:, None]}

    qkv_kind = LinearKind.POST_NORM if pre_ln else LinearKind.SCALED
    new_layers = {
        "ln1": fold(lay["ln1"], attn_in, pre_ln and qcfg.qkv == PER_TENSOR),
        "attn": {
            "q": pack(lay["attn"]["q"], attn_in, qcfg.qkv, qkv_kind),
            "k": pack(lay["attn"]["k"], attn_in, qcfg.qkv, qkv_kind),
            "v": pack(lay["attn"]["v"], attn_in, qcfg.qkv, qkv_kind),
            "o": pack(lay["attn"]["o"], out_in, qcfg.out, LinearKind.SCALED),
        },
        "ln2": fold(lay["ln2"], fc1_in, pre_ln and qcfg.fc1 == PER_TENSOR),
        "mlp": {
            "fc1": pack(lay["mlp"]["fc1"], fc1_in, qcfg.fc1, qkv_kind),
            "fc2": pack(lay["mlp"]["fc2"], fc2_in, qcfg.fc2, LinearKind.SCALED),
        },
    }
    return {**params, "layers": new_layers}


def _quantize_fp8(params, qcfg: QuantConfig, scales, *, ignore,
                  quantize_output, observer_scales):
    """fp8 e4m3 (dynamic/static) and e5m2 packing for OPT projections —
    bias-ful variants of llama's pack_fp8 (models/llama.py fp8 branch)."""
    lay = params["layers"]
    fdt = qcfg.fp8_dtype

    def pack_fp8(key, v):
        if key in ignore:
            return dict(v)
        if qcfg.type == "fp8_e5m2":
            # scale-free: e5m2 casts weights directly (ref linear.py:607-614)
            return {"w": v["w"].astype(fdt),
                    "bias": v["b"].astype(jnp.float32)}
        qw, w_scale = jax.vmap(
            lambda ww: qmath.quantize_fp8_per_tensor(ww, fdt))(v["w"])
        return {"w": qw, "w_scale": w_scale,
                "bias": v["b"].astype(jnp.float32)}

    new_layers = {
        "ln1": dict(lay["ln1"]),
        "attn": {k: pack_fp8(k, v) for k, v in lay["attn"].items()},
        "ln2": dict(lay["ln2"]),
        "mlp": {k: pack_fp8(k, v) for k, v in lay["mlp"].items()},
    }
    if qcfg.type == "fp8_e4m3" and qcfg.activation_scheme == "static":
        groups = {"q": "attn", "k": "attn", "v": "attn", "o": "attn",
                  "fc1": "mlp", "fc2": "mlp"}
        if observer_scales is not None:
            for name, grp in groups.items():
                if name in ignore:
                    continue
                new_layers[grp][name]["input_scale"] = \
                    observer_scales[f"{name}_input_scale"]
                if quantize_output:
                    new_layers[grp][name]["output_scale"] = \
                        observer_scales[f"{name}_output_scale"]
        else:
            assert scales is not None, "fp8 static needs observer scales"
            assert not quantize_output, "quantize_output needs observer_scales"
            legacy = {"q": "attn_input_scale", "k": "attn_input_scale",
                      "v": "attn_input_scale", "o": "out_input_scale",
                      "fc1": "fc1_input_scale", "fc2": "fc2_input_scale"}
            for name, key in legacy.items():
                if name in ignore:
                    continue
                new_layers[groups[name]][name]["input_scale"] = \
                    scales[key] * 127.0 / qmath.FP8_E4M3_MAX
    return {**params, "layers": new_layers}


import sys as _sys  # noqa: E402

register_model("OPTForCausalLM", FAMILY, _sys.modules[__name__])
