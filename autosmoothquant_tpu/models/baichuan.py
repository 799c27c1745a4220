"""Baichuan family (7B = RoPE, 13B = ALiBi; fused W_pack QKV; NormHead).

Functional TPU-native re-design of the reference's Int8Baichuan* surgery
(ref: autosmoothquant/models/baichuan.py and the vendored
thirdparty/baichuan/modeling_baichuan.py). Key reference semantics kept:

  - one fused QKV projection ``W_pack`` [D, 3D], q/k/v = 3 contiguous
    sections (modeling_baichuan.py:232-247); when quantized, ONE int8 GEMM
    with per-section dequant scales — expressed here as a [3D] column-scale
    vector fed to the GEMM epilogue (the reference splits + dequants in
    Python, layers/nn/linear.py:132-245)
  - position embedding selected by hidden_size: 4096 -> RoPE (7B), else
    ALiBi (13B) (ref: baichuan.py:542-545); ALiBi slopes via the interleave
    power-of-2 formula (modeling_baichuan.py:120-158); bias reduces to
    m_h * k_slot by softmax shift-invariance
  - NormHead: lm_head rows L2-normalized once at load (inference mode,
    modeling_baichuan.py:589-606), kept fp (baichuan.py:549)


Tokenization: the reference vendors a SentencePiece wrapper
(ref: thirdparty/baichuan/tokenization_baichuan.py) over the compiled
sentencepiece library; this framework ships its own runtime —
utils/sp_tokenizer.py (ModelProto parser + BPE/unigram encoders) — used
via utils/tokenizer.py:load_tokenizer when AutoTokenizer cannot load a
raw tokenizer.model. Host-side I/O, not TPU surface.
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
    PAGED_POOL_TYPES,
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

FAMILY = "baichuan"


@dataclasses.dataclass(frozen=True)
class BaichuanConfig:
    vocab_size: int = 64000
    hidden_size: int = 5120
    intermediate_size: int = 13696
    num_hidden_layers: int = 40
    num_attention_heads: int = 40
    model_max_length: int = 4096
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    # override for tests/small models; None -> infer from hidden_size
    force_position_embedding: Optional[str] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def position_embedding(self) -> str:
        # ref: baichuan.py:542-545 — 7B (4096) uses RoPE, 13B ALiBi
        if self.force_position_embedding is not None:
            return self.force_position_embedding
        return "ROPE" if self.hidden_size == 4096 else "ALIBI"

    # engine/ppl plumbing treats max_position_embeddings uniformly
    @property
    def max_position_embeddings(self) -> int:
        return self.model_max_length

    @classmethod
    def from_hf(cls, hf) -> "BaichuanConfig":
        g = (lambda k, d=None: hf.get(k, d)) if isinstance(hf, dict) \
            else (lambda k, d=None: getattr(hf, k, d))
        return cls(
            vocab_size=g("vocab_size"),
            hidden_size=g("hidden_size"),
            intermediate_size=g("intermediate_size"),
            num_hidden_layers=g("num_hidden_layers"),
            num_attention_heads=g("num_attention_heads"),
            model_max_length=g("model_max_length", 4096),
            rms_norm_eps=g("rms_norm_eps", 1e-6),
        )


config_from_hf = BaichuanConfig.from_hf


def alibi_slopes(n_heads: int) -> jnp.ndarray:
    """The interleave formula (ref: modeling_baichuan.py:120-132)."""
    def pow2_slopes(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        s = pow2_slopes(n_heads)
    else:
        closest = 2 ** math.floor(math.log2(n_heads))
        s = pow2_slopes(closest) + pow2_slopes(2 * closest)[0::2][: n_heads - closest]
    return jnp.asarray(s, jnp.float32)


def init_params(cfg: BaichuanConfig, key, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 8))
    L, D, I, V = (cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size,
                  cfg.vocab_size)

    def w(k, *shape, scale=None):
        s = scale if scale is not None else 1.0 / math.sqrt(shape[-2])
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)

    lm = w(next(keys), D, V, scale=0.02)
    lm = lm / jnp.linalg.norm(lm, axis=0, keepdims=True)  # NormHead, row-normed
    return {
        "embed": {"w": w(next(keys), V, D, scale=0.02)},
        "layers": {
            "ln1": {"w": jnp.ones((L, D), dtype)},
            "attn": {
                "wpack": {"w": w(next(keys), L, D, 3 * D)},
                "o": {"w": w(next(keys), L, D, D)},
            },
            "ln2": {"w": jnp.ones((L, D), dtype)},
            "mlp": {
                "gate": {"w": w(next(keys), L, D, I)},
                "up": {"w": w(next(keys), L, D, I)},
                "down": {"w": w(next(keys), L, I, D)},
            },
        },
        "final_norm": {"w": jnp.ones((D,), dtype)},
        "lm_head": {"w": lm},
    }


def _wpack_apply(x, p, qcfg: Optional[QuantConfig], compute_dtype):
    """Fused QKV projection. Quantized leaves: w int8 [D,3D],
    dequant_scale [3D] (per-section weight scales x optional input scale),
    quant_scale scalar (unused — W_pack follows the norm)."""
    from ..kernels.gemm import int8_matmul

    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if qcfg is None or p["w"].dtype not in (jnp.int8,):
        if qcfg is not None and p["w"].dtype == jnp.uint8:
            # int4 fused W_pack: one packed GEMM, per-(group, column) scales
            from ..kernels.int4 import int4_matmul

            out = int4_matmul(x2, p["w"], p["w_scales"],
                              out_dtype=compute_dtype, layer=p.get("layer"))
            return out.reshape(*lead, -1)
        if qcfg is not None and p["w"].dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
            return linear(x, p, qcfg, qcfg.qkv, LinearKind.POST_NORM, compute_dtype)
        out = jnp.dot(x2, p["w"], preferred_element_type=jnp.float32)
        return out.reshape(*lead, -1).astype(compute_dtype)
    if qcfg.qkv == PER_TOKEN:
        q, tok_scale = qmath.quantize_act_per_token(x2)
        out = int8_matmul(q, p["w"], row_scale=tok_scale,
                          col_scale=p["dequant_scale"], out_dtype=compute_dtype)
    else:
        q = qmath.quantize_act_prescaled(x2)
        out = int8_matmul(q, p["w"], col_scale=p["dequant_scale"],
                          out_dtype=compute_dtype)
    return out.reshape(*lead, -1)


def _layer_forward(h, lp, cfg, qcfg, cos, sin, mask, alibi, cache,
                   cache_index, capture, compute_dtype,
                   plain_causal: bool = False, window=None,
                   chunk0: bool = False, banded: bool = False,
                   banded_starts=None, kv_window=None, alibi_slopes=None):
    b, t, d = h.shape
    hd = cfg.head_dim
    n_h = cfg.num_attention_heads
    stats = {}

    x = rms_norm(h, lp["ln1"]["w"], cfg.rms_norm_eps)
    if capture:
        stats["qkv_in_ch_absmax"] = jnp.max(jnp.abs(x.reshape(-1, d)), axis=0)
    proj = _wpack_apply(x, lp["attn"]["wpack"], qcfg, compute_dtype)
    if capture:
        stats["attn_out_absmax"] = jnp.max(jnp.abs(proj))
    q, k, v = jnp.split(proj, 3, axis=-1)
    q = q.reshape(b, t, n_h, hd)
    k = k.reshape(b, t, n_h, hd)
    v = v.reshape(b, t, n_h, hd)
    if cfg.position_embedding == "ROPE":
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    if isinstance(cache, tuple):  # carry mode: (full [L,...] cache, layer l)
        # alibi_slopes is consumed only by the paged-pool branch (the dense
        # [H, T, S_max] bias has no S_max axis there)
        new_cache, ctx = update_and_attend(
            q, k, v, None, cache_index, mask, 1.0 / math.sqrt(hd),
            compute_dtype, window=window, alibi_bias=alibi, carry=cache,
            chunk0_causal=chunk0, banded=banded,
            banded_starts=banded_starts, kv_window=kv_window,
            alibi_slopes=alibi_slopes)
    else:
        new_cache, ctx = update_and_attend(
            q, k, v, cache, cache_index, mask, 1.0 / math.sqrt(hd),
            compute_dtype, window=window, alibi_bias=alibi,
            plain_causal=plain_causal)
    ctx = ctx.reshape(b, t, d)
    if capture:
        stats["o_in_ch_absmax"] = jnp.max(jnp.abs(ctx.reshape(-1, d)), axis=0)
    attn_out = linear(ctx, lp["attn"]["o"], qcfg, qcfg.out if qcfg else PER_TENSOR,
                      LinearKind.SCALED, compute_dtype)
    if capture:
        stats["o_out_absmax"] = jnp.max(jnp.abs(attn_out))
    h = h + attn_out

    x2 = rms_norm(h, lp["ln2"]["w"], cfg.rms_norm_eps)
    if capture:
        stats["gate_in_ch_absmax"] = jnp.max(jnp.abs(x2.reshape(-1, d)), axis=0)
    gate = linear(x2, lp["mlp"]["gate"], qcfg, qcfg.fc1 if qcfg else PER_TENSOR,
                  LinearKind.POST_NORM, compute_dtype)
    up = linear(x2, lp["mlp"]["up"], qcfg, qcfg.fc1 if qcfg else PER_TENSOR,
                LinearKind.POST_NORM, compute_dtype)
    if capture:
        stats["gate_out_absmax"] = jnp.max(jnp.abs(gate))
        stats["up_out_absmax"] = jnp.max(jnp.abs(up))
    act = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)
           ).astype(compute_dtype)
    if capture:
        stats["down_in_ch_absmax"] = jnp.max(
            jnp.abs(act.reshape(-1, cfg.intermediate_size)), axis=0)
    down = linear(act, lp["mlp"]["down"], qcfg, qcfg.fc2 if qcfg else PER_TENSOR,
                  LinearKind.SCALED, compute_dtype)
    if capture:
        stats["down_out_absmax"] = jnp.max(jnp.abs(down))
    h = h + down
    return h, new_cache, stats


def forward(params, input_ids: jnp.ndarray, cfg: BaichuanConfig,
            quant_config: Optional[QuantConfig] = None, *,
            kv_cache=None, cache_index=None,
            kv_valid: Optional[jnp.ndarray] = None,
            pad_starts: Optional[jnp.ndarray] = None,
            positions: Optional[jnp.ndarray] = None,
            attention_mask: Optional[jnp.ndarray] = None,
            capture_stats: bool = False,
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
            positions = slots
        key_pos = jnp.arange(kv_cache.k.shape[2], dtype=jnp.int32)  # ALiBi
    else:
        positions, mask, plain_causal = uncached_mask_and_positions(
            b, t, positions, attention_mask)
        key_pos = jnp.arange(t, dtype=jnp.int32)

    paged = isinstance(kv_cache, PAGED_POOL_TYPES)
    slopes = None
    if cfg.position_embedding == "ROPE":
        cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
        alibi = None
    elif paged:
        # paged pool: no S_max axis for a dense bias — hand the raw slopes
        # to paged_attend, which applies m_h * key_pos in its block scan
        cos = sin = None
        alibi = None
        slopes = alibi_slopes(cfg.num_attention_heads)
    else:
        cos = sin = None
        # bias[h, q, k] = m_h * k_slot (shift-invariant form of m_h*(k-q))
        slopes_ = alibi_slopes(cfg.num_attention_heads)
        alibi = (slopes_[:, None, None]
                 * key_pos.astype(jnp.float32)[None, None, :])
        alibi = jnp.broadcast_to(
            alibi, (cfg.num_attention_heads, t, key_pos.shape[0]))

    plain_causal = kv_cache is None and attention_mask is None

    def step(carry, layer_in):
        lp, layer_cache = layer_in
        hh, new_cache, stats = _layer_forward(
            carry, lp, cfg, quant_config, cos, sin, mask, alibi, layer_cache,
            cache_index, capture_stats, compute_dtype,
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
        # (see common.carry_update_and_attend; ALiBi handled in the split)
        def step_carry(carry, lp):
            hh, cache, l = carry
            if lp is None:          # int4: stacked weights, in-kernel index
                lp = int4_scan_view(params["layers"], l)
            hh, cache, st = _layer_forward(
                hh, lp, cfg, quant_config, cos, sin, mask, alibi, (cache, l),
                cache_index, capture_stats, compute_dtype, window=window,
                chunk0=chunk0, banded=chunkN,
                banded_starts=pad_starts, kv_window=kv_window,
                alibi_slopes=slopes)
            return (hh, cache, l + 1), (st if capture_stats else None)

        (h, new_kv, _), stats = jax.lax.scan(
            step_carry, (h, kv_cache, jnp.int32(0)),
            None if int4_stacked else params["layers"],
            length=cfg.num_hidden_layers if int4_stacked else None)

    h = rms_norm(h, params["final_norm"]["w"], cfg.rms_norm_eps).astype(compute_dtype)
    return h, new_kv, (stats if capture_stats else None)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "quant_config", "capture_stats", "compute_dtype"),
)
def forward_jit(params, input_ids, cfg: BaichuanConfig,
                quant_config: Optional[QuantConfig] = None,
                capture_stats: bool = False, compute_dtype=jnp.float32):
    return forward(params, input_ids, cfg, quant_config,
                   capture_stats=capture_stats, compute_dtype=compute_dtype)


def logits(params, hidden: jnp.ndarray) -> jnp.ndarray:
    """NormHead weights are pre-normalized at load; plain fp matmul here."""
    w = params["lm_head"]["w"]
    return jnp.dot(hidden.astype(w.dtype), w, preferred_element_type=jnp.float32)


def init_kv_cache(cfg: BaichuanConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16):
    """dtype=jnp.int8 selects the quantized KV cache (int8 values +
    per-token-per-head scales); see common.make_kv_cache."""
    return make_kv_cache(cfg.num_hidden_layers, batch, max_len,
                         cfg.num_attention_heads, cfg.head_dim, dtype)


STAT_KEYS = (
    "qkv_in_ch_absmax", "attn_out_absmax", "o_in_ch_absmax", "o_out_absmax",
    "gate_in_ch_absmax", "gate_out_absmax", "up_out_absmax",
    "down_in_ch_absmax", "down_out_absmax",
)

# fp8 ignore-pattern resolution (the reference's fp8 path is llama-only;
# names follow the vendored Baichuan modeling tree,
# ref: thirdparty/baichuan/modeling_baichuan.py:195-296)
HF_PROJ_NAMES = {
    "wpack": "self_attn.W_pack", "o": "self_attn.o_proj",
    "gate": "mlp.gate_proj", "up": "mlp.up_proj", "down": "mlp.down_proj",
}


def act_scales_dict(stats) -> Dict[str, jnp.ndarray]:
    out = {}
    for i in range(stats["qkv_in_ch_absmax"].shape[0]):
        base = f"model.layers.{i}"
        out[f"{base}.self_attn.W_pack"] = stats["qkv_in_ch_absmax"][i]
        out[f"{base}.self_attn.o_proj"] = stats["o_in_ch_absmax"][i]
        out[f"{base}.mlp.gate_proj"] = stats["gate_in_ch_absmax"][i]
        out[f"{base}.mlp.up_proj"] = stats["gate_in_ch_absmax"][i]
        out[f"{base}.mlp.down_proj"] = stats["down_in_ch_absmax"][i]
    return out


def layer_scales(stats) -> Dict[str, jnp.ndarray]:
    """Stacked analog of collect_baichuan_layer_scales
    (ref: calibration.py:139-157)."""
    return {
        "attn_input_scale": jnp.max(stats["qkv_in_ch_absmax"], axis=-1) / 127.0,
        "attn_output_scale": stats["attn_out_absmax"] / 127.0,
        "out_input_scale": jnp.max(stats["o_in_ch_absmax"], axis=-1) / 127.0,
        "gate_input_scale": jnp.max(stats["gate_in_ch_absmax"], axis=-1) / 127.0,
        "down_input_scale": jnp.max(stats["down_in_ch_absmax"], axis=-1) / 127.0,
    }


def fp8_observer_scales(stats) -> Dict[str, jnp.ndarray]:
    """Per-projection fp8 input/output scales ([L]) — llama contract
    extended to Baichuan (W_pack's output scale is the fused-projection
    output absmax)."""
    m = qmath.FP8_E4M3_MAX
    per_ch_in = {"wpack": "qkv_in_ch_absmax", "o": "o_in_ch_absmax",
                 "gate": "gate_in_ch_absmax", "up": "gate_in_ch_absmax",
                 "down": "down_in_ch_absmax"}
    out_key = {"wpack": "attn_out_absmax", "o": "o_out_absmax",
               "gate": "gate_out_absmax", "up": "up_out_absmax",
               "down": "down_out_absmax"}
    out = {}
    for proj, key in per_ch_in.items():
        out[f"{proj}_input_scale"] = jnp.max(stats[key], axis=-1) / m
        out[f"{proj}_output_scale"] = stats[out_key[proj]] / m
    return out


def smooth(params, stats, alpha: float = 0.5,
           cfg: Optional[BaichuanConfig] = None):
    """smooth_lm Baichuan branch (ref: smooth.py:68-80): ln1 -> W_pack,
    ln2 -> gate/up."""
    from ..quant.smooth import smooth_norm_fcs

    def one(ln1, wpack, ln2, gate, up, qkv_sc, gate_sc):
        ln1n, (wp,), _ = smooth_norm_fcs(ln1, [wpack], qkv_sc, alpha)
        ln2n, (g2, u2), _ = smooth_norm_fcs(ln2, [gate, up], gate_sc, alpha)
        return ln1n, wp, ln2n, g2, u2

    lay = params["layers"]
    ln1, wp, ln2, g2, u2 = jax.vmap(one)(
        lay["ln1"]["w"], lay["attn"]["wpack"]["w"], lay["ln2"]["w"],
        lay["mlp"]["gate"]["w"], lay["mlp"]["up"]["w"],
        stats["qkv_in_ch_absmax"], stats["gate_in_ch_absmax"])
    new_layers = {
        "ln1": {"w": ln1},
        "attn": {"wpack": {"w": wp}, "o": dict(lay["attn"]["o"])},
        "ln2": {"w": ln2},
        "mlp": {"gate": {"w": g2}, "up": {"w": u2},
                "down": dict(lay["mlp"]["down"])},
    }
    return {**params, "layers": new_layers}


def quantize(params, qcfg: QuantConfig, scales=None,
             cfg: Optional[BaichuanConfig] = None, *,
             ignore=frozenset(), quantize_output: bool = False,
             observer_scales=None):
    """Int8BaichuanForCausalLM.from_float analog (ref: baichuan.py:553-573).
    W_pack: per-SECTION weight scales fused into a [3D] dequant vector
    (ref QKVLinear alpha/beta/gamma, linear.py:227-241). The fp8 branch
    extends the reference's llama-only fp8 recipe (ref: llama.py:143-176)
    family-wide, keeping per-section W_pack weight scales as a [3D] fp8
    column-scale vector."""
    lay = params["layers"]
    if qcfg.is_int4:
        # weight-only W4A16/W4A8: the [K/g, 3D] group-scale table is
        # already per-(group, COLUMN), strictly finer than the reference's
        # three per-section scalars — W_pack quantizes as one packed GEMM
        # with no section special-casing; norms keep their weights
        def pack4(proj):
            qw, sc = jax.vmap(lambda w: qmath.quantize_weight_int4_grouped(
                w, qcfg.group_size))(proj["w"])
            return {"w": qw, "w_scales": sc}

        new_layers = {
            "ln1": dict(lay["ln1"]),
            "attn": {"wpack": pack4(lay["attn"]["wpack"]),
                     "o": pack4(lay["attn"]["o"])},
            "ln2": dict(lay["ln2"]),
            "mlp": {k: pack4(v) for k, v in lay["mlp"].items()},
        }
        return {**params, "layers": new_layers}
    if not qcfg.is_int8:
        return _quantize_fp8(params, qcfg, scales, ignore=ignore,
                             quantize_output=quantize_output,
                             observer_scales=observer_scales)
    assert scales is not None
    D = lay["attn"]["wpack"]["w"].shape[1]

    def pack_wpack(w, input_scale):
        def one(wl):
            sections = [wl[:, i * D:(i + 1) * D] for i in range(3)]
            qs, ss = zip(*[qmath.quantize_weight_per_tensor_absmax(s)
                           for s in sections])
            return jnp.concatenate(qs, axis=1), jnp.stack(ss)

        qw, sec_scales = jax.vmap(one)(w)  # [L, D, 3D], [L, 3]
        if qcfg.qkv == PER_TENSOR:
            sec_scales = sec_scales * input_scale[:, None]
        col = jnp.repeat(sec_scales, D, axis=1)  # [L, 3D]
        return {"w": qw, "dequant_scale": col}

    def pack(p, input_scale, gran, kind):
        qw, w_scale = jax.vmap(qmath.quantize_weight_per_tensor_absmax)(p["w"])
        out = {"w": qw}
        if gran == PER_TENSOR:
            out["dequant_scale"] = w_scale * input_scale
            if kind == LinearKind.SCALED:
                out["quant_scale"] = input_scale
        else:
            out["dequant_scale"] = w_scale
        return out

    attn_in = scales["attn_input_scale"]
    out_in = scales["out_input_scale"]
    gate_in = scales["gate_input_scale"]
    down_in = scales["down_input_scale"]
    new_layers = {
        "ln1": {"w": lay["ln1"]["w"] / attn_in[:, None]
                if qcfg.qkv == PER_TENSOR else lay["ln1"]["w"]},
        "attn": {
            "wpack": pack_wpack(lay["attn"]["wpack"]["w"], attn_in),
            "o": pack(lay["attn"]["o"], out_in, qcfg.out, LinearKind.SCALED),
        },
        "ln2": {"w": lay["ln2"]["w"] / gate_in[:, None]
                if qcfg.fc1 == PER_TENSOR else lay["ln2"]["w"]},
        "mlp": {
            "gate": pack(lay["mlp"]["gate"], gate_in, qcfg.fc1, LinearKind.POST_NORM),
            "up": pack(lay["mlp"]["up"], gate_in, qcfg.fc1, LinearKind.POST_NORM),
            "down": pack(lay["mlp"]["down"], down_in, qcfg.fc2, LinearKind.SCALED),
        },
    }
    return {**params, "layers": new_layers}


def _quantize_fp8(params, qcfg: QuantConfig, scales, *, ignore,
                  quantize_output, observer_scales):
    """fp8 packing for Baichuan. W_pack keeps per-SECTION weight scales as a
    [3D] column vector (the fp8 analog of the int8 dequant vector); other
    projections follow llama's pack_fp8."""
    lay = params["layers"]
    fdt = qcfg.fp8_dtype
    D = lay["attn"]["wpack"]["w"].shape[1]

    def pack_wpack_fp8(v):
        if "wpack" in ignore:
            return dict(v)
        if qcfg.type == "fp8_e5m2":
            return {"w": v["w"].astype(fdt)}

        def one(wl):
            sections = [wl[:, i * D:(i + 1) * D] for i in range(3)]
            qs, ss = zip(*[qmath.quantize_fp8_per_tensor(s, fdt)
                           for s in sections])
            return jnp.concatenate(qs, axis=1), jnp.stack(ss)

        qw, sec_scales = jax.vmap(one)(v["w"])   # [L, D, 3D], [L, 3]
        col = jnp.repeat(sec_scales, D, axis=1)  # [L, 3D]
        return {"w": qw, "w_scale": col}

    def pack_fp8(key, v):
        if key in ignore:
            return dict(v)
        if qcfg.type == "fp8_e5m2":
            return {"w": v["w"].astype(fdt)}
        qw, w_scale = jax.vmap(
            lambda ww: qmath.quantize_fp8_per_tensor(ww, fdt))(v["w"])
        return {"w": qw, "w_scale": w_scale}

    new_layers = {
        "ln1": dict(lay["ln1"]),
        "attn": {"wpack": pack_wpack_fp8(lay["attn"]["wpack"]),
                 "o": pack_fp8("o", lay["attn"]["o"])},
        "ln2": dict(lay["ln2"]),
        "mlp": {k: pack_fp8(k, v) for k, v in lay["mlp"].items()},
    }
    if qcfg.type == "fp8_e4m3" and qcfg.activation_scheme == "static":
        groups = {"wpack": "attn", "o": "attn",
                  "gate": "mlp", "up": "mlp", "down": "mlp"}
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
            legacy = {"wpack": "attn_input_scale", "o": "out_input_scale",
                      "gate": "gate_input_scale", "up": "gate_input_scale",
                      "down": "down_input_scale"}
            for name, key in legacy.items():
                if name in ignore:
                    continue
                new_layers[groups[name]][name]["input_scale"] = \
                    scales[key] * 127.0 / qmath.FP8_E4M3_MAX
    return {**params, "layers": new_layers}


import sys as _sys  # noqa: E402

register_model("BaichuanForCausalLM", FAMILY, _sys.modules[__name__])
register_model("BaiChuanForCausalLM", FAMILY, _sys.modules[__name__])
