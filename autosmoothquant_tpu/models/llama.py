"""Llama family (Llama/Llama-2/TinyLlama/CodeLlama, GQA-aware).

Functional TPU-native re-design of the reference's module-surgery model
(ref: autosmoothquant/models/llama.py). The model is a pure function over a
params pytree whose decoder layers are STACKED along a leading [L] axis and
executed with ``lax.scan`` — one trace regardless of depth, weights streamed
layer-by-layer from HBM.

Params layout (float; [in, out] weight convention):
    {"embed":      {"w": [V, D]},
     "layers":     {"ln1": {"w": [L, D]},
                    "attn": {"q": {"w": [L, D, H*Dh]}, "k": ..., "v": ...,
                             "o": {"w": [L, H*Dh, D]}},
                    "ln2": {"w": [L, D]},
                    "mlp": {"gate": {"w": [L, D, I]}, "up": ...,
                            "down": {"w": [L, I, D]}}},
     "final_norm": {"w": [D]},
     "lm_head":    {"w": [D, V]}}     # kept fp (ref: llama.py:409-410)

After quantization each projection dict gains int8 "w" + "dequant_scale" [L]
(+ "quant_scale" [L] for o/down per-tensor), per QuantConfig.
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
    KVCacheLayer,
    cache_mask_and_routing,
    cache_slots,
    decode_window,
    fused_add_norm_quant,
    fused_block_enabled,
    int4_scan_view,
    make_kv_cache,
    uncached_mask_and_positions,
    update_and_attend,
    LinearKind,
    apply_rope,
    fused_linear,
    linear,
    linear_prequant,
    rms_norm,
    rope_cos_sin,
)
from .registry import register_model

FAMILY = "llama"


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    # q/k/v projection biases (Qwen2 — llama architecture + QKV bias; the
    # same functional module serves both families)
    attention_bias: bool = False
    # Gemma knobs: gelu-tanh MLP activation and an explicit head_dim that
    # need not equal hidden/heads (its norm (1+w) and sqrt(D) embedding
    # scaling fold away at LOAD time — convert/hf.gemma_params_from_state_dict)
    hidden_act: str = "silu"
    head_dim_override: int = 0
    # Mistral: attention window, 0 = full attention. Windowed masks are
    # implemented in the mask paths (common.cache_mask_and_routing /
    # decode_window clamp); the causal flash prefill fast paths fall back
    # to eager when the window could bind.
    sliding_window: int = 0

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or (
            self.hidden_size // self.num_attention_heads)

    @classmethod
    def from_hf(cls, hf_config) -> "LlamaConfig":
        g = (lambda k, d=None: getattr(hf_config, k, d)) if not isinstance(hf_config, dict) \
            else (lambda k, d=None: hf_config.get(k, d))
        return cls(
            vocab_size=g("vocab_size"),
            hidden_size=g("hidden_size"),
            intermediate_size=g("intermediate_size"),
            num_hidden_layers=g("num_hidden_layers"),
            num_attention_heads=g("num_attention_heads"),
            num_key_value_heads=g("num_key_value_heads", g("num_attention_heads")),
            max_position_embeddings=g("max_position_embeddings", 2048),
            rms_norm_eps=g("rms_norm_eps", 1e-6),
            rope_theta=g("rope_theta", 10000.0),
            tie_word_embeddings=bool(g("tie_word_embeddings", False)),
            attention_bias=bool(g("attention_bias",
                                  g("model_type", "") == "qwen2")),
            hidden_act=("gelu_tanh" if str(
                g("hidden_activation", None) or g("hidden_act", "silu")
                ).startswith("gelu") else "silu"),
            head_dim_override=int(g("head_dim", 0) or 0),
            sliding_window=(int(g("sliding_window", 0) or 0)
                            if g("use_sliding_window", True) else 0),
        )


# ---------------------------------------------------------------------------
# Init (random weights — tiny-model tests and benchmarks)
# ---------------------------------------------------------------------------


def init_params(cfg: LlamaConfig, key, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 16))
    L, D, I, V = (cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size,
                  cfg.vocab_size)
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
                "q": {"w": w(next(keys), L, D, HD),
                      **({} if not cfg.attention_bias else
                         {"bias": w(next(keys), L, HD, scale=0.02)})},
                "k": {"w": w(next(keys), L, D, KVD),
                      **({} if not cfg.attention_bias else
                         {"bias": w(next(keys), L, KVD, scale=0.02)})},
                "v": {"w": w(next(keys), L, D, KVD),
                      **({} if not cfg.attention_bias else
                         {"bias": w(next(keys), L, KVD, scale=0.02)})},
                "o": {"w": w(next(keys), L, HD, D)},
            },
            "ln2": {"w": jnp.ones((L, D), dtype)},
            "mlp": {
                "gate": {"w": w(next(keys), L, D, I)},
                "up": {"w": w(next(keys), L, D, I)},
                "down": {"w": w(next(keys), L, I, D)},
            },
        },
        "final_norm": {"w": jnp.ones((D,), dtype)},
        "lm_head": {"w": w(next(keys), D, V, scale=0.02)},
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_forward(h, lp, cfg: LlamaConfig, qcfg: Optional[QuantConfig],
                   cos, sin, mask, cache: Optional[KVCacheLayer],
                   cache_index, capture: bool, compute_dtype,
                   plain_causal: bool = False, window=None,
                   chunk0: bool = False, banded: bool = False,
                   banded_starts=None, kv_window=None):
    """One decoder layer. h: [B, T, D] compute_dtype. Returns (h', cache',
    stats)."""
    b, t, d = h.shape
    hd = cfg.head_dim
    n_q, n_kv = cfg.num_attention_heads, cfg.num_key_value_heads
    stats = {}

    # --- attention ---------------------------------------------------------
    x = rms_norm(h, lp["ln1"]["w"], cfg.rms_norm_eps)  # f32
    if capture:
        stats["qkv_in_ch_absmax"] = jnp.max(jnp.abs(x.reshape(-1, d)), axis=0)
    n_kv_d = cfg.num_key_value_heads * hd
    if "qkv" in lp["attn"]:
        # decode-optimized fused QKV: one GEMM, per-section dequant columns
        # (see fuse_decode_projections)
        proj = fused_linear(x, lp["attn"]["qkv"], qcfg,
                            qcfg.qkv if qcfg else PER_TENSOR, compute_dtype)
        q = proj[..., : n_q * hd]
        k = proj[..., n_q * hd: n_q * hd + n_kv_d]
        v = proj[..., n_q * hd + n_kv_d:]
    else:
        q = linear(x, lp["attn"]["q"], qcfg, qcfg.qkv if qcfg else PER_TENSOR,
                   LinearKind.POST_NORM, out_dtype=compute_dtype)
        k = linear(x, lp["attn"]["k"], qcfg, qcfg.qkv if qcfg else PER_TENSOR,
                   LinearKind.POST_NORM, out_dtype=compute_dtype)
        v = linear(x, lp["attn"]["v"], qcfg, qcfg.qkv if qcfg else PER_TENSOR,
                   LinearKind.POST_NORM, out_dtype=compute_dtype)
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
        # sliding_window is consumed only by the paged-pool branch; the
        # contiguous paths already encode it in mask/window
        new_cache, ctx = update_and_attend(
            q, k, v, None, cache_index, mask, 1.0 / math.sqrt(hd),
            compute_dtype, window=window, carry=cache, chunk0_causal=chunk0, banded=banded,
            banded_starts=banded_starts, kv_window=kv_window,
            sliding_window=cfg.sliding_window)
    else:
        new_cache, ctx = update_and_attend(
            q, k, v, cache, cache_index, mask, 1.0 / math.sqrt(hd),
            compute_dtype, window=window, plain_causal=plain_causal,
            chunk0_causal=chunk0)
    ctx = ctx.reshape(b, t, n_q * hd)
    if capture:
        stats["o_in_ch_absmax"] = jnp.max(jnp.abs(ctx.reshape(-1, n_q * hd)), axis=0)
    attn_out = linear(ctx, lp["attn"]["o"], qcfg, qcfg.out if qcfg else PER_TENSOR,
                      LinearKind.SCALED, out_dtype=compute_dtype)
    if capture:
        stats["o_out_absmax"] = jnp.max(jnp.abs(attn_out))

    # --- mlp ---------------------------------------------------------------
    fused_block = fused_block_enabled(qcfg, capture)
    if not fused_block:
        h = h + attn_out
    if fused_block:
        # fused residual-add + RMSNorm + int8-quantize (one HBM pass; the
        # TPU realization of the reference's dq_add_layernorm_q,
        # csrc/kernels/fused.cu:5-25) feeding a prequantized int8 GEMM —
        # the activation never returns to fp in HBM between norm and MXU
        h2, x2_q = fused_add_norm_quant(
            h.reshape(b * t, d), attn_out.reshape(b * t, d),
            lp["ln2"]["w"], eps=cfg.rms_norm_eps,
            interpret=jax.default_backend() != "tpu")
        h = h2.reshape(b, t, d)
        # (the fused silu-mul-requant MLP kernel was PRUNED round 4:
        # measured parity at tuned tiles — XLA fuses the chain into the
        # GEMM consumers without the [M, 2I] HBM round-trip; BENCHMARKS.md)
        mp = lp["mlp"].get("gateup")
        if mp is not None:
            proj = linear_prequant(x2_q, mp, compute_dtype).reshape(b, t, -1)
            gate = proj[..., : cfg.intermediate_size]
            up = proj[..., cfg.intermediate_size:]
        else:
            gate = linear_prequant(x2_q, lp["mlp"]["gate"], compute_dtype
                                   ).reshape(b, t, -1)
            up = linear_prequant(x2_q, lp["mlp"]["up"], compute_dtype
                                 ).reshape(b, t, -1)
    else:
        x2 = rms_norm(h, lp["ln2"]["w"], cfg.rms_norm_eps)
        if capture:
            stats["gate_in_ch_absmax"] = jnp.max(jnp.abs(x2.reshape(-1, d)), axis=0)
        if "gateup" in lp["mlp"]:
            proj = fused_linear(x2, lp["mlp"]["gateup"], qcfg,
                                qcfg.fc1 if qcfg else PER_TENSOR, compute_dtype)
            gate = proj[..., : cfg.intermediate_size]
            up = proj[..., cfg.intermediate_size:]
        else:
            gate = linear(x2, lp["mlp"]["gate"], qcfg, qcfg.fc1 if qcfg else PER_TENSOR,
                          LinearKind.POST_NORM, out_dtype=compute_dtype)
            up = linear(x2, lp["mlp"]["up"], qcfg, qcfg.fc1 if qcfg else PER_TENSOR,
                        LinearKind.POST_NORM, out_dtype=compute_dtype)
    act_fn = (jax.nn.silu if cfg.hidden_act == "silu"
              else functools.partial(jax.nn.gelu, approximate=True))
    act = (act_fn(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(compute_dtype)
    if capture:
        stats["gate_out_absmax"] = jnp.max(jnp.abs(gate))
        stats["up_out_absmax"] = jnp.max(jnp.abs(up))
        stats["down_in_ch_absmax"] = jnp.max(
            jnp.abs(act.reshape(-1, cfg.intermediate_size)), axis=0)
    down = linear(act, lp["mlp"]["down"], qcfg, qcfg.fc2 if qcfg else PER_TENSOR,
                  LinearKind.SCALED, out_dtype=compute_dtype)
    if capture:
        stats["down_out_absmax"] = jnp.max(jnp.abs(down))
    h = h + down
    return h, new_cache, stats


def forward(params, input_ids: jnp.ndarray, cfg: LlamaConfig,
            quant_config: Optional[QuantConfig] = None, *,
            kv_cache=None, cache_index=None,
            kv_valid: Optional[jnp.ndarray] = None,
            pad_starts: Optional[jnp.ndarray] = None,
            positions: Optional[jnp.ndarray] = None,
            attention_mask: Optional[jnp.ndarray] = None,
            capture_stats: bool = False,
            kv_window: Optional[int] = None,
            compute_dtype=jnp.float32) -> Tuple[jnp.ndarray, Any, Any]:
    """Run the decoder stack. input_ids: int32 [B, T].

    kv_window: STATIC bound on live cache slots (a pow2 bucket >= every
    row's fill+steps): decode attention then touches only [:, :kv_window]
    of the cache — see common.carry_update_and_attend.

    kv_cache: None, or KVCacheLayer with leaves stacked [L, B, S_max, ...]
    plus int32 ``cache_index`` (current fill length; tokens are written at
    [cache_index, cache_index+T)).

    Returns (hidden [B, T, D], new_kv_cache, stats-or-None).
    Mirrors the call structure of QuantizedLlamaModel.forward
    (= HF LlamaModel.forward, ref: models/llama.py:375).
    """
    b, t = input_ids.shape
    h = params["embed"]["w"][input_ids].astype(compute_dtype)
    window = None
    chunk0 = chunkN = False

    if kv_cache is not None:
        slots, mask, window, chunk0, chunkN = cache_mask_and_routing(
            kv_cache, cache_index, b, t, kv_valid, pad_starts,
            cfg.sliding_window)
        if positions is None:
            positions = slots  # no padding: slot == rope position
    else:
        positions, mask, plain_causal = uncached_mask_and_positions(
            b, t, positions, attention_mask, cfg.sliding_window)

    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    plain_causal = kv_cache is None and plain_causal

    def step(carry, layer_in):
        hh = carry
        lp, layer_cache = layer_in
        hh, new_cache, stats = _layer_forward(
            hh, lp, cfg, quant_config, cos, sin, mask, layer_cache,
            cache_index, capture_stats, compute_dtype,
            plain_causal=plain_causal, window=window,
        )
        ys = (new_cache, stats) if capture_stats else (new_cache, None)
        return hh, ys

    # int4 packed and fp8 byte weights must NOT ride the scan xs: slicing
    # them per layer to feed the Pallas kernels costs a full materialized
    # copy of the bytes every step (measured: it erased the entire W4
    # bandwidth win at 7B; same custom-call-operand rule applies to the fp8
    # streaming kernel). Instead scan over nothing and give the body a
    # layer VIEW whose kernel-streamed leaves stay stacked, indexed
    # in-kernel (common.int4_scan_view).
    from ..runtime import flags as _flags

    int4_stacked = quant_config is not None and (
        quant_config.is_int4
        or (quant_config.is_fp8 and _flags().fp8_stream == "on"))

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
            # scan needs a pytree with a leading L axis; use a dummy
            # per-layer None
            h, (new_caches, stats) = jax.lax.scan(
                lambda c, lp: step(c, (lp, None)), h, params["layers"]
            )
        new_kv = None
    else:
        # the cache rides in the scan CARRY (token-only scatter writes per
        # layer) — the round-1 xs/ys layout rewrote the ENTIRE cache into
        # the stacked scan outputs every step, ~2x the cache bytes in pure
        # copy traffic (see common.carry_update_and_attend)
        def step_carry(carry, lp):
            hh, cache, l = carry
            if lp is None:          # int4: stacked weights, in-kernel index
                lp = int4_scan_view(params["layers"], l)
            hh, cache, st = _layer_forward(
                hh, lp, cfg, quant_config, cos, sin, mask, (cache, l),
                cache_index, capture_stats, compute_dtype, window=window,
                chunk0=chunk0, banded=chunkN,
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
    static_argnames=("cfg", "quant_config", "capture_stats", "compute_dtype"),
)
def forward_jit(params, input_ids, cfg: LlamaConfig,
                quant_config: Optional[QuantConfig] = None,
                capture_stats: bool = False, compute_dtype=jnp.float32):
    """Jitted cacheless forward (calibration / perplexity / parity tests).
    Un-jitted op-by-op dispatch is ~100x slower in this runtime — always go
    through jit."""
    return forward(params, input_ids, cfg, quant_config,
                   capture_stats=capture_stats, compute_dtype=compute_dtype)


def logits(params, hidden: jnp.ndarray) -> jnp.ndarray:
    """lm_head (kept fp, ref: llama.py:409-410). Returns f32 [B, T, V]."""
    w = params["lm_head"]["w"]
    # dot in the weight's native dtype (bf16 on TPU) with f32 accumulation:
    # an explicit f32 cast of a large vocab matrix would double its HBM reads
    return jnp.dot(hidden.astype(w.dtype), w, preferred_element_type=jnp.float32)


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16):
    """dtype=jnp.int8 selects the quantized KV cache (int8 values +
    per-token-per-head scales); see common.make_kv_cache."""
    return make_kv_cache(cfg.num_hidden_layers, batch, max_len,
                         cfg.num_key_value_heads, cfg.head_dim, dtype)


# ---------------------------------------------------------------------------
# Calibration-statistics contract
# ---------------------------------------------------------------------------

# Keys of the per-layer stats emitted by forward(capture_stats=True), and how
# they aggregate across calibration batches (elementwise max). *_out_absmax
# keys cover every projection so an fp8 observer pass can derive OUTPUT
# scales too (ref: FP8StaticLinearQuantizer.quantize_output,
# layers/nn/linear.py:455-500).
STAT_KEYS = (
    "qkv_in_ch_absmax", "q_out_absmax", "k_out_absmax", "v_out_absmax",
    "o_in_ch_absmax", "o_out_absmax", "gate_in_ch_absmax", "gate_out_absmax",
    "up_out_absmax", "down_in_ch_absmax", "down_out_absmax",
)

# HF module-name suffix per projection key — used by the pipeline to apply
# fp8 ignore patterns (ref: calibration.py:259-278 get_layers_to_ignore)
HF_PROJ_NAMES = {
    "q": "self_attn.q_proj", "k": "self_attn.k_proj", "v": "self_attn.v_proj",
    "o": "self_attn.o_proj", "gate": "mlp.gate_proj", "up": "mlp.up_proj",
    "down": "mlp.down_proj",
}


def act_scales_dict(stats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Convert stacked stats -> the reference's act_scales dict keyed by HF
    module names (ref: calibration.py:44-88 keys smooth_lm consumes,
    smooth.py:60-67). Per-channel input absmax per projection."""
    out = {}
    L = stats["qkv_in_ch_absmax"].shape[0]
    for i in range(L):
        base = f"model.layers.{i}"
        out[f"{base}.self_attn.q_proj"] = stats["qkv_in_ch_absmax"][i]
        out[f"{base}.self_attn.k_proj"] = stats["qkv_in_ch_absmax"][i]
        out[f"{base}.self_attn.v_proj"] = stats["qkv_in_ch_absmax"][i]
        out[f"{base}.self_attn.o_proj"] = stats["o_in_ch_absmax"][i]
        out[f"{base}.mlp.gate_proj"] = stats["gate_in_ch_absmax"][i]
        out[f"{base}.mlp.up_proj"] = stats["gate_in_ch_absmax"][i]
        out[f"{base}.mlp.down_proj"] = stats["down_in_ch_absmax"][i]
    return out


def layer_scales(stats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Stacked analog of collect_llama_layer_scales
    (ref: calibration.py:115-136): scalar absmax / 127 per layer, shape [L]."""
    return {
        "attn_input_scale": jnp.max(stats["qkv_in_ch_absmax"], axis=-1) / 127.0,
        "q_output_scale": stats["q_out_absmax"] / 127.0,
        "k_output_scale": stats["k_out_absmax"] / 127.0,
        "v_output_scale": stats["v_out_absmax"] / 127.0,
        "out_input_scale": jnp.max(stats["o_in_ch_absmax"], axis=-1) / 127.0,
        "gate_input_scale": jnp.max(stats["gate_in_ch_absmax"], axis=-1) / 127.0,
        "down_input_scale": jnp.max(stats["down_in_ch_absmax"], axis=-1) / 127.0,
    }


def fp8_observer_scales(stats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Per-projection fp8 input AND output scales ([L] each, absmax /
    E4M3_MAX) from an observer calibration pass — the functional analog of
    FP8StaticLinearQuantizer's running-max scale tracking
    (ref: layers/nn/linear.py:455-500, calibration.py:292-338)."""
    m = qmath.FP8_E4M3_MAX
    per_ch_in = {"q": "qkv_in_ch_absmax", "k": "qkv_in_ch_absmax",
                 "v": "qkv_in_ch_absmax", "o": "o_in_ch_absmax",
                 "gate": "gate_in_ch_absmax", "up": "gate_in_ch_absmax",
                 "down": "down_in_ch_absmax"}
    out = {}
    for proj, key in per_ch_in.items():
        out[f"{proj}_input_scale"] = jnp.max(stats[key], axis=-1) / m
        out[f"{proj}_output_scale"] = stats[f"{proj}_out_absmax"] / m
    return out


# ---------------------------------------------------------------------------
# Smooth (vmapped over stacked layers)
# ---------------------------------------------------------------------------


def smooth(params, stats: Dict[str, jnp.ndarray], alpha: float = 0.5,
           cfg: Optional[LlamaConfig] = None):
    """SmoothQuant migration for every layer at once. Functional analog of
    smooth_lm's LlamaDecoderLayer branch (ref: smooth.py:56-67): ln1 -> q/k/v
    with qkv input scales; ln2 -> gate/up with gate input scales."""
    from ..quant.smooth import smooth_norm_fcs

    def one(ln1, q, k, v, ln2, gate, up, qkv_scales, gate_scales):
        ln1_new, (q2, k2, v2), _ = smooth_norm_fcs(ln1, [q, k, v], qkv_scales, alpha)
        ln2_new, (g2, u2), _ = smooth_norm_fcs(ln2, [gate, up], gate_scales, alpha)
        return ln1_new, q2, k2, v2, ln2_new, g2, u2

    lay = params["layers"]
    ln1_new, q2, k2, v2, ln2_new, g2, u2 = jax.vmap(one)(
        lay["ln1"]["w"], lay["attn"]["q"]["w"], lay["attn"]["k"]["w"],
        lay["attn"]["v"]["w"], lay["ln2"]["w"], lay["mlp"]["gate"]["w"],
        lay["mlp"]["up"]["w"], stats["qkv_in_ch_absmax"], stats["gate_in_ch_absmax"],
    )
    new_layers = {
        "ln1": {"w": ln1_new},
        "attn": {**lay["attn"],
                 "q": {**lay["attn"]["q"], "w": q2},
                 "k": {**lay["attn"]["k"], "w": k2},
                 "v": {**lay["attn"]["v"], "w": v2}},
        "ln2": {"w": ln2_new},
        "mlp": {**lay["mlp"],
                "gate": {**lay["mlp"]["gate"], "w": g2},
                "up": {**lay["mlp"]["up"], "w": u2}},
    }
    return {**params, "layers": new_layers}


# ---------------------------------------------------------------------------
# Quantize (convert float params -> quantized params)
# ---------------------------------------------------------------------------


def quantize(params, qcfg: QuantConfig,
             scales: Optional[Dict[str, jnp.ndarray]] = None,
             cfg: Optional[LlamaConfig] = None, *,
             ignore=frozenset(), quantize_output: bool = False,
             observer_scales: Optional[Dict[str, jnp.ndarray]] = None):
    """Produce the quantized params pytree. Functional analog of
    QuantizedLlamaForCausalLM.from_float_to_int8 / _to_fp8
    (ref: models/llama.py:424-440). ``scales``: stacked layer_scales() output
    (required for int8 and fp8-static).

    fp8 extras: ``ignore`` — projection keys (q/k/v/o/gate/up/down) left in
    float (the pipeline resolves the reference's ignore patterns,
    calibration.py:259-278, to these keys); ``observer_scales`` —
    fp8_observer_scales() output for static input scales observed through a
    quantized forward; ``quantize_output`` — store per-projection output
    scales so the static forward re-quantizes its output
    (FP8StaticLinearQuantizer(quantize_output=True), linear.py:483-494)."""
    lay = params["layers"]

    if qcfg.is_int4:
        # weight-only W4A16 (beyond the reference): nibble-packed grouped
        # int4 weights, activations untouched — norms keep their weights
        # (no scale fold; there is no activation quant step to fold into)
        def pack4(proj):
            qw, sc = jax.vmap(lambda w: qmath.quantize_weight_int4_grouped(
                w, qcfg.group_size))(proj["w"])
            p = {"w": qw, "w_scales": sc}
            if "bias" in proj:
                p["bias"] = proj["bias"]
            return p

        new_layers = {
            "ln1": dict(lay["ln1"]),
            "attn": {k: pack4(v) for k, v in lay["attn"].items()},
            "ln2": dict(lay["ln2"]),
            "mlp": {k: pack4(v) for k, v in lay["mlp"].items()},
        }
        return {**params, "layers": new_layers}

    if qcfg.is_int8:
        assert scales is not None

        def quant_proj(w):
            return jax.vmap(qmath.quantize_weight_per_tensor_absmax)(w)

        def pack(proj, input_scale, gran, kind):
            qw, w_scale = quant_proj(proj["w"])
            p = {"w": qw}
            if "bias" in proj:
                p["bias"] = proj["bias"]  # added post-dequant in f32
            if gran == PER_TENSOR:
                p["dequant_scale"] = w_scale * input_scale
                if kind == LinearKind.SCALED:
                    p["quant_scale"] = input_scale
            else:
                p["dequant_scale"] = w_scale
            return p

        attn_in = scales["attn_input_scale"]
        out_in = scales["out_input_scale"]
        gate_in = scales["gate_input_scale"]
        down_in = scales["down_input_scale"]
        new_layers = {
            "ln1": {"w": lay["ln1"]["w"] / attn_in[:, None]
                    if qcfg.qkv == PER_TENSOR else lay["ln1"]["w"]},
            "attn": {
                "q": pack(lay["attn"]["q"], attn_in, qcfg.qkv, LinearKind.POST_NORM),
                "k": pack(lay["attn"]["k"], attn_in, qcfg.qkv, LinearKind.POST_NORM),
                "v": pack(lay["attn"]["v"], attn_in, qcfg.qkv, LinearKind.POST_NORM),
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

    # fp8 variants (ref: llama.py from_float_to_fp8 paths)
    fdt = qcfg.fp8_dtype

    def pack_fp8(key, v):
        if key in ignore:  # exempted projection stays float (ignore patterns)
            return dict(v)
        w = v["w"]
        extra = {"bias": v["bias"]} if "bias" in v else {}
        qw, w_scale = jax.vmap(lambda ww: qmath.quantize_fp8_per_tensor(ww, fdt))(w)
        if qcfg.type == "fp8_e5m2":
            # scale-free: e5m2 casts weights directly (linear.py:607-614)
            return {"w": w.astype(fdt), **extra}
        return {"w": qw, "w_scale": w_scale, **extra}

    new_layers = {
        "ln1": dict(lay["ln1"]),
        "attn": {k: pack_fp8(k, v) for k, v in lay["attn"].items()},
        "ln2": dict(lay["ln2"]),
        "mlp": {k: pack_fp8(k, v) for k, v in lay["mlp"].items()},
    }
    if qcfg.type == "fp8_e4m3" and qcfg.activation_scheme == "static":
        groups = {"q": "attn", "k": "attn", "v": "attn", "o": "attn",
                  "gate": "mlp", "up": "mlp", "down": "mlp"}
        if observer_scales is not None:
            # true observer semantics: scales tracked through a quantized
            # forward (ref: quantize_activations_fp8, calibration.py:292-338)
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
            # legacy derivation from the int8-style layer scales
            legacy = {"q": "attn_input_scale", "k": "attn_input_scale",
                      "v": "attn_input_scale", "o": "out_input_scale",
                      "gate": "gate_input_scale", "up": "gate_input_scale",
                      "down": "down_input_scale"}
            for name, key in legacy.items():
                if name in ignore:
                    continue
                new_layers[groups[name]][name]["input_scale"] = \
                    scales[key] * 127.0 / qmath.FP8_E4M3_MAX
    return {**params, "layers": new_layers}


def fuse_decode_projections(params):
    """Decode-time optimization: concatenate q|k|v and gate|up along the
    output dim so each decoder layer runs 4 GEMMs instead of 7 — at M=1 the
    step is per-op-overhead-bound, and wider N also tiles the MXU better.
    Works on float, int8 (scalar dequant scales expand to per-section column
    vectors, the W8A8BFP32OFP32QKVLinear recipe) and fp8 params.

    Note: the fused layout is for single-device / data-parallel serving;
    tensor parallelism should shard the unfused layout (sections would split
    unevenly across the model axis)."""
    lay = params["layers"]

    def fuse(ps):
        out = {"w": jnp.concatenate([p["w"] for p in ps], axis=-1)}
        if all("bias" in p for p in ps):
            out["bias"] = jnp.concatenate([p["bias"] for p in ps], axis=-1)
        if "dequant_scale" in ps[0]:
            cols = [jnp.repeat(p["dequant_scale"][:, None], p["w"].shape[-1], axis=1)
                    for p in ps]
            out["dequant_scale"] = jnp.concatenate(cols, axis=1)
        if "w_scale" in ps[0]:
            cols = [jnp.repeat(p["w_scale"][:, None], p["w"].shape[-1], axis=1)
                    for p in ps]
            out["w_scale"] = jnp.concatenate(cols, axis=1)
        if "w_scales" in ps[0]:  # int4: [L, K/g, N] group scales concat on N
            out["w_scales"] = jnp.concatenate([p["w_scales"] for p in ps],
                                              axis=-1)
        return out

    new_layers = {
        **lay,
        "attn": {
            "qkv": fuse([lay["attn"]["q"], lay["attn"]["k"], lay["attn"]["v"]]),
            "o": lay["attn"]["o"],
        },
        "mlp": {
            "gateup": fuse([lay["mlp"]["gate"], lay["mlp"]["up"]]),
            "down": lay["mlp"]["down"],
        },
    }
    return {**params, "layers": new_layers}


config_from_hf = LlamaConfig.from_hf

import sys as _sys  # noqa: E402

register_model("LlamaForCausalLM", FAMILY, _sys.modules[__name__])
register_model("Qwen2ForCausalLM", FAMILY, _sys.modules[__name__])
register_model("MistralForCausalLM", FAMILY, _sys.modules[__name__])
register_model("LLaMAForCausalLM", FAMILY, _sys.modules[__name__])
