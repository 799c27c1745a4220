"""Offline quantization pipeline: calibrate -> smooth -> (re-calibrate) ->
quantize -> save.

Functional analog of the reference CLI flow
(ref: examples/smoothquant_model.py:40-99, call stack SURVEY.md §3.1):
  1. first calibration pass on the fp model  -> per-channel act scales
  2. smooth_lm(alpha)                        -> migrated weights
  3. second calibration pass (smoothed)      -> static per-layer scalar scales
     (the reference's get_static_decoder_layer_scales runs post-smooth)
  4. from_float_to_int8/fp8                  -> quantized params + folds
  5. save quantized checkpoint + quant_config.json (identical contract)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..calibrate.calibrate import calibrate
from ..quant.config import QuantConfig, save_quant_config
from ..quant.ignore import DEFAULT_IGNORE, match_ignore_patterns


def resolve_ignore_keys(model_mod, cfg, patterns) -> frozenset:
    """Map the reference's fp8 ignore patterns (literal names or "re:<regex>",
    calibration.py:259-278) onto this framework's projection keys. Layers are
    stacked [L] here, so a pattern must cover a projection in EVERY layer (or
    none) — partial per-layer matches cannot be represented in one stacked
    int8/fp8 array and raise."""
    if not patterns:
        return frozenset()
    proj_names = getattr(model_mod, "HF_PROJ_NAMES", None)
    if proj_names is None:
        return frozenset()
    L = cfg.num_hidden_layers
    fmt = getattr(model_mod, "HF_LAYER_FMT", "model.layers.{i}")
    ignored = set()
    for key, suffix in proj_names.items():
        names = [f"{fmt.format(i=i)}.{suffix}" for i in range(L)]
        hits = match_ignore_patterns(names, patterns)
        if len(hits) == L:
            ignored.add(key)
        elif hits:
            raise ValueError(
                f"ignore pattern matches {len(hits)}/{L} layers of "
                f"'{suffix}'; per-layer exemptions are not supported with "
                "stacked layer params — match all layers or none")
    # lm_head is never quantized by construction (ref default "re:.*lm_head"
    # therefore resolves to nothing extra)
    return frozenset(ignored)


def calibrate_smooth_quantize(model_mod, params, cfg, qcfg: QuantConfig,
                              batches_fn, alpha: float = 0.5,
                              compute_dtype=jnp.float32,
                              ignore_patterns=DEFAULT_IGNORE,
                              quantize_output: bool = False):
    """batches_fn: zero-arg callable returning a fresh iterable of input_ids
    batches (two passes are needed). Returns (quantized_params, artifacts)
    where artifacts carries the intermediate scale pytrees for
    inspection/saving (the analog of the act_scales .pt file,
    smoothquant_model.py:54-58).

    fp8: ignore_patterns exempt projections from quantization
    (ref: calibration.py:259-278); for the static scheme an OBSERVER pass
    runs calibration through the dynamically-quantized model to track input
    (+ output, when quantize_output) scales, mirroring
    quantize_activations_fp8 (calibration.py:292-338)."""
    # family-specific calibration forward kwargs — e.g. Mixtral's
    # all-experts trick (top_k widened so every expert sees tokens,
    # ref: calibration.py:23-42 _model_preprocess). The reference applies it
    # ONLY to the smoothing pass (get_act_scales); the static-scale pass
    # (get_static_decoder_layer_scales, calibration.py:186-244) runs the
    # ORIGINAL top-k routing with per-expert stats over routed tokens.
    # Matching both is load-bearing for artifact parity —
    # tests/test_reference_artifact.py catches drift either way.
    calib_kwargs = getattr(model_mod, "CALIBRATION_FORWARD_KWARGS", None)
    stats_fp = calibrate(model_mod, params, cfg, batches_fn(),
                         compute_dtype=compute_dtype,
                         extra_forward_kwargs=calib_kwargs)
    smoothed = model_mod.smooth(params, stats_fp, alpha, cfg=cfg)

    is_fp8 = qcfg.type in ("fp8_e4m3", "fp8_e5m2")
    ignore = resolve_ignore_keys(model_mod, cfg, ignore_patterns) if is_fp8 \
        else frozenset()

    scales = None
    stats_sm = None
    observer_scales = None
    if qcfg.is_int8:
        stats_sm = calibrate(model_mod, smoothed, cfg, batches_fn(),
                             compute_dtype=compute_dtype)
        scales = model_mod.layer_scales(stats_sm)
        qparams = model_mod.quantize(smoothed, qcfg, scales, cfg=cfg)
    elif qcfg.type == "fp8_e4m3" and qcfg.activation_scheme == "static":
        # observer pass: quantize dynamically, run calibration through the
        # QUANTIZED forward, track per-projection input/output absmax
        dyn_cfg = QuantConfig(type="fp8_e4m3", activation_scheme="dynamic")
        dyn_params = model_mod.quantize(smoothed, dyn_cfg, None, cfg=cfg,
                                        ignore=ignore)
        stats_sm = calibrate(model_mod, dyn_params, cfg, batches_fn(),
                             compute_dtype=compute_dtype, qcfg=dyn_cfg)
        observer_scales = model_mod.fp8_observer_scales(stats_sm)
        scales = model_mod.layer_scales(stats_sm)
        qparams = model_mod.quantize(
            smoothed, qcfg, scales, cfg=cfg, ignore=ignore,
            quantize_output=quantize_output, observer_scales=observer_scales)
    else:
        import inspect

        quant_kwargs = {}
        if is_fp8 and "ignore" in inspect.signature(model_mod.quantize).parameters:
            quant_kwargs["ignore"] = ignore
        qparams = model_mod.quantize(smoothed, qcfg, None, cfg=cfg,
                                     **quant_kwargs)

    artifacts = {
        "act_stats_fp": stats_fp,
        "act_stats_smoothed": stats_sm,
        "layer_scales": scales,
        "observer_scales": observer_scales,
        "ignored_projections": sorted(ignore),
        "alpha": alpha,
    }
    return qparams, artifacts


# ---------------------------------------------------------------------------
# Quantized-checkpoint serialization
#
# The analog of save_pretrained + quant_config.json copy
# (ref: smoothquant_model.py:96-99, test_model.py:35-41 load side). Arrays are
# stored in an .npz keyed by pytree path; fp8 dtypes (absent from vanilla
# numpy) round-trip through ml_dtypes views recorded in a manifest — the
# TPU-side replacement for the reference's dtype_byte_size monkeypatch
# (functional/quantization.py:126-136).
# ---------------------------------------------------------------------------

_MANIFEST = "asq_manifest.json"
_WEIGHTS = "asq_weights.npz"              # legacy container (still readable)
_WEIGHTS_ST = "asq_weights.safetensors"   # preferred: fp8/bf16-native,
                                          # loaded via csrc/asq_io.cc


def _flatten(tree, prefix=()) -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    elif tree is None:
        pass
    else:
        out["/".join(prefix)] = tree
    return out


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for key, v in flat.items():
        node = root
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return root


def save_quantized(path: str, params, qcfg: QuantConfig,
                   config_dict: Optional[dict] = None,
                   artifacts: Optional[dict] = None) -> None:
    from .fast_loader import save_safetensors

    os.makedirs(path, exist_ok=True)
    flat = _flatten(jax.device_get(params))
    arrays = {k: np.asarray(v) for k, v in flat.items()}
    save_safetensors(os.path.join(path, _WEIGHTS_ST), arrays,
                     metadata={"format": "asq"})
    manifest = {"dtypes": {}, "version": 2, "container": "safetensors"}
    with open(os.path.join(path, _MANIFEST), "w", encoding="utf-8") as f:
        json.dump(manifest, f)
    save_quant_config(qcfg, os.path.join(path, "quant_config.json"))
    if config_dict is not None:
        with open(os.path.join(path, "config.json"), "w", encoding="utf-8") as f:
            json.dump(config_dict, f, indent=2)
    if artifacts is not None and artifacts.get("layer_scales") is not None:
        scales = {k: np.asarray(v).tolist()
                  for k, v in artifacts["layer_scales"].items()}
        with open(os.path.join(path, "layer_scales.json"), "w", encoding="utf-8") as f:
            json.dump(scales, f)


def load_quantized(path: str):
    """Returns (params, QuantConfig, config_dict-or-None)."""
    with open(os.path.join(path, _MANIFEST), "r", encoding="utf-8") as f:
        manifest = json.load(f)
    st_path = os.path.join(path, _WEIGHTS_ST)
    if os.path.exists(st_path):
        from .fast_loader import load_safetensors

        flat = {k: jnp.asarray(v) for k, v in load_safetensors(st_path).items()}
    else:  # legacy npz container
        import ml_dtypes

        data = np.load(os.path.join(path, _WEIGHTS))
        flat = {}
        for k in data.files:
            a = data[k]
            name = manifest["dtypes"].get(k)
            if name:
                a = a.view(getattr(ml_dtypes, name))
            flat[k] = jnp.asarray(a)
    params = _unflatten(flat)
    from ..quant.config import parse_quant_config

    qcfg = parse_quant_config(os.path.join(path, "quant_config.json"))
    cfg_path = os.path.join(path, "config.json")
    config_dict = None
    if os.path.exists(cfg_path):
        with open(cfg_path, "r", encoding="utf-8") as f:
            config_dict = json.load(f)
    return params, qcfg, config_dict


def load_any_quantized(path: str):
    """Load a quantized checkpoint in EITHER format: this framework's
    native artifact (asq_manifest.json) or a REFERENCE-produced
    save_pretrained artifact (HF state_dict of int8 weights + scale
    buffers + quant_config.json, ref: examples/test_model.py:35-41) — the
    CLIs call this so a reference user's existing checkpoints serve
    directly. Returns (params, QuantConfig, config_dict)."""
    if os.path.exists(os.path.join(path, _MANIFEST)):
        return load_quantized(path)
    qc_path = os.path.join(path, "quant_config.json")
    cfg_path = os.path.join(path, "config.json")
    if os.path.exists(qc_path) and os.path.exists(cfg_path):
        from ..models.registry import get_model_family

        from .hf import load_reference_quantized

        with open(cfg_path, "r", encoding="utf-8") as f:
            config = json.load(f)
        _, family = get_model_family(config)
        params, qcfg = load_reference_quantized(
            path, family, config["num_hidden_layers"])
        return params, qcfg, config
    raise FileNotFoundError(
        f"{path}: neither a native quantized artifact ({_MANIFEST}) nor a "
        "reference-format one (quant_config.json + config.json)")
