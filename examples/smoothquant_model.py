"""Quantize a model: calibrate -> smooth -> quantize -> save.

TPU-native analog of the reference CLI (ref: examples/smoothquant_model.py:13-99)
with the same flags and the same quant_config.json contract.

Usage:
  python examples/smoothquant_model.py --model-path /ckpts/llama-2-7b \
      --generate-scale --quantize-model --dataset-path val.jsonl \
      --model-output /out
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True,
                   help="HF checkpoint dir (config.json + safetensors)")
    p.add_argument("--dataset-path", default="", help="jsonl calibration set")
    p.add_argument("--generate-scale", action="store_true")
    p.add_argument("--quantize-model", action="store_true")
    p.add_argument("--scale-output", default="scales/act_scales.pkl")
    p.add_argument("--scale-input", default="scales/act_scales.pkl")
    p.add_argument("--num-samples", type=int, default=512)
    p.add_argument("--seq-len", type=int, default=512)
    p.add_argument("--smooth-strength", type=float, default=0.5)
    p.add_argument("--model-output", default="quantized_model")
    p.add_argument("--type", default="int8",
                   choices=["int8", "fp8", "fp8_e4m3", "fp8_e5m2", "int4"])
    p.add_argument("--activation-scheme", default="dynamic",
                   choices=["static", "dynamic"])
    p.add_argument("--tokenizer-path", default=None)
    p.add_argument("--ignore-patterns", nargs="*", default=["re:.*lm_head"],
                   help="fp8: projections to exempt (literal or re:regex; "
                        "ref calibration.py:259-278)")
    p.add_argument("--group-size", type=int, default=128,
                   help="int4: input rows per weight-scale group")
    p.add_argument("--quantize-output", action="store_true",
                   help="fp8 static: observer-tracked output re-quantization")
    return p.parse_args()


def main():
    from autosmoothquant_tpu.calibrate.calibrate import calibrate
    from autosmoothquant_tpu.convert.hf import hf_config_dict, load_hf_params
    from autosmoothquant_tpu.convert.pipeline import save_quantized
    from autosmoothquant_tpu.models.registry import get_model_family
    from autosmoothquant_tpu.quant.config import QuantConfig
    from autosmoothquant_tpu.utils.datautils import load_json_text, random_windows

    args = parse_args()
    config = hf_config_dict(args.model_path)
    model_mod, family = get_model_family(config)
    cfg = model_mod.config_from_hf(config) if hasattr(model_mod, "config_from_hf") \
        else model_mod.LlamaConfig.from_hf(config)
    params = load_hf_params(args.model_path, family, cfg.num_hidden_layers,
                            dtype=jnp.float32)

    if not args.dataset_path or not os.path.exists(args.dataset_path):
        print(f"Cannot find the dataset at {args.dataset_path}")
        print("Please download the dataset and put the validation set at the path")
        raise FileNotFoundError(args.dataset_path)

    from autosmoothquant_tpu.utils.tokenizer import load_tokenizer

    tokenizer = load_tokenizer(args.tokenizer_path or args.model_path)
    stream = load_json_text(args.dataset_path, tokenizer)
    windows = random_windows(stream, args.num_samples, args.seq_len, seed=42)

    def batches():
        for i in range(0, len(windows), 8):
            b = windows[i:i + 8]
            if len(b) == 8:
                yield b

    if args.generate_scale:
        stats = calibrate(model_mod, params, cfg, batches())
        os.makedirs(os.path.dirname(args.scale_output) or ".", exist_ok=True)
        with open(args.scale_output, "wb") as f:
            pickle.dump({k: np.asarray(v) for k, v in stats.items()}, f)
        print(f"saved act scales -> {args.scale_output}")

    if args.quantize_model:
        with open(args.scale_input, "rb") as f:
            stats = pickle.load(f)
        smoothed = model_mod.smooth(params, stats, args.smooth_strength)

        qc_path = os.path.join(args.model_path, "quant_config.json")
        raw = json.load(open(qc_path)) if os.path.exists(qc_path) else {}
        if args.type == "int4" and "group_size" not in raw:
            raw["group_size"] = args.group_size
        qcfg = QuantConfig.from_dict(raw, default_type=args.type,
                                     default_scheme=args.activation_scheme)

        from autosmoothquant_tpu.convert.pipeline import resolve_ignore_keys

        is_fp8 = qcfg.type in ("fp8_e4m3", "fp8_e5m2")
        ignore = resolve_ignore_keys(model_mod, cfg,
                                     tuple(args.ignore_patterns)) \
            if is_fp8 else frozenset()
        scales = None
        if qcfg.is_int8:
            stats_sm = calibrate(model_mod, smoothed, cfg, batches())
            scales = model_mod.layer_scales(stats_sm)
            qparams = model_mod.quantize(smoothed, qcfg, scales, cfg=cfg)
        elif qcfg.type == "fp8_e4m3" and qcfg.activation_scheme == "static":
            # observer pass THROUGH the dynamically-quantized model
            # (ref quantize_activations_fp8, calibration.py:292-338)
            dyn_cfg = QuantConfig(type="fp8_e4m3", activation_scheme="dynamic")
            dyn_params = model_mod.quantize(smoothed, dyn_cfg, None, cfg=cfg,
                                            ignore=ignore)
            stats_obs = calibrate(model_mod, dyn_params, cfg, batches(),
                                  qcfg=dyn_cfg)
            observer_scales = model_mod.fp8_observer_scales(stats_obs)
            scales = model_mod.layer_scales(stats_obs)
            qparams = model_mod.quantize(
                smoothed, qcfg, scales, cfg=cfg, ignore=ignore,
                quantize_output=args.quantize_output,
                observer_scales=observer_scales)
        else:
            import inspect

            kw = {"ignore": ignore} if is_fp8 and "ignore" in inspect.signature(
                model_mod.quantize).parameters else {}
            qparams = model_mod.quantize(smoothed, qcfg, None, cfg=cfg, **kw)
        suffix = {"int8": "smoothquant-int8",
                  "fp8_e4m3": f"smoothquant-fp8-e4m3-{qcfg.activation_scheme}",
                  "fp8_e5m2": "smoothquant-fp8-e5m2",
                  "int4": f"smoothquant-int4-g{qcfg.group_size}"}[qcfg.type]
        out = Path(args.model_output) / f"{Path(args.model_path).name}-{suffix}"
        save_quantized(str(out), qparams, qcfg, config_dict=config,
                       artifacts={"layer_scales": scales})
        print(f"saved quantized model -> {out}")


if __name__ == "__main__":
    main()
