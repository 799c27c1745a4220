"""Run the REFERENCE implementation's CPU-capable quantize path as a parity
oracle, producing a reference-format quantized artifact this framework then
loads (convert/hf.py:load_reference_quantized).

The reference's calibrate -> smooth -> collect-static-scales ->
from_float_to_int8 -> save_pretrained flow contains no CUDA GEMM
(ref: examples/smoothquant_model.py:40-99; the GEMM is only in forward,
layers/nn/linear.py:103), so it runs on CPU torch here. Two shims make the
snapshot importable in this environment:

  * ``autosmoothquant._CUDA`` is stubbed (the extension is never built;
    from_float never touches it).
  * The snapshot borrows private HF symbols removed in newer transformers
    (e.g. LlamaAttention._init_rope) at class-body level; missing ones get
    raising placeholders — they are generation-path only, never used by the
    quantize flow.

This module contains NO reference code — it imports and drives the
reference as an external library, exactly like its own CLI does.
"""

from __future__ import annotations

import json
import os
import sys
import types

REFERENCE = "/root/reference"


def _install_shims():
    import re
    import pathlib

    if "autosmoothquant._CUDA" not in sys.modules:
        stub = types.ModuleType("autosmoothquant._CUDA")

        class I8CUGEMM:  # forward-path only; quantize/save never calls it
            pass

        stub.I8CUGEMM = I8CUGEMM
        sys.modules["autosmoothquant._CUDA"] = stub
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    def _placeholder(self, *a, **k):
        raise NotImplementedError("legacy-transformers symbol (shimmed)")

    from transformers.models.llama import modeling_llama as ml
    from transformers.models.mixtral import modeling_mixtral as mx
    from transformers.models.opt import modeling_opt as mo

    mods = {"Llama": ml, "OPT": mo, "Mixtral": mx}
    pat = re.compile(r"=\s*(Llama|OPT|Mixtral)(\w+)\.(\w+)")
    for f in ("llama.py", "opt.py", "mixtral.py"):
        src = pathlib.Path(
            f"{REFERENCE}/autosmoothquant/models/{f}").read_text()
        for fam, cls, attr in pat.findall(src):
            hfcls = getattr(mods[fam], fam + cls, None)
            if hfcls is not None and not hasattr(hfcls, attr):
                setattr(hfcls, attr, _placeholder)

    # the reference's Int8MixtralAttention constructs
    # MixtralRotaryEmbedding(head_dim, max_position_embeddings=, base=) —
    # the legacy positional signature removed in newer transformers (now
    # config-only). Adapt: legacy args synthesize an equivalent config;
    # config-style calls pass through, so the FLOAT model is unaffected.
    if not getattr(mx.MixtralRotaryEmbedding, "_asq_legacy_shim", False):
        orig_rope = mx.MixtralRotaryEmbedding
        from transformers.models.mixtral.configuration_mixtral import (
            MixtralConfig as _MxCfg)

        class _CompatRotary(orig_rope):
            _asq_legacy_shim = True

            def __init__(self, dim=None, max_position_embeddings=2048,
                         base=10000.0, device=None, config=None):
                if config is None:
                    # head_dim == hidden_size when num_heads == 1
                    config = _MxCfg(
                        hidden_size=dim, num_attention_heads=1,
                        max_position_embeddings=max_position_embeddings,
                        rope_theta=base)
                super().__init__(config=config, device=device)

        mx.MixtralRotaryEmbedding = _CompatRotary


def load_reference():
    """Import the reference package (shimmed); returns its module handles."""
    _install_shims()
    import autosmoothquant.models.llama as ref_llama
    import autosmoothquant.models.opt as ref_opt
    import autosmoothquant.quantize.calibration as ref_calib
    import autosmoothquant.quantize.smooth as ref_smooth

    return types.SimpleNamespace(llama=ref_llama, opt=ref_opt,
                                 calibration=ref_calib, smooth=ref_smooth)


class IdTokenizer:
    """Tokenizer stub for the reference's dataset loop: texts are
    space-separated token-id strings (the calib corpus is synthetic ids)."""

    def __call__(self, text, return_tensors="pt", max_length=512,
                 truncation=True):
        import torch

        ids = [int(t) for t in text.split()][:max_length]
        return types.SimpleNamespace(input_ids=torch.tensor([ids]))


def write_calib_jsonl(path: str, batches) -> int:
    """Serialize int32 [B, T] calibration batches as the JSONL dataset the
    reference's load_dataset('json', ...) loop consumes. Returns the doc
    count (= num_samples to request)."""
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        for batch in batches:
            for row in batch:
                f.write(json.dumps(
                    {"text": " ".join(str(int(t)) for t in row)}) + "\n")
                n += 1
    return n


def make_llama_artifact(outdir: str, hf_model, calib_batches,
                        quant_config=None, alpha: float = 0.5) -> dict:
    """Drive the reference quantize CLI flow on an HF Llama model
    (ref: examples/smoothquant_model.py:42-99): get_act_scales -> smooth_lm
    -> get_static_decoder_layer_scales -> from_float_to_int8 ->
    save_pretrained + quant_config.json. Mutates hf_model in place (the
    reference smooths in place); pass a throwaway copy."""
    ref = load_reference()
    os.makedirs(outdir, exist_ok=True)
    if not getattr(hf_model.config, "architectures", None):
        # freshly-constructed (not from_pretrained) models carry no
        # architectures list; the reference's _MODEL_TYPE lookup needs it
        hf_model.config.architectures = ["LlamaForCausalLM"]
    qc = dict(quant_config or {"qkv": "per-tensor", "out": "per-tensor",
                               "fc1": "per-tensor", "fc2": "per-tensor",
                               "type": "int8"})
    ds_path = os.path.join(outdir, "calib.jsonl")
    n = write_calib_jsonl(ds_path, calib_batches)
    tok = IdTokenizer()

    act_scales = ref.calibration.get_act_scales(
        hf_model, tok, ds_path, num_samples=n, seq_len=4096)
    ref.smooth.smooth_lm(hf_model, act_scales, alpha)
    layer_scales, _ = ref.calibration.get_static_decoder_layer_scales(
        hf_model, tok, ds_path, num_samples=n, seq_len=4096,
        model_type="llama")
    qmodel = ref.llama.QuantizedLlamaForCausalLM.from_float_to_int8(
        hf_model, layer_scales, qc)
    qmodel.save_pretrained(outdir, safe_serialization=True)
    with open(os.path.join(outdir, "quant_config.json"), "w",
              encoding="utf-8") as f:
        json.dump(qc, f)  # ref: smoothquant_model.py:96-99
    return {"layer_scales": layer_scales, "act_scales": act_scales}


def make_baichuan_artifact(outdir: str, hf_model, calib_batches,
                           quant_config=None, alpha: float = 0.5) -> dict:
    """Drive the reference quantize flow on the VENDORED Baichuan torch
    model (ref: thirdparty/baichuan/modeling_baichuan.py via
    models/baichuan.py:535-575 Int8BaichuanForCausalLM.from_float) —
    W_pack per-section scales, pre-folded RMSNorms, raw NormHead."""
    ref = load_reference()
    import autosmoothquant.models.baichuan as ref_baichuan

    os.makedirs(outdir, exist_ok=True)
    hf_model.config.architectures = ["BaichuanForCausalLM"]
    qc = dict(quant_config or {"qkv": "per-tensor", "out": "per-tensor",
                               "fc1": "per-tensor", "fc2": "per-tensor",
                               "type": "int8"})
    ds_path = os.path.join(outdir, "calib.jsonl")
    n = write_calib_jsonl(ds_path, calib_batches)
    tok = IdTokenizer()
    act_scales = ref.calibration.get_act_scales(
        hf_model, tok, ds_path, num_samples=n, seq_len=4096)
    ref.smooth.smooth_lm(hf_model, act_scales, alpha)
    layer_scales, _ = ref.calibration.get_static_decoder_layer_scales(
        hf_model, tok, ds_path, num_samples=n, seq_len=4096,
        model_type="baichuan")
    qmodel = ref_baichuan.Int8BaichuanForCausalLM.from_float(
        hf_model, layer_scales, qc)
    qmodel.save_pretrained(outdir, safe_serialization=True)
    with open(os.path.join(outdir, "quant_config.json"), "w",
              encoding="utf-8") as f:
        json.dump(qc, f)
    return {"layer_scales": layer_scales, "act_scales": act_scales}


def make_mixtral_artifact(outdir: str, hf_model, calib_batches,
                          quant_config=None, alpha: float = 0.5) -> dict:
    """Drive the reference quantize flow on an HF Mixtral model
    (ref: models/mixtral.py:253-296 Int8MixtralForCausalLM.from_float):
    all-experts calibration (top_k widened, calibration.py:27-36),
    per-expert w2 scales, fp router."""
    ref = load_reference()
    import autosmoothquant.models.mixtral as ref_mixtral

    os.makedirs(outdir, exist_ok=True)
    if not getattr(hf_model.config, "architectures", None):
        hf_model.config.architectures = ["MixtralForCausalLM"]
    qc = dict(quant_config or {"qkv": "per-tensor", "out": "per-tensor",
                               "fc1": "per-tensor", "fc2": "per-tensor",
                               "type": "int8"})
    ds_path = os.path.join(outdir, "calib.jsonl")
    n = write_calib_jsonl(ds_path, calib_batches)
    tok = IdTokenizer()
    act_scales = ref.calibration.get_act_scales(
        hf_model, tok, ds_path, num_samples=n, seq_len=4096)
    ref.smooth.smooth_lm(hf_model, act_scales, alpha)
    layer_scales, _ = ref.calibration.get_static_decoder_layer_scales(
        hf_model, tok, ds_path, num_samples=n, seq_len=4096,
        model_type="mixtral")
    qmodel = ref_mixtral.Int8MixtralForCausalLM.from_float(
        hf_model, layer_scales, qc)
    qmodel.save_pretrained(outdir, safe_serialization=True)
    with open(os.path.join(outdir, "quant_config.json"), "w",
              encoding="utf-8") as f:
        json.dump(qc, f)
    return {"layer_scales": layer_scales, "act_scales": act_scales}
