"""HuggingFace checkpoint import -> functional params pytrees.

Replaces the reference's reliance on HF ``from_pretrained`` module loading
(ref: utils/utils.py:41-45 build_model_and_tokenizer). Weights come from a
torch state_dict (CPU) or safetensors files; they are transposed to the
[in, out] layout and stacked along the layer axis for ``lax.scan``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
import jax.numpy as jnp


def _to_np(t) -> np.ndarray:
    """torch tensor / np array -> float32 numpy (bf16-safe)."""
    if isinstance(t, np.ndarray):
        return t.astype(np.float32)
    # torch tensor
    return t.detach().to(dtype=__import__("torch").float32).cpu().numpy()


def hf_config_dict(model_path: str) -> Dict[str, Any]:
    """Read config.json (the functional analog of get_config,
    ref: utils/utils.py:13-33; trust_remote_code has no meaning here since
    models are re-implemented natively)."""
    with open(os.path.join(model_path, "config.json"), "r", encoding="utf-8") as f:
        return json.load(f)


def _stack(sd, pattern: str, num_layers: int, transpose: bool) -> jnp.ndarray:
    arrs = []
    for i in range(num_layers):
        a = _to_np(sd[pattern.format(i=i)])
        arrs.append(a.T if transpose else a)
    return jnp.asarray(np.stack(arrs))


def _wb(sd, base: str, num_layers: int, cast):
    """Projection dict with an optional stacked bias (Qwen2 QKV)."""
    p = {"w": cast(_stack(sd, base + ".weight", num_layers, True))}
    if base.format(i=0) + ".bias" in sd:
        p["bias"] = cast(_stack(sd, base + ".bias", num_layers, False))
    return p


def llama_params_from_state_dict(sd: Dict[str, Any], num_layers: int,
                                 dtype=jnp.float32) -> Dict[str, Any]:
    """Map HF Llama (and Qwen2: + QKV biases) names -> stacked layout."""
    def cast(x):
        return x.astype(dtype)

    p = {
        "embed": {"w": cast(jnp.asarray(_to_np(sd["model.embed_tokens.weight"])))},
        "layers": {
            "ln1": {"w": cast(_stack(sd, "model.layers.{i}.input_layernorm.weight",
                                     num_layers, False))},
            "attn": {
                # Qwen2 rides the llama layout with QKV biases
                "q": _wb(sd, "model.layers.{i}.self_attn.q_proj", num_layers,
                         cast),
                "k": _wb(sd, "model.layers.{i}.self_attn.k_proj", num_layers,
                         cast),
                "v": _wb(sd, "model.layers.{i}.self_attn.v_proj", num_layers,
                         cast),
                "o": {"w": cast(_stack(sd, "model.layers.{i}.self_attn.o_proj.weight",
                                       num_layers, True))},
            },
            "ln2": {"w": cast(_stack(
                sd, "model.layers.{i}.post_attention_layernorm.weight",
                num_layers, False))},
            "mlp": {
                "gate": {"w": cast(_stack(sd, "model.layers.{i}.mlp.gate_proj.weight",
                                          num_layers, True))},
                "up": {"w": cast(_stack(sd, "model.layers.{i}.mlp.up_proj.weight",
                                        num_layers, True))},
                "down": {"w": cast(_stack(sd, "model.layers.{i}.mlp.down_proj.weight",
                                          num_layers, True))},
            },
        },
        "final_norm": {"w": cast(jnp.asarray(_to_np(sd["model.norm.weight"])))},
    }
    if "lm_head.weight" in sd:
        p["lm_head"] = {"w": cast(jnp.asarray(_to_np(sd["lm_head.weight"]).T))}
    else:  # tied embeddings
        p["lm_head"] = {"w": cast(jnp.asarray(np.asarray(p["embed"]["w"]).T))}
    return p


def opt_params_from_state_dict(sd: Dict[str, Any], num_layers: int,
                               dtype=jnp.float32) -> Dict[str, Any]:
    """Map HF OPT names -> stacked layout (bias-ful)."""
    def cast(x):
        return x.astype(dtype)

    def stack_wb(wpat, bpat):
        return {
            "w": cast(_stack(sd, wpat, num_layers, True)),
            "b": cast(_stack(sd, bpat, num_layers, False)),
        }

    base = "model.decoder.layers.{i}"
    p = {
        "embed": {"w": cast(jnp.asarray(_to_np(sd["model.decoder.embed_tokens.weight"])))},
        "embed_pos": {"w": cast(jnp.asarray(_to_np(sd["model.decoder.embed_positions.weight"])))},
        "layers": {
            "ln1": stack_wb(f"{base}.self_attn_layer_norm.weight",
                            f"{base}.self_attn_layer_norm.bias"),
            "attn": {
                "q": stack_wb(f"{base}.self_attn.q_proj.weight",
                              f"{base}.self_attn.q_proj.bias"),
                "k": stack_wb(f"{base}.self_attn.k_proj.weight",
                              f"{base}.self_attn.k_proj.bias"),
                "v": stack_wb(f"{base}.self_attn.v_proj.weight",
                              f"{base}.self_attn.v_proj.bias"),
                "o": stack_wb(f"{base}.self_attn.out_proj.weight",
                              f"{base}.self_attn.out_proj.bias"),
            },
            "ln2": stack_wb(f"{base}.final_layer_norm.weight",
                            f"{base}.final_layer_norm.bias"),
            "mlp": {
                "fc1": stack_wb(f"{base}.fc1.weight", f"{base}.fc1.bias"),
                "fc2": stack_wb(f"{base}.fc2.weight", f"{base}.fc2.bias"),
            },
        },
    }
    if "model.decoder.final_layer_norm.weight" in sd:
        p["final_norm"] = {
            "w": cast(jnp.asarray(_to_np(sd["model.decoder.final_layer_norm.weight"]))),
            "b": cast(jnp.asarray(_to_np(sd["model.decoder.final_layer_norm.bias"]))),
        }
    # the reference drops project_in (opt.py:214-224); both are carried here
    if "model.decoder.project_in.weight" in sd:
        p["project_in"] = {"w": cast(jnp.asarray(_to_np(sd["model.decoder.project_in.weight"]).T))}
    if "model.decoder.project_out.weight" in sd:
        p["project_out"] = {"w": cast(jnp.asarray(_to_np(sd["model.decoder.project_out.weight"]).T))}
    if "lm_head.weight" in sd:
        p["lm_head"] = {"w": cast(jnp.asarray(_to_np(sd["lm_head.weight"]).T))}
    else:
        p["lm_head"] = {"w": cast(jnp.asarray(_to_np(sd["model.decoder.embed_tokens.weight"]).T))}
    return p


def baichuan_params_from_state_dict(sd: Dict[str, Any], num_layers: int,
                                    dtype=jnp.float32) -> Dict[str, Any]:
    """Map Baichuan names -> stacked layout. The NormHead lm_head is
    L2-row-normalized here, matching inference-mode NormHead
    (ref: thirdparty/baichuan/modeling_baichuan.py:596-606)."""
    def cast(x):
        return x.astype(dtype)

    base = "model.layers.{i}"
    lm = _to_np(sd["lm_head.weight"])  # [V, D]
    lm = lm / (np.linalg.norm(lm, axis=1, keepdims=True) + 1e-12)
    return {
        "embed": {"w": cast(jnp.asarray(_to_np(sd["model.embed_tokens.weight"])))},
        "layers": {
            "ln1": {"w": cast(_stack(sd, f"{base}.input_layernorm.weight",
                                     num_layers, False))},
            "attn": {
                "wpack": {"w": cast(_stack(sd, f"{base}.self_attn.W_pack.weight",
                                           num_layers, True))},
                "o": {"w": cast(_stack(sd, f"{base}.self_attn.o_proj.weight",
                                       num_layers, True))},
            },
            "ln2": {"w": cast(_stack(
                sd, f"{base}.post_attention_layernorm.weight", num_layers, False))},
            "mlp": {
                "gate": {"w": cast(_stack(sd, f"{base}.mlp.gate_proj.weight",
                                          num_layers, True))},
                "up": {"w": cast(_stack(sd, f"{base}.mlp.up_proj.weight",
                                        num_layers, True))},
                "down": {"w": cast(_stack(sd, f"{base}.mlp.down_proj.weight",
                                          num_layers, True))},
            },
        },
        "final_norm": {"w": cast(jnp.asarray(_to_np(sd["model.norm.weight"])))},
        "lm_head": {"w": cast(jnp.asarray(lm.T))},
    }


def mixtral_params_from_state_dict(sd: Dict[str, Any], num_layers: int,
                                   dtype=jnp.float32,
                                   num_experts: Optional[int] = None
                                   ) -> Dict[str, Any]:
    """Map HF Mixtral names -> stacked layout ([L, E, in, out] experts).
    num_experts defaults to what the checkpoint actually contains (the CLI
    path has no HF config object in hand; a hardcoded 8 broke every
    non-Mixtral-8x7B expert count)."""
    if num_experts is None:
        prefix = "model.layers.0.block_sparse_moe.experts."
        num_experts = len({k[len(prefix):].split(".")[0]
                           for k in sd if k.startswith(prefix)})
        assert num_experts > 0, "no expert weights found in state dict"

    def cast(x):
        return x.astype(dtype)

    base = "model.layers.{i}"

    def stack_experts(proj):
        per_layer = []
        for i in range(num_layers):
            per_exp = [
                _to_np(sd[f"model.layers.{i}.block_sparse_moe.experts.{e}.{proj}.weight"]).T
                for e in range(num_experts)
            ]
            per_layer.append(np.stack(per_exp))
        return cast(jnp.asarray(np.stack(per_layer)))

    p = {
        "embed": {"w": cast(jnp.asarray(_to_np(sd["model.embed_tokens.weight"])))},
        "layers": {
            "ln1": {"w": cast(_stack(sd, f"{base}.input_layernorm.weight",
                                     num_layers, False))},
            "attn": {
                "q": {"w": cast(_stack(sd, f"{base}.self_attn.q_proj.weight",
                                       num_layers, True))},
                "k": {"w": cast(_stack(sd, f"{base}.self_attn.k_proj.weight",
                                       num_layers, True))},
                "v": {"w": cast(_stack(sd, f"{base}.self_attn.v_proj.weight",
                                       num_layers, True))},
                "o": {"w": cast(_stack(sd, f"{base}.self_attn.o_proj.weight",
                                       num_layers, True))},
            },
            "ln2": {"w": cast(_stack(
                sd, f"{base}.post_attention_layernorm.weight", num_layers, False))},
            "moe": {
                "router": {"w": cast(_stack(
                    sd, f"{base}.block_sparse_moe.gate.weight", num_layers, True))},
                "w1": {"w": stack_experts("w1")},
                "w3": {"w": stack_experts("w3")},
                "w2": {"w": stack_experts("w2")},
            },
        },
        "final_norm": {"w": cast(jnp.asarray(_to_np(sd["model.norm.weight"])))},
        "lm_head": {"w": cast(jnp.asarray(_to_np(sd["lm_head.weight"]).T))},
    }
    return p


def gemma_params_from_state_dict(sd, num_layers: int, dtype=jnp.float32):
    """Gemma rides the llama layout after two load-time folds: norm weights
    store 1 + w (HF computes x * (1 + w)) and embeddings absorb the
    sqrt(hidden) scaling — the tied lm_head is built from the UNSCALED
    embedding first, matching HF's unscaled tied head."""
    import numpy as np

    p = llama_params_from_state_dict(sd, num_layers, dtype)
    lay = p["layers"]
    lay["ln1"]["w"] = lay["ln1"]["w"] + 1.0
    lay["ln2"]["w"] = lay["ln2"]["w"] + 1.0
    p["final_norm"]["w"] = p["final_norm"]["w"] + 1.0
    hidden = p["embed"]["w"].shape[1]
    p["embed"]["w"] = p["embed"]["w"] * np.sqrt(np.float32(hidden))
    return p


_LOADERS = {
    "llama": llama_params_from_state_dict,
    "gemma": gemma_params_from_state_dict,
    "transformers": opt_params_from_state_dict,  # the reference's OPT family tag
    "opt": opt_params_from_state_dict,
    "baichuan": baichuan_params_from_state_dict,
    "mixtral": mixtral_params_from_state_dict,
}


def register_loader(family: str, fn) -> None:
    _LOADERS[family] = fn


def load_hf_params(model_path_or_sd, family: str, num_layers: int,
                   dtype=jnp.float32, model_path: Optional[str] = None):
    """Load params from a state_dict (dict) or a checkpoint directory."""
    if isinstance(model_path_or_sd, dict):
        sd = model_path_or_sd
    else:
        sd = load_state_dict(model_path_or_sd)
    return _LOADERS[family](sd, num_layers, dtype=dtype)


def load_state_dict(model_path: str) -> Dict[str, Any]:
    """Read all safetensors/bin shards in an HF checkpoint directory."""
    sd: Dict[str, Any] = {}
    entries = sorted(os.listdir(model_path))
    st_files = [e for e in entries if e.endswith(".safetensors")]
    bin_files = [e for e in entries if e.endswith(".bin") and "pytorch_model" in e]
    if st_files:
        from .fast_loader import load_safetensors

        for fname in st_files:
            sd.update(load_safetensors(os.path.join(model_path, fname)))
    elif bin_files:
        import torch

        for fname in bin_files:
            sd.update(torch.load(os.path.join(model_path, fname),
                                 map_location="cpu", weights_only=True))
    else:
        raise FileNotFoundError(f"no model weights found under {model_path}")
    return sd


# ---------------------------------------------------------------------------
# Reference-produced QUANTIZED checkpoints (cross-implementation interop)
#
# The reference's deliverable is an HF save_pretrained state_dict holding
# int8 `weight` [out, in] buffers plus f32 `dequant_scale` (and, for
# per-tensor o/down/fc2, `quant_scale`) scalars per projection, with norm
# weights pre-folded for per-tensor consumers
# (ref: examples/smoothquant_model.py:96-99 save side;
#  examples/test_model.py:35-41 load contract;
#  layers/nn/linear.py:35-129,248-329 buffer names/semantics).
# These mappers consume such an artifact directly into this framework's
# stacked params pytrees — quantize with the reference, serve on TPU.
# ---------------------------------------------------------------------------


def _to_np_raw(t) -> np.ndarray:
    """dtype-preserving tensor -> numpy (int8 stays int8)."""
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def _qstack(sd, pattern: str, num_layers: int, transpose: bool) -> jnp.ndarray:
    arrs = []
    for i in range(num_layers):
        a = _to_np_raw(sd[pattern.format(i=i)])
        arrs.append(a.T if transpose else a)
    return jnp.asarray(np.stack(arrs))


def _qproj(sd, base: str, num_layers: int):
    """One reference W8A8 projection -> {w int8 [L,in,out], dequant_scale
    [L], quant_scale [L]?, bias [L,out]?}."""
    p = {
        "w": _qstack(sd, base + ".weight", num_layers, True),
        "dequant_scale": _qstack(sd, base + ".dequant_scale", num_layers,
                                 False).astype(jnp.float32),
    }
    assert p["w"].dtype == jnp.int8, f"{base}: expected int8 weights"
    if base.format(i=0) + ".quant_scale" in sd:
        p["quant_scale"] = _qstack(sd, base + ".quant_scale", num_layers,
                                   False).astype(jnp.float32)
    if base.format(i=0) + ".bias" in sd:
        p["bias"] = _qstack(sd, base + ".bias", num_layers,
                            False).astype(jnp.float32)
    return p


def quantized_llama_params_from_state_dict(sd: Dict[str, Any],
                                           num_layers: int,
                                           dtype=jnp.float32
                                           ) -> Dict[str, Any]:
    """Reference int8 Llama artifact -> this framework's quantized pytree.
    Norm weights arrive pre-folded (QuantizedLlamaRMSNorm.from_float,
    ref: models/llama.py:27-37) so they map through unchanged."""
    def cast(x):
        return x.astype(dtype)

    base = "model.layers.{i}"
    p = {
        "embed": {"w": cast(jnp.asarray(_to_np(sd["model.embed_tokens.weight"])))},
        "layers": {
            "ln1": {"w": cast(_stack(sd, base + ".input_layernorm.weight",
                                     num_layers, False))},
            "attn": {
                "q": _qproj(sd, base + ".self_attn.q_proj", num_layers),
                "k": _qproj(sd, base + ".self_attn.k_proj", num_layers),
                "v": _qproj(sd, base + ".self_attn.v_proj", num_layers),
                "o": _qproj(sd, base + ".self_attn.o_proj", num_layers),
            },
            "ln2": {"w": cast(_stack(
                sd, base + ".post_attention_layernorm.weight",
                num_layers, False))},
            "mlp": {
                "gate": _qproj(sd, base + ".mlp.gate_proj", num_layers),
                "up": _qproj(sd, base + ".mlp.up_proj", num_layers),
                "down": _qproj(sd, base + ".mlp.down_proj", num_layers),
            },
        },
        "final_norm": {"w": cast(jnp.asarray(_to_np(sd["model.norm.weight"])))},
    }
    if "lm_head.weight" in sd:
        p["lm_head"] = {"w": cast(jnp.asarray(_to_np(sd["lm_head.weight"]).T))}
    else:
        p["lm_head"] = {"w": cast(jnp.asarray(np.asarray(p["embed"]["w"]).T))}
    return p


def quantized_opt_params_from_state_dict(sd: Dict[str, Any], num_layers: int,
                                         dtype=jnp.float32) -> Dict[str, Any]:
    """Reference int8 OPT artifact -> quantized pytree (bias-ful linears;
    LayerNorm weight AND bias pre-folded, ref: opt.py:20-29)."""
    def cast(x):
        return x.astype(dtype)

    base = "model.decoder.layers.{i}"

    def ln(pat):
        return {"w": cast(_stack(sd, pat + ".weight", num_layers, False)),
                "b": cast(_stack(sd, pat + ".bias", num_layers, False))}

    p = {
        "embed": {"w": cast(jnp.asarray(_to_np(
            sd["model.decoder.embed_tokens.weight"])))},
        "embed_pos": {"w": cast(jnp.asarray(_to_np(
            sd["model.decoder.embed_positions.weight"])))},
        "layers": {
            "ln1": ln(base + ".self_attn_layer_norm"),
            "attn": {
                "q": _qproj(sd, base + ".self_attn.q_proj", num_layers),
                "k": _qproj(sd, base + ".self_attn.k_proj", num_layers),
                "v": _qproj(sd, base + ".self_attn.v_proj", num_layers),
                "o": _qproj(sd, base + ".self_attn.out_proj", num_layers),
            },
            "ln2": ln(base + ".final_layer_norm"),
            "mlp": {
                "fc1": _qproj(sd, base + ".fc1", num_layers),
                "fc2": _qproj(sd, base + ".fc2", num_layers),
            },
        },
        "final_norm": {
            "w": cast(jnp.asarray(_to_np(
                sd["model.decoder.final_layer_norm.weight"]))),
            "b": cast(jnp.asarray(_to_np(
                sd["model.decoder.final_layer_norm.bias"]))),
        },
        "lm_head": {"w": cast(jnp.asarray(_to_np(sd["lm_head.weight"]).T))},
    }
    for name in ("project_in", "project_out"):
        key = f"model.decoder.{name}.weight"
        if key in sd:
            p[name] = {"w": cast(jnp.asarray(_to_np(sd[key]).T))}
    return p


def quantized_baichuan_params_from_state_dict(sd: Dict[str, Any],
                                              num_layers: int,
                                              dtype=jnp.float32
                                              ) -> Dict[str, Any]:
    """Reference int8 Baichuan artifact -> quantized pytree. The artifact
    stores W_pack as ONE int8 [3D, D] weight with three per-section scalars
    q/k/v_dequant_scale (ref: layers/nn/linear.py:132-149,
    models/baichuan.py:85-105); this framework's wpack wants the transposed
    [D, 3D] weight with a [3D] column-scale vector, so each section scalar
    repeats D times. RMSNorm weights arrive pre-folded
    (Int8BaichuanRMSNorm.from_float, ref: models/baichuan.py:49-59) and the
    raw NormHead lm_head is row-normalized at load like the fp mapper."""
    def cast(x):
        return x.astype(dtype)

    base = "model.layers.{i}"
    wp = _qstack(sd, base + ".self_attn.W_pack.weight", num_layers, True)
    assert wp.dtype == jnp.int8
    D = wp.shape[1]
    sec = jnp.stack(
        [_qstack(sd, base + f".self_attn.W_pack.{s}_dequant_scale",
                 num_layers, False).astype(jnp.float32)
         for s in ("q", "k", "v")], axis=1)          # [L, 3]
    lm = _to_np(sd["lm_head.weight"])                 # raw NormHead rows
    lm = lm / (np.linalg.norm(lm, axis=1, keepdims=True) + 1e-12)
    return {
        "embed": {"w": cast(jnp.asarray(_to_np(
            sd["model.embed_tokens.weight"])))},
        "layers": {
            "ln1": {"w": cast(_stack(sd, base + ".input_layernorm.weight",
                                     num_layers, False))},
            "attn": {
                "wpack": {"w": wp,
                          "dequant_scale": jnp.repeat(sec, D, axis=1)},
                "o": _qproj(sd, base + ".self_attn.o_proj", num_layers),
            },
            "ln2": {"w": cast(_stack(
                sd, base + ".post_attention_layernorm.weight",
                num_layers, False))},
            "mlp": {
                "gate": _qproj(sd, base + ".mlp.gate_proj", num_layers),
                "up": _qproj(sd, base + ".mlp.up_proj", num_layers),
                "down": _qproj(sd, base + ".mlp.down_proj", num_layers),
            },
        },
        "final_norm": {"w": cast(jnp.asarray(_to_np(sd["model.norm.weight"])))},
        "lm_head": {"w": cast(jnp.asarray(lm.T))},
    }


def quantized_mixtral_params_from_state_dict(sd: Dict[str, Any],
                                             num_layers: int,
                                             dtype=jnp.float32,
                                             num_experts: Optional[int] = None
                                             ) -> Dict[str, Any]:
    """Reference int8 Mixtral artifact -> quantized pytree: per-expert int8
    weights stack to [L, E, in, out] with [L, E] dequant (and w2 quant)
    scales; the router stays fp (ref: models/mixtral.py:139-140 'we do not
    apply quant to gate'); norms pre-folded (mixtral.py:211-218)."""
    def cast(x):
        return x.astype(dtype)

    base = "model.layers.{i}"
    if num_experts is None:  # infer from the artifact's key space
        num_experts = 1 + max(
            int(k.split(".experts.")[1].split(".")[0])
            for k in sd if ".experts." in k)

    def qexperts(proj: str, scaled: bool):
        eb = base + ".block_sparse_moe.experts.{e}." + proj
        ws, dq, qs = [], [], []
        for i in range(num_layers):
            ws.append(np.stack([
                _to_np_raw(sd[eb.format(i=i, e=e) + ".weight"]).T
                for e in range(num_experts)]))
            dq.append([float(_to_np_raw(sd[eb.format(i=i, e=e)
                                           + ".dequant_scale"]))
                       for e in range(num_experts)])
            if scaled:
                qs.append([float(_to_np_raw(sd[eb.format(i=i, e=e)
                                               + ".quant_scale"]))
                           for e in range(num_experts)])
        p = {"w": jnp.asarray(np.stack(ws)),
             "dequant_scale": jnp.asarray(dq, jnp.float32)}
        assert p["w"].dtype == jnp.int8
        if scaled:
            p["quant_scale"] = jnp.asarray(qs, jnp.float32)
        return p

    return {
        "embed": {"w": cast(jnp.asarray(_to_np(
            sd["model.embed_tokens.weight"])))},
        "layers": {
            "ln1": {"w": cast(_stack(sd, base + ".input_layernorm.weight",
                                     num_layers, False))},
            "attn": {
                "q": _qproj(sd, base + ".self_attn.q_proj", num_layers),
                "k": _qproj(sd, base + ".self_attn.k_proj", num_layers),
                "v": _qproj(sd, base + ".self_attn.v_proj", num_layers),
                "o": _qproj(sd, base + ".self_attn.o_proj", num_layers),
            },
            "ln2": {"w": cast(_stack(
                sd, base + ".post_attention_layernorm.weight",
                num_layers, False))},
            "moe": {
                "router": {"w": cast(_stack(
                    sd, base + ".block_sparse_moe.gate.weight",
                    num_layers, True))},
                "w1": qexperts("w1", False),
                "w3": qexperts("w3", False),
                "w2": qexperts("w2", True),
            },
        },
        "final_norm": {"w": cast(jnp.asarray(_to_np(sd["model.norm.weight"])))},
        "lm_head": {"w": cast(jnp.asarray(_to_np(sd["lm_head.weight"]).T))},
    }


_QUANTIZED_LOADERS = {
    "llama": quantized_llama_params_from_state_dict,
    "transformers": quantized_opt_params_from_state_dict,  # reference's OPT tag
    "opt": quantized_opt_params_from_state_dict,
    "baichuan": quantized_baichuan_params_from_state_dict,
    "mixtral": quantized_mixtral_params_from_state_dict,
}


def load_reference_quantized(model_path: str, family: str, num_layers: int,
                             dtype=jnp.float32):
    """Load a reference-produced quantized checkpoint directory: weights via
    the family mapper + its quant_config.json. Returns (params, QuantConfig)."""
    from ..quant.config import parse_quant_config

    sd = load_state_dict(model_path)
    params = _QUANTIZED_LOADERS[family](sd, num_layers, dtype=dtype)
    qcfg = parse_quant_config(os.path.join(model_path, "quant_config.json"))
    return params, qcfg
