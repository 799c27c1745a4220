"""Tensor-parallel sharding rules for the model zoo.

Standard Megatron-style TP expressed as NamedShardings (SURVEY.md §2.6 plan):
  - qkv / gate / up: column-parallel — output features sharded over "model"
  - o / down:        row-parallel   — input features sharded over "model";
                     XLA inserts the psum on the output automatically
  - lm_head:         column-parallel over vocab
  - norms, scalar quant scales: replicated
  - KV cache: heads sharded over "model" when divisible, batch over "data"

Weights are [L, in, out]; int8 weights shard identically to their float
counterparts (per-tensor scales are scalars per layer — replicated — so
sharding never splits a quantization group).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _maybe(axis_size: int, dim_size: int, axis_name: str):
    """Shard only when divisible — e.g. few-KV-head GQA models replicate KV
    heads on wide model axes instead of failing."""
    return axis_name if dim_size % axis_size == 0 and axis_size > 1 else None


def llama_param_specs(cfg, mesh: Mesh) -> Dict[str, Any]:
    m = mesh.shape.get("model", 1)
    kv_heads = cfg.num_key_value_heads

    def proj(spec_in, spec_out):
        """Specs for one projection dict: w [L, in, out] (+ scale leaves)."""
        return {
            "w": P(None, spec_in, spec_out),
            "dequant_scale": P(None),
            "quant_scale": P(None),
            "w_scale": P(None),
            "input_scale": P(None),
            "bias": P(None, spec_out),
        }

    col = _maybe(m, cfg.num_attention_heads * cfg.head_dim, "model")
    kv_col = _maybe(m, kv_heads * cfg.head_dim, "model")
    ffn_col = _maybe(m, cfg.intermediate_size, "model")
    vocab_col = _maybe(m, cfg.vocab_size, "model")

    return {
        "embed": {"w": P(None, None)},
        "layers": {
            "ln1": {"w": P(None, None)},
            "attn": {
                "q": proj(None, col),
                "k": proj(None, kv_col),
                "v": proj(None, kv_col),
                "o": proj(col, None),
            },
            "ln2": {"w": P(None, None)},
            "mlp": {
                "gate": proj(None, ffn_col),
                "up": proj(None, ffn_col),
                "down": proj(ffn_col, None),
            },
        },
        "final_norm": {"w": P(None)},
        "lm_head": {"w": P(None, vocab_col)},
    }


def kv_cache_specs(cfg, mesh: Mesh):
    """KVCacheLayer leaves [L, B, S, H_kv, Dh]."""
    from ..models.common import KVCacheLayer

    m = mesh.shape.get("model", 1)
    d = mesh.shape.get("data", 1)
    head = _maybe(m, cfg.num_key_value_heads, "model")
    batch = "data" if d > 1 else None
    spec = P(None, batch, None, head, None)
    return KVCacheLayer(k=spec, v=spec)


def _prune_specs(specs, params):
    """Drop spec leaves that have no matching param leaf (e.g. quant_scale on
    float models) and default missing ones to replicated."""
    if isinstance(params, dict):
        out = {}
        for k, v in params.items():
            sub = specs.get(k, {}) if isinstance(specs, dict) else {}
            out[k] = _prune_specs(sub, v)
        return out
    if isinstance(specs, dict) or specs is None:
        return P()  # param leaf with no spec -> replicate
    return specs


def shard_params(params, mesh: Mesh, specs):
    """device_put params with NamedShardings derived from specs (pruned to
    the actual param structure)."""
    pruned = _prune_specs(specs, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, pruned
    )


def prune_specs_for(params, specs):
    return _prune_specs(specs, params)
