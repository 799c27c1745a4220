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
        """Specs for one projection dict: w [L, in, out] (+ scale leaves).
        For int4 the same specs shard packed bytes [L, K/2, out] — columns
        follow spec_out; row sharding splits packed rows (the shard_map
        wrapper in models/common.int4_matmul_tp consumes them). int4 group
        scales [L, K/g, out] follow their columns; row-parallel scales stay
        replicated (their split-K plane rows are non-contiguous per shard)."""
        return {
            "w": P(None, spec_in, spec_out),
            "dequant_scale": P(None),
            "quant_scale": P(None),
            "w_scale": P(None),
            "input_scale": P(None),
            "w_scales": P(None, None, spec_out),
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


def opt_param_specs(cfg, mesh: Mesh) -> Dict[str, Any]:
    """OPT: bias-ful projections; LayerNorm + positional embeddings
    replicated; q/k/v/fc1 column-parallel, o/fc2 row-parallel."""
    m = mesh.shape.get("model", 1)

    def proj(spec_in, spec_out):
        return {
            "w": P(None, spec_in, spec_out),
            "b": P(None, spec_out),
            "bias": P(None, spec_out),
            "dequant_scale": P(None),
            "quant_scale": P(None),
            "w_scales": P(None, None, spec_out),
        }

    col = _maybe(m, cfg.hidden_size, "model")
    ffn_col = _maybe(m, cfg.ffn_dim, "model")
    vocab_col = _maybe(m, cfg.vocab_size, "model")
    norm = {"w": P(None, None), "b": P(None, None)}
    return {
        "embed": {"w": P(None, None)},
        "embed_pos": {"w": P(None, None)},
        "project_in": {"w": P(None, None)},
        "project_out": {"w": P(None, None)},
        "layers": {
            "ln1": norm,
            "attn": {"q": proj(None, col), "k": proj(None, col),
                     "v": proj(None, col), "o": proj(col, None)},
            "ln2": norm,
            "mlp": {"fc1": proj(None, ffn_col), "fc2": proj(ffn_col, None)},
        },
        "final_norm": {"w": P(None), "b": P(None)},
        "lm_head": {"w": P(None, vocab_col)},
    }


def baichuan_param_specs(cfg, mesh: Mesh) -> Dict[str, Any]:
    """Baichuan: W_pack [L, D, 3D] column-parallel over the fused output dim
    (each q/k/v section splits evenly when 3D % model == 0); the [3D]
    dequant vector shards identically so scales follow their columns."""
    m = mesh.shape.get("model", 1)
    col3 = _maybe(m, cfg.hidden_size, "model")  # per-section divisibility
    col = _maybe(m, cfg.hidden_size, "model")
    ffn_col = _maybe(m, cfg.intermediate_size, "model")
    vocab_col = _maybe(m, cfg.vocab_size, "model")
    return {
        "embed": {"w": P(None, None)},
        "layers": {
            "ln1": {"w": P(None, None)},
            "attn": {
                "wpack": {"w": P(None, None, col3),
                          "dequant_scale": P(None, col3),
                          "quant_scale": P(None),
                          "w_scales": P(None, None, col3)},
                "o": {"w": P(None, col, None), "dequant_scale": P(None),
                      "quant_scale": P(None),
                      "w_scales": P(None, None, None)},
            },
            "ln2": {"w": P(None, None)},
            "mlp": {
                "gate": {"w": P(None, None, ffn_col), "dequant_scale": P(None),
                         "quant_scale": P(None),
                         "w_scales": P(None, None, ffn_col)},
                "up": {"w": P(None, None, ffn_col), "dequant_scale": P(None),
                       "quant_scale": P(None),
                       "w_scales": P(None, None, ffn_col)},
                "down": {"w": P(None, ffn_col, None), "dequant_scale": P(None),
                         "quant_scale": P(None),
                         "w_scales": P(None, None, None)},
            },
        },
        "final_norm": {"w": P(None)},
        "lm_head": {"w": P(None, vocab_col)},
    }


def mixtral_param_specs(cfg, mesh: Mesh) -> Dict[str, Any]:
    """Mixtral: attention TP like Llama; experts [L, E, in, out] sharded
    over the "expert" axis when the mesh has one (EP), otherwise experts'
    inner dims are tensor-parallel over "model" (per-expert scales shard
    with their expert). Router replicated (fp, tiny)."""
    m = mesh.shape.get("model", 1)
    e_ax = "expert" if "expert" in mesh.shape and mesh.shape["expert"] > 1 else None
    exp = _maybe(mesh.shape.get("expert", 1), cfg.num_local_experts, "expert") \
        if e_ax else None

    def proj(spec_in, spec_out):
        return {"w": P(None, spec_in, spec_out), "dequant_scale": P(None),
                "quant_scale": P(None), "bias": P(None, spec_out),
                "w_scales": P(None, None, spec_out)}

    def expert_proj(spec_in, spec_out):
        return {"w": P(None, exp, spec_in, spec_out),
                "dequant_scale": P(None, exp), "quant_scale": P(None, exp),
                # int4 group scales [L, E, K/g, N] follow their expert
                "w_scales": P(None, exp, None, None)}

    col = _maybe(m, cfg.num_attention_heads * cfg.head_dim, "model")
    kv_col = _maybe(m, cfg.num_key_value_heads * cfg.head_dim, "model")
    ffn_col = _maybe(m, cfg.intermediate_size, "model")
    vocab_col = _maybe(m, cfg.vocab_size, "model")
    return {
        "embed": {"w": P(None, None)},
        "layers": {
            "ln1": {"w": P(None, None)},
            "attn": {"q": proj(None, col), "k": proj(None, kv_col),
                     "v": proj(None, kv_col), "o": proj(col, None)},
            "ln2": {"w": P(None, None)},
            "moe": {
                "router": {"w": P(None, None, None)},
                "w1": expert_proj(None, ffn_col),
                "w3": expert_proj(None, ffn_col),
                "w2": expert_proj(ffn_col, None),
            },
        },
        "final_norm": {"w": P(None)},
        "lm_head": {"w": P(None, vocab_col)},
    }


def with_stage_axis(specs, mesh: Mesh, num_layers: int):
    """Pipeline-stage placement: shard the stacked [L] layer axis over the
    mesh's "stage" axis — each stage device group holds L/S contiguous
    layers, and XLA moves the (replicated) activations between stages as the
    layer scan crosses shard boundaries. This is the TPU-native analog of
    the reference's accelerate device_map="sequential" placement
    (ref: utils/utils.py:43 — sequential stages, no microbatching), and
    composes with TP: pass the family's TP specs and both axes apply.

    Only the "layers" subtree gains the stage dim (its leaves all lead with
    [L]); embed/final_norm/lm_head stay on their TP/replicated specs."""
    s = mesh.shape.get("stage", 1)
    if s <= 1:
        return specs
    assert num_layers % s == 0, (
        f"{num_layers} layers not divisible by {s} pipeline stages")

    def add_stage(spec):
        if not isinstance(spec, P):
            return spec
        rest = tuple(spec) [1:] if len(spec) else ()
        return P("stage", *rest)

    out = dict(specs)
    out["layers"] = jax.tree.map(
        add_stage, specs["layers"],
        is_leaf=lambda x: isinstance(x, P))
    return out


PARAM_SPEC_FNS = {
    "llama": llama_param_specs,
    "gemma": llama_param_specs,   # identical layout (models/gemma.py)
    "transformers": opt_param_specs,   # OPT family tag
    "opt": opt_param_specs,
    "baichuan": baichuan_param_specs,
    "mixtral": mixtral_param_specs,
}


def param_specs(family: str, cfg, mesh: Mesh):
    return PARAM_SPEC_FNS[family](cfg, mesh)


def kv_cache_specs(cfg, mesh: Mesh, shard_batch: bool = True):
    """KVCacheLayer leaves [L, B, S, H_kv, Dh] (+ [L, B, S, H_kv] scales for
    the int8 cache). ``shard_batch=False`` keeps the batch dim replicated —
    the continuous-batching pool inserts/evicts single rows, which must not
    straddle a data shard."""
    m = mesh.shape.get("model", 1)
    d = mesh.shape.get("data", 1)
    kv_heads = getattr(cfg, "num_key_value_heads", None) or cfg.num_attention_heads
    head = _maybe(m, kv_heads, "model")
    batch = "data" if d > 1 and shard_batch else None
    spec = P(None, batch, None, head, None)
    return {"kv": spec, "kv_scale": P(None, batch, None, head)}


def kv_cache_spec_tree(cache, cfg, mesh: Mesh, shard_batch: bool = True):
    """PartitionSpec pytree matching a KV cache pytree (plain or int8)."""
    from ..models.common import QuantKVCacheLayer

    specs = kv_cache_specs(cfg, mesh, shard_batch)
    if isinstance(cache, QuantKVCacheLayer):
        return QuantKVCacheLayer(
            k=specs["kv"], v=specs["kv"],
            k_scale=specs["kv_scale"], v_scale=specs["kv_scale"])
    from ..models.common import KVCacheLayer

    return KVCacheLayer(k=specs["kv"], v=specs["kv"])


def shard_kv_cache(cache, mesh: Mesh, cfg, shard_batch: bool = True):
    from ..models.common import KVCacheLayer, QuantKVCacheLayer

    specs = kv_cache_specs(cfg, mesh, shard_batch)
    if isinstance(cache, QuantKVCacheLayer):
        tree_spec = QuantKVCacheLayer(
            k=specs["kv"], v=specs["kv"],
            k_scale=specs["kv_scale"], v_scale=specs["kv_scale"])
    else:
        tree_spec = KVCacheLayer(k=specs["kv"], v=specs["kv"])
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, tree_spec)


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


def _storage_spec(x, s):
    """dtype-aware fixup: int4 packed EXPERT weights ([.., E, K/2, N],
    uint8) store expert-axis-only — the shard_mapped expert MLP
    (models/mixtral._moe_int4_sharded) consumes exactly that layout, so any
    extra model-axis storage sharding would force a per-step ICI re-gather
    of the packed bytes. Non-expert int4 specs (llama/opt/baichuan col/row)
    pass through untouched: models/common.int4_matmul_tp consumes those
    shards directly."""
    import jax.numpy as jnp

    dims = tuple(s) if isinstance(s, P) else ()
    if (getattr(x, "dtype", None) == jnp.uint8 and "expert" in dims):
        # strip only the MODEL axis: "stage" must survive or every stage
        # replicates ALL layers' packed expert bytes — an S-fold HBM
        # inflation defeating pipeline placement (r5 review)
        return P(*[ax if ax in ("expert", "stage") else None
                   for ax in dims])
    return s


def shard_params(params, mesh: Mesh, specs):
    """device_put params with NamedShardings derived from specs (pruned to
    the actual param structure, with dtype-aware storage fixups)."""
    pruned = _prune_specs(specs, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, _storage_spec(x, s))), params, pruned
    )


def prune_specs_for(params, specs):
    return _prune_specs(specs, params)
