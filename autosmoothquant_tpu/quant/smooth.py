"""SmoothQuant scale migration as a functional pytree transform.

TPU-native re-design of the reference's in-place module surgery
(ref: autosmoothquant/quantize/smooth.py:11-93). Instead of walking
``nn.Module`` trees and mutating weights, the transform is

    params' = smooth_params(params, act_scales, groups, alpha)

where ``groups`` declares, per decoder layer, which norm feeds which
projection weights (each model family exports its own group layout — the
analog of the reference's per-family isinstance dispatch in smooth_lm).

Numeric convention (matching smooth.py:28-40 exactly):
    weight_scales = clamp(max_j over fc group of per-in-channel absmax, 1e-5)
    s             = clamp(act_scales^alpha / weight_scales^(1-alpha), 1e-5)
    norm.weight  /= s    (and norm.bias /= s when the norm is a LayerNorm)
    fc.weight    *= s    (broadcast over the input-channel dim)

Weights here are stored [in_features, out_features] (the natural layout for
``x @ w`` on the MXU), so the per-in-channel absmax reduces over axis 1 and
``s`` broadcasts as a column vector.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from ..utils.tree import tree_get, tree_update


def compute_smooth_scale(act_scales: jnp.ndarray, fc_weights: Sequence[jnp.ndarray],
                         alpha: float = 0.5) -> jnp.ndarray:
    """The migration strength formula. ref: smooth.py:28-34."""
    weight_scales = jnp.max(
        jnp.stack([jnp.max(jnp.abs(w), axis=1) for w in fc_weights]), axis=0
    )
    weight_scales = jnp.maximum(weight_scales.astype(jnp.float32), 1e-5)
    act_scales = act_scales.astype(jnp.float32)
    s = jnp.maximum(act_scales**alpha / weight_scales ** (1.0 - alpha), 1e-5)
    return s


def smooth_norm_fcs(norm_weight: jnp.ndarray, fc_weights: Sequence[jnp.ndarray],
                    act_scales: jnp.ndarray, alpha: float = 0.5,
                    norm_bias: Optional[jnp.ndarray] = None):
    """Smooth one (norm -> fc group) boundary. Returns
    (norm_weight', fc_weights', norm_bias' or None). ref: smooth.py:11-40."""
    for w in fc_weights:
        assert w.shape[0] == norm_weight.size == act_scales.size, (
            f"in_features mismatch: {w.shape[0]} vs {norm_weight.size} vs {act_scales.size}"
        )
    s = compute_smooth_scale(act_scales, fc_weights, alpha)
    dtype = fc_weights[0].dtype
    new_norm = (norm_weight.astype(jnp.float32) / s).astype(norm_weight.dtype)
    new_bias = None
    if norm_bias is not None:
        new_bias = (norm_bias.astype(jnp.float32) / s).astype(norm_bias.dtype)
    new_fcs = [(w.astype(jnp.float32) * s[:, None]).astype(dtype) for w in fc_weights]
    return new_norm, new_fcs, new_bias


@dataclasses.dataclass(frozen=True)
class SmoothGroup:
    """One norm->fcs boundary inside a params tree.

    norm_path:  path to the norm weight leaf (e.g. ("ln1", "weight"))
    fc_paths:   paths to each consumer projection weight ([in, out] layout)
    scale_key:  key into the act_scales dict for this boundary (the reference
                keys scales by the *first* consumer's HF module name,
                e.g. "model.layers.0.self_attn.q_proj"; smooth_lm:49-93)
    norm_bias_path: set for LayerNorm families (OPT) where bias is divided too
    """

    norm_path: Tuple
    fc_paths: Tuple[Tuple, ...]
    scale_key: str
    norm_bias_path: Optional[Tuple] = None


def smooth_params(params, act_scales: dict, groups: Sequence[SmoothGroup],
                  alpha: float = 0.5):
    """Apply SmoothQuant migration to every declared group. Functional analog
    of smooth_lm (ref: smooth.py:43-93)."""
    for g in groups:
        norm_w = tree_get(params, g.norm_path)
        fcs = [tree_get(params, p) for p in g.fc_paths]
        bias = tree_get(params, g.norm_bias_path) if g.norm_bias_path else None
        scales = jnp.asarray(act_scales[g.scale_key])
        new_norm, new_fcs, new_bias = smooth_norm_fcs(norm_w, fcs, scales, alpha, bias)
        updates = [(g.norm_path, new_norm)]
        updates += list(zip(g.fc_paths, new_fcs))
        if g.norm_bias_path is not None:
            updates.append((g.norm_bias_path, new_bias))
        params = tree_update(params, updates)
    return params
