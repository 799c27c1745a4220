"""Simulated ("fake") quantization research path.

Functional analog of the reference's standalone W8A8Linear accuracy-study
module (ref: autosmoothquant/quantize/fake_quant.py:6-112, inherited from
MIT-smoothquant): weights and activations are quantize->dequantize
roundtripped in float so accuracy impact can be studied without the int8
execution path. Not wired into the serving CLI, mirroring the reference.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from . import math as qmath

WEIGHT_MODES = ("per_channel", "per_tensor")
ACT_MODES = ("per_token", "per_tensor")


def fake_quantize_weight(w: jnp.ndarray, mode: str = "per_channel") -> jnp.ndarray:
    """[in, out] weight -> float weight that has been int8-roundtripped.
    ref: fake_quant.py quantize_weight_per_channel_absmax / per_tensor."""
    if mode == "per_channel":
        q, scales = qmath.quantize_weight_per_channel_absmax(w, axis=0)
        return (q.astype(jnp.float32) * scales).astype(w.dtype)
    if mode == "per_tensor":
        q, scale = qmath.quantize_weight_per_tensor_absmax(w)
        return (q.astype(jnp.float32) * scale).astype(w.dtype)
    raise ValueError(f"mode {mode!r} not in {WEIGHT_MODES}")


def fake_quantize_act(x: jnp.ndarray, mode: str = "per_token") -> jnp.ndarray:
    """ref: fake_quant.py fake_quantize_activation_* (via quant.math)."""
    if mode == "per_token":
        return qmath.fake_quantize_act_per_token(x)
    if mode == "per_tensor":
        return qmath.fake_quantize_act_per_tensor(x)
    raise ValueError(f"mode {mode!r} not in {ACT_MODES}")


def fake_quantize_params(params: Dict[str, Any], weight_mode: str = "per_channel",
                         skip_keys: tuple = ("embed", "lm_head", "final_norm",
                                             "router")) -> Dict[str, Any]:
    """Roundtrip every projection weight leaf (dict key "w" with ndim >= 2,
    outside skip_keys) through int8. The model then runs its normal float
    forward — the W8A8Linear.from_float study without module surgery."""

    def walk(node, path=()):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "w" and hasattr(v, "ndim") and v.ndim >= 2 \
                        and not any(s in path for s in skip_keys):
                    if v.ndim == 2:
                        out[k] = fake_quantize_weight(v, weight_mode)
                    else:
                        # stacked [L, ...] / [L, E, ...] projections
                        flat = v.reshape((-1,) + v.shape[-2:])
                        fq = jax.vmap(
                            lambda w: fake_quantize_weight(w, weight_mode))(flat)
                        out[k] = fq.reshape(v.shape)
                else:
                    out[k] = walk(v, path + (k,))
            return out
        return node

    return walk(params)
