"""Microbatched pipeline parallelism (GPipe schedule) over the "stage" axis.

``with_stage_axis`` (sharding.py) gives *sequential* stage placement — the
analog of the reference's accelerate ``device_map="sequential"``
(ref: utils/utils.py:43) — where at any instant only one stage's devices
compute while activations walk the layer stack. This module adds the
microbatched schedule so all S stages compute concurrently.

TPU-native formulation (no per-stage processes, no send/recv code):

  - layer params stay stacked [L, ...] sharded over "stage" exactly as
    ``with_stage_axis`` placed them; ``stage_stack`` reshapes to
    [S, L/S, ...] — a pure relabeling of the same contiguous placement.
  - per-tick compute is a ``vmap`` over the leading stage dim of the
    activation buffer [S, mb, T, D] (each stage runs its L/S-layer
    ``lax.scan``); because both params and buffer lead with a
    "stage"-sharded axis, the partitioner maps each stage's compute onto
    its own device group with zero weight traffic.
  - between ticks the buffer advances one stage: ``jnp.roll`` along the
    stage-sharded axis, which XLA lowers to a collective-permute over ICI,
    while stage 0 is fed the next microbatch.

M microbatches finish in M+S-1 ticks: bubble fraction (S-1)/(M+S-1).
Composes with TP ("model" axis: weights' inner dims stay sharded inside
each stage) and DP ("data" axis: the microbatch dim is sharded).

The schedule targets cacheless prefill (perplexity windows, calibration,
scoring) — decode is latency-bound and served by TP. Fused Pallas decoder
blocks are auto-disabled on multi-device traces without an ambient mesh
(models/common.fused_block_enabled), which is exactly this code path, so
the vmapped stage compute never wraps a shard_mapped kernel.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stage_stack(layers, num_stages: int):
    """Reshape stacked layer leaves [L, ...] -> [S, L/S, ...] (stage-major:
    stage i holds contiguous layers [i*L/S, (i+1)*L/S) — the same contiguous
    blocks with_stage_axis places on each stage group)."""
    def reshape(x):
        l = x.shape[0]
        assert l % num_stages == 0, (
            f"{l} layers not divisible by {num_stages} stages")
        return x.reshape((num_stages, l // num_stages) + x.shape[1:])

    return jax.tree.map(reshape, layers)


def _buffer_spec(mesh: Optional[Mesh], ndim: int) -> Optional[NamedSharding]:
    if mesh is None or "stage" not in mesh.axis_names:
        return None
    dn = "data" if dict(mesh.shape).get("data", 1) > 1 else None
    return NamedSharding(mesh, P("stage", dn, *([None] * (ndim - 2))))


def pipeline_layers(h_mb: jnp.ndarray, stage_layers, step_fn,
                    mesh: Optional[Mesh] = None) -> jnp.ndarray:
    """Run the GPipe schedule. h_mb: [M, mb, T, D] microbatched hidden
    states; stage_layers: layer pytree with leaves [S, L/S, ...]
    (stage_stack); step_fn(h, lp) -> h applies ONE layer. Returns the
    transformed [M, mb, T, D]."""
    leaves = jax.tree.leaves(stage_layers)
    s = leaves[0].shape[0]
    m = h_mb.shape[0]
    spec = _buffer_spec(mesh, h_mb.ndim)

    def constrain(x):
        return jax.lax.with_sharding_constraint(x, spec) if spec else x

    def per_stage(h_s, lp_s):
        return jax.lax.scan(lambda c, lp: (step_fn(c, lp), None), h_s, lp_s)[0]

    def tick(carry, t):
        yb, outs = carry
        # stage i's input is stage i-1's last output; stage 0 eats the next
        # microbatch (clamped index: reads past M are discarded by the
        # collect logic below)
        feed = jax.lax.dynamic_index_in_dim(
            h_mb, jnp.clip(t, 0, m - 1), 0, keepdims=False)
        xb = constrain(jnp.roll(yb, 1, axis=0).at[0].set(feed))
        yb = constrain(jax.vmap(per_stage)(xb, stage_layers))
        # microbatch t-(S-1) leaves the last stage at tick t. Clamped-index
        # write: earlier ticks scribble on slot 0 / later-overwritten slots,
        # and the LAST write to every slot i lands at its correct tick
        # i+S-1 (the write index is nondecreasing in t).
        out_idx = jnp.clip(t - (s - 1), 0, m - 1)
        outs = jax.lax.dynamic_update_index_in_dim(
            outs, yb[-1], out_idx, 0)
        return (yb, outs), None

    yb0 = constrain(jnp.zeros((s,) + h_mb.shape[1:], h_mb.dtype))
    outs0 = jnp.zeros_like(h_mb)
    (_, outs), _ = jax.lax.scan(
        tick, (yb0, outs0), jnp.arange(m + s - 1, dtype=jnp.int32))
    return outs


def _causal_mask(t):
    col = jnp.arange(t, dtype=jnp.int32)[None, None, None, :]
    row = jnp.arange(t, dtype=jnp.int32)[None, None, :, None]
    return col <= row


def _llama_step(cfg, qcfg, mb, t, compute_dtype):
    from ..models import llama as mod

    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :],
                                 (mb, t))
    cos, sin = mod.rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    mask = _causal_mask(t)

    def step(h, lp):
        return mod._layer_forward(h, lp, cfg, qcfg, cos, sin, mask, None,
                                  None, False, compute_dtype,
                                  plain_causal=True)[0]

    return step


def _mixtral_step(cfg, qcfg, mb, t, compute_dtype):
    from ..models import mixtral as mod

    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :],
                                 (mb, t))
    cos, sin = mod.rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    mask = _causal_mask(t)

    def step(h, lp):
        return mod._layer_forward(h, lp, cfg, qcfg, cos, sin, mask, None,
                                  None, False, False, compute_dtype,
                                  plain_causal=True)[0]

    return step


def _baichuan_step(cfg, qcfg, mb, t, compute_dtype):
    from ..models import baichuan as mod

    if cfg.position_embedding == "ROPE":
        positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :],
                                     (mb, t))
        cos, sin = mod.rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
        alibi = None
    else:
        cos = sin = None
        key_pos = jnp.arange(t, dtype=jnp.int32)
        slopes = mod.alibi_slopes(cfg.num_attention_heads)
        alibi = jnp.broadcast_to(
            slopes[:, None, None] * key_pos.astype(jnp.float32)[None, None, :],
            (cfg.num_attention_heads, t, t))
    mask = _causal_mask(t)

    def step(h, lp):
        return mod._layer_forward(h, lp, cfg, qcfg, cos, sin, mask, alibi,
                                  None, None, False, compute_dtype,
                                  plain_causal=True)[0]

    return step


def _opt_step(cfg, qcfg, mb, t, compute_dtype):
    from ..models import opt as mod

    mask = _causal_mask(t)

    def step(h, lp):
        return mod._layer_forward(h, lp, cfg, qcfg, mask, None, None, False,
                                  compute_dtype, plain_causal=True)[0]

    return step


_STEP_BUILDERS = {
    "llama": _llama_step,
    "gemma": _llama_step,   # identical layer math (models/gemma.py)
    "mixtral": _mixtral_step,
    "baichuan": _baichuan_step,
    "opt": _opt_step,
    "transformers": _opt_step,  # OPT family tag
}


def _family_of(model) -> str:
    name = model if isinstance(model, str) else model.__name__
    return name.rsplit(".", 1)[-1]


@functools.partial(jax.jit, static_argnames=(
    "family", "cfg", "quant_config", "microbatches", "num_stages",
    "mesh", "compute_dtype"))
def _pipelined_forward(params, input_ids, family: str, cfg,
                       quant_config, microbatches: int, num_stages: int,
                       mesh, compute_dtype):
    b, t = input_ids.shape
    mb = b // microbatches

    # --- embed (family-specific; tiny, cites the family's forward) --------
    h = params["embed"]["w"][input_ids].astype(compute_dtype)
    if family in ("opt", "transformers"):
        from ..models.opt import POS_OFFSET

        if "project_in" in params:
            h = jnp.dot(h, params["project_in"]["w"].astype(compute_dtype))
        positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :],
                                     (b, t))
        h = h + params["embed_pos"]["w"][positions
                                         + POS_OFFSET].astype(compute_dtype)

    # --- pipelined layer stack --------------------------------------------
    step_fn = _STEP_BUILDERS[family](cfg, quant_config, mb, t, compute_dtype)
    stage_layers = stage_stack(params["layers"], num_stages)
    h_mb = h.reshape(microbatches, mb, t, -1)
    h = pipeline_layers(h_mb, stage_layers, step_fn, mesh).reshape(b, t, -1)

    # --- head -------------------------------------------------------------
    if family in ("opt", "transformers"):
        from ..models.opt import layer_norm

        if cfg.do_layer_norm_before and "final_norm" in params:
            h = layer_norm(h, params["final_norm"]["w"],
                           params["final_norm"]["b"], cfg.layer_norm_eps)
        h = h.astype(compute_dtype)
        if "project_out" in params:
            h = jnp.dot(h, params["project_out"]["w"].astype(compute_dtype))
    else:
        from ..models.common import rms_norm

        h = rms_norm(h, params["final_norm"]["w"],
                     cfg.rms_norm_eps).astype(compute_dtype)
    return h


def pipelined_forward(model, params, input_ids, cfg,
                      quant_config=None, *, mesh: Optional[Mesh] = None,
                      microbatches: int = 4,
                      compute_dtype: Any = jnp.float32) -> jnp.ndarray:
    """Cacheless causal forward (ppl windows / calibration / scoring) with
    the layer stack executed as a microbatched pipeline over the mesh's
    "stage" axis. model: a family module (models.llama, ...) or family
    string. Semantically identical to ``model.forward(...)[0]`` — same
    layers, same math — with batch split into ``microbatches`` groups.

    Shard params with ``with_stage_axis`` specs over ``mesh`` first; without
    a mesh (or stage=1) the schedule still runs (useful for equality tests)
    but buys nothing."""
    family = _family_of(model)
    b = input_ids.shape[0]
    assert b % microbatches == 0, (
        f"batch {b} not divisible by {microbatches} microbatches")
    num_stages = dict(mesh.shape).get("stage", 1) if mesh is not None else 1
    num_layers = jax.tree.leaves(params["layers"])[0].shape[0]
    if num_stages > 1:
        assert num_layers % num_stages == 0
    return _pipelined_forward(params, input_ids, family, cfg, quant_config,
                              microbatches, max(num_stages, 1), mesh,
                              compute_dtype)
