"""Perplexity evaluation, numerically identical to the reference procedure
(ref: examples/eval_model.py:56-105):

  - token stream split into consecutive non-overlapping windows of
    ``max_length`` (nsamples = total // max_length, remainder dropped)
  - per window: CE over shifted logits/labels, nll = mean_CE * max_length
  - ppl = exp(sum(nll) / (nsamples * max_length))

Note the reference's quirk: the per-window CE averages over max_length-1
positions but is then multiplied by max_length — ppl is exp(mean_CE *
(max_length/(max_length)))... i.e. the same scaling is applied here exactly
so numbers are comparable.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.config import QuantConfig


@functools.partial(jax.jit, static_argnames=("model_mod", "cfg", "qcfg", "compute_dtype"))
def _window_nll(params, window, model_mod, cfg, qcfg, compute_dtype):
    """window: int32 [1, T]. Returns summed mean-CE (f32 scalar)."""
    h, _, _ = model_mod.forward(params, window, cfg, qcfg,
                                compute_dtype=compute_dtype)
    logits = model_mod.logits(params, h)  # f32 [1, T, V]
    shift_logits = logits[:, :-1, :]
    shift_labels = window[:, 1:]
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)  # mean CE over (T-1) positions, as torch CE does


@functools.partial(jax.jit, static_argnames=(
    "model_mod", "cfg", "qcfg", "compute_dtype", "mesh", "microbatches"))
def _window_nll_batch(params, windows, model_mod, cfg, qcfg, compute_dtype,
                      mesh, microbatches):
    """windows: int32 [B, T]. Returns per-window mean-CE (f32 [B]). With a
    stage mesh the layer stack runs as a microbatched pipeline
    (shard/pipeline.py) — all stages busy across the window batch."""
    if mesh is not None:
        from ..shard.pipeline import pipelined_forward

        h = pipelined_forward(model_mod, params, windows, cfg, qcfg,
                              mesh=mesh, microbatches=microbatches,
                              compute_dtype=compute_dtype)
    else:
        h, _, _ = model_mod.forward(params, windows, cfg, qcfg,
                                    compute_dtype=compute_dtype)
    logits = model_mod.logits(params, h)  # f32 [B, T, V]
    shift_logits = logits[:, :-1, :]
    shift_labels = windows[:, 1:]
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll, axis=-1)


def perplexity_from_tokens(model_mod, params, cfg, tokens: np.ndarray,
                           max_length: int = 2048,
                           qcfg: Optional[QuantConfig] = None,
                           compute_dtype=jnp.float32,
                           progress: bool = False,
                           batch_windows: int = 1,
                           mesh=None, microbatches: int = 4) -> float:
    """tokens: 1-D int token stream (the testenc of the reference).

    batch_windows > 1 evaluates that many 2048-token windows per device
    dispatch (identical math — per-window mean-CE is batch-independent).
    Passing a ``mesh`` with a "stage" axis additionally pipelines the layer
    stack over the stages (microbatches must divide batch_windows)."""
    tokens = np.asarray(tokens).reshape(-1)
    nsamples = tokens.size // max_length
    if nsamples == 0:
        raise ValueError(f"token stream ({tokens.size}) shorter than window "
                         f"({max_length})")
    nlls = []
    if batch_windows > 1 or mesh is not None:
        bw = max(batch_windows, 1)
        if mesh is not None:
            bw = max(bw, microbatches)
            assert bw % microbatches == 0
        it = range(0, nsamples, bw)
        if progress:
            from tqdm import tqdm

            it = tqdm(it)
        for i in it:
            idx = [min(j, nsamples - 1) for j in range(i, i + bw)]
            wins = jnp.asarray(np.stack([
                tokens[j * max_length:(j + 1) * max_length] for j in idx]),
                jnp.int32)
            ces = np.asarray(_window_nll_batch(
                params, wins, model_mod, cfg, qcfg, compute_dtype, mesh,
                microbatches if mesh is not None else 1))
            keep = min(bw, nsamples - i)  # tail windows are clamped dupes
            nlls.extend(float(c) * max_length for c in ces[:keep])
        return float(np.exp(np.sum(nlls) / (nsamples * max_length)))
    it = range(nsamples)
    if progress:
        from tqdm import tqdm

        it = tqdm(it)
    for i in it:
        window = jnp.asarray(
            tokens[i * max_length:(i + 1) * max_length][None, :], jnp.int32)
        mean_ce = _window_nll(params, window, model_mod, cfg, qcfg, compute_dtype)
        # ref quirk: loss * max_length despite (max_length-1) terms
        nlls.append(float(mean_ce) * max_length)
    return float(np.exp(np.sum(nlls) / (nsamples * max_length)))


def perplexity(model_mod, params, cfg, text_tokens, **kw) -> float:
    return perplexity_from_tokens(model_mod, params, cfg, text_tokens, **kw)
