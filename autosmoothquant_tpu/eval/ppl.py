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


def perplexity_from_tokens(model_mod, params, cfg, tokens: np.ndarray,
                           max_length: int = 2048,
                           qcfg: Optional[QuantConfig] = None,
                           compute_dtype=jnp.float32,
                           progress: bool = False) -> float:
    """tokens: 1-D int token stream (the testenc of the reference)."""
    tokens = np.asarray(tokens).reshape(-1)
    nsamples = tokens.size // max_length
    if nsamples == 0:
        raise ValueError(f"token stream ({tokens.size}) shorter than window "
                         f"({max_length})")
    nlls = []
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
