"""Token sampling: greedy / temperature / top-k / top-p (nucleus).

The reference generates through HF ``GenerationMixin`` (ref:
examples/test_model.py:51), which carries do_sample/temperature/top_k/top_p;
its engines never reimplement sampling. The TPU engines here run the whole
decode loop inside one jitted ``lax.scan``, so sampling must be (a) a pure
function of (logits, key), (b) free of data-dependent control flow, and
(c) — for the continuous-batching engine — vectorized over PER-ROW sampling
parameters so one compiled decode step serves slots with different configs.

Two entry points:

  ``sample(logits, key, temperature, top_k, top_p)`` — STATIC scalar config
  (hashable, lives in ``GenerationConfig``); greedy compiles to a plain
  argmax with no sort.

  ``sample_per_row(logits, key, temperature, top_k, top_p)`` — traced [B]
  parameter arrays; one descending sort per step serves both the top-k
  threshold (k-th largest logit) and the top-p threshold (smallest logit in
  the nucleus). Rows with temperature == 0 take the argmax.

Determinism: both paths are pure functions of the PRNG key, so identical
keys on every host keep multi-host lockstep serving (serve/multihost.py)
consistent — sampled serving needs no extra coordination beyond the shared
seed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _thresholds_per_row(scaled, top_k, top_p):
    """Smallest kept logit per row under top-k AND top-p, via one sort.

    scaled: [B, V] f32 (already temperature-scaled), top_k: [B] int32
    (0 = off), top_p: [B] f32 (>= 1 = off). Returns [B, 1] threshold;
    logits strictly below it are masked.
    """
    V = scaled.shape[-1]
    desc = -jnp.sort(-scaled, axis=-1)  # descending
    k = jnp.where(top_k > 0, top_k, V).astype(jnp.int32)
    k = jnp.clip(k, 1, V)
    kth = jnp.take_along_axis(desc, (k - 1)[:, None], axis=-1)
    probs = jax.nn.softmax(desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens whose prefix mass (exclusive) is < p: the first token is
    # always kept, and the token that crosses p is included (HF semantics)
    nkeep = jnp.maximum(jnp.sum((cum - probs) < top_p[:, None], axis=-1), 1)
    pth = jnp.take_along_axis(desc, (nkeep - 1)[:, None], axis=-1)
    return jnp.maximum(kth, pth)


def apply_repetition_penalty(logits, seen, penalty):
    """HF-convention repetition penalty: for vocabulary entries already seen
    in the context (prompt + generated), positive logits divide by the
    penalty and negative ones multiply (ref behavior of the HF generate the
    reference drives, examples/test_model.py:51).

    logits: [B, V] f32; seen: bool [B, V]; penalty: [B] f32 (1 = off).
    """
    logits = logits.astype(jnp.float32)
    p = penalty[:, None]
    pen = jnp.where(logits > 0, logits / p, logits * p)
    return jnp.where(seen & (p != 1.0), pen, logits)


def sample_per_row(logits, key, temperature, top_k, top_p):
    """[B, V] logits -> [B] int32 tokens; per-row sampling parameters.

    temperature[b] == 0 selects greedy for that row. One key draws the whole
    batch (categorical adds independent Gumbel noise per row).
    """
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    use = temperature > 0.0
    t = jnp.where(use, temperature, 1.0)[:, None]
    scaled = logits / t
    thresh = _thresholds_per_row(scaled, top_k, top_p)
    masked = jnp.where(scaled < thresh, -jnp.inf, scaled)
    drawn = jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    return jnp.where(use, drawn, greedy)


def sample(logits, key, temperature: float = 0.0, top_k: int = 0,
           top_p: float = 1.0):
    """[B, V] logits -> [B] int32 tokens; STATIC scalar config.

    temperature == 0 => pure argmax (no sort in the compiled step). top_k/
    top_p filters compose (both thresholds apply).
    """
    logits = logits.astype(jnp.float32)
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / temperature
    need_sort = top_k > 0 or top_p < 1.0
    if need_sort:
        B = scaled.shape[0]
        thresh = _thresholds_per_row(
            scaled,
            jnp.full((B,), top_k, jnp.int32),
            jnp.full((B,), top_p, jnp.float32))
        scaled = jnp.where(scaled < thresh, -jnp.inf, scaled)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
