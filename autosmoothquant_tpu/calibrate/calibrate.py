"""Activation-scale calibration.

TPU-native re-design of the reference's hook-based capture
(ref: quantize/calibration.py:44-88 get_act_scales and :186-244
get_static_decoder_layer_scales). Instead of torch forward hooks mutating a
dict, the functional model's ``forward(capture_stats=True)`` returns a stats
pytree as an extra jit output; batches aggregate with an elementwise max —
one compiled program, no host sync per projection.

Both reference passes collapse into ONE pass here: the per-channel input
absmax (for smoothing) and the scalar io absmaxes (for static scales) come
from the same stats, since scalar = max over channels. The reference runs the
static pass *after* smoothing, so the pipeline (convert/pipeline.py) simply
calibrates twice — once on the fp model, once on the smoothed model.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def calibrate(model_mod, params, cfg, batches: Iterable[jnp.ndarray],
              compute_dtype=jnp.float32, extra_forward_kwargs: Optional[dict] = None,
              qcfg=None) -> Dict[str, jnp.ndarray]:
    """Run the model over calibration batches, return stacked stats (each
    leaf [L, ...], elementwise-maxed across batches).

    model_mod: a model family module (models/llama.py etc.).
    batches: iterable of int32 [B, T] input_ids arrays.
    qcfg: None for float calibration; a QuantConfig (+ matching quantized
    params) to observe scales through a QUANTIZED forward — the fp8 observer
    pass (ref: quantize_activations_fp8 runs the observer network with
    fp8-quantized weights, calibration.py:292-338).
    """
    kwargs = dict(extra_forward_kwargs or {})

    @functools.partial(jax.jit, static_argnames=())
    def one_batch(p, ids):
        _, _, stats = model_mod.forward(
            p, ids, cfg, qcfg, capture_stats=True, compute_dtype=compute_dtype,
            **kwargs,
        )
        return stats

    agg = None
    for ids in batches:
        stats = one_batch(params, jnp.asarray(ids, jnp.int32))
        agg = stats if agg is None else jax.tree.map(jnp.maximum, agg, stats)
    if agg is None:
        raise ValueError("calibration got zero batches")
    return jax.tree.map(lambda x: jax.device_get(x), agg)


def calibration_batches(token_stream: np.ndarray, num_samples: int = 512,
                        seq_len: int = 512, seed: int = 42,
                        batch_size: int = 8) -> Iterable[np.ndarray]:
    """Sample fixed-length windows from a 1-D token array — the analog of the
    reference's shuffled-dataset truncation loop (ref: calibration.py:75-81,
    datautils.py random-window sampling), batched for TPU efficiency.
    """
    rng = np.random.default_rng(seed)
    n = token_stream.shape[0]
    assert n > seq_len, "token stream shorter than seq_len"
    # round down to full batches: ragged tails would retrigger compilation
    num_samples = max(batch_size, (num_samples // batch_size) * batch_size)
    starts = rng.integers(0, n - seq_len, size=num_samples)
    windows = np.stack([token_stream[s:s + seq_len] for s in starts]).astype(np.int32)
    for i in range(0, num_samples, batch_size):
        yield windows[i:i + batch_size]
