"""Chunked prefill: admission trickles prompt chunks into the pool row
WHILE other slots keep decoding, with zero output change vs whole-prompt
admission (VERDICT r1 item 8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.serve.batching import ContinuousEngine

TINY = dict(
    vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
)


@pytest.fixture(scope="module")
def setup():
    cfg = L.LlamaConfig(**TINY)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _run(cfg, params, prompts, chunk):
    ce = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=256,
                          kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                          steps_per_sync=4, prefill_chunk=chunk)
    for uid, p in prompts.items():
        ce.submit(uid, p, max_new_tokens=8)
    return ce.run()


@pytest.mark.parametrize("chunk", [32, 64])
def test_chunked_matches_whole_prompt(setup, chunk):
    cfg, params = setup
    rng = np.random.default_rng(0)
    prompts = {
        "long": rng.integers(1, 250, size=150).tolist(),   # several chunks
        "short": [5, 9, 2],                                # shorter than chunk
        "exact": rng.integers(1, 250, size=chunk).tolist(),  # exactly one
        "ragged": rng.integers(1, 250, size=chunk + 7).tolist(),
    }
    whole = _run(cfg, params, prompts, None)
    chunked = _run(cfg, params, prompts, chunk)
    assert chunked == whole


def test_decode_proceeds_during_admission(setup):
    """A long prompt admitted while another slot decodes: the decoding slot
    must produce tokens on EVERY tick (no stall) and both outputs match the
    unchunked engine."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    long_prompt = rng.integers(1, 250, size=200).tolist()
    short = [7, 3, 11]

    ce = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=256,
                          kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                          steps_per_sync=2, prefill_chunk=32)
    r_short = ce.submit("short", short, max_new_tokens=16)
    ce.step()  # admits short (fast: 1 chunk) + starts decoding
    r_long = ce.submit("long", long_prompt, max_new_tokens=8)
    progress = []
    for _ in range(6):  # long prompt needs ~7 chunks of 32
        before = len(r_short.output)
        ce.step()
        progress.append(len(r_short.output) - before)
    # decode advanced during admission ticks
    assert sum(progress[:4]) > 0
    for _ in range(200):
        if r_short.done and r_long.done:
            break
        ce.step()
    # reference: unchunked engine, same budgets
    ce2 = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=256,
                           kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                           steps_per_sync=2)
    ce2.submit("short", short, max_new_tokens=16)
    ce2.submit("long", long_prompt, max_new_tokens=8)
    ref = ce2.run()
    assert r_short.output[:16] == ref["short"]
    assert r_long.output[:8] == ref["long"]


def test_chunked_int8_kv(setup):
    cfg, params = setup
    rng = np.random.default_rng(2)
    prompts = {"a": rng.integers(1, 250, size=100).tolist(), "b": [4, 4, 4]}
    ce = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=256,
                          kv_dtype=jnp.int8, compute_dtype=jnp.float32,
                          steps_per_sync=4, prefill_chunk=32)
    for uid, p in prompts.items():
        ce.submit(uid, p, max_new_tokens=6)
    out = ce.run()
    ce2 = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=256,
                           kv_dtype=jnp.int8, compute_dtype=jnp.float32,
                           steps_per_sync=4)
    for uid, p in prompts.items():
        ce2.submit(uid, p, max_new_tokens=6)
    assert out == ce2.run()
