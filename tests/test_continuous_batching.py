"""Continuous batching: parity with the static engine, slot reuse under
oversubscription, eos handling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig
from autosmoothquant_tpu.serve.batching import ContinuousEngine

TINY = dict(
    vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def setup():
    cfg = L.LlamaConfig(**TINY)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def reference_greedy(cfg, params, prompt, n):
    eng = Engine(L, params, cfg, max_batch=1, max_seq=128,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    return eng.generate([prompt], GenerationConfig(max_new_tokens=n))[0]


def test_single_request_matches_static_engine(setup):
    cfg, params = setup
    ce = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=128,
                          kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                          steps_per_sync=4)
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    ce.submit("a", prompt, max_new_tokens=10)
    out = ce.run()["a"]
    assert out == reference_greedy(cfg, params, prompt, 10)


def test_oversubscribed_slots(setup):
    """5 requests through 2 slots: all outputs must match solo runs."""
    cfg, params = setup
    ce = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=128,
                          kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                          steps_per_sync=3)
    prompts = {f"r{i}": [i + 1, (2 * i) % 250 + 1, 7, i % 11 + 1]
               for i in range(5)}
    for uid, p in prompts.items():
        ce.submit(uid, p, max_new_tokens=6)
    outs = ce.run()
    for uid, p in prompts.items():
        assert outs[uid] == reference_greedy(cfg, params, p, 6), uid


def test_ragged_lengths_and_budgets(setup):
    cfg, params = setup
    ce = ContinuousEngine(L, params, cfg, max_batch=3, max_seq=128,
                          kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                          steps_per_sync=5)
    specs = [("x", [5] * 3, 4), ("y", [9] * 17, 9), ("z", [2, 8], 13)]
    for uid, p, n in specs:
        ce.submit(uid, p, max_new_tokens=n)
    outs = ce.run()
    for uid, p, n in specs:
        assert outs[uid] == reference_greedy(cfg, params, p, n), uid
        assert len(outs[uid]) == n


def test_eos_stops_early(setup):
    cfg, params = setup
    prompt = [7, 7, 7]
    full = reference_greedy(cfg, params, prompt, 10)
    # pick an eos token that appears exactly once so truncation is unambiguous
    idx, eos = next((i, t) for i, t in enumerate(full)
                    if full.count(t) == 1 and i >= 2)
    ce = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=128,
                          kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    ce.submit("e", prompt, max_new_tokens=10, eos_token_id=eos)
    out = ce.run()["e"]
    assert out == full[:idx]


def test_int8_kv_pool(setup):
    cfg, params = setup
    ce = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=128,
                          kv_dtype=jnp.int8, compute_dtype=jnp.float32)
    ce.submit("q", [1, 2, 3, 4], max_new_tokens=6)
    out = ce.run()["q"]
    assert len(out) == 6


def test_capacity_clamp_near_max_seq(setup):
    """Slots near max_seq must not scatter K/V past the cache: on-device
    steps are clamped to the smallest remaining capacity and over-long
    prompts are left-trimmed at admit (regression for silent mid-sync
    overshoot)."""
    cfg, params = setup
    ce = ContinuousEngine(L, params, cfg, max_batch=4, max_seq=64,
                          kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                          steps_per_sync=8)
    ce.submit("a", [1, 2, 3], max_new_tokens=10)
    ce.submit("near_cap", list(range(1, 51)), max_new_tokens=40)
    ce.submit("long", list(range(1, 80)), max_new_tokens=10)  # 79 > 64
    outs = ce.run()
    assert len(outs["a"]) == 10
    # 50-token prompt: 1 prefill token + 13 decode writes (slots 50..62)
    assert len(outs["near_cap"]) == 14
    # trimmed to 63 tokens: retired at capacity after the prefill token
    assert len(outs["long"]) == 1
    # the clamped tokens must still be CORRECT (computed with full K/V)
    assert outs["a"] == reference_greedy(cfg, params, [1, 2, 3], 10)
