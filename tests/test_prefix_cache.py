"""Prefix caching (ContinuousEngine.register_prefix): shared system-prompt
K/V is prefilled once and copied into slot rows; outputs must be IDENTICAL
to full-prompt prefills, with measurably fewer prefill tokens processed."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.serve.batching import ContinuousEngine


def _tiny():
    from autosmoothquant_tpu.models import llama as L

    cfg = L.LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, max_position_embeddings=256)
    return L, cfg, L.init_params(cfg, jax.random.PRNGKey(0))


def _engine(L, cfg, params, **kw):
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_seq", 192)
    return ContinuousEngine(L, params, cfg, kv_dtype=jnp.float32,
                            compute_dtype=jnp.float32, **kw)


SYSTEM = list(np.random.default_rng(7).integers(1, 128, size=100))
SUFFIXES = [list(np.random.default_rng(i).integers(1, 128, size=4 + 3 * i))
            for i in range(4)]


@pytest.mark.parametrize("prefill_chunk", [None, 32])
def test_prefix_outputs_match_full_prefill(prefill_chunk):
    L, cfg, params = _tiny()
    base = _engine(L, cfg, params, prefill_chunk=prefill_chunk)
    for i, s in enumerate(SUFFIXES):
        base.submit(i, SYSTEM + s, max_new_tokens=6)
    want = base.run()

    eng = _engine(L, cfg, params, prefill_chunk=prefill_chunk)
    eng.register_prefix("sys", SYSTEM)
    for i, s in enumerate(SUFFIXES):
        eng.submit(i, SYSTEM + s, max_new_tokens=6, prefix="sys")
    got = eng.run()
    assert got == want
    # the prefix was prefilled once (100 tokens) + per-request suffix work;
    # the baseline paid the full prompt per request
    assert eng.prefill_tokens_processed < base.prefill_tokens_processed


def test_prefix_only_prompt():
    L, cfg, params = _tiny()
    base = _engine(L, cfg, params)
    base.submit(0, SYSTEM, max_new_tokens=6)
    want = base.run()

    eng = _engine(L, cfg, params)
    eng.register_prefix("sys", SYSTEM)
    eng.submit(0, SYSTEM, max_new_tokens=6, prefix="sys")
    got = eng.run()
    assert got == want
    assert eng.prefill_tokens_processed == len(SYSTEM)  # registration only


def test_mixed_prefix_and_plain_batch():
    L, cfg, params = _tiny()
    base = _engine(L, cfg, params)
    other = [9, 8, 7, 6, 5]
    base.submit(0, SYSTEM + SUFFIXES[0], max_new_tokens=5)
    base.submit(1, other, max_new_tokens=5)
    want = base.run()

    eng = _engine(L, cfg, params)
    eng.register_prefix("sys", SYSTEM)
    eng.submit(0, SYSTEM + SUFFIXES[0], max_new_tokens=5, prefix="sys")
    eng.submit(1, other, max_new_tokens=5)  # no prefix
    got = eng.run()
    assert got == want


def test_unknown_or_mismatched_prefix_falls_back():
    L, cfg, params = _tiny()
    eng = _engine(L, cfg, params)
    eng.register_prefix("sys", SYSTEM)
    # prompt does NOT start with the prefix -> silently treated as plain
    eng.submit(0, [1, 2, 3, 4], max_new_tokens=4, prefix="sys")
    # unknown prefix id -> plain
    eng.submit(1, SYSTEM[:8], max_new_tokens=4, prefix="nope")
    out = eng.run()
    assert len(out[0]) == 4 and len(out[1]) == 4

    base = _engine(L, cfg, params)
    base.submit(0, [1, 2, 3, 4], max_new_tokens=4)
    base.submit(1, SYSTEM[:8], max_new_tokens=4)
    assert base.run() == out


def test_drop_prefix():
    L, cfg, params = _tiny()
    eng = _engine(L, cfg, params)
    eng.register_prefix("sys", SYSTEM)
    eng.drop_prefix("sys")
    eng.submit(0, SYSTEM + SUFFIXES[0], max_new_tokens=4, prefix="sys")
    out = eng.run()
    assert len(out[0]) == 4
