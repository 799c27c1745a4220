"""INT8 KV cache: accuracy vs bf16/f32 cache, engine integration
(BASELINE config 3 capability; the reference's vestigial int8 BMM promise)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.models.common import QuantKVCacheLayer, make_kv_cache
from autosmoothquant_tpu.quant.config import QuantConfig

TINY = dict(
    vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def setup():
    cfg = L.LlamaConfig(**TINY)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, size=(2, 24)))
    return cfg, params, ids


def test_int8_cache_structure(setup):
    cfg, _, _ = setup
    cache = L.init_kv_cache(cfg, 2, 32, jnp.int8)
    assert isinstance(cache, QuantKVCacheLayer)
    assert cache.k.dtype == jnp.int8
    assert cache.k_scale.shape == (cfg.num_hidden_layers, 2, 32,
                                   cfg.num_key_value_heads)


def test_int8_cache_close_to_f32(setup):
    cfg, params, ids = setup
    step = jax.jit(lambda p, i, c, idx: L.forward(
        p, i, cfg, kv_cache=c, cache_index=idx)[:2])

    logits_by_dtype = {}
    for dtype in (jnp.float32, jnp.int8):
        cache = L.init_kv_cache(cfg, 2, 32, dtype)
        h, cache = step(params, ids[:, :16], cache, 0)
        h2, cache = step(params, ids[:, 16:17], cache, 16)
        logits_by_dtype[dtype] = np.asarray(L.logits(params, h2))
    a, b = logits_by_dtype[jnp.float32], logits_by_dtype[jnp.int8]
    # int8 kv adds ~0.4% quant noise per head; logits must agree closely
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.05, rel
    assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.9


def test_int8_kv_with_quantized_weights(setup):
    """Config-3 combo: mixed-granularity int8 weights + int8 KV cache."""
    cfg, params, ids = setup
    from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize

    qcfg = QuantConfig(type="int8", qkv="per-tensor", out="per-token",
                       fc1="per-tensor", fc2="per-token")
    qparams, _ = calibrate_smooth_quantize(L, params, cfg, qcfg,
                                           lambda: [np.asarray(ids)])
    step = jax.jit(lambda p, i, c, idx: L.forward(
        p, i, cfg, qcfg, kv_cache=c, cache_index=idx)[:2])
    cache = L.init_kv_cache(cfg, 2, 32, jnp.int8)
    h, cache = step(qparams, ids[:, :16], cache, 0)
    assert np.isfinite(np.asarray(L.logits(qparams, h))).all()


def test_engine_with_int8_kv(setup):
    cfg, params, _ = setup
    from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

    eng_f32 = Engine(L, params, cfg, max_batch=2, max_seq=64,
                     kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    eng_i8 = Engine(L, params, cfg, max_batch=2, max_seq=64,
                    kv_dtype=jnp.int8, compute_dtype=jnp.float32)
    gc = GenerationConfig(max_new_tokens=8)
    a = eng_f32.generate([[1, 2, 3, 4, 5]], gc)[0]
    b = eng_i8.generate([[1, 2, 3, 4, 5]], gc)[0]
    # greedy chains usually agree for several tokens before quant noise forks
    assert a[:2] == b[:2]


def test_scale_roundtrip():
    from autosmoothquant_tpu.models.common import _quantize_kv

    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 3, 16)) * 5,
                    jnp.float32)
    q, s = _quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 4, 3)
    recon = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    err = np.abs(recon - np.asarray(x)).max()
    assert err <= np.asarray(s).max() / 2 + 1e-6
