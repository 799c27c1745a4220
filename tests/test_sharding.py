"""Tensor/data-parallel sharding on the virtual 8-device CPU mesh
(SURVEY.md §4 level 5): sharded forward must equal single-device forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.quant.config import QuantConfig
from autosmoothquant_tpu.shard import make_mesh, llama_param_specs, shard_params
from autosmoothquant_tpu.shard.sharding import shard_kv_cache
from jax.sharding import NamedSharding, PartitionSpec as P

TINY = dict(
    vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=8, num_key_value_heads=4, max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def setup():
    cfg = L.LlamaConfig(**TINY)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, size=(4, 16)))
    return cfg, params, ids


def test_eight_devices_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


def test_tp_forward_matches_single(setup):
    cfg, params, ids = setup
    ref = np.asarray(L.forward_jit(params, ids, cfg)[0])

    mesh = make_mesh(data=1, model=8)
    specs = llama_param_specs(cfg, mesh)
    sharded = shard_params(params, mesh, specs)
    h, _, _ = L.forward_jit(sharded, ids, cfg)
    np.testing.assert_allclose(np.asarray(h), ref, rtol=1e-5, atol=1e-5)


def test_tp_dp_quantized_forward(setup):
    cfg, params, ids = setup
    qcfg = QuantConfig(type="int8")
    from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize

    qparams, _ = calibrate_smooth_quantize(L, params, cfg, qcfg,
                                           lambda: [np.asarray(ids)])
    ref = np.asarray(L.forward_jit(qparams, ids, cfg, qcfg)[0])

    mesh = make_mesh(data=2, model=4)
    specs = llama_param_specs(cfg, mesh)
    sharded = shard_params(qparams, mesh, specs)
    sharded_ids = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    h, _, _ = L.forward_jit(sharded, sharded_ids, cfg, qcfg)
    np.testing.assert_allclose(np.asarray(h), ref, rtol=1e-4, atol=1e-4)


def test_sharded_decode_step(setup):
    """Prefill + one decode step with sharded params and KV cache."""
    cfg, params, ids = setup
    mesh = make_mesh(data=2, model=4)
    sharded = shard_params(params, mesh, llama_param_specs(cfg, mesh))
    cache = L.init_kv_cache(cfg, 4, 32, jnp.float32)
    cache = shard_kv_cache(cache, mesh, cfg)

    step = jax.jit(
        lambda p, i, c, idx: L.forward(p, i, cfg, kv_cache=c, cache_index=idx)[:2])
    h, cache = step(sharded, ids[:, :8], cache, 0)
    h2, cache = step(sharded, ids[:, 8:9], cache, 8)

    # compare vs unsharded incremental
    cache_u = L.init_kv_cache(cfg, 4, 32, jnp.float32)
    hu, cache_u = step(params, ids[:, :8], cache_u, 0)
    hu2, _ = step(params, ids[:, 8:9], cache_u, 8)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(hu2), rtol=1e-5, atol=1e-5)


def test_mesh_shapes():
    assert make_mesh(data=1, model=8).shape == {"data": 1, "model": 8}
    assert make_mesh(data=2).shape == {"data": 2, "model": 4}
    with pytest.raises(AssertionError):
        make_mesh(data=3, model=3)
