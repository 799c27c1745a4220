"""TP/EP sharding for OPT, Baichuan, Mixtral on the virtual 8-device mesh:
sharded forward == replicated forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.shard import make_mesh, param_specs, shard_params
from autosmoothquant_tpu.quant.config import QuantConfig


def _check(model_mod, family, cfg, params, ids, qcfg=None, mesh=None):
    ref = np.asarray(model_mod.forward_jit(params, ids, cfg, qcfg)[0])
    sharded = shard_params(params, mesh, param_specs(family, cfg, mesh))
    got = np.asarray(model_mod.forward_jit(sharded, ids, cfg, qcfg)[0])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_opt_tp():
    from autosmoothquant_tpu.models import opt as M

    cfg = M.OPTConfig(vocab_size=256, hidden_size=64, ffn_dim=128,
                      num_hidden_layers=2, num_attention_heads=8,
                      word_embed_proj_dim=64, max_position_embeddings=64)
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, size=(2, 12)))
    _check(M, "opt", cfg, params, ids, mesh=make_mesh(data=1, model=8))


def test_baichuan_tp():
    from autosmoothquant_tpu.models import baichuan as M

    cfg = M.BaichuanConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                           num_hidden_layers=2, num_attention_heads=8,
                           model_max_length=64)
    params = M.init_params(cfg, jax.random.PRNGKey(1))
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, size=(2, 12)))
    _check(M, "baichuan", cfg, params, ids, mesh=make_mesh(data=2, model=4))


def test_mixtral_ep():
    """Experts sharded over a dedicated expert axis (EP), attention TP."""
    from autosmoothquant_tpu.models import mixtral as M

    cfg = M.MixtralConfig(vocab_size=256, hidden_size=64, intermediate_size=96,
                          num_hidden_layers=2, num_attention_heads=8,
                          num_key_value_heads=4, num_local_experts=4,
                          max_position_embeddings=64)
    params = M.init_params(cfg, jax.random.PRNGKey(2))
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, size=(2, 12)))
    mesh = make_mesh(data=1, model=2, expert=4)
    assert mesh.shape == {"data": 1, "expert": 4, "model": 2}
    _check(M, "mixtral", cfg, params, ids, mesh=mesh)


def test_mixtral_ep_quantized():
    from autosmoothquant_tpu.models import mixtral as M
    from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize

    cfg = M.MixtralConfig(vocab_size=256, hidden_size=64, intermediate_size=96,
                          num_hidden_layers=2, num_attention_heads=8,
                          num_key_value_heads=4, num_local_experts=4,
                          max_position_embeddings=64)
    params = M.init_params(cfg, jax.random.PRNGKey(3))
    ids = np.random.default_rng(3).integers(0, 256, size=(2, 12))
    qcfg = QuantConfig(type="int8")
    qparams, _ = calibrate_smooth_quantize(M, params, cfg, qcfg, lambda: [ids])
    mesh = make_mesh(data=1, model=2, expert=4)
    _check(M, "mixtral", cfg, qparams, jnp.asarray(ids), qcfg=qcfg, mesh=mesh)


def test_mixtral_ep_sparse_path(monkeypatch):
    """Routed (capacity-bucketed) expert compute under EP sharding: the
    batched [E, C, .] expert GEMMs ride the expert axis; outputs must match
    the replicated dense path."""
    from autosmoothquant_tpu.models import mixtral as M
    from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize

    cfg = M.MixtralConfig(vocab_size=256, hidden_size=64, intermediate_size=96,
                          num_hidden_layers=2, num_attention_heads=8,
                          num_key_value_heads=4, num_local_experts=4,
                          max_position_embeddings=64)
    params = M.init_params(cfg, jax.random.PRNGKey(4))
    ids = np.random.default_rng(4).integers(0, 256, size=(2, 32))
    qcfg = QuantConfig(type="int8")
    qparams, _ = calibrate_smooth_quantize(M, params, cfg, qcfg, lambda: [ids])

    monkeypatch.setenv("ASQ_MOE", "dense")
    jax.clear_caches()
    ref = np.asarray(M.forward_jit(qparams, jnp.asarray(ids), cfg, qcfg)[0])

    monkeypatch.setenv("ASQ_MOE", "sparse")
    jax.clear_caches()
    mesh = make_mesh(data=1, model=2, expert=4)
    sharded = shard_params(qparams, mesh, param_specs("mixtral", cfg, mesh))
    got = np.asarray(M.forward_jit(sharded, jnp.asarray(ids), cfg, qcfg)[0])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
