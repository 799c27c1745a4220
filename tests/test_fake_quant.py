"""Fake-quant research path + ignore-pattern matching."""

import numpy as np
import jax
import jax.numpy as jnp

from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.quant.fake_quant import (
    fake_quantize_act,
    fake_quantize_params,
    fake_quantize_weight,
)
from autosmoothquant_tpu.quant.ignore import match_ignore_patterns


def test_weight_roundtrip_error_bounded():
    w = jnp.asarray(np.random.default_rng(0).normal(size=(64, 32)), jnp.float32)
    for mode in ("per_channel", "per_tensor"):
        fq = fake_quantize_weight(w, mode)
        scale = np.abs(np.asarray(w)).max() / 127
        assert np.abs(np.asarray(fq) - np.asarray(w)).max() <= scale / 2 + 1e-6
    # per-channel strictly tighter than per-tensor on anisotropic weights
    w2 = w * jnp.asarray(np.logspace(-2, 1, 32)[None, :], jnp.float32)
    e_pc = np.abs(np.asarray(fake_quantize_weight(w2, "per_channel")) - np.asarray(w2)).max()
    e_pt = np.abs(np.asarray(fake_quantize_weight(w2, "per_tensor")) - np.asarray(w2)).max()
    assert e_pc < e_pt


def test_fake_params_model_still_close():
    cfg = L.LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=4, max_position_embeddings=64)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    fq = fake_quantize_params(params)
    # untouched leaves
    np.testing.assert_array_equal(np.asarray(fq["embed"]["w"]),
                                  np.asarray(params["embed"]["w"]))
    np.testing.assert_array_equal(np.asarray(fq["lm_head"]["w"]),
                                  np.asarray(params["lm_head"]["w"]))
    # touched leaves differ but model output stays close
    assert not np.array_equal(np.asarray(fq["layers"]["attn"]["q"]["w"]),
                              np.asarray(params["layers"]["attn"]["q"]["w"]))
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 128, size=(2, 12)))
    a = np.asarray(L.forward_jit(params, ids, cfg)[0])
    b = np.asarray(L.forward_jit(fq, ids, cfg)[0])
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 0.1


def test_fake_act():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 32)), jnp.float32)
    for mode in ("per_token", "per_tensor"):
        fq = fake_quantize_act(x, mode)
        assert fq.shape == x.shape and fq.dtype == x.dtype


def test_ignore_patterns():
    names = ["model.layers.0.mlp.gate_proj", "lm_head", "model.lm_head",
             "model.layers.1.self_attn.q_proj"]
    assert match_ignore_patterns(names, ["re:.*lm_head"]) == ["lm_head", "model.lm_head"]
    assert match_ignore_patterns(names, ["lm_head"]) == ["lm_head"]
    assert match_ignore_patterns(names, ["re:.*mlp.*", "lm_head"]) == [
        "model.layers.0.mlp.gate_proj", "lm_head"]
