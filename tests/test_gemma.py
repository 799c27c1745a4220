"""Gemma family: llama module + load-time folds (norm 1+w, embed sqrt(D)
scale, tied unscaled head), explicit head_dim, gelu-tanh MLP.
Oracle-checked against HF Gemma."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.quant.config import QuantConfig


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import GemmaConfig, GemmaForCausalLM

    from autosmoothquant_tpu.convert.hf import gemma_params_from_state_dict
    from autosmoothquant_tpu.models import gemma as G

    hf_cfg = GemmaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=128,
        attn_implementation="eager")
    torch.manual_seed(0)
    hf = GemmaForCausalLM(hf_cfg).eval().float()
    cfg = G.LlamaConfig.from_hf(hf_cfg)
    assert cfg.hidden_act == "gelu_tanh"
    assert cfg.head_dim == 32  # explicit override (hidden/heads would be 16)
    params = gemma_params_from_state_dict(dict(hf.state_dict()),
                                          cfg.num_hidden_layers)
    return hf, G, cfg, params


def test_registry_routes_gemma():
    from autosmoothquant_tpu.models.registry import get_model_family

    mod, family = get_model_family(
        {"architectures": ["GemmaForCausalLM"], "model_type": "gemma"})
    assert family == "gemma" and mod.FAMILY == "gemma"


def test_hf_logits_parity(hf_pair):
    import torch

    hf, G, cfg, params = hf_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 256, size=(2, 24))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    h, _, _ = G.forward(params, jnp.asarray(ids, jnp.int32), cfg,
                        compute_dtype=jnp.float32)
    got = np.asarray(G.logits(params, h), np.float32)
    assert np.abs(got - want).max() < 5e-3, np.abs(got - want).max()


def test_int8_pipeline(hf_pair):
    from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize

    _, G, cfg, params = hf_pair
    rng = np.random.default_rng(1)
    calib = [rng.integers(1, 256, size=(2, 16)).astype(np.int32)
             for _ in range(2)]
    qcfg = QuantConfig(type="int8")
    qparams, _ = calibrate_smooth_quantize(G, params, cfg, qcfg,
                                           lambda: iter(calib))
    ids = jnp.asarray(rng.integers(1, 256, size=(2, 24)), jnp.int32)
    lg_fp = np.asarray(G.logits(params, G.forward_jit(params, ids, cfg)[0]))
    lg_q = np.asarray(G.logits(qparams, G.forward_jit(qparams, ids, cfg, qcfg)[0]))
    p = np.exp(lg_fp - lg_fp.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    q = np.exp(lg_q - lg_q.max(-1, keepdims=True))
    q /= q.sum(-1, keepdims=True)
    kl = (p * (np.log(p + 1e-12) - np.log(q + 1e-12))).sum(-1).mean()
    assert kl < 5e-3, kl


def test_engine_generation(hf_pair):
    from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

    _, G, cfg, params = hf_pair
    eng = Engine(G, params, cfg, max_batch=1, max_seq=64,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    p = np.random.default_rng(2).integers(1, 256, size=9).tolist()
    out = eng.generate([p], GenerationConfig(max_new_tokens=8))[0]
    assert len(out) == 8
    # cached decode must agree with the cacheless forward's greedy chain
    full = p + out
    h, _, _ = G.forward(params, jnp.asarray([full], jnp.int32), cfg,
                        compute_dtype=jnp.float32)
    lg = np.asarray(G.logits(params, h), np.float32)[0]
    for i, t in enumerate(out):
        assert int(lg[len(p) - 1 + i].argmax()) == t, i
