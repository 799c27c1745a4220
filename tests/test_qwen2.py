"""Qwen2 family: the llama functional module + QKV biases (attention_bias).
Beyond-reference model-zoo coverage, oracle-checked against HF Qwen2."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.quant.config import QuantConfig


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from autosmoothquant_tpu.convert.hf import llama_params_from_state_dict

    hf_cfg = Qwen2Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=128, tie_word_embeddings=False,
        attn_implementation="eager")
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(hf_cfg).eval().float()
    cfg = L.LlamaConfig.from_hf(hf_cfg)
    assert cfg.attention_bias  # detected from model_type == "qwen2"
    params = llama_params_from_state_dict(
        {k: v for k, v in hf.state_dict().items()}, cfg.num_hidden_layers)
    assert "bias" in params["layers"]["attn"]["q"]
    assert "bias" not in params["layers"]["attn"]["o"]
    return hf, cfg, params


def test_registry_routes_qwen2():
    from autosmoothquant_tpu.models.registry import get_model_family

    mod, family = get_model_family(
        {"architectures": ["Qwen2ForCausalLM"], "model_type": "qwen2"})
    assert family == "llama" and mod is L


def test_hf_logits_parity(hf_pair):
    import torch

    hf, cfg, params = hf_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, size=(2, 24))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    h, _, _ = L.forward(params, jnp.asarray(ids, jnp.int32), cfg,
                        compute_dtype=jnp.float32)
    got = np.asarray(L.logits(params, h), np.float32)
    assert np.abs(got - want).max() < 5e-3


def test_int8_pipeline_preserves_biases(hf_pair):
    from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize

    _, cfg, params = hf_pair
    rng = np.random.default_rng(1)
    calib = [rng.integers(0, 256, size=(2, 16)).astype(np.int32)
             for _ in range(2)]
    qcfg = QuantConfig(type="int8")
    qparams, _ = calibrate_smooth_quantize(L, params, cfg, qcfg,
                                           lambda: iter(calib))
    assert "bias" in qparams["layers"]["attn"]["q"]
    ids = jnp.asarray(rng.integers(0, 256, size=(2, 24)), jnp.int32)
    lg_fp = np.asarray(L.logits(params, L.forward_jit(params, ids, cfg)[0]))
    lg_q = np.asarray(L.logits(qparams, L.forward_jit(qparams, ids, cfg, qcfg)[0]))
    p = np.exp(lg_fp - lg_fp.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    q = np.exp(lg_q - lg_q.max(-1, keepdims=True))
    q /= q.sum(-1, keepdims=True)
    kl = (p * (np.log(p + 1e-12) - np.log(q + 1e-12))).sum(-1).mean()
    assert kl < 5e-3, kl


def test_fused_projections_keep_biases(hf_pair):
    from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

    _, cfg, params = hf_pair
    fused = L.fuse_decode_projections(params)
    assert "bias" in fused["layers"]["attn"]["qkv"]
    assert "bias" not in fused["layers"]["mlp"]["gateup"]
    p = np.random.default_rng(2).integers(1, 256, size=9).tolist()
    auto = Engine(L, params, cfg, max_batch=1, max_seq=64,
                  kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    plain = Engine(L, params, cfg, max_batch=1, max_seq=64,
                   kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                   fuse_projections=False)
    gc = GenerationConfig(max_new_tokens=8)
    assert auto.generate([p], gc) == plain.generate([p], gc)


def test_tp_sharded_matches_single(hf_pair):
    """Qwen2 bias leaves shard column-parallel with their weights; sharded
    generation equals single-device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig
    from autosmoothquant_tpu.shard import make_mesh

    _, cfg, params = hf_pair
    p = np.random.default_rng(3).integers(1, 256, size=9).tolist()
    single = Engine(L, params, cfg, max_batch=1, max_seq=64,
                    kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    want = single.generate([p], GenerationConfig(max_new_tokens=8))
    mesh = make_mesh(data=2, model=4)
    eng = Engine(L, params, cfg, max_batch=8, max_seq=64,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32, mesh=mesh)
    spec = eng.params["layers"]["attn"]["q"]["bias"].sharding.spec
    assert tuple(spec) == (None, "model")
    assert eng.generate([p], GenerationConfig(max_new_tokens=8)) == want


class TestMistral:
    """Mistral is the llama architecture exactly; sliding windows are
    supported by refusing spans where they would bind (exact within)."""

    def test_hf_parity_and_window_guard(self):
        torch = pytest.importorskip("torch")
        from transformers import MistralConfig, MistralForCausalLM

        from autosmoothquant_tpu.convert.hf import llama_params_from_state_dict
        from autosmoothquant_tpu.models.registry import get_model_family

        hf_cfg = MistralConfig(
            vocab_size=256, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=8,
            num_key_value_heads=4, max_position_embeddings=256,
            sliding_window=64, attn_implementation="eager")
        torch.manual_seed(0)
        hf = MistralForCausalLM(hf_cfg).eval().float()
        mod, family = get_model_family(
            {"architectures": ["MistralForCausalLM"],
             "model_type": "mistral"})
        assert family == "llama"
        cfg = mod.LlamaConfig.from_hf(hf_cfg)
        assert cfg.sliding_window == 64
        params = llama_params_from_state_dict(dict(hf.state_dict()),
                                              cfg.num_hidden_layers)
        rng = np.random.default_rng(0)
        ids = rng.integers(1, 256, size=(2, 24))
        import torch as _t
        with _t.no_grad():
            want = hf(_t.tensor(ids)).logits.numpy()
        h, _, _ = mod.forward(params, jnp.asarray(ids, jnp.int32), cfg,
                              compute_dtype=jnp.float32)
        got = np.asarray(mod.logits(params, h), np.float32)
        assert np.abs(got - want).max() < 5e-3
        # BINDING window (span 80 > window 64): windowed masks must match
        # HF's eager sliding-window attention exactly
        long_ids = rng.integers(1, 256, size=(1, 80))
        with _t.no_grad():
            want_l = hf(_t.tensor(long_ids)).logits.numpy()
        h2, _, _ = mod.forward(params, jnp.asarray(long_ids, jnp.int32), cfg,
                               compute_dtype=jnp.float32)
        got_l = np.asarray(mod.logits(params, h2), np.float32)
        assert np.abs(got_l - want_l).max() < 5e-3, np.abs(got_l - want_l).max()

    def test_windowed_cached_decode_matches_cacheless(self):
        """Cached decode with a binding sliding window must reproduce the
        cacheless windowed forward's greedy chain."""
        from autosmoothquant_tpu.models import llama as L
        from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

        cfg = L.LlamaConfig(vocab_size=128, hidden_size=64,
                            intermediate_size=128, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=2,
                            max_position_embeddings=256, sliding_window=24)
        params = L.init_params(cfg, jax.random.PRNGKey(0))
        p = np.random.default_rng(4).integers(1, 128, size=30).tolist()
        eng = Engine(L, params, cfg, max_batch=1, max_seq=96,
                     kv_dtype=jnp.float32, compute_dtype=jnp.float32)
        out = eng.generate([p], GenerationConfig(max_new_tokens=10))[0]
        full = p + out
        h, _, _ = L.forward(params, jnp.asarray([full], jnp.int32), cfg,
                            compute_dtype=jnp.float32)
        lg = np.asarray(L.logits(params, h), np.float32)[0]
        for i, t in enumerate(out):
            assert int(lg[len(p) - 1 + i].argmax()) == t, i
