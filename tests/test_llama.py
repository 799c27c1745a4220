"""Llama family: parity vs HF transformers (fp32), quantize pipeline
accuracy, and KV-cache decode consistency (SURVEY.md §4 levels 3-4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.convert.hf import llama_params_from_state_dict
from autosmoothquant_tpu.quant.config import QuantConfig


TINY = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,  # exercise GQA
    max_position_embeddings=128,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
)


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(attn_implementation="eager", tie_word_embeddings=False, **TINY)
    model = LlamaForCausalLM(cfg).eval().to(torch.float32)
    return model


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    cfg = L.LlamaConfig(**TINY)
    sd = {k: v for k, v in hf_model.state_dict().items()}
    params = llama_params_from_state_dict(sd, cfg.num_hidden_layers)
    return cfg, params


@pytest.fixture(scope="module")
def ids():
    return np.random.default_rng(0).integers(0, TINY["vocab_size"], size=(2, 16))


def hf_logits(hf_model, ids):
    import torch

    with torch.no_grad():
        return hf_model(torch.tensor(ids)).logits.numpy()


class TestFloatParity:
    def test_logits_match_hf(self, hf_model, jax_setup, ids):
        cfg, params = jax_setup
        h, _, _ = L.forward_jit(params, jnp.asarray(ids), cfg)
        ours = np.asarray(L.logits(params, h))
        theirs = hf_logits(hf_model, ids)
        np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=3e-3)

    def test_capture_stats_shapes(self, jax_setup, ids):
        cfg, params = jax_setup
        _, _, stats = L.forward_jit(params, jnp.asarray(ids), cfg, capture_stats=True)
        Lh, D, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
        assert stats["qkv_in_ch_absmax"].shape == (Lh, D)
        assert stats["o_in_ch_absmax"].shape == (Lh, cfg.num_attention_heads * cfg.head_dim)
        assert stats["gate_in_ch_absmax"].shape == (Lh, D)
        assert stats["down_in_ch_absmax"].shape == (Lh, I)
        assert stats["q_out_absmax"].shape == (Lh,)


def quantize_tiny(cfg, params, qcfg, ids):
    from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize

    batches = lambda: [np.asarray(ids)]
    return calibrate_smooth_quantize(L, params, cfg, qcfg, batches)


class TestQuantizePipeline:
    @pytest.mark.parametrize("qkv,out,fc1,fc2", [
        ("per-tensor",) * 4,
        ("per-token",) * 4,
        ("per-tensor", "per-token", "per-tensor", "per-token"),  # mixed
    ])
    def test_int8_quantized_close_to_float(self, jax_setup, ids, qkv, out, fc1, fc2):
        cfg, params = jax_setup
        qcfg = QuantConfig(qkv=qkv, out=out, fc1=fc1, fc2=fc2, type="int8")
        qparams, artifacts = quantize_tiny(cfg, params, qcfg, ids)
        assert qparams["layers"]["attn"]["q"]["w"].dtype == jnp.int8

        h, _, _ = L.forward_jit(params, jnp.asarray(ids), cfg)
        ref = np.asarray(L.logits(params, h))
        hq, _, _ = L.forward_jit(qparams, jnp.asarray(ids), cfg, qcfg)
        got = np.asarray(L.logits(qparams, hq))
        # int8 W8A8: logits agree to a few percent; argmax must mostly agree
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.15, f"rel err {rel}"
        agree = (got.argmax(-1) == ref.argmax(-1)).mean()
        assert agree > 0.9, f"argmax agreement {agree}"

    def test_fp8_e4m3_dynamic(self, jax_setup, ids):
        cfg, params = jax_setup
        qcfg = QuantConfig(type="fp8_e4m3", activation_scheme="dynamic",
                           qkv="per-token", out="per-token",
                           fc1="per-token", fc2="per-token")
        qparams, _ = quantize_tiny(cfg, params, qcfg, ids)
        assert qparams["layers"]["attn"]["q"]["w"].dtype == jnp.float8_e4m3fn
        h, _, _ = L.forward_jit(params, jnp.asarray(ids), cfg)
        ref = np.asarray(L.logits(params, h))
        hq, _, _ = L.forward_jit(qparams, jnp.asarray(ids), cfg, qcfg)
        got = np.asarray(L.logits(qparams, hq))
        agree = (got.argmax(-1) == ref.argmax(-1)).mean()
        assert agree > 0.9

    def test_fp8_e5m2(self, jax_setup, ids):
        cfg, params = jax_setup
        qcfg = QuantConfig(type="fp8_e5m2")
        qparams, _ = quantize_tiny(cfg, params, qcfg, ids)
        assert qparams["layers"]["attn"]["q"]["w"].dtype == jnp.float8_e5m2
        hq, _, _ = L.forward_jit(qparams, jnp.asarray(ids), cfg, qcfg)
        assert np.isfinite(np.asarray(L.logits(qparams, hq))).all()

    def test_per_tensor_fold_into_norm(self, jax_setup, ids):
        """ln1 weight must be divided by attn_input_scale when qkv is
        per-tensor (ref: models/llama.py:326-339)."""
        cfg, params = jax_setup
        qcfg = QuantConfig(type="int8")  # all per-tensor
        qparams, artifacts = quantize_tiny(cfg, params, qcfg, ids)
        scales = artifacts["layer_scales"]
        # reconstruct: folded_ln1 = smoothed_ln1 / attn_input_scale
        from autosmoothquant_tpu.calibrate.calibrate import calibrate

        stats_fp = artifacts["act_stats_fp"]
        smoothed = L.smooth(params, stats_fp)
        expected = np.asarray(smoothed["layers"]["ln1"]["w"]) / np.asarray(
            scales["attn_input_scale"])[:, None]
        np.testing.assert_allclose(
            np.asarray(qparams["layers"]["ln1"]["w"]), expected, rtol=1e-5)

    def test_save_load_roundtrip(self, jax_setup, ids, tmp_path):
        cfg, params = jax_setup
        qcfg = QuantConfig(type="int8")
        qparams, artifacts = quantize_tiny(cfg, params, qcfg, ids)
        from autosmoothquant_tpu.convert.pipeline import save_quantized, load_quantized

        save_quantized(str(tmp_path), qparams, qcfg, config_dict=TINY,
                       artifacts=artifacts)
        p2, qcfg2, cfgd = load_quantized(str(tmp_path))
        assert qcfg2 == qcfg and cfgd["hidden_size"] == TINY["hidden_size"]
        h1, _, _ = L.forward_jit(qparams, jnp.asarray(ids), cfg, qcfg)
        h2, _, _ = L.forward_jit(p2, jnp.asarray(ids), cfg, qcfg2)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


class TestKVCache:
    def test_incremental_matches_full(self, jax_setup, ids):
        cfg, params = jax_setup
        jids = jnp.asarray(ids)
        h_full, _, _ = L.forward_jit(params, jids, cfg)
        full_logits = np.asarray(L.logits(params, h_full))

        cached_fwd = jax.jit(
            lambda p, i, c, idx: L.forward(p, i, cfg, kv_cache=c, cache_index=idx)[:2]
        )
        b, t = ids.shape
        cache = L.init_kv_cache(cfg, b, 32, dtype=jnp.float32)
        # prefill first 8 tokens, then decode one at a time
        h, cache = cached_fwd(params, jids[:, :8], cache, 0)
        step_logits = [np.asarray(L.logits(params, h))]
        for i in range(8, t):
            h, cache = cached_fwd(params, jids[:, i:i + 1], cache, i)
            step_logits.append(np.asarray(L.logits(params, h)))
        inc = np.concatenate(step_logits, axis=1)
        np.testing.assert_allclose(inc, full_logits, rtol=2e-4, atol=2e-4)
