"""OPT family: HF parity (pre-LN and post-LN+projections), quantize
pipeline, generation smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.models import opt as M
from autosmoothquant_tpu.convert.hf import opt_params_from_state_dict
from autosmoothquant_tpu.quant.config import QuantConfig

TINY = dict(
    vocab_size=256, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
    num_attention_heads=4, max_position_embeddings=128,
    word_embed_proj_dim=64, do_layer_norm_before=True,
)


def build_hf(**over):
    torch = pytest.importorskip("torch")
    from transformers import OPTConfig, OPTForCausalLM

    kw = dict(TINY)
    kw.update(over)
    torch.manual_seed(0)
    hf = OPTForCausalLM(OPTConfig(attn_implementation="eager", **kw)).eval().float()
    return hf, kw


@pytest.fixture(scope="module")
def setup():
    hf, kw = build_hf()
    cfg = M.OPTConfig(**{k: v for k, v in kw.items()})
    params = opt_params_from_state_dict(dict(hf.state_dict()), cfg.num_hidden_layers)
    ids = np.random.default_rng(0).integers(0, 256, size=(2, 16))
    return hf, cfg, params, ids


def hf_logits(hf, ids):
    import torch

    with torch.no_grad():
        return hf(torch.tensor(ids)).logits.numpy()


def test_logits_match_hf(setup):
    hf, cfg, params, ids = setup
    h, _, _ = M.forward_jit(params, jnp.asarray(ids), cfg)
    ours = np.asarray(M.logits(params, h))
    np.testing.assert_allclose(ours, hf_logits(hf, ids), rtol=2e-4, atol=3e-3)


def test_post_ln_with_projections_matches_hf():
    hf, kw = build_hf(do_layer_norm_before=False, word_embed_proj_dim=32)
    cfg = M.OPTConfig(**kw)
    params = opt_params_from_state_dict(dict(hf.state_dict()), cfg.num_hidden_layers)
    assert "project_in" in params and "project_out" in params
    ids = np.random.default_rng(1).integers(0, 256, size=(2, 12))
    h, _, _ = M.forward_jit(params, jnp.asarray(ids), cfg)
    ours = np.asarray(M.logits(params, h))
    np.testing.assert_allclose(ours, hf_logits(hf, ids), rtol=2e-4, atol=3e-3)


@pytest.mark.parametrize("gran", ["per-tensor", "per-token"])
def test_int8_pipeline(setup, gran):
    _, cfg, params, ids = setup
    from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize

    qcfg = QuantConfig(type="int8", qkv=gran, out=gran, fc1=gran, fc2=gran)
    qparams, _ = calibrate_smooth_quantize(
        M, params, cfg, qcfg, lambda: [np.asarray(ids)])
    assert qparams["layers"]["attn"]["q"]["w"].dtype == jnp.int8
    assert qparams["layers"]["attn"]["q"]["bias"] is not None

    h, _, _ = M.forward_jit(params, jnp.asarray(ids), cfg)
    ref = np.asarray(M.logits(params, h))
    hq, _, _ = M.forward_jit(qparams, jnp.asarray(ids), cfg, qcfg)
    got = np.asarray(M.logits(qparams, hq))

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    p, q = softmax(ref), softmax(got)
    kl = (p * (np.log(p + 1e-12) - np.log(q + 1e-12))).sum(-1).mean()
    assert kl < 5e-3, kl


def test_post_ln_int8_uses_quant_scale():
    hf, kw = build_hf(do_layer_norm_before=False)
    cfg = M.OPTConfig(**kw)
    params = opt_params_from_state_dict(dict(hf.state_dict()), cfg.num_hidden_layers)
    from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize

    ids = np.random.default_rng(2).integers(0, 256, size=(2, 12))
    qcfg = QuantConfig(type="int8")  # per-tensor everywhere
    qparams, _ = calibrate_smooth_quantize(
        M, params, cfg, qcfg, lambda: [ids])
    # post-LN: qkv carries explicit quant_scale, LN is NOT folded
    assert "quant_scale" in qparams["layers"]["attn"]["q"]
    np.testing.assert_array_equal(
        np.asarray(qparams["layers"]["ln1"]["w"]),
        np.asarray(params["layers"]["ln1"]["w"]))
    hq, _, _ = M.forward_jit(qparams, jnp.asarray(ids), cfg, qcfg)
    assert np.isfinite(np.asarray(M.logits(qparams, hq))).all()


def test_generation_matches_hf(setup):
    import torch

    hf, cfg, params, _ = setup
    from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

    prompt = [11, 4, 7, 200, 35]
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor([prompt]), max_new_tokens=8,
                             do_sample=False, pad_token_id=1,
                             )[0, len(prompt):].tolist()
    eng = Engine(M, params, cfg, max_batch=2, max_seq=64,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    ours = eng.generate([prompt], GenerationConfig(max_new_tokens=8))[0]
    assert ours == hf_out, (ours, hf_out)

    out = eng.generate([[1, 2, 3], [9, 8, 7, 6]],
                       GenerationConfig(max_new_tokens=6))
    assert len(out) == 2 and all(len(o) == 6 for o in out)
