"""FP8 quantization for the non-llama families (round-2 review gap: the
converters existed only for llama while BASELINE config 4 targets
Baichuan FP8). The reference's fp8 path is llama-only
(ref: autosmoothquant/models/llama.py:143-176 from_float_to_fp8); these
tests pin its family-wide extension: dynamic/static e4m3 (with observer
input+output scales) and scale-free e5m2 for OPT, Baichuan (per-section
W_pack scales) and Mixtral (per-expert scales), plus ignore-pattern
resolution and checkpoint round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.quant.config import QuantConfig
from autosmoothquant_tpu.convert.pipeline import (
    calibrate_smooth_quantize, load_quantized, save_quantized)


def _kl(ref, got):
    p = np.exp(ref - ref.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    q = np.exp(got - got.max(-1, keepdims=True))
    q /= q.sum(-1, keepdims=True)
    return (p * (np.log(p + 1e-12) - np.log(q + 1e-12))).sum(-1).mean()


def _opt():
    from autosmoothquant_tpu.models import opt as M

    cfg = M.OPTConfig(vocab_size=128, hidden_size=64, ffn_dim=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=128)
    return M, cfg, M.init_params(cfg, jax.random.PRNGKey(0))


def _baichuan(pe="ROPE"):
    from autosmoothquant_tpu.models import baichuan as M

    cfg = M.BaichuanConfig(vocab_size=128, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=2,
                           num_attention_heads=4, model_max_length=128,
                           force_position_embedding=pe)
    return M, cfg, M.init_params(cfg, jax.random.PRNGKey(0))


def _mixtral():
    from autosmoothquant_tpu.models import mixtral as M

    cfg = M.MixtralConfig(vocab_size=128, hidden_size=64,
                          intermediate_size=96, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=2,
                          num_local_experts=4, num_experts_per_tok=2,
                          max_position_embeddings=128)
    return M, cfg, M.init_params(cfg, jax.random.PRNGKey(0))


FAMILIES = {"opt": _opt, "baichuan": _baichuan, "mixtral": _mixtral}


def _drive(M, cfg, params, qcfg, **kw):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 16)).astype(np.int32)
    qp, art = calibrate_smooth_quantize(M, params, cfg, qcfg,
                                        lambda: [ids], **kw)
    h, _, _ = M.forward_jit(params, jnp.asarray(ids), cfg)
    ref = np.asarray(M.logits(params, h))
    hq, _, _ = M.forward_jit(qp, jnp.asarray(ids), cfg, qcfg)
    got = np.asarray(M.logits(qp, hq))
    return qp, art, ids, ref, got


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_fp8_e4m3_dynamic_close_to_float(family):
    M, cfg, params = FAMILIES[family]()
    qcfg = QuantConfig(type="fp8_e4m3", activation_scheme="dynamic",
                       qkv="per-token", out="per-token",
                       fc1="per-token", fc2="per-token")
    qp, _, _, ref, got = _drive(M, cfg, params, qcfg)
    leaf = (qp["layers"]["attn"]["wpack"] if family == "baichuan"
            else qp["layers"]["attn"]["q"])
    assert leaf["w"].dtype == jnp.float8_e4m3fn
    assert np.isfinite(got).all()
    assert _kl(ref, got) < 2e-2, _kl(ref, got)


@pytest.mark.parametrize("family", sorted(FAMILIES))
@pytest.mark.parametrize("quantize_output", [False, True])
def test_fp8_e4m3_static_observer(family, quantize_output):
    M, cfg, params = FAMILIES[family]()
    qcfg = QuantConfig(type="fp8_e4m3", activation_scheme="static")
    qp, art, _, ref, got = _drive(M, cfg, params, qcfg,
                                  quantize_output=quantize_output)
    assert art["observer_scales"] is not None
    # every scale positive and finite
    for k, v in art["observer_scales"].items():
        a = np.asarray(v)
        assert np.isfinite(a).all() and (a > 0).all(), k
    # static input scales attached to the packed projections
    if family == "baichuan":
        assert "input_scale" in qp["layers"]["attn"]["wpack"]
    elif family == "mixtral":
        E = cfg.num_local_experts
        assert qp["layers"]["moe"]["w2"]["input_scale"].shape == (
            cfg.num_hidden_layers, E)
    else:
        assert "input_scale" in qp["layers"]["mlp"]["fc1"]
    assert np.isfinite(got).all()
    assert _kl(ref, got) < 3e-2, _kl(ref, got)


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_fp8_e5m2_runs_finite(family):
    M, cfg, params = FAMILIES[family]()
    qcfg = QuantConfig(type="fp8_e5m2")
    qp, _, _, _, got = _drive(M, cfg, params, qcfg)
    leaf = (qp["layers"]["attn"]["wpack"] if family == "baichuan"
            else qp["layers"]["attn"]["q"])
    assert leaf["w"].dtype == jnp.float8_e5m2
    assert "w_scale" not in leaf  # e5m2 is scale-free (ref linear.py:583-643)
    assert np.isfinite(got).all()


def test_baichuan_wpack_per_section_scales():
    """W_pack fp8 keeps per-SECTION weight scales: the [3D] column vector
    must hold exactly 3 distinct per-section values repeated D times (the
    fp8 analog of the int8 QKVLinear dequant vector)."""
    M, cfg, params = _baichuan()
    qcfg = QuantConfig(type="fp8_e4m3", activation_scheme="dynamic")
    qp, _, _, _, _ = _drive(M, cfg, params, qcfg)
    col = np.asarray(qp["layers"]["attn"]["wpack"]["w_scale"])
    D = cfg.hidden_size
    assert col.shape == (cfg.num_hidden_layers, 3 * D)
    for sec in range(3):
        sect = col[:, sec * D:(sec + 1) * D]
        assert (sect == sect[:, :1]).all()  # constant within a section
    # sections differ from one another (distinct absmaxes on random weights)
    assert len({col[0, 0], col[0, D], col[0, 2 * D]}) == 3


def test_baichuan_alibi_fp8():
    M, cfg, params = _baichuan("ALIBI")
    qcfg = QuantConfig(type="fp8_e4m3", activation_scheme="static")
    _, _, _, ref, got = _drive(M, cfg, params, qcfg)
    assert np.isfinite(got).all() and _kl(ref, got) < 3e-2


def test_mixtral_fp8_dense_sparse_parity(monkeypatch):
    """The routed (capacity-bucketed) expert path must agree with the dense
    path under fp8 exactly as it does under int8."""
    M, cfg, params = _mixtral()
    qcfg = QuantConfig(type="fp8_e4m3", activation_scheme="static")
    qp, _, ids, _, _ = _drive(M, cfg, params, qcfg, quantize_output=True)
    outs = {}
    for mode in ("dense", "sparse"):
        monkeypatch.setenv("ASQ_MOE", mode)
        h, _, _ = M.forward(qp, jnp.asarray(ids), cfg, qcfg)
        outs[mode] = np.asarray(M.logits(qp, h))
    np.testing.assert_allclose(outs["dense"], outs["sparse"],
                               rtol=1e-5, atol=1e-5)
    assert np.asarray(qp["layers"]["moe"]["w1"]["w_scale"]).shape == (
        cfg.num_hidden_layers, cfg.num_local_experts)


def test_opt_ignore_patterns_keep_projection_float():
    """The reference's get_layers_to_ignore regexes resolve against OPT's
    model.decoder.layers paths (HF_LAYER_FMT); an ignored projection stays
    in float while the rest quantize."""
    M, cfg, params = _opt()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 16)).astype(np.int32)
    qcfg = QuantConfig(type="fp8_e4m3", activation_scheme="dynamic")
    qp, _ = calibrate_smooth_quantize(
        M, params, cfg, qcfg, lambda: [ids],
        ignore_patterns=["re:.*lm_head", "re:.*fc2"])
    assert qp["layers"]["mlp"]["fc2"]["w"].dtype == jnp.float32
    assert qp["layers"]["mlp"]["fc1"]["w"].dtype == jnp.float8_e4m3fn
    h, _, _ = M.forward_jit(qp, jnp.asarray(ids), cfg, qcfg)
    assert np.isfinite(np.asarray(M.logits(qp, h))).all()


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_fp8_save_load_roundtrip(family, tmp_path):
    M, cfg, params = FAMILIES[family]()
    qcfg = QuantConfig(type="fp8_e4m3", activation_scheme="static")
    qp, art, ids, _, got = _drive(M, cfg, params, qcfg)
    save_quantized(str(tmp_path), qp, qcfg, artifacts=art)
    p2, qcfg2, _ = load_quantized(str(tmp_path))
    assert qcfg2 == qcfg
    h2, _, _ = M.forward_jit(p2, jnp.asarray(ids), cfg, qcfg2)
    got2 = np.asarray(M.logits(p2, h2))
    np.testing.assert_array_equal(got, got2)


def test_baichuan_fp8_lm_adapter_eval():
    """BASELINE config 4's executable stand-in: an fp8-e4m3 Baichuan driven
    through the lm-eval adapter + native harness (multiple-choice task) on
    the CPU mesh — loglikelihoods finite, fp8 accuracy tracks the fp32
    model's own answers on most items."""
    from autosmoothquant_tpu.eval.harness import MultipleChoiceTask, evaluate
    from autosmoothquant_tpu.eval.lm_adapter import JaxLM

    M, cfg, params = _baichuan()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 16)).astype(np.int32)
    qcfg = QuantConfig(type="fp8_e4m3", activation_scheme="static")
    qp, _ = calibrate_smooth_quantize(M, params, cfg, qcfg, lambda: [ids])

    docs = []
    for i in range(8):
        ctx = rng.integers(1, 128, size=6).tolist()
        choices = [rng.integers(1, 128, size=3).tolist() for _ in range(3)]
        docs.append((ctx, choices, int(i % 3)))
    task = MultipleChoiceTask("synthetic", docs)

    lm_fp = JaxLM(M, params, cfg, batch_size=4, max_length=64)
    lm_q = JaxLM(M, qp, cfg, qcfg, batch_size=4, max_length=64)
    acc_fp = evaluate(lm_fp, [task])["synthetic"]["acc"]
    acc_q = evaluate(lm_q, [task])["synthetic"]["acc"]
    assert 0.0 <= acc_q <= 1.0 and np.isfinite(acc_q)
    # fp8 must stay close to the fp32 harness accuracy on this tiny task
    assert abs(acc_q - acc_fp) <= 0.25, (acc_fp, acc_q)
