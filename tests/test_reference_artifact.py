"""Cross-implementation artifact parity (round-2 review item 3): the
REFERENCE implementation quantizes a tiny Llama on CPU torch
(calibrate -> smooth_lm -> static scales -> from_float_to_int8 ->
save_pretrained, driven through tools/reference_oracle.py), and THIS
framework loads the resulting artifact via
convert/hf.py:load_reference_quantized. The loaded params must agree with
natively quantizing the same fp weights over the same calibration data —
the strongest ground-truth parity evidence available with zero egress
(ref: examples/test_model.py:35-41 load contract)."""

import copy
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.convert.hf import (
    llama_params_from_state_dict, load_reference_quantized)
from autosmoothquant_tpu.convert.pipeline import calibrate_smooth_quantize
from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.quant.config import QuantConfig

TINY = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128)


@pytest.fixture(scope="module")
def setup():
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree unavailable")
    torch = pytest.importorskip("torch")
    pytest.importorskip("datasets")
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        attn_implementation="eager", tie_word_embeddings=False, **TINY)
    ).eval().float()
    cfg = L.LlamaConfig(**TINY)
    rng = np.random.default_rng(0)
    calib = [rng.integers(1, 128, size=(2, 16)).astype(np.int32)
             for _ in range(2)]
    ids = rng.integers(1, 128, size=(2, 16)).astype(np.int32)
    return hf, cfg, calib, ids


def _make_artifact(hf, calib, tmp_path, quant_config=None):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    try:
        from reference_oracle import make_llama_artifact
    finally:
        sys.path.pop(0)
    outdir = str(tmp_path / "ref_artifact")
    make_llama_artifact(outdir, copy.deepcopy(hf), calib,
                        quant_config=quant_config)
    return outdir


def test_reference_int8_artifact_loads_and_matches_native(setup, tmp_path):
    hf, cfg, calib, ids = setup
    outdir = _make_artifact(hf, calib, tmp_path)

    loaded, qcfg = load_reference_quantized(outdir, "llama",
                                            cfg.num_hidden_layers)
    assert qcfg == QuantConfig(type="int8")  # all per-tensor

    # native path over the SAME fp weights + calibration data
    params = llama_params_from_state_dict(dict(hf.state_dict()),
                                          cfg.num_hidden_layers)
    native, _ = calibrate_smooth_quantize(L, params, cfg, qcfg,
                                          lambda: list(calib))

    # 1. int8 weights: identical up to off-by-one rounding flips from
    # low-order fp noise between torch and XLA smoothing arithmetic
    for grp, name in (("attn", "q"), ("attn", "k"), ("attn", "v"),
                      ("attn", "o"), ("mlp", "gate"), ("mlp", "up"),
                      ("mlp", "down")):
        a = np.asarray(loaded["layers"][grp][name]["w"], np.int32)
        b = np.asarray(native["layers"][grp][name]["w"], np.int32)
        diff = np.abs(a - b)
        assert diff.max() <= 1, f"{grp}.{name}: max int diff {diff.max()}"
        frac = (diff > 0).mean()
        assert frac < 0.02, f"{grp}.{name}: {frac:.1%} weights differ"
        # 2. scale buffers agree tightly
        np.testing.assert_allclose(
            np.asarray(loaded["layers"][grp][name]["dequant_scale"]),
            np.asarray(native["layers"][grp][name]["dequant_scale"]),
            rtol=5e-3, err_msg=f"{grp}.{name} dequant_scale")
    for name in ("o", "down"):
        grp = "attn" if name == "o" else "mlp"
        np.testing.assert_allclose(
            np.asarray(loaded["layers"][grp][name]["quant_scale"]),
            np.asarray(native["layers"][grp][name]["quant_scale"]),
            rtol=5e-3)

    # 3. folded norm weights agree (the per-tensor fold-into-norm identity)
    for ln in ("ln1", "ln2"):
        np.testing.assert_allclose(np.asarray(loaded["layers"][ln]["w"]),
                                   np.asarray(native["layers"][ln]["w"]),
                                   rtol=5e-3, atol=1e-6)

    # 4. end-to-end: the loaded artifact must generate logits matching the
    # natively quantized model closely, and stay sane vs fp
    jids = jnp.asarray(ids)
    lg_loaded = np.asarray(L.logits(loaded, L.forward_jit(
        loaded, jids, cfg, qcfg)[0]))
    lg_native = np.asarray(L.logits(native, L.forward_jit(
        native, jids, cfg, qcfg)[0]))
    lg_fp = np.asarray(L.logits(params, L.forward_jit(params, jids, cfg)[0]))
    assert np.isfinite(lg_loaded).all()
    rel = (np.abs(lg_loaded - lg_native).max()
           / (np.abs(lg_native).max() + 1e-9))
    assert rel < 0.05, f"loaded vs native rel diff {rel}"
    agree = (lg_loaded.argmax(-1) == lg_fp.argmax(-1)).mean()
    assert agree > 0.85, f"argmax agreement vs fp {agree}"


def test_reference_per_token_artifact(setup, tmp_path):
    """per-token everywhere: no norm folds, dequant_scale = weight scale
    only, no quant_scale buffers — the other half of the load contract."""
    hf, cfg, calib, ids = setup
    qc = {"qkv": "per-token", "out": "per-token", "fc1": "per-token",
          "fc2": "per-token", "type": "int8"}
    outdir = _make_artifact(hf, calib, tmp_path, quant_config=qc)
    loaded, qcfg = load_reference_quantized(outdir, "llama",
                                            cfg.num_hidden_layers)
    assert qcfg.qkv == "per-token"
    assert "quant_scale" not in loaded["layers"]["attn"]["o"]
    jids = jnp.asarray(ids)
    lg = np.asarray(L.logits(loaded, L.forward_jit(loaded, jids, cfg,
                                                   qcfg)[0]))
    params = llama_params_from_state_dict(dict(hf.state_dict()),
                                          cfg.num_hidden_layers)
    lg_fp = np.asarray(L.logits(params, L.forward_jit(params, jids, cfg)[0]))
    assert np.isfinite(lg).all()
    agree = (lg.argmax(-1) == lg_fp.argmax(-1)).mean()
    assert agree > 0.85, agree


def test_cli_loads_reference_artifact_directly(setup, tmp_path, capsys):
    """A reference user's existing quantized checkpoint serves through
    THIS framework's test_model.py unchanged (load_any_quantized format
    auto-detection)."""
    import importlib.util
    import sys

    hf, cfg, calib, ids = setup
    outdir = _make_artifact(hf, calib, tmp_path)

    spec = importlib.util.spec_from_file_location(
        "test_model_cli", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "examples", "test_model.py"))
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    argv = ["test_model.py", "--quantized-model-path", outdir,
            "--prompt-ids", "7,12,9,101,44",
            "--max-new-tokens", "4", "--max-seq", "64"]
    old = sys.argv
    sys.argv = argv
    try:
        cli.main()
    finally:
        sys.argv = old
    assert capsys.readouterr().out.strip()


# -- Baichuan + Mixtral artifact parity (r3 verdict item 5) -------------------


@pytest.fixture(scope="module")
def baichuan_setup():
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree unavailable")
    torch = pytest.importorskip("torch")
    pytest.importorskip("datasets")
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from autosmoothquant.thirdparty.baichuan.configuration_baichuan import (
            BaichuanConfig as RefCfg)
        from autosmoothquant.thirdparty.baichuan.modeling_baichuan import (
            BaichuanForCausalLM)
    finally:
        sys.path.remove("/root/reference")
    torch.manual_seed(0)
    tiny = dict(vocab_size=128, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                model_max_length=128)
    hf = BaichuanForCausalLM(RefCfg(**tiny)).eval().float()
    # vendored default init NaNs in its own forward; re-init sanely (same
    # treatment as tests/test_baichuan.py torch_oracle)
    with torch.no_grad():
        for name, p in hf.named_parameters():
            if p.ndim == 2:
                torch.nn.init.normal_(p, std=0.05)
            elif p.ndim == 1:
                p.fill_(1.0)
    from autosmoothquant_tpu.models import baichuan as B

    cfg = B.BaichuanConfig(**tiny)
    rng = np.random.default_rng(1)
    calib = [rng.integers(1, 128, size=(2, 16)).astype(np.int32)
             for _ in range(2)]
    ids = rng.integers(1, 128, size=(2, 16)).astype(np.int32)
    return hf, cfg, calib, ids


def _oracle():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    try:
        import reference_oracle
    finally:
        sys.path.pop(0)
    return reference_oracle


def test_reference_baichuan_artifact(baichuan_setup, tmp_path):
    """The reference's own Baichuan from_float artifact (W_pack per-section
    scalars, folded RMSNorms, raw NormHead) loads and matches natively
    quantizing the same weights (ref: models/baichuan.py:535-575)."""
    from autosmoothquant_tpu.convert.hf import baichuan_params_from_state_dict
    from autosmoothquant_tpu.models import baichuan as B

    hf, cfg, calib, ids = baichuan_setup
    outdir = str(tmp_path / "ref_baichuan")
    _oracle().make_baichuan_artifact(outdir, copy.deepcopy(hf), calib)

    loaded, qcfg = load_reference_quantized(outdir, "baichuan",
                                            cfg.num_hidden_layers)
    assert qcfg == QuantConfig(type="int8")

    params = baichuan_params_from_state_dict(dict(hf.state_dict()),
                                             cfg.num_hidden_layers)
    native, _ = calibrate_smooth_quantize(B, params, cfg, qcfg,
                                          lambda: list(calib))

    # W_pack int8 bytes + per-section column scales agree
    a = np.asarray(loaded["layers"]["attn"]["wpack"]["w"], np.int32)
    b = np.asarray(native["layers"]["attn"]["wpack"]["w"], np.int32)
    assert np.abs(a - b).max() <= 1 and (np.abs(a - b) > 0).mean() < 0.02
    np.testing.assert_allclose(
        np.asarray(loaded["layers"]["attn"]["wpack"]["dequant_scale"]),
        np.asarray(native["layers"]["attn"]["wpack"]["dequant_scale"]),
        rtol=5e-3)
    for grp, name in (("attn", "o"), ("mlp", "gate"), ("mlp", "up"),
                      ("mlp", "down")):
        a = np.asarray(loaded["layers"][grp][name]["w"], np.int32)
        b = np.asarray(native["layers"][grp][name]["w"], np.int32)
        assert np.abs(a - b).max() <= 1, f"{grp}.{name}"
        np.testing.assert_allclose(
            np.asarray(loaded["layers"][grp][name]["dequant_scale"]),
            np.asarray(native["layers"][grp][name]["dequant_scale"]),
            rtol=5e-3, err_msg=f"{grp}.{name}")

    # end-to-end logits: loaded vs native close, sane vs fp
    jids = jnp.asarray(ids)
    lg_loaded = np.asarray(B.logits(loaded, B.forward_jit(
        loaded, jids, cfg, qcfg)[0]))
    lg_native = np.asarray(B.logits(native, B.forward_jit(
        native, jids, cfg, qcfg)[0]))
    lg_fp = np.asarray(B.logits(params, B.forward_jit(params, jids, cfg)[0]))
    assert np.isfinite(lg_loaded).all()
    rel = (np.abs(lg_loaded - lg_native).max()
           / (np.abs(lg_native).max() + 1e-9))
    assert rel < 0.05, rel
    agree = (lg_loaded.argmax(-1) == lg_fp.argmax(-1)).mean()
    assert agree > 0.85, agree


@pytest.fixture(scope="module")
def mixtral_setup():
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree unavailable")
    torch = pytest.importorskip("torch")
    pytest.importorskip("datasets")
    from transformers import MixtralConfig, MixtralForCausalLM

    tiny = dict(vocab_size=128, hidden_size=64, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, num_local_experts=4,
                num_experts_per_tok=2, max_position_embeddings=128)
    torch.manual_seed(0)
    hf = MixtralForCausalLM(MixtralConfig(
        attn_implementation="eager", tie_word_embeddings=False, **tiny)
    ).eval().float()
    from autosmoothquant_tpu.models import mixtral as X

    cfg = X.MixtralConfig(**{k: v for k, v in tiny.items()
                             if k != "attn_implementation"},
                          rms_norm_eps=1e-5, rope_theta=10000.0)
    rng = np.random.default_rng(2)
    calib = [rng.integers(1, 128, size=(2, 16)).astype(np.int32)
             for _ in range(2)]
    ids = rng.integers(1, 128, size=(2, 16)).astype(np.int32)
    return hf, cfg, calib, ids


def test_reference_mixtral_artifact(mixtral_setup, tmp_path):
    """The reference's Mixtral from_float artifact (per-expert int8 w1/w2/w3
    with scalar scales, fp router) loads into the stacked [L, E, in, out]
    pytree and matches native quantization (ref: models/mixtral.py:253-296;
    all-experts calibration, calibration.py:27-36)."""
    from autosmoothquant_tpu.convert.hf import mixtral_params_from_state_dict
    from autosmoothquant_tpu.models import mixtral as X

    hf, cfg, calib, ids = mixtral_setup
    outdir = str(tmp_path / "ref_mixtral")
    _oracle().make_mixtral_artifact(outdir, copy.deepcopy(hf), calib)

    loaded, qcfg = load_reference_quantized(outdir, "mixtral",
                                            cfg.num_hidden_layers)
    assert qcfg == QuantConfig(type="int8")
    E = cfg.num_local_experts
    assert loaded["layers"]["moe"]["w1"]["w"].shape[:2] == (
        cfg.num_hidden_layers, E)
    assert loaded["layers"]["moe"]["w2"]["quant_scale"].shape == (
        cfg.num_hidden_layers, E)

    params = mixtral_params_from_state_dict(dict(hf.state_dict()),
                                            cfg.num_hidden_layers,
                                            num_experts=E)
    native, _ = calibrate_smooth_quantize(X, params, cfg, qcfg,
                                          lambda: list(calib))

    for name in ("w1", "w2", "w3"):
        a = np.asarray(loaded["layers"]["moe"][name]["w"], np.int32)
        b = np.asarray(native["layers"]["moe"][name]["w"], np.int32)
        assert np.abs(a - b).max() <= 1, name
        # w2's dequant folds the per-expert ROUTED-token input absmax
        # (static pass, top-2 routing) — layer-1 entries carry second-order
        # drift through layer-0's MoE output (torch vs XLA reduce orders),
        # measured ~0.7% worst-case; w1/w3 fold the shared moe scale and
        # stay within the fp-noise bound
        np.testing.assert_allclose(
            np.asarray(loaded["layers"]["moe"][name]["dequant_scale"]),
            np.asarray(native["layers"]["moe"][name]["dequant_scale"]),
            rtol=(1.5e-2 if name == "w2" else 5e-3), err_msg=name)
    # router stays fp (never int8-quantized) but IS smoothed with ln2
    # (ref smooth.py:88-93 includes gate in fcs) — allow smoothing-factor
    # fp drift, and verify the mapping is the right weight/orientation
    np.testing.assert_allclose(
        np.asarray(loaded["layers"]["moe"]["router"]["w"]),
        np.asarray(native["layers"]["moe"]["router"]["w"]),
        rtol=2e-2, atol=1e-5)

    jids = jnp.asarray(ids)
    lg_loaded = np.asarray(X.logits(loaded, X.forward_jit(
        loaded, jids, cfg, qcfg)[0]))
    lg_native = np.asarray(X.logits(native, X.forward_jit(
        native, jids, cfg, qcfg)[0]))
    lg_fp = np.asarray(X.logits(params, X.forward_jit(params, jids, cfg)[0]))
    assert np.isfinite(lg_loaded).all()
    rel = (np.abs(lg_loaded - lg_native).max()
           / (np.abs(lg_native).max() + 1e-9))
    assert rel < 0.05, rel
    # loader-specific gate: the reference artifact and native quantization
    # pick the same greedy tokens almost everywhere
    agree_native = (lg_loaded.argmax(-1) == lg_native.argmax(-1)).mean()
    assert agree_native > 0.9, agree_native
    # quantization-noise gate vs fp: random tiny MoE logits are near-flat
    # (top-2 routed experts amplify int8 noise), so the bar is looser than
    # the dense-llama test's 0.85
    agree = (lg_loaded.argmax(-1) == lg_fp.argmax(-1)).mean()
    assert agree > 0.7, agree
