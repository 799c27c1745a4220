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
