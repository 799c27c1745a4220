"""Autotuner plumbing (host-side pieces; actual timing sweeps run on TPU):
candidate enumeration legality, table write/load round-trip, shape helpers."""

import json

import numpy as np
import pytest

from autosmoothquant_tpu.kernels.autotune import (
    candidate_blocks, model_gemm_shapes)
from autosmoothquant_tpu.kernels import tuning


def test_candidate_blocks_legal():
    cands = candidate_blocks(1024, 4096, 4096)
    assert cands
    for bm, bn, bk in cands:
        assert 1024 % bm == 0 and 4096 % bn == 0 and 4096 % bk == 0
        assert bm % 32 == 0 and bn % 128 == 0 and bk % 128 == 0
        assert 2 * (bm * bk + bk * bn) + 4 * bm * bn <= 12 * 1024 * 1024


def test_candidate_blocks_small_m():
    # decode shapes: m=8 has no legal 32-multiple bm -> empty
    assert candidate_blocks(8, 2048, 2048) == []
    assert candidate_blocks(32, 2048, 2048)


def test_table_roundtrip_with_meta(tmp_path):
    path = tmp_path / "table.json"
    payload = {"64,128,256": [32, 128, 128],
               "_meta": {"64,128,256": {"exec_time_us": 1.0}}}
    path.write_text(json.dumps(payload))
    tuning.load_table(str(path))
    try:
        assert tuning.pick_blocks(64, 128, 256) == (32, 128, 128)
    finally:
        tuning._TABLE = {}


def test_model_gemm_shapes():
    from autosmoothquant_tpu.models import llama as L

    cfg = L.LlamaConfig(vocab_size=32000, hidden_size=2048,
                        intermediate_size=5632, num_hidden_layers=22,
                        num_attention_heads=32, num_key_value_heads=4)
    fused = model_gemm_shapes(cfg, batch=8)
    # qkv fused: 32*64 + 2*4*64 = 2560 columns
    assert (8, 2560, 2048) in fused
    assert (8, 11264, 2048) in fused
    unfused = model_gemm_shapes(cfg, batch=8, fused=False)
    assert (8, 2048, 2048) in unfused and (8, 256, 2048) in unfused


def test_autotune_merges_existing_table(tmp_path, monkeypatch):
    """autotune() must extend an existing table, not clobber entries for
    shapes outside the current sweep (coverage grows across sessions)."""
    from autosmoothquant_tpu.kernels import autotune as at

    path = tmp_path / "table.json"
    path.write_text(json.dumps({
        "64,128,256": [32, 128, 128],
        "_meta": {"64,128,256": {"blocks": [32, 128, 128],
                                 "exec_time_us": 1.0,
                                 "xla_time_us": 2.0}}}))

    def fake_tune(m, n, k, verbose=True, **kw):
        return {"blocks": [64, 128, 128], "exec_time_us": 3.0,
                "xla_time_us": 4.0}

    monkeypatch.setattr(at, "tune_shape", fake_tune)
    table = at.autotune([(128, 128, 256)], str(path), verbose=False)
    out = json.loads(path.read_text())
    assert out["64,128,256"] == [32, 128, 128]  # preserved
    assert out["128,128,256"] == [64, 128, 128]  # added
    assert set(out["_meta"]) == {"64,128,256", "128,128,256"}
    assert table["64,128,256"] == [32, 128, 128]

    # re-tuning the SAME shape overwrites its entry
    def fake_tune2(m, n, k, verbose=True, **kw):
        return {"blocks": [128, 128, 128], "exec_time_us": 0.5,
                "xla_time_us": 4.0}

    monkeypatch.setattr(at, "tune_shape", fake_tune2)
    at.autotune([(64, 128, 256)], str(path), verbose=False)
    out = json.loads(path.read_text())
    assert out["64,128,256"] == [128, 128, 128]
    assert out["128,128,256"] == [64, 128, 128]


def test_autotune_non_object_json_falls_back(tmp_path, monkeypatch):
    """Valid-JSON non-object table files (e.g. a list) must fall back to a
    fresh table instead of crashing the merge (advisor finding)."""
    from autosmoothquant_tpu.kernels import autotune as at

    path = tmp_path / "table.json"
    path.write_text(json.dumps([1, 2, 3]))

    def fake_tune(m, n, k, verbose=True, **kw):
        return {"blocks": [64, 128, 128], "exec_time_us": 3.0,
                "xla_time_us": 4.0}

    monkeypatch.setattr(at, "tune_shape", fake_tune)
    table = at.autotune([(128, 128, 256)], str(path), verbose=False)
    assert table == {"128,128,256": [64, 128, 128]}


def test_autotune_failed_retune_drops_stale_blocks(tmp_path, monkeypatch):
    """When every candidate fails on a re-tune, the stale blocks must be
    dropped so table and _meta cannot diverge (advisor finding)."""
    from autosmoothquant_tpu.kernels import autotune as at

    path = tmp_path / "table.json"
    path.write_text(json.dumps({
        "64,128,256": [32, 128, 128],
        "_meta": {"64,128,256": {"blocks": [32, 128, 128],
                                 "exec_time_us": 1.0,
                                 "xla_time_us": 2.0}}}))

    def fail_tune(m, n, k, verbose=True, **kw):
        return {"blocks": None, "exec_time_us": None, "xla_time_us": 9.0}

    monkeypatch.setattr(at, "tune_shape", fail_tune)
    table = at.autotune([(64, 128, 256)], str(path), verbose=False)
    out = json.loads(path.read_text())
    assert "64,128,256" not in table and "64,128,256" not in out or \
        out.get("64,128,256") is None
    assert out["_meta"]["64,128,256"]["blocks"] is None
