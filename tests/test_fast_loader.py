"""Native safetensors IO: roundtrip, parity with the safetensors package,
fp8/bf16 dtypes, large-tensor threaded path."""

import os

import numpy as np
import pytest

from autosmoothquant_tpu.convert.fast_loader import (
    load_safetensors,
    native_available,
    save_safetensors,
    _load_safetensors_py,
)


@pytest.fixture
def sample(tmp_path):
    import ml_dtypes

    rng = np.random.default_rng(0)
    tensors = {
        "a": rng.normal(size=(16, 32)).astype(np.float32),
        "b": rng.integers(-128, 128, size=(64,)).astype(np.int8),
        "c": rng.normal(size=(8, 8)).astype(ml_dtypes.bfloat16),
        "d": rng.normal(size=(4, 4)).astype(ml_dtypes.float8_e4m3fn),
        "empty": np.zeros((0, 4), np.float32),
    }
    path = str(tmp_path / "x.safetensors")
    save_safetensors(path, tensors, metadata={"format": "pt"})
    return path, tensors


def test_native_built():
    assert native_available(), "run `make -C csrc` to build libasq_io.so"


def test_roundtrip_native(sample):
    path, tensors = sample
    out = load_safetensors(path)
    assert set(out) == set(tensors)
    for k in tensors:
        assert out[k].dtype == tensors[k].dtype
        np.testing.assert_array_equal(
            out[k].view(np.uint8), tensors[k].view(np.uint8))


def test_matches_safetensors_package(tmp_path):
    # NOTE: the stock safetensors numpy reader cannot handle fp8 tensors
    # (numpy has no float8) — the exact serialization gap the reference
    # monkeypatched dtype_byte_size for (functional/quantization.py:126-136);
    # the native loader reads them via ml_dtypes. Parity check uses a
    # package-readable file.
    pytest.importorskip("safetensors")
    rng = np.random.default_rng(2)
    tensors = {"a": rng.normal(size=(8, 8)).astype(np.float32),
               "b": rng.integers(-5, 5, size=(3, 3)).astype(np.int8)}
    path = str(tmp_path / "plain.safetensors")
    save_safetensors(path, tensors)
    a = load_safetensors(path)
    b = _load_safetensors_py(path)
    for k in tensors:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_large_tensor_threaded(tmp_path):
    # >16 MiB triggers the multithreaded copy path in asq_read
    big = np.random.default_rng(1).integers(-128, 128, size=(6000, 4096)).astype(np.int8)
    path = str(tmp_path / "big.safetensors")
    save_safetensors(path, {"w": big})
    out = load_safetensors(path, nthreads=4)
    np.testing.assert_array_equal(out["w"], big)


def test_missing_file():
    with pytest.raises((FileNotFoundError, OSError)):
        load_safetensors("/nonexistent/y.safetensors")
