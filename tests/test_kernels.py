"""Pallas int8 GEMM kernel vs the XLA int32 dot oracle (SURVEY.md §4 level 2).

On the CPU test backend the kernel runs in interpreter mode; the same code
path compiles on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.kernels.gemm import int8_matmul, int8_matmul_xla, fp8_matmul
from autosmoothquant_tpu.kernels.tuning import pick_blocks


def rand_int8(shape, seed):
    return np.random.default_rng(seed).integers(-128, 128, size=shape).astype(np.int8)


INTERPRET = jax.default_backend() != "tpu"


def oracle(x, w, rs=1.0, cs=1.0, bias=None):
    acc = np.asarray(int8_matmul_xla(jnp.asarray(x), jnp.asarray(w))).astype(np.float64)
    out = acc * np.broadcast_to(np.float32(rs), (x.shape[0], 1)) if np.isscalar(rs) else acc * rs
    out = out * cs
    if bias is not None:
        out = out + bias
    return out


class TestInt8Matmul:
    @pytest.mark.parametrize("m,n,k", [(64, 256, 256), (32, 128, 384)])
    def test_pallas_matches_oracle_scalar_scales(self, m, n, k):
        x = rand_int8((m, k), 0)
        w = rand_int8((k, n), 1)
        out = int8_matmul(
            jnp.asarray(x), jnp.asarray(w), row_scale=0.5, col_scale=0.25,
            use_pallas=True, interpret=INTERPRET,
        )
        expected = oracle(x, w, 0.5, 0.25)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)

    def test_pallas_per_token_per_channel(self):
        m, n, k = 64, 128, 256
        x = rand_int8((m, k), 2)
        w = rand_int8((k, n), 3)
        rs = np.abs(np.random.default_rng(4).normal(size=(m, 1))).astype(np.float32) + 0.01
        cs = np.abs(np.random.default_rng(5).normal(size=(1, n))).astype(np.float32) + 0.01
        out = int8_matmul(
            jnp.asarray(x), jnp.asarray(w), row_scale=jnp.asarray(rs),
            col_scale=jnp.asarray(cs), use_pallas=True, interpret=INTERPRET,
        )
        expected = oracle(x, w, rs, cs)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)

    def test_bias_and_relu(self):
        m, n, k = 32, 128, 128
        x = rand_int8((m, k), 6)
        w = rand_int8((k, n), 7)
        bias = np.random.default_rng(8).normal(size=n).astype(np.float32) * 100
        out = int8_matmul(
            jnp.asarray(x), jnp.asarray(w), row_scale=0.01, col_scale=0.02,
            bias=jnp.asarray(bias), activation="relu",
            use_pallas=True, interpret=INTERPRET,
        )
        expected = np.maximum(oracle(x, w, 0.01, 0.02, bias[None, :]), 0.0)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-4)

    def test_int8_requant_output(self):
        m, n, k = 32, 128, 128
        x = rand_int8((m, k), 9)
        w = rand_int8((k, n), 10)
        out = int8_matmul(
            jnp.asarray(x), jnp.asarray(w), row_scale=1e-4, col_scale=1e-2,
            out_dtype=jnp.int8, use_pallas=True, interpret=INTERPRET,
        )
        assert out.dtype == jnp.int8
        expected = np.clip(np.round(oracle(x, w, 1e-4, 1e-2)), -128, 127)
        np.testing.assert_array_equal(np.asarray(out), expected.astype(np.int8))

    def test_unaligned_shape_falls_back(self):
        # 100 is not tileable -> XLA path must kick in and still be right
        x = rand_int8((5, 100), 11)
        w = rand_int8((100, 60), 12)
        out = int8_matmul(jnp.asarray(x), jnp.asarray(w), row_scale=2.0)
        expected = oracle(x, w, 2.0, 1.0)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)

    def test_large_accumulation_no_overflow(self):
        # K=1024 of +/-127 products: |acc| ~16.5M, within int32 but far
        # beyond int16/fp16 — verifies the accumulator is int32.
        k = 1024
        x = np.full((32, k), 127, np.int8)
        w = np.full((k, 128), 127, np.int8)
        out = int8_matmul(
            jnp.asarray(x), jnp.asarray(w), use_pallas=True, interpret=INTERPRET
        )
        assert float(out[0, 0]) == 127.0 * 127.0 * k


class TestTuning:
    def test_aligned(self):
        assert pick_blocks(1024, 4096, 4096) is not None

    def test_unaligned_returns_none(self):
        assert pick_blocks(64, 100, 128) is None
        assert pick_blocks(7, 128, 128) is None

    def test_blocks_divide_shape(self):
        for m, n, k in [(256, 5504, 4096), (32, 128, 11008), (64, 4096, 4096)]:
            bm, bn, bk = pick_blocks(m, n, k)
            assert m % bm == 0 and n % bn == 0 and k % bk == 0
            assert bm % 32 == 0 or bm == m
            assert bn % 128 == 0 and bk % 128 == 0


class TestFP8Matmul:
    def test_matches_float_matmul(self):
        m, n, k = 16, 32, 64
        rng = np.random.default_rng(13)
        x = rng.normal(size=(m, k)).astype(np.float32)
        w = rng.normal(size=(k, n)).astype(np.float32)
        from autosmoothquant_tpu.quant import math as qmath

        xq, xs = qmath.quantize_fp8_per_tensor(jnp.asarray(x))
        wq, ws = qmath.quantize_fp8_per_tensor(jnp.asarray(w))
        out = fp8_matmul(xq, wq, row_scale=xs, col_scale=ws)
        # exact oracle: matmul of the fp8-roundtripped values
        xd = np.asarray(xq.astype(jnp.float32)) * float(xs)
        wd = np.asarray(wq.astype(jnp.float32)) * float(ws)
        np.testing.assert_allclose(np.asarray(out), xd @ wd, rtol=2e-2, atol=2e-2)
        # and coarse agreement with the true float matmul
        assert np.abs(np.asarray(out) - x @ w).mean() < 0.5
