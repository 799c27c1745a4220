"""Quant/dequant math vs a NumPy oracle (SURVEY.md §4 test pyramid level 1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.quant import math as qmath


def rng(seed=0):
    return np.random.default_rng(seed)


class TestWeightQuant:
    def test_per_tensor_absmax(self):
        w = rng().normal(size=(64, 32)).astype(np.float32)
        q, scale = qmath.quantize_weight_per_tensor_absmax(jnp.asarray(w))
        expected_scale = np.abs(w).max() / 127.0
        np.testing.assert_allclose(float(scale), expected_scale, rtol=1e-6)
        # round-half-even rounding of w/scale
        expected_q = np.clip(np.round(w / expected_scale), -128, 127)
        np.testing.assert_array_equal(np.asarray(q), expected_q.astype(np.int8))
        assert q.dtype == jnp.int8
        # reconstruction error bounded by scale/2
        err = np.abs(np.asarray(q).astype(np.float32) * float(scale) - w)
        assert err.max() <= float(scale) / 2 + 1e-6

    def test_fused_shared_scale(self):
        ws = [rng(i).normal(size=(16, 8)).astype(np.float32) * (i + 1) for i in range(3)]
        qs, scale = qmath.quantize_weight_fused_absmax([jnp.asarray(w) for w in ws])
        expected_scale = max(np.abs(w).max() for w in ws) / 127.0
        np.testing.assert_allclose(float(scale), expected_scale, rtol=1e-6)
        assert len(qs) == 3
        for q, w in zip(qs, ws):
            np.testing.assert_array_equal(
                np.asarray(q), np.clip(np.round(w / expected_scale), -128, 127).astype(np.int8)
            )

    def test_per_channel_absmax(self):
        w = rng(1).normal(size=(32, 16)).astype(np.float32)  # [in, out]
        q, scales = qmath.quantize_weight_per_channel_absmax(jnp.asarray(w), axis=0)
        assert scales.shape == (1, 16)
        expected_scales = np.abs(w).max(axis=0, keepdims=True) / 127.0
        np.testing.assert_allclose(np.asarray(scales), expected_scales, rtol=1e-6)
        recon = np.asarray(q).astype(np.float32) * expected_scales
        assert np.abs(recon - w).max() <= expected_scales.max() / 2 + 1e-6


class TestActQuant:
    def test_per_token(self):
        x = rng(2).normal(size=(8, 64)).astype(np.float32) * 10
        q, scale = qmath.quantize_act_per_token(jnp.asarray(x))
        assert scale.shape == (8, 1)
        expected_scale = np.maximum(np.abs(x).max(axis=-1, keepdims=True), 1e-8) / 127.0
        np.testing.assert_allclose(np.asarray(scale), expected_scale, rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(q),
            np.clip(np.round(x / expected_scale), -128, 127).astype(np.int8),
        )

    def test_per_token_zero_row_clamped(self):
        x = np.zeros((4, 16), np.float32)
        q, scale = qmath.quantize_act_per_token(jnp.asarray(x))
        assert np.all(np.asarray(scale) > 0)  # 1e-8 clamp prevents div-by-zero
        assert np.all(np.asarray(q) == 0)

    def test_per_tensor_dynamic(self):
        x = rng(3).normal(size=(8, 64)).astype(np.float32)
        q, scale = qmath.quantize_act_per_tensor_dynamic(jnp.asarray(x))
        expected_scale = max(np.abs(x).max(), 1e-8) / 127.0
        np.testing.assert_allclose(float(scale), expected_scale, rtol=1e-6)

    def test_static_and_prescaled(self):
        x = rng(4).normal(size=(8, 64)).astype(np.float32) * 5
        s = 0.03
        q = qmath.quantize_act_static(jnp.asarray(x), s)
        np.testing.assert_array_equal(
            np.asarray(q), np.clip(np.round(x / s), -128, 127).astype(np.int8)
        )
        q2 = qmath.quantize_act_prescaled(jnp.asarray(x))
        np.testing.assert_array_equal(
            np.asarray(q2), np.clip(np.round(x), -128, 127).astype(np.int8)
        )

    def test_fake_quant_roundtrip_close(self):
        x = rng(5).normal(size=(8, 64)).astype(np.float32)
        fq = qmath.fake_quantize_act_per_token(jnp.asarray(x))
        scale = np.abs(x).max(axis=-1, keepdims=True) / 127.0
        assert np.abs(np.asarray(fq) - x).max() <= scale.max() / 2 + 1e-6


class TestDequant:
    def test_w_per_channel_a_per_token(self):
        q = rng(6).integers(-128, 128, size=(4, 8)).astype(np.int8)
        ws = np.abs(rng(7).normal(size=8)).astype(np.float32)
        as_ = np.abs(rng(8).normal(size=(4, 1))).astype(np.float32)
        out = qmath.dequantize_w_per_channel_a_per_token(
            jnp.asarray(q), jnp.asarray(ws), jnp.asarray(as_)
        )
        np.testing.assert_allclose(
            np.asarray(out), q.astype(np.float32) * ws[None, :] * as_, rtol=1e-6
        )


class TestFP8:
    def test_per_tensor_e4m3(self):
        x = rng(9).normal(size=(16, 16)).astype(np.float32) * 100
        q, scale = qmath.quantize_fp8_per_tensor(jnp.asarray(x))
        assert q.dtype == jnp.float8_e4m3fn
        np.testing.assert_allclose(float(scale), np.abs(x).max() / 448.0, rtol=1e-6)
        recon = np.asarray(q.astype(jnp.float32)) * float(scale)
        # e4m3 has ~2 decimal digits; relative reconstruction must be close
        assert np.abs(recon - x).max() / np.abs(x).max() < 0.1

    def test_per_token_e4m3(self):
        x = rng(10).normal(size=(4, 32)).astype(np.float32)
        q, scale = qmath.quantize_fp8_per_token(jnp.asarray(x))
        assert scale.shape == (4, 1)

    def test_static(self):
        x = rng(11).normal(size=(4, 32)).astype(np.float32) * 1000
        q = qmath.quantize_fp8_static(jnp.asarray(x), 2.0)
        # saturating clamp: no infs even though 1000/2 > 448
        assert np.isfinite(np.asarray(q.astype(jnp.float32))).all()

    def test_e5m2(self):
        x = rng(12).normal(size=(8, 8)).astype(np.float32)
        q, scale = qmath.quantize_fp8_per_tensor(jnp.asarray(x), dtype=jnp.float8_e5m2)
        assert q.dtype == jnp.float8_e5m2
        np.testing.assert_allclose(float(scale), np.abs(x).max() / 57344.0, rtol=1e-6)
