"""fp8 byte-streaming GEMM (kernels/fp8.py): twiddle identity, kernel vs
XLA-upcast oracle, stacked-layer indexing, and the model-path routing.

The kernel exists because the XLA upcast dot runs at bf16 speed (it
materializes the converted weight) — see the module docstring's v5e
measurements. Correctness here runs in interpret mode on CPU; the on-chip
perf rows live in BENCHMARKS.md (ASQ_BENCH_MODE=fp8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autosmoothquant_tpu.kernels.fp8 import (_FMT, _twiddle,
                                             fp8_stream_matmul)


def _bytes_all():
    return jnp.arange(256, dtype=jnp.uint8)


@pytest.mark.parametrize("dtype,name", [
    (jnp.float8_e4m3fn, "float8_e4m3fn"),
    (jnp.float8_e5m2, "float8_e5m2"),
])
def test_twiddle_identity_all_bytes(dtype, name):
    """The bit-twiddle decode matches astype for every finite NORMAL
    byte. fp8-subnormal bytes (|w| <= 0.0137 e4m3 / 6.1e-5 e5m2, i.e.
    <= 3.1e-5 of the absmax a quantized tensor spans) are the identity's
    documented deviation: the intermediate f32 is subnormal and XLA's
    flush-to-zero (CPU and TPU alike) zeroes them. NaN/Inf bytes are
    unreachable from a clamped quantize."""
    b = _bytes_all()
    shift, scale = _FMT[name]
    got = np.asarray(_twiddle(b, shift, scale).astype(jnp.float32))
    ref = np.asarray(jax.lax.bitcast_convert_type(b, dtype)
                     .astype(jnp.float32))
    exp_bits = ((np.arange(256) >> 3) & 0xF if shift == 20
                else (np.arange(256) >> 2) & 0x1F)
    subnormal = exp_bits == 0
    finite = np.isfinite(ref)
    np.testing.assert_array_equal(got[finite & ~subnormal],
                                  ref[finite & ~subnormal])
    # flushed subnormals decode to (signed) zero, never garbage
    assert np.all(np.abs(got[subnormal & finite])
                  <= np.abs(ref[subnormal & finite]) + 0)
    assert np.all((got[subnormal] == 0) | (got[subnormal]
                                           == ref[subnormal]))


def _mk(m, k, n, nl, dtype, seed=0):
    key = jax.random.PRNGKey(seed)
    kx, kw = jax.random.split(key)
    # absmax-scaled operands (what quantize_fp8_* produces): values span
    # much of the format's range (clipped inside it — e4m3fn overflows to
    # NaN on convert), so subnormal mass is negligible
    x = jnp.clip(jax.random.normal(kx, (m, k), jnp.float32) * 100,
                 -400, 400).astype(dtype)
    w = jnp.clip(jax.random.normal(kw, (nl, k, n), jnp.float32) * 100,
                 -400, 400).astype(dtype)
    return x, w


def _oracle(x_f8, w_f8):
    return jax.lax.dot_general(
        x_f8.astype(jnp.float32), w_f8.astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


@pytest.mark.parametrize("dtype", [jnp.float8_e4m3fn, jnp.float8_e5m2])
@pytest.mark.parametrize("m,k,n", [(8, 512, 512), (1, 512, 1024),
                                   (16, 1024, 512)])
def test_stream_matmul_vs_oracle(dtype, m, k, n):
    x, w = _mk(m, k, n, 1, dtype)
    out = fp8_stream_matmul(x, w[0], interpret=True)
    assert out is not None, "shape should tile"
    ref = _oracle(x, w[0])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=1e-3 * float(
                                   jnp.max(jnp.abs(ref))))


def test_stream_matmul_stacked_layers():
    nl = 3
    x, w = _mk(8, 512, 512, nl, jnp.float8_e4m3fn)
    for l in range(nl):
        out = fp8_stream_matmul(x, w, l, interpret=True)
        ref = _oracle(x, w[l])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=1e-3 * float(
                                       jnp.max(jnp.abs(ref))))


def test_stream_matmul_declines_bad_shapes():
    # prefill-shaped M and unaligned K decline -> caller uses XLA upcast
    x, w = _mk(128, 512, 512, 1, jnp.float8_e4m3fn)
    assert fp8_stream_matmul(x, w[0], interpret=True) is None  # M > 64
    x2, w2 = _mk(8, 200, 512, 1, jnp.float8_e4m3fn)
    assert fp8_stream_matmul(x2, w2[0], interpret=True) is None  # K % 128
    x3, w3 = _mk(8, 256, 512, 1, jnp.float8_e4m3fn)
    # cramped bk (< 512): the XLA upcast dot is already at its best
    assert fp8_stream_matmul(x3, w3[0], interpret=True) is None


def test_fp8_matmul_routes_and_matches():
    """gemm.fp8_matmul with a stacked weight + layer index matches the
    2-D XLA path bit-for-bit semantics-wise (same quantized operands)."""
    from autosmoothquant_tpu import runtime
    from autosmoothquant_tpu.kernels.gemm import fp8_matmul

    x, w = _mk(4, 256, 128, 2, jnp.float8_e4m3fn)
    with runtime.override(fp8_stream="off", fp8_native="off"):
        ref = fp8_matmul(x, w[1], row_scale=0.5, col_scale=2.0)
    got = fp8_matmul(x, w, row_scale=0.5, col_scale=2.0, layer=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=1e-3 * float(
                                   jnp.max(jnp.abs(ref))))


def test_scan_view_keeps_fp8_stacked():
    from autosmoothquant_tpu.models.common import quant_scan_view

    tree = {
        "attn": {"q": {"w": jnp.zeros((2, 8, 8), jnp.float8_e4m3fn),
                       "w_scale": jnp.ones((2,), jnp.float32)}},
        "ln": {"w": jnp.ones((2, 8), jnp.float32)},
    }
    view = jax.jit(lambda t: quant_scan_view(t, jnp.int32(1)))(tree)
    assert view["attn"]["q"]["w"].shape == (2, 8, 8)   # stays stacked
    assert "layer" in view["attn"]["q"]
    assert view["attn"]["q"]["w_scale"].shape == ()    # sliced
    assert view["ln"]["w"].shape == (8,)
