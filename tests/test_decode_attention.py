"""Flash-decode kernel vs einsum oracle: bf16 cache, int8 cache with scales,
ragged per-row [start, length) windows."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.kernels.decode_attention import flash_decode
from autosmoothquant_tpu.models.common import _quantize_kv

INTERPRET = jax.default_backend() != "tpu"


def oracle(q, k, v, lengths, scale, starts=None):
    b, hq, d = q.shape
    s, hkv = k.shape[1], k.shape[2]
    g = hq // hkv
    out = np.zeros((b, hq, d), np.float32)
    for bi in range(b):
        for h in range(hq):
            kh = h // g
            L = int(lengths[bi])
            S0 = int(starts[bi]) if starts is not None else 0
            sc = (np.asarray(q[bi, h], np.float32)
                  @ np.asarray(k[bi, S0:L, kh], np.float32).T) * scale
            p = np.exp(sc - sc.max())
            p /= p.sum()
            out[bi, h] = p @ np.asarray(v[bi, S0:L, kh], np.float32)
    return out


@pytest.mark.parametrize("hq,hkv", [(4, 4), (8, 2)])
def test_float_cache_matches(hq, hkv):
    rng = np.random.default_rng(0)
    b, s, d = 2, 512, 128
    q = jnp.asarray(rng.normal(size=(b, hq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    lengths = jnp.asarray([317, 512], jnp.int32)
    out = flash_decode(q, k, v, lengths, sm_scale=d ** -0.5, block_k=128,
                       interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out),
                               oracle(q, k, v, lengths, d ** -0.5),
                               rtol=2e-5, atol=2e-5)


def test_int8_cache_matches_dequant_oracle():
    rng = np.random.default_rng(1)
    b, s, hq, hkv, d = 2, 256, 4, 2, 128
    q = jnp.asarray(rng.normal(size=(b, hq, d)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(b, s, hkv, d)) * 3, jnp.float32)
    vf = jnp.asarray(rng.normal(size=(b, s, hkv, d)) * 3, jnp.float32)
    kq, ks = _quantize_kv(kf)
    vq, vs = _quantize_kv(vf)
    lengths = jnp.asarray([100, 256], jnp.int32)
    out = flash_decode(q, kq, vq, lengths, sm_scale=d ** -0.5,
                       k_scale=ks, v_scale=vs, block_k=128,
                       interpret=INTERPRET)
    k_de = np.asarray(kq, np.float32) * np.asarray(ks)[..., None]
    v_de = np.asarray(vq, np.float32) * np.asarray(vs)[..., None]
    expected = oracle(q, jnp.asarray(k_de), jnp.asarray(v_de), lengths, d ** -0.5)
    # int8-cache dots run in bf16 on the MXU (f32 accum); tolerance reflects
    # bf16 rounding of q/k/p, well under the int8 quantization error itself
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-2, atol=2e-2)


def test_start_offsets_mask_front():
    """Left-padded prompts: slots before start must be ignored."""
    rng = np.random.default_rng(3)
    b, s, hq, hkv, d = 2, 256, 4, 2, 128
    q = jnp.asarray(rng.normal(size=(b, hq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    starts = jnp.asarray([7, 130], jnp.int32)
    lengths = jnp.asarray([200, 256], jnp.int32)
    out = flash_decode(q, k, v, lengths, sm_scale=d ** -0.5, starts=starts,
                       block_k=128, interpret=INTERPRET)
    np.testing.assert_allclose(
        np.asarray(out), oracle(q, k, v, lengths, d ** -0.5, starts),
        rtol=2e-5, atol=2e-5)
    # garbage in the padded front must not affect the result
    k2 = k.at[0, :7].set(1e4)
    v2 = v.at[0, :7].set(-1e4)
    out_b = flash_decode(q, k2, v2, lengths, sm_scale=d ** -0.5, starts=starts,
                         block_k=128, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_b), rtol=1e-6)


def test_engine_decode_kernel_matches_xla_path(monkeypatch):
    """Integration: Engine greedy decode with the flash-decode kernel forced
    on (interpret mode off-TPU) must emit the same tokens as the XLA
    dequant-attend path — bf16 and int8 caches, left-padded ragged batch."""
    from autosmoothquant_tpu.models import llama as L
    from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

    cfg = L.LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=256)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    prompts = [[5, 9, 2, 11, 42, 7], [100, 3]]
    for kv_dtype in (jnp.float32, jnp.int8):
        outs = {}
        for mode in ("off", "force"):
            monkeypatch.setenv("ASQ_FLASH_DECODE", mode)
            eng = Engine(L, params, cfg, max_batch=2, max_seq=128,
                         kv_dtype=kv_dtype, compute_dtype=jnp.float32)
            outs[mode] = eng.generate(prompts, GenerationConfig(max_new_tokens=6))
        assert outs["force"] == outs["off"], (kv_dtype, outs)


def test_short_length_masks_tail():
    rng = np.random.default_rng(2)
    b, s, hq, hkv, d = 1, 256, 2, 2, 128
    q = jnp.asarray(rng.normal(size=(b, hq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    out_a = flash_decode(q, k, v, jnp.asarray([5], jnp.int32),
                         sm_scale=0.1, block_k=128, interpret=INTERPRET)
    # garbage beyond length must not affect the result
    k2 = k.at[:, 5:].set(1e4)
    v2 = v.at[:, 5:].set(-1e4)
    out_b = flash_decode(q, k2, v2, jnp.asarray([5], jnp.int32),
                         sm_scale=0.1, block_k=128, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-6)


@pytest.mark.parametrize("d", [64, 128])
def test_head_dim_64(d):
    """TinyLlama-class head_dim=64: half-lane per-head tiles must stay
    correct (the DMA slab is lane-aligned as a whole)."""
    rng = np.random.default_rng(5)
    b, s, hq, hkv = 2, 256, 8, 4
    q = jnp.asarray(rng.normal(size=(b, hq, d)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(b, s, hkv, d)) * 2, jnp.float32)
    vf = jnp.asarray(rng.normal(size=(b, s, hkv, d)) * 2, jnp.float32)
    kq, ks = _quantize_kv(kf)
    vq, vs = _quantize_kv(vf)
    lengths = jnp.asarray([129, 256], jnp.int32)
    out = flash_decode(q, kq, vq, lengths, sm_scale=d ** -0.5,
                       k_scale=ks, v_scale=vs, block_k=128,
                       interpret=INTERPRET)
    k_de = np.asarray(kq, np.float32) * np.asarray(ks)[..., None]
    v_de = np.asarray(vq, np.float32) * np.asarray(vs)[..., None]
    expected = oracle(q, jnp.asarray(k_de), jnp.asarray(v_de), lengths, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-2, atol=2e-2)


def test_int8_dots_variant_matches_oracle():
    """int8 QK^T / PV MXU dots (the reference's bmm_s8t_s8n_* semantics,
    csrc/kernels/bmm.cu): row-quantized q and p with int8 cache values.
    Added quantization error stays well under the int8-KV noise floor."""
    rng = np.random.default_rng(9)
    b, s, hq, hkv, d = 2, 256, 8, 4, 128
    q = jnp.asarray(rng.normal(size=(b, hq, d)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(b, s, hkv, d)) * 2, jnp.float32)
    vf = jnp.asarray(rng.normal(size=(b, s, hkv, d)) * 2, jnp.float32)
    kq, ks = _quantize_kv(kf)
    vq, vs = _quantize_kv(vf)
    lengths = jnp.asarray([130, 256], jnp.int32)
    out = flash_decode(q, kq, vq, lengths, sm_scale=d ** -0.5,
                       k_scale=ks, v_scale=vs, block_k=128,
                       int8_dots=True, interpret=INTERPRET)
    k_de = np.asarray(kq, np.float32) * np.asarray(ks)[..., None]
    v_de = np.asarray(vq, np.float32) * np.asarray(vs)[..., None]
    expected = oracle(q, jnp.asarray(k_de), jnp.asarray(v_de), lengths, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=5e-2, atol=5e-2)
    # and it must differ from the bf16-dot path (i.e. actually engaged)
    out_bf = flash_decode(q, kq, vq, lengths, sm_scale=d ** -0.5,
                          k_scale=ks, v_scale=vs, block_k=128,
                          interpret=INTERPRET)
    assert np.abs(np.asarray(out) - np.asarray(out_bf)).max() > 0


@pytest.mark.parametrize("quant", [False, True])
def test_flash_decode_simple_matches(quant):
    """The whole-row no-scratch variant must match the blocked kernel's
    oracle for bf16 and int8 caches with [start, length) windows."""
    from autosmoothquant_tpu.kernels.decode_attention import (
        flash_decode_simple, simple_supported)

    rng = np.random.default_rng(11)
    b, s, hq, hkv, d = 2, 256, 8, 4, 64
    q = jnp.asarray(rng.normal(size=(b, hq, d)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(b, s, hkv, d)) * 2, jnp.float32)
    vf = jnp.asarray(rng.normal(size=(b, s, hkv, d)) * 2, jnp.float32)
    starts = jnp.asarray([3, 0], jnp.int32)
    lengths = jnp.asarray([129, 256], jnp.int32)
    assert simple_supported((b, 1, hq, d), (b, s, hkv, d), 1 if quant else 4)
    if quant:
        kq, ks = _quantize_kv(kf)
        vq, vs = _quantize_kv(vf)
        out = flash_decode_simple(q, kq, vq, lengths, sm_scale=d ** -0.5,
                                  starts=starts, k_scale=ks, v_scale=vs,
                                  interpret=INTERPRET)
        k_de = np.asarray(kq, np.float32) * np.asarray(ks)[..., None]
        v_de = np.asarray(vq, np.float32) * np.asarray(vs)[..., None]
        expected = oracle(q, jnp.asarray(k_de), jnp.asarray(v_de), lengths,
                          d ** -0.5, starts)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-2,
                                   atol=2e-2)
    else:
        out = flash_decode_simple(q, kf, vf, lengths, sm_scale=d ** -0.5,
                                  starts=starts, interpret=INTERPRET)
        expected = oracle(q, kf, vf, lengths, d ** -0.5, starts)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-5,
                                   atol=2e-5)


@pytest.mark.parametrize("quant", [False, True])
def test_flash_decode_layered_matches(quant):
    """The layer-indexed variant (full [L, B, S, Hkv, D] stack in HBM, row
    DMA'd per layer inside the kernel) must match the per-layer whole-row
    kernel for every layer, including an odd batch (DMA-pipeline tail)."""
    from autosmoothquant_tpu.kernels.decode_attention import (
        flash_decode_layered, flash_decode_simple)

    rng = np.random.default_rng(13)
    L, b, s, hq, hkv, d = 3, 5, 256, 8, 2, 128
    q = jnp.asarray(rng.normal(size=(b, hq, d)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(L, b, s, hkv, d)) * 2, jnp.float32)
    vf = jnp.asarray(rng.normal(size=(L, b, s, hkv, d)) * 2, jnp.float32)
    starts = jnp.asarray([0, 7, 130, 2, 50], jnp.int32)
    lengths = jnp.asarray([100, 256, 200, 64, 51], jnp.int32)
    if quant:
        kq, ks = _quantize_kv(kf.reshape(L * b, s, hkv, d))
        vq, vs = _quantize_kv(vf.reshape(L * b, s, hkv, d))
        kf, ks = kq.reshape(L, b, s, hkv, d), ks.reshape(L, b, s, hkv)
        vf, vs = vq.reshape(L, b, s, hkv, d), vs.reshape(L, b, s, hkv)
    for l in range(L):
        kw = dict(k_scale=ks[l], v_scale=vs[l]) if quant else {}
        want = flash_decode_simple(q, kf[l], vf[l], lengths,
                                   sm_scale=d ** -0.5, starts=starts,
                                   interpret=INTERPRET, **kw)
        got = flash_decode_layered(q, kf, vf, jnp.int32(l), lengths,
                                   sm_scale=d ** -0.5, starts=starts,
                                   interpret=INTERPRET, **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_int8_dots_simple_variant_matches_oracle():
    """int8 QK^T / PV dots on the whole-row (production) kernel."""
    from autosmoothquant_tpu.kernels.decode_attention import (
        flash_decode_simple)

    rng = np.random.default_rng(11)
    b, s, hq, hkv, d = 2, 256, 8, 4, 128
    q = jnp.asarray(rng.normal(size=(b, hq, d)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(b, s, hkv, d)) * 2, jnp.float32)
    vf = jnp.asarray(rng.normal(size=(b, s, hkv, d)) * 2, jnp.float32)
    kq, ks = _quantize_kv(kf)
    vq, vs = _quantize_kv(vf)
    lengths = jnp.asarray([130, 256], jnp.int32)
    out = flash_decode_simple(q, kq, vq, lengths, sm_scale=d ** -0.5,
                              k_scale=ks, v_scale=vs, int8_dots=True,
                              interpret=INTERPRET)
    k_de = np.asarray(kq, np.float32) * np.asarray(ks)[..., None]
    v_de = np.asarray(vq, np.float32) * np.asarray(vs)[..., None]
    expected = oracle(q, jnp.asarray(k_de), jnp.asarray(v_de), lengths,
                      d ** -0.5)
    # whole-row p-quantization is coarser than the blocked kernel's
    # (one absmax across all S probabilities) — slightly wider band
    np.testing.assert_allclose(np.asarray(out), expected, rtol=5e-2,
                               atol=8e-2)
    out_bf = flash_decode_simple(q, kq, vq, lengths, sm_scale=d ** -0.5,
                                 k_scale=ks, v_scale=vs, interpret=INTERPRET)
    assert np.abs(np.asarray(out) - np.asarray(out_bf)).max() > 0
