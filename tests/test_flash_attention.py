"""Flash attention kernel vs the einsum oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.kernels.attention import flash_attention, flash_supported
from autosmoothquant_tpu.models.common import attend


def make_qkv(b, t, s, hq, hkv, d, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, t, hq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    return q, k, v


def oracle(q, k, v, scale, causal=True):
    t, s = q.shape[1], k.shape[1]
    mask = jnp.arange(s)[None, None, None, :] <= jnp.arange(t)[None, None, :, None] \
        if causal else jnp.ones((1, 1, t, s), bool)
    return np.asarray(attend(q, k, v, mask, scale))


@pytest.mark.parametrize("t,hq,hkv,d", [
    (256, 2, 2, 128),
    (256, 4, 2, 128),   # GQA
    (512, 2, 1, 128),   # MQA-style
])
def test_flash_matches_oracle_causal(t, hq, hkv, d):
    q, k, v = make_qkv(1, t, t, hq, hkv, d)
    scale = d ** -0.5
    out = np.asarray(flash_attention(q, k, v, sm_scale=scale, causal=True,
                                     block_q=128, block_k=128, interpret=True))
    np.testing.assert_allclose(out, oracle(q, k, v, scale), rtol=2e-5, atol=2e-5)


def test_flash_non_causal():
    q, k, v = make_qkv(2, 128, 256, 2, 2, 128, seed=1)
    scale = 0.1
    out = np.asarray(flash_attention(q, k, v, sm_scale=scale, causal=False,
                                     block_q=128, block_k=128, interpret=True))
    np.testing.assert_allclose(out, oracle(q, k, v, scale, causal=False),
                               rtol=2e-5, atol=2e-5)


def test_flash_supported_gates():
    assert flash_supported((1, 256, 4, 128), (1, 256, 2, 128))
    assert not flash_supported((1, 256, 4, 64), (1, 256, 2, 64))   # head dim
    assert not flash_supported((1, 100, 4, 128), (1, 100, 2, 128))  # unaligned
    assert not flash_supported((1, 64, 4, 128), (1, 64, 2, 128))   # too short
    assert not flash_supported((1, 256, 3, 128), (1, 256, 2, 128))  # bad GQA
