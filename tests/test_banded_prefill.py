"""Banded-causal flash prefill (kernels/attention.flash_attention_banded):
kernel vs eager oracle, and forced end-to-end equality through the chunked
continuous-batching admission path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.kernels.attention import (banded_supported,
                                                   flash_attention_banded)


def _oracle(q, k, v, pos, scale, starts=None):
    """Eager banded attention: query i attends cols in [start_b, pos_b+i]."""
    b, t, hq, d = q.shape
    s = k.shape[1]
    hkv = k.shape[2]
    g = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, t, hkv, g, d)
    sc = jnp.einsum("bqkgd,bskd->bkgqs", qf, k.astype(jnp.float32)) * scale
    cols = jnp.arange(s)[None, None, None, None, :]
    rows = jnp.arange(t)[None, None, None, :, None]
    mask = cols <= rows + pos[:, None, None, None, None]
    if starts is not None:
        mask = mask & (cols >= starts[:, None, None, None, None])
    sc = jnp.where(mask, sc, -1e30)
    p = jax.nn.softmax(sc, axis=-1)
    out = jnp.einsum("bkgqs,bskd->bqkgd", p, v.astype(jnp.float32))
    return out.reshape(b, t, hq, d)


@pytest.mark.parametrize("d", [64, 128])
@pytest.mark.parametrize("pos_vals,start_vals",
                         [([0, 0], [0, 0]), ([384, 128], [0, 0]),
                          ([0, 0], [96, 32]), ([384, 128], [200, 64])])
def test_kernel_matches_oracle(d, pos_vals, start_vals):
    b, t, hq, hkv, s = 2, 256, 8, 4, 1024
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, t, hq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    pos = jnp.asarray(pos_vals, jnp.int32)
    starts = jnp.asarray(start_vals, jnp.int32)
    assert banded_supported(q.shape, k.shape)
    got = flash_attention_banded(q, k, v, pos, starts, sm_scale=d ** -0.5,
                                 interpret=True)
    want = _oracle(q, k, v, pos, d ** -0.5, starts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_stale_tail_ignored():
    """Garbage K/V beyond pos+t (reused slot rows) must not leak into the
    output — the band mask is the only protection."""
    b, t, hq, hkv, s, d = 1, 128, 4, 2, 512, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(b, t, hq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
    pos = jnp.asarray([64], jnp.int32)
    base = flash_attention_banded(q, k, v, pos, sm_scale=d ** -0.5,
                                  interpret=True)
    # poison everything beyond the band
    k2 = k.at[:, 64 + t:].set(1e4)
    v2 = v.at[:, 64 + t:].set(-1e4)
    poisoned = flash_attention_banded(q, k2, v2, pos, sm_scale=d ** -0.5,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(poisoned))


def _counting_banded(monkeypatch):
    """Wrap the kernel so tests can PROVE the banded path traced (head_dim
    must be >= 64 or banded_supported silently rejects and the eager path
    runs — an earlier test version used d=16 and never hit the kernel)."""
    from autosmoothquant_tpu.kernels import attention as A

    calls = {"n": 0}
    orig = A.flash_attention_banded

    def wrapper(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(A, "flash_attention_banded", wrapper)
    return calls


def _cfg_d64():
    from autosmoothquant_tpu.models import llama as L

    return L, L.LlamaConfig(vocab_size=128, hidden_size=256,
                            intermediate_size=256, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=2,
                            max_position_embeddings=512)


def test_forced_chunked_prefill_equality(monkeypatch):
    """ASQ_BANDED_PREFILL=force: the continuous engine's chunked admission
    must produce the same tokens as whole-prompt prefill, now through the
    banded kernel (interpret mode off-TPU; call-counted to prove the kernel
    path actually traced)."""
    from autosmoothquant_tpu.serve.batching import ContinuousEngine

    L, cfg = _cfg_d64()
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 128, size=300).tolist(),
               rng.integers(1, 128, size=180).tolist()]

    monkeypatch.setenv("ASQ_BANDED_PREFILL", "off")
    base = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=512,
                            kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    for i, p in enumerate(prompts):
        base.submit(i, p, max_new_tokens=5)
    want = base.run()

    monkeypatch.setenv("ASQ_BANDED_PREFILL", "force")
    calls = _counting_banded(monkeypatch)
    eng = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=512,
                           kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                           prefill_chunk=128)
    for i, p in enumerate(prompts):
        eng.submit(i, p, max_new_tokens=5)
    got = eng.run()
    assert calls["n"] > 0, "banded kernel never traced — gate rejected it"
    assert got == want


@pytest.mark.parametrize("mode", ["off", "force"])
def test_ragged_engine_prefill_matches_singles(monkeypatch, mode):
    """Left-padded ragged batches route through the banded kernel with
    per-row starts (pad_starts); every row's tokens must equal running that
    prompt alone (which takes the chunk0 path)."""
    from autosmoothquant_tpu.models import llama as L
    from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

    monkeypatch.setenv("ASQ_BANDED_PREFILL", mode)
    L2, cfg = _cfg_d64()
    params = L2.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (200, 140, 260)]
    calls = _counting_banded(monkeypatch)
    eng = Engine(L2, params, cfg, max_batch=4, max_seq=512,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    got = eng.generate(prompts, GenerationConfig(max_new_tokens=6))
    if mode == "force":
        assert calls["n"] > 0, "banded kernel never traced for ragged batch"
    for p, row in zip(prompts, got):
        single = eng.generate([p], GenerationConfig(max_new_tokens=6))[0]
        assert row == single, (mode, p[:4])
