"""Sparse (capacity-bucketed) Mixtral expert compute vs the dense path.

The routed path must be numerically identical to dense all-experts-weighted
compute whenever no token is dropped (capacity >= max expert load) — for
float, int8 per-tensor, int8 per-token, and fp8 params. Also checks graceful
drop behavior at tiny capacity and the dispatch-table invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.models import mixtral as M
from autosmoothquant_tpu.models.mixtral import (
    _dispatch_indices, expert_capacity)
from autosmoothquant_tpu.quant.config import QuantConfig

TINY = dict(
    vocab_size=256, hidden_size=64, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    num_local_experts=4, num_experts_per_tok=2,
    max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
)


@pytest.fixture(scope="module")
def fparams():
    cfg = M.MixtralConfig(**TINY)
    return cfg, M.init_params(cfg, jax.random.PRNGKey(0))


def _quantize(cfg, params, qcfg):
    _, _, stats = M.forward_jit(
        params, jnp.asarray(np.random.default_rng(1).integers(
            0, 256, size=(2, 32)), jnp.int32), cfg,
        capture_stats=True, calibrate_all_experts=True)
    scales = M.layer_scales(stats)
    return M.quantize(params, qcfg, scales, cfg)


def _logits(params, cfg, qcfg, ids, mode, monkeypatch):
    monkeypatch.setenv("ASQ_MOE", mode)
    jax.clear_caches()  # the mode is read at trace time
    h, _, _ = M.forward_jit(params, ids, cfg, qcfg)
    return np.asarray(M.logits(params, h))


@pytest.mark.parametrize("qspec", [
    None,
    dict(type="int8"),
    # mixed granularity matching BASELINE config 3's recipe
    dict(type="int8", qkv="per-tensor", out="per-token", fc1="per-tensor",
         fc2="per-token"),
    dict(type="int8", qkv="per-token", out="per-token", fc1="per-token",
         fc2="per-token"),
])
def test_sparse_matches_dense(fparams, qspec, monkeypatch):
    cfg, params = fparams
    qcfg = QuantConfig(**qspec) if qspec else None
    p = _quantize(cfg, params, qcfg) if qcfg else params
    # T = 2*32 = 64 tokens = 16x experts; capacity(factor=2) == 64 >= any
    # possible expert load, so NOTHING can drop and paths must agree
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 256, size=(2, 32)),
                      jnp.int32)
    dense = _logits(p, cfg, qcfg, ids, "dense", monkeypatch)
    sparse = _logits(p, cfg, qcfg, ids, "sparse", monkeypatch)
    np.testing.assert_allclose(sparse, dense, rtol=2e-4, atol=2e-4)


def test_capacity_and_dispatch_tables():
    T, E, K = 16, 4, 2
    C = expert_capacity(T, E, K, 2.0)
    assert C == 16  # 16*2/4*2 = 16, already aligned
    rng = np.random.default_rng(0)
    # distinct experts per token, like real top_k
    top_idx = jnp.asarray(
        np.stack([rng.permutation(E)[:K] for _ in range(T)]), jnp.int32)
    top_w = jnp.asarray(rng.random((T, K)), jnp.float32)
    gather, wtab = _dispatch_indices(top_idx, top_w, T, E, K, C)
    gather, wtab = np.asarray(gather), np.asarray(wtab)
    # every (token, k) assignment appears exactly once somewhere
    total = (gather < T).sum()
    assert total == T * K
    # pad slots carry zero weight
    assert (wtab[gather == T] == 0).all()
    # weights land at the right tokens
    for t in range(T):
        for k in range(K):
            e = int(top_idx[t, k])
            slots = np.where(gather[e] == t)[0]
            assert len(slots) >= 1
            assert np.isclose(wtab[e, slots].sum(), float(top_w[t, k]))


def test_overflow_drops_gracefully(fparams, monkeypatch):
    """All tokens route to the same experts -> overflow must drop tokens,
    not crash or corrupt shapes."""
    cfg, params = fparams
    T, E, K = 32, cfg.num_local_experts, cfg.num_experts_per_tok
    C = expert_capacity(T, E, K, 1.0)  # tight capacity
    assert C < T
    top_idx = jnp.zeros((T, K), jnp.int32).at[:, 1].set(1)
    top_w = jnp.full((T, K), 0.5, jnp.float32)
    gather, wtab = M._dispatch_indices(top_idx, top_w, T, E, K, C)
    g = np.asarray(gather)
    assert (g[0] < T).sum() == C  # expert 0 full, rest dropped
    assert (g[2:] == T).all()     # unrouted experts all-pad
    x = jnp.asarray(np.random.default_rng(3).normal(size=(T, cfg.hidden_size)),
                    jnp.float32)
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    out = M._moe_block_sparse(x, lp["moe"], cfg, None, jnp.float32,
                              (top_w, top_idx), capacity_factor=1.0)
    assert out.shape == (T, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_sparse_generation_runs(fparams, monkeypatch):
    """Decode goes dense (tiny T), prefill sparse — generation end-to-end."""
    cfg, params = fparams
    from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

    monkeypatch.setenv("ASQ_MOE", "auto")
    eng = Engine(M, params, cfg, max_batch=2, max_seq=64,
                 kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    out = eng.generate([list(range(3, 20))], GenerationConfig(max_new_tokens=4))
    assert len(out[0]) == 4
