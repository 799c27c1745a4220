"""Multi-host serving coordination (serve/multihost.py). A single process
cannot exercise DCN, but every marshalling path (fixed-shape broadcast
arrays, allgather padding, uid routing) runs for real, and the lockstep
engine must reproduce the plain ContinuousEngine's outputs exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from autosmoothquant_tpu.serve.batching import ContinuousEngine, Request
from autosmoothquant_tpu.serve.multihost import (
    MultiHostEngine, ShardedServingPool, broadcast_requests)


def _tiny():
    from autosmoothquant_tpu.models import llama as L

    cfg = L.LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, max_position_embeddings=128)
    return L, cfg, L.init_params(cfg, jax.random.PRNGKey(0))


def _requests(n=3, seed=0):
    rng = np.random.default_rng(seed)
    return [Request(uid=i, prompt=rng.integers(1, 128, size=5 + 3 * i).tolist(),
                    max_new_tokens=6, eos_token_id=None) for i in range(n)]


def test_broadcast_requests_marshalling():
    reqs = _requests()
    reqs[1].eos_token_id = 7
    reqs[2].prefix = "system-v1"
    out = broadcast_requests(reqs, max_prompt=64)
    assert len(out) == len(reqs)
    for a, b in zip(reqs, out):
        assert a.prompt == b.prompt
        assert a.max_new_tokens == b.max_new_tokens
        assert a.eos_token_id == b.eos_token_id
        assert a.prefix == b.prefix  # prefix-cache id survives marshalling


def test_broadcast_rejects_oversized_prompt_and_nonstr_prefix():
    import pytest

    with pytest.raises(ValueError, match="max_prompt"):
        broadcast_requests([Request(uid=0, prompt=list(range(65)),
                                    max_new_tokens=2)], max_prompt=64)
    with pytest.raises(ValueError, match="string"):
        broadcast_requests([Request(uid=0, prompt=[1], max_new_tokens=2,
                                    prefix=123)], max_prompt=64)


def test_pool_submit_rejects_non_int32_uid():
    import pytest

    L, cfg, params = _tiny()
    pool = ShardedServingPool(L, params, cfg, max_batch=2, max_seq=64,
                              kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="int32"):
        pool.submit(2**31, [1, 2, 3])


def test_multihost_engine_matches_plain_engine():
    L, cfg, params = _tiny()
    reqs = _requests()
    plain = ContinuousEngine(L, params, cfg, max_batch=4, max_seq=64,
                             kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    want = plain.run([Request(r.uid, list(r.prompt), r.max_new_tokens)
                      for r in reqs])
    mh = MultiHostEngine(L, params, cfg, max_batch=4, max_seq=64,
                         kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    got = mh.serve(_requests())
    assert set(got) == set(want)
    for uid in want:
        assert got[uid] == want[uid]


def test_sharded_pool_single_process():
    L, cfg, params = _tiny()
    pool = ShardedServingPool(L, params, cfg, max_batch=4, max_seq=64,
                              kv_dtype=jnp.float32,
                              compute_dtype=jnp.float32, max_new_cap=16)
    owned = [pool.submit(r.uid, r.prompt, max_new_tokens=r.max_new_tokens)
             for r in _requests()]
    assert all(owned)  # nproc=1 owns everything
    pool.run()
    merged = pool.gather()
    assert set(merged) == {0, 1, 2}
    assert all(len(v) == 6 for v in merged.values())


def test_owner_routing_stable_and_balanced():
    owners = [ShardedServingPool._owner(uid, 4) for uid in range(4096)]
    assert owners == [ShardedServingPool._owner(uid, 4) for uid in range(4096)]
    counts = np.bincount(owners, minlength=4)
    assert counts.min() > 4096 / 4 * 0.8, counts


def test_sharded_pool_paged_engine():
    """Engine-per-replica DP over the block-paged engine (engine_cls):
    the full production topology — pooled KV capacity per replica, DP
    routing + gather across replicas."""
    from autosmoothquant_tpu.serve.paged import PagedEngine

    L, cfg, params = _tiny()
    pool = ShardedServingPool(L, params, cfg, engine_cls=PagedEngine,
                              max_batch=4, max_seq=64, block_size=16,
                              kv_dtype=jnp.float32,
                              compute_dtype=jnp.float32, max_new_cap=16)
    plain = ShardedServingPool(L, params, cfg, max_batch=4, max_seq=64,
                               kv_dtype=jnp.float32,
                               compute_dtype=jnp.float32, max_new_cap=16)
    for p in (pool, plain):
        for r in _requests():
            p.submit(r.uid, r.prompt, max_new_tokens=r.max_new_tokens)
        p.run()
    assert pool.gather() == plain.gather()
