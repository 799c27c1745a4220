"""Block-paged continuous engine (serve/paged.py): token equality with the
contiguous engine, pooled-capacity admission beyond contiguous limits,
copy-free prefix page sharing, and page-accounting invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.serve.batching import ContinuousEngine
from autosmoothquant_tpu.serve.paged import PagedEngine

TINY = dict(
    vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
)


@pytest.fixture(scope="module")
def setup():
    cfg = L.LlamaConfig(**TINY)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _contiguous(cfg, params, **kw):
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_seq", 128)
    kw.setdefault("kv_dtype", jnp.float32)
    return ContinuousEngine(L, params, cfg,
                            compute_dtype=jnp.float32, **kw)


def _paged(cfg, params, **kw):
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_seq", 128)
    kw.setdefault("block_size", 16)
    kw.setdefault("kv_dtype", jnp.float32)
    return PagedEngine(L, params, cfg,
                       compute_dtype=jnp.float32, **kw)


def _submit_all(eng, specs):
    for uid, prompt, n, kws in specs:
        eng.submit(uid, prompt, max_new_tokens=n, **kws)
    return eng.run()


SPECS = [
    ("a", [3, 1, 4, 1, 5, 9, 2, 6], 10, {}),
    ("b", [9] * 17, 8, {}),
    ("c", list(range(1, 40)), 6, {}),
    ("d", [2, 8], 12, {}),
    ("e", [7, 7, 7, 7, 7], 9, {}),
    ("f", list(range(200, 230)), 5, {}),
]


def test_matches_contiguous_engine_greedy(setup):
    """Same requests, same greedy tokens — including slot churn (6 requests
    through 4 slots)."""
    cfg, params = setup
    want = _submit_all(_contiguous(cfg, params, steps_per_sync=3),
                       [(u, list(p), n, dict(k)) for u, p, n, k in SPECS])
    pe = _paged(cfg, params, steps_per_sync=3)
    got = _submit_all(pe, [(u, list(p), n, dict(k)) for u, p, n, k in SPECS])
    assert got == want
    # every page returned to the free list after completion, except the
    # full prompt blocks the auto-prefix radix tree published (page 0 is
    # scratch); clearing the tree returns the pool to pristine
    assert pe.free_pages == pe.num_pages - 1 - pe._auto_pages
    pe.clear_auto_prefixes()
    assert pe.free_pages == pe.num_pages - 1


def test_matches_contiguous_engine_sampled(setup):
    """Sampled requests: equal seeds + equal scheduling order -> equal
    tokens (the engine's fold_in(seed, event#) determinism)."""
    cfg, params = setup
    specs = [("s1", [5, 6, 7, 8], 8,
              dict(temperature=0.8, top_k=20, top_p=0.9)),
             ("s2", [11] * 9, 8, dict(temperature=1.1))]
    want = _submit_all(_contiguous(cfg, params, seed=7), list(specs))
    got = _submit_all(_paged(cfg, params, seed=7), list(specs))
    assert got == want


def test_chunked_prefill_matches(setup):
    cfg, params = setup
    specs = [("long", list(range(1, 90)), 7, {}),
             ("short", [4, 2], 7, {})]
    want = _submit_all(_contiguous(cfg, params, prefill_chunk=32),
                       [(u, list(p), n, dict(k)) for u, p, n, k in specs])
    got = _submit_all(_paged(cfg, params, prefill_chunk=32),
                      [(u, list(p), n, dict(k)) for u, p, n, k in specs])
    assert got == want


def test_pooled_capacity_beyond_contiguous(setup):
    """The capacity headline: 4 concurrent requests run in a pool that
    holds FAR less than max_batch x max_seq contiguous capacity (worst
    case would need 4x128 tokens = 32 blocks; the pool has 13), because
    reservation is per actual need, not per worst case."""
    cfg, params = setup
    pe = _paged(cfg, params, num_pages=14)  # 13 usable + scratch
    specs = [(f"r{i}", [i + 1, 2 * i + 1, 7], 10, {}) for i in range(4)]
    # each needs ceil((3+10)/16) = 1 page -> all 4 admitted concurrently
    reqs = {uid: pe.submit(uid, p, max_new_tokens=n, **kw)
            for uid, p, n, kw in specs}
    pe._admit()
    assert sum(r is not None for r in pe.slot_req) == 4
    pe.run()
    outs = {u: r.output[:r.max_new_tokens] for u, r in reqs.items()}
    want = _submit_all(_contiguous(cfg, params),
                       [(u, list(p), n, dict(k)) for u, p, n, k in specs])
    assert outs == want


def test_backpressure_when_pages_exhausted(setup):
    """More demand than pages: admission queues the excess (no crash, no
    corruption) and completes everything as pages free up."""
    cfg, params = setup
    pe = _paged(cfg, params, num_pages=7)  # 6 usable pages
    specs = [(f"q{i}", list(range(1, 30)), 14, {}) for i in range(5)]
    # each needs ceil((29+14)/16) = 3 pages -> only 2 fit at once
    reqs = {uid: pe.submit(uid, p, max_new_tokens=n, **kw)
            for uid, p, n, kw in specs}
    pe._admit()
    # 2 of 5 fit at once (the second shares the first's published block,
    # so it sits in _admitting for suffix prefill rather than slot_req)
    assert (sum(r is not None for r in pe.slot_req)
            + len(pe._admitting)) == 2
    pe.run()
    outs = {u: r.output[:r.max_new_tokens] for u, r in reqs.items()}
    want = _submit_all(_contiguous(cfg, params),
                       [(u, list(p), n, dict(k)) for u, p, n, k in specs])
    assert outs == want
    # the 5 identical prompts shared published blocks through the tree
    assert pe.auto_hits >= 1
    assert pe.free_pages == 6 - pe._auto_pages


def test_prefix_sharing_is_copy_free(setup):
    """Registered prefix pages are SHARED: admitting 3 requests over a
    32-token prefix (2 full 16-token blocks) consumes zero extra pages for
    the shared part, and outputs equal full-prefill runs."""
    cfg, params = setup
    pe = _paged(cfg, params)
    prefix = list(range(1, 33))  # 2 full blocks, no tail
    pe.register_prefix("sys", prefix)
    free_after_reg = pe.free_pages
    entry = pe._prefixes["sys"]
    assert len(entry["pages"]) == 2 and entry["tail"] is None

    specs = [(f"p{i}", prefix + [50 + i, 60 + i, 70 + i], 6,
              dict(prefix="sys")) for i in range(3)]
    reqs = {uid: pe.submit(uid, p, max_new_tokens=n, **kw)
            for uid, p, n, kw in specs}
    pe._admit()
    # shared blocks: refcount 1 (registry) + 3 (slots); each request's
    # private need = ceil((35+6)/16) - 2 shared = 1 page
    assert all(pe._ref[p] == 4 for p in entry["pages"])
    assert pe.free_pages == free_after_reg - 3
    pe.run()
    outs = {u: r.output[:r.max_new_tokens] for u, r in reqs.items()}

    want = _submit_all(_paged(cfg, params),
                       [(u, list(p), n, {}) for u, p, n, _ in specs])
    assert outs == want
    # slots released their shares; registry keeps one ref and the auto
    # tree (which republished the same pages on completion) another
    assert all(pe._ref[p] == 2 for p in entry["pages"])
    assert {n["page"] for n in pe._auto_nodes.values()} == set(entry["pages"])
    pe.clear_auto_prefixes()
    pe.drop_prefix("sys")
    assert pe.free_pages == pe.num_pages - 1


def test_prefix_with_partial_tail_block(setup):
    """A prefix whose length is not block-aligned: full blocks shared, the
    tail block copied per request; tokens equal the full-prefill run."""
    cfg, params = setup
    pe = _paged(cfg, params)
    prefix = list(range(1, 25))  # 24 tokens: 1 full block + 8-token tail
    pe.register_prefix("sys", prefix)
    entry = pe._prefixes["sys"]
    assert len(entry["pages"]) == 1 and entry["tail"] is not None

    prompt = prefix + [99, 98]
    got = _submit_all(pe, [("x", prompt, 8, dict(prefix="sys"))])
    want = _submit_all(_paged(cfg, params), [("y", list(prompt), 8, {})])
    assert got["x"] == want["y"]


def test_cancel_frees_pages(setup):
    cfg, params = setup
    pe = _paged(cfg, params)
    pe.submit("gone", [1, 2, 3, 4], max_new_tokens=50)
    pe._admit()
    assert pe.free_pages < pe.num_pages - 1
    assert pe.cancel("gone")
    assert pe.free_pages == pe.num_pages - 1


def test_register_prefix_guards(setup):
    from autosmoothquant_tpu.serve.batching import PrefixCacheFull

    cfg, params = setup
    pe = _paged(cfg, params, num_pages=3)  # 2 usable
    with pytest.raises(ValueError, match="max_seq"):
        pe.register_prefix("big", list(range(1, 300)))
    with pytest.raises(PrefixCacheFull, match="free pages"):
        pe.register_prefix("wide", list(range(1, 60)))  # needs 4 pages


def test_int8_kv_pages_match_contiguous_int8_kv(setup):
    """int8 KV pages (QuantPagedKVPool): token equality with the contiguous
    engine running its int8 KV cache — paging's pooled capacity stacks on
    the int8 cache's 2x bytes-per-token."""
    from autosmoothquant_tpu.models.common import QuantPagedKVPool

    cfg, params = setup
    specs = [(u, list(p), n, dict(k)) for u, p, n, k in SPECS[:4]]
    want = _submit_all(_contiguous(cfg, params, kv_dtype=jnp.int8), specs)
    pe = _paged(cfg, params, kv_dtype=jnp.int8)
    assert isinstance(pe.pool, QuantPagedKVPool)
    got = _submit_all(pe, [(u, list(p), n, dict(k))
                           for u, p, n, k in SPECS[:4]])
    assert got == want
    assert pe.free_pages == pe.num_pages - 1 - pe._auto_pages


def test_int8_kv_pages_prefix_sharing(setup):
    """Prefix page sharing with int8 pages: scale pages share alongside
    value pages; tokens equal the full-prefill int8-paged run."""
    cfg, params = setup
    pe = _paged(cfg, params, kv_dtype=jnp.int8)
    prefix = list(range(1, 33))
    pe.register_prefix("sys", prefix)
    got = _submit_all(pe, [("x", prefix + [9, 8, 7], 6,
                            dict(prefix="sys"))])
    want = _submit_all(_paged(cfg, params, kv_dtype=jnp.int8),
                       [("y", prefix + [9, 8, 7], 6, {})])
    assert got["x"] == want["y"]


def test_paged_engine_tensor_parallel_mesh(setup):
    """Paged pool sharded over a (1, 2) model mesh (pages split on KV
    heads, table replicated): token equality with the unmeshed paged
    engine, including prefix sharing and int8 pages."""
    from autosmoothquant_tpu.shard.mesh import make_mesh

    cfg, params = setup
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    specs = [(u, list(p), n, dict(k)) for u, p, n, k in SPECS[:4]]
    for kv in (jnp.float32, jnp.int8):
        want = _submit_all(_paged(cfg, params, kv_dtype=kv),
                           [(u, list(p), n, dict(k))
                            for u, p, n, k in SPECS[:4]])
        pe = _paged(cfg, params, kv_dtype=kv, mesh=mesh)
        pe.register_prefix("sys", list(SPECS[0][1]))
        got = _submit_all(pe, specs)
        assert got == want, kv


def test_paged_speculative_greedy_exact(setup):
    """Engine-level prompt-lookup speculation over the paged pool: the
    gamma+1-position verify forward routes its writes through the block
    table (t>1 vector-index paged path) and page reservation covers the
    draft overhang — outputs must equal plain paged decoding exactly."""
    cfg, params = setup
    specs = [("a", [7] * 4 + [3, 1, 4] * 6, 10), ("b", [9] * 17, 8)]
    outs = {}
    for g in (0, 2):
        pe = _paged(cfg, params, speculative_gamma=g)
        for u, p, n in specs:
            pe.submit(u, list(p), max_new_tokens=n)
        outs[g] = pe.run()
    assert outs[0] == outs[2]


def test_paged_draft_model_greedy_exact(setup):
    """Draft-MODEL speculation over the paged pool (r5): the draft keeps a
    contiguous cache that admission mirrors on every paged path — bucket
    prefill, explicit-prefix insert, AUTO-matched prefix (draft prefills
    the matched span itself), and chunked suffixes. Verification guarantees
    exactness for ANY draft, so outputs must equal plain paged decoding
    through all those paths."""
    from autosmoothquant_tpu.serve.engine import DraftModel

    cfg, params = setup
    dcfg = L.LlamaConfig(vocab_size=cfg.vocab_size, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=1,
                         num_attention_heads=2, num_key_value_heads=2,
                         max_position_embeddings=256)
    dparams = L.init_params(dcfg, jax.random.PRNGKey(9))
    prefix = list(range(1, 33))                      # 2 full 16-tok blocks
    shared = [7] * 40                                 # auto-tree fodder
    waves = [
        [("p0", prefix + [50, 51], 8, dict(prefix="sys")),   # explicit
         ("a0", shared + [1], 8, {}),                        # publishes
         ("b0", [9, 8, 7, 6, 5], 8, {})],                    # bucket
        [("a1", shared + [2], 8, {})],                       # auto hit
    ]
    outs = {}
    for use_draft in (False, True):
        d = (DraftModel(model=L, params=dparams, cfg=dcfg)
             if use_draft else None)
        pe = _paged(cfg, params, speculative_gamma=3 if use_draft else 0,
                    draft=d)
        pe.register_prefix("sys", list(prefix))
        got = {}
        for wave in waves:
            for u, p, n, kw in wave:
                pe.submit(u, list(p), max_new_tokens=n, **kw)
            got.update(pe.run())
        outs[use_draft] = got
        if use_draft:
            assert pe.auto_hits >= 1      # the draft path took a tree hit
            assert "sys" in pe._dprefixes  # draft prefix mirror registered
    assert outs[True] == outs[False]


def test_paged_draft_suffix_mirror_keeps_acceptance(setup):
    """Regression (r5 review): an auto-matched admission's SUFFIX must be
    mirrored into the draft pool by _advance_prefills. With the draft being
    the target itself, greedy drafts match greedy decoding exactly — but
    only if the draft's K/V agrees with the target's for the whole prompt.
    A missing suffix mirror leaves the draft proposing from zero K/V and
    acceptance collapses (outputs stay exact either way, so only the
    acceptance EMA can catch it)."""
    from autosmoothquant_tpu.serve.engine import DraftModel

    cfg, params = setup
    d = DraftModel(model=L, params=params, cfg=cfg)
    shared = list(range(1, 49))                    # 3 full blocks
    pe = _paged(cfg, params, speculative_gamma=3, draft=d,
                speculative_adaptive=False)
    pe.submit("pub", shared + [60] * 12, max_new_tokens=16)
    pe.run()
    # auto-matched: 48 shared tokens + a 12-token suffix through chunks
    pe.submit("hit", shared + [61] * 12, max_new_tokens=16)
    pe.run()
    assert pe.auto_hits == 1
    assert pe._spec_acc_ema > 0.9, pe._spec_acc_ema


def test_prefix_lru_eviction_at_cap(setup):
    """At max_prefixes a new registration evicts the least-recently-USED
    prefix (r3 verdict item 6) instead of raising; an LRU touch comes from
    admission hits, not just registration order."""
    cfg, params = setup
    pe = _paged(cfg, params, max_prefixes=2)
    pe.register_prefix("a", [1, 2, 3, 4])
    pe.register_prefix("b", [5, 6, 7, 8])
    # use "a" so "b" becomes LRU
    pe.submit("r0", [1, 2, 3, 4, 9], max_new_tokens=3, prefix="a")
    pe.run()
    pe.register_prefix("c", [9, 8, 7])
    assert set(pe._prefixes) == {"a", "c"}
    assert len(pe._prefixes) <= pe.max_prefixes


def test_prefix_eviction_frees_pages_for_registration(setup):
    """Page pressure during registration evicts idle LRU prefixes until the
    allocation fits; PrefixCacheFull only when eviction cannot help."""
    from autosmoothquant_tpu.serve.batching import PrefixCacheFull

    cfg, params = setup
    pe = _paged(cfg, params, num_pages=9)  # 8 usable, block_size 16
    pe.register_prefix("a", list(range(1, 49)))   # 3 pages
    pe.register_prefix("b", list(range(1, 49)))   # 3 pages -> 2 free
    free_before = pe.free_pages
    assert free_before == 2
    pe.register_prefix("c", list(range(1, 65)))   # needs 4: evicts "a"
    assert "a" not in pe._prefixes and "c" in pe._prefixes
    # now b(3) + c(4) = 7 used, 1 free; a 2-page registration must evict
    pe.register_prefix("d", list(range(1, 18)))   # needs 2: evicts LRU "b"
    assert "b" not in pe._prefixes
    # pages pinned OUTSIDE the prefix system (an active request's working
    # set) are not evictable: when eviction can't free enough, fail honestly
    pe2 = _paged(cfg, params, num_pages=9)
    assert pe2._alloc(4) is not None               # simulate active rows
    pe2.register_prefix("a", list(range(1, 49)))   # 3 pages -> 1 free
    with pytest.raises(PrefixCacheFull, match="free pages"):
        pe2.register_prefix("huge", list(range(1, 81)))  # needs 5 > 4 free


def test_admission_evicts_idle_prefix_under_page_pressure(setup):
    """A queued request whose pages don't fit evicts idle LRU prefixes
    rather than waiting forever behind dead cache entries."""
    cfg, params = setup
    pe = _paged(cfg, params, num_pages=7)  # 6 usable
    pe.register_prefix("idle", list(range(1, 49)))  # pins 3 pages
    # request needs 4 pages (48 prompt + 12 new = 60 tokens, block 16):
    # only 3 free -> must evict "idle" to admit
    pe.submit("r", list(range(1, 49)), max_new_tokens=12)
    out = pe.run()
    assert len(out["r"]) == 12
    assert "idle" not in pe._prefixes
