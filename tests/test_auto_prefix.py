"""Automatic prefix sharing in the paged engine (serve/paged.py block radix
tree): requests that never call register_prefix share the full prompt blocks
of earlier completed prefills copy-free. Covers token equality vs the
contiguous engine, actual page sharing + prefill-work savings, partial
overlap, LRU leaf eviction under page pressure, accounting invariants, and
the int8-page variant."""

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


def _paged(cfg, params, **kw):
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_seq", 128)
    kw.setdefault("block_size", 16)
    kw.setdefault("kv_dtype", jnp.float32)
    return PagedEngine(L, params, cfg, compute_dtype=jnp.float32, **kw)


def _contiguous(cfg, params, **kw):
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_seq", 128)
    kw.setdefault("kv_dtype", jnp.float32)
    return ContinuousEngine(L, params, cfg, compute_dtype=jnp.float32, **kw)


def _accounting_ok(pe):
    """Global page invariant: free + row-held + explicit-prefix + auto-tree
    uniquely cover the pool (page 0 is scratch). Shared pages are counted
    once — via refcounts: a page is 'held' iff ref > 0."""
    held = int((pe._ref[1:] > 0).sum())
    return pe.free_pages + held == pe.num_pages - 1


SHARED = list(range(1, 49))  # 48 tokens = 3 full 16-token blocks


def test_auto_sharing_token_equality(setup):
    """Sequential requests with a common 48-token prefix, NO register_prefix:
    the later ones share pages, and every output equals the contiguous
    engine (which never shares)."""
    cfg, params = setup
    specs = [(f"r{i}", SHARED + [60 + i, 70 + i, 80 + i], 8)
             for i in range(4)]
    want = {}
    for u, p, n in specs:
        ce = _contiguous(cfg, params)
        ce.submit(u, list(p), max_new_tokens=n)
        want.update(ce.run())
    pe = _paged(cfg, params)
    got = {}
    for u, p, n in specs:   # sequential: each run publishes, next matches
        pe.submit(u, list(p), max_new_tokens=n)
        got.update(pe.run())
    assert got == want
    # requests 2..4 matched 3 published blocks each: 48 tokens * 3 hits
    assert pe.auto_hits == 3
    assert pe.auto_hit_tokens == 3 * 48
    # prefill work actually skipped: first request prefills 51 tokens, the
    # rest only their 3-token suffix (+ nothing for the shared 48)
    assert pe.prefill_tokens_processed == 51 + 3 * 3
    assert _accounting_ok(pe)


def test_auto_sharing_is_copy_free(setup):
    """The shared blocks are the SAME physical pages (refcounted), not
    copies."""
    cfg, params = setup
    pe = _paged(cfg, params)
    pe.submit("first", SHARED + [99], max_new_tokens=4)
    pe.run()
    tree_pages = {n["page"] for n in pe._auto_nodes.values()}
    assert len(tree_pages) == 3 and pe._auto_pages == 3
    # tree holds one ref each while no row is active
    assert all(pe._ref[p] == 1 for p in tree_pages)
    pe.submit("second", SHARED + [98], max_new_tokens=4)
    pe._admit()
    # admitted row shares all 3 pages: ref 2 (tree + row)
    assert all(pe._ref[p] == 2 for p in tree_pages)
    row = next(r for r, st in pe._admitting.items())
    assert pe._row_pages[row][:3] == [
        pe._auto_nodes[nid]["page"]
        for nid in _chain_nids(pe)]
    pe.run()
    assert all(pe._ref[p] == 1 for p in tree_pages)  # row released
    assert _accounting_ok(pe)


def _chain_nids(pe):
    """nids of the root chain in walk order."""
    out, children = [], pe._auto_root
    while children:
        bt, nid = next(iter(children.items()))
        out.append(nid)
        children = pe._auto_nodes[nid]["children"]
    return out


def test_partial_overlap_matches_longest_chain(setup):
    """A prompt sharing only the first 2 of 3 published blocks matches
    exactly those, and diverging prompts match nothing."""
    cfg, params = setup
    pe = _paged(cfg, params)
    pe.submit("a", SHARED + [7], max_new_tokens=4)
    pe.run()
    two_blocks = SHARED[:32] + [200, 201, 202]   # diverges in block 3
    pages, matched = pe._auto_match(two_blocks)
    assert matched == 32 and len(pages) == 2
    divergent = [5] + SHARED[1:] + [7]
    assert pe._auto_match(divergent) == ([], 0)
    # last token never shared: a prompt equal to a published span matches
    # only up to its penultimate block boundary
    pages, matched = pe._auto_match(SHARED)      # 48 tokens, 3 blocks
    assert matched == 32                          # (48-1)//16 = 2 blocks


def test_forked_prompts_build_a_tree(setup):
    """Two prompts sharing block 1 but diverging in block 2 publish a fork;
    a third prompt picks the right branch; outputs stay exact."""
    cfg, params = setup
    base = SHARED[:16]
    pa = base + list(range(100, 116)) + [1, 2]
    pb = base + list(range(120, 136)) + [3, 4]
    want = {}
    for u, p in (("a", pa), ("b", pb)):
        ce = _contiguous(cfg, params)
        ce.submit(u, list(p), max_new_tokens=5)
        want.update(ce.run())
    pe = _paged(cfg, params)
    got = {}
    for u, p in (("a", pa), ("b", pb)):
        pe.submit(u, list(p), max_new_tokens=5)
        got.update(pe.run())
    assert got == want
    assert len(pe._auto_root) == 1               # one shared root block
    root_nid = next(iter(pe._auto_root.values()))
    assert len(pe._auto_nodes[root_nid]["children"]) == 2  # fork
    # third request down branch b shares 2 blocks
    _, matched = pe._auto_match(pb + [9])
    assert matched == 32


def test_eviction_under_page_pressure(setup):
    """A tight pool full of published blocks: admission evicts LRU leaves
    instead of deadlocking, everything completes, accounting holds."""
    cfg, params = setup
    pe = _paged(cfg, params, num_pages=10, max_auto_pages=8)  # 9 usable
    rng = np.random.default_rng(3)
    outs = {}
    for i in range(6):  # distinct 32-token prompts -> tree fills the pool
        p = rng.integers(1, 256, size=33).tolist()
        pe.submit(f"d{i}", p, max_new_tokens=6)
        outs.update(pe.run())
    assert all(len(v) == 6 for v in outs.values())
    assert pe._auto_pages <= pe.max_auto_pages
    assert _accounting_ok(pe)
    # leaf-only eviction kept the tree well-formed: every parent reachable
    for nid, node in pe._auto_nodes.items():
        assert node["parent"] is None or node["parent"] in pe._auto_nodes


def test_auto_off_flag(setup):
    cfg, params = setup
    pe = _paged(cfg, params, auto_prefix=False)
    pe.submit("x", SHARED + [9], max_new_tokens=4)
    pe.run()
    pe.submit("y", SHARED + [8], max_new_tokens=4)
    pe.run()
    assert pe.auto_hits == 0 and pe._auto_pages == 0
    assert pe.free_pages == pe.num_pages - 1


def test_explicit_prefix_pages_republish_to_tree(setup):
    """A request admitted via an EXPLICIT registered prefix publishes those
    same pages into the auto tree, so later prefix-less requests share them
    too (one ref from the registry, one from the tree, same pages)."""
    cfg, params = setup
    pe = _paged(cfg, params)
    pe.register_prefix("sys", SHARED[:32])        # 2 full blocks
    pe.submit("with", SHARED[:32] + [9, 9], max_new_tokens=4, prefix="sys")
    pe.run()
    pe.submit("without", SHARED[:32] + [8, 8], max_new_tokens=4)
    pe._admit()
    assert pe.auto_hits == 1 and pe.auto_hit_tokens == 32
    tree_pages = {n["page"] for n in pe._auto_nodes.values()}
    assert tree_pages == set(pe._prefixes["sys"]["pages"])
    pe.run()
    assert _accounting_ok(pe)


def test_int8_pages_auto_sharing(setup):
    """Auto sharing with QuantPagedKVPool: scale pages ride along; tokens
    equal the contiguous int8-KV run."""
    cfg, params = setup
    specs = [("i0", SHARED + [11], 6), ("i1", SHARED + [12], 6)]
    want = {}
    for u, p, n in specs:
        ce = _contiguous(cfg, params, kv_dtype=jnp.int8)
        ce.submit(u, list(p), max_new_tokens=n)
        want.update(ce.run())
    pe = _paged(cfg, params, kv_dtype=jnp.int8)
    got = {}
    for u, p, n in specs:
        pe.submit(u, list(p), max_new_tokens=n)
        got.update(pe.run())
    assert got == want
    assert pe.auto_hits == 1 and pe.auto_hit_tokens == 48


def test_concurrent_batch_shares_after_first_completes(setup):
    """All requests submitted BEFORE any prefill: the first wave prefills in
    full (nothing published yet), later waves through the same engine hit.
    Equality with contiguous regardless."""
    cfg, params = setup
    specs = [(f"c{i}", SHARED + [30 + i], 6) for i in range(6)]
    ce = _contiguous(cfg, params)
    for u, p, n in specs:
        ce.submit(u, list(p), max_new_tokens=n)
    want = ce.run()
    pe = _paged(cfg, params)  # max_batch 4 -> 2 requests queue behind
    for u, p, n in specs:
        pe.submit(u, list(p), max_new_tokens=n)
    got = pe.run()
    assert got == want
    assert pe.auto_hits >= 2   # the queued wave admitted via the tree
    assert _accounting_ok(pe)


def test_cancel_during_auto_admission_releases_shares(setup):
    """Cancelling a request mid suffix-prefill (auto-matched, sitting in
    _admitting) drops its refs on the shared tree pages and frees its
    private pages — no leak, tree intact for the next request."""
    cfg, params = setup
    pe = _paged(cfg, params)
    pe.submit("pub", SHARED + [99], max_new_tokens=4)
    pe.run()
    tree_pages = {n["page"] for n in pe._auto_nodes.values()}
    pe.submit("doomed", SHARED + [98, 97], max_new_tokens=4)
    pe._admit()   # auto-matched -> _admitting, shares tree pages
    assert all(pe._ref[p] == 2 for p in tree_pages)
    assert pe.cancel("doomed")
    assert all(pe._ref[p] == 1 for p in tree_pages)
    assert _accounting_ok(pe)
    # tree still serves the next request
    pe.submit("next", SHARED + [96], max_new_tokens=4)
    out = pe.run()
    assert len(out["next"]) == 4 and pe.auto_hits == 2


def test_clear_auto_prefixes(setup):
    cfg, params = setup
    pe = _paged(cfg, params)
    pe.submit("x", SHARED + [9], max_new_tokens=4)
    pe.run()
    assert pe._auto_pages == 3
    pe.clear_auto_prefixes()
    assert pe._auto_pages == 0
    assert pe.free_pages == pe.num_pages - 1
