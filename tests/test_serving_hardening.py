"""Regression tests for the r5 serving-hardening review findings:
exact page reservation, progress-only eviction under pressure, prefix
registration leak on device failure, chunked cold admission in the paged
engine, per-request scheduler fault isolation, and OpenAI null params."""

import json
import threading
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.serve.api import serve
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


def test_fresh_admission_reserves_exactly_needed_pages(setup):
    """A 33-token prompt + 2 new tokens needs ceil(35/16)=3 pages; the
    pow2 prefill bucket (64 tokens = 4 blocks) must NOT inflate the
    reservation (r5 review: up to ~2x pages were pinned for the request's
    lifetime)."""
    cfg, params = setup
    pe = _paged(cfg, params)
    r = pe.submit("x", list(range(1, 34)), max_new_tokens=2)
    pe._admit()
    row = next(i for i, q in enumerate(pe.slot_req) if q is r)
    assert len(pe._row_pages[row]) == 3
    assert pe.free_pages == pe.num_pages - 1 - 3
    pe.run()
    assert r.done and len(r.output) == 2


def test_pressure_eviction_never_destroys_shared_cache(setup):
    """When every evictable cache page is still shared by an active row,
    admission must BACKPRESSURE — not cascade-destroy the radix tree and
    prefix registry while freeing nothing (r5 review)."""
    cfg, params = setup
    # 11 usable pages; block 16
    pe = _paged(cfg, params, num_pages=12, max_batch=2)
    shared = list(range(1, 49))  # 3 full blocks
    # publisher completes: tree holds its 3 blocks
    pe.submit("pub", shared + [60] * 12, max_new_tokens=4)   # 4 pages
    pe.run()
    assert pe._auto_pages == 3
    # two long-running requests share the tree pages (ref 2) and consume
    # the remaining free pages
    a = pe.submit("a", shared + [61], max_new_tokens=40)     # 2 private
    b = pe.submit("b", shared + [62], max_new_tokens=40)     # 2 private
    pe._admit()
    while pe._admitting:
        pe.step()
    # tree pages now shared with both rows: nothing evictable can free
    tree_pages = [n["page"] for n in pe._auto_nodes.values()]
    assert all(pe._ref[p] >= 2 for p in tree_pages)
    free_before = pe.free_pages
    # a request needing more pages than exist free must queue, with the
    # tree and any registered prefixes left intact
    pe.submit("big", list(range(100, 190)), max_new_tokens=20)
    pe._admit()
    assert pe._auto_pages == 3, "eviction destroyed shared tree pages"
    assert pe.free_pages == free_before
    assert pe.waiting and pe.waiting[0].uid == "big"
    # completes once the long runners release their pages
    out = pe.run()
    assert len(out["big"]) == 20 and a.done and b.done


def test_register_prefix_failure_returns_pages(setup):
    """A device failure mid-registration must not leak the freshly
    allocated pages (r5 review: retries drained the pool permanently)."""
    cfg, params = setup
    pe = _paged(cfg, params)
    free0 = pe.free_pages

    orig = pe._prefill

    def boom(bucket):
        raise RuntimeError("synthetic device fault")

    pe._prefill = boom
    try:
        with pytest.raises(RuntimeError, match="synthetic"):
            pe.register_prefix("sys", list(range(1, 40)))
    finally:
        pe._prefill = orig
    assert pe.free_pages == free0
    assert "sys" not in pe._prefixes
    # the engine still works afterwards
    pe.register_prefix("sys", list(range(1, 40)))
    out = pe.run() if False else None
    assert "sys" in pe._prefixes


def test_paged_chunked_cold_admission(setup):
    """With prefill_chunk set, a fresh (no-prefix) prompt must enter the
    chunked _admitting path — one chunk per tick — instead of a
    whole-bucket synchronous prefill that stalls active decoders (r5
    review); tokens stay equal to the contiguous engine."""
    cfg, params = setup
    pe = _paged(cfg, params, prefill_chunk=32)
    r = pe.submit("long", list(range(1, 90)), max_new_tokens=6)
    pe._admit()
    assert not r.done
    row = next(iter(pe._admitting))
    assert pe._admitting[row]["req"] is r and pe._admitting[row]["pos"] == 0
    pe.run()
    ce = ContinuousEngine(L, params, cfg, max_batch=4, max_seq=128,
                          kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                          prefill_chunk=32)
    ce.submit("long", list(range(1, 90)), max_new_tokens=6)
    want = ce.run()
    assert r.done and r.output[:6] == want["long"]


def test_plain_ticks_mirror_into_draft_pool(setup):
    """Plain decode ticks (forced by a sampled request in the batch) must
    mirror their tokens into the draft pool; otherwise the draft attends
    K/V holes once speculation resumes and acceptance collapses (r5
    review). With the target as its own draft, acceptance stays ~1.0 —
    but only if the mirror ran during the plain phase."""
    from autosmoothquant_tpu.serve.engine import DraftModel

    cfg, params = setup
    d = DraftModel(model=L, params=params, cfg=cfg)
    eng = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=128,
                           kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                           speculative_gamma=3, speculative_adaptive=False,
                           draft=d)
    # phase 1: a sampled request forces the PLAIN path for the whole batch
    g = eng.submit("greedy", [3, 1, 4, 1, 5, 9], max_new_tokens=30)
    s = eng.submit("samp", [7, 7, 7], max_new_tokens=6, temperature=0.9)
    while not s.done:
        eng.step()
    assert not g.done and len(g.output) >= 6  # decoded plainly alongside
    # phase 2: greedy-only batch -> speculation resumes over the history
    # decoded during phase 1
    while not g.done:
        eng.step()
    assert eng._spec_acc_ema > 0.9, eng._spec_acc_ema
    # exactness vs a plain engine (always guaranteed; the EMA is the tell)
    plain = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=128,
                             kv_dtype=jnp.float32,
                             compute_dtype=jnp.float32)
    want = plain.submit("greedy", [3, 1, 4, 1, 5, 9], max_new_tokens=30)
    plain.run()
    assert g.output[:30] == want.output[:30]


def test_cancel_flags_queued_requests_done(setup):
    """cancel() must set done=True wherever the request sits (waiting /
    admitting), or a `while not req.done` driver spins forever (r5
    review)."""
    cfg, params = setup
    pe = _paged(cfg, params, max_batch=1)
    a = pe.submit("a", [1, 2, 3], max_new_tokens=50)
    w = pe.submit("w", [4, 5, 6], max_new_tokens=4)  # queued behind a
    pe._admit()
    assert pe.cancel("w") and w.done
    assert pe.cancel("a") and a.done
    pe2 = _paged(cfg, params)
    r = pe2.submit("r", [1, 2], max_new_tokens=4)
    pe2.reset_slots()
    assert r.done


def test_submit_boundary_validation(setup):
    """Out-of-range/empty prompts are rejected at submit, never inside a
    scheduler tick (r5 review: one bad id crashed the tick and reset every
    healthy slot)."""
    cfg, params = setup
    pe = _paged(cfg, params)
    with pytest.raises(ValueError, match="non-empty"):
        pe.submit("e", [], max_new_tokens=4)
    with pytest.raises(ValueError, match="token ids"):
        pe.submit("big", [cfg.vocab_size + 5], max_new_tokens=4)
    with pytest.raises(ValueError, match="token ids"):
        pe.submit("neg", [-1, 2], max_new_tokens=4)
    # a healthy request still runs on the same engine
    r = pe.submit("ok", [1, 2, 3], max_new_tokens=4)
    pe.run()
    assert r.done and len(r.output) == 4


def test_chunked_prefill_token_counter_exact(setup):
    """prefill_tokens_processed counts logical tokens once — the ragged
    final chunk's overlap re-feed must not double-count (r5 review)."""
    cfg, params = setup
    ce = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=128,
                          kv_dtype=jnp.float32, compute_dtype=jnp.float32,
                          prefill_chunk=64)
    ce.submit("x", list(range(1, 101)), max_new_tokens=2)  # 100 tokens
    ce.run()
    assert ce.prefill_tokens_processed == 100


def test_scheduler_isolates_bad_submission():
    """A malformed submit fails only its own client with an engine error;
    concurrent healthy requests complete untouched (r5 review: one bad
    request hung its client 600 s and reset every healthy slot)."""
    cfg = L.LlamaConfig(**TINY)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    eng = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=64,
                           kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    api, httpd = serve(eng, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        good = {}

        def ok():
            good["toks"] = api.submit([3, 1, 4], max_new_tokens=4,
                                      timeout=60)

        th = threading.Thread(target=ok)
        th.start()
        with pytest.raises(RuntimeError, match="engine error"):
            # unknown kwarg -> eng.submit raises TypeError in the scheduler
            api.submit([5, 6], max_new_tokens=4, timeout=10,
                       bogus_knob=True)
        th.join(timeout=60)
        assert good["toks"] is not None and len(good["toks"]) == 4
    finally:
        httpd.shutdown()
        api.stop()


def test_v1_null_params_use_defaults():
    """Explicit JSON null for max_tokens/temperature/top_p must apply the
    OpenAI defaults, not 500 (r5 review)."""
    cfg = L.LlamaConfig(**TINY)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    eng = ContinuousEngine(L, params, cfg, max_batch=2, max_seq=64,
                           kv_dtype=jnp.float32, compute_dtype=jnp.float32)
    api, httpd = serve(eng, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt": [3, 1, 4], "max_tokens": None,
                             "temperature": None, "top_p": None,
                             "repetition_penalty": None}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["choices"][0]["tokens"]) == 16  # OpenAI default
    finally:
        httpd.shutdown()
        api.stop()
