"""Block-paged continuous-batching engine (vLLM-style block tables).

``ContinuousEngine`` reserves a contiguous ``max_seq`` row per slot, so HBM
capacity = max_batch x max_seq regardless of actual request lengths, and
its prefix cache COPIES shared K/V into every slot row. ``PagedEngine``
pools capacity instead: K/V lives in fixed-size pages, a per-slot block
table maps virtual positions to pages, admission reserves only
ceil((prompt + max_new) / block_size) pages per request, and registered
prefixes SHARE their full pages across slots copy-free (only a partial
tail block is copied per request). Beyond explicit registration, a block
radix tree AUTOMATICALLY shares the full prompt blocks of completed
prefills with later requests whose prompts start with the same tokens —
no register_prefix call needed (r4 verdict item 6). Model-side compute is
models/common.paged_attend — an online-softmax scan over mapped pages
(flash-style: no virtual-cache materialization), pure lax so it nests
inside the decode layer-scan safely on this runtime.

Beyond-reference scope: the reference has no serving tier (SURVEY.md
§2.6); this is the north-star long-context serving requirement
(VERDICT round 2, item 4).

Current limits (asserted): llama-family models (no ALiBi / sliding
window). KV pages may be bf16/f32 OR int8
(QuantPagedKVPool: value+scale pages, 2x capacity per HBM byte).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.common import PagedKVPool, QuantPagedKVPool
from .batching import ContinuousEngine, PrefixCacheFull, Request, _bucket


class PagedEngine(ContinuousEngine):
    """Drop-in ContinuousEngine with a block-paged KV pool.

    num_pages bounds TOTAL cache capacity: it may be far below
    max_batch x blocks_per_slot — requests are admitted while pages last
    (backpressure queues the rest), so many short/medium requests can run
    concurrently in the HBM a contiguous pool would burn on worst-case
    rows. Page 0 is a scratch page: inactive decode rows write there."""

    def __init__(self, model_mod, params, cfg, qcfg=None, *,
                 block_size: int = 32, num_pages: Optional[int] = None,
                 mesh=None, speculative_gamma: int = 0,
                 auto_prefix: bool = True,
                 max_auto_pages: Optional[int] = None, **kw):
        self.block_size = block_size
        self.num_pages = num_pages
        self._scatter_cache: Dict[Any, Any] = {}
        # automatic prefix sharing (r4 verdict item 6): a radix tree over
        # block-aligned prompt prefixes. Completed prefills PUBLISH their
        # full prompt blocks (map holds one page ref each); admission walks
        # the tree and shares the longest published chain copy-free — no
        # register_prefix call needed. Exact block-token keys (no hashes),
        # so a match can never serve wrong K/V.
        self.auto_prefix = auto_prefix
        self._auto_nodes: Dict[int, dict] = {}   # nid -> node
        self._auto_root: Dict[tuple, int] = {}   # first block tokens -> nid
        self._auto_next = 0
        self._auto_clock = 0
        self._auto_pages = 0          # pages currently pinned by the tree
        self.auto_hits = 0            # admissions that shared >=1 block
        self.auto_hit_tokens = 0      # prefill tokens skipped via sharing
        super().__init__(model_mod, params, cfg, qcfg, mesh=mesh,
                         speculative_gamma=speculative_gamma, **kw)
        if max_auto_pages is None:
            # leave at least half the pool for request working sets
            max_auto_pages = (self.num_pages - 1) // 2
        self.max_auto_pages = max_auto_pages if auto_prefix else 0

    # -- pool + page allocator ----------------------------------------------

    def _make_pool(self):
        cfg = self.cfg
        bs = self.block_size
        assert self.max_seq % bs == 0 or self.max_seq > bs, \
            "block_size must not exceed max_seq"
        self.blocks_per_slot = -(-self.max_seq // bs)
        if self.num_pages is None:
            # default: same worst-case capacity as the contiguous pool
            self.num_pages = self.max_batch * self.blocks_per_slot + 1
        n_kv = getattr(cfg, "num_key_value_heads", None) or \
            cfg.num_attention_heads
        shape = (cfg.num_hidden_layers, self.num_pages, bs, n_kv,
                 cfg.head_dim)
        self._free: List[int] = list(range(self.num_pages - 1, 0, -1))
        self._ref = np.zeros(self.num_pages, np.int64)
        self._row_pages: List[List[int]] = [[] for _ in
                                            range(self.max_batch)]
        self._table_np = np.zeros((self.max_batch, self.blocks_per_slot),
                                  np.int32)
        if self.kv_dtype == jnp.int8:
            # int8 pages + per-token-per-head scale pages: paging's pooled
            # capacity x the int8 cache's 2x bytes-per-token
            return QuantPagedKVPool(
                k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.ones(shape[:-1], jnp.float32),
                v_scale=jnp.ones(shape[:-1], jnp.float32),
                table=jnp.asarray(self._table_np))
        return PagedKVPool(k=jnp.zeros(shape, self.kv_dtype),
                           v=jnp.zeros(shape, self.kv_dtype),
                           table=jnp.asarray(self._table_np))

    def _shard_pool_for_mesh(self, mesh):
        """TP sharding for the paged pool: pages shard over KV heads on the
        model axis (same head split as the contiguous pool); the block
        table is replicated. Temp contiguous prefill caches keep the
        contiguous head shardings (_kv_shardings)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..shard.sharding import kv_cache_spec_tree

        m = mesh.shape.get("model", 1)
        n_kv = getattr(self.cfg, "num_key_value_heads", None) or \
            self.cfg.num_attention_heads
        head = "model" if m > 1 and n_kv % m == 0 else None
        kv_spec = P(None, None, None, head, None)
        sc_spec = P(None, None, None, head)
        spec_tree = self.pool._replace(
            **{f: (kv_spec if f in ("k", "v")
                   else sc_spec if f.endswith("_scale") else P())
               for f in self.pool._fields})
        self._pool_shardings = jax.tree.map(
            lambda sp: NamedSharding(mesh, sp), spec_tree,
            is_leaf=lambda x: isinstance(x, P))
        self.pool = jax.tree.map(jax.device_put, self.pool,
                                 self._pool_shardings)
        # temp contiguous cache shardings for the shared _prefill jit
        temp_struct = self.model.init_kv_cache(self.cfg, 1, self.block_size,
                                               self.kv_dtype)
        tree = kv_cache_spec_tree(temp_struct, self.cfg, mesh,
                                  shard_batch=False)
        self._kv_shardings = jax.tree.map(
            lambda sp: NamedSharding(mesh, sp), tree,
            is_leaf=lambda x: isinstance(x, P))

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def _alloc(self, n: int) -> Optional[List[int]]:
        if n > len(self._free):
            return None
        out = [self._free.pop() for _ in range(n)]
        for p in out:
            self._ref[p] = 1
        return out

    def _incref(self, pages) -> None:
        for p in pages:
            self._ref[p] += 1

    def _decref(self, pages) -> None:
        for p in pages:
            self._ref[p] -= 1
            assert self._ref[p] >= 0
            if self._ref[p] == 0:
                self._free.append(p)

    def _push_table(self) -> None:
        t = jnp.asarray(self._table_np)
        if self.mesh is not None:
            t = jax.device_put(t, jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec()))
        self.pool = self.pool._replace(table=t)

    def _set_row(self, row: int, pages: List[int]) -> None:
        self._row_pages[row] = list(pages)
        self._table_np[row, :] = 0
        self._table_np[row, :len(pages)] = pages
        self._push_table()

    def _release_row(self, row: int) -> None:
        if self._row_pages[row]:
            self._decref(self._row_pages[row])
            self._row_pages[row] = []
            self._table_np[row, :] = 0
            self._push_table()

    def _pages_needed(self, req: Request) -> int:
        total = len(req.prompt) + req.max_new_tokens + self.speculative_gamma
        return min(-(-total // self.block_size), self.blocks_per_slot)

    # -- jitted paged pieces -------------------------------------------------

    def _scatter_temp(self, bucket: int, n_pages: int):
        """Write the first n_pages blocks of a temp contiguous cache
        [L, 1, bucket, H, D] into the given physical pages."""
        key = ("scatter", bucket, n_pages)
        if key not in self._scatter_cache:
            bs = self.block_size

            @functools.partial(jax.jit, donate_argnums=(0,),
                               out_shardings=self._pool_shardings)
            def scatter(pool, temp, page_ids):
                span = n_pages * bs

                def put(pages, t):
                    t = t[:, 0]                  # [L, bucket, H(, D)]
                    if span > t.shape[1]:
                        pad = span - t.shape[1]
                        t = jnp.pad(t, ((0, 0), (0, pad))
                                    + ((0, 0),) * (t.ndim - 2))
                    t = t[:, :span].reshape(t.shape[0], n_pages, bs,
                                            *t.shape[2:])
                    return pages.at[:, page_ids].set(t.astype(pages.dtype))

                if isinstance(pool, QuantPagedKVPool):
                    return QuantPagedKVPool(
                        k=put(pool.k, temp.k), v=put(pool.v, temp.v),
                        k_scale=put(pool.k_scale, temp.k_scale),
                        v_scale=put(pool.v_scale, temp.v_scale),
                        table=pool.table)
                return PagedKVPool(k=put(pool.k, temp.k),
                                   v=put(pool.v, temp.v), table=pool.table)

            self._scatter_cache[key] = scatter
        return self._scatter_cache[key]

    def _copy_page(self):
        if "copy" not in self._scatter_cache:
            @functools.partial(jax.jit, donate_argnums=(0,),
                               out_shardings=self._pool_shardings)
            def copy(pool, src, dst):
                return pool._replace(**{
                    f: getattr(pool, f).at[:, dst].set(
                        getattr(pool, f)[:, src])
                    for f in pool._fields if f != "table"})

            self._scatter_cache["copy"] = copy
        return self._scatter_cache["copy"]

    def _chunk_prefill(self, chunk: int):
        """Paged suffix/chunk prefill: same signature as the contiguous
        version so _advance_prefills works unchanged. Attention runs over
        the row's mapped pages (paged_attend handles t > 1 with the causal
        position mask); K/V of the chunk scatters into the row's pages."""
        if chunk not in self._chunk_cache:
            model, cfg, qcfg, cdt = (self.model, self.cfg, self.qcfg,
                                     self.compute_dtype)
            M = self.blocks_per_slot
            out_sh = ((self._pool_shardings, self._repl)
                      if self._pool_shardings is not None else None)

            @functools.partial(jax.jit, donate_argnums=(1,),
                               out_shardings=out_sh)
            def prefill_chunk(params, pool, ids, row, pos, valid_len):
                trow = jax.lax.dynamic_slice(pool.table, (row, 0), (1, M))
                view = pool._replace(table=trow)
                h, view, _ = model.forward(params, ids, cfg, qcfg,
                                           kv_cache=view, cache_index=pos,
                                           compute_dtype=cdt)
                logits = model.logits(params, h)[0, valid_len - 1]
                return (view._replace(table=pool.table), logits)

            self._chunk_cache[chunk] = prefill_chunk
        return self._chunk_cache[chunk]

    def _advance_prefills(self):
        """Chunked prefill, paged variant. The contiguous engine's final
        ragged chunk RE-FEEDS the last bucket window of the whole prompt
        (identical K/V rewritten — harmless there). Here that window could
        reach back into SHARED prefix pages and rewrite them through a
        numerically different attention path, perturbing other requests'
        reads — so the final chunk is right-padded from the current
        position instead (garbage tail positions route through unset table
        entries to the scratch page, or are overwritten by decode)."""
        done_rows = []
        chunk_cap = self.prefill_chunk or self.max_seq
        for row, st in self._admitting.items():
            req, pos = st["req"], st["pos"]
            prompt = req.prompt
            n = len(prompt)
            remaining = n - pos
            if remaining >= chunk_cap:
                chunk, valid = chunk_cap, chunk_cap
                ids = np.asarray(prompt[pos:pos + chunk], np.int32)[None]
            else:
                chunk = min(_bucket(remaining), self.max_seq)
                valid = remaining
                ids = np.zeros((1, chunk), np.int32)
                ids[0, :remaining] = prompt[pos:]
            self.pool, last_logits = self._chunk_prefill(chunk)(
                self.params, self.pool, jnp.asarray(ids), row, pos, valid)
            if self.draft is not None:
                # mirror the suffix into the draft's contiguous pool (its
                # padded tail beyond the prompt is overwritten by rollout
                # writes) — without this the draft proposes from zero K/V
                # on exactly the shared-prefix traffic speculation targets
                self.dpool = self._dchunk_prefill(chunk)(
                    self.draft.params, self.dpool, jnp.asarray(ids), row,
                    pos)
            self.prefill_tokens_processed += valid
            st["pos"] = pos + valid
            if st["pos"] >= n:
                done_rows.append(row)
                self._publish_auto(prompt, row)
                self._activate(row, req, last_logits)
        for row in done_rows:
            del self._admitting[row]

    # -- automatic prefix sharing (block radix tree) -------------------------

    def _auto_match(self, prompt: List[int]):
        """Longest published chain of full blocks covering at most the first
        len(prompt)-1 tokens (>=1 suffix token always prefills, so
        activation gets real last-token logits). Returns (pages, n_tokens);
        touches matched nodes' LRU clocks."""
        if not self.auto_prefix:
            return [], 0
        bs = self.block_size
        children = self._auto_root
        pages: List[int] = []
        self._auto_clock += 1
        for b in range((len(prompt) - 1) // bs):
            nid = children.get(tuple(prompt[b * bs:(b + 1) * bs]))
            if nid is None:
                break
            node = self._auto_nodes[nid]
            node["clock"] = self._auto_clock
            pages.append(node["page"])
            children = node["children"]
        return pages, len(pages) * bs

    def _publish_auto(self, prompt: List[int], row: int) -> None:
        """After a row's prefill fully completes, insert its full prompt
        blocks into the radix tree (each new node increfs its page, so the
        page outlives the row). Only blocks whose every position holds
        prompt K/V are publishable: tokens < len(prompt) — decode and the
        padded final prefill chunk both write at positions >= len(prompt),
        which land in strictly later blocks."""
        if not self.auto_prefix:
            return
        bs = self.block_size
        pages = self._row_pages[row]
        children = self._auto_root
        parent = None
        path = set()
        self._auto_clock += 1
        for b in range((len(prompt) - 1) // bs):
            bt = tuple(prompt[b * bs:(b + 1) * bs])
            nid = children.get(bt)
            if nid is None:
                if (self._auto_pages >= self.max_auto_pages
                        and not self._evict_auto_block(protect=path)):
                    return  # at cap with nothing evictable: stop publishing
                nid = self._auto_next
                self._auto_next += 1
                self._incref([pages[b]])
                self._auto_nodes[nid] = {
                    "page": pages[b], "parent": parent, "key": bt,
                    "children": {}, "clock": self._auto_clock}
                children[bt] = nid
                self._auto_pages += 1
            else:
                self._auto_nodes[nid]["clock"] = self._auto_clock
            path.add(nid)
            children = self._auto_nodes[nid]["children"]
            parent = nid

    def _evict_auto_block(self, protect=frozenset(),
                          require_free: bool = False) -> bool:
        """Drop the least-recently-used LEAF of the radix tree (leaf-only so
        every surviving chain stays reachable root-first). The page frees
        now if only the tree held it, else when sharing rows release;
        require_free restricts candidates to leaves whose page WILL free
        (ref 1 = tree-only) — the admission-pressure mode."""
        best = None
        for nid, node in self._auto_nodes.items():
            if node["children"] or nid in protect:
                continue
            if require_free and self._ref[node["page"]] != 1:
                continue
            if best is None or node["clock"] < self._auto_nodes[best]["clock"]:
                best = nid
        if best is None:
            return False
        node = self._auto_nodes.pop(best)
        sib = (self._auto_root if node["parent"] is None
               else self._auto_nodes[node["parent"]]["children"])
        del sib[node["key"]]
        self._decref([node["page"]])
        self._auto_pages -= 1
        return True

    def _evict_for_pages(self, keep=None) -> bool:
        """Page-pressure eviction: only an eviction that actually FREES a
        page counts as progress. Cache entries still shared by active rows
        are left alone — destroying them would free nothing now while
        losing future sharing (r5 review: the old blind loop emptied the
        whole tree + every prefix without reclaiming a single page)."""
        if self._evict_auto_block(require_free=True):
            return True
        for pid in sorted((p for p in self._prefix_lru if p != keep),
                          key=self._prefix_lru.get):
            e = self._prefixes[pid]
            pages = list(e["pages"]) + (
                [e["tail"]] if e["tail"] is not None else [])
            if any(self._ref[p] == 1 for p in pages):
                self.drop_prefix(pid)
                return True
        return False

    def clear_auto_prefixes(self) -> None:
        """Release every tree-held page (admin/testing hook)."""
        for node in self._auto_nodes.values():
            self._decref([node["page"]])
        self._auto_nodes.clear()
        self._auto_root.clear()
        self._auto_pages = 0

    # -- admission -----------------------------------------------------------

    def _admit(self):
        free = self._free_slots()
        while free and self.waiting:
            req = self.waiting[0]
            self._trim(req)
            pref = self._prefix_for(req)
            n_total = self._pages_needed(req)
            if pref is None:
                # no registered prefix: try the automatic block radix tree
                # (published full blocks of earlier prompts share copy-free)
                shared, matched = self._auto_match(req.prompt)
                if matched:
                    alloc = self._alloc(max(n_total - len(shared), 1))
                    if alloc is None:
                        if self._evict_for_pages(keep=req.prefix):
                            continue  # re-matches against the pruned tree
                        break
                    self.waiting.pop(0)
                    row = free.pop(0)
                    self._incref(shared)
                    self._set_row(row, list(shared) + alloc)
                    self.auto_hits += 1
                    self.auto_hit_tokens += matched
                    if self.draft is not None:
                        # the draft's CONTIGUOUS pool has no K/V for the
                        # shared blocks: prefill the matched prefix for it
                        # (tiny model — the target-side savings dominate)
                        dbucket = min(_bucket(matched), self.max_seq)
                        dids = np.zeros((1, dbucket), np.int32)
                        dids[0, :matched] = req.prompt[:matched]
                        dtemp = self._dprefill(dbucket)(self.draft.params,
                                                        jnp.asarray(dids))
                        self.dpool = self._dinsert(dbucket)(self.dpool,
                                                            dtemp, row)
                    # only the suffix runs through (paged) chunk prefill
                    self._admitting[row] = {"req": req, "pos": matched}
                    continue
                # exact reservation: ceil((prompt+max_new+gamma)/bs) pages —
                # NOT the pow2 prefill bucket rounded up to blocks, which
                # pinned up to ~2x the documented need for the request's
                # whole lifetime (r5 review)
                alloc = self._alloc(n_total)
                if alloc is None:
                    # before backpressure: evict idle auto blocks / LRU
                    # prefixes — but only evictions that actually FREE a
                    # page count (r5 review: blind eviction destroyed the
                    # whole cache under pressure without freeing anything)
                    if self._evict_for_pages(keep=req.prefix):
                        continue  # retry this request with the freed pages
                    break  # backpressure: wait for pages to free
                self.waiting.pop(0)
                row = free.pop(0)
                self._set_row(row, alloc)
                if self.prefill_chunk is not None:
                    # chunked admission (same contract as the contiguous
                    # engine): long cold prompts advance one chunk per tick
                    # in _advance_prefills so active slots keep decoding
                    self._admitting[row] = {"req": req, "pos": 0}
                    continue
                bucket = min(_bucket(len(req.prompt)), self.max_seq)
                n_bucket = -(-bucket // self.block_size)
                ids = np.zeros((1, bucket), np.int32)
                ids[0, :len(req.prompt)] = req.prompt[:bucket]
                temp, last_logits = self._prefill(bucket)(
                    self.params, jnp.asarray(ids), len(req.prompt))
                self.prefill_tokens_processed += len(req.prompt)
                n_scatter = min(n_bucket, n_total)  # pad blocks are never
                self.pool = self._scatter_temp(bucket, n_scatter)(  # read
                    self.pool, temp, jnp.asarray(alloc[:n_scatter],
                                                 jnp.int32))
                if self.draft is not None:
                    dtemp = self._dprefill(bucket)(self.draft.params,
                                                   jnp.asarray(ids))
                    self.dpool = self._dinsert(bucket)(self.dpool, dtemp,
                                                       row)
                self._publish_auto(req.prompt, row)
                self._activate(row, req, last_logits)
                continue
            # shared-prefix admission: full prefix pages are SHARED
            # (refcount++), the partial tail block is copied once, and only
            # the suffix runs through (paged) chunk prefill
            shared, tail_page, plen, last_logits, _ = (
                pref["pages"], pref["tail"], pref["plen"],
                pref["last"], pref["tokens"])
            n_private = max(n_total - len(shared), 1 if tail_page else 0)
            alloc = self._alloc(n_private)
            if alloc is None:
                if self._evict_for_pages(keep=req.prefix):
                    continue  # the request's own prefix is never evicted
                break
            self.waiting.pop(0)
            row = free.pop(0)
            self._incref(shared)
            self._set_row(row, list(shared) + alloc)
            if tail_page is not None:
                # tail template -> this row's first private page
                self.pool = self._copy_page()(self.pool,
                                              jnp.int32(tail_page),
                                              jnp.int32(alloc[0]))
            if self.draft is not None and req.prefix in self._dprefixes:
                dtemp = self._dprefixes[req.prefix]
                dbucket = (dtemp.k.shape[2] if hasattr(dtemp, "k")
                           else jax.tree.leaves(dtemp)[0].shape[2])
                self.dpool = self._dinsert(dbucket)(self.dpool, dtemp, row)
            if len(req.prompt) == plen:
                # prefill already complete (prefix covers the whole prompt):
                # publish its full blocks so prefix-less requests share too
                self._publish_auto(req.prompt, row)
                self._activate(row, req, last_logits)
            else:
                self._admitting[row] = {"req": req, "pos": plen}

    # -- prefix cache (copy-free page sharing) -------------------------------

    def register_prefix(self, prefix_id, tokens: List[int]) -> None:
        toks = list(tokens)
        if not 0 < len(toks) <= self.max_seq - 1:
            raise ValueError(
                f"prefix must fit max_seq ({len(toks)} vs {self.max_seq})")
        if (prefix_id not in self._prefixes
                and len(self._prefixes) >= self.max_prefixes
                and not self._evict_lru_prefix(keep=prefix_id)):
            raise PrefixCacheFull(
                f"prefix cache full ({self.max_prefixes} entries); "
                "drop one before registering another")
        bs = self.block_size
        plen = len(toks)
        n_full = plen // bs
        tail = plen % bs
        pages = self._alloc(n_full + (1 if tail else 0))
        while pages is None:
            # page pressure: only evictions that actually FREE a page count
            # (entries still shared by active rows would free nothing)
            if not self._evict_for_pages(keep=prefix_id):
                raise PrefixCacheFull("no free pages for prefix registration")
            pages = self._alloc(n_full + (1 if tail else 0))
        bucket = min(_bucket(plen), self.max_seq)
        ids = np.zeros((1, bucket), np.int32)
        ids[0, :plen] = toks
        try:
            from .engine import mesh_context

            with mesh_context(self.mesh):
                temp, last = self._prefill(bucket)(self.params,
                                                   jnp.asarray(ids), plen)
                self.pool = self._scatter_temp(bucket, len(pages))(
                    self.pool, temp, jnp.asarray(pages, jnp.int32))
                dtemp = (self._dprefill(bucket)(self.draft.params,
                                                jnp.asarray(ids))
                         if self.draft is not None else None)
        except Exception:
            # a failed prefill (device fault, OOM on a new bucket compile)
            # must return the freshly allocated pages or retries drain the
            # pool permanently (r5 review)
            self._decref(pages)
            raise
        self.prefill_tokens_processed += plen
        self.drop_prefix(prefix_id)  # re-registration frees the old pages
        if dtemp is not None:
            # draft-pool mirror (contiguous bucket cache, inserted per
            # admission like the contiguous engine's); registered AFTER the
            # drop above or re-registration would discard it
            self._dprefixes[prefix_id] = dtemp
        self._prefixes[prefix_id] = {
            "pages": pages[:n_full],
            "tail": pages[n_full] if tail else None,
            "plen": plen, "last": last, "tokens": toks,
        }
        self._touch_prefix(prefix_id)

    def drop_prefix(self, prefix_id) -> None:
        entry = self._prefixes.pop(prefix_id, None)
        self._prefix_lru.pop(prefix_id, None)
        self._dprefixes.pop(prefix_id, None)
        if entry is not None:
            pages = list(entry["pages"])
            if entry["tail"] is not None:
                pages.append(entry["tail"])
            self._decref(pages)

    def _prefix_for(self, req: Request):
        if req.prefix is None or req.prefix not in self._prefixes:
            return None
        entry = self._prefixes[req.prefix]
        if (len(req.prompt) < entry["plen"]
                or req.prompt[:entry["plen"]] != entry["tokens"]):
            return None
        self._touch_prefix(req.prefix)
        return entry

    # -- page release on completion/eviction ---------------------------------

    def _check_done(self, row: int):
        had = self.slot_req[row] is not None
        super()._check_done(row)
        if had and self.slot_req[row] is None:
            self._release_row(row)

    def cancel(self, uid) -> bool:
        rows = [r for r, req in enumerate(self.slot_req)
                if req is not None and req.uid == uid]
        rows += [r for r, st in self._admitting.items()
                 if st["req"].uid == uid]
        found = super().cancel(uid)
        for r in rows:
            self._release_row(r)
        return found

    def reset_slots(self) -> None:
        super().reset_slots()
        for r in range(self.max_batch):
            self._release_row(r)
