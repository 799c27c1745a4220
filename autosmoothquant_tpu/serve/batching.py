"""Continuous batching engine (vLLM-style slot scheduler, TPU-shaped).

The reference has no serving engine at all (SURVEY.md: no scheduler, no
continuous batching — HF generate only). This engine is the north-star
serving path: a fixed pool of batch slots over one shared KV cache; new
requests prefill into free slots while existing slots keep decoding; one
jitted decode step serves ALL active slots per iteration.

TPU shaping decisions:
  - static shapes everywhere: the pool is [L, max_batch, max_seq, ...];
    prefills are bucketed to power-of-two lengths (few compile shapes)
  - per-slot cache writes use the vector cache_index path (scatter), so a
    decode step writes each slot at its own current length
  - host<->device sync is expensive in this runtime (~30-80 ms/call), so
    decode runs ``steps_per_sync`` steps on-device per scheduler tick and
    finished tokens are reconciled after the fact
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.config import QuantConfig


class PrefixCacheFull(RuntimeError):
    """register_prefix refused: the engine already holds max_prefixes
    detached KV caches (each pins [L,1,bucket,...] of HBM). Drop one first.
    Serving front ends map this to HTTP 429."""


@dataclasses.dataclass
class Request:
    uid: Any
    prompt: List[int]
    max_new_tokens: int = 64
    eos_token_id: Optional[int] = None
    # sampling (temperature 0 = greedy; per-request — one compiled decode
    # step serves a mixed greedy/sampled batch via per-row parameter arrays)
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    repetition_penalty: float = 1.0  # 1 = off (HF convention)
    # multi-token stop sequences (token-id lists); generation ends when the
    # output ENDS WITH any of them (checked at sync boundaries) and the stop
    # tokens are stripped from the result — the HF stopping-criteria analog
    stop: Optional[List[List[int]]] = None
    # id of an engine-registered shared prefix this prompt starts with
    # (system-prompt KV reuse; see ContinuousEngine.register_prefix)
    prefix: Any = None
    # return each token's RAW-model log-probability alongside the output
    want_logprobs: bool = False
    # filled by the engine:
    output: List[int] = dataclasses.field(default_factory=list)
    logprobs: List[float] = dataclasses.field(default_factory=list)
    done: bool = False


def _bucket(n: int, lo: int = 32) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


class ContinuousEngine:
    """mesh: optional Mesh for tensor-parallel serving (model axis over
    heads/ffn/vocab). The slot pool's batch dim stays replicated — slots are
    inserted/evicted one row at a time by the scheduler, which must not
    straddle a data shard. Data parallelism for continuous batching is
    engine-per-replica (each data shard runs its own scheduler), matching
    how production TPU serving stacks split DP.
    """

    def __init__(self, model_mod, params, cfg, qcfg: Optional[QuantConfig] = None,
                 *, max_batch: int = 8, max_seq: int = 2048,
                 kv_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
                 steps_per_sync: int = 8, mesh=None, param_shardings=None,
                 prefill_chunk: Optional[int] = None, seed: int = 0,
                 fuse_projections=None, speculative_gamma: int = 0,
                 speculative_ngram: int = 3, max_prefixes: int = 16,
                 speculative_adaptive: bool = True, draft=None):
        from .engine import maybe_fuse_projections

        params = maybe_fuse_projections(model_mod, params, mesh,
                                        fuse_projections, param_shardings)
        self.model = model_mod
        self.cfg = cfg
        self.qcfg = qcfg
        self.max_batch = max_batch
        self.max_seq = max_seq
        self.kv_dtype = kv_dtype
        self.compute_dtype = compute_dtype
        self.steps_per_sync = steps_per_sync
        # engine-level prompt-lookup speculative decoding (greedy-only):
        # each tick runs ONE gamma+1-position verify instead of
        # steps_per_sync single-token steps; host-side drafting
        self.speculative_gamma = speculative_gamma
        self.speculative_ngram = speculative_ngram
        # adaptive gamma (r3 verdict item 8): track draft acceptance and
        # shrink/disable speculation when drafts miss, so gamma can stay ON
        # in production — a latency win at low load, ~free at saturation
        # (prompt-lookup acceptance collapses on non-repetitive traffic,
        # where fixed gamma is a pure throughput tax)
        self.speculative_adaptive = speculative_adaptive
        self._spec_acc_ema = 1.0   # optimistic start: probe at full gamma
        self._spec_ticks = 0
        # DRAFT-MODEL speculation (engine.DraftModel): the draft keeps a
        # parallel slot pool, mirrors every admission write (prefix copy /
        # whole-bucket / chunked), and each spec tick runs ONE fused
        # rollout+verify dispatch (serve/speculative.py semantics at the
        # continuous-batching tier). draft=None keeps the host n-gram path.
        self.draft = draft
        if draft is not None:
            assert draft.cfg.vocab_size == cfg.vocab_size, (
                "draft model must share the target's vocab")
            draft.params = maybe_fuse_projections(
                draft.model, draft.params, mesh, fuse_projections, None)
            if draft.compute_dtype is None:
                draft.compute_dtype = compute_dtype
            if draft.kv_dtype is None:
                draft.kv_dtype = kv_dtype
        self.mesh = mesh
        # chunked prefill: admit at most prefill_chunk prompt tokens per
        # scheduler tick so a long prompt cannot stall decoding of the other
        # slots (None = whole-prompt admission, the round-1 behavior)
        self.prefill_chunk = prefill_chunk
        self._admitting: Dict[int, dict] = {}  # row -> {req, pos, ids}
        self._chunk_cache = {}
        self._kv_shardings = None
        self._repl = None
        if mesh is not None:
            from ..shard.sharding import (
                param_specs as _family_specs, shard_params, with_stage_axis)

            specs = param_shardings
            if specs is None:
                specs = _family_specs(model_mod.FAMILY, cfg, mesh)
                specs = with_stage_axis(specs, mesh, cfg.num_hidden_layers)
            self.params = shard_params(params, mesh, specs)
            if draft is not None:
                dspecs = _family_specs(draft.model.FAMILY, draft.cfg, mesh)
                dspecs = with_stage_axis(dspecs, mesh,
                                         draft.cfg.num_hidden_layers)
                draft.params = shard_params(draft.params, mesh, dspecs)
        else:
            self.params = params

        self.pool = self._make_pool()
        self._pool_shardings = None
        self.dpool = None
        self._dpool_shardings = None
        if draft is not None:
            self.dpool = draft.model.init_kv_cache(
                draft.cfg, max_batch, max_seq, draft.kv_dtype)
            if mesh is not None:
                from ..shard.sharding import (kv_cache_spec_tree,
                                              shard_kv_cache)

                self.dpool = shard_kv_cache(self.dpool, mesh, draft.cfg,
                                            shard_batch=False)
                dst = kv_cache_spec_tree(self.dpool, draft.cfg, mesh,
                                         shard_batch=False)
                self._dpool_shardings = jax.tree.map(
                    lambda sp: jax.sharding.NamedSharding(mesh, sp), dst,
                    is_leaf=lambda x: isinstance(
                        x, jax.sharding.PartitionSpec))
        self._dprefill_cache = {}
        self._dinsert_cache = {}
        self._dchunk_cache = {}
        self._dprefixes: Dict[Any, Any] = {}
        if mesh is not None:
            # explicit jit out_shardings: under an ambient mesh (mesh_context)
            # jax tries to express every inferred output sharding in mesh
            # axes, which fails when GSPMD picks a tiling the mesh can't
            # express (e.g. splitting one axis across two tensor dims)
            self._repl = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec())
            self._shard_pool_for_mesh(mesh)
        self.lens = np.zeros(max_batch, np.int32)        # tokens in cache per slot
        self.slot_req: List[Optional[Request]] = [None] * max_batch
        self.pending_tok = np.zeros(max_batch, np.int32)  # next token to feed
        # per-slot sampling parameters (temperature 0 = greedy row)
        self.temps = np.zeros(max_batch, np.float32)
        self.topks = np.zeros(max_batch, np.int32)
        self.topps = np.ones(max_batch, np.float32)
        self.reppens = np.ones(max_batch, np.float32)
        # per-slot seen-token mask (repetition penalty); lives on host, is
        # uploaded per decode call only when a penalized row is active
        self._seen_np = np.zeros((max_batch, cfg.vocab_size), bool)
        # sampling determinism: every key is fold_in(PRNGKey(seed), event#);
        # the event counter advances with the (deterministic) schedule, so
        # equal seeds give equal tokens — incl. multi-host lockstep serving
        self.seed = seed
        self._event = 0
        self.waiting: List[Request] = []
        self._prefill_cache = {}
        self._insert_cache = {}
        self._decode_fns = {}
        self._sample1 = None
        # prefix cache: prefix_id -> (temp_cache [L,1,bucket,...], plen,
        # last_logits, tokens). Requests submitted with prefix=<id> copy the
        # prefix K/V into their slot row and prefill only the suffix.
        # Each entry pins a full detached KV cache in HBM, so registrations
        # are capped (register_prefix raises PrefixCacheFull when at
        # max_prefixes) — an unauthenticated client must not be able to
        # exhaust device memory through POST /prefix.
        self.max_prefixes = max_prefixes
        self._prefixes: Dict[Any, tuple] = {}
        # LRU bookkeeping: monotonic use counter per prefix; at capacity the
        # least-recently-USED entry is evicted instead of 429ing (r3 verdict
        # item 6) — the byte bound max_prefixes guarantees still holds
        self._prefix_lru: Dict[Any, int] = {}
        self._prefix_clock = 0
        self._copy_prefix_cache = {}
        self.prefill_tokens_processed = 0  # observability (tests assert it)
        self.decode_tokens_generated = 0   # every token appended to outputs

    def _make_pool(self):
        """The slot KV store; PagedEngine overrides with a block-paged pool."""
        return self.model.init_kv_cache(self.cfg, self.max_batch,
                                        self.max_seq, self.kv_dtype)

    def _shard_pool_for_mesh(self, mesh):
        """device_put the pool with head-sharded specs and record the
        NamedSharding trees: _kv_shardings constrains jit-internal TEMP
        contiguous caches (prefill), _pool_shardings the slot pool itself
        (identical here; PagedEngine overrides with block-paged specs)."""
        from ..shard.sharding import kv_cache_spec_tree, shard_kv_cache

        self.pool = shard_kv_cache(self.pool, mesh, self.cfg,
                                   shard_batch=False)
        spec_tree = kv_cache_spec_tree(self.pool, self.cfg, mesh,
                                       shard_batch=False)
        self._kv_shardings = jax.tree.map(
            lambda sp: jax.sharding.NamedSharding(mesh, sp), spec_tree,
            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
        self._pool_shardings = self._kv_shardings

    # -- jitted pieces ------------------------------------------------------

    def _prefill(self, bucket: int):
        if bucket not in self._prefill_cache:
            model, cfg, qcfg, cdt = self.model, self.cfg, self.qcfg, self.compute_dtype
            kv_dtype = self.kv_dtype
            kv_shardings = self._kv_shardings
            out_sh = ((kv_shardings, self._repl)
                      if kv_shardings is not None else None)

            @functools.partial(jax.jit, out_shardings=out_sh)
            def prefill(params, ids, length):
                """ids [1, bucket] right-padded; returns (temp_cache, logits
                of the last real token)."""
                temp = model.init_kv_cache(cfg, 1, bucket, kv_dtype)
                if kv_shardings is not None:
                    # keep the jit-internal cache on the same head sharding
                    # as the pool it will be inserted into
                    temp = jax.lax.with_sharding_constraint(temp, kv_shardings)
                h, temp, _ = model.forward(params, ids, cfg, qcfg,
                                           kv_cache=temp, cache_index=0,
                                           compute_dtype=cdt)
                last = model.logits(params, h)[0, length - 1]
                return temp, last

            self._prefill_cache[bucket] = prefill
        return self._prefill_cache[bucket]

    def _insert(self, bucket: int):
        if bucket not in self._insert_cache:
            @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(),
                               out_shardings=self._pool_shardings)
            def insert(pool, temp, row):
                def put(p, t):
                    # p: [L, B, S, ...]; t: [L, 1, bucket, ...]
                    start = (0, row) + (0,) * (p.ndim - 2)
                    return jax.lax.dynamic_update_slice(p, t.astype(p.dtype), start)

                return jax.tree.map(put, pool, temp)

            self._insert_cache[bucket] = insert
        return self._insert_cache[bucket]

    def _chunk_prefill(self, chunk: int):
        """Prefill ``chunk`` tokens of ONE slot directly into the pool row
        (no temp cache): slice the row out, extend it, write it back — one
        jit, donated pool, a single compile variant per chunk size."""
        if chunk not in self._chunk_cache:
            model, cfg, qcfg, cdt = self.model, self.cfg, self.qcfg, self.compute_dtype
            out_sh = ((self._pool_shardings, self._repl)
                      if self._pool_shardings is not None else None)

            @functools.partial(jax.jit, donate_argnums=(1,), out_shardings=out_sh)
            def prefill_chunk(params, pool, ids, row, pos, valid_len):
                """ids [1, chunk] right-padded; pos = tokens already in the
                row; valid_len = real tokens in this chunk. Returns
                (pool', last-token logits [V])."""
                def take(p):
                    start = (0, row) + (0,) * (p.ndim - 2)
                    sizes = (p.shape[0], 1) + p.shape[2:]
                    return jax.lax.dynamic_slice(p, start, sizes)

                rowcache = jax.tree.map(take, pool)
                h, rowcache, _ = model.forward(
                    params, ids, cfg, qcfg, kv_cache=rowcache,
                    cache_index=pos, compute_dtype=cdt)
                logits = model.logits(params, h)[0, valid_len - 1]

                def put(p, t):
                    start = (0, row) + (0,) * (p.ndim - 2)
                    return jax.lax.dynamic_update_slice(p, t.astype(p.dtype), start)

                return jax.tree.map(put, pool, rowcache), logits

            self._chunk_cache[chunk] = prefill_chunk
        return self._chunk_cache[chunk]

    # -- draft-model mirrors (admission writes for the draft pool) ----------

    def _dprefill(self, bucket: int):
        if bucket not in self._dprefill_cache:
            d = self.draft
            dsh = self._dpool_shardings

            @functools.partial(jax.jit,
                               out_shardings=dsh if dsh is not None else None)
            def dprefill(dparams, ids):
                temp = d.model.init_kv_cache(d.cfg, 1, bucket, d.kv_dtype)
                if dsh is not None:
                    temp = jax.lax.with_sharding_constraint(temp, dsh)
                _, temp, _ = d.model.forward(dparams, ids, d.cfg, d.qcfg,
                                             kv_cache=temp, cache_index=0,
                                             compute_dtype=d.compute_dtype)
                return temp

            self._dprefill_cache[bucket] = dprefill
        return self._dprefill_cache[bucket]

    def _dinsert(self, bucket: int):
        if bucket not in self._dinsert_cache:
            @functools.partial(jax.jit, donate_argnums=(0,),
                               out_shardings=self._dpool_shardings)
            def dinsert(dpool, temp, row):
                def put(p, t):
                    start = (0, row) + (0,) * (p.ndim - 2)
                    return jax.lax.dynamic_update_slice(
                        p, t.astype(p.dtype), start)

                return jax.tree.map(put, dpool, temp)

            self._dinsert_cache[bucket] = dinsert
        return self._dinsert_cache[bucket]

    def _dchunk_prefill(self, chunk: int):
        if chunk not in self._dchunk_cache:
            d = self.draft
            out_sh = self._dpool_shardings

            @functools.partial(jax.jit, donate_argnums=(1,),
                               out_shardings=out_sh)
            def dprefill_chunk(dparams, dpool, ids, row, pos):
                def take(p):
                    start = (0, row) + (0,) * (p.ndim - 2)
                    sizes = (p.shape[0], 1) + p.shape[2:]
                    return jax.lax.dynamic_slice(p, start, sizes)

                rowcache = jax.tree.map(take, dpool)
                _, rowcache, _ = d.model.forward(
                    dparams, ids, d.cfg, d.qcfg, kv_cache=rowcache,
                    cache_index=pos, compute_dtype=d.compute_dtype)

                def put(p, t):
                    start = (0, row) + (0,) * (p.ndim - 2)
                    return jax.lax.dynamic_update_slice(
                        p, t.astype(p.dtype), start)

                return jax.tree.map(put, dpool, rowcache)

            self._dchunk_cache[chunk] = dprefill_chunk
        return self._dchunk_cache[chunk]

    def _decode(self, n: int, sampling: bool = False, penalize: bool = False,
                want_lp: bool = False, kv_window: Optional[int] = None):
        key_ = (n, sampling, penalize, want_lp, kv_window)
        if key_ not in self._decode_fns:
            model, cfg, qcfg, cdt = self.model, self.cfg, self.qcfg, self.compute_dtype
            out_sh = None
            if self._pool_shardings is not None:
                out_sh = ((self._repl, self._pool_shardings, self._repl)
                          + ((self._repl,) if penalize else ())
                          + ((self._repl,) if want_lp else ()))

            @functools.partial(jax.jit, donate_argnums=(1,), out_shardings=out_sh)
            def decode(params, pool, toks, lens, active, temps, topks, topps,
                       key, reppens, seen):
                """n decode steps for all slots. toks/lens/active and the
                sampling params: [B]. With sampling=False compiles to plain
                argmax (no sort, key unused); penalize threads the [B, V]
                seen mask through the scan. Returns (tokens [B, n], pool,
                lens[, seen])."""
                rows = jnp.arange(toks.shape[0])

                def step(carry, skey):
                    toks, pool, lens, seen = carry
                    positions = lens[:, None]
                    h, pool, _ = model.forward(
                        params, toks[:, None], cfg, qcfg, kv_cache=pool,
                        cache_index=lens, positions=positions,
                        kv_window=kv_window, compute_dtype=cdt)
                    logits = model.logits(params, h)[:, 0]
                    raw = logits
                    if penalize:
                        from .sampling import apply_repetition_penalty

                        logits = apply_repetition_penalty(logits, seen, reppens)
                    if sampling:
                        from .sampling import sample_per_row

                        nxt = sample_per_row(logits, skey, temps, topks, topps)
                    else:
                        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                    if penalize:
                        seen = seen.at[rows, nxt].set(True)
                    if want_lp:
                        lsm = jax.nn.log_softmax(raw.astype(jnp.float32), -1)
                        lp = jnp.take_along_axis(lsm, nxt[:, None], 1)[:, 0]
                    else:
                        lp = jnp.zeros(nxt.shape, jnp.float32)
                    lens = lens + active.astype(jnp.int32)
                    return (nxt, pool, lens, seen), (nxt, lp)

                (_, pool, lens, seen), (ys, lps) = jax.lax.scan(
                    step, (toks, pool, lens, seen), jax.random.split(key, n))
                out = (ys.T, pool, lens)
                if penalize:
                    out = out + (seen,)
                if want_lp:
                    out = out + (lps.T,)
                return out

            self._decode_fns[key_] = decode
        return self._decode_fns[key_]

    # -- scheduler ----------------------------------------------------------

    def submit(self, uid, prompt: List[int], max_new_tokens: int = 64,
               eos_token_id: Optional[int] = None, temperature: float = 0.0,
               top_k: int = 0, top_p: float = 1.0,
               repetition_penalty: float = 1.0, stop=None,
               prefix=None, want_logprobs: bool = False) -> Request:
        if stop is not None:
            # a malformed stop (e.g. a flat int list) would TypeError inside
            # the scheduler tick and poison the slot — reject at the boundary
            if not (isinstance(stop, (list, tuple)) and all(
                    isinstance(s, (list, tuple)) and s
                    and all(isinstance(t, int) for t in s) for s in stop)):
                raise ValueError(
                    "stop must be a non-empty list of token-id lists")
            stop = [list(s) for s in stop]
        # same boundary rule for the prompt: an out-of-range id would crash
        # the scheduler tick mid-flight (seen-mask IndexError / int32
        # overflow) and an empty prompt would "generate" from padding
        # positions — both must fail only THIS request, here
        ids = np.asarray(list(prompt), dtype=np.int64)
        if ids.size == 0:
            raise ValueError("prompt must be non-empty")
        if ids.ndim != 1 or int(ids.min()) < 0 \
                or int(ids.max()) >= self.cfg.vocab_size:
            raise ValueError(
                f"prompt token ids must be in [0, {self.cfg.vocab_size})")
        req = Request(uid, list(prompt), max_new_tokens, eos_token_id,
                      temperature, top_k, top_p, repetition_penalty,
                      stop, prefix, want_logprobs)
        self.waiting.append(req)
        return req

    # -- prefix cache (shared system prompts) --------------------------------

    def register_prefix(self, prefix_id, tokens: List[int]) -> None:
        """Prefill ``tokens`` ONCE into a detached [L, 1, bucket, ...] cache;
        requests submitted with prefix=prefix_id copy that K/V into their
        slot row at admission and prefill only the suffix — prefill FLOPs for
        a shared system prompt are paid once per prefix, not per request.
        (The reference has no serving tier at all; this mirrors production
        TPU serving's prefix caching.)"""
        from .engine import mesh_context

        toks = list(tokens)
        if not 0 < len(toks) <= self.max_seq - 1:
            raise ValueError(
                f"prefix must fit max_seq ({len(toks)} vs {self.max_seq})")
        if (prefix_id not in self._prefixes
                and len(self._prefixes) >= self.max_prefixes
                and not self._evict_lru_prefix()):
            raise PrefixCacheFull(
                f"prefix cache full ({self.max_prefixes} entries); "
                "drop one before registering another")
        bucket = min(_bucket(len(toks)), self.max_seq)
        ids = np.zeros((1, bucket), np.int32)
        ids[0, :len(toks)] = toks
        with mesh_context(self.mesh):
            temp, last = self._prefill(bucket)(self.params, jnp.asarray(ids),
                                               len(toks))
            if self.draft is not None:
                self._dprefixes[prefix_id] = self._dprefill(bucket)(
                    self.draft.params, jnp.asarray(ids))
        self.prefill_tokens_processed += len(toks)
        self._prefixes[prefix_id] = (temp, len(toks), last, toks)
        self._touch_prefix(prefix_id)

    def drop_prefix(self, prefix_id) -> None:
        self._prefixes.pop(prefix_id, None)
        self._prefix_lru.pop(prefix_id, None)
        self._dprefixes.pop(prefix_id, None)

    def _touch_prefix(self, prefix_id) -> None:
        self._prefix_clock += 1
        self._prefix_lru[prefix_id] = self._prefix_clock

    def _evict_lru_prefix(self, keep=None) -> bool:
        """Drop the least-recently-used registered prefix (skipping ``keep``)
        to make room; returns False when nothing is evictable. Contiguous
        entries are detached caches, so eviction always frees a slot."""
        candidates = [p for p in self._prefix_lru if p != keep]
        if not candidates:
            return False
        victim = min(candidates, key=self._prefix_lru.get)
        self.drop_prefix(victim)
        return True

    def _prefix_for(self, req: Request):
        """The registered prefix entry if the (possibly trimmed) prompt still
        starts with its tokens, else None. A hit refreshes LRU recency."""
        if req.prefix is None or req.prefix not in self._prefixes:
            return None
        entry = self._prefixes[req.prefix]
        _, plen, _, ptoks = entry
        if len(req.prompt) < plen or req.prompt[:plen] != ptoks:
            return None
        self._touch_prefix(req.prefix)
        return entry

    def cancel(self, uid) -> bool:
        """Abort a request wherever it is (waiting / admitting / decoding);
        returns True if found. The freed slot's cache rows need no clearing
        — admission overwrites them."""
        found = False
        for r in self.waiting:
            if r.uid == uid:
                r.done = True  # a `while not req.done` driver must not spin
                found = True
        self.waiting = [r for r in self.waiting if r.uid != uid]
        for row, st in list(self._admitting.items()):
            if st["req"].uid == uid:
                st["req"].done = True
                del self._admitting[row]
                found = True
        for row, r in enumerate(self.slot_req):
            if r is not None and r.uid == uid:
                r.done = True
                self.slot_req[row] = None
                self.lens[row] = 0
                self.temps[row] = 0.0
                self.reppens[row] = 1.0
                found = True
        return found

    def reset_slots(self) -> None:
        """Evict every active/waiting request (error recovery: a poisoned
        request must not wedge the scheduler forever). Cache rows need no
        clearing — admission overwrites them."""
        for row in range(self.max_batch):
            if self.slot_req[row] is not None:
                self.slot_req[row].done = True
            self.slot_req[row] = None
            self.lens[row] = 0
            self.temps[row] = 0.0
            self.reppens[row] = 1.0
        for r in self.waiting:
            r.done = True
        for st in self._admitting.values():
            st["req"].done = True
        self.waiting.clear()
        self._admitting.clear()

    def _free_slots(self) -> List[int]:
        return [i for i, r in enumerate(self.slot_req)
                if r is None and i not in self._admitting]

    def _trim(self, req: Request):
        if len(req.prompt) > self.max_seq - 1:
            # keep the most recent context; at least one decode slot must
            # remain or the first generated token would be dropped
            req.prompt = req.prompt[-(self.max_seq - 1):]

    def _first_token(self, last_logits, req: Request, row: int):
        """Pick the first post-prefill token [V] -> (id, logprob). Uses the
        SAME device ops as the decode scan (sampling.apply_repetition_penalty
        / sample_per_row / log_softmax) so first-token math cannot drift from
        in-scan math."""
        if self._sample1 is None:
            from .sampling import apply_repetition_penalty, sample_per_row

            @jax.jit
            def pick(logits, seen, rp, temp, topk, topp, key):
                raw = logits[None].astype(jnp.float32)
                lg = apply_repetition_penalty(raw, seen[None], rp[None])
                tok = sample_per_row(lg, key, temp[None], topk[None],
                                     topp[None])
                lsm = jax.nn.log_softmax(raw, -1)
                lp = jnp.take_along_axis(lsm, tok[:, None], 1)[0, 0]
                return tok[0], lp

            self._sample1 = pick
        seen = (jnp.asarray(self._seen_np[row])
                if req.repetition_penalty != 1.0
                else jnp.zeros((self.cfg.vocab_size,), bool))
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), self._event)
        self._event += 1
        tok, lp = self._sample1(
            last_logits, seen, jnp.float32(req.repetition_penalty),
            jnp.float32(req.temperature), jnp.int32(req.top_k),
            jnp.float32(req.top_p), key)
        return int(np.asarray(jax.device_get(tok))), float(
            np.asarray(jax.device_get(lp)))

    def _activate(self, row: int, req: Request, last_logits):
        if req.repetition_penalty != 1.0:
            self._seen_np[row] = False
            self._seen_np[row, req.prompt] = True
        first, first_lp = self._first_token(last_logits, req, row)
        if req.repetition_penalty != 1.0:
            self._seen_np[row, first] = True
        req.output.append(first)
        self.decode_tokens_generated += 1
        if req.want_logprobs:
            req.logprobs.append(first_lp)
        self.slot_req[row] = req
        self.lens[row] = len(req.prompt)
        self.pending_tok[row] = first
        self.temps[row] = req.temperature
        self.topks[row] = req.top_k
        self.topps[row] = req.top_p
        self.reppens[row] = req.repetition_penalty
        self._check_done(row)

    def _admit(self):
        free = self._free_slots()
        while free and self.waiting:
            req = self.waiting.pop(0)
            row = free.pop(0)
            self._trim(req)
            pref = self._prefix_for(req)
            if pref is not None:
                # shared-prefix admission: copy the registered prefix K/V
                # into the slot row (same insert jit as whole prefills), then
                # only the suffix goes through prefill. Garbage in the copied
                # bucket window beyond plen is never causally reachable and
                # is overwritten by the suffix chunks.
                temp, plen, last_logits, _ = pref
                bucket = temp.k.shape[2] if hasattr(temp, "k") else \
                    jax.tree.leaves(temp)[0].shape[2]
                self.pool = self._insert(bucket)(self.pool, temp, row)
                if self.draft is not None and req.prefix in self._dprefixes:
                    self.dpool = self._dinsert(bucket)(
                        self.dpool, self._dprefixes[req.prefix], row)
                if len(req.prompt) == plen:
                    self._activate(row, req, last_logits)
                else:
                    self._admitting[row] = {"req": req, "pos": plen}
                continue
            if self.prefill_chunk is not None:
                # chunked admission: enqueue; chunks advance one per tick in
                # _advance_prefills so decode never stalls on a long prompt
                self._admitting[row] = {"req": req, "pos": 0}
                continue
            bucket = min(_bucket(len(req.prompt)), self.max_seq)
            ids = np.zeros((1, bucket), np.int32)
            ids[0, :len(req.prompt)] = req.prompt[:bucket]
            temp, last_logits = self._prefill(bucket)(
                self.params, jnp.asarray(ids), len(req.prompt))
            self.prefill_tokens_processed += len(req.prompt)
            self.pool = self._insert(bucket)(self.pool, temp, row)
            if self.draft is not None:
                dtemp = self._dprefill(bucket)(self.draft.params,
                                               jnp.asarray(ids))
                self.dpool = self._dinsert(bucket)(self.dpool, dtemp, row)
            self._activate(row, req, last_logits)

    def _advance_prefills(self):
        """Process ONE chunk for every admitting slot. The final (ragged)
        chunk re-feeds the last pow2-bucket window ending at the prompt end —
        re-writing identical K/V for the overlap keeps every cache slot
        consistent while holding the compile-variant count at
        log2(max_seq)."""
        done_rows = []
        # prefix-suffix admissions reach here even with chunking disabled:
        # treat "no chunking" as one max_seq-sized chunk (the bucket branch)
        chunk_cap = self.prefill_chunk or self.max_seq
        for row, st in self._admitting.items():
            req, pos = st["req"], st["pos"]
            prompt = req.prompt
            n = len(prompt)
            remaining = n - pos
            if remaining >= chunk_cap:
                chunk, start, valid = chunk_cap, pos, chunk_cap
                ids = np.asarray(prompt[start:start + chunk], np.int32)[None]
            else:
                bucket = min(_bucket(remaining), self.max_seq)
                if n >= bucket:
                    # overlap re-feed: window = last `bucket` tokens
                    chunk, start, valid = bucket, n - bucket, bucket
                    ids = np.asarray(prompt[start:], np.int32)[None]
                else:
                    # whole prompt shorter than the smallest bucket
                    chunk, start, valid = bucket, 0, n
                    ids = np.zeros((1, bucket), np.int32)
                    ids[0, :n] = prompt
            self.pool, last_logits = self._chunk_prefill(chunk)(
                self.params, self.pool, jnp.asarray(ids), row, start, valid)
            if self.draft is not None:
                self.dpool = self._dchunk_prefill(chunk)(
                    self.draft.params, self.dpool, jnp.asarray(ids), row,
                    start)
            # count logical NEW tokens only: the final ragged chunk re-feeds
            # the last bucket window (start < pos), and counting its full
            # `valid` double-counted the overlap vs the whole-prompt path
            self.prefill_tokens_processed += min(valid, n - pos)
            st["pos"] = start + valid
            if st["pos"] >= n:
                done_rows.append(row)
                self._activate(row, req, last_logits)
        for row in done_rows:
            del self._admitting[row]

    @staticmethod
    def _stop_hit(output: List[int], stop) -> int:
        """Length of the stop sequence the output ends with (0 = none)."""
        if not stop:
            return 0
        for s in stop:
            if s and len(output) >= len(s) and output[-len(s):] == list(s):
                return len(s)
        return 0

    def _check_done(self, row: int):
        req = self.slot_req[row]
        if req is None:
            return
        eos_hit = (req.eos_token_id is not None
                   and req.output and req.output[-1] == req.eos_token_id)
        stop_n = self._stop_hit(req.output, req.stop)
        budget = len(req.output) >= req.max_new_tokens
        overflow = self.lens[row] + 1 >= self.max_seq
        if eos_hit or stop_n or budget or overflow:
            if eos_hit:
                req.output = req.output[:-1]
            elif stop_n:
                req.output = req.output[:-stop_n]
            req.logprobs = req.logprobs[:len(req.output)]
            req.done = True
            self.slot_req[row] = None
            self.lens[row] = 0
            # freed row must not force the sampling/penalize variants
            self.temps[row] = 0.0
            self.reppens[row] = 1.0

    def step(self):
        """One scheduler tick: admit, advance in-flight prefills by one
        chunk each, then steps_per_sync decode steps for active slots."""
        from .engine import mesh_context

        with mesh_context(self.mesh):
            self._step()

    # -- speculative sync (engine-level, greedy-only) -------------------------

    def _verify(self):
        """Jitted speculative verify: T = gamma+1 forward at per-row offsets,
        returns greedy targets [B, gamma+1]. Drafting happens on the HOST —
        the scheduler already holds every slot's full token history, so no
        device-side n-gram search is needed (unlike serve/speculative.py's
        single jitted while_loop for the static-batch engine)."""
        if "verify" not in self._decode_fns:
            model, cfg, qcfg, cdt = (self.model, self.cfg, self.qcfg,
                                     self.compute_dtype)
            out_sh = ((self._repl, self._pool_shardings)
                      if self._pool_shardings is not None else None)

            @functools.partial(jax.jit, donate_argnums=(1,), out_shardings=out_sh)
            def verify(params, pool, inputs, lens):
                h, pool, _ = model.forward(
                    params, inputs, cfg, qcfg, kv_cache=pool,
                    cache_index=lens, positions=(
                        lens[:, None] + jnp.arange(inputs.shape[1])[None]),
                    compute_dtype=cdt)
                targets = jnp.argmax(model.logits(params, h), -1)
                return targets.astype(jnp.int32), pool

            self._decode_fns["verify"] = verify
        return self._decode_fns["verify"]

    def _verify_draft(self, g: int):
        """Fused draft-rollout + verify: ONE dispatch per spec tick (this
        runtime pays 30-80 ms host latency per jitted call, so rollout and
        verify must not be separate calls). The draft rolls out g+1 steps
        against its slot pool (the +1 writes K/V for its last draft token —
        without it a full-acceptance round leaves a hole later drafts
        attend, serve/speculative.py), then the target verifies the g
        drafts. Inactive rows ride the lens=max_seq convention: their cache
        writes scatter out of bounds and are dropped."""
        key = ("verify_draft", g)
        if key not in self._decode_fns:
            model, cfg, qcfg, cdt = (self.model, self.cfg, self.qcfg,
                                     self.compute_dtype)
            d = self.draft
            out_sh = None
            if self._pool_shardings is not None:
                out_sh = (self._repl, self._repl, self._pool_shardings,
                          self._dpool_shardings)

            @functools.partial(jax.jit, donate_argnums=(2, 3),
                               out_shardings=out_sh)
            def verify_draft(params, dparams, pool, dpool, pending, lens):
                def draft_step(c, j):
                    dpool, tok = c
                    slot = lens + j
                    h, dpool, _ = d.model.forward(
                        dparams, tok[:, None], d.cfg, d.qcfg,
                        kv_cache=dpool, cache_index=slot,
                        positions=slot[:, None],
                        compute_dtype=d.compute_dtype)
                    nxt = jnp.argmax(d.model.logits(dparams, h)[:, 0],
                                     axis=-1).astype(jnp.int32)
                    return (dpool, nxt), nxt

                (dpool, _), drafts = jax.lax.scan(
                    draft_step, (dpool, pending),
                    jnp.arange(g + 1, dtype=jnp.int32))
                draft = drafts.T[:, :g]                       # [B, g]
                inputs = jnp.concatenate([pending[:, None], draft], axis=1)
                h, pool, _ = model.forward(
                    params, inputs, cfg, qcfg, kv_cache=pool,
                    cache_index=lens, positions=(
                        lens[:, None] + jnp.arange(g + 1)[None]),
                    compute_dtype=cdt)
                targets = jnp.argmax(model.logits(params, h), -1)
                return targets.astype(jnp.int32), draft, pool, dpool

            self._decode_fns[key] = verify_draft
        return self._decode_fns[key]

    def _verify_draft_multi(self, g: int, k: int):
        """k consecutive rollout+verify rounds in ONE dispatch (the spec
        analog of steps_per_sync): device-side acceptance advances
        lens/pending between rounds, so each dispatch emits ~k*(1+acc*g)
        tokens per row instead of one round's worth. On this runtime a
        dispatch costs 30-80 ms host latency — single-round speculation
        loses to plain sync batching at saturation purely on dispatch
        amortization (measured 0.85x); multi-round restores the win.
        Rows that finish (eos/stop/max_new) mid-window keep decoding
        garbage the host discards — the same overshoot tradeoff the plain
        scan decode makes."""
        key = ("verify_draft_multi", g, k)
        if key not in self._decode_fns:
            model, cfg, qcfg, cdt = (self.model, self.cfg, self.qcfg,
                                     self.compute_dtype)
            d = self.draft
            out_sh = None
            if self._pool_shardings is not None:
                out_sh = (self._repl, self._repl, self._repl, self._repl,
                          self._pool_shardings, self._dpool_shardings)

            @functools.partial(jax.jit, donate_argnums=(2, 3),
                               out_shardings=out_sh)
            def verify_multi(params, dparams, pool, dpool, pending, lens):
                b = pending.shape[0]
                rows = jnp.arange(b)

                def one_round(carry, _):
                    pool, dpool, pending, lens = carry

                    def draft_step(c, j):
                        dpool, tok = c
                        slot = lens + j
                        h, dpool, _ = d.model.forward(
                            dparams, tok[:, None], d.cfg, d.qcfg,
                            kv_cache=dpool, cache_index=slot,
                            positions=slot[:, None],
                            compute_dtype=d.compute_dtype)
                        nxt = jnp.argmax(d.model.logits(dparams, h)[:, 0],
                                         axis=-1).astype(jnp.int32)
                        return (dpool, nxt), nxt

                    (dpool, _), drafts = jax.lax.scan(
                        draft_step, (dpool, pending),
                        jnp.arange(g + 1, dtype=jnp.int32))
                    draft = drafts.T[:, :g]
                    inputs = jnp.concatenate([pending[:, None], draft], 1)
                    h, pool, _ = model.forward(
                        params, inputs, cfg, qcfg, kv_cache=pool,
                        cache_index=lens, positions=(
                            lens[:, None] + jnp.arange(g + 1)[None]),
                        compute_dtype=cdt)
                    targets = jnp.argmax(model.logits(params, h),
                                         -1).astype(jnp.int32)
                    ok = jnp.cumprod(
                        (draft == targets[:, :-1]).astype(jnp.int32), 1)
                    n_acc = jnp.sum(ok, axis=1)
                    new_pending = targets[rows, n_acc]
                    return ((pool, dpool, new_pending, lens + n_acc + 1),
                            (targets, n_acc))

                (pool, dpool, pending, lens), (tgt, acc) = jax.lax.scan(
                    one_round, (pool, dpool, pending, lens), None, length=k)
                return tgt, acc, pending, lens, pool, dpool

            self._decode_fns[key] = verify_multi
        return self._decode_fns[key]

    def _spec_step_draft_multi(self, active, g: int, k: int):
        """Draft-model spec tick, k rounds per dispatch. Host applies
        eos/stop/max_new truncation over the returned per-round targets and
        adopts the device's final lens/pending for rows that stay live."""
        lens_dec = np.where(active, self.lens, self.max_seq).astype(np.int32)
        self._event += 1
        tgt, acc, pend, lens_out, pool, dpool = self._verify_draft_multi(
            g, k)(self.params, self.draft.params, self.pool, self.dpool,
                  jnp.asarray(self.pending_tok.astype(np.int32)),
                  jnp.asarray(lens_dec))
        self.pool, self.dpool = pool, dpool
        tgt = np.asarray(jax.device_get(tgt))        # [k, B, g+1]
        acc = np.asarray(jax.device_get(acc))        # [k, B]
        pend = np.asarray(jax.device_get(pend))
        lens_out = np.asarray(jax.device_get(lens_out))
        tick_acc = tick_rounds = 0
        for row, req in enumerate(self.slot_req):
            if req is None:
                continue
            done = False
            for r in range(k):
                n_acc = int(acc[r, row])
                tick_acc += n_acc
                tick_rounds += 1
                for t in tgt[r, row, : n_acc + 1]:
                    req.output.append(int(t))
                    self.decode_tokens_generated += 1
                    if ((req.eos_token_id is not None
                         and int(t) == req.eos_token_id)
                            or self._stop_hit(req.output, req.stop)
                            or len(req.output) >= req.max_new_tokens):
                        done = True
                        break
                if done:
                    break
            if done:
                # overshoot rounds discarded; the freed slot's cache rows
                # are overwritten at the next admission
                self.lens[row] = min(int(lens_out[row]), self.max_seq - 1)
                self.pending_tok[row] = req.output[-1]
                self._check_done(row)
            else:
                self.lens[row] = int(lens_out[row])
                self.pending_tok[row] = int(pend[row])
                self._check_done(row)
        if tick_rounds:
            rate = tick_acc / (tick_rounds * g)
            self._spec_acc_ema = 0.8 * self._spec_acc_ema + 0.2 * rate

    @staticmethod
    def _host_draft(history: List[int], gamma: int, ngram: int) -> List[int]:
        """Prompt-lookup draft on the host: continuation after the most
        recent earlier occurrence of the last ``ngram`` tokens."""
        n = len(history)
        pat = history[-ngram:]
        for p in range(n - ngram - 1, -1, -1):
            if history[p:p + ngram] == pat:
                cont = history[p + ngram: p + ngram + gamma]
                if cont:
                    return (cont + [history[-1]] * gamma)[:gamma]
        return [history[-1]] * gamma

    def _effective_gamma(self) -> int:
        """Acceptance-adaptive draft length: full gamma while drafts land,
        half when mediocre, OFF when they miss — with a periodic re-probe so
        a workload shift (e.g. a repetitive prompt arriving) re-enables it.
        Each distinct value retraces the verify jit once (ladder of 3)."""
        g = self.speculative_gamma
        if not self.speculative_adaptive:
            return g
        self._spec_ticks += 1
        if self._spec_acc_ema >= 0.5:
            return g
        if self._spec_acc_ema >= 0.2:
            return max(1, g // 2)
        # acceptance collapsed: plain decode, re-probe every 32nd tick
        return g if self._spec_ticks % 32 == 0 else 0

    def _dmirror(self, n: int):
        """Mirror n plainly-decoded tokens per row into the draft pool.
        Plain ticks (a sampled/penalized/logprobs request in the batch,
        adaptive off-ticks, near-capacity rows) advance the TARGET cache
        only; without this the draft K/V grows permanent holes, rollouts
        attend garbage, acceptance collapses and adaptive gamma can never
        re-enable speculation (r5 review)."""
        key = ("dmirror", n)
        if key not in self._decode_fns:
            d = self.draft
            dsh = self._dpool_shardings

            @functools.partial(jax.jit, donate_argnums=(1,),
                               out_shardings=dsh)
            def dmirror(dparams, dpool, tok_mat, lens):
                _, dpool, _ = d.model.forward(
                    dparams, tok_mat, d.cfg, d.qcfg, kv_cache=dpool,
                    cache_index=lens,
                    positions=lens[:, None] + jnp.arange(n)[None],
                    compute_dtype=d.compute_dtype)
                return dpool

            self._decode_fns[key] = dmirror
        return self._decode_fns[key]

    def _spec_step(self, active, g):
        """One speculative tick: draft (host) -> verify (one forward over
        gamma+1 positions) -> accept longest matching prefix per row.
        Greedy-exact: emitted tokens equal the plain scheduler's. Rejected
        draft K/V is overwritten by the next window before it is causally
        reachable (lens' <= lens + gamma + 1)."""
        lens_dec = np.where(active, self.lens, self.max_seq).astype(np.int32)
        self._event += 1  # keep the deterministic event clock ticking
        if self.draft is not None:
            targets, drafts, pool, dpool = self._verify_draft(g)(
                self.params, self.draft.params, self.pool, self.dpool,
                jnp.asarray(self.pending_tok.astype(np.int32)),
                jnp.asarray(lens_dec))
            self.pool, self.dpool = pool, dpool
            drafts = np.asarray(jax.device_get(drafts))
            inputs = np.concatenate(
                [self.pending_tok.astype(np.int32)[:, None], drafts], axis=1)
        else:
            inputs = np.zeros((self.max_batch, g + 1), np.int32)
            for row, req in enumerate(self.slot_req):
                if req is None:
                    continue
                hist = req.prompt + req.output
                inputs[row, 0] = self.pending_tok[row]
                inputs[row, 1:] = self._host_draft(hist, g,
                                                   self.speculative_ngram)
            targets, pool = self._verify()(
                self.params, self.pool, jnp.asarray(inputs),
                jnp.asarray(lens_dec))
            self.pool = pool
        targets = np.asarray(jax.device_get(targets))
        tick_acc = tick_rows = 0
        for row, req in enumerate(self.slot_req):
            if req is None:
                continue
            n_acc = 0
            while n_acc < g and inputs[row, n_acc + 1] == targets[row, n_acc]:
                n_acc += 1
            tick_acc += n_acc
            tick_rows += 1
            n_app = 0
            for t in targets[row, : n_acc + 1]:
                req.output.append(int(t))
                self.decode_tokens_generated += 1
                n_app += 1
                if ((req.eos_token_id is not None
                     and int(t) == req.eos_token_id)
                        or self._stop_hit(req.output, req.stop)
                        or len(req.output) >= req.max_new_tokens):
                    break
            # each emitted token advanced the cache by one VALID input slot
            # (cur at lens, then accepted drafts) — same invariant as the
            # plain scheduler's one-slot-per-token
            self.lens[row] += n_app
            self.pending_tok[row] = req.output[-1]
            self._check_done(row)
        if tick_rows:
            rate = tick_acc / (tick_rows * g)
            self._spec_acc_ema = 0.8 * self._spec_acc_ema + 0.2 * rate

    def _step(self):
        self._admit()
        if self._admitting:
            self._advance_prefills()
        active = np.array([r is not None for r in self.slot_req])
        if not active.any():
            return
        if self.speculative_gamma > 0:
            plain_greedy = all(
                r is None or (r.temperature == 0.0
                              and r.repetition_penalty == 1.0
                              and not r.want_logprobs)
                for r in self.slot_req)
            g = self._effective_gamma() if plain_greedy else 0
            room = g > 0 and all(
                self.lens[row] + g + 1 < self.max_seq
                for row in range(self.max_batch) if active[row])
            if plain_greedy and room:
                if self.draft is not None:
                    # multi-round sync: as many rounds per dispatch as the
                    # cache headroom allows, capped at steps_per_sync and
                    # held to powers of two to bound compile variants
                    max_lens = max(int(self.lens[row])
                                   for row in range(self.max_batch)
                                   if active[row])
                    fit = (self.max_seq - 1 - max_lens) // (g + 1)
                    k = 1
                    while k * 2 <= min(self.steps_per_sync, fit):
                        k *= 2
                    if k >= 2:
                        self._spec_step_draft_multi(active, g, k)
                    else:
                        self._spec_step(active, g)
                else:
                    self._spec_step(active, g)
                return
        # clamp on-device steps to the smallest remaining CACHE capacity
        # across active slots: a slot whose lens overshoots max_seq mid-sync
        # would have its K/V scatter writes silently dropped while its tokens
        # keep being emitted (computed against a cache missing recent K/V).
        # lens[row]+1 slots are occupied after a step writes at index lens.
        cap = int(min(self.max_seq - self.lens[row] - 1
                      for row in range(self.max_batch) if active[row]))
        n = max(1, min(self.steps_per_sync, cap))
        # round down to a power of two so the clamp compiles at most
        # log2(steps_per_sync)+1 decode variants, not steps_per_sync
        n = 1 << (n.bit_length() - 1)
        # inactive rows must not write K/V anywhere real — a mid-prefill
        # (admitting) row's prefix lives at the low slots and a stray decode
        # write at lens=0 would corrupt it. Slot index max_seq is out of
        # bounds, so the scatter drops those writes entirely.
        lens_dec = np.where(active, self.lens, self.max_seq).astype(np.int32)
        sampling = bool((self.temps > 0.0)[active].any())
        penalize = bool((self.reppens != 1.0)[active].any())
        want_lp = any(r is not None and r.want_logprobs for r in self.slot_req)
        # static context bucket (256-step): decode attention touches only
        # the live slots — the full-length per-layer cache slice copy was
        # the dominant long-context decode overhead (BENCHMARKS.md
        # "Decode ablation"); compiles at most max_seq/256 extra variants
        need = int(self.lens[active].max()) + n + 1
        kv_window = min(-(-need // 256) * 256, self.max_seq)
        if kv_window >= self.max_seq:
            kv_window = None
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), self._event)
        self._event += 1
        seen = (jnp.asarray(self._seen_np) if penalize
                else jnp.zeros((self.max_batch, 1), bool))
        out = self._decode(n, sampling, penalize, want_lp, kv_window)(
            self.params, self.pool, jnp.asarray(self.pending_tok),
            jnp.asarray(lens_dec), jnp.asarray(active),
            jnp.asarray(self.temps), jnp.asarray(self.topks),
            jnp.asarray(self.topps), key, jnp.asarray(self.reppens), seen)
        out = list(out)
        lps = np.asarray(jax.device_get(out.pop())) if want_lp else None
        if penalize:
            seen_out = out.pop()
            self._seen_np = np.asarray(jax.device_get(seen_out))
        toks, pool, lens = out
        toks = np.asarray(jax.device_get(toks))
        self.pool = pool
        if self.draft is not None and self.speculative_gamma > 0:
            # tokens fed this window = [pending, toks[:, :n-1]] at
            # positions lens_dec + arange(n); inactive rows ride the
            # out-of-bounds sentinel (writes dropped)
            tok_mat = np.concatenate(
                [self.pending_tok.astype(np.int32)[:, None],
                 toks[:, :n - 1].astype(np.int32)], axis=1)
            self.dpool = self._dmirror(n)(
                self.draft.params, self.dpool, jnp.asarray(tok_mat),
                jnp.asarray(lens_dec))
        # keep inactive rows' real lens (they ran with the out-of-bounds
        # sentinel above)
        self.lens = np.where(active, np.asarray(jax.device_get(lens)),
                             self.lens).astype(np.int32)
        for row, req in enumerate(self.slot_req):
            if req is None:
                continue
            for step_i, t in enumerate(toks[row]):
                req.output.append(int(t))
                self.decode_tokens_generated += 1
                if req.want_logprobs and lps is not None:
                    req.logprobs.append(float(lps[row, step_i]))
                if ((req.eos_token_id is not None and int(t) == req.eos_token_id)
                        or self._stop_hit(req.output, req.stop)
                        or len(req.output) >= req.max_new_tokens):
                    break
            self.pending_tok[row] = req.output[-1]
            self._check_done(row)
        # slots freed mid-sync keep stale cache rows; lens reset on reuse

    def run(self, requests: Optional[List[Request]] = None,
            max_ticks: int = 10_000) -> Dict[Any, List[int]]:
        """Drive until all submitted requests complete."""
        if requests:
            for r in requests:
                self.waiting.append(r)
        all_reqs = list(self.waiting)
        for _ in range(max_ticks):
            if (not self.waiting and not self._admitting
                    and all(r is None for r in self.slot_req)):
                break
            self.step()
        out = {}
        for r in all_reqs:
            if r.eos_token_id is not None and r.eos_token_id in r.output:
                r.output = r.output[:r.output.index(r.eos_token_id)]
            out[r.uid] = r.output[:r.max_new_tokens]
            r.logprobs = r.logprobs[:len(out[r.uid])]
        return out
