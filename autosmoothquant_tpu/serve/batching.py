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


@dataclasses.dataclass
class Request:
    uid: Any
    prompt: List[int]
    max_new_tokens: int = 64
    eos_token_id: Optional[int] = None
    # filled by the engine:
    output: List[int] = dataclasses.field(default_factory=list)
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
                 steps_per_sync: int = 8, mesh=None, param_shardings=None):
        self.model = model_mod
        self.cfg = cfg
        self.qcfg = qcfg
        self.max_batch = max_batch
        self.max_seq = max_seq
        self.kv_dtype = kv_dtype
        self.compute_dtype = compute_dtype
        self.steps_per_sync = steps_per_sync
        self.mesh = mesh
        self._kv_shardings = None
        if mesh is not None:
            from ..shard.sharding import param_specs as _family_specs, shard_params

            specs = param_shardings
            if specs is None:
                specs = _family_specs(model_mod.FAMILY, cfg, mesh)
            self.params = shard_params(params, mesh, specs)
        else:
            self.params = params

        self.pool = model_mod.init_kv_cache(cfg, max_batch, max_seq, kv_dtype)
        if mesh is not None:
            from ..shard.sharding import kv_cache_spec_tree, shard_kv_cache

            self.pool = shard_kv_cache(self.pool, mesh, cfg, shard_batch=False)
            # NamedSharding tree for sharding-constraining the jit-internal
            # prefill cache (same head sharding as the pool)
            spec_tree = kv_cache_spec_tree(self.pool, cfg, mesh, shard_batch=False)
            self._kv_shardings = jax.tree.map(
                lambda s: jax.sharding.NamedSharding(mesh, s), spec_tree,
                is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
        self.lens = np.zeros(max_batch, np.int32)        # tokens in cache per slot
        self.slot_req: List[Optional[Request]] = [None] * max_batch
        self.pending_tok = np.zeros(max_batch, np.int32)  # next token to feed
        self.waiting: List[Request] = []
        self._prefill_cache = {}
        self._insert_cache = {}
        self._decode_fns = {}

    # -- jitted pieces ------------------------------------------------------

    def _prefill(self, bucket: int):
        if bucket not in self._prefill_cache:
            model, cfg, qcfg, cdt = self.model, self.cfg, self.qcfg, self.compute_dtype
            kv_dtype = self.kv_dtype
            kv_shardings = self._kv_shardings

            @jax.jit
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
            @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=())
            def insert(pool, temp, row):
                def put(p, t):
                    # p: [L, B, S, ...]; t: [L, 1, bucket, ...]
                    start = (0, row) + (0,) * (p.ndim - 2)
                    return jax.lax.dynamic_update_slice(p, t.astype(p.dtype), start)

                return jax.tree.map(put, pool, temp)

            self._insert_cache[bucket] = insert
        return self._insert_cache[bucket]

    def _decode(self, n: int):
        if n not in self._decode_fns:
            model, cfg, qcfg, cdt = self.model, self.cfg, self.qcfg, self.compute_dtype

            @functools.partial(jax.jit, donate_argnums=(1,))
            def decode(params, pool, toks, lens, active):
                """n greedy steps for all slots. toks/lens/active: [B].
                Returns (tokens [B, n], pool, lens)."""
                def step(carry, _):
                    toks, pool, lens = carry
                    positions = lens[:, None]
                    h, pool, _ = model.forward(
                        params, toks[:, None], cfg, qcfg, kv_cache=pool,
                        cache_index=lens, positions=positions,
                        compute_dtype=cdt)
                    nxt = jnp.argmax(model.logits(params, h)[:, 0], -1).astype(jnp.int32)
                    lens = lens + active.astype(jnp.int32)
                    return (nxt, pool, lens), nxt

                (_, pool, lens), ys = jax.lax.scan(
                    step, (toks, pool, lens), None, length=n)
                return ys.T, pool, lens

            self._decode_fns[n] = decode
        return self._decode_fns[n]

    # -- scheduler ----------------------------------------------------------

    def submit(self, uid, prompt: List[int], max_new_tokens: int = 64,
               eos_token_id: Optional[int] = None) -> Request:
        req = Request(uid, list(prompt), max_new_tokens, eos_token_id)
        self.waiting.append(req)
        return req

    def _free_slots(self) -> List[int]:
        return [i for i, r in enumerate(self.slot_req) if r is None]

    def _admit(self):
        free = self._free_slots()
        while free and self.waiting:
            req = self.waiting.pop(0)
            row = free.pop(0)
            if len(req.prompt) > self.max_seq - 1:
                # keep the most recent context; at least one decode slot must
                # remain or the first generated token would be dropped
                req.prompt = req.prompt[-(self.max_seq - 1):]
            bucket = min(_bucket(len(req.prompt)), self.max_seq)
            ids = np.zeros((1, bucket), np.int32)
            ids[0, :len(req.prompt)] = req.prompt[:bucket]
            temp, last_logits = self._prefill(bucket)(
                self.params, jnp.asarray(ids), len(req.prompt))
            self.pool = self._insert(bucket)(self.pool, temp, row)
            first = int(np.asarray(jax.device_get(jnp.argmax(last_logits))))
            req.output.append(first)
            self.slot_req[row] = req
            self.lens[row] = len(req.prompt)
            self.pending_tok[row] = first
            self._check_done(row)

    def _check_done(self, row: int):
        req = self.slot_req[row]
        if req is None:
            return
        eos_hit = (req.eos_token_id is not None
                   and req.output and req.output[-1] == req.eos_token_id)
        budget = len(req.output) >= req.max_new_tokens
        overflow = self.lens[row] + 1 >= self.max_seq
        if eos_hit or budget or overflow:
            if eos_hit:
                req.output = req.output[:-1]
            req.done = True
            self.slot_req[row] = None
            self.lens[row] = 0

    def step(self):
        """One scheduler tick: admit, then steps_per_sync decode steps."""
        self._admit()
        active = np.array([r is not None for r in self.slot_req])
        if not active.any():
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
        toks, pool, lens = self._decode(n)(
            self.params, self.pool, jnp.asarray(self.pending_tok),
            jnp.asarray(self.lens), jnp.asarray(active))
        toks = np.asarray(jax.device_get(toks))
        self.pool = pool
        self.lens = np.array(jax.device_get(lens))  # writable copy
        for row, req in enumerate(self.slot_req):
            if req is None:
                continue
            for t in toks[row]:
                req.output.append(int(t))
                if ((req.eos_token_id is not None and int(t) == req.eos_token_id)
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
            if (not self.waiting
                    and all(r is None for r in self.slot_req)):
                break
            self.step()
        out = {}
        for r in all_reqs:
            if r.eos_token_id is not None and r.eos_token_id in r.output:
                r.output = r.output[:r.output.index(r.eos_token_id)]
            out[r.uid] = r.output[:r.max_new_tokens]
        return out
