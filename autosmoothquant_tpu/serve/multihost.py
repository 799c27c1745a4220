"""Multi-host serving coordination over DCN.

The single-host engines (serve/engine.py, serve/batching.py) already run
sharded over a Mesh. Across HOSTS, JAX is SPMD: every process must execute
the same jitted computations in the same order, so the scheduler state that
drives those computations (which requests exist, in what order) must be
identical everywhere. This module provides the two production topologies:

  1. ``MultiHostEngine`` — one global mesh spanning all hosts (TP and/or DP
     axes over the pod). Requests enter at process 0 and are BROADCAST to
     every host as fixed-shape int32 arrays
     (``multihost_utils.broadcast_one_to_all`` — object pickles cannot
     cross hosts); from identical queues + greedy decoding, every host's
     deterministic scheduler makes identical decisions with no further
     coordination, keeping all hosts in jit lockstep.

  2. ``ShardedServingPool`` — engine-per-replica data parallelism: each
     host (or host group) runs an independent ContinuousEngine on its local
     devices with its own queue; requests are routed by stable uid hash and
     results gathered with the same fixed-shape allgather marshalling used
     by eval/lm_adapter.gather_results. This matches how production TPU
     serving splits DP (the batching engine's documented DP story,
     serve/batching.py:50-57).

The reference has no distributed serving at all (SURVEY.md §2.6: its only
multi-process code is lm-eval's rank-gather paths,
ref: benchmarks/evaluator.py:442-491); this subsystem is north-star scope.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .batching import ContinuousEngine, Request

_PREFIX_BYTES = 64  # fixed utf-8 marshalling width for Request.prefix ids
_MAX_STOP = 4       # stop sequences marshalled per request
_MAX_STOP_LEN = 8   # tokens per stop sequence


def _process_info() -> Tuple[int, int]:
    import jax

    return jax.process_index(), jax.process_count()


def broadcast_requests(requests: Optional[Sequence[Request]],
                       max_prompt: int = 4096,
                       max_requests: int = 1024) -> List[Request]:
    """Make process 0's request list identical on every host.

    Marshals to THREE fixed-shape int32 arrays (counts, metadata, padded
    prompt tokens) because multihost broadcast moves device arrays, not
    Python objects. Non-zero processes pass requests=None (ignored).
    uids are replaced by dense indices so they are broadcastable; callers
    keep their own uid mapping via the returned order (process 0's order).
    """
    import jax
    from jax.experimental import multihost_utils

    _, nproc = _process_info()
    reqs = list(requests or [])
    if len(reqs) > max_requests:
        raise ValueError(f"{len(reqs)} requests > max_requests={max_requests}")
    for r in reqs:
        if len(r.prompt) > max_prompt:
            # raising beats silent front-truncation: dropping the TAIL of a
            # prompt generates a continuation of the wrong text
            raise ValueError(f"prompt of {len(r.prompt)} tokens exceeds "
                             f"max_prompt={max_prompt}; raise max_prompt")
        if r.prefix is not None and not isinstance(r.prefix, str):
            raise ValueError("multi-host prefix ids must be strings "
                             "(marshalled as fixed-size utf-8)")
        if r.stop and (len(r.stop) > _MAX_STOP
                       or any(len(s) > _MAX_STOP_LEN for s in r.stop)):
            raise ValueError(
                f"multi-host stop sequences are capped at {_MAX_STOP} "
                f"sequences of {_MAX_STOP_LEN} tokens (fixed marshalling)")
    n = np.zeros((1,), np.int32)
    meta = np.zeros((max_requests, 5), np.int32)   # [plen, max_new, eos+1,
    #                                                 top_k, want_logprobs]
    samp = np.zeros((max_requests, 3), np.float32)  # [temp, top_p, rep_pen]
    samp[:, 1] = 1.0
    samp[:, 2] = 1.0
    toks = np.zeros((max_requests, max_prompt), np.int32)
    pref = np.zeros((max_requests, _PREFIX_BYTES), np.int32)  # utf-8 bytes
    # stop sequences: [len, ids...] rows, zero len = unused slot
    stops = np.zeros((max_requests, _MAX_STOP, 1 + _MAX_STOP_LEN), np.int32)
    n[0] = len(reqs)
    for i, r in enumerate(reqs):
        p = list(r.prompt)
        meta[i] = (len(p), r.max_new_tokens,
                   (r.eos_token_id + 1) if r.eos_token_id is not None else 0,
                   r.top_k, int(r.want_logprobs))
        for si, sseq in enumerate((r.stop or [])[:_MAX_STOP]):
            ss = list(sseq)[:_MAX_STOP_LEN]
            stops[i, si, 0] = len(ss)
            stops[i, si, 1:1 + len(ss)] = ss
        samp[i] = (r.temperature, r.top_p, r.repetition_penalty)
        toks[i, :len(p)] = p
        if r.prefix is not None:
            b = r.prefix.encode()[:_PREFIX_BYTES]
            pref[i, :len(b)] = np.frombuffer(b, np.uint8) + 1  # 0 = none
    if nproc > 1:
        n = np.asarray(multihost_utils.broadcast_one_to_all(n))
        meta = np.asarray(multihost_utils.broadcast_one_to_all(meta))
        samp = np.asarray(multihost_utils.broadcast_one_to_all(samp))
        toks = np.asarray(multihost_utils.broadcast_one_to_all(toks))
        pref = np.asarray(multihost_utils.broadcast_one_to_all(pref))
        stops = np.asarray(multihost_utils.broadcast_one_to_all(stops))
    out = []
    for i in range(int(n[0])):
        plen, max_new, eos1, top_k = (int(meta[i, 0]), int(meta[i, 1]),
                                      int(meta[i, 2]), int(meta[i, 3]))
        stop = [stops[i, si, 1:1 + stops[i, si, 0]].tolist()
                for si in range(_MAX_STOP) if stops[i, si, 0] > 0] or None
        pb = pref[i][pref[i] > 0]
        prefix = (bytes((pb - 1).astype(np.uint8)).decode()
                  if pb.size else None)
        out.append(Request(uid=i, prompt=toks[i, :plen].tolist(),
                           max_new_tokens=max_new,
                           eos_token_id=(eos1 - 1) if eos1 > 0 else None,
                           temperature=float(samp[i, 0]), top_k=top_k,
                           top_p=float(samp[i, 1]),
                           repetition_penalty=float(samp[i, 2]),
                           stop=stop, want_logprobs=bool(meta[i, 4]),
                           prefix=prefix))
    return out


class MultiHostEngine:
    """Continuous batching over a global mesh spanning every host.

    All constructor args pass through to ContinuousEngine; ``mesh`` should
    be built over ``jax.devices()`` (all hosts). ``serve`` takes the
    request list ON PROCESS 0 (None elsewhere), broadcasts it, and runs the
    deterministic scheduler in lockstep on every host. Sampling stays in
    lockstep too: every key is fold_in(PRNGKey(engine seed), event#), both
    of which advance identically on every host — pass the same ``seed``
    engine kwarg everywhere (default 0)."""

    def __init__(self, model_mod, params, cfg, qcfg=None, *,
                 max_prompt: int = 4096, **engine_kw):
        self.engine = ContinuousEngine(model_mod, params, cfg, qcfg,
                                       **engine_kw)
        self.max_prompt = max_prompt

    def serve(self, requests: Optional[Sequence[Request]] = None,
              max_ticks: int = 10000) -> Dict[int, List[int]]:
        """Returns {index-in-process-0-order: output token list}; identical
        on every host (every host computed every token)."""
        reqs = broadcast_requests(requests, self.max_prompt)
        self.engine.run(reqs, max_ticks=max_ticks)
        return {r.uid: list(r.output) for r in reqs}


class ShardedServingPool:
    """Engine-per-replica DP: this process serves the requests whose stable
    hash lands on it; ``gather`` merges every host's outputs into the full
    result dict on all hosts (fixed-shape allgather marshalling)."""

    def __init__(self, model_mod, params, cfg, qcfg=None, *,
                 max_new_cap: int = 512, engine_cls=None, **engine_kw):
        # engine_cls selects the per-replica engine (e.g. serve.paged
        # PagedEngine for pooled-capacity replicas); default contiguous
        cls = engine_cls or ContinuousEngine
        self.engine = cls(model_mod, params, cfg, qcfg, **engine_kw)
        self.max_new_cap = max_new_cap
        self._local: List[Request] = []

    @staticmethod
    def _owner(uid: int, nproc: int) -> int:
        # stable integer mix (splitmix64 tail) — hash() is salted per process
        h = (uid * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        h ^= h >> 31
        return int(h % nproc)

    def submit(self, uid: int, prompt: List[int], **kw) -> bool:
        """Routes by uid hash; returns True if this process owns it."""
        if not (0 <= uid < 2**31):
            raise ValueError(f"uid {uid} must fit int32 (gather marshalling; "
                             "multi-process JAX disables x64)")
        rank, nproc = _process_info()
        if self._owner(uid, nproc) != rank:
            return False
        self._local.append(self.engine.submit(uid, list(prompt), **kw))
        return True

    def run(self, max_ticks: int = 10000) -> None:
        out = self.engine.run(max_ticks=max_ticks)
        for r in self._local:
            if r.uid in out:
                r.output = out[r.uid]
                r.done = True

    def gather(self) -> Dict[int, List[int]]:
        """All-hosts merge of {uid: output tokens} (identical everywhere).
        Outputs are padded to ``max_new_cap`` int32 and exchanged with
        process_allgather — the same fixed-shape marshalling that replaced
        the object-gather in eval/lm_adapter (object arrays cannot cross
        process_allgather).

        Collectives need IDENTICAL shapes on every process, but uid-hash
        routing gives hosts different request counts — so the counts (fixed
        [1] shape) are gathered FIRST and every per-request array is padded
        to the global max count before its allgather. uids ride int32
        (multi-process JAX runs with x64 disabled; int64 would be silently
        downcast) — enforced at submit time via the int32 range check."""
        from jax.experimental import multihost_utils

        _, nproc = _process_info()
        n = len(self._local)
        if nproc == 1:
            return {r.uid: list(r.output)[: self.max_new_cap]
                    for r in self._local}
        counts = np.asarray(multihost_utils.process_allgather(
            np.asarray([n], np.int32))).reshape(nproc)
        cap = max(int(counts.max()), 1)
        uids = np.zeros((cap,), np.int32)
        lens = np.zeros((cap,), np.int32)
        toks = np.zeros((cap, self.max_new_cap), np.int32)
        for i, r in enumerate(self._local):
            out = list(r.output)[: self.max_new_cap]
            uids[i], lens[i] = r.uid, len(out)
            toks[i, :len(out)] = out
        uids = np.asarray(multihost_utils.process_allgather(uids))
        lens = np.asarray(multihost_utils.process_allgather(lens))
        toks = np.asarray(multihost_utils.process_allgather(toks))
        merged: Dict[int, List[int]] = {}
        for p in range(nproc):
            for i in range(int(counts[p])):
                merged[int(uids[p, i])] = toks[p, i, :int(lens[p, i])].tolist()
        return merged
