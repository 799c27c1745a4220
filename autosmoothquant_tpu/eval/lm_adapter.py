"""LM adapter: loglikelihood / rolling-ppl / generate_until over the
functional models — the TPU-native analog of the reference's vendored
BaseLM + quant_model adapter (ref: benchmarks/base.py:21-273,
benchmarks/models/quant_model.py:12-148).

Requests are length-sorted into padded fixed-shape batches (the Reorderer
pattern, ref: benchmarks/base.py generate_until + benchmarks/utils.py) so a
handful of jit shapes serve the whole request set.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.config import QuantConfig


def _pad_pow2(n: int, lo: int = 32) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


class JaxLM:
    """Batched scoring/generation over a (possibly quantized) model."""

    def __init__(self, model_mod, params, cfg, qcfg: Optional[QuantConfig] = None,
                 *, batch_size: int = 8, max_length: int = 2048,
                 compute_dtype=jnp.float32):
        self.model = model_mod
        self.params = params
        self.cfg = cfg
        self.qcfg = qcfg
        self.batch_size = batch_size
        self.max_length = max_length
        self.compute_dtype = compute_dtype
        # rank/world hooks mirror the reference's multi-rank request sharding
        # (ref: benchmarks/evaluator.py:335,356-364): callers slice requests
        # per host and gather results via multihost utils.
        self.rank = 0
        self.world_size = 1

    @functools.cached_property
    def _score_fn(self):
        model, cfg, qcfg, cdt = self.model, self.cfg, self.qcfg, self.compute_dtype

        @functools.partial(jax.jit, static_argnums=())
        def score(params, ids):
            """ids: [B, T]; returns token logprobs [B, T-1, V]-gathered:
            logprob of ids[:, t+1] given prefix, plus argmax match flags.

            No attention_mask: sequences are RIGHT-padded, so causality
            already excludes every pad column for valid query rows (pad-row
            outputs are sliced away by the caller) — the maskless forward is
            plain causal and rides the flash-prefill kernel."""
            h, _, _ = model.forward(params, ids, cfg, qcfg,
                                    compute_dtype=cdt)
            logits = model.logits(params, h)  # [B, T, V] f32
            logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            targets = ids[:, 1:]
            tok_logp = jnp.take_along_axis(
                logp, targets[..., None], axis=-1)[..., 0]      # [B, T-1]
            greedy = jnp.argmax(logp, axis=-1) == targets        # [B, T-1]
            return tok_logp, greedy

        return score

    def _score_batch(self, token_lists: Sequence[Sequence[int]]):
        """Left-truncate to max_length, right-pad to a pow2 length; returns
        (tok_logp, greedy, effective post-truncation lengths [b])."""
        b = len(token_lists)
        t = _pad_pow2(max(len(x) for x in token_lists))
        t = min(t, self.max_length)
        ids = np.zeros((b, t), np.int32)
        eff_lens = np.zeros((b,), np.int64)
        for i, toks in enumerate(token_lists):
            toks = list(toks)[-t:]
            ids[i, :len(toks)] = toks
            eff_lens[i] = len(toks)
        tok_logp, greedy = self._score_fn(self.params, jnp.asarray(ids))
        return np.asarray(tok_logp), np.asarray(greedy), eff_lens

    # -- public API (BaseLM contract) ---------------------------------------

    def loglikelihood(self, requests: Sequence[Tuple[Sequence[int], Sequence[int]]]
                      ) -> List[Tuple[float, bool]]:
        """requests: [(context_tokens, continuation_tokens)]. Returns
        [(sum logprob of continuation, greedy-exact-match)].
        ref: benchmarks/base.py loglikelihood/_loglikelihood_tokens."""
        order = sorted(range(len(requests)),
                       key=lambda i: -(len(requests[i][0]) + len(requests[i][1])))
        results: List = [None] * len(requests)
        for start in range(0, len(order), self.batch_size):
            chunk = order[start:start + self.batch_size]
            seqs = [list(requests[i][0]) + list(requests[i][1]) for i in chunk]
            tok_logp, greedy, eff_lens = self._score_batch(seqs)
            for j, i in enumerate(chunk):
                cont_len = len(requests[i][1])
                # _score_batch LEFT-truncates over-long sequences, so slice the
                # continuation from the END of the effective sequence (the
                # reference's logits[inplen - contlen : inplen] convention,
                # ref: benchmarks/base.py:167,203). Token at position p+1 is
                # scored at tok_logp position p.
                eff = int(eff_lens[j])
                if cont_len > eff - 1:
                    raise ValueError(
                        f"continuation ({cont_len} tokens) does not fit in "
                        f"max_length={self.max_length} with >=1 context token")
                sl = slice(eff - 1 - cont_len, eff - 1)
                results[i] = (float(tok_logp[j, sl].sum()),
                              bool(greedy[j, sl].all()))
        return results

    def loglikelihood_rolling(self, token_streams: Sequence[Sequence[int]],
                              prefix_token: int = 0) -> List[float]:
        """Full-stream nll via max_length windows (rolling-token-windows,
        ref: benchmarks/base.py:loglikelihood_rolling + utils.py)."""
        out = []
        for stream in token_streams:
            stream = list(stream)
            total = 0.0
            windows = []
            pos = 0
            while pos < len(stream):
                ctx = [prefix_token] if pos == 0 else stream[max(0, pos - 1):pos]
                piece = stream[pos:pos + self.max_length - 1]
                windows.append((ctx[-1:], piece))
                pos += len(piece)
            for ctx, cont in windows:
                (ll, _), = self.loglikelihood([(ctx, cont)])
                total += ll
            out.append(total)
        return out

    def generate_until(self, prompts: Sequence[Sequence[int]],
                       max_new_tokens: int = 128,
                       eos_token_id: Optional[int] = None,
                       stop_sequences: Optional[Sequence[Sequence[int]]] = None
                       ) -> List[List[int]]:
        """Greedy continuation with stop-sequence truncation
        (ref: benchmarks/base.py greedy_until with length-sorted batching)."""
        from ..serve.engine import Engine, GenerationConfig

        eng = Engine(self.model, self.params, self.cfg, self.qcfg,
                     max_batch=self.batch_size,
                     max_seq=self.max_length,
                     kv_dtype=self.compute_dtype,
                     compute_dtype=self.compute_dtype)
        order = sorted(range(len(prompts)), key=lambda i: -len(prompts[i]))
        results: List = [None] * len(prompts)
        gc = GenerationConfig(max_new_tokens=max_new_tokens,
                              eos_token_id=eos_token_id)
        # left-truncate prompts so prompt + generation fits the engine cache
        # (lm-eval convention: keep the most recent context)
        keep = max(1, self.max_length - max_new_tokens)
        for start in range(0, len(order), self.batch_size):
            chunk = order[start:start + self.batch_size]
            outs = eng.generate([list(prompts[i])[-keep:] for i in chunk], gc)
            for j, i in enumerate(chunk):
                toks = outs[j]
                if stop_sequences:
                    for stop in stop_sequences:
                        stop = list(stop)
                        for t in range(len(toks) - len(stop) + 1):
                            if toks[t:t + len(stop)] == stop:
                                toks = toks[:t]
                                break
                results[i] = toks
        return results


def shard_requests(requests: Sequence, rank: int, world_size: int) -> list:
    """Per-rank request slice — the reference's multi-rank fan-out
    (ref: benchmarks/evaluator.py:335 build_all_requests(rank, world_size))."""
    return [r for i, r in enumerate(requests) if i % world_size == rank]


def gather_results(local_results: list, world_size: int):
    """Host-level all-gather of result lists over DCN — the TPU analog of
    torch.distributed.all_gather_object (ref: evaluator.py:442-491).

    Arbitrary Python results can't ride process_allgather directly (object
    arrays don't cross hosts), so each rank pickles its list into a byte
    buffer, ranks agree on the max length, and fixed-shape uint8 arrays are
    gathered — then unpickled and concatenated in rank order (matching
    shard_requests' round-robin split)."""
    if world_size <= 1:
        return local_results
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(local_results), np.uint8)
    n = np.int64(payload.size)
    lens = np.asarray(
        multihost_utils.process_allgather(np.asarray([n]))).reshape(-1)
    buf = np.zeros(int(lens.max()), np.uint8)
    buf[: payload.size] = payload
    chunks = np.asarray(multihost_utils.process_allgather(buf))
    chunks = chunks.reshape(len(lens), -1)
    out = []
    for i in range(len(lens)):
        out.extend(pickle.loads(bytes(chunks[i, : int(lens[i])])))
    return out
