"""Offline GEMM block-size autotuner — the true analog of the reference's
igemm_config.in generation (ref: csrc/int8gemm/cublasAlgoMap.cc:52-98 parses
offline-tuned per-shape algo entries carrying exec_time). Sweeps legal
(bm, bn, bk) tiles for the Pallas int8 GEMM on the real chip, times each with
the slope method (this runtime's dispatch jitter swamps single-shot timing),
and writes the JSON consumed by kernels/tuning.load_table.

Usage (on a TPU host):
    python -m autosmoothquant_tpu.kernels.autotune --out gemm_table.json \
        --shapes 8,2560,2048 8,11264,2048 1024,4096,4096
"""

from __future__ import annotations

import argparse
import functools
import itertools
import json
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from .tuning import LANE, SUBLANE


def candidate_blocks(m: int, n: int, k: int,
                     max_candidates: Optional[int] = None
                     ) -> List[Tuple[int, int, int]]:
    """Legal (bm, bn, bk) tiles within the VMEM budget, lowest predicted HBM
    traffic first (tuning.tile_traffic: x is re-read once per N-tile and w
    once per M-tile, so BIG bm x bn tiles matter far more than bk — the
    round-2 finding: the 256x256 default was HBM-bound at 2x the traffic
    XLA incurs). VMEM/traffic models live in kernels/tuning.py so the
    autotuner and the runtime heuristic cannot drift apart."""
    from .tuning import tile_fits, tile_traffic

    bms = [b for b in (32, 64, 128, 256, 512, 1024) if b <= m and m % b == 0]
    bns = [b for b in (128, 256, 512, 1024, 2048) if b <= n and n % b == 0]
    bks = [b for b in (128, 256, 512, 1024, 2048) if b <= k and k % b == 0]
    out = [c for c in itertools.product(bms, bns, bks) if tile_fits(*c)]
    out.sort(key=lambda c: (tile_traffic(m, n, k, c[0], c[1]), -c[2]))
    return out[:max_candidates] if max_candidates else out


def _slope_time(fn, x, w, n_lo=32, n_hi=2080, reps=5) -> float:
    """Per-call seconds via chained on-device loop (the carry threads x so
    XLA cannot hoist the loop-invariant call).

    The iteration spread must be LARGE (2048 here): this runtime's dispatch
    jitter is +-tens of ms, and a us-scale kernel slope over a few hundred
    iterations drowns in it (round-2 sweeps read >peak TOPS). The estimator
    is min-over-reps — jitter only ever ADDS time."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(n, x, w):
        def body(i, carry):
            xx, acc = carry
            o = fn(xx, w)
            s = o.astype(jnp.float32).sum()
            # data-dependent bump (cannot be constant-folded to 0 the way
            # `s * 0` was — XLA hoisted the whole body for some shapes,
            # yielding impossible >peak TOPS readings) keeps the chain live
            # while barely perturbing x
            bump = (s == jnp.float32(1.2345e30)).astype(xx.dtype)
            return (xx + bump, acc + s)

        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc

    ts = {}
    for n in (n_lo, n_hi):
        np.asarray(jax.device_get(loop(n, x, w)))  # compile + warm
        best = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(loop(n, x, w)))
            best.append(time.perf_counter() - t0)
        ts[n] = float(np.min(best))
    return max((ts[n_hi] - ts[n_lo]) / (n_hi - n_lo), 1e-9)


def tune_shape(m: int, n: int, k: int, *, include_xla: bool = True,
               verbose: bool = True) -> Dict:
    """Time every candidate tile for one shape; returns
    {"blocks": best or None, "exec_time_us": t, "xla_time_us": t_xla}."""
    import jax
    import jax.numpy as jnp

    from .gemm import _int8_matmul_pallas, int8_matmul_xla

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, size=(m, k)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
    rs = jnp.ones((m, 1), jnp.float32)
    cs = jnp.ones((1, n), jnp.float32)

    results = []
    for bm, bn, bk in candidate_blocks(m, n, k, max_candidates=16):
        try:
            t = _slope_time(
                lambda xx, ww, bm=bm, bn=bn, bk=bk: _int8_matmul_pallas(
                    xx, ww, rs, cs, None, out_dtype=jnp.float32,
                    block_m=bm, block_n=bn, block_k=bk),
                x, w)
        except Exception as e:  # illegal tiling for this backend: skip
            if verbose:
                print(f"  ({bm},{bn},{bk}) failed: {type(e).__name__}")
            continue
        results.append(((bm, bn, bk), t))
        if verbose:
            tops = 2 * m * n * k / t / 1e12
            print(f"  ({bm},{bn},{bk}): {t * 1e6:.1f} us  {tops:.0f} TOPS")
    entry: Dict = {"blocks": None, "exec_time_us": None, "xla_time_us": None}
    if results:
        (blocks, t_best) = min(results, key=lambda r: r[1])
        entry["blocks"] = list(blocks)
        entry["exec_time_us"] = round(t_best * 1e6, 2)
    if include_xla:
        t_xla = _slope_time(
            lambda xx, ww: int8_matmul_xla(xx, ww).astype(jnp.float32)
            * rs * cs, x, w)
        entry["xla_time_us"] = round(t_xla * 1e6, 2)
    return entry


def autotune(shapes: List[Tuple[int, int, int]], out_path: str,
             verbose: bool = True) -> Dict[str, List[int]]:
    """Tune every shape and write the tuning-table JSON (plus an `_meta`
    sidecar recording timings, the exec_time analog). Merges into an
    existing table at out_path so coverage can grow across sessions —
    tuned entries for shapes NOT in `shapes` are preserved."""
    table: Dict[str, List[int]] = {}
    meta: Dict[str, Dict] = {}
    try:
        with open(out_path, encoding="utf-8") as f:
            prev = json.load(f)
        # a valid-JSON non-object (e.g. a list) must fall back to a fresh
        # table, not crash the tuner mid-session
        if isinstance(prev, dict):
            prev_meta = prev.pop("_meta", {})
            if isinstance(prev_meta, dict):
                meta.update(prev_meta)
            table.update(prev)
    except (OSError, ValueError):
        pass
    for m, n, k in shapes:
        if verbose:
            print(f"shape {m}x{n}x{k}:")
        entry = tune_shape(m, n, k, verbose=verbose)
        key = f"{m},{n},{k}"
        if entry["blocks"] is not None:
            table[key] = entry["blocks"]
        elif key in table:
            # every candidate failed on re-tune: drop the stale blocks so the
            # table and _meta cannot silently diverge
            if verbose:
                print(f"  re-tune failed; dropping stale entry {table[key]}")
            del table[key]
        meta[key] = entry
    payload = dict(table)
    payload["_meta"] = meta
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(payload, f, indent=2)
    return table


def model_gemm_shapes(cfg, batch: int = 8, fused: bool = True
                      ) -> List[Tuple[int, int, int]]:
    """Decode-step GEMM shapes for a llama-family config (M = batch)."""
    d = cfg.hidden_size
    i = cfg.intermediate_size
    hd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_key_value_heads * cfg.head_dim
    if fused:
        return [(batch, hd + 2 * kvd, d), (batch, 2 * i, d),
                (batch, d, hd), (batch, d, i)]
    return [(batch, hd, d), (batch, kvd, d), (batch, d, hd),
            (batch, i, d), (batch, d, i)]


QUICK_CANDIDATES = [
    # curated high-yield tiles (compile cost bounds a tuning session on the
    # tunnel; the exhaustive sweep is for dedicated tuning runs)
    (256, 256, 512), (256, 512, 512), (256, 256, 1024), (512, 256, 512),
    (128, 512, 1024), (256, 128, 2048), (512, 512, 256),
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="gemm_table.json")
    ap.add_argument("--shapes", nargs="*", default=None,
                    help="M,N,K triples; default = tinyllama+7b decode/prefill set")
    ap.add_argument("--quick", action="store_true",
                    help="curated candidate list instead of the full sweep")
    args = ap.parse_args()
    if args.quick:
        global candidate_blocks
        full = candidate_blocks

        def candidate_blocks(m, n, k, **kw):  # noqa: F811
            # legality must come from the UNtruncated list: the curated
            # tiles are mid-size and would be filtered out by the
            # traffic-sorted top-N that tune_shape requests
            legal = set(full(m, n, k))
            return [c for c in QUICK_CANDIDATES if c in legal] or \
                full(m, n, k, max_candidates=6)
    if args.shapes:
        shapes = [tuple(int(x) for x in s.split(",")) for s in args.shapes]
    else:
        shapes = [
            (8, 2560, 2048), (8, 11264, 2048), (8, 2048, 2048),
            (8, 2048, 5632),                       # tinyllama b8 decode (fused)
            (1024, 4096, 4096), (1024, 12288, 4096),  # 7b prefill-ish
        ]
    autotune(shapes, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
