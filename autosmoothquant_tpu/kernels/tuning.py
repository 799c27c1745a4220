"""Per-shape kernel block-size selection — the TPU analog of the reference's
offline-tuned cublasLt algo cache (ref: csrc/int8gemm/cublasAlgoMap.{h,cc}:19-188,
keyed (batch,m,n,k) -> algo/tile/splitK). XLA autotuning subsumes most of it;
what remains shape-dependent for a Pallas GEMM is the (block_m, block_n,
block_k) tile choice, selected here at trace time (shapes are static under
jit, so this runs on the host during tracing — zero runtime cost).

A JSON table can override the heuristic, mirroring igemm_config.in
(ref: cublasAlgoMap.cc:52-98):

    {"1024,4096,4096": [256, 512, 512], ...}   # "M,N,K" -> [bm, bn, bk]
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Optional, Tuple

_TABLE: Dict[Tuple[int, int, int], Tuple[int, int, int]] = {}
# shapes where the tuned Pallas kernel MEASURED faster than the XLA int8 dot
# (from the table's _meta exec_time_us/xla_time_us) — the auto backend picks
# Pallas exactly there, the cublasAlgoMap "is this algo a win" analog
_PALLAS_WINS: set = set()

# int8 min tile is (32, 128): sublane 32, lane 128 (pallas_guide: Tiling
# Constraints). Block sizes must be multiples of these to hit the MXU cleanly.
SUBLANE = 32
LANE = 128


def load_table(path: str) -> None:
    global _TABLE, _PALLAS_WINS
    with open(path, "r", encoding="utf-8") as f:
        raw = json.load(f)
    _TABLE = {
        tuple(int(x) for x in k.split(",")): tuple(v)
        for k, v in raw.items() if not k.startswith("_")  # skip _meta sidecar
    }
    _PALLAS_WINS = set()
    for k, meta in raw.get("_meta", {}).items():
        t_p, t_x = meta.get("exec_time_us"), meta.get("xla_time_us")
        if t_p is not None and t_x is not None and t_p < t_x:
            _PALLAS_WINS.add(tuple(int(x) for x in k.split(",")))


def pallas_wins(m: int, n: int, k: int) -> bool:
    """True iff offline tuning measured the Pallas kernel faster than the
    XLA int8 dot at exactly this shape."""
    return (m, n, k) in _PALLAS_WINS


# table resolution: ASQ_GEMM_TABLE env, else the shipped table produced by
# kernels/autotune.py on a v5e chip (the igemm_config.in analog)
_env_table = os.environ.get("ASQ_GEMM_TABLE")
_shipped = os.path.join(os.path.dirname(__file__), "gemm_table.json")
if _env_table and os.path.exists(_env_table):
    load_table(_env_table)
elif os.path.exists(_shipped):
    load_table(_shipped)


VMEM_BUDGET = 12 * 1024 * 1024  # conservative slice of the ~16 MiB VMEM


def tile_fits(bm: int, bn: int, bk: int, budget: int = VMEM_BUDGET) -> bool:
    """Double-buffered int8 input tiles + int32 accumulator scratch + output
    tile within the VMEM budget (single source of truth — the autotuner's
    candidate filter and the runtime heuristic must agree)."""
    return 2 * (bm * bk + bk * bn) + 8 * bm * bn <= budget


def tile_traffic(m: int, n: int, k: int, bm: int, bn: int) -> int:
    """Predicted HBM bytes(≈elements) for one GEMM: x is re-read once per
    N-tile and w once per M-tile."""
    return m * k * (n // bn) + k * n * (m // bm)


def _largest_divisor_block(dim: int, cap: int, step: int) -> Optional[int]:
    """Largest multiple of ``step`` that divides ``dim``, at most ``cap``."""
    best = None
    b = step
    while b <= min(cap, dim):
        if dim % b == 0:
            best = b
        b += step
    return best


def pick_blocks(m: int, n: int, k: int) -> Optional[Tuple[int, int, int]]:
    """Choose (bm, bn, bk) for an int8 [m,k]x[k,n] matmul, or None if the
    shape can't be tiled (caller falls back to the XLA int8 dot).

    Heuristic: minimize HBM traffic = m*k*(n/bn) + k*n*(m/bm) — x is
    re-read once per N-tile and w once per M-tile — then prefer deeper bk
    (pipeline depth / fewer accumulator revisits). The old 256x256-capped
    tiles left the kernel HBM-bound at 2x XLA's traffic on prefill shapes;
    1024x1024 int8 tiles fit VMEM comfortably and are compute-bound."""
    key = (m, n, k)
    if key in _TABLE:
        return _TABLE[key]
    return _heuristic_blocks(m, n, k)


@functools.lru_cache(maxsize=1024)
def _heuristic_blocks(m: int, n: int, k: int
                      ) -> Optional[Tuple[int, int, int]]:
    """The traffic-minimizing search, memoized — shapes recur on every trace
    (each linear layer, every compile variant); the ~8k-combination scan
    must not re-run per call."""
    if n % LANE != 0 or k % LANE != 0:
        return None
    best = None
    best_cost = None
    bm = SUBLANE
    while bm <= min(1024, m):
        if m % bm:
            bm += SUBLANE
            continue
        bn = LANE
        while bn <= min(2048, n):
            if n % bn:
                bn += LANE
                continue
            # deepest bk that fits the VMEM budget
            bk = None
            cand = LANE
            while cand <= min(2048, k):
                if k % cand == 0 and tile_fits(bm, bn, cand):
                    bk = cand
                cand += LANE
            if bk is not None:
                cost = (tile_traffic(m, n, k, bm, bn), -bk)
                if best_cost is None or cost < best_cost:
                    best, best_cost = (bm, bn, bk), cost
            bn += LANE
        bm += SUBLANE
    return best
