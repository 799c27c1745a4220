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

import json
import os
from typing import Dict, Optional, Tuple

_TABLE: Dict[Tuple[int, int, int], Tuple[int, int, int]] = {}

# int8 min tile is (32, 128): sublane 32, lane 128 (pallas_guide: Tiling
# Constraints). Block sizes must be multiples of these to hit the MXU cleanly.
SUBLANE = 32
LANE = 128


def load_table(path: str) -> None:
    global _TABLE
    with open(path, "r", encoding="utf-8") as f:
        raw = json.load(f)
    _TABLE = {
        tuple(int(x) for x in k.split(",")): tuple(v)
        for k, v in raw.items() if not k.startswith("_")  # skip _meta sidecar
    }


# table resolution: ASQ_GEMM_TABLE env, else the shipped table produced by
# kernels/autotune.py on a v5e chip (the igemm_config.in analog)
_env_table = os.environ.get("ASQ_GEMM_TABLE")
_shipped = os.path.join(os.path.dirname(__file__), "gemm_table.json")
if _env_table and os.path.exists(_env_table):
    load_table(_env_table)
elif os.path.exists(_shipped):
    load_table(_shipped)


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
    shape can't be tiled (caller falls back to the XLA int8 dot)."""
    key = (m, n, k)
    if key in _TABLE:
        return _TABLE[key]
    if n % LANE != 0 or k % LANE != 0:
        return None
    # M (tokens) can be small at decode time; sublane granularity is enough.
    bm = _largest_divisor_block(m, 256, SUBLANE)
    if bm is None:
        return None
    # Favor deep K blocks: int8 A/B tiles are 1 byte/elt so VMEM affords
    # bk=512..1024; deeper K amortizes the fp32 epilogue and accumulator.
    bk = _largest_divisor_block(k, 1024, LANE) or LANE
    bn = _largest_divisor_block(n, 512, LANE) or LANE
    # Keep A+B+acc within a conservative VMEM budget (~12 MiB of 16 MiB):
    # A: bm*bk, B: bk*bn (int8), acc: bm*bn*4 (int32), double-buffered inputs.
    while 2 * (bm * bk + bk * bn) + 4 * bm * bn > 12 * 1024 * 1024:
        if bk > LANE and k % (bk // 2) == 0:
            bk //= 2
        elif bn > LANE and n % (bn // 2) == 0:
            bn //= 2
        elif bm > SUBLANE and m % (bm // 2) == 0:
            bm //= 2
        else:
            return None
    return bm, bn, bk
