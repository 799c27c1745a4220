"""Device mesh construction + multi-host init.

The reference has no tensor/expert parallelism (SURVEY.md §2.6 — only
accelerate device_map placement, utils/utils.py:43). Here parallelism is the
standard JAX recipe: a named Mesh, NamedSharding annotations on params and
caches, and XLA-inserted collectives over ICI.

Axes:
  data  — batch sharding (DP) and eval request sharding
  model — tensor parallelism (column/row-parallel projections)
  expert (optional, Mixtral) — expert parallelism
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: int = 1, model: Optional[int] = None,
              expert: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh over available devices. model=None takes every device
    not claimed by data/expert."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    e = expert or 1
    if model is None:
        assert n % (data * e) == 0, f"{n} devices not divisible by data*expert"
        model = n // (data * e)
    assert data * model * e == n, (
        f"mesh {data}x{model}x{e} != {n} devices")
    arr = np.asarray(devices).reshape(
        (data, e, model) if expert else (data, model))
    axes = ("data", "expert", "model") if expert else ("data", "model")
    return Mesh(arr, axes)


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host process-group init over DCN — the analog of the reference's
    implicit torch.distributed/NCCL setup (benchmarks/evaluator.py:447,461).
    No-op when running single-process."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
