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
              expert: Optional[int] = None, stage: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh over available devices. model=None takes every device
    not claimed by data/expert/stage. Axis order puts "stage" outermost
    (stages ride slower links; TP stays innermost on ICI)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    e = expert or 1
    st = stage or 1
    if model is None:
        assert n % (data * e * st) == 0, (
            f"{n} devices not divisible by data*expert*stage")
        model = n // (data * e * st)
    assert data * model * e * st == n, (
        f"mesh stage={st} data={data} expert={e} model={model} != {n} devices")
    shape = []
    axes = []
    if stage:
        shape.append(st)
        axes.append("stage")
    shape.append(data)
    axes.append("data")
    if expert:
        shape.append(e)
        axes.append("expert")
    shape.append(model)
    axes.append("model")
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axes))


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
