"""REAL multi-process distributed execution (round-2 review gap: every
multi-host path had only ever run single-process). Spawns an actual
2-process jax.distributed CPU cluster (Gloo collectives over localhost)
via tools/drive_multiproc.py and asserts lockstep MultiHostEngine equality
across ranks + ShardedServingPool cross-rank gather correctness vs a
single-process golden. See the driver's docstring for the exact contract."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_cluster_lockstep_and_gather():
    env = dict(os.environ)
    # the driver sets its own XLA_FLAGS/JAX_PLATFORMS per subprocess; the
    # parent itself never imports jax
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "drive_multiproc.py"),
         "--timeout", "420"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=540)
    sys.stdout.write(proc.stdout[-2000:])
    sys.stderr.write(proc.stderr[-2000:])
    assert proc.returncode == 0, "multi-process drive failed"
    assert "[parent] OK" in proc.stdout
