"""Runtime kernel/feature flags — one discoverable object replacing the
scattered trace-time ASQ_* environment reads (round-2 review item: env
vars were read at trace time, forcing one mode per process and
fork-per-arm A/Bs in bench.py).

Environment variables are honored as the base layer: every ``flags()``
call re-reads them (so env-based workflows and monkeypatched tests keep
working), then applies programmatic overrides set via ``set_flags`` or
the ``override`` context manager on top — overrides beat env vars.

IMPORTANT — trace caching: these flags are read at TRACE time inside
jitted functions, and jax's jit cache does NOT key on them. Changing a
flag therefore only affects future traces; already-compiled functions keep
the behavior they were traced with. ``override(clear_caches=True)`` (the
default) calls ``jax.clear_caches()`` on entry AND exit so both arms of an
A/B retrace — engines additionally memoize compiled steps internally, so
construct a fresh engine per arm.

Flag reference (env var / values / effect):
  int8_backend   ASQ_INT8_BACKEND   auto|pallas|xla  int8 GEMM backend
                 (auto = Pallas only on shapes where tuning measured a win)
  int4_backend   ASQ_INT4_BACKEND   auto|pallas|xla  int4 (W4A16) matmul
                 (auto = Pallas on TPU whenever the shape tiles; the XLA
                 path materializes dequantized weights and is fallback-only)
  fp8_native     ASQ_FP8_NATIVE     auto|off         probe native fp8 dot
  fp8_stream     ASQ_FP8_STREAM     auto|on|off      Pallas fp8 byte-stream
                 GEMM for decode-shaped M (kernels/fp8.py). auto/off = XLA
                 upcast (measured tie in-model, both VPU-convert-bound on
                 v5e); on = force the kernel (for fp8-MXU-less perf study)
  banded_prefill ASQ_BANDED_PREFILL auto|on|off      banded ragged prefill
  no_flash       ASQ_NO_FLASH       ""|1             disable flash prefill
  fused_block    ASQ_FUSED_BLOCK    auto|off|force   fused add+norm+quant
  moe            ASQ_MOE            auto|dense|sparse  Mixtral expert path
(ASQ_GEMM_TABLE selects the tuning table at import; ASQ_BENCH_* configure
bench.py arms — both are process-level inputs, not trace-time gates.)
"""

from __future__ import annotations

import contextlib
import dataclasses
import os


@dataclasses.dataclass
class Flags:
    int8_backend: str = "auto"
    int4_backend: str = "auto"
    fp8_native: str = "auto"
    fp8_stream: str = "auto"
    banded_prefill: str = "auto"
    no_flash: bool = False
    fused_block: str = "auto"
    moe: str = "auto"

    @classmethod
    def from_env(cls) -> "Flags":
        e = os.environ.get
        return cls(
            int8_backend=e("ASQ_INT8_BACKEND", "auto"),
            int4_backend=e("ASQ_INT4_BACKEND", "auto"),
            fp8_native=e("ASQ_FP8_NATIVE", "auto"),
            fp8_stream=e("ASQ_FP8_STREAM", "auto"),
            banded_prefill=e("ASQ_BANDED_PREFILL", "auto"),
            no_flash=e("ASQ_NO_FLASH", "") == "1",
            fused_block=e("ASQ_FUSED_BLOCK", "auto"),
            moe=e("ASQ_MOE", "auto"),
        )


_overrides: dict = {}
_FIELDS = {f.name for f in dataclasses.fields(Flags)}


def flags() -> Flags:
    """A live snapshot: environment values (re-read each call, so
    monkeypatched env vars keep working) with programmatic overrides
    applied on top. Read this INSIDE the traced/gated code path, not at
    import time."""
    f = Flags.from_env()
    for k, v in _overrides.items():
        setattr(f, k, v)
    return f


def set_flags(**kw) -> Flags:
    """Set programmatic overrides (they beat env vars until cleared with
    ``set_flags(<name>=None)``). Remember: already-traced jit functions
    keep their traced behavior (see module docstring)."""
    for k, v in kw.items():
        if k not in _FIELDS:
            raise AttributeError(f"unknown flag {k!r}; see runtime.Flags")
        if v is None:
            _overrides.pop(k, None)
        else:
            _overrides[k] = v
    return flags()


@contextlib.contextmanager
def override(clear_caches: bool = True, **kw):
    """Temporarily override flags; restores on exit. With clear_caches
    (default) the jax trace cache is dropped on entry and exit so code
    retraces under the new flags — the one-process A/B primitive."""
    import jax

    prev = {k: _overrides.get(k) for k in kw}
    set_flags(**kw)
    if clear_caches:
        jax.clear_caches()
    try:
        yield flags()
    finally:
        for k, v in prev.items():
            if v is None:
                _overrides.pop(k, None)
            else:
                _overrides[k] = v
        if clear_caches:
            jax.clear_caches()
