"""Per-layer cost vs fixed overhead: decode step time at L in {4, 16}."""
import os, time, numpy as np, jax, jax.numpy as jnp
T0 = time.time()
def t(msg): print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)
import bench
from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.quant.config import QuantConfig
t(f"devices={jax.devices()}")
base = bench.get_cfg("llama7b")
import dataclasses
for kind, qc in [("int4", QuantConfig(type="int4", group_size=128)),
                 ("int8", QuantConfig(type="int8"))]:
    times = {}
    for nl in (4, 16):
        cfg = dataclasses.replace(base, num_hidden_layers=nl)
        params = bench.build_params(cfg, kind)
        tps = bench.decode_tps(L, cfg, qc, params, batch=1, prompt_len=128,
                               s_max=512, n_lo=8, n_hi=72, reps=3)
        times[nl] = 1.0 / tps
        del params
        import gc; gc.collect()
        t(f"{kind} L={nl}: {tps:.1f} tok/s  step={1e3/tps:.3f} ms")
    per_layer = (times[16] - times[4]) / 12 * 1e6
    fixed = (times[4] - 4 * (times[16] - times[4]) / 12) * 1e6
    t(f"{kind}: per-layer {per_layer:.1f} us, fixed {fixed:.1f} us")
