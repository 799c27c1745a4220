"""hk=2048 vs 1024 on K=12288 and K=4096."""
import time, numpy as np, jax, jax.numpy as jnp
T0 = time.time()
def t(msg): print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)
from autosmoothquant_tpu.quant import math as qm
from autosmoothquant_tpu.kernels.int4 import _int4_matmul_pallas
from autosmoothquant_tpu.utils.profiling import device_time
t(f"devices={jax.devices()}")
rng = np.random.default_rng(0)
G, M, N = 128, 8, 4096
for K in (12288, 4096):
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.02)
    p, s = qm.quantize_weight_int4_grouped(w, G)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
    ts = jnp.maximum(jnp.max(jnp.abs(x), -1, keepdims=True).astype(jnp.float32), 1e-8) / 127.0
    for hk in (1024, 2048):
        if (K // 2) % hk: continue
        def f(xx):
            out = _int4_matmul_pallas(xx, p, s, ts, group=G, block_m=8,
                                      block_n=512, block_hk=hk)
            return jnp.tile(out[:, :128] * 1e-3, (1, K // 128)).astype(jnp.bfloat16)
        try:
            us = device_time(f, x, n_lo=9, n_hi=509, reps=3) * 1e6
            t(f"K={K} hk={hk}: {us:7.1f} us")
        except Exception as e:
            t(f"K={K} hk={hk}: FAIL {str(e)[:120]}")
