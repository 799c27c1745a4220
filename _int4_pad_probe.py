"""Does padding down_proj K fix the hk=128 cliff? Time K' in {11264, 12288}."""
import time, numpy as np, jax, jax.numpy as jnp
T0 = time.time()
def t(msg): print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)
from autosmoothquant_tpu.quant import math as qm
from autosmoothquant_tpu.kernels.int4 import int4_matmul, _pick_blocks
from autosmoothquant_tpu.utils.profiling import device_time
t(f"devices={jax.devices()}")
rng = np.random.default_rng(0)
G, M, N, Ktrue = 128, 8, 4096, 11008
w = rng.normal(size=(Ktrue, N)).astype(np.float32) * 0.02
for Kp in (11264, 12288):
    wp = np.zeros((Kp, N), np.float32); wp[:Ktrue] = w
    p, s = qm.quantize_weight_int4_grouped(jnp.asarray(wp), G)
    x = jnp.asarray(rng.normal(size=(M, Kp)).astype(np.float32)).astype(jnp.bfloat16)
    def f(xx):
        out = int4_matmul(xx, p, s, out_dtype=jnp.bfloat16)
        return jnp.tile(out[:, :128] * 1e-3, (1, Kp // 128))
    us = device_time(f, x, n_lo=9, n_hi=509, reps=3) * 1e6
    t(f"K'={Kp} blocks={_pick_blocks(M, N, Kp, G)}: int4 {us:7.1f} us")
