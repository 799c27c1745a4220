import time, numpy as np, jax, jax.numpy as jnp
T0=time.time()
def t(msg): print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)
from autosmoothquant_tpu.quant import math as qm
from autosmoothquant_tpu.kernels.int4 import int4_matmul
from autosmoothquant_tpu.kernels.gemm import int8_matmul
from autosmoothquant_tpu.utils.profiling import device_time
t(f"devices={jax.devices()}")
rng = np.random.default_rng(0)
M, K, N, G = 8, 4096, 4096, 128
x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
p, s = qm.quantize_weight_int4_grouped(w, G)
wd = qm.dequantize_int4_grouped(p, s, jnp.float32)

got = np.asarray(jax.jit(lambda x,p,s: int4_matmul(x, p, s, use_pallas=True))(x, p, s)).astype(np.float32)
want = np.asarray(x.astype(jnp.float32) @ wd)
rel = np.abs(got - want).max() / np.abs(want).max()
t(f"w4a8 pallas-on-tpu rel err {rel:.2e} (includes act-quant noise)")
assert rel < 5e-2, rel

q8, s8 = qm.quantize_weight_per_tensor_absmax(w)
wb = w.astype(jnp.bfloat16)
def f_int4(xx): return int4_matmul(xx, p, s, use_pallas=True, out_dtype=jnp.bfloat16)[:, :K]
def f_bf16(xx): return jnp.dot(xx, wb, preferred_element_type=jnp.float32).astype(jnp.bfloat16)[:, :K]
def f_int8(xx):
    q, ts = qm.quantize_act_per_token(xx)
    return int8_matmul(q, q8, row_scale=ts, col_scale=s8, out_dtype=jnp.bfloat16)[:, :K]
for name, f in [("int4_w4a8", f_int4), ("int8", f_int8), ("bf16", f_bf16)]:
    us = device_time(f, x, n_lo=9, n_hi=509, reps=3) * 1e6
    t(f"{name}: {us:8.1f} us")
