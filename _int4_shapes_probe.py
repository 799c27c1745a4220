"""Per-shape int4-vs-int8 timing on the real chip for llama-7B GEMMs."""
import sys, time, numpy as np, jax, jax.numpy as jnp
T0 = time.time()
def t(msg): print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)
from autosmoothquant_tpu.quant import math as qm
from autosmoothquant_tpu.kernels.int4 import int4_matmul, _pick_blocks
from autosmoothquant_tpu.kernels.gemm import int8_matmul
from autosmoothquant_tpu.utils.profiling import device_time

t(f"devices={jax.devices()}")
rng = np.random.default_rng(0)
G = 128
shapes = [("qkv", 4096, 12288), ("o", 4096, 4096),
          ("gateup", 4096, 22016), ("down", 11008, 4096)]
Ms = [int(a) for a in sys.argv[1:]] or [8, 1]
for M in Ms:
    for name, K, N in shapes:
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.02)
        p, s = qm.quantize_weight_int4_grouped(w, G)
        q8, s8 = qm.quantize_weight_per_tensor_absmax(w)
        del w
        def keep(out):   # carry shape must match x for device_time's loop
            return jnp.tile(out[:, :128] * 1e-3, (1, K // 128))
        def f_i4(xx):
            return keep(int4_matmul(xx, p, s, out_dtype=jnp.bfloat16))
        def f_i8(xx):
            q, ts = qm.quantize_act_per_token(xx)
            return keep(int8_matmul(q, q8, row_scale=ts, col_scale=s8,
                                    out_dtype=jnp.bfloat16))
        us4 = device_time(f_i4, x, n_lo=9, n_hi=509, reps=3) * 1e6
        us8 = device_time(f_i8, x, n_lo=9, n_hi=509, reps=3) * 1e6
        blocks = _pick_blocks(max(M, 8), N, K, G)
        t(f"M={M} {name:7s} K={K:5d} N={N:5d} blocks={blocks}: "
          f"int4 {us4:7.1f} us  int8 {us8:7.1f} us  ratio {us8/us4:5.2f}x")
