"""Isolate scan-context overhead: 4-GEMM chain per layer, stacked weights."""
import time, numpy as np, jax, jax.numpy as jnp
T0 = time.time()
def t(msg): print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)
from autosmoothquant_tpu.quant import math as qm
from autosmoothquant_tpu.kernels.int4 import int4_matmul
from autosmoothquant_tpu.utils.profiling import device_time
t(f"devices={jax.devices()}")
G, M, NL = 128, 1, 4
D, I = 4096, 11008
key = jax.random.PRNGKey(0)
def mk(K, N):
    global key
    key, sub = jax.random.split(key)
    qf = jax.jit(lambda k: jax.vmap(lambda w: qm.quantize_weight_int4_grouped(w, G))(
        jax.random.normal(k, (NL, K, N), jnp.float32) * 0.02))
    p, s = qf(sub)
    return jax.device_put(p), jax.device_put(s)
qkv = mk(D, 3 * D); o = mk(D, D); gu = mk(D, 2 * I); down = mk(I, D)
t("weights built")
x = jax.random.normal(jax.random.PRNGKey(9), (M, D), jnp.bfloat16)

def layer(h, l):
    a = int4_matmul(h, qkv[0], qkv[1], out_dtype=jnp.bfloat16, layer=l)
    h2 = int4_matmul(a[:, :D], o[0], o[1], out_dtype=jnp.bfloat16, layer=l)
    g = int4_matmul(h2, gu[0], gu[1], out_dtype=jnp.bfloat16, layer=l)
    h3 = int4_matmul(g[:, :I], down[0], down[1], out_dtype=jnp.bfloat16, layer=l)
    return h3

@jax.jit
def scan_fn(h):
    def body(c, _):
        hh, l = c
        return (layer(hh, l), l + 1), None
    (h, _), _ = jax.lax.scan(body, (h, jnp.int32(0)), None, length=NL)
    return h

us = device_time(scan_fn, x, n_lo=5, n_hi=85, reps=3) * 1e6
t(f"scan {NL} layers: {us:8.1f} us total -> {us/NL:7.1f} us/layer")

@jax.jit
def single(h):
    return layer(h, jnp.int32(2))
us1 = device_time(single, x, n_lo=5, n_hi=85, reps=3) * 1e6
t(f"single layer (jit, stacked index): {us1:7.1f} us")
