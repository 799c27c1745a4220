import time, numpy as np, jax, jax.numpy as jnp
T0=time.time()
def t(msg): print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)
from autosmoothquant_tpu.utils.profiling import device_time
t(f"devices={jax.devices()}")
M, K, N = 8, 4096, 4096
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
w8 = jnp.asarray(rng.integers(-8, 8, size=(K, N)).astype(np.int8))

@jax.jit
def f_s4(x, w8):
    w4 = jax.lax.convert_element_type(w8, jnp.int4)
    return jax.lax.dot_general(x, w4.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
try:
    out = np.asarray(jax.device_get(f_s4(x, w8)))
    want = np.asarray(x.astype(jnp.float32) @ w8.astype(jnp.float32))
    t(f"s4-in-jit works, max rel {np.abs(out-want).max()/np.abs(want).max():.2e}")
except Exception as e:
    t(f"s4-in-jit FAILED: {type(e).__name__}: {str(e)[:200]}")

# can an int4 array LIVE as a jit input (donated from a jit that outputs int4)?
@jax.jit
def make4(w8):
    return jax.lax.convert_element_type(w8, jnp.int4)
try:
    w4 = make4(w8)
    t(f"int4 device array created: {w4.shape} {w4.dtype} nbytes={w4.nbytes}")
    @jax.jit
    def f2(x, w4):
        return jax.lax.dot_general(x, w4.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    out2 = np.asarray(jax.device_get(f2(x, w4)))
    want = np.asarray(x.astype(jnp.float32) @ w8.astype(jnp.float32))
    t(f"int4-as-input works, max rel {np.abs(out2-want).max()/np.abs(want).max():.2e}")
    def g(xx, ww): return f2(xx, ww)[:, :K].astype(jnp.bfloat16)
    us = device_time(g, x, w4, n_lo=9, n_hi=509, reps=3)*1e6
    t(f"int4-native dot: {us:.1f} us")
    wb = w8.astype(jnp.bfloat16)
    def gb(xx, ww): return jnp.dot(xx, ww, preferred_element_type=jnp.float32)[:, :K].astype(jnp.bfloat16)
    us = device_time(gb, x, wb, n_lo=9, n_hi=509, reps=3)*1e6
    t(f"bf16 dot: {us:.1f} us")
except Exception as e:
    t(f"int4-as-input FAILED: {type(e).__name__}: {str(e)[:300]}")
