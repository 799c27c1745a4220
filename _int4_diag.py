"""Diagnose the int4 kernel bottleneck: time stripped variants."""
import functools, time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from autosmoothquant_tpu.utils.profiling import device_time
T0=time.time()
def t(msg): print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)

M, K, N, G = 8, 4096, 4096, 128
rng = np.random.default_rng(0)
xe = jnp.asarray(rng.normal(size=(M, K//2)).astype(np.float32)).astype(jnp.bfloat16)
xo = jnp.asarray(rng.normal(size=(M, K//2)).astype(np.float32)).astype(jnp.bfloat16)
packed = jnp.asarray(rng.integers(0, 255, size=(K//2, N)).astype(np.uint8))
scales = jnp.asarray(rng.normal(size=(K//G, N)).astype(np.float32))

def mk(variant, bm=8, bn=512, bk=2048):
    def kern(xe_ref, xo_ref, p_ref, s_ref, o_ref, acc_ref):
        kk = pl.program_id(2)
        @pl.when(kk == 0)
        def _i(): acc_ref[...] = jnp.zeros_like(acc_ref)
        dn = (((1,), (0,)), ((), ()))
        h = G // 2
        s = s_ref[...]
        if variant == "noconv":     # bandwidth + dot only (math garbage)
            wb = p_ref[...].astype(jnp.int32).astype(jnp.bfloat16)  # converts only
            for gi in range(bk // G):
                part = jax.lax.dot_general(xe_ref[:, gi*h:(gi+1)*h], wb[gi*h:(gi+1)*h], dn, preferred_element_type=jnp.float32)
                part += jax.lax.dot_general(xo_ref[:, gi*h:(gi+1)*h], wb[gi*h:(gi+1)*h], dn, preferred_element_type=jnp.float32)
                acc_ref[...] += part * s[gi:gi+1, :]
        elif variant == "nodot":    # unpack only, single garbage dot
            p = p_ref[...].astype(jnp.int32)
            wlo = (((p & 0xF) ^ 8) - 8).astype(jnp.bfloat16)
            whi = (((p >> 4) ^ 8) - 8).astype(jnp.bfloat16)
            acc_ref[...] += jax.lax.dot_general(xe_ref[...], wlo + whi, dn, preferred_element_type=jnp.float32)
        elif variant == "offset":   # offset-binary unpack (mask/shift only)
            p = p_ref[...].astype(jnp.int32)
            wlo = (p & 0xF).astype(jnp.bfloat16)
            whi = (p >> 4).astype(jnp.bfloat16)
            for gi in range(bk // G):
                xeg = xe_ref[:, gi*h:(gi+1)*h]; xog = xo_ref[:, gi*h:(gi+1)*h]
                part = jax.lax.dot_general(xeg, wlo[gi*h:(gi+1)*h], dn, preferred_element_type=jnp.float32)
                part += jax.lax.dot_general(xog, whi[gi*h:(gi+1)*h], dn, preferred_element_type=jnp.float32)
                corr = 8.0 * jnp.sum(xeg + xog, axis=1, keepdims=True).astype(jnp.float32)
                acc_ref[...] += (part - corr) * s[gi:gi+1, :]
        elif variant == "bigdot":   # full unpack, ONE dot per k-tile (scale folded into weights)
            p = p_ref[...].astype(jnp.int32)
            srep = jnp.repeat(s, h, axis=0)
            wlo = ((((p & 0xF) ^ 8) - 8).astype(jnp.float32) * srep).astype(jnp.bfloat16)
            whi = ((((p >> 4) ^ 8) - 8).astype(jnp.float32) * srep).astype(jnp.bfloat16)
            acc_ref[...] += jax.lax.dot_general(xe_ref[...], wlo, dn, preferred_element_type=jnp.float32)
            acc_ref[...] += jax.lax.dot_general(xo_ref[...], whi, dn, preferred_element_type=jnp.float32)
        elif variant == "current":
            p = p_ref[...].astype(jnp.int32)
            wlo = (((p & 0xF) ^ 8) - 8).astype(jnp.bfloat16)
            whi = (((p >> 4) ^ 8) - 8).astype(jnp.bfloat16)
            for gi in range(bk // G):
                part = jax.lax.dot_general(xe_ref[:, gi*h:(gi+1)*h], wlo[gi*h:(gi+1)*h], dn, preferred_element_type=jnp.float32)
                part += jax.lax.dot_general(xo_ref[:, gi*h:(gi+1)*h], whi[gi*h:(gi+1)*h], dn, preferred_element_type=jnp.float32)
                acc_ref[...] += part * s[gi:gi+1, :]
        @pl.when(kk == pl.num_programs(2) - 1)
        def _d(): o_ref[...] = acc_ref[...].astype(jnp.bfloat16)
    hk = bk // 2
    f = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(M//bm, N//bn, K//bk),
            in_specs=[pl.BlockSpec((bm, hk), lambda i,j,kk: (i,kk)),
                      pl.BlockSpec((bm, hk), lambda i,j,kk: (i,kk)),
                      pl.BlockSpec((hk, bn), lambda i,j,kk: (kk,j)),
                      pl.BlockSpec((bk//G, bn), lambda i,j,kk: (kk,j))],
            out_specs=pl.BlockSpec((bm, bn), lambda i,j,kk: (i,j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)]),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel","parallel","arbitrary")),
    )
    return jax.jit(lambda xe_, xo_, p_, s_: f(xe_, xo_, p_, s_))

t(f"devices={jax.devices()}")
import sys
variants = sys.argv[1:] or ["noconv", "nodot", "offset", "current", "bigdot"]
for v in variants:
    f = mk(v)
    g = lambda a, b, c, d: f(a, b, c, d)[:, :K//2].astype(jnp.bfloat16)
    us = device_time(g, xe, xo, packed, scales, n_lo=9, n_hi=509, reps=3) * 1e6
    t(f"{v:8s}: {us:7.1f} us")

# magic-bf16 variant: offset nibbles assembled into bf16 bits, bitcast free
def mk_magic(bm=8, bn=512, bk=2048):
    hk = bk // 2
    def kern(xe_ref, xo_ref, p_ref, s_ref, o_ref, acc_ref):
        kk = pl.program_id(2)
        @pl.when(kk == 0)
        def _i(): acc_ref[...] = jnp.zeros_like(acc_ref)
        dn = (((1,), (0,)), ((), ()))
        h = G // 2
        p = p_ref[...].astype(jnp.int16)
        lo = jax.lax.bitcast_convert_type(((p & 0xF) << 3) | 0x4300, jnp.bfloat16)
        hi = jax.lax.bitcast_convert_type(((p >> 4) << 3) | 0x4300, jnp.bfloat16)
        s = s_ref[...]          # scales/8 precomputed outside
        for gi in range(bk // G):
            part = jax.lax.dot_general(xe_ref[:, gi*h:(gi+1)*h], lo[gi*h:(gi+1)*h], dn, preferred_element_type=jnp.float32)
            part += jax.lax.dot_general(xo_ref[:, gi*h:(gi+1)*h], hi[gi*h:(gi+1)*h], dn, preferred_element_type=jnp.float32)
            acc_ref[...] += part * s[gi:gi+1, :]

        @pl.when(kk == pl.num_programs(2) - 1)
        def _d(): o_ref[...] = acc_ref[...].astype(jnp.bfloat16)
    f = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(M//bm, N//bn, K//bk),
            in_specs=[pl.BlockSpec((bm, hk), lambda i,j,kk: (i,kk)),
                      pl.BlockSpec((bm, hk), lambda i,j,kk: (i,kk)),
                      pl.BlockSpec((hk, bn), lambda i,j,kk: (kk,j)),
                      pl.BlockSpec((bk//G, bn), lambda i,j,kk: (kk,j)),
                      ],
            out_specs=pl.BlockSpec((bm, bn), lambda i,j,kk: (i,j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)]),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel","parallel","arbitrary")),
    )
    return f

if "magic" in (sys.argv[1:] or ["magic"]):
    # offset packing: nibble = w + 8, w in [-8, 7]; value(n) = 8w + 192
    w_ref = rng.integers(-8, 8, size=(K, N)).astype(np.int32)
    n_off = (w_ref + 8).astype(np.uint8)
    p_off = jnp.asarray(n_off[0::2] | (n_off[1::2] << 4))
    s_true = np.abs(rng.normal(size=(K//G, N)).astype(np.float32)) + 0.1
    s8 = jnp.asarray(s_true / 8.0)
    xs = (np.asarray(xe).astype(np.float32) + np.asarray(xo).astype(np.float32))
    xsum = jnp.asarray(xs.reshape(M, K//G, G//2).sum(-1).astype(np.float32))  # [M, K/G]
    f = mk_magic()
    fc = jax.jit(lambda a,b,c,d,e_: (f(a,b,c,d).astype(jnp.float32) - 192.0*jnp.dot(e_, d, preferred_element_type=jnp.float32)).astype(jnp.bfloat16))
    out = np.asarray(jax.device_get(fc(xe, xo, p_off, s8, xsum))).astype(np.float32)
    srep = np.repeat(s_true, G, axis=0)
    want = (np.stack([np.asarray(xe), np.asarray(xo)], 1).transpose(0,2,1).reshape(M, K).astype(np.float32)
            ) @ (w_ref * srep)
    # interleave: x[2k]=xe[k], x[2k+1]=xo[k]
    xfull = np.zeros((M, K), np.float32); xfull[:, 0::2] = np.asarray(xe).astype(np.float32); xfull[:, 1::2] = np.asarray(xo).astype(np.float32)
    want = xfull @ (w_ref * srep)
    rel = np.abs(out - want).max() / np.abs(want).max()
    t(f"magic correctness rel={rel:.2e}")
    g = lambda a,b,c,d,e_: fc(a,b,c,d,e_)[:, :K//2].astype(jnp.bfloat16)
    us = device_time(g, xe, xo, p_off, s8, xsum, n_lo=9, n_hi=509, reps=3)*1e6
    t(f"magic   : {us:7.1f} us")
