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
for v in [x for x in variants if x != "magic"]:
    f = mk(v)
    g = lambda a, b, c, d: f(a, b, c, d)[:, :K//2].astype(jnp.bfloat16)
    us = device_time(g, xe, xo, packed, scales, n_lo=9, n_hi=509, reps=3) * 1e6
    t(f"{v:8s}: {us:7.1f} us")

# magic-bf16 variant: offset nibbles assembled into bf16 bits, bitcast free
def mk_magic(flavor, bm=8, bn=512, bk=2048):
    hk = bk // 2
    def kern(xe_ref, xo_ref, p_ref, s_ref, o_ref, acc_ref):
        kk = pl.program_id(2)
        @pl.when(kk == 0)
        def _i(): acc_ref[...] = jnp.zeros_like(acc_ref)
        dn = (((1,), (0,)), ((), ()))
        h = G // 2
        if flavor == "i16mul":
            p = p_ref[...].astype(jnp.int16)
            lo = jax.lax.bitcast_convert_type((p & 0xF) * 8 + 0x4300, jnp.bfloat16)
            hi = jax.lax.bitcast_convert_type((p >> 4) * 8 + 0x4300, jnp.bfloat16)
        else:  # f32 magic: bitcast(0x4B000000 | n) == 2^23 + n exactly
            p = p_ref[...].astype(jnp.int32)
            lo = jax.lax.bitcast_convert_type((p & 0xF) | 0x4B000000, jnp.float32)
            hi = jax.lax.bitcast_convert_type((p >> 4) | 0x4B000000, jnp.float32)
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
    # offset packing: nibble = w + 8, w in [-8, 7]
    w_ref = rng.integers(-8, 8, size=(K, N)).astype(np.int32)
    n_off = (w_ref + 8).astype(np.uint8)
    p_off = jnp.asarray(n_off[0::2] | (n_off[1::2] << 4))
    s_true = np.abs(rng.normal(size=(K//G, N)).astype(np.float32)) + 0.1
    xs = (np.asarray(xe).astype(np.float32) + np.asarray(xo).astype(np.float32))
    xsum = jnp.asarray(xs.reshape(M, K//G, G//2).sum(-1).astype(np.float32))  # [M, K/G]
    xfull = np.zeros((M, K), np.float32)
    xfull[:, 0::2] = np.asarray(xe).astype(np.float32)
    xfull[:, 1::2] = np.asarray(xo).astype(np.float32)
    srep = np.repeat(s_true, G, axis=0)
    want = xfull @ (w_ref * srep)
    for flavor, scale_div, corr_c in [("f32", 1.0, 2**23 + 8.0), ("i16mul", 8.0, 192.0)]:
        # value(n) = base + m*n  => w = (value - base - 8m)/m ; s' = s/m, corr = (base + 8m)
        try:
            f = mk_magic(flavor)
            s_k = jnp.asarray(s_true / scale_div)
            fc = jax.jit(lambda a,b,c,d,e_: (f(a,b,c,d).astype(jnp.float32)
                 - corr_c/scale_div*0 - jnp.dot(e_, d, preferred_element_type=jnp.float32)*corr_c).astype(jnp.bfloat16))
            out = np.asarray(jax.device_get(fc(xe, xo, p_off, s_k, xsum))).astype(np.float32)
            rel = np.abs(out - want).max() / np.abs(want).max()
            t(f"magic-{flavor} correctness rel={rel:.2e}")
            g = lambda a,b,c,d,e_: fc(a,b,c,d,e_)[:, :K//2].astype(jnp.bfloat16)
            us = device_time(g, xe, xo, p_off, s_k, xsum, n_lo=9, n_hi=509, reps=3)*1e6
            t(f"magic-{flavor}: {us:7.1f} us")
        except Exception as e:
            t(f"magic-{flavor} FAILED: {type(e).__name__} {str(e)[:150]}")

if "w4a8" in sys.argv[1:]:
    # int-domain pipeline: unpack to int8, s8 MXU dots, f32 scale per group
    def mk_w4a8(bm=8, bn=512, bk=2048):
        hk = bk // 2
        def kern(xe_ref, xo_ref, p_ref, s_ref, o_ref, acc_ref):
            kk = pl.program_id(2)
            @pl.when(kk == 0)
            def _i(): acc_ref[...] = jnp.zeros_like(acc_ref)
            dn = (((1,), (0,)), ((), ()))
            h = G // 2
            p = p_ref[...].astype(jnp.int32)
            lo = (((p & 0xF) ^ 8) - 8).astype(jnp.int8)
            hi = (((p >> 4) ^ 8) - 8).astype(jnp.int8)
            s = s_ref[...]
            for gi in range(bk // G):
                part = jax.lax.dot_general(xe_ref[:, gi*h:(gi+1)*h], lo[gi*h:(gi+1)*h], dn, preferred_element_type=jnp.int32)
                part += jax.lax.dot_general(xo_ref[:, gi*h:(gi+1)*h], hi[gi*h:(gi+1)*h], dn, preferred_element_type=jnp.int32)
                acc_ref[...] += part.astype(jnp.float32) * s[gi:gi+1, :]
            @pl.when(kk == pl.num_programs(2) - 1)
            def _d(): o_ref[...] = acc_ref[...].astype(jnp.bfloat16)
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
        return f
    # int8 activations (pretend pre-quantized; timing-representative + correctness vs int math)
    xq = rng.integers(-127, 128, size=(M, K)).astype(np.int8)
    xeq = jnp.asarray(xq[:, 0::2]); xoq = jnp.asarray(xq[:, 1::2])
    w_ref = rng.integers(-8, 8, size=(K, N)).astype(np.int32)
    n_off = (w_ref & 0xF).astype(np.uint8)
    p_pk = jnp.asarray(n_off[0::2] | (n_off[1::2] << 4))
    s_true = np.abs(rng.normal(size=(K//G, N)).astype(np.float32)) + 0.1
    s_j = jnp.asarray(s_true)
    try:
        f = mk_w4a8()
        out = np.asarray(jax.device_get(f(xeq, xoq, p_pk, s_j))).astype(np.float32)
        want = ((xq.astype(np.float32).reshape(M, K//G, G) @
                 (w_ref.astype(np.float32).reshape(K//G, G, N)))
                * s_true[None, :, :]).sum(1) if False else None
        xf = xq.astype(np.float32); srep = np.repeat(s_true, G, axis=0)
        want = xf @ (w_ref * srep)
        rel = np.abs(out - want).max() / np.abs(want).max()
        t(f"w4a8 correctness rel={rel:.2e}")
        g = lambda a,b,c,d: f(a,b,c,d)[:, :K//2].astype(jnp.bfloat16)
        us = device_time(g, xeq, xoq, p_pk, s_j, n_lo=9, n_hi=509, reps=3)*1e6
        t(f"w4a8   : {us:7.1f} us")
    except Exception as e:
        t(f"w4a8 FAILED: {type(e).__name__} {str(e)[:150]}")

if "w4a8off" in sys.argv[1:]:
    # offset-binary storage: nibble = w+8 in [0,15]; kernel does ONLY mask/
    # shift + s8 converts; sign correction = tiny (xsum @ scales) outside
    def mk_off(bm=8, bn=512, bk=2048):
        hk = bk // 2
        def kern(xe_ref, xo_ref, p_ref, s_ref, o_ref, acc_ref):
            kk = pl.program_id(2)
            @pl.when(kk == 0)
            def _i(): acc_ref[...] = jnp.zeros_like(acc_ref)
            dn = (((1,), (0,)), ((), ()))
            h = G // 2
            p = p_ref[...].astype(jnp.int32)
            lo = (p & 0xF).astype(jnp.int8)
            hi = (p >> 4).astype(jnp.int8)
            s = s_ref[...]
            for gi in range(bk // G):
                part = jax.lax.dot_general(xe_ref[:, gi*h:(gi+1)*h], lo[gi*h:(gi+1)*h], dn, preferred_element_type=jnp.int32)
                part += jax.lax.dot_general(xo_ref[:, gi*h:(gi+1)*h], hi[gi*h:(gi+1)*h], dn, preferred_element_type=jnp.int32)
                acc_ref[...] += part.astype(jnp.float32) * s[gi:gi+1, :]
            @pl.when(kk == pl.num_programs(2) - 1)
            def _d(): o_ref[...] = acc_ref[...].astype(jnp.bfloat16)
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(M//bm, N//bn, K//bk),
                in_specs=[pl.BlockSpec((bm, hk), lambda i,j,kk: (i,kk)),
                          pl.BlockSpec((bm, hk), lambda i,j,kk: (i,kk)),
                          pl.BlockSpec((hk, bn), lambda i,j,kk: (kk,j)),
                          pl.BlockSpec((bk//G, bn), lambda i,j,kk: (kk,j))],
                out_specs=pl.BlockSpec((bm, bn), lambda i,j,kk: (i,j)),
                scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)]),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel","parallel","arbitrary")))
    xq = rng.integers(-127, 128, size=(M, K)).astype(np.int8)
    xeq = jnp.asarray(xq[:, 0::2]); xoq = jnp.asarray(xq[:, 1::2])
    w_ref = rng.integers(-8, 8, size=(K, N)).astype(np.int32)
    n_off = (w_ref + 8).astype(np.uint8)
    p_pk = jnp.asarray(n_off[0::2] | (n_off[1::2] << 4))
    s_true = np.abs(rng.normal(size=(K//G, N)).astype(np.float32)) + 0.1
    s_j = jnp.asarray(s_true)
    xsum = jnp.asarray(xq.astype(np.float32).reshape(M, K//G, G).sum(-1))  # [M, K/G]
    try:
        f = mk_off()
        fc = jax.jit(lambda a,b,c,d,e_: (f(a,b,c,d).astype(jnp.float32)
             - 8.0 * jnp.dot(e_, d, preferred_element_type=jnp.float32)).astype(jnp.bfloat16))
        out = np.asarray(jax.device_get(fc(xeq, xoq, p_pk, s_j, xsum))).astype(np.float32)
        xf = xq.astype(np.float32); srep = np.repeat(s_true, G, axis=0)
        want = xf @ (w_ref * srep)
        rel = np.abs(out - want).max() / np.abs(want).max()
        t(f"w4a8off correctness rel={rel:.2e}")
        g = lambda a,b,c,d,e_: fc(a,b,c,d,e_)[:, :K//2].astype(jnp.bfloat16)
        us = device_time(g, xeq, xoq, p_pk, s_j, xsum, n_lo=9, n_hi=509, reps=3)*1e6
        t(f"w4a8off: {us:7.1f} us")
    except Exception as e:
        t(f"w4a8off FAILED: {type(e).__name__} {str(e)[:150]}")
