"""On-chip ablation profile of the b8/s2048 int8 decode step.

Round-2 finding: the int8-vs-bf16 ratio drops from 1.52x (s512) to 1.31x
(s2048) and the s_max sweep attributes ~1.1 ms/step to context-
proportional work beyond cache bytes. This tool times the SAME decode
loop with pieces of the per-layer attention selectively removed
(monkeypatched carry_update_and_attend variants + jax.clear_caches per
arm) to find where those milliseconds actually go.

Arms:
  full        unmodified decode step
  noattn      skip attention entirely (ctx = q): leaves weights+writes
  noread      scores/probs math against only the first 128 cache slots
              (kills ~all cache-read bytes, keeps op structure)
  nosoftmax   probs = masked scores (no max/exp/sum chain)
  nowhere     no mask application
  bf16probs   PV einsum fed bf16 probs without the f32->bf16 copy (status
              quo) vs f32 probs straight in

Run on the TPU host:  python tools/profile_decode_ablation.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from autosmoothquant_tpu.models import common as C
    from autosmoothquant_tpu.models import llama as L
    from autosmoothquant_tpu.quant.config import QuantConfig

    batch = int(os.environ.get("ASQ_BENCH_BATCH", "8"))
    s_max = int(os.environ.get("ASQ_BENCH_SMAX", "2048"))
    cfg = bench.get_cfg(os.environ.get("ASQ_BENCH_PRESET", "tinyllama"))
    qcfg = QuantConfig(type="int8")
    params = bench.build_params(cfg, "int8")

    orig = C.carry_update_and_attend

    def variant(kind):
        def patched(q, k, v, cache, l, cache_index, mask, scale,
                    compute_dtype, *, window=None, alibi_bias=None):
            b, t = q.shape[:2]
            if kind == "noattn":
                new_cache = C._carry_write(cache, l, k, v, cache_index, b, t)
                return new_cache, q.reshape(b, t, -1).astype(compute_dtype)
            if kind in ("noread", "nosoftmax", "nowhere", "f32probs"):
                new_cache = C._carry_write(cache, l, k, v, cache_index, b, t)
                k_l = C._layer_slice(cache.k, l)
                v_l = C._layer_slice(cache.v, l)
                if kind == "noread":
                    k_l = k_l[:, :128]
                    v_l = v_l[:, :128]
                h = q.shape[2]
                hkv = k_l.shape[2]
                g = h // hkv
                dh = q.shape[3]
                ct = jnp.bfloat16
                qf = q.astype(ct).reshape(b, t, hkv, g, dh)
                sc = jnp.einsum("bqkgd,bskd->bkgqs", qf, k_l.astype(ct),
                                preferred_element_type=jnp.float32) * scale
                if kind != "nowhere":
                    mk = mask[:, :, None, :, :]
                    if kind == "noread":
                        mk = mk[..., :128]
                    sc = jnp.where(mk, sc, -1e30)
                if kind == "nosoftmax":
                    probs = sc
                else:
                    probs = jax.nn.softmax(sc, axis=-1)
                pv = probs if kind == "f32probs" else probs.astype(ct)
                out = jnp.einsum("bkgqs,bskd->bqkgd", pv, v_l.astype(ct),
                                 preferred_element_type=jnp.float32)
                return new_cache, out.reshape(b, t, h * dh).astype(
                    compute_dtype)
            raise ValueError(kind)

        return patched

    results = {}
    for kind in ("full", "noattn", "noread", "nowhere", "nosoftmax",
                 "f32probs"):
        C.carry_update_and_attend = orig if kind == "full" else variant(kind)
        jax.clear_caches()
        tps = bench.decode_tps(L, cfg, qcfg, params, batch=batch,
                               prompt_len=128, s_max=s_max)
        ms = batch / tps * 1000.0
        results[kind] = ms
        print(f"{kind:10s}: {tps:8.1f} tok/s   {ms:6.3f} ms/step",
              flush=True)
    C.carry_update_and_attend = orig
    base = results["full"]
    print("\nattribution (ms saved vs full):")
    for kind in ("noattn", "noread", "nowhere", "nosoftmax", "f32probs"):
        print(f"  {kind:10s}: {base - results[kind]:+6.3f} ms")


if __name__ == "__main__":
    main()
