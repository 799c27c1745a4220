"""On-chip A/B: automatic prefix sharing vs cold prefill (PagedEngine).

Workload: N requests whose prompts share a 960-token prefix (15 full
64-token blocks) with distinct 8-token tails — the system-prompt serving
shape, with NO register_prefix call. Arm A (auto_prefix=True) prefills the
full prompt once, publishes its blocks, and admits every later request
with an 8..16-token suffix chunk; arm B (auto_prefix=False) pays the full
~1k-token prefill per request. Reported metric = median wall-clock to
complete a warm request (submit -> run, max_new=4), i.e. TTFT-dominated.

Run: python tools/ab_auto_prefix.py   (real TPU; ~2 min incl. compiles)
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from autosmoothquant_tpu.models import llama as L
    from autosmoothquant_tpu.serve.paged import PagedEngine

    preset = os.environ.get("ASQ_AB_PRESET", "")
    kv_dtype = jnp.bfloat16
    qcfg = None
    if preset:
        # big shapes via bench.py's builders, in W8A8 int8 — the
        # production serving precision, and 7B bf16 weights + pool +
        # prefill transients exceed one chip's HBM anyway; unfused so the
        # engine's own projection handling applies
        os.environ["ASQ_BENCH_FUSE"] = "0"
        import bench
        from autosmoothquant_tpu.quant.config import QuantConfig

        cfg = bench.get_cfg(preset)
        params = bench.build_params(cfg, "int8")
        qcfg = QuantConfig(type="int8")
        max_batch = 1
        # the pool must hold the 15 shared blocks in the tree PLUS a full
        # row (16 blocks) or the cap silently truncates sharing (measured:
        # the default 17-page pool shared only 512/960 tokens). int8 pages
        # at 7B keep this ~1.1 GB next to 13.4 GB of weights.
        num_pages, max_auto = 40, 20
        if preset == "llama7b":
            kv_dtype = jnp.int8
            num_pages, max_auto = 33, 16
    else:
        cfg = L.LlamaConfig(vocab_size=1024, hidden_size=256,
                            intermediate_size=512, num_hidden_layers=4,
                            num_attention_heads=8, num_key_value_heads=4,
                            max_position_embeddings=2048)
        params = L.init_params(cfg, jax.random.PRNGKey(0))
        max_batch, num_pages, max_auto = 4, 65, 32
    rng = np.random.default_rng(0)
    shared = rng.integers(1, cfg.vocab_size, size=960).tolist()
    n_warm = 6
    max_new = 2  # TTFT-focused: decode dispatches would swamp the signal

    def run_arm(auto: bool):
        eng = PagedEngine(L, params, cfg, qcfg, max_batch=max_batch,
                          max_seq=1024, kv_dtype=kv_dtype,
                          compute_dtype=jnp.bfloat16,
                          block_size=64, num_pages=num_pages,
                          max_auto_pages=max_auto, auto_prefix=auto)
        # cold request: compiles the 1024-bucket prefill; under auto it also
        # publishes the 15 shared blocks
        eng.submit("cold", shared + [900] * 8, max_new_tokens=max_new)
        eng.run()
        # one throwaway warm request to compile the suffix-chunk path
        eng.submit("compile", shared + [901] * 8, max_new_tokens=max_new)
        eng.run()
        times = []
        for i in range(n_warm):
            tail = rng.integers(1, cfg.vocab_size, size=8).tolist()
            t0 = time.perf_counter()
            r = eng.submit(f"w{i}", shared + tail, max_new_tokens=max_new)
            eng.run()
            times.append(time.perf_counter() - t0)
            assert r.done and len(r.output) == max_new
        stats = (int(eng.auto_hits), int(eng.auto_hit_tokens))
        del eng  # free pool + jit buffers before the other arm (7B HBM)
        return statistics.median(times), stats

    t_auto, (hits, hit_tokens) = run_arm(True)
    t_cold, _ = run_arm(False)
    assert hits >= n_warm, hits
    assert hit_tokens >= n_warm * 960, hit_tokens  # FULL prefix shared
    print(json.dumps({
        "metric": "auto_prefix_warm_request_ms",
        "preset": preset or "tiny",
        "auto_ms": round(t_auto * 1e3, 1),
        "cold_ms": round(t_cold * 1e3, 1),
        "speedup": round(t_cold / t_auto, 2),
        "shared_tokens": 960, "suffix_tokens": 8,
        "auto_hit_tokens": hit_tokens}))


if __name__ == "__main__":
    main()
