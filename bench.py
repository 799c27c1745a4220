"""Benchmark: W8A8 int8 decode throughput vs BF16 on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

vs_baseline = int8 tokens/s / bf16 tokens/s on the same model/hardware (the
BASELINE.md north-star is >=1.5x bf16 at 13B on v5e-8; this harness measures
the single-chip ratio on a TinyLlama-1.1B-shaped model — BASELINE config 1).

Measurement protocol (this runtime adds ~30-80ms host dispatch per call):
the whole decode loop runs on-device in one lax.scan jit; timing uses the
two-point slope method (N_lo vs N_hi decode steps) to cancel fixed dispatch
latency.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _enable_compile_cache():
    import jax

    cache_dir = os.environ.get("ASQ_JAX_CACHE", "/tmp/asq_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def get_cfg(preset: str):
    from autosmoothquant_tpu.models import llama as L

    if preset == "tiny":
        return L.LlamaConfig(vocab_size=2048, hidden_size=256,
                             intermediate_size=512, num_hidden_layers=2,
                             num_attention_heads=8, num_key_value_heads=4,
                             max_position_embeddings=512)
    if preset == "llama7b":  # llama-2-7b shape
        return L.LlamaConfig(vocab_size=32000, hidden_size=4096,
                             intermediate_size=11008, num_hidden_layers=32,
                             num_attention_heads=32, num_key_value_heads=32,
                             max_position_embeddings=2048)
    if preset == "llama13b":  # llama-2-13b shape (the north-star model size)
        return L.LlamaConfig(vocab_size=32000, hidden_size=5120,
                             intermediate_size=13824, num_hidden_layers=40,
                             num_attention_heads=40, num_key_value_heads=40,
                             max_position_embeddings=2048)
    # tinyllama-1.1b shape (BASELINE config 1)
    return L.LlamaConfig(vocab_size=32000, hidden_size=2048,
                         intermediate_size=5632, num_hidden_layers=22,
                         num_attention_heads=32, num_key_value_heads=4,
                         max_position_embeddings=2048)


def build_params(cfg, kind: str):
    """Synthesize throughput-bench weights for ONE phase, never holding both
    precisions (a 7B bf16+int8 pair exceeds a single chip's 16 GB HBM).
    Values are random — decode throughput depends on shapes/dtypes only."""
    import jax
    import jax.numpy as jnp
    from autosmoothquant_tpu.models import llama as L

    fuse = os.environ.get("ASQ_BENCH_FUSE", "1") == "1"
    if kind == "bf16":
        # generate directly in bf16: init_params' f32 intermediates would
        # transiently exceed HBM at 7B scale
        L_, D, I, V = (cfg.num_hidden_layers, cfg.hidden_size,
                       cfg.intermediate_size, cfg.vocab_size)
        HD = cfg.num_attention_heads * cfg.head_dim
        KVD = cfg.num_key_value_heads * cfg.head_dim
        key = jax.random.PRNGKey(0)

        def w(*shape, scale=0.02):
            nonlocal key
            key, sub = jax.random.split(key)
            return jax.random.normal(sub, shape, jnp.bfloat16) * scale

        params = {
            "embed": {"w": w(V, D)},
            "layers": {
                "ln1": {"w": jnp.ones((L_, D), jnp.bfloat16)},
                "attn": {"q": {"w": w(L_, D, HD)}, "k": {"w": w(L_, D, KVD)},
                         "v": {"w": w(L_, D, KVD)}, "o": {"w": w(L_, HD, D)}},
                "ln2": {"w": jnp.ones((L_, D), jnp.bfloat16)},
                "mlp": {"gate": {"w": w(L_, D, I)}, "up": {"w": w(L_, D, I)},
                        "down": {"w": w(L_, I, D)}},
            },
            "final_norm": {"w": jnp.ones((D,), jnp.bfloat16)},
            "lm_head": {"w": w(D, V)},
        }
        return L.fuse_decode_projections(params) if fuse else params

    # int8: draw the quantized representation directly
    L_, D, I, V = (cfg.num_hidden_layers, cfg.hidden_size,
                   cfg.intermediate_size, cfg.vocab_size)
    HD = cfg.num_attention_heads * cfg.head_dim
    KVD = cfg.num_key_value_heads * cfg.head_dim
    key = jax.random.PRNGKey(1)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _fill(arr, part, i):
        return jax.lax.dynamic_update_index_in_dim(arr, part, i, 0)

    def qw(*shape):
        nonlocal key
        key, sub = jax.random.split(key)
        if int(np.prod(shape)) <= 2 ** 27:
            return jax.random.randint(sub, shape, -127, 128, jnp.int8)
        # 13B-scale stacks: randint materializes 4-byte random bits before
        # the int8 cast (an 11 GB transient for the MLP stack) — generate
        # layer-by-layer into a donated buffer instead
        arr = jnp.zeros(shape, jnp.int8)
        for i in range(shape[0]):
            sub, one = jax.random.split(sub)
            part = jax.random.randint(one, shape[1:], -127, 128, jnp.int8)
            arr = _fill(arr, part, i)
        return arr

    def scl(*shape):
        return jnp.full(shape, 1e-3, jnp.float32)

    if kind == "int4":
        # nibble-packed W4A16 representation (kernels/int4.py contract)
        group = int(os.environ.get("ASQ_BENCH_GROUP", "128"))

        def qw4(*shape):
            nonlocal key
            key, sub = jax.random.split(key)
            return jax.random.randint(sub, shape, 0, 256).astype(jnp.uint8)

        def proj4(in_d, out_d):
            return {"w": qw4(L_, in_d // 2, out_d),
                    "w_scales": scl(L_, in_d // group, out_d)}

        params = {
            "embed": {"w": jax.random.normal(jax.random.PRNGKey(2), (V, D),
                                             jnp.bfloat16) * 0.02},
            "layers": {
                "ln1": {"w": jnp.ones((L_, D), jnp.bfloat16)},
                "attn": {"q": proj4(D, HD), "k": proj4(D, KVD),
                         "v": proj4(D, KVD), "o": proj4(HD, D)},
                "ln2": {"w": jnp.ones((L_, D), jnp.bfloat16)},
                "mlp": {"gate": proj4(D, I), "up": proj4(D, I),
                        "down": proj4(I, D)},
            },
            "final_norm": {"w": jnp.ones((D,), jnp.bfloat16)},
            "lm_head": {"w": jax.random.normal(jax.random.PRNGKey(3), (D, V),
                                               jnp.bfloat16) * 0.02},
        }
        from autosmoothquant_tpu.models.llama import fuse_decode_projections

        return fuse_decode_projections(params) if fuse else params

    if kind.startswith("fp8"):
        # e4m3 weights drawn directly in fp8 (decode speed depends only on
        # the bytes streamed); layer-by-layer fill keeps 13B transients small
        fdt = jnp.float8_e5m2 if kind == "fp8_e5m2" else jnp.float8_e4m3fn
        static = kind.endswith("static")

        def qw8(*shape):
            nonlocal key
            key, sub = jax.random.split(key)
            if int(np.prod(shape)) <= 2 ** 27:
                return (jax.random.normal(sub, shape, jnp.bfloat16)
                        * 0.02).astype(fdt)
            arr = jnp.zeros(shape, fdt)
            for i in range(shape[0]):
                sub, one = jax.random.split(sub)
                part = (jax.random.normal(one, shape[1:], jnp.bfloat16)
                        * 0.02).astype(fdt)
                arr = _fill(arr, part, i)
            return arr

        def proj8(in_d, out_d):
            p = {"w": qw8(L_, in_d, out_d), "w_scale": scl(L_)}
            if static:
                p["input_scale"] = scl(L_)
            return p

        params = {
            "embed": {"w": jax.random.normal(jax.random.PRNGKey(2), (V, D),
                                             jnp.bfloat16) * 0.02},
            "layers": {
                "ln1": {"w": jnp.ones((L_, D), jnp.bfloat16)},
                "attn": {"q": proj8(D, HD), "k": proj8(D, KVD),
                         "v": proj8(D, KVD), "o": proj8(HD, D)},
                "ln2": {"w": jnp.ones((L_, D), jnp.bfloat16)},
                "mlp": {"gate": proj8(D, I), "up": proj8(D, I),
                        "down": proj8(I, D)},
            },
            "final_norm": {"w": jnp.ones((D,), jnp.bfloat16)},
            "lm_head": {"w": jax.random.normal(jax.random.PRNGKey(3), (D, V),
                                               jnp.bfloat16) * 0.02},
        }
        from autosmoothquant_tpu.models.llama import fuse_decode_projections

        return fuse_decode_projections(params) if fuse else params

    def proj(in_d, out_d, scaled=False):
        p = {"w": qw(L_, in_d, out_d), "dequant_scale": scl(L_)}
        if scaled:
            p["quant_scale"] = scl(L_)
        return p

    params = {
        "embed": {"w": jax.random.normal(jax.random.PRNGKey(2), (V, D),
                                         jnp.float32).astype(jnp.bfloat16) * 0.02},
        "layers": {
            "ln1": {"w": jnp.ones((L_, D), jnp.bfloat16) * 20},
            "attn": {"q": proj(D, HD), "k": proj(D, KVD), "v": proj(D, KVD),
                     "o": proj(HD, D, scaled=True)},
            "ln2": {"w": jnp.ones((L_, D), jnp.bfloat16) * 20},
            "mlp": {"gate": proj(D, I), "up": proj(D, I),
                    "down": proj(I, D, scaled=True)},
        },
        "final_norm": {"w": jnp.ones((D,), jnp.bfloat16)},
        "lm_head": {"w": jax.random.normal(jax.random.PRNGKey(3), (D, V),
                                           jnp.float32).astype(jnp.bfloat16) * 0.02},
    }
    from autosmoothquant_tpu.models.llama import fuse_decode_projections

    return fuse_decode_projections(params) if fuse else params


def decode_tps(L, cfg, qcfg, params, *, batch, prompt_len, s_max,
               n_lo=None, n_hi=None, reps=None, kv_dtype=None):
    """Tokens/s of the fused greedy decode loop via two-point slope."""
    import jax
    import jax.numpy as jnp

    # shorter windows for opportunistic runs on a flaky tunnel
    n_lo = n_lo or int(os.environ.get("ASQ_BENCH_NLO", "8"))
    n_hi = n_hi or int(os.environ.get("ASQ_BENCH_NHI", "136"))
    reps = reps or int(os.environ.get("ASQ_BENCH_REPS", "5"))

    if kv_dtype is None:
        kv_dtype = jnp.int8 if os.environ.get("ASQ_BENCH_KV") == "int8" \
            else jnp.bfloat16
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, size=(batch, prompt_len)), jnp.int32)
    cache = L.init_kv_cache(cfg, batch, s_max, kv_dtype)

    @jax.jit
    def prefill(params, ids, cache):
        h, cache, _ = L.forward(params, ids, cfg, qcfg, kv_cache=cache,
                                cache_index=0, compute_dtype=jnp.bfloat16)
        tok = jnp.argmax(L.logits(params, h[:, -1:, :])[:, 0], -1).astype(jnp.int32)
        return tok, cache

    # static context bucket: decode touches only the live slots (the
    # full-length per-layer cache slice was the dominant long-context
    # overhead — see common.carry_update_and_attend kv_window)
    need = prompt_len + n_hi + 1
    kv_window = min(-(-need // 256) * 256, s_max)  # 256-step buckets
    if kv_window >= s_max:
        kv_window = None

    # dynamic trip count -> ONE compile serves both slope points
    @jax.jit
    def decode_n(params, tok, cache, nsteps):
        def body(_, carry):
            tok, cache, slot = carry
            h, cache, _ = L.forward(params, tok[:, None], cfg, qcfg,
                                    kv_cache=cache, cache_index=slot,
                                    kv_window=kv_window,
                                    compute_dtype=jnp.bfloat16)
            nxt = jnp.argmax(L.logits(params, h)[:, 0], -1).astype(jnp.int32)
            return (nxt, cache, slot + 1)

        tok2, _, _ = jax.lax.fori_loop(
            0, nsteps, body, (tok, cache, jnp.int32(prompt_len)))
        return tok2

    def make(nsteps):
        return lambda p, t, c: decode_n(p, t, c, nsteps)

    # NOTE: in this runtime block_until_ready can return before device
    # execution completes (axon tunnel); device_get of the result is the only
    # reliable completion barrier, hence the np.asarray(jax.device_get(...)).
    def run(f):
        return np.asarray(jax.device_get(f(params, tok, cache)))

    tok, cache = prefill(params, ids, cache)
    tok = jnp.asarray(np.asarray(jax.device_get(tok)))
    f_lo, f_hi = make(n_lo), make(n_hi)
    run(f_lo)
    run(f_hi)
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(f_lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(f_hi)
        t_hi = time.perf_counter() - t0
        slopes.append((t_hi - t_lo) / (n_hi - n_lo))
    per_step = float(np.median(slopes))
    assert per_step > 0, f"timing noise exceeded signal: {slopes}"
    return batch / per_step  # tokens/s across the batch


def paged_decode_tps(L, cfg, qcfg, params, *, batch, prompt_len, s_max,
                     block=64, n_lo=None, n_hi=None, reps=None,
                     kv_dtype=None):
    """decode_tps through the BLOCK-PAGED KV layout: attention gathers
    mapped pages (paged_attend) instead of dynamic-slicing a scan-carried
    [L,B,S,H,D] tensor — the per-layer unfused slice copy that caps the
    contiguous b8/s2048 ratio (BENCHMARKS.md round-3 ablation) does not
    exist in this layout. Each row owns contiguous pages (the engine's
    allocator is irrelevant to per-step cost)."""
    import jax
    import jax.numpy as jnp

    from autosmoothquant_tpu.models.common import PagedKVPool, \
        QuantPagedKVPool

    n_lo = n_lo or int(os.environ.get("ASQ_BENCH_NLO", "8"))
    n_hi = n_hi or int(os.environ.get("ASQ_BENCH_NHI", "136"))
    reps = reps or int(os.environ.get("ASQ_BENCH_REPS", "5"))
    if kv_dtype is None:
        kv_dtype = jnp.int8 if os.environ.get("ASQ_BENCH_KV") == "int8" \
            else jnp.bfloat16

    bps = -(-s_max // block)                      # blocks per slot
    n_pages = batch * bps + 1                     # page 0 = scratch
    n_kv = getattr(cfg, "num_key_value_heads", None) or \
        cfg.num_attention_heads
    shape = (cfg.num_hidden_layers, n_pages, block, n_kv, cfg.head_dim)
    table = (1 + np.arange(batch * bps, dtype=np.int32)
             ).reshape(batch, bps)
    if kv_dtype == jnp.int8:
        pool = QuantPagedKVPool(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.ones(shape[:-1], jnp.float32),
            v_scale=jnp.ones(shape[:-1], jnp.float32),
            table=jnp.asarray(table))
    else:
        pool = PagedKVPool(k=jnp.zeros(shape, kv_dtype),
                           v=jnp.zeros(shape, kv_dtype),
                           table=jnp.asarray(table))
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, size=(batch, prompt_len)), jnp.int32)

    @jax.jit
    def prefill(params, ids, pool):
        h, pool, _ = L.forward(params, ids, cfg, qcfg, kv_cache=pool,
                               cache_index=0, compute_dtype=jnp.bfloat16)
        tok = jnp.argmax(L.logits(params, h[:, -1:, :])[:, 0],
                         -1).astype(jnp.int32)
        return tok, pool

    # static live-block bound — the paged analog of kv_window
    need = prompt_len + n_hi + 1
    kv_window = min(-(-need // 256) * 256, s_max)
    if kv_window >= s_max:
        kv_window = None

    @jax.jit
    def decode_n(params, tok, pool, nsteps):
        def body(_, carry):
            tok, pool, slot = carry
            h, pool, _ = L.forward(params, tok[:, None], cfg, qcfg,
                                   kv_cache=pool, cache_index=slot,
                                   kv_window=kv_window,
                                   compute_dtype=jnp.bfloat16)
            nxt = jnp.argmax(L.logits(params, h)[:, 0], -1).astype(jnp.int32)
            return (nxt, pool, slot + 1)

        tok2, _, _ = jax.lax.fori_loop(
            0, nsteps, body, (tok, pool, jnp.int32(prompt_len)))
        return tok2

    def run(f):
        return np.asarray(jax.device_get(f(params, tok, pool)))

    tok, pool = prefill(params, ids, pool)
    tok = jnp.asarray(np.asarray(jax.device_get(tok)))
    f_lo = lambda p, t, c: decode_n(p, t, c, n_lo)
    f_hi = lambda p, t, c: decode_n(p, t, c, n_hi)
    run(f_lo)
    run(f_hi)
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(f_lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(f_hi)
        t_hi = time.perf_counter() - t0
        slopes.append((t_hi - t_lo) / (n_hi - n_lo))
    per_step = float(np.median(slopes))
    assert per_step > 0, f"timing noise exceeded signal: {slopes}"
    return batch / per_step


def churn_tps(L, cfg, qcfg, params, *, slots=8, n_requests=32,
              mean_prompt=128, max_new=64, s_max=1024, seed=0,
              arrival_lam=4.0):
    """Continuous-batching throughput under Poisson arrivals: requests are
    injected between scheduler ticks at exponential spacing; returns
    (generated_tokens/s wall-clock, static-batch baseline tokens/s on the
    same workload). VERDICT r1 item 8's done-criterion harness."""
    import time as _time

    import jax.numpy as jnp

    from autosmoothquant_tpu.serve.batching import ContinuousEngine

    rng = np.random.default_rng(seed)
    prompts = [rng.integers(1, cfg.vocab_size,
                            size=max(4, int(rng.exponential(mean_prompt)))
                            ).tolist()[: s_max - max_new - 1]
               for _ in range(n_requests)]
    gaps = rng.exponential(1.0 / arrival_lam, size=n_requests)  # ticks between arrivals

    eng = ContinuousEngine(L, cfg=cfg, params=params, qcfg=qcfg,
                           max_batch=slots, max_seq=s_max,
                           kv_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16,
                           steps_per_sync=8, prefill_chunk=256)
    # warm compile: run one tiny request through before timing
    eng.submit("warm", [1, 2, 3], max_new_tokens=2)
    eng.run()

    reqs = []
    t0 = _time.perf_counter()
    next_arrival = 0.0
    tick = 0.0
    i = 0
    while i < n_requests or any(r is not None for r in eng.slot_req) \
            or eng.waiting or eng._admitting:
        while i < n_requests and tick >= next_arrival:
            reqs.append(eng.submit(i, prompts[i], max_new_tokens=max_new))
            next_arrival += gaps[i]
            i += 1
        eng.step()
        tick += 1.0
    wall = _time.perf_counter() - t0
    total_toks = sum(len(r.output) for r in reqs)
    churn = total_toks / wall

    # static-batch baseline: same prompts, fixed batches of `slots`
    from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

    seng = Engine(L, params, cfg, qcfg, max_batch=slots, max_seq=s_max,
                  kv_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    seng.generate([prompts[0][:16]], GenerationConfig(max_new_tokens=2))  # warm
    t0 = _time.perf_counter()
    static_toks = 0
    for j in range(0, n_requests, slots):
        chunk = prompts[j:j + slots]
        outs = seng.generate(chunk, GenerationConfig(max_new_tokens=max_new))
        static_toks += sum(len(o) for o in outs)
    static = static_toks / (_time.perf_counter() - t0)
    return churn, static


def autoprefix_tps(L, cfg, qcfg, params, *, slots=8, n_requests=32,
                   shared_len=960, tail_len=8, max_new=32, s_max=1024,
                   seed=0):
    """Aggregate serving throughput on SYSTEM-PROMPT traffic through the
    paged engine: every request = one shared 960-token prefix + a distinct
    8-token tail, no register_prefix call. The auto arm's block radix tree
    turns every admission after the first into a suffix-only prefill; the
    cold arm re-prefills ~1k tokens per request. Returns
    (auto_tps, cold_tps, prefill_tokens_auto, prefill_tokens_cold)."""
    import time as _time

    import jax.numpy as jnp

    from autosmoothquant_tpu.serve.paged import PagedEngine

    rng = np.random.default_rng(seed)
    shared = rng.integers(1, cfg.vocab_size, size=shared_len).tolist()
    tails = [rng.integers(1, cfg.vocab_size, size=tail_len).tolist()
             for _ in range(n_requests)]

    def arm(auto: bool):
        eng = PagedEngine(L, cfg=cfg, params=params, qcfg=qcfg,
                          max_batch=slots, max_seq=s_max,
                          kv_dtype=jnp.bfloat16,
                          compute_dtype=jnp.bfloat16, steps_per_sync=8,
                          block_size=64, auto_prefix=auto)
        # first warm request publishes the shared blocks (auto) and
        # compiles the full-prefill path; the second admits THROUGH the
        # tree and compiles the suffix-chunk path — without it the first
        # timed request pays that compile (measured: it flipped the whole
        # A/B to 0.71x)
        eng.submit("warm", shared + [1] * tail_len, max_new_tokens=2)
        eng.run()
        eng.submit("warm2", shared + [2] * tail_len, max_new_tokens=2)
        eng.run()
        pre0 = eng.prefill_tokens_processed
        t0 = _time.perf_counter()
        reqs = [eng.submit(i, shared + t, max_new_tokens=max_new)
                for i, t in enumerate(tails)]
        eng.run()
        wall = _time.perf_counter() - t0
        toks = sum(len(r.output) for r in reqs)
        if auto:
            assert eng.auto_hits >= n_requests, eng.auto_hits
        return toks / wall, eng.prefill_tokens_processed - pre0

    auto_tps, pre_auto = arm(True)
    cold_tps, pre_cold = arm(False)
    return auto_tps, cold_tps, pre_auto, pre_cold


def main():
    _enable_compile_cache()
    if os.environ.get("ASQ_BENCH_MODE") == "kv":
        # int8 KV cache vs bf16 KV cache (both int8 weights) — the KV win is
        # proportional to cache/weight byte ratio, so measure at long context
        # (VERDICT r1 item 2: >=1.2x at cache-dominated shapes)
        import jax.numpy as jnp

        from autosmoothquant_tpu.models import llama as L
        from autosmoothquant_tpu.quant.config import QuantConfig

        preset = os.environ.get("ASQ_BENCH_PRESET", "tinyllama")
        batch = int(os.environ.get("ASQ_BENCH_BATCH", "8"))
        s_max = int(os.environ.get("ASQ_BENCH_SMAX", "8192"))
        # decode cache traffic scales with s_max (the full [B,S,H,D] buffers
        # are read through the mask each step), not the filled prompt length;
        # a long prompt only OOMs the eager cache-prefill's [Tq,S] scores
        prompt_len = int(os.environ.get("ASQ_BENCH_PROMPT",
                                        str(min(1024, s_max - 256))))
        cfg = get_cfg(preset)
        qcfg = QuantConfig(type="int8")
        params = build_params(cfg, "int8")
        tps_i8 = decode_tps(L, cfg, qcfg, params, batch=batch,
                            prompt_len=prompt_len, s_max=s_max,
                            kv_dtype=jnp.int8)
        tps_bf = decode_tps(L, cfg, qcfg, params, batch=batch,
                            prompt_len=prompt_len, s_max=s_max,
                            kv_dtype=jnp.bfloat16)
        print(json.dumps({
            "metric": f"decode_tok_per_s_int8kv_{preset}_b{batch}_s{s_max}",
            "value": round(tps_i8, 2), "unit": "tok/s",
            "vs_baseline": round(tps_i8 / tps_bf, 4),
            "bf16kv_tok_per_s": round(tps_bf, 2),
        }))
        return
    if os.environ.get("ASQ_BENCH_MODE") == "fp8":
        # FP8 e4m3 decode throughput vs bf16 (VERDICT r4 weak #1: fp8 had
        # zero on-chip perf rows). fp8 weights are 1 byte: if the packed
        # bytes are what streams, decode should be ~int8-speed; if the
        # upcast fallback materializes bf16 weights per step, ~bf16-speed.
        import gc

        import jax.numpy as jnp

        from autosmoothquant_tpu.models import llama as L
        from autosmoothquant_tpu.quant.config import QuantConfig

        preset = os.environ.get("ASQ_BENCH_PRESET", "tinyllama")
        batch = int(os.environ.get("ASQ_BENCH_BATCH", "1"))
        s_max = int(os.environ.get("ASQ_BENCH_SMAX", "512"))
        prompt_len = int(os.environ.get("ASQ_BENCH_PROMPT", "128"))
        scheme = os.environ.get("ASQ_BENCH_FP8_SCHEME", "dynamic")
        cfg = get_cfg(preset)

        params = build_params(cfg, "fp8_static" if scheme == "static" else "fp8")
        qcfg = QuantConfig(type="fp8_e4m3", activation_scheme=scheme)
        tps_f8 = decode_tps(L, cfg, qcfg, params, batch=batch,
                            prompt_len=prompt_len, s_max=s_max)
        del params
        gc.collect()
        base = os.environ.get("ASQ_BENCH_FP8_BASE", "bf16")
        if os.environ.get("ASQ_BENCH_REF"):
            # big presets: baseline arm measured in its own process
            tps_base = float(os.environ["ASQ_BENCH_REF"])
        else:
            params = build_params(cfg, base)
            tps_base = decode_tps(
                L, cfg, None if base == "bf16" else QuantConfig(type=base),
                params, batch=batch, prompt_len=prompt_len, s_max=s_max)
        print(json.dumps({
            "metric": f"decode_tok_per_s_fp8e4m3_{scheme}_{preset}_b{batch}_s{s_max}",
            "value": round(tps_f8, 2), "unit": "tok/s",
            "vs_baseline": round(tps_f8 / tps_base, 4),
            f"{base}_tok_per_s": round(tps_base, 2),
        }))
        return
    if os.environ.get("ASQ_BENCH_MODE") == "int4":
        # W4A16 (beyond the reference) vs W8A8 decode throughput — arms run
        # sequentially, never holding two big param sets at once
        import gc

        import jax.numpy as jnp

        from autosmoothquant_tpu.models import llama as L
        from autosmoothquant_tpu.quant.config import QuantConfig

        preset = os.environ.get("ASQ_BENCH_PRESET", "tinyllama")
        batch = int(os.environ.get("ASQ_BENCH_BATCH", "1"))
        s_max = int(os.environ.get("ASQ_BENCH_SMAX", "512"))
        prompt_len = int(os.environ.get("ASQ_BENCH_PROMPT", "128"))
        group = int(os.environ.get("ASQ_BENCH_GROUP", "128"))
        cfg = get_cfg(preset)

        params = build_params(cfg, "int4")
        tps_i4 = decode_tps(L, cfg, QuantConfig(type="int4", group_size=group),
                            params, batch=batch, prompt_len=prompt_len,
                            s_max=s_max)
        del params
        gc.collect()
        base = os.environ.get("ASQ_BENCH_INT4_BASE", "int8")
        if os.environ.get("ASQ_BENCH_REF_I8"):
            # big presets (13B): the int8 arm cannot coexist with the int4
            # HBM residue in one process — measure it in its own process
            # (plain bench.py run at the same shape) and pass it in
            tps_i8 = float(os.environ["ASQ_BENCH_REF_I8"])
        else:
            params = build_params(cfg, base)
            tps_i8 = decode_tps(
                L, cfg, None if base == "bf16" else QuantConfig(type="int8"),
                params, batch=batch, prompt_len=prompt_len, s_max=s_max)
        print(json.dumps({
            "metric": (f"decode_tok_per_s_w4a8_{preset}_b{batch}_s{s_max}"
                       + (f"_vs_{base}" if base != "int8" else "")),
            "value": round(tps_i4, 2), "unit": "tok/s",
            "vs_baseline": round(tps_i4 / tps_i8, 4),
            f"{base}_tok_per_s": round(tps_i8, 2),
        }))
        return
    if os.environ.get("ASQ_BENCH_MODE") == "prefill":
        # prompt-processing throughput (tokens/s through the full forward,
        # cache writes included) int8 vs bf16 — the compute-bound side of
        # serving (decode is weight-bandwidth-bound)
        import jax
        import jax.numpy as jnp

        from autosmoothquant_tpu.models import llama as L
        from autosmoothquant_tpu.quant.config import QuantConfig

        preset = os.environ.get("ASQ_BENCH_PRESET", "tinyllama")
        batch = int(os.environ.get("ASQ_BENCH_BATCH", "4"))
        t_len = int(os.environ.get("ASQ_BENCH_PROMPT", "1024"))
        cfg = get_cfg(preset)
        ids = jnp.asarray(np.random.default_rng(0).integers(
            0, cfg.vocab_size, size=(batch, t_len)), jnp.int32)

        def tps(params, qcfg):
            cache = L.init_kv_cache(cfg, batch, t_len, jnp.bfloat16)

            @jax.jit
            def pf(params, ids, cache):
                h, cache, _ = L.forward(params, ids, cfg, qcfg,
                                        kv_cache=cache, cache_index=0,
                                        compute_dtype=jnp.bfloat16)
                # consume h so nothing dead-codes; logits excluded (decode
                # path's cost, not prompt processing)
                return h.astype(jnp.float32).sum()

            np.asarray(jax.device_get(pf(params, ids, cache)))  # compile
            reps = int(os.environ.get("ASQ_BENCH_REPS", "7"))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(jax.device_get(pf(params, ids, cache)))
                ts.append(time.perf_counter() - t0)
            return batch * t_len / float(np.min(ts))

        qcfg = QuantConfig(type="int8")
        tp_i8 = tps(build_params(cfg, "int8"), qcfg)
        tp_bf = tps(build_params(cfg, "bf16"), None)
        print(json.dumps({
            "metric": f"prefill_tok_per_s_w8a8_int8_{preset}_b{batch}_t{t_len}",
            "value": round(tp_i8, 1), "unit": "tok/s",
            "vs_baseline": round(tp_i8 / tp_bf, 4),
            "bf16_tok_per_s": round(tp_bf, 1),
        }))
        return
    if os.environ.get("ASQ_BENCH_MODE") == "banded":
        # ragged (left-padded) batch prefill throughput — the admission path
        # of the continuous engine. BOTH arms (banded flash kernel vs eager
        # whole-cache attention) run in THIS process via runtime.override,
        # which retraces under each flag setting; vs_baseline is the
        # banded/eager speedup.
        import jax
        import jax.numpy as jnp

        from autosmoothquant_tpu import runtime
        from autosmoothquant_tpu.models import llama as L
        from autosmoothquant_tpu.quant.config import QuantConfig

        preset = os.environ.get("ASQ_BENCH_PRESET", "tinyllama")
        batch = int(os.environ.get("ASQ_BENCH_BATCH", "8"))
        t_len = int(os.environ.get("ASQ_BENCH_PROMPT", "1024"))
        cfg = get_cfg(preset)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size,
                                       size=(batch, t_len)), jnp.int32)
        # ragged: row i valid from pad_starts[i]; spread 1/8..full length
        pads = jnp.asarray(
            [(t_len * i) // (batch + 1) for i in range(batch)], jnp.int32)
        positions = (jnp.arange(t_len, dtype=jnp.int32)[None, :]
                     - pads[:, None])
        valid_tokens = int(batch * t_len - int(np.sum(np.asarray(pads))))

        qcfg = QuantConfig(type="int8")
        params = build_params(cfg, "int8")
        cache = L.init_kv_cache(cfg, batch, t_len, jnp.bfloat16)
        reps = int(os.environ.get("ASQ_BENCH_REPS", "7"))

        def arm():
            @jax.jit
            def pf(params, ids, positions, pads, cache):
                h, c, _ = L.forward(params, ids, cfg, qcfg, kv_cache=cache,
                                    cache_index=0, pad_starts=pads,
                                    positions=positions,
                                    compute_dtype=jnp.bfloat16)
                return h.astype(jnp.float32).sum()

            np.asarray(jax.device_get(pf(params, ids, positions, pads, cache)))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(jax.device_get(
                    pf(params, ids, positions, pads, cache)))
                ts.append(time.perf_counter() - t0)
            return valid_tokens / float(np.min(ts))

        tps = {}
        for mode in ("off", "auto"):  # eager first, then banded
            with runtime.override(banded_prefill=mode):
                tps[mode] = arm()
        print(json.dumps({
            "metric": (f"ragged_prefill_tok_per_s_{preset}_b{batch}"
                       f"_t{t_len}_banded"),
            "value": round(tps["auto"], 1), "unit": "tok/s",
            "vs_baseline": round(tps["auto"] / tps["off"], 3),
        }))
        return
    if os.environ.get("ASQ_BENCH_MODE") == "spec":
        # prompt-lookup speculative decoding vs plain greedy (b1, int8).
        # Wall-clock of one full generate each (tokens are identical by
        # construction); the prompt steers generation into repetitive
        # continuation, the regime speculative decoding targets.
        from autosmoothquant_tpu.models import llama as L
        from autosmoothquant_tpu.quant.config import QuantConfig
        from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

        preset = os.environ.get("ASQ_BENCH_PRESET", "tinyllama")
        max_new = int(os.environ.get("ASQ_BENCH_NEW", "512"))
        gamma = int(os.environ.get("ASQ_BENCH_GAMMA", "4"))
        cfg = get_cfg(preset)
        qcfg = QuantConfig(type="int8")
        peaked = os.environ.get("ASQ_BENCH_SPEC_WEIGHTS") == "peaked"
        wkind = os.environ.get("ASQ_BENCH_QUANT", "int8")  # int8 | int4
        if wkind == "int4":
            qcfg = QuantConfig(type="int4", group_size=int(
                os.environ.get("ASQ_BENCH_GROUP", "128")))
        import jax.numpy as jnp

        if peaked:
            # hand-shaped PEAKED logits (round-2 finding: random weights
            # give near-flat logits, capping acceptance; real checkpoints
            # are peaked). Zeroed layer weights pass the embedding through
            # the residual stream; the lm_head maps cycle token i -> i+1,
            # so greedy generation is perfectly periodic and prompt-lookup
            # drafts are accepted at ~100% — the gamma+1 regime.
            params = build_params(cfg, wkind)
            import jax

            C = 16
            emb = params["embed"]["w"]
            nxt = jnp.asarray([(i % C) + 1 for i in range(1, C + 1)])
            cyc = jnp.arange(1, C + 1)
            head = jnp.zeros_like(params["lm_head"]["w"])
            head = head.at[:, nxt].set(50.0 * emb[cyc].T.astype(head.dtype))
            params["lm_head"]["w"] = head

            def zero_proj(p):
                # packed int4 "zero" is offset-binary 8|8<<4 = 0x88 (nibble
                # value q+8 == 8 -> q == 0); int8 zero is plain 0
                def z(v):
                    if v.dtype == jnp.uint8:
                        return jnp.full_like(v, 0x88)
                    return jnp.zeros_like(v)
                return {k: (z(v) if k == "w" else v) for k, v in p.items()}

            lay = params["layers"]
            params["layers"] = {
                **lay,
                "attn": {k: zero_proj(v) for k, v in lay["attn"].items()},
                "mlp": {k: zero_proj(v) for k, v in lay["mlp"].items()},
            }
            prompt = [list(range(1, C + 1)) * 8]
        else:
            params = build_params(cfg, wkind)
            prompt = [list(np.random.default_rng(0).integers(
                1, cfg.vocab_size, size=16)) * 8]
        eng = Engine(L, params, cfg, qcfg, max_batch=1,
                     max_seq=max_new + 128 + gamma + 8)
        prompt = [p[:128] for p in prompt]
        plain_cfg = GenerationConfig(max_new_tokens=max_new)
        spec_cfg = GenerationConfig(max_new_tokens=max_new,
                                    speculative_gamma=gamma)

        def run(gc):
            # eng.generate device_gets the tokens, which is this runtime's
            # only reliable completion barrier
            t0 = time.perf_counter()
            out = eng.generate(prompt, gc)
            return out[0], time.perf_counter() - t0

        run(plain_cfg)  # compile
        run(spec_cfg)
        o1, t_plain = run(plain_cfg)
        o2, t_spec = run(spec_cfg)
        # greedy-exactness holds when the verify forward is numerically
        # identical to the step forward (tests prove token equality in f32);
        # random-weight logits are nearly FLAT (top-2 gaps ~1e-3), so the
        # ~1e-6 T=1-vs-T=5 reduction differences eventually flip an argmax
        # and the streams fork — report the match prefix instead of
        # asserting (real checkpoints have peaked logits)
        prefix = next((i for i, (a, b) in enumerate(zip(o1, o2)) if a != b),
                      len(o1))
        print(json.dumps({
            "metric": (f"speculative_speedup_{preset}_g{gamma}"
                       + ("_peaked" if peaked else "")
                       + (f"_{wkind}" if wkind != "int8" else "")),
            "value": round(max_new / t_spec, 2), "unit": "tok/s",
            "vs_baseline": round(t_plain / t_spec, 4),
            "greedy_tok_per_s": round(max_new / t_plain, 2),
            "greedy_match_prefix": prefix,
        }))
        return
    if os.environ.get("ASQ_BENCH_MODE") == "specdraft":
        # DRAFT-MODEL speculative decoding vs plain greedy and vs the
        # n-gram drafter (VERDICT r4 weak #6). Without real checkpoints a
        # random tiny draft agrees with a random target ~never, so the
        # harness constructs the regime draft models exploit: the target's
        # TAIL layers are damped (o/down scaled by eps), making the first
        # k layers carry most of the decision, and the draft IS that
        # k-layer prefix (sharing embed/norm/lm_head) — the layer-skip /
        # self-speculative setup. Logits stay non-peaked and generation
        # non-repeating (prompt-lookup finds nothing), so the n-gram arm
        # shows its flat-text ~1.1x while the draft model converts real
        # agreement into accepted tokens.
        import dataclasses as _dc

        import jax
        import jax.numpy as jnp

        from autosmoothquant_tpu.models import llama as L
        from autosmoothquant_tpu.serve.engine import (DraftModel, Engine,
                                                      GenerationConfig)

        preset = os.environ.get("ASQ_BENCH_PRESET", "tinyllama")
        max_new = int(os.environ.get("ASQ_BENCH_NEW", "512"))
        gamma = int(os.environ.get("ASQ_BENCH_GAMMA", "4"))
        k = int(os.environ.get("ASQ_BENCH_DRAFT_LAYERS", "4"))
        eps = float(os.environ.get("ASQ_BENCH_TAIL_EPS", "0.05"))
        cfg = get_cfg(preset)
        params = build_params(cfg, "bf16")
        lay = params["layers"]
        for grp, name in (("attn", "o"), ("mlp", "down")):
            w = lay[grp][name]["w"]
            lay[grp][name]["w"] = w.at[k:].multiply(eps)
        dcfg = _dc.replace(cfg, num_hidden_layers=k)
        dparams = {**params, "layers": jax.tree.map(lambda a: a[:k], lay)}
        seq = max_new + 128 + gamma + 8
        prompt = [list(np.random.default_rng(0).integers(
            1, cfg.vocab_size, size=128))]
        eng = Engine(L, params, cfg, None, max_batch=1, max_seq=seq,
                     fuse_projections=False)
        deng = Engine(L, params, cfg, None, max_batch=1, max_seq=seq,
                      fuse_projections=False,
                      draft=DraftModel(model=L, params=dparams, cfg=dcfg))

        def run(e, gc):
            t0 = time.perf_counter()
            out = e.generate(prompt, gc)
            return out[0], time.perf_counter() - t0

        plain_cfg = GenerationConfig(max_new_tokens=max_new)
        spec_cfg = GenerationConfig(max_new_tokens=max_new,
                                    speculative_gamma=gamma)
        run(eng, plain_cfg)
        run(deng, spec_cfg)
        run(eng, spec_cfg)
        o1, t_plain = run(eng, plain_cfg)
        o2, t_draft = run(deng, spec_cfg)
        o3, t_ngram = run(eng, spec_cfg)

        # teacher-forced draft/target argmax agreement over the generated
        # text — the acceptance-rate proxy (the spec loop itself does not
        # export counters)
        ids = jnp.asarray([prompt[0] + o1], jnp.int32)
        ht = L.forward_jit(params, ids, cfg, compute_dtype=jnp.bfloat16)[0]
        hd = L.forward_jit(dparams, ids, dcfg, compute_dtype=jnp.bfloat16)[0]
        at = np.asarray(jnp.argmax(L.logits(params, ht), -1))[0]
        ad = np.asarray(jnp.argmax(L.logits(dparams, hd), -1))[0]
        agree = float((at[127:-1] == ad[127:-1]).mean())
        prefix = next((i for i, (a, b) in enumerate(zip(o1, o2)) if a != b),
                      len(o1))
        rounds, accepted = getattr(deng, "last_spec_stats", [0, 0])
        print(json.dumps({
            "metric": f"specdraft_speedup_{preset}_g{gamma}_k{k}",
            "value": round(max_new / t_draft, 2), "unit": "tok/s",
            "vs_baseline": round(t_plain / t_draft, 4),
            "greedy_tok_per_s": round(max_new / t_plain, 2),
            "ngram_tok_per_s": round(max_new / t_ngram, 2),
            "ngram_speedup": round(t_plain / t_ngram, 4),
            "draft_agreement": round(agree, 4),
            "tokens_per_verify": round(max_new / max(rounds, 1), 2),
            "acceptance": round(accepted / max(rounds * gamma, 1), 4),
            "greedy_match_prefix": prefix,
        }))
        return
    if os.environ.get("ASQ_BENCH_MODE") == "paged":
        # paged-vs-contiguous serving A/B at EQUAL KV-cache HBM budget.
        # The contiguous engine must reserve max_seq per slot, so a fixed
        # byte budget caps its concurrency; the paged engine reserves per
        # actual need (prompt+max_new) and fits more concurrent requests in
        # the same bytes. Metric: aggregate tok/s serving the same request
        # list; vs_baseline = paged/contiguous.
        import jax.numpy as jnp

        from autosmoothquant_tpu.models import llama as L
        from autosmoothquant_tpu.quant.config import QuantConfig
        from autosmoothquant_tpu.serve.batching import ContinuousEngine
        from autosmoothquant_tpu.serve.paged import PagedEngine

        preset = os.environ.get("ASQ_BENCH_PRESET", "tinyllama")
        max_seq = int(os.environ.get("ASQ_BENCH_SMAX", "2048"))
        n_req = int(os.environ.get("ASQ_BENCH_NREQ", "32"))
        prompt_len = int(os.environ.get("ASQ_BENCH_PROMPT", "128"))
        max_new = int(os.environ.get("ASQ_BENCH_NEW", "128"))
        slots_contig = int(os.environ.get("ASQ_BENCH_BATCH", "4"))
        block = int(os.environ.get("ASQ_BENCH_BLOCK", "64"))
        cfg = get_cfg(preset)
        qcfg = QuantConfig(type="int8")
        params = build_params(cfg, "int8")
        rng = np.random.default_rng(0)
        prompts = [rng.integers(1, cfg.vocab_size,
                                size=prompt_len).tolist()
                   for _ in range(n_req)]
        # equal KV budget: contiguous = slots_contig x max_seq tokens;
        # paged gets the same token capacity in pages but 4x the slots
        budget_tokens = slots_contig * max_seq
        results = {}
        for kind in ("contig", "paged"):
            if kind == "contig":
                eng = ContinuousEngine(
                    L, params, cfg, qcfg, max_batch=slots_contig,
                    max_seq=max_seq, kv_dtype=jnp.bfloat16,
                    compute_dtype=jnp.bfloat16)
            else:
                eng = PagedEngine(
                    L, params, cfg, qcfg, max_batch=4 * slots_contig,
                    max_seq=max_seq, kv_dtype=jnp.bfloat16,
                    compute_dtype=jnp.bfloat16, block_size=block,
                    num_pages=budget_tokens // block + 1)
            reqs = [eng.submit(i, p, max_new_tokens=max_new)
                    for i, p in enumerate(prompts)]
            # warm compile outside the timed region: admit + one tick
            eng.step()
            t0 = time.perf_counter()
            eng.run()
            total = sum(min(len(r.output), max_new) for r in reqs)
            results[kind] = total / (time.perf_counter() - t0)
            del eng
        print(json.dumps({
            "metric": (f"paged_serving_tok_per_s_{preset}"
                       f"_req{n_req}_new{max_new}"),
            "value": round(results["paged"], 1), "unit": "tok/s",
            "vs_baseline": round(results["paged"] / results["contig"], 3),
            "contiguous_tok_per_s": round(results["contig"], 1),
        }))
        return
    if os.environ.get("ASQ_BENCH_MODE") == "specadapt":
        # adaptive-gamma safety under SATURATED load (r3 verdict item 8):
        # all slots busy with NON-repetitive prompts (prompt-lookup
        # acceptance collapses), speculation left ON with adaptive resizing.
        # Done-bar: within ~5% of plain throughput on the same workload.
        import jax.numpy as jnp

        from autosmoothquant_tpu.models import llama as L
        from autosmoothquant_tpu.quant.config import QuantConfig
        from autosmoothquant_tpu.serve.batching import ContinuousEngine

        preset = os.environ.get("ASQ_BENCH_PRESET", "tinyllama")
        slots = int(os.environ.get("ASQ_BENCH_BATCH", "8"))
        n_req = int(os.environ.get("ASQ_BENCH_NREQ", "24"))
        max_new = int(os.environ.get("ASQ_BENCH_NEW", "64"))
        gamma = int(os.environ.get("ASQ_BENCH_GAMMA", "8"))
        cfg = get_cfg(preset)
        use_draft = os.environ.get("ASQ_BENCH_DRAFT") == "1"
        if use_draft:
            # draft-MODEL continuous serving under saturation: damped-tail
            # target + layer-prefix draft (the specdraft pairing), bf16
            import dataclasses as _dc

            import jax

            from autosmoothquant_tpu.serve.engine import DraftModel

            k = int(os.environ.get("ASQ_BENCH_DRAFT_LAYERS", "4"))
            eps = float(os.environ.get("ASQ_BENCH_TAIL_EPS", "0.02"))
            qcfg = None
            params = build_params(cfg, "bf16")
            lay = params["layers"]
            for grp, name in (("attn", "o"), ("mlp", "down")):
                w = lay[grp][name]["w"]
                lay[grp][name]["w"] = w.at[k:].multiply(eps)
            dcfg = _dc.replace(cfg, num_hidden_layers=k)
            dparams = {**params,
                       "layers": jax.tree.map(lambda a: a[:k], lay)}
        else:
            qcfg = QuantConfig(type="int8")
            params = build_params(cfg, "int8")
        rng = np.random.default_rng(0)
        prompts = [rng.integers(1, cfg.vocab_size, size=128).tolist()
                   for _ in range(n_req)]
        res = {}
        for mode in ("plain", "adaptive", "fixed"):
            kw = {} if mode == "plain" else dict(
                speculative_gamma=gamma,
                speculative_adaptive=(mode == "adaptive"))
            if use_draft and mode != "plain":
                kw["draft"] = DraftModel(model=L, params=dparams, cfg=dcfg)
            eng = ContinuousEngine(L, params, cfg, qcfg, max_batch=slots,
                                   max_seq=512, kv_dtype=jnp.bfloat16,
                                   compute_dtype=jnp.bfloat16,
                                   fuse_projections=False if use_draft
                                   else None, **kw)
            eng.submit("warm", prompts[0][:32], max_new_tokens=2)
            eng.run()
            reqs = [eng.submit(i, p, max_new_tokens=max_new)
                    for i, p in enumerate(prompts)]
            t0 = time.perf_counter()
            eng.run()
            dt = time.perf_counter() - t0
            res[mode] = sum(len(r.output) for r in reqs) / dt
            if mode == "adaptive":
                res["acc_ema"] = round(eng._spec_acc_ema, 3)
            del eng
        print(json.dumps({
            "metric": (f"specadapt_saturated_tok_per_s_{preset}_g{gamma}"
                       + ("_draft" if use_draft else "")),
            "value": round(res["adaptive"], 1), "unit": "tok/s",
            "vs_baseline": round(res["adaptive"] / res["plain"], 4),
            "plain_tok_per_s": round(res["plain"], 1),
            "fixed_gamma_tok_per_s": round(res["fixed"], 1),
            "acceptance_ema": res["acc_ema"],
        }))
        return
    if os.environ.get("ASQ_BENCH_MODE") == "pageddecode":
        # per-step decode A/B of the PAGED KV layout vs the contiguous
        # scan-carried cache at the north-star serving shape (VERDICT r3
        # item 1: the contiguous layout pays an unfused per-layer
        # dynamic_slice copy; the paged layout gathers mapped pages).
        # Also reports the int8-vs-bf16 ratio THROUGH the paged layout.
        import gc

        import jax.numpy as jnp

        from autosmoothquant_tpu.models import llama as L
        from autosmoothquant_tpu.quant.config import QuantConfig

        preset = os.environ.get("ASQ_BENCH_PRESET", "tinyllama")
        batch = int(os.environ.get("ASQ_BENCH_BATCH", "8"))
        s_max = int(os.environ.get("ASQ_BENCH_SMAX", "2048"))
        prompt_len = int(os.environ.get("ASQ_BENCH_PROMPT", "1024"))
        block = int(os.environ.get("ASQ_BENCH_BLOCK", "64"))
        cfg = get_cfg(preset)
        qcfg = QuantConfig(type="int8")
        params = build_params(cfg, "int8")
        paged_i8 = paged_decode_tps(L, cfg, qcfg, params, batch=batch,
                                    prompt_len=prompt_len, s_max=s_max,
                                    block=block)
        contig_i8 = decode_tps(L, cfg, qcfg, params, batch=batch,
                               prompt_len=prompt_len, s_max=s_max)
        del params
        gc.collect()
        params = build_params(cfg, "bf16")
        paged_bf = paged_decode_tps(L, cfg, None, params, batch=batch,
                                    prompt_len=prompt_len, s_max=s_max,
                                    block=block)
        contig_bf = decode_tps(L, cfg, None, params, batch=batch,
                               prompt_len=prompt_len, s_max=s_max)
        print(json.dumps({
            "metric": (f"paged_decode_tok_per_s_{preset}_b{batch}"
                       f"_s{s_max}_blk{block}"),
            "value": round(paged_i8, 2), "unit": "tok/s",
            "vs_baseline": round(paged_i8 / paged_bf, 4),
            "paged_bf16_tok_per_s": round(paged_bf, 2),
            "contig_int8_tok_per_s": round(contig_i8, 2),
            "contig_bf16_tok_per_s": round(contig_bf, 2),
            "paged_vs_contig_int8": round(paged_i8 / contig_i8, 4),
        }))
        return
    if os.environ.get("ASQ_BENCH_MODE") == "autoprefix":
        from autosmoothquant_tpu.models import llama as L
        from autosmoothquant_tpu.quant.config import QuantConfig

        preset = os.environ.get("ASQ_BENCH_PRESET", "tinyllama")
        cfg = get_cfg(preset)
        qcfg = QuantConfig(type="int8")
        params = build_params(cfg, "int8")
        auto, cold, pre_auto, pre_cold = autoprefix_tps(L, cfg, qcfg,
                                                        params)
        print(json.dumps({
            "metric": f"autoprefix_serving_tok_per_s_{preset}",
            "value": round(auto, 2), "unit": "tok/s",
            "vs_baseline": round(auto / cold, 4),
            "cold_tok_per_s": round(cold, 2),
            "prefill_tokens_auto": pre_auto,
            "prefill_tokens_cold": pre_cold,
        }))
        return
    if os.environ.get("ASQ_BENCH_MODE") == "churn":
        from autosmoothquant_tpu.models import llama as L
        from autosmoothquant_tpu.quant.config import QuantConfig

        preset = os.environ.get("ASQ_BENCH_PRESET", "tinyllama")
        cfg = get_cfg(preset)
        qcfg = QuantConfig(type="int8")
        params = build_params(cfg, "int8")
        churn, static = churn_tps(L, cfg, qcfg, params)
        print(json.dumps({
            "metric": f"churn_tok_per_s_w8a8_int8_{preset}",
            "value": round(churn, 2), "unit": "tok/s",
            "vs_baseline": round(churn / static, 4),
            "static_batch_tok_per_s": round(static, 2),
        }))
        return
    preset = os.environ.get("ASQ_BENCH_PRESET", "tinyllama")
    batch = int(os.environ.get("ASQ_BENCH_BATCH", "1"))
    prompt_len = int(os.environ.get("ASQ_BENCH_PROMPT", "128"))
    s_max = int(os.environ.get("ASQ_BENCH_SMAX", "512"))

    import jax.numpy as jnp

    from autosmoothquant_tpu.models import llama as L
    from autosmoothquant_tpu.quant.config import QuantConfig

    cfg = get_cfg(preset)
    qcfg = QuantConfig(type="int8")
    qparams = build_params(cfg, "int8")
    tps_int8 = decode_tps(L, cfg, qcfg, qparams, batch=batch,
                          prompt_len=prompt_len, s_max=s_max)
    if os.environ.get("ASQ_BENCH_ONLY") == "int8":
        # 13B-shape runs: the bf16 twin (26 GB) cannot fit one chip, so
        # report int8 alone; vs_baseline carries the int8/bf16 WEIGHT-byte
        # ratio bound instead of a measured twin
        print(json.dumps({
            "metric": f"decode_tok_per_s_w8a8_int8_{preset}_b{batch}",
            "value": round(tps_int8, 2), "unit": "tok/s",
            "vs_baseline": 0.0, "note": "int8-only (bf16 twin exceeds HBM)",
        }))
        return
    del qparams  # free HBM before materializing the bf16 baseline
    params = build_params(cfg, "bf16")
    # baseline is pure bf16 (weights AND cache) whatever ASQ_BENCH_KV says
    tps_bf16 = decode_tps(L, cfg, None, params, batch=batch,
                          prompt_len=prompt_len, s_max=s_max,
                          kv_dtype=jnp.bfloat16)
    result = {
        "metric": f"decode_tok_per_s_w8a8_int8_{preset}_b{batch}",
        "value": round(tps_int8, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps_int8 / tps_bf16, 4),
        "bf16_tok_per_s": round(tps_bf16, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
