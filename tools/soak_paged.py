"""Serving soak: 200 requests with mixed prefixes through PagedEngine with
a small page pool (eviction pressure), adaptive gamma ON, mixed greedy +
sampled traffic — asserts completion, page-accounting invariants, and
prefix-cache bounds after sustained churn."""
import time
import numpy as np, jax, jax.numpy as jnp
from autosmoothquant_tpu.models import llama as L
from autosmoothquant_tpu.quant.config import QuantConfig
from autosmoothquant_tpu.serve.paged import PagedEngine

cfg = L.LlamaConfig(vocab_size=2048, hidden_size=256, intermediate_size=512,
                    num_hidden_layers=2, num_attention_heads=8,
                    num_key_value_heads=4, max_position_embeddings=1024)
params = L.init_params(cfg, jax.random.PRNGKey(0))
eng = PagedEngine(L, params, cfg, None, max_batch=8, max_seq=512,
                  kv_dtype=jnp.int8, compute_dtype=jnp.bfloat16,
                  block_size=32, num_pages=8 * 8 + 1,   # tight pool
                  speculative_gamma=4, speculative_adaptive=True,
                  max_prefixes=4, prefill_chunk=128)
rng = np.random.default_rng(0)
sys_prompts = {f"sys{i}": rng.integers(1, 2048, size=48).tolist()
               for i in range(6)}  # 6 prefixes > max_prefixes=4 -> LRU churn
t0 = time.perf_counter()
done = 0
for wave in range(10):
    reqs = []
    for j in range(20):
        uid = f"{wave}-{j}"
        if j % 3 == 0:
            pid = f"sys{(wave + j) % 6}"
            try:
                eng.register_prefix(pid, sys_prompts[pid])
            except Exception as e:
                print("register fail:", e); raise
            prompt = sys_prompts[pid] + rng.integers(1, 2048, size=8).tolist()
            reqs.append(eng.submit(uid, prompt, max_new_tokens=16,
                                   prefix=pid))
        elif j % 3 == 1:
            reqs.append(eng.submit(uid, rng.integers(1, 2048, size=int(
                rng.integers(4, 200))).tolist(), max_new_tokens=24,
                temperature=0.8, top_k=40))
        else:
            # shared system prompt, but NO register_prefix / prefix= — the
            # automatic block radix tree must pick these up by itself
            pid = f"sys{j % 6}"
            reqs.append(eng.submit(
                uid, sys_prompts[pid] + rng.integers(1, 2048, size=6
                ).tolist(), max_new_tokens=16))
    eng.run()
    for r in reqs:
        assert r.done and len(r.output) > 0, r.uid
        done += 1
    assert len(eng._prefixes) <= eng.max_prefixes
dt = time.perf_counter() - t0
# all request rows released -> page accounting returns to steady state:
# every still-held page is pinned by the prefix registry or the auto tree
held = sum(len(p) for p in eng._row_pages)
pinned = int((eng._ref[1:] > 0).sum())
hit_rate = eng.auto_hit_tokens / max(eng.auto_hit_tokens
                                     + eng.prefill_tokens_processed, 1)
print(f"soak OK: {done} requests in {dt:.1f}s "
      f"({done/dt:.1f} req/s), free_pages={eng.free_pages}, "
      f"rows_hold={held}, pinned_pages={pinned}, "
      f"prefixes={len(eng._prefixes)}, auto_blocks={eng._auto_pages}, "
      f"auto_hits={eng.auto_hits}, auto_hit_tokens={eng.auto_hit_tokens}, "
      f"prefill_skip_frac={hit_rate:.3f}, "
      f"spec_ema={eng._spec_acc_ema:.3f}")
assert held == 0
assert eng.free_pages + pinned == eng.num_pages - 1
# prefix-less shared-prompt traffic DID share pages through the tree
assert eng.auto_hits > 0 and eng.auto_hit_tokens > 0
