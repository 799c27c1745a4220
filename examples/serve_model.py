"""Serve a quantized model over HTTP (continuous batching + sampling).

The reference has no serving entry point (its CLIs stop at one-shot
generate/eval, ref: examples/test_model.py); this is the production analog:

  python examples/serve_model.py --quantized-model-path /out/llama-int8 \
      --tokenizer-path /ckpts/llama-2-7b --port 8000 [--tp 4] [--kv-dtype int8]

  curl -s localhost:8000/generate -d '{"prompt": "Hello", "max_new_tokens": 32,
                                       "temperature": 0.7, "top_p": 0.9}'

Also speaks the OpenAI Completions wire shape, so stock clients and load
generators work unmodified:

  curl -s localhost:8000/v1/completions -d '{"prompt": "Hello",
                                             "max_tokens": 32}'
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--quantized-model-path", required=True)
    p.add_argument("--tokenizer-path", default=None,
                   help="optional; enables text prompts and decoded replies")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=8,
                   help="concurrent decode slots")
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--steps-per-sync", type=int, default=8)
    p.add_argument("--prefill-chunk", type=int, default=512,
                   help="chunked-prefill admission size (0 = whole prompt)")
    p.add_argument("--kv-dtype", default="bf16", choices=["bf16", "int8"])
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel degree (0 = all visible devices)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--speculative-gamma", type=int, default=0,
                   help="engine-level prompt-lookup speculative decoding "
                        "draft length (greedy requests only; 0 = off)")
    p.add_argument("--speculative-ngram", type=int, default=3)
    p.add_argument("--no-adaptive-gamma", action="store_true",
                   help="disable acceptance-tracked gamma resizing (fixed "
                        "draft length even when drafts miss)")
    p.add_argument("--paged", action="store_true",
                   help="block-paged KV engine: pooled cache capacity + "
                        "copy-free prefix page sharing + LRU prefix "
                        "eviction (every model family incl. ALiBi/sliding "
                        "window; bf16 or int8 KV pages; TP/EP meshes)")
    p.add_argument("--block-size", type=int, default=64,
                   help="paged engine page size (tokens)")
    p.add_argument("--num-pages", type=int, default=0,
                   help="paged engine total pages (0 = contiguous-equivalent"
                        " capacity); smaller pools oversubscribe slots")
    p.add_argument("--no-auto-prefix", action="store_true",
                   help="disable the paged engine's automatic block-level "
                        "prefix sharing (explicit POST /prefix still works)")
    p.add_argument("--model-id", default=None,
                   help="name reported by /v1/models and completion "
                        "envelopes (default: checkpoint directory name)")
    return p.parse_args()


def build(args):
    """Construct (api, httpd, family) from parsed args — separated from
    main() so tests can drive the CLI wiring without serve_forever()."""
    from autosmoothquant_tpu.convert.pipeline import load_any_quantized
    from autosmoothquant_tpu.models.registry import get_model_family
    from autosmoothquant_tpu.serve import ContinuousEngine, serve

    params, qcfg, config = load_any_quantized(args.quantized_model_path)
    model_mod, family = get_model_family(config)
    cfg = model_mod.config_from_hf(config)

    tokenizer = None
    if args.tokenizer_path:
        from autosmoothquant_tpu.utils.tokenizer import load_tokenizer

        tokenizer = load_tokenizer(args.tokenizer_path)

    import jax
    import jax.numpy as jnp

    mesh = None
    n_dev = len(jax.devices())
    tp = args.tp if args.tp else (n_dev if n_dev > 1 else 1)
    if tp > 1:
        from autosmoothquant_tpu.shard import make_mesh

        mesh = make_mesh(data=1, model=tp, devices=jax.devices()[:tp])
    kw = dict(
        max_batch=args.max_batch, max_seq=args.max_seq,
        kv_dtype=jnp.int8 if args.kv_dtype == "int8" else jnp.bfloat16,
        steps_per_sync=args.steps_per_sync,
        prefill_chunk=args.prefill_chunk or None,
        mesh=mesh, seed=args.seed,
        speculative_gamma=args.speculative_gamma,
        speculative_ngram=args.speculative_ngram,
        speculative_adaptive=not args.no_adaptive_gamma)
    if getattr(args, "paged", False):
        from autosmoothquant_tpu.serve.paged import PagedEngine

        kw.update(block_size=args.block_size,
                  num_pages=args.num_pages or None,
                  auto_prefix=not getattr(args, "no_auto_prefix", False))
        eng = PagedEngine(model_mod, params, cfg, qcfg, **kw)
    else:
        eng = ContinuousEngine(model_mod, params, cfg, qcfg, **kw)
    model_id = (getattr(args, "model_id", None)
                or Path(args.quantized_model_path).name
                or "autosmoothquant-tpu")
    api, httpd = serve(eng, host=args.host, port=args.port,
                       tokenizer=tokenizer, model_id=model_id)
    return api, httpd, family


def main():
    args = parse_args()
    api, httpd, family = build(args)
    print(f"[serve_model] {family} on {httpd.server_address[0]}:"
          f"{httpd.server_address[1]} (slots={args.max_batch}, "
          f"max_seq={args.max_seq})", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        api.stop()


if __name__ == "__main__":
    main()
