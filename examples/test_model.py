"""Generate from a quantized model (the reference's smoke test,
ref: examples/test_model.py:10-53).

Usage:
  python examples/test_model.py --quantized-model-path /out/llama-...-int8 \
      --tokenizer-path /ckpts/llama-2-7b --prompt "Life is beautiful"
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
                   help="required unless --prompt-ids is given")
    p.add_argument("--prompt", default="Life is beautiful")
    p.add_argument("--prompt-ids", default=None,
                   help="comma-separated token ids; skips the tokenizer "
                        "(e.g. when generating from a reference-produced "
                        "checkpoint directory without one)")
    p.add_argument("--max-new-tokens", type=int, default=20)
    p.add_argument("--temperature", type=float, default=0.0,
                   help="0 = greedy; >0 samples (with --top-k/--top-p)")
    p.add_argument("--top-k", type=int, default=0, help="0 = off")
    p.add_argument("--top-p", type=float, default=1.0, help="1 = off")
    p.add_argument("--repetition-penalty", type=float, default=1.0,
                   help="1 = off (HF convention)")
    p.add_argument("--seed", type=int, default=0, help="sampling PRNG seed")
    p.add_argument("--speculative-gamma", type=int, default=0,
                   help="prompt-lookup speculative decoding draft length "
                        "(greedy only; 0 = off)")
    p.add_argument("--speculative-ngram", type=int, default=3)
    p.add_argument("--max-seq", type=int, default=2048)
    p.add_argument("--kv-dtype", default="bf16", choices=["bf16", "int8"],
                   help="int8 selects the quantized KV cache (2x context "
                        "per HBM byte)")
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel degree (0 = all devices when >1 "
                        "device is visible, 1 = single device)")
    return p.parse_args()


def main():
    from autosmoothquant_tpu.convert.pipeline import load_any_quantized
    from autosmoothquant_tpu.models.registry import get_model_family
    from autosmoothquant_tpu.serve.engine import Engine, GenerationConfig

    args = parse_args()
    params, qcfg, config = load_any_quantized(args.quantized_model_path)
    model_mod, family = get_model_family(config)
    cfg = model_mod.config_from_hf(config)

    if args.prompt_ids:
        tok = None
        ids = [int(t) for t in args.prompt_ids.split(",")]
    else:
        assert args.tokenizer_path, "--tokenizer-path or --prompt-ids needed"
        from autosmoothquant_tpu.utils.tokenizer import load_tokenizer

        tok = load_tokenizer(args.tokenizer_path)
        ids = tok(args.prompt).input_ids

    import jax
    import jax.numpy as jnp

    kv_dtype = jnp.int8 if args.kv_dtype == "int8" else jnp.bfloat16
    mesh = None
    n_dev = len(jax.devices())
    tp = args.tp if args.tp else (n_dev if n_dev > 1 else 1)
    if tp > 1:
        from autosmoothquant_tpu.shard import make_mesh

        mesh = make_mesh(data=1, model=tp, devices=jax.devices()[:tp])
    eng = Engine(model_mod, params, cfg, qcfg, max_batch=1,
                 max_seq=args.max_seq, kv_dtype=kv_dtype, mesh=mesh)
    out = eng.generate(
        [ids],
        GenerationConfig(max_new_tokens=args.max_new_tokens,
                         temperature=args.temperature, top_k=args.top_k,
                         top_p=args.top_p,
                         repetition_penalty=args.repetition_penalty,
                         eos_token_id=(tok.eos_token_id
                                       if tok is not None else None),
                         speculative_gamma=args.speculative_gamma,
                         speculative_ngram=args.speculative_ngram),
        seed=args.seed,
    )[0]
    if tok is not None:
        print(tok.decode(ids + out))
    else:
        print(" ".join(str(t) for t in out))


if __name__ == "__main__":
    main()
