"""Evaluate perplexity / lm-eval tasks on a quantized (or float) model
(ref: examples/eval_model.py:25-138).

Usage:
  python examples/eval_model.py --model-path /out/llama-...-int8 \
      --tokenizer-path /ckpts/llama-2-7b --eval-ppl --max-length 2048
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True,
                   help="quantized checkpoint dir, or HF dir with --origin-model")
    p.add_argument("--tokenizer-path", required=True)
    p.add_argument("--origin-model", action="store_true",
                   help="evaluate the fp model from an HF checkpoint instead")
    p.add_argument("--eval-ppl", action="store_true")
    p.add_argument("--max-length", type=int, default=2048)
    p.add_argument("--tasks", default="")
    p.add_argument("--task-files", default="",
                   help="comma-separated JSONL task files for the NATIVE "
                        "harness (air-gapped lm-eval analog; schema selects "
                        "multiple-choice / generate / rolling-ppl)")
    p.add_argument("--num-fewshot", type=int, default=0)
    p.add_argument("--fewshot-sample", default="front",
                   choices=("front", "random"),
                   help="front: first-k docs are everyone's exemplars; "
                        "random: per-doc seeded exemplar draws (lm-eval's "
                        "fewshot_context sampling)")
    p.add_argument("--metrics-module", default="",
                   help="python file to import before task building (e.g. "
                        "examples/custom_metrics.py); its register_metric "
                        "calls run, and a transform_tasks(tasks) hook, if "
                        "defined, rewrites the loaded task list")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--batch-windows", type=int, default=1,
                   help="ppl windows evaluated per device dispatch")
    p.add_argument("--stages", type=int, default=0,
                   help="pipeline-parallel stages for ppl (0 = off); layer "
                        "stack runs the microbatched GPipe schedule")
    p.add_argument("--microbatches", type=int, default=4,
                   help="pipeline microbatches per window batch")
    p.add_argument("--tensor-parallel", type=int, default=0,
                   help="TP ways inside each stage (0 = rest of devices)")
    p.add_argument("--dataset", default="wikitext2",
                   help="wikitext2 | ptb | ptb_new | c4 | c4_new | pile | mix")
    p.add_argument("--dataset-path", default=None,
                   help="local jsonl with a 'text' field — evaluates ppl on "
                        "it directly (air-gapped runs)")
    p.add_argument("--pile-path", default=None,
                   help="local pile val jsonl(.zst) for --dataset pile")
    return p.parse_args()


def main():
    from autosmoothquant_tpu.eval.ppl import perplexity_from_tokens
    from autosmoothquant_tpu.models.registry import get_model_family

    args = parse_args()
    if args.origin_model:
        from autosmoothquant_tpu.convert.hf import hf_config_dict, load_hf_params

        config = hf_config_dict(args.model_path)
        model_mod, family = get_model_family(config)
        cfg = model_mod.config_from_hf(config)
        params = load_hf_params(args.model_path, family, cfg.num_hidden_layers)
        qcfg = None
    else:
        from autosmoothquant_tpu.convert.pipeline import load_any_quantized

        params, qcfg, config = load_any_quantized(args.model_path)
        model_mod, family = get_model_family(config)
        cfg = model_mod.config_from_hf(config)

    from autosmoothquant_tpu.utils.tokenizer import load_tokenizer

    tokenizer = load_tokenizer(args.tokenizer_path)
    results = {}

    if args.eval_ppl:
        from autosmoothquant_tpu.utils.datautils import (
            get_loaders, load_ptb, load_wikitext2)

        # wikitext2/ptb: tokenize only the test split; other names go
        # through get_loaders (ptb_new / c4(_new) / pile / mix)
        if args.dataset_path:
            from autosmoothquant_tpu.utils.datautils import load_json_text

            stream = load_json_text(args.dataset_path, tokenizer)
        elif args.dataset == "wikitext2":
            stream = load_wikitext2(tokenizer, "test")
        elif args.dataset == "ptb":
            stream = load_ptb(tokenizer, "test")
        else:
            _, stream = get_loaders(args.dataset, tokenizer, nsamples=1,
                                    seqlen=args.max_length,
                                    pile_path=args.pile_path)
            if stream is None:
                raise ValueError(f"dataset {args.dataset!r} has no eval split")
        mesh = None
        if args.stages > 1:
            from autosmoothquant_tpu.shard import (make_mesh, param_specs,
                                                   shard_params)
            from autosmoothquant_tpu.shard.sharding import with_stage_axis

            mesh = make_mesh(stage=args.stages,
                             model=args.tensor_parallel or None)
            specs = with_stage_axis(param_specs(family, cfg, mesh), mesh,
                                    cfg.num_hidden_layers)
            params = shard_params(params, mesh, specs)
        ppl = perplexity_from_tokens(
            model_mod, params, cfg, stream, max_length=args.max_length,
            qcfg=qcfg, compute_dtype=jnp.bfloat16, progress=True,
            batch_windows=args.batch_windows, mesh=mesh,
            microbatches=args.microbatches)
        results[args.dataset] = {"ppl": ppl}
        print({"results": results})

    if args.task_files:
        from autosmoothquant_tpu.eval.harness import evaluate, make_table
        from autosmoothquant_tpu.eval.lm_adapter import JaxLM
        from autosmoothquant_tpu.eval.tasks import load_task

        lm = JaxLM(model_mod, params, cfg, qcfg,
                   batch_size=args.batch_size, max_length=args.max_length)
        native_tasks = [load_task(p, tokenizer,
                                  num_fewshot=args.num_fewshot,
                                  fewshot_sample=args.fewshot_sample)
                        for p in (x.strip()
                                  for x in args.task_files.split(","))
                        if p]
        if args.metrics_module:
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "asq_custom_metrics", args.metrics_module)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            if hasattr(mod, "transform_tasks"):
                native_tasks = mod.transform_tasks(native_tasks)
        res = evaluate(lm, native_tasks)
        results.update(res)
        print(make_table(res))

    if args.tasks and args.tasks != "wikitext2":
        from autosmoothquant_tpu.eval.lm_eval_adapter import run_lm_eval

        results.update(run_lm_eval(
            model_mod, params, cfg, qcfg, tokenizer,
            tasks=args.tasks.split(","), num_fewshot=args.num_fewshot,
            batch_size=args.batch_size, max_length=args.max_length))
        print(results)


if __name__ == "__main__":
    main()
