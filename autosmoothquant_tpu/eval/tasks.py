"""Task loading for the native harness: JSONL files -> task objects.

The reference consumes tasks through the vendored lm-eval registry
(ref: benchmarks/evaluator.py:233-335 task building); in this air-gapped
environment tasks load from local JSONL, with the doc schema selecting the
task type:

  multiple-choice: {"query": str, "choices": [str, ...], "gold": int}
  generate-until:  {"input": str, "target": str}
  rolling ppl:     {"text": str}

Few-shot contexts follow the lm-eval convention: k exemplar docs (drawn
from the FRONT of the file, excluded from scoring) rendered as
"<query><gold choice>\n\n" and prepended to every scored query.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from .harness import GenerateUntilTask, MultipleChoiceTask, RollingPPLTask


def _read_jsonl(path: str):
    with open(path, "r", encoding="utf-8") as f:
        return [json.loads(line) for line in f if line.strip()]


def _fewshot_prefix(docs, k: int) -> str:
    parts = []
    for d in docs[:k]:
        if "choices" in d:
            parts.append(f"{d['query']}{d['choices'][d['gold']]}")
        elif "target" in d:
            parts.append(f"{d['input']}{d['target']}")
    return "\n\n".join(parts) + ("\n\n" if parts else "")


def load_task(path: str, tokenizer, *, num_fewshot: int = 0,
              name: Optional[str] = None, limit: Optional[int] = None,
              max_new_tokens: int = 32):
    """Build a harness task from a JSONL file (schema selects the type)."""
    docs = _read_jsonl(path)
    if not docs:
        raise ValueError(f"{path}: empty task file")
    task_name = name or os.path.splitext(os.path.basename(path))[0]

    def enc(s):
        # continuations are spliced mid-sequence: special tokens (BOS) must
        # not be inserted (the lm_eval_adapter._enc convention); tokenizers
        # without the kwarg (tests' word-level stub) take the plain call
        try:
            return list(tokenizer(s, add_special_tokens=False).input_ids)
        except TypeError:
            return list(tokenizer(s).input_ids)

    if "text" in docs[0]:
        scored = docs if limit is None else docs[:limit]
        return RollingPPLTask(name=task_name,
                              docs=[enc(d["text"]) for d in scored])

    prefix = _fewshot_prefix(docs, num_fewshot)
    scored = docs[num_fewshot:]
    if limit is not None:
        scored = scored[:limit]
    if not scored:
        raise ValueError(f"{path}: no docs left to score after "
                         f"{num_fewshot} few-shot exemplars")

    if "choices" in docs[0]:
        mc = []
        for d in scored:
            ctx = enc(prefix + d["query"])
            mc.append((ctx, [enc(c) for c in d["choices"]], int(d["gold"])))
        return MultipleChoiceTask(name=task_name, docs=mc)

    if "target" in docs[0]:
        gen = [(enc(prefix + d["input"]), enc(d["target"])) for d in scored]
        return GenerateUntilTask(name=task_name, docs=gen,
                                 max_new_tokens=max_new_tokens)

    raise ValueError(
        f"{path}: docs need 'choices'+'gold', 'target', or 'text' keys")
