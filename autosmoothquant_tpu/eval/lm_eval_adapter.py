"""Bridge to the installed `lm_eval` package (EleutherAI harness), the
analog of the reference's HFLM + simple_evaluate path
(ref: examples/eval_model.py:107-123). Falls back with a clear error when
lm_eval isn't installed (this framework ships its own native harness in
eval/harness.py for that case).

API pin: written against lm-evaluation-harness **v0.4.x** (the line the
reference's eval_model.py targets): `lm_eval.api.model.LM` subclassing
with `loglikelihood / loglikelihood_rolling / generate_until` taking
`lm_eval.api.instance.Instance` lists (`.args` = (context, continuation) /
(context,) / (context, gen_kwargs)), and `lm_eval.simple_evaluate(model=,
tasks=, num_fewshot=)`. This environment has no package index, so the
integration is exercised by tests/test_lm_eval_adapter.py against a stub
that mirrors exactly this v0.4 surface; install `lm-eval>=0.4,<0.5` to
run the real registry tasks."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from .lm_adapter import JaxLM


def run_lm_eval(model_mod, params, cfg, qcfg, tokenizer, *, tasks: Sequence[str],
                num_fewshot: int = 0, batch_size: int = 1,
                max_length: int = 2048) -> Dict:
    try:
        import lm_eval
        from lm_eval.api.model import LM
        from lm_eval.api.instance import Instance
    except ImportError as e:
        raise ImportError(
            "lm_eval is not installed; use the native harness "
            "(autosmoothquant_tpu.eval.harness.evaluate) or install "
            "lm-evaluation-harness") from e

    jlm = JaxLM(model_mod, params, cfg, qcfg, batch_size=batch_size,
                max_length=max_length)

    class _Adapter(LM):
        def __init__(self):
            super().__init__()
            self.tokenizer = tokenizer

        def _enc(self, s: str) -> List[int]:
            return tokenizer(s, add_special_tokens=False).input_ids

        def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
            pairs = []
            for req in requests:
                ctx, cont = req.args
                ctx_toks = self._enc(ctx) if ctx else [tokenizer.bos_token_id or 0]
                cont_toks = self._enc(cont)
                pairs.append((ctx_toks, cont_toks))
            return jlm.loglikelihood(pairs)

        def loglikelihood_rolling(self, requests) -> List[float]:
            streams = [self._enc(req.args[0]) for req in requests]
            return jlm.loglikelihood_rolling(
                streams, prefix_token=tokenizer.bos_token_id or 0)

        def generate_until(self, requests) -> List[str]:
            prompts, stops, maxg = [], [], 128
            for req in requests:
                ctx, gen_kwargs = req.args
                prompts.append(self._enc(ctx))
                until = (gen_kwargs or {}).get("until", [])
                stops.append([self._enc(u) for u in until])
                maxg = (gen_kwargs or {}).get("max_gen_toks", maxg)
            outs = []
            for p, st in zip(prompts, stops):
                toks = jlm.generate_until(
                    [p], max_new_tokens=maxg,
                    eos_token_id=tokenizer.eos_token_id,
                    stop_sequences=st)[0]
                outs.append(tokenizer.decode(toks))
            return outs

    return lm_eval.simple_evaluate(
        model=_Adapter(), tasks=list(tasks), num_fewshot=num_fewshot,
        batch_size=batch_size)
