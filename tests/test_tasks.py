"""JSONL task loading (eval/tasks.py) + CLI --task-files end-to-end."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

VOCAB = 128


class _WordTok:
    """Word-level tokenizer over integer 'words' (the test_cli trick)."""

    def __call__(self, text):
        class R:
            input_ids = [int(w) % VOCAB for w in text.split()]
        return R()


def _write(tmp_path, name, rows):
    p = tmp_path / name
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(p)


def test_schema_detection_and_fewshot(tmp_path):
    from autosmoothquant_tpu.eval.harness import (GenerateUntilTask,
                                                  MultipleChoiceTask,
                                                  RollingPPLTask)
    from autosmoothquant_tpu.eval.tasks import load_task

    tok = _WordTok()
    mc_path = _write(tmp_path, "mc.jsonl", [
        {"query": "1 2 ", "choices": ["3", "4"], "gold": 0},
        {"query": "5 6 ", "choices": ["7", "8"], "gold": 1},
        {"query": "9 10 ", "choices": ["11", "12"], "gold": 0},
    ])
    t = load_task(mc_path, tok)
    assert isinstance(t, MultipleChoiceTask) and len(t.docs) == 3
    # few-shot: first doc becomes the exemplar prefix of every scored query
    t1 = load_task(mc_path, tok, num_fewshot=1)
    assert len(t1.docs) == 2
    ctx0 = t1.docs[0][0]
    assert ctx0[:3] == [1, 2, 3]  # exemplar query + gold choice

    gen_path = _write(tmp_path, "gen.jsonl",
                      [{"input": "1 2 ", "target": "3 4"}])
    assert isinstance(load_task(gen_path, tok), GenerateUntilTask)

    ppl_path = _write(tmp_path, "ppl.jsonl", [{"text": "1 2 3 4 5 6 7 8"}])
    assert isinstance(load_task(ppl_path, tok), RollingPPLTask)

    with pytest.raises(ValueError, match="keys"):
        load_task(_write(tmp_path, "bad.jsonl", [{"foo": 1}]), tok)


def test_evaluate_over_loaded_tasks(tmp_path):
    from autosmoothquant_tpu.eval.harness import evaluate, make_table
    from autosmoothquant_tpu.eval.lm_adapter import JaxLM
    from autosmoothquant_tpu.eval.tasks import load_task
    from autosmoothquant_tpu.models import llama as L

    cfg = L.LlamaConfig(vocab_size=VOCAB, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        max_position_embeddings=128)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    lm = JaxLM(L, params, cfg, None, batch_size=4, max_length=64,
               compute_dtype=jnp.float32)
    tok = _WordTok()
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(6):
        q = " ".join(str(x) for x in rng.integers(1, VOCAB, size=5))
        rows.append({"query": q + " ", "choices": ["7 8", "9"], "gold": 0})
    mc = load_task(_write(tmp_path, "mc.jsonl", rows), tok)
    ppl = load_task(_write(tmp_path, "ppl.jsonl", [
        {"text": " ".join(str(x) for x in rng.integers(1, VOCAB, size=80))}
    ]), tok)
    res = evaluate(lm, [mc, ppl])
    assert 0.0 <= res["mc"]["acc"] <= 1.0
    assert res["ppl"]["word_perplexity" if "word_perplexity" in res["ppl"]
                      else list(res["ppl"])[0]] > 0
    assert "mc" in make_table(res)


def test_enc_strips_special_tokens(tmp_path):
    """Real tokenizers insert BOS; mid-sequence continuations must not."""
    from autosmoothquant_tpu.eval.harness import MultipleChoiceTask
    from autosmoothquant_tpu.eval.tasks import load_task

    class BosTok:
        def __call__(self, text, add_special_tokens=True):
            class R:
                input_ids = ([999] if add_special_tokens else []) + [
                    int(w) % VOCAB for w in text.split()]
            return R()

    p = _write(tmp_path, "mc.jsonl",
               [{"query": "1 2 ", "choices": ["3", "4"], "gold": 0}])
    t = load_task(p, BosTok())
    ctx, choices, _ = t.docs[0]
    assert 999 not in ctx and all(999 not in c for c in choices)


def test_rolling_limit_applies(tmp_path):
    from autosmoothquant_tpu.eval.tasks import load_task

    rows = [{"text": f"{i} {i} {i}"} for i in range(1, 9)]
    t = load_task(_write(tmp_path, "ppl.jsonl", rows), _WordTok(), limit=3)
    assert len(t.docs) == 3


def test_qwen2_ignores_unused_sliding_window():
    from autosmoothquant_tpu.models import llama as L

    cfg = L.LlamaConfig.from_hf({"vocab_size": 8, "hidden_size": 8,
                                 "intermediate_size": 8,
                                 "num_hidden_layers": 1,
                                 "num_attention_heads": 1,
                                 "model_type": "qwen2",
                                 "sliding_window": 32768,
                                 "use_sliding_window": False})
    assert cfg.sliding_window == 0
    mistral = L.LlamaConfig.from_hf({"vocab_size": 8, "hidden_size": 8,
                                     "intermediate_size": 8,
                                     "num_hidden_layers": 1,
                                     "num_attention_heads": 1,
                                     "model_type": "mistral",
                                     "sliding_window": 4096})
    assert mistral.sliding_window == 4096
