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


@pytest.fixture
def tok():
    """Reversible word-level tokenizer (growable vocab + decode) for tests
    that inspect decoded contexts."""

    class T:
        def __init__(self):
            self.vocab = {}
            self.rev = {}

        def __call__(self, text):
            ids = []
            for w in text.split():
                if w not in self.vocab:
                    self.vocab[w] = len(self.vocab)
                    self.rev[self.vocab[w]] = w
                ids.append(self.vocab[w])

            class R:
                input_ids = ids

            return R()

        def decode(self, ids):
            return " ".join(self.rev[i] for i in ids) + " "

    return T()


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


def test_random_fewshot_excludes_self_and_is_seeded(tmp_path, tok):
    """fewshot_sample='random': every scored doc gets its own exemplars,
    drawn with a seeded RNG and never containing the doc itself."""
    import json

    from autosmoothquant_tpu.eval.tasks import load_task

    docs = [{"query": f"q{i} ", "choices": [f"a{i}", f"b{i}"], "gold": 0}
            for i in range(6)]
    path = tmp_path / "mc.jsonl"
    path.write_text("\n".join(json.dumps(d) for d in docs))
    t1 = load_task(str(path), tok, num_fewshot=2, fewshot_sample="random",
                   fewshot_seed=5)
    t2 = load_task(str(path), tok, num_fewshot=2, fewshot_sample="random",
                   fewshot_seed=5)
    t3 = load_task(str(path), tok, num_fewshot=2, fewshot_sample="random",
                   fewshot_seed=6)
    assert len(t1.docs) == 6  # random mode scores every doc
    ctxs1 = [tuple(d[0]) for d in t1.docs]
    assert ctxs1 == [tuple(d[0]) for d in t2.docs]  # seeded determinism
    assert ctxs1 != [tuple(d[0]) for d in t3.docs]
    # self-exclusion: doc i's own query appears exactly ONCE in its context
    for i, (ctx, _, _) in enumerate(t1.docs):
        text = tok.decode(list(ctx))
        assert text.count(f"q{i} ") == 1, text


def test_description_prepended(tmp_path, tok):
    import json

    from autosmoothquant_tpu.eval.tasks import load_task

    docs = [{"query": "q ", "choices": ["x", "y"], "gold": 1}]
    path = tmp_path / "mc.jsonl"
    path.write_text("\n".join(json.dumps(d) for d in docs))
    t = load_task(str(path), tok, description="Answer the question.")
    text = tok.decode(list(t.docs[0][0]))
    assert text.startswith("Answer the question.")


def test_simple_evaluate_versions_and_config():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from autosmoothquant_tpu.eval.harness import (
        MultipleChoiceTask, make_table, simple_evaluate)
    from autosmoothquant_tpu.eval.lm_adapter import JaxLM
    from autosmoothquant_tpu.models import llama as L

    cfg = L.LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=1, num_attention_heads=2,
                        num_key_value_heads=2, max_position_embeddings=64)
    lm = JaxLM(L, L.init_params(cfg, jax.random.PRNGKey(0)), cfg,
               batch_size=2, max_length=32)
    rng = np.random.default_rng(0)
    docs = [(rng.integers(1, 64, size=3).tolist(),
             [rng.integers(1, 64, size=2).tolist() for _ in range(2)], 0)
            for _ in range(3)]
    out = simple_evaluate(lm, [MultipleChoiceTask("t", docs)])
    assert set(out) == {"results", "versions", "config"}
    assert out["versions"] == {"t": 0}
    assert out["config"]["model_family"] == "llama"
    assert out["config"]["quantized"] is False
    table = make_table(out)
    assert "version" in table and "| t | 0 |" in table


def test_metric_registry_extension():
    from autosmoothquant_tpu.eval.harness import (
        AGGREGATIONS, HIGHER_IS_BETTER, aggregate_metrics, register_metric)

    register_metric("geom_mean", lambda v: float(
        __import__("numpy").exp(__import__("numpy").mean(
            __import__("numpy").log(v)))), True)
    try:
        out = aggregate_metrics({"geom_mean": [1.0, 4.0]},
                                kinds={"geom_mean": "geom_mean"})
        assert abs(out["geom_mean"] - 2.0) < 1e-9
        assert HIGHER_IS_BETTER["geom_mean"]
    finally:
        AGGREGATIONS.pop("geom_mean", None)
        HIGHER_IS_BETTER.pop("geom_mean", None)
