"""On-chip Qwen2 end-to-end drive: synthesize a Qwen2 HF checkpoint,
run the quantize CLI (calibrate -> smooth -> quantize -> save), then the
generate CLI against the saved artifact — all on the real TPU.
Validation-queue item 6 (ROADMAP.md)."""

import json
import subprocess
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

import numpy as np
import torch
from tokenizers import Tokenizer, models, pre_tokenizers
from transformers import (PreTrainedTokenizerFast, Qwen2Config,
                          Qwen2ForCausalLM)

VOCAB = 256
d = Path(tempfile.mkdtemp(prefix="qwen2_ckpt_"))
torch.manual_seed(0)
hf = Qwen2ForCausalLM(Qwen2Config(
    vocab_size=VOCAB, hidden_size=256, intermediate_size=512,
    num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
    max_position_embeddings=256, tie_word_embeddings=False,
    attn_implementation="eager")).eval().float()
hf.save_pretrained(d, safe_serialization=True)
tok = Tokenizer(models.WordLevel({str(i): i for i in range(VOCAB)},
                                 unk_token="0"))
tok.pre_tokenizer = pre_tokenizers.Whitespace()
PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="0").save_pretrained(d)
rng = np.random.default_rng(0)
with open(d / "val.jsonl", "w") as f:
    for _ in range(16):
        words = " ".join(str(x) for x in rng.integers(1, VOCAB, size=96))
        f.write(json.dumps({"text": words}) + "\n")

out = d / "quant"
r = subprocess.run(
    [sys.executable, str(ROOT / "examples" / "smoothquant_model.py"),
     "--model-path", str(d), "--dataset-path", str(d / "val.jsonl"),
     "--generate-scale", "--quantize-model",
     "--scale-output", str(d / "act_scales.pkl"),
     "--scale-input", str(d / "act_scales.pkl"),
     "--num-samples", "8", "--seq-len", "32",
     "--model-output", str(out)], capture_output=True, text=True)
print(r.stdout[-600:])
assert r.returncode == 0, r.stderr[-2000:]
sub = next(out.glob("*smoothquant*"))
prompt = " ".join(str(x) for x in rng.integers(1, VOCAB, size=12))
r = subprocess.run(
    [sys.executable, str(ROOT / "examples" / "test_model.py"),
     "--quantized-model-path", str(sub), "--tokenizer-path", str(d),
     "--prompt", prompt, "--max-new-tokens", "16", "--max-seq", "128"],
    capture_output=True, text=True)
print(r.stdout[-600:])
assert r.returncode == 0, r.stderr[-2000:]
print("QWEN2 E2E OK:", sub)
