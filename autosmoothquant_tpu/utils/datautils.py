"""Calibration / evaluation dataset loaders.

The analog of the reference's loaders (ref: utils/datautils.py:14-208:
wikitext2/ptb/c4/pile/mix with tokenize-join-then-random-window sampling and
fixed seeds). Loading goes through `datasets` when a local cache or network
is available; everything degrades to explicit token streams so the framework
works in air-gapped environments (pass your own tokens).
"""

from __future__ import annotations

import random
from typing import Optional, Tuple

import numpy as np


def random_windows(tokens: np.ndarray, nsamples: int, seqlen: int,
                   seed: int) -> np.ndarray:
    """Random fixed-length windows from a token stream — the reference's
    sampling pattern (datautils.py get_wikitext2: random.randint window per
    sample with a fixed seed)."""
    rng = random.Random(seed)
    tokens = np.asarray(tokens).reshape(-1)
    out = np.empty((nsamples, seqlen), np.int32)
    for i in range(nsamples):
        s = rng.randint(0, tokens.size - seqlen - 1)
        out[i] = tokens[s:s + seqlen]
    return out


def load_wikitext2(tokenizer, split: str = "test") -> np.ndarray:
    """Join-then-tokenize, matching the reference ("\\n\\n".join for test,
    datautils.py:37-55). Requires the HF datasets cache or network."""
    from datasets import load_dataset

    data = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
    text = "\n\n".join(data["text"])
    return np.asarray(tokenizer(text).input_ids, np.int32)


def load_ptb(tokenizer, split: str = "test") -> np.ndarray:
    from datasets import load_dataset

    data = load_dataset("ptb_text_only", "penn_treebank", split=split)
    text = " ".join(data["sentence"])
    return np.asarray(tokenizer(text).input_ids, np.int32)


def load_json_text(path: str, tokenizer, text_key: str = "text") -> np.ndarray:
    """Token stream from a local JSON-lines dataset — the reference's
    calibration input format (calibration.py:75-76 load_dataset('json'))."""
    from datasets import load_dataset

    data = load_dataset("json", data_files=path, split="train")
    text = "\n\n".join(d[text_key] for d in data)
    return np.asarray(tokenizer(text).input_ids, np.int32)


def get_loaders(name: str, tokenizer, nsamples: int = 128, seed: int = 0,
                seqlen: int = 2048) -> Tuple[np.ndarray, np.ndarray]:
    """(train_windows [nsamples, seqlen], test_stream [N]) — mirrors the
    reference get_loaders contract (datautils.py:183-208)."""
    if name == "wikitext2":
        train = load_wikitext2(tokenizer, "train")
        test = load_wikitext2(tokenizer, "test")
    elif name == "ptb":
        train = load_ptb(tokenizer, "train")
        test = load_ptb(tokenizer, "test")
    else:
        raise ValueError(f"unknown dataset {name!r} (use explicit tokens for "
                         "air-gapped runs)")
    return random_windows(train, nsamples, seqlen, seed), test


def synthetic_stream(vocab_size: int, length: int, seed: int = 0) -> np.ndarray:
    """Deterministic synthetic token stream with mild structure (repeated
    n-grams) for offline tests and benchmarks."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, vocab_size, size=max(length // 4, 16))
    out = np.empty(length, np.int64)
    i = 0
    while i < length:
        s = rng.integers(0, base.size - 8)
        ln = int(rng.integers(4, 9))
        ln = min(ln, length - i)
        out[i:i + ln] = base[s:s + ln]
        i += ln
    return out.astype(np.int32)
