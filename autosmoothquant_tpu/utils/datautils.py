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


def sample_doc_windows(docs, tokenizer, nsamples: int, seqlen: int,
                       seed: int) -> np.ndarray:
    """Per-DOCUMENT window sampling (the reference's c4 recipe,
    datautils.py:82-110): pick a random doc, re-draw until it tokenizes to
    >= seqlen, then take one random window from it. Unlike join-then-sample,
    windows never straddle document boundaries."""
    rng = random.Random(seed)
    docs = list(docs)
    out = np.empty((nsamples, seqlen), np.int32)
    for n in range(nsamples):
        for _ in range(10_000):
            i = rng.randint(0, len(docs) - 1)
            ids = np.asarray(tokenizer(docs[i]).input_ids, np.int32)
            if ids.size >= seqlen + 1:
                break
        else:
            raise ValueError(f"no document tokenizes to >= {seqlen + 1} tokens")
        s = rng.randint(0, ids.size - seqlen - 1)
        out[n] = ids[s:s + seqlen]
    return out


def load_c4(tokenizer, nsamples: int, seqlen: int, seed: int):
    """allenai/c4 first train/val shards (ref: datautils.py:81-123 get_c4).
    Returns (train_windows, val_stream). Requires datasets cache/network."""
    from datasets import load_dataset

    train = load_dataset(
        "allenai/c4", data_files={"train": "en/c4-train.00000-of-01024.json.gz"},
        split="train")
    val = load_dataset(
        "allenai/c4",
        data_files={"validation": "en/c4-validation.00000-of-00008.json.gz"},
        split="validation")
    windows = sample_doc_windows(train["text"], tokenizer, nsamples, seqlen, seed)
    # val: join leading docs, cap at 256*seqlen (ref get_c4_new:178-180)
    val_ids = np.asarray(
        tokenizer(" ".join(val["text"][:1100])).input_ids, np.int32)
    return windows, val_ids[: 256 * seqlen]


def load_pile(tokenizer, path: str, max_docs: int = 1000) -> np.ndarray:
    """Token stream from a local pile val jsonl(.zst) dump — the reference
    hardcodes a cluster path (datautils.py:14-24 get_pile); here the caller
    provides it. Joins the first ``max_docs`` docs like the reference."""
    from datasets import load_dataset

    data = load_dataset("json", data_files=path, split="train")
    text = "\n\n".join(data["text"][:max_docs])
    return np.asarray(tokenizer(text).input_ids, np.int32)


def get_loaders(name: str, tokenizer, nsamples: int = 128, seed: int = 0,
                seqlen: int = 2048, pile_path: Optional[str] = None
                ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """(train_windows [nsamples, seqlen], test_stream [N] or None) — mirrors
    the reference get_loaders contract incl. substring dispatch and the
    "new" variants (ref: datautils.py:183-208)."""
    if "wikitext2" in name:
        train = load_wikitext2(tokenizer, "train")
        test = load_wikitext2(tokenizer, "test")
        return random_windows(train, nsamples, seqlen, seed), test
    if "pile" in name:
        if pile_path is None:
            raise ValueError("pile needs pile_path=<local val.jsonl(.zst)>")
        stream = load_pile(tokenizer, pile_path)
        return random_windows(stream, nsamples, seqlen, seed), None
    if "ptb" in name:
        # "ptb_new" splits test with " " join; plain ptb uses validation in
        # the reference — both reduce to the same stream sampling here
        split = "test" if "new" in name else "validation"
        train = load_ptb(tokenizer, "train")
        test = load_ptb(tokenizer, split)
        return random_windows(train, nsamples, seqlen, seed), test
    if "c4" in name:
        return load_c4(tokenizer, nsamples, seqlen, seed)
    if "mix" in name:
        # nsamples//3 each of wikitext2/ptb/c4, no val (ref: datautils.py:202-208)
        k = nsamples // 3
        wiki, _ = get_loaders("wikitext2", tokenizer, k, seed, seqlen)
        ptb, _ = get_loaders("ptb", tokenizer, k, seed, seqlen)
        c4, _ = get_loaders("c4", tokenizer, k, seed, seqlen)
        return np.concatenate([wiki, ptb, c4], axis=0), None
    raise ValueError(f"unknown dataset {name!r} (use explicit tokens for "
                     "air-gapped runs)")


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
