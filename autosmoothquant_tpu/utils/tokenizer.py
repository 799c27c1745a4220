"""Shared tokenizer loading for the CLIs: HF AutoTokenizer first, falling
back to the in-repo SentencePiece runtime (utils/sp_tokenizer.py) when the
checkpoint ships only a raw ``tokenizer.model`` that AutoTokenizer cannot
load here — Baichuan's case: its tokenizer class requires the compiled
``sentencepiece`` package (ref: thirdparty/baichuan/
tokenization_baichuan.py:23), which this environment does not have."""

from __future__ import annotations

import os


def load_tokenizer(path: str, trust_remote_code: bool = True):
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(
            path, trust_remote_code=trust_remote_code)
    except Exception as e:
        model_file = os.path.join(path, "tokenizer.model")
        if os.path.exists(model_file):
            from .sp_tokenizer import BaichuanTokenizer

            return BaichuanTokenizer(model_file)
        raise RuntimeError(
            f"no loadable tokenizer at {path} (AutoTokenizer failed and no "
            f"tokenizer.model present): {e}") from e
