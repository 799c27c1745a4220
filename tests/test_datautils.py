"""Dataset loader parity pieces that work air-gapped: per-document window
sampling (c4 recipe), pile local-jsonl loading, mix concatenation, and the
substring dispatch of get_loaders (ref: utils/datautils.py:183-208)."""

import json

import numpy as np
import pytest

from autosmoothquant_tpu.utils.datautils import (
    get_loaders, load_pile, random_windows, sample_doc_windows)


class ToyTokenizer:
    """Splits on spaces, maps word -> hash bucket; deterministic."""

    class _Out:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text):
        ids = [hash(w) % 1000 for w in text.split()]
        return self._Out(ids)


def test_sample_doc_windows_respects_boundaries():
    tok = ToyTokenizer()
    docs = ["short doc", " ".join(f"w{i}" for i in range(64)),
            " ".join(f"v{i}" for i in range(100))]
    out = sample_doc_windows(docs, tok, nsamples=8, seqlen=16, seed=0)
    assert out.shape == (8, 16)
    # every window must be a contiguous slice of ONE long doc's tokens
    streams = [np.asarray(tok(d).input_ids) for d in docs[1:]]
    for row in out:
        found = any(
            np.array_equal(row, s[i:i + 16])
            for s in streams for i in range(s.size - 16))
        assert found


def test_sample_doc_windows_deterministic():
    tok = ToyTokenizer()
    docs = [" ".join(f"w{i}" for i in range(200))]
    a = sample_doc_windows(docs, tok, 4, 32, seed=7)
    b = sample_doc_windows(docs, tok, 4, 32, seed=7)
    np.testing.assert_array_equal(a, b)
    c = sample_doc_windows(docs, tok, 4, 32, seed=8)
    assert not np.array_equal(a, c)


def test_sample_doc_windows_raises_when_all_short():
    tok = ToyTokenizer()
    with pytest.raises(ValueError, match="tokenizes"):
        sample_doc_windows(["a b", "c d"], tok, 2, 64, seed=0)


def test_load_pile_local_jsonl(tmp_path):
    path = tmp_path / "val.jsonl"
    with open(path, "w") as f:
        for i in range(5):
            f.write(json.dumps({"text": f"doc{i} " * 20}) + "\n")
    tok = ToyTokenizer()
    stream = load_pile(tok, str(path), max_docs=3)
    assert stream.ndim == 1 and stream.size > 0


def test_get_loaders_pile_dispatch(tmp_path):
    path = tmp_path / "val.jsonl"
    with open(path, "w") as f:
        f.write(json.dumps({"text": "tok " * 500}) + "\n")
    tok = ToyTokenizer()
    train, test = get_loaders("pile", tok, nsamples=4, seqlen=32,
                              pile_path=str(path))
    assert train.shape == (4, 32)
    assert test is None
    with pytest.raises(ValueError, match="pile_path"):
        get_loaders("pile", tok, nsamples=4, seqlen=32)


def test_get_loaders_unknown_raises():
    with pytest.raises(ValueError, match="unknown dataset"):
        get_loaders("nope", ToyTokenizer())
