"""In-repo SentencePiece runtime (utils/sp_tokenizer.py): ModelProto
wire-format round-trip, BPE merge order, unigram Viterbi, byte fallback,
and the Baichuan tokenizer surface — replacing the reference's dependency
on the compiled sentencepiece library
(ref: thirdparty/baichuan/tokenization_baichuan.py:23)."""

import pytest

from autosmoothquant_tpu.utils.sp_tokenizer import (
    BaichuanTokenizer, SentencePieceModel, parse_model_proto,
    write_model_proto)

S = "▁"  # the sentencepiece whitespace symbol

# piece types
NORMAL, UNKNOWN, CONTROL, BYTE = 1, 2, 3, 6


def bpe_pieces():
    """Tiny BPE vocab: specials, chars, and scored merges."""
    p = [("<unk>", 0.0, UNKNOWN), ("<s>", 0.0, CONTROL),
         ("</s>", 0.0, CONTROL)]
    for ch in [S, "a", "b", "c", "h", "e", "l", "o", "t"]:
        p.append((ch, -10.0, NORMAL))
    # merges: higher score merges first
    p += [(S + "h", -1.0, NORMAL), ("he", -2.0, NORMAL),
          ("ll", -3.0, NORMAL), ("llo", -3.5, NORMAL),
          (S + "hello", -0.5, NORMAL),
          (S + "he", -1.5, NORMAL), ("lo", -4.0, NORMAL)]
    p += [(f"<0x{i:02X}>", -100.0, BYTE) for i in range(256)]
    return p


def make_model(pieces, model_type):
    data = write_model_proto(pieces, model_type)
    parsed, mt = parse_model_proto(data)
    assert mt == model_type
    return SentencePieceModel(parsed, mt)


def test_proto_roundtrip():
    pieces = bpe_pieces()
    parsed, mt = parse_model_proto(write_model_proto(pieces, "bpe"))
    assert mt == "bpe"
    assert [(p.text, p.type) for p in parsed] == \
        [(t, ty) for t, _s, ty in pieces]
    assert abs(parsed[3].score - pieces[3][1]) < 1e-6


def test_bpe_merges_to_best_pieces():
    m = make_model(bpe_pieces(), "bpe")
    ids = m.encode("hello")
    texts = [m.pieces[i].text for i in ids]
    # the full-word piece has the best score chain and must win
    assert texts == [S + "hello"], texts
    assert m.decode(ids) == "hello"


def test_bpe_partial_merges_and_decode():
    m = make_model(bpe_pieces(), "bpe")
    ids = m.encode("hell")                 # no "_hell" piece: merges stop
    assert m.decode(ids) == "hell"
    ids2 = m.encode("he told")             # mixed known/unknown chars
    assert m.decode(ids2) == "he told"     # 'd' via byte fallback


def test_byte_fallback_unicode():
    m = make_model(bpe_pieces(), "bpe")
    ids = m.encode("héllo")                # é not in vocab -> 2 UTF-8 bytes
    assert m.decode(ids) == "héllo"
    byte_pieces = [i for i in ids if m.pieces[i].type == BYTE]
    assert len(byte_pieces) == 2


def test_unigram_viterbi_prefers_total_score():
    p = [("<unk>", 0.0, UNKNOWN)]
    p += [(ch, -10.0, NORMAL) for ch in [S, "a", "b"]]
    p += [("ab", -12.0, NORMAL), (S + "a", -9.0, NORMAL),
          (S + "ab", -15.0, NORMAL)]
    m = make_model(p, "unigram")
    ids = m.encode("ab")
    texts = [m.pieces[i].text for i in ids]
    # _a + b = -19 beats _ab = -15? No: -15 > -19 so _ab wins; beats
    # _ + ab = -22 and _ + a + b = -30
    assert texts == [S + "ab"], texts
    assert m.decode(ids) == "ab"


def test_unigram_unknown_char_fallback():
    p = [("<unk>", 0.0, UNKNOWN), (S, -1.0, NORMAL), ("a", -1.0, NORMAL)]
    m = make_model(p, "unigram")
    ids = m.encode("aza")                  # 'z' unknown, no byte pieces
    assert m.unk_id in ids
    assert m.decode(ids) == "aa"           # unk dropped in decode


def test_baichuan_tokenizer_surface(tmp_path):
    f = tmp_path / "tokenizer.model"
    f.write_bytes(write_model_proto(bpe_pieces(), "bpe"))
    tok = BaichuanTokenizer(str(f))
    assert tok.vocab_size == len(bpe_pieces())
    assert tok.bos_token_id == 1 and tok.eos_token_id == 2
    ids = tok.encode("hello")
    assert ids[0] == tok.bos_token_id      # add_bos_token default True
    assert tok.decode(ids) == "hello"
    # __call__ contract used by chat/eval plumbing
    out = tok("hello hello", max_length=3, truncation=True)
    assert len(out.input_ids) == 3
    # tokenize/convert round-trip
    toks = tok.tokenize("hello")
    assert tok.convert_tokens_to_ids(toks) == tok.encode(
        "hello", add_special_tokens=False)


def test_no_bos_mode(tmp_path):
    f = tmp_path / "tokenizer.model"
    f.write_bytes(write_model_proto(bpe_pieces(), "bpe"))
    tok = BaichuanTokenizer(str(f), add_bos_token=False, add_eos_token=True)
    ids = tok.encode("hello")
    assert ids[0] != tok.bos_token_id and ids[-1] == tok.eos_token_id
