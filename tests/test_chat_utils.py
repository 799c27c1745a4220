"""Chat-input packing + streamer vs the reference's semantics."""

from autosmoothquant_tpu.utils.chat import TextIterStreamer, build_chat_input

USER, ASSIST = 195, 196


def enc(s):
    # 1 token per word, deterministic
    return [hash(w) % 100 + 1 for w in s.split()]


def test_single_round():
    msgs = [{"role": "user", "content": "hello world"}]
    toks = build_chat_input(enc, msgs, model_max_length=64, max_new_tokens=8,
                            user_token_id=USER, assistant_token_id=ASSIST)
    assert toks[0] == USER and toks[-1] == ASSIST
    assert toks[1:-1] == enc("hello world")


def test_system_and_rounds():
    msgs = [
        {"role": "system", "content": "be kind"},
        {"role": "user", "content": "a b"},
        {"role": "assistant", "content": "c"},
        {"role": "user", "content": "d"},
    ]
    toks = build_chat_input(enc, msgs, model_max_length=64, max_new_tokens=8,
                            user_token_id=USER, assistant_token_id=ASSIST)
    expected = enc("be kind") + [USER] + enc("a b") + [ASSIST] + enc("c") \
        + [USER] + enc("d") + [ASSIST]
    assert toks == expected


def test_history_truncates_oldest_rounds():
    msgs = []
    for i in range(10):
        msgs.append({"role": "user", "content": f"question{i} filler filler"})
        msgs.append({"role": "assistant", "content": f"answer{i} filler"})
    msgs.append({"role": "user", "content": "final"})
    toks = build_chat_input(enc, msgs, model_max_length=32, max_new_tokens=8,
                            user_token_id=USER, assistant_token_id=ASSIST)
    assert len(toks) <= 24
    # newest round must survive
    assert toks[-1] == ASSIST and enc("final")[0] in toks


def test_streamer():
    dec = lambda toks: " ".join(str(t) for t in toks)
    s = TextIterStreamer(dec, skip_prompt=True)
    s.put([1, 2, 3])      # prompt, skipped
    s.put([4])
    s.put([5])
    s.end()
    assert list(s) == ["4", "4 5"]
