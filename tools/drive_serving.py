"""On-chip serving drive (validation-queue item 5): build a quantized
checkpoint, launch the HTTP serving CLI against the real TPU, exercise
/health, plain + logprobs + SSE-streaming /generate with mixed sampling
params and concurrent clients, then report wall-clock throughput.

Run with ASQ_DRIVE_GAMMA=4 for the speculative arm (repetitive prompts,
prompt-lookup speculation)."""

import json
import os
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def build_ckpt(d: Path):
    import jax

    from autosmoothquant_tpu.convert.pipeline import (
        calibrate_smooth_quantize, save_quantized)
    from autosmoothquant_tpu.models import llama as L
    from autosmoothquant_tpu.quant.config import QuantConfig

    cfg = L.LlamaConfig(vocab_size=1024, hidden_size=256,
                        intermediate_size=512, num_hidden_layers=4,
                        num_attention_heads=8, num_key_value_heads=4,
                        max_position_embeddings=512)
    params = L.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    calib = [rng.integers(0, 1024, size=(4, 64)).astype(np.int32)
             for _ in range(3)]
    qcfg = QuantConfig(type="int8")
    qparams, art = calibrate_smooth_quantize(L, params, cfg, qcfg,
                                             lambda: iter(calib))
    save_quantized(str(d), qparams, qcfg, artifacts=art)
    # the serve CLI reads config.json for the architecture
    (d / "config.json").write_text(json.dumps({
        "architectures": ["LlamaForCausalLM"], "vocab_size": 1024,
        "hidden_size": 256, "intermediate_size": 512,
        "num_hidden_layers": 4, "num_attention_heads": 8,
        "num_key_value_heads": 4, "max_position_embeddings": 512,
        "rms_norm_eps": 1e-6}))


def post(port, body, stream=False):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps(body).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    resp = urllib.request.urlopen(
        req, timeout=float(os.environ.get("ASQ_DRIVE_TIMEOUT", "300")))
    if not stream:
        return json.loads(resp.read())
    events, name = [], None
    for raw in resp:
        line = raw.decode().strip()
        if line.startswith("event:"):
            name = line[6:].strip()
        elif line.startswith("data:"):
            events.append((name, json.loads(line[5:])))
            name = None
    return events


def main():
    gamma = int(os.environ.get("ASQ_DRIVE_GAMMA", "0"))
    paged = os.environ.get("ASQ_DRIVE_PAGED") == "1"
    d = Path(tempfile.mkdtemp(prefix="serve_ckpt_"))
    build_ckpt(d)
    port = 8731 + gamma + (3 if paged else 0)
    args = [sys.executable, str(ROOT / "examples" / "serve_model.py"),
            "--quantized-model-path", str(d), "--port", str(port),
            "--max-batch", "8", "--max-seq", "512",
            "--prefill-chunk", "128"]
    if paged:
        # block-paged engine behind the same HTTP surface (the prefix
        # endpoint then SHARES pages copy-free)
        args += ["--paged", "--block-size", "64", "--tp", "1"]
    if gamma:
        args += ["--speculative-gamma", str(gamma)]
    srv = subprocess.Popen(args, stdout=subprocess.PIPE,
                           stderr=subprocess.STDOUT, text=True)
    try:
        for _ in range(600):  # wait for server + first compiles
            time.sleep(1)
            try:
                h = json.loads(urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=2).read())
                if h.get("ok"):
                    break
            except Exception:
                if srv.poll() is not None:
                    print(srv.stdout.read()[-3000:])
                    raise SystemExit("server died")
        else:
            raise SystemExit("server never became healthy")
        rng = np.random.default_rng(1)
        base = rng.integers(1, 1024, size=16).tolist()

        # 1. plain greedy
        r = post(port, {"prompt": base * 4, "max_new_tokens": 32})
        assert len(r["tokens"]) == 32, r
        # 2. logprobs + sampling knobs
        r = post(port, {"prompt": base * 2, "max_new_tokens": 16,
                        "temperature": 0.8, "top_k": 40, "top_p": 0.95,
                        "repetition_penalty": 1.1, "logprobs": True})
        assert len(r["tokens"]) == 16 and len(r["logprobs"]) == 16
        assert all(lp <= 0.0 for lp in r["logprobs"])
        # 3. SSE streaming
        ev = post(port, {"prompt": base * 3, "max_new_tokens": 24,
                         "stream": True}, stream=True)
        name, final = ev[-1]
        inc = [t for n, e in ev[:-1] for t in e.get("tokens", [])]
        assert name == "done" and len(final["tokens"]) == 24, ev[-1]
        # incremental events must be a prefix of the done payload
        assert final["tokens"][: len(inc)] == inc
        # 4. prefix cache over HTTP: same tokens with and without the
        # registered system-prompt prefix (KV copy is exact)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/prefix",
            data=json.dumps({"id": "sys", "tokens": base * 4}).encode(),
            method="POST", headers={"Content-Type": "application/json"})
        pr = json.loads(urllib.request.urlopen(
            req, timeout=float(os.environ.get("ASQ_DRIVE_TIMEOUT", "300"))
        ).read())
        assert pr["ok"] and pr["prefix_tokens"] == 64, pr
        full = (base * 4) + base[:8]
        r_pref = post(port, {"prompt": full, "max_new_tokens": 16,
                             "prefix": "sys"})
        r_full = post(port, {"prompt": full, "max_new_tokens": 16})
        assert r_pref["tokens"] == r_full["tokens"], (r_pref, r_full)
        # 5. live observability: GET /stats shows the work just done
        st = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=10).read())
        assert st["ok"] and st["decode_tokens"] >= 32 + 16 + 24 + 16 + 16
        assert st["prefill_tokens"] > 0 and st["prefixes"] == 1
        assert "decode_tok_per_s" in st and "max_batch" in st
        if paged:
            assert st["free_pages"] <= st["num_pages"]
        # 6. OpenAI-compatible facade: /v1/completions greedy parity with
        # /generate, envelope fields, and SSE chunks ending in [DONE]
        timeout = float(os.environ.get("ASQ_DRIVE_TIMEOUT", "300"))

        def post_v1(body, stream=False):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/completions",
                data=json.dumps(body).encode(), method="POST",
                headers={"Content-Type": "application/json"})
            resp = urllib.request.urlopen(req, timeout=timeout)
            if not stream:
                return json.loads(resp.read())
            datas = []
            for raw in resp:
                line = raw.decode().strip()
                if line.startswith("data:"):
                    datas.append(line[5:].strip())
            return datas

        v1 = post_v1({"prompt": base * 2, "max_tokens": 12,
                      "temperature": 0.0})
        native = post(port, {"prompt": base * 2, "max_new_tokens": 12})
        assert v1["object"] == "text_completion", v1
        assert v1["choices"][0]["tokens"] == native["tokens"], (v1, native)
        assert v1["choices"][0]["finish_reason"] == "length"
        assert v1["usage"]["completion_tokens"] == 12
        datas = post_v1({"prompt": base * 2, "max_tokens": 12,
                         "temperature": 0.0, "stream": True}, stream=True)
        assert datas[-1] == "[DONE]"
        streamed = [t for dd in datas[:-1]
                    for t in json.loads(dd)["choices"][0]["tokens"]]
        assert streamed == native["tokens"], (streamed, native)
        models = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/models", timeout=10).read())
        assert models["data"][0]["id"]
        # chat endpoint needs a tokenizer -> expect the OpenAI error
        # envelope here (this drive serves token ids only)
        chat_req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps({"messages": [
                {"role": "user", "content": "hi"}]}).encode(),
            method="POST", headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(chat_req, timeout=30)
            raise AssertionError("chat without tokenizer should 400")
        except urllib.error.HTTPError as e:
            body = json.loads(e.read())
            assert e.code == 400
            assert body["error"]["type"] == "invalid_request_error", body
        # 7. paged-only: AUTOMATIC prefix sharing — two prefix-less
        # requests with a common long prompt prefix share pages through
        # the block radix tree (visible in /stats), tokens exact
        if paged:
            common = rng.integers(1, 1024, size=192).tolist()
            a = post(port, {"prompt": common + [5], "max_new_tokens": 8})
            b = post(port, {"prompt": common + [5], "max_new_tokens": 8})
            assert a["tokens"] == b["tokens"]
            st2 = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=10).read())
            assert st2.get("auto_prefix_hits", 0) >= 1, st2
            assert st2.get("auto_prefix_hit_tokens", 0) >= 128, st2
        print("functional drive OK (greedy, sampled+logprobs, SSE, prefix, "
              "v1-completions, v1-stream, "
              f"stats={st})")

        # 4. concurrent throughput: 16 clients x 64 tokens, repetitive
        # prompts (the regime prompt-lookup speculation targets)
        n_req, n_tok = 16, 64
        results = [None] * n_req

        def worker(i):
            p = (base * 8)[: 96 + i]
            results[i] = post(port, {"prompt": p, "max_new_tokens": n_tok})

        # warm compile of every bucket shape first
        post(port, {"prompt": (base * 8)[:96], "max_new_tokens": n_tok})
        t0 = time.perf_counter()
        ths = [threading.Thread(target=worker, args=(i,))
               for i in range(n_req)]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        dt = time.perf_counter() - t0
        if any(r is None for r in results):
            # a worker failed: dump the server's fate + output before the
            # assert so the failure is diagnosable from the log alone
            code = srv.poll()
            print(f"[drive] {sum(r is None for r in results)} workers "
                  f"failed; server poll={code}")
            if code is not None:
                print(srv.stdout.read()[-4000:])
        assert all(len(r["tokens"]) == n_tok for r in results)
        print(json.dumps({
            "metric": f"serve_http_tok_per_s_gamma{gamma}",
            "value": round(n_req * n_tok / dt, 1), "unit": "tok/s",
            "clients": n_req, "new_tokens": n_tok,
            "wall_s": round(dt, 2)}))
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=10)
        except subprocess.TimeoutExpired:
            srv.kill()


if __name__ == "__main__":
    main()
