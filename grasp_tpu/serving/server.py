"""HTTP serving frontend: an OpenAI-style completions API over the paged
continuous-batching engine.

Beyond-reference serving extension (the reference's only generation surface is
an offline loop around HF ``model.generate``, tools/eval_longbench.py:337-353;
it has no server). This module puts a network front door on
:class:`~grasp_tpu.serving.paged.ServingEngine`:

  - ``POST /v1/completions`` — OpenAI-compatible text completion (prompt as a
    string or a list of token ids, ``max_tokens``/``temperature``/``top_k``/
    ``top_p``/``seed``), with ``"stream": true`` serving incremental tokens as
    Server-Sent Events;
  - ``POST /v1/chat/completions`` — chat messages rendered through the
    tokenizer's own chat template when it has one, else a family template
    (:func:`render_chat`: "llama2" [INST] bracketing or a generic transcript);
  - ``GET /v1/models`` and ``GET /health`` — model listing and live engine
    stats (live/pending requests, free KV pages);
  - one **scheduler thread** owns the TPU: it loops ``engine.step()`` —
    admitting pending prompts and advancing every live row one token per
    jitted call — while HTTP handler threads only enqueue requests and wait.
    Requests arriving mid-flight join the running batch (continuous
    batching); nothing recompiles per request.

Design notes (TPU-first): the HTTP layer is stdlib ``http.server`` with a
thread per connection — fine, because handlers never touch the device. All
device work happens on the single scheduler thread, so engine state needs no
locking beyond the submit/collect boundary (`_lock`). Token delivery is a
per-request ``queue.Queue`` the scheduler pushes into after each step, which
gives streaming for free and makes non-streaming a drain-until-done.

Determinism matches the engine contract (docs/serving.md): greedy requests
depend only on the prompt; sampled requests depend only on (prompt, seed) when
a seed is given. Unseeded sampled requests fall back to the engine's
rid-derived seed and therefore depend on arrival order.
"""

from __future__ import annotations

import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np

from grasp_tpu.serving.paged import ServingEngine

logger = logging.getLogger("grasp_tpu")


class _Delivery:
    """Per-request token stream the scheduler fills and a handler drains."""

    __slots__ = ("q", "sent", "final", "error", "lps", "stop", "stop_cut",
                 "stopped", "native_finish")

    def __init__(self, stop: Optional[List[str]] = None):
        self.q: "queue.Queue[tuple]" = queue.Queue()
        self.sent = 0          # tokens pushed so far (scheduler-side cursor)
        self.final: Optional[List[int]] = None
        self.error: Optional[str] = None
        self.lps: List[tuple] = []     # (chosen_lp, top_ids, top_lps) per token
        self.stop = stop or []         # host-side stop strings
        self.stop_cut: Optional[int] = None  # char index of the matched stop
        self.stopped = False           # finished via a stop string
        self.native_finish = "length"  # engine's cause: "eos"/"length"/"cancel"


class GraspServer:
    """Scheduler + request registry around one :class:`ServingEngine`.

    Drive it directly (``submit``/``iter_tokens`` — what the HTTP layer uses)
    or through :func:`serve` for the network frontend. ``start()`` launches
    the scheduler thread; ``close()`` stops it after the current step.
    """

    def __init__(self, engine: ServingEngine, tokenizer=None, model_id: str = "grasp-tpu",
                 chat_template: Optional[str] = None):
        self.engine = engine
        self.tokenizer = tokenizer
        self.model_id = model_id
        self.chat_template = chat_template  # None=auto (tokenizer template/generic)
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._deliveries: Dict[int, _Delivery] = {}
        self._stop = False
        self._thread: Optional[threading.Thread] = None
        self.started_at = time.time()
        # scheduler-thread-owned counters (read lock-free by /metrics; int
        # reads are atomic under the GIL)
        self.counters = {"requests_total": 0, "completions_total": 0,
                         "tokens_generated_total": 0, "engine_steps_total": 0}

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> "GraspServer":
        self._thread = threading.Thread(target=self._loop, name="grasp-scheduler",
                                        daemon=True)
        self._thread.start()
        return self

    def close(self) -> None:
        with self._wake:
            self._stop = True
            self._wake.notify_all()
        if self._thread is not None:
            self._thread.join(timeout=30)

    # -- request path --------------------------------------------------------
    def submit(self, prompt_ids, max_new_tokens: int, temperature: float = 0.0,
               top_k: int = 0, top_p: float = 1.0, seed: Optional[int] = None,
               logprobs: int = 0, stop: Optional[List[str]] = None,
               **sampling) -> tuple:
        """Enqueue one request; returns (rid, delivery). Raises ValueError on
        requests the engine could never admit (too many pages, bad top_k).
        stop: host-side stop strings — generation cancels when the decoded
        output contains one (needs a tokenizer). Extra keyword arguments
        (presence/frequency/repetition penalties, min_p, logit_bias) pass
        through to the engine, which validates them."""
        if stop and self.tokenizer is None:
            raise ValueError("stop strings need a tokenizer")
        if sampling.get("guided_regex"):
            # first-use grammar compilation (token-bytes table + DFA lift)
            # can take seconds on a 32k vocab — do it OUTSIDE the scheduler
            # lock so live decoding never stalls; the per-pattern cache makes
            # this idempotent and the locked submit then hits the cache
            self.engine._compile_guided(sampling["guided_regex"])
        with self._wake:
            rid = self.engine.submit(prompt_ids, max_new_tokens,
                                     temperature=temperature, top_k=top_k,
                                     top_p=top_p, seed=seed, logprobs=logprobs,
                                     **sampling)
            d = _Delivery(stop=stop)
            self._deliveries[rid] = d
            self.counters["requests_total"] += 1
            self._wake.notify_all()
        return rid, d

    def iter_tokens(self, delivery: _Delivery, timeout: float = 600.0):
        """Yield token ids as the scheduler produces them; returns on done."""
        deadline = time.time() + timeout
        while True:
            try:
                kind, val = delivery.q.get(timeout=max(0.0, deadline - time.time()))
            except queue.Empty:
                raise TimeoutError("generation timed out") from None
            if kind == "tok":
                yield val
            elif kind == "done":
                return
            else:  # "err"
                raise RuntimeError(val)

    def wait(self, delivery: _Delivery, timeout: float = 600.0) -> List[int]:
        """Drain a delivery to completion; returns the full output ids."""
        out: List[int] = []
        for tok in self.iter_tokens(delivery, timeout=timeout):
            out.append(tok)
        return delivery.final if delivery.final is not None else out

    def cancel(self, rid: int) -> bool:
        """Thread-safe engine cancel (client abort, failed batch cleanup)."""
        with self._wake:
            return self.engine.cancel(rid)

    def stats(self) -> Dict[str, Any]:
        with self._lock:
            live = sum(1 for r in self.engine._live if r is not None)
            pending = len(self.engine._pending)
            admitting = len(getattr(self.engine, "_admitting", ()))
            free = self.engine.pool.free_pages
        return {"status": "ok", "model": self.model_id, "live": live,
                "pending": pending, "admitting": admitting, "free_pages": free,
                "uptime_s": round(time.time() - self.started_at, 1)}

    # -- scheduler -----------------------------------------------------------
    def _loop(self) -> None:
        while True:
            with self._wake:
                while not self._stop and not self.engine.has_work():
                    self._wake.wait(timeout=0.05)
                if self._stop:
                    for d in self._deliveries.values():
                        if d.final is None:
                            d.q.put(("err", "server shutting down"))
                    self._deliveries.clear()
                    return
                try:
                    self.engine.step()
                    self.counters["engine_steps_total"] += 1
                except Exception as e:  # engine failure must not kill delivery
                    logger.exception("engine.step failed")
                    for d in self._deliveries.values():
                        if d.final is None:
                            d.q.put(("err", f"{type(e).__name__}: {e}"))
                    self._deliveries.clear()
                    continue
                # push live rows' new tokens (streaming) and check host-side
                # stop strings, then drain finished rows
                for r in self.engine._live:
                    if r is None:
                        continue
                    d = self._deliveries.get(r.rid)
                    if d is None:
                        continue
                    self._push_new(d, r)
                    if d.stop and not d.stopped:
                        text = self.tokenizer.decode(r.out, skip_special_tokens=True)
                        hits = [i for i in (text.find(s) for s in d.stop) if i >= 0]
                        if hits:
                            d.stop_cut, d.stopped = min(hits), True
                            self.engine.cancel(r.rid)
                for r in self.engine.collect_requests():
                    d = self._deliveries.pop(r.rid, None)
                    if d is None:
                        continue
                    self._push_new(d, r)
                    d.final = list(r.out)
                    d.native_finish = getattr(r, "finish", "length")
                    self.counters["completions_total"] += 1
                    d.q.put(("done", None))

    def _push_new(self, d: _Delivery, r) -> None:
        while d.sent < len(r.out):
            if r.logprobs and d.sent < len(r.lp):
                d.lps.append(r.lp[d.sent])
            d.q.put(("tok", int(r.out[d.sent])))
            d.sent += 1
            self.counters["tokens_generated_total"] += 1


# ---------------------------------------------------------------------------
# Chat templating
# ---------------------------------------------------------------------------


def render_chat(messages: List[Dict[str, str]], tokenizer=None,
                template: Optional[str] = None) -> List[int]:
    """Render an OpenAI-style messages list to prompt token ids.

    template=None auto-selects: a HF tokenizer with a chat template uses
    ``apply_chat_template(add_generation_prompt=True)``; otherwise the
    "generic" plain transcript. "llama2" renders the LLaMA-2-chat [INST]
    format (same bracketing as the reference's LongBench wrapper for the
    llama2 family, tools/eval_longbench.py:293-294, extended to multi-turn).
    """
    for m in messages:
        if not isinstance(m, dict) or "role" not in m or "content" not in m:
            raise ValueError("each message needs 'role' and 'content'")
        if m["role"] not in ("system", "user", "assistant"):
            raise ValueError(f"unknown role {m['role']!r}")

    if template is None and tokenizer is not None and \
            getattr(tokenizer, "chat_template", None) and \
            hasattr(tokenizer, "apply_chat_template"):
        return list(tokenizer.apply_chat_template(messages, tokenize=True,
                                                  add_generation_prompt=True))

    if template == "llama2":
        # [INST] blocks pair (user, assistant) turns; the system prompt rides
        # inside the first block's <<SYS>> section
        sys_txt = ""
        turns = [m for m in messages if m["role"] != "system"]
        for m in messages:
            if m["role"] == "system":
                sys_txt = f"<<SYS>>\n{m['content']}\n<</SYS>>\n\n"
        text, pending = "", sys_txt
        for m in turns:
            if m["role"] == "user":
                pending += m["content"]
            else:
                text += f"[INST] {pending} [/INST] {m['content']} "
                pending = ""
        if pending:
            text += f"[INST] {pending} [/INST]"
        else:
            text = text.rstrip()
    elif template == "chatml":
        # ChatML (Qwen2 and friends): <|im_start|>role\n...<|im_end|>\n
        text = "".join(
            f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n"
            for m in messages) + "<|im_start|>assistant\n"
    elif template == "phi3":
        # Phi-3 instruct: <|role|>\n...<|end|>\n, assistant cue to generate
        text = "".join(
            f"<|{m['role']}|>\n{m['content']}<|end|>\n"
            for m in messages) + "<|assistant|>\n"
    elif template == "gemma":
        # Gemma has no system role: a system prompt folds into the first
        # user turn (HF chat-template behavior); assistant renders as model
        sys_txt = "\n".join(m["content"] for m in messages
                            if m["role"] == "system")
        text, sys_pending = "", sys_txt
        for m in messages:
            if m["role"] == "system":
                continue
            role = "model" if m["role"] == "assistant" else "user"
            content = m["content"]
            if role == "user" and sys_pending:
                content = f"{sys_pending}\n\n{content}"
                sys_pending = ""
            text += f"<start_of_turn>{role}\n{content}<end_of_turn>\n"
        text += "<start_of_turn>model\n"
    else:  # generic plain transcript (vicuna-style roles)
        lines = []
        for m in messages:
            role = {"system": "SYSTEM", "user": "USER", "assistant": "ASSISTANT"}[m["role"]]
            lines.append(f"{role}: {m['content']}")
        text = "\n".join(lines) + "\nASSISTANT:"

    if tokenizer is None:
        raise ValueError("chat completions need a tokenizer")
    return tokenizer.encode(text, add_special_tokens=True)


# ---------------------------------------------------------------------------
# HTTP layer
# ---------------------------------------------------------------------------


def _usage(prompt_ids: List[int], out: List[int]) -> Dict[str, int]:
    return {"prompt_tokens": len(prompt_ids), "completion_tokens": len(out),
            "total_tokens": len(prompt_ids) + len(out)}


_MAX_CHOICES = 16  # cap on len(prompts) * n per HTTP request


def _parse_prompts(server: GraspServer, prompt) -> List[List[int]]:
    """OpenAI prompt forms: a string, a token-id list, or a batch of either."""
    def one(p):
        if isinstance(p, str):
            if server.tokenizer is None:
                raise ValueError("string prompt needs a tokenizer; send token ids")
            return server.tokenizer.encode(p, add_special_tokens=True)
        if isinstance(p, list) and all(isinstance(t, int) for t in p):
            return p
        raise ValueError("prompt must be a string or a list of token ids")

    if isinstance(prompt, list) and prompt and all(
            isinstance(p, (str, list)) for p in prompt) and not all(
            isinstance(t, int) for t in prompt):
        return [one(p) for p in prompt]  # batch of prompts
    return [one(prompt)]


def _finish_and_text(server: GraspServer, delivery: _Delivery,
                     out: List[int]) -> tuple:
    """(finish_reason, text): eos or a matched stop string => "stop"; the
    text excludes everything from the stop match on (token_ids stay raw)."""
    text = ""
    if server.tokenizer is not None:
        text = server.tokenizer.decode(out, skip_special_tokens=True)
    if delivery.stopped:
        return "stop", text[:delivery.stop_cut]
    # the engine never EMITS a stop token — it records the cause instead
    return ("stop" if delivery.native_finish == "eos" else "length", text)


def _lp_block(server: GraspServer, delivery: _Delivery,
              out: List[int]) -> Optional[Dict[str, Any]]:
    """OpenAI-style logprobs: per generated token, the model's logprob of the
    chosen token and the top-N alternatives."""
    if not delivery.lps:
        return None

    def piece(i):
        if server.tokenizer is None:
            return str(i)
        return server.tokenizer.decode([i], skip_special_tokens=True) or str(i)

    def top_block(e):
        # the dict is keyed by decoded token TEXT (OpenAI legacy format);
        # distinct ids can decode identically (e.g. two invalid bytes both
        # render "�") — keep the most probable entry per text, so the
        # dict's max is always the true rank-1 logprob
        d: Dict[str, float] = {}
        for i, lp in zip(e[1], e[2]):  # already rank-ordered
            d.setdefault(piece(i), lp)
        return d

    return {
        "tokens": [piece(t) for t in out[: len(delivery.lps)]],
        "token_logprobs": [e[0] for e in delivery.lps],
        "top_logprobs": [top_block(e) for e in delivery.lps],
    }


class _Handler(BaseHTTPRequestHandler):
    server_version = "grasp-tpu"
    grasp: GraspServer = None  # set by serve()

    # quiet the default per-request stderr lines; route through logging
    def log_message(self, fmt, *args):  # pragma: no cover - logging detail
        logger.debug("http: " + fmt, *args)

    def _json(self, code: int, obj: Dict[str, Any]) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (http.server API)
        g = self.grasp
        if self.path == "/health":
            return self._json(200, g.stats())
        if self.path == "/metrics":
            s = g.stats()
            lines = [f"grasp_{k} {v}" for k, v in g.counters.items()]
            lines += [f"grasp_live_requests {s['live']}",
                      f"grasp_pending_requests {s['pending']}",
                      f"grasp_free_kv_pages {s['free_pages']}",
                      f"grasp_uptime_seconds {s['uptime_s']}"]
            if getattr(g.engine, "prefix_cache", False):
                lines += [
                    f"grasp_prefix_tokens_saved {g.engine.prefix_tokens_saved}",
                    f"grasp_prefix_tokens_total {g.engine.prefix_tokens_total}"]
            body = ("\n".join(lines) + "\n").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if self.path == "/v1/models":
            return self._json(200, {"object": "list", "data": [
                {"id": g.model_id, "object": "model", "owned_by": "grasp-tpu"}]})
        return self._json(404, {"error": {"message": f"no route {self.path}"}})

    def do_POST(self):  # noqa: N802
        g = self.grasp
        chat = self.path in ("/v1/chat/completions", "/chat/completions")
        if not chat and self.path not in ("/v1/completions", "/completions"):
            return self._json(404, {"error": {"message": f"no route {self.path}"}})
        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
        except (ValueError, json.JSONDecodeError):
            return self._json(400, {"error": {"message": "invalid JSON body"}})

        if chat:
            messages = req.get("messages")
            if not isinstance(messages, list) or not messages:
                return self._json(400, {"error": {"message": "messages must be a non-empty list"}})
            try:
                prompts = [render_chat(messages, tokenizer=g.tokenizer,
                                       template=g.chat_template)]
            except (ValueError, TypeError, KeyError) as e:
                return self._json(400, {"error": {"message": str(e)}})
        else:
            try:
                prompts = _parse_prompts(g, req.get("prompt", ""))
            except ValueError as e:
                return self._json(400, {"error": {"message": str(e)}})
        if any(not p for p in prompts):
            return self._json(400, {"error": {"message": "empty prompt"}})

        try:
            max_new = int(req.get("max_tokens", 16))
            temperature = float(req.get("temperature", 0.0))
            top_k = int(req.get("top_k", 0))
            top_p = float(req.get("top_p", 1.0))
            seed = req.get("seed")
            seed = int(seed) if seed is not None else None
            stream = bool(req.get("stream", False))
            logprobs = int(req.get("logprobs") or 0)
            n = int(req.get("n", 1))
            sampling = {
                "presence_penalty": float(req.get("presence_penalty", 0.0)),
                "frequency_penalty": float(req.get("frequency_penalty", 0.0)),
                "repetition_penalty": float(req.get("repetition_penalty", 1.0)),
                "min_p": float(req.get("min_p", 0.0)),
            }
            bias = req.get("logit_bias")
            if bias is not None:
                if not isinstance(bias, dict):
                    raise ValueError
                # OpenAI sends {"token_id_string": bias}; tolerate int keys
                sampling["logit_bias"] = {int(t): float(v)
                                          for t, v in bias.items()}
            guided = req.get("guided_regex")
            rf = req.get("response_format")
            if rf is not None:
                if not (isinstance(rf, dict) and rf.get("type") in
                        ("json_object", "json_schema", "text")):
                    raise ValueError
                if rf.get("type") != "text" and guided is not None:
                    raise ValueError  # pick one constraint
                if rf.get("type") == "json_object":
                    from grasp_tpu.serving.guided import json_regex

                    guided = json_regex()
                elif rf.get("type") == "json_schema":
                    from grasp_tpu.serving.guided import schema_regex

                    js = rf.get("json_schema")
                    schema = (js.get("schema", js)
                              if isinstance(js, dict) else None)
                    if not isinstance(schema, dict):
                        raise ValueError
                    guided = schema_regex(schema)  # ValueError on bad schema
            if guided is not None:
                if not isinstance(guided, str) or not guided:
                    raise ValueError
                sampling["guided_regex"] = guided
            stop = req.get("stop")
            if isinstance(stop, str):
                stop = [stop]
            if stop is not None and (not isinstance(stop, list) or len(stop) > 4
                                     or not all(isinstance(s, str) and s for s in stop)):
                raise ValueError
            if n < 1 or n * len(prompts) > _MAX_CHOICES:
                raise ValueError
        except (TypeError, ValueError):
            return self._json(400, {"error": {"message": "bad sampling parameter"}})
        if stream and (n > 1 or len(prompts) > 1):
            return self._json(400, {"error": {
                "message": "stream supports a single prompt with n=1"}})

        # one engine request per (prompt, sample); choice index = pi*n + j,
        # OpenAI batch semantics. An explicit seed gives sample j seed+j
        # (identical seeds would duplicate the sampled stream).
        subs = []
        try:
            for pi, p_ids in enumerate(prompts):
                for j in range(n):
                    s = seed + j if seed is not None else None
                    rid, d = g.submit(p_ids, max_new, temperature=temperature,
                                      top_k=top_k, top_p=top_p, seed=s,
                                      logprobs=logprobs, stop=stop, **sampling)
                    subs.append((p_ids, rid, d))
        except (ValueError, MemoryError) as e:
            for _, rid, _d in subs:  # don't strand the already-admitted part
                g.cancel(rid)
            return self._json(400, {"error": {"message": str(e)}})

        timeout = float(req.get("timeout_s", 600.0))
        if not stream:
            choices, usage = [], {"prompt_tokens": 0, "completion_tokens": 0,
                                  "total_tokens": 0}
            for idx, (p_ids, rid, d) in enumerate(subs):
                try:
                    out = g.wait(d, timeout=timeout)
                except (TimeoutError, RuntimeError) as e:
                    for _, r2, _d2 in subs:  # nobody will read the rest —
                        g.cancel(r2)         # free their rows/pages now
                    return self._json(500, {"error": {"message": str(e)}})
                finish, text = _finish_and_text(g, d, out)
                lp = _lp_block(g, d, out)
                for k, v in _usage(p_ids, out).items():
                    usage[k] += v
                if chat:
                    choices.append({"index": idx, "finish_reason": finish,
                                    "logprobs": lp,
                                    "message": {"role": "assistant",
                                                "content": text,
                                                "token_ids": out}})
                else:
                    choices.append({"text": text, "index": idx,
                                    "token_ids": out, "logprobs": lp,
                                    "finish_reason": finish})
            kind = "chatcmpl" if chat else "cmpl"
            return self._json(200, {
                "id": f"{kind}-{subs[0][1]}",
                "object": "chat.completion" if chat else "text_completion",
                "created": int(time.time()), "model": g.model_id,
                "choices": choices, "usage": usage})

        # SSE streaming (single prompt, n=1): one data: chunk per token,
        # then [DONE]
        _, rid, delivery = subs[0]
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Cache-Control", "no-cache")
        self.end_headers()
        out: List[int] = []
        try:
            for tok in g.iter_tokens(delivery, timeout=timeout):
                out.append(tok)
                piece = ""
                if g.tokenizer is not None:
                    piece = g.tokenizer.decode([tok], skip_special_tokens=True)
                if chat:
                    chunk = {"id": f"chatcmpl-{rid}", "object": "chat.completion.chunk",
                             "model": g.model_id,
                             "choices": [{"index": 0, "finish_reason": None,
                                          "delta": {"content": piece,
                                                    "token_ids": [tok]}}]}
                else:
                    chunk = {"id": f"cmpl-{rid}", "object": "text_completion",
                             "model": g.model_id,
                             "choices": [{"text": piece, "index": 0,
                                          "token_ids": [tok], "finish_reason": None}]}
                self.wfile.write(f"data: {json.dumps(chunk)}\n\n".encode())
                self.wfile.flush()
        except (TimeoutError, RuntimeError) as e:
            err = {"error": {"message": str(e)}}
            self.wfile.write(f"data: {json.dumps(err)}\n\n".encode())
        except BrokenPipeError:  # client went away; tokens keep generating
            return
        # streamed tokens may include (part of) a matched stop string — the
        # match is only detectable after the tokens were already sent
        finish = "stop" if (delivery.stopped
                            or delivery.native_finish == "eos") else "length"
        if chat:
            final = {"id": f"chatcmpl-{rid}", "object": "chat.completion.chunk",
                     "model": g.model_id,
                     "choices": [{"index": 0, "delta": {},
                                  "finish_reason": finish}]}
        else:
            final = {"id": f"cmpl-{rid}", "object": "text_completion",
                     "model": g.model_id,
                     "choices": [{"text": "", "index": 0, "token_ids": [],
                                  "finish_reason": finish}]}
        try:
            self.wfile.write(f"data: {json.dumps(final)}\n\n".encode())
            self.wfile.write(b"data: [DONE]\n\n")
            self.wfile.flush()
        except BrokenPipeError:
            pass


def serve(engine: ServingEngine, host: str = "127.0.0.1", port: int = 8000,
          tokenizer=None, model_id: str = "grasp-tpu",
          chat_template: Optional[str] = None, block: bool = True):
    """Start the scheduler + HTTP server. With ``block=False`` returns
    ``(GraspServer, ThreadingHTTPServer, thread)`` for embedding/tests —
    call ``httpd.shutdown()`` then ``gserver.close()`` to stop."""
    gserver = GraspServer(engine, tokenizer=tokenizer, model_id=model_id,
                          chat_template=chat_template).start()
    handler = type("BoundHandler", (_Handler,), {"grasp": gserver})
    httpd = ThreadingHTTPServer((host, port), handler)
    httpd.daemon_threads = True
    logger.info("serving %s on http://%s:%d", model_id, host, httpd.server_address[1])
    if block:
        try:
            httpd.serve_forever()
        finally:
            gserver.close()
        return None
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return gserver, httpd, t
