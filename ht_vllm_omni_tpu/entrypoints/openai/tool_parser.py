"""Hermes-style tool-call parsing for chat completions.

The Qwen model family (this framework's AR trunk lineage) emits tool
invocations as ``<tool_call>\\n{"name": ..., "arguments": {...}}\\n
</tool_call>`` blocks (the reference routes the same convention through
vLLM's Hermes2ProToolParser — reference serving_chat.py:80,189-221).
This module provides the server-side half: a full-text parser for the
non-streaming path and an incremental parser that classifies text
deltas into content vs. in-progress tool-call argument fragments for
SSE streaming (OpenAI ``delta.tool_calls`` protocol).
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass, field

TOOL_OPEN = "<tool_call>"
TOOL_CLOSE = "</tool_call>"


def make_tool_call_id() -> str:
    return f"call_{uuid.uuid4().hex[:24]}"


def _normalize(obj: dict) -> dict | None:
    """{"name", "arguments"} -> OpenAI tool_call dict (arguments as a
    JSON STRING, per the API contract)."""
    name = obj.get("name")
    if not isinstance(name, str) or not name:
        return None
    args = obj.get("arguments", obj.get("parameters", {}))
    if isinstance(args, str):
        args_str = args
    else:
        args_str = json.dumps(args, ensure_ascii=False)
    return {
        "id": make_tool_call_id(),
        "type": "function",
        "function": {"name": name, "arguments": args_str},
    }


def parse_tool_calls(text: str) -> tuple[str | None, list[dict]]:
    """Extract every well-formed tool block from ``text``.

    Returns (content, tool_calls): content is the text outside tool
    blocks (None when empty after stripping), malformed blocks stay in
    the content verbatim so nothing is silently dropped."""
    calls: list[dict] = []
    content_parts: list[str] = []
    rest = text
    while True:
        start = rest.find(TOOL_OPEN)
        if start < 0:
            content_parts.append(rest)
            break
        end = rest.find(TOOL_CLOSE, start)
        if end < 0:
            content_parts.append(rest)
            break
        content_parts.append(rest[:start])
        body = rest[start + len(TOOL_OPEN) : end].strip()
        call = None
        try:
            obj = json.loads(body)
            if isinstance(obj, dict):
                call = _normalize(obj)
        except json.JSONDecodeError:
            call = None
        if call is not None:
            calls.append(call)
        else:
            content_parts.append(rest[start : end + len(TOOL_CLOSE)])
        rest = rest[end + len(TOOL_CLOSE) :]
    content = "".join(content_parts).strip()
    return (content or None), calls


@dataclass
class StreamingToolParser:
    """Incremental classifier for SSE deltas.

    Feed decoded text fragments; each ``feed`` returns a list of events:
      ("content", str)                      — plain text delta
      ("tool_start", index, id, name)      — a tool block's name parsed
      ("tool_args", index, fragment)       — argument JSON fragment
      ("tool_end", index)                  — block closed
    Argument fragments are the raw JSON of the ``arguments`` value,
    streamed as it arrives (OpenAI semantics: concatenating every
    fragment yields the full arguments string)."""

    buf: str = ""
    in_tool: bool = False
    tool_index: int = -1
    _header_sent: bool = False
    _body: str = field(default="", repr=False)
    _args_sent: int = 0

    def feed(self, delta: str) -> list[tuple]:
        self.buf += delta
        events: list[tuple] = []
        while True:
            if not self.in_tool:
                start = self.buf.find(TOOL_OPEN)
                if start >= 0:
                    if start:
                        events.append(("content", self.buf[:start]))
                    self.buf = self.buf[start + len(TOOL_OPEN) :]
                    self.in_tool = True
                    self.tool_index += 1
                    self._header_sent = False
                    self._body = ""
                    self._args_sent = 0
                    continue
                # hold back any suffix that could open a tool tag
                keep = self._partial_suffix(self.buf, TOOL_OPEN)
                emit = self.buf[: len(self.buf) - keep]
                if emit:
                    events.append(("content", emit))
                self.buf = self.buf[len(self.buf) - keep :]
                return events
            end = self.buf.find(TOOL_CLOSE)
            if end >= 0:
                self._body += self.buf[:end]
                self.buf = self.buf[end + len(TOOL_CLOSE) :]
                events.extend(self._emit_tool_progress(closed=True))
                self.in_tool = False
                continue
            self._body += self.buf
            self.buf = ""
            # hold back a possible partial close tag before emitting
            keep = self._partial_suffix(self._body, TOOL_CLOSE)
            if keep:
                self.buf = self._body[len(self._body) - keep :]
                self._body = self._body[: len(self._body) - keep]
            events.extend(self._emit_tool_progress(closed=False))
            return events

    @staticmethod
    def _partial_suffix(s: str, tag: str) -> int:
        """Length of the longest suffix of ``s`` that is a proper
        prefix of ``tag`` (text we must hold back across deltas)."""
        for k in range(min(len(tag) - 1, len(s)), 0, -1):
            if s.endswith(tag[:k]):
                return k
        return 0

    def finish(self) -> list[tuple]:
        """Flush at end-of-stream (unterminated blocks become content)."""
        events: list[tuple] = []
        if self.in_tool:
            # stream closed mid-block: emit what remains as args and end
            events.extend(self._emit_tool_progress(closed=True))
            self.in_tool = False
        elif self.buf:
            events.append(("content", self.buf))
            self.buf = ""
        return events

    # -------------------------------------------------------- internals
    def _emit_tool_progress(self, closed: bool) -> list[tuple]:
        """Parse the buffered block body far enough to stream name +
        argument fragments."""
        events: list[tuple] = []
        body = self._body.strip()
        if not self._header_sent:
            name = self._try_name(body)
            if name is None:
                if not closed:
                    return events
                name = ""
            events.append(
                (
                    "tool_start",
                    self.tool_index,
                    make_tool_call_id(),
                    name,
                )
            )
            self._header_sent = True
        frag = self._args_fragment(body, closed)
        if frag:
            events.append(("tool_args", self.tool_index, frag))
            self._args_sent += len(frag)
        if closed:
            events.append(("tool_end", self.tool_index))
        return events

    @staticmethod
    def _try_name(body: str) -> str | None:
        key = '"name"'
        i = body.find(key)
        if i < 0:
            return None
        j = body.find(":", i + len(key))
        if j < 0:
            return None
        k = body.find('"', j + 1)
        if k < 0:
            return None
        m = body.find('"', k + 1)
        if m < 0:
            return None
        return body[k + 1 : m]

    def _args_fragment(self, body: str, closed: bool) -> str:
        """The portion of the ``arguments`` value text not yet sent."""
        key = '"arguments"'
        i = body.find(key)
        if i < 0:
            if closed and self._args_sent == 0:
                return "{}"
            return ""
        j = body.find(":", i + len(key))
        if j < 0:
            return ""
        val = body[j + 1 :].lstrip()
        if closed:
            # strip the object's trailing brace belonging to the wrapper
            val = val.rstrip()
            if val.endswith("}") and not _balanced(val):
                val = val[:-1].rstrip()
        else:
            # never stream past a possibly-incomplete token: hold back
            # the last char unless the value is already balanced
            if not _balanced(val):
                val = val[:-1] if val else ""
        return val[self._args_sent :]


def _balanced(s: str) -> bool:
    """True when braces/brackets/quotes in ``s`` are balanced (ignoring
    escapes inside strings)."""
    depth = 0
    in_str = False
    esc = False
    for ch in s:
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch in "{[":
            depth += 1
        elif ch in "}]":
            depth -= 1
    return depth == 0 and not in_str


def render_tools_preamble(tools: list[dict]) -> str:
    """Fallback system-prompt injection for tokenizers whose chat
    template has no ``tools`` support (reference behavior comes from HF
    templates; this keeps template-less checkpoints usable)."""
    specs = json.dumps(
        [t.get("function", t) for t in tools], ensure_ascii=False
    )
    return (
        "# Tools\n\nYou may call one or more functions to assist with "
        "the user query.\n\nAvailable functions:\n" + specs + "\n\n"
        "To call a function, respond with a block of the form:\n"
        f"{TOOL_OPEN}\n"
        '{"name": "<function-name>", "arguments": <args-json>}\n'
        f"{TOOL_CLOSE}"
    )
