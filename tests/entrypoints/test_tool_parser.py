"""Hermes-style tool-call parsing (entrypoints/openai/tool_parser.py).

Reference parity: vLLM Hermes2Pro conventions routed through reference
serving_chat.py:189-221."""

import json

from ht_vllm_omni_tpu.entrypoints.openai.tool_parser import (
    StreamingToolParser,
    parse_tool_calls,
    render_tools_preamble,
)

BLOCK = (
    'Let me check.\n<tool_call>\n{"name": "get_weather", '
    '"arguments": {"city": "Paris", "unit": "C"}}\n</tool_call>'
)


def test_parse_full_single():
    content, calls = parse_tool_calls(BLOCK)
    assert content == "Let me check."
    assert len(calls) == 1
    c = calls[0]
    assert c["type"] == "function"
    assert c["function"]["name"] == "get_weather"
    assert json.loads(c["function"]["arguments"]) == {
        "city": "Paris", "unit": "C",
    }
    assert c["id"].startswith("call_")


def test_parse_full_multiple_and_malformed():
    text = (
        '<tool_call>{"name": "a", "arguments": {}}</tool_call>'
        "<tool_call>not json</tool_call>"
        '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>'
    )
    content, calls = parse_tool_calls(text)
    assert [c["function"]["name"] for c in calls] == ["a", "b"]
    # the malformed block survives in content rather than vanishing
    assert "not json" in (content or "")


def test_parse_no_tools():
    content, calls = parse_tool_calls("just some text")
    assert content == "just some text"
    assert calls == []


def test_streaming_events_match_full_parse():
    # feed in awkward splits, including mid-tag
    text = BLOCK + " Done."
    for chunk in (1, 3, 7, len(text)):
        p = StreamingToolParser()
        events = []
        for i in range(0, len(text), chunk):
            events += p.feed(text[i : i + chunk])
        events += p.finish()
        content = "".join(e[1] for e in events if e[0] == "content")
        starts = [e for e in events if e[0] == "tool_start"]
        args = "".join(e[2] for e in events if e[0] == "tool_args")
        ends = [e for e in events if e[0] == "tool_end"]
        assert content.split() == ["Let", "me", "check.", "Done."]
        assert len(starts) == 1 and len(ends) == 1
        assert starts[0][3] == "get_weather"
        assert json.loads(args) == {"city": "Paris", "unit": "C"}


def test_streaming_two_calls():
    text = (
        '<tool_call>{"name": "a", "arguments": {"i": 1}}</tool_call>'
        'mid'
        '<tool_call>{"name": "b", "arguments": {"j": 2}}</tool_call>'
    )
    p = StreamingToolParser()
    events = []
    for ch in text:
        events += p.feed(ch)
    events += p.finish()
    starts = [e for e in events if e[0] == "tool_start"]
    assert [(s[1], s[3]) for s in starts] == [(0, "a"), (1, "b")]
    args = {0: "", 1: ""}
    for e in events:
        if e[0] == "tool_args":
            args[e[1]] += e[2]
    assert json.loads(args[0]) == {"i": 1}
    assert json.loads(args[1]) == {"j": 2}
    content = "".join(e[1] for e in events if e[0] == "content")
    assert content == "mid"


def test_preamble_mentions_tools():
    pre = render_tools_preamble(
        [{"type": "function", "function": {"name": "f", "parameters": {}}}]
    )
    assert "tool_call" in pre and '"f"' in pre
