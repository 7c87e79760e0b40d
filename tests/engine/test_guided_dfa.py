"""Guided-decoding DFA + token-mask unit tests (guided/)."""

import numpy as np
import pytest

from ht_vllm_omni_tpu.guided.regex_dfa import DEAD, compile_regex
from ht_vllm_omni_tpu.guided.json_schema import schema_to_regex


def fullmatch(dfa, s: str) -> bool:
    st = 0
    for b in s.encode():
        st = int(dfa.trans[st, b])
        if st == DEAD:
            return False
    return bool(dfa.accept[st])


@pytest.mark.parametrize("pat,good,bad", [
    (r"abc", ["abc"], ["ab", "abcd", ""]),
    (r"a*b+", ["b", "aab", "abbb"], ["a", "", "ba"]),
    (r"(foo|bar)?baz", ["baz", "foobaz", "barbaz"], ["bazbaz", "foo"]),
    (r"[a-c]{2,3}", ["ab", "abc", "ccc"], ["a", "abcd", "zd"]),
    (r"-?(0|[1-9]\d*)(\.\d+)?", ["0", "-12", "3.14"], ["00", "1.", "-"]),
    (r'"(\\.|[^"\\])*"', ['""', '"hi"', '"a\\"b"'], ['"', '"a', 'a"']),
    (r"a{3}", ["aaa"], ["aa", "aaaa"]),
    (r"x{2,}", ["xx", "xxxx"], ["x"]),
])
def test_regex_fullmatch(pat, good, bad):
    dfa = compile_regex(pat)
    for s in good:
        assert fullmatch(dfa, s), (pat, s)
    for s in bad:
        assert not fullmatch(dfa, s), (pat, s)


def test_json_object_grammar():
    dfa = compile_regex(schema_to_regex(True, depth=3))
    for s in ['{}', '{"a": 1}', '{"a": {"b": [1, 2]}, "c": "x"}',
              '{"s": "he\\"llo", "n": -2.5e3, "b": true, "z": null}']:
        assert fullmatch(dfa, s), s
    for s in ['', '{', '{"a"}', '[1]', '{"a": }', '{a: 1}']:
        assert not fullmatch(dfa, s), s


def test_schema_object():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"}},
        },
        "required": ["name", "age"],
    }
    dfa = compile_regex(schema_to_regex(schema))
    assert fullmatch(dfa, '{"name": "bo", "age": 3}')
    assert fullmatch(dfa, '{"name": "bo", "age": 3, "tags": ["x"]}')
    assert not fullmatch(dfa, '{"age": 3}')
    assert not fullmatch(dfa, '{"name": "bo", "age": "x"}')


def test_schema_enum_and_anyof():
    dfa = compile_regex(schema_to_regex(
        {"enum": ["red", "green", 3, True]}
    ))
    for s in ['"red"', '"green"', "3", "true"]:
        assert fullmatch(dfa, s)
    assert not fullmatch(dfa, '"blue"')
    dfa2 = compile_regex(schema_to_regex(
        {"anyOf": [{"type": "integer"}, {"type": "boolean"}]}
    ))
    assert fullmatch(dfa2, "42") and fullmatch(dfa2, "false")
    assert not fullmatch(dfa2, '"s"')


class ByteTokenizer:
    """1 token = 1 byte (ids 0-255), id 256 = eos."""

    def decode(self, ids):
        return bytes(i for i in ids if i < 256).decode("latin-1")


def test_guided_matcher_masks():
    from ht_vllm_omni_tpu.guided.token_mask import GuidedEngine

    eng = GuidedEngine(ByteTokenizer(), 257, eos_token_id=256)
    m = eng.matcher_for_regex(r"ab+c")
    mask = m.allowed_mask()
    assert mask[ord("a")] and not mask[ord("b")] and not mask[256]
    assert m.advance(ord("a"))
    mask = m.allowed_mask()
    assert mask[ord("b")] and not mask[ord("a")]
    assert m.advance(ord("b"))
    mask = m.allowed_mask()
    assert mask[ord("b")] and mask[ord("c")] and not mask[256]
    assert m.advance(ord("c"))
    assert m.accepting
    assert m.allowed_mask()[256]  # EOS allowed once accepted
    assert not m.advance(ord("x"))  # dead


def test_unsupported_constructs_rejected_loudly():
    """Backreferences / lookaround / named groups / word boundaries must
    raise (previously parsed silently as literals — a pattern like
    '(a)\\1' would quietly match 'a1')."""
    import pytest

    from ht_vllm_omni_tpu.guided import compile_regex

    for pat in (r"(a)\1", r"(?=foo)bar", r"(?!x)y", r"(?P<n>a)",
                r"\bword\b", r"\p{L}+"):
        with pytest.raises(ValueError):
            compile_regex(pat)
    # the documented subset still compiles
    for pat in (r"a{2,5}", r"(yes|no)", r"[a-z\\]+", r"\$\d+\.\d{2}",
                r"(?:ab)+c?"):
        compile_regex(pat)
