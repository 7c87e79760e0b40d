"""JSON-schema (subset) -> byte-regex for guided decoding.

Counterpart of the outlines/xgrammar schema compilers behind vLLM's
``response_format={"type": "json_schema"}`` (the reference inherits
that surface from upstream serving).  JSON nesting is not regular, so
free-form values expand to a bounded-depth grammar (default 4 levels —
the same practical trick bounded-FSM implementations use).

Supported schema keywords: type (object/array/string/number/integer/
boolean/null), properties (+required; additionalProperties ignored),
items, enum (strings/numbers/bools), const, anyOf/oneOf, minItems /
maxItems (small counts), pattern (embedded verbatim for strings).
Unknown constructs degrade to the free-form value grammar.
"""

from __future__ import annotations

import json

_WS = r"[ \t\n\r]{0,2}"
_STRING = r'"(\\.|[^"\\])*"'
_NUMBER = r"-?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?"
_INTEGER = r"-?(0|[1-9]\d*)"
_BOOL = r"(true|false)"
_NULL = r"null"


def _free_value(depth: int) -> str:
    """Any JSON value with nesting bounded at ``depth``."""
    scalars = f"({_STRING}|{_NUMBER}|{_BOOL}|{_NULL})"
    if depth <= 0:
        return scalars
    inner = _free_value(depth - 1)
    obj = (
        r"\{" + _WS
        + f"({_STRING}{_WS}:{_WS}{inner}"
        + f"({_WS},{_WS}{_STRING}{_WS}:{_WS}{inner})*)?"
        + _WS + r"\}"
    )
    arr = (
        r"\[" + _WS
        + f"({inner}({_WS},{_WS}{inner})*)?"
        + _WS + r"\]"
    )
    return f"({scalars}|{obj}|{arr})"


def _lit(s: str) -> str:
    out = []
    for ch in s:
        if ch in r"\.^$*+?{}[]()|/":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def schema_to_regex(schema, depth: int = 4) -> str:
    """Compile a schema (dict, or True for free-form JSON object)."""
    if schema is True or schema is None or schema == {}:
        # json_object mode: any object at bounded depth
        inner = _free_value(depth - 1)
        return (
            r"\{" + _WS
            + f"({_STRING}{_WS}:{_WS}{inner}"
            + f"({_WS},{_WS}{_STRING}{_WS}:{_WS}{inner})*)?"
            + _WS + r"\}"
        )
    return _node(schema, depth)


def _node(schema: dict, depth: int) -> str:
    if not isinstance(schema, dict):
        return _free_value(depth)
    if "const" in schema:
        return _lit(json.dumps(schema["const"]))
    if "enum" in schema:
        opts = "|".join(_lit(json.dumps(v)) for v in schema["enum"])
        return f"({opts})"
    for key in ("anyOf", "oneOf"):
        if key in schema:
            opts = "|".join(
                _node(s, depth) for s in schema[key]
            )
            return f"({opts})"
    t = schema.get("type")
    if isinstance(t, list):
        return "(" + "|".join(
            _node({**schema, "type": x}, depth) for x in t
        ) + ")"
    if t == "string":
        if "pattern" in schema:
            # the DFA compiler has no anchors — fullmatch semantics make
            # the common ^...$ form equivalent, so strip them rather
            # than matching literal '^'/'$' bytes
            pat = schema["pattern"]
            if pat.startswith("^"):
                pat = pat[1:]
            if pat.endswith("$") and not pat.endswith("\\$"):
                pat = pat[:-1]
            return f'"({pat})"'
        return _STRING
    if t == "number":
        return _NUMBER
    if t == "integer":
        return _INTEGER
    if t == "boolean":
        return _BOOL
    if t == "null":
        return _NULL
    if t == "array":
        item = _node(schema.get("items", {}), depth - 1)
        lo = int(schema.get("minItems", 0))
        hi = schema.get("maxItems")
        more = f"({_WS},{_WS}{item})"
        if hi is None:
            body = (
                f"({item}{more}*)?" if lo == 0
                else f"{item}{more}{{{lo - 1},}}"
            )
        else:
            hi = int(hi)
            if hi == 0:
                body = ""  # only the empty array is admissible
            elif lo == 0:
                body = f"({item}{more}{{0,{hi - 1}}})?"
            else:
                body = f"{item}{more}{{{lo - 1},{hi - 1}}}"
        return r"\[" + _WS + body + _WS + r"\]"
    if t == "object" and "properties" in schema:
        props = schema["properties"]
        required = set(
            schema.get("required", list(props))
        )
        # fixed key order (schema order), optional props may be absent
        parts = []
        for name, sub in props.items():
            pair = (
                f'"{_lit(name)}"{_WS}:{_WS}{_node(sub, depth - 1)}'
            )
            parts.append((pair, name in required))
        # build sequences: first emitted pair has no leading comma
        # handle optionality by regex alternation over presence masks of
        # OPTIONAL props (fixed order keeps the DFA small)
        opt_idx = [i for i, (_, req) in enumerate(parts) if not req]
        if len(opt_idx) > 6:
            # too many optional combos — degrade to free-form object
            return schema_to_regex(True, depth)
        combos = []
        for mask in range(1 << len(opt_idx)):
            chosen = []
            for i, (p, req) in enumerate(parts):
                if req or (mask >> opt_idx.index(i)) & 1:
                    chosen.append(p)
            if not chosen:
                combos.append("")
            else:
                combos.append(
                    chosen[0]
                    + "".join(
                        f"{_WS},{_WS}{c}" for c in chosen[1:]
                    )
                )
        body = "|".join(f"({c})" if c else "()" for c in set(combos))
        return r"\{" + _WS + f"({body})" + _WS + r"\}"
    if t == "object":
        return schema_to_regex(True, depth)
    return _free_value(depth)
