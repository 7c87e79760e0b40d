"""Byte-level regex -> DFA compiler for guided decoding.

TPU-native replacement for the xgrammar/outlines FSM machinery vLLM's
structured outputs lean on (the reference inherits response_format
handling from upstream vLLM serving): a small regex subset compiles to
a byte-alphabet DFA; guided/token_mask.py then classifies whole vocab
tokens against DFA states so the decode loop can mask logits.

Supported syntax (enough for JSON grammars, guided/json_schema.py):
literals, UTF-8 multibyte literals (as byte sequences), escapes
(\\n \\t \\r \\\\ \\" \\. \\d \\w \\s and their complements), ``.``
(any byte except \\n), character classes ``[a-z_]`` / ``[^"\\\\]`` with
ranges and escapes, grouping ``(...)``, alternation ``|``, repetition
``* + ? {m} {m,} {m,n}``.  Matching is anchored (fullmatch semantics).

Construction: recursive-descent parse -> Thompson NFA -> subset
construction -> dense [n_states, 256] uint16 transition table with a
dead state, plus an accepting-state bitmap.  State 0 is the start.
"""

from __future__ import annotations

import dataclasses

import numpy as np

DEAD = 0xFFFF  # dead-state sentinel in the dense table


# ------------------------------------------------------------- parsing
class _Frag:
    """NFA fragment: start node + list of dangling (node, via-eps) outs."""

    __slots__ = ("start", "outs")

    def __init__(self, start, outs):
        self.start = start
        self.outs = outs


class _Node:
    """NFA node: byte-class edges [(byteset, node)] + epsilon edges."""

    __slots__ = ("edges", "eps", "accept")

    def __init__(self):
        self.edges: list[tuple[frozenset, "_Node"]] = []
        self.eps: list["_Node"] = []
        self.accept = False


_DIGITS = frozenset(range(0x30, 0x3A))
_WORD = frozenset(
    list(range(0x30, 0x3A))
    + list(range(0x41, 0x5B))
    + list(range(0x61, 0x7B))
    + [0x5F]
)
_SPACE = frozenset([0x20, 0x09, 0x0A, 0x0D, 0x0C, 0x0B])
_ANY = frozenset(i for i in range(256) if i != 0x0A)
_ALL = frozenset(range(256))


class _Parser:
    def __init__(self, pattern: str):
        self.b = pattern.encode("utf-8")
        self.i = 0

    def peek(self):
        return self.b[self.i] if self.i < len(self.b) else None

    def take(self):
        c = self.b[self.i]
        self.i += 1
        return c

    # regex := alt
    def parse(self) -> _Frag:
        frag = self._alt()
        if self.i != len(self.b):
            raise ValueError(
                f"trailing regex input at byte {self.i}"
            )
        return frag

    def _alt(self) -> _Frag:
        branches = [self._concat()]
        while self.peek() == 0x7C:  # |
            self.take()
            branches.append(self._concat())
        if len(branches) == 1:
            return branches[0]
        start = _Node()
        outs = []
        for f in branches:
            start.eps.append(f.start)
            outs.extend(f.outs)
        return _Frag(start, outs)

    def _concat(self) -> _Frag:
        frags = []
        while True:
            c = self.peek()
            if c is None or c in (0x7C, 0x29):  # | )
                break
            frags.append(self._repeat())
        if not frags:
            n = _Node()
            return _Frag(n, [n])
        cur = frags[0]
        for nxt in frags[1:]:
            for o in cur.outs:
                o.eps.append(nxt.start)
            cur = _Frag(cur.start, nxt.outs)
        return cur

    def _repeat(self) -> _Frag:
        atom_start = self.i
        frag = self._atom()
        c = self.peek()
        if c == 0x2A:  # *
            self.take()
            return self._star(frag)
        if c == 0x2B:  # +
            self.take()
            second = self._clone(atom_start)
            star = self._star(second)
            for o in frag.outs:
                o.eps.append(star.start)
            return _Frag(frag.start, star.outs)
        if c == 0x3F:  # ?
            self.take()
            start = _Node()
            start.eps.append(frag.start)
            return _Frag(start, frag.outs + [start])
        if c == 0x7B:  # {m[,n]}
            save = self.i
            self.take()
            spec = bytearray()
            while self.peek() is not None and self.peek() != 0x7D:
                spec.append(self.take())
            if self.peek() != 0x7D:
                self.i = save
                return frag
            self.take()
            txt = spec.decode()
            if "," in txt:
                lo_s, hi_s = txt.split(",", 1)
                lo = int(lo_s or 0)
                hi = int(hi_s) if hi_s else None
            else:
                lo = hi = int(txt)
            return self._counted(atom_start, frag, lo, hi)
        return frag

    def _clone(self, at: int) -> _Frag:
        save = self.i
        self.i = at
        f = self._atom()
        self.i = save
        return f

    def _star(self, frag: _Frag) -> _Frag:
        start = _Node()
        start.eps.append(frag.start)
        for o in frag.outs:
            o.eps.append(frag.start)
        return _Frag(start, [start] + frag.outs)

    def _counted(self, at, first, lo, hi) -> _Frag:
        """atom{lo,hi} by explicit expansion (hi=None -> lo copies + *)."""
        parts = [first] + [
            self._clone(at) for _ in range(max(lo - 1, 0))
        ]
        if lo == 0:
            parts = []
        opt: list[_Frag] = []
        if hi is None:
            opt = [self._star(self._clone(at))]
        else:
            for _ in range(hi - lo):
                f = self._clone(at)
                start = _Node()
                start.eps.append(f.start)
                opt.append(_Frag(start, f.outs + [start]))
        chain = parts + opt
        if not chain:
            n = _Node()
            return _Frag(n, [n])
        cur = chain[0]
        for nxt in chain[1:]:
            for o in cur.outs:
                o.eps.append(nxt.start)
            cur = _Frag(cur.start, nxt.outs)
        return cur

    def _atom(self) -> _Frag:
        c = self.take()
        if c == 0x28:  # (
            # non-capturing group markers pass through; every other (?
            # construct (lookahead (?= (?!, lookbehind (?<, named groups
            # (?P<, flags (?i...) is unsupported — reject loudly rather
            # than silently matching the marker bytes as literals
            if self.peek() == 0x3F:
                if self.i + 1 < len(self.b) and self.b[self.i + 1] == 0x3A:
                    self.take()
                    self.take()
                else:
                    nxt = (
                        chr(self.b[self.i + 1])
                        if self.i + 1 < len(self.b) else ""
                    )
                    raise ValueError(
                        f"unsupported group construct '(?{nxt}' — only "
                        "plain (...) and non-capturing (?:...) groups "
                        "are supported (no lookaround, named groups, "
                        "or inline flags)"
                    )
            f = self._alt()
            if self.peek() != 0x29:
                raise ValueError("unbalanced group")
            self.take()
            return f
        if c == 0x5B:  # [
            return self._byteset_frag(self._char_class())
        if c == 0x2E:  # .
            return self._byteset_frag(_ANY)
        if c == 0x5C:  # backslash
            return self._byteset_frag(self._escape())
        return self._byteset_frag(frozenset([c]))

    def _escape(self) -> frozenset:
        e = self.take()
        table = {
            0x64: _DIGITS,                      # \d
            0x44: _ALL - _DIGITS,               # \D
            0x77: _WORD,                        # \w
            0x57: _ALL - _WORD,                 # \W
            0x73: _SPACE,                       # \s
            0x53: _ALL - _SPACE,                # \S
            0x6E: frozenset([0x0A]),            # \n
            0x74: frozenset([0x09]),            # \t
            0x72: frozenset([0x0D]),            # \r
        }
        if e in table:
            return table[e]
        if e == 0x78:  # \xHH
            h = bytes([self.take(), self.take()]).decode()
            return frozenset([int(h, 16)])
        if 0x31 <= e <= 0x39:  # \1..\9
            raise ValueError(
                f"backreference \\{chr(e)} is not supported (the "
                "compiler builds a true DFA; backreferences need a "
                "backtracking engine)"
            )
        if e in (0x62, 0x42, 0x41, 0x5A, 0x7A, 0x70, 0x50):
            # \b \B \A \Z \z \p \P — anchors/boundaries/unicode classes
            raise ValueError(
                f"escape \\{chr(e)} is not supported (patterns "
                "full-match the output; word boundaries and unicode "
                "property classes are unavailable)"
            )
        return frozenset([e])  # literal escape (\. \\ \" \[ ...)

    def _char_class(self) -> frozenset:
        negate = False
        if self.peek() == 0x5E:  # ^
            self.take()
            negate = True
        out: set[int] = set()
        first = True
        while True:
            c = self.peek()
            if c is None:
                raise ValueError("unterminated class")
            if c == 0x5D and not first:  # ]
                self.take()
                break
            first = False
            self.take()
            if c == 0x5C:
                cs = self._escape()
                out.update(cs)
                continue
            # range?
            if (
                self.peek() == 0x2D
                and self.i + 1 < len(self.b)
                and self.b[self.i + 1] != 0x5D
            ):
                self.take()  # -
                hi = self.take()
                if hi == 0x5C:
                    hi = min(self._escape())
                out.update(range(c, hi + 1))
            else:
                out.add(c)
        return frozenset(_ALL - out if negate else out)

    @staticmethod
    def _byteset_frag(byteset: frozenset) -> _Frag:
        a, b = _Node(), _Node()
        a.edges.append((byteset, b))
        return _Frag(a, [b])


# --------------------------------------------------- subset construction
@dataclasses.dataclass
class DFA:
    trans: np.ndarray  # [n_states, 256] uint16, DEAD = dead
    accept: np.ndarray  # [n_states] bool
    # live[s] = some byte path from s reaches an accepting state
    live: np.ndarray  # [n_states] bool


def compile_regex(pattern: str, max_states: int = 20000) -> DFA:
    frag = _Parser(pattern).parse()
    end = _Node()
    end.accept = True
    for o in frag.outs:
        o.eps.append(end)

    def closure(nodes) -> frozenset:
        stack = list(nodes)
        seen = set(stack)
        while stack:
            n = stack.pop()
            for e in n.eps:
                if e not in seen:
                    seen.add(e)
                    stack.append(e)
        return frozenset(seen)

    start = closure([frag.start])
    states: dict[frozenset, int] = {start: 0}
    order = [start]
    trans_rows: list[np.ndarray] = []
    i = 0
    while i < len(order):
        cur = order[i]
        i += 1
        row = np.full(256, DEAD, np.uint16)
        # group target node-sets per byte
        by_byte: dict[int, set] = {}
        for n in cur:
            for byteset, tgt in n.edges:
                for b in byteset:
                    by_byte.setdefault(b, set()).add(tgt)
        cache: dict[frozenset, int] = {}
        for b, tgts in by_byte.items():
            key = frozenset(tgts)
            sid = cache.get(key)
            if sid is None:
                cl = closure(key)
                sid = states.get(cl)
                if sid is None:
                    sid = len(order)
                    if sid >= max_states:
                        raise ValueError(
                            "regex DFA exceeds max_states "
                            f"({max_states}) — simplify the grammar"
                        )
                    states[cl] = sid
                    order.append(cl)
                cache[key] = sid
            row[b] = sid
        trans_rows.append(row)
    trans = np.stack(trans_rows)
    accept = np.array(
        [any(n.accept for n in s) for s in order], bool
    )
    # liveness: backward reachability to accepting states
    live = accept.copy()
    changed = True
    while changed:
        changed = False
        reach = np.zeros(len(order), bool)
        for s in range(len(order)):
            if live[s]:
                continue
            row = trans[s]
            valid = row[row != DEAD].astype(np.int64)
            if valid.size and live[valid].any():
                reach[s] = True
        if reach.any():
            live |= reach
            changed = True
    return DFA(trans=trans, accept=accept, live=live)
