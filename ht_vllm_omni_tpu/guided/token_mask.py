"""Per-DFA-state vocab masks for guided decoding.

Bridges guided/regex_dfa.py to the sampler: for the matcher's current
DFA state, which whole TOKENS may be emitted next?  A token is allowed
iff walking its byte sequence from the state stays out of the dead
state AND ends somewhere live (an accepting state remains reachable).
Masks are computed lazily per visited state with a vectorized walk over
the padded token-byte matrix (~one numpy pass per new state, cached —
the decode loop visits one state per emitted token), the same
lazy-per-state strategy as vLLM's FSM logits processors.
"""

from __future__ import annotations

import numpy as np

from ht_vllm_omni_tpu.guided.regex_dfa import DEAD, DFA, compile_regex


def _token_bytes(tokenizer, vocab_size: int) -> tuple[np.ndarray, np.ndarray]:
    """[V, Lmax] uint8 byte matrix + [V] lengths for every token id.

    Tokens the tokenizer cannot decode standalone (specials, byte
    fallbacks it renders as replacement chars) get length 0 and are
    never allowed while guided."""
    texts: list[bytes] = []
    for tid in range(vocab_size):
        try:
            s = tokenizer.decode([tid])
        except Exception:
            s = ""
        if "�" in s:  # partial UTF-8 byte token — disallow
            s = ""
        texts.append(s.encode("utf-8"))
    lens = np.array([len(t) for t in texts], np.int32)
    lmax = max(1, int(lens.max()))
    mat = np.zeros((vocab_size, lmax), np.uint8)
    for tid, t in enumerate(texts):
        if t:
            mat[tid, : len(t)] = np.frombuffer(t, np.uint8)
    return mat, lens


class GuidedMatcher:
    """Host-side per-request matcher: current DFA state + lazy masks."""

    def __init__(
        self,
        dfa: DFA,
        token_bytes: np.ndarray,
        token_lens: np.ndarray,
        eos_token_id: int | None,
        shared_caches: tuple[dict, dict] | None = None,
    ):
        self.dfa = dfa
        self.tb = token_bytes
        self.tl = token_lens
        self.eos = eos_token_id
        self.state = 0
        # caches key on DFA state only, so requests sharing a grammar
        # share them (GuidedEngine passes per-DFA dicts — steady-state
        # guided traffic pays the vectorized token walk once per state,
        # the vLLM FSM-processor design)
        if shared_caches is not None:
            self._mask_cache, self._next_cache = shared_caches
        else:
            self._mask_cache = {}
            self._next_cache = {}

    # ------------------------------------------------------------ masks
    def allowed_mask(self) -> np.ndarray:
        """[V] bool for the CURRENT state; EOS allowed iff accepting."""
        m = self._mask_cache.get(self.state)
        if m is None:
            m = self._compute_mask(self.state)
            self._mask_cache[self.state] = m
        m = m.copy()
        if self.eos is not None and 0 <= self.eos < m.shape[0]:
            m[self.eos] = bool(self.dfa.accept[self.state])
        if not m.any():
            # dead end (e.g. max nesting exceeded): allow EOS so the
            # request can finish instead of sampling from -inf rows
            if self.eos is not None:
                m[self.eos] = True
        return m

    def _compute_mask(self, state: int) -> np.ndarray:
        v, lmax = self.tb.shape
        trans = self.dfa.trans
        cur = np.full(v, state, np.uint32)
        alivemask = self.tl > 0
        for j in range(lmax):
            active = alivemask & (j < self.tl) & (cur != DEAD)
            if not active.any():
                break
            nxt = cur.copy()
            rows = cur[active].astype(np.int64)
            cols = self.tb[active, j].astype(np.int64)
            nxt[active] = trans[rows, cols]
            cur = nxt
        ok = alivemask & (cur != DEAD)
        live = np.zeros(v, bool)
        live[ok] = self.dfa.live[cur[ok].astype(np.int64)]
        return live

    # ---------------------------------------------------------- advance
    def advance(self, token_id: int) -> bool:
        """Consume an emitted token; False when it killed the match."""
        if self.eos is not None and token_id == self.eos:
            return bool(self.dfa.accept[self.state])
        key = (self.state, token_id)
        nxt = self._next_cache.get(key)
        if nxt is None:
            s = self.state
            n = int(self.tl[token_id])
            for j in range(n):
                s = int(self.dfa.trans[s, int(self.tb[token_id, j])])
                if s == DEAD:
                    break
            nxt = s
            self._next_cache[key] = nxt
        if nxt == DEAD:
            return False
        self.state = nxt
        return True

    @property
    def accepting(self) -> bool:
        return bool(self.dfa.accept[self.state])


class GuidedEngine:
    """Per-(tokenizer, grammar) factory with caching."""

    def __init__(self, tokenizer, vocab_size: int, eos_token_id=None):
        self.tokenizer = tokenizer
        self.vocab_size = vocab_size
        self.eos = eos_token_id
        self._tb = None
        self._dfas: dict[str, DFA] = {}
        self._caches: dict[str, tuple[dict, dict]] = {}

    def _bytes(self):
        if self._tb is None:
            self._tb = _token_bytes(self.tokenizer, self.vocab_size)
        return self._tb

    def matcher_for_regex(self, pattern: str) -> GuidedMatcher:
        dfa = self._dfas.get(pattern)
        if dfa is None:
            dfa = compile_regex(pattern)
            self._dfas[pattern] = dfa
            self._caches[pattern] = ({}, {})
        tb, tl = self._bytes()
        return GuidedMatcher(
            dfa, tb, tl, self.eos,
            shared_caches=self._caches[pattern],
        )

    def matcher_for_json(self, schema) -> GuidedMatcher:
        from ht_vllm_omni_tpu.guided.json_schema import schema_to_regex

        key = "json:" + repr(schema)
        dfa = self._dfas.get(key)
        if dfa is None:
            dfa = compile_regex(schema_to_regex(schema))
            self._dfas[key] = dfa
            self._caches[key] = ({}, {})
        tb, tl = self._bytes()
        return GuidedMatcher(
            dfa, tb, tl, self.eos,
            shared_caches=self._caches[key],
        )
