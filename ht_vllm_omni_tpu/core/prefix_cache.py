"""Content-addressed prefix caching over the page pool.

The vLLM feature the reference toggles per stage (enable_prefix_caching
in its stage engine args): full prompt pages are chain-hashed by their
token content; a new request whose prompt prefix matches cached pages
shares them (ref-counted) and prefills only the tail as a chunk (the
chunked-prefill path computes the remainder against the shared context
pages).  Safety: only FULL, completely-written pages are ever shared, and
new tokens always land in freshly-allocated pages, so shared pages are
immutable.

Hashing is sha256 chained over the page's token bytes + its prefix hash
(the same collision-resistance stance upstream vLLM takes for exactly
this reason: a colliding non-cryptographic hash would silently serve
another prompt's KV).  With a dp-partitioned page pool, entries are
additionally keyed by pool group — a page is only reachable from the dp
shard whose cache actually holds it.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict

from ht_vllm_omni_tpu.core.block_pool import PagePool


def chain_hashes(token_ids: list[int], page_size: int) -> list[bytes]:
    """One sha256 digest per FULL page, chained so a page's identity
    covers its whole prefix."""
    hashes = []
    prev = b""
    for start in range(0, len(token_ids) - page_size + 1, page_size):
        page = token_ids[start : start + page_size]
        payload = b"".join(
            int(t).to_bytes(8, "little", signed=True) for t in page
        )
        prev = hashlib.sha256(prev + payload).digest()
        hashes.append(prev)
    return hashes


class PrefixCache:
    def __init__(self, pool: PagePool, page_size: int) -> None:
        self.pool = pool
        self.page_size = page_size
        # (group, chain hash) -> physical page id (holds one pool ref each)
        self._pages: OrderedDict[tuple[int, bytes], int] = OrderedDict()

    def __len__(self) -> int:
        return len(self._pages)

    # ------------------------------------------------------------ lookup
    def match(self, token_ids: list[int], group: int = 0) -> list[int]:
        """Longest cached page run for this prompt; shares each matched
        page (caller owns the new refs).  Never matches the entire prompt
        (at least one token must run to produce logits)."""
        matched: list[int] = []
        limit = len(token_ids) - 1  # leave >= 1 token to prefill
        for h in chain_hashes(token_ids, self.page_size):
            if (len(matched) + 1) * self.page_size > limit:
                break
            page = self._pages.get((group, h))
            if page is None:
                break
            self._pages.move_to_end((group, h))
            matched.append(self.pool.share(page))
        return matched

    # ---------------------------------------------------------- register
    def register(
        self, token_ids: list[int], page_ids: list[int], group: int = 0
    ) -> None:
        """Publish a request's full prompt pages after its prefill."""
        for i, h in enumerate(chain_hashes(token_ids, self.page_size)):
            if i >= len(page_ids):
                break
            if (group, h) not in self._pages:
                self._pages[(group, h)] = self.pool.share(page_ids[i])
                self._pages.move_to_end((group, h))

    # ------------------------------------------------------------- evict
    def evict(self, num_pages: int, group: int | None = None) -> int:
        """Drop up to num_pages LRU entries (optionally only from one pool
        group); returns pages released."""
        released = 0
        for key in list(self._pages.keys()):
            if released >= num_pages:
                break
            if group is not None and key[0] != group:
                continue
            page = self._pages.pop(key)
            self.pool.free([page])
            released += 1
        return released
