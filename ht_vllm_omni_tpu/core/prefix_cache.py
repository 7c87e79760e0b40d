"""Content-addressed prefix caching over the page pool.

The vLLM feature the reference toggles per stage (enable_prefix_caching
in its stage engine args): full prompt pages are chain-hashed by their
token content; a new request whose prompt prefix matches cached pages
shares them (ref-counted) and prefills only the tail as a chunk (the
chunked-prefill path computes the remainder against the shared context
pages).  Safety: only FULL, completely-written pages are ever shared, and
new tokens always land in freshly-allocated pages, so shared pages are
immutable.
"""

from __future__ import annotations

from collections import OrderedDict

from ht_vllm_omni_tpu.core.block_pool import PagePool


def chain_hashes(
    token_ids: list[int], page_size: int
) -> list[int]:
    """One hash per FULL page, chained so a page's identity includes its
    whole prefix."""
    hashes = []
    prev = 0
    for start in range(0, len(token_ids) - page_size + 1, page_size):
        page_tokens = tuple(token_ids[start : start + page_size])
        prev = hash((prev, page_tokens))
        hashes.append(prev)
    return hashes


class PrefixCache:
    def __init__(self, pool: PagePool, page_size: int) -> None:
        self.pool = pool
        self.page_size = page_size
        # chain hash -> physical page id (holds one pool ref per entry)
        self._pages: OrderedDict[int, int] = OrderedDict()

    def __len__(self) -> int:
        return len(self._pages)

    # ------------------------------------------------------------ lookup
    def match(self, token_ids: list[int]) -> list[int]:
        """Longest cached page run for this prompt; shares each matched
        page (caller owns the new refs).  Never matches the entire prompt
        (at least one token must run to produce logits)."""
        matched: list[int] = []
        limit = len(token_ids) - 1  # leave >= 1 token to prefill
        for h in chain_hashes(token_ids, self.page_size):
            if (len(matched) + 1) * self.page_size > limit:
                break
            page = self._pages.get(h)
            if page is None:
                break
            self._pages.move_to_end(h)
            matched.append(self.pool.share(page))
        return matched

    # ---------------------------------------------------------- register
    def register(self, token_ids: list[int], page_ids: list[int]) -> None:
        """Publish a request's full prompt pages after its prefill."""
        for i, h in enumerate(chain_hashes(token_ids, self.page_size)):
            if i >= len(page_ids):
                break
            if h not in self._pages:
                self._pages[h] = self.pool.share(page_ids[i])
                self._pages.move_to_end(h)

    # ------------------------------------------------------------- evict
    def evict(self, num_pages: int) -> int:
        """Drop up to num_pages LRU entries; returns pages released."""
        released = 0
        while self._pages and released < num_pages:
            _, page = self._pages.popitem(last=False)
            self.pool.free([page])
            released += 1
        return released
