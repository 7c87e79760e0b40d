"""Physical page allocator for the paged KV cache.

TPU-native counterpart of vLLM's block manager, which the reference relies
on wholesale (SURVEY §2.9 "must be built from scratch").  Pages are
fixed-size; the pool hands out physical page ids and supports ref-counted
sharing so prefix caching can layer on top later.
"""

from __future__ import annotations


class NoFreePagesError(RuntimeError):
    pass


class PagePool:
    """Free-list page allocator with ref counts."""

    def __init__(self, num_pages: int) -> None:
        self.num_pages = num_pages
        self._free: list[int] = list(range(num_pages - 1, -1, -1))
        self._ref: dict[int, int] = {}

    @property
    def num_free(self) -> int:
        return len(self._free)

    def allocate(self, n: int) -> list[int]:
        if n > len(self._free):
            raise NoFreePagesError(
                f"requested {n} pages, only {len(self._free)} free"
            )
        pages = [self._free.pop() for _ in range(n)]
        for p in pages:
            self._ref[p] = 1
        return pages

    def share(self, page_id: int) -> int:
        self._ref[page_id] += 1
        return page_id

    def free(self, pages: list[int]) -> None:
        for p in pages:
            refs = self._ref.get(p)
            if refs is None:
                raise ValueError(f"double free of page {p}")
            if refs == 1:
                del self._ref[p]
                self._free.append(p)
            else:
                self._ref[p] = refs - 1
