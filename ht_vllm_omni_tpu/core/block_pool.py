"""Physical page allocator for the paged KV cache.

TPU-native counterpart of vLLM's block manager, which the reference relies
on wholesale (SURVEY §2.9 "must be built from scratch").  Pages are
fixed-size; the pool hands out physical page ids and supports ref-counted
sharing so prefix caching can layer on top later.

Group partitioning: with data-parallel sharding the cache's slot axis is
split over dp, so each dp shard addresses only pages
[g * pages_per_group, (g+1) * pages_per_group).  The pool partitions its
free lists per group and every request allocates exclusively from its
owner group's range — the ids handed out are still GLOBAL page ids (the
model runner subtracts the group base when building shard-local
slot mappings / block tables).
"""

from __future__ import annotations


class NoFreePagesError(RuntimeError):
    pass


class PagePool:
    """Free-list page allocator with ref counts and group partitions."""

    def __init__(self, num_pages: int, num_groups: int = 1) -> None:
        assert num_pages % num_groups == 0, (num_pages, num_groups)
        self.num_pages = num_pages
        self.num_groups = num_groups
        self.pages_per_group = num_pages // num_groups
        ppg = self.pages_per_group
        self._free: list[list[int]] = [
            list(range((g + 1) * ppg - 1, g * ppg - 1, -1))
            for g in range(num_groups)
        ]
        self._ref: dict[int, int] = {}

    @property
    def num_free(self) -> int:
        return sum(len(f) for f in self._free)

    def free_in_group(self, group: int = 0) -> int:
        return len(self._free[group])

    def group_of(self, page_id: int) -> int:
        return page_id // self.pages_per_group

    def allocate(self, n: int, group: int = 0) -> list[int]:
        free = self._free[group]
        if n > len(free):
            raise NoFreePagesError(
                f"requested {n} pages, only {len(free)} free in group {group}"
            )
        pages = [free.pop() for _ in range(n)]
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
                self._free[self.group_of(p)].append(p)
            else:
                self._ref[p] = refs - 1
