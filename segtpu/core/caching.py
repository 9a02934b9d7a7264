"""Bounded LRU caches for process-lifetime compiled-program registries.

Why bounded (VERDICT r3 #8): a long sweep process (e.g. the 50-config
model-configuration grid) constructs one engine per config and one jitted
program per (shape, batch) it touches. Unbounded dicts accumulate every
compiled XLA executable for the process lifetime — hundreds of programs on
a 1-core/16 GB host. An LRU with a small cap keeps the hot set (the folds
of the config currently sweeping reuse one entry) while letting XLA free
retired executables.

Eviction only drops OUR reference; anything still holding the value (an
engine mid-training) keeps it alive — eviction can never break in-flight
use, only force a re-jit on a later revisit.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Hashable, Optional


class LRUCache:
    """Minimal LRU mapping: dict-style access, recency on read and write,
    oldest-out beyond ``cap``. Not thread-safe (all users are the
    single-threaded training control path)."""

    def __init__(self, cap: int):
        if cap < 1:
            raise ValueError(f"cap must be >= 1, got {cap}")
        self.cap = int(cap)
        self._d: OrderedDict = OrderedDict()

    def get(self, key: Hashable, default: Any = None) -> Any:
        if key in self._d:
            self._d.move_to_end(key)
            return self._d[key]
        return default

    def __getitem__(self, key: Hashable) -> Any:
        self._d.move_to_end(key)
        return self._d[key]

    def __setitem__(self, key: Hashable, value: Any) -> None:
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.cap:
            self._d.popitem(last=False)

    def __contains__(self, key: Hashable) -> bool:
        return key in self._d

    def __len__(self) -> int:
        return len(self._d)

    def clear(self) -> None:
        self._d.clear()
