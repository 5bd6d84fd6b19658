"""Bounded FIFO mappings (drop-in for pygrametl.FIFODict).

Capacity-limited dicts that evict the oldest-inserted entry once full,
optionally calling a ``finalizer(key, value)`` on eviction (parity with
ref FIFODict.py:31-175; re-implemented from the documented behavior).
In this engine they back driver-side statement caches
(``connectionwrapper.ConnectionWrapper``) — never row caches: row-level
caching is the reference's workaround for round-trip lookups, which the
Spark engine replaces with broadcast joins.
"""

from __future__ import annotations

from collections import OrderedDict, deque

__all__ = ["FIFODict", "FIFODictDeque", "FIFODictOrderedDict"]


class FIFODictDeque:
    """FIFO dict over a plain dict + deque insertion queue."""

    def __init__(self, size: int, finalizer=None):
        if not isinstance(size, int) or isinstance(size, bool):
            raise TypeError("size must be an int")
        if size <= 0:
            raise ValueError("size must be positive")
        if finalizer is not None and not callable(finalizer):
            raise TypeError("finalizer must be None or a callable")
        self._size = size
        self._data: dict = {}
        self._order: deque = deque()
        self._finalizer = finalizer

    def __len__(self):
        return len(self._data)

    def __contains__(self, key):
        return key in self._data

    def __getitem__(self, key):
        return self._data[key]

    def __setitem__(self, key, value):
        if key not in self._data and len(self._data) >= self._size:
            oldest = self._order.popleft()
            evicted = self._data.pop(oldest)
            if self._finalizer is not None:
                self._finalizer(oldest, evicted)
        if key not in self._data:
            self._order.append(key)
        self._data[key] = value

    def __delitem__(self, key):
        del self._data[key]
        self._order.remove(key)

    def __iter__(self):
        return iter(self._order)

    def get(self, key, default=None):
        return self._data.get(key, default)

    def keys(self):
        return list(self._order)

    def values(self):
        return [self._data[k] for k in self._order]

    def items(self):
        return [(k, self._data[k]) for k in self._order]

    def clear(self):
        self._data.clear()
        self._order.clear()


class FIFODictOrderedDict:
    """FIFO dict over :class:`collections.OrderedDict` (popitem(last=False))."""

    def __init__(self, size: int, finalizer=None):
        if not isinstance(size, int) or isinstance(size, bool):
            raise TypeError("size must be an int")
        if size <= 0:
            raise ValueError("size must be positive")
        if finalizer is not None and not callable(finalizer):
            raise TypeError("finalizer must be None or a callable")
        self._size = size
        self._data: OrderedDict = OrderedDict()
        self._finalizer = finalizer

    def __len__(self):
        return len(self._data)

    def __contains__(self, key):
        return key in self._data

    def __getitem__(self, key):
        return self._data[key]

    def __setitem__(self, key, value):
        if key not in self._data and len(self._data) >= self._size:
            oldest, evicted = self._data.popitem(last=False)
            if self._finalizer is not None:
                self._finalizer(oldest, evicted)
        self._data[key] = value

    def __delitem__(self, key):
        del self._data[key]

    def __iter__(self):
        return iter(self._data)

    def get(self, key, default=None):
        return self._data.get(key, default)

    def keys(self):
        return list(self._data.keys())

    def values(self):
        return list(self._data.values())

    def items(self):
        return list(self._data.items())

    def clear(self):
        self._data.clear()


FIFODict = FIFODictOrderedDict
