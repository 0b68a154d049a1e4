"""Flat walk container: one arena + end offsets instead of a list of
small arrays.

A 60M-base run produces ~1M tigs; a list of 1M numpy arrays costs
seconds per round trip (per-tig slice copies on creation,
``np.concatenate(walks)`` + a 1M-element list comprehension in the
speller).  ``Walks`` keeps the decomposition/breaker's flat output
buffers and serves per-walk views on demand, while the speller consumes
the flat form directly.  Duck-types a read-only sequence of int64 edge
arrays, so list-based callers keep working.
"""

from __future__ import annotations

import numpy as np


class Walks:
    """Read-only sequence of edge walks over one flat arena.

    ``offsets`` are END offsets: walk i is ``flat[offsets[i-1]:offsets[i]]``.
    """

    __slots__ = ("flat", "offsets")

    def __init__(self, flat: np.ndarray, offsets: np.ndarray) -> None:
        self.flat = flat
        self.offsets = offsets

    def __len__(self) -> int:
        return len(self.offsets)

    def __getitem__(self, i):
        n = len(self.offsets)
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(n))]
        if i < 0:
            i += n
        if not 0 <= i < n:
            raise IndexError(i)
        lo = 0 if i == 0 else int(self.offsets[i - 1])
        return self.flat[lo : int(self.offsets[i])]

    def __iter__(self):
        lo = 0
        for end in self.offsets.tolist():
            yield self.flat[lo:end]
            lo = end

    @staticmethod
    def from_list(walks) -> "Walks":
        if isinstance(walks, Walks):
            return walks
        if not len(walks):
            return Walks(
                np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
            )
        flat = np.concatenate([np.asarray(w, dtype=np.int64) for w in walks])
        offsets = np.cumsum(
            np.array([len(w) for w in walks], dtype=np.int64)
        )
        return Walks(flat, offsets)
