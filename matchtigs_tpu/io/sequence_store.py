"""Flat DNA sequence store.

Equivalent capability to the reference's ``DefaultSequenceStore<DnaAlphabet>``
(``compact-genome`` crate; call sites /root/reference/src/bin.rs:25-30,279-286):
every unitig's sequence is stored exactly once; graph edges carry a
``(handle, forward)`` pair instead of strings.  Here the arena is one flat
uint8 code array (2-bit values, one per byte for O(1) slicing) plus an
offsets array — an SoA layout that vectorizes spelling and k-mer extraction.
"""

from __future__ import annotations

import numpy as np

from ..utils import dna


class SequenceStore:
    """Append-only arena of DNA sequences addressed by integer handles."""

    def __init__(self) -> None:
        self._chunks: list[np.ndarray] = []
        self._lengths: list[int] = []
        self._codes: np.ndarray | None = None  # finalized flat array
        self._offsets: np.ndarray | None = None

    def add(self, codes: np.ndarray) -> int:
        """Append a code array (uint8, values 0..3); returns its handle."""
        assert self._codes is None, "store already finalized"
        handle = len(self._chunks)
        self._chunks.append(codes)
        self._lengths.append(len(codes))
        return handle

    def add_ascii(self, seq: bytes) -> int:
        return self.add(dna.encode_ascii(seq))

    def finalize(self) -> None:
        """Freeze into flat arrays for vectorized access."""
        if self._codes is not None:
            return
        lengths = np.asarray(self._lengths, dtype=np.int64)
        self._offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=self._offsets[1:])
        self._codes = (
            np.concatenate(self._chunks) if self._chunks else np.empty(0, dtype=np.uint8)
        )
        self._chunks = []

    def __len__(self) -> int:
        return len(self._lengths)

    def length(self, handle: int) -> int:
        return self._lengths[handle]

    @property
    def lengths(self) -> np.ndarray:
        return np.asarray(self._lengths, dtype=np.int64)

    @property
    def codes(self) -> np.ndarray:
        self.finalize()
        return self._codes

    @property
    def offsets(self) -> np.ndarray:
        self.finalize()
        return self._offsets

    def get(self, handle: int) -> np.ndarray:
        """Forward sequence codes of `handle` (view into the arena)."""
        if self._codes is None:
            return self._chunks[handle]
        return self._codes[self._offsets[handle] : self._offsets[handle + 1]]

    def get_rc(self, handle: int) -> np.ndarray:
        """Reverse complement codes of `handle`."""
        return dna.revcomp(self.get(handle))

    def get_ascii(self, handle: int, forward: bool = True) -> bytes:
        codes = self.get(handle) if forward else self.get_rc(handle)
        return dna.decode_to_ascii(codes)

    def size_in_memory(self) -> int:
        self.finalize()
        return int(self._codes.nbytes + self._offsets.nbytes)
