"""Flat DNA sequence store, 2-bit packed.

Equivalent capability to the reference's ``DefaultSequenceStore<DnaAlphabet>``
(``compact-genome`` crate; call sites /root/reference/src/bin.rs:25-30,279-286):
every unitig's sequence is stored exactly once; graph edges carry a
``(handle, forward)`` pair instead of strings.  The arena is one dense
2-bit stream (uint8, 4 bases/byte — the same 4x memory saving
compact-genome provides) plus a base-offset array; sequences are NOT
byte-aligned, so base ``j`` of sequence ``h`` lives at global bit position
``2 * (offsets[h] + j)``.  Slicing/revcomp unpack on demand (vectorized);
the native walk speller reads the packed stream directly
(native/tigs.cpp:spell_walks_packed).
"""

from __future__ import annotations

import numpy as np

from ..utils import dna

_PACK_BLOCK = 1 << 22  # bases per packing block during finalize


def pack_codes(flat: np.ndarray) -> np.ndarray:
    """Pack a byte-per-base code array (values 0..3) into 4 bases/byte,
    little-endian within the byte (base i at bit 2*(i%4))."""
    n = len(flat)
    pad = (-n) % 4
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
    q = flat.reshape(-1, 4).astype(np.uint8)
    return (
        q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4) | (q[:, 3] << 6)
    ).astype(np.uint8)


def unpack_codes(packed: np.ndarray, start: int, end: int) -> np.ndarray:
    """Unpack global base positions [start, end) from the 2-bit stream."""
    idx = np.arange(start, end, dtype=np.int64)
    return (packed[idx >> 2] >> ((idx & 3) << 1).astype(np.uint8)) & 3


class SequenceStore:
    """Append-only arena of DNA sequences addressed by integer handles."""

    def __init__(self) -> None:
        self._chunks: list[np.ndarray] = []
        self._lengths: list[int] = []
        self._packed: np.ndarray | None = None  # finalized 2-bit stream
        self._offsets: np.ndarray | None = None  # base offsets [n+1]

    @classmethod
    def from_flat(
        cls, codes: np.ndarray, offsets: np.ndarray
    ) -> "SequenceStore":
        """Build a finalized store from a byte-per-base arena + offsets
        (e.g. a dataset cache)."""
        store = cls()
        store._lengths = (offsets[1:] - offsets[:-1]).tolist()
        store._offsets = np.ascontiguousarray(offsets, dtype=np.int64)
        store._packed = pack_codes(np.ascontiguousarray(codes, dtype=np.uint8))
        return store

    def add(self, codes: np.ndarray) -> int:
        """Append a code array (uint8, values 0..3); returns its handle."""
        assert self._packed is None, "store already finalized"
        handle = len(self._chunks)
        self._chunks.append(codes)
        self._lengths.append(len(codes))
        return handle

    def add_ascii(self, seq: bytes) -> int:
        return self.add(dna.encode_ascii(seq))

    def finalize(self) -> None:
        """Freeze into the packed arena (blockwise: peak transient memory
        stays O(block) beyond the chunks themselves)."""
        if self._packed is not None:
            return
        lengths = np.asarray(self._lengths, dtype=np.int64)
        self._offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
        np.cumsum(lengths, out=self._offsets[1:])
        total = int(self._offsets[-1])
        packed_parts: list[np.ndarray] = []
        block: list[np.ndarray] = []
        block_len = 0
        carry = np.empty(0, dtype=np.uint8)
        for chunk in self._chunks:
            block.append(chunk)
            block_len += len(chunk)
            if block_len >= _PACK_BLOCK:
                flat = np.concatenate([carry] + block)
                usable = len(flat) & ~3  # keep block starts 4-base aligned
                packed_parts.append(pack_codes(flat[:usable]))
                carry = flat[usable:]
                block = []
                block_len = 0
        flat = np.concatenate([carry] + block) if (len(carry) or block) else (
            np.empty(0, dtype=np.uint8)
        )
        if len(flat):
            packed_parts.append(pack_codes(flat))
        self._packed = (
            np.concatenate(packed_parts)
            if packed_parts
            else np.empty(0, dtype=np.uint8)
        )
        assert len(self._packed) == (total + 3) // 4
        self._chunks = []

    def __len__(self) -> int:
        return len(self._lengths)

    def length(self, handle: int) -> int:
        return self._lengths[handle]

    @property
    def lengths(self) -> np.ndarray:
        return np.asarray(self._lengths, dtype=np.int64)

    @property
    def packed(self) -> np.ndarray:
        """The 2-bit arena (4 bases/byte, offsets in bases)."""
        self.finalize()
        return self._packed

    @property
    def codes(self) -> np.ndarray:
        """Full byte-per-base unpack of the arena (materialized on demand;
        prefer `packed` + `gather_windows`/`get` for memory-lean access)."""
        self.finalize()
        return unpack_codes(self._packed, 0, int(self._offsets[-1]))

    @property
    def offsets(self) -> np.ndarray:
        self.finalize()
        return self._offsets

    def packed_windows(self, starts: np.ndarray, length: int) -> np.ndarray:
        """uint64 keys of `length`-base windows (length <= 31), first base
        most significant — byte-identical to
        ``_pack_rows(gather_windows(starts, length))`` but read as two
        aligned uint64 gathers + a 2-bit group reversal per window instead
        of one byte gather per base (the 60M-base graph build's endpoint
        extraction dropped ~8.7s -> ~1.5s)."""
        assert 0 < length <= 31
        self.finalize()
        if getattr(self, "_packed64", None) is None:
            pad = np.zeros((len(self._packed) + 15) // 8 * 8, dtype=np.uint8)
            pad[: len(self._packed)] = self._packed
            self._packed64 = pad.view(np.uint64)
        P = self._packed64
        starts = np.ascontiguousarray(starts, dtype=np.int64)
        bitoff = starts << 1  # arena is little-endian 2-bit groups
        i = bitoff >> 6
        sh = (bitoff & 63).astype(np.uint64)
        w = P[i] >> sh
        spill = sh != 0
        w[spill] |= P[i[spill] + 1] << (np.uint64(64) - sh[spill])
        # little-endian groups -> big-endian key: reverse the 32 groups
        u = np.uint64
        w &= u((1 << (2 * length)) - 1)
        w = ((w & u(0x3333333333333333)) << u(2)) | (
            (w >> u(2)) & u(0x3333333333333333)
        )
        w = ((w & u(0x0F0F0F0F0F0F0F0F)) << u(4)) | (
            (w >> u(4)) & u(0x0F0F0F0F0F0F0F0F)
        )
        w = ((w & u(0x00FF00FF00FF00FF)) << u(8)) | (
            (w >> u(8)) & u(0x00FF00FF00FF00FF)
        )
        w = ((w & u(0x0000FFFF0000FFFF)) << u(16)) | (
            (w >> u(16)) & u(0x0000FFFF0000FFFF)
        )
        w = (w << u(32)) | (w >> u(32))
        return w >> u(2 * (32 - length))

    def gather_windows(self, starts: np.ndarray, length: int) -> np.ndarray:
        """[len(starts), length] code windows starting at global base
        positions `starts` (vectorized unpack).

        Column-at-a-time: the 2-D index math otherwise materializes
        several N*length int64 temporaries (~1.5 GB of traffic at 1.3M
        windows), dominating graph-build time."""
        self.finalize()
        starts = np.ascontiguousarray(starts, dtype=np.int64)
        out = np.empty((len(starts), length), dtype=np.uint8)
        for j in range(length):
            idx = starts + j
            np.bitwise_and(
                self._packed[idx >> 2] >> ((idx & 3) << 1).astype(np.uint8),
                3,
                out=out[:, j],
            )
        return out

    def get(self, handle: int) -> np.ndarray:
        """Forward sequence codes of `handle` (unpacked copy)."""
        if self._packed is None:
            return self._chunks[handle]
        return unpack_codes(
            self._packed,
            int(self._offsets[handle]),
            int(self._offsets[handle + 1]),
        )

    def get_rc(self, handle: int) -> np.ndarray:
        """Reverse complement codes of `handle`."""
        return dna.revcomp(self.get(handle))

    def get_ascii(self, handle: int, forward: bool = True) -> bytes:
        codes = self.get(handle) if forward else self.get_rc(handle)
        return dna.decode_to_ascii(codes)

    def size_in_memory(self) -> int:
        self.finalize()
        return int(self._packed.nbytes + self._offsets.nbytes)
