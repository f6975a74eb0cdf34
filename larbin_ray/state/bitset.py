"""The 64M-bit single-hash URL-seen set — exact replica of the reference
``hashTable`` (src/fetch/hash_table.cxx) and ``hashDup``
(src/utils/hash_duplicate.cxx): 1 bit per code, *collisions silently
drop URLs* (hash_table.cxx:95-125).  Replicating the false-positive
behavior — not improving it with a better Bloom filter — is part of the
URL-seen-set invariant (SURVEY.md §4 "collision behavior").

Vectorized over numpy; ``test_set`` keeps first-occurrence-wins
semantics for duplicate codes inside one batch (the sequential loop the
reference runs).
"""

from __future__ import annotations

import numpy as np

from larbin_ray.config import HASH_SIZE


class Bitset:
    def __init__(self, nbits: int = HASH_SIZE):
        self.nbits = nbits
        self.table = np.zeros(nbits >> 3, dtype=np.uint8)

    def test_set_many(self, codes: np.ndarray) -> np.ndarray:
        """Sequential-equivalent batch testSet: returns bool array,
        True = newly added (hash_table.cxx:117-125)."""
        codes = np.asarray(codes, dtype=np.int64)
        pos = codes >> 3
        bits = np.left_shift(1, (codes & 7)).astype(np.uint8)
        already = (self.table[pos] & bits) != 0
        # first occurrence of each code within this batch wins
        _, first_idx = np.unique(codes, return_index=True)
        first = np.zeros(len(codes), dtype=bool)
        first[first_idx] = True
        np.bitwise_or.at(self.table, pos, bits)
        return (~already) & first

    def set_many(self, codes: np.ndarray) -> None:
        """Unconditional batch set — no verdict, no first-wins
        bookkeeping (hash_table.cxx ``set``)."""
        codes = np.asarray(codes, dtype=np.int64)
        np.bitwise_or.at(self.table, codes >> 3,
                         np.left_shift(1, (codes & 7)).astype(np.uint8))

    def test_set(self, code: int) -> bool:
        pos = code >> 3
        bit = 1 << (code & 7)
        res = bool(self.table[pos] & bit)
        self.table[pos] |= bit
        return not res

    def test(self, code: int) -> bool:
        return bool(self.table[code >> 3] & (1 << (code & 7)))

    def set_indices(self) -> np.ndarray:
        """Sorted indices of set bits (for snapshot comparison).  Sparse:
        only touches bytes that have bits set (the reference packs bits
        LSB-first, ``1 << (code % 8)``)."""
        nz = np.flatnonzero(self.table).astype(np.int64)
        vals = self.table[nz]
        parts = [(nz[(vals & (1 << b)) != 0] << 3) + b for b in range(8)]
        return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)

    def save(self, path: str) -> None:
        np.save(path, self.table)

    @classmethod
    def load(cls, path: str) -> "Bitset":
        table = np.load(path)
        bs = cls(len(table) << 3)
        bs.table = table
        return bs

    def merge(self, other: "Bitset") -> None:
        np.bitwise_or(self.table, other.table, out=self.table)
