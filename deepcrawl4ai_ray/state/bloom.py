"""Bloom filter with vectorized batch operations.

Used as the read-only batch-side pre-screen in front of the cuckoo
frontier shards (SURVEY.md §2.4 J4): a snapshot is broadcast via
``ray.put`` once per round and consulted inside map_batches to cut
actor traffic for already-seen URLs.  ~1.2 GB at 1 % FPR per 10^9 keys
(SURVEY.md §4 scale math); shards at 100 MB each hold the exact set.

Double hashing (Kirsch–Mitzenmacher): g_i(x) = h1(x) + i*h2(x), with h1
= the caller-supplied 64-bit key hash and h2 derived from it — all
numpy-vectorized over key arrays.
"""

from __future__ import annotations

import numpy as np


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        capacity = max(1, int(capacity))
        # optimal m/n = -ln(p)/ln(2)^2 ; k = m/n * ln(2)
        m = int(np.ceil(-capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        self.num_bits = max(64, m)
        self.num_hashes = max(1, int(round(self.num_bits / capacity * np.log(2))))
        self.bits = np.zeros((self.num_bits + 63) // 64, dtype=np.uint64)
        self.count = 0

    def _positions(self, h64: np.ndarray) -> np.ndarray:
        """(n, k) bit positions from n 64-bit hashes."""
        h1 = h64
        h2 = (h64 >> np.uint64(17)) | (h64 << np.uint64(47))  # rotate — independent-ish
        h2 = h2 | np.uint64(1)  # odd, so strides cover the table
        i = np.arange(self.num_hashes, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.num_bits)

    def add_many(self, h64: np.ndarray) -> None:
        if h64.size == 0:
            return
        pos = self._positions(h64.astype(np.uint64)).ravel()
        np.bitwise_or.at(self.bits, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63)))
        self.count += int(h64.size)

    def contains_many(self, h64: np.ndarray) -> np.ndarray:
        """Vectorized membership test → bool[n].  False ⇒ definitely absent."""
        if h64.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h64.astype(np.uint64))
        word = self.bits[pos >> np.uint64(6)]
        bit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return bit.all(axis=1)

    def add(self, h64: int) -> None:
        self.add_many(np.array([h64], dtype=np.uint64))

    def __contains__(self, h64: int) -> bool:
        return bool(self.contains_many(np.array([h64], dtype=np.uint64))[0])

    # -- serialization (checkpointing) --
    def to_bytes(self) -> bytes:
        head = np.array([self.num_bits, self.num_hashes, self.count], dtype=np.int64).tobytes()
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        num_bits, num_hashes, count = np.frombuffer(data[:24], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.num_bits = int(num_bits)
        obj.num_hashes = int(num_hashes)
        obj.count = int(count)
        obj.bits = np.frombuffer(data[24:], dtype=np.uint64).copy()
        return obj
