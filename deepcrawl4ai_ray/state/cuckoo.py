"""Cuckoo filter — the exact-ish URL-seen set inside each frontier shard.

Standard design (Fan et al., CoNLF'14): buckets of 4 slots, 16-bit
fingerprints, partial-key cuckoo hashing (alternate bucket =
bucket XOR hash(fingerprint)), bounded eviction kicks with a victim
stash.  2.25 B/key at 0.95 load with an exactly-sized table; bucket
counts round up to a power of two (mask indexing), so worst case is
~2× that — measured 4.2 MB per 10^6-key shard, i.e. 10^10 URLs ≈
23–47 GB across 256 shards ≈ 90–180 MB/shard (SURVEY.md §4 scale
math; size shard capacity near (0.95 · 4 · 2^k) to stay at the low
end).

The filter is keyed by 64-bit url hashes (functions.urlnorm.hash64) —
batch operations take numpy arrays so the per-shard insert loop touches
pre-computed vectors only.  An explicit ``overflow`` set keeps
correctness when the table saturates (inserts never silently fail).

Note: like any cuckoo/bloom structure this has a false-positive rate
(~2^-14 here); a false positive makes the crawler skip a genuinely new
URL.  The conformance fixtures are generated with the same structure,
so ordering/seen-set checks remain deterministic.
"""

from __future__ import annotations

import pickle

import numpy as np

_SLOTS = 4
_MAX_KICKS = 500
_EMPTY = np.uint16(0)


class CuckooFilter:
    def __init__(self, capacity: int, seed_shift: int = 0):
        # round buckets up to a power of two for mask-based indexing
        need = max(16, int(capacity / (_SLOTS * 0.95)))
        nb = 1
        while nb < need:
            nb <<= 1
        self.num_buckets = nb
        self._mask = np.uint64(nb - 1)
        self.table = np.zeros((nb, _SLOTS), dtype=np.uint16)
        self.count = 0
        # victim stash: (bucket_index, fingerprint) pairs homeless after a
        # failed eviction walk — keeps membership exact under saturation
        self.overflow: set[tuple[int, int]] = set()
        self._kick_state = 0x9E3779B97F4A7C15 ^ seed_shift  # deterministic eviction choice

    # -- hashing ----------------------------------------------------------
    @staticmethod
    def _fingerprint(h64: np.ndarray) -> np.ndarray:
        fp = (h64 >> np.uint64(48)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 is the empty marker
        return fp

    def _index1(self, h64: np.ndarray) -> np.ndarray:
        return (h64 & self._mask).astype(np.int64)

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key cuckoo: i2 = i1 ^ H(fp)
        fph = fp.astype(np.uint64) * np.uint64(0x5BD1E995)
        return ((idx.astype(np.uint64) ^ fph) & self._mask).astype(np.int64)

    # -- queries ----------------------------------------------------------
    def contains_many(self, h64: np.ndarray) -> np.ndarray:
        if h64.size == 0:
            return np.zeros(0, dtype=bool)
        h64 = h64.astype(np.uint64)
        fp = self._fingerprint(h64)
        i1 = self._index1(h64)
        i2 = self._alt_index(i1, fp)
        found = (self.table[i1] == fp[:, None]).any(axis=1) | (
            self.table[i2] == fp[:, None]
        ).any(axis=1)
        if self.overflow:
            for j in np.nonzero(~found)[0]:
                f = int(fp[j])
                if (int(i1[j]), f) in self.overflow or (int(i2[j]), f) in self.overflow:
                    found[j] = True
        return found

    def add_if_absent_many(self, h64: np.ndarray) -> np.ndarray:
        """Insert each absent key; returns bool[n]: True where newly inserted.

        The contains+insert primitive of the frontier's J4 anti-join
        (SURVEY.md §2.4): first occurrence wins, duplicates report False.
        """
        h64 = h64.astype(np.uint64)
        out = np.zeros(h64.size, dtype=bool)
        fp_all = self._fingerprint(h64)
        i1_all = self._index1(h64)
        i2_all = self._alt_index(i1_all, fp_all)
        tab = self.table
        for j in range(h64.size):
            fp = fp_all[j]
            i1 = int(i1_all[j])
            i2 = int(i2_all[j])
            b1 = tab[i1]
            b2 = tab[i2]
            if (b1 == fp).any() or (b2 == fp).any():
                continue
            if self.overflow and ((i1, int(fp)) in self.overflow or (i2, int(fp)) in self.overflow):
                continue
            out[j] = True
            self.count += 1
            placed = False
            for b, i in ((b1, i1), (b2, i2)):
                empt = np.nonzero(b == _EMPTY)[0]
                if empt.size:
                    tab[i, empt[0]] = fp
                    placed = True
                    break
            if placed:
                continue
            if self.count > self.num_buckets * _SLOTS * 0.98:
                # table saturated: skip the (futile) eviction walk
                self.overflow.add((i1, int(fp)))
                continue
            # evict: deterministic pseudo-random walk
            cur_fp = int(fp)
            idx = i1
            ok = False
            for _ in range(_MAX_KICKS):
                self._kick_state = (self._kick_state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
                slot = self._kick_state % _SLOTS
                victim = int(tab[idx, slot])
                tab[idx, slot] = cur_fp
                cur_fp = victim
                idx = int(
                    (np.uint64(idx) ^ (np.uint64(cur_fp) * np.uint64(0x5BD1E995))) & self._mask
                )
                b = tab[idx]
                empt = np.nonzero(b == _EMPTY)[0]
                if empt.size:
                    tab[idx, empt[0]] = cur_fp
                    ok = True
                    break
            if not ok:
                # the walk's final homeless fingerprint: (idx, cur_fp) is a
                # valid (bucket, fp) slot for its key, so stash membership
                # checks against either candidate bucket find it.
                self.overflow.add((idx, cur_fp))
        return out

    def __contains__(self, h64: int) -> bool:
        return bool(self.contains_many(np.array([h64], dtype=np.uint64))[0])

    def add_if_absent(self, h64: int) -> bool:
        return bool(self.add_if_absent_many(np.array([h64], dtype=np.uint64))[0])

    @property
    def load_factor(self) -> float:
        return self.count / (self.num_buckets * _SLOTS)

    # -- serialization ----------------------------------------------------
    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {
                "num_buckets": self.num_buckets,
                "table": self.table,
                "count": self.count,
                "overflow": self.overflow,
                "kick": self._kick_state,
            },
            protocol=4,
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        d = pickle.loads(data)
        obj = cls.__new__(cls)
        obj.num_buckets = d["num_buckets"]
        obj._mask = np.uint64(obj.num_buckets - 1)
        obj.table = d["table"]
        obj.count = d["count"]
        obj.overflow = d["overflow"]
        obj._kick_state = d["kick"]
        return obj
