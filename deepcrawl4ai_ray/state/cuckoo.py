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

    def _bulk_place(self, idx_arr: np.ndarray, fp_arr: np.ndarray) -> np.ndarray:
        """Vectorized empty-slot placement: each key takes the next free
        slot of its bucket (intra-batch contention resolved by per-bucket
        cumulative rank).  Returns bool[m]: True where placed."""
        tab = self.table
        m = idx_arr.size
        if m == 0:
            return np.zeros(0, dtype=bool)
        order = np.argsort(idx_arr, kind="stable")
        sidx = idx_arr[order]
        sfp = fp_arr[order]
        _, start_pos, counts = np.unique(sidx, return_index=True, return_counts=True)
        cum = np.arange(m) - np.repeat(start_pos, counts)  # rank within bucket
        rows = tab[sidx]  # (m, 4) gather
        empty = rows == _EMPTY
        free = empty.sum(axis=1)
        can = cum < free
        cs = np.cumsum(empty, axis=1)
        target_slot = np.full(m, -1, dtype=np.int64)
        for s in range(_SLOTS):
            hit = can & empty[:, s] & (cs[:, s] - 1 == cum)
            target_slot[hit] = s
        tab[sidx[can], target_slot[can]] = sfp[can]
        placed = np.zeros(m, dtype=bool)
        placed[order[can]] = True
        return placed

    def _evict_insert(self, i1: int, fp: int) -> None:
        """Deterministic pseudo-random eviction walk (the rare slow path)."""
        tab = self.table
        if self.count > self.num_buckets * _SLOTS * 0.98:
            # table saturated: skip the (futile) eviction walk
            self.overflow.add((i1, fp))
            return
        cur_fp = fp
        idx = i1
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
                return
        # the walk's final homeless fingerprint: (idx, cur_fp) is a
        # valid (bucket, fp) slot for its key, so stash membership
        # checks against either candidate bucket find it.
        self.overflow.add((idx, cur_fp))

    def add_if_absent_many(self, h64: np.ndarray) -> np.ndarray:
        """Insert each absent key; returns bool[n]: True where newly inserted.

        The contains+insert primitive of the frontier's J4 anti-join
        (SURVEY.md §2.4): first occurrence wins, duplicates report False.

        Fully vectorized on the hot path (r1 review finding #6): present
        check is one gather per candidate bucket; intra-batch duplicate
        suppression exploits that candidate sets {i1, i2} of equal
        fingerprints are either disjoint or identical (i2 = i1 ^ H(fp) is
        an involution), so 'seen earlier in this batch' reduces to
        first-occurrence-wins on the canonical key (min(i1,i2), fp); bulk
        placement fills empty slots per bucket by rank.  Only keys whose
        both buckets are full fall back to the python eviction walk.
        Outputs are equivalent to the canonical (bucket-set, fingerprint)
        membership model (property-tested vs a python set of canonical
        keys) — NOT bit-for-bit to a sequential insert loop: when two
        distinct keys share a fingerprint and one bucket, ordering of
        spills can differ, but membership (which (fp, bucket-set) pairs
        are stored) is identical, which is the filter's contract.
        """
        h64 = h64.astype(np.uint64)
        n = h64.size
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return out
        fp_all = self._fingerprint(h64)
        i1_all = self._index1(h64)
        i2_all = self._alt_index(i1_all, fp_all)
        present = (self.table[i1_all] == fp_all[:, None]).any(axis=1) | (
            self.table[i2_all] == fp_all[:, None]
        ).any(axis=1)
        if self.overflow:
            for j in np.nonzero(~present)[0]:
                f = int(fp_all[j])
                if (int(i1_all[j]), f) in self.overflow or (int(i2_all[j]), f) in self.overflow:
                    present[j] = True
        # first-occurrence-wins within the batch on the canonical key
        canon = (np.minimum(i1_all, i2_all).astype(np.uint64) << np.uint64(16)) | fp_all.astype(np.uint64)
        _, first_idx = np.unique(canon, return_index=True)
        is_first = np.zeros(n, dtype=bool)
        is_first[first_idx] = True
        new = ~present & is_first
        out[new] = True
        new_idx = np.nonzero(new)[0]
        self.count += int(new_idx.size)
        placed1 = self._bulk_place(i1_all[new_idx], fp_all[new_idx])
        rest = new_idx[~placed1]
        placed2 = self._bulk_place(i2_all[rest], fp_all[rest])
        for j in rest[~placed2]:
            self._evict_insert(int(i1_all[j]), int(fp_all[j]))
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
