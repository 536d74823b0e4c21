"""HyperLogLog — approximate distinct counting with mergeable partials.

The sketch a 100 TB pipeline uses where exact grouped distinct counts
would shuffle every key: each map_batches task folds its batch into a
2^p-register sketch, partials OR-merge associatively (register-wise
max), and only ~2^p bytes per group ever reach the driver.  Standard
published algorithm (Flajolet–Fusy–Gandouet–Meunier 2007) with the
usual small-range linear-counting correction; implemented from scratch
on numpy (no reference-code lineage — the reference repo has no
sketches at all).

Accuracy: σ ≈ 1.04/√(2^p) → p=12 (4 KiB) ≈ 1.6 % relative error.
"""

from __future__ import annotations

import numpy as np


class HyperLogLog:
    def __init__(self, p: int = 12):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_many(self, h64: np.ndarray) -> None:
        """Fold pre-hashed uint64 keys in (vectorized)."""
        if h64.size == 0:
            return
        h = h64.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)  # top p bits
        rest = h << np.uint64(self.p)  # remaining 64-p bits, left-aligned
        # rank = position of the leftmost 1-bit in `rest` (1-based), with
        # all-zero mapping to (64-p)+1
        nonzero = rest != 0
        lz = np.full(h.size, 64 - self.p, dtype=np.int64)
        r = rest[nonzero]
        # count leading zeros of a uint64 via float64 exponent is unsafe
        # (53-bit mantissa); use a 4x16-bit table-free loop instead
        shift = np.zeros(r.size, dtype=np.uint64)
        cur = r.copy()
        for step in (np.uint64(32), np.uint64(16), np.uint64(8), np.uint64(4), np.uint64(2), np.uint64(1)):
            mask = cur < (np.uint64(1) << (np.uint64(64) - step))
            shift[mask] += step
            cur[mask] <<= step
        lz[nonzero] = shift.astype(np.int64)
        rank = np.minimum(lz + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge sketches with different precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv_sum = np.sum(np.exp2(-self.registers.astype(np.float64)))
        e = alpha * m * m / inv_sum
        if e <= 2.5 * m:  # small-range: linear counting over empty registers
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)
        return float(e)

    # -- serialization (partial shipping) --
    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        obj = cls(int(data[0]))
        obj.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return obj


def hll_grouped_distinct(ds, key_col: str, value_col: str, p: int = 12):
    """Approximate COUNT(DISTINCT value) GROUP BY key over a Dataset:
    per-batch partial sketches per key (one 2^p-byte blob per (task,
    key)), groupby(key) merge — values themselves never shuffle.

    Returns pandas (key, approx_distinct: int64 rounded estimate).
    """
    import pandas as pd
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, value_col]).to_pandas()
        keys, blobs = [], []
        hashes = pd.util.hash_array(df[value_col].to_numpy())
        for k, idx in df.groupby(key_col, sort=False).indices.items():
            h = HyperLogLog(p)
            h.add_many(hashes[idx])
            keys.append(k)
            blobs.append(h.to_bytes())
        return pa.table({key_col: pa.array(keys), "sketch": pa.array(blobs, pa.binary())})

    def merge_group(g: "pd.DataFrame") -> "pd.DataFrame":
        acc = HyperLogLog.from_bytes(g["sketch"].iloc[0])
        for b in g["sketch"].iloc[1:]:
            acc.merge(HyperLogLog.from_bytes(b))
        return pd.DataFrame(
            {key_col: [g[key_col].iloc[0]], "approx_distinct": [np.int64(round(acc.estimate()))]}
        )

    from ..stages.join import shuffle_coalesce

    out = (
        shuffle_coalesce(ds.map_batches(partial, batch_format="pyarrow"))
        .groupby(key_col)
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(key_col).reset_index(drop=True)


def hll_register_rows(ds, key_col: str, value_col: str, p: int = 12, as_pandas: bool = True):
    """The sketch STATE as an exact integer table — the oracle-checkable
    form of :func:`hll_grouped_distinct`.

    Values hash via md5 digest bytes [8:16] little-endian (exactly
    DuckDB ``md5_number_lower(CAST(v AS VARCHAR))``), so every register
    value is reproducible by a pure-SQL twin: register index = top ``p``
    hash bits, rank = (64-p) - bit_length(low 64-p bits) + 1 (with the
    all-zero remainder mapping to 64-p+1), merged with MAX per (key,
    register).  Distribution shape is the mergeable-sketch plan: each
    map task folds its batch into one 2^p-byte blob per (task, key); the
    groupby(key) all-to-all moves sketch blobs, never the raw values —
    at 10^10 frontier URLs per-group traffic is blocks x 4 KiB.

    Returns pandas (key, reg:int32, reg_rank:int32), nonzero registers
    only, sorted by (key, reg) — or, with ``as_pandas=False``, the
    unsorted register Dataset (the 100-TB form: O(groups x 2^p) rows
    belong in a parquet sink, not on the driver).
    """
    import pandas as pd
    import pyarrow as pa

    from ..functions.hashing import md5_u64

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, value_col]).to_pandas()
        hashes = md5_u64(df[value_col].astype(str).tolist())
        keys, blobs = [], []
        for k, idx in df.groupby(key_col, sort=False).indices.items():
            h = HyperLogLog(p)
            h.add_many(hashes[idx])
            keys.append(k)
            blobs.append(h.to_bytes())
        return pa.table({key_col: pa.array(keys), "sketch": pa.array(blobs, pa.binary())})

    def merge_group(g: "pd.DataFrame") -> "pd.DataFrame":
        acc = HyperLogLog.from_bytes(g["sketch"].iloc[0])
        for b in g["sketch"].iloc[1:]:
            acc.merge(HyperLogLog.from_bytes(b))
        nz = np.flatnonzero(acc.registers)
        return pd.DataFrame(
            {
                key_col: np.repeat(g[key_col].iloc[0], nz.size),
                "reg": nz.astype(np.int32),
                "reg_rank": acc.registers[nz].astype(np.int32),
            }
        )

    from ..stages.join import shuffle_coalesce

    merged = (
        shuffle_coalesce(ds.map_batches(partial, batch_format="pyarrow"))
        .groupby(key_col)
        .map_groups(merge_group, batch_format="pandas")
    )
    if not as_pandas:
        return merged
    out = merged.to_pandas()
    return out.sort_values([key_col, "reg"]).reset_index(drop=True)
