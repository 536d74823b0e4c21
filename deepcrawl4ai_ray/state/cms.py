"""Count-Min sketch — approximate frequency counting with mergeable,
oracle-reproducible partials (Cormode & Muthukrishnan 2005).

The bounded-memory answer to "how often does each of these keys occur"
at 10^10-URL-frontier scale: each map task folds its batch into a
depth x width int64 counter grid (nonzero cells as slim (r, b, n) rows),
partials merge by SUM, point estimate = MIN over the depth rows — an
overestimate, never an under (the property tests pin both).

Hashing is one md5 per value (DuckDB ``md5_number_lower`` twin, the
same convention as state/hll.py); the depth row hashes are disjoint
11-bit slices of that 64-bit hash, so the whole counter grid AND every
estimate are integer-exact against a pure-SQL oracle:

    bucket_r(v) = (md5_number_lower(v) >> (11*r)) % width

Width must be a power of two <= 2^11 per slice and depth*11 <= 64.
"""

from __future__ import annotations

import numpy as np


class CountMinSketch:
    def __init__(self, depth: int = 4, width: int = 2048):
        if width & (width - 1) or not 1 <= width <= 2048:
            raise ValueError("width must be a power of two in [1, 2048]")
        if not 1 <= depth <= 5:
            raise ValueError("depth must be in [1, 5] (11-bit hash slices)")
        self.depth = depth
        self.width = width
        self.counters = np.zeros((depth, width), dtype=np.int64)

    def _buckets(self, h64: np.ndarray) -> np.ndarray:
        """(depth, n) bucket indices from pre-hashed uint64 values."""
        h = h64.astype(np.uint64)
        return np.stack(
            [
                ((h >> np.uint64(11 * r)) % np.uint64(self.width)).astype(np.int64)
                for r in range(self.depth)
            ]
        )

    def add_many(self, h64: np.ndarray) -> None:
        if h64.size == 0:
            return
        b = self._buckets(h64)
        for r in range(self.depth):
            self.counters[r] += np.bincount(b[r], minlength=self.width)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.depth, other.width) != (self.depth, self.width):
            raise ValueError("cannot merge sketches with different shapes")
        self.counters += other.counters
        return self

    def estimate_many(self, h64: np.ndarray) -> np.ndarray:
        """Point estimates (int64) — MIN over the depth rows; >= truth."""
        if h64.size == 0:
            return np.empty(0, dtype=np.int64)
        b = self._buckets(h64)
        ests = np.stack([self.counters[r][b[r]] for r in range(self.depth)])
        return ests.min(axis=0)


def cms_counters(ds, value_col: str, depth: int = 4, width: int = 2048):
    """Distributed Count-Min counter grid over a Dataset column.

    Each block contributes its nonzero cells as slim (r, b, n) rows
    (<= depth*width per block, values themselves never shuffle); one
    two-level bucketed SUM merges them.  Returns the grid as a pandas
    frame (r:int32, b:int32, n:int64) — a bounded artifact
    (depth*width rows) regardless of input size.
    """
    import pandas as pd
    import pyarrow as pa

    from ..functions.hashing import md5_u64
    from ..stages.join import bucketed_sum

    probe = CountMinSketch(depth, width)  # validates shape

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[value_col].to_pandas().astype(str).tolist()
        sk = CountMinSketch(depth, width)
        sk.add_many(md5_u64(vals))
        r, b = np.nonzero(sk.counters)
        return pa.table(
            {
                "r": pa.array(r.astype(np.int32)),
                "b": pa.array(b.astype(np.int32)),
                "n": pa.array(sk.counters[r, b]),
            }
        )

    merged = bucketed_sum(
        ds.map_batches(partial, batch_format="pyarrow"), ["r", "b"], "n", "n"
    ).to_pandas()
    merged["r"] = merged["r"].astype("int32")
    merged["b"] = merged["b"].astype("int32")
    merged["n"] = merged["n"].astype("int64")
    return merged.sort_values(["r", "b"]).reset_index(drop=True)


def cms_estimate(counters, probes, depth: int = 4, width: int = 2048) -> np.ndarray:
    """int64 estimates for probe STRINGS from a cms_counters frame."""
    from ..functions.hashing import md5_u64

    sk = CountMinSketch(depth, width)
    sk.counters[counters["r"].to_numpy(), counters["b"].to_numpy()] = counters["n"].to_numpy()
    return sk.estimate_many(md5_u64(list(probes)))
