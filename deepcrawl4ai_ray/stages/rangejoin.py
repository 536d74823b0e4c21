"""Range (interval) join — points matched to enclosing intervals.

An ordered-log operator Ray Data lacks natively (the reference has no
range joins at all, SURVEY.md §2.4; this is a training-data-pipeline
extension named by the task brief alongside the as-of join).

Plan (composition per the custom-operator rule): explode each interval
to one row per covered time bucket, tag each point with its single
bucket, ONE groupby(bucket-hash) shuffle co-locates candidates, and an
exact ``lo <= ts <= hi`` merge runs inside each group.

Partitioning assumptions (documented):
- a point lives in exactly ONE bucket, so each (point, interval) pair
  meets in at most one group — results are exactly-once with no
  cross-group dedup pass;
- interval spans should be O(bucket_width): an interval covering B
  buckets emits B rows (the shuffle amplification factor).  Pick
  ``bucket_width`` ≈ the typical span; pathological giant intervals
  belong on a broadcast side instead.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def interval_join(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    ts_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width_us: int,
    num_buckets: int = 32,
    point_cols: Optional[List[str]] = None,
    interval_cols: Optional[List[str]] = None,
) -> "ray.data.Dataset":
    """Inner join: every (point, interval) with lo <= ts <= hi.

    ``ts_col`` / ``lo_col`` / ``hi_col`` are timestamp[us] (or int64 us)
    columns; output carries ``point_cols`` + ``interval_cols`` (names
    must be disjoint).  One groupby shuffle; exact bounds check inside
    groups.
    """
    p_cols = point_cols or [c for c in points.schema().names]
    i_cols = interval_cols or [c for c in intervals.schema().names]
    overlap = set(p_cols) & set(i_cols)
    if overlap:
        raise ValueError(f"interval_join: overlapping output columns {overlap}")
    w = np.int64(bucket_width_us)

    def _us(col) -> np.ndarray:
        a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_timestamp(a.type):
            a = a.cast(pa.int64())
        return a.to_numpy(zero_copy_only=False).astype(np.int64)

    def tag_points(t: pa.Table) -> pa.Table:
        b = _us(t[ts_col]) // w
        out = t.select(p_cols)
        out = out.append_column("__tb", pa.array(b))
        out = out.append_column("__side", pa.array(np.repeat("p", len(t)), pa.string()))
        return out

    def explode_intervals(t: pa.Table) -> pa.Table:
        lo = _us(t[lo_col])
        hi = _us(t[hi_col])
        b_lo = lo // w
        b_hi = hi // w
        reps = np.maximum(0, b_hi - b_lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(t)), reps)
        # covered buckets per interval: b_lo + 0..reps-1
        offs = np.concatenate([np.arange(r) for r in reps]) if len(t) else np.empty(0, np.int64)
        buckets = b_lo[idx] + offs
        out = t.select(i_cols).take(pa.array(idx))
        out = out.append_column("__tb", pa.array(buckets))
        out = out.append_column("__side", pa.array(np.repeat("i", len(idx)), pa.string()))
        return out

    # union the two tagged sides on one schema (null-pad the other side's
    # columns), then a single groupby over hash(bucket) % num_buckets
    p_schema, i_schema = points.schema(), intervals.schema()
    p_types = {n: t for n, t in zip(p_schema.names, p_schema.types)}
    i_types = {n: t for n, t in zip(i_schema.names, i_schema.types)}
    order = p_cols + i_cols + ["__tb", "__side", "__g"]

    def pad(fn, own_cols, other_cols, other_types):
        def wrapped(t: pa.Table) -> pa.Table:
            t = fn(t)
            for c in other_cols:
                t = t.append_column(c, pa.nulls(len(t), other_types[c]))
            g = (t["__tb"].to_numpy(zero_copy_only=False).astype(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
            t = t.append_column("__g", pa.array(g))
            return t.select(order)

        return wrapped

    l = points.map_batches(pad(tag_points, p_cols, i_cols, i_types), batch_format="pyarrow")
    r = intervals.map_batches(pad(explode_intervals, i_cols, p_cols, p_types), batch_format="pyarrow")
    both = l.union(r)

    def merge(g: pa.Table) -> pd.DataFrame:
        # select each side's own columns from the ARROW group before the
        # pandas conversion (hash_join's int-promotion lesson)
        mask = pc.equal(g["__side"], "p")
        pg = g.filter(mask).select(p_cols + ["__tb"]).to_pandas()
        ig = g.filter(pc.invert(mask)).select(i_cols + ["__tb"]).to_pandas()
        # inner merge keeps arrow-derived dtypes even when a side is
        # empty — blocks stay schema-stable across groups (asof lesson)
        m = pg.merge(ig, on="__tb")  # same-bucket candidates
        keep = (m[ts_col] >= m[lo_col]) & (m[ts_col] <= m[hi_col])
        return m.loc[keep, p_cols + i_cols]

    return both.groupby("__g").map_groups(merge, batch_format="pyarrow")
