"""Streaming-shaped operators over an ordered event log.

Ray Data has no event-time windows (ray_guide 'Streaming-shaped
workloads'); the reference's streaming is completion-ordered Redis
chunks with a terminal marker (SURVEY.md §2.9) and a ready-time ZSET
queue (S3/O1, crawl.py:146-168).  Re-expression here:

- tumbling window aggregate: vectorized window-start truncation inside
  map_batches + partial grouped sums (no per-row python).
- session windows: groupby(key) shuffle, then per-group pandas
  gap-based sessionization (sorted by ts) inside map_groups.
- ready-queue select: predicate ts <= watermark, global (ts, id) sort,
  limit — the ZSET pop-due-tasks analog.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .agg import partial_grouped_sum


def tumbling_window_agg(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    value_col: str,
    window: str = "hour",
):
    """→ Dataset(key, window_start, sum_<value>, n) via partial agg."""

    def trunc(batch: pa.Table) -> pa.Table:
        ws = pc.floor_temporal(batch[ts_col], unit=window)
        return batch.append_column("window_start", ws)

    windowed = ds.map_batches(trunc, batch_format="pyarrow")
    return partial_grouped_sum(
        windowed, [key_col, "window_start"], sums=[value_col], count_alias="n"
    )


def session_counts(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    gap: pd.Timedelta,
    num_buckets: int = 16,
):
    """Sessions per key: a new session starts when the gap to the
    previous event (per key, ts-ordered) exceeds ``gap``.

    Bucketed: ONE groupby over hash(key) % num_buckets (a few large
    groups, not one python call per key), then fully-vectorized
    sessionization inside each bucket — sort by (key, ts), a session
    start is a key change OR a gap breach, per-key session count is a
    grouped sum of starts.  Returns Dataset(key, n_sessions).
    """
    import numpy as np

    def tag(batch: pa.Table) -> pa.Table:
        v = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column("__b", pa.array((v % num_buckets).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col], kind="mergesort")
        new_key = g[key_col].ne(g[key_col].shift())
        gap_breach = (g[ts_col] - g[ts_col].shift()) > gap
        starts = new_key | gap_breach
        ns = starts.groupby(g[key_col].to_numpy()).sum()
        return pd.DataFrame({key_col: ns.index, "n_sessions": ns.to_numpy().astype("int64")})

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
    )
    from .join import _schema_types, _seed_empty

    tmap = _schema_types(ds)
    if tmap is None:
        return out
    # schema-pinned empty seed: an all-empty result keeps its schema
    return _seed_empty(out, [(key_col, tmap[key_col]), ("n_sessions", pa.int64())])


def ready_queue(
    ds: "ray.data.Dataset",
    ts_col: str,
    watermark,
    order_cols,
    limit: int,
):
    """Due-task selection: ts <= watermark, ordered, limited (O1)."""
    due = ds.map_batches(
        lambda t: t.filter(pc.less_equal(t[ts_col], pa.scalar(watermark))),
        batch_format="pyarrow",
    )
    return due.sort(order_cols).limit(limit)
