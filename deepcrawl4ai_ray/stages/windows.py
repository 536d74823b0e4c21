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
):
    """Sessions per key: a new session starts when the gap to the
    previous event (per key, ts-ordered) exceeds ``gap``.

    One groupby(key) shuffle; per-group state fits easily (a user's
    events).  Returns Dataset(key, n_sessions).
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].sort_values()
        new_sessions = (ts.diff() > gap).sum()
        return pd.DataFrame({key_col: [g[key_col].iloc[0]], "n_sessions": [int(new_sessions) + 1]})

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


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
