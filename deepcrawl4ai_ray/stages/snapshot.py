"""Crawl snapshot diff — added / removed / changed pages between two
crawls of the same key space.  The incremental-recrawl primitive the
reference lacks entirely (its jobs are one-shot URL lists;
re-crawling re-fetches everything): diff yesterday's crawl output
against today's and only the delta flows downstream (re-extract, re-dedup,
re-index just the changed pages).

Scale shape: each side is reduced to a slim (key, md5(text)) table
inside ``map_batches`` BEFORE the join — page payloads never shuffle;
the FULL OUTER bucketed hash join (stages/join.hash_join, how="outer")
moves ~48 B/row.  Unchanged keys — the overwhelming majority of a real
recrawl — are dropped inside the merge bucket, so the output is only
the delta.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import md5_hex_many
from .join import hash_join

CHANGES = ("added", "removed", "changed")


def _hashed(ds: "ray.data.Dataset", key_col: str, text_col: str, out: str):
    def fn(batch: pa.Table) -> pa.Table:
        h = md5_hex_many([t or "" for t in batch[text_col].to_pylist()])
        return pa.table({key_col: batch[key_col], out: pa.array(h, pa.string())})

    mapped = ds.map_batches(fn, batch_format="pyarrow")
    from .join import _schema_types, _seed_empty

    # schema-pinned empty seed: an all-empty snapshot side must still
    # present (key, hash) columns to the downstream outer hash_join
    tmap = _schema_types(ds)
    if tmap is None:
        return mapped
    return _seed_empty(mapped, [(key_col, tmap[key_col]), (out, pa.string())])


def snapshot_diff(
    old: "ray.data.Dataset",
    new: "ray.data.Dataset",
    key_col: str,
    text_col: str,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Dataset(key, change) where change ∈ {added, removed, changed}:
    keys only in ``new`` are added, only in ``old`` are removed, in both
    with different md5(text) are changed; unchanged keys are dropped.
    Each side must be unique per key (crawl outputs are)."""
    j = hash_join(
        _hashed(old, key_col, text_col, "h_old"),
        _hashed(new, key_col, text_col, "h_new"),
        on=key_col,
        how="outer",
        num_buckets=num_buckets,
    )

    def classify(batch: pa.Table) -> pa.Table:
        old_null = pc.is_null(batch["h_old"])
        new_null = pc.is_null(batch["h_new"])
        # Kleene logic: not_equal() is null when a side is null, and the
        # non-Kleene and_/or_ would PROPAGATE that null into the filter
        # mask (dropping exactly the added/removed rows)
        changed = pc.and_kleene(
            pc.and_(pc.invert(old_null), pc.invert(new_null)),
            pc.not_equal(batch["h_old"], batch["h_new"]),
        )
        keep = pc.or_kleene(pc.or_(old_null, new_null), changed)
        sub = batch.filter(keep)
        return pa.table(
            {
                key_col: sub[key_col],
                "change": pc.if_else(
                    pc.is_null(sub["h_old"]),
                    pa.scalar("added", pa.string()),
                    pc.if_else(
                        pc.is_null(sub["h_new"]),
                        pa.scalar("removed", pa.string()),
                        pa.scalar("changed", pa.string()),
                    ),
                ),
            }
        )

    out = j.map_batches(classify, batch_format="pyarrow")
    from .join import _schema_types, _seed_empty

    tmap = _schema_types(old, new)
    if tmap is None:
        return out
    # schema-pinned empty seed: identical snapshots yield zero rows
    return _seed_empty(out, [(key_col, tmap[key_col]), ("change", pa.string())])



def recrawl_priority(
    snapshots: list,
    key_col: str,
    text_col: str,
    num_buckets: int = 32,
    hot_min: int | None = None,
) -> "ray.data.Dataset":
    """Change-rate-driven recrawl planner: given K successive crawl
    snapshots of the same key space, count per-key content CHANGES
    across consecutive snapshot pairs and bucket each key into a
    recrawl priority — ``hot`` (changed in >= hot_min diffs, default
    all K-1), ``warm`` (changed at least once), ``cold`` (never
    changed).  This is the scheduling policy a continuous crawler feeds
    back into its frontier (the reference re-fetches everything on a
    fixed schedule, scrape.py:12-31; change-rate planning is what makes
    a 10^10-URL recrawl affordable).

    Scale shape: ONE all-to-all total — every snapshot reduces to slim
    (key, md5, snap_idx) rows inside map_batches (payloads never
    shuffle), the K-way union co-locates each key's history with a
    single bucket groupby, and the per-key consecutive-change count is
    a vectorized pivot inside the bucket.  (A chain of K-1
    snapshot_diff joins computes the same thing with K wide steps —
    measured 3× slower at K=3 from all-to-all launch cost alone.)
    A key absent from some snapshot contributes changes only between
    consecutive snapshots where it is PRESENT (frontier insert/delete
    handles appearance/disappearance).

    → Dataset(key, n_changes, priority).
    """
    if len(snapshots) < 2:
        raise ValueError("recrawl_priority needs at least two snapshots")
    K = len(snapshots)
    hot_at = (K - 1) if hot_min is None else hot_min

    import numpy as np

    from .join import _key_buckets

    def slim(idx: int):
        def fn(batch: pa.Table) -> pa.Table:
            h = md5_hex_many([t or "" for t in batch[text_col].to_pylist()])
            return pa.table(
                {
                    key_col: batch[key_col],
                    "h": pa.array(h, pa.string()),
                    # int32: with int8, >127 snapshots wraps the index
                    # negative and the pivot reindex silently drops them
                    "snap": pa.array(np.full(len(batch), idx, dtype=np.int32)),
                    "__b": pa.array(_key_buckets(batch[key_col], num_buckets)),
                }
            )

        return fn

    parts = [ds.map_batches(slim(i), batch_format="pyarrow") for i, ds in enumerate(snapshots)]
    u = parts[0].union(*parts[1:])

    def bucket_count(g) -> "pa.Table":
        import pandas as pd

        df = g if isinstance(g, pd.DataFrame) else g.to_pandas()
        # aggfunc=min: a key captured more than once within ONE snapshot
        # collapses to its min(md5) deterministically (row order inside a
        # shuffled group is not stable, so "first" would flip classes
        # between runs)
        p = df.pivot_table(index=key_col, columns="snap", values="h", aggfunc="min")
        p = p.reindex(columns=range(K))
        arr = p.to_numpy(dtype=object)
        present = ~pd.isna(p).to_numpy()  # pivot fills absences with NaN
        both = present[:, :-1] & present[:, 1:]
        ch = ((arr[:, :-1] != arr[:, 1:]) & both).sum(axis=1)
        return pd.DataFrame(
            {
                key_col: p.index.to_numpy(),
                "n_changes": ch.astype("int64"),
            }
        )

    agg = u.groupby("__b").map_groups(bucket_count, batch_format="pandas")

    def classify(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch["n_changes"], pa.int64())
        prio = pc.if_else(
            pc.greater_equal(n, pa.scalar(hot_at, pa.int64())),
            pa.scalar("hot", pa.string()),
            pc.if_else(
                pc.greater_equal(n, pa.scalar(1, pa.int64())),
                pa.scalar("warm", pa.string()),
                pa.scalar("cold", pa.string()),
            ),
        )
        return pa.table({key_col: batch[key_col], "n_changes": n, "priority": prio})

    return agg.map_batches(classify, batch_format="pyarrow")
