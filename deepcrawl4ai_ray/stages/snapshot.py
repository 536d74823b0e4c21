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

    return ds.map_batches(fn, batch_format="pyarrow")


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

    return j.map_batches(classify, batch_format="pyarrow")
