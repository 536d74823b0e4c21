"""Deterministic global training-order shuffle — assign every document
its position in the seeded pseudo-random order a pretraining run would
consume it in, plus the shard file it would land in.

The reference stops at per-document markdown (tasks.py:381-383); a
training-data pipeline then needs a REPRODUCIBLE global shuffle of the
cleaned corpus ("shuffle once, shard, stream") — order by a keyed hash
of the document id, never by physical layout, so re-runs and resumes
see the identical order regardless of block boundaries or worker count.

Scale design (the global rank is the hard part — Ray Data has no rank
primitive and a full sort+zip would shuffle payloads twice):

1. one streaming pass computes ``key = md5(seed || '-' || id)`` and the
   key's first-byte bucket (256 buckets; the bucket is a PREFIX of the
   sort key, so global order == (bucket, key) order),
2. per-bucket counts are partial-aggregated inside ``map_batches`` and
   a ≤256-row groupby leaves the cluster; the driver prefix-sums those
   counts (O(256), never the documents) and broadcasts the offsets,
3. a single ``groupby(bucket).map_groups`` sorts WITHIN each bucket and
   emits ``rank = bucket_offset + local_index``.

Only the slim (id, key, bucket) table shuffles — never the text.  md5
matches DuckDB's ``md5()`` so the whole operator is SQL-oracle-checkable
via ``ROW_NUMBER() OVER (ORDER BY md5(...), id)``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import md5_hex


def shuffle_ranks(
    ds: "ray.data.Dataset",
    id_col: str,
    seed: str = "seed0",
    num_shards: Optional[int] = None,
) -> "ray.data.Dataset":
    """Dataset(id, shuffle_rank[, shard]) — ``shuffle_rank`` is the row's
    0-based position under ``ORDER BY md5(seed || '-' || id), id`` and
    ``shard`` (when ``num_shards`` is given) is the balanced contiguous
    output file ``rank * num_shards // total`` the row belongs to."""

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = [md5_hex(f"{seed}-{i}") for i in ids]
        bucket = np.array([int(k[:2], 16) for k in keys], dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "skey": pa.array(keys, pa.string()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Count

    counts = keyed_ds.groupby("bucket").aggregate(Count(alias_name="n")).take_all()
    counts.sort(key=lambda r: r["bucket"])
    offsets: dict = {}
    acc = 0
    for r in counts:
        offsets[int(r["bucket"])] = acc
        acc += int(r["n"])
    total = acc
    off_ref = ray.put(offsets)

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)[int(group["bucket"].iloc[0])]
        g = group.sort_values(["skey", id_col], kind="mergesort")
        rank = off + np.arange(len(g), dtype=np.int64)
        out = pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(dtype=np.int64),
                "shuffle_rank": rank,
            }
        )
        if num_shards is not None:
            out["shard"] = (rank * num_shards) // max(total, 1)
        return out

    return keyed_ds.groupby("bucket").map_groups(assign)
