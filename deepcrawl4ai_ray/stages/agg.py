"""Aggregation helpers: partial (combiner-style) grouped aggregation.

The scale pattern (SURVEY.md §2.5, ray_guide 'Aggregation at scale'):
a bare ``groupby().aggregate()`` shuffles every row; instead each
map_batches task pre-aggregates its batch with Arrow's hash kernels
(``pa.TableGroupBy``) so only one row per (key, batch) enters the
all-to-all exchange, then a small final ``groupby().aggregate()``
merges partials.  The reference's only aggregations are counters
(crawl.py:534-563, monitor.py:158-173) — this generalizes them.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

import ray.data
from ray.data.aggregate import Max, Min, Sum


def partial_grouped_sum(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    sums: Sequence[str] = (),
    count_alias: str | None = None,
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
) -> "ray.data.Dataset":
    """Grouped sums/count/min/max with per-batch pre-aggregation.

    Returns a Dataset with columns: keys + ``sum_<col>`` for each sums
    entry + ``count_alias`` (+ ``min_<col>`` / ``max_<col>``).  Sums and
    counts combine across batches by summation; min/max by min/max.
    """
    keys = list(keys)
    aggs_arrow = [(c, "sum") for c in sums] + [(c, "min") for c in mins] + [(c, "max") for c in maxs]
    if count_alias:
        aggs_arrow.append((keys[0], "count"))

    def partial(batch: pa.Table) -> pa.Table:
        # arrow hash-aggregate within the batch; output names "<col>_sum" etc.
        return batch.group_by(keys).aggregate(aggs_arrow)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    final_aggs = []
    for c in sums:
        final_aggs.append(Sum(f"{c}_sum", alias_name=f"sum_{c}"))
    for c in mins:
        final_aggs.append(Min(f"{c}_min", alias_name=f"min_{c}"))
    for c in maxs:
        final_aggs.append(Max(f"{c}_max", alias_name=f"max_{c}"))
    if count_alias:
        final_aggs.append(Sum(f"{keys[0]}_count", alias_name=count_alias))
    out = partials.groupby(keys).aggregate(*final_aggs)
    return out


def grouped_to_pandas(ds, sort_by):
    """Materialize a (small) grouped result to pandas, sorted."""
    df = ds.to_pandas()
    return df.sort_values(sort_by, kind="mergesort").reset_index(drop=True)


def grouped_quantiles_tdigest(
    ds: "ray.data.Dataset",
    key: str,
    val: str,
    qs: Sequence[float] = (0.5, 0.9),
    compression: int = 200,
) -> "ray.data.Dataset":
    """Sketch path for grouped quantiles (the 100-TB variant of an exact
    per-group sort): each map_batches task folds its batch into one
    t-digest per key, so only ~16 B × 2δ digest bytes per (block, key)
    enter the groupby shuffle — never raw values — and a skewed key
    merges ≤ blocks digests instead of materializing every row in one
    task.  Rank error ≲ 1/compression at mid quantiles (state/tdigest,
    Dunning & Ertl 2019); the exact map_groups path stays the default
    where groups fit a task.

    → Dataset(key, n, p<q*100>...)."""
    import numpy as np
    import pandas as pd

    from ..state.tdigest import TDigest

    def partial(batch: pa.Table) -> pa.Table:
        key_type = batch.schema.field(key).type  # stable across empty blocks
        df = batch.select([key, val]).to_pandas()
        out_k, out_d, out_n = [], [], []
        # null keys are unsupported here, as in every grouped operator in
        # this engine: Ray's sort-based groupby cannot order null keys
        # (TypeError in sort_and_partition) — filter them upstream
        for kv, g in df.groupby(key, sort=False):
            d = TDigest(compression)
            d.add_many(g[val].to_numpy(dtype=np.float64))
            out_k.append(kv)
            out_d.append(d.to_bytes())
            out_n.append(len(g))
        return pa.table(
            {
                key: pa.array(out_k, key_type),
                "digest": pa.array(out_d, pa.binary()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        d = TDigest(compression)
        for b in g["digest"]:
            d.merge(TDigest.from_bytes(b))
        row = {key: [g[key].iloc[0]], "n": [np.int64(g["n"].sum())]}
        for q in qs:
            row[f"p{int(round(q * 100))}"] = [round(float(d.quantile(q)), 4)]
        return pd.DataFrame(row)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(merge_group, batch_format="pandas")
    )
