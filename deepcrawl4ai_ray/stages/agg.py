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
