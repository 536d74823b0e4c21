"""Deterministic stratified sampling — exactly n rows per group,
chosen by a content hash so any engine (and the SQL oracle) reproduces
the same sample bit-for-bit.  Complements the corpus-wide hash
threshold sample (queries.hash_sampled_events): threshold sampling
cannot guarantee per-stratum counts, which is what training-data
mixture control needs (n docs per language/source/quality bucket).

Scale shape: the per-batch partial prune keeps at most n rows per
group per batch, so the shuffle that follows carries
O(n · groups · blocks) rows — never the input.  The final per-group
selection is a small ``groupby().map_groups`` over pruned rows.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.hashing import md5_hex_many


def _rank_key(ids: np.ndarray) -> np.ndarray:
    """md5 hex of the id's decimal string — matches DuckDB
    ``md5(CAST(id AS VARCHAR))`` so the oracle reproduces the sample."""
    return np.asarray(md5_hex_many([str(int(i)) for i in ids]), dtype=object)


def stratified_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    id_col: str,
    n: int,
    keep_cols: Optional[List[str]] = None,
) -> "ray.data.Dataset":
    """Exactly min(n, |group|) rows per group, the n smallest by
    (md5(id), id) — a deterministic uniform draw (md5 order is
    uncorrelated with any data order).  Returns the kept rows with
    ``keep_cols`` (default: group + id)."""
    cols = keep_cols or [group_col, id_col]
    if group_col not in cols or id_col not in cols:
        raise ValueError(f"keep_cols must include {group_col!r} and {id_col!r}")

    def prune(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        df["_rk"] = _rank_key(df[id_col].to_numpy())
        df = df.sort_values(["_rk", id_col], kind="mergesort")
        df = df.groupby(group_col, sort=False).head(n)
        return pa.Table.from_pandas(df, preserve_index=False)

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["_rk", id_col], kind="mergesort").head(n)
        return g.drop(columns=["_rk"])

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    return pruned.groupby(group_col).map_groups(pick)
