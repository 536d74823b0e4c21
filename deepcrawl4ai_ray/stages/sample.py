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


def mixture_rate_thresholds(rates: dict) -> dict:
    """Per-group hex thresholds for mixture_sample: group g keeps a row
    iff md5(id)[:4] < thresholds[g] (string compare over equal-length
    lowercase hex), i.e. P(keep) = floor(rate*65536)/65536.  rate >= 1.0
    maps to None = keep-all (lexicographic compare cannot express it)."""
    out = {}
    for g, r in rates.items():
        if r < 0.0 or r > 1.0:
            raise ValueError(f"rate for {g!r} must be in [0,1], got {r}")
        out[g] = None if r >= 1.0 else format(int(r * 65536), "04x")
    return out


def mixture_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    id_col: str,
    rates: dict,
    default_rate: float = 0.0,
) -> "ray.data.Dataset":
    """Source-weighted (mixture / temperature) sampling — the domain
    reweighting step of a pretraining data recipe: keep each row of
    group g independently with probability rates[g], decided by a
    deterministic content hash so the sample is reproducible across
    engines, runs, and block layouts (no RNG state, no coordination).

    The rates dict is broadcast once via ray.put and resolved per task;
    the per-row decision is a pure function of (id, group), so the
    operator is embarrassingly parallel — no shuffle at all.  The SQL
    oracle is generated from the SAME dict by mixture_sample_sql_case().
    """
    import ray as _ray

    thr = mixture_rate_thresholds(rates)
    dthr = mixture_rate_thresholds({"_": default_rate})["_"]
    thr_ref = _ray.put((thr, dthr))

    def keep_batch(batch: pa.Table) -> pa.Table:
        t, dt = _ray.get(thr_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keys = _rank_key(ids)
        groups = batch[group_col].to_pylist()
        keep = np.empty(len(ids), dtype=bool)
        for i, g in enumerate(groups):
            th = t.get(g, dt)
            keep[i] = True if th is None else keys[i][:4] < th
        return batch.filter(pa.array(keep))

    return ds.map_batches(keep_batch, batch_format="pyarrow")


def mixture_sample_sql_case(
    rates: dict, group_col: str, id_col: str, default_rate: float = 0.0
) -> str:
    """DuckDB WHERE-clause reproducing mixture_sample bit-for-bit."""
    thr = mixture_rate_thresholds(rates)
    key = f"substr(md5(CAST({id_col} AS VARCHAR)), 1, 4)"
    arms = []
    for g, th in sorted(thr.items()):
        cond = "TRUE" if th is None else f"{key} < '{th}'"
        arms.append(f"WHEN {group_col} = '{g}' THEN {cond}")
    dthr = mixture_rate_thresholds({"_": default_rate})["_"]
    default = "TRUE" if dthr is None else f"{key} < '{dthr}'"
    return "CASE " + " ".join(arms) + f" ELSE {default} END"
