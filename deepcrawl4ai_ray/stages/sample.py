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
        # pure numpy per-group head-n (r5, was pandas groupby.head):
        # group-major lexsort, position-in-group via boundary arithmetic
        sel = batch.select(cols)
        ids = sel[id_col].to_numpy(zero_copy_only=False)
        rk = _rank_key(ids)
        grp = np.asarray(sel[group_col].to_pylist(), dtype=object)
        order = np.lexsort((ids, rk, grp))
        gs = grp[order]
        new = np.empty(len(gs), dtype=bool)
        if len(gs):
            new[0] = True
            new[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(new)
        gid = np.cumsum(new) - 1
        pos = np.arange(len(gs)) - starts[gid] if len(gs) else np.array([], dtype=np.int64)
        keep = order[pos < n]
        out = sel.take(pa.array(keep, pa.int64()))
        return out.append_column("_rk", pa.array(rk[keep], pa.string()))

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


def temperature_targets(counts: dict, frac: float, tau: float = 2.0) -> dict:
    """Per-group EXACT sample-size targets for temperature-balanced
    sampling (the mT5/XLM-R corpus-balancing rule with T=2, i.e.
    q_g ∝ sqrt(p_g)): c_g = floor(frac · N · q_g), capped at the group
    size.  Only sqrt/divide/floor so the SQL oracle reproduces the same
    integers bit-for-bit (IEEE sqrt is correctly rounded; q is rounded
    to 12 dp in both before the floor to absorb summation-order ulps).
    Only tau=2.0 is supported — general tau needs pow(), whose last-ulp
    rounding differs across libms and would make the oracle flaky."""
    if tau != 2.0:
        raise NotImplementedError("only tau=2.0 (sqrt scaling) is oracle-reproducible")
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0,1], got {frac}")
    n_total = float(sum(counts.values()))
    if n_total == 0:
        return {g: 0 for g in counts}
    roots = {g: float(np.sqrt(n / n_total)) for g, n in counts.items()}
    denom = sum(roots[g] for g in sorted(roots))
    out = {}
    for g, n in counts.items():
        q = round(roots[g] / denom, 12)
        out[g] = min(int(n), int(np.floor(frac * n_total * q)))
    return out


def stratified_targets_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    id_col: str,
    targets: dict,
    keep_cols: Optional[List[str]] = None,
) -> "ray.data.Dataset":
    """stratified_sample with a PER-GROUP target count: group g keeps
    its targets[g] smallest rows by (md5(id), id); groups absent from
    ``targets`` are dropped.  The targets dict (one int per group — the
    group vocabulary, KBs) is broadcast once via ray.put; the per-batch
    prune bounds the shuffle at O(Σ targets · blocks)."""
    import ray as _ray

    cols = keep_cols or [group_col, id_col]
    if group_col not in cols or id_col not in cols:
        raise ValueError(f"keep_cols must include {group_col!r} and {id_col!r}")
    tref = _ray.put({g: int(n) for g, n in targets.items()})

    def prune(batch: pa.Table) -> pa.Table:
        # pure numpy per-group head-n(g) (r5, was pandas groupby.apply):
        # group-major lexsort + boundary arithmetic; per-group targets
        # looked up once on the UNIQUE group values, not per row
        tgt = _ray.get(tref)
        schema = batch.select(cols).schema.append(pa.field("_rk", pa.string()))
        sel = batch.select(cols)
        if sel.num_rows == 0:
            return schema.empty_table()
        ids = sel[id_col].to_numpy(zero_copy_only=False)
        rk = _rank_key(ids)
        grp = np.asarray(sel[group_col].to_pylist(), dtype=object)
        order = np.lexsort((ids, rk, grp))
        gs = grp[order]
        new = np.empty(len(gs), dtype=bool)
        new[0] = True
        new[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(new)
        gid = np.cumsum(new) - 1
        pos = np.arange(len(gs)) - starts[gid]
        caps = np.array([tgt.get(gs[s], 0) for s in starts], dtype=np.int64)
        keep = order[pos < caps[gid]]
        if not len(keep):
            return schema.empty_table()
        out = sel.take(pa.array(keep, pa.int64()))
        return out.append_column("_rk", pa.array(rk[keep], pa.string())).cast(schema)

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        tgt = _ray.get(tref)
        n = tgt.get(group[group_col].iloc[0], 0)
        g = group.sort_values(["_rk", id_col], kind="mergesort").head(n)
        return g.drop(columns=["_rk"])

    pruned = ds.map_batches(prune, batch_format="pyarrow")
    return pruned.groupby(group_col).map_groups(pick)


def _poisson_keys(ids: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Sequential-Poisson sort key u/w: u = first 16 md5 hex digits of
    the id's decimal string as uint64, w = the row weight.  Every step
    (hex parse, uint64→float64 conversion, division) is an IEEE
    correctly-rounded operation, so numpy and DuckDB
    (``CAST(('0x' || substr(md5(id::VARCHAR),1,16)) AS UBIGINT) / w``)
    produce bit-identical doubles — no transcendental (ln/pow) whose
    last-ulp rounding could differ between libms."""
    u = np.array(
        [int(h[:16], 16) for h in md5_hex_many([str(int(i)) for i in ids])],
        dtype=np.uint64,
    )
    return u.astype(np.float64) / weights.astype(np.float64)


def weighted_sample_topk(
    ds: "ray.data.Dataset",
    id_col: str,
    weight_col: str,
    k: int,
    keep_cols: Optional[List[str]] = None,
    key_col: str = "sample_key",
) -> "ray.data.Dataset":
    """Weight-proportional reproducible sampling — sequential Poisson
    sampling (Ohlsson '98, the πps design used for size-weighted survey
    draws): row i gets key u_i / w_i with u_i a deterministic hash
    uniform, and the k smallest keys win, so P(selected) ≈ k·w_i/Σw for
    k ≪ N.  The training-data use is token-budget-aware subset
    selection: weighting documents by length (or a quality score) draws
    a fixed-count subset whose inclusion odds follow the weight, without
    RNG state or coordination — any engine reproduces the same set.

    Scale shape: keys are computed map-side on slim columns; each block
    pre-prunes to its local k smallest, so the global sort sees at most
    k rows per block (O(k·blocks), never the input); payloads beyond
    ``keep_cols`` never move.  Weights must be strictly positive — the
    kernel raises on w ≤ 0 rather than silently surfacing +inf/NaN keys.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    cols = keep_cols or [id_col, weight_col]
    if id_col not in cols or weight_col not in cols:
        raise ValueError(f"keep_cols must include {id_col!r} and {weight_col!r}")

    def prune(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        w = t[weight_col].to_numpy(zero_copy_only=False)
        if len(w) and (w <= 0).any():
            bad = int(np.argmax(w <= 0))
            raise ValueError(
                f"weighted_sample_topk: non-positive weight "
                f"{w[bad]!r} in column {weight_col!r}"
            )
        keys = _poisson_keys(t[id_col].to_numpy(zero_copy_only=False), w)
        t = t.append_column(key_col, pa.array(keys, type=pa.float64()))
        order = np.lexsort((t[id_col].to_numpy(zero_copy_only=False), keys))[:k]
        return t.take(pa.array(np.sort(order)))

    from ..stages.join import _schema_types, _seed_empty, shuffle_coalesce

    # coalesce: per-block prunes emit many small blocks; without it the
    # sort's sub-inline-threshold chunks accumulate in the driver store
    # (sf1 proof: +190 MB driver RssAnon at this stage)
    pruned = shuffle_coalesce(ds.map_batches(prune, batch_format="pyarrow"))
    out = pruned.sort([key_col, id_col]).limit(k)
    tmap = _schema_types(pruned, ds)
    if tmap is None:
        return out
    fields = [(c, tmap.get(c, pa.float64())) for c in cols] + [(key_col, pa.float64())]
    return _seed_empty(out, fields)


def temperature_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    id_col: str,
    frac: float,
    keep_cols: Optional[List[str]] = None,
) -> "ray.data.Dataset":
    """Temperature-balanced corpus sampling: one small groupby derives
    the group sizes (K rows — the group vocabulary, driver-held by
    design), temperature_targets turns them into exact per-group sample
    sizes (low-resource groups up-weighted, head groups down-weighted),
    and the deterministic md5-order pick draws them.  Two wide ops
    total: the counting groupby and the pruned selection groupby."""
    from ray.data.aggregate import Count

    cnt_rows = ds.groupby(group_col).aggregate(Count(alias_name="n")).take_all()
    counts = {r[group_col]: int(r["n"]) for r in cnt_rows}
    targets = temperature_targets(counts, frac)
    return stratified_targets_sample(ds, group_col, id_col, targets, keep_cols)


def keyed_split(
    ds: "ray.data.Dataset",
    key_col: str,
    splits: "dict[str, float]",
    salt: str = "",
) -> "ray.data.Dataset":
    """Leakage-free train/val/test assignment: EVERY row with the same
    key (host, source, url-domain) lands in the same split — the
    standard guard against near-duplicate pages of one site straddling
    train and eval.  Pure map-side (zero shuffles): split =
    hash-interval of md5_int63(key || salt), with integer interval
    bounds floor(cum_frac * 2^63) so the DuckDB twin
    (md5_number_lower & mask63 compared to the same literals) is
    bit-identical.  Proportions are approximate in KEY-mass (a heavy key
    drags its whole row-mass with it — that is the point); ``salt``
    re-rolls the assignment without touching the data."""
    from ..functions.hashing import md5_int63

    names = list(splits)
    fracs = np.array([splits[n] for n in names], dtype=np.float64)
    if not np.isclose(fracs.sum(), 1.0):
        raise ValueError(f"split fractions must sum to 1, got {fracs.sum()}")
    # upper bounds of each split's hash interval; the last is clamped to
    # the full range so float rounding can never orphan the top hashes
    bounds = np.floor(np.cumsum(fracs) * float(2**63)).astype(np.uint64)
    bounds[-1] = np.uint64(2**63)

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        h = md5_int63([(k or "") + salt for k in keys]).astype(np.uint64)
        idx = np.searchsorted(bounds, h, side="right")
        return batch.append_column(
            "split", pa.array([names[i] for i in idx], pa.string())
        )

    return ds.map_batches(tag, batch_format="pyarrow")
