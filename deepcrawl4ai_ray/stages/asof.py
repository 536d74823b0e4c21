"""As-of join — an ordered-log operator Ray Data lacks natively.

Composition per the custom-operator rule (SURVEY.md §2.4 note: the
reference has no range/as-of joins; this is a training-data-pipeline
extension): bucket both sides by key, union (schemas null-aligned),
one groupby(bucket) shuffle, then ``pd.merge_asof`` per bucket over
ts-sorted sides.  Partitioning assumption: all rows of a key land in
one bucket, so backward/forward matching within the key is complete.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    ts: str,
    num_buckets: int = 16,
    direction: str = "backward",
    suffix: str = "_r",
):
    """For each left row, the nearest right row with right.ts <= left.ts
    (direction=backward) on the same key.  Left rows keep their columns;
    right's non-key/ts columns arrive suffixed.  Key column must be
    integer-typed (hash buckets via modulo).
    """
    l_cols = list(left.schema().names)
    r_cols = list(right.schema().names)

    def tag(side: str, cols_other, types_other):
        def fn(batch: pa.Table) -> pa.Table:
            v = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
            b = (v % np.uint64(num_buckets)).astype(np.int32)
            batch = batch.append_column("__b", pa.array(b)).append_column(
                "__side", pa.array([side] * len(batch), pa.string())
            )
            for c, t in zip(cols_other[0], cols_other[1]):
                if c not in batch.column_names:
                    batch = batch.append_column(c, pa.nulls(len(batch), t))
            return batch

        return fn

    l_schema, r_schema = left.schema(), right.schema()
    r_only = [c for c in r_cols if c not in l_cols]
    r_only_types = [r_schema.types[r_schema.names.index(c)] for c in r_only]
    l_only = [c for c in l_cols if c not in r_cols]
    l_only_types = [l_schema.types[l_schema.names.index(c)] for c in l_only]

    order = l_cols + r_only + ["__b", "__side"]
    l = left.map_batches(tag("l", (r_only, r_only_types), None), batch_format="pyarrow").map_batches(
        lambda t: t.select(order), batch_format="pyarrow"
    )
    r = right.map_batches(tag("r", (l_only, l_only_types), None), batch_format="pyarrow").map_batches(
        lambda t: t.select(order), batch_format="pyarrow"
    )
    both = l.union(r)

    def merge(g: pa.Table) -> pd.DataFrame:
        # Select each side's own columns from the ARROW group BEFORE the
        # pandas conversion — the union's null-padding would otherwise
        # promote every int column to float64 (corrupting keys > 2^53).
        # Right side sorted by (ts, remaining cols) so among equal-ts right
        # rows the winner (merge_asof backward takes the LAST) is pinned
        # deterministically across shuffle arrival orders (ADVICE r1).
        r_tie = [ts] + [c for c in r_cols if c != ts]
        mask = pc.equal(g["__side"], "l")
        lg = g.filter(mask).select(l_cols).to_pandas().sort_values(ts, kind="mergesort")
        rg = g.filter(pc.invert(mask)).select(r_cols).to_pandas().sort_values(r_tie, kind="mergesort")
        out_cols = l_cols + [c + suffix if c in l_cols else c for c in r_only]

        def _na_dtype(c):
            # dtype merge_asof would emit for an unmatched right column:
            # numeric → float64 (NaN-padded), timestamp → datetime64[ns],
            # else object — so blocks from right-empty/left-empty groups
            # unify with blocks from matched groups without type surprises
            at = g.schema.field(c).type
            if pa.types.is_integer(at) or pa.types.is_floating(at):
                return np.float64
            if pa.types.is_timestamp(at):
                return "datetime64[ns]"
            return object

        if lg.empty:
            # full merged column set even when empty: Ray's block concat
            # must never see a column-less frame (schema stability)
            out = lg.copy()
            for c in r_only:
                out[c + suffix if c in l_cols else c] = pd.Series(dtype=_na_dtype(c))
            return out[out_cols]
        if rg.empty:
            out = lg.copy()
            for c in r_only:
                out[c + suffix if c in l_cols else c] = pd.Series(
                    [np.nan] * len(lg), index=lg.index, dtype=_na_dtype(c)
                )
            return out[out_cols]
        out = pd.merge_asof(
            lg, rg, on=ts, by=key, direction=direction, suffixes=("", suffix)
        )
        # unify with the empty-group branches: a fully-matched group would
        # emit int64 right columns while a right-empty group emits float64
        # NaN — conflicting block schemas.  Cast every right-side column to
        # its group-independent _na_dtype so all groups agree.
        for c in r_only:
            name = c + suffix if c in l_cols else c
            want = _na_dtype(c)
            if want is np.float64 and out[name].dtype.kind in "iu":
                out[name] = out[name].astype(np.float64)
        return out

    return both.groupby("__b").map_groups(merge, batch_format="pyarrow")
