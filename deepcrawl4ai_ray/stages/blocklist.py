"""UT1-style domain-blocklist filtering.

Production webtext pipelines drop documents whose host falls under a
curated blocklist (UT1 adult/malware lists, RefinedWeb §3.1 "URL
filtering"); the reference filters single URLs per request
(deepscrape api.py:211-227 takes one url), it has no corpus-scale
blocklist pass — this is a training-pipeline extension.

Semantics (the UT1 convention): a blocklist entry ``d`` blocks a host
``h`` iff ``h == d`` or ``h`` ends with ``'.' + d`` — i.e. some
label-boundary suffix of ``h`` equals ``d``.  When several entries match
(``site.example`` and ``ads.site.example``), the lexicographically
smallest matching entry is reported so engine and SQL oracle agree
deterministically.

Ray-Data-first shape: the blocklist is a bounded artifact (UT1 is a few
MB), so it is ``ray.put`` ONCE and each worker caches the sorted
``pd.Index`` via join.cached_get — zero shuffles, one map-side pass.
Matching is vectorized: hosts have ≤ ~6 labels, so the batch loops over
label DEPTH (each step one vectorized ``str.partition`` + one hashed
``get_indexer``), never over rows.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .join import _seed_empty, cached_get
from .ngramlm import _arrow_type

#: sentinel that sorts after every legal hostname byte ([a-z0-9.-])
_NO_MATCH = "~"


def domain_block_flags(
    ds: "ray.data.Dataset",
    host_col: str = "host",
    blocked: Sequence[str] = (),
    out_col: str = "blocked_by",
) -> "ray.data.Dataset":
    """Dataset(+out_col): the smallest blocklist entry matching the
    host's label-suffix chain, or ``''`` when no entry matches (kept).

    Hosts are matched case-insensitively (lowercased, the SURT/DNS
    convention of stages/cdx.py)."""
    bidx = pd.Index(sorted({d.strip().lower().strip(".") for d in blocked} - {""}))
    idx_ref = ray.put(bidx)

    def flag(batch: pa.Table) -> pa.Table:
        idx: pd.Index = cached_get(idx_ref, slot="blocklist_idx")
        hosts = pd.Series(batch[host_col].to_pylist(), dtype=object).str.lower()
        n = len(hosts)
        best = np.full(n, _NO_MATCH, dtype=object)
        vals = idx.to_numpy(dtype=object)
        suf = hosts.fillna("")
        # loop over label depth, not rows: each round strips one leading
        # label from every host and probes the whole column at once
        while True:
            arr = suf.to_numpy(dtype=object)
            if len(idx):
                gi = idx.get_indexer(arr)
                hit = gi >= 0
                if hit.any():
                    cand = np.where(hit, vals[np.maximum(gi, 0)], _NO_MATCH)
                    best = np.where(cand < best, cand, best)
            alive = suf.str.len() > 0
            if not alive.any():
                break
            suf = suf.str.partition(".")[2].fillna("")
            if (suf.str.len() == 0).all():
                break
        out = np.where(best == _NO_MATCH, "", best)
        return batch.append_column(out_col, pa.array(out, pa.string()))

    in_sch = ds.schema()
    fields = [(n, _arrow_type(t)) for n, t in zip(in_sch.names, in_sch.types)]
    return _seed_empty(
        ds.map_batches(flag, batch_format="pyarrow"),
        fields + [(out_col, pa.string())],
    )
