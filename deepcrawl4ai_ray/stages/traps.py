"""Spider-trap / URL-explosion detection over a URL table.

A production frontier at 10^10 URLs must detect hosts that generate
unbounded URL spaces (calendar pages, session-id query params, infinite
facet combinations — the classic crawler-trap families) and cap or
deprioritize them; the reference crawler's analog is its per-host page
budget (the deep-crawl strategy caps pages per host rather than
diagnosing why).  This operator produces the per-host diagnosis the
frontier's budget/salting knobs consume.

Per-URL signals (all Arrow RE2 kernels — no Python row loop):
  host       scheme-stripped authority
  template   path with the query string removed and every digit run
             collapsed to ``N`` — URL-space "shape" (a trap host has
             many URLs but few shapes)
  depth      path-segment count ('/' occurrences in the query-less path)
  has_query  literal '?' present

Per-host report (integer-only, so the SQL twin is ulp-proof):
  n_urls, n_templates, n_query_urls, max_depth,
  is_trap = (2*n_query_urls >= n_urls AND n_urls >= min_urls)
            OR max_depth >= depth_cap

Scale shape: URLs reduce map-side to slim (host, template, depth,
has_q) rows; distinct (host, template) goes through the two-level
bucketed plan (per-DISTINCT-key groupby state is the thing that dies at
10^9 templates); counts/max are partial-agg groupbys.  Raw URLs never
enter an all-to-all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def url_trap_signals(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Vectorized per-URL signal extraction (see module docstring)."""
    urls = batch[url_col]
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    rest = pc.replace_substring_regex(urls, pattern="^[a-z]+://", replacement="")
    host = pc.replace_substring_regex(rest, pattern="/.*$", replacement="")
    path = pc.replace_substring_regex(urls, pattern="^[a-z]+://[^/]+", replacement="")
    path_no_q = pc.replace_substring_regex(path, pattern=r"\?.*$", replacement="")
    template = pc.replace_substring_regex(path_no_q, pattern="[0-9]+", replacement="N")
    depth = pc.cast(pc.count_substring(path_no_q, "/"), pa.int32())
    has_q = pc.cast(pc.match_substring(urls, "?"), pa.int32())
    return pa.table(
        {"host": host, "template": template, "depth": depth, "has_q": has_q}
    )


def trap_host_report(
    urls_ds,
    url_col: str = "url",
    min_urls: int = 16,
    depth_cap: int = 6,
):
    """Per-host trap report over a Dataset of (distinct) URLs.

    Returns pandas (host, n_urls, n_templates, n_query_urls, max_depth,
    is_trap:int32) sorted by host.
    """
    import pandas as pd
    from ray.data.aggregate import Max, Sum

    from .join import bucketed_distinct, bucketed_sum, shuffle_coalesce

    signals = urls_ds.map_batches(
        lambda t: url_trap_signals(t, url_col), batch_format="pyarrow"
    )

    cols = ["host", "n_urls", "n_templates", "n_query_urls", "max_depth", "is_trap"]

    # counts + max depth + query-url count: per-batch Arrow pre-agg,
    # COALESCED before the all-to-all — per-block partials are sub-100KB
    # host tables, which Ray inlines into the DRIVER's in-process store
    # (the r4 sf1-proof pathology); integer sums/max, so combine order
    # is immaterial
    def pre(batch: pa.Table) -> pa.Table:
        return batch.group_by(["host"]).aggregate(
            [("has_q", "sum"), ("host", "count"), ("depth", "max")]
        )

    stats = (
        shuffle_coalesce(signals.map_batches(pre, batch_format="pyarrow"))
        .groupby("host")
        .aggregate(
            Sum("has_q_sum", alias_name="sum_has_q"),
            Sum("host_count", alias_name="n_urls"),
            Max("depth_max", alias_name="max_depth"),
        )
        .to_pandas()
    )
    if stats.empty:  # all-empty blocks drop the grouped schema entirely
        return pd.DataFrame(
            {
                "host": pd.Series([], dtype="object"),
                **{c: pd.Series([], dtype="int64") for c in cols[1:5]},
                "is_trap": pd.Series([], dtype="int32"),
            }
        )

    # distinct (host, template) -> per-host template count (two-level;
    # template cardinality is O(urls) on a trap host)
    tmpl = bucketed_distinct(signals.select_columns(["host", "template"]), ["host", "template"])
    n_tmpl = bucketed_sum(tmpl, ["host"], "template", "n_templates", count=True).to_pandas()

    out = stats.merge(n_tmpl, on="host", how="left")
    out["n_urls"] = out["n_urls"].astype("int64")
    out["n_templates"] = out["n_templates"].fillna(0).astype("int64")
    out["n_query_urls"] = out["sum_has_q"].astype("int64")
    out["max_depth"] = out["max_depth"].astype("int64")
    trap_q = (2 * out["n_query_urls"] >= out["n_urls"]) & (out["n_urls"] >= min_urls)
    trap_d = out["max_depth"] >= depth_cap
    out["is_trap"] = (trap_q | trap_d).astype("int32")
    return out[cols].sort_values("host").reset_index(drop=True)
