"""Anchor-text aggregation over the crawl link graph.

The classic web-corpus enrichment the reference's per-page pipeline
never does but every large crawl corpus ships (Common-Crawl WAT-style
inlink metadata): for each link TARGET, aggregate the anchor text of
every ``<a>`` pointing at it — inlink counts and the dominant anchor
term are ranking/quality signals and labeled training data (anchor →
title prediction).  Reference context: link discovery semantics are the
crawler's own (SURVEY §2 M18, actions.py:246-247 link-scope filters);
this operator extends them from bare hrefs to (href, anchor-text)
pairs.

Scale shape (100 TB story):

- the HTML payload never shuffles: pages are parsed inside
  ``map_batches`` and reduced to slim ``(dst, term, cnt)`` PARTIAL
  counts per batch (the in-batch combiner collapses duplicate terms —
  nav/footer anchors repeat on every page of a host, so partials are
  far smaller than the raw anchor stream);
- one ``groupby(dst, term)`` sum-shuffle of the slim partials, then a
  per-target argmax over the (few) distinct terms of each target via
  ``groupby(dst).map_groups`` — group size is bounded by a target's
  anchor vocabulary, not its inlink count, so hot targets (every page
  links "/") do not create straggler groups.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..functions.urlnorm import normalize_url, resolve_link

#: href + inner text of an <a>; group 1 = href, group 2 = anchor text.
#: RE2-compatible (no backrefs) so the DuckDB oracle runs the SAME
#: pattern via regexp_extract_all(html, RX, 1|2).
ANCHOR_RE_SQL = r"""(?i)<a\s[^>]*?href\s*=\s*["']([^"'<>]+)["'][^>]*>([^<]*)</a>"""
_ANCHOR_RE = re.compile(ANCHOR_RE_SQL)
_TERM_RE = re.compile(r"[a-z0-9]+")
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")


def anchor_term_pairs(html: bytes | str, base_url: str) -> List[tuple]:
    """(dst_url, term) for every anchor-text token of every <a> in the
    page, document order, NOT deduped (each occurrence is a vote).
    Resolution mirrors extract_links (non-http(s) schemes dropped,
    relative hrefs resolved against the page URL)."""
    s = html.decode("utf-8", "replace") if isinstance(html, (bytes, bytearray)) else html
    out: List[tuple] = []
    for href, anchor in _ANCHOR_RE.findall(s):
        href = href.strip()
        m = _SCHEME_RE.match(href)
        if m and m.group(0) not in ("http:", "https:"):
            continue
        dst = normalize_url(resolve_link(base_url, href))
        if not dst.startswith(("http://", "https://")):
            continue
        for term in _TERM_RE.findall(anchor.lower()):
            out.append((dst, term))
    return out


def make_anchor_explode_fn(url_col: str = "url", html_col: str = "html", num_buckets: int = 64):
    """map_batches fn: pages → slim (dst, term, cnt, __b) batch-partial
    counts, pre-bucketed by hash(dst).  The combiner runs per batch, so
    repeated boilerplate anchors (nav "home"/"about" on every page)
    collapse before the shuffle; the int bucket key keeps the one wide
    step an int sort, not a 2-string-column sort."""
    from .join import _key_buckets

    def fn(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for u, h in zip(batch[url_col].to_pylist(), batch[html_col].to_pylist()):
            counts.update(anchor_term_pairs(h, u))
        dsts = np.empty(len(counts), dtype=object)
        terms = np.empty(len(counts), dtype=object)
        cnts = np.empty(len(counts), dtype=np.int64)
        for i, ((d, t), c) in enumerate(counts.items()):
            dsts[i], terms[i], cnts[i] = d, t, c
        darr = pa.array(dsts, pa.string())
        return pa.table(
            {
                "dst": darr,
                "term": pa.array(terms, pa.string()),
                "cnt": pa.array(cnts),
                "__b": pa.array(_key_buckets(darr, num_buckets)),
            }
        )

    return fn


def anchor_term_stats(pages: "ray.data.Dataset", num_buckets: int = 64) -> "ray.data.Dataset":
    """→ Dataset(dst, n_anchor_tokens, n_terms, top_term, top_term_count):
    per link target, the total anchor-token count, distinct-term count,
    and the dominant anchor term (ties → lexicographically smallest).
    Returns a Dataset — at corpus scale write it to parquet or join it
    downstream; pandas only in oracle harnesses.

    ONE wide step total: the explode output is pre-bucketed by
    hash(dst) (an int key — sorting 2.5 M (dst, term) string pairs in a
    global groupby measured 32 s on the bench corpus; the int-bucket
    shuffle + in-bucket pandas aggregation is ~10×), and each of the
    ``num_buckets`` groups aggregates its targets vectorized."""
    from .join import shuffle_coalesce

    partials = shuffle_coalesce(
        pages.map_batches(
            make_anchor_explode_fn(num_buckets=num_buckets), batch_format="pyarrow"
        )
    )

    def bucket_pick(g: pd.DataFrame) -> pd.DataFrame:
        tc = (
            g.groupby(["dst", "term"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        # global sort (cnt desc, term asc) then first-per-dst == argmax
        tc = tc.sort_values(["cnt", "term"], ascending=[False, True], kind="mergesort")
        agg = tc.groupby("dst", sort=False)["cnt"].agg(["sum", "size"])
        top = tc.drop_duplicates("dst", keep="first").set_index("dst")
        return pd.DataFrame(
            {
                "dst": agg.index.to_numpy(),
                "n_anchor_tokens": agg["sum"].to_numpy(dtype="int64"),
                "n_terms": agg["size"].to_numpy(dtype="int64"),
                "top_term": top.loc[agg.index, "term"].to_numpy(),
                "top_term_count": top.loc[agg.index, "cnt"].to_numpy(dtype="int64"),
            }
        )

    out = partials.groupby("__b").map_groups(bucket_pick, batch_format="pandas")
    from .join import _seed_empty

    # schema-pinned empty seed: an all-empty result keeps its schema
    return _seed_empty(
        out,
        [
            ("dst", pa.string()),
            ("n_anchor_tokens", pa.int64()),
            ("n_terms", pa.int64()),
            ("top_term", pa.string()),
            ("top_term_count", pa.int64()),
        ],
    )
