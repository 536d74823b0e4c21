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


def make_anchor_explode_fn(url_col: str = "url", html_col: str = "html"):
    """map_batches fn: pages → slim (dst, term, cnt) batch-partial
    counts.  The combiner runs per batch, so repeated boilerplate
    anchors (nav "home"/"about" on every page) collapse before the
    shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for u, h in zip(batch[url_col].to_pylist(), batch[html_col].to_pylist()):
            counts.update(anchor_term_pairs(h, u))
        dsts = np.empty(len(counts), dtype=object)
        terms = np.empty(len(counts), dtype=object)
        cnts = np.empty(len(counts), dtype=np.int64)
        for i, ((d, t), c) in enumerate(counts.items()):
            dsts[i], terms[i], cnts[i] = d, t, c
        return pa.table(
            {
                "dst": pa.array(dsts, pa.string()),
                "term": pa.array(terms, pa.string()),
                "cnt": pa.array(cnts),
            }
        )

    return fn


def anchor_term_stats(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    """→ Dataset(dst, n_anchor_tokens, n_terms, top_term, top_term_count):
    per link target, the total anchor-token count, distinct-term count,
    and the dominant anchor term (ties → lexicographically smallest).
    Returns a Dataset — at corpus scale write it to parquet or join it
    downstream; pandas only in oracle harnesses."""
    partials = pages.map_batches(make_anchor_explode_fn(), batch_format="pyarrow")
    term_counts = partials.groupby(["dst", "term"]).aggregate(Sum("cnt", alias_name="cnt"))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cnt", "term"], ascending=[False, True], kind="mergesort")
        top = g.iloc[0]
        return pd.DataFrame(
            {
                "dst": [top["dst"]],
                "n_anchor_tokens": [int(g["cnt"].sum())],
                "n_terms": [int(len(g))],
                "top_term": [top["term"]],
                "top_term_count": [int(top["cnt"])],
            }
        )

    return term_counts.groupby("dst").map_groups(pick, batch_format="pandas")
