"""Persisted inverted text index — the build/query split for corpus
BM25 retrieval (stages/textsearch.bm25_topk is the one-shot scan; this
is what you build when many queries hit the same 100-TB corpus).

Layout (all Parquet, hive-partitioned):

    <index_dir>/postings/bucket=BB/*.parquet   (term, doc_id, tf, dl)
    <index_dir>/stats.parquet                  (n_docs, total_dl)

``bucket = siphash64(term) % num_buckets`` — a query reads ONLY the
buckets its terms hash to (explicit partition pruning, same pattern as
stages/knn.ivf_topk_indexed), i.e. ~|terms|/num_buckets of the
postings instead of re-scanning the corpus per query.  Document
frequencies are not stored: df(term) = the term's posting count,
computed from the (already pruned) read at query time.

Scoring then reuses the one-shot operator's discipline: Lucene-variant
BM25, block-local partial top-k, 4dp comparator-consistent merge — so
``bm25_topk_indexed(build_text_index(ds), terms)`` is row-identical to
``bm25_topk(ds, terms)`` (equivalence is pytest-pinned).
"""

from __future__ import annotations

import glob
import os
from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import tokens


def _term_buckets(terms: Sequence[str], num_buckets: int) -> np.ndarray:
    h = pd.util.hash_array(np.asarray(list(terms), dtype=object), categorize=False)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _write_postings_segment(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    index_dir: str,
    num_buckets: int,
) -> tuple:
    """One pass over ``ds`` → postings files appended under the
    bucket=BB partitions + the segment's (n_docs, total_dl).  Shared by
    the full build and the incremental append."""

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_id: List[int] = []
        out_term: List[str] = []
        out_tf: List[int] = []
        out_dl: List[int] = []
        for i, txt in zip(ids, batch[text_col].to_pylist()):
            toks = tokens(txt or "")
            if not toks:
                continue
            vals, cnts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            out_id.extend([int(i)] * len(vals))
            out_term.extend(vals)
            out_tf.extend(int(c) for c in cnts)
            out_dl.extend([len(toks)] * len(vals))
        t = pa.table(
            {
                "term": pa.array(out_term, pa.string()),
                id_col: pa.array(out_id, pa.int64()),
                "tf": pa.array(out_tf, pa.int64()),
                "dl": pa.array(out_dl, pa.int64()),
            }
        )
        b = _term_buckets(t["term"].to_pylist(), num_buckets) if len(t) else np.array([], dtype=np.int64)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    post = ds.map_batches(postings, batch_format="pyarrow")
    post.write_parquet(os.path.join(index_dir, "postings"), partition_cols=["bucket"])

    # corpus stats: one tiny aggregate over (doc, dl) — distinct per doc
    from ray.data.aggregate import Count, Sum

    docs = ds.map_batches(
        lambda t: pa.table(
            {
                "dl": pa.array(
                    [len(tokens(x or "")) for x in t[text_col].to_pylist()], pa.int64()
                )
            }
        ),
        batch_format="pyarrow",
    )
    st = docs.aggregate(Count(alias_name="n_docs"), Sum("dl", alias_name="total_dl"))
    return int(st["n_docs"]), int(st["total_dl"] or 0)


def _write_stats(index_dir: str, n_docs: int, total_dl: int) -> None:
    """Atomically replace stats.parquet (tmp + rename) so a concurrent
    reader never sees a torn or half-updated stats file."""
    path = os.path.join(index_dir, "stats.parquet")
    tmp = f"{path}.tmp.{os.getpid()}"
    pa.parquet.write_table(
        pa.table(
            {
                "n_docs": pa.array([int(n_docs)], pa.int64()),
                "total_dl": pa.array([int(total_dl)], pa.int64()),
            }
        ),
        tmp,
    )
    os.replace(tmp, path)


def build_text_index(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    index_dir: str,
    num_buckets: int = 32,
) -> str:
    """One corpus pass → bucket-partitioned postings + corpus stats.
    Postings shuffle is the tokenized corpus (term, doc, tf, dl), the
    irreducible size of an inverted index; no other stage re-reads the
    raw text."""
    n_docs, total_dl = _write_postings_segment(
        ds, id_col, text_col, index_dir, num_buckets
    )
    _write_stats(index_dir, n_docs, total_dl)
    return index_dir


def append_text_index(
    index_dir: str,
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    num_buckets: int = 32,
) -> str:
    """Incremental index update — index the crawl DELTA without
    re-reading the corpus (the Lucene segment-append model a recrawl
    pipeline needs: snapshot_diff / delta_novel_docs supply the new
    docs, this adds them).  New postings land as additional parquet
    files inside the same ``bucket=BB`` partitions, so
    ``bm25_topk_indexed`` prunes and scores them identically to a full
    rebuild (equivalence is pytest-pinned); stats.parquet is replaced
    atomically with the merged (n_docs, total_dl).

    ``num_buckets`` must match the build (the term→bucket hash is part
    of the on-disk layout).  Precondition: the delta's doc ids are NEW —
    appending an already-indexed id would double-count its tf rows, the
    same contract as Lucene addDocument vs updateDocument."""
    import pyarrow.parquet as pq

    stats_path = os.path.join(index_dir, "stats.parquet")
    if not os.path.exists(stats_path):
        raise ValueError(f"{index_dir!r} is not a built index (no stats.parquet)")
    st = pq.read_table(stats_path)
    n_docs, total_dl = _write_postings_segment(
        ds, id_col, text_col, index_dir, num_buckets
    )
    _write_stats(
        index_dir,
        int(st["n_docs"][0].as_py()) + n_docs,
        int(st["total_dl"][0].as_py()) + total_dl,
    )
    return index_dir


def bm25_topk_indexed(
    index_dir: str,
    id_col: str,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """BM25 top-k from the persisted index: reads ONLY the buckets the
    query terms hash to, filters to the terms, derives df/N/avgdl, and
    scores — identical output contract to textsearch.bm25_topk."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    term_arr = sorted(set(terms))
    if not term_arr:
        raise ValueError("bm25_topk_indexed needs at least one query term")
    st = pq.read_table(os.path.join(index_dir, "stats.parquet"))
    n_docs = int(st["n_docs"][0].as_py())
    total_dl = int(st["total_dl"][0].as_py())
    avgdl = (total_dl / n_docs) if n_docs else 1.0

    buckets = sorted(set(int(x) for x in _term_buckets(term_arr, num_buckets)))
    paths = [
        f
        for bb in buckets
        for f in sorted(
            glob.glob(os.path.join(index_dir, "postings", f"bucket={bb}", "*.parquet"))
        )
    ]
    if not paths:
        return pd.DataFrame(
            {id_col: pd.Series(dtype="int64"), "bm25": pd.Series(dtype="float64")}
        )
    tset = pa.array(term_arr, pa.string())
    rows = rd.read_parquet(paths, columns=["term", id_col, "tf", "dl"]).map_batches(
        lambda t: t.filter(pc.is_in(t["term"], value_set=tset)),
        batch_format="pyarrow",
    ).materialize()

    # df(term) = posting-row count per term (one row per (doc, term) by
    # construction) — a tiny aggregate over the already-pruned read
    from ray.data.aggregate import Count

    df_rows = rows.groupby("term").aggregate(Count(alias_name="df")).take_all()
    if not df_rows:
        return pd.DataFrame(
            {id_col: pd.Series(dtype="int64"), "bm25": pd.Series(dtype="float64")}
        )
    from .textsearch import bm25_contrib, lucene_idf, merge_topk, partial_topk_order

    idf = lucene_idf(n_docs, {r["term"]: r["df"] for r in df_rows})
    idf_ref = ray.put(idf)

    # distributed scoring: per-row contributions, doc-keyed sum (a doc's
    # rows live in different term buckets, so a groupby shuffle over the
    # postings of the QUERY TERMS — never the corpus — is irreducible),
    # then block-local partial top-k with the final 4dp comparator
    def contrib(t: pa.Table) -> pa.Table:
        w = ray.get(idf_ref)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        widf = np.asarray([w[x] for x in t["term"].to_pylist()], dtype=np.float64)
        s = bm25_contrib(tf, dl, widf, k1, b, avgdl)
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                "bm25": pa.array(s, pa.float64()),
            }
        )

    # two-level bucketed SUM: the matched-doc count is query-dependent
    # and can approach N for common terms — a plain groupby(id) would
    # carry per-matched-doc aggregate state (see join.bucketed_sum)
    from .join import bucketed_sum

    scored = bucketed_sum(
        rows.map_batches(contrib, batch_format="pyarrow"), [id_col], "bm25", "bm25"
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sc = t["bm25"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = partial_topk_order(ids, sc, k)
        return pa.table(
            {id_col: pa.array(ids[order], pa.int64()), "bm25": pa.array(sc[order], pa.float64())}
        )

    parts = scored.map_batches(
        partial_topk, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    # identical output contract to textsearch.bm25_topk (shared comparator)
    return merge_topk(parts, id_col, "bm25", k)


def phrase_search_indexed(
    index_dir: str,
    id_col: str,
    phrase: Sequence[str],
    corpus_ds: "ray.data.Dataset",
    text_col: str = "text",
    num_buckets: int = 32,
    extra_cols: Sequence[str] = (),
) -> pd.DataFrame:
    """Exact phrase search without positional postings: the classic
    AND-prefilter-then-verify plan.

    1. Conjunctive prefilter from the persisted index: read ONLY the
       buckets the phrase terms hash to, keep doc ids whose posting-row
       count equals the distinct term count (postings are one row per
       (term, doc) by construction) — candidates = docs containing ALL
       terms, a superset of phrase matches.
    2. Exact verify on the candidate minority: corpus rows semi-join the
       candidate ids MAP-SIDE (join.bloom_semi_anti — bloom-negative
       rows drop in place, no all-to-all for the non-matching bulk),
       then one vectorized RE2 match of the adjacency pattern
       ``(^|B)t1 B+ t2 ... (B|$)`` with boundary class
       B = ``[^\\p{L}\\p{N}_]`` over the lowercased text.  The SQL twin
       runs the same RE2 pattern, so adjacency semantics are pinned by
       construction.

    Contract: terms must be ascii word tokens (``[a-z0-9_]+``) — for
    those, a pattern match implies every term is also a token of the
    index's tokenizer, so the prefilter never drops a true match: the
    tokenizer's ``\\w`` and the RE2 boundary class agree on unicode
    edges too (combining marks are boundaries to both, accented letters
    word-chars to both — pinned by the unicode boundary test).  At
    100 TB the verify cost is candidate-proportional: the
    postings read is |terms|/num_buckets of the index, the corpus scan
    drops non-candidates map-side at the bloom, and only candidate rows
    pay the regex.

    Returns pandas (id_col, *extra_cols) sorted by id.
    """
    import re as _re

    import pyarrow.compute as pc
    import ray.data as rd

    from .join import bloom_semi_anti, bucketed_sum

    terms = [t.lower() for t in phrase]
    if not terms:
        raise ValueError("phrase_search_indexed needs at least one term")
    for t in terms:
        if not _re.fullmatch(r"[a-z0-9_]+", t):
            raise ValueError(f"phrase terms must be ascii word tokens, got {t!r}")
    uniq = sorted(set(terms))

    buckets = sorted(set(int(x) for x in _term_buckets(uniq, num_buckets)))
    paths = [
        f
        for bb in buckets
        for f in sorted(
            glob.glob(os.path.join(index_dir, "postings", f"bucket={bb}", "*.parquet"))
        )
    ]
    out_cols = [id_col, *extra_cols]

    def _empty() -> pd.DataFrame:
        sch = dict(zip(corpus_ds.schema().names, corpus_ds.schema().types))
        return pd.DataFrame(
            {c: pd.Series(dtype=sch[c].to_pandas_dtype() if c in sch else "object") for c in out_cols}
        )

    if not paths:
        return _empty()

    tset = pa.array(uniq, pa.string())
    rows = rd.read_parquet(paths, columns=["term", id_col]).map_batches(
        lambda t: t.filter(pc.is_in(t["term"], value_set=tset)),
        batch_format="pyarrow",
    )
    counts = bucketed_sum(rows, [id_col], "term", "n_terms", count=True)
    need = len(uniq)
    cand = counts.map_batches(
        lambda t: t.filter(pc.equal(t["n_terms"], need)).select([id_col]),
        batch_format="pyarrow",
    )

    boundary = r"[^\p{L}\p{N}_]"
    pattern = (
        "(^|" + boundary + ")" + (boundary + "+").join(terms) + "(" + boundary + "|$)"
    )

    verified = bloom_semi_anti(
        corpus_ds.select_columns(list(dict.fromkeys(out_cols + [text_col]))),
        id_col,
        cand,
        id_col,
        keep_in=True,
    ).map_batches(
        lambda t: t.filter(
            pc.match_substring_regex(pc.utf8_lower(t[text_col]), pattern)
        ).select(out_cols),
        batch_format="pyarrow",
    )
    got = verified.to_pandas()
    if got.empty:
        return _empty()
    return got[out_cols].sort_values(id_col).reset_index(drop=True)
