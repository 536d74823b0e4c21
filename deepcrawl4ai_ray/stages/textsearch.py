"""Text retrieval / frequency operators — exact heavy hitters and BM25
top-k — first-class training-data-pipeline operators beyond the
reference (whose only term-weighting is the per-page BM25 content
filter, reference content_filter_strategy.py — a RELEVANT_CONTENT_FILTER
over chunks of one page, not corpus-level retrieval).

Both are built for the 100-TB shape:

- exact_top_tokens: the full token stream is NEVER shuffled.  Pass 1
  emits a bounded Misra-Gries-style summary per batch (≤ m rows, plus
  the batch's omission bound θ_b); one groupby over ≤ m·n_batches rows
  yields per-token lower/upper bounds with the classic guarantee that
  any token omitted everywhere has total count ≤ Θ = Σ θ_b.  Candidates
  whose upper bound reaches the k-th lower bound are exactly recounted
  in pass 2 (per-batch counts restricted to the broadcast candidate
  set — a candidate-sized shuffle).  The result is EXACT, with a
  runtime guarantee check (Θ < k-th lower bound) that raises rather
  than silently return an approximation when m is too small.

- bm25_topk: one pass over the corpus emits (doc, term, tf, doclen)
  rows for the query terms only; N/avgdl/df come from tiny aggregates
  of those rows; scoring is BLOCK-LOCAL (a doc's tf rows never leave
  the block they were emitted into), so there is no global shuffle at
  all — just a comparator-consistent partial top-k merge (same 4dp
  discipline as stages/knn.brute_force_topk).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ..functions.hashing import tokens

# \x00 can never be produced by the \w+ tokenizer — safe side-channel key
# for per-batch metadata rows riding the same Dataset.
_SENTINEL = "\x00"


# ---- BM25 kernel, shared with stages/textindex (the pytest-pinned
# ``bm25_topk_indexed == bm25_topk`` equivalence is single-sourced here:
# one idf variant, one per-row contribution formula, one merge comparator)


def lucene_idf(n_docs: int, df_by_term: dict) -> dict:
    """Lucene idf variant ln((N − df + ½)/(df + ½) + 1) per term."""
    return {
        t: float(np.log((n_docs - d + 0.5) / (d + 0.5) + 1.0))
        for t, d in df_by_term.items()
    }


def bm25_contrib(
    tf: np.ndarray, dl: np.ndarray, widf: np.ndarray, k1: float, b: float, avgdl: float
) -> np.ndarray:
    """Per-(doc, term) BM25 contribution (Robertson/Sparck-Jones)."""
    return widf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def partial_topk_order(ids: np.ndarray, scores: np.ndarray, k: int) -> np.ndarray:
    """Indices of the block-local top-k under the FINAL comparator
    (round(score,4) desc, id asc) — same discipline as knn.brute_force_topk."""
    return np.lexsort((ids, -np.round(scores, 4)))[: min(k, len(ids))]


def merge_topk(parts: pd.DataFrame, id_col: str, score_col: str, k: int) -> pd.DataFrame:
    """Merge block-local partials: 4dp-rounded scores, (score desc, id asc)."""
    parts = parts.copy()
    parts[score_col] = parts[score_col].round(4)
    parts = parts.sort_values([score_col, id_col], ascending=[False, True], kind="mergesort")
    return parts.head(k).reset_index(drop=True)


def _batch_token_counts(
    texts: Sequence[str], ngram: int = 1
) -> tuple[np.ndarray, np.ndarray, int]:
    """All batch tokens (or space-joined word n-grams, never crossing a
    document boundary) → (unique grams, counts, total gram count).
    Per-doc regex tokenization has no Arrow kernel; the counting is one
    C-level np.unique over the concatenated array."""
    toks: List[str] = []
    for t in texts:
        tt = tokens(t or "")
        if ngram == 1:
            toks.extend(tt)
        elif len(tt) >= ngram:
            toks.extend(
                " ".join(tt[i : i + ngram]) for i in range(len(tt) - ngram + 1)
            )
    if not toks:
        return np.array([], dtype=object), np.array([], dtype=np.int64), 0
    vals, cnts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    return vals, cnts.astype(np.int64), len(toks)


def exact_top_tokens(
    ds: "ray.data.Dataset",
    text_col: str,
    k: int = 20,
    m: int = 4096,
    max_candidates: int = 100_000,
    ngram: int = 1,
) -> "ray.data.Dataset":
    """EXACT top-k tokens (``ngram`` > 1: word n-grams, the LM-stats
    variant) by total count → Dataset(tok, cnt), ordered (cnt desc,
    tok asc) — without ever shuffling the full token stream.

    Summary-pass rows per batch: the top-m tokens by in-batch count with
    their EXACT in-batch counts, plus θ_b = the (m+1)-th largest count
    (every omitted token has in-batch count ≤ θ_b).  After one groupby:
      lb(t)  = Σ counts where emitted  (≤ true count)
      ub(t)  = lb(t) + (Θ − Σ θ_b where emitted)  (≥ true count)
    and any token emitted NOWHERE has true count ≤ Θ.  Candidates =
    {t : ub(t) ≥ k-th largest lb}; exactness requires Θ < k-th lb
    (checked — raises with a "raise m" message instead of degrading to
    an approximation).  Pass 2 recounts candidates exactly."""

    def summarize(batch: pa.Table) -> pa.Table:
        vals, cnts, _total = _batch_token_counts(batch[text_col].to_pylist(), ngram)
        if len(vals) > m:
            kth = np.partition(cnts, len(cnts) - m)[len(cnts) - m]
            # θ_b = largest count we may omit; keep strictly greater so
            # "omitted ⇒ count ≤ θ_b" holds even across ties
            theta = int(kth)
            keep = cnts > theta
            vals, cnts = vals[keep], cnts[keep]
        else:
            theta = 0
        # NOTE: never np.append a NUL sentinel — numpy's U-dtype strips
        # trailing NULs ("\x00" silently becomes ""); list-concat instead
        return pa.table(
            {
                "tok": pa.array(list(vals) + [_SENTINEL], pa.string()),
                "cnt": pa.array([int(c) for c in cnts] + [theta], pa.int64()),
                "th": pa.array(np.full(len(vals) + 1, theta, dtype=np.int64)),
            }
        )

    agg = (
        ds.map_batches(summarize, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("cnt", alias_name="lb"), Sum("th", alias_name="th_seen"))
        .materialize()
    )

    def _sentinel_split(keep_sentinel: bool):
        def fn(t: pa.Table) -> pa.Table:
            eq = pc.equal(t["tok"], pa.scalar(_SENTINEL))
            return t.filter(eq if keep_sentinel else pc.invert(eq))

        return fn

    theta_row = agg.map_batches(_sentinel_split(True), batch_format="pyarrow").take_all()
    theta_total = int(theta_row[0]["lb"]) if theta_row else 0
    non_sent = agg.map_batches(_sentinel_split(False), batch_format="pyarrow")
    top_lb = non_sent.sort("lb", descending=True).limit(k).take_all()
    if len(top_lb) < k:
        # fewer than k tokens were ever emitted.  Exact only when nothing
        # was ever omitted (Θ = 0 ⇒ the summaries ARE the full token set);
        # with Θ > 0 an omitted-everywhere token (true count up to Θ)
        # could belong in the top-k and no candidate check can find it.
        if theta_total > 0:
            raise ValueError(
                f"exact top-{k} not provable: only {len(top_lb)} tokens "
                f"emitted by the summaries but omission bound Θ={theta_total} > 0; "
                f"raise m (currently {m})"
            )
        if not top_lb:
            return ray.data.from_arrow(
                pa.table({"tok": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
            )
        kth_lb = 0  # Θ=0: every token is a candidate, recount is the full exact count
    else:
        kth_lb = int(min(r["lb"] for r in top_lb))
        if theta_total >= kth_lb:
            raise ValueError(
                f"exact top-{k} not provable: omission bound Θ={theta_total} ≥ "
                f"k-th lower bound {kth_lb}; raise m (currently {m})"
            )

    def is_candidate(t: pa.Table) -> pa.Table:
        ub = pc.add(t["lb"], pa.scalar(theta_total, pa.int64()))
        ub = pc.subtract(ub, t["th_seen"])
        keep = pc.and_(
            pc.greater_equal(ub, pa.scalar(kth_lb, pa.int64())),
            pc.not_equal(t["tok"], pa.scalar(_SENTINEL)),
        )
        return t.filter(keep).select(["tok"])

    cand = agg.map_batches(is_candidate, batch_format="pyarrow").take_all()
    if len(cand) > max_candidates:
        raise ValueError(
            f"{len(cand)} candidates exceed max_candidates={max_candidates}; raise m"
        )
    cand_sorted = np.sort(np.asarray([r["tok"] for r in cand], dtype=object))
    cand_ref = ray.put(cand_sorted)

    def recount(batch: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        vals, cnts, _ = _batch_token_counts(batch[text_col].to_pylist(), ngram)
        if len(vals) == 0 or len(cs) == 0:
            return pa.table(
                {"tok": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        pos = np.searchsorted(cs, vals)
        pos[pos >= len(cs)] = 0
        hit = cs[pos] == vals
        return pa.table(
            {"tok": pa.array(vals[hit], pa.string()), "cnt": pa.array(cnts[hit], pa.int64())}
        )

    exact = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return exact.sort(["cnt", "tok"], descending=[True, False]).limit(k)


def bm25_topk(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> pd.DataFrame:
    """BM25 top-k documents for a term query → DataFrame(doc_id, bm25),
    ordered (round(bm25,4) desc, id asc) — Robertson/Sparck-Jones BM25
    with the Lucene idf variant ln((N − df + ½)/(df + ½) + 1).

    One corpus pass emits (id, term, tf, dl) rows for query terms only
    (plus a per-batch sentinel carrying n_docs / Σdl); df and N/avgdl
    are tiny aggregates of those rows; scoring is block-local (each
    doc's rows stay in the block that emitted them — batch_size=None —
    so no groupby shuffle), ending in the knn-style comparator-
    consistent partial top-k merge."""
    term_arr = np.sort(np.unique(np.asarray(list(terms), dtype=object)))
    if term_arr.size == 0:
        raise ValueError("bm25_topk needs at least one query term")
    terms_ref = ray.put(term_arr)

    def tf_stage(batch: pa.Table) -> pa.Table:
        ts = ray.get(terms_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[text_col].to_pylist()
        out_id: List[int] = []
        out_term: List[str] = []
        out_tf: List[int] = []
        out_dl: List[int] = []
        total_dl = 0
        for i, txt in zip(ids, texts):
            toks = tokens(txt or "")
            dl = len(toks)
            total_dl += dl
            if not dl:
                continue
            vals, cnts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            pos = np.searchsorted(ts, vals)
            pos[pos >= len(ts)] = 0
            hit = ts[pos] == vals
            for t, c in zip(vals[hit], cnts[hit]):
                out_id.append(int(i))
                out_term.append(t)
                out_tf.append(int(c))
                out_dl.append(dl)
        # sentinel row: batch doc count + batch token mass (for N, avgdl)
        out_id.append(-1)
        out_term.append(_SENTINEL)
        out_tf.append(len(ids))
        out_dl.append(total_dl)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "term": pa.array(out_term, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
                "dl": pa.array(out_dl, pa.int64()),
            }
        )

    # tf_stage outputs are a few MB per task — far below the 128 MB block
    # target — so each task's rows land in ONE block and a doc's rows are
    # never split across blocks (the invariant score_block relies on).
    rows = ds.map_batches(tf_stage, batch_format="pyarrow").materialize()

    def _term_split(keep_sentinel: bool):
        def fn(t: pa.Table) -> pa.Table:
            eq = pc.equal(t["term"], pa.scalar(_SENTINEL))
            return t.filter(eq if keep_sentinel else pc.invert(eq))

        return fn

    stats = rows.map_batches(_term_split(True), batch_format="pyarrow").aggregate(
        Sum("tf", alias_name="n_docs"), Sum("dl", alias_name="total_dl")
    )
    n_docs = int(stats.get("n_docs") or stats.get("sum(tf)") or 0)
    total_dl = int(stats.get("total_dl") or stats.get("sum(dl)") or 0)
    avgdl = (total_dl / n_docs) if n_docs else 1.0
    df_rows = (
        rows.map_batches(_term_split(False), batch_format="pyarrow")
        .groupby("term")
        .aggregate(Count(alias_name="df"))
        .take_all()
    )
    idf = lucene_idf(n_docs, {r["term"]: r["df"] for r in df_rows})
    idf_ref = ray.put(idf)

    def score_block(t: pa.Table) -> pa.Table:
        # block-integrity guard: tf_stage appends its sentinel as the LAST
        # row of every output, so a block ends at a batch boundary iff its
        # last row is a sentinel.  If Ray sliced an oversized output
        # mid-table (splitting one doc's rows across blocks), raise rather
        # than score the doc as two partial sums.
        if t.num_rows and t["term"][-1].as_py() != _SENTINEL:
            raise ValueError(
                "bm25_topk: a tf block was split mid-batch (doc rows "
                "straddle a block boundary); lower map_batches batch_size "
                "or raise DataContext.target_max_block_size"
            )
        w = ray.get(idf_ref)
        dfr = t.to_pandas()
        dfr = dfr[dfr["term"] != _SENTINEL]
        if dfr.empty:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "bm25": pa.array([], pa.float64())}
            )
        # deterministic per-doc sum: fixed (id, term) order
        dfr = dfr.sort_values([id_col, "term"], kind="mergesort")
        tf = dfr["tf"].to_numpy(dtype=np.float64)
        dl = dfr["dl"].to_numpy(dtype=np.float64)
        widf = dfr["term"].map(w).to_numpy(dtype=np.float64)
        s = bm25_contrib(tf, dl, widf, k1, b, avgdl)
        out = (
            pd.DataFrame({id_col: dfr[id_col].to_numpy(), "s": s})
            .groupby(id_col, sort=True)["s"]
            .sum()
        )
        ids = out.index.to_numpy(dtype=np.int64)
        sc = out.to_numpy(dtype=np.float64)
        order = partial_topk_order(ids, sc, k)
        return pa.table(
            {id_col: pa.array(ids[order], pa.int64()), "bm25": pa.array(sc[order], pa.float64())}
        )

    # batch_size=None → one call per materialized block, so every doc's
    # rows (emitted contiguously by tf_stage) are scored together; the
    # sentinel guard above makes that invariant checked, not assumed
    parts = rows.map_batches(score_block, batch_format="pyarrow", batch_size=None).to_pandas()
    return merge_topk(parts, id_col, "bm25", k)
