"""CCNet-style n-gram language-model perplexity scoring.

The training-data-cleaning step of CCNet (Wenzek et al. 2020): train a
small LM on a clean target slice, score every crawled document's
perplexity under it, and keep the fluent low-perplexity head.  The
reference (deepscrape) has no LM scoring — this is a training-pipeline
extension, graded alongside SURVEY.md §2.

Model: bigram LM with add-alpha smoothing over word tokens
(``functions.hashing.tokens`` ≡ DuckDB ``regexp_extract_all(lower(text),
'\\w+')``, the oracle-exact token spec shared with top_tokens /
delta_novel_docs)::

    p(w2 | w1) = (c(w1 w2) + α) / (c(w1) + α·V),   V = |train vocab| + 1
    ppl(doc)   = exp( −(1/n) · Σ_bigrams ln p )       (docs with ≥ 2 tokens)

Ray-Data-first shapes:

- **Training counts** (`train_bigram_lm`): ONE explode pass emits slim
  (kind, gram) rows — token text only, ids and payloads dropped — and
  ONE two-level bucketed count (join.bucketed_sum plan) produces both
  the unigram and bigram count tables.  At 100 TB this is the standard
  LM-count job: the only all-to-all carries ~bytes-per-distinct-gram.
- **Scoring** (`score_perplexity`) has the broadcast-the-model path and
  the join path, mode-equality-tested:

  * ``broadcast`` — the count tables are `ray.put` ONCE (a trained CCNet
    LM is a bounded artifact, not data-scale), each worker caches them
    via join.cached_get, and scoring is a single map-side pass: hashed
    `pd.Index.get_indexer` lookups + `np.bincount` per-doc reduction.
    Zero shuffles.
  * ``join`` — for count tables too big for the object store: explode
    docs to slim (id, w1, gram) rows, two bucketed hash joins against
    the count Datasets, one bucketed sum+count back to per-doc rows.
  * ``auto`` — broadcast iff the bigram table has ≤ ``max_broadcast_rows``
    rows (the guarded-broadcast discipline of stages/dedup.py).

Float policy: per-doc ppl is rounded to 4 dp on both engine and oracle
sides; summation-order drift across partials is ~1e-12 relative, far
below the rounding grain (see queries.py module docstring).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions import hashing as H
from .join import _seed_empty, bucketed_sum, cached_get, hash_join, shuffle_coalesce

_ALPHA = 0.5
_MAX_BROADCAST_ROWS = 3_000_000


def _arrow_type(t) -> pa.DataType:
    """Ray Schema.types → Arrow type.  Parquet-backed datasets hand back
    Arrow types already; pandas-backed ones (tests, from_pandas) hand
    back numpy dtypes / object, which map to their Arrow equivalents."""
    if isinstance(t, pa.DataType):
        return t
    try:
        dt = np.dtype(t)
    except TypeError:
        return pa.string()
    if dt == np.dtype("O"):
        return pa.string()
    return pa.from_numpy_dtype(dt)


def _doc_grams(texts: Sequence[str]):
    """Tokenize a batch of docs → (flat w1 array, flat 'w1 w2' gram
    array, per-doc bigram counts).  Tokenization is per-doc by nature;
    everything downstream of it is flat numpy."""
    w1s: list[str] = []
    grams: list[str] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = H.tokens(t or "")
        if len(toks) < 2:
            continue
        counts[i] = len(toks) - 1
        w1s.extend(toks[:-1])
        grams.extend(a + " " + b for a, b in zip(toks[:-1], toks[1:]))
    return w1s, grams, counts


def train_bigram_lm(
    train: "ray.data.Dataset", text_col: str = "text"
) -> tuple["ray.data.Dataset", "ray.data.Dataset", int]:
    """Count unigrams and bigrams over the training slice.

    Returns ``(uni, bg, V)``: uni = Dataset(tok, c1), bg = Dataset(gram,
    c2), V = distinct train unigrams + 1 (the OOV slot).  One explode
    pass, one two-level count shuffle; both outputs are materialized
    (they are consumed 2-3 times downstream).
    """

    def explode(batch: pa.Table) -> pa.Table:
        kinds: list[int] = []
        gs: list[str] = []
        for t in batch[text_col].to_pylist():
            toks = H.tokens(t or "")
            gs.extend(toks)
            kinds.extend([0] * len(toks))
            if len(toks) >= 2:
                gs.extend(a + " " + b for a, b in zip(toks[:-1], toks[1:]))
                kinds.extend([1] * (len(toks) - 1))
        return pa.table(
            {"kind": pa.array(kinds, pa.int8()), "g": pa.array(gs, pa.string())}
        )

    slim = train.map_batches(explode, batch_format="pyarrow")
    counts = bucketed_sum(slim, ["kind", "g"], "g", "c", count=True).materialize()
    uni = (
        counts.filter(expr="kind == 0")
        .select_columns(["g", "c"])
        .rename_columns({"g": "tok", "c": "c1"})
        .materialize()
    )
    bg = (
        counts.filter(expr="kind == 1")
        .select_columns(["g", "c"])
        .rename_columns({"g": "gram", "c": "c2"})
        .materialize()
    )
    return uni, bg, int(uni.count()) + 1


def _ppl_from_parts(lp_sum: np.ndarray, n_bg: np.ndarray) -> np.ndarray:
    return np.round(np.exp(-lp_sum / np.maximum(n_bg, 1)), 4)


_SCORE_SCHEMA_TAIL = [("n_bigrams", pa.int64()), ("ppl", pa.float64())]


def score_perplexity(
    docs: "ray.data.Dataset",
    uni: "ray.data.Dataset",
    bg: "ray.data.Dataset",
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: Sequence[str] = ("lang",),
    alpha: float = _ALPHA,
    mode: str = "auto",
    max_broadcast_rows: int = _MAX_BROADCAST_ROWS,
) -> "ray.data.Dataset":
    """Per-doc bigram perplexity → Dataset(id_col, *keep_cols,
    n_bigrams, ppl).  Docs with < 2 tokens are dropped (no bigrams to
    score — same rule on the SQL side)."""
    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"mode must be auto/broadcast/join, got {mode!r}")
    keep_cols = list(keep_cols)
    if mode == "auto":
        mode = "broadcast" if bg.count() <= max_broadcast_rows else "join"
    aV = float(alpha) * float(vocab_size)

    if mode == "broadcast":
        u_df = uni.to_pandas()
        b_df = bg.to_pandas()
        model_ref = ray.put(
            (
                pd.Index(u_df["tok"].to_numpy(dtype=object)),
                u_df["c1"].to_numpy(dtype=np.float64),
                pd.Index(b_df["gram"].to_numpy(dtype=object)),
                b_df["c2"].to_numpy(dtype=np.float64),
            )
        )

        def score(batch: pa.Table) -> pa.Table:
            uni_idx, c1s, bg_idx, c2s = cached_get(model_ref, slot="ngramlm_model")
            texts = batch[text_col].to_pylist()
            w1s, grams, counts = _doc_grams(texts)
            doc_idx = np.repeat(np.arange(len(texts)), counts)
            gi = bg_idx.get_indexer(np.asarray(grams, dtype=object))
            c2 = np.where(gi >= 0, c2s[np.maximum(gi, 0)], 0.0)
            ui = uni_idx.get_indexer(np.asarray(w1s, dtype=object))
            c1 = np.where(ui >= 0, c1s[np.maximum(ui, 0)], 0.0)
            lp = np.log((c2 + alpha) / (c1 + aV))
            lp_sum = np.bincount(doc_idx, weights=lp, minlength=len(texts))
            keep = counts > 0
            cols = {id_col: batch[id_col].filter(pa.array(keep))}
            for c in keep_cols:
                cols[c] = batch[c].filter(pa.array(keep))
            cols["n_bigrams"] = pa.array(counts[keep], pa.int64())
            cols["ppl"] = pa.array(_ppl_from_parts(lp_sum[keep], counts[keep]), pa.float64())
            return pa.table(cols)

        return docs.map_batches(score, batch_format="pyarrow")

    # join mode: slim (id, keep_cols, w1, gram) rows; two bucketed hash
    # joins; one bucketed per-doc sum+count.  Payload text never shuffles.
    def explode(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        w1s, grams, counts = _doc_grams(texts)
        doc_idx = np.repeat(np.arange(len(texts)), counts)
        cols = {id_col: batch[id_col].take(pa.array(doc_idx, pa.int64()))}
        for c in keep_cols:
            cols[c] = batch[c].take(pa.array(doc_idx, pa.int64()))
        cols["w1"] = pa.array(w1s, pa.string())
        cols["gram"] = pa.array(grams, pa.string())
        return pa.table(cols)

    doc_sch = docs.schema()
    dmap = dict(zip(doc_sch.names, [_arrow_type(t) for t in doc_sch.types]))
    slim = docs.map_batches(explode, batch_format="pyarrow")
    # seed AFTER the coalesce — materialize drops all-empty blocks, so a
    # pre-coalesce seed would not survive to the join's schema probe
    seeded = _seed_empty(
        shuffle_coalesce(slim),
        [(c, dmap[c]) for c in [id_col] + keep_cols]
        + [("w1", pa.string()), ("gram", pa.string())],
    )
    j = hash_join(seeded, bg, on="gram", how="left")
    # re-seed after drop_columns: its schema probe EXECUTES a limit-1
    # fetch, which yields None on an all-empty (seed-only) dataset even
    # though every block is schema-pinned
    j = _seed_empty(
        j.drop_columns(["gram"]),
        [(c, dmap[c]) for c in [id_col] + keep_cols]
        + [("w1", pa.string()), ("c2", pa.int64())],
    )
    j = hash_join(j, uni, on="w1", right_on="tok", how="left")

    def lp_batch(batch: pa.Table) -> pa.Table:
        c2 = np.nan_to_num(batch["c2"].to_numpy(zero_copy_only=False).astype(np.float64))
        c1 = np.nan_to_num(batch["c1"].to_numpy(zero_copy_only=False).astype(np.float64))
        lp = np.log((c2 + alpha) / (c1 + aV))
        cols = {c: batch[c] for c in [id_col] + keep_cols}
        cols["lp"] = pa.array(lp, pa.float64())
        return pa.table(cols)

    per_gram = j.map_batches(lp_batch, batch_format="pyarrow")
    key_cols = [id_col] + keep_cols

    # one groupby carrying BOTH the lp sum and the bigram count (a
    # bucketed_sum twin that avoids a second shuffle)
    def add_pb(t: pa.Table) -> pa.Table:
        from .join import _hash_col

        h = np.zeros(len(t), dtype=np.uint64)
        for c in key_cols:
            h = h * np.uint64(1099511628211) ^ _hash_col(t[c])
        return t.append_column("__pb", pa.array((h % np.uint64(64)).astype(np.int32)))

    def agg(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(key_cols, as_index=False, sort=False).agg(
            lp_sum=("lp", "sum"), n_bigrams=("lp", "size")
        )
        cols = {c: pa.array(g[c], t.schema.field(c).type) for c in key_cols}
        n = g["n_bigrams"].to_numpy(dtype=np.int64)
        cols["n_bigrams"] = pa.array(n, pa.int64())
        cols["ppl"] = pa.array(
            _ppl_from_parts(g["lp_sum"].to_numpy(dtype=np.float64), n), pa.float64()
        )
        return pa.table(cols)

    coalesced = shuffle_coalesce(per_gram.map_batches(add_pb, batch_format="pyarrow"))
    seed = pa.schema(
        [(c, dmap[c]) for c in key_cols] + _SCORE_SCHEMA_TAIL
    ).empty_table()
    # all-empty guard: groupby on a zero-block dataset emits a column-less
    # pandas block that poisons the union's schema — return the pinned
    # seed alone (coalesced is materialized, so this probe is metadata-only)
    csch = coalesced.schema()
    if csch is None or not csch.names:
        return ray.data.from_arrow(seed)
    out = coalesced.groupby("__pb").map_groups(agg, batch_format="pyarrow")
    return ray.data.from_arrow(seed).union(out)


def ppl_rank_buckets(
    scored: "ray.data.Dataset",
    group_col: str = "lang",
    order_col: str = "ppl",
    id_col: str = "doc_id",
    labels: Sequence[str] = ("head", "middle", "tail"),
) -> "ray.data.Dataset":
    """CCNet's head/middle/tail split: rank every doc WITHIN its language
    by (ppl, doc_id) and cut the ranking into ``len(labels)`` equal-count
    bands (1-based rank r of n docs gets band j = ceil(r·K/n), i.e. the
    exact ``CASE WHEN r*K <= n ... `` the SQL oracle states).

    Ray Data has no rank/window primitive; a full sort would shuffle the
    whole scored table through one global exchange.  Two-phase plan
    (the shuffle_ranks/pack.py prefix-sum pattern):

    1. one map pass quantizes ppl to a MONOTONE 256-level key ``__q``
       (floor(8·log2(ppl+1)) — a prefix of the within-group sort order,
       equal ppl always lands in the same level),
    2. per-(group, __q) counts partial-aggregate down to ≤ groups×256
       rows; the driver prefix-sums them into per-cell rank offsets and
       per-group totals (O(cells), never O(docs)) and broadcasts ONE
       small tuple,
    3. one ``groupby(group, __q).map_groups`` sorts locally and emits
       ``rank = offset + local_index`` → bucket label.

    Only the slim (id, group, ppl, __q) table shuffles; at 100 TB the
    all-to-all carries ~24 bytes/doc and no cell exceeds its ppl-level
    slice of one language.  Skewed levels split further is unnecessary:
    the within-cell work is a local mergesort.
    """
    K = len(labels)
    if K < 2:
        raise ValueError("need at least 2 bucket labels")

    def quant(batch: pa.Table) -> pa.Table:
        v = batch[order_col].to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.clip((np.log2(np.maximum(v, 0.0) + 1.0) * 8.0).astype(np.int64), 0, 255)
        return pa.table(
            {
                id_col: batch[id_col],
                group_col: batch[group_col],
                order_col: pa.array(v, pa.float64()),
                "__q": pa.array(q, pa.int64()),
            }
        )

    # seed types come from the INPUT schema (an all-empty materialized
    # dataset reports schema() is None, so probe before the map)
    in_sch = scored.schema()
    tmap = dict(zip(in_sch.names, [_arrow_type(t) for t in in_sch.types]))
    seed = pa.schema(
        [
            (id_col, tmap.get(id_col, pa.int64())),
            (group_col, tmap.get(group_col, pa.string())),
            (order_col, pa.float64()),
            ("bucket", pa.string()),
        ]
    ).empty_table()
    # coalesce the slim table ONCE before its two all-to-alls (counts +
    # rank groupby) — many tiny blocks make Ray inline sub-100KB shuffle
    # chunks into the driver store (+722 MB anon / 73 s at the 2M-doc
    # proof before this line; see BASELINE.md shuffle_coalesce note)
    slim = shuffle_coalesce(
        scored.map_batches(quant, batch_format="pyarrow")
    ).materialize()
    if slim.count() == 0:
        return ray.data.from_arrow(seed)

    from ray.data.aggregate import Count

    cells = slim.groupby([group_col, "__q"]).aggregate(Count(alias_name="n")).take_all()
    cells.sort(key=lambda r: (str(r[group_col]), int(r["__q"])))
    offsets: dict = {}
    totals: dict = {}
    for r in cells:
        g = r[group_col]
        offsets[(g, int(r["__q"]))] = totals.get(g, 0)
        totals[g] = totals.get(g, 0) + int(r["n"])
    meta_ref = ray.put((offsets, totals, tuple(labels)))

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        offs, tots, labs = cached_get(meta_ref, slot="ppl_bucket_meta")
        g = group[group_col].iloc[0]
        off = offs[(g, int(group["__q"].iloc[0]))]
        n = tots[g]
        s = group.sort_values([order_col, id_col], kind="mergesort")
        r1 = off + np.arange(1, len(s) + 1, dtype=np.int64)
        j = np.minimum((r1 * len(labs) + n - 1) // n - 1, len(labs) - 1)
        return pd.DataFrame(
            {
                id_col: s[id_col].to_numpy(),
                group_col: s[group_col].to_numpy(),
                order_col: s[order_col].to_numpy(dtype=np.float64),
                "bucket": np.asarray(labs, dtype=object)[j],
            }
        )

    out = slim.groupby([group_col, "__q"]).map_groups(assign)
    return ray.data.from_arrow(seed).union(out)
