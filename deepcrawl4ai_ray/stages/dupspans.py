"""Exact duplicate-span detection — document pairs sharing ≥1 exact
word n-gram (default n=13, the GPT-3/PaLM contamination convention),
with the EXACT count of distinct shared n-grams per pair.  This is the
exact-substring member of the dedup family (cf. Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better"):
MinHash/SimHash find *mostly-similar documents*; this finds *verbatim
repeated passages* (boilerplate, mirrored quotes, templated spans) even
between otherwise-dissimilar documents.

Scale shape (the corpus×corpus generalization of stages/decontam.py):

1. one streaming pass emits (gram_hash: uint64, doc_id) per DISTINCT
   n-gram per doc — a slim 16 B/row table; the text never leaves the
   extract stage,
2. one groupby(gram_hash) emits candidate pairs per gram.  Grams held
   by more than ``max_docs_per_gram`` documents are DROPPED — corpus
   boilerplate ("all rights reserved ...") otherwise emits O(docs²)
   pairs per gram; the cap is part of the operator spec (the SQL
   oracle applies the same HAVING), mirroring how real pipelines
   drop top-frequency grams,
3. pair candidates are deduped + counted distributively, then the rare
   survivors are EXACTLY re-verified: both texts joined back per pair
   (bucketed hash joins, payload shipped once per endpoint) and the
   true distinct-shared-n-gram count computed from strings — so hash
   collisions cannot inflate counts and the result is exact.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.hashing import token_hashes, tokens
from .decontam import _ngram_strings, ngram_window_hashes
from .join import hash_join


def duplicate_span_pairs(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    n: int = 13,
    max_docs_per_gram: int = 64,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Dataset(id_a, id_b, n_shared) for every doc pair (id_a < id_b)
    sharing ≥1 exact word n-gram, where n_shared is the EXACT number of
    distinct shared n-gram strings; grams in > max_docs_per_gram docs
    are excluded (spec'd boilerplate cap, applied on both engine and
    oracle sides)."""

    def explode(batch: pa.Table) -> pa.Table:
        ghs: List[np.ndarray] = []
        ids: List[np.ndarray] = []
        for i, txt in zip(
            batch[id_col].to_numpy(zero_copy_only=False), batch[text_col].to_pylist()
        ):
            th = token_hashes(txt or "")
            wh = np.unique(ngram_window_hashes(th, n))
            if wh.size:
                ghs.append(wh)
                ids.append(np.full(wh.size, i, dtype=np.int64))
        if not ghs:
            return pa.table(
                {
                    "gh": pa.array([], pa.uint64()),
                    id_col: pa.array([], pa.int64()),
                    "bk": pa.array([], pa.int64()),
                }
            )
        gh = np.concatenate(ghs)
        return pa.table(
            {
                "gh": pa.array(gh, pa.uint64()),
                id_col: pa.array(np.concatenate(ids), pa.int64()),
                "bk": pa.array((gh % np.uint64(num_buckets)).astype(np.int64), pa.int64()),
            }
        )

    grams = ds.map_batches(explode, batch_format="pyarrow")

    # ONE coarse groupby (num_buckets groups), vectorized inside: grams
    # with ≥2 docs are rare, so the per-gram pair loop touches only the
    # collision tail, never the clean majority.
    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype=np.int64), "id_b": pd.Series(dtype=np.int64)}
        )
        gh = group["gh"].to_numpy()
        ids = group[id_col].to_numpy()
        order = np.lexsort((ids, gh))
        gh, ids = gh[order], ids[order]
        _, start, counts = np.unique(gh, return_index=True, return_counts=True)
        rows_a: List[np.ndarray] = []
        rows_b: List[np.ndarray] = []
        # count==2 grams (the overwhelming majority of collisions) are
        # paired in one vectorized gather — no per-gram Python; the
        # boilerplate cap applies here too (a cap < 2 means "no pairs")
        two = start[counts == 2] if max_docs_per_gram >= 2 else start[:0]
        if two.size:
            rows_a.append(ids[two])
            rows_b.append(ids[two + 1])
        # rare >2-doc grams (up to the boilerplate cap) loop
        for j in np.where((counts > 2) & (counts <= max_docs_per_gram))[0]:
            g_ids = ids[start[j] : start[j] + counts[j]]
            a, b = np.triu_indices(len(g_ids), k=1)
            rows_a.append(g_ids[a])
            rows_b.append(g_ids[b])
        if not rows_a:
            return empty
        return pd.DataFrame(
            {"id_a": np.concatenate(rows_a), "id_b": np.concatenate(rows_b)}
        ).drop_duplicates()

    # materialize: the candidate set is tiny (pairs, not grams) and is
    # consumed twice below (schema probe + join input) — without this the
    # whole gram explode + bucket shuffle would re-execute from lineage
    cand = (
        grams.groupby("bk")
        .map_groups(bucket_pairs)
        .groupby(["id_a", "id_b"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )

    if cand.schema() is None:  # no candidates at all (e.g. cap drops everything)
        return ray.data.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                }
            )
        )

    docs_a = ds.map_batches(
        lambda t: pa.table({"id_a": t[id_col], "text_a": t[text_col]}),
        batch_format="pyarrow",
    )
    docs_b = ds.map_batches(
        lambda t: pa.table({"id_b": t[id_col], "text_b": t[text_col]}),
        batch_format="pyarrow",
    )
    joined = hash_join(
        hash_join(cand, docs_a, on="id_a", num_buckets=num_buckets),
        docs_b,
        on="id_b",
        num_buckets=num_buckets,
    )

    def verify(batch: pa.Table) -> pa.Table:
        out_a: List[int] = []
        out_b: List[int] = []
        out_n: List[int] = []
        for a, b, ta, tb in zip(
            batch["id_a"].to_pylist(),
            batch["id_b"].to_pylist(),
            batch["text_a"].to_pylist(),
            batch["text_b"].to_pylist(),
        ):
            sa = set(_ngram_strings(tokens(ta or ""), n))
            shared = len(sa & set(_ngram_strings(tokens(tb or ""), n)))
            if shared:
                out_a.append(a)
                out_b.append(b)
                out_n.append(shared)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "n_shared": pa.array(out_n, pa.int64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow")
