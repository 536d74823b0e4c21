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
import pyarrow.compute as pc

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
    # two-level bucketed DISTINCT over the pair keys — a plain
    # groupby(id_a, id_b) carries per-DISTINCT-PAIR aggregate state,
    # O(candidate pairs) of it (see join.bucketed_distinct)
    from .join import bucketed_distinct

    cand = bucketed_distinct(
        grams.groupby("bk").map_groups(bucket_pairs), ["id_a", "id_b"], num_buckets=num_buckets
    ).materialize()

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


#: remove_duplicate_spans dup_mode="auto" broadcasts the duplicated-gram
#: hash set when it has at most this many entries (8 B each → ≤ ~32 MB
#: through the object store); above it, the per-doc join path runs.
_BROADCAST_MAX_DUP_GRAMS = 4_000_000


def _cover_mask(hit_starts: np.ndarray, n: int, m: int) -> np.ndarray:
    """Boolean mask over m tokens covered by any n-window starting at
    the given positions (interval union via a diff array, O(m))."""
    diff = np.zeros(m + 1, dtype=np.int64)
    np.add.at(diff, hit_starts, 1)
    np.add.at(diff, np.minimum(hit_starts + n, m), -1)
    return np.cumsum(diff[:m]) > 0


def _strip_tokens(txt: str, dup_sorted: np.ndarray, n: int) -> str:
    """Cleaned token stream of one document: every token covered by a
    duplicated n-gram window is dropped, survivors joined by ' '.
    ``dup_sorted`` is int64 (the uint64 gram hashes reinterpreted — Ray
    groupby reduces can't carry >2^63 Python ints into Arrow)."""
    tk = tokens(txt or "")
    if not tk:
        return ""
    if len(tk) < n or dup_sorted.size == 0:
        return " ".join(tk)
    wh = ngram_window_hashes(token_hashes(txt or ""), n).view(np.int64)
    pos = np.searchsorted(dup_sorted, wh)
    pos_c = np.minimum(pos, dup_sorted.size - 1)
    hit = np.where((pos < dup_sorted.size) & (dup_sorted[pos_c] == wh))[0]
    if hit.size == 0:
        return " ".join(tk)
    keep = ~_cover_mask(hit, n, len(tk))
    return " ".join(t for t, k in zip(tk, keep) if k)


def remove_duplicate_spans(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    n: int = 13,
    min_df: int = 2,
    num_buckets: int = 32,
    dup_mode: str = "auto",
) -> "ray.data.Dataset":
    """The REMOVAL half of the Lee et al. / RefinedWeb exact-substring
    step (duplicate_span_pairs only *finds* spans): every token covered
    by a word n-gram appearing in ≥ ``min_df`` distinct documents is
    deleted; output is Dataset(id_col, cleaned) where ``cleaned`` is the
    surviving tokens joined by single spaces (a normalized token stream
    — the form a training tokenizer consumes; docs with nothing removed
    are rejoined the same way, so the transform is uniform and
    SQL-oracle-checkable end to end).

    Scale shape: pass 1 emits the slim (gram_hash, doc) table (16 B/row,
    text never shuffles); one groupby(gh) computes document frequency;
    ``dup_mode``:
      "broadcast": the duplicated-hash set (usually tiny — df≥2 grams
                   are the exception, not the rule) ships once via
                   ray.put; strip is a single map_batches pass.
      "join":      the 100-TB path when duplicated grams are massive —
                   per-doc gram rows semi-join the dup set (bucketed),
                   per-doc dup-hash lists groupby back, and a payload
                   join attaches each doc's own (small) dup list.
      "auto":      count the dup set and pick at _BROADCAST_MAX_DUP_GRAMS.
    Identity caveat (documented, tested): dedup is by 64-bit gram hash —
    two distinct grams colliding could cause a spurious removal with
    probability ~(grams²/2⁶⁴), the standard trade every hash-based
    exact-substring pipeline makes.
    """
    if dup_mode not in ("broadcast", "join", "auto"):
        raise ValueError(f"unknown dup_mode {dup_mode!r}")
    from ray.data.aggregate import Count

    import ray as _ray

    from .join import cached_get

    def explode(batch: pa.Table) -> pa.Table:
        ghs: List[np.ndarray] = []
        ids: List[np.ndarray] = []
        for i, txt in zip(
            batch[id_col].to_numpy(zero_copy_only=False), batch[text_col].to_pylist()
        ):
            wh = np.unique(ngram_window_hashes(token_hashes(txt or ""), n))
            if wh.size:
                ghs.append(wh.view(np.int64))  # int64 view: groupby-safe
                ids.append(np.full(wh.size, i, dtype=np.int64))
        gh = np.concatenate(ghs) if ghs else np.empty(0, dtype=np.int64)
        di = np.concatenate(ids) if ids else np.empty(0, dtype=np.int64)
        return pa.table({"gh": pa.array(gh, pa.int64()), "__doc": pa.array(di, pa.int64())})

    grams = ds.map_batches(explode, batch_format="pyarrow")
    # rows are distinct per doc, so Count == document frequency
    dup = (
        grams.groupby("gh")
        .aggregate(Count(alias_name="df"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["df"], min_df)).select(["gh"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_dup = dup.count()

    if dup_mode == "auto":
        dup_mode = "broadcast" if n_dup <= _BROADCAST_MAX_DUP_GRAMS else "join"

    if dup_mode == "broadcast":
        parts = [
            b["gh"].to_numpy(zero_copy_only=False)
            for b in dup.iter_batches(batch_format="pyarrow")
        ]
        dup_sorted = np.sort(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
        ref = _ray.put(dup_sorted)

        def strip(batch: pa.Table) -> pa.Table:
            d = cached_get(ref, "dupspans.dupset")
            out = [_strip_tokens(t, d, n) for t in batch[text_col].to_pylist()]
            return pa.table({id_col: batch[id_col], "cleaned": pa.array(out, pa.string())})

        return _seed_cleaned(ds.map_batches(strip, batch_format="pyarrow"), ds, id_col)

    # join path: each doc gets ITS OWN dup-hash list (bounded by the
    # doc's gram count), never the global set.
    hits = hash_join(grams, dup, on="gh", num_buckets=num_buckets)

    def pack_doc(group: pa.Table) -> pa.Table:
        # Arrow in/out so the blob column carries a real binary() type
        # through the downstream join (a pandas object column would be
        # schema-pinned to string and fail conversion)
        d = group["__doc"].to_numpy(zero_copy_only=False)
        g = group["gh"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((g, d))
        d, g = d[order], g[order]
        uniq, start = np.unique(d, return_index=True)
        ends = np.append(start[1:], g.size)
        blobs = [g[s:e].tobytes() for s, e in zip(start, ends)]
        return pa.table(
            {"__doc": pa.array(uniq, pa.int64()), "__dup": pa.array(blobs, pa.binary())}
        )

    per_doc = hits.groupby("__doc").map_groups(pack_doc, batch_format="pyarrow")
    slim_docs = ds.map_batches(
        lambda t: pa.table({"__doc": pc.cast(t[id_col], pa.int64()), "__txt": t[text_col]}),
        batch_format="pyarrow",
    )
    joined = hash_join(slim_docs, per_doc, on="__doc", how="left", num_buckets=num_buckets)

    def strip_joined(batch: pa.Table) -> pa.Table:
        out = []
        for txt, blob in zip(batch["__txt"].to_pylist(), batch["__dup"].to_pylist()):
            d = (
                np.frombuffer(blob, dtype=np.int64)
                if blob is not None
                else np.empty(0, dtype=np.int64)
            )
            out.append(_strip_tokens(txt, d, n))
        return pa.table(
            {id_col: pc.cast(batch["__doc"], pa.int64()), "cleaned": pa.array(out, pa.string())}
        )

    return _seed_cleaned(joined.map_batches(strip_joined, batch_format="pyarrow"), ds, id_col)


def _seed_cleaned(out, ds, id_col: str):
    """Schema-pinned empty seed for the (id, cleaned) output contract."""
    from .join import _schema_types, _seed_empty

    tmap = _schema_types(ds)
    if tmap is None:
        return out
    return _seed_empty(out, [(id_col, tmap[id_col]), ("cleaned", pa.string())])
