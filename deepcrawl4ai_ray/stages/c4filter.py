"""C4-style line-level cleaning (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning" §2.2 heuristics, adapted to extracted
markdown): drop low-signal LINES inside each document, then drop
documents left with too few lines.  This is the cleaning pass between
extraction and dedup in a webtext training-data pipeline — the
reference's closest analog is its DOM-level PruningContentFilter
(SURVEY §2 M4, crawl.py:337-346), which prunes nodes; this operator
prunes the extracted text itself.

Rules (each a pure function of the line, so the DuckDB oracle
reproduces them with list_filter lambdas):
- a line is KEPT iff it has >= ``min_words`` whitespace tokens and is
  not a markdown heading (leading ``#``);
- a document survives iff >= ``min_kept`` lines were kept.

Scale shape: entirely embarrassingly parallel — one ``map_batches``
stage, no shuffle.  The per-batch kernel is vectorized end to end:
``pc.split_pattern`` explodes lines (list array), ``list_flatten`` +
``list_parent_indices`` give a flat line table, word counts come from
one ``pc.count_substring_regex`` call, and per-doc tallies are numpy
``bincount``s over the parent index — no Python loop over rows or
lines.  Only the kept-line re-join (needed for the cleaned-text hash)
touches Python, via a single pandas groupby-join over kept lines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import md5_hex_many


def make_c4_line_filter_fn(
    id_col: str = "url",
    text_col: str = "text",
    min_words: int = 5,
    min_kept: int = 2,
):
    """map_batches fn: (id, text) → (id, n_lines, n_kept, clean_md5)
    for surviving docs.  n_lines counts NON-BLANK lines (>=1 word);
    clean_md5 hashes the kept lines joined by newline — the cleaned
    corpus text, hash-comparable without shipping it anywhere."""

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        empty = pa.table(
            {
                id_col: pa.array([], batch.schema.field(id_col).type),
                "n_lines": pa.array([], pa.int64()),
                "n_kept": pa.array([], pa.int64()),
                "clean_md5": pa.array([], pa.string()),
            }
        )
        if n == 0:
            return empty
        lines = pc.split_pattern(batch[text_col], pattern="\n")
        flat = pc.list_flatten(lines)
        parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        wc = pc.count_substring_regex(flat, pattern=r"\S+").to_numpy(zero_copy_only=False)
        heading = pc.starts_with(flat, pattern="#").to_numpy(zero_copy_only=False)
        keep = (wc >= min_words) & ~heading
        n_lines = np.bincount(parents, weights=(wc > 0), minlength=n).astype(np.int64)
        n_kept = np.bincount(parents, weights=keep, minlength=n).astype(np.int64)
        doc_keep = n_kept >= min_kept
        if not doc_keep.any():
            return empty
        # join kept lines per surviving doc (one pandas groupby — the
        # only non-Arrow step; strings stay inside the task)
        kept_flat = flat.to_pandas()[keep]
        kept_parents = parents[keep]
        joined = kept_flat.groupby(kept_parents).agg("\n".join)
        doc_idx = np.nonzero(doc_keep)[0]
        # min_kept=0 admits docs with no kept lines → empty cleaned text
        texts = joined.reindex(doc_idx).fillna("").to_numpy(dtype=object)
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(doc_idx)),
                "n_lines": pa.array(n_lines[doc_idx]),
                "n_kept": pa.array(n_kept[doc_idx]),
                "clean_md5": pa.array(md5_hex_many(list(texts)), pa.string()),
            }
        )

    return fn


def c4_line_stats(
    ds: "ray.data.Dataset",
    id_col: str = "url",
    text_col: str = "text",
    min_words: int = 5,
    min_kept: int = 2,
) -> "ray.data.Dataset":
    """→ Dataset(id, n_lines, n_kept, clean_md5), surviving docs only."""
    out = ds.map_batches(
        make_c4_line_filter_fn(id_col, text_col, min_words, min_kept),
        batch_format="pyarrow",
    )
    from .join import _schema_types, _seed_empty

    tmap = _schema_types(ds)
    if tmap is None:
        return out
    # schema-pinned empty seed: an all-empty result keeps its schema
    return _seed_empty(
        out,
        [
            (id_col, tmap[id_col]),
            ("n_lines", pa.int64()),
            ("n_kept", pa.int64()),
            ("clean_md5", pa.string()),
        ],
    )


def boilerplate_line_dedup(
    ds: "ray.data.Dataset",
    id_col: str = "url",
    text_col: str = "text",
    min_docs: int = 5,
    max_boiler: int = 1_000_000,
) -> "ray.data.Dataset":
    """Cross-document boilerplate LINE removal (the C4/WET cleaning rule:
    a line occurring verbatim in many documents is template chrome —
    nav, footers, cookie banners — not content): any non-blank line
    appearing in more than ``min_docs`` DISTINCT documents is stripped
    from every document.

    Scale shape: documents reduce to slim DISTINCT (line_md5) rows per
    doc inside map_batches (one md5 per distinct line — text never
    shuffles), ONE groupby counts document frequency, and the
    boilerplate set — tiny by construction (a line repeated across
    >min_docs docs is template vocabulary, not content; guarded by
    ``max_boiler``) — broadcasts via ray.put for the shuffle-free
    per-doc strip pass.

    → Dataset(id, n_lines, n_boiler_removed, clean_md5): non-blank line
    count, lines stripped, md5 of the surviving text (kept lines joined
    by newline, blank lines dropped).
    """
    import ray as _ray

    from .join import cached_get

    def doc_lines(batch: pa.Table) -> pa.Table:
        lines = pc.split_pattern(batch[text_col], pattern="\n")
        flat = pc.list_flatten(lines)
        parents = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        wc = pc.count_substring_regex(flat, pattern=r"\S+").to_numpy(zero_copy_only=False)
        keep = wc > 0
        fl = flat.to_pandas()[keep]
        par = parents[keep]
        # distinct per doc: one (doc, line_md5) row per distinct line
        df = pd.DataFrame({"p": par, "h": md5_hex_many(list(fl))}).drop_duplicates()
        return pa.table({"h": pa.array(df["h"].to_numpy(dtype=object), pa.string())})

    # two-level count: distinct-line-hash key count is O(corpus lines)
    from .join import bucketed_sum

    freq = bucketed_sum(
        ds.map_batches(doc_lines, batch_format="pyarrow"), ["h"], "h", "df", count=True
    )
    boiler_rows = freq.map_batches(
        lambda t, m=min_docs: t.filter(pc.greater(t["df"], m)).select(["h"]),
        batch_format="pyarrow",
    ).take_all()
    if len(boiler_rows) > max_boiler:
        raise ValueError(
            f"boilerplate set {len(boiler_rows)} exceeds max_boiler={max_boiler}; "
            "raise min_docs (the set should be template vocabulary, not content)"
        )
    boiler_ref = _ray.put(frozenset(r["h"] for r in boiler_rows))

    def strip(batch: pa.Table) -> pa.Table:
        boiler = cached_get(boiler_ref, "c4.boiler")
        lines = pc.split_pattern(batch[text_col], pattern="\n")
        flat = lines.to_pylist()
        n = len(batch)
        n_lines = np.zeros(n, dtype=np.int64)
        n_rm = np.zeros(n, dtype=np.int64)
        out = np.empty(n, dtype=object)
        for i, ls in enumerate(flat):
            nb = [l for l in (ls or []) if l.strip()]
            hs = md5_hex_many(nb)
            kept = [l for l, h in zip(nb, hs) if h not in boiler]
            n_lines[i] = len(nb)
            n_rm[i] = len(nb) - len(kept)
            out[i] = "\n".join(kept)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_lines": pa.array(n_lines),
                "n_boiler_removed": pa.array(n_rm),
                "clean_md5": pa.array(md5_hex_many(list(out)), pa.string()),
            }
        )

    out = ds.map_batches(strip, batch_format="pyarrow")
    from .join import _schema_types, _seed_empty

    tmap = _schema_types(ds)
    if tmap is None:
        return out
    return _seed_empty(
        out,
        [
            (id_col, tmap[id_col]),
            ("n_lines", pa.int64()),
            ("n_boiler_removed", pa.int64()),
            ("clean_md5", pa.string()),
        ],
    )
