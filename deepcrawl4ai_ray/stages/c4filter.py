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
    return ds.map_batches(
        make_c4_line_filter_fn(id_col, text_col, min_words, min_kept),
        batch_format="pyarrow",
    )
