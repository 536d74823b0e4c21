"""Repetition statistics — Gopher-style (Rae et al. 2021, "Scaling
Language Models: ... Gopher", Table A1) per-document repetition
signals used to filter low-quality/templated web text:

- ``top2_frac``  — fraction of tokens covered by the single most
  frequent word 2-gram (2 · max-2-gram-count / n_tokens),
- ``dup3_frac``  — fraction of word 3-gram occurrences that are
  repeats (1 − distinct/total).

The reference has no corpus-quality machinery; these extend the
text-analysis family (functions/textstats.py) with the repetition
axis.  Kernel: per-token uint64 hashes (one C-level siphash pass per
doc) and ``np.unique`` counting over windowed-hash n-grams — no
per-n-gram string materialization.  Counting hashed n-grams equals
counting string n-grams up to an in-document 64-bit collision
(≈ 10⁻¹⁶ per doc — the same accepted-risk discipline as the shingle
family); the DuckDB oracle counts exact string n-grams.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..functions.hashing import token_hashes
from ..stages.decontam import ngram_window_hashes


def repetition_stats_from_hashes(hashes: "List[np.ndarray]") -> Dict[str, np.ndarray]:
    """Per-doc arrays from precomputed token-hash arrays: n_tokens
    (int64), top2_frac, dup3_frac (float64; 0.0 for docs too short to
    have the n-gram).  Callers that already tokenized each doc (the
    Gopher gate needs token STRINGS for word-length/stopword rules)
    hash their tokens once and pass them here instead of paying a
    second tokenize pass inside repetition_stats."""
    n = len(hashes)
    n_tokens = np.zeros(n, dtype=np.int64)
    top2 = np.zeros(n, dtype=np.float64)
    dup3 = np.zeros(n, dtype=np.float64)
    for i, h in enumerate(hashes):
        n_tokens[i] = h.size
        if h.size >= 2:
            g2 = ngram_window_hashes(h, 2)
            _, cnts = np.unique(g2, return_counts=True)
            top2[i] = 2.0 * cnts.max() / h.size
        if h.size >= 3:
            g3 = ngram_window_hashes(h, 3)
            dup3[i] = 1.0 - np.unique(g3).size / g3.size
    return {"n_tokens": n_tokens, "top2_frac": top2, "dup3_frac": dup3}


def repetition_stats(texts: List[str]) -> Dict[str, np.ndarray]:
    """Per-doc arrays: n_tokens (int64), top2_frac, dup3_frac
    (float64; 0.0 for docs too short to have the n-gram)."""
    return repetition_stats_from_hashes([token_hashes(t or "") for t in texts])
