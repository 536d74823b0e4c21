"""Text analysis: token counting, quality scoring, language ID.

These are first-class training-data-pipeline operators (not present in
the reference, whose only text handling is markdown generation —
SURVEY.md §2.2 M4).  All aggregate-facing metrics are defined so a
DuckDB oracle can reproduce them exactly:

- ``ws_token_count(text)``  == length(text) - length(replace(text,' ','')) + 1
  (whitespace token count for single-space-separated text)
- ``avg_token_len``         == (length(text) - (n-1)) / n

Language ID is an n-gram frequency heuristic (non-SQL-expressible →
rows-only check).
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BPE_ISH_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been for on with as at by it this that".split()
)


def ws_token_counts(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized whitespace token count (Arrow kernels, zero-copy).

    Equals ``count(' ') + 1`` — exact for single-space-normalized text
    (which both the documents table and our extractor blocks are).
    """
    spaces = pc.count_substring(texts, " ")
    return pc.add(spaces, 1)


def bpe_ish_token_count(text: str) -> int:
    """Sub-word-ish token count: words + punctuation marks (regex BPE stand-in)."""
    return len(_BPE_ISH_RE.findall(text))


_ALPHA_RUN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def quality_metrics(text: str) -> Dict[str, float]:
    """Per-document quality signals (length / stopword / punct ratios)."""
    toks = text.split()
    n = len(toks)
    if n == 0:
        return {"n_tokens": 0, "stopword_ratio": 0.0, "mean_token_len": 0.0, "alpha_ratio": 0.0}
    stop = sum(1 for t in toks if t.lower() in STOPWORDS)
    # alpha chars counted as runs (one C regex pass, not a per-char loop)
    alpha = sum(map(len, _ALPHA_RUN_RE.findall(text)))
    return {
        "n_tokens": n,
        "stopword_ratio": stop / n,
        "mean_token_len": sum(len(t) for t in toks) / n,
        "alpha_ratio": alpha / max(1, len(text)),
    }


# --- language ID: character-bigram profile heuristic ----------------------

_LANG_PROFILES = {
    "en": "th he in er an re on at en nd ti es or te of ed is it al ar st to",
    "de": "en er ch de ei te in nd ie ge st ne be es un re an ha di sc au",
    "fr": "es le de en re nt on er te el an se et la ai it me ou em ie ur",
    "es": "de es en el la os ar er as on re al an do or ue ta ci se nt ad",
    "el": "α ο ε ι τ ν η σ ρ κ π μ λ υ δ γ θ χ ω φ β",
    "zh": "的 一 是 不 了 人 我 在 有 他 这 中 大 来 上 国 个 到 说 们",
}
_PROFILES = {lang: set(s.split()) for lang, s in _LANG_PROFILES.items()}


def lang_id(text: str) -> str:
    """n-gram-overlap language guess over a fixed bigram profile table.

    Deterministic tie-break: highest overlap score, then alphabetical
    language code.  Returns 'und' for empty text.
    """
    t = text.lower()
    if not t.strip():
        return "und"
    grams = {t[i : i + 2] for i in range(len(t) - 1)}
    best, best_score = "und", -1.0
    for lang in sorted(_PROFILES):
        prof = _PROFILES[lang]
        score = len(grams & prof) / len(prof)
        if score > best_score:
            best, best_score = lang, score
    return best


def quality_batch(texts: List[str]) -> Dict[str, np.ndarray]:
    """Batch quality metrics as numpy columns (for map_batches)."""
    n = len(texts)
    n_tokens = np.empty(n, dtype=np.int64)
    stop_ratio = np.empty(n, dtype=np.float64)
    mean_len = np.empty(n, dtype=np.float64)
    alpha_ratio = np.empty(n, dtype=np.float64)
    for i, t in enumerate(texts):
        m = quality_metrics(t)
        n_tokens[i] = m["n_tokens"]
        stop_ratio[i] = m["stopword_ratio"]
        mean_len[i] = m["mean_token_len"]
        alpha_ratio[i] = m["alpha_ratio"]
    return {
        "n_tokens": n_tokens,
        "stopword_ratio": stop_ratio,
        "mean_token_len": mean_len,
        "alpha_ratio": alpha_ratio,
    }
