"""Benchmark decontamination — flag corpus documents that share any
exact word n-gram (default n=13, the published GPT-3/PaLM convention)
with a benchmark/test set.  A first-class training-data-pipeline
operator beyond the reference (which has no corpus-hygiene machinery;
its nearest concept is the per-page BM25 chunk filter,
content_filter_strategy.py).

Built for the 100-TB shape:

- The benchmark side is SMALL by definition (real test sets are MBs
  against a TB corpus) — its n-gram set is collected once and
  broadcast via ``ray.put`` (the small-side-lookup pattern, J2/J3),
  never shuffled per batch.
- The corpus scan is one streaming pass.  The hot path is the
  vectorized prescreen: per-token uint64 hashes (pandas siphash,
  C-level) combined over a sliding window with fixed odd multipliers
  — no per-n-gram string joins for the overwhelming majority of
  clean documents.
- Exactness: a hash hit is only a CANDIDATE.  Hit documents (rare)
  are re-checked by exact n-gram STRING membership against the
  broadcast benchmark set, so the result is exact — hash collisions
  cannot produce a false positive, and a true overlap always hashes
  equal (same kernel both sides).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import token_hashes, tokens

# fixed odd multipliers for positional window combination (uint64
# wraparound dot product); seed is part of the operator spec.  Built once
# at import — callers hit this in per-document loops, so no per-call
# RandomState construction.
_MAX_N = 32
_NGRAM_MULTS = (
    (
        np.random.RandomState(2027)
        .randint(0, 2**63, size=_MAX_N, dtype=np.int64)
        .astype(np.uint64)
        << np.uint64(1)
    )
    | np.uint64(1)
)


def _ngram_mults(n: int) -> np.ndarray:
    if not 1 <= n <= _MAX_N:
        raise ValueError(f"n must be in [1, {_MAX_N}], got {n}")
    return _NGRAM_MULTS[:n]


def ngram_window_hashes(h: np.ndarray, n: int) -> np.ndarray:
    """Per-position n-gram hashes from per-token hashes: a windowed
    uint64 dot with fixed odd multipliers (no string materialization).
    Returns an empty array when the document has fewer than n tokens."""
    if h.size < n:
        return np.empty(0, dtype=np.uint64)
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(h, n)
    return (win * _ngram_mults(n)[None, :]).sum(axis=1, dtype=np.uint64)


def _ngram_strings(toks: List[str], n: int) -> List[str]:
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def contaminated_docs(
    corpus: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    n: int = 13,
) -> "ray.data.Dataset":
    """Corpus docs sharing ≥1 exact word n-gram with the benchmark set
    → Dataset(id_col, n_hit) where n_hit = number of DISTINCT
    contaminated n-grams in the doc (clean docs are dropped).

    Two passes: (1) collect the benchmark n-gram set (strings, plus
    prescreen hashes derived with the same kernel) and broadcast it
    once; (2) stream the corpus, prescreen each doc by hash, and
    exactly re-verify the rare hit docs by string membership."""

    def bench_ngrams(batch: pa.Table) -> pa.Table:
        ngs: List[str] = []
        for txt in batch[text_col].to_pylist():
            toks = tokens(txt or "")
            if len(toks) >= n:
                ngs.extend(set(_ngram_strings(toks, n)))
        return pa.table({"ng": pa.array(sorted(set(ngs)), pa.string())})

    # Collect benchmark n-gram STRINGS (driver-side: the small side by
    # contract) and derive prescreen hashes with the same kernel — an
    # n-gram string re-tokenizes to exactly its n source tokens, so its
    # window hash equals the corpus-side hash of the same span.
    bench_rows = bench.map_batches(bench_ngrams, batch_format="pyarrow").take_all()
    bench_set = {r["ng"] for r in bench_rows}
    if bench_set:
        bench_hashes = np.unique(
            np.concatenate([ngram_window_hashes(token_hashes(ng), n) for ng in bench_set])
        )
    else:
        bench_hashes = np.empty(0, dtype=np.uint64)
    hashes_ref = ray.put(bench_hashes)
    set_ref = ray.put(bench_set)

    def scan(batch: pa.Table) -> pa.Table:
        bhs = ray.get(hashes_ref)
        bset = ray.get(set_ref)
        out_id: List[int] = []
        out_hit: List[int] = []
        ids = batch[id_col].to_pylist()
        import pandas as pd

        for i, txt in zip(ids, batch[text_col].to_pylist()):
            toks = tokens(txt or "")
            if len(toks) < n or bhs.size == 0:
                continue
            th = pd.util.hash_array(np.asarray(toks, dtype=object), categorize=False)
            wh = ngram_window_hashes(th, n)
            pos = np.searchsorted(bhs, wh)
            pos[pos >= bhs.size] = 0
            if not (bhs[pos] == wh).any():
                continue  # vectorized clean fast path (the common case)
            # exact string verify, hit docs only
            n_hit = len(set(_ngram_strings(toks, n)) & bset)
            if n_hit:
                out_id.append(i)
                out_hit.append(n_hit)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "n_hit": pa.array(out_hit, pa.int64()),
            }
        )

    return corpus.map_batches(scan, batch_format="pyarrow")
