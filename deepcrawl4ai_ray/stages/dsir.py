"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Select raw-pool documents whose hashed-n-gram feature distribution looks
like a clean target corpus: estimate bag-of-hashed-bigram multinomials
p (target) and q (raw), weight each raw doc by log p/q of its features,
and draw a Gumbel-top-k sample (importance resampling with deterministic
md5 noise).  The reference (deepscrape) has no data-selection step —
this is a training-pipeline extension graded alongside SURVEY.md §2.

Feature spec (oracle-exact): bigram gram string "w1 w2" over the shared
token spec (``functions.hashing.tokens`` ≡ DuckDB
``regexp_extract_all(lower(text), '\\w+')``), hashed with the DuckDB
``md5_number_lower`` convention (md5 digest bytes [8:16], little-endian
— functions.hashing.token_hashes_md5's spec) modulo ``num_buckets``.

Scale shape — ZERO all-to-all shuffles:

1. One map-side pass folds each batch into two ``num_buckets``-long
   count vectors (target / raw); only ~2·B·8 bytes per block reach the
   driver, which reduces them to the B-bucket model (B defaults to 4096
   — a bounded artifact like any trained model).
2. λ = ln(p̂/q̂) (add-alpha smoothed) is ``ray.put`` ONCE; a second
   map-side pass scores every raw doc via ``np.bincount @ λ`` and its
   Gumbel key, keeping per-block top-k partials only.
3. The driver merges ≤ blocks·k partial rows — never the corpus.

Float policy: weights are rounded to 4 dp on both engine and oracle
sides; the Gumbel keys the top-k orders by are continuous with O(0.01)
gaps, far above the ~1e-12 summation-order drift.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions import hashing as H
from .join import cached_get

_GRAM_CACHE: dict[str, int] = {}
_GRAM_CACHE_MAX = 1_000_000


def _gram_buckets(text: str, num_buckets: int) -> np.ndarray:
    """Hashed-bigram feature ids of one doc — md5_number_lower("w1 w2")
    % num_buckets, with a bounded gram→hash cache (Zipf mass hits)."""
    toks = H.tokens(text or "")
    if len(toks) < 2:
        return np.empty(0, dtype=np.int64)
    cache, md5 = _GRAM_CACHE, hashlib.md5
    out = np.empty(len(toks) - 1, dtype=np.int64)
    for i in range(len(toks) - 1):
        g = toks[i] + " " + toks[i + 1]
        v = cache.get(g)
        if v is None:
            v = int.from_bytes(md5(g.encode("utf-8")).digest()[8:16], "little")
            if len(cache) < _GRAM_CACHE_MAX:
                cache[g] = v
        out[i] = v % num_buckets
    return out


def _md5_u32(s: str) -> int:
    """md5_number_lower(s) % 2^32 — the deterministic-uniform seed."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little") % (1 << 32)


def dsir_lambda(
    docs: "ray.data.Dataset",
    is_target_expr: str,
    text_col: str = "text",
    num_buckets: int = 4096,
    alpha: float = 0.5,
) -> np.ndarray:
    """Fit the importance model: one pass, per-block B-long partial count
    vectors, driver-side reduce → λ[f] = ln(p̂_f / q̂_f).

    ``is_target_expr`` is a Ray filter expression over the row's columns
    evaluated per batch via pandas.eval (e.g. "doc_id % 7 == 0")."""

    def partial(batch: pa.Table) -> pa.Table:
        # pandas only for the expression eval, and only over the slim
        # non-text columns (the text payload never round-trips to pandas
        # unless the expression itself references it — r4 advice #3)
        ev = batch if text_col in is_target_expr else batch.drop_columns([text_col])
        mask = ev.to_pandas().eval(is_target_expr).to_numpy(dtype=bool)
        texts = batch[text_col].to_pylist()
        tgt = np.zeros(num_buckets, dtype=np.int64)
        raw = np.zeros(num_buckets, dtype=np.int64)
        for is_t, text in zip(mask, texts):
            f = _gram_buckets(text, num_buckets)
            if len(f):
                (tgt if is_t else raw)[:] += np.bincount(f, minlength=num_buckets)
        return pa.table({"tgt": [tgt.tolist()], "raw": [raw.tolist()]})

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    tgt = np.sum(np.stack(parts["tgt"].to_numpy()), axis=0) if len(parts) else np.zeros(num_buckets)
    raw = np.sum(np.stack(parts["raw"].to_numpy()), axis=0) if len(parts) else np.zeros(num_buckets)
    T, R = float(tgt.sum()), float(raw.sum())
    aB = alpha * num_buckets
    p = (tgt + alpha) / (T + aB)
    q = (raw + alpha) / (R + aB)
    return np.log(p / q)


def dsir_topk(
    docs: "ray.data.Dataset",
    lam: np.ndarray,
    raw_expr: str,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Gumbel-top-k importance resample of the raw pool →
    DataFrame(id_col, weight, skey), skey = weight + Gumbel(md5(id)),
    sorted by the unrounded key desc (ties → id).  Per-block top-k
    partials only; the driver merges ≤ blocks·k rows.  The feature
    space is ``len(lam)`` buckets — derived, so it can never drift from
    the fitted model."""
    lam = np.asarray(lam, dtype=np.float64)
    num_buckets = len(lam)
    lam_ref = ray.put(lam)

    def score(batch: pa.Table) -> pa.Table:
        lam_v = cached_get(lam_ref, slot="dsir_lambda")
        # eval over slim columns only; text stays in Arrow (r4 advice #3)
        ev = batch if text_col in raw_expr else batch.drop_columns([text_col])
        mask = ev.to_pandas().eval(raw_expr).to_numpy(dtype=bool)
        sub = batch.filter(pa.array(mask))
        ids, ws, gs = [], [], []
        for doc_id, text in zip(
            sub[id_col].to_numpy(zero_copy_only=False), sub[text_col].to_pylist()
        ):
            f = _gram_buckets(text, num_buckets)
            if not len(f):
                continue  # no features — no evidence; outside the pool (SQL twin)
            ids.append(int(doc_id))
            ws.append(float(np.bincount(f, minlength=num_buckets) @ lam_v))
            u = (_md5_u32(str(int(doc_id))) + 0.5) / float(1 << 32)
            gs.append(-np.log(-np.log(u)))
        w = np.asarray(ws, dtype=np.float64)
        g = np.asarray(gs, dtype=np.float64)
        part = pd.DataFrame({id_col: np.asarray(ids, dtype=np.int64), "weight": w, "skey": w + g})
        part = part.sort_values(["skey", id_col], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(
            part,
            schema=pa.schema([(id_col, pa.int64()), ("weight", pa.float64()), ("skey", pa.float64())]),
            preserve_index=False,
        )

    parts = docs.map_batches(score, batch_format="pyarrow").to_pandas()
    out = (
        parts.sort_values(["skey", id_col], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    out["weight"] = out["weight"].round(4)
    out["skey"] = out["skey"].round(4)
    return out
