"""Distributed BPE tokenizer training (Sennrich et al. 2016) and
encoding.

The reference ships markdown per URL (deepscrape tasks.py:381-383); a
pretraining pipeline then needs a TOKENIZER learned from the cleaned
corpus.  This is the fastBPE/HF-tokenizers plan re-expressed on Ray
Data:

1. **Word-frequency table** (the only corpus-scale pass): tokenize every
   doc with the oracle-exact word spec (``functions.hashing.tokens`` ≡
   DuckDB ``regexp_extract_all(lower(text), '\\w+')``) and bucketed-sum
   to a (word, n) Dataset.  100 TB of text contracts to a ~1e6-row
   vocabulary here; everything after runs on that table.
2. **Merge loop** (``learn_bpe``): the vocabulary stays a DATASET — each
   round is  map_batches pair-count partials → one small bucketed sum →
   per-block top-1 partials → driver argmax over ≤ blocks rows → the
   winning pair broadcast back and applied map-side.  The driver never
   holds the vocabulary or the pair table, only one (pair, count) row
   per round — the same partial/combiner discipline as stages/agg.py.
   Tie-break: highest count, then lexicographically smallest (left,
   right) pair — deterministic across block layouts, mirrored by the
   reference implementation the tests pin against.
3. **Encoding** (``bpe_encode_batch`` / ``BpeEncoder``): merges are a
   bounded artifact, ``ray.put`` once and rank-indexed per worker; each
   batch encodes its UNIQUE words once (np.unique memoization) and
   reassembles per-doc token lists by inverse index.

Words carry an end-of-word sentinel ``</w>`` as the final symbol, the
original Sennrich convention, so merges distinguish suffixes from
prefixes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions import hashing as H
from .join import _seed_empty, bucketed_sum, cached_get, shuffle_coalesce

_EOW = "</w>"


def word_counts(
    docs: "ray.data.Dataset", text_col: str = "text", num_buckets: int = 64
) -> "ray.data.Dataset":
    """Dataset(word, n) — the corpus-scale contraction.  One explode
    pass emits slim (word) rows with per-block pre-aggregation, then one
    bucketed sum; text payloads never shuffle."""

    def explode(batch: pa.Table) -> pa.Table:
        words: list = []
        ns: list = []
        local: dict = {}
        for t in batch[text_col].to_pylist():
            for w in H.tokens(t):
                local[w] = local.get(w, 0) + 1
        words = list(local.keys())
        ns = [local[w] for w in words]
        return pa.table(
            {"word": pa.array(words, pa.string()), "n": pa.array(ns, pa.int64())}
        )

    slim = docs.map_batches(explode, batch_format="pyarrow")
    return bucketed_sum(slim, ["word"], "n", "n", num_buckets=num_buckets)


def _split_word(w: str) -> list:
    return list(w) + [_EOW]


def _merge_symbols(syms: list, left: str, right: str, joined: str) -> list:
    """Replace non-overlapping left-to-right occurrences of (left,
    right) — the canonical merge step."""
    out: list = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_bpe(
    words: "ray.data.Dataset",
    num_merges: int,
    word_col: str = "word",
    count_col: str = "n",
    num_buckets: int = 16,
    min_count: int = 1,
) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges from a (word, n) Dataset →
    DataFrame(rank, left, right) in merge order.

    Each round the vocabulary Dataset maps to (pair, count) partials,
    one bucketed sum reduces them, a per-block top-1 pass shrinks the
    argmax to ≤ blocks rows, and the winning pair is broadcast into the
    next round's map-side merge.  Rounds stop early when no pair reaches
    ``min_count``."""
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")

    def to_syms(batch: pa.Table) -> pa.Table:
        ws = batch[word_col].to_pylist()
        return pa.table(
            {
                "syms": pa.array([_split_word(w) for w in ws], pa.list_(pa.string())),
                "n": pa.array(
                    batch[count_col].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    state = words.map_batches(to_syms, batch_format="pyarrow").materialize()
    merges: list = []

    for rank in range(num_merges):

        def pair_partials(batch: pa.Table) -> pa.Table:
            local: dict = {}
            ns = batch["n"].to_numpy(zero_copy_only=False)
            for syms, n in zip(batch["syms"].to_pylist(), ns):
                n = int(n)
                for a, b in zip(syms, syms[1:]):
                    k = (a, b)
                    local[k] = local.get(k, 0) + n
            ls = [k[0] for k in local]
            rs = [k[1] for k in local]
            return pa.table(
                {
                    "left": pa.array(ls, pa.string()),
                    "right": pa.array(rs, pa.string()),
                    "cnt": pa.array([local[k] for k in local], pa.int64()),
                }
            )

        pairs = bucketed_sum(
            state.map_batches(pair_partials, batch_format="pyarrow"),
            ["left", "right"],
            "cnt",
            "cnt",
            num_buckets=num_buckets,
        )

        def block_top1(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return batch
            df = batch.to_pandas()
            # highest count, then smallest (left, right)
            df = df.sort_values(
                ["cnt", "left", "right"], ascending=[False, True, True]
            )
            return pa.Table.from_pandas(df.head(1), preserve_index=False)

        top = pairs.map_batches(block_top1, batch_format="pyarrow").take_all()
        if not top:
            break
        best = min(top, key=lambda r: (-int(r["cnt"]), r["left"], r["right"]))
        if int(best["cnt"]) < max(min_count, 1):
            break
        left, right = str(best["left"]), str(best["right"])
        joined = left + right
        merges.append((rank, left, right))
        pair_ref = ray.put((left, right, joined))

        def apply_merge(batch: pa.Table) -> pa.Table:
            l, r, j = cached_get(pair_ref, slot="bpe_merge_pair")
            out = [
                _merge_symbols(s, l, r, j) if (l in s and r in s) else s
                for s in batch["syms"].to_pylist()
            ]
            return pa.table(
                {"syms": pa.array(out, pa.list_(pa.string())), "n": batch["n"]}
            )

        state = state.map_batches(apply_merge, batch_format="pyarrow").materialize()

    return pd.DataFrame(
        {
            "rank": pd.Series([m[0] for m in merges], dtype="int64"),
            "left": [m[1] for m in merges],
            "right": [m[2] for m in merges],
        }
    )


def _encode_word(w: str, ranks: dict) -> tuple:
    """Apply merges in rank order to one word — the canonical greedy
    lowest-rank-first encoder."""
    syms = _split_word(w)
    while len(syms) > 1:
        best_rank: Optional[int] = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms = (
            syms[:best_i]
            + [syms[best_i] + syms[best_i + 1]]
            + syms[best_i + 2 :]
        )
    return tuple(syms)


def bpe_encode(
    docs: "ray.data.Dataset",
    merges: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Dataset(id_col, pieces: list<string>, n_pieces) — encode each doc
    with the learned merges.  Merges are ray.put once; each batch
    encodes only its UNIQUE words (np.unique memoization) and scatters
    back by inverse index."""
    ranks = {
        (l, r): int(k)
        for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    ranks_ref = ray.put(ranks)

    def encode(batch: pa.Table) -> pa.Table:
        rk = cached_get(ranks_ref, slot="bpe_ranks")
        texts = batch[text_col].to_pylist()
        toks = [H.tokens(t) for t in texts]
        flat = np.array(
            [w for ws in toks for w in ws] or [""], dtype=object
        )
        uniq, inv = np.unique(flat, return_inverse=True)
        enc = [list(_encode_word(w, rk)) for w in uniq]
        pieces: list = []
        n_pieces: list = []
        pos = 0
        for ws in toks:
            ps: list = []
            for _ in ws:
                ps.extend(enc[inv[pos]])
                pos += 1
            pieces.append(ps)
            n_pieces.append(len(ps))
        return pa.table(
            {
                id_col: batch[id_col],
                "pieces": pa.array(pieces, pa.list_(pa.string())),
                "n_pieces": pa.array(n_pieces, pa.int64()),
            }
        )

    in_sch = docs.schema()
    from .ngramlm import _arrow_type

    tmap = dict(zip(in_sch.names, [_arrow_type(t) for t in in_sch.types]))
    return _seed_empty(
        docs.map_batches(encode, batch_format="pyarrow"),
        [
            (id_col, tmap.get(id_col, pa.int64())),
            ("pieces", pa.list_(pa.string())),
            ("n_pieces", pa.int64()),
        ],
    )
