"""Sequence packing — map each document onto the fixed-length token
sequences an LLM trainer consumes: documents are concatenated in doc-id
order into one token stream, and sequence ``s`` owns tokens
``[s*L, (s+1)*L)``.  The operator reports, per document, its exclusive
token offset in the stream and the first/last sequence it lands in.
The reference has no training-side machinery (its pipeline stops at
markdown, tasks.py); this extends the text family with the packing step
every pretraining data pipeline needs.

The hard part at scale is the global EXCLUSIVE PREFIX SUM of token
counts in doc-id order — Ray Data has no scan primitive, so it is built
as the classic two-phase distributed scan:

1. one streaming pass computes per-document token counts and each
   document's contiguous id-range bucket (``doc_id // range_width``);
   a tiny grouped partial-sum (K rows, K = num_ranges) leaves the
   cluster,
2. the driver prefix-sums the K range totals (O(K) work — never the
   documents) and broadcasts the offsets via ``ray.put``,
3. a ``groupby(range).map_groups`` pass sorts WITHIN each contiguous
   range (local, no cross-range data movement) and adds the broadcast
   range offset to the in-range cumulative sum.

So the only all-to-all is the slim (doc_id, n_tokens) table — never the
text — and driver state is O(num_ranges).  Token counting uses the same
``\\w+`` tokenizer as the rest of the text family, so a SQL window
``SUM() OVER (ORDER BY doc_id)`` reproduces the offsets exactly.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import tokens


def pack_sequences(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    seq_len: int,
    num_ranges: int = 64,
    max_id: Optional[int] = None,
) -> "ray.data.Dataset":
    """Dataset(id, n_tokens, tok_start, seq_first, seq_last) for every
    document with ≥1 token, where tok_start is the document's exclusive
    prefix token offset in doc-id order and seq_first/seq_last are the
    first/last ``seq_len``-token sequences the document overlaps.

    ``max_id`` skips the max-aggregate pass when the caller knows the id
    ceiling (e.g. from table metadata)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")

    if max_id is None:
        max_id = ds.max(id_col)
    if max_id is None:  # empty input: schema-pinned empty result
        return ray.data.from_arrow(
            pa.schema(
                [
                    (id_col, pa.int64()),
                    ("n_tokens", pa.int64()),
                    ("tok_start", pa.int64()),
                    ("seq_first", pa.int64()),
                    ("seq_last", pa.int64()),
                ]
            ).empty_table()
        )
    range_width = max(1, (int(max_id) + num_ranges) // num_ranges)

    def count_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.array(
            [len(tokens(t or "")) for t in batch[text_col].to_pylist()], dtype=np.int64
        )
        keep = n > 0  # empty docs occupy no tokens and no sequence
        ids, n = ids[keep], n[keep]
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "rng": pa.array(ids // range_width, pa.int64()),
            }
        )

    # the slim (id, n_tokens, rng) table inherits the TEXT input's block
    # count — hundreds of tiny blocks whose two downstream all-to-alls
    # (Sum groupby + 64-group map_groups) would each emit thousands of
    # sub-inline-threshold partition objects into the driver's
    # in-process store (sf1 proof: +700 MB driver anon during pack);
    # coalesce once for both
    from .join import shuffle_coalesce

    counts = shuffle_coalesce(ds.map_batches(count_batch, batch_format="pyarrow"))

    # K-row partial sums → driver-side exclusive prefix (O(K), tiny)
    from ray.data.aggregate import Sum

    totals = counts.groupby("rng").aggregate(Sum("n_tokens", alias_name="tot")).take_all()
    totals.sort(key=lambda r: r["rng"])
    offsets: dict = {}
    acc = 0
    for r in totals:
        offsets[int(r["rng"])] = acc
        acc += int(r["tot"])
    off_ref = ray.put(offsets)

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)[int(group["rng"].iloc[0])]
        g = group.sort_values(id_col, kind="mergesort")
        start = off + g["n_tokens"].cumsum().shift(fill_value=0).to_numpy(dtype=np.int64)
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(dtype=np.int64),
                "n_tokens": n,
                "tok_start": start,
                "seq_first": start // seq_len,
                "seq_last": (start + n - 1) // seq_len,
            }
        )

    return counts.groupby("rng").map_groups(assign)
