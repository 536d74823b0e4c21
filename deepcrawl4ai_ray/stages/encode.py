"""Vocabulary-mapped token encoding — text → token-id sequences, the
step between cleaning/dedup and `pack_sequences` in a training-data
export (the packer counts tokens; a trainer consumes ids).  The
reference stops at markdown (tasks.py); this completes the text
family's export path.

Two operators:

- :func:`build_vocab` — the exact corpus-wide top-N tokens become ids
  0..N-1 in (count desc, token asc) order.  Built on
  ``textsearch.exact_top_tokens`` (per-batch Misra-Gries summaries →
  bounded groupby → exact recount of provable candidates), so the token
  stream never shuffles and the driver holds only N rows.
- :func:`encode_tokens` — one broadcast of the N-token vocabulary
  (``ray.put`` once, per-worker cached ``pd.Index`` whose hash table
  builds once per worker); per batch, ALL documents' tokens flatten
  into one object array and ONE vectorized ``get_indexer`` call maps
  them (OOV → ``oov_id``), then a ListArray re-wraps per-doc id
  sequences — no per-token Python in the mapping.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_TOKEN_RE = re.compile(r"\w+")


def build_vocab(
    ds: "ray.data.Dataset", text_col: str, size: int, m: int | None = None
) -> pd.DataFrame:
    """→ DataFrame(tok, id) of the EXACT corpus top-``size`` tokens,
    ids assigned in (count desc, token asc) order — the deterministic
    tie-break a SQL oracle reproduces with ORDER BY + LIMIT."""
    from .textsearch import exact_top_tokens

    top = exact_top_tokens(ds, text_col, k=size, m=m or max(1024, 16 * size)).to_pandas()
    return pd.DataFrame({"tok": top["tok"], "id": np.arange(len(top), dtype=np.int32)})


def encode_tokens(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    vocab: pd.DataFrame,
    oov_id: int = -1,
) -> "ray.data.Dataset":
    """→ Dataset(id, ids: list<int32>, n_tokens, n_oov) for every doc
    with ≥1 token (zero-token docs encode to nothing, matching the
    packer's empty-doc rule).  ``vocab`` is a (tok, id) frame from
    :func:`build_vocab`; ids follow token order in the document."""
    from .join import _schema_types, _seed_empty, cached_get

    # ship (token array aligned to id ORDER) once; workers build the
    # pd.Index (and its lazy hash table) once per process
    aligned = vocab.sort_values("id")["tok"].to_numpy(dtype=object)
    vocab_ref = ray.put(aligned)

    def enc(batch: pa.Table) -> pa.Table:
        idx_arr = cached_get(vocab_ref, "encode.vocab")
        index = pd.Index(idx_arr)
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
        toks_list = [_TOKEN_RE.findall((t or "").lower()) for t in batch[text_col].to_pylist()]
        counts = np.fromiter((len(t) for t in toks_list), dtype=np.int64, count=len(toks_list))
        keep = counts > 0
        doc_ids, counts = doc_ids[keep], counts[keep]
        kept_toks = [t for t, k in zip(toks_list, keep) if k]
        if not kept_toks:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "ids": pa.array([], pa.list_(pa.int32())),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_oov": pa.array([], pa.int64()),
                }
            )
        flat = np.concatenate([np.asarray(t, dtype=object) for t in kept_toks])
        ids = index.get_indexer(flat).astype(np.int32)  # ONE vectorized lookup
        oov = ids < 0
        if oov_id != -1:
            ids = np.where(oov, np.int32(oov_id), ids)
        offsets = np.zeros(len(counts) + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        n_oov = np.add.reduceat(oov.astype(np.int64), offsets[:-1])
        return pa.table(
            {
                id_col: pa.array(doc_ids.astype(np.int64), pa.int64()),
                "ids": pa.ListArray.from_arrays(pa.array(offsets), pa.array(ids, pa.int32())),
                "n_tokens": pa.array(counts, pa.int64()),
                "n_oov": pa.array(n_oov, pa.int64()),
            }
        )

    out = ds.map_batches(enc, batch_format="pyarrow")
    tmap = _schema_types(ds)
    if tmap is None:
        return out
    return _seed_empty(
        out,
        [
            (id_col, pa.int64()),
            ("ids", pa.list_(pa.int32())),
            ("n_tokens", pa.int64()),
            ("n_oov", pa.int64()),
        ],
    )
