"""Fixed-size text chunk splitter — the reference's result-streaming
chunker (ref utils.py:345-358: serialized result → 4096-char slices
with ``chunk_index`` / ``total_chunks``) re-expressed as a columnar
flat transform.  In the reference the chunks feed a Redis stream; here
the same semantics become the training-data document chunker: long
documents split into fixed character windows (optionally overlapping),
each window a first-class row ready for tokenization/packing.

Scale shape: a single ``map_batches`` pass — no shuffle, no state.
Inside a batch the work is vectorized PER CHUNK INDEX, not per row:
for k = 0..max_chunks(batch) one ``pc.utf8_slice_codeunits`` kernel
(codepoint-based, matching Python slicing and SQL ``substring``)
slices every row at once and a numpy mask keeps rows with ≥ k+1
chunks, so the Python loop runs O(longest_doc / size) times per batch
regardless of row count.  Output rows are ~size chars each, so block
sizes stay bounded even when one input doc is enormous.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def chunk_text(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    size: int = 4096,
    overlap: int = 0,
) -> "ray.data.Dataset":
    """Dataset(id, chunk_index, total_chunks, chunk): each row's text
    split into windows of ``size`` codepoints starting every
    ``size - overlap`` codepoints (overlap=0 → the reference's exact
    disjoint 4096-char slices).  Empty/null text yields one empty
    chunk (total_chunks=1), mirroring the reference's "always at least
    one stream entry per result".  Chunk index is 0-based.
    """
    if size <= 0:
        raise ValueError("size must be positive")
    if not 0 <= overlap < size:
        raise ValueError("overlap must satisfy 0 <= overlap < size")
    stride = size - overlap

    def split(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(pc.cast(batch[text_col], pa.large_string()), "")
        ids = batch[id_col]
        lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
        # windows start at 0, stride, 2*stride, ... while start < len
        n_chunks = np.maximum(1, -(-np.maximum(lens - overlap, 0) // stride))
        out_ids = []
        out_idx = []
        out_tot = []
        out_chunks = []
        for k in range(int(n_chunks.max(initial=0))):
            mask = n_chunks > k
            if not mask.any():
                break
            sel = pa.array(mask)
            start = k * stride
            out_ids.append(ids.filter(sel))
            out_idx.append(np.full(int(mask.sum()), k, dtype=np.int64))
            out_tot.append(n_chunks[mask].astype(np.int64))
            out_chunks.append(
                pc.utf8_slice_codeunits(texts.filter(sel), start, start + size)
            )
        if not out_ids:
            return pa.table(
                {
                    id_col: pa.array([], ids.type),
                    "chunk_index": pa.array([], pa.int64()),
                    "total_chunks": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.large_string()),
                }
            )
        return pa.table(
            {
                id_col: pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_ids]
                ),
                "chunk_index": pa.array(np.concatenate(out_idx), pa.int64()),
                "total_chunks": pa.array(np.concatenate(out_tot), pa.int64()),
                "chunk": pa.concat_arrays(
                    [
                        c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                        for c in out_chunks
                    ]
                ),
            }
        )

    out = ds.map_batches(split, batch_format="pyarrow")
    from .join import _schema_types, _seed_empty

    tmap = _schema_types(ds)
    if tmap is None:
        return out
    # schema-pinned empty seed: an all-empty result keeps its schema
    return _seed_empty(
        out,
        [
            (id_col, tmap[id_col]),
            ("chunk_index", pa.int64()),
            ("total_chunks", pa.int64()),
            ("chunk", pa.large_string()),
        ],
    )
