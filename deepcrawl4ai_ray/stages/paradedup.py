"""Paragraph-level exact dedup — first-occurrence-wins across the
corpus (the Dolma-style dedup granularity BETWEEN document dedup and
duplicate-span removal: `exact_dedup_*` drops whole repeated documents,
`c4filter.boilerplate_lines` drops lines by document-frequency
threshold; this keeps exactly ONE copy of every repeated paragraph,
the copy with the smallest (doc, position), and drops the rest).

Scale shape: documents reduce map-side to slim
(para_md5, packed(doc, idx)) rows — text never enters the dedup
shuffle.  One groupby over the hashes picks each paragraph's winner,
one groupby collects the per-doc keep-list, and a single bucketed hash
join carries the document text exactly once for the rebuild.  Empty
segments are structural, not content: they never dedup and are always
kept, so surrounding layout survives.

No reference analog (the reference dedups at the URL/stream-message
level only — job.py:471-484); this is the training-data extension the
LLM-pipeline family needs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

_IDX_BITS = 20  # packed = doc_id << 20 | idx → ≤ 2^20 paragraphs per doc


def paragraph_dedup(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> "ray.data.Dataset":
    """(id, text) → (id, text, n_paras, n_dropped) with every repeated
    non-empty paragraph kept only at its first (doc, position)
    occurrence.  Deterministic and split-invariant: the winner is a pure
    min over (id, idx), no RNG, no block-order dependence."""
    from .join import hash_join

    md5 = hashlib.md5

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_h: list = []
        out_packed: list = []
        for i, txt in zip(ids, batch[text_col].to_pylist()):
            segs = (txt or "").split(sep)
            if len(segs) > (1 << _IDX_BITS):
                raise ValueError(
                    f"doc {int(i)} has {len(segs)} segments > 2^{_IDX_BITS} "
                    "(packed-key bound)"
                )
            base = int(i) << _IDX_BITS
            for idx, s in enumerate(segs):
                if s:  # empty segments are structure — never deduped
                    out_h.append(md5(s.encode("utf-8")).hexdigest())
                    out_packed.append(base | idx)
        t = pa.table(
            {
                "ph": pa.array(out_h, pa.string()),
                "packed": pa.array(out_packed, pa.int64()),
            }
        )
        # block-local pre-min: a 10^6-copy boilerplate paragraph leaves
        # each block as ONE row before the shuffle
        agg = t.group_by("ph").aggregate([("packed", "min")])
        return pa.table({"ph": agg["ph"], "packed": agg["packed_min"]})

    ex = ds.map_batches(explode, batch_format="pyarrow")

    # winner per paragraph hash = min packed (≡ lexicographic min
    # (doc, idx)); two-level min so a 10^6-copy boilerplate paragraph
    # reduces inside blocks before the shuffle
    from .join import bucketed_min

    winners = bucketed_min(ex, ["ph"], "packed", "win")

    def split_packed(t: pa.Table) -> pa.Table:
        w = t["win"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(w >> _IDX_BITS, pa.int64()),
                "idx": pa.array(w & ((1 << _IDX_BITS) - 1), pa.int64()),
            }
        )

    def collect(t: pa.Table) -> pa.Table:
        # pyarrow group container: the kept_idx column must be a typed
        # list<int64> (a pandas object column would make the left join's
        # null padding guess the wrong Arrow type)
        idxs = np.sort(t["idx"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                id_col: pa.array([int(t[id_col][0].as_py())], pa.int64()),
                "kept_idx": pa.array([idxs.tolist()], pa.list_(pa.int64())),
            }
        )

    keep_lists = (
        winners.map_batches(split_packed, batch_format="pyarrow")
        .groupby(id_col)
        .map_groups(collect, batch_format="pyarrow")
    )

    joined = hash_join(ds, keep_lists, on=id_col, how="left")

    def rebuild(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch[text_col].to_pylist()
        kept_col = batch["kept_idx"].to_pylist()
        out_text: list = []
        out_np: list = []
        out_drop: list = []
        for txt, kept in zip(texts, kept_col):
            segs = (txt or "").split(sep)
            ks = set(kept) if kept is not None else set()
            out_segs = [s for j, s in enumerate(segs) if not s or j in ks]
            n_paras = sum(1 for s in segs if s)
            out_text.append(sep.join(out_segs))
            out_np.append(n_paras)
            out_drop.append(n_paras - len(ks))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                text_col: pa.array(out_text, pa.string()),
                "n_paras": pa.array(out_np, pa.int64()),
                "n_dropped": pa.array(out_drop, pa.int64()),
            }
        )

    return joined.map_batches(rebuild, batch_format="pyarrow")
