"""Similarity search over an embedding column.

- brute-force cosine top-k: per-batch numpy matmul against a broadcast
  query matrix (ray.put once, read in every task) + per-batch partial
  top-k → tiny final merge on the driver.  The exact baseline.
- IVF top-k: deterministic k-means-ish coarse quantizer (seeded init,
  few Lloyd iterations on a sample), assign each vector to its nearest
  centroid inside map_batches, probe only the ``nprobe`` nearest lists
  at query time — the scale path (candidates shrink ~nlist/nprobe×).
"""

from __future__ import annotations



import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _to_matrix(col) -> np.ndarray:
    """Arrow list<float> column → (n, d) ndarray via the flat values
    buffer (zero-copy when the list is contiguous; no python round-trip)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type) or pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        arr = col
        if arr.offset or (hasattr(arr, "offsets") and len(arr) and arr.offsets[0].as_py() != 0):
            arr = pa.concat_arrays([arr])  # re-root sliced arrays
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        n = len(arr)
        return flat.reshape(n, -1) if n else flat.reshape(0, 0)
    return np.asarray(col.to_pylist(), dtype=np.float64)


def _topk_idx(sims: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (round(sim,4) desc, id asc) — the exact
    comparator of the final merge and the SQL oracle."""
    r = np.round(sims, 4)
    order = np.lexsort((ids, -r))
    return order[:k]


def brute_force_topk(
    ds: "ray.data.Dataset",
    id_col: str,
    vec_col: str,
    query: np.ndarray,
    k: int = 10,
    exclude_id: int | None = None,
) -> pd.DataFrame:
    """Exact cosine top-k: (id, cos_sim) desc, ties by id asc."""
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        V = _to_matrix(batch[vec_col])
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        sims = V @ qv
        if exclude_id is not None:
            sims[ids == exclude_id] = -np.inf
        # batch-local selection must use the SAME comparator as the final
        # merge (cos_sim rounded 4dp desc, id asc) or a 4dp tie straddling
        # the k-boundary could keep the wrong id (ADVICE r1)
        idx = _topk_idx(sims, ids, min(k, len(ids)))
        return pa.table(
            {
                id_col: pa.array(ids[idx], pa.int64()),
                "cos_sim": pa.array(sims[idx], pa.float64()),
            }
        )

    parts = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    parts["cos_sim"] = parts["cos_sim"].round(4)  # oracle-stable ordering
    parts = parts.sort_values(["cos_sim", id_col], ascending=[False, True], kind="mergesort")
    return parts.head(k).reset_index(drop=True)


def train_ivf_centroids(sample: np.ndarray, nlist: int = 16, iters: int = 5) -> np.ndarray:
    """Deterministic coarse quantizer: strided init + few Lloyd steps."""
    X = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    stride = max(1, len(X) // nlist)
    C = X[::stride][:nlist].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C


def ivf_topk(
    ds: "ray.data.Dataset",
    id_col: str,
    vec_col: str,
    query: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    exclude_id: int | None = None,
) -> pd.DataFrame:
    """Approximate top-k: only vectors whose nearest centroid is among
    the query's ``nprobe`` closest lists are scored."""
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probe = set(np.argsort(-(centroids @ q))[:nprobe].tolist())
    ctx_ref = ray.put((q, centroids, probe))

    def partial(batch: pa.Table) -> pa.Table:
        qv, C, probe_set = ray.get(ctx_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        V = _to_matrix(batch[vec_col])
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(V @ C.T, axis=1)
        m = np.isin(assign, list(probe_set))
        if exclude_id is not None:
            m &= ids != exclude_id
        ids, V = ids[m], V[m]
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()), "cos_sim": pa.array([], pa.float64())})
        sims = V @ qv
        idx = _topk_idx(sims, ids, min(k, len(ids)))
        return pa.table(
            {
                id_col: pa.array(ids[idx], pa.int64()),
                "cos_sim": pa.array(sims[idx], pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts["cos_sim"] = parts["cos_sim"].round(4)
    parts = parts.sort_values(["cos_sim", id_col], ascending=[False, True], kind="mergesort")
    return parts.head(k).reset_index(drop=True)


def build_ivf_index(
    ds: "ray.data.Dataset",
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    out_dir: str,
) -> str:
    """Persist the inverted file: assign each vector to its nearest
    centroid inside map_batches and write Parquet PARTITIONED BY
    ``ivf_list`` — queries then read ONLY the probed partitions (hive
    partition pruning at the parquet read) instead of re-assigning every
    vector per query.  This is the ANN build/query split a 100 TB
    embedding store needs: build once (one pass), query touches
    ~nprobe/nlist of the data."""
    _ivf_assign_write(ds, id_col, vec_col, centroids, out_dir)
    # persist the quantizer with the lists: the index is self-contained —
    # append and query can load the EXACT centroids the build assigned
    # with (re-deriving them risks a mismatched assignment)
    import os

    pa.parquet.write_table(
        pa.table({"centroid": [list(map(float, c)) for c in centroids]}),
        os.path.join(out_dir, "centroids.parquet"),
    )
    return out_dir


def _ivf_assign_write(ds, id_col: str, vec_col: str, centroids: np.ndarray, out_dir: str) -> None:
    c_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        V = _to_matrix(batch[vec_col])
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        lists = np.argmax(V @ C.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(lists))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(out_dir, partition_cols=["ivf_list"])


def load_ivf_centroids(index_dir: str) -> np.ndarray:
    """The quantizer persisted by build_ivf_index."""
    import os

    path = os.path.join(index_dir, "centroids.parquet")
    if not os.path.exists(path):
        raise ValueError(f"{index_dir!r} is not a built IVF index (no centroids.parquet)")
    t = pa.parquet.read_table(path)
    return np.asarray(t["centroid"].to_pylist(), dtype=np.float64)


def append_ivf_index(
    index_dir: str,
    ds: "ray.data.Dataset",
    id_col: str,
    vec_col: str,
) -> str:
    """Incremental ANN index update — the faiss add-after-train model:
    new vectors (a recrawl's fresh embeddings) are assigned to the
    EXISTING lists with the centroids persisted at build time and land
    as additional parquet files inside the same ivf_list partitions, so
    queries prune and score them identically to a full rebuild with the
    same quantizer (pytest-pinned equivalence).  Centroids are frozen by
    design; if the embedding distribution shifts enough that frozen
    lists skew, retrain + rebuild — same trade as faiss IndexIVF.add."""
    _ivf_assign_write(ds, id_col, vec_col, load_ivf_centroids(index_dir), index_dir)
    return index_dir


def ivf_topk_indexed(
    index_dir: str,
    id_col: str,
    vec_col: str,
    query: np.ndarray,
    centroids: np.ndarray | None = None,
    k: int = 10,
    nprobe: int = 4,
    exclude_id: int | None = None,
) -> pd.DataFrame:
    """Approximate top-k over a persisted IVF index: the parquet read is
    pruned to the ``nprobe`` probed list partitions; scoring reuses the
    brute-force partial-top-k plan over that small slice.  With
    ``centroids=None`` the quantizer persisted at build time is loaded
    from the index (the self-contained path append_ivf_index relies on)."""
    import os

    import ray.data as rd

    if centroids is None:
        centroids = load_ivf_centroids(index_dir)
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probe = [int(x) for x in np.argsort(-(centroids @ q))[:nprobe]]
    # explicit partition pruning: only the probed hive directories are
    # ever listed/read — ~nprobe/nlist of the index leaves storage
    import glob

    paths = [
        f
        for l in probe
        for f in sorted(glob.glob(os.path.join(index_dir, f"ivf_list={l}", "*.parquet")))
    ]
    if not paths:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"), "cos_sim": pd.Series(dtype="float64")})
    ds = rd.read_parquet(paths, columns=[id_col, vec_col])
    return brute_force_topk(ds, id_col, vec_col, q, k=k, exclude_id=exclude_id)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — memory-compressed ANN (Jégou, Douze &
# Schmid 2011, "Product quantization for nearest neighbor search").
#
# The 100-TB memory story: the scan index holds m BYTES per vector
# (m=8 → 64× smaller than float64 d=64), scanned via an asymmetric-
# distance LUT (m × k dot products per query, one table lookup + add per
# vector·subspace); survivors are re-ranked EXACTLY against the full-
# precision column, so output values are float64-exact and, with
# refine ≫ k, the id set matches the exact brute force deterministically
# (codebooks are seeded — no RNG at query time).
# ---------------------------------------------------------------------------


def train_pq(sample: np.ndarray, m: int = 8, k: int = 64, iters: int = 5) -> np.ndarray:
    """Per-subspace k-means codebooks → (m, k, d/m) float64.
    Deterministic: strided init + Lloyd steps (same discipline as
    train_ivf_centroids).  Vectors are L2-normalized first so the ADC
    dot decomposes additively over subspaces (cosine ≈ Σ_j q_j·c_j)."""
    if k > 256:
        raise ValueError(f"k={k} > 256: PQ codes are uint8 (argmin would silently wrap)")
    X = sample.astype(np.float64, copy=False)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = np.empty((m, k, sub), np.float64)
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        stride = max(1, len(S) // k)
        C = S[::stride][:k].copy()
        kk = len(C)
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(kk):
                msk = assign == c
                if msk.any():
                    C[c] = S[msk].mean(0)
        books[j, :kk] = C
        if kk < k:
            books[j, kk:] = C[kk - 1]  # pad unused codes (never argmin-preferred)
    return books


def pq_encode(ds: "ray.data.Dataset", id_col: str, vec_col: str, codebooks: np.ndarray) -> "ray.data.Dataset":
    """→ Dataset(id, pq_code: binary[m]) — the compressed scan index
    (write_parquet it for a persisted index; m bytes per vector)."""
    m, k, sub = codebooks.shape
    if k > 256:
        raise ValueError(f"codebooks have k={k} > 256 centroids: uint8 codes would wrap")
    books_ref = ray.put(codebooks)

    def enc(batch: pa.Table) -> pa.Table:
        B = ray.get(books_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        V = _to_matrix(batch[vec_col]).astype(np.float64, copy=False)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        n = len(ids)
        codes = np.empty((n, m), np.uint8)
        for j in range(m):
            S = V[:, j * sub : (j + 1) * sub]
            d2 = ((S[:, None, :] - B[j][None, :, :]) ** 2).sum(-1)
            codes[:, j] = d2.argmin(1)
        return pa.table(
            {
                id_col: pa.array(ids),
                "pq_code": pa.array([codes[i].tobytes() for i in range(n)], pa.binary()),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def pq_topk(
    codes_ds: "ray.data.Dataset",
    full_ds: "ray.data.Dataset",
    id_col: str,
    vec_col: str,
    query: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    refine: int = 256,
    exclude_id: int | None = None,
) -> pd.DataFrame:
    """ADC scan over PQ codes → top-``refine`` candidates → exact
    float64 re-rank via a broadcast id filter + brute_force_topk.
    Output VALUES are exact (float64 cos_sim over the full-precision
    column); the id SET is approximate — recall depends on refine vs N
    and on how well 8-byte ADC separates neighbors on the data.  On
    near-random embeddings with weak neighbors the ADC ordering is
    loose, so refine=256 does NOT guarantee the exact top-k beyond
    N≈refine (measured: the true 10th neighbor can rank >600/2000 by
    ADC).  Guaranteed-exact only when refine ≥ N (prescreen keeps all
    ids, tested); for larger N treat this like IVF: approximate by
    design, validated by recall tests — not by an exact oracle."""
    from .join import broadcast_filter

    m, kcodes, sub = codebooks.shape
    q = np.asarray(query, np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    # LUT[j, c] = q_j · codebook[j][c] — the whole query-side math
    lut = np.stack([codebooks[j] @ q[j * sub : (j + 1) * sub] for j in range(m)])
    ctx_ref = ray.put(lut)

    def scan(batch: pa.Table) -> pa.Table:
        L = ray.get(ctx_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        codes = np.frombuffer(b"".join(batch["pq_code"].to_pylist()), dtype=np.uint8).reshape(n, m)
        scores = L[np.arange(m)[None, :], codes].sum(axis=1)
        if exclude_id is not None:
            scores[ids == exclude_id] = -np.inf
        # UNROUNDED prescreen: ADC score gaps are dense (< 1e-4 apart);
        # _topk_idx's 4dp comparator belongs to the oracle-facing merge,
        # not here — rounding would cut the refine boundary by id order.
        order = np.lexsort((ids, -scores))
        idx = order[: min(refine, n)]
        return pa.table(
            {id_col: pa.array(ids[idx]), "adc": pa.array(scores[idx], pa.float64())}
        )

    parts = codes_ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["adc", id_col], ascending=[False, True], kind="mergesort")
    cand = sorted(int(x) for x in parts.head(refine)[id_col])
    filtered = broadcast_filter(full_ds, id_col, ray.put(cand), keep_in=True)
    return brute_force_topk(filtered, id_col, vec_col, query, k=k, exclude_id=exclude_id)


def knn_join(
    base: "ray.data.Dataset",
    queries: "ray.data.Dataset",
    id_col: str,
    qid_col: str,
    vec_col: str,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 2,
    round_sims: int = 4,
) -> "ray.data.Dataset":
    """ANN kNN-JOIN: for EVERY query row, the top-k base rows by cosine —
    the batched form of ivf_topk for when the query side is itself a
    dataset (retrieval decontamination, cluster-rep lookup, embedding
    self-join), where a per-query broadcast loop would be O(|Q|) driver
    round-trips.

    Plan (both sides shuffle ONCE, by cluster): base rows are assigned
    to their nearest centroid; query rows are REPLICATED to their
    ``nprobe`` nearest centroid groups; one groupby(cluster) co-locates
    them and each group computes its queries x members cosine block and
    keeps per-query partial top-k; a second slim groupby(qid) merges the
    ≤ nprobe*k partials per query.  Only (id, vector) rows move — at
    corpus scale the payload stays behind and joins back on id.

    Determinism contract (shared with ivf_topk / the SQL twin):
    assignment and probe ranking use ROUND(cos, 4) with ties -> smaller
    cluster; the top-k comparator is (ROUND(cos, 4) DESC, id ASC).
    Candidates are unique per (qid, id) because each base row lives in
    exactly one cluster group."""
    from .join import _seed_empty, shuffle_coalesce
    from .semdedup import _cos_sims, _vec_column

    C = np.asarray(centroids, dtype=np.float64)
    c_ref = ray.put(C)

    def tag_base(batch: pa.Table) -> pa.Table:
        cents = ray.get(c_ref)
        X = _to_matrix(batch[vec_col])
        a = (
            np.argmax(np.round(_cos_sims(X, cents), round_sims), axis=1)
            if len(X)
            else np.array([], dtype=np.int64)
        )
        return pa.table(
            {
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "rid": pa.array(
                    batch[id_col].to_numpy(zero_copy_only=False), pa.int64()
                ),
                "qid": pa.array(np.full(len(X), -1, np.int64), pa.int64()),
                "v": _vec_column(X, C.shape[1] if not len(X) else X.shape[1]),
            }
        )

    def tag_query(batch: pa.Table) -> pa.Table:
        cents = ray.get(c_ref)
        X = _to_matrix(batch[vec_col])
        qids = batch[qid_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(X):
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    "rid": pa.array([], pa.int64()),
                    "qid": pa.array([], pa.int64()),
                    "v": _vec_column(np.zeros((0, C.shape[1])), C.shape[1]),
                }
            )
        sims = np.round(_cos_sims(X, cents), round_sims)
        # top-nprobe clusters per query: ROUND(cos,4) desc, cluster asc
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        rep = np.repeat(np.arange(len(X)), order.shape[1])
        return pa.table(
            {
                "cluster": pa.array(order.reshape(-1).astype(np.int64), pa.int64()),
                "rid": pa.array(np.full(len(rep), -1, np.int64), pa.int64()),
                "qid": pa.array(qids[rep], pa.int64()),
                "v": _vec_column(X[rep], X.shape[1]),
            }
        )

    out_schema = [(qid_col, pa.int64()), (id_col, pa.int64()), ("cos_sim", pa.float64())]

    def group_topk(t: pa.Table) -> pa.Table:
        qmask = t["qid"].to_numpy(zero_copy_only=False) != -1
        if not qmask.any() or qmask.all():
            return pa.schema(out_schema).empty_table()
        V = _to_matrix(t["v"])
        Q, B = V[qmask], V[~qmask]
        qids = t["qid"].to_numpy(zero_copy_only=False)[qmask]
        rids = t["rid"].to_numpy(zero_copy_only=False)[~qmask]
        sims = np.round(_cos_sims(Q, B), round_sims)
        kk = min(k, len(rids))
        rows_q, rows_r, rows_s = [], [], []
        for i in range(len(qids)):
            idx = _topk_idx(sims[i], rids, kk)
            rows_q.append(np.full(len(idx), qids[i]))
            rows_r.append(rids[idx])
            rows_s.append(sims[i][idx])
        return pa.table(
            {
                qid_col: pa.array(np.concatenate(rows_q), pa.int64()),
                id_col: pa.array(np.concatenate(rows_r), pa.int64()),
                "cos_sim": pa.array(np.concatenate(rows_s), pa.float64()),
            }
        )

    def merge_topk(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = t["cos_sim"].to_numpy(zero_copy_only=False)
        idx = _topk_idx(sims, ids, min(k, len(ids)))
        return pa.table(
            {
                qid_col: t[qid_col].take(pa.array(idx)),
                id_col: pa.array(ids[idx], pa.int64()),
                "cos_sim": pa.array(sims[idx], pa.float64()),
            }
        )

    tagged = base.map_batches(tag_base, batch_format="pyarrow").union(
        queries.map_batches(tag_query, batch_format="pyarrow")
    )
    cand = (
        shuffle_coalesce(tagged)
        .groupby("cluster")
        .map_groups(group_topk, batch_format="pyarrow")
    )
    cand = _seed_empty(cand, out_schema)
    out = cand.groupby(qid_col).map_groups(merge_topk, batch_format="pyarrow")
    return _seed_empty(out, out_schema)
