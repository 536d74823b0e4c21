"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540): k-means-cluster the embedding space, then drop every
document whose cosine similarity to a smaller-id document IN THE SAME
CLUSTER clears a threshold.  Clustering is what makes the pairwise step
tractable at corpus scale — k is chosen so E[cluster size] stays
bounded, and the O(n_c^2) comparison never leaves a cluster.

Scale shape:
- ``kmeans_fit`` is a distributed Lloyd loop: centroids are broadcast
  once per iteration (``ray.put``, k x d — tiny), every block emits at
  most k slim partial rows (cluster, member count, d-float sum), the
  partials are block-bounded via ``shuffle_coalesce`` + one combine
  pass, and only the O(sqrt(blocks) * k) combined rows reach the
  driver, which holds nothing bigger than the k x d centroid matrix.
  The input is materialized ONCE and re-scanned per iteration (same
  lineage-cut pattern as stages/pagerank).
- ``semantic_dedup`` shuffles only (id, cluster, vector) rows — for
  text corpora the text payload never enters the all-to-all; the kept-id
  set anti-filters it map-side afterwards (see the minhash queries).

Cross-engine determinism (the SQL-oracle contract, mirrored by the
unrolled-CTE twin in pipelines/queries.py the same way the pagerank
oracle unrolls its power iteration):
- assignment = argmax over ROUND(cos_sim, 4), ties -> smaller cluster
  id; cosine is computed dot / sqrt(|a|^2 * |b|^2), the same bracketing
  as DuckDB's list_cosine_similarity;
- centroid update = per-dimension mean ROUNDed to 6 decimals (so the
  next iteration starts from bit-identical values in both engines);
  empty clusters keep their previous centroid;
- the init matrix is used EXACTLY as given (no rounding), matching an
  oracle whose c0 is raw data rows.

Reference parity note: the reference engine has no embedding-space
dedup at all (crawl4ai service, see SURVEY.md §2.7) — this operator is
part of the LLM-training-data family the build brief adds on top.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .join import _seed_empty, shuffle_coalesce
from .knn import _to_matrix

#: semantic_dedup refuses clusters bigger than this: the in-cluster
#: comparison is O(n_c^2) by design (that is SemDeDup's contract — k
#: must scale with N so clusters stay small).  A guard, not a knob to
#: raise casually: 100k members is ~80 GB of f64 similarity matrix if
#: computed in one shot, so the group kernel chunks rows (see
#: _dedup_group) and the guard caps the quadratic work itself.
MAX_CLUSTER_SIZE = 100_000

_PAIR_CHUNK_ROWS = 2048  # rows of the n_c x n_c sim matrix per slab


def _vec_column(X: np.ndarray, d: int) -> pa.Array:
    """(n, d) float64 matrix -> fixed_size_list<double, d> WITHOUT a
    python-float round-trip (the tolist() path measured 2M x 64 floats
    as the dominant cost of the 2M-vector scale proof's tag stage)."""
    flat = pa.array(np.ascontiguousarray(X, dtype=np.float64).reshape(-1), pa.float64())
    return pa.FixedSizeListArray.from_arrays(flat, d)


def _cos_sims(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) cosine matrix with DuckDB's bracketing:
    dot / sqrt(|a|^2 * |b|^2)."""
    nx = np.einsum("ij,ij->i", X, X)
    nc = np.einsum("ij,ij->i", C, C)
    denom = np.sqrt(np.maximum(np.outer(nx, nc), 1e-300))
    return (X @ C.T) / denom


def _assign(X: np.ndarray, C: np.ndarray, round_sims: int) -> np.ndarray:
    """argmax over rounded cosine; np.argmax takes the FIRST max, which
    is exactly the oracle's ties -> smaller cluster id."""
    return np.argmax(np.round(_cos_sims(X, C), round_sims), axis=1)


def kmeans_fit(
    ds: "ray.data.Dataset",
    vec_col: str,
    init: np.ndarray,
    iters: int = 4,
    round_sims: int = 4,
    round_centroids: int = 6,
) -> np.ndarray:
    """Distributed spherical-assignment Lloyd: returns the (k, d)
    centroid matrix after ``iters`` assign->update rounds.  Cosine
    assignment is scale-invariant, so centroids are plain per-dimension
    means (no re-normalization needed — list_cosine_similarity
    normalizes both sides)."""
    C = np.asarray(init, dtype=np.float64)
    k = len(C)
    ds = ds.materialize()  # re-scanned every iteration

    for _ in range(iters):
        c_ref = ray.put(C)

        def partial_sums(batch: pa.Table) -> pa.Table:
            cents = ray.get(c_ref)
            X = _to_matrix(batch[vec_col])
            if not len(X):
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        "s": pa.array([], pa.list_(pa.float64())),
                    }
                )
            a = _assign(X, cents, round_sims)
            counts = np.bincount(a, minlength=k)
            sums = np.zeros_like(cents)
            np.add.at(sums, a, X)
            nz = np.flatnonzero(counts)
            return pa.table(
                {
                    "cluster": pa.array(nz, pa.int64()),
                    "n": pa.array(counts[nz], pa.int64()),
                    "s": pa.array([sums[c].tolist() for c in nz], pa.list_(pa.float64())),
                }
            )

        def combine(batch: pa.Table) -> pa.Table:
            cl = batch["cluster"].to_numpy(zero_copy_only=False)
            n = batch["n"].to_numpy(zero_copy_only=False)
            S = _to_matrix(batch["s"])
            out_n = np.zeros(k, dtype=np.int64)
            np.add.at(out_n, cl, n)
            out_s = np.zeros((k, S.shape[1] if len(S) else C.shape[1]))
            np.add.at(out_s, cl, S)
            nz = np.flatnonzero(out_n)
            return pa.table(
                {
                    "cluster": pa.array(nz, pa.int64()),
                    "n": pa.array(out_n[nz], pa.int64()),
                    "s": pa.array([out_s[c].tolist() for c in nz], pa.list_(pa.float64())),
                }
            )

        parts = ds.map_batches(partial_sums, batch_format="pyarrow")
        # block-bound then one combine level: the driver sees
        # O(sqrt(blocks) * k) rows, never O(blocks * k)
        df = (
            shuffle_coalesce(parts)
            .map_batches(combine, batch_format="pyarrow")
            .to_pandas()
        )
        newC = C.copy()  # empty clusters keep their previous centroid
        if len(df):
            n_tot = np.zeros(k, dtype=np.int64)
            s_tot = np.zeros_like(C)
            cl = df["cluster"].to_numpy()
            np.add.at(n_tot, cl, df["n"].to_numpy())
            np.add.at(s_tot, cl, np.stack(df["s"].to_numpy()))
            nz = np.flatnonzero(n_tot)
            newC[nz] = np.round(s_tot[nz] / n_tot[nz, None], round_centroids)
        C = newC
    return C


def assign_clusters(
    ds: "ray.data.Dataset",
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    round_sims: int = 4,
) -> "ray.data.Dataset":
    """Map-side nearest-centroid assignment -> Dataset(id, cluster)."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def tag(batch: pa.Table) -> pa.Table:
        cents = ray.get(c_ref)
        X = _to_matrix(batch[vec_col])
        a = (
            _assign(X, cents, round_sims)
            if len(X)
            else np.array([], dtype=np.int64)
        )
        return pa.table(
            {
                id_col: pa.array(
                    batch[id_col].to_numpy(zero_copy_only=False), pa.int64()
                ),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
            }
        )

    out = ds.map_batches(tag, batch_format="pyarrow")
    return _seed_empty(out, [(id_col, pa.int64()), ("cluster", pa.int64())])


def semantic_dedup(
    ds: "ray.data.Dataset",
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    threshold: float = 0.95,
    round_sims: int = 4,
    max_cluster: int = MAX_CLUSTER_SIZE,
    keep: str = "smallest_id",
) -> "ray.data.Dataset":
    """SemDeDup keep/drop pass -> Dataset(id, cluster, kept).

    Two keep rules:
    - ``keep="smallest_id"`` (default, shared with the minhash /
      training-pipeline queries and their SQL twins): a row is dropped
      iff SOME smaller-id row in the same cluster has ROUND(cos_sim, 4)
      >= threshold.
    - ``keep="low_centroid_sim"`` (the rule of the SemDeDup paper,
      Abbas et al. 2023 §2): within each connected component of the
      within-cluster >=threshold graph, keep exactly the member with the
      LOWEST ROUND(cos-to-centroid, 4) (ties -> smaller id) — the least
      prototypical example survives; singletons always keep.

    Only (id, cluster, vector) rows enter the per-cluster shuffle; the
    in-cluster n_c^2 comparison is slabbed (_PAIR_CHUNK_ROWS rows at a
    time) so the peak matrix is bounded regardless of cluster size, and
    clusters above ``max_cluster`` raise rather than silently going
    quadratic."""
    if keep not in ("smallest_id", "low_centroid_sim"):
        raise ValueError(f"unknown keep rule {keep!r}")
    C = np.asarray(centroids, dtype=np.float64)
    c_ref = ray.put(C)
    d = C.shape[1]

    def tag(batch: pa.Table) -> pa.Table:
        cents = ray.get(c_ref)
        X = _to_matrix(batch[vec_col])
        a = (
            _assign(X, cents, round_sims)
            if len(X)
            else np.array([], dtype=np.int64)
        )
        return pa.table(
            {
                id_col: pa.array(
                    batch[id_col].to_numpy(zero_copy_only=False), pa.int64()
                ),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "v": _vec_column(X, d),
            }
        )

    schema = pa.schema(
        [(id_col, pa.int64()), ("cluster", pa.int64()), ("kept", pa.int64())]
    )

    def dedup_group(t: pa.Table) -> pa.Table:
        if t.num_rows > max_cluster:
            raise ValueError(
                f"semantic_dedup cluster of {t.num_rows} rows exceeds "
                f"max_cluster={max_cluster}; raise k so clusters stay small "
                "(SemDeDup's in-cluster step is quadratic by design)"
            )
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        X = _to_matrix(t["v"])[order]
        # normalize ONCE and fold the 4dp round into the threshold:
        # ROUND(s, 4) >= t  <=>  s >= t - 0.5e-4 up to ~1e-15 fp noise,
        # 10 orders of magnitude below the 5e-5 margin — this removes
        # three elementwise passes (round, sqrt, divide) over the n^2
        # matrix, which dominated the matmul in the 2M-vector proof
        nrm = np.sqrt(np.maximum(np.einsum("ij,ij->i", X, X), 1e-300))
        X = X / nrm[:, None]
        thr = threshold - 0.5 * 10.0 ** (-round_sims)
        n = len(ids)
        dropped = np.zeros(n, dtype=bool)
        parent = np.arange(n) if keep == "low_centroid_sim" else None

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for lo in range(0, n, _PAIR_CHUNK_ROWS):
            hi = min(lo + _PAIR_CHUNK_ROWS, n)
            if lo == 0 and hi <= 1:
                continue
            # rows lo..hi vs ALL strictly-smaller-id columns 0..hi
            hit = X[lo:hi] @ X[:hi].T >= thr
            # mask the diagonal and upper triangle of this slab: only
            # j < i (smaller id) may drop i — NOT gated on j itself
            # surviving, same as the training-pipeline drop rule
            cols = np.arange(hi)
            rows = np.arange(lo, hi)
            hit &= cols[None, :] < rows[:, None]
            if parent is None:
                dropped[lo:hi] |= hit.any(axis=1)
            else:
                ri, cj = np.nonzero(hit)
                for i, j in zip((ri + lo).tolist(), cj.tolist()):
                    a, b = find(i), find(j)
                    if a != b:
                        parent[max(a, b)] = min(a, b)
        if parent is not None and n:
            roots = np.array([find(i) for i in range(n)])
            # paper rule: per component keep the member with the LOWEST
            # rounded centroid similarity (ties -> smaller id); X is
            # already normalized so cos(x, c) needs only c normalized
            cid = int(t["cluster"][0].as_py())
            c = ray.get(c_ref)[cid]
            cs = np.round(X @ (c / max(np.linalg.norm(c), 1e-300)), round_sims)
            order2 = np.lexsort((np.arange(n), cs))  # cs asc, idx(=id) asc
            seen: set = set()
            is_pick = np.zeros(n, dtype=bool)
            for i in order2.tolist():
                r = int(roots[i])
                if r not in seen:
                    seen.add(r)
                    is_pick[i] = True
            comp_size = np.bincount(roots, minlength=n)
            dropped = (comp_size[roots] > 1) & ~is_pick
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster": pa.array(
                    t["cluster"].to_numpy(zero_copy_only=False)[order], pa.int64()
                ),
                "kept": pa.array((~dropped).astype(np.int64), pa.int64()),
            }
        )

    slim = shuffle_coalesce(ds.map_batches(tag, batch_format="pyarrow"))
    seeded = slim.union(
        ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "v": _vec_column(np.zeros((0, d)), d),
                }
            )
        )
    )
    out = seeded.groupby("cluster").map_groups(
        dedup_group, batch_format="pyarrow"
    )
    # all-empty inputs can drop every block (and the schema) — seed it
    return _seed_empty(out, list(zip(schema.names, schema.types)))
