"""Deduplication family — exact, MinHash+LSH, SimHash, embedding cosine.

First-class training-data-pipeline operators (beyond the reference,
whose only dedups are exact stream-message keys, job.py:471-484 J5, and
config-identity, crawler_pool.py:21-32 J6).  All are expressed as Ray
Data pipelines:

- exact:   vectorized content-hash per batch → hash-partitioned
           groupby(hash) → per-group first (min doc_id) — one shuffle
           of (hash, id) pairs only, never the payloads.
- minhash: shingle → minhash signature per batch → explode to
           (band_key, doc_id) rows → groupby(band_key) buckets →
           candidate pairs → exact-Jaccard verify.
- simhash: 64-bit signature per batch; near-dup = small Hamming
           distance within band buckets.
- embedding: SRP-LSH (random-hyperplane sign bands) → bucket groupby →
           exact cosine verify within buckets — candidates bounded by
           band agreement, no driver-side matrix, no O(n²) sweep.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..functions import hashing as H


def add_md5_column(id_col: str, text_col: str, out_col: str = "text_hash"):
    """map_batches fn: md5 content hash (matches DuckDB md5())."""

    def fn(batch: pa.Table) -> pa.Table:
        hashes = H.md5_hex_many(batch[text_col].to_pylist())
        return batch.append_column(out_col, pa.array(hashes, pa.string()))

    return fn


def exact_dedup_stats(ds: "ray.data.Dataset", id_col: str, text_col: str):
    """→ Dataset(text_hash, keep_<id> = min id, n_copies) — one row per
    distinct content; the J5 'first-wins' generalization."""
    hashed = ds.map_batches(add_md5_column(id_col, text_col), batch_format="pyarrow").select_columns(
        ["text_hash", id_col]
    )
    return hashed.groupby("text_hash").aggregate(
        Min(id_col, alias_name=f"keep_{id_col}"),
        Count(alias_name="n_copies"),
    )


def make_minhash_explode_fn(
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    num_buckets: int = 32,
    ship_shingles: bool = False,
):
    """Stateless map_batches fn: text → one row per (band, doc) with a
    ``band_bucket`` shuffle key.  Hash coefficients live in the hashing
    module's process-global cache (warm across tasks); grouping happens
    on ``band_bucket`` (num_buckets groups) rather than raw band keys so
    the downstream map_groups sees a few large groups, not thousands of
    two-row ones.

    ``ship_shingles``: carry the doc's full shingle-hash set to the
    bucket so candidates can be verified by EXACT Jaccard there (heavier
    shuffle: ~8 B × shingles × bands per doc; at corpus scale emit
    candidates id-only instead and join the sets back per bucket —
    same plan shape).  Zero-token docs emit nothing in this mode
    (empty sets have no meaningful similarity; mirrors the oracle).
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_ids: List[int] = []
        out_keys: List[bytes] = []
        out_sigs: List[bytes] = []
        out_sh: List[bytes] = []
        for i, t in zip(ids, texts):
            sh = H.shingles(t, k)
            if ship_shingles and sh.size == 0:
                continue
            sig = H.minhash_signature_fast(sh, num_perm)
            sb = sig.tobytes()
            shb = sh.tobytes() if ship_shingles else b""
            for key in H.lsh_band_keys(sig, bands):
                out_ids.append(i)
                out_keys.append(key)
                out_sigs.append(sb)
                out_sh.append(shb)
        # bucket from the band hash bytes themselves — deterministic across
        # processes (python's hash() is salted per process; never use it
        # for shuffle keys)
        buckets = np.fromiter(
            (int.from_bytes(kk[1:9], "little") % num_buckets for kk in out_keys),
            dtype=np.int32,
            count=len(out_keys),
        )
        cols = {
            "band_bucket": pa.array(buckets),
            "band_key": pa.array(out_keys, pa.binary()),
            id_col: pa.array(out_ids, pa.int64()),
            "sig": pa.array(out_sigs, pa.binary()),
        }
        if ship_shingles:
            cols["sh"] = pa.array(out_sh, pa.binary())
        return pa.table(cols)

    return fn


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    verify: str = "sig",
) -> pd.DataFrame:
    """Near-dup pairs from LSH band candidates.

    verify="sig":   filter candidates on the signature-Jaccard estimate
                    → (id_a, id_b, est_jaccard) — the cheap classic.
    verify="exact": compute EXACT shingle-set Jaccard within the bucket
                    (sets shipped with the band rows) → (id_a, id_b, jac)
                    — deterministic ground truth, SQL-oracle-comparable
                    (LSH miss prob at threshold 0.9 ≈ 4e-8 per pair).

    Returns pandas (id_a < id_b), sorted, deduped across bands.  The
    band-bucket groupby is the only shuffle; within a bucket the
    candidate set is small by construction (docs agreeing on a full
    band).
    """
    exact = verify == "exact"
    exploded = ds.map_batches(
        make_minhash_explode_fn(text_col, id_col, num_perm, bands, k, ship_shingles=exact),
        batch_format="pyarrow",
    )
    val_col = "jac" if exact else "est_jaccard"

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One call per band_bucket: within-band pairing."""
        rows_a, rows_b, vals = [], [], []
        for _, band in g.groupby("band_key", sort=False):
            if len(band) < 2:
                continue
            band = band.drop_duplicates(subset=[id_col]).sort_values(id_col)
            if len(band) < 2:
                continue
            ids = band[id_col].to_numpy()
            if exact:
                sets = [np.frombuffer(s, dtype=np.uint64) for s in band["sh"]]
                for a in range(len(ids)):
                    for b in range(a + 1, len(ids)):
                        jac = H.jaccard(sets[a], sets[b])
                        if jac >= threshold:
                            rows_a.append(ids[a])
                            rows_b.append(ids[b])
                            vals.append(round(jac, 4))
            else:
                sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in band["sig"]])
                for a in range(len(ids)):
                    eq = (sigs[a + 1 :] == sigs[a]).mean(axis=1)
                    hit = np.nonzero(eq >= threshold)[0]
                    for h in hit:
                        rows_a.append(ids[a])
                        rows_b.append(ids[a + 1 + h])
                        vals.append(float(eq[h]))
        return pd.DataFrame({"id_a": rows_a, "id_b": rows_b, val_col: vals})

    pairs = exploded.groupby("band_bucket").map_groups(bucket_pairs, batch_format="pandas").to_pandas()
    if pairs.empty:
        return pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                val_col: pd.Series(dtype="float64"),
            }
        )
    pairs = pairs.drop_duplicates(subset=["id_a", "id_b"]).sort_values(["id_a", "id_b"])
    return pairs.reset_index(drop=True)


def connected_components(
    pairs, id_a: str = "id_a", id_b: str = "id_b", max_iters: int = 50
) -> pd.DataFrame:
    """Duplicate-pair graph → cluster labels via distributed min-label
    propagation (ray_guide 'Near-dup' pattern): each round, every node
    adopts the minimum label in its neighborhood (one groupby per
    round); converges in O(diameter) rounds.  Dup clusters from LSH
    pairs have tiny diameters, so this terminates in a few rounds.

    ``pairs`` may be a pandas DataFrame (small edge lists) OR a
    ray.data.Dataset with the same two columns — at corpus scale the
    pair set never touches the driver.  Returns DataFrame(node,
    component) where component = min node id of the cluster.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    from .join import hash_join

    empty = pd.DataFrame({"node": pd.Series(dtype="int64"), "component": pd.Series(dtype="int64")})
    if isinstance(pairs, pd.DataFrame):
        if pairs.empty:
            return empty
        edges = pd.DataFrame(
            {
                "src": pd.concat([pairs[id_a], pairs[id_b]], ignore_index=True).astype("int64"),
                "dst": pd.concat([pairs[id_b], pairs[id_a]], ignore_index=True).astype("int64"),
            }
        )
        edges_ds = rd.from_pandas(edges).materialize()
    else:  # Dataset of (id_a, id_b): symmetrize distributed
        def sym(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": pa.concat_arrays(
                        [pc.cast(t[id_a], pa.int64()).combine_chunks(), pc.cast(t[id_b], pa.int64()).combine_chunks()]
                    ),
                    "dst": pa.concat_arrays(
                        [pc.cast(t[id_b], pa.int64()).combine_chunks(), pc.cast(t[id_a], pa.int64()).combine_chunks()]
                    ),
                }
            )

        edges_ds = pairs.map_batches(sym, batch_format="pyarrow").materialize()
        if edges_ds.count() == 0:
            return empty
    # Labels live as a DATASET for the whole loop — each round is two
    # bucketed hash_joins + a groupby; the driver never materializes a
    # node→label map (r1 review finding #4).  materialize() per round
    # keeps blocks in the object store and cuts the lazy lineage so
    # iteration k doesn't re-execute rounds 1..k-1.
    labels = (
        edges_ds.map_batches(
            lambda t: pa.table({"node": pc.unique(t["src"])}), batch_format="pyarrow"
        )
        .groupby("node")
        .aggregate(Count(alias_name="__c"))
        .map_batches(
            lambda t: pa.table({"node": t["node"], "component": t["node"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    for _ in range(max_iters):
        cand = (
            hash_join(edges_ds, labels, on="src", right_on="node", num_buckets=8)
            .map_batches(
                lambda t: pa.table({"node": t["dst"], "cand": t["component"]}),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(Min("cand", alias_name="min_cand"))
        )
        merged = hash_join(labels, cand, on="node", num_buckets=8, how="left")

        def update(t: pa.Table) -> pa.Table:
            # left-join nulls arrive as NaN floats; node ids ≪ 2^53 so the
            # float round-trip is exact
            comp = pc.cast(t["component"], pa.float64())
            mc = pc.fill_null(pc.cast(t["min_cand"], pa.float64()), np.inf)
            new = pc.min_element_wise(comp, mc)
            return pa.table(
                {
                    "node": pc.cast(t["node"], pa.int64()),
                    "component": pc.cast(new, pa.int64()),
                    "__chg": pc.cast(pc.not_equal(new, comp), pa.int64()),
                }
            )

        upd = merged.map_batches(update, batch_format="pyarrow").materialize()
        n_changed = upd.sum("__chg")
        labels = upd.drop_columns(["__chg"])
        if not n_changed:
            break
    out = labels.to_pandas()
    out["node"] = out["node"].astype("int64")
    out["component"] = out["component"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def simhash_stage(id_col: str, text_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        sigs = [H.simhash64(t) for t in batch[text_col].to_pylist()]
        return pa.table(
            {
                id_col: batch[id_col],
                "simhash": pa.array(np.array(sigs, dtype=np.uint64)),
            }
        )

    return fn


# ---------------------------------------------------------------------------
# Embedding near-dup via SRP-LSH (signed random projections)
#
# The scale path the r1 review demanded: NO driver-side matrix, NO O(N²)
# all-pairs.  Each worker derives the same hyperplane matrix from a seed
# (pure function — nothing broadcast), vectors explode to one row per
# LSH band (band_key = packed sign bits), a single groupby(bucket)
# shuffle co-locates candidates, and exact cosine verifies within each
# band group.  Recall: p_bit = 1 - acos(t)/π; with rbits=6, bands=24 a
# cos≥0.95 pair is missed with prob (1-p_bit^6)^24 ≈ 1.5e-8.
#
# Shuffle volume = bands × (8B id + 8B·d vec) per vector.  At billions
# of vectors ship a quantized (fp16/int8) vector for the in-bucket
# verify and re-check survivors exactly via a keyed join — the band
# explode/groupby plan is unchanged.
# ---------------------------------------------------------------------------

_SRP_PLANES: dict = {}


def _srp_planes(d: int, bands: int, rbits: int, seed: int) -> np.ndarray:
    """(bands·rbits, d) hyperplanes — deterministic per (d,bands,rbits,seed),
    regenerated identically in every worker process (cached)."""
    key = (d, bands, rbits, seed)
    H = _SRP_PLANES.get(key)
    if H is None:
        H = np.random.default_rng(seed).standard_normal((bands * rbits, d))
        _SRP_PLANES[key] = H
    return H


def make_srp_explode_fn(
    vec_col: str, id_col: str, bands: int = 24, rbits: int = 6, seed: int = 42, num_buckets: int = 32
):
    """map_batches fn: vector → one row per band with packed sign-bit
    band_key, shuffle bucket, and the L2-normalized float64 vector bytes
    (carried to the bucket for the exact cosine verify)."""

    def fn(batch: pa.Table) -> pa.Table:
        from .knn import _to_matrix

        n = len(batch)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        V = _to_matrix(batch[vec_col]).astype(np.float64, copy=False)
        if n == 0 or V.size == 0:
            return pa.table(
                {
                    "band_bucket": pa.array([], pa.int32()),
                    "band_key": pa.array([], pa.binary()),
                    id_col: pa.array([], pa.int64()),
                    "vec": pa.array([], pa.binary()),
                }
            )
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        H = _srp_planes(V.shape[1], bands, rbits, seed)
        bits = (Vn @ H.T) > 0.0  # (n, bands*rbits)
        packed = np.packbits(bits.reshape(n, bands, rbits), axis=2)  # (n, bands, ⌈rbits/8⌉)
        vec_bytes = [Vn[i].tobytes() for i in range(n)]
        out_ids = np.repeat(ids, bands)
        out_keys: List[bytes] = []
        out_vecs: List[bytes] = []
        buckets = np.empty(n * bands, dtype=np.int32)
        w = 0
        for i in range(n):
            vb = vec_bytes[i]
            for b in range(bands):
                kb = bytes([b]) + packed[i, b].tobytes()
                out_keys.append(kb)
                out_vecs.append(vb)
                buckets[w] = (b * 2654435761 + int.from_bytes(packed[i, b].tobytes(), "little")) % num_buckets
                w += 1
        return pa.table(
            {
                "band_bucket": pa.array(buckets),
                "band_key": pa.array(out_keys, pa.binary()),
                id_col: pa.array(out_ids, pa.int64()),
                "vec": pa.array(out_vecs, pa.binary()),
            }
        )

    return fn


def srp_near_dup_pairs(
    ds: "ray.data.Dataset",
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bands: int = 24,
    rbits: int = 6,
    seed: int = 42,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Cosine near-dup pairs (id_a < id_b, round(cos,4) ≥ threshold).

    LSH-bucketed: candidates are only pairs agreeing on a full sign-bit
    band; the exact cosine (float64, rounded 4dp — the oracle's
    comparator) is computed within bucket groups.  The band-bucket
    groupby is the only shuffle; the driver never sees a vector."""
    exploded = ds.map_batches(
        make_srp_explode_fn(vec_col, id_col, bands, rbits, seed, num_buckets),
        batch_format="pyarrow",
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b, sims = [], [], []
        for _, band in g.groupby("band_key", sort=False):
            band = band.drop_duplicates(subset=[id_col]).sort_values(id_col)
            m = len(band)
            if m < 2:
                continue
            ids = band[id_col].to_numpy()
            X = np.frombuffer(b"".join(band["vec"]), dtype=np.float64).reshape(m, -1)
            S = np.round(X @ X.T, 4)
            ia, ib = np.triu_indices(m, 1)
            hit = S[ia, ib] >= threshold
            rows_a.extend(ids[ia[hit]])
            rows_b.extend(ids[ib[hit]])
            sims.extend(S[ia[hit], ib[hit]])
        return pd.DataFrame(
            {
                "id_a": pd.Series(rows_a, dtype="int64"),
                "id_b": pd.Series(rows_b, dtype="int64"),
                "cos_sim": pd.Series(sims, dtype="float64"),
            }
        )

    pairs = exploded.groupby("band_bucket").map_groups(bucket_pairs, batch_format="pandas").to_pandas()
    if pairs.empty:
        return pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cos_sim": pd.Series(dtype="float64"),
            }
        )
    pairs = pairs.drop_duplicates(subset=["id_a", "id_b"]).sort_values(["id_a", "id_b"])
    return pairs.reset_index(drop=True)
