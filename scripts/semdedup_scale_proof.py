"""Scale proof for the SemDeDup family (stages/semdedup.py): distributed
k-means + within-cluster cosine dedup over N synthetic 64-d embeddings
(deterministic per-id mixture of 32 gaussian modes, 1% planted exact
duplicates), with the same driver RssAnon discipline as
scripts/scale_proof.py — flat anon-RSS across stages = no hidden
driver-side materialization (the driver may hold only the k x d
centroid matrix and scalar counters).

Usage: python scripts/semdedup_scale_proof.py [--n 2000000] [--k 256]
       [--cpus 32]
Writes one JSON line to stdout and SEMDEDUP_SCALE_PROOF_r4.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

D = 64
MODES = 32


def anon_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("RssAnon:"):
                return round(int(line.split()[1]) / 1024.0, 1)
    return -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False, logging_level="ERROR")
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from deepcrawl4ai_ray.stages.semdedup import kmeans_fit, semantic_dedup

    N = args.n
    n_dup = N // 100

    # deterministic per-id synthesis: vec(id) = 2*mode(id % 32) + noise,
    # noise seeded by the id block so any block layout yields the same rows
    centers = np.random.default_rng(12345).normal(size=(MODES, D))

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = np.where(ids < N, ids, ids - N)  # planted dup = exact copy
        X = np.empty((len(ids), D))
        for j, b in enumerate(base):
            X[j] = 2.0 * centers[b % MODES] + np.random.default_rng(b).normal(size=D) * 0.7
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(X.tolist(), pa.list_(pa.float64())),
            }
        )

    ds = (
        rd.range(N + n_dup, override_num_blocks=max(64, args.cpus * 8))
        .map_batches(synth, batch_format="pyarrow")
        .materialize()
    )
    stages = {}
    rss = {"start": anon_mb()}

    t0 = time.time()
    init = np.stack(
        [2.0 * centers[i % MODES] + np.random.default_rng(10_000_000 + i).normal(size=D) for i in range(args.k)]
    )
    C = kmeans_fit(ds, "embedding", init, iters=3)
    stages["kmeans_fit_sec"] = round(time.time() - t0, 1)
    rss["after_kmeans"] = anon_mb()

    t0 = time.time()
    out = semantic_dedup(ds, "vec_id", "embedding", C, threshold=0.95).materialize()
    stages["semantic_dedup_sec"] = round(time.time() - t0, 1)
    rss["after_dedup"] = anon_mb()

    n_total = out.count()
    # planted exact copies (ids >= N) must ALL drop; recall is a scalar
    import pyarrow.compute as pc

    def planted_stats(batch: pa.Table) -> pa.Table:
        planted = pc.greater_equal(batch["vec_id"], N)
        dropped = pc.equal(batch["kept"], 0)
        return pa.table(
            {
                "planted": pa.array([pc.sum(planted).as_py() or 0], pa.int64()),
                "planted_dropped": pa.array(
                    [pc.sum(pc.and_(planted, dropped)).as_py() or 0], pa.int64()
                ),
                "kept": pa.array([pc.sum(batch["kept"]).as_py() or 0], pa.int64()),
            }
        )

    agg = out.map_batches(planted_stats, batch_format="pyarrow").to_pandas().sum()
    rss["end"] = anon_mb()

    result = {
        "metric": "semdedup_scale_proof",
        "n_vectors": N + n_dup,
        "dim": D,
        "k": args.k,
        "num_cpus": args.cpus,
        "stages": stages,
        "kmeans_vecs_per_sec": round((N + n_dup) * 3 / max(stages["kmeans_fit_sec"], 1e-9)),
        "dedup_vecs_per_sec": round((N + n_dup) / max(stages["semantic_dedup_sec"], 1e-9)),
        "rows_out": n_total,
        "kept": int(agg["kept"]),
        "planted": int(agg["planted"]),
        "planted_dropped": int(agg["planted_dropped"]),
        "planted_recall": round(float(agg["planted_dropped"]) / max(int(agg["planted"]), 1), 4),
        "driver_rss_anon_mb": rss,
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(__file__), "..", "SEMDEDUP_SCALE_PROOF_r4.json"), "w") as f:
        json.dump(result, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
