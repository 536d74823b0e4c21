"""3× stress tier for the two memory-heaviest dedup stages (r4 verdict
#4): minhash-with-planted-pairs and SRP embedding near-dup showed the
only RSS steps at sf1, and embed_srp degraded in-sequence under object
store pressure.  This proof triples the input (three id-shifted
replicas of the sf1 corpus → ~6.5M docs / ~6.5M 64-d vectors), runs
each stage standalone, and records wall time, planted-pair recall,
driver RssAnon, and the object-store SPILL profile (bytes on disk in
the Ray session's spill directory) — the empirical answer to "what
happens past plasma capacity".

Usage: python scripts/stress_proof.py [--cpus 32] [--replicas 3]
Writes STRESS_PROOF_r5.json at the repo root.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq_


def anon_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("RssAnon:"):
                return round(int(line.split()[1]) / 1024.0, 1)
    return -1.0


def spilled_mb() -> float:
    """Bytes currently sitting in the Ray object-spilling directory."""
    total = 0
    for d in glob.glob("/tmp/ray/session_*/ray_spilled_objects*") + glob.glob(
        "/tmp/ray/session_*/object_spilling*"
    ):
        for root, _, files in os.walk(d):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    return round(total / 1e6, 1)


DIM = 64


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--replicas", type=int, default=3)
    ap.add_argument("--stage", choices=["minhash", "embed", "both"], default="both")
    ap.add_argument("--out", default="STRESS_PROOF_r5.json")
    args = ap.parse_args()
    R = args.replicas

    from deepcrawl4ai_ray.sources.corpus import ensure

    corpus = ensure("sf1")

    import ray

    ray.init(
        address="local", num_cpus=args.cpus, include_dashboard=False, logging_level="ERROR"
    )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    # background watermark sampler: spill is DELETED as consumers finish,
    # so an end-of-stage reading understates pressure — sample every 2 s
    import threading

    peak = {"spill_mb": 0.0}
    stop_evt = threading.Event()

    def sampler():
        while not stop_evt.is_set():
            peak["spill_mb"] = max(peak["spill_mb"], spilled_mb())
            stop_evt.wait(2.0)

    threading.Thread(target=sampler, daemon=True).start()

    out = {
        "metric": "stress_proof",
        "tier": f"sf1x{R}",
        "num_cpus": args.cpus,
        "stages": {},
        "rss_anon_mb": {"start": anon_mb()},
        "spilled_mb": {"start": spilled_mb()},
    }

    def record(name, secs, **kw):
        out["stages"][name] = {"sec": round(secs, 1), **{k: round(v, 4) for k, v in kw.items()}}
        out["rss_anon_mb"][name] = anon_mb()
        out["spilled_mb"][name] = spilled_mb()
        out["spilled_mb"]["peak_so_far_" + name] = peak["spill_mb"]
        print(name, out["stages"][name], "anon", anon_mb(), "spill", spilled_mb(), flush=True)

    # ---- extract text once (input for minhash) --------------------------
    extract_out = "/tmp/dc4r_stress/extract_out"
    if not os.path.exists(extract_out + "/_DONE"):
        shutil.rmtree(extract_out, ignore_errors=True)

        def ex(batch: pa.Table) -> pa.Table:
            from deepcrawl4ai_ray.functions.extract import extract_text

            texts = [extract_text(h) for h in batch["html"].to_pylist()]
            return pa.table({"url": batch["url"], "text": pa.array(texts, pa.string())})

        t0 = time.time()
        rd.read_parquet(os.path.join(corpus, "pages"), columns=["url", "html"]).map_batches(
            ex, batch_format="pyarrow", batch_size=512
        ).write_parquet(extract_out)
        record("extract", time.time() - t0)
        open(extract_out + "/_DONE", "w").close()
    n_pages = sum(
        pq_.read_metadata(f).num_rows for f in glob.glob(f"{extract_out}/*.parquet")
    )
    out["pages_per_replica"] = n_pages

    def replicas_ds(columns):
        """R id-shifted copies: ids derive from hash(url#k), so replicas
        never collide and the planted mask (id%20==0) stays ~5%/copy.

        Replica k>0 TEXT is perturbed (a replica marker token inserted
        every 5 words → word-3-shingle Jaccard ≈ 0.3 vs the base copy):
        verbatim replicas would make every doc a true near-dup of its
        two siblings — 6M+ real pairs, a different (all-duplicates)
        workload, not a 3× scale-up of the sf1 one.  (The first x3
        attempt ran exactly that and filled the disk with payload-join
        spill; that behavior is documented in BASELINE.md.)"""
        parts = []
        for k in range(R):
            def with_ids(t: pa.Table, _k=k) -> pa.Table:
                urls = np.asarray(t["url"].to_pylist(), dtype=object)
                salted = np.array([u + f"#{_k}" for u in urls], dtype=object)
                ids = (
                    pd.util.hash_array(salted, categorize=False) >> np.uint64(1)
                ).astype(np.int64)
                cols = {"doc_id": pa.array(ids, pa.int64())}
                for c in columns:
                    if c == "doc_id":
                        continue
                    if c == "text" and _k > 0:
                        mark = f"zq{_k}x"
                        texts = []
                        for s in t["text"].to_pylist():
                            w = s.split(" ")
                            texts.append(
                                " ".join(
                                    tok if i % 5 or not i else f"{mark} {tok}"
                                    for i, tok in enumerate(w)
                                )
                            )
                        cols[c] = pa.array(texts, pa.string())
                    else:
                        cols[c] = t[c]
                return pa.table(cols)

            parts.append(
                rd.read_parquet(
                    extract_out, columns=["url"] + [c for c in columns if c != "doc_id"]
                ).map_batches(with_ids, batch_format="pyarrow")
            )
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return ds

    # ---- minhash with planted near-dups at R× --------------------------
    if args.stage in ("minhash", "both"):
        run_minhash(args, R, out, record, replicas_ds, n_pages)
    if args.stage in ("embed", "both"):
        run_embed(args, R, out, record, replicas_ds, n_pages)

    out["rss_anon_mb"]["end"] = anon_mb()
    out["spilled_mb"]["end"] = spilled_mb()
    out["spilled_mb"]["peak"] = peak["spill_mb"]
    stop_evt.set()
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__), "..", args.out), "w") as f:
        json.dump(out, f, indent=1)
    ray.shutdown()


def run_minhash(args, R, out, record, replicas_ds, n_pages):
    import ray.data as rd  # noqa: F401
    from deepcrawl4ai_ray.stages.dedup import minhash_lsh_pairs

    docs = replicas_ds(["doc_id", "text"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = (ids % 20) == 0
        sel = batch.filter(pa.array(mask))
        texts = [t.rsplit(" ", 1)[0] for t in sel["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids[mask] + 1, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    planted = docs.map_batches(plant, batch_format="pyarrow").materialize()
    n_planted = planted.count()
    mh_out = "/tmp/dc4r_stress/minhash_out"
    shutil.rmtree(mh_out, ignore_errors=True)
    t0 = time.time()
    minhash_lsh_pairs(
        docs.union(planted), "doc_id", "text", threshold=0.9, num_perm=64, bands=8,
        k=3, verify="exact", payload_mode="auto",
    ).write_parquet(mh_out)
    dt = time.time() - t0
    import pyarrow.dataset as pads

    found = pads.dataset(mh_out).to_table(columns=["id_a", "id_b"])
    ia, ib = found["id_a"].to_numpy(), found["id_b"].to_numpy()
    n_found = int(np.sum((ib - ia == 1) & (ia % 20 == 0)))
    record(
        "minhash_planted_x%d" % R,
        dt,
        docs_per_sec=(n_pages * R + n_planted) / dt,
        pairs=float(len(ia)),
        planted=float(n_planted),
        planted_found=float(n_found),
        recall=n_found / max(n_planted, 1),
    )


def run_embed(args, R, out, record, replicas_ds, n_pages):
    import ray.data as rd  # noqa: F401
    from deepcrawl4ai_ray.stages.dedup import srp_near_dup_pairs

    def to_vec(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = (ids[:, None] * np.int64(DIM) + np.arange(DIM, dtype=np.int64)).ravel()
        h = pd.util.hash_array(keys)
        V = (h.astype(np.float64) / 2**63 - 1.0).reshape(-1, DIM)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        out_ids = [ids]
        out_vecs = [V]
        pmask = ids % 20 == 0
        if pmask.any():
            P = V[pmask].copy()
            P[:, 0] += 1e-3
            P /= np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)
            out_ids.append(ids[pmask] + 1)
            out_vecs.append(P)
        allv = np.concatenate(out_vecs).astype(np.float32)
        alli = np.concatenate(out_ids)
        flat = pa.array(allv.ravel(), pa.float32())
        offs = pa.array(np.arange(0, (len(alli) + 1) * DIM, DIM, dtype=np.int32))
        return pa.table(
            {"doc_id": pa.array(alli, pa.int64()), "emb": pa.ListArray.from_arrays(offs, flat)}
        )

    ids_ds = replicas_ds(["doc_id"])

    def planted_count(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int(((ids % 20) == 0).sum())], pa.int64())})

    n_vec_planted = int(
        ids_ds.map_batches(planted_count, batch_format="pyarrow").to_pandas()["n"].sum()
    )
    emb_ds = ids_ds.map_batches(to_vec, batch_format="pyarrow")
    srp_out = "/tmp/dc4r_stress/srp_out"
    shutil.rmtree(srp_out, ignore_errors=True)
    t0 = time.time()
    srp_near_dup_pairs(
        emb_ds, "doc_id", "emb", threshold=0.999, bands=12, rbits=24,
        payload_mode="auto", max_docs_per_key=8192,
    ).write_parquet(srp_out)
    dt = time.time() - t0
    import pyarrow.dataset as pads

    sp = pads.dataset(srp_out).to_table(columns=["id_a", "id_b"])
    spa, spb = sp["id_a"].to_numpy(), sp["id_b"].to_numpy()
    n_sp = int(np.sum((spb - spa == 1) & (spa % 20 == 0)))
    record(
        "embed_srp_x%d" % R,
        dt,
        vecs_per_sec=n_pages * R * 1.05 / dt,
        pairs=float(len(spa)),
        planted_found=float(n_sp),
        recall=n_sp / max(n_vec_planted, 1),
    )


if __name__ == "__main__":
    main()
