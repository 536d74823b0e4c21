"""10× scale proof (r3 verdict #9): run the 5 headline pipelines over
the ~2M-page sf1 corpus at 32 cpus with driver peak-RSS tracking — the
empirical check that no hidden driver-side materialization survives
past the sf0.1 / 200k-page bench scale.

The driver's peak RSS after each stage is the tell: a pipeline that
secretly collects pages / pairs / rank tables to the driver would step
its RSS by O(data); a streaming pipeline steps it by O(metadata).

Usage: python scripts/scale_proof.py [--tier sf1] [--cpus 32]
Writes one JSON line to stdout and SCALE_PROOF_r4.json at the repo root.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def rss_mb() -> float:
    """Driver peak RSS so far (ru_maxrss is KiB on Linux, monotonic).

    NOTE: ru_maxrss counts plasma/object-store SHARED pages the moment the
    driver maps a block (e.g. a guarded broadcast collect), so it
    overstates driver-owned memory.  anon_mb() below is the honest
    "driver heap" metric — see the paired rss_anon_mb entries."""
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1)


def anon_mb() -> float:
    """Current ANONYMOUS RSS (RssAnon): driver-owned heap only, excludes
    plasma shm / file mappings.  Flat RssAnon across stages is the real
    no-driver-materialization evidence; ru_maxrss can step by the size of
    any object-store block the driver merely mapped."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("RssAnon:"):
                return round(int(line.split()[1]) / 1024.0, 1)
    return -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="sf1")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from deepcrawl4ai_ray.sources.corpus import ensure

    t0 = time.time()
    corpus = ensure(args.tier)  # parallel multiprocess generation, cached
    t_gen = time.time() - t0

    import pyarrow.parquet as pq_

    n_pages = sum(
        pq_.read_metadata(f).num_rows for f in glob.glob(os.path.join(corpus, "pages", "*.parquet"))
    )

    import ray

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.target_max_block_size = 8 * 1024 * 1024

    out: dict = {
        "metric": "scale_proof",
        "tier": args.tier,
        "num_cpus": args.cpus,
        "pages": n_pages,
        "gen_sec": round(t_gen, 1),
        "stages": {},
        "rss_mb": {"start": rss_mb()},
        "rss_anon_mb": {"start": anon_mb()},
    }

    def record(name: str, secs: float, **kw) -> None:
        out["stages"][name] = {"sec": round(secs, 1), **{k: round(v, 1) for k, v in kw.items()}}
        out["rss_mb"][name] = rss_mb()
        out["rss_anon_mb"][name] = anon_mb()
        print(
            f"[scale_proof] {name}: {secs:.1f}s {kw} driver_peak_rss={rss_mb()} MB"
            f" anon_rss={anon_mb()} MB",
            file=sys.stderr,
        )

    pages_path = os.path.join(corpus, "pages")

    # ---- 1. extract+enrich (the compute headline): html → text →
    # tokens/quality/minhash/simhash → parquet -----------------------------
    def enrich_batch(batch: pa.Table) -> pa.Table:
        from deepcrawl4ai_ray.functions import hashing as H
        from deepcrawl4ai_ray.functions.extract import extract_text
        from deepcrawl4ai_ray.functions.textstats import quality_batch

        texts = [extract_text(h) for h in batch["html"].to_pylist()]
        t = pa.array(texts, pa.string())
        n_tok = pc.cast(pc.add(pc.count_substring(t, " "), 1), pa.int64())
        ths = [H.token_hashes(x) for x in texts]
        sigs = [H.minhash_signature_fast(H.shingles(th), 64).tobytes() for th in ths]
        simh = np.array([H.simhash64(th) for th in ths], dtype=np.uint64)
        q = quality_batch(texts)
        return pa.table(
            {
                "url": batch["url"],
                "text": t,
                "n_tokens": n_tok,
                "minhash": pa.array(sigs, pa.binary()),
                "simhash": pa.array(simh),
                "stopword_ratio": pa.array(q["stopword_ratio"]),
                "alpha_ratio": pa.array(q["alpha_ratio"]),
            }
        )

    extract_out = "/tmp/dc4r_scale/extract_out"
    shutil.rmtree(extract_out, ignore_errors=True)
    t0 = time.time()
    (
        rd.read_parquet(pages_path, columns=["url", "html"])
        .map_batches(enrich_batch, batch_format="pyarrow", batch_size=512)
        .write_parquet(extract_out)
    )
    dt = time.time() - t0
    record("extract", dt, pages_per_sec=n_pages / dt)

    # ---- 2. crawl loop (politeness-free, budget sized to the corpus) ----
    from deepcrawl4ai_ray.frontier.crawler import CrawlConfig, Crawler

    crawl_out = "/tmp/dc4r_scale/crawl_out"
    shutil.rmtree(crawl_out, ignore_errors=True)
    cfg = CrawlConfig(
        num_shards=8,
        fetch_concurrency=max(2, args.cpus // 4),
        per_shard_budget=400_000,
        max_rounds=6,
        round_ms=10_000_000,
        checkpoint=False,
    )
    t0 = time.time()
    c = Crawler(corpus, crawl_out, cfg)
    crawl_res = c.run()
    dt = time.time() - t0
    c.kill_shards()
    record("crawl", dt, pages_per_sec=crawl_res["total_fetched"] / dt, fetched=crawl_res["total_fetched"])

    # ---- 3. minhash near-dup over the extracted corpus ------------------
    # doc ids = stable 63-bit url hashes (collision odds ~N²/2⁶³ ≈ 1e-6);
    # the extract output already carries text, so this measures the LSH
    # explode→bucket→dedup→verify chain at 2M docs, not re-extraction.
    import pandas as pd

    from deepcrawl4ai_ray.stages.dedup import minhash_lsh_pairs

    def with_ids(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.asarray(batch["url"].to_pylist(), dtype=object), categorize=False
        )
        ids = (h >> np.uint64(1)).astype(np.int64)
        cols = {"doc_id": pa.array(ids, pa.int64()), "text": batch["text"]}
        if "minhash" in batch.schema.names:
            cols["minhash"] = batch["minhash"]
        return pa.table(cols)

    docs_sig = rd.read_parquet(extract_out, columns=["url", "text", "minhash"]).map_batches(
        with_ids, batch_format="pyarrow"
    )
    docs = rd.read_parquet(extract_out, columns=["url", "text"]).map_batches(
        with_ids, batch_format="pyarrow"
    )
    # bands=8 (r=8): the production LSH tuning for template-heavy web
    # text.  The oracle-gate configuration (bands=16, r=4) is recall-
    # maximal but precision-poor on shared boilerplate: at sf1 it
    # produced 1.54M candidate pairs (ALL rejected by exact verify),
    # paying a 296 s payload join; r=8 cuts the per-band collision prob
    # from j^4 to j^8 → candidates collapse to the broadcast path
    # (measured 62 s, flat driver).  Recall at j=0.9 stays ≥ 1-1e-2 per
    # the (1-(1-j^r)^b) bound and ≥ 1-6e-6 for the j≈0.97 planted dups.
    mh_out = "/tmp/dc4r_scale/minhash_out"
    shutil.rmtree(mh_out, ignore_errors=True)
    t0 = time.time()
    # sig_col: banding reuses the enrich stage's STORED signatures (the
    # composed-pipeline shape); exact verify still joins shingles from
    # text for the candidates only
    minhash_lsh_pairs(
        docs_sig, "doc_id", "text", threshold=0.9, num_perm=64, bands=8, k=3,
        verify="exact", payload_mode="auto", sig_col="minhash",
    ).write_parquet(mh_out)
    dt = time.time() - t0
    n_pairs = sum(pq_.read_metadata(f).num_rows for f in glob.glob(f"{mh_out}/*.parquet"))
    record("minhash", dt, docs_per_sec=n_pages / dt, pairs=float(n_pairs))

    # ---- 3b. minhash with PLANTED near-dups -------------------------------
    # the synthetic corpus has no natural near-duplicates, so stage 3's
    # pairs=0 exercises signatures+banding but leaves the candidate →
    # exact-verify → pair-emit chain idle at scale.  Plant a 5% perturbed
    # copy set (drop the last word; j ≈ 0.97 ≫ 0.9) and measure that
    # chain — including the payload_mode=auto broadcast/prune decision —
    # over 2.1M+ docs with ~100k true pairs.
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
    mhp_out = "/tmp/dc4r_scale/minhash_planted_out"
    shutil.rmtree(mhp_out, ignore_errors=True)
    t0 = time.time()
    minhash_lsh_pairs(
        docs.union(planted), "doc_id", "text", threshold=0.9, num_perm=64, bands=8, k=3,
        verify="exact", payload_mode="auto",
    ).write_parquet(mhp_out)
    dt = time.time() - t0
    import pyarrow.dataset as pads

    found = pads.dataset(mhp_out).to_table(columns=["id_a", "id_b"])
    ia = found["id_a"].to_numpy()
    ib = found["id_b"].to_numpy()
    n_planted_found = int(np.sum((ib - ia == 1) & (ia % 20 == 0)))
    record(
        "minhash_planted",
        dt,
        docs_per_sec=(n_pages + n_planted) / dt,
        pairs=float(len(ia)),
        planted=float(n_planted),
        planted_found=float(n_planted_found),
    )

    # ---- 3c. simhash near-dup pairs from the enrich stage's PRECOMPUTED
    # signatures (sig_col path — the composed-pipeline shape: signatures
    # ride the extract output, the pair miner never re-tokenizes) ---------
    sh_out = "/tmp/dc4r_scale/simhash_out"
    shutil.rmtree(sh_out, ignore_errors=True)
    from deepcrawl4ai_ray.stages.dedup import simhash_near_dup_pairs

    t0 = time.time()
    sig_ds = rd.read_parquet(extract_out, columns=["url", "simhash"]).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pa.array(
                    (
                        pd.util.hash_array(
                            np.asarray(t["url"].to_pylist(), dtype=object), categorize=False
                        )
                        >> np.uint64(1)
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "simhash": t["simhash"],
            }
        ),
        batch_format="pyarrow",
    )
    # max_docs_per_key: the synthetic corpus is template-heavy — without
    # the cap one signature-chunk bucket emits O(m^2) pairs and OOMs
    simhash_near_dup_pairs(
        sig_ds, "doc_id", sig_col="simhash", max_docs_per_key=256
    ).write_parquet(sh_out)
    dt = time.time() - t0
    n_sh = sum(pq_.read_metadata(f).num_rows for f in glob.glob(f"{sh_out}/*.parquet"))
    record("simhash", dt, docs_per_sec=n_pages / dt, pairs=float(n_sh))

    # ---- 3d. embedding near-dup (SRP-LSH) over 2M synthetic vectors -----
    # the dedup family's embedding member has only ever run at bench
    # scale; derive a deterministic 64-d unit vector per doc from hashed
    # (doc_id, dim) pairs, plant a 5% near-identical copy set, and
    # measure bucket → fp16 screen → exact f64 re-check at 2.16M rows.
    from deepcrawl4ai_ray.stages.dedup import srp_near_dup_pairs

    DIM = 64

    def to_vec(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = (ids[:, None] * np.int64(DIM) + np.arange(DIM, dtype=np.int64)).ravel()
        h = pd.util.hash_array(keys)  # vectorized siphash, no RNG objects
        V = (h.astype(np.float64) / 2**63 - 1.0).reshape(-1, DIM)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        out_ids = [ids]
        out_vecs = [V]
        planted = ids % 20 == 0
        if planted.any():
            P = V[planted].copy()
            P[:, 0] += 1e-3  # cos >= 0.999999 vs the base vector
            P /= np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)
            out_ids.append(ids[planted] + 1)
            out_vecs.append(P)
        allv = np.concatenate(out_vecs).astype(np.float32)
        alli = np.concatenate(out_ids)
        flat = pa.array(allv.ravel(), pa.float32())
        offs = pa.array(np.arange(0, (len(alli) + 1) * DIM, DIM, dtype=np.int32))
        return pa.table(
            {
                "doc_id": pa.array(alli, pa.int64()),
                "emb": pa.ListArray.from_arrays(offs, flat),
            }
        )

    emb_ds = rd.read_parquet(extract_out, columns=["url"]).map_batches(
        with_ids_url_only := (
            lambda t: pa.table(
                {
                    "doc_id": pa.array(
                        (
                            pd.util.hash_array(
                                np.asarray(t["url"].to_pylist(), dtype=object), categorize=False
                            )
                            >> np.uint64(1)
                        ).astype(np.int64),
                        pa.int64(),
                    )
                }
            )
        ),
        batch_format="pyarrow",
    ).map_batches(to_vec, batch_format="pyarrow")
    srp_out = "/tmp/dc4r_scale/srp_out"
    shutil.rmtree(srp_out, ignore_errors=True)
    t0 = time.time()
    # rbits=24: key space 2^24 so the avg in-key population stays O(1)
    # at 2.16M rows (the default rbits=6 would put ~34k vectors in every
    # key and the O(m^2) screen would melt); bands=12 keeps planted
    # (cos ~= 0.9999996) miss prob ~1e-26
    srp_near_dup_pairs(
        emb_ds, "doc_id", "emb", threshold=0.999, bands=12, rbits=24,
        payload_mode="auto", max_docs_per_key=8192,
    ).write_parquet(srp_out)
    dt = time.time() - t0
    import pyarrow.dataset as pads_srp

    sp = pads_srp.dataset(srp_out).to_table(columns=["id_a", "id_b"])
    spa, spb = sp["id_a"].to_numpy(), sp["id_b"].to_numpy()
    n_sp_planted = int(np.sum((spb - spa == 1) & (spa % 20 == 0)))
    record(
        "embed_srp",
        dt,
        docs_per_sec=n_pages * 1.05 / dt,
        pairs=float(len(spa)),
        planted_found=float(n_sp_planted),
    )

    # ---- 3e. brute-force ANN top-k over the same 2.26M vectors ----------
    # the similarity-search baseline at sf1: broadcast query, per-block
    # partial top-k with the final 4dp comparator, driver merges k rows.
    from deepcrawl4ai_ray.stages.knn import brute_force_topk

    q64 = (pd.util.hash_array(np.arange(DIM, dtype=np.int64) + 7).astype(np.float64) / 2**63) - 1.0
    t0 = time.time()
    ann = brute_force_topk(emb_ds, "doc_id", "emb", q64, k=10)
    dt = time.time() - t0
    record("ann_topk", dt, vecs_per_sec=n_pages * 1.05 / dt, top1=float(ann["cos_sim"].iloc[0]))

    # ---- 3f. persisted IVF index: build once over the 2.26M vectors,
    # then a partition-pruned query reading only nprobe/nlist of it ------
    from deepcrawl4ai_ray.stages.knn import (
        build_ivf_index,
        ivf_topk_indexed,
        train_ivf_centroids,
    )

    ivf_dir = "/tmp/dc4r_scale/ivf_index"
    shutil.rmtree(ivf_dir, ignore_errors=True)
    t0 = time.time()
    # deterministic sample: limit() took whichever blocks landed first,
    # so centroids (and the recall figure) varied run to run; a
    # doc_id-modulus filter fixes the SET and sorting by id fixes the
    # ORDER (kmeans strided init is order-sensitive)
    s_ids = []
    s_vecs = []
    for b in emb_ds.filter(expr="doc_id % 150 == 0").iter_batches(batch_format="pyarrow"):
        s_ids.append(b["doc_id"].to_numpy(zero_copy_only=False))
        s_vecs.append(np.stack(b["emb"].to_numpy(zero_copy_only=False)))
    s_ids = np.concatenate(s_ids)
    order = np.argsort(s_ids)
    sample = np.concatenate(s_vecs).astype(np.float64)[order]
    cents = train_ivf_centroids(sample, nlist=64)
    build_ivf_index(emb_ds, "doc_id", "emb", cents, ivf_dir)
    t_build = time.time() - t0
    t0 = time.time()
    NPROBE = 8
    ivf_hits = ivf_topk_indexed(ivf_dir, "doc_id", "emb", q64, cents, k=10, nprobe=NPROBE)
    t_query = time.time() - t0
    n_files_all = len(glob.glob(os.path.join(ivf_dir, "ivf_list=*", "*.parquet")))
    probed = [int(x) for x in np.argsort(-(cents @ (q64 / np.linalg.norm(q64))))[:NPROBE]]
    n_files_probed = sum(
        len(glob.glob(os.path.join(ivf_dir, f"ivf_list={l}", "*.parquet"))) for l in probed
    )
    record(
        "ivf_index",
        t_build,
        query_sec=t_query,
        files_total=float(n_files_all),
        files_probed=float(n_files_probed),
        top1=float(ivf_hits["cos_sim"].iloc[0]) if len(ivf_hits) else -1.0,
        # recall vs the exact brute-force stage above; uniform random
        # vectors are IVF's WORST case (no cluster structure — true
        # neighbors scatter across lists), so this is a floor
        recall_at_10=float(len(set(ivf_hits["doc_id"]) & set(ann["doc_id"])) / 10.0),
    )

    # ---- 4. PageRank over the full link graph ---------------------------
    from deepcrawl4ai_ray.functions.extract import extract_links
    from deepcrawl4ai_ray.stages.pagerank import pagerank

    def edges(batch: pa.Table) -> pa.Table:
        srcs: list = []
        dsts: list = []
        for u, h in zip(batch["url"].to_pylist(), batch["html"].to_pylist()):
            for link in extract_links(h, u):
                srcs.append(u)
                dsts.append(link)
        return pa.table({"src": pa.array(srcs, pa.string()), "dst": pa.array(dsts, pa.string())})

    pr_out = "/tmp/dc4r_scale/pagerank_out"
    shutil.rmtree(pr_out, ignore_errors=True)
    t0 = time.time()
    edge_ds = rd.read_parquet(pages_path, columns=["url", "html"]).map_batches(
        edges, batch_format="pyarrow"
    )
    pagerank(edge_ds, iters=3).write_parquet(pr_out)
    dt = time.time() - t0
    n_nodes = sum(pq_.read_metadata(f).num_rows for f in glob.glob(f"{pr_out}/*.parquet"))
    record("pagerank", dt, nodes=float(n_nodes))

    # ---- 5. anchor-text aggregation --------------------------------------
    from deepcrawl4ai_ray.stages.anchors import anchor_term_stats

    an_out = "/tmp/dc4r_scale/anchors_out"
    shutil.rmtree(an_out, ignore_errors=True)
    t0 = time.time()
    anchor_term_stats(rd.read_parquet(pages_path, columns=["url", "html"])).write_parquet(an_out)
    dt = time.time() - t0
    n_tgt = sum(pq_.read_metadata(f).num_rows for f in glob.glob(f"{an_out}/*.parquet"))
    record("anchors", dt, pages_per_sec=n_pages / dt, targets=float(n_tgt))

    # ---- 6. flagship training-data pipeline over the 2M-doc corpus ------
    # gate → exact dedup (slim losers + bloom anti, payload map-side) →
    # minhash near-dup removal (bands=8, the sf1 tuning) → sequence
    # packing.  Exercises the bloom-anti shape at 10× bench scale.
    from deepcrawl4ai_ray.pipelines.queries import make_gopher_keep_fn
    from deepcrawl4ai_ray.stages.dedup import exact_dedup_losers
    from deepcrawl4ai_ray.stages.join import bloom_semi_anti
    from deepcrawl4ai_ray.stages.pack import pack_sequences

    tp_out = "/tmp/dc4r_scale/train_pipe_out"
    shutil.rmtree(tp_out, ignore_errors=True)
    t0 = time.time()
    # min_stop=0: the synthetic corpus vocabulary has no English
    # stopwords, so the oracle rule would zero the corpus out
    gated = docs_sig.map_batches(
        make_gopher_keep_fn(min_stop=0), batch_format="pyarrow"
    ).materialize()
    losers = exact_dedup_losers(gated, "doc_id", "text")
    exact_docs = bloom_semi_anti(gated, "doc_id", losers, "doc_id", keep_in=False).materialize()
    nd_pairs = minhash_lsh_pairs(
        exact_docs, "doc_id", "text", threshold=0.9, num_perm=64, bands=8, k=3,
        verify="exact", payload_mode="auto", sig_col="minhash",
    )
    drops = nd_pairs.map_batches(
        lambda t: pa.table({"doc_id": t["id_b"].cast(pa.int64())}), batch_format="pyarrow"
    )
    survivors = bloom_semi_anti(exact_docs, "doc_id", drops, "doc_id", keep_in=False)
    # resumable sink: atomic per-partition publish — an interrupted proof
    # run resumes paying only for unfinished partitions
    from deepcrawl4ai_ray.stages.resumable import resumable_write_parquet

    wres = resumable_write_parquet(
        pack_sequences(survivors, "doc_id", "text", seq_len=512), tp_out, "doc_id",
        num_partitions=64,
    )
    dt = time.time() - t0
    n_seq = wres["rows_written"]
    record("train_pipe", dt, docs_per_sec=n_pages / dt, packed_rows=float(n_seq))

    out["rss_mb"]["end"] = rss_mb()
    out["rss_anon_mb"]["end"] = anon_mb()
    ray.shutdown()
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__), "..", "SCALE_PROOF_r4.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
