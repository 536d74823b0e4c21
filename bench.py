"""Benchmark harness (driver contract).

Default: ray.init(num_cpus=$RAY_GRAFT_CPUS or 32), run the headline
pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1) plus the
crawl + extract pipelines over the deterministic bench corpus, print
ONE JSON line.

--scaling: run the same job at num_cpus=8 and num_cpus=32 in fresh
processes on the same input and report both throughputs + scaling
efficiency (the sandbox stand-in for the N→4N-node criterion; see
BASELINE.md).  The scaling headline is the compute-bound extract
pipeline (fetch→extract→stats→parquet over the bench corpus) and the
crawl loop in politeness-free mode — politeness itself is a semantic
rate cap, deliberately independent of cluster size.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time


def _pages_count(corpus: str) -> int:
    import pyarrow.parquet as pq

    return sum(pq.read_metadata(f).num_rows for f in glob.glob(os.path.join(corpus, "pages", "*.parquet")))


def _wet_one(args):
    import pyarrow.parquet as pq

    from deepcrawl4ai_ray.sources.warc import write_wet_file

    src, dst = args
    t = pq.read_table(src, columns=["url", "text"])
    write_wet_file(dst, t["url"].to_pylist(), t["text"].to_pylist())
    return dst


def _ensure_wet_corpus(corpus: str) -> str:
    """pages parquet → one .warc.wet.gz per parquet file, cached by the
    corpus signature (mtime+size of every pages file)."""
    import hashlib
    from multiprocessing import Pool

    files = sorted(glob.glob(os.path.join(corpus, "pages", "*.parquet")))
    sig = "|".join(f"{f}:{os.stat(f).st_mtime_ns}:{os.stat(f).st_size}" for f in files)
    out = f"/tmp/dc4r_wet_bench/{hashlib.md5(sig.encode()).hexdigest()[:12]}"
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        jobs = [
            (f, os.path.join(out, f"part-{i:04d}.warc.wet.gz")) for i, f in enumerate(files)
        ]
        with Pool(min(16, len(jobs) or 1)) as p:
            p.map(_wet_one, jobs)
        open(done, "w").close()
    return out


def run_bench(num_cpus: int, sf_dir: str) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    # smaller blocks: the hot-host bucket file otherwise yields one
    # multi-second straggler task (skew); 4 MiB keeps max task ~0.5 s
    ctx.target_max_block_size = 4 * 1024 * 1024

    from deepcrawl4ai_ray.frontier.crawler import Crawler, CrawlConfig
    from deepcrawl4ai_ray.pipelines.queries import QUERIES
    from deepcrawl4ai_ray.sources.corpus import ensure

    results: dict = {"queries": {}}
    tier = os.environ.get("DCR_BENCH_TIER", "bench")
    corpus = ensure(tier)
    n_pages = _pages_count(corpus)

    # warm OS page cache so we measure compute+shuffle, not first disk read
    rd.read_parquet(os.path.join(corpus, "pages"), columns=["url"]).count()

    # ---- extract+enrich pipeline (the compute-bound scaling headline):
    # html → text → token count, quality metrics, minhash signature,
    # simhash — the realistic per-page training-data transform chain ----
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def enrich_batch(batch: pa.Table) -> pa.Table:
        # stateless task; kernel caches (minhash coefficients, compiled
        # regexes) live in module globals of long-lived worker processes
        from deepcrawl4ai_ray.functions import hashing as H
        from deepcrawl4ai_ray.functions.extract import extract_text
        from deepcrawl4ai_ray.functions.textstats import quality_batch

        texts = [extract_text(h) for h in batch["html"].to_pylist()]
        t = pa.array(texts, pa.string())
        n_tok = pc.cast(pc.add(pc.count_substring(t, " "), 1), pa.int64())
        # token hashes computed ONCE per doc, shared by minhash + simhash
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

    # repeat factor amortizes fixed pipeline-launch cost over more input
    # (the scaling run uses 3 — on a real N→4N cluster the input would be
    # 100 TB and the fixed cost invisible; see BASELINE.md)
    repeat = int(os.environ.get("DCR_BENCH_REPEAT", "1"))
    out_dir = "/tmp/dc4r_bench/extract_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    ds = rd.read_parquet(os.path.join(corpus, "pages"), columns=["url", "html"])
    for _ in range(repeat - 1):
        ds = ds.union(rd.read_parquet(os.path.join(corpus, "pages"), columns=["url", "html"]))
    (
        ds.map_batches(enrich_batch, batch_format="pyarrow", batch_size=512)
        .write_parquet(out_dir)
    )
    t_extract = time.time() - t0
    results["extract_pages_per_sec"] = round(n_pages * repeat / t_extract, 1)
    results["queries"]["extract_pipeline"] = round(t_extract, 3)

    # ---- WET ingestion (the Common-Crawl source path) --------------------
    # corpus pages re-serialized once (cached) as multi-member-gzip WET
    # archives; measures the from-scratch WARC datasource's parallel
    # read+parse throughput (one task per archive, the 100-TB shape).
    if not os.environ.get("DCR_BENCH_SKIP_QUERIES"):
        from deepcrawl4ai_ray.sources.warc import read_wet

        wet_dir = _ensure_wet_corpus(corpus)
        t0 = time.time()
        wet_ds = read_wet(wet_dir)
        n_wet = wet_ds.count()
        mb = wet_ds.sum("content_length") / 1e6
        t_wet = time.time() - t0
        results["queries"]["wet_read"] = round(t_wet, 3)
        results["wet_pages_per_sec"] = round(n_wet / t_wet, 1)
        results["wet_mb_per_sec"] = round(mb / t_wet, 1)

    # ---- crawl loop (politeness-free throughput mode) -------------------
    crawl_out = "/tmp/dc4r_bench/crawl_out"
    shutil.rmtree(crawl_out, ignore_errors=True)
    cfg = CrawlConfig(
        num_shards=8,
        fetch_concurrency=max(2, num_cpus // 4),
        per_shard_budget=60_000 if tier == "benchx3" else 20_000,
        max_rounds=6,
        round_ms=10_000_000,  # politeness quota effectively unbounded
        checkpoint=False,
    )
    t0 = time.time()
    c = Crawler(corpus, crawl_out, cfg)
    crawl_res = c.run()
    t_crawl = time.time() - t0
    import pyarrow.parquet as pq

    man_files = glob.glob(os.path.join(crawl_out, "manifest", "*.parquet"))
    inserts = sum(
        sum(pq.read_table(f, columns=["inserts"])["inserts"].to_pylist()) for f in man_files
    )
    c.kill_shards()
    results["queries"]["crawl_pipeline"] = round(t_crawl, 3)
    results["crawl_pages_per_sec"] = round(crawl_res["total_fetched"] / t_crawl, 1)
    results["crawl_pages_fetched"] = crawl_res["total_fetched"]
    results["frontier_inserts_per_sec"] = round(inserts / t_crawl, 1)

    # ---- FUSED crawl→extract (enrich_spec in the round pipeline): pages
    # publish already fingerprinted — vs crawl_pipeline + a separate
    # enrich pass re-reading the whole published corpus ------------------
    if not os.environ.get("DCR_BENCH_SKIP_QUERIES"):
        fused_out = "/tmp/dc4r_bench/crawl_fused_out"
        shutil.rmtree(fused_out, ignore_errors=True)
        import dataclasses

        fused_cfg = dataclasses.replace(cfg, enrich_spec=[{"step": "enrich_fingerprints"}])
        t0 = time.time()
        cf = Crawler(corpus, fused_out, fused_cfg)
        fused_res = cf.run()
        t_fused = time.time() - t0
        cf.kill_shards()
        results["queries"]["crawl_extract_fused"] = round(t_fused, 3)
        results["crawl_fused_pages_per_sec"] = round(
            fused_res["total_fetched"] / t_fused, 1
        )

    # ---- generic operator queries over $GRAFT_SF_DIR --------------------
    if os.environ.get("DCR_BENCH_SKIP_QUERIES"):  # scaling legs: headline only
        results.update(
            {
                # no operator queries ran on this leg — report the scaling
                # headline as THE metric (not a misleading 0-query suite sum)
                "metric": "scaling_headline_sec",
                "value": round(t_extract + t_crawl, 3),
                "unit": "sec",
                "sf": sf_dir,
                "num_cpus": num_cpus,
                "scaling_headline_sec": round(t_extract + t_crawl, 3),
                "bench_corpus_pages": n_pages,
            }
        )
        ray.shutdown()
        return results

    bench_queries = [
        "q1_lineitem_agg",
        "q3_top_revenue",
        "events_hourly",
        "user_sessions",
        "token_stats_by_lang",
        "dedup_exact_docs",
        "minhash_near_dups",
        "training_data_pipeline",
        "encoded_docs",
        "ngram_perplexity",
        "knn_cosine_top10",
        "embedding_label_stats",
        "image_decode_meta",
        "para_deduped_docs",
        "weighted_doc_sample",
        "fineweb_pipeline",
        "semdedup_docs",
        "knn_join_top5",
        "hll_user_registers",
        "cms_user_est",
        "corpus_report",
        "image_real_decode_meta",
        "audio_wav_features",
    ]
    for name in bench_queries:
        t0 = time.time()
        res = QUERIES[name](sf_dir)
        if isinstance(res, rd.Dataset):
            # Dataset-returning operators (dedup pair sets) are lazy —
            # consume by writing parquet, the at-scale sink
            sink = f"/tmp/dc4r_bench/q_{name}"
            shutil.rmtree(sink, ignore_errors=True)
            res.write_parquet(sink)
        results["queries"][name] = round(time.time() - t0, 3)

    total = round(sum(results["queries"].values()), 3)
    results.update(
        {
            "metric": "pipeline_suite_sec",
            "value": total,
            "unit": "sec",
            "sf": sf_dir,
            "num_cpus": num_cpus,
            "scaling_headline_sec": round(t_extract + t_crawl, 3),
            "bench_corpus_pages": n_pages,
        }
    )
    ray.shutdown()
    return results


def host_ceiling() -> dict:
    """Control experiment: the HOST's own parallel-scaling ceiling.

    Runs the identical per-page kernel (extract + minhash + simhash)
    under plain multiprocessing — no Ray, preloaded in-memory input,
    perfectly even chunks — at 1/4/16/32 procs.  Any efficiency loss
    here is the machine (shared memory subsystem), not the engine;
    engine efficiency should be judged relative to this ceiling (a real
    N→4N-node cluster adds memory bandwidth with nodes; this box does
    not).  Results recorded in BASELINE.md.
    """
    import glob as _glob

    import pyarrow.parquet as pq
    from multiprocessing import Pool

    from deepcrawl4ai_ray.sources.corpus import ensure

    corpus = ensure("bench")
    files = sorted(_glob.glob(os.path.join(corpus, "pages", "*.parquet")))[:200]
    htmls = [h for f in files for h in pq.read_table(f, columns=["html"])["html"].to_pylist()][:60000]

    out = {"metric": "host_ceiling_pages_per_sec", "unit": "pages/s", "kernel": "extract+minhash+simhash"}
    for n in (1, 4, 16, 32):
        bounds = [(i * len(htmls) // (n * 4), (i + 1) * len(htmls) // (n * 4)) for i in range(n * 4)]
        t0 = time.time()
        with Pool(n, initializer=_hc_init, initargs=(htmls,)) as p:
            total = sum(p.map(_hc_work, bounds))
        out[f"procs_{n}"] = round(total / (time.time() - t0), 1)
    out["host_eff_4_to_16"] = round((out["procs_16"] / out["procs_4"]) / 4, 3)
    return out


def _hc_init(data):
    global _HC_DATA
    _HC_DATA = data


def _hc_work(args):
    lo, hi = args
    from deepcrawl4ai_ray.functions import hashing as H
    from deepcrawl4ai_ray.functions.extract import extract_text

    n = 0
    for h in _HC_DATA[lo:hi]:
        t = extract_text(h)
        th = H.token_hashes(t)
        H.minhash_signature_fast(H.shingles(th), 64)
        H.simhash64(th)
        n += 1
    return n


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--host-ceiling" in sys.argv:
        print(json.dumps(host_ceiling()))
        return

    if "--scaling" in sys.argv:
        import subprocess

        def run_once(ncpu: int) -> dict:
            # scaling runs use the 3×-round-weight corpus (real 3× pages,
            # not a re-union of the same input) so fixed per-round costs
            # are amortized as on a real cluster's long rounds
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(ncpu),
                DCR_BENCH_TIER="benchx3",
                DCR_BENCH_SKIP_QUERIES="1",
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--once"],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            return json.loads(out.strip().splitlines()[-1])

        # N → 4N pair: 4 and 16 CPUs.  At 32 workers this single shared
        # box hits scheduler-tail + neighbor-noise effects a real
        # 4N-NODE cluster (with 4× the memory bandwidth and NICs) does
        # not have; 4→16 keeps the measurement in the regime where
        # parallel efficiency reflects the engine, not the host.  The
        # 8→32 numbers are recorded in BASELINE.md alongside.
        #
        # Paired protocol: run (lo, hi) back-to-back, three pairs, and
        # take the MEDIAN pairwise efficiency — this shared box has
        # ±40% slow-drift neighbor noise; adjacent-in-time pairing
        # cancels the drift, median rejects one bad pair.
        n_lo, n_hi = 4, 16
        pairs = []
        for _ in range(3):
            lo, hi = run_once(n_lo), run_once(n_hi)
            e = (lo["scaling_headline_sec"] / hi["scaling_headline_sec"]) / (n_hi / n_lo)
            pairs.append((e, lo, hi))
        pairs.sort(key=lambda p: p[0])
        eff, lo, hi = pairs[1]  # median pair
        t_lo = lo["scaling_headline_sec"]
        t_hi = hi["scaling_headline_sec"]
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "num_cpus_lo": n_lo,
                    "num_cpus_hi": n_hi,
                    "sec_lo": t_lo,
                    "sec_hi": t_hi,
                    "crawl_pages_per_sec_lo": lo["crawl_pages_per_sec"],
                    "crawl_pages_per_sec_hi": hi["crawl_pages_per_sec"],
                    "extract_pages_per_sec_lo": lo["extract_pages_per_sec"],
                    "extract_pages_per_sec_hi": hi["extract_pages_per_sec"],
                    "frontier_inserts_per_sec_hi": hi["frontier_inserts_per_sec"],
                    "pair_efficiencies": [round(p[0], 3) for p in pairs],
                }
            )
        )
        return

    # Default (official) mode: median-of-N fresh-process runs — this
    # shared box shows ±40% run-to-run noise (BASELINE.md), so a single
    # run mis-states the engine (r2's official artifact was a bad-window
    # sample).  Each run is a fresh process (cold Ray session, same
    # discipline as --scaling); the emitted line is the median run's full
    # detail plus min/max spread fields.  DCR_BENCH_RUNS=1 for quick
    # iteration; "--once" = in-process single run (child mode).
    if "--once" in sys.argv or os.environ.get("DCR_BENCH_ONCE"):
        print(json.dumps(run_bench(num_cpus, sf_dir)))
        return

    import subprocess

    n_runs = int(os.environ.get("DCR_BENCH_RUNS", "3"))
    if n_runs <= 1:
        print(json.dumps(run_bench(num_cpus, sf_dir)))
        return
    runs = []
    for _ in range(n_runs):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--once"],
            env=dict(os.environ),
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        runs.append(json.loads(out.strip().splitlines()[-1]))
    runs.sort(key=lambda r: r["value"])
    med = runs[len(runs) // 2]
    med["value_runs"] = [r["value"] for r in sorted(runs, key=lambda r: r["value"])]
    med["value_min"] = runs[0]["value"]
    med["value_max"] = runs[-1]["value"]
    med["runs"] = n_runs
    print(json.dumps(med))


if __name__ == "__main__":
    main()
