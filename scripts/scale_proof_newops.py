"""sf1 scale proof for the late-round-4 operator family: paragraph
dedup, canonical-URL variant dedup, weighted (sequential-Poisson)
sampling, and the incremental BM25 index build→append→query path —
run over the ~2M-page sf1 corpus at 32 cpus with the same driver
peak-RSS / RssAnon discipline as scripts/scale_proof.py (flat RssAnon
across stages = no hidden driver-side materialization).

Usage: python scripts/scale_proof_newops.py [--tier sf1] [--cpus 32]
Writes one JSON line to stdout and SCALE_PROOF_r4_newops.json.
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
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1)


def anon_mb() -> float:
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

    corpus = ensure(args.tier)

    import pyarrow.parquet as pq_

    n_pages = sum(
        pq_.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(corpus, "pages", "*.parquet"))
    )

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False, logging_level="ERROR")
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.target_max_block_size = 8 * 1024 * 1024

    out: dict = {
        "metric": "scale_proof_newops",
        "tier": args.tier,
        "num_cpus": args.cpus,
        "pages": n_pages,
        "stages": {},
        "rss_mb": {"start": rss_mb()},
        "rss_anon_mb": {"start": anon_mb()},
    }

    def record(name: str, secs: float, **kw) -> None:
        out["stages"][name] = {"sec": round(secs, 1), **{k: round(v, 1) for k, v in kw.items()}}
        out["rss_mb"][name] = rss_mb()
        out["rss_anon_mb"][name] = anon_mb()
        print(
            f"[scale_proof_newops] {name}: {secs:.1f}s {kw} peak_rss={rss_mb()} MB"
            f" anon_rss={anon_mb()} MB",
            file=sys.stderr,
        )

    pages_path = os.path.join(corpus, "pages")

    # ---- 0. extract text once (input to the doc-level stages) ----------
    def extract_batch(batch: pa.Table) -> pa.Table:
        from deepcrawl4ai_ray.functions.extract import extract_text

        texts = [extract_text(h) for h in batch["html"].to_pylist()]
        h = pd.util.hash_array(np.asarray(batch["url"].to_pylist(), dtype=object), categorize=False)
        ids = (h >> np.uint64(1)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    docs_out = "/tmp/dc4r_scale/newops_docs"
    shutil.rmtree(docs_out, ignore_errors=True)
    t0 = time.time()
    (
        rd.read_parquet(pages_path, columns=["url", "html"])
        .map_batches(extract_batch, batch_format="pyarrow", batch_size=512)
        .write_parquet(docs_out)
    )
    record("extract", time.time() - t0, pages_per_sec=n_pages / (time.time() - t0))

    # ---- 1. paragraph dedup over 2M extracted docs ----------------------
    # template-heavy synthetic pages repeat whole lines corpus-wide, so
    # the winner groupby sees real skew (boilerplate paragraphs with
    # ~10^5 copies) — exactly what the block-local pre-min is for
    from deepcrawl4ai_ray.stages.paradedup import paragraph_dedup

    para_out = "/tmp/dc4r_scale/newops_para"
    shutil.rmtree(para_out, ignore_errors=True)
    t0 = time.time()
    paragraph_dedup(rd.read_parquet(docs_out)).write_parquet(para_out)
    dt = time.time() - t0
    stats = rd.read_parquet(para_out, columns=["n_paras", "n_dropped"]).sum(
        ["n_paras", "n_dropped"]
    )
    record(
        "paragraph_dedup",
        dt,
        docs_per_sec=n_pages / dt,
        paras=float(stats["sum(n_paras)"]),
        dropped=float(stats["sum(n_dropped)"]),
    )

    # ---- 2. canonical-URL dedup over ~2x variant spellings --------------
    from deepcrawl4ai_ray.stages.dedup import canonical_url_dedup

    def variants(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        h = pd.util.hash_array(np.asarray(urls, dtype=object), categorize=False)
        outl: list = []
        for u, hv in zip(urls, h):
            outl.append(u)
            if hv % 2 == 0:
                outl.append(u.replace("https://", "http://") + "?utm_source=feed")
            if hv % 3 == 0:
                outl.append(u.replace("https://", "https://www.") + "/")
        return pa.table({"url": pa.array(outl, pa.string())})

    curl_out = "/tmp/dc4r_scale/newops_curl"
    shutil.rmtree(curl_out, ignore_errors=True)
    t0 = time.time()
    canonical_url_dedup(
        rd.read_parquet(pages_path, columns=["url"]).map_batches(
            variants, batch_format="pyarrow"
        )
    ).write_parquet(curl_out)
    dt = time.time() - t0
    n_groups = sum(pq_.read_metadata(f).num_rows for f in glob.glob(f"{curl_out}/*.parquet"))
    record("canonical_url", dt, urls_per_sec=n_pages * 1.83 / dt, groups=float(n_groups))

    # ---- 3. weighted sample (sequential Poisson) k=10k by length --------
    from deepcrawl4ai_ray.stages.sample import weighted_sample_topk

    def lengths(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pc.cast(
                    pc.max_element_wise(pc.utf8_length(batch["text"]), 1), pa.int64()
                ),
            }
        )

    t0 = time.time()
    samp = weighted_sample_topk(
        rd.read_parquet(docs_out).map_batches(lengths, batch_format="pyarrow"),
        "doc_id", "n_chars", k=10_000,
    )
    n_samp = samp.count()
    dt = time.time() - t0
    record("weighted_sample", dt, docs_per_sec=n_pages / dt, sampled=float(n_samp))

    # ---- 4. BM25 index: build even half, append odd half, query ---------
    from deepcrawl4ai_ray.stages.textindex import (
        append_text_index,
        bm25_topk_indexed,
        build_text_index,
    )

    idx_dir = "/tmp/dc4r_scale/newops_bm25"
    shutil.rmtree(idx_dir, ignore_errors=True)
    docs = rd.read_parquet(docs_out)

    def parity(keep: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), keep))

        return fn

    t0 = time.time()
    build_text_index(
        docs.map_batches(parity(0), batch_format="pyarrow"), "doc_id", "text", idx_dir, num_buckets=32
    )
    t_build = time.time() - t0
    t0 = time.time()
    append_text_index(
        idx_dir, docs.map_batches(parity(1), batch_format="pyarrow"), "doc_id", "text", num_buckets=32
    )
    t_append = time.time() - t0
    t0 = time.time()
    top = bm25_topk_indexed(idx_dir, "doc_id", ["alpha", "plasma", "window"], k=10, num_buckets=32)
    t_query = time.time() - t0
    record("bm25_build", t_build, docs_per_sec=(n_pages / 2) / t_build)
    record("bm25_append", t_append, docs_per_sec=(n_pages / 2) / t_append)
    record("bm25_query", t_query, hits=float(len(top)))

    out["rss_mb"]["end"] = rss_mb()
    out["rss_anon_mb"]["end"] = anon_mb()
    line = json.dumps(out)
    print(line)
    with open(os.path.join(os.path.dirname(__file__), "..", "SCALE_PROOF_r4_newops.json"), "w") as f:
        f.write(line + "\n")
    ray.shutdown()


if __name__ == "__main__":
    main()
