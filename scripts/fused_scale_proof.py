"""sf1 scale proof for the FUSED crawl→extract round pipeline (r5):
one crawl over the 2M-page corpus with enrich_fingerprints applied
inside each round before the atomic publish — compare against the r4
proof's separate crawl (29.7 s) + extract+enrich (40-46 s) passes.

Usage: python scripts/fused_scale_proof.py [--cpus 32]
Writes SCALE_PROOF_r5_fused.json at the repo root.
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


def anon_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("RssAnon:"):
                return round(int(line.split()[1]) / 1024.0, 1)
    return -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from deepcrawl4ai_ray.sources.corpus import ensure

    corpus = ensure("sf1")

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from deepcrawl4ai_ray.frontier.crawler import CrawlConfig, Crawler

    out_dir = "/tmp/dc4r_scale/fused_crawl"
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CrawlConfig(
        num_shards=8,
        fetch_concurrency=max(2, args.cpus // 4),
        per_shard_budget=200_000,
        max_rounds=8,
        round_ms=10_000_000,
        checkpoint=False,
        enrich_spec=[{"step": "enrich_fingerprints"}],
        events_file=os.path.join("/tmp/dc4r_scale", "fused_events.jsonl"),
    )
    start_anon = anon_mb()
    t0 = time.time()
    c = Crawler(corpus, out_dir, cfg)
    res = c.run()
    dt = time.time() - t0
    c.kill_shards()
    # published pages carry the enrich columns?
    import pyarrow.parquet as pq

    f0 = sorted(glob.glob(os.path.join(out_dir, "pages", "round=*", "*.parquet")))[0]
    cols = pq.read_schema(f0).names
    n_events = sum(1 for _ in open(cfg.events_file))
    out = {
        "metric": "fused_crawl_extract_sf1",
        "num_cpus": args.cpus,
        "pages_fetched": res["total_fetched"],
        "sec": round(dt, 1),
        "pages_per_sec": round(res["total_fetched"] / dt, 1),
        "enriched_columns_present": sorted(
            set(cols) & {"n_tokens", "minhash", "simhash", "stopword_ratio"}
        ),
        "round_events_pushed": n_events,
        "driver_anon_mb": {"start": start_anon, "end": anon_mb()},
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__), "..", "SCALE_PROOF_r5_fused.json"), "w") as f:
        json.dump(out, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
