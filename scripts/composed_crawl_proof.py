"""Composed production-config crawl at sf1 — every crawl feature
interacting at 10× bench scale (the r3 composed run was bench-scale):

politeness (virtual-clock token buckets from the robots table) +
checkpointing + per-URL retry with 2% flaky-fetch injection +
ADAPTIVE mid-crawl salting of the hot host, 12 politeness-bounded
rounds over the ~2.05M-page / 8000-host sf1 corpus.

Checks (hard assertions, not just timings):
- every fetched url appears EXACTLY once;
- every flaky-but-retryable url that succeeded did so on exactly its
  configured retry attempt; non-flaky rows fetched on attempt 0;
- dead letters (retry-exhausted) are unique;
- after salting, the hot host's queue depth spreads across ≥2 shards.

Writes COMPOSED_CRAWL_r4.json at the repo root.

Usage: python scripts/composed_crawl_proof.py [--tier sf1] [--cpus 32]
"""

from __future__ import annotations

import argparse
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


FLAKY = {"mod": 50, "fail_attempts": 1}  # 2% of urls fail once, then succeed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="sf1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=12)
    args = ap.parse_args()

    from deepcrawl4ai_ray.sources.corpus import ensure

    corpus = ensure(args.tier)

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False, logging_level="ERROR")
    import numpy as np

    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa

    from deepcrawl4ai_ray.frontier.crawler import CrawlConfig, Crawler, read_dead_letters
    from deepcrawl4ai_ray.functions.urlnorm import hash64

    out_dir = "/tmp/dc4r_scale/composed_crawl"
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CrawlConfig(
        num_shards=8,
        fetch_concurrency=max(2, args.cpus // 4),
        per_shard_budget=200_000,
        max_rounds=args.rounds,
        round_ms=10_000,  # politeness ON: per-host quota = round_ms / crawl_delay_ms
        checkpoint=True,
        max_retries=2,
        extra={"flaky": FLAKY},
    )
    def drive(crawler, start_r, stop_r, want_depths):
        depths = None
        r = start_r
        while r < stop_r:
            res = crawler.run_round(r)
            r += 1
            crawler.next_round = r
            if r == 3:
                crawler.salt_host("host-0.example", 4)  # adaptive mid-crawl salting
            if want_depths and r == 5:
                depths = ray.get(
                    [s.host_queue_depth.remote("host-0.example") for s in crawler.shards]
                )
            if res["fetched"] == 0:
                break
        crawler._join_writer()
        return r, depths

    c = Crawler(corpus, out_dir, cfg)
    c.offer_seeds()
    t0 = time.time()
    r, depths = drive(c, 0, cfg.max_rounds, want_depths=True)
    wall = time.time() - t0
    crawl_anon = anon_mb()  # measured BEFORE the driver-side verification read
    c.kill_shards()

    # ---- checkpoint/resume twin: same config, driver "dies" after round
    # 6, a fresh Crawler resumes from the checkpoint and finishes — the
    # fetched url set must be BYTE-IDENTICAL to the uninterrupted run's
    resume_dir = "/tmp/dc4r_scale/composed_crawl_resumed"
    shutil.rmtree(resume_dir, ignore_errors=True)
    t0 = time.time()
    c1 = Crawler(corpus, resume_dir, cfg)
    c1.offer_seeds()
    drive(c1, 0, 6, want_depths=False)
    c1.kill_shards()  # driver death: only the checkpoint survives
    c2 = Crawler.resume(corpus, resume_dir, cfg)
    drive(c2, c2.next_round, cfg.max_rounds, want_depths=False)
    resume_wall = time.time() - t0
    c2.kill_shards()

    import glob as _glob

    import pyarrow.parquet as pq

    # verification harness: column-pruned driver read of the slim columns
    out = pa.concat_tables(
        [
            pq.read_table(f, columns=["url", "status", "retries"])
            for f in sorted(_glob.glob(os.path.join(out_dir, "pages", "round=*", "*.parquet")))
        ],
        promote_options="default",
    )
    urls = np.asarray(out.column("url").to_pylist(), dtype=object)
    status = np.asarray(out.column("status").to_pylist(), dtype=object)
    retries = np.asarray(out.column("retries").to_pylist())
    assert len(urls) == len(set(urls)), "a url was fetched more than once"
    flaky_mask = (hash64(urls) % np.uint64(FLAKY["mod"])) == 0
    ok = status == "ok"
    assert (retries[flaky_mask & ok] == FLAKY["fail_attempts"]).all(), "flaky retry count wrong"
    assert (flaky_mask & ok).sum() > 0, "no flaky url recovered"
    assert (retries[~flaky_mask] == 0).all(), "non-flaky url paid a retry"
    dead = read_dead_letters(out_dir).column("url").to_pylist()
    assert len(dead) == len(set(dead)), "a dead letter was written twice"
    assert depths is not None and sum(1 for d in depths if d > 0) >= 2, f"no salt spread: {depths}"

    resumed_urls = pa.concat_tables(
        [
            pq.read_table(f, columns=["url"])
            for f in sorted(_glob.glob(os.path.join(resume_dir, "pages", "round=*", "*.parquet")))
        ],
        promote_options="default",
    ).column("url").to_pylist()
    assert len(resumed_urls) == len(set(resumed_urls)), "resume refetched a url"
    assert sorted(resumed_urls) == sorted(urls.tolist()), (
        "resumed crawl's fetched set differs from the uninterrupted run"
    )

    result = {
        "metric": "composed_crawl_proof",
        "tier": args.tier,
        "num_cpus": args.cpus,
        "rounds": r,
        "wall_sec": round(wall, 1),
        "pages_fetched": int(len(urls)),
        "pages_per_sec": round(len(urls) / wall, 1),
        "flaky_recovered": int((flaky_mask & ok).sum()),
        "dead_letters": len(dead),
        "hot_host_shard_depths": depths,
        "resume_twin_wall_sec": round(resume_wall, 1),
        "resume_twin_identical": True,
        "driver_anon_mb": crawl_anon,
        "checks": "exactly_once, retry_counts, dead_letter_unique, salt_spread, resume_set_identity — ALL PASSED",
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(__file__), "..", "COMPOSED_CRAWL_r4.json"), "w") as f:
        json.dump(result, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
