"""Generate the frozen conformance fixtures (FIXTURES.md §4) for the
tiny-corpus crawl: crawl order, final seen set, per-url text hashes.

Run once after intentional spec changes (extractor, ordering,
politeness), then commit tests/fixtures/tiny_crawl.json.  The replay
test (tests/test_fixtures.py) fails on any unintended drift.
"""

import hashlib
import json
import os
import shutil
import sys

sys.path.insert(0, ".")

FIXTURE_PATH = "tests/fixtures/tiny_crawl.json"
CFG = dict(num_shards=2, fetch_concurrency=2, max_rounds=6, per_shard_budget=500)


def crawl_and_summarize():
    from deepcrawl4ai_ray.frontier.crawler import Crawler, CrawlConfig, read_crawl_output
    from deepcrawl4ai_ray.sources.corpus import ensure

    corpus = ensure("tiny")
    out_dir = "/tmp/dc4r_fixture_crawl"
    shutil.rmtree(out_dir, ignore_errors=True)
    c = Crawler(corpus, out_dir, CrawlConfig(**CFG, checkpoint=False))
    c.run()
    c.kill_shards()
    out = read_crawl_output(out_dir)
    urls = out.column("url").to_pylist()
    rounds = out.column("round").to_pylist()
    texts = out.column("text").to_pylist()
    status = out.column("status").to_pylist()
    order_digest = hashlib.md5("\n".join(urls).encode()).hexdigest()
    text_digest = hashlib.md5("\n".join(texts).encode()).hexdigest()
    return {
        "config": CFG,
        "n_fetched": len(urls),
        "order_first_50": urls[:50],
        "rounds_first_50": rounds[:50],
        "order_md5": order_digest,
        "seen_set_md5": hashlib.md5("\n".join(sorted(urls)).encode()).hexdigest(),
        "texts_md5": text_digest,
        "status_counts": {s: status.count(s) for s in sorted(set(status))},
    }


def main():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    summary = crawl_and_summarize()
    os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
    with open(FIXTURE_PATH, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {FIXTURE_PATH}: {summary['n_fetched']} pages, order_md5={summary['order_md5']}")
    ray.shutdown()


if __name__ == "__main__":
    main()
