"""Conformance at the sf-small tier (FIXTURES.md: ~5k pages / 100 hosts):
byte-identical extraction, exact dedup, robots enforcement on a corpus
an order of magnitude larger than the unit tier."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def small_crawl(ray_session):
    from deepcrawl4ai_ray.frontier.crawler import Crawler, CrawlConfig, read_crawl_output
    from deepcrawl4ai_ray.sources.corpus import ensure

    corpus = ensure("small")
    out = "/tmp/dc4r_test/small_crawl"
    shutil.rmtree(out, ignore_errors=True)
    cfg = CrawlConfig(
        num_shards=4, fetch_concurrency=4, max_rounds=7, per_shard_budget=2000,
        round_ms=1_000_000, checkpoint=False,
    )
    c = Crawler(corpus, out, cfg)
    res = c.run()
    c.kill_shards()
    return corpus, res, read_crawl_output(out)


def test_small_scale_progress(small_crawl):
    _, res, out = small_crawl
    assert res["total_fetched"] > 1500
    urls = out.column("url").to_pylist()
    assert len(urls) == len(set(urls))  # exact dedup at scale


def test_small_text_byte_identity(small_crawl):
    corpus, _, out = small_crawl
    pages = pa.concat_tables(
        pq.read_table(f, columns=["url", "text"])
        for f in glob.glob(os.path.join(corpus, "pages", "*.parquet"))
    )
    oracle = dict(zip(pages.column("url").to_pylist(), pages.column("text").to_pylist()))
    ok = out.filter(pc.equal(out["status"], "ok"))
    assert ok.num_rows > 1200
    for u, t in zip(ok.column("url").to_pylist(), ok.column("text").to_pylist()):
        assert t == oracle[u]


def test_small_robots_enforced(small_crawl):
    corpus, _, out = small_crawl
    robots = pq.read_table(os.path.join(corpus, "robots.parquet"))
    denied = {
        h for h, d in zip(robots.column("host").to_pylist(), robots.column("disallow").to_pylist()) if d
    }
    ok = out.filter(pc.equal(out["status"], "ok"))
    for u, h in zip(ok.column("url").to_pylist(), ok.column("host").to_pylist()):
        if h in denied:
            path = u.split(h, 1)[1]
            assert not (path.startswith("/p/1") or path.startswith("/p/2"))
