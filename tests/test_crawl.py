"""E2E crawl conformance: byte-identical text, deterministic ordering,
seen-set stability, checkpoint-resume equivalence (FIXTURES.md §4-5)."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from deepcrawl4ai_ray.frontier.crawler import Crawler, CrawlConfig, read_crawl_output

CFG = dict(num_shards=2, fetch_concurrency=2, max_rounds=6, per_shard_budget=500)


def _run(corpus, out_dir, **over):
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CrawlConfig(**{**CFG, **over})
    c = Crawler(corpus, out_dir, cfg)
    res = c.run()
    c.kill_shards()
    return res, read_crawl_output(out_dir)


@pytest.fixture(scope="module")
def crawl_out(ray_session, tiny_corpus):
    res, out = _run(tiny_corpus, "/tmp/dc4r_test/crawl_a")
    return res, out, tiny_corpus


class TestCrawlE2E:
    def test_progress_and_schema(self, crawl_out):
        res, out, _ = crawl_out
        assert res["total_fetched"] > 50
        assert out.num_rows == res["total_fetched"]
        assert set(out.column_names) >= {
            "fetch_seq", "round", "url", "host", "priority", "status", "text", "lang",
        }

    def test_fetch_seq_dense_and_ordered(self, crawl_out):
        _, out, _ = crawl_out
        seqs = out.column("fetch_seq").to_pylist()
        assert seqs == list(range(len(seqs)))

    def test_text_byte_identical_vs_oracle(self, crawl_out):
        """The per-row invariant: extracted text == corpus oracle, per url."""
        _, out, corpus = crawl_out
        pages = pa.concat_tables(
            pq.read_table(f, columns=["url", "text", "lang"])
            for f in glob.glob(os.path.join(corpus, "pages", "*.parquet"))
        )
        oracle = dict(zip(pages.column("url").to_pylist(), pages.column("text").to_pylist()))
        ok = out.filter(pc.equal(out["status"], "ok"))
        assert ok.num_rows > 0
        for u, t in zip(ok.column("url").to_pylist(), ok.column("text").to_pylist()):
            assert t == oracle[u], f"text mismatch for {u}"

    def test_no_url_fetched_twice(self, crawl_out):
        _, out, _ = crawl_out
        urls = out.column("url").to_pylist()
        assert len(urls) == len(set(urls))

    def test_robots_never_fetched(self, crawl_out):
        _, out, corpus = crawl_out
        robots = pq.read_table(os.path.join(corpus, "robots.parquet"))
        denied_hosts = {
            h for h, d in zip(robots.column("host").to_pylist(), robots.column("disallow").to_pylist()) if d
        }
        ok = out.filter(pc.equal(out["status"], "ok"))
        for u, h in zip(ok.column("url").to_pylist(), ok.column("host").to_pylist()):
            if h in denied_hosts:
                path = u.split(h, 1)[1]
                assert not (path.startswith("/p/1") or path.startswith("/p/2"))

    def test_deterministic_replay(self, crawl_out, tiny_corpus):
        """Same seeds + budget → identical crawl order and seen set."""
        _, out_a, _ = crawl_out
        _, out_b = _run(tiny_corpus, "/tmp/dc4r_test/crawl_b")
        assert out_a.column("url").to_pylist() == out_b.column("url").to_pylist()
        assert out_a.column("round").to_pylist() == out_b.column("round").to_pylist()
        assert out_a.column("priority").to_pylist() == out_b.column("priority").to_pylist()

    def test_manifest_lineage(self, crawl_out):
        res, out, _ = crawl_out
        man = pa.concat_tables(
            pq.read_table(f) for f in glob.glob("/tmp/dc4r_test/crawl_a/manifest/*.parquet")
        )
        # every round × shard has a row; fetched sums to total
        assert sum(man.column("fetched").to_pylist()) == res["total_fetched"]
        assert man.num_rows == res["rounds"] * CFG["num_shards"]


class TestResume:
    def test_resume_equivalence(self, ray_session, tiny_corpus):
        """run(k rounds) + resume ≡ uninterrupted run (SURVEY.md §5)."""
        full_res, full = _run(tiny_corpus, "/tmp/dc4r_test/full", max_rounds=5)

        out_dir = "/tmp/dc4r_test/resumed"
        shutil.rmtree(out_dir, ignore_errors=True)
        c1 = Crawler(tiny_corpus, out_dir, CrawlConfig(**{**CFG, "max_rounds": 2}))
        c1.run()
        c1.kill_shards()

        c2 = Crawler.resume(tiny_corpus, out_dir, CrawlConfig(**{**CFG, "max_rounds": 5}))
        assert c2.next_round == 2
        c2.run()
        c2.kill_shards()
        resumed = read_crawl_output(out_dir)

        assert resumed.column("url").to_pylist() == full.column("url").to_pylist()
        assert resumed.column("fetch_seq").to_pylist() == full.column("fetch_seq").to_pylist()
        assert resumed.column("round").to_pylist() == full.column("round").to_pylist()
