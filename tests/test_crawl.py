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


class TestRetryDeadLetter:
    """Per-URL retry + dead-letter (reference utils.py:383-399 retry /
    storage.py:200-235): transient failures converge, exhausted urls land
    in dead_letter exactly once, resume preserves retry counts."""

    FLAKY = {"mod": 5, "fail_attempts": 2}

    def test_flaky_converges(self, ray_session, tiny_corpus):
        """Urls failing twice then succeeding must appear in the output
        exactly once with status ok and oracle-identical text."""
        from deepcrawl4ai_ray.frontier.crawler import read_dead_letters
        from deepcrawl4ai_ray.functions.urlnorm import hash64
        import numpy as np

        res, out = _run(
            tiny_corpus,
            "/tmp/dc4r_test/retry_ok",
            max_rounds=24,
            max_retries=3,
            extra={"flaky": self.FLAKY},
        )
        urls = np.asarray(out.column("url").to_pylist(), dtype=object)
        assert len(urls) == len(set(urls))  # still exactly once each
        flaky_mask = (hash64(urls) % np.uint64(self.FLAKY["mod"])) == 0
        ok = np.asarray(out.column("status").to_pylist(), dtype=object) == "ok"
        retries = np.asarray(out.column("retries").to_pylist())
        # every flaky-but-retryable url eventually succeeded on attempt 2
        assert (retries[flaky_mask & ok] == self.FLAKY["fail_attempts"]).all()
        assert (flaky_mask & ok).sum() > 0
        # non-flaky rows were fetched on attempt 0
        assert (retries[~flaky_mask] == 0).all()
        # baseline (no flakiness) fetches the same url SET
        _, base = _run(tiny_corpus, "/tmp/dc4r_test/retry_base", max_rounds=24, max_retries=3)
        assert sorted(out.column("url").to_pylist()) == sorted(base.column("url").to_pylist())
        # every dead letter is a GENUINE corpus miss (dangling link), not a
        # recoverable flaky url: flaky and baseline runs dead-letter the
        # exact same url set
        dead_flaky = sorted(read_dead_letters("/tmp/dc4r_test/retry_ok").column("url").to_pylist())
        dead_base = sorted(read_dead_letters("/tmp/dc4r_test/retry_base").column("url").to_pylist())
        assert dead_flaky == dead_base
        corpus_urls = set()
        for f in glob.glob(os.path.join(tiny_corpus, "pages", "*.parquet")):
            corpus_urls |= set(pq.read_table(f, columns=["url"]).column("url").to_pylist())
        assert not set(dead_flaky) & corpus_urls

    def test_exhausted_urls_dead_letter_exactly_once(self, ray_session, tiny_corpus):
        from deepcrawl4ai_ray.frontier.crawler import read_dead_letters
        from deepcrawl4ai_ray.functions.urlnorm import hash64
        import numpy as np

        flaky = {"mod": 5, "fail_attempts": 99}  # never recovers
        res, out = _run(
            tiny_corpus,
            "/tmp/dc4r_test/retry_dead",
            max_rounds=24,
            max_retries=2,
            extra={"flaky": flaky},
        )
        dead = read_dead_letters("/tmp/dc4r_test/retry_dead")
        dead_urls = dead.column("url").to_pylist()
        assert len(dead_urls) == len(set(dead_urls))  # exactly once
        assert dead.num_rows > 0
        assert (np.asarray(dead.column("retries").to_pylist()) == 2).all()
        # dead urls never appear in the pages output
        out_urls = out.column("url").to_pylist()
        assert not set(dead_urls) & set(out_urls)
        # every selected never-recovering url ended in dead_letter, none in
        # pages: flaky urls (hash%5==0) and genuine corpus misses only
        out_flaky = (hash64(np.asarray(out_urls, dtype=object)) % np.uint64(flaky["mod"])) == 0
        out_ok = np.asarray(out.column("status").to_pylist(), dtype=object) == "ok"
        # (robots_denied flaky urls legitimately stay in the output — the
        # injector only flips successful fetches)
        assert not (out_flaky & out_ok).any()
        corpus_urls = set()
        for f in glob.glob(os.path.join(tiny_corpus, "pages", "*.parquet")):
            corpus_urls |= set(pq.read_table(f, columns=["url"]).column("url").to_pylist())
        dead_arr = np.asarray(dead_urls, dtype=object)
        dead_flaky = (hash64(dead_arr) % np.uint64(flaky["mod"])) == 0
        for u, fl in zip(dead_urls, dead_flaky):
            assert fl or u not in corpus_urls  # flaky or a dangling link

    def test_resume_preserves_retry_state(self, ray_session, tiny_corpus):
        """Kill after round 2 mid-retry; resume ≡ uninterrupted run."""
        over = dict(max_rounds=16, max_retries=3, extra={"flaky": self.FLAKY})
        _, full = _run(tiny_corpus, "/tmp/dc4r_test/retry_full", **over)

        out_dir = "/tmp/dc4r_test/retry_resumed"
        shutil.rmtree(out_dir, ignore_errors=True)
        c1 = Crawler(tiny_corpus, out_dir, CrawlConfig(**{**CFG, **over, "max_rounds": 2}))
        c1.run()
        c1.kill_shards()
        c2 = Crawler.resume(tiny_corpus, out_dir, CrawlConfig(**{**CFG, **over}))
        c2.run()
        c2.kill_shards()
        resumed = read_crawl_output(out_dir)
        assert resumed.column("url").to_pylist() == full.column("url").to_pylist()
        assert resumed.column("retries").to_pylist() == full.column("retries").to_pylist()
        assert resumed.column("fetch_seq").to_pylist() == full.column("fetch_seq").to_pylist()


class TestProgressTail:
    def test_tail_sees_all_rows_live(self, ray_session, tiny_corpus):
        """iter_progress (the SSE/NDJSON progress analog) must observe
        every (round, shard) manifest row, in round order, while the
        crawl is STILL RUNNING (live tail, not post-hoc read)."""
        import threading

        from deepcrawl4ai_ray.frontier.crawler import iter_progress

        out_dir = "/tmp/dc4r_test/tail"
        shutil.rmtree(out_dir, ignore_errors=True)
        rows = []
        collector_done = threading.Event()

        def collect():
            # stop_on_complete: drain-then-stop on the _COMPLETE marker —
            # deterministic under any load (no idle-timeout race)
            for row in iter_progress(out_dir, poll_s=0.05, stop_on_complete=True):
                rows.append(row)
            collector_done.set()

        th = threading.Thread(target=collect, daemon=True)
        th.start()
        cfg = CrawlConfig(**{**CFG, "max_rounds": 4})
        c = Crawler(tiny_corpus, out_dir, cfg)
        res = c.run()
        c.kill_shards()
        # generous: under full-suite + shared-box load the collector
        # thread can be starved well past the crawl's own finish
        assert collector_done.wait(timeout=120)
        assert len(rows) == res["rounds"] * CFG["num_shards"]
        rounds_seen = [r["round"] for r in rows]
        assert rounds_seen == sorted(rounds_seen)  # atomic publish order
        assert sum(r["fetched"] for r in rows) == res["total_fetched"]


class TestDiskModeEquivalence:
    def test_disk_mode_matches_object_store_mode(self, ray_session, tiny_corpus):
        """corpus_in_object_store=False (column-pruned parquet reads +
        per-process LRU instead of pinned plasma refs) must produce the
        identical crawl — the fallback when the corpus exceeds plasma."""
        _, plasma = _run(tiny_corpus, "/tmp/dc4r_test/mode_plasma", max_rounds=4)
        _, disk = _run(
            tiny_corpus, "/tmp/dc4r_test/mode_disk", max_rounds=4, corpus_in_object_store=False
        )
        assert plasma.column("url").to_pylist() == disk.column("url").to_pylist()
        assert plasma.column("text").to_pylist() == disk.column("text").to_pylist()
        assert plasma.column("status").to_pylist() == disk.column("status").to_pylist()


class TestPageStoreSeam:
    def test_custom_page_store_is_a_drop_in(self, ray_session, tiny_corpus):
        """The transport seam: a PageStore serving from a python dict
        must produce byte-identical FetchActor output to the default
        corpus store — robots/status/politeness logic is transport-
        independent (an HTTP client implements the same one method)."""
        import numpy as np

        from deepcrawl4ai_ray.functions.urlnorm import host_buckets
        from deepcrawl4ai_ray.sources.corpus import NUM_HOST_BUCKETS
        from deepcrawl4ai_ray.stages.fetch import FetchActor, PageStore

        pages = pa.concat_tables(
            pq.read_table(f) for f in glob.glob(os.path.join(tiny_corpus, "pages", "*.parquet"))
        )
        lut = {
            u: (h, t, l)
            for u, h, t, l in zip(
                pages["url"].to_pylist(),
                pages["html"].to_pylist(),
                pages["warc_ts"].to_pylist(),
                pages["lang"].to_pylist(),
            )
        }

        class DictStore(PageStore):
            def fetch_bucket(self, urls, bucket):
                hs, ts, ls, found = [], [], [], []
                for u in urls.to_pylist():
                    hit = lut.get(u)
                    found.append(hit is not None)
                    hs.append(hit[0] if hit else None)
                    ts.append(hit[1] if hit else None)
                    ls.append(hit[2] if hit else None)
                return (
                    pa.array(hs, pa.binary()),
                    pa.array(ts, pa.timestamp("us")),
                    pa.array(ls, pa.string()),
                    np.array(found, dtype=bool),
                )

        urls = pages["url"].to_pylist()[:40] + ["https://host-0.example/nonexistent"]
        hosts = np.asarray([u.split("/")[2] for u in urls], dtype=object)
        hb = host_buckets(hosts, NUM_HOST_BUCKETS)
        batch = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": pa.array(list(hosts), pa.string()),
                "round": pa.array(np.zeros(len(urls), dtype=np.int32)),
                "host_bucket": pa.array(hb),
            }
        )
        default_out = FetchActor(tiny_corpus)(batch)
        custom_out = FetchActor(tiny_corpus, page_store=DictStore())(batch)
        assert default_out.equals(custom_out)
        assert "miss" in custom_out["status"].to_pylist()


class TestGracefulStop:
    def test_stop_file_then_resume_equals_uninterrupted(self, ray_session, tiny_corpus):
        """Graceful cancel (reference api.py:484-606): a stop file makes
        run() finish the in-flight round, checkpoint, and exit cleanly;
        resume() then reproduces the uninterrupted crawl exactly —
        regardless of WHICH round the stop landed on."""
        import threading
        import time as _time

        _, full = _run(tiny_corpus, "/tmp/dc4r_test/stop_full", max_rounds=5)

        out_dir = "/tmp/dc4r_test/stop_partial"
        stop_file = "/tmp/dc4r_test/stop_signal"
        shutil.rmtree(out_dir, ignore_errors=True)
        if os.path.exists(stop_file):
            os.remove(stop_file)
        c1 = Crawler(tiny_corpus, out_dir, CrawlConfig(**{**CFG, "max_rounds": 5, "stop_file": stop_file}))
        t = threading.Timer(0.5, lambda: open(stop_file, "w").close())
        t.start()
        res1 = c1.run()
        t.cancel()
        c1.kill_shards()
        os.remove(stop_file)
        if res1.get("stopped"):
            c2 = Crawler.resume(tiny_corpus, out_dir, CrawlConfig(**{**CFG, "max_rounds": 5}))
            c2.run()
            c2.kill_shards()
        resumed = read_crawl_output(out_dir)
        assert resumed.column("url").to_pylist() == full.column("url").to_pylist()
        assert resumed.column("fetch_seq").to_pylist() == full.column("fetch_seq").to_pylist()

    def test_request_stop_api(self, ray_session, tiny_corpus):
        """Programmatic request_stop() before run(): exactly one round
        executes, then a clean stopped exit with a valid checkpoint."""
        out_dir = "/tmp/dc4r_test/stop_api"
        shutil.rmtree(out_dir, ignore_errors=True)
        c = Crawler(tiny_corpus, out_dir, CrawlConfig(**{**CFG, "max_rounds": 5}))
        c.request_stop()
        res = c.run()
        c.kill_shards()
        assert res["stopped"] and res["rounds"] == 1
        c2 = Crawler.resume(tiny_corpus, out_dir, CrawlConfig(**{**CFG, "max_rounds": 5}))
        assert c2.next_round == 1
        c2.kill_shards()


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


class TestMidRoundCancel:
    def test_cancel_mid_round_then_resume_equals_uninterrupted(
        self, ray_session, tiny_corpus, tmp_path
    ):
        """VERDICT r2 #8: a stop token appearing MID-ROUND aborts the
        in-flight round cleanly — shards roll back (queues, politeness
        tokens, retry counts), nothing is published, fetch_seq rewinds —
        and resume from the last checkpoint re-runs the round so the
        final output equals an uninterrupted crawl byte-for-byte."""
        stop = str(tmp_path / "stop.token")

        def mk(**over):
            return CrawlConfig(
                num_shards=2, fetch_concurrency=2, max_rounds=6,
                per_shard_budget=300, checkpoint=True, **over,
            )

        out_u = str(tmp_path / "uninterrupted")
        c = Crawler(tiny_corpus, out_u, mk())
        res_u = c.run()
        c.kill_shards()
        assert res_u["total_fetched"] > 0 and res_u["rounds"] >= 3

        # a fetch worker CREATES the token on its first batch of round 2;
        # parallel sibling tasks may complete fully before the abort
        # propagates — the rollback must cover their offers too
        out_c = str(tmp_path / "cancelled")
        c2 = Crawler(
            tiny_corpus, out_c,
            mk(abort_file=stop, extra={"stop_trigger": {"round": 2, "after_batches": 0}}),
        )
        res_c = c2.run()
        c2.kill_shards()
        assert res_c["stopped"]
        assert res_c["last_round"] == 2  # round 2 rolled back, not advanced
        assert not os.path.isdir(os.path.join(out_c, "pages", "round=00002"))

        os.remove(stop)
        c3 = Crawler.resume(tiny_corpus, out_c, mk())
        assert c3.next_round == 2
        c3.run()
        c3.kill_shards()

        a = read_crawl_output(out_u)
        b = read_crawl_output(out_c)
        assert a.equals(b)

    def test_in_memory_rerun_after_abort(self, ray_session, tiny_corpus, tmp_path):
        """The same Crawler object can re-run the aborted round once the
        token clears (shard rollback restores queues + bucket tokens)."""
        stop = str(tmp_path / "stop2.token")

        def mk(**over):
            return CrawlConfig(
                num_shards=2, fetch_concurrency=2, max_rounds=6,
                per_shard_budget=300, checkpoint=False, **over,
            )

        out_u = str(tmp_path / "plain")
        c = Crawler(tiny_corpus, out_u, mk())
        c.run()
        c.kill_shards()

        out_c = str(tmp_path / "abort_rerun")
        c2 = Crawler(
            tiny_corpus, out_c,
            mk(abort_file=stop, extra={"stop_trigger": {"round": 1, "after_batches": 0}}),
        )
        res = c2.run()
        assert res["stopped"] and c2.next_round == 1
        os.remove(stop)
        c2._stop = False
        c2.cfg.extra.pop("stop_trigger")
        res2 = c2.run()  # continues from round 1 in the same process
        c2.kill_shards()
        assert not res2["stopped"]
        assert read_crawl_output(out_u).equals(read_crawl_output(out_c))


class TestDiskLocality:
    def test_bucket_cache_reads_once_per_bucket(self, ray_session, tiny_corpus, tmp_path):
        """VERDICT r2 #9: disk-mode locality routing — with the
        BucketCacheActor pool, each bucket is read from storage ONCE
        total (reads == distinct buckets), vs plain disk mode where
        every fetch worker process re-reads the buckets it touches.
        Output must be byte-identical either way."""
        import ray as _ray

        log_plain = str(tmp_path / "reads_plain.log")
        log_cache = str(tmp_path / "reads_cache.log")

        def run(out, extra):
            cfg = CrawlConfig(
                num_shards=2, fetch_concurrency=4, max_rounds=6, per_shard_budget=500,
                checkpoint=False, corpus_in_object_store=False, extra=extra,
            )
            c = Crawler(tiny_corpus, str(out), cfg)
            c.run()
            reads = (
                sum(_ray.get([a.disk_reads.remote() for a in c.cache_actors]))
                if c.cache_actors
                else None
            )
            c.kill_shards()
            return read_crawl_output(str(out)), reads

        plain_tbl, _ = run(tmp_path / "plain", {"disk_read_log": log_plain})
        cache_tbl, actor_reads = run(
            tmp_path / "cached", {"bucket_cache_actors": 2, "disk_read_log": log_cache}
        )
        assert plain_tbl.equals(cache_tbl)

        def parse(p):
            lines = [l.split() for l in open(p).read().splitlines() if l.strip()]
            return [(int(a), int(b)) for a, b in lines]

        plain_reads = parse(log_plain)
        cache_reads = parse(log_cache)
        distinct_buckets = {b for _, b in plain_reads}
        # cache mode: exactly one read per distinct bucket, pool-wide
        assert len(cache_reads) == len({b for _, b in cache_reads}) == len(distinct_buckets)
        assert actor_reads == len(cache_reads)
        # plain mode re-reads buckets once per touching process
        print(
            f"disk reads: plain={len(plain_reads)} (procs re-reading) "
            f"cache={len(cache_reads)} (== {len(distinct_buckets)} buckets)"
        )
        assert len(plain_reads) >= len(cache_reads)


class TestRecrawlFeedback:
    """The continuous-crawl feedback loop: recrawl_priority classes from
    two snapshots become the next crawl's seed priorities
    (cfg.seeds_path), and the fetch order respects them — hot pages
    refetched before cold within each (round, shard)."""

    def test_priority_seeds_drive_refetch_order(self, ray_session, tiny_corpus, tmp_path):
        import numpy as np
        import ray.data as rd

        from deepcrawl4ai_ray.stages.snapshot import recrawl_priority

        pages = pq.read_table(
            sorted(glob.glob(os.path.join(tiny_corpus, "pages", "*.parquet")))[0],
            columns=["url", "text"],
        )
        # snapshot 2: every 3rd url's text changed
        urls = pages.column("url").to_pylist()
        texts = pages.column("text").to_pylist()
        texts2 = [t + " changed" if i % 3 == 0 else t for i, t in enumerate(texts)]
        s0 = rd.from_arrow(pa.table({"url": urls, "text": texts}))
        s1 = rd.from_arrow(pa.table({"url": urls, "text": pa.array(texts2, pa.string())}))
        plan = recrawl_priority([s0, s1], "url", "text").to_pandas()
        prio_map = {"hot": 0, "warm": 0, "cold": 5}
        seeds = pa.table(
            {
                "url": pa.array(plan["url"].tolist(), pa.string()),
                "priority": pa.array(
                    [prio_map[p] for p in plan["priority"]], pa.int32()
                ),
            }
        )
        seeds_path = str(tmp_path / "reseeds.parquet")
        pq.write_table(seeds, seeds_path)

        out_dir = str(tmp_path / "recrawl_out")
        _, out = _run(
            tiny_corpus,
            out_dir,
            seeds_path=seeds_path,
            max_rounds=1,
            per_shard_budget=100_000,
            exclude_external=True,
        )
        df = out.select(["fetch_seq", "round", "priority", "url"]).to_pandas()
        # every seeded url fetched exactly once in the single round
        assert sorted(df.url) == sorted(plan["url"])
        # planner classes arrived as priorities
        want = dict(zip(plan["url"], (prio_map[p] for p in plan["priority"])))
        assert dict(zip(df.url, df.priority)) == want
        # crawl-order spec: within the round, fetch_seq is ordered by
        # (shard, priority, host, url) — so priority must be
        # NON-DECREASING along fetch_seq within each contiguous shard
        # segment; globally, each url's seq of a hot (0) url in the same
        # shard+host must precede every cold (5) url of that shard+host
        df = df.sort_values("fetch_seq")
        from deepcrawl4ai_ray.functions.urlnorm import host_of

        df["host"] = [host_of(u) for u in df.url]
        for host, g in df.groupby("host"):
            hot_seqs = g.loc[g.priority == 0, "fetch_seq"]
            cold_seqs = g.loc[g.priority == 5, "fetch_seq"]
            if len(hot_seqs) and len(cold_seqs):
                assert hot_seqs.max() < cold_seqs.min(), host


class TestFusedEnrich:
    """CrawlConfig.enrich_spec: the crawl publishes already-enriched
    pages; output must be BYTE-EQUAL to crawl-then-extract (the separate
    enrich pass over the published corpus)."""

    def test_fused_equals_crawl_then_extract(self, ray_session, tiny_corpus):
        import ray.data as rd

        from deepcrawl4ai_ray.pipelines.registry import build_pipeline

        spec = [{"step": "enrich_fingerprints"}]
        _, fused = _run(tiny_corpus, "/tmp/dc4r_test/crawl_fused", enrich_spec=spec)
        _, plain = _run(tiny_corpus, "/tmp/dc4r_test/crawl_plain")
        # post-hoc pass over the published (un-enriched) corpus
        post = (
            build_pipeline(rd.from_arrow(plain), spec)
            .to_pandas()
            .sort_values("fetch_seq")
            .reset_index(drop=True)
        )
        got = fused.to_pandas().sort_values("fetch_seq").reset_index(drop=True)
        assert list(got.columns) == list(post.columns)
        for c in got.columns:
            a, b = got[c], post[c]
            if a.dtype.kind == "f":
                assert (a.to_numpy() == b.to_numpy()).all(), c  # byte-equal, not approx
            else:
                assert a.equals(b), c  # exact (handles bytes/lists/object)

    def test_enrich_spec_checkpoints_and_resumes(self, ray_session, tiny_corpus):
        """A resumed fused crawl keeps enriching: resume-twin equality on
        the enriched columns."""
        shutil.rmtree("/tmp/dc4r_test/crawl_fused_ckpt", ignore_errors=True)
        spec = [{"step": "enrich_fingerprints"}]
        cfg = CrawlConfig(**{**CFG, "checkpoint": True, "max_rounds": 2, "enrich_spec": spec})
        c = Crawler(tiny_corpus, "/tmp/dc4r_test/crawl_fused_ckpt", cfg)
        c.run()
        c.kill_shards()
        cfg2 = CrawlConfig(**{**CFG, "checkpoint": True, "max_rounds": 6, "enrich_spec": spec})
        c2 = Crawler.resume(tiny_corpus, "/tmp/dc4r_test/crawl_fused_ckpt", cfg2)
        c2.run()
        c2.kill_shards()
        resumed = read_crawl_output("/tmp/dc4r_test/crawl_fused_ckpt")
        _, straight = _run(
            tiny_corpus, "/tmp/dc4r_test/crawl_fused_straight", enrich_spec=spec
        )
        a = resumed.to_pandas().sort_values("url").reset_index(drop=True)
        b = straight.to_pandas().sort_values("url").reset_index(drop=True)
        assert a["url"].tolist() == b["url"].tolist()
        for c_ in ("n_tokens", "simhash", "stopword_ratio", "minhash"):
            assert a[c_].equals(b[c_]), c_


class TestEventsAcrossResume:
    def test_round_events_continue_in_order_after_resume(self, ray_session, tiny_corpus):
        """The push log is append-only across checkpoint-resume: the
        resumed crawl appends its rounds to the SAME file, in round
        order, with no duplicates for already-published rounds."""
        import json as _json

        out = "/tmp/dc4r_test/crawl_events_resume"
        ev = out + "_events.jsonl"
        shutil.rmtree(out, ignore_errors=True)
        try:
            os.remove(ev)
        except FileNotFoundError:
            pass
        cfg = CrawlConfig(**{**CFG, "checkpoint": True, "max_rounds": 2, "events_file": ev})
        c = Crawler(tiny_corpus, out, cfg)
        c.run()
        c.kill_shards()
        n_first = sum(1 for _ in open(ev))
        assert n_first == 2
        cfg2 = CrawlConfig(**{**CFG, "checkpoint": True, "max_rounds": 6, "events_file": ev})
        c2 = Crawler.resume(tiny_corpus, out, cfg2)
        c2.run()
        c2.kill_shards()
        events = [_json.loads(l) for l in open(ev)]
        rounds = [e["round"] for e in events if e["event"] == "round"]
        # strictly increasing, no duplicates, resumes at round 2
        assert rounds == sorted(set(rounds))
        assert rounds[0] == 0 and rounds[n_first] == 2
