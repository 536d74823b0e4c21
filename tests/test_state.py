"""Unit tests: bloom / cuckoo / token bucket / robots / tdigest /
frontier shard (no Ray)."""

import numpy as np

from deepcrawl4ai_ray.functions.urlnorm import hash64
from deepcrawl4ai_ray.frontier.shard import FrontierShard
from deepcrawl4ai_ray.state import BloomFilter, CuckooFilter, RobotsPolicy, TokenBucket
from deepcrawl4ai_ray.state.robots import RobotsCache


def _keys(prefix, n):
    return hash64([f"{prefix}{i}" for i in range(n)])


class TestBloom:
    def test_no_false_negatives(self):
        b = BloomFilter(5000, 0.01)
        h = _keys("u", 5000)
        b.add_many(h)
        assert b.contains_many(h).all()

    def test_fp_rate_bounded(self):
        b = BloomFilter(5000, 0.01)
        b.add_many(_keys("u", 5000))
        fp = b.contains_many(_keys("v", 10000)).mean()
        assert fp < 0.03

    def test_serialize_roundtrip(self):
        b = BloomFilter(100)
        h = _keys("w", 50)
        b.add_many(h)
        b2 = BloomFilter.from_bytes(b.to_bytes())
        assert b2.contains_many(h).all() and b2.count == 50

    def test_merge_by_or(self):
        b1, b2 = BloomFilter(1000), BloomFilter(1000)
        h1, h2 = _keys("a", 100), _keys("b", 100)
        b1.add_many(h1)
        b2.add_many(h2)
        b1.bits |= b2.bits
        assert b1.contains_many(h1).all() and b1.contains_many(h2).all()


class TestCuckoo:
    def test_insert_contains_dupes(self):
        c = CuckooFilter(10000)
        h = _keys("u", 5000)
        assert c.add_if_absent_many(h).all()
        assert not c.add_if_absent_many(h).any()  # first-wins
        assert c.contains_many(h).all()

    def test_fp_rate(self):
        c = CuckooFilter(20000)
        c.add_if_absent_many(_keys("u", 10000))
        fp = c.contains_many(_keys("v", 20000)).mean()
        assert fp < 0.005  # 16-bit fingerprints → ~2^-13 expected

    def test_exact_under_saturation(self):
        c = CuckooFilter(64)
        h = _keys("s", 1000)
        ins = c.add_if_absent_many(h)
        assert ins.all()
        assert c.contains_many(h).all()  # overflow stash keeps exactness
        assert not c.add_if_absent_many(h).any()

    def test_serialize_roundtrip(self):
        c = CuckooFilter(1000)
        h = _keys("r", 800)
        c.add_if_absent_many(h)
        c2 = CuckooFilter.from_bytes(c.to_bytes())
        assert c2.contains_many(h).all() and c2.count == c.count


class TestTokenBucket:
    def test_burst_then_refill(self):
        tb = TokenBucket(2, 1 / 1000)  # 2 burst, 1 token/sec
        assert tb.try_take(0) and tb.try_take(0) and not tb.try_take(0)
        assert tb.try_take(1000) and not tb.try_take(1500)
        assert tb.try_take(2500)

    def test_state_roundtrip(self):
        tb = TokenBucket(5, 0.01, 100)
        tb.try_take(100)
        tb2 = TokenBucket.from_state(tb.state())
        assert tb2.available(100) == tb.available(100)


class TestRobots:
    def test_disallow_prefix(self):
        p = RobotsPolicy(["/p/1"], 500)
        assert not p.allows("https://h.x/p/1")
        assert not p.allows("https://h.x/p/10")  # prefix semantics
        assert p.allows("https://h.x/p/2")

    def test_cache_default(self):
        c = RobotsCache({"h.x": (["/a"], 250)})
        assert c.get("h.x").crawl_delay_ms == 250
        assert c.get("unknown.example").allows("https://unknown.example/any")


class TestFrontierShard:
    def test_offer_finalize_select_dedup(self):
        sh = FrontierShard(0, capacity=1 << 12, round_ms=10_000)
        sh.offer(["https://a.x/1", "https://a.x/2", "https://a.x/1"], [1, 0, 0], ["a.x"] * 3)
        stats = sh.finalize_round()
        assert stats["inserts"] == 2 and stats["dupes_skipped"] == 1
        # min-priority merge: /1 offered at 1 then 0 → priority 0
        sel = sh.select(0, budget=10)
        assert sel["url"] == ["https://a.x/1", "https://a.x/2"]
        assert sel["priority"] == [0, 0]
        # re-offer after fetch: still dupes
        sh.offer(["https://a.x/1"], [3], ["a.x"])
        stats = sh.finalize_round()
        assert stats["inserts"] == 0 and stats["dupes_skipped"] == 1

    def test_politeness_quota(self):
        sh = FrontierShard(0, round_ms=1000, host_delays={"slow.x": 1000, "fast.x": 100})
        urls_s = [f"https://slow.x/{i}" for i in range(20)]
        urls_f = [f"https://fast.x/{i}" for i in range(20)]
        sh.offer(urls_s + urls_f, [0] * 40, ["slow.x"] * 20 + ["fast.x"] * 20)
        sh.finalize_round()
        sel = sh.select(0, budget=100)
        slow = sum(1 for u in sel["url"] if "slow" in u)
        fast = sum(1 for u in sel["url"] if "fast" in u)
        assert slow == 1  # 1000ms round / 1000ms delay
        assert fast == 10  # 1000ms round / 100ms delay

    def test_budget_pushback(self):
        sh = FrontierShard(0, round_ms=100_000, host_delays={})
        urls = [f"https://h{i}.x/0" for i in range(30)]
        sh.offer(urls, [0] * 30, [f"h{i}.x" for i in range(30)])
        sh.finalize_round()
        sel = sh.select(0, budget=10)
        assert len(sel["url"]) == 10
        assert sh.frontier_size() == 20  # rest pushed back

    def test_deterministic_order_any_offer_order(self):
        def build(order):
            sh = FrontierShard(0, round_ms=100_000)
            for u, p, h in order:
                sh.offer([u], [p], [h])
            sh.finalize_round()
            return sh.select(0, budget=100)["url"]

        items = [(f"https://h{i % 3}.x/p/{i}", i % 2, f"h{i % 3}.x") for i in range(12)]
        assert build(items) == build(list(reversed(items)))

    def test_checkpoint_roundtrip(self):
        sh = FrontierShard(3, round_ms=5000, host_delays={"a.x": 500})
        sh.offer([f"https://a.x/{i}" for i in range(10)], list(range(10)), ["a.x"] * 10)
        sh.finalize_round()
        sh.select(0, budget=3)
        sh2 = FrontierShard.restore(sh.serialize())
        assert sh2.frontier_size() == sh.frontier_size()
        assert sh2.select(1, 100) == sh.select(1, 100)
        assert sh2.seen_count() == sh.seen_count()

    def test_bounded_depth(self):
        sh = FrontierShard(0, max_per_host=5, round_ms=1000)
        urls = [f"https://h.x/{i}" for i in range(20)]
        sh.offer(urls, [0] * 20, ["h.x"] * 20)
        stats = sh.finalize_round()
        assert stats["overflow_dropped"] == 15
        assert sh.frontier_size() == 5


class TestHyperLogLog:
    def test_accuracy_and_merge(self):
        import numpy as np

        from deepcrawl4ai_ray.state.hll import HyperLogLog

        import pandas as pd

        rng = np.random.default_rng(5)
        raw = rng.integers(0, 2**63, size=1_000_000, dtype=np.int64)
        keys = pd.util.hash_array(raw)  # the contract: pre-hashed uint64
        true = len(np.unique(keys))
        whole = HyperLogLog(12)
        whole.add_many(keys)
        est = whole.estimate()
        assert abs(est - true) / true < 0.05  # ~3σ at p=12

        # partial merge must equal the single-pass sketch exactly
        parts = [HyperLogLog(12) for _ in range(8)]
        for i, hp in enumerate(parts):
            hp.add_many(keys[i::8])
        acc = parts[0]
        for hp in parts[1:]:
            acc.merge(hp)
        assert (acc.registers == whole.registers).all()

    def test_small_range_linear_counting(self):
        import numpy as np

        from deepcrawl4ai_ray.state.hll import HyperLogLog

        import pandas as pd

        h = HyperLogLog(12)
        h.add_many(pd.util.hash_array(np.arange(100, dtype=np.int64)))
        assert abs(h.estimate() - 100) < 5

    def test_grouped_distinct_vs_exact(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.state.hll import hll_grouped_distinct

        rng = np.random.default_rng(6)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 4, size=50_000),
                "v": rng.integers(0, 5_000, size=50_000),
            }
        )
        approx = hll_grouped_distinct(rd.from_pandas(df), "k", "v", p=12)
        exact = df.groupby("k")["v"].nunique()
        for _, row in approx.iterrows():
            t = exact[row["k"]]
            assert abs(row["approx_distinct"] - t) / t < 0.05


    def test_register_rows_match_single_process(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.functions.hashing import md5_u64
        from deepcrawl4ai_ray.state.hll import HyperLogLog, hll_register_rows

        rng = np.random.default_rng(7)
        df = pd.DataFrame(
            {
                "k": np.where(rng.integers(0, 2, size=20_000) == 0, "a", "b"),
                "v": rng.integers(0, 3_000, size=20_000),
            }
        )
        got = hll_register_rows(rd.from_pandas(df), "k", "v", p=12)
        # single-process reference with the same md5 hash contract
        frames = []
        for k, grp in df.groupby("k"):
            ref = HyperLogLog(12)
            ref.add_many(md5_u64(grp["v"].astype(str).tolist()))
            nz = np.flatnonzero(ref.registers)
            frames.append(
                pd.DataFrame({"k": k, "reg": nz.astype(np.int32), "reg_rank": ref.registers[nz].astype(np.int32)})
            )
        want = pd.concat(frames).sort_values(["k", "reg"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_register_rows_block_layout_invariant(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.state.hll import hll_register_rows

        rng = np.random.default_rng(8)
        df = pd.DataFrame({"k": ["g"] * 5_000, "v": rng.integers(0, 800, size=5_000)})
        one = hll_register_rows(rd.from_pandas(df), "k", "v", p=10)
        many = hll_register_rows(rd.from_pandas(df).repartition(13), "k", "v", p=10)
        pd.testing.assert_frame_equal(one, many)


class TestTDigest:
    def _rank_err(self, values, est, q):
        """|empirical CDF position of est − q| — the t-digest guarantee
        lives in rank space."""
        import numpy as np

        v = np.sort(values)
        pos = np.searchsorted(v, est, side="left") / len(v)
        pos_r = np.searchsorted(v, est, side="right") / len(v)
        # est may fall inside a run of equal values; take the closest edge
        return min(abs(pos - q), abs(pos_r - q))

    def test_rank_error_bounded(self):
        import numpy as np

        from deepcrawl4ai_ray.state.tdigest import TDigest

        rng = np.random.default_rng(3)
        for data in (
            rng.normal(0, 1, 100_000),
            rng.lognormal(0, 2, 100_000),  # heavy skew
            np.repeat(rng.normal(0, 1, 50), 2000),  # heavy ties
        ):
            d = TDigest(200)
            for chunk in np.array_split(data, 37):  # out-of-order chunks
                d.add_many(chunk)
            for q in (0.01, 0.1, 0.5, 0.9, 0.99):
                assert self._rank_err(data, d.quantile(q), q) <= 0.015, q

    def test_merge_matches_single_digest_bound(self):
        """Partial digests merged (the shuffle path) must obey the same
        rank-error bound as one digest over all data."""
        import numpy as np

        from deepcrawl4ai_ray.state.tdigest import TDigest

        rng = np.random.default_rng(9)
        data = rng.gamma(2.0, 3.0, 80_000)
        parts = np.array_split(data, 16)
        merged = TDigest(200)
        for p in parts:
            d = TDigest(200)
            d.add_many(p)
            merged.merge(TDigest.from_bytes(d.to_bytes()))  # serde round-trip too
        assert abs(merged.n - len(data)) < 1e-6
        for q in (0.05, 0.5, 0.9, 0.95):
            assert self._rank_err(data, merged.quantile(q), q) <= 0.02, q

    def test_edge_cases(self):
        import math

        import numpy as np

        from deepcrawl4ai_ray.state.tdigest import TDigest

        d = TDigest()
        assert math.isnan(d.quantile(0.5))
        d.add_many([42.0])
        assert d.quantile(0.0) == d.quantile(1.0) == 42.0
        d2 = TDigest()
        d2.add_many(np.arange(10, dtype=float))
        assert d2.quantile(0.0) == 0.0 and d2.quantile(1.0) == 9.0


class TestCountMinSketch:
    def test_overestimates_never_under(self):
        import numpy as np
        import pandas as pd

        from deepcrawl4ai_ray.functions.hashing import md5_u64
        from deepcrawl4ai_ray.state.cms import CountMinSketch

        rng = np.random.default_rng(12)
        vals = rng.zipf(1.5, size=50_000).astype(str)
        h = md5_u64(list(vals))
        sk = CountMinSketch(4, 2048)
        sk.add_many(h)
        truth = pd.Series(vals).value_counts()
        probes = truth.index[:200].tolist()
        est = sk.estimate_many(md5_u64(probes))
        want = truth[probes].to_numpy()
        assert (est >= want).all()
        # heavy hitters stay accurate: top-20 overestimate bounded by
        # the CMS guarantee scale (eps*N with eps = e/width)
        import math

        eps_n = math.e / 2048 * len(vals)
        assert (est[:20] - want[:20] <= 3 * eps_n).all()

    def test_merge_equals_single_pass(self):
        import numpy as np

        from deepcrawl4ai_ray.functions.hashing import md5_u64
        from deepcrawl4ai_ray.state.cms import CountMinSketch

        rng = np.random.default_rng(13)
        h = md5_u64([str(x) for x in rng.integers(0, 500, size=10_000)])
        whole = CountMinSketch(4, 2048)
        whole.add_many(h)
        parts = [CountMinSketch(4, 2048) for _ in range(7)]
        for i, p in enumerate(parts):
            p.add_many(h[i::7])
        acc = parts[0]
        for p in parts[1:]:
            acc.merge(p)
        assert (acc.counters == whole.counters).all()

    def test_distributed_counters_layout_invariant(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.state.cms import cms_counters

        rng = np.random.default_rng(14)
        df = pd.DataFrame({"v": rng.integers(0, 300, size=8_000)})
        one = cms_counters(rd.from_pandas(df), "v")
        many = cms_counters(rd.from_pandas(df).repartition(11), "v")
        pd.testing.assert_frame_equal(one, many)
        # grid total == depth * rows (every value lands once per row)
        assert one["n"].sum() == 4 * len(df)

    def test_exact_when_collision_free(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.state.cms import cms_counters, cms_estimate

        df = pd.DataFrame({"v": np.repeat([1, 2, 3], [5, 9, 2])})
        counters = cms_counters(rd.from_pandas(df), "v")
        est = cms_estimate(counters, ["1", "2", "3"])
        assert est.tolist() == [5, 9, 2]

    def test_shape_guards(self):
        import pytest as _pytest

        from deepcrawl4ai_ray.state.cms import CountMinSketch

        with _pytest.raises(ValueError):
            CountMinSketch(4, 1000)  # not a power of two
        with _pytest.raises(ValueError):
            CountMinSketch(6, 2048)  # > 64/11 rows
        with _pytest.raises(ValueError):
            CountMinSketch(4, 4096)  # slice wider than 11 bits


class TestRobotsTxtParser:
    """parse_robots_txt: RFC 9309 group semantics over real robots.txt
    text — the ingestion bridge to the parquet policy table."""

    def test_group_selection_most_specific_wins(self):
        from deepcrawl4ai_ray.state.robots import parse_robots_txt

        txt = """
# global
User-agent: *
Disallow: /private/
Crawl-delay: 2

User-agent: deepcrawl4ai-ray
Disallow: /api/
Crawl-delay: 0.5
"""
        p = parse_robots_txt(txt)  # specific group wins entirely
        assert p.disallow == ["/api/"]
        assert p.crawl_delay_ms == 500
        assert p.allows("https://h.x/private/a")  # global rules NOT merged
        assert not p.allows("https://h.x/api/v1")
        # an unrelated agent falls back to *
        q = parse_robots_txt(txt, user_agent="otherbot")
        assert q.disallow == ["/private/"]
        assert q.crawl_delay_ms == 2000

    def test_shared_ua_lines_and_new_group_after_rules(self):
        from deepcrawl4ai_ray.state.robots import parse_robots_txt

        txt = (
            "User-agent: alpha\nUser-agent: beta\nDisallow: /x/\n"
            "User-agent: gamma\nDisallow: /y/\n"
        )
        assert parse_robots_txt(txt, user_agent="alpha").disallow == ["/x/"]
        assert parse_robots_txt(txt, user_agent="beta").disallow == ["/x/"]
        assert parse_robots_txt(txt, user_agent="gamma").disallow == ["/y/"]
        # no matching group and no *: permissive default
        d = parse_robots_txt(txt, user_agent="delta")
        assert d.disallow == [] and d.crawl_delay_ms == 1000

    def test_comments_empty_disallow_and_garbage(self):
        from deepcrawl4ai_ray.state.robots import parse_robots_txt

        txt = (
            "User-agent: * # everyone\nDisallow:   # empty = allow all\n"
            "NoSuchField: x\nnot a record line\nCrawl-delay: soon\n"
        )
        p = parse_robots_txt(txt)
        assert p.disallow == [] and p.crawl_delay_ms == 1000
        assert parse_robots_txt("").allows("https://h.x/a")
        assert parse_robots_txt(b"\xff\xfe binary junk").crawl_delay_ms == 1000

    def test_table_bridge_round_trips_into_cache(self):
        import pyarrow as pa  # noqa: F401

        from deepcrawl4ai_ray.state.robots import (
            RobotsCache,
            robots_table_from_texts,
        )

        tbl = robots_table_from_texts(
            ["a.x", "b.x"],
            ["User-agent: *\nDisallow: /p/\nCrawl-delay: 3\n", ""],
        )
        cache = RobotsCache.from_arrow(tbl)
        assert not cache.get("a.x").allows("https://a.x/p/1")
        assert cache.get("a.x").crawl_delay_ms == 3000
        assert cache.get("b.x").allows("https://b.x/anything")
