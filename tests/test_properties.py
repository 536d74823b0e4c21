"""Property-based tests (hypothesis) for the pure kernels — the
reference has no property tests (SURVEY.md §5); these pin our specs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from deepcrawl4ai_ray.functions.extract import extract_text
from deepcrawl4ai_ray.functions.hashing import char_jaccard, jaccard, shingles
from deepcrawl4ai_ray.functions.urlnorm import hash64, normalize_url
from deepcrawl4ai_ray.state.bloom import BloomFilter
from deepcrawl4ai_ray.state.cuckoo import CuckooFilter
from deepcrawl4ai_ray.state.tokenbucket import TokenBucket


class TestNormalizeUrl:
    # '%' excluded: percent-DECODING is inherently single-application
    # (the reference unquotes once too, api.py:210) — '%2523' decodes to
    # '%23' which would decode again on a second pass.
    @given(st.text(alphabet=st.characters(blacklist_characters="%", max_codepoint=0x2FF), max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_idempotent(self, s):
        once = normalize_url(s)
        assert normalize_url(once) == once

    @given(st.text(alphabet=st.characters(blacklist_characters="#%", min_codepoint=33, max_codepoint=126), min_size=1, max_size=50))
    @settings(max_examples=100, deadline=None)
    def test_fragment_never_survives(self, s):
        assert "#" not in normalize_url(s + "#frag")


class TestExtract:
    @given(st.text(max_size=500))
    @settings(max_examples=100, deadline=None)
    def test_never_raises_and_deterministic(self, s):
        assert extract_text(s) == extract_text(s)

    @given(st.binary(max_size=500))
    @settings(max_examples=100, deadline=None)
    def test_arbitrary_bytes_ok(self, b):
        extract_text(b)  # must not raise on malformed input


class TestJaccard:
    @given(st.text(max_size=100), st.text(max_size=100))
    @settings(max_examples=100, deadline=None)
    def test_bounds_and_symmetry(self, a, b):
        j = char_jaccard(a, b)
        assert 0.0 <= j <= 1.0
        assert j == char_jaccard(b, a)
        assert char_jaccard(a, a) == 1.0

    @given(st.text(max_size=200), st.text(max_size=200))
    @settings(max_examples=50, deadline=None)
    def test_shingle_jaccard_bounds(self, a, b):
        j = jaccard(shingles(a), shingles(b))
        assert 0.0 <= j <= 1.0


class TestFilters:
    @given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=200, unique=True))
    @settings(max_examples=50, deadline=None)
    def test_bloom_no_false_negatives(self, keys):
        h = hash64(keys)
        b = BloomFilter(max(len(keys), 16))
        b.add_many(h)
        assert b.contains_many(h).all()

    @given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=200, unique=True))
    @settings(max_examples=50, deadline=None)
    def test_cuckoo_first_wins_exactly_once(self, keys):
        h = hash64(keys)
        c = CuckooFilter(max(len(keys) * 2, 32))
        first = c.add_if_absent_many(h)
        # distinct hashes must all insert; repeats must all be rejected
        uniq = len(np.unique(h))
        assert first.sum() == uniq
        assert not c.add_if_absent_many(h).any()
        assert c.contains_many(h).all()


class TestTokenBucket:
    @given(
        st.floats(min_value=1, max_value=50),
        st.floats(min_value=0.001, max_value=1.0),
        st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=50),
    )
    @settings(max_examples=50, deadline=None)
    def test_never_exceeds_budget(self, cap, refill, deltas):
        tb = TokenBucket(cap, refill, 0)
        now = 0
        taken = 0
        for d in deltas:
            now += d
            while tb.try_take(now):
                taken += 1
                assert taken <= cap + refill * now + 1e-6  # budget invariant


class TestFrontierInvariants:
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=40),  # page id
                st.integers(min_value=0, max_value=4),   # host id
                st.integers(min_value=0, max_value=3),   # priority
            ),
            min_size=1,
            max_size=120,
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_never_double_yields_and_conserves(self, offers):
        """Random offer sequences across rounds: every URL is yielded at
        most once ever; inserts == distinct new URLs; queue + yielded +
        dropped accounts for all inserts."""
        from deepcrawl4ai_ray.frontier.shard import FrontierShard

        sh = FrontierShard(0, capacity=1 << 10, round_ms=1_000_000, max_per_host=1000)
        yielded = []
        seen_urls = set()
        total_inserts = 0
        for chunk_start in range(0, len(offers), 17):
            chunk = offers[chunk_start : chunk_start + 17]
            urls = [f"https://h{h}.x/p/{i}" for i, h, _ in chunk]
            sh.offer(urls, [p for _, _, p in chunk], [f"h{h}.x" for _, h, _ in chunk])
            stats = sh.finalize_round()
            new = {u for u in urls if u not in seen_urls}
            assert stats["inserts"] == len(new)
            seen_urls |= new
            total_inserts += stats["inserts"]
            sel = sh.select(chunk_start // 17, budget=1000)
            yielded.extend(sel["url"])
        assert len(yielded) == len(set(yielded))  # never double-yielded
        assert len(yielded) + sh.frontier_size() == total_inserts


class TestCuckooSemanticsOracle:
    @given(st.integers(0, 2**31), st.integers(2, 6))
    @settings(max_examples=15, deadline=None)
    def test_bulk_insert_matches_sequential_semantics(self, seed, dup_stride):
        """The vectorized add_if_absent_many must report exactly the
        first-occurrence-wins outcome of the canonical (bucket-set, fp)
        membership model — including intra-batch duplicates and
        past-saturation overflow stash behavior."""
        rng = np.random.default_rng(seed)
        cf = CuckooFilter(2_000)
        seen = set()
        for _ in range(6):
            h = rng.integers(1, 2**63, size=997, dtype=np.int64).astype(np.uint64)
            h[::dup_stride] = h[0]  # heavy intra-batch duplication
            got = cf.add_if_absent_many(h)
            fp = (h >> np.uint64(48)).astype(np.uint16)
            fp[fp == 0] = 1
            i1 = (h & np.uint64(cf.num_buckets - 1)).astype(np.uint64)
            i2 = (i1 ^ (fp.astype(np.uint64) * np.uint64(0x5BD1E995))) & np.uint64(cf.num_buckets - 1)
            canon = (np.minimum(i1, i2) << np.uint64(16)) | fp.astype(np.uint64)
            for j in range(len(h)):
                c = int(canon[j])
                assert bool(got[j]) == (c not in seen)
                seen.add(c)


class TestHashJoinRandomized:
    @given(st.integers(0, 2**31), st.sampled_from(["inner", "left"]))
    @settings(max_examples=10, deadline=None)
    def test_matches_pandas_merge(self, seed, how):
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.stages.join import hash_join

        rng = np.random.default_rng(seed)
        left = pd.DataFrame(
            {
                "k": rng.integers(0, 40, size=rng.integers(1, 120)).astype(np.int64),
            }
        )
        left["a"] = np.arange(len(left), dtype=np.int64)
        right = pd.DataFrame(
            {"k2": rng.integers(0, 40, size=rng.integers(1, 120)).astype(np.int64)}
        )
        right["b"] = np.arange(len(right), dtype=np.int64)
        from deepcrawl4ai_ray.convert import to_pandas

        got = to_pandas(
            hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k", right_on="k2", how=how, num_buckets=8)
        )
        want = left.merge(right, left_on="k", right_on="k2", how=how)
        key = ["k", "a", "b"]
        got_s = got[key].fillna(-1).sort_values(key).reset_index(drop=True).astype("int64")
        want_s = want[key].fillna(-1).sort_values(key).reset_index(drop=True).astype("int64")
        pd.testing.assert_frame_equal(got_s, want_s)

    @given(st.integers(0, 2**31))
    @settings(max_examples=5, deadline=None)
    def test_chained_joins_random(self, seed):
        """join → project → join keeps every key (the r2 float-promotion
        regression class)."""
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from deepcrawl4ai_ray.stages.join import hash_join

        rng = np.random.default_rng(seed)
        n = int(rng.integers(20, 200))
        a = pd.DataFrame({"k": np.arange(n, dtype=np.int64), "x": rng.integers(0, 9, n).astype(np.int64)})
        b = pd.DataFrame({"k2": np.arange(n, dtype=np.int64), "y": rng.integers(0, 9, n).astype(np.int64)})
        j1 = hash_join(rd.from_pandas(a), rd.from_pandas(b), on="k", right_on="k2", num_buckets=8)
        slim = j1.map_batches(lambda t: pa.table({"k2": t["k2"], "z": t["y"]}), batch_format="pyarrow")
        c = pd.DataFrame({"k": np.arange(n, dtype=np.int64), "w": np.zeros(n, dtype=np.int64)})
        j2 = hash_join(rd.from_pandas(c), slim, on="k", right_on="k2", num_buckets=8)
        assert j2.count() == n


class TestTDigestProperties:
    @given(st.integers(0, 2**31), st.integers(1, 6))
    @settings(max_examples=25, deadline=None)
    def test_invariants_under_random_data_and_splits(self, seed, n_parts):
        """For any data and any partitioning: merged digest conserves n
        exactly, quantiles stay within [min, max], are monotone in q,
        and q=0/1 hit the exact extremes."""
        from deepcrawl4ai_ray.state.tdigest import TDigest

        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 5000))
        kind = int(rng.integers(0, 3))
        if kind == 0:
            data = rng.normal(0, 10, n)
        elif kind == 1:
            data = rng.lognormal(0, 3, n)
        else:
            data = np.repeat(rng.normal(0, 1, max(1, n // 100)), 100)
        n = len(data)
        merged = TDigest(100)
        for part in np.array_split(data, min(n_parts, n)):
            d = TDigest(100)
            d.add_many(part)
            merged.merge(TDigest.from_bytes(d.to_bytes()))
        assert abs(merged.n - n) < 1e-6
        qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
        vals = [merged.quantile(q) for q in qs]
        assert vals == sorted(vals)  # monotone
        assert vals[0] == data.min() and vals[-1] == data.max()
        for v in vals:
            assert data.min() - 1e-9 <= v <= data.max() + 1e-9


class TestConnectedComponentsRandomized:
    @given(st.integers(0, 2**31), st.integers(1, 5))
    @settings(max_examples=4, deadline=None)  # each example spins a full Ray CC
    def test_matches_union_find_across_block_splits(self, seed, n_blocks):
        """Two-level CC (per-block contraction + hash-to-min rounds) must
        equal a sequential union-find for ANY random graph and ANY block
        partitioning — the multi-block case exercises the global rounds,
        not just the local union-find."""
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dedup import connected_components

        rng = np.random.default_rng(seed)
        n_nodes = int(rng.integers(2, 120))
        n_edges = int(rng.integers(1, 250))
        a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        b = rng.integers(0, n_nodes, n_edges).astype(np.int64)

        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in zip(a, b):
            ru, rv = find(int(u)), find(int(v))
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        touched = sorted(set(a) | set(b))
        expected = {n: find(int(n)) for n in touched}
        # root-relabel so every label is the component MINIMUM
        comp_min = {}
        for n, r in expected.items():
            comp_min[r] = min(comp_min.get(r, n), n)
        expected = {n: comp_min[r] for n, r in expected.items()}

        pairs = pd.DataFrame({"id_a": a, "id_b": b})
        ds = rd.from_pandas(pairs).repartition(n_blocks)
        out = connected_components(ds).to_pandas().set_index("node")["component"].to_dict()
        assert out == expected


class TestBucketedAggsRandomized:
    """bucketed_sum / bucketed_min / bucketed_distinct vs pandas groupby
    on randomized inputs — mixed key types, negatives, duplicate-heavy
    keys, and arbitrary block splits."""

    @given(st.integers(0, 2**31), st.integers(1, 6))
    @settings(max_examples=10, deadline=None)
    def test_matches_pandas(self, seed, n_blocks):
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.stages.join import (
            bucketed_distinct,
            bucketed_min,
            bucketed_sum,
        )

        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 400))
        df = pd.DataFrame(
            {
                "k": rng.integers(-20, 20, n).astype("int64")
                if rng.integers(2)
                else np.array([f"k{i}" for i in rng.integers(0, 25, n)], dtype=object),
                "v": rng.normal(size=n)
                if rng.integers(2)
                else rng.integers(-1000, 1000, n).astype("int64"),
            }
        )
        ds = rd.from_pandas(df).repartition(n_blocks)

        got = bucketed_sum(ds, ["k"], "v", "s").to_pandas().sort_values("k").reset_index(drop=True)
        want = (
            df.groupby("k", as_index=False)["v"].sum().rename(columns={"v": "s"})
            .sort_values("k").reset_index(drop=True)
        )
        assert got["k"].astype(str).tolist() == want["k"].astype(str).tolist()
        assert np.allclose(got["s"].to_numpy(dtype=float), want["s"].to_numpy(dtype=float))

        got = bucketed_min(ds, ["k"], "v", "m").to_pandas().sort_values("k").reset_index(drop=True)
        want = (
            df.groupby("k", as_index=False)["v"].min().rename(columns={"v": "m"})
            .sort_values("k").reset_index(drop=True)
        )
        assert np.allclose(got["m"].to_numpy(dtype=float), want["m"].to_numpy(dtype=float))

        got = (
            bucketed_distinct(ds, ["k", "v"]).to_pandas()
            .sort_values(["k", "v"]).reset_index(drop=True)
        )
        want = df.drop_duplicates(["k", "v"]).sort_values(["k", "v"]).reset_index(drop=True)
        assert len(got) == len(want)
        assert got["k"].astype(str).tolist() == want["k"].astype(str).tolist()


class TestCrossEngineKeys:
    """The second-pass operators' oracle claims rest on two cross-engine
    invariants: (a) canonical_url_key ≡ the oracle's chained
    regexp_replace (both RE2), (b) the sequential-Poisson key u/w is
    bit-identical between numpy and DuckDB.  Pin both on random input."""

    @given(
        st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                min_size=1,
                max_size=60,
            ),
            min_size=1,
            max_size=30,
        )
    )
    @settings(max_examples=30, deadline=None)
    def test_canonical_url_key_matches_duckdb(self, urls):
        import duckdb
        import pyarrow as pa

        from deepcrawl4ai_ray.functions.urlnorm import canonical_url_key

        got = canonical_url_key(pa.array(urls, pa.string())).to_pylist()
        want = [
            duckdb.sql(
                r"""SELECT lower(regexp_replace(regexp_replace(regexp_replace(
                      regexp_replace(?, '^https?://', ''), '^www\.', ''),
                      '\?.*$', ''), '/+$', ''))""",
                params=[u],
            ).fetchone()[0]
            for u in urls
        ]
        assert got == want

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2**62),
                st.integers(min_value=1, max_value=10**9),
            ),
            min_size=1,
            max_size=50,
            unique_by=lambda t: t[0],
        )
    )
    @settings(max_examples=30, deadline=None)
    def test_poisson_key_bit_identical_to_duckdb(self, rows):
        import duckdb

        from deepcrawl4ai_ray.stages.sample import _poisson_keys

        ids = np.array([r[0] for r in rows], dtype=np.int64)
        ws = np.array([r[1] for r in rows], dtype=np.int64)
        got = _poisson_keys(ids, ws)
        for i, w, g in zip(ids, ws, got):
            want = duckdb.sql(
                "SELECT CAST(('0x' || substr(md5(CAST(? AS VARCHAR)), 1, 16)) AS UBIGINT)"
                " / CAST(? AS DOUBLE)",
                params=[int(i), int(w)],
            ).fetchone()[0]
            assert g == want  # exact float equality — IEEE ops only


class TestCodecRoundTrips:
    """Property round-trips for the r5 real-format codecs: encode→decode
    is identity for EVERY array in the supported domain."""

    @given(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_ppm_identity(self, h, w, seed):
        from deepcrawl4ai_ray.stages.imagecodec import decode_ppm, encode_ppm

        arr = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        np.testing.assert_array_equal(decode_ppm(encode_ppm(arr)), arr)

    @given(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_bmp_identity(self, h, w, seed):
        from deepcrawl4ai_ray.stages.imagecodec import decode_bmp24, encode_bmp24

        arr = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        np.testing.assert_array_equal(decode_bmp24(encode_bmp24(arr)), arr)

    @given(
        st.integers(min_value=0, max_value=200),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.sampled_from([8000, 16000, 44100]),
    )
    @settings(max_examples=40, deadline=None)
    def test_wav_identity(self, n, seed, rate):
        from deepcrawl4ai_ray.stages.audiocodec import decode_wav_pcm16, encode_wav_pcm16

        s = (
            np.random.default_rng(seed)
            .integers(-(2**15), 2**15, size=n)
            .astype(np.int16)
        )
        got, got_rate = decode_wav_pcm16(encode_wav_pcm16(s, rate))
        np.testing.assert_array_equal(got, s)
        assert got_rate == rate

    @given(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_y4m_identity(self, n, h2, w2, seed):
        from deepcrawl4ai_ray.stages.videocodec import encode_y4m, probe_y4m, sample_frames

        h, w = 2 * h2, 2 * w2  # 4:2:0 needs even dims
        f = (
            np.random.default_rng(seed)
            .integers(0, 256, size=(n, h, w))
            .astype(np.uint8)
        )
        raw = encode_y4m(f)
        assert probe_y4m(raw) == (w, h, n)
        _, _, frames = sample_frames(raw, k=max(n, 1))
        assert [i for i, _ in frames] == list(range(n))
        for i, luma in frames:
            np.testing.assert_array_equal(luma, f[i])
