"""Operator tests: join / agg / dedup / knn / windows / multimodal stages
on tiny in-memory Datasets."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray


@pytest.fixture(autouse=True)
def _ray(ray_session):
    pass


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


class TestHashJoin:
    def test_inner_matches_pandas(self):
        from deepcrawl4ai_ray.stages.join import hash_join

        left = pd.DataFrame({"k": [1, 2, 3, 4, 2], "a": list("abcde")})
        right = pd.DataFrame({"k": [2, 3, 3, 9], "b": list("wxyz")})
        got = hash_join(_ds(left), _ds(right), on="k", num_buckets=4).to_pandas()
        want = left.merge(right, on="k")
        got = got.sort_values(["k", "a", "b"]).reset_index(drop=True)[["k", "a", "b"]]
        want = want.sort_values(["k", "a", "b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_left_join(self):
        from deepcrawl4ai_ray.stages.join import hash_join

        left = pd.DataFrame({"k": [1, 2], "a": ["x", "y"]})
        right = pd.DataFrame({"k": [2], "b": ["z"]})
        got = hash_join(_ds(left), _ds(right), on="k", how="left").to_pandas()
        assert len(got) == 2
        assert got.loc[got.k == 1, "b"].isna().all()

    def test_outer_join_matches_pandas_and_stable_schema(self):
        """FULL OUTER: unmatched rows from BOTH sides survive with the key
        coalesced, and string columns stay string-typed even in buckets
        whose rows are all one side (no null-typed blocks)."""
        from deepcrawl4ai_ray.stages.join import hash_join

        left = pd.DataFrame({"k": [1, 2, 3], "a": ["x", "y", "z"]})
        right = pd.DataFrame({"k": [2, 3, 4, 5], "b": ["p", "q", "r", "s"]})
        ds = hash_join(_ds(left), _ds(right), on="k", how="outer", num_buckets=8)
        sch = dict(zip(ds.schema().names, ds.schema().types))
        assert sch["a"] == pa.string() and sch["b"] == pa.string()
        assert sch["k"] == pa.int64()
        got = ds.to_pandas().sort_values("k").reset_index(drop=True)
        want = (
            left.merge(right, on="k", how="outer").sort_values("k").reset_index(drop=True)
        )
        assert got["k"].tolist() == want["k"].tolist() == [1, 2, 3, 4, 5]
        assert got["a"].fillna("-").tolist() == want["a"].fillna("-").tolist()
        assert got["b"].fillna("-").tolist() == want["b"].fillna("-").tolist()

    def test_how_validated(self):
        from deepcrawl4ai_ray.stages.join import hash_join

        with pytest.raises(ValueError, match="inner/left/outer"):
            hash_join(_ds(pd.DataFrame({"k": [1]})), _ds(pd.DataFrame({"k": [1]})), on="k", how="cross")

    def test_chained_join_preserves_int_keys(self):
        """Regression: a join's output fed into ANOTHER join must keep
        int64 key dtype (the union null-padding used to promote keys to
        float64 in pandas groups, bucketing the two sides differently
        and silently dropping ~15/16 of matches)."""
        import ray.data as rd
        from deepcrawl4ai_ray.stages.join import hash_join

        n = 500
        left = pd.DataFrame({"k": np.arange(n, dtype=np.int64), "x": np.arange(n, dtype=np.int64)})
        right = pd.DataFrame({"k2": np.arange(n, dtype=np.int64), "y": np.arange(n, dtype=np.int64)})
        j1 = hash_join(_ds(left), _ds(right), on="k", right_on="k2", num_buckets=16)
        slim = j1.map_batches(
            lambda t: pa.table({"k2": t["k2"], "y2": t["y"]}), batch_format="pyarrow"
        )
        assert dict(zip(slim.schema().names, slim.schema().types))["k2"] == pa.int64()
        left2 = pd.DataFrame({"k": np.arange(n, dtype=np.int64), "z": np.arange(n, dtype=np.int64)})
        j2 = hash_join(_ds(left2), slim, on="k", right_on="k2", num_buckets=16)
        assert j2.count() == n

    def test_big_int_keys_exact(self):
        """Keys above 2^53 (float-unrepresentable) must join exactly."""
        from deepcrawl4ai_ray.stages.join import hash_join

        ks = np.array([2**53 + i for i in range(1, 9)], dtype=np.int64)
        left = pd.DataFrame({"k": ks, "a": np.arange(8)})
        right = pd.DataFrame({"k2": ks[::2], "b": np.arange(4)})
        got = hash_join(_ds(left), _ds(right), on="k", right_on="k2", num_buckets=4).to_pandas()
        assert sorted(got["k"]) == sorted(ks[::2])

    def test_zero_overlap_preserves_schema(self):
        """Regression (r3 verdict #1, hypothesis seed 233): a join whose
        result is EMPTY must keep the merged column set + dtypes.  Ray
        drops zero-row blocks, so without the schema-pinned seed block an
        all-empty join came back as a column-less (0, 0) frame and any
        downstream select/filter crashed."""
        from deepcrawl4ai_ray.convert import to_pandas
        from deepcrawl4ai_ray.stages.join import hash_join

        left = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64), "a": ["x", "y", "z"]})
        right = pd.DataFrame({"k2": np.array([10, 20], dtype=np.int64), "b": [1.5, 2.5]})
        for how, want_rows in (("inner", 0), ("left", 3), ("outer", 5)):
            ds = hash_join(_ds(left), _ds(right), on="k", right_on="k2", how=how, num_buckets=8)
            sch = dict(zip(ds.schema().names, ds.schema().types))
            assert sch == {"k": pa.int64(), "a": pa.string(), "k2": pa.int64(), "b": pa.float64()}, how
            got = to_pandas(ds)
            assert list(got.columns) == ["k", "a", "k2", "b"], how
            assert len(got) == want_rows, how
            # downstream ops on the (possibly empty) result must not crash
            assert ds.select_columns(["k", "b"]).count() == want_rows
        # same-name key, all-empty inner join
        ds = hash_join(_ds(left), _ds(pd.DataFrame({"k": np.array([9], dtype=np.int64), "b": [0.0]})), on="k", num_buckets=4)
        got = to_pandas(ds)
        assert list(got.columns) == ["k", "a", "b"] and len(got) == 0
        assert got.dtypes["k"].kind == "i" and got.dtypes["b"].kind == "f"

    def test_overlapping_columns_rejected(self):
        from deepcrawl4ai_ray.stages.join import hash_join

        l = pd.DataFrame({"k": [1], "x": [1]})
        r = pd.DataFrame({"k": [1], "x": [2]})
        with pytest.raises(ValueError):
            hash_join(_ds(l), _ds(r), on="k")


class TestLookupJoin:
    """lookup_join (guarded broadcast index_in with hash_join fallback):
    both modes must emit the identical inner-join result and schema."""

    def _run(self, max_rows):
        from deepcrawl4ai_ray.stages.join import lookup_join

        left = pd.DataFrame({"k": ["a", "b", "c", "b", "zz"], "v": [1, 2, 3, 4, 5]})
        right = pd.DataFrame({"node": ["a", "b", "c", "d"], "deg": [10, 20, 30, 40]})
        out = lookup_join(
            _ds(left),
            _ds(right),
            on="k",
            right_on="node",
            rename={"deg": "deg_k"},
            max_broadcast_rows=max_rows,
        ).to_pandas()
        return out.sort_values(["k", "v"]).reset_index(drop=True)

    def test_broadcast_and_join_modes_identical(self):
        bcast = self._run(max_rows=1000)  # broadcast path
        joined = self._run(max_rows=0)  # forced hash_join fallback
        pd.testing.assert_frame_equal(bcast, joined)
        # inner semantics: the unmatched left row 'zz' is dropped; right
        # key column never appears; rename applied
        assert list(bcast.columns) == ["k", "v", "deg_k"]
        assert bcast["k"].tolist() == ["a", "b", "b", "c"]
        assert bcast["deg_k"].tolist() == [10, 20, 20, 30]


class TestBloomSemiAnti:
    def test_exact_vs_reference_at_1e6_keys(self):
        """10^6-key anti/semi join: output must EQUAL the exact set
        result (bloom FPs only reroute rows to the verify join), and the
        serialized bloom must stay ~1.2 MB — driver memory is the bit
        array, never the key list."""
        import ray.data as rd
        from deepcrawl4ai_ray.stages.join import bloom_semi_anti, build_bloom_bytes

        n_keys = 1_000_000
        keys = np.arange(n_keys, dtype=np.int64) * 2  # even keys
        probe = np.arange(0, 2 * n_keys, 997, dtype=np.int64)  # mixed parity
        keys_ds = rd.from_pandas(pd.DataFrame({"k": keys}))
        probe_ds = rd.from_pandas(pd.DataFrame({"k": probe, "v": probe + 1}))

        blob = build_bloom_bytes(keys_ds, "k", n_keys, fp_rate=0.01)
        assert len(blob) < 2_500_000  # ~1.2MB bits + header, NOT O(keys) python objects

        anti = bloom_semi_anti(probe_ds, "k", keys_ds, "k", keep_in=False).to_pandas()
        semi = bloom_semi_anti(probe_ds, "k", keys_ds, "k", keep_in=True).to_pandas()
        key_set = set(keys.tolist())
        want_anti = sorted(int(x) for x in probe if int(x) not in key_set)
        want_semi = sorted(int(x) for x in probe if int(x) in key_set)
        assert sorted(anti["k"]) == want_anti
        assert sorted(semi["k"]) == want_semi
        # values rode along intact
        assert (anti.sort_values("k")["v"].to_numpy() == np.array(want_anti) + 1).all()

    def test_all_negative_probe_keeps_schema(self):
        """Regression (r4 triangles): when NO probe row is bloom-positive
        (disjoint key sets) the positives dataset is all-empty — the
        verify join must still see the probe schema, semi must return a
        typed empty frame and anti must pass everything through."""
        import ray.data as rd
        from deepcrawl4ai_ray.stages.join import bloom_semi_anti

        probe_ds = rd.from_pandas(
            pd.DataFrame({"k": np.arange(50, dtype=np.int64), "v": np.arange(50) * 2})
        ).repartition(3)
        keys_ds = rd.from_pandas(
            pd.DataFrame({"k": np.arange(1000, 1030, dtype=np.int64)})
        )
        from deepcrawl4ai_ray.convert import to_pandas as _tp

        semi = _tp(bloom_semi_anti(probe_ds, "k", keys_ds, "k", keep_in=True))
        assert len(semi) == 0 and list(semi.columns) == ["k", "v"]
        anti = bloom_semi_anti(probe_ds, "k", keys_ds, "k", keep_in=False).to_pandas()
        assert sorted(anti["k"]) == list(range(50))

    def test_tree_reduce_bits_identical_to_serial(self):
        """The tree-reduced OR-merge must produce bit-identical filter
        contents to a serial single-process build (OR is associative +
        commutative; this pins it)."""
        import ray.data as rd
        from deepcrawl4ai_ray.stages.join import _hash_col, build_bloom_bytes
        from deepcrawl4ai_ray.state.bloom import BloomFilter

        n = 50_000
        keys = np.arange(n, dtype=np.int64) * 3 + 1
        keys_ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(13)
        blob = build_bloom_bytes(keys_ds, "k", n, fp_rate=0.01, batch_size=4096)
        got = BloomFilter.from_bytes(blob)
        ref = BloomFilter(n, 0.01)
        ref.add_many(_hash_col(pa.table({"k": keys})["k"]))
        assert np.array_equal(got.bits, ref.bits)
        assert got.count == n


class TestBroadcastFilter:
    def test_semi_and_anti(self):
        from deepcrawl4ai_ray.stages.join import broadcast_filter

        df = pd.DataFrame({"k": [1, 2, 3, 4], "v": list("abcd")})
        ref = ray.put([2, 4])
        semi = broadcast_filter(_ds(df), "k", ref, keep_in=True).to_pandas()
        anti = broadcast_filter(_ds(df), "k", ref, keep_in=False).to_pandas()
        assert sorted(semi.k) == [2, 4]
        assert sorted(anti.k) == [1, 3]


class TestPartialAgg:
    def test_matches_pandas_groupby(self):
        from deepcrawl4ai_ray.stages.agg import partial_grouped_sum

        rng = np.random.RandomState(0)
        df = pd.DataFrame(
            {"g": rng.randint(0, 5, 1000), "x": rng.rand(1000), "y": rng.randint(0, 100, 1000)}
        )
        out = (
            partial_grouped_sum(_ds(df), ["g"], sums=["x", "y"], count_alias="n")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        want = df.groupby("g").agg(sum_x=("x", "sum"), sum_y=("y", "sum"), n=("x", "count")).reset_index()
        assert (out["n"].to_numpy() == want["n"].to_numpy()).all()
        assert np.allclose(out["sum_x"], want["sum_x"])
        assert (out["sum_y"].to_numpy() == want["sum_y"].to_numpy()).all()


class TestDedup:
    def test_exact_dedup_first_wins(self):
        from deepcrawl4ai_ray.stages.dedup import exact_dedup_stats

        df = pd.DataFrame({"doc_id": [5, 1, 2, 3], "text": ["aa", "aa", "bb", "aa"]})
        out = exact_dedup_stats(_ds(df), "doc_id", "text").to_pandas()
        by_hash = out.set_index("text_hash")
        import hashlib

        h_aa = hashlib.md5(b"aa").hexdigest()
        assert by_hash.loc[h_aa, "keep_doc_id"] == 1
        assert by_hash.loc[h_aa, "n_copies"] == 3

    def test_minhash_finds_planted_dup(self):
        from deepcrawl4ai_ray.stages.dedup import minhash_lsh_pairs

        base = "the quick brown fox jumps over the lazy dog near the river bank today"
        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [base, base + " extra", "completely different content about engines and parquet files here"],
            }
        )
        pairs = minhash_lsh_pairs(_ds(docs), "doc_id", "text", threshold=0.4).to_pandas()
        assert [1, 2] in pairs[["id_a", "id_b"]].values.tolist()
        assert not any(3 in p for p in pairs[["id_a", "id_b"]].values.tolist())

    def test_srp_near_dup_recall_and_precision(self):
        """Planted pairs at cos ≈ 0.96-0.99 (NOT byte-identical) must all
        surface; pairs below threshold must not.  Verifies the bucketed
        SRP-LSH plan end-to-end against a brute-force oracle."""
        from deepcrawl4ai_ray.stages.dedup import srp_near_dup_pairs

        rng = np.random.RandomState(7)
        d, n = 32, 120
        V = rng.randn(n, d)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        # plant: ids 1000+i is a near-dup of i for i in 0..19, at varying
        # perturbation strength spanning cos ~0.955..0.999
        planted, p_ids = [], []
        for i in range(20):
            eps = 0.05 + 0.25 * (i / 19.0)  # cos in ≈ (0.955, 0.999)
            w = V[i] + eps * rng.randn(d) / np.sqrt(d)
            planted.append(w / np.linalg.norm(w))
            p_ids.append(1000 + i)
        allV = np.vstack([V, planted])
        ids = np.concatenate([np.arange(n), np.array(p_ids)]).astype(np.int64)
        df = pd.DataFrame({"vec_id": ids, "embedding": list(allV)})
        got = srp_near_dup_pairs(_ds(df), "vec_id", "embedding", threshold=0.95).to_pandas()
        got_pairs = set(map(tuple, got[["id_a", "id_b"]].values.tolist()))
        # brute-force oracle over the same comparator
        S = np.round(allV @ allV.T, 4)
        want = set()
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                if S[a, b] >= 0.95:
                    want.add((int(min(ids[a], ids[b])), int(max(ids[a], ids[b]))))
        assert got_pairs == want
        assert len(want) >= 10  # the plant actually created ≥10 super-threshold pairs

    def _dup_corpus(self, n=120, words=25):
        """Docs with planted near-dups: every 5th doc gets a copy with
        the last word dropped."""
        base = [
            " ".join(f"tok{(i * 7 + j * 13) % 97}" for j in range(words)) for i in range(n)
        ]
        ids = list(range(n))
        texts = list(base)
        for i in range(0, n, 5):
            ids.append(10_000 + i)
            texts.append(" ".join(base[i].split(" ")[:-1]))
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"), "text": texts})

    def test_minhash_payload_modes_identical(self):
        """All payload paths — plain join, bloom-pruned join
        (corpus-scale), broadcast (small-pairs), and auto — must return
        byte-identical pairs: bloom FPs only ship extra payload rows
        (the inner joins drop them), and broadcast attaches the same
        bytes map-side."""
        from deepcrawl4ai_ray.stages.dedup import minhash_lsh_pairs

        docs = self._dup_corpus()

        def run(mode):
            return (
                minhash_lsh_pairs(
                    _ds(docs), "doc_id", "text", threshold=0.9, verify="exact", payload_mode=mode
                )
                .to_pandas()
                .sort_values(["id_a", "id_b"])
                .reset_index(drop=True)
            )

        a = run("join")
        assert len(a) >= 20  # the plant produced real pairs
        for mode in ("prune", "broadcast", "auto"):
            pd.testing.assert_frame_equal(a, run(mode))

    def test_dedup_pairs_small_guard_equality(self, monkeypatch):
        """The guarded driver-side pair dedup (small candidate sets) must
        be byte-identical to the distributed groupby path, for both the
        exact-verify (no val) and sig-verify (Min val) shapes."""
        from deepcrawl4ai_ray.stages import dedup as D

        docs = self._dup_corpus()

        def run(verify):
            return (
                D.minhash_lsh_pairs(_ds(docs), "doc_id", "text", threshold=0.9, verify=verify)
                .to_pandas()
                .sort_values(["id_a", "id_b"])
                .reset_index(drop=True)
            )

        for verify in ("exact", "sig"):
            fast = run(verify)  # guard active: driver-side dedup
            monkeypatch.setattr(D, "_BROADCAST_MAX_PAIRS", 0)
            slow = run(verify)  # guard off: distributed groupby dedup
            monkeypatch.undo()
            assert len(fast) >= 20
            pd.testing.assert_frame_equal(fast, slow)

    def test_srp_payload_modes_identical(self):
        from deepcrawl4ai_ray.stages.dedup import srp_near_dup_pairs

        rng = np.random.RandomState(11)
        V = rng.randn(80, 24)
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        dups = V[::8] + 0.02 * rng.randn(10, 24)
        ids = np.concatenate([np.arange(80), 1000 + np.arange(0, 80, 8)]).astype(np.int64)
        df = pd.DataFrame({"vec_id": ids, "embedding": list(np.vstack([V, dups]))})

        def run(mode):
            return (
                srp_near_dup_pairs(_ds(df), "vec_id", "embedding", threshold=0.95, payload_mode=mode)
                .to_pandas()
                .sort_values(["id_a", "id_b"])
                .reset_index(drop=True)
            )

        a = run("join")
        assert len(a) >= 5
        for mode in ("prune", "broadcast", "auto"):
            pd.testing.assert_frame_equal(a, run(mode))

    def test_lsh_verify_payload_shuffle_reduction(self):
        """VERDICT r2 #2 done-criterion: the id-only candidate path must
        cut the LSH verify-payload shuffle ≥4× vs the r2 inline design
        (shingle sets / float64 vectors carried on EVERY band row).
        Byte totals computed from the actual explode outputs + payload
        tables; the comparison is logged."""
        from deepcrawl4ai_ray.functions import hashing as H
        from deepcrawl4ai_ray.stages.dedup import (
            make_minhash_explode_fn,
            make_srp_explode_fn,
            shingle_sets_stage,
        )

        # web-page-like doc length (~120 words ≈ the bench corpus median);
        # the 25-word toy docs under-weight the shingle payload the
        # inline design ships ×bands
        docs = self._dup_corpus(words=120)
        batch = pa.table({"doc_id": pa.array(docs["doc_id"], pa.int64()), "text": pa.array(docs["text"])})
        bands = 16
        # r2 inline design: every band row carried the doc's shingle set
        sh_bytes = {i: H.shingles(t, 3).nbytes for i, t in zip(docs["doc_id"], docs["text"])}
        e = make_minhash_explode_fn("text", "doc_id", 64, bands, 3, payload="none")(batch)
        band_row_bytes = sum(len(k) + 8 for k in e["band_key"].to_pylist())
        inline_bytes = band_row_bytes + sum(sh_bytes[i] for i in e["doc_id"].to_pylist())
        # id-only path: band rows + the payload table shipped once per doc
        pay = shingle_sets_stage("doc_id", "text", 3)(batch)
        idonly_bytes = band_row_bytes + 2 * sum(len(s) for s in pay["sh"].to_pylist())
        ratio_mh = inline_bytes / idonly_bytes
        print(f"minhash verify shuffle: inline={inline_bytes}B id-only={idonly_bytes}B ({ratio_mh:.1f}x)")
        assert ratio_mh >= 4.0

        # srp: r2 shipped float64 vectors per band; now fp16 per band +
        # one float64 per endpoint side for the exact re-check
        rng = np.random.RandomState(5)
        V = rng.randn(100, 32)
        vdf = pd.DataFrame({"vec_id": np.arange(100, dtype=np.int64), "embedding": list(V)})
        vbatch = pa.table(
            {"vec_id": pa.array(vdf["vec_id"]), "embedding": pa.array(list(V), pa.list_(pa.float64()))}
        )
        srp_bands = 24
        es = make_srp_explode_fn("embedding", "vec_id", bands=srp_bands)(vbatch)
        fp16_band_bytes = sum(len(v) for v in es["vec16"].to_pylist())
        f64_band_bytes = fp16_band_bytes * 4  # same rows at 8B/dim
        # exact re-check payload: ≤ 2 × f64 vector per doc (both sides)
        recheck = 2 * 100 * 32 * 8
        ratio_srp = f64_band_bytes / (fp16_band_bytes + recheck)
        print(f"srp verify shuffle: f64-inline={f64_band_bytes}B fp16+recheck={fp16_band_bytes + recheck}B ({ratio_srp:.1f}x)")
        assert ratio_srp >= 3.0


class TestKnn:
    def test_bruteforce_exact(self):
        from deepcrawl4ai_ray.stages.knn import brute_force_topk

        rng = np.random.RandomState(1)
        V = rng.randn(200, 8)
        df = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64), "embedding": list(V)})
        q = V[0]
        out = brute_force_topk(_ds(df), "vec_id", "embedding", q, k=5, exclude_id=0)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = np.round(Vn @ (q / np.linalg.norm(q)), 4)
        sims[0] = -np.inf
        want = np.argsort(-sims, kind="stable")[:5]
        assert out["vec_id"].tolist() == want.tolist()

    def test_ivf_indexed_equals_unindexed(self, tmp_path):
        """The persisted-index query path (partition-pruned read) must
        return exactly what the per-query-assignment path returns."""
        from deepcrawl4ai_ray.stages.knn import (
            build_ivf_index,
            ivf_topk,
            ivf_topk_indexed,
            train_ivf_centroids,
        )

        rng = np.random.RandomState(3)
        centers = rng.randn(6, 12) * 3
        V = np.vstack([c + rng.randn(60, 12) * 0.3 for c in centers])
        df = pd.DataFrame({"vec_id": np.arange(len(V), dtype=np.int64), "embedding": list(V)})
        cents = train_ivf_centroids(V, nlist=6, iters=5)
        q = V[11]
        direct = ivf_topk(_ds(df), "vec_id", "embedding", q, cents, k=10, nprobe=2)
        idx_dir = str(tmp_path / "ivf")
        build_ivf_index(_ds(df), "vec_id", "embedding", cents, idx_dir)
        indexed = ivf_topk_indexed(idx_dir, "vec_id", "embedding", q, cents, k=10, nprobe=2)
        pd.testing.assert_frame_equal(direct, indexed)

    def test_ivf_append_equals_full_rebuild(self, tmp_path):
        """Incremental add (build A, append B with the persisted
        quantizer) must return exactly what a full build over A ∪ B
        returns — and centroids=None must load the persisted ones."""
        from deepcrawl4ai_ray.stages.knn import (
            append_ivf_index,
            build_ivf_index,
            ivf_topk_indexed,
            load_ivf_centroids,
            train_ivf_centroids,
        )

        rng = np.random.RandomState(5)
        centers = rng.randn(5, 12) * 3
        V = np.vstack([c + rng.randn(48, 12) * 0.3 for c in centers])
        df = pd.DataFrame({"vec_id": np.arange(len(V), dtype=np.int64), "embedding": list(V)})
        cents = train_ivf_centroids(V, nlist=5, iters=5)
        q = V[23]

        full = str(tmp_path / "full")
        build_ivf_index(_ds(df), "vec_id", "embedding", cents, full)
        inc = str(tmp_path / "inc")
        build_ivf_index(_ds(df.iloc[:140]), "vec_id", "embedding", cents, inc)
        append_ivf_index(inc, _ds(df.iloc[140:]), "vec_id", "embedding")

        np.testing.assert_allclose(load_ivf_centroids(inc), cents)
        want = ivf_topk_indexed(full, "vec_id", "embedding", q, None, k=10, nprobe=2)
        got = ivf_topk_indexed(inc, "vec_id", "embedding", q, None, k=10, nprobe=2)
        pd.testing.assert_frame_equal(got, want)

        import pytest as _pytest

        with _pytest.raises(ValueError, match="not a built IVF index"):
            load_ivf_centroids(str(tmp_path / "nope"))

    def test_ivf_recall(self):
        from deepcrawl4ai_ray.stages.knn import brute_force_topk, ivf_topk, train_ivf_centroids

        rng = np.random.RandomState(2)
        centers = rng.randn(8, 16) * 3
        V = np.vstack([c + rng.randn(50, 16) * 0.3 for c in centers])
        df = pd.DataFrame({"vec_id": np.arange(len(V), dtype=np.int64), "embedding": list(V)})
        q = V[7]
        cents = train_ivf_centroids(V, nlist=8, iters=5)
        exact = set(brute_force_topk(_ds(df), "vec_id", "embedding", q, k=10)["vec_id"])
        approx = set(ivf_topk(_ds(df), "vec_id", "embedding", q, cents, k=10, nprobe=3)["vec_id"])
        assert len(exact & approx) >= 7  # ≥70% recall on clustered data


class TestWindows:
    def test_tumbling(self):
        from deepcrawl4ai_ray.stages.windows import tumbling_window_agg

        ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:50", "2024-01-01 01:10"])
        df = pd.DataFrame({"k": ["a", "a", "a"], "ts": ts, "v": [1.0, 2.0, 4.0]})
        out = tumbling_window_agg(_ds(df), "k", "ts", "v", "hour").to_pandas().sort_values("window_start")
        assert out["n"].tolist() == [2, 1]
        assert out["sum_v"].tolist() == [3.0, 4.0]

    def test_sessions(self):
        from deepcrawl4ai_ray.stages.windows import session_counts

        ts = pd.to_datetime(
            ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 01:00", "2024-01-01 03:00"]
        )
        df = pd.DataFrame({"user": [1, 1, 1, 1], "ts": ts})
        out = session_counts(_ds(df), "user", "ts", pd.Timedelta(minutes=30)).to_pandas()
        assert out["n_sessions"].tolist() == [3]


class TestMultimodal:
    def test_image_decode_stage(self):
        from deepcrawl4ai_ray.stages.multimodal import ImageDecodeStage

        batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "payload": pa.array([b"abc", b""], pa.binary())})
        out = ImageDecodeStage("payload", "doc_id")(batch)
        assert out.column_names == ["doc_id", "width", "height", "n_bytes"]
        assert out["n_bytes"].to_pylist() == [3, 0]
        assert out["width"].to_pylist()[0] == (3 * 7) % 640 + 16

    def test_frame_sample_stage(self):
        from deepcrawl4ai_ray.stages.multimodal import FrameSampleStage

        batch = pa.table(
            {"doc_id": pa.array([1], pa.int64()), "payload": pa.array([b"x" * 640], pa.binary())}
        )
        out = FrameSampleStage("payload", "doc_id", k=4)(batch)
        assert out.num_rows == 4
        assert out["frame_idx"].to_pylist() == [0, 1, 2, 3]

    def test_image_resize_stage(self):
        import hashlib

        from deepcrawl4ai_ray.stages.multimodal import ImageResizeStage

        long = "héllo wörld ✓" * 50  # 650 codepoints, multi-byte
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array([long.encode(), b""], pa.binary()),
            }
        )
        out = ImageResizeStage("payload", "doc_id", 64, 64)(batch)
        # k = 64*64//16 = 256 codepoints
        want = long[:256].encode()
        assert out["resized"].to_pylist() == [want, b""]
        assert out["n_bytes_out"].to_pylist() == [len(want), 0]
        assert out["n_bytes_in"].to_pylist()[0] == len(long.encode())
        assert out["resized_md5"].to_pylist()[0] == hashlib.md5(want).hexdigest()
        assert out["out_w"].to_pylist() == [64, 64]

    def test_audio_feature_stage(self):
        import hashlib

        from deepcrawl4ai_ray.stages.multimodal import AudioFeatureStage

        t = "héllo wörld"  # 11 codepoints → windows [0:2][2:5][5:8][8:11]
        batch = pa.table(
            {
                "doc_id": pa.array([7, 8], pa.int64()),
                "payload": pa.array([t.encode(), b"ab"], pa.binary()),
            }
        )
        out = AudioFeatureStage("payload", "doc_id", n_windows=4)(batch)
        rows = list(
            zip(out["doc_id"].to_pylist(), out["window_idx"].to_pylist(), out["feature"].to_pylist())
        )
        # doc 7: 4 windows; doc 8 (2 codepoints): windows 0/4..4/4 yield only j=1 and j=3 non-empty
        feats7 = [r for r in rows if r[0] == 7]
        assert [r[1] for r in feats7] == [0, 1, 2, 3]
        w0 = t[0:2]
        want = round(int(hashlib.md5(w0.encode()).hexdigest()[:8], 16) / 2**32, 6)
        assert feats7[0][2] == want
        feats8 = [r for r in rows if r[0] == 8]
        assert [r[1] for r in feats8] == [1, 3]
        assert all(0.0 <= r[2] < 1.0 for r in rows)


class TestConnectedComponents:
    def test_clusters_resolved(self, ray_session):
        import pandas as pd

        from deepcrawl4ai_ray.stages.dedup import connected_components

        pairs = pd.DataFrame(
            {"id_a": [1, 2, 10, 11, 20], "id_b": [2, 3, 11, 12, 21]}
        )  # chains {1,2,3}, {10,11,12}, {20,21}
        out = connected_components(pairs).to_pandas().set_index("node")["component"]
        assert out[1] == out[2] == out[3] == 1
        assert out[10] == out[11] == out[12] == 10
        assert out[20] == out[21] == 20

    def test_empty(self, ray_session):
        import pandas as pd

        from deepcrawl4ai_ray.stages.dedup import connected_components

        assert connected_components(pd.DataFrame({"id_a": [], "id_b": []})).to_pandas().empty

    def test_dataset_edges_match_pandas(self, ray_session):
        """Dataset-input edges (the corpus-scale path: pairs never touch
        the driver) must produce the same labels as the pandas path."""
        from deepcrawl4ai_ray.stages.dedup import connected_components

        pairs = pd.DataFrame(
            {"id_a": [1, 2, 10, 20, 21], "id_b": [2, 3, 11, 21, 22]}
        ).astype("int64")
        def norm(ds):
            return ds.to_pandas().sort_values("node").reset_index(drop=True)

        a = norm(connected_components(pairs))
        b = norm(connected_components(_ds(pairs)))
        pd.testing.assert_frame_equal(a, b)


class TestIntervalJoin:
    def test_matches_bruteforce_with_boundary_spanning_intervals(self):
        """Range join vs an O(N*M) pandas reference: random points and
        intervals, some spanning multiple buckets, some empty, ties at
        the exact lo/hi bounds."""
        import ray.data as rd

        from deepcrawl4ai_ray.stages.rangejoin import interval_join

        rng = np.random.RandomState(13)
        n_pts, n_iv, width = 2000, 60, 1000
        ts = rng.randint(0, 100_000, n_pts).astype("int64")
        pts = pd.DataFrame({"pid": np.arange(n_pts, dtype=np.int64), "ts": ts})
        lo = rng.randint(0, 100_000, n_iv).astype("int64")
        span = rng.randint(0, 3 * width, n_iv).astype("int64")  # up to 3 buckets
        iv = pd.DataFrame({"iid": np.arange(n_iv, dtype=np.int64), "lo": lo, "hi": lo + span})
        # plant exact-boundary ties
        iv.loc[0, ["lo", "hi"]] = [int(ts[0]), int(ts[1])]

        got = (
            interval_join(
                rd.from_pandas(pts), rd.from_pandas(iv),
                ts_col="ts", lo_col="lo", hi_col="hi", bucket_width_us=width,
            )
            .to_pandas()[["pid", "iid"]]
            .sort_values(["pid", "iid"])
            .reset_index(drop=True)
        )
        want = (
            pts.merge(iv, how="cross")
            .query("lo <= ts <= hi")[["pid", "iid"]]
            .sort_values(["pid", "iid"])
            .reset_index(drop=True)
        )
        assert len(want) > 100  # the scenario is non-trivial
        pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


class TestSimhashNearDup:
    def test_matches_bruteforce_hamming(self):
        """Banded SimHash near-dup vs an all-pairs popcount reference:
        100% recall for hamming <= bands-1 (pigeonhole), zero extras."""
        import ray.data as rd

        from deepcrawl4ai_ray.functions import hashing as H
        from deepcrawl4ai_ray.stages.dedup import simhash_near_dup_pairs

        base = [
            " ".join(f"w{(i * 11 + j * 3) % 211}" for j in range(60)) for i in range(80)
        ]
        ids = list(range(80))
        texts = list(base)
        for i in range(0, 80, 8):  # near-dups: one word swapped
            ids.append(1000 + i)
            texts.append(base[i].replace(f"w{(i * 11) % 211} ", "wx ", 1))
        docs = pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"), "text": texts})

        got = (
            simhash_near_dup_pairs(_ds(docs), "doc_id", "text", max_hamming=3)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        sigs = {i: H.simhash64(t) for i, t in zip(ids, texts)}
        want = []
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                ia, ib = sorted((ids[a], ids[b]))
                h = H.hamming64(sigs[ids[a]], sigs[ids[b]])
                if h <= 3:
                    want.append((ia, ib, h))
        want = sorted(set(want))
        assert len(want) >= 5  # the plant produced real near-dups
        assert list(map(tuple, got.values.tolist())) == want

    def test_srp_band_payload_modes_equal(self, ray_session):
        """band_payload='id' (screenless id-only exchange) must produce
        the byte-identical pair set as the fp16-screened default — the
        exact float64 re-check decides in both modes."""
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dedup import srp_near_dup_pairs

        rng = np.random.RandomState(3)
        V = rng.standard_normal((200, 16))
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        ids = list(range(200)) + [1000 + i for i in range(0, 200, 10)]
        P = V[::10] + 0.01 * rng.standard_normal((20, 16))
        allv = np.concatenate([V, P])
        docs = pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"), "emb": list(allv)})
        ds = _ds(docs)
        a = (
            srp_near_dup_pairs(ds, "doc_id", "emb", threshold=0.95)
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        b = (
            srp_near_dup_pairs(ds, "doc_id", "emb", threshold=0.95, band_payload="id")
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        assert len(a) >= 15  # the planted near-identical vectors were found
        with pytest.raises(ValueError):
            srp_near_dup_pairs(ds, "doc_id", "emb", band_payload="fp32")

    def test_minhash_sig_col_path_equals_text_path(self, ray_session):
        """MinHash banding from the enrich stage's stored signatures must
        produce the same verified pair set as computing from text, for
        both verify modes; zero-token docs behave identically."""
        import ray.data as rd

        from deepcrawl4ai_ray.functions import hashing as H
        from deepcrawl4ai_ray.stages.dedup import minhash_lsh_pairs

        base = [" ".join(f"t{(i * 13 + j) % 97}" for j in range(50)) for i in range(40)]
        ids = list(range(40)) + [500 + i for i in range(0, 40, 4)] + [999]
        texts = base + [base[i] + " extra" for i in range(0, 40, 4)] + [""]  # incl. empty doc
        docs = pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"), "text": texts})
        ds = _ds(docs)

        def add_sig(t):
            sigs = [
                H.minhash_signature_fast(H.shingles(x, 3), 32).tobytes()
                for x in t["text"].to_pylist()
            ]
            return t.append_column("minhash", pa.array(sigs, pa.binary()))

        sig_ds = ds.map_batches(add_sig, batch_format="pyarrow")
        for verify in ("exact", "sig"):
            a = (
                minhash_lsh_pairs(ds, "doc_id", "text", threshold=0.8, num_perm=32, verify=verify)
                .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
            )
            b = (
                minhash_lsh_pairs(
                    sig_ds, "doc_id", "text", threshold=0.8, num_perm=32, verify=verify,
                    sig_col="minhash",
                )
                .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(a, b)
            assert len(a) > 0, verify

    def test_sig_col_path_equals_text_path(self, ray_session):
        """Precomputed-signature input (sig_col — the composed-pipeline
        path reusing the enrich stage's signatures) must produce the
        byte-identical pair set as re-tokenizing text."""
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dedup import simhash_near_dup_pairs, simhash_stage

        base = [" ".join(f"w{(i * 7 + j) % 101}" for j in range(40)) for i in range(60)]
        ids = list(range(60)) + [1000 + i for i in range(0, 60, 6)]
        texts = base + [base[i].replace(f"w{(i * 7) % 101} ", "wx ", 1) for i in range(0, 60, 6)]
        docs = pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"), "text": texts})
        ds = _ds(docs)

        from_text = (
            simhash_near_dup_pairs(ds, "doc_id", "text")
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        sig_ds = ds.map_batches(simhash_stage("doc_id", "text"), batch_format="pyarrow")
        from_sigs = (
            simhash_near_dup_pairs(sig_ds, "doc_id", sig_col="simhash")
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(from_text, from_sigs)
        assert len(from_text) > 0

        with pytest.raises(ValueError):
            simhash_near_dup_pairs(ds, "doc_id")  # neither input given
        with pytest.raises(ValueError):
            simhash_near_dup_pairs(sig_ds, "doc_id", "text", sig_col="simhash")  # both


class TestPQ:
    def test_pq_rerank_equals_bruteforce_and_compresses(self):
        """PQ + exact re-rank (refine=all) must EQUAL brute force; the
        scan index holds exactly m bytes per vector (64x smaller than
        float64 d=64)."""
        import ray.data as rd

        from deepcrawl4ai_ray.stages.knn import brute_force_topk, pq_encode, pq_topk, train_pq

        rng = np.random.RandomState(21)
        centers = rng.randn(6, 64) * 2
        V = np.vstack([c + rng.randn(80, 64) * 0.4 for c in centers])
        df = pd.DataFrame({"vec_id": np.arange(len(V), dtype=np.int64), "embedding": list(V)})
        ds = _ds(df)
        books = train_pq(V[:256], m=8, k=64)
        codes = pq_encode(ds, "vec_id", "embedding", books)
        code_bytes = codes.to_pandas()["pq_code"].map(len)
        assert (code_bytes == 8).all()  # m bytes/vector

        q = V[3]
        exact = brute_force_topk(ds, "vec_id", "embedding", q, k=10, exclude_id=3)
        full = pq_topk(codes, ds, "vec_id", "embedding", q, books, k=10, refine=len(V), exclude_id=3)
        pd.testing.assert_frame_equal(exact, full)

    def test_pq_recall_with_modest_refine(self):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.knn import brute_force_topk, pq_encode, pq_topk, train_pq

        rng = np.random.RandomState(22)
        centers = rng.randn(8, 64) * 2
        V = np.vstack([c + rng.randn(60, 64) * 0.4 for c in centers])
        df = pd.DataFrame({"vec_id": np.arange(len(V), dtype=np.int64), "embedding": list(V)})
        ds = _ds(df)
        books = train_pq(V[:256], m=8, k=64)
        codes = pq_encode(ds, "vec_id", "embedding", books)
        q = V[7]
        exact = set(brute_force_topk(ds, "vec_id", "embedding", q, k=10)["vec_id"])
        approx = set(
            pq_topk(codes, ds, "vec_id", "embedding", q, books, k=10, refine=48)["vec_id"]
        )
        assert len(exact & approx) >= 8  # ADC prescreen at refine=10% keeps the ball

    def test_pq_rejects_k_over_256(self):
        """uint8 codes wrap past 256 centroids — must refuse, not corrupt."""
        import pytest as _pytest

        from deepcrawl4ai_ray.stages.knn import pq_encode, train_pq

        with _pytest.raises(ValueError, match="256"):
            train_pq(np.random.RandomState(0).randn(512, 64), m=8, k=512)
        bad_books = np.zeros((8, 300, 8))
        with _pytest.raises(ValueError, match="256"):
            pq_encode(None, "vec_id", "embedding", bad_books)


class TestTextSearch:
    def _zipf_docs(self, n_docs=400, vocab=200, seed=7):
        rng = np.random.default_rng(seed)
        words = [f"w{i}" for i in range(vocab)]
        probs = np.array([1 / (i + 1) ** 1.1 for i in range(vocab)])
        probs /= probs.sum()
        return [
            " ".join(rng.choice(words, size=rng.integers(5, 60), p=probs))
            for _ in range(n_docs)
        ]

    def test_exact_top_tokens_matches_counter_across_blocks(self, ray_session):
        """Bounded-summary top-k must EQUAL a full count, for any block
        split — the summaries prune per batch, the recount restores
        exactness."""
        from collections import Counter

        from deepcrawl4ai_ray.functions.hashing import tokens
        from deepcrawl4ai_ray.stages.textsearch import exact_top_tokens

        docs = self._zipf_docs()
        ds = _ds(pd.DataFrame({"text": docs})).repartition(6)
        c = Counter()
        for t in docs:
            c.update(tokens(t))
        expected = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = exact_top_tokens(ds, "text", k=10, m=64).to_pandas()
        assert list(map(tuple, got.itertuples(index=False))) == expected

    def test_exact_top_bigrams_matches_counter_and_respects_doc_bounds(
        self, ray_session
    ):
        """ngram=2: same exactness guarantee over bigrams, and n-grams
        never cross a document boundary."""
        from collections import Counter

        from deepcrawl4ai_ray.functions.hashing import tokens
        from deepcrawl4ai_ray.stages.textsearch import exact_top_tokens

        docs = self._zipf_docs()
        ds = _ds(pd.DataFrame({"text": docs})).repartition(6)
        c = Counter()
        for t in docs:
            tt = tokens(t)
            c.update(f"{a} {b}" for a, b in zip(tt, tt[1:]))
        expected = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = exact_top_tokens(ds, "text", k=10, m=512, ngram=2).to_pandas()
        assert list(map(tuple, got.itertuples(index=False))) == expected
        # boundary check: a 2-doc corpus has no cross-doc bigram
        ds2 = _ds(pd.DataFrame({"text": ["a b", "c d"]}))
        got2 = exact_top_tokens(ds2, "text", k=10, m=64, ngram=2).to_pandas()
        assert set(got2["tok"]) == {"a b", "c d"}

    def test_exact_top_tokens_raises_when_unprovable(self, ray_session):
        """Near-uniform data with tiny m: the omission bound cannot
        separate the top-k, so the operator must RAISE, never silently
        return an approximation."""
        import pytest as _pytest

        from deepcrawl4ai_ray.stages.textsearch import exact_top_tokens

        rng = np.random.default_rng(3)
        words = [f"u{i:04d}" for i in range(3000)]
        docs = [" ".join(rng.choice(words, size=50)) for _ in range(300)]
        ds = _ds(pd.DataFrame({"text": docs})).repartition(6)
        with _pytest.raises(ValueError, match="raise m"):
            exact_top_tokens(ds, "text", k=10, m=8).to_pandas()

    def test_exact_top_tokens_uniform_counts_raise_not_empty(self, ray_session):
        """Every batch token unique (count 1) with m tiny: summaries emit
        ZERO tokens (keep = cnts > θ drops all), so nothing is provable —
        must raise, never return an empty result for a non-empty corpus."""
        import pytest as _pytest

        from deepcrawl4ai_ray.stages.textsearch import exact_top_tokens

        docs = [" ".join(f"w{i:04d}_{j}" for i in range(100)) for j in range(6)]
        ds = _ds(pd.DataFrame({"text": docs})).repartition(3)
        with _pytest.raises(ValueError, match="raise m"):
            exact_top_tokens(ds, "text", k=10, m=8).to_pandas()

    def test_exact_top_tokens_under_k_vocab_exact(self, ray_session):
        """Corpus with fewer than k distinct tokens and m large enough
        that nothing is ever omitted (Θ=0): returning the full vocab with
        exact counts IS the exact top-k."""
        from deepcrawl4ai_ray.stages.textsearch import exact_top_tokens

        docs = ["a a b", "b c a", "a"]
        ds = _ds(pd.DataFrame({"text": docs})).repartition(2)
        got = exact_top_tokens(ds, "text", k=10, m=64).to_pandas()
        assert list(map(tuple, got.itertuples(index=False))) == [
            ("a", 4), ("b", 2), ("c", 1)]

    def test_bm25_matches_local_reference(self, ray_session):
        import math
        from collections import Counter

        from deepcrawl4ai_ray.functions.hashing import tokens
        from deepcrawl4ai_ray.stages.textsearch import bm25_topk

        docs = self._zipf_docs(seed=11)
        terms = ["w3", "w17", "w50"]
        N = len(docs)
        dls = [len(tokens(t)) for t in docs]
        avgdl = sum(dls) / N
        dfc = {t: sum(1 for d in docs if t in tokens(d)) for t in terms}
        scores = {}
        for i, d in enumerate(docs):
            cnt = Counter(tokens(d))
            s = 0.0
            for t in terms:
                tf = cnt.get(t, 0)
                if tf:
                    idf = math.log((N - dfc[t] + 0.5) / (dfc[t] + 0.5) + 1)
                    s += idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dls[i] / avgdl))
            if s > 0:
                scores[i] = s
        ref = sorted(((round(v, 4), -k) for k, v in scores.items()), reverse=True)[:10]
        ref = [(-i, r) for r, i in ref]
        ds = _ds(
            pd.DataFrame({"doc_id": np.arange(N, dtype=np.int64), "text": docs})
        ).repartition(5)
        got = bm25_topk(ds, "doc_id", "text", terms, k=10)
        got["bm25"] = got["bm25"].round(4)
        assert list(map(tuple, got.itertuples(index=False))) == ref


class TestSequencePacking:
    def test_offsets_match_local_prefix_sum(self, ray_session):
        """pack_sequences == a single-process exclusive prefix sum in
        doc-id order, with empty docs occupying no tokens/sequence."""
        import pandas as pd

        from deepcrawl4ai_ray.functions.hashing import tokens
        from deepcrawl4ai_ray.stages.pack import pack_sequences

        rng = np.random.default_rng(7)
        ids = np.arange(300, dtype=np.int64)
        rng.shuffle(ids)  # arrival order != doc-id order
        texts = []
        for i in ids:
            if i % 37 == 0:
                texts.append("")  # empty docs must be skipped
            else:
                n = int(rng.integers(1, 40))
                texts.append(" ".join(f"w{int(rng.integers(0, 50))}" for _ in range(n)))
        df = pd.DataFrame({"doc_id": ids, "text": texts})
        ds = _ds(df).repartition(7)

        got = (
            pack_sequences(ds, "doc_id", "text", seq_len=16, num_ranges=5)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

        ref = df.assign(n_tokens=[len(tokens(t)) for t in df["text"]])
        ref = ref[ref.n_tokens > 0].sort_values("doc_id").reset_index(drop=True)
        ref["tok_start"] = ref["n_tokens"].cumsum().shift(fill_value=0)
        ref["seq_first"] = ref["tok_start"] // 16
        ref["seq_last"] = (ref["tok_start"] + ref["n_tokens"] - 1) // 16

        assert got["doc_id"].tolist() == ref["doc_id"].tolist()
        for c in ("n_tokens", "tok_start", "seq_first", "seq_last"):
            assert got[c].tolist() == ref[c].tolist(), c
        # stream is gapless: next tok_start == prev tok_start + prev n
        assert (
            got["tok_start"].iloc[1:].to_numpy()
            == (got["tok_start"] + got["n_tokens"]).iloc[:-1].to_numpy()
        ).all()

    def test_max_id_hint_skips_aggregate_and_matches(self, ray_session):
        import pandas as pd

        from deepcrawl4ai_ray.stages.pack import pack_sequences

        df = pd.DataFrame(
            {"doc_id": np.arange(50, dtype=np.int64), "text": ["a b c"] * 50}
        )
        a = pack_sequences(_ds(df), "doc_id", "text", 8).to_pandas()
        b = pack_sequences(_ds(df), "doc_id", "text", 8, max_id=49).to_pandas()
        a = a.sort_values("doc_id").reset_index(drop=True)
        b = b.sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)
        # 50 docs x 3 tokens, seq_len 8: doc 0 -> tok 0..2 seq 0; doc 10 -> tok 30..32 spans seq 3-4
        r = a[a.doc_id == 10].iloc[0]
        assert (r.tok_start, r.seq_first, r.seq_last) == (30, 3, 4)


class TestPageRank:
    def _local_pr(self, edges, iters=3, d=0.85):
        """Dense-matrix reference implementation (teleport + dangling
        redistribution), for tiny graphs."""
        nodes = sorted({u for e in edges for u in e})
        idx = {u: i for i, u in enumerate(nodes)}
        n = len(nodes)
        dedup = sorted(set(edges))
        out = {u: 0 for u in nodes}
        for s, _ in dedup:
            out[s] += 1
        pr = np.full(n, 1.0 / n)
        for _ in range(iters):
            nxt = np.zeros(n)
            for s, t in dedup:
                nxt[idx[t]] += pr[idx[s]] / out[s]
            dangling = sum(pr[idx[u]] for u in nodes if out[u] == 0)
            pr = (1 - d) / n + d * (nxt + dangling / n)
        return {u: pr[idx[u]] for u in nodes}

    def test_matches_dense_reference_with_dangling(self, ray_session):
        from deepcrawl4ai_ray.stages.pagerank import pagerank

        rng = np.random.default_rng(3)
        nodes = [f"u{i}" for i in range(40)]
        edges = []
        for i in range(200):
            s = nodes[int(rng.integers(0, 30))]  # u30..u39 never link out
            t = nodes[int(rng.integers(0, 40))]
            edges.append((s, t))
        edges += edges[:17]  # duplicate edges must count once
        df = pd.DataFrame(edges, columns=["src", "dst"])
        got = (
            pagerank(_ds(df).repartition(5), iters=3, num_buckets=4)
            .to_pandas()
            .set_index("node")["pr"]
        )
        ref = self._local_pr(edges)
        assert set(got.index) == set(ref)
        for u, v in ref.items():
            assert abs(got[u] - v) < 1e-9, u
        assert abs(got.sum() - 1.0) < 1e-9  # mass conserved

    def test_src_only_nodes_get_base_rank(self, ray_session):
        from deepcrawl4ai_ray.stages.pagerank import pagerank

        df = pd.DataFrame({"src": ["a", "a", "b"], "dst": ["b", "c", "c"]})
        got = pagerank(_ds(df), iters=2, num_buckets=2).to_pandas()
        ref = self._local_pr([("a", "b"), ("a", "c"), ("b", "c")], iters=2)
        for _, r in got.iterrows():
            assert abs(r["pr"] - ref[r["node"]]) < 1e-12


class TestSnapshotDiff:
    def test_added_removed_changed_unchanged(self, ray_session):
        from deepcrawl4ai_ray.stages.snapshot import snapshot_diff

        old = pd.DataFrame(
            {"doc_id": [1, 2, 3, 4], "text": ["same", "will change", "gone", "also same"]}
        )
        new = pd.DataFrame(
            {"doc_id": [1, 2, 4, 9], "text": ["same", "CHANGED", "also same", "fresh"]}
        )
        got = (
            snapshot_diff(_ds(old).repartition(2), _ds(new).repartition(3), "doc_id", "text")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert list(map(tuple, got.itertuples(index=False))) == [
            (2, "changed"), (3, "removed"), (9, "added")]

    def test_identical_snapshots_empty_delta(self, ray_session):
        from deepcrawl4ai_ray.stages.snapshot import snapshot_diff

        df = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64),
                           "text": [f"t{i}" for i in range(50)]})
        out = snapshot_diff(_ds(df), _ds(df.copy()), "doc_id", "text").to_pandas()
        assert len(out) == 0

    def test_null_text_treated_as_empty(self, ray_session):
        from deepcrawl4ai_ray.stages.snapshot import snapshot_diff

        old = pd.DataFrame({"doc_id": [1, 2], "text": [None, ""]})
        new = pd.DataFrame({"doc_id": [1, 2], "text": ["", None]})
        out = snapshot_diff(_ds(old), _ds(new), "doc_id", "text").to_pandas()
        assert len(out) == 0  # md5(None→"") == md5("")


class TestCdxIndex:
    """stages/cdx — SURT-sorted capture index with manifest pruning."""

    def test_surt_key_forms(self):
        from deepcrawl4ai_ray.stages.cdx import surt_key, surt_prefix_for_host

        assert surt_key("https://a.b.example/p/1") == "example,b,a)/p/1"
        assert surt_key("https://host.example") == "example,host)"
        assert surt_key("http://h.x/") == "x,h)/"
        # the ')' terminator keeps host prefixes exact
        # SURT lowercases the host (archive convention): a mixed-case
        # capture must be found by a lowercase-host prefix lookup; the
        # path stays case-sensitive.
        assert surt_key("https://Host.Example/Path/X") == "example,host)/Path/X"
        assert surt_key("https://HOST.example/p").startswith(surt_prefix_for_host("host.EXAMPLE"))
        assert surt_key("https://host-70.example/p/0").startswith("example,host-70)")
        assert not surt_key("https://host-70.example/p/0").startswith(
            surt_prefix_for_host("host-7.example")
        )

    def test_lookup_matches_brute_force_and_prunes(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.stages.cdx import (
            build_cdx_index,
            cdx_files_for_prefix,
            cdx_prefix_lookup,
            surt_key,
            surt_prefix_for_host,
        )

        hosts = [f"h{i}.example" for i in range(40)]
        urls = [f"https://{h}/p/{j}" for h in hosts for j in range(25)]
        df = pd.DataFrame({"url": urls, "warc_ts": range(len(urls))})
        idx = str(tmp_path / "cdx")
        build_cdx_index(rd.from_pandas(df).repartition(16), idx, "url")

        prefix = surt_prefix_for_host("h7.example")
        got = sorted(cdx_prefix_lookup(idx, prefix).to_pandas()["url"])
        exp = sorted(u for u in urls if surt_key(u).startswith(prefix))
        assert got == exp and len(got) == 25
        # h7 must not swallow h70-like hosts (none here) nor vice versa;
        # and the manifest must prune: one host's range lives in few files
        n, total = cdx_files_for_prefix(idx, prefix)
        assert total >= 8 and n <= 2

        # miss path: unknown host → empty, zero or one file touched
        miss = cdx_prefix_lookup(idx, surt_prefix_for_host("zz.nowhere"))
        assert miss.count() == 0

    def test_empty_prefix_guard(self, tmp_path):
        import pytest as _pytest

        from deepcrawl4ai_ray.stages.cdx import cdx_prefix_lookup

        with _pytest.raises(ValueError):
            cdx_prefix_lookup(str(tmp_path), "")


class TestTemperatureSample:
    """stages/sample — temperature-balanced (T=2) group sampling."""

    def test_targets_upweight_tail_and_cap(self):
        import numpy as np

        from deepcrawl4ai_ray.stages.sample import temperature_targets

        counts = {"en": 9000, "el": 100, "zh": 900}
        tgt = temperature_targets(counts, frac=0.1)
        # totals bounded by frac·N (floor can undershoot slightly)
        assert sum(tgt.values()) <= 0.1 * sum(counts.values())
        # effective keep-rate must be monotonically higher for rarer groups
        rates = {g: tgt[g] / counts[g] for g in counts}
        assert rates["el"] > rates["zh"] > rates["en"]
        # cap: a tiny group can never exceed its size
        tgt2 = temperature_targets({"a": 2, "b": 100000}, frac=1.0)
        assert tgt2["a"] <= 2
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            temperature_targets(counts, frac=0.5, tau=3.0)
        with _pytest.raises(ValueError):
            temperature_targets(counts, frac=0.0)

    def test_split_invariant_and_exact_counts(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.stages.sample import temperature_sample, temperature_targets

        df = pd.DataFrame(
            {
                "doc_id": range(1300),
                "lang": ["en"] * 1000 + ["de"] * 250 + ["el"] * 50,
            }
        )
        one = temperature_sample(rd.from_pandas(df), "lang", "doc_id", 0.4).to_pandas()
        many = temperature_sample(
            rd.from_pandas(df).repartition(9), "lang", "doc_id", 0.4
        ).to_pandas()
        key = ["doc_id", "lang"]
        pd.testing.assert_frame_equal(
            one.sort_values(key).reset_index(drop=True)[key],
            many.sort_values(key).reset_index(drop=True)[key],
        )
        tgt = temperature_targets({"en": 1000, "de": 250, "el": 50}, 0.4)
        got = one.groupby("lang").size().to_dict()
        assert got == {g: n for g, n in tgt.items() if n > 0}


class TestCanonicalUrlDedup:
    """stages/dedup.canonical_url_dedup — URL-variant collapse."""

    def test_preference_order_and_counts(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dedup import canonical_url_dedup

        df = pd.DataFrame(
            {
                "url": [
                    "http://a.example/p",           # loses: http
                    "https://a.example/p?utm=1",    # loses: query stripped, longer
                    "https://a.example/p",          # wins: https + shortest
                    "https://www.a.example/p/",     # loses: longer
                    "https://b.example",            # singleton group
                    "https://b.example",            # duplicate spelling: 1 variant
                ]
            }
        )
        out = (
            canonical_url_dedup(rd.from_pandas(df).repartition(3))
            .to_pandas()
            .sort_values("canon_key")
            .reset_index(drop=True)
        )
        assert out["canon_key"].tolist() == ["a.example/p", "b.example"]
        assert out["best_url"].tolist() == ["https://a.example/p", "https://b.example"]
        assert out["n_variants"].astype(int).tolist() == [4, 1]


class TestWeightedSampleTopK:
    """stages/sample.weighted_sample_topk — sequential Poisson πps draw."""

    def test_matches_bruteforce_and_split_invariant(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.stages.sample import _poisson_keys, weighted_sample_topk

        rng = np.random.default_rng(7)
        df = pd.DataFrame(
            {"doc_id": np.arange(2000), "w": rng.integers(1, 5000, size=2000)}
        )
        want = df.copy()
        want["sample_key"] = _poisson_keys(df["doc_id"].to_numpy(), df["w"].to_numpy())
        want = (
            want.sort_values(["sample_key", "doc_id"]).head(100).reset_index(drop=True)
        )
        for parts in (1, 13):
            got = weighted_sample_topk(
                rd.from_pandas(df).repartition(parts), "doc_id", "w", 100
            ).to_pandas()
            got = got.sort_values(["sample_key", "doc_id"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(got[["doc_id", "w", "sample_key"]], want)

    def test_inclusion_rate_tracks_weight(self, ray_session):
        # two weight classes 1:10 — selection odds must follow the
        # weights (sequential Poisson is approximately πps for k << N)
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.stages.sample import weighted_sample_topk

        n = 4000
        df = pd.DataFrame(
            {"doc_id": np.arange(n), "w": np.where(np.arange(n) % 2 == 0, 10, 1)}
        )
        got = weighted_sample_topk(rd.from_pandas(df), "doc_id", "w", 400).to_pandas()
        heavy = int((got["w"] == 10).sum())
        # expected heavy share 10/11 ≈ 0.909; allow generous slack
        assert heavy / 400 > 0.8

    def test_k_exceeds_n_and_bad_weight(self, ray_session):
        import pandas as pd
        import pytest as _pytest
        import ray.data as rd

        from deepcrawl4ai_ray.stages.sample import weighted_sample_topk

        df = pd.DataFrame({"doc_id": [1, 2, 3], "w": [5, 5, 5]})
        out = weighted_sample_topk(rd.from_pandas(df), "doc_id", "w", 10).to_pandas()
        assert len(out) == 3 and set(out.columns) == {"doc_id", "w", "sample_key"}

        bad = pd.DataFrame({"doc_id": [1, 2], "w": [5, 0]})
        with _pytest.raises(Exception, match="non-positive weight"):
            weighted_sample_topk(rd.from_pandas(bad), "doc_id", "w", 1).to_pandas()
        with _pytest.raises(ValueError):
            weighted_sample_topk(rd.from_pandas(df), "doc_id", "w", 0)


class TestRecrawlPriority:
    """stages/snapshot.recrawl_priority — change-rate recrawl planner."""

    def _snap(self, rows):
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(rows, columns=["url", "text"]))

    def test_counts_and_classes(self, ray_session):
        from deepcrawl4ai_ray.stages.snapshot import recrawl_priority

        s0 = self._snap([("a", "x"), ("b", "x"), ("c", "x")])
        s1 = self._snap([("a", "y"), ("b", "x"), ("c", "y")])
        s2 = self._snap([("a", "z"), ("b", "x"), ("c", "y")])
        got = (
            recrawl_priority([s0, s1, s2], "url", "text")
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert got.n_changes.tolist() == [2, 0, 1]
        assert got.priority.tolist() == ["hot", "cold", "warm"]

    def test_absent_keys_and_hot_min(self, ray_session):
        from deepcrawl4ai_ray.stages.snapshot import recrawl_priority

        # "d" exists only in s1+s2 (one comparable pair, changed);
        # "e" only in s0 (no comparable pair → 0 changes)
        s0 = self._snap([("a", "x"), ("e", "q")])
        s1 = self._snap([("a", "x"), ("d", "1")])
        s2 = self._snap([("a", "y"), ("d", "2")])
        got = (
            recrawl_priority([s0, s1, s2], "url", "text", hot_min=1)
            .to_pandas()
            .set_index("url")
        )
        assert got.loc["a", "n_changes"] == 1 and got.loc["a", "priority"] == "hot"
        assert got.loc["d", "n_changes"] == 1
        assert got.loc["e", "n_changes"] == 0 and got.loc["e", "priority"] == "cold"

    def test_guards_and_split_invariance(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from deepcrawl4ai_ray.stages.snapshot import recrawl_priority

        with _pytest.raises(ValueError):
            recrawl_priority([self._snap([("a", "x")])], "url", "text")

        rows = [(f"u{i}", f"t{i % 4}") for i in range(200)]
        rows2 = [(f"u{i}", f"t{(i + (i % 3 == 0)) % 4}") for i in range(200)]
        a = recrawl_priority(
            [self._snap(rows), self._snap(rows2)], "url", "text"
        ).to_pandas().sort_values("url").reset_index(drop=True)
        b = recrawl_priority(
            [self._snap(rows).repartition(7), self._snap(rows2).repartition(3)],
            "url",
            "text",
        ).to_pandas().sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        got = dict(zip(a.url, a.n_changes))
        assert got == {f"u{i}": (1 if i % 3 == 0 else 0) for i in range(200)}


class TestClusterRepresentatives:
    def test_score_wins_with_tiebreak(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dedup import cluster_representatives

        labels = rd.from_pandas(
            pd.DataFrame(
                {
                    "node": pd.Series([1, 2, 3, 10, 11], dtype="int64"),
                    "component": pd.Series([1, 1, 1, 10, 10], dtype="int64"),
                }
            )
        )
        scores = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([1, 2, 3, 10, 11, 99], dtype="int64"),
                    "q": [0.5, 0.9, 0.9, 0.3, 0.3, 1.0],  # 99 = unclustered, ignored
                }
            )
        )
        got = (
            cluster_representatives(labels, scores, "doc_id", "q")
            .to_pandas()
            .sort_values("component")
            .reset_index(drop=True)
        )
        # cluster 1: max q is tied (2, 3) → min node 2; cluster 10: tie → 10
        assert got.rep_doc_id.tolist() == [2, 10]
        assert got.cluster_size.tolist() == [3, 2]
        assert got.rep_q.tolist() == [0.9, 0.3]


class TestPagerankBroadcast:
    def test_modes_equal_and_guarded(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.pagerank import pagerank

        rng = np.random.RandomState(7)
        e = pd.DataFrame(
            {
                "src": [f"n{i}" for i in rng.randint(0, 120, 800)],
                "dst": [f"n{i}" for i in rng.randint(0, 120, 800)],
            }
        )
        ds = rd.from_pandas(e)
        a = pagerank(ds, iters=2, rank_mode="join").to_pandas().sort_values("node").reset_index(drop=True)
        b = pagerank(ds, iters=2, rank_mode="broadcast").to_pandas().sort_values("node").reset_index(drop=True)
        assert (a.node == b.node).all()
        assert np.abs(a.pr.to_numpy() - b.pr.to_numpy()).max() < 1e-12
        assert abs(b.pr.sum() - 1.0) < 1e-9
        with pytest.raises(ValueError):
            pagerank(ds, rank_mode="gossip")

    def test_hash_posmap_equals_index_in_fallback(self, ray_session, monkeypatch):
        """The broadcast path's packed edge set must be identical whether
        node positions come from the hash-map fast path or the exact
        pc.index_in fallback taken on a 64-bit node-hash collision."""
        import ray.data as rd

        import deepcrawl4ai_ray.stages.pagerank as P

        rng = np.random.RandomState(11)
        e = pd.DataFrame(
            {
                "src": [f"https://h{i}.example/p" for i in rng.randint(0, 80, 400)],
                "dst": [f"https://h{i}.example/p" for i in rng.randint(0, 80, 400)],
            }
        )
        ds = rd.from_pandas(e).repartition(5).materialize()
        node_arr, _ = P._node_set(ds, "src", "dst", True)

        fast = np.sort(
            P._edges_to_packed(ds, node_arr, "src", "dst").to_pandas()["ek"].to_numpy()
        )
        monkeypatch.setattr(P, "_node_pos_map", lambda arr: None)  # force collision path
        slow = np.sort(
            P._edges_to_packed(ds, node_arr, "src", "dst").to_pandas()["ek"].to_numpy()
        )
        assert np.array_equal(fast, slow)
        assert len(fast) == len(set(zip(e.src, e.dst)))

    def test_posmap_roundtrip(self):
        """order[searchsorted(hsorted, hash(url))] recovers each node's
        index in node_arr, for every node."""
        import pandas as pd_

        import deepcrawl4ai_ray.stages.pagerank as P

        nodes = pa.array([f"u{i}??/x{i * 7}" for i in range(5000)], pa.string())
        pm = P._node_pos_map(nodes)
        assert pm is not None
        hsorted, order = pm
        hb = pd_.util.hash_array(np.asarray(nodes.to_pandas(), dtype=object))
        got = order[np.searchsorted(hsorted, hb)]
        assert np.array_equal(got, np.arange(5000))


class TestEmptyInputSchemas:
    """All-empty results must keep their schema: Ray drops empty blocks,
    and a column-less dataset crashes downstream select/filter stages
    (the hash_join empty-result pathology, generalized to the bucketed
    two-level helpers by the r4 empty-seed fix)."""

    def test_bucketed_helpers_empty(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.join import (
            bucketed_distinct,
            bucketed_min,
            bucketed_sum,
        )

        empty = rd.from_pandas(
            pd.DataFrame({"k": pd.Series(dtype=str), "v": pd.Series(dtype="int64")})
        )
        cases = {
            "distinct": (bucketed_distinct(empty, ["k"]), ["k"]),
            "sum": (bucketed_sum(empty, ["k"], "v", "s"), ["k", "s"]),
            "count": (bucketed_sum(empty, ["k"], "v", "n", count=True), ["k", "n"]),
            "min": (bucketed_min(empty, ["k"], "v", "m"), ["k", "m"]),
        }
        for name, (out, want_cols) in cases.items():
            m = out.materialize()
            sch = m.schema()
            assert sch is not None, name
            assert sch.names == want_cols, name
            assert m.count() == 0, name
            assert m.select_columns([want_cols[0]]).count() == 0, name  # downstream-safe

    def test_exact_dedup_empty(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dedup import exact_dedup_losers, exact_dedup_stats

        de = rd.from_pandas(
            pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "text": pd.Series(dtype=str)})
        )
        sch = exact_dedup_losers(de, "doc_id", "text").materialize().schema()
        assert sch is not None and sch.names == ["doc_id"]
        sch = exact_dedup_stats(de, "doc_id", "text").materialize().schema()
        assert sch is not None and sch.names == ["text_hash", "keep_doc_id", "n_copies"]

    def test_bucketed_sum_nonempty_dtypes_unchanged(self, ray_session):
        """The schema pin must not alter non-empty output dtypes."""
        import ray.data as rd

        from deepcrawl4ai_ray.stages.join import bucketed_min, bucketed_sum

        ds = rd.from_pandas(
            pd.DataFrame({"k": ["a", "b", "a"], "v": [1.5, 2.0, 3.0]})
        )
        out = bucketed_sum(ds, ["k"], "v", "s").to_pandas().sort_values("k")
        assert out["s"].dtype == np.float64
        assert out["s"].tolist() == [4.5, 2.0]
        out = bucketed_min(ds, ["k"], "v", "m").to_pandas().sort_values("k")
        assert out["m"].tolist() == [1.5, 2.0]


class TestCdxEdgeCases:
    def test_long_surt_beyond_stats_cap_still_found(self, ray_session, tmp_path):
        """Parquet truncates/empties string statistics above 4 KB; the
        manifest must come from the data, not the stats, or files with
        one long SURT vanish from every lookup (review find)."""
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.stages.cdx import (
            build_cdx_index,
            cdx_prefix_lookup,
            surt_prefix_for_host,
        )

        long_path = "/p/" + "x" * 5000  # SURT > 4 KB statistics cap
        urls = [f"https://zz.example{long_path}"] + [
            f"https://zz.example/p/{j}" for j in range(10)
        ] + [f"https://aa.example/p/{j}" for j in range(10)]
        df = pd.DataFrame({"url": urls, "warc_ts": range(len(urls))})
        idx = str(tmp_path / "cdx_long")
        build_cdx_index(rd.from_pandas(df).repartition(4), idx, "url")
        got = cdx_prefix_lookup(idx, surt_prefix_for_host("zz.example")).to_pandas()
        assert len(got) == 11  # the long URL AND its short siblings all found

    def test_empty_index_lookup(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.stages.cdx import build_cdx_index, cdx_prefix_lookup

        df = pd.DataFrame({"url": pd.Series(dtype=str), "warc_ts": pd.Series(dtype="int64")})
        idx = str(tmp_path / "cdx_empty")
        build_cdx_index(rd.from_pandas(df), idx, "url")
        out = cdx_prefix_lookup(idx, "nowhere)")
        assert out.count() == 0
        assert "surt" in out.schema().names


class TestHits:
    def test_modes_equal_and_match_dense_reference(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.pagerank import hits

        rng = np.random.RandomState(5)
        e = pd.DataFrame(
            {
                "src": [f"n{i}" for i in rng.randint(0, 60, 300)],
                "dst": [f"n{i}" for i in rng.randint(0, 60, 300)],
            }
        )
        ds = rd.from_pandas(e)
        b = hits(ds, iters=2, rank_mode="broadcast").to_pandas().sort_values("node").reset_index(drop=True)
        j = hits(ds, iters=2, rank_mode="join").to_pandas().sort_values("node").reset_index(drop=True)
        assert (b.node == j.node).all()
        assert np.abs(b.hub - j.hub).max() < 1e-12
        assert np.abs(b.authority - j.authority).max() < 1e-12

        # dense numpy reference
        nodes = sorted(set(e.src) | set(e.dst))
        ix = {n: i for i, n in enumerate(nodes)}
        A = np.zeros((len(nodes), len(nodes)))
        for s, d in set(zip(e.src, e.dst)):
            A[ix[s], ix[d]] = 1
        h = np.ones(len(nodes))
        for _ in range(2):
            a = A.T @ h
            a /= np.linalg.norm(a)
            h = A @ a
            h /= np.linalg.norm(h)
        assert np.abs(b.hub.to_numpy() - h).max() < 1e-12
        assert np.abs(b.authority.to_numpy() - a).max() < 1e-12
        # unit norms
        assert abs(np.linalg.norm(b.hub) - 1) < 1e-9
        assert abs(np.linalg.norm(b.authority) - 1) < 1e-9

    def test_guards(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.pagerank import hits

        ds = rd.from_pandas(pd.DataFrame({"src": ["a"], "dst": ["b"]}))
        with pytest.raises(ValueError):
            hits(ds, iters=0)
        with pytest.raises(ValueError):
            hits(ds, rank_mode="gossip")


class TestShuffleCoalesce:
    """shuffle_coalesce: block-count bounding before an all-to-all (the
    sub-inline-chunk driver-heap guard, stages/join.py)."""

    def test_small_input_passes_through(self):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.join import shuffle_coalesce

        ds = rd.from_pandas(pd.DataFrame({"k": range(100), "v": range(100)}))
        out = shuffle_coalesce(ds)
        got = out.to_pandas().sort_values("k").reset_index(drop=True)
        assert got["v"].tolist() == list(range(100))

    def test_many_tiny_blocks_coalesce_rows_preserved(self):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.join import shuffle_coalesce

        # 200 one-row blocks (the pathological slim-table shape)
        parts = [pa.table({"k": pa.array([i], pa.int64())}) for i in range(200)]
        ds = rd.from_arrow(parts)
        assert ds.materialize().num_blocks() >= 100
        out = shuffle_coalesce(ds).materialize()
        assert out.num_blocks() < 100  # bounded map side
        assert sorted(out.to_pandas()["k"].tolist()) == list(range(200))

    def test_groupby_after_coalesce_matches(self):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.join import shuffle_coalesce

        parts = [
            pa.table({"g": pa.array([i % 7], pa.int64()), "v": pa.array([i], pa.int64())})
            for i in range(50)
        ]
        ds = shuffle_coalesce(rd.from_arrow(parts))
        got = (
            ds.groupby("g")
            .map_groups(
                lambda t: pa.table(
                    {"g": t["g"][:1], "s": pa.array([pa.compute.sum(t["v"]).as_py()])}
                ),
                batch_format="pyarrow",
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        want = (
            pd.DataFrame({"g": [i % 7 for i in range(50)], "v": range(50)})
            .groupby("g", as_index=False)["v"]
            .sum()
            .rename(columns={"v": "s"})
        )
        assert got["s"].tolist() == want["v" if "v" in want else "s"].tolist()


class TestExactDedupLosers:
    def test_losers_are_non_min_ids_per_content(self):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dedup import exact_dedup_losers

        df = pd.DataFrame(
            {"doc_id": range(8), "text": ["a", "b", "a", "c", "b", "b", "d", "a"]}
        )
        got = sorted(
            exact_dedup_losers(rd.from_pandas(df).repartition(3), "doc_id", "text")
            .to_pandas()["doc_id"]
            .tolist()
        )
        assert got == [2, 4, 5, 7]

    def test_no_duplicates_returns_empty(self):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dedup import exact_dedup_losers

        df = pd.DataFrame({"doc_id": range(5), "text": list("abcde")})
        assert exact_dedup_losers(rd.from_pandas(df), "doc_id", "text").count() == 0

    def test_bloom_anti_with_empty_losers_passes_through(self):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dedup import exact_dedup_losers
        from deepcrawl4ai_ray.stages.join import bloom_semi_anti

        df = pd.DataFrame({"doc_id": range(5), "text": list("abcde")})
        ds = rd.from_pandas(df).materialize()
        losers = exact_dedup_losers(ds, "doc_id", "text")
        out = bloom_semi_anti(ds, "doc_id", losers, "doc_id", keep_in=False)
        assert sorted(out.to_pandas()["doc_id"].tolist()) == list(range(5))
        # semi against the empty set is empty
        semi = bloom_semi_anti(ds, "doc_id", losers, "doc_id", keep_in=True)
        assert semi.count() == 0


class TestPackSequencesEmpty:
    def test_empty_input_returns_schema_pinned_empty(self):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.pack import pack_sequences

        ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["word " * 5]})).filter(
            lambda r: False
        )
        from deepcrawl4ai_ray.convert import to_pandas

        out = pack_sequences(ds, "doc_id", "text", seq_len=8)
        df = to_pandas(out)
        assert len(df) == 0
        assert list(df.columns) == ["doc_id", "n_tokens", "tok_start", "seq_first", "seq_last"]


class TestMinhashMegaBucketCap:
    """minhash_lsh_pairs(max_docs_per_key=...): band buckets above the
    cap generate no pairs (the simhash/dupspans discipline) — default
    None keeps exact semantics."""

    def test_cap_drops_mega_bucket_pairs_only(self):
        from deepcrawl4ai_ray.stages.dedup import minhash_lsh_pairs

        # 12 identical docs (one mega band bucket) + 2 near-dup docs
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        docs = [(i, base) for i in range(12)]
        long = " ".join(f"w{i}" for i in range(24))
        docs += [(100, long), (101, long.rsplit(" ", 1)[0])]  # j = 22/23
        df = pd.DataFrame(docs, columns=["doc_id", "text"])
        kw = dict(threshold=0.5, num_perm=16, bands=4, k=2, verify="exact")
        exact = (
            minhash_lsh_pairs(_ds(df), "doc_id", "text", **kw)
            .to_pandas()
        )
        capped = (
            minhash_lsh_pairs(_ds(df), "doc_id", "text", max_docs_per_key=8, **kw)
            .to_pandas()
        )
        # uncapped: the 12-clique (66 pairs) + the planted pair
        assert len(exact) == 66 + 1
        # capped: mega bucket suppressed, planted pair survives
        assert sorted(map(tuple, capped[["id_a", "id_b"]].to_numpy())) == [(100, 101)]


class TestDupLosersPerLang:
    """The corpus_report dup branch: exact_dedup_losers -> lang attach
    via lookup_join -> per-lang rollup, with PLANTED duplicates (the sf
    corpora are dup-free, so the gate never exercises losers > 0)."""

    def test_planted_duplicates_rollup(self):
        from deepcrawl4ai_ray.stages.agg import partial_grouped_sum
        from deepcrawl4ai_ray.stages.dedup import exact_dedup_losers
        from deepcrawl4ai_ray.stages.join import lookup_join

        rows = []
        # en: text "aaa" x3 (2 losers), "bbb" x1; de: "ccc" x2 (1 loser)
        for i, (lang, text) in enumerate(
            [("en", "aaa"), ("en", "aaa"), ("en", "aaa"), ("en", "bbb"),
             ("de", "ccc"), ("de", "ccc"), ("fr", "ddd")]
        ):
            rows.append((i, lang, text))
        df = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
        docs = _ds(df).repartition(3)
        losers = exact_dedup_losers(
            docs.select_columns(["doc_id", "text"]), "doc_id", "text"
        )
        per_lang = (
            partial_grouped_sum(
                lookup_join(losers, docs.select_columns(["doc_id", "lang"]), on="doc_id"),
                ["lang"],
                count_alias="n_dup_losers",
            )
            .to_pandas()
            .sort_values("lang")
            .reset_index(drop=True)
        )
        assert per_lang.set_index("lang")["n_dup_losers"].to_dict() == {"de": 1, "en": 2}


class TestLookupJoinEmptyRight:
    def test_empty_right_keeps_contract_schema(self):
        import pyarrow as _pa
        import ray.data as rd

        from deepcrawl4ai_ray.stages.join import lookup_join

        left = _ds(pd.DataFrame({"k": ["a", "b"], "v": [1, 2]}))
        empty_right = rd.from_arrow(
            _pa.table({"node": _pa.array([], _pa.string()), "deg": _pa.array([], _pa.int64())})
        )
        out = lookup_join(left, empty_right, on="k", right_on="node", rename={"deg": "d"})
        assert out.count() == 0
        assert out.schema().names == ["k", "v", "d"]

    def test_shared_right_ref_identical_to_per_call(self):
        from deepcrawl4ai_ray.stages.join import broadcast_lookup_table, lookup_join

        left = pd.DataFrame({"k": ["a", "b", "c"], "v": [1, 2, 3]})
        right = pd.DataFrame({"node": ["a", "c"], "deg": [10, 30]})
        rds = _ds(right).materialize()
        ref = broadcast_lookup_table(rds)
        a = (
            lookup_join(_ds(left), rds, on="k", right_on="node", right_ref=ref)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        b = (
            lookup_join(_ds(left), rds, on="k", right_on="node")
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        assert a["k"].tolist() == ["a", "c"]
