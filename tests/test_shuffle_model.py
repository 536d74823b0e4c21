"""Global training-order shuffle (stages/shuffleorder) and
broadcast-model batch inference (stages/modelscore)."""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest


def _ds(df, blocks=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


class TestShuffleRanks:
    def _reference(self, ids, seed, num_shards=None):
        keys = {i: hashlib.md5(f"{seed}-{i}".encode()).hexdigest() for i in ids}
        order = sorted(ids, key=lambda i: (keys[i], i))
        total = len(ids)
        rows = []
        for rank, i in enumerate(order):
            row = {"doc_id": i, "shuffle_rank": rank}
            if num_shards is not None:
                row["shard"] = rank * num_shards // total
            rows.append(row)
        return pd.DataFrame(rows).sort_values("doc_id").reset_index(drop=True)

    def test_matches_local_reference(self, ray_session):
        from deepcrawl4ai_ray.stages.shuffleorder import shuffle_ranks

        rng = np.random.default_rng(7)
        ids = rng.choice(100_000, size=500, replace=False).astype(np.int64)
        out = (
            shuffle_ranks(_ds(pd.DataFrame({"doc_id": ids})), "doc_id", seed="sX")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, self._reference(ids, "sX"))

    def test_partitioning_invariant_and_shards_balanced(self, ray_session):
        from deepcrawl4ai_ray.stages.shuffleorder import shuffle_ranks

        ids = np.arange(400, dtype=np.int64)
        df = pd.DataFrame({"doc_id": ids})
        a = (
            shuffle_ranks(_ds(df, blocks=1), "doc_id", seed="s", num_shards=8)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            shuffle_ranks(_ds(df, blocks=13), "doc_id", seed="s", num_shards=8)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        # ranks are a permutation of 0..n-1; shards contiguous and balanced
        assert sorted(a["shuffle_rank"]) == list(range(400))
        sizes = a.groupby("shard").size()
        assert len(sizes) == 8 and sizes.max() - sizes.min() <= 1
        by_rank = a.sort_values("shuffle_rank")["shard"].to_numpy()
        assert (np.diff(by_rank) >= 0).all()  # shard is monotone in rank

    def test_seed_changes_order(self, ray_session):
        from deepcrawl4ai_ray.stages.shuffleorder import shuffle_ranks

        df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64)})
        a = shuffle_ranks(_ds(df), "doc_id", seed="s1").to_pandas()
        b = shuffle_ranks(_ds(df), "doc_id", seed="s2").to_pandas()
        merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
        assert (merged["shuffle_rank_a"] != merged["shuffle_rank_b"]).any()


class TestLinearScoreStage:
    def _texts(self):
        return [
            "hello world 123",
            "a" * 50,
            "numbers 1 2 3 4 5 everywhere 99",
            "",
            "no digits here just words and spaces",
        ]

    def _reference_scores(self, texts, w):
        w0, w1, w2, w3 = w
        out = []
        for t in texts:
            n = len(t)
            spaces = t.count(" ")
            digits = sum(c.isdigit() for c in t)
            s = w0 + w1 * math.log(1 + n) + w2 * spaces / (n + 1) + w3 * digits / (n + 1)
            out.append(round(s, 6))
        return out

    def test_scores_match_reference(self, ray_session):
        import ray

        from deepcrawl4ai_ray.stages.modelscore import DEFAULT_WEIGHTS, quality_model_stage

        texts = self._texts()
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        out = (
            quality_model_stage(_ds(df, blocks=2), concurrency=2, batch_size=2)
            .to_pandas().sort_values("doc_id")
        )
        assert out["score"].tolist() == pytest.approx(
            self._reference_scores(texts, DEFAULT_WEIGHTS), abs=1e-9
        )

    def test_weights_broadcast_once_per_actor(self, ray_session):
        """Constructor receives the ObjectRef; actor resolves it in
        __init__ (not per batch) — custom weights flow through."""
        import ray

        from deepcrawl4ai_ray.stages.modelscore import LinearScoreStage

        ref = ray.put((1.0, 0.0, 0.0, 0.0))  # constant model
        stage = LinearScoreStage(ref)
        import pyarrow as pa

        t = pa.table({"text": ["abc", "d e f"]})
        got = stage(t)["score"].to_pylist()
        assert got == [1.0, 1.0]

    def test_rejects_bad_weight_shape(self):
        from deepcrawl4ai_ray.stages.modelscore import LinearScoreStage

        with pytest.raises(ValueError):
            LinearScoreStage((1.0, 2.0))

    def test_model_file_roundtrip_exact(self, tmp_path):
        from deepcrawl4ai_ray.stages.modelscore import load_linear_model, save_linear_model

        w = (0.1, -2.5e-7, 3.14159265358979, 1e300)
        p = save_linear_model(str(tmp_path / "m.bin"), w)
        assert load_linear_model(p) == w  # bit-exact float64 round-trip

    def test_model_file_bad_magic_rejected(self, tmp_path):
        from deepcrawl4ai_ray.stages.modelscore import load_linear_model

        p = tmp_path / "bad.bin"
        p.write_bytes(b"NOTMODEL" + b"\x00" * 16)
        with pytest.raises(ValueError, match="magic"):
            load_linear_model(str(p))

    def test_model_path_equals_in_memory_weights(self, ray_session, tmp_path):
        """The file→parse→broadcast path must be output-identical to
        passing weights directly (oracle unchanged)."""
        from deepcrawl4ai_ray.stages.modelscore import quality_model_stage, save_linear_model

        texts = self._texts()
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        w = (0.2, 0.4, -1.0, 2.0)
        p = save_linear_model(str(tmp_path / "m.bin"), w)
        a = quality_model_stage(_ds(df, blocks=2), weights=w, concurrency=2).to_pandas().sort_values("doc_id")
        b = quality_model_stage(_ds(df, blocks=2), model_path=p, concurrency=2).to_pandas().sort_values("doc_id")
        assert a["score"].tolist() == b["score"].tolist()

    def test_weights_resolved_once_per_actor_process(self, ray_session):
        """Setup-once discipline: across many batches the weights ref is
        resolved in __init__ only — every batch a process scores reports
        the SAME init generation (1 per actor process)."""
        import os

        import pyarrow as pa
        import ray

        from deepcrawl4ai_ray.stages.modelscore import LinearScoreStage

        class CountingStage(LinearScoreStage):
            def __init__(self, weights_ref):
                import deepcrawl4ai_ray.stages.modelscore as m

                m._TEST_INITS = getattr(m, "_TEST_INITS", 0) + 1
                super().__init__(weights_ref)
                self._gen = m._TEST_INITS

            def __call__(self, batch: pa.Table) -> pa.Table:
                out = super().__call__(batch)
                n = len(batch)
                return out.append_column("pid", pa.array([os.getpid()] * n)).append_column(
                    "gen", pa.array([self._gen] * n)
                )

        df = pd.DataFrame({"doc_id": range(64), "text": ["x y 1"] * 64})
        ref = ray.put((0.0, 1.0, 0.0, 0.0))
        out = (
            _ds(df, blocks=8)
            .map_batches(
                CountingStage,
                fn_constructor_kwargs={"weights_ref": ref},
                batch_format="pyarrow",
                concurrency=2,
                batch_size=8,
            )
            .to_pandas()
        )
        # each actor process constructed the stage exactly once, however
        # many batches it scored
        assert (out.groupby("pid")["gen"].nunique() == 1).all()
        assert (out.groupby("pid")["gen"].max() == 1).all()


class TestMixtureSample:
    def _df(self, n=300):
        rng = np.random.default_rng(11)
        return pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "source": rng.choice(["a", "b", "c"], size=n),
            }
        )

    def _reference(self, df, rates, default=0.0):
        keep = []
        for _, r in df.iterrows():
            rate = rates.get(r["source"], default)
            if rate >= 1.0:
                keep.append(True)
            else:
                thr = format(int(rate * 65536), "04x")
                keep.append(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4] < thr)
        return df[np.array(keep)].reset_index(drop=True)

    def test_matches_local_reference_and_split_invariant(self, ray_session):
        from deepcrawl4ai_ray.stages.sample import mixture_sample

        df = self._df()
        rates = {"a": 1.0, "b": 0.5, "c": 0.1}
        exp = self._reference(df, rates)
        for blocks in (1, 7):
            got = (
                mixture_sample(_ds(df, blocks=blocks), "source", "doc_id", rates)
                .to_pandas().sort_values("doc_id").reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, exp)
        # rate=1.0 keeps every 'a' row; others are subsampled
        assert (exp["source"] == "a").sum() == (df["source"] == "a").sum()
        assert (exp["source"] == "b").sum() < (df["source"] == "b").sum()

    def test_default_rate_for_unknown_group(self, ray_session):
        from deepcrawl4ai_ray.stages.sample import mixture_sample

        df = self._df()
        got = mixture_sample(
            _ds(df), "source", "doc_id", {"a": 0.0}, default_rate=1.0
        ).to_pandas()
        assert (got["source"] != "a").all()
        assert len(got) == (self._df()["source"] != "a").sum()

    def test_sql_case_single_sourced(self):
        from deepcrawl4ai_ray.stages.sample import mixture_sample_sql_case

        case = mixture_sample_sql_case({"a": 0.5, "z": 1.0}, "source", "doc_id")
        assert "WHEN source = 'a' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'" in case
        assert "WHEN source = 'z' THEN TRUE" in case

    def test_rejects_out_of_range_rate(self):
        from deepcrawl4ai_ray.stages.sample import mixture_rate_thresholds

        with pytest.raises(ValueError):
            mixture_rate_thresholds({"a": 1.5})
