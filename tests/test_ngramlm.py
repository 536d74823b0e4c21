"""CCNet-style bigram-LM perplexity scoring (stages/ngramlm.py)."""

import math

import numpy as np
import pandas as pd
import pytest


def _docs(rows):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "text": [r[1] for r in rows],
                "lang": [r[2] if len(r) > 2 else "en" for r in rows],
            }
        )
    )


class TestTrainBigramLM:
    def test_counts_and_vocab(self, ray_session):
        from deepcrawl4ai_ray.stages.ngramlm import train_bigram_lm

        train = _docs([(1, "the cat sat"), (2, "the cat"), (3, "x")])
        uni, bg, vocab = train_bigram_lm(train)
        u = uni.to_pandas().set_index("tok")["c1"].to_dict()
        b = bg.to_pandas().set_index("gram")["c2"].to_dict()
        assert u == {"the": 2, "cat": 2, "sat": 1, "x": 1}
        assert b == {"the cat": 2, "cat sat": 1}
        assert vocab == 5  # 4 distinct train unigrams + OOV slot


class TestScorePerplexity:
    def test_hand_computed(self, ray_session):
        from deepcrawl4ai_ray.stages.ngramlm import score_perplexity, train_bigram_lm

        train = _docs([(1, "a b a b")])
        uni, bg, vocab = train_bigram_lm(train)  # c1: a=2 b=2; c2: "a b"=2 "b a"=1; V=3
        docs = _docs([(10, "a b"), (11, "a zz"), (12, "solo"), (13, "")])
        out = (
            score_perplexity(docs, uni, bg, vocab, keep_cols=(), mode="broadcast")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # docs with < 2 tokens are dropped
        assert out["doc_id"].tolist() == [10, 11]
        lp_ab = math.log((2 + 0.5) / (2 + 0.5 * 3))
        lp_azz = math.log((0 + 0.5) / (2 + 0.5 * 3))
        assert out["ppl"].tolist() == [
            round(math.exp(-lp_ab), 4),
            round(math.exp(-lp_azz), 4),
        ]
        assert out["n_bigrams"].tolist() == [1, 1]

    def test_mode_equality(self, ray_session):
        """broadcast and join paths produce identical scores, incl. OOV
        grams, OOV unigrams, and keep_cols passthrough."""
        from deepcrawl4ai_ray.stages.ngramlm import score_perplexity, train_bigram_lm

        rng = np.random.default_rng(7)
        vocab_words = ["aa", "bb", "cc", "dd", "ee", "zz"]
        rows = [
            (i, " ".join(rng.choice(vocab_words, size=rng.integers(0, 12))), ("en" if i % 2 else "fr"))
            for i in range(60)
        ]
        docs = _docs(rows)
        uni, bg, vocab = train_bigram_lm(_docs(rows[:20]))
        kw = dict(vocab_size=vocab, keep_cols=("lang",))
        a = (
            score_perplexity(docs, uni, bg, mode="broadcast", **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            score_perplexity(docs, uni, bg, mode="join", **kw)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])

    def test_auto_mode_picks_broadcast_then_join(self, ray_session):
        from deepcrawl4ai_ray.stages.ngramlm import score_perplexity, train_bigram_lm

        train = _docs([(1, "a b c")])
        uni, bg, vocab = train_bigram_lm(train)
        docs = _docs([(2, "a b")])
        big = score_perplexity(docs, uni, bg, vocab, keep_cols=(), mode="auto").to_pandas()
        small = score_perplexity(
            docs, uni, bg, vocab, keep_cols=(), mode="auto", max_broadcast_rows=0
        ).to_pandas()
        pd.testing.assert_frame_equal(
            big.sort_values("doc_id").reset_index(drop=True),
            small.sort_values("doc_id").reset_index(drop=True),
        )

    def test_join_mode_empty_input_keeps_schema(self, ray_session):
        from deepcrawl4ai_ray.stages.ngramlm import score_perplexity, train_bigram_lm

        uni, bg, vocab = train_bigram_lm(_docs([(1, "a b")]))
        out = score_perplexity(
            _docs([(9, "solo")]), uni, bg, vocab, keep_cols=("lang",), mode="join"
        ).materialize()
        # Dataset-level schema contract (to_pandas on a fully-empty dataset
        # is column-less in Ray 2.49 — same convention as test_empty_inputs)
        sch = out.schema()
        assert sch is not None
        assert list(sch.names) == ["doc_id", "lang", "n_bigrams", "ppl"]
        assert out.count() == 0

    def test_bad_mode_raises(self, ray_session):
        from deepcrawl4ai_ray.stages.ngramlm import score_perplexity, train_bigram_lm

        uni, bg, vocab = train_bigram_lm(_docs([(1, "a b")]))
        with pytest.raises(ValueError):
            score_perplexity(_docs([(2, "a b")]), uni, bg, vocab, mode="nope")


class TestPplRankBuckets:
    def _scored(self, rows):
        import ray.data as rd

        return rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
                    "lang": [r[1] for r in rows],
                    "ppl": pd.Series([r[2] for r in rows], dtype="float64"),
                }
            )
        )

    def test_equal_thirds_per_lang(self, ray_session):
        from deepcrawl4ai_ray.stages.ngramlm import ppl_rank_buckets

        # en: 9 docs with distinct ppls; fr: 4 docs (ceil-split 2/1/1)
        rows = [(i, "en", float(100 + i)) for i in range(9)]
        rows += [(100 + i, "fr", float(10 + i)) for i in range(4)]
        out = ppl_rank_buckets(self._scored(rows)).to_pandas()
        by = out.set_index("doc_id")["bucket"].to_dict()
        assert [by[i] for i in range(9)] == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        # fr: r*3<=4 -> r=1 head; r*3<=8 -> r=2 middle; r=3,4 tail
        assert [by[100 + i] for i in range(4)] == ["head", "middle", "tail", "tail"]

    def test_ties_break_by_doc_id(self, ray_session):
        from deepcrawl4ai_ray.stages.ngramlm import ppl_rank_buckets

        rows = [(i, "en", 50.0) for i in (5, 1, 3)]  # all-equal ppl
        out = ppl_rank_buckets(self._scored(rows)).to_pandas()
        by = out.set_index("doc_id")["bucket"].to_dict()
        assert by == {1: "head", 3: "middle", 5: "tail"}

    def test_matches_window_oracle_randomized(self, ray_session):
        from deepcrawl4ai_ray.stages.ngramlm import ppl_rank_buckets

        rng = np.random.default_rng(7)
        n = 200
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "lang": rng.choice(["en", "fr", "de"], size=n),
                # coarse grid so ties actually happen
                "ppl": np.round(rng.uniform(1, 30, size=n), 0),
            }
        )
        import ray.data as rd

        got = (
            ppl_rank_buckets(rd.from_pandas(df))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ref = df.sort_values(["lang", "ppl", "doc_id"]).copy()
        ref["r"] = ref.groupby("lang").cumcount() + 1
        ref["n"] = ref.groupby("lang")["doc_id"].transform("size")
        ref["bucket"] = np.where(
            ref["r"] * 3 <= ref["n"],
            "head",
            np.where(ref["r"] * 3 <= 2 * ref["n"], "middle", "tail"),
        )
        ref = ref.sort_values("doc_id").reset_index(drop=True)
        assert got["bucket"].tolist() == ref["bucket"].tolist()
        assert (got["lang"] == ref["lang"]).all()

    def test_empty_input_keeps_schema(self, ray_session):
        from deepcrawl4ai_ray.stages.ngramlm import ppl_rank_buckets

        out = ppl_rank_buckets(self._scored([]))
        sch = out.schema()
        assert list(sch.names) == ["doc_id", "lang", "ppl", "bucket"]
        assert out.count() == 0
