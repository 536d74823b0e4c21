"""DSIR importance resampling (stages/dsir.py)."""

import hashlib

import numpy as np
import pandas as pd


def _docs(rows):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "text": [r[1] for r in rows],
            }
        )
    )


def _bucket(gram: str, num_buckets: int) -> int:
    return int.from_bytes(hashlib.md5(gram.encode()).digest()[8:16], "little") % num_buckets


class TestDsirLambda:
    def test_matches_direct_computation(self, ray_session):
        from deepcrawl4ai_ray.stages.dsir import dsir_lambda

        rows = [(1, "a b a b"), (2, "a c"), (3, "b c b c b"), (4, "c a c")]
        B = 64
        lam = dsir_lambda(_docs(rows), "doc_id <= 2", num_buckets=B)
        # direct: target grams from docs 1-2, raw grams from docs 3-4
        tgt = np.zeros(B)
        raw = np.zeros(B)
        for doc_id, text in rows:
            toks = text.split()
            for g in (f"{a} {b}" for a, b in zip(toks, toks[1:])):
                (tgt if doc_id <= 2 else raw)[_bucket(g, B)] += 1
        p = (tgt + 0.5) / (tgt.sum() + 0.5 * B)
        q = (raw + 0.5) / (raw.sum() + 0.5 * B)
        np.testing.assert_allclose(lam, np.log(p / q), rtol=1e-12)

    def test_empty_target_side_is_finite(self, ray_session):
        from deepcrawl4ai_ray.stages.dsir import dsir_lambda

        lam = dsir_lambda(_docs([(1, "a b")]), "doc_id < 0", num_buckets=16)
        assert np.all(np.isfinite(lam))


class TestDsirTopk:
    def test_selects_k_and_favors_target_like(self, ray_session):
        """Planted shift: target slice speaks 'ml' bigrams, half the raw
        pool does too — the ml-speaking raw docs must dominate the top-k."""
        from deepcrawl4ai_ray.stages.dsir import dsir_lambda, dsir_topk

        rng = np.random.default_rng(3)
        ml = ["deep", "learning", "model", "train", "loss"]
        web = ["buy", "cheap", "click", "here", "now"]
        rows = []
        for i in range(40):  # target slice: ids 0..39, pure ml
            rows.append((i, " ".join(rng.choice(ml, size=10))))
        for i in range(40, 80):  # raw pool: 40..59 ml-like, 60..79 webspam
            words = ml if i < 60 else web
            rows.append((i, " ".join(rng.choice(words, size=10))))
        ds = _docs(rows)
        lam = dsir_lambda(ds, "doc_id < 40", num_buckets=256)
        out = dsir_topk(ds, lam, "doc_id >= 40", k=15)
        assert len(out) == 15
        assert list(out.columns) == ["doc_id", "weight", "skey"]
        assert (out["doc_id"] >= 40).all()
        # ml-like raw docs should fill (nearly) the whole selection
        assert (out["doc_id"] < 60).mean() >= 0.9

    def test_deterministic_and_excludes_gramless(self, ray_session):
        from deepcrawl4ai_ray.stages.dsir import dsir_lambda, dsir_topk

        rows = [(1, "a b c"), (2, "a b"), (3, "solo"), (4, "")]
        ds = _docs(rows)
        lam = dsir_lambda(ds, "doc_id == 1", num_buckets=32)
        a = dsir_topk(ds, lam, "doc_id > 1", k=10)
        b = dsir_topk(ds, lam, "doc_id > 1", k=10)
        pd.testing.assert_frame_equal(a, b)
        assert a["doc_id"].tolist() == sorted(
            a["doc_id"].tolist(),
            key=lambda d: -a.set_index("doc_id")["skey"][d],
        )
        assert set(a["doc_id"]) == {2}  # 3 and 4 have no bigrams
