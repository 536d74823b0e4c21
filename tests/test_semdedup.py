"""SemDeDup family (stages/semdedup.py): distributed k-means +
within-cluster cosine dedup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _emb_ds(ids, X, blocks=1):
    import ray.data as rd

    df = pd.DataFrame(
        {"vec_id": pd.Series(ids, dtype="int64"), "embedding": [list(map(float, r)) for r in X]}
    )
    ds = rd.from_pandas(df)
    return ds.repartition(blocks) if blocks > 1 else ds


def _reference_lloyd(X, C, iters, round_sims=4, round_centroids=6):
    """Single-process twin of kmeans_fit's spec (assignment = argmax
    rounded cosine with dot/sqrt(|a|^2 |b|^2) bracketing; update =
    rounded mean; empty clusters keep their centroid)."""
    C = np.asarray(C, dtype=np.float64).copy()
    X = np.asarray(X, dtype=np.float64)
    nx = np.einsum("ij,ij->i", X, X)
    for _ in range(iters):
        nc = np.einsum("ij,ij->i", C, C)
        sims = np.round((X @ C.T) / np.sqrt(np.maximum(np.outer(nx, nc), 1e-300)), round_sims)
        a = np.argmax(sims, axis=1)
        for c in range(len(C)):
            m = a == c
            if m.any():
                C[c] = np.round(X[m].mean(axis=0), round_centroids)
    return C


class TestKmeansFit:
    def test_matches_single_process_reference(self, ray_session):
        from deepcrawl4ai_ray.stages.semdedup import kmeans_fit

        rng = np.random.default_rng(7)
        X = rng.normal(size=(400, 16))
        init = X[:5]
        got = kmeans_fit(_emb_ds(np.arange(400), X, blocks=7), "embedding", init, iters=4)
        want = _reference_lloyd(X, init, iters=4)
        # both sides round to 6dp each iteration, so equality is exact
        # unless a partial-sum ULP lands a mean on a rounding boundary
        assert np.array_equal(got, want)

    def test_block_layout_invariance(self, ray_session):
        from deepcrawl4ai_ray.stages.semdedup import kmeans_fit

        rng = np.random.default_rng(11)
        X = rng.normal(size=(150, 8))
        a = kmeans_fit(_emb_ds(np.arange(150), X, blocks=1), "embedding", X[:4], iters=3)
        b = kmeans_fit(_emb_ds(np.arange(150), X, blocks=13), "embedding", X[:4], iters=3)
        assert np.array_equal(a, b)

    def test_empty_cluster_keeps_centroid(self, ray_session):
        from deepcrawl4ai_ray.stages.semdedup import kmeans_fit

        # all points near +e1; the far seed at -e1 never wins a point
        X = np.array([[1.0, 0.05], [1.0, -0.02], [1.0, 0.01]])
        init = np.array([[1.0, 0.0], [-1.0, 0.0]])
        C = kmeans_fit(_emb_ds([1, 2, 3], X, blocks=2), "embedding", init, iters=2)
        assert np.array_equal(C[1], init[1])


class TestSemanticDedup:
    def test_planted_copies_dropped(self, ray_session):
        from deepcrawl4ai_ray.stages.semdedup import kmeans_fit, semantic_dedup

        rng = np.random.default_rng(3)
        X = rng.normal(size=(60, 12))
        ids = list(range(60))
        # exact copies of rows 0..4 under bigger ids
        ids += [100 + i for i in range(5)]
        X = np.vstack([X, X[:5]])
        ds = _emb_ds(ids, X, blocks=5)
        C = kmeans_fit(ds, "embedding", X[:3], iters=2)
        out = semantic_dedup(ds, "vec_id", "embedding", C, threshold=0.99).to_pandas()
        out = out.set_index("vec_id")
        # an exact copy always shares its original's cluster, so it drops
        assert (out.loc[[100 + i for i in range(5)], "kept"] == 0).all()
        assert (out.loc[range(5), "kept"] == 1).all()
        assert len(out) == 65

    def test_drop_rule_not_greedy(self, ray_session):
        """b drops because of a; c drops because of b EVEN THOUGH b was
        itself dropped — the any-smaller-id-neighbor rule of the
        training pipeline / SQL twin, not transitive-greedy keep."""
        from deepcrawl4ai_ray.stages.semdedup import semantic_dedup

        # a chain a~b, b~c with a NOT ~ c (angles 0, 15, 30 degrees;
        # cos 15deg ~= .966 >= .95, cos 30deg ~= .866 < .95)
        th = np.deg2rad([0.0, 15.0, 30.0])
        X = np.stack([np.cos(th), np.sin(th)], axis=1)
        ds = _emb_ds([1, 2, 3], X)
        C = np.array([[1.0, 0.0]])  # one cluster
        out = (
            semantic_dedup(ds, "vec_id", "embedding", C, threshold=0.95)
            .to_pandas()
            .set_index("vec_id")["kept"]
        )
        assert out.to_dict() == {1: 1, 2: 0, 3: 0}

    def test_paper_keep_rule_low_centroid_sim(self, ray_session):
        """keep="low_centroid_sim" (Abbas et al. 2023 §2): the chain
        a~b~c is ONE component; the survivor is the member FARTHEST from
        the centroid (30 degrees), not the smallest id."""
        from deepcrawl4ai_ray.stages.semdedup import semantic_dedup

        th = np.deg2rad([0.0, 15.0, 30.0, 80.0])  # 80deg = singleton
        X = np.stack([np.cos(th), np.sin(th)], axis=1)
        ds = _emb_ds([1, 2, 3, 4], X)
        C = np.array([[1.0, 0.0]])
        out = (
            semantic_dedup(ds, "vec_id", "embedding", C, threshold=0.95,
                           keep="low_centroid_sim")
            .to_pandas()
            .set_index("vec_id")["kept"]
        )
        assert out.to_dict() == {1: 0, 2: 0, 3: 1, 4: 1}

    def test_paper_rule_one_survivor_per_component(self, ray_session):
        from deepcrawl4ai_ray.stages.semdedup import kmeans_fit, semantic_dedup

        rng = np.random.default_rng(3)
        X = rng.normal(size=(60, 12))
        ids = list(range(60)) + [100 + i for i in range(5)]
        X = np.vstack([X, X[:5]])  # exact copies: 5 two-member components
        ds = _emb_ds(ids, X, blocks=5)
        C = kmeans_fit(ds, "embedding", X[:3], iters=2)
        out = semantic_dedup(
            ds, "vec_id", "embedding", C, threshold=0.99, keep="low_centroid_sim"
        ).to_pandas()
        out = out.set_index("vec_id")["kept"]
        # exactly one of {i, 100+i} survives (exact copies tie on
        # centroid sim -> smaller id wins), everything else keeps
        for i in range(5):
            assert out[i] + out[100 + i] == 1
            assert out[i] == 1  # tie-break: smaller id
        assert out.sum() == 60

    def test_bad_keep_rule_raises(self, ray_session):
        from deepcrawl4ai_ray.stages.semdedup import semantic_dedup

        with pytest.raises(ValueError, match="keep rule"):
            semantic_dedup(
                _emb_ds([1], np.ones((1, 4))), "vec_id", "embedding",
                np.ones((1, 4)), keep="bogus",
            )

    def test_empty_input_keeps_schema(self, ray_session):
        from deepcrawl4ai_ray.stages.semdedup import semantic_dedup

        ds = _emb_ds([], np.zeros((0, 4)))
        out = semantic_dedup(ds, "vec_id", "embedding", np.eye(2, 4))
        # the repo's empty-input contract (see tests/test_empty_inputs.py):
        # the DATASET schema survives so downstream select/filter work —
        # to_pandas() on an all-empty dataset drops columns in Ray itself
        sch = out.schema()
        assert sch is not None and sorted(sch.names) == ["cluster", "kept", "vec_id"]
        assert out.count() == 0
        assert out.select_columns(["vec_id", "kept"]).count() == 0

    def test_max_cluster_guard(self, ray_session):
        from deepcrawl4ai_ray.stages.semdedup import semantic_dedup

        rng = np.random.default_rng(5)
        X = rng.normal(size=(30, 4))
        ds = _emb_ds(np.arange(30), X)
        with pytest.raises(Exception, match="max_cluster"):
            semantic_dedup(
                ds, "vec_id", "embedding", np.ones((1, 4)), max_cluster=10
            ).materialize()

    def test_slabbed_pairwise_matches_one_shot(self, ray_session):
        """The chunked n_c x n_c kernel equals a brute-force all-pairs check."""
        from deepcrawl4ai_ray.stages import semdedup as sd

        rng = np.random.default_rng(9)
        X = rng.normal(size=(300, 6))
        X[150:] = X[:150] * 1.0001  # many near-dup pairs
        ids = np.arange(300)
        old = sd._PAIR_CHUNK_ROWS
        try:
            sd._PAIR_CHUNK_ROWS = 32
            out = (
                sd.semantic_dedup(
                    _emb_ds(ids, X, blocks=4), "vec_id", "embedding",
                    np.ones((1, 6)), threshold=0.95,
                )
                .to_pandas()
                .sort_values("vec_id")["kept"]
                .to_numpy()
            )
        finally:
            sd._PAIR_CHUNK_ROWS = old
        nx = np.einsum("ij,ij->i", X, X)
        S = np.round((X @ X.T) / np.sqrt(np.outer(nx, nx)), 4)
        want = np.ones(300, dtype=np.int64)
        for i in range(300):
            if any(S[i, j] >= 0.95 for j in range(i)):
                want[i] = 0
        assert np.array_equal(out, want)
