"""ANN kNN-join (stages/knn.knn_join)."""

import numpy as np
import pandas as pd


def _ds(ids, X, id_name="vec_id", blocks=1):
    import ray.data as rd

    df = pd.DataFrame(
        {id_name: pd.Series(ids, dtype="int64"), "embedding": [list(map(float, r)) for r in X]}
    )
    ds = rd.from_pandas(df)
    return ds.repartition(blocks) if blocks > 1 else ds


def _reference_join(Q, qids, B, rids, C, k, nprobe):
    """Single-process twin of the plan: rounded-cosine assignment /
    probing, (round4 desc, id asc) top-k within the probed clusters."""

    def cos(A, Bm):
        na = np.einsum("ij,ij->i", A, A)
        nb = np.einsum("ij,ij->i", Bm, Bm)
        return np.round((A @ Bm.T) / np.sqrt(np.maximum(np.outer(na, nb), 1e-300)), 4)

    bcl = np.argmax(cos(B, C), axis=1)
    rows = []
    for i, qid in enumerate(qids):
        probed = np.argsort(-cos(Q[i : i + 1], C)[0], kind="stable")[:nprobe]
        m = np.isin(bcl, probed)
        sims = cos(Q[i : i + 1], B[m])[0]
        ids = rids[m]
        order = np.lexsort((ids, -sims))[: min(k, m.sum())]
        for j in order:
            rows.append((qid, ids[j], sims[j]))
    return sorted(rows)


class TestKnnJoin:
    def test_matches_reference_plan(self, ray_session):
        from deepcrawl4ai_ray.stages.knn import knn_join

        rng = np.random.default_rng(21)
        B = rng.normal(size=(200, 10))
        Q = rng.normal(size=(9, 10))
        C = rng.normal(size=(6, 10))
        rids = np.arange(200)
        qids = np.arange(100, 109)
        out = knn_join(
            _ds(rids, B, blocks=5), _ds(qids, Q, "qid", blocks=2),
            "vec_id", "qid", "embedding", C, k=4, nprobe=2,
        ).to_pandas()
        got = sorted(
            (int(r.qid), int(r.vec_id), float(r.cos_sim)) for r in out.itertuples()
        )
        assert got == _reference_join(Q, qids, B, rids, C, 4, 2)

    def test_full_probe_is_exact(self, ray_session):
        """nprobe = n_centroids ⇒ every base row is a candidate ⇒ the
        join equals the exact per-query brute-force top-k."""
        from deepcrawl4ai_ray.stages.knn import knn_join

        rng = np.random.default_rng(5)
        B = rng.normal(size=(80, 6))
        Q = rng.normal(size=(4, 6))
        C = rng.normal(size=(3, 6))
        out = knn_join(
            _ds(np.arange(80), B, blocks=3), _ds([0, 1, 2, 3], Q, "qid"),
            "vec_id", "qid", "embedding", C, k=5, nprobe=3,
        ).to_pandas()
        assert len(out) == 4 * 5
        nb = np.einsum("ij,ij->i", B, B)
        nq = np.einsum("ij,ij->i", Q, Q)
        S = np.round((Q @ B.T) / np.sqrt(np.outer(nq, nb)), 4)
        for qi in range(4):
            want = np.lexsort((np.arange(80), -S[qi]))[:5]
            got = out[out.qid == qi].sort_values(["cos_sim", "vec_id"], ascending=[False, True])
            assert sorted(got["vec_id"]) == sorted(want.tolist())

    def test_empty_queries_keep_schema(self, ray_session):
        from deepcrawl4ai_ray.stages.knn import knn_join

        rng = np.random.default_rng(1)
        out = knn_join(
            _ds(np.arange(10), rng.normal(size=(10, 4))),
            _ds([], np.zeros((0, 4)), "qid"),
            "vec_id", "qid", "embedding", np.eye(2, 4), k=3,
        )
        sch = out.schema()
        assert sch is not None and sorted(sch.names) == ["cos_sim", "qid", "vec_id"]
        assert out.count() == 0
