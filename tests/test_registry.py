"""Pipeline-step registry (user-extension surface, SURVEY.md §2.10)."""

import pandas as pd
import pytest

from deepcrawl4ai_ray.pipelines.registry import available_steps, build_pipeline, register


@pytest.fixture(autouse=True)
def _ray(ray_session):
    pass


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_declarative_pipeline(ray_session):
    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a b c", "d e", "f"], "lang": ["en", "de", "en"]}
    )
    spec = [
        {"step": "filter_eq", "params": {"column": "lang", "value": "en"}},
        {"step": "token_count", "params": {"text_col": "text"}},
        {"step": "md5", "params": {"text_col": "text"}},
        {"step": "select", "params": {"columns": ["doc_id", "n_tokens", "text_hash"]}},
    ]
    out = build_pipeline(_ds(df), spec).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 3]
    assert out["n_tokens"].tolist() == [3, 1]
    import hashlib

    assert out["text_hash"].tolist()[0] == hashlib.md5(b"a b c").hexdigest()


def test_unknown_step_named_error(ray_session):
    with pytest.raises(ValueError, match="unknown step 'nope'"):
        build_pipeline(_ds(pd.DataFrame({"x": [1]})), [{"step": "nope"}])


def test_custom_registered_step(ray_session):
    import pyarrow as pa
    import pyarrow.compute as pc

    @register("double_x_test")
    def _double(ds, column):
        return ds.map_batches(
            lambda t: t.set_column(t.column_names.index(column), column, pc.multiply(t[column], 2)),
            batch_format="pyarrow",
        )

    out = build_pipeline(
        _ds(pd.DataFrame({"x": [1, 2]})), [{"step": "double_x_test", "params": {"column": "x"}}]
    ).to_pandas()
    assert sorted(out["x"]) == [2, 4]
    assert "double_x_test" in available_steps()


def test_round2_steps(ray_session):
    """bpe_token_count / simhash / fingerprint / dedup_exact compose."""
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["hello, world!", "hello, world!", "other text here now", "short"],
        }
    )
    spec = [
        {"step": "dedup_exact", "params": {"id_col": "doc_id"}},
        {"step": "bpe_token_count", "params": {}},
        {"step": "simhash", "params": {}},
        {"step": "fingerprint", "params": {}},
    ]
    out = build_pipeline(_ds(df), spec).to_pandas().sort_values("doc_id")
    # dedup kept min doc_id of the duplicate pair
    assert out["doc_id"].tolist() == [1, 3, 4]
    # "hello, world!" → hello , world ! = 4 sub-word tokens
    assert out.set_index("doc_id").loc[1, "n_bpe"] == 4
    assert out["simhash"].dtype == "uint64"
    assert out["fingerprint"].str.len().gt(0).all()


def test_image_decode_step(ray_session):
    import pyarrow as pa

    df = pd.DataFrame({"doc_id": [1, 2], "payload": [b"abc", b"defghij"]})
    out = build_pipeline(_ds(df), [{"step": "image_decode", "params": {}}]).to_pandas()
    assert set(out.columns) == {"doc_id", "width", "height", "n_bytes"}
    assert out.sort_values("doc_id")["n_bytes"].tolist() == [3, 7]


class TestNewSteps:
    def test_near_dup_pairs_and_clusters_steps(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.pipelines.registry import build_pipeline

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
        docs = pd.DataFrame(
            {
                "doc_id": pd.Series([1, 2, 3], dtype="int64"),
                "text": [base, base + " extra", "completely different words entirely here now ok"],
            }
        )
        pairs = build_pipeline(
            rd.from_pandas(docs),
            [{"step": "near_dup_pairs", "params": {"id_col": "doc_id", "threshold": 0.5}}],
        ).to_pandas()
        assert [1, 2] in pairs[["id_a", "id_b"]].values.tolist()

        labels = build_pipeline(
            rd.from_pandas(docs),
            [{"step": "dup_clusters", "params": {"id_col": "doc_id", "threshold": 0.5}}],
        ).to_pandas().set_index("node")["component"]
        assert labels[1] == labels[2] == 1

    def test_textsearch_steps(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.pipelines.registry import build_pipeline

        docs = pd.DataFrame(
            {
                "doc_id": pd.Series([1, 2, 3], dtype="int64"),
                "text": ["cat cat cat dog", "dog dog fish", "cat fish fish fish"],
            }
        )
        top = build_pipeline(
            rd.from_pandas(docs),
            [{"step": "top_tokens", "params": {"k": 2, "m": 16}}],
        ).to_pandas()
        assert top.values.tolist() == [["cat", 4], ["fish", 4]]

        bm = build_pipeline(
            rd.from_pandas(docs),
            [{"step": "bm25_topk", "params": {"terms": ["cat"], "k": 2}}],
        )
        assert bm["doc_id"].tolist() == [1, 3]

    def test_quantiles_sketch_step(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.pipelines.registry import build_pipeline

        rng = np.random.default_rng(4)
        df = pd.DataFrame({"k": rng.integers(0, 3, 30_000), "v": rng.normal(0, 1, 30_000)})
        out = build_pipeline(
            rd.from_pandas(df),
            [{"step": "quantiles_sketch", "params": {"key": "k", "val": "v"}}],
        ).to_pandas().set_index("k")
        for k, g in df.groupby("k"):
            assert abs(out.loc[k, "p50"] - g["v"].quantile(0.5)) < 0.05
            assert int(out.loc[k, "n"]) == len(g)


class TestRound3Steps:
    def test_c4_and_temperature_and_recrawl_and_anchor(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.pipelines.registry import available_steps, build_pipeline

        for s in ("c4_clean", "anchor_stats", "temperature_sample", "recrawl_priority"):
            assert s in available_steps()

        df = pd.DataFrame(
            {
                "url": ["a", "b"],
                "text": [
                    "one two three four five\nsix seven eight nine ten eleven",
                    "tiny",
                ],
            }
        )
        out = build_pipeline(rd.from_pandas(df), [{"step": "c4_clean"}]).to_pandas()
        assert out.url.tolist() == ["a"]

        rows = []
        for s, txts in enumerate([["x", "p"], ["y", "p"], ["y", "q"]]):
            rows += [{"url": u, "text": t, "snap": s} for u, t in zip(["u1", "u2"], txts)]
        got = (
            build_pipeline(rd.from_pandas(pd.DataFrame(rows)), [{"step": "recrawl_priority"}])
            .to_pandas()
            .sort_values("url")
        )
        assert got.n_changes.tolist() == [1, 1]


class TestSecondPassR4Steps:
    def test_new_dedup_sample_gate_steps(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.pipelines.registry import available_steps, build_pipeline

        for s in ("paragraph_dedup", "canonical_url_dedup", "weighted_sample", "quantile_gate"):
            assert s in available_steps()

        docs = pd.DataFrame(
            {"doc_id": [1, 2], "text": ["shared p\nown one", "shared p\nown two"]}
        )
        out = (
            build_pipeline(rd.from_pandas(docs), [{"step": "paragraph_dedup"}])
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out.text.tolist() == ["shared p\nown one", "own two"]

        urls = pd.DataFrame({"url": ["http://h.ex/p", "https://h.ex/p", "https://solo.ex"]})
        out = (
            build_pipeline(rd.from_pandas(urls), [{"step": "canonical_url_dedup"}])
            .to_pandas()
            .sort_values("canon_key")
        )
        assert out.best_url.tolist() == ["https://h.ex/p", "https://solo.ex"]

        w = pd.DataFrame({"doc_id": np.arange(50), "w": np.full(50, 7)})
        out = build_pipeline(
            rd.from_pandas(w),
            [{"step": "weighted_sample", "params": {"id_col": "doc_id", "weight_col": "w", "k": 5}}],
        ).to_pandas()
        assert len(out) == 5

        g = pd.DataFrame({"g": ["a"] * 10 + ["b"] * 10, "s": list(range(10)) * 2})
        out = build_pipeline(
            rd.from_pandas(g),
            [{"step": "quantile_gate", "params": {"group_col": "g", "score_col": "s", "q": 0.9}}],
        ).to_pandas()
        # p90 (inverted_cdf ≡ quantile_disc) of 0..9 = 8 (ceil(0.9·10)=9th
        # smallest) → rows 8 and 9 kept per group
        assert sorted(out.s.tolist()) == [8, 8, 9, 9]
