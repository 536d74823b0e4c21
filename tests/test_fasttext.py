"""fastText .vec model path (stages/fasttext.py): format round-trip,
classification vs a serial numpy reference, malformed-file validation,
and the load-once-per-actor broadcast contract."""

import numpy as np
import pandas as pd
import pytest

import ray


@pytest.fixture(autouse=True)
def _ray(ray_session):
    pass


def _ds(df, parallelism=2):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parallelism)


class TestVecFormat:
    def test_round_trip(self, tmp_path):
        from deepcrawl4ai_ray.stages.fasttext import load_vec, save_vec

        toks = ["alpha", "beta", "gamma"]
        m = np.array([[0.5, -1.25], [0.0, 3.0], [2.5, -0.125]])
        p = save_vec(str(tmp_path / "t.vec"), toks, m)
        got_toks, got_m = load_vec(p)
        assert got_toks == toks
        np.testing.assert_array_equal(got_m, m)
        # header is the real format: "<n> <dim>"
        assert open(p).readline().strip() == "3 2"

    def test_bad_header_and_truncated_row(self, tmp_path):
        from deepcrawl4ai_ray.stages.fasttext import load_vec

        bad = tmp_path / "bad.vec"
        bad.write_text("not a header\n")
        with pytest.raises(ValueError, match="bad .vec header"):
            load_vec(str(bad))
        trunc = tmp_path / "trunc.vec"
        trunc.write_text("1 4\nword 0.5 0.5\n")
        with pytest.raises(ValueError, match="row 0 has 2 values"):
            load_vec(str(trunc))

    def test_dim_mismatch_between_files(self, tmp_path):
        from deepcrawl4ai_ray.stages.fasttext import load_fasttext_model, save_vec

        v = save_vec(str(tmp_path / "v.vec"), ["a"], np.zeros((1, 4)))
        l = save_vec(str(tmp_path / "l.vec"), ["__label__x"], np.zeros((1, 3)))
        with pytest.raises(ValueError, match="dim mismatch"):
            load_fasttext_model(v, l)


def _serial_predict(texts, vocab, in_mat, labels, out_mat):
    """Independent per-doc reference: mean of known-token vectors, logit
    per label, round 6, argmax with lexicographic tie-break."""
    import re

    lut = {t: i for i, t in enumerate(vocab)}
    order = sorted(range(len(labels)), key=lambda i: labels[i])
    rows = []
    for s in texts:
        toks = re.findall(r"[a-z0-9]+", s.lower())
        hit = [lut[t] for t in toks if t in lut]
        mean = in_mat[hit].mean(axis=0) if hit else np.zeros(in_mat.shape[1])
        best_lbl, best_lg = None, None
        for i in order:
            lg = round(float(out_mat[i] @ mean), 6)
            if best_lg is None or lg > best_lg:
                best_lbl, best_lg = labels[i], lg
        rows.append((best_lbl, best_lg))
    return rows


class TestClassify:
    def test_matches_serial_reference(self, tmp_path):
        from deepcrawl4ai_ray.stages.fasttext import (
            LABEL_PREFIX,
            fasttext_classify,
            save_vec,
        )

        rng = np.random.default_rng(3)
        vocab = ["apple", "banana", "cherry", "date", "fig"]
        labels = ["pos", "neg"]
        in_mat = rng.integers(-8, 9, size=(5, 6)).astype(float) / 8.0
        out_mat = rng.integers(-8, 9, size=(2, 6)).astype(float) / 8.0
        vp = save_vec(str(tmp_path / "v.vec"), vocab, in_mat)
        lp = save_vec(
            str(tmp_path / "l.vec"), [LABEL_PREFIX + s for s in labels], out_mat
        )
        texts = [
            "Apple banana APPLE!",
            "unknown words only zzz",
            "",
            "fig date cherry fig",
            "banana?",
        ]
        df = pd.DataFrame({"doc_id": range(5), "text": texts})
        got = (
            fasttext_classify(_ds(df), vp, lp, keep_cols=("doc_id",), concurrency=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = _serial_predict(texts, vocab, in_mat, labels, out_mat)
        assert got["label"].tolist() == [w[0] for w in want]
        np.testing.assert_allclose(got["logit"].to_numpy(), [w[1] for w in want])

    def test_zero_known_tokens_ties_to_first_label(self, tmp_path):
        from deepcrawl4ai_ray.stages.fasttext import fasttext_classify, save_vec

        vp = save_vec(str(tmp_path / "v.vec"), ["xyzzy"], np.ones((1, 2)))
        lp = save_vec(
            str(tmp_path / "l.vec"),
            ["__label__zeta", "__label__alpha"],
            np.array([[1.0, 1.0], [2.0, 2.0]]),
        )
        df = pd.DataFrame({"doc_id": [0], "text": ["nothing matches here"]})
        got = fasttext_classify(_ds(df, 1), vp, lp, concurrency=2).to_pandas()
        # all-zero mean -> all logits 0.0 -> lexicographically smallest label
        assert got["label"].tolist() == ["alpha"]
        assert got["logit"].tolist() == [0.0]

    def test_model_loaded_once_per_actor(self, tmp_path):
        """The broadcast contract: ray.get of the model happens in
        __init__ (once per actor), never per batch — pin by counting
        constructor invocations via an actor-side counter."""
        from deepcrawl4ai_ray.stages.fasttext import (
            FastTextScoreStage,
            load_fasttext_model,
            save_vec,
        )

        vp = save_vec(str(tmp_path / "v.vec"), ["tok"], np.ones((1, 2)))
        lp = save_vec(str(tmp_path / "l.vec"), ["__label__a"], np.ones((1, 2)))
        model_ref = ray.put(load_fasttext_model(vp, lp))

        @ray.remote
        class Counter:
            def __init__(self):
                self.n = 0

            def bump(self):
                self.n += 1

            def get(self):
                return self.n

        counter = Counter.remote()

        class CountingStage(FastTextScoreStage):
            def __init__(self, model_ref, counter):
                ray.get(counter.bump.remote())
                super().__init__(model_ref)

        import ray.data as rd

        df = pd.DataFrame({"text": ["tok tok"] * 64})
        out = (
            rd.from_pandas(df)
            .repartition(8)
            .map_batches(
                CountingStage,
                fn_constructor_kwargs={"model_ref": model_ref, "counter": counter},
                batch_format="pyarrow",
                concurrency=2,
                batch_size=8,
            )
            .to_pandas()
        )
        assert len(out) == 64
        # 8 blocks / batch_size 8 -> >=8 batches, but only 2 actor inits
        assert ray.get(counter.get.remote()) == 2


class TestRegistryStep:
    def test_fasttext_label_step_and_keep_filter(self, tmp_path):
        import ray.data as rd

        from deepcrawl4ai_ray.pipelines.registry import build_pipeline
        from deepcrawl4ai_ray.stages.fasttext import save_vec

        vp = save_vec(str(tmp_path / "v.vec"), ["good", "bad"],
                      np.array([[1.0, 0.0], [0.0, 1.0]]))
        lp = save_vec(
            str(tmp_path / "l.vec"),
            ["__label__keep", "__label__drop"],
            np.array([[2.0, -2.0], [-2.0, 2.0]]),
        )
        df = pd.DataFrame(
            {"doc_id": [0, 1, 2], "text": ["good good", "bad bad", "good bad"]}
        )
        spec = lambda extra: [{"step": "fasttext_label", "params": {
            "vectors_path": vp, "labels_path": lp, "concurrency": 2, **extra}}]
        tagged = (
            build_pipeline(rd.from_pandas(df), spec({}))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert tagged["label"].tolist() == ["keep", "drop", "drop"]
        # 'good bad': mean=(0.5,0.5) -> both logits 0.0 -> tie -> 'drop' (lex)
        assert tagged["logit"].tolist() == [2.0, 2.0, 0.0]
        kept = (
            build_pipeline(rd.from_pandas(df), spec({"keep_label": "keep"}))
            .to_pandas()
        )
        assert kept["doc_id"].tolist() == [0]
        # original columns survive the filter step
        assert set(kept.columns) >= {"doc_id", "text", "label", "logit"}
