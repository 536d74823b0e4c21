"""stages/langid_model — trainable NB char-trigram language classifier:
persistence round-trip, distributed-vs-local training equality,
actor-pool scoring, and end-to-end accuracy sanity."""

import numpy as np
import pandas as pd
import pytest


def _corpus(n_per_lang=40, seed=3):
    rng = np.random.default_rng(seed)
    vocab = {
        "en": ["the", "quick", "brown", "fox", "jumps", "with", "and", "crawl"],
        "de": ["der", "schnelle", "braune", "fuchs", "springt", "und", "über"],
        "fr": ["le", "renard", "brun", "rapide", "saute", "avec", "et"],
    }
    rows = []
    i = 0
    for lang, words in vocab.items():
        for _ in range(n_per_lang):
            rows.append(
                {
                    "doc_id": i,
                    "lang": lang,
                    "text": " ".join(rng.choice(words, size=rng.integers(8, 25))),
                }
            )
            i += 1
    return pd.DataFrame(rows)


class TestLangIdModel:
    def test_train_matches_local_reference(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.langid_model import _trigrams, train_langid_model

        df = _corpus()
        m = train_langid_model(rd.from_pandas(df).repartition(5), vocab_size=64)

        # local reference: same vocab rule + smoothing
        from collections import Counter

        per_lang: dict = {}
        total: Counter = Counter()
        for _, r in df.iterrows():
            gs = _trigrams(r["text"])
            per_lang.setdefault(r["lang"], Counter()).update(gs)
            total.update(gs)
        want_vocab = sorted(
            [g for g, _ in sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:64]]
        )
        assert m["vocab"] == want_vocab
        V = len(want_vocab)
        for li, lang in enumerate(m["langs"]):
            c = np.array([per_lang[lang].get(g, 0) for g in want_vocab], float)
            n = c.sum()
            np.testing.assert_allclose(m["logp"][li], np.log((c + 1) / (n + V)))
            np.testing.assert_allclose(m["oov"][li], np.log(1 / (n + V)))

    def test_save_load_roundtrip_and_scoring(self, ray_session, tmp_path):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.langid_model import (
            load_langid_model,
            save_langid_model,
            score_langid,
            train_langid_model,
        )

        df = _corpus()
        m = train_langid_model(rd.from_pandas(df), vocab_size=64)
        path = save_langid_model(str(tmp_path / "m"), m)
        back = load_langid_model(path)
        assert back["langs"] == m["langs"] and back["vocab"] == m["vocab"]
        np.testing.assert_array_equal(back["logp"], m["logp"])

        out = (
            score_langid(rd.from_pandas(df).repartition(4), path)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out.columns) == [
            "doc_id", "score_de", "score_en", "score_fr", "pred_lang",
        ]
        acc = (out["pred_lang"].to_numpy() == df.sort_values("doc_id")["lang"].to_numpy()).mean()
        assert acc > 0.95  # separable synthetic languages

    def test_short_docs_excluded(self, ray_session, tmp_path):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.langid_model import (
            save_langid_model,
            score_langid,
            train_langid_model,
        )

        df = _corpus(n_per_lang=10)
        path = save_langid_model(
            str(tmp_path / "m2"), train_langid_model(rd.from_pandas(df), vocab_size=32)
        )
        tiny = pd.DataFrame({"doc_id": [900, 901], "text": ["ab", "abcd"], "lang": ["en", "en"]})
        out = score_langid(rd.from_pandas(tiny), path).to_pandas()
        assert out["doc_id"].tolist() == [901]  # <3 chars: no evidence
