"""Vocabulary-mapped token encoding (stages/encode.py)."""

import numpy as np
import pandas as pd
import pytest


class TestEncodeTokens:
    def test_ids_order_and_oov(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.encode import encode_tokens

        vocab = pd.DataFrame({"tok": ["the", "cat", "sat"], "id": np.arange(3, dtype=np.int32)})
        docs = pd.DataFrame(
            {
                "doc_id": pd.Series([1, 2, 3], dtype="int64"),
                "text": ["The cat SAT on the mat", "", "unknown words only"],
            }
        )
        out = (
            encode_tokens(rd.from_pandas(docs), "doc_id", "text", vocab)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # doc 2 (zero tokens) encodes to nothing
        assert out["doc_id"].tolist() == [1, 3]
        # order preserved; "on"/"mat" are OOV -> -1
        assert out["ids"].iloc[0].tolist() == [0, 1, 2, -1, 0, -1]
        assert out["n_tokens"].tolist() == [6, 3]
        assert out["n_oov"].tolist() == [2, 3]
        assert out["ids"].iloc[1].tolist() == [-1, -1, -1]

    def test_custom_oov_id(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.encode import encode_tokens

        vocab = pd.DataFrame({"tok": ["a"], "id": np.array([0], dtype=np.int32)})
        docs = pd.DataFrame({"doc_id": pd.Series([1], dtype="int64"), "text": ["a b"]})
        out = encode_tokens(rd.from_pandas(docs), "doc_id", "text", vocab, oov_id=1).to_pandas()
        assert out["ids"].iloc[0].tolist() == [0, 1]
        assert out["n_oov"].tolist() == [1]  # oov count unaffected by remap

    def test_build_vocab_rank_order(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.encode import build_vocab

        docs = pd.DataFrame(
            {
                "doc_id": pd.Series(range(4), dtype="int64"),
                "text": ["b b b a a c", "a b", "c c b", "d"],
            }
        )
        v = build_vocab(rd.from_pandas(docs), "text", 3)
        # counts: b=5, a=3, c=3, d=1 -> ties (a, c) break lexicographically
        assert v["tok"].tolist() == ["b", "a", "c"]
        assert v["id"].tolist() == [0, 1, 2]

    def test_empty_input_keeps_schema(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.encode import encode_tokens

        vocab = pd.DataFrame({"tok": ["a"], "id": np.array([0], dtype=np.int32)})
        empty = rd.from_pandas(
            pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "text": pd.Series(dtype=str)})
        )
        m = encode_tokens(empty, "doc_id", "text", vocab).materialize()
        sch = m.schema()
        assert sch is not None and sch.names == ["doc_id", "ids", "n_tokens", "n_oov"]
        assert m.count() == 0
