"""Distributed BPE training/encoding (stages/bpe.py) vs the canonical
single-process Sennrich reference implemented here from the paper."""

import collections

import numpy as np
import pandas as pd
import pytest

EOW = "</w>"


# ---- reference implementation (Sennrich et al. 2016, Algorithm 1) ----
def ref_learn_bpe(word_freqs: dict, num_merges: int):
    vocab = {tuple(list(w) + [EOW]): n for w, n in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        stats = collections.Counter()
        for syms, n in vocab.items():
            for pair in zip(syms, syms[1:]):
                stats[pair] += n
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def ref_encode(word: str, merges: list):
    syms = list(word) + [EOW]
    for l, r in merges:  # apply merges in learned order, exhaustively
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _words_ds(freqs: dict):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(
            {
                "word": list(freqs.keys()),
                "n": pd.Series(list(freqs.values()), dtype="int64"),
            }
        )
    )


class TestLearnBpe:
    def test_matches_reference_small(self, ray_session):
        from deepcrawl4ai_ray.stages.bpe import learn_bpe

        freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        got = learn_bpe(_words_ds(freqs), 10)
        want = ref_learn_bpe(freqs, 10)
        assert list(zip(got["left"], got["right"])) == want
        assert got["rank"].tolist() == list(range(len(want)))

    def test_matches_reference_randomized(self, ray_session):
        from deepcrawl4ai_ray.stages.bpe import learn_bpe

        rng = np.random.default_rng(11)
        alphabet = list("abcde")
        freqs = {
            "".join(rng.choice(alphabet, size=rng.integers(1, 8))): int(n)
            for n in rng.integers(1, 50, size=60)
        }
        got = learn_bpe(_words_ds(freqs), 25)
        want = ref_learn_bpe(freqs, 25)
        assert list(zip(got["left"], got["right"])) == want

    def test_stops_when_no_pairs_left(self, ray_session):
        from deepcrawl4ai_ray.stages.bpe import learn_bpe

        # single 1-char word: exactly one mergeable pair (c, </w>)
        got = learn_bpe(_words_ds({"a": 3}), 10)
        assert list(zip(got["left"], got["right"])) == [("a", EOW)]

    def test_zero_merges(self, ray_session):
        from deepcrawl4ai_ray.stages.bpe import learn_bpe

        got = learn_bpe(_words_ds({"ab": 1}), 0)
        assert len(got) == 0
        assert list(got.columns) == ["rank", "left", "right"]


class TestWordCounts:
    def test_counts_match_tokenizer(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.bpe import word_counts

        docs = rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([1, 2], dtype="int64"),
                    "text": ["The cat the CAT", "cat mat"],
                }
            )
        )
        out = word_counts(docs).to_pandas().set_index("word")["n"].to_dict()
        assert out == {"the": 2, "cat": 3, "mat": 1}


class TestBpeEncode:
    def test_matches_reference(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.bpe import bpe_encode, learn_bpe, word_counts

        texts = [
            "low lower newest widest",
            "the newest newest low",
            "unseen zebra",  # contains words never in training
        ]
        docs = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": pd.Series(range(len(texts)), dtype="int64"), "text": texts}
            )
        )
        merges = learn_bpe(word_counts(docs), 12)
        mlist = list(zip(merges["left"], merges["right"]))
        got = bpe_encode(docs, merges).to_pandas().sort_values("doc_id")
        from deepcrawl4ai_ray.functions.hashing import tokens

        for txt, ps, n in zip(texts, got["pieces"], got["n_pieces"]):
            want = [p for w in tokens(txt) for p in ref_encode(w, mlist)]
            assert list(ps) == want
            assert n == len(want)

    def test_empty_input_keeps_schema(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.bpe import bpe_encode

        docs = rd.from_pandas(pd.DataFrame({"doc_id": pd.Series([], dtype="int64"), "text": []}))
        merges = pd.DataFrame({"rank": pd.Series([], dtype="int64"), "left": [], "right": []})
        out = bpe_encode(docs, merges)
        assert list(out.schema().names) == ["doc_id", "pieces", "n_pieces"]
        assert out.count() == 0
