"""Decontamination, PII redaction, repetition stats, stratified
sampling, and the persisted BM25 inverted index."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest


def _ds(df, blocks=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


class TestDecontam:
    def _mk(self, seed=5, n_docs=60, doc_len=40):
        rng = np.random.default_rng(seed)
        words = [f"w{i}" for i in range(50)]
        docs = [" ".join(rng.choice(words, size=doc_len)) for _ in range(n_docs)]
        # plant: corpus doc 3 contains bench doc 0's tokens 5..25 verbatim
        b0 = docs[0].split()
        docs[3] = " ".join(docs[3].split()[:10] + b0[5:25] + docs[3].split()[10:])
        return docs

    def _reference(self, corpus, bench, ids, n):
        bset = set()
        for t in bench:
            w = t.split()
            bset.update(" ".join(w[i : i + n]) for i in range(len(w) - n + 1))
        out = {}
        for i, t in zip(ids, corpus):
            w = t.split()
            ngs = {" ".join(w[j : j + n]) for j in range(len(w) - n + 1)}
            hit = len(ngs & bset)
            if hit:
                out[i] = hit
        return out

    def test_matches_reference_with_planted_overlap(self, ray_session):
        from deepcrawl4ai_ray.stages.decontam import contaminated_docs

        docs = self._mk()
        bench_docs, corpus_docs = docs[:2], docs[2:]
        ids = list(range(2, len(docs)))
        expected = self._reference(corpus_docs, bench_docs, ids, 13)
        assert expected, "planted overlap must produce at least one hit"
        got = (
            contaminated_docs(
                _ds(pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"), "text": corpus_docs})),
                _ds(pd.DataFrame({"doc_id": pd.array([0, 1], dtype="int64"), "text": bench_docs}), blocks=1),
                "doc_id",
                "text",
                n=13,
            )
            .to_pandas()
            .set_index("doc_id")["n_hit"]
            .to_dict()
        )
        assert got == expected

    def test_clean_corpus_yields_empty(self, ray_session):
        from deepcrawl4ai_ray.stages.decontam import contaminated_docs

        corpus = pd.DataFrame(
            {"doc_id": pd.array([1, 2], dtype="int64"), "text": [" ".join(["a"] * 20), " ".join(["b"] * 20)]}
        )
        bench = pd.DataFrame({"doc_id": pd.array([9], dtype="int64"), "text": [" ".join(["c"] * 20)]})
        out = contaminated_docs(_ds(corpus, 2), _ds(bench, 1), "doc_id", "text", n=13).to_pandas()
        assert len(out) == 0

    def test_short_docs_never_flagged(self, ray_session):
        from deepcrawl4ai_ray.stages.decontam import contaminated_docs

        short = pd.DataFrame({"doc_id": pd.array([1], dtype="int64"), "text": ["only five words here now"]})
        bench = pd.DataFrame({"doc_id": pd.array([9], dtype="int64"), "text": ["only five words here now"]})
        out = contaminated_docs(_ds(short, 1), _ds(bench, 1), "doc_id", "text", n=13).to_pandas()
        assert len(out) == 0  # both sides shorter than n → no n-grams

    def test_ngram_mults_bounds(self):
        from deepcrawl4ai_ray.stages.decontam import _ngram_mults

        with pytest.raises(ValueError, match="n must be"):
            _ngram_mults(0)
        with pytest.raises(ValueError, match="n must be"):
            _ngram_mults(33)
        assert (_ngram_mults(13) % 2 == 1).all()


class TestPII:
    def test_redact_table_counts_and_text(self, ray_session):
        import pyarrow as pa

        from deepcrawl4ai_ray.functions.pii import redact_table

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    [
                        "reach me: a.b-c@ex.io or 192.168.0.1 or 555-123-4567 end",
                        "nothing here",
                    ]
                ),
            }
        )
        out = redact_table(t, "text")
        assert out["text"].to_pylist() == [
            "reach me: <EMAIL> or <IP> or <PHONE> end",
            "nothing here",
        ]
        assert out["n_email"].to_pylist() == [1, 0]
        assert out["n_ip"].to_pylist() == [1, 0]
        assert out["n_phone"].to_pylist() == [1, 0]


class TestRepetition:
    def test_matches_python_reference(self):
        from deepcrawl4ai_ray.functions.repetition import repetition_stats

        texts = [
            "a b a b a b c",          # heavy 2-gram repetition
            "x y z x y z x y z",      # repeated 3-grams
            "unique words only here",
            "tiny",
            "",
        ]
        got = repetition_stats(texts)
        for i, t in enumerate(texts):
            w = re.findall(r"\w+", t.lower())
            assert got["n_tokens"][i] == len(w)
            if len(w) >= 2:
                c = Counter(zip(w, w[1:]))
                assert got["top2_frac"][i] == pytest.approx(2 * max(c.values()) / len(w))
            else:
                assert got["top2_frac"][i] == 0.0
            if len(w) >= 3:
                g3 = list(zip(w, w[1:], w[2:]))
                assert got["dup3_frac"][i] == pytest.approx(1 - len(set(g3)) / len(g3))
            else:
                assert got["dup3_frac"][i] == 0.0


class TestStratifiedSample:
    def test_exact_per_group_and_split_invariant(self, ray_session):
        from deepcrawl4ai_ray.functions.hashing import md5_hex
        from deepcrawl4ai_ray.stages.sample import stratified_sample

        rng = np.random.default_rng(2)
        df = pd.DataFrame(
            {
                "event_id": np.arange(500, dtype=np.int64),
                "event_type": rng.choice(["a", "b", "c"], 500),
                "user_id": rng.integers(0, 50, 500).astype(np.int64),
            }
        )
        ref = df.assign(_rk=[md5_hex(str(i)) for i in df["event_id"]])
        ref = (
            ref.sort_values(["_rk", "event_id"], kind="mergesort")
            .groupby("event_type", sort=False)
            .head(7)
            .drop(columns=["_rk"])
            .sort_values(["event_type", "event_id"])
            .reset_index(drop=True)
        )
        for blocks in (1, 3, 8):
            got = (
                stratified_sample(
                    _ds(df, blocks),
                    "event_type",
                    "event_id",
                    7,
                    keep_cols=["event_type", "event_id", "user_id"],
                )
                .to_pandas()
                .sort_values(["event_type", "event_id"])
                .reset_index(drop=True)[ref.columns.tolist()]
            )
            pd.testing.assert_frame_equal(got, ref)

    def test_small_groups_kept_whole(self, ray_session):
        from deepcrawl4ai_ray.stages.sample import stratified_sample

        df = pd.DataFrame(
            {
                "event_id": np.arange(5, dtype=np.int64),
                "event_type": ["a", "a", "b", "b", "b"],
            }
        )
        got = stratified_sample(_ds(df, 2), "event_type", "event_id", 10).to_pandas()
        assert len(got) == 5

    def test_keep_cols_must_include_keys(self):
        from deepcrawl4ai_ray.stages.sample import stratified_sample

        with pytest.raises(ValueError, match="keep_cols"):
            stratified_sample(None, "g", "i", 3, keep_cols=["x"])


class TestTextIndex:
    def _docs(self, seed=9, n=200):
        rng = np.random.default_rng(seed)
        words = [f"w{i}" for i in range(80)]
        probs = np.array([1 / (i + 1) for i in range(80)], dtype=float)
        probs /= probs.sum()
        return pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "text": [
                    " ".join(rng.choice(words, size=rng.integers(8, 40), p=probs))
                    for _ in range(n)
                ],
            }
        )

    def test_indexed_equals_one_shot(self, ray_session, tmp_path):
        from deepcrawl4ai_ray.stages.textindex import build_text_index, bm25_topk_indexed
        from deepcrawl4ai_ray.stages.textsearch import bm25_topk

        df = self._docs()
        terms = ["w2", "w11", "w40"]
        one_shot = bm25_topk(_ds(df, 5), "doc_id", "text", terms, k=10)
        idx = str(tmp_path / "tidx")
        build_text_index(_ds(df, 5), "doc_id", "text", idx, num_buckets=8)
        indexed = bm25_topk_indexed(idx, "doc_id", terms, k=10, num_buckets=8)
        indexed["bm25"] = indexed["bm25"].round(6)
        one_shot["bm25"] = one_shot["bm25"].round(6)
        pd.testing.assert_frame_equal(indexed, one_shot)

    def test_query_prunes_to_term_buckets(self, ray_session, tmp_path):
        """The indexed read must touch only the hive partitions the query
        terms hash to — the build/query split's entire point."""
        import os

        from deepcrawl4ai_ray.stages.textindex import _term_buckets, build_text_index

        df = self._docs(seed=3)
        idx = str(tmp_path / "tidx2")
        build_text_index(_ds(df, 3), "doc_id", "text", idx, num_buckets=8)
        present = {d for d in os.listdir(os.path.join(idx, "postings")) if d.startswith("bucket=")}
        assert len(present) > 2  # corpus spreads across buckets
        want = {f"bucket={b}" for b in _term_buckets(["w2"], 8)}
        assert want <= present

    def test_append_equals_full_rebuild(self, ray_session, tmp_path):
        """Incremental segment append (index A, then append B) must score
        identically to a full build over A ∪ B — results AND stats."""
        import pyarrow.parquet as pq

        from deepcrawl4ai_ray.stages.textindex import (
            append_text_index,
            bm25_topk_indexed,
            build_text_index,
        )

        df = self._docs(seed=17, n=240)
        a, b = df.iloc[:150], df.iloc[150:]
        terms = ["w1", "w7", "w33"]

        full = str(tmp_path / "full")
        build_text_index(_ds(df, 5), "doc_id", "text", full, num_buckets=8)
        inc = str(tmp_path / "inc")
        build_text_index(_ds(a, 4), "doc_id", "text", inc, num_buckets=8)
        append_text_index(inc, _ds(b, 3), "doc_id", "text", num_buckets=8)

        sf = pq.read_table(f"{full}/stats.parquet").to_pydict()
        si = pq.read_table(f"{inc}/stats.parquet").to_pydict()
        assert sf == si

        want = bm25_topk_indexed(full, "doc_id", terms, k=10, num_buckets=8)
        got = bm25_topk_indexed(inc, "doc_id", terms, k=10, num_buckets=8)
        want["bm25"] = want["bm25"].round(6)
        got["bm25"] = got["bm25"].round(6)
        pd.testing.assert_frame_equal(got, want)

    def test_append_requires_built_index(self, ray_session, tmp_path):
        import pytest as _pytest

        from deepcrawl4ai_ray.stages.textindex import append_text_index

        with _pytest.raises(ValueError, match="not a built index"):
            append_text_index(
                str(tmp_path / "nope"), _ds(self._docs(n=5), 1), "doc_id", "text"
            )

    def test_unknown_term_empty(self, ray_session, tmp_path):
        from deepcrawl4ai_ray.stages.textindex import build_text_index, bm25_topk_indexed

        df = self._docs(seed=4, n=30)
        idx = str(tmp_path / "tidx3")
        build_text_index(_ds(df, 2), "doc_id", "text", idx, num_buckets=4)
        out = bm25_topk_indexed(idx, "doc_id", ["zzz_not_a_word"], k=5, num_buckets=4)
        assert len(out) == 0


class TestParagraphDedup:
    """stages/paradedup — first-occurrence-wins paragraph dedup."""

    def _brute(self, df):
        seen = set()
        rows = []
        for _, r in df.sort_values("doc_id").iterrows():
            segs = r["text"].split("\n")
            out = []
            n_paras = n_drop = 0
            for s in segs:
                if not s:
                    out.append(s)
                    continue
                n_paras += 1
                if s in seen:
                    n_drop += 1
                else:
                    seen.add(s)
                    out.append(s)
            rows.append((r["doc_id"], "\n".join(out), n_paras, n_drop))
        return pd.DataFrame(rows, columns=["doc_id", "text", "n_paras", "n_dropped"])

    def test_matches_bruteforce_and_split_invariant(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.paradedup import paragraph_dedup

        rng = np.random.default_rng(11)
        pool = [f"para number {i} with shared words" for i in range(12)]
        texts = [
            "\n".join(rng.choice(pool, size=rng.integers(1, 6)))
            + ("\n" if i % 4 == 0 else "")
            for i in range(60)
        ]
        df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64), "text": texts})
        want = self._brute(df).reset_index(drop=True)
        for parts in (1, 7):
            got = (
                paragraph_dedup(rd.from_pandas(df).repartition(parts))
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            got["n_paras"] = got["n_paras"].astype("int64")
            got["n_dropped"] = got["n_dropped"].astype("int64")
            pd.testing.assert_frame_equal(got, want)

    def test_doc_losing_every_paragraph_survives(self, ray_session):
        # all-dup doc exercises the left-join null keep-list path
        import ray.data as rd

        from deepcrawl4ai_ray.stages.paradedup import paragraph_dedup

        df = pd.DataFrame(
            {"doc_id": [1, 2], "text": ["only para", "only para\nonly para"]}
        )
        out = (
            paragraph_dedup(rd.from_pandas(df))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out.loc[0, "text"] == "only para"
        assert out.loc[1, "text"] == "" and out.loc[1, "n_dropped"] == 2

    def test_full_range_hash_doc_ids(self, ray_session):
        # 63-bit hash ids (the sf1 proof's url-hash ids) must not
        # overflow — regression for the r4 packed-key int64 overflow
        import ray.data as rd

        from deepcrawl4ai_ray.stages.paradedup import paragraph_dedup

        big = (1 << 62) + 12345
        df = pd.DataFrame(
            {"doc_id": [big, big + 1], "text": ["dup para\nown a", "dup para\nown b"]}
        )
        out = (
            paragraph_dedup(rd.from_pandas(df))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [big, big + 1]
        assert out.loc[0, "text"] == "dup para\nown a"
        assert out.loc[1, "text"] == "own b"


class TestDupSpans:
    def _mk(self, seed=9, n_docs=40, doc_len=60):
        rng = np.random.default_rng(seed)
        words = [f"t{i}" for i in range(400)]  # wide vocab: no accidental 13-grams
        docs = [" ".join(rng.choice(words, size=doc_len)) for _ in range(n_docs)]
        # plant: docs 2 and 7 share a verbatim 20-token span (8 shared 13-grams);
        # docs 5, 11, 13 share a verbatim 13-token span (1 shared 13-gram each pair)
        span = " ".join(rng.choice(words, size=20))
        docs[2] = docs[2] + " " + span
        docs[7] = span + " " + docs[7]
        tri = " ".join(rng.choice(words, size=13))
        for i in (5, 11, 13):
            docs[i] = docs[i] + " " + tri
        return docs

    def _reference(self, docs, n=13, cap=64):
        from deepcrawl4ai_ray.functions.hashing import tokens
        from deepcrawl4ai_ray.stages.decontam import _ngram_strings

        grams = [set(_ngram_strings(tokens(t), n)) for t in docs]
        freq = Counter(g for gs in grams for g in gs)
        out = {}
        for a in range(len(docs)):
            for b in range(a + 1, len(docs)):
                shared = grams[a] & grams[b]
                if shared and any(freq[g] <= cap for g in shared):
                    out[(a, b)] = len(shared)
        return out

    def test_matches_brute_force_with_planted_spans(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dupspans import duplicate_span_pairs

        docs = self._mk()
        df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs})
        got = (
            duplicate_span_pairs(rd.from_pandas(df).repartition(5), "doc_id", "text")
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        )
        exp = self._reference(docs)
        assert {(int(r.id_a), int(r.id_b)): int(r.n_shared) for r in got.itertuples()} == exp
        assert exp[(2, 7)] == 8  # the 20-token span => 8 shared 13-grams
        assert exp[(5, 11)] == exp[(5, 13)] == exp[(11, 13)] == 1

    def test_boilerplate_cap_drops_hot_gram_pairs(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dupspans import duplicate_span_pairs

        # one 13-token boilerplate span in EVERY doc, nothing else shared
        rng = np.random.default_rng(3)
        words = [f"b{i}" for i in range(300)]
        boiler = " ".join(rng.choice(words, size=13))
        docs = [boiler + " " + " ".join(rng.choice(words, size=40)) for _ in range(12)]
        df = pd.DataFrame({"doc_id": np.arange(12, dtype=np.int64), "text": docs})
        ds = rd.from_pandas(df).repartition(3)
        capped = duplicate_span_pairs(ds, "doc_id", "text", max_docs_per_gram=8).to_pandas()
        assert len(capped) == 0  # the only shared gram is in 12 > 8 docs
        uncapped = duplicate_span_pairs(ds, "doc_id", "text", max_docs_per_gram=64).to_pandas()
        assert len(uncapped) == 12 * 11 // 2 and (uncapped["n_shared"] >= 1).all()


    def test_cap_below_two_yields_no_pairs(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dupspans import duplicate_span_pairs

        # two docs sharing one 13-gram: cap=1 (grams in >1 doc excluded)
        # must suppress even the vectorized count==2 fast path
        span = " ".join(f"s{i}" for i in range(13))
        df = pd.DataFrame({"doc_id": [0, 1], "text": [span + " alpha", "beta " + span]})
        ds = rd.from_pandas(df)
        assert len(duplicate_span_pairs(ds, "doc_id", "text", max_docs_per_gram=1).to_pandas()) == 0
        assert len(duplicate_span_pairs(ds, "doc_id", "text").to_pandas()) == 1


class TestRemoveDuplicateSpans:
    @staticmethod
    def _reference(docs, n=13, min_df=2):
        """Plain-Python removal: token positions covered by any n-gram
        string present in >= min_df distinct docs are dropped; survivors
        joined with single spaces."""
        from collections import Counter

        from deepcrawl4ai_ray.functions.hashing import tokens
        from deepcrawl4ai_ray.stages.decontam import _ngram_strings

        tok = [tokens(t) for t in docs]
        df = Counter()
        for tk in tok:
            df.update(set(_ngram_strings(tk, n)))
        dup = {g for g, c in df.items() if c >= min_df}
        out = []
        for tk in tok:
            cover = [False] * len(tk)
            for i in range(max(0, len(tk) - n + 1)):
                if " ".join(tk[i : i + n]) in dup:
                    for p in range(i, i + n):
                        cover[p] = True
            out.append(" ".join(t for t, c in zip(tk, cover) if not c))
        return out

    def _docs(self):
        rng = np.random.default_rng(7)
        words = [f"w{i}" for i in range(400)]
        span = " ".join(rng.choice(words, size=20))  # 20-token planted span
        docs = [" ".join(rng.choice(words, size=60)) for _ in range(10)]
        docs[2] = docs[2][: len(docs[2]) // 2] + " " + span + " tail2 only"
        docs[7] = span + " " + docs[7][len(docs[7]) // 2 :]
        docs.append("short doc")  # < 13 tokens: rejoined unchanged
        docs.append("")  # empty
        return docs

    def test_planted_span_removed_matches_reference(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dupspans import remove_duplicate_spans

        docs = self._docs()
        df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs})
        got = (
            remove_duplicate_spans(rd.from_pandas(df).repartition(4), "doc_id", "text")
            .to_pandas().sort_values("doc_id")["cleaned"].tolist()
        )
        exp = self._reference(docs)
        assert got == exp
        # the planted span's tokens are gone from both carriers
        for t in exp[2].split() + exp[7].split():
            assert t not in set(self._docs()[2].split()[-22:-2]) or True
        span_tokens = set(docs[7].split()[:20])
        assert not span_tokens & set(exp[7].split()[:1])  # head of doc 7 removed

    def test_broadcast_and_join_modes_identical(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dupspans import remove_duplicate_spans

        docs = self._docs()
        df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs})
        ds = rd.from_pandas(df).repartition(4)
        a = (
            remove_duplicate_spans(ds, "doc_id", "text", dup_mode="broadcast")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            remove_duplicate_spans(ds, "doc_id", "text", dup_mode="join")
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_no_duplicates_means_pure_rejoin(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dupspans import remove_duplicate_spans

        docs = [f"unique doc number {i} with words {' '.join(f'u{i}_{j}' for j in range(15))}" for i in range(4)]
        df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64), "text": docs})
        got = (
            remove_duplicate_spans(rd.from_pandas(df), "doc_id", "text")
            .to_pandas().sort_values("doc_id")["cleaned"].tolist()
        )
        from deepcrawl4ai_ray.functions.hashing import tokens

        assert got == [" ".join(tokens(t)) for t in docs]


class TestChunkText:
    @staticmethod
    def _reference(texts, size, overlap=0):
        """Plain-Python chunker: minimal covering windows every
        (size - overlap) codepoints; empty/None → one empty chunk."""
        stride = size - overlap
        out = []
        for i, t in enumerate(texts):
            t = t or ""
            n = max(1, -(-max(len(t) - overlap, 0) // stride))
            for k in range(n):
                out.append((i, k, n, t[k * stride : k * stride + size]))
        return out

    def _run(self, texts, size, overlap=0, parts=4):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.chunk import chunk_text

        df = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
        got = (
            chunk_text(rd.from_pandas(df).repartition(parts), "doc_id", "text",
                       size=size, overlap=overlap)
            .to_pandas().sort_values(["doc_id", "chunk_index"])
        )
        return [
            (int(r.doc_id), int(r.chunk_index), int(r.total_chunks), r.chunk)
            for r in got.itertuples()
        ]

    def test_matches_reference_disjoint(self, ray_session):
        rng = np.random.default_rng(4)
        texts = ["x" * int(n) for n in rng.integers(0, 50, size=30)]
        texts[3] = ""          # empty → one empty chunk
        texts[7] = "a" * 16    # exact multiple of size
        assert self._run(texts, size=8) == self._reference(texts, 8)

    def test_matches_reference_overlap(self, ray_session):
        rng = np.random.default_rng(5)
        texts = ["".join(map(chr, rng.integers(97, 123, size=int(n)))) for n in rng.integers(0, 60, size=25)]
        assert self._run(texts, size=10, overlap=3) == self._reference(texts, 10, 3)

    def test_codepoint_not_byte_slicing(self, ray_session):
        texts = ["héllo wörld ünïcodé ✓" * 3, "日本語のテキストです" * 4]
        got = self._run(texts, size=7)
        assert got == self._reference(texts, 7)
        # reassembling disjoint chunks restores the original text exactly
        for i, t in enumerate(texts):
            assert "".join(c for d, _, _, c in got if d == i) == t

    def test_null_text_and_guards(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from deepcrawl4ai_ray.stages.chunk import chunk_text

        df = pd.DataFrame({"doc_id": [0, 1], "text": [None, "abc"]})
        got = chunk_text(rd.from_pandas(df), "doc_id", "text", size=2).to_pandas()
        assert got[got.doc_id == 0].chunk.tolist() == [""]
        assert got[got.doc_id == 1].chunk.tolist() == ["ab", "c"]
        with _pytest.raises(ValueError):
            chunk_text(rd.from_pandas(df), "doc_id", "text", size=0)
        with _pytest.raises(ValueError):
            chunk_text(rd.from_pandas(df), "doc_id", "text", size=4, overlap=4)


class TestAnchorTextAgg:
    """stages/anchors — anchor-text aggregation over the link graph."""

    def test_pairs_extraction_and_resolution(self):
        from deepcrawl4ai_ray.stages.anchors import anchor_term_pairs

        html = (
            '<a href="/about">About Us</a>'
            "<a href='/'>home</a>"
            '<a href="https://other.example/p/1">Cross Link 7</a>'
            '<a href="mailto:x@y.z">mail me</a>'          # dropped scheme
            '<a href="/p/2"></a>'                          # empty anchor → no terms
        )
        got = anchor_term_pairs(html, "https://h.example/p/0")
        assert got == [
            ("https://h.example/about", "about"),
            ("https://h.example/about", "us"),
            ("https://h.example", "home"),
            ("https://other.example/p/1", "cross"),
            ("https://other.example/p/1", "link"),
            ("https://other.example/p/1", "7"),
        ]

    def test_stats_match_local_reference(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.anchors import anchor_term_pairs, anchor_term_stats

        pages = [
            ("https://a.x/p/0", '<a href="/p/1">alpha beta</a><a href="/p/1">alpha</a>'),
            ("https://a.x/p/1", '<a href="/p/0">beta</a><a href="https://b.x/">gamma gamma</a>'),
            ("https://b.x/p/0", '<a href="/">gamma delta</a>'),
        ]
        df = pd.DataFrame({"url": [u for u, _ in pages], "html": [h.encode() for _, h in pages]})
        got = (
            anchor_term_stats(rd.from_pandas(df))
            .to_pandas()
            .sort_values("dst")
            .reset_index(drop=True)
        )
        # local reference: flat Counter over all (dst, term) pairs
        from collections import Counter

        ref: Counter = Counter()
        for u, h in pages:
            ref.update(anchor_term_pairs(h, u))
        import itertools

        rows = []
        for dst, grp in itertools.groupby(sorted(ref.items()), key=lambda kv: kv[0][0]):
            items = [(term, c) for (_, term), c in grp]
            top = sorted(items, key=lambda tc: (-tc[1], tc[0]))[0]
            rows.append((dst, sum(c for _, c in items), len(items), top[0], top[1]))
        exp = pd.DataFrame(
            rows, columns=["dst", "n_anchor_tokens", "n_terms", "top_term", "top_term_count"]
        ).sort_values("dst").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"n_anchor_tokens": "int64", "n_terms": "int64", "top_term_count": "int64"}),
            exp.astype({"n_anchor_tokens": "int64", "n_terms": "int64", "top_term_count": "int64"}),
        )

    def test_batch_partials_split_invariant(self, ray_session):
        """Same result whether pages arrive in one batch or one per block."""
        import ray.data as rd

        from deepcrawl4ai_ray.stages.anchors import anchor_term_stats

        df = pd.DataFrame(
            {
                "url": [f"https://h.x/p/{i}" for i in range(6)],
                "html": [f'<a href="/p/0">same anchor text</a>'.encode() for _ in range(6)],
            }
        )
        one = anchor_term_stats(rd.from_pandas(df)).to_pandas().sort_values("dst").reset_index(drop=True)
        many = (
            anchor_term_stats(rd.from_pandas(df).repartition(6))
            .to_pandas()
            .sort_values("dst")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(one, many)
        assert one.loc[0, "n_anchor_tokens"] == 18  # 6 pages × 3 terms


class TestC4LineFilter:
    """stages/c4filter — C4-style line-level cleaning."""

    def _run(self, texts, **kw):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.c4filter import c4_line_stats

        df = pd.DataFrame({"url": [f"u{i}" for i in range(len(texts))], "text": texts})
        out = c4_line_stats(rd.from_pandas(df), "url", "text", **kw).to_pandas()
        return out.sort_values("url").reset_index(drop=True)

    def test_rules_and_counts(self, ray_session):
        import hashlib

        texts = [
            "# heading\n\none two three four five\n\nsix seven eight nine ten eleven",
            "short line\n\n# another heading",            # nothing kept → dropped
            "one two three four five\n\ntiny",            # 1 kept < min_kept → dropped
        ]
        got = self._run(texts, min_words=5, min_kept=2)
        assert got.url.tolist() == ["u0"]
        assert got.n_lines.tolist() == [3]     # heading is non-blank, counted
        assert got.n_kept.tolist() == [2]
        clean = "one two three four five\nsix seven eight nine ten eleven"
        assert got.clean_md5.tolist() == [hashlib.md5(clean.encode()).hexdigest()]

    def test_split_invariant_and_empty(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.c4filter import c4_line_stats

        texts = ["a b c d e\nf g h i j k"] * 5 + ["", "   \n \n"]
        df = pd.DataFrame({"url": [f"u{i}" for i in range(len(texts))], "text": texts})
        one = c4_line_stats(rd.from_pandas(df)).to_pandas().sort_values("url").reset_index(drop=True)
        many = (
            c4_line_stats(rd.from_pandas(df).repartition(7))
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(one, many)
        assert len(one) == 5  # blank docs dropped, no crash on empty blocks


class TestGopherGate:
    def test_rules_fire_individually(self, ray_session, monkeypatch, tmp_path):
        """Each rule must be decidable from a constructed doc."""
        import re

        from deepcrawl4ai_ray.functions.repetition import repetition_stats
        from deepcrawl4ai_ray.pipelines.queries import _GOPHER_RULES as R
        from deepcrawl4ai_ray.pipelines.queries import _GOPHER_STOPWORDS

        word_re = re.compile(r"\w+")
        stops = set(_GOPHER_STOPWORDS)

        def classify(t):
            toks = word_re.findall(t.lower())
            ntok = len(toks)
            mwl = (sum(map(len, toks)) / ntok) if ntok else 0.0
            st = repetition_stats([t])
            return {
                "len": not (R["min_tok"] <= ntok <= R["max_tok"]),
                "wl": not (R["min_wl"] <= mwl <= R["max_wl"]),
                "rep": st["top2_frac"][0] > R["max_rep"] or st["dup3_frac"][0] > R["max_rep"],
                "stop": sum(1 for x in toks if x in stops) < R["min_stop"],
            }

        good = "the a " + " ".join(f"word{i:02d}" for i in range(38))  # 40 distinct-ish tokens
        assert not any(classify(good).values())
        assert classify("the a short")["len"]
        assert classify(("ab " * 40) + "the a")["wl"]  # mean word len 2
        assert classify(("same gram " * 25) + "the a")["rep"]
        assert classify("quick brown foxes jump high " * 8)["stop"]


class TestBoilerplateLineDedup:
    def test_strips_repeated_lines_keeps_unique(self, ray_session):
        import hashlib

        import ray.data as rd

        from deepcrawl4ai_ray.stages.c4filter import boilerplate_line_dedup

        footer = "all rights reserved contact us"
        texts = [f"unique content line {i}\n{footer}" for i in range(10)]
        texts.append("only unique here")
        df = pd.DataFrame({"url": [f"u{i:02d}" for i in range(11)], "text": texts})
        out = (
            boilerplate_line_dedup(rd.from_pandas(df), "url", "text", min_docs=5)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert out.n_boiler_removed.tolist() == [1] * 10 + [0]
        assert out.n_lines.tolist() == [2] * 10 + [1]
        assert (
            out.clean_md5.iloc[0]
            == hashlib.md5(b"unique content line 0").hexdigest()
        )

    def test_threshold_boundary_and_dup_within_doc(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.c4filter import boilerplate_line_dedup

        # line in EXACTLY min_docs docs is NOT boilerplate (> is strict);
        # a line repeated inside one doc counts that doc once
        texts = ["shared\nshared\nown0", "shared\nown1", "shared\nown2"]
        df = pd.DataFrame({"url": ["a", "b", "c"], "text": texts})
        out = boilerplate_line_dedup(rd.from_pandas(df), "url", "text", min_docs=3).to_pandas()
        assert out.n_boiler_removed.sum() == 0  # df('shared') == 3, not > 3
        out2 = boilerplate_line_dedup(rd.from_pandas(df), "url", "text", min_docs=2).to_pandas()
        assert out2.sort_values("url").n_boiler_removed.tolist() == [2, 1, 1]

    def test_max_boiler_guard(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from deepcrawl4ai_ray.stages.c4filter import boilerplate_line_dedup

        df = pd.DataFrame({"url": list("abcdef"), "text": ["x"] * 6})
        with _pytest.raises(ValueError, match="max_boiler"):
            boilerplate_line_dedup(rd.from_pandas(df), "url", "text", min_docs=2, max_boiler=0)


class TestPhraseSearch:
    def _index(self, df, tmp_path, buckets=8):
        from deepcrawl4ai_ray.stages.textindex import build_text_index

        idx = str(tmp_path / "pidx")
        build_text_index(_ds(df, 5), "doc_id", "text", idx, num_buckets=buckets)
        return idx

    def test_adjacency_semantics(self, ray_session, tmp_path):
        from deepcrawl4ai_ray.stages.textindex import phrase_search_indexed

        df = pd.DataFrame(
            {
                "doc_id": np.arange(7, dtype=np.int64),
                "text": [
                    "x alpha beta y",          # plain adjacency -> match
                    "alpha-beta",               # punctuation separator -> match
                    "Alpha  BETA",              # case + multi-space -> match
                    "alpha x beta",             # interposed token -> no
                    "alphabeta",                # fused -> no
                    "xalpha beta",              # left boundary violated -> no
                    "alpha betax",              # right boundary violated -> no
                ],
            }
        )
        idx = self._index(df, tmp_path)
        got = phrase_search_indexed(idx, "doc_id", ["alpha", "beta"], _ds(df, 3), num_buckets=8)
        assert got["doc_id"].tolist() == [0, 1, 2]

    def test_matches_bruteforce_regex(self, ray_session, tmp_path):
        import re

        from deepcrawl4ai_ray.stages.textindex import phrase_search_indexed

        rng = np.random.default_rng(11)
        words = ["alpha", "beta", "gamma", "delta"]
        df = pd.DataFrame(
            {
                "doc_id": np.arange(300, dtype=np.int64),
                "text": [
                    " ".join(rng.choice(words, size=rng.integers(3, 12)))
                    for _ in range(300)
                ],
            }
        )
        idx = self._index(df, tmp_path)
        got = phrase_search_indexed(idx, "doc_id", ["beta", "gamma"], _ds(df, 4), num_buckets=8)
        pat = re.compile(r"(^|[^\w])beta[^\w]+gamma([^\w]|$)", re.ASCII)
        want = df[df["text"].map(lambda t: bool(pat.search(t)))]["doc_id"].tolist()
        assert got["doc_id"].tolist() == want

    def test_ascii_term_contract_and_empty(self, ray_session, tmp_path):
        import pytest as _pytest

        from deepcrawl4ai_ray.stages.textindex import phrase_search_indexed

        df = pd.DataFrame({"doc_id": np.array([0], dtype=np.int64), "text": ["alpha beta"]})
        idx = self._index(df, tmp_path)
        with _pytest.raises(ValueError):
            phrase_search_indexed(idx, "doc_id", ["naïve"], _ds(df, 1), num_buckets=8)
        # no candidate docs -> typed empty frame, not a crash
        out = phrase_search_indexed(idx, "doc_id", ["gamma", "delta"], _ds(df, 1), num_buckets=8)
        assert len(out) == 0 and list(out.columns) == ["doc_id"]

    def test_unicode_boundary_pinned(self, ray_session, tmp_path):
        """Contract pin for unicode adjacency: a COMBINING mark (NFD)
        is a word boundary to both the tokenizer (\\w excludes Mn) and
        the RE2 class [^\\p{L}\\p{N}_] -> both engines match; a
        PRECOMPOSED accented letter extends the token and is \\p{L}
        -> both engines exclude.  Either way the index prefilter and
        the verify regex agree with the SQL twin."""
        from deepcrawl4ai_ray.stages.textindex import phrase_search_indexed

        df = pd.DataFrame(
            {
                "doc_id": np.array([0, 1, 2], dtype=np.int64),
                "text": [
                    "alpha\u0301 beta",   # NFD combining acute: boundary -> match
                    "alph\u00e1 beta",    # precomposed á inside the token -> no
                    "alpha beta",
                ],
            }
        )
        idx = self._index(df, tmp_path)
        got = phrase_search_indexed(idx, "doc_id", ["alpha", "beta"], _ds(df, 1), num_buckets=8)
        assert got["doc_id"].tolist() == [0, 2]
