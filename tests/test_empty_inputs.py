"""Empty-input schema stability across the public operator surface.

Ray drops all-empty blocks, so an operator whose input is legitimately
empty (empty delta crawl, empty filter partition, zero candidates) can
return a COLUMN-LESS dataset that crashes downstream select/filter
stages — the r3 hash_join finding, generalized.  Every public operator
must instead keep its documented output schema, which the r4 empty-seed
fix guarantees via schema-pinned empty seed blocks (join._seed_empty).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_empty():
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "text": pd.Series(dtype=str)})
    )


def _assert_schema(out, want_cols):
    m = out.materialize()
    sch = m.schema()
    assert sch is not None, "schema lost on empty input"
    assert sch.names == want_cols
    assert m.count() == 0
    # the downstream op that a column-less dataset breaks:
    assert m.select_columns([want_cols[0]]).count() == 0


class TestEmptyInputOperators:
    def test_session_counts(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.windows import session_counts

        ev = rd.from_pandas(
            pd.DataFrame({"user_id": pd.Series(dtype="int64"), "ts": pd.Series(dtype="int64")})
        )
        _assert_schema(session_counts(ev, "user_id", "ts", gap=100), ["user_id", "n_sessions"])

    def test_anchor_term_stats(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.anchors import anchor_term_stats

        pages = rd.from_pandas(
            pd.DataFrame({"url": pd.Series(dtype=str), "html": pd.Series(dtype=str)})
        )
        _assert_schema(
            anchor_term_stats(pages),
            ["dst", "n_anchor_tokens", "n_terms", "top_term", "top_term_count"],
        )

    def test_minhash_and_simhash(self, ray_session):
        from deepcrawl4ai_ray.stages.dedup import minhash_lsh_pairs, simhash_near_dup_pairs

        out = minhash_lsh_pairs(
            _docs_empty(), "doc_id", "text", threshold=0.9, num_perm=16, bands=4, k=3
        )
        assert out.materialize().schema() is not None
        out = simhash_near_dup_pairs(_docs_empty(), "doc_id", "text")
        assert out.materialize().schema() is not None

    def test_srp(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dedup import srp_near_dup_pairs

        emb = rd.from_pandas(
            pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "emb": pd.Series(dtype=object)})
        )
        _assert_schema(
            srp_near_dup_pairs(emb, "doc_id", "emb", threshold=0.9),
            ["id_a", "id_b", "cos_sim"],
        )

    def test_graph_ops(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.pagerank import hits, pagerank

        edges = rd.from_pandas(
            pd.DataFrame({"src": pd.Series(dtype=str), "dst": pd.Series(dtype=str)})
        )
        assert pagerank(edges).materialize().schema() is not None
        assert hits(edges).materialize().schema() is not None

    def test_chunk_text(self, ray_session):
        from deepcrawl4ai_ray.stages.chunk import chunk_text

        _assert_schema(
            chunk_text(_docs_empty(), "doc_id", "text", 100),
            ["doc_id", "chunk_index", "total_chunks", "chunk"],
        )

    def test_dupspans(self, ray_session):
        from deepcrawl4ai_ray.stages.dupspans import (
            duplicate_span_pairs,
            remove_duplicate_spans,
        )

        _assert_schema(
            duplicate_span_pairs(_docs_empty(), "doc_id", "text", n=13),
            ["id_a", "id_b", "n_shared"],
        )
        _assert_schema(
            remove_duplicate_spans(_docs_empty(), "doc_id", "text", n=13),
            ["doc_id", "cleaned"],
        )

    def test_paragraph_dedup(self, ray_session):
        from deepcrawl4ai_ray.stages.paradedup import paragraph_dedup

        _assert_schema(
            paragraph_dedup(_docs_empty()),
            ["doc_id", "text", "n_paras", "n_dropped"],
        )

    def test_canonical_url_dedup(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.dedup import canonical_url_dedup

        urls = rd.from_pandas(pd.DataFrame({"url": pd.Series(dtype=str)}))
        _assert_schema(
            canonical_url_dedup(urls), ["canon_key", "best_url", "n_variants"]
        )

    def test_weighted_sample_topk(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.sample import weighted_sample_topk

        w = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"), "w": pd.Series(dtype="int64")}
            )
        )
        _assert_schema(
            weighted_sample_topk(w, "doc_id", "w", 5), ["doc_id", "w", "sample_key"]
        )

    def test_c4filter(self, ray_session):
        from deepcrawl4ai_ray.stages.c4filter import boilerplate_line_dedup, c4_line_stats

        _assert_schema(
            c4_line_stats(_docs_empty(), "doc_id", "text"),
            ["doc_id", "n_lines", "n_kept", "clean_md5"],
        )
        _assert_schema(
            boilerplate_line_dedup(_docs_empty(), "doc_id", "text"),
            ["doc_id", "n_lines", "n_boiler_removed", "clean_md5"],
        )

    def test_snapshot_diff(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.snapshot import snapshot_diff

        snap = rd.from_pandas(
            pd.DataFrame({"url": pd.Series(dtype=str), "text": pd.Series(dtype=str)})
        )
        _assert_schema(snapshot_diff(snap, snap, "url", "text"), ["url", "change"])

    def test_hash_join_schema_contract_error(self, ray_session):
        """A schema-less input now raises a clear contract error instead
        of an AttributeError deep inside the join."""
        import ray.data as rd

        from deepcrawl4ai_ray.stages.join import hash_join

        # an all-empty map output whose blocks Ray dropped
        schemaless = _docs_empty().map_batches(
            lambda t: pa.table({"k": pa.array([], pa.int64())}), batch_format="pyarrow"
        ).materialize()
        ok = rd.from_pandas(pd.DataFrame({"k": [1], "x": [2]}))
        if schemaless.schema() is None:  # Ray version-dependent; only then applies
            with pytest.raises(ValueError, match="no schema"):
                hash_join(schemaless, ok, on="k")
