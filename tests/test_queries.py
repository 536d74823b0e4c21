"""Query-vs-DuckDB oracle spot checks at sf0.001 (the full matrix runs
via scripts/check_oracle.py; here a representative subset keeps CI fast)
plus contract checks for the rows-only queries."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from deepcrawl4ai_ray.pipelines.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"

SUBSET = [
    "q1_lineitem_agg",
    "q3_top_revenue",
    "events_hourly",
    "user_sessions",
    "token_stats_by_lang",
    "dedup_exact_docs",
    "knn_cosine_top10",
    "image_decode_meta",
    "jaccard_adjacent_docs",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, con, name):
    mine = _norm(QUERIES[name](SF))
    want = _norm(con.execute(ORACLES[name]).fetchdf())
    assert list(mine.columns) == list(want.columns)
    assert len(mine) == len(want)
    for c in mine.columns:
        a, b = mine[c], want[c]
        if pd.api.types.is_float_dtype(a):
            assert np.allclose(a.to_numpy(), b.to_numpy(dtype=float), atol=1e-9), c
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), c


def test_minhash_recovers_planted_dups(ray_session):
    pairs = QUERIES["minhash_near_dups"](SF).to_pandas()
    planted = pairs[pairs["id_b"] == pairs["id_a"] + 10_000_000]
    # docs are perturbed by dropping one word of ~15-25 → high jaccard;
    # LSH with 16 bands of 4 rows should recover the large majority
    n_planted_truth = 50  # doc_id % 10 == 0 of 500 docs
    assert len(planted) >= 0.5 * n_planted_truth


def test_ivf_vs_bruteforce_recall(ray_session):
    exact = set(QUERIES["knn_cosine_top10"](SF)["vec_id"])
    approx = set(QUERIES["knn_ivf_top10"](SF)["vec_id"])
    assert len(exact & approx) >= 5  # nprobe=4/16 lists on random data


def test_extract_corpus_text_matches_oracle_column(ray_session, tiny_corpus):
    import glob

    import pyarrow.parquet as pq
    import pyarrow as pa

    from deepcrawl4ai_ray.functions.hashing import md5_hex

    got = QUERIES["extract_corpus_text"](SF).set_index("url")["text_md5"]
    pages = pa.concat_tables(
        pq.read_table(f, columns=["url", "text"])
        for f in glob.glob(f"{tiny_corpus}/pages/*.parquet")
    )
    for u, t in zip(pages["url"].to_pylist(), pages["text"].to_pylist()):
        assert got[u] == md5_hex(t)


def test_lang_id_counts_matches_local_computation(ray_session):
    """Rows-only query cross-checked against a driver-side pandas
    computation of the same confusion counts."""
    import pandas as pd
    import pyarrow.parquet as pq

    from deepcrawl4ai_ray.functions.textstats import lang_id
    from deepcrawl4ai_ray.pipelines.queries import lang_id_counts

    sf = "/root/testdata/sf0.001"
    got = lang_id_counts(sf)
    df = pq.read_table(f"{sf}/documents.parquet", columns=["lang", "text"]).to_pandas()
    df["pred"] = df["text"].map(lang_id)
    want = (
        df.groupby(["lang", "pred"]).size().reset_index(name="n")
        .sort_values(["lang", "pred"]).reset_index(drop=True)
    )
    want["n"] = want["n"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
