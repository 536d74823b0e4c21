"""As-of join stage unit tests (vs pandas merge_asof ground truth)."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(autouse=True)
def _ray(ray_session):
    pass


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_asof_backward_matches_pandas(ray_session):
    from deepcrawl4ai_ray.stages.asof import asof_join

    rng = np.random.RandomState(3)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 50).astype("int64"),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.randint(0, 10000, 50), unit="s"),
            "lv": np.arange(50, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 30).astype("int64"),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.randint(0, 10000, 30), unit="s"),
            "rv": np.arange(30, dtype="int64") * 10,
        }
    )
    got = (
        asof_join(_ds(left), _ds(right), key="k", ts="ts", num_buckets=4)
        .to_pandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts",
        by="k",
        direction="backward",
    ).sort_values("lv").reset_index(drop=True)
    assert got["lv"].tolist() == want["lv"].tolist()
    assert got["rv"].fillna(-1).tolist() == want["rv"].fillna(-1).tolist()


def test_asof_no_right_rows_for_key(ray_session):
    from deepcrawl4ai_ray.stages.asof import asof_join

    left = pd.DataFrame(
        {"k": np.array([1, 2], dtype="int64"), "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]), "lv": np.array([1, 2], dtype="int64")}
    )
    right = pd.DataFrame(
        {"k": np.array([1], dtype="int64"), "ts": pd.to_datetime(["2023-12-31"]), "rv": np.array([7], dtype="int64")}
    )
    got = asof_join(_ds(left), _ds(right), key="k", ts="ts", num_buckets=2).to_pandas()
    got = got.sort_values("lv")
    assert got[got.k == 1]["rv"].tolist() == [7]
    assert got[got.k == 2]["rv"].isna().all()


def test_int_right_columns_uniform_dtype_across_buckets(ray_session):
    """A bucket whose key has no right-side rows must not produce a
    different dtype (float64 vs int64) than fully-matched buckets —
    int right columns are float64 in EVERY group."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from deepcrawl4ai_ray.stages.asof import asof_join

    left = pd.DataFrame(
        {"k": np.array([0, 0, 1, 1], dtype=np.int64), "ts": np.array([5, 9, 5, 9], dtype=np.int64)}
    )
    right = pd.DataFrame(  # only key 0 — key 1's bucket is right-empty
        {"k": np.array([0], dtype=np.int64), "ts": np.array([1], dtype=np.int64),
         "rv": np.array([7], dtype=np.int64)}
    )
    out = asof_join(rd.from_pandas(left), rd.from_pandas(right), key="k", ts="ts", num_buckets=2)
    tbl = out.to_pandas()
    import pyarrow as pa
    sch = dict(zip(out.schema().names, out.schema().types))
    assert sch["rv"] == pa.float64()  # uniform across matched/empty groups
    assert tbl.loc[tbl.k == 0, "rv"].tolist() == [7.0, 7.0]
    assert tbl.loc[tbl.k == 1, "rv"].isna().all()
