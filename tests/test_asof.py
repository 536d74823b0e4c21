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
