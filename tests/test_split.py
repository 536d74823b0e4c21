"""Leakage-free keyed splits (stages/sample.keyed_split)."""

import numpy as np
import pandas as pd
import pytest


def _ds(keys):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series(range(len(keys)), dtype="int64"), "source": keys})
    )


class TestKeyedSplit:
    def test_same_key_same_split(self, ray_session):
        from deepcrawl4ai_ray.stages.sample import keyed_split

        keys = [f"host{i % 17}.com" for i in range(300)]
        out = keyed_split(_ds(keys), "source", {"train": 0.8, "val": 0.1, "test": 0.1})
        df = out.to_pandas()
        assert (df.groupby("source")["split"].nunique() == 1).all()
        assert set(df["split"]) <= {"train", "val", "test"}

    def test_proportions_in_key_mass(self, ray_session):
        from deepcrawl4ai_ray.stages.sample import keyed_split

        keys = [f"k{i}" for i in range(5000)]
        df = keyed_split(_ds(keys), "source", {"train": 0.8, "val": 0.1, "test": 0.1}).to_pandas()
        frac = df["split"].value_counts(normalize=True)
        assert abs(frac["train"] - 0.8) < 0.03
        assert abs(frac["val"] - 0.1) < 0.02
        assert abs(frac["test"] - 0.1) < 0.02

    def test_salt_rerolls_deterministically(self, ray_session):
        from deepcrawl4ai_ray.stages.sample import keyed_split

        keys = [f"k{i}" for i in range(400)]
        a = keyed_split(_ds(keys), "source", {"a": 0.5, "b": 0.5}).to_pandas()
        a2 = keyed_split(_ds(keys), "source", {"a": 0.5, "b": 0.5}).to_pandas()
        b = keyed_split(_ds(keys), "source", {"a": 0.5, "b": 0.5}, salt="v2").to_pandas()
        assert a.equals(a2)
        assert not a["split"].equals(b["split"])

    def test_bad_fractions_raise(self, ray_session):
        from deepcrawl4ai_ray.stages.sample import keyed_split

        with pytest.raises(ValueError, match="sum to 1"):
            keyed_split(_ds(["x"]), "source", {"a": 0.5, "b": 0.6})

    def test_full_hash_range_covered(self, ray_session):
        """The top of the 63-bit range maps to the LAST split (the
        clamped bound), never out of range."""
        from deepcrawl4ai_ray.stages import sample as sm

        fracs = np.array([0.3, 0.7])
        bounds = np.floor(np.cumsum(fracs) * float(2**63)).astype(np.uint64)
        bounds[-1] = np.uint64(2**63)
        idx = np.searchsorted(bounds, np.uint64(2**63 - 1), side="right")
        assert idx == 1
        assert sm is not None
