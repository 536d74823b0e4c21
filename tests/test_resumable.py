"""Resumable partitioned parquet sink (stages/resumable.py)."""

import os

import pandas as pd
import pytest


def _docs(n=200):
    return pd.DataFrame(
        {"doc_id": range(n), "text": [f"doc {i} body words" for i in range(n)]}
    )


class TestResumableWrite:
    def test_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.resumable import (
            read_resumable,
            resumable_write_parquet,
        )

        out = str(tmp_path / "out")
        df = _docs()
        res = resumable_write_parquet(rd.from_pandas(df).repartition(7), out, "doc_id", num_partitions=8)
        assert res["partitions"] == 8
        assert res["rows_written"] == len(df)
        got = read_resumable(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, df)

    def test_resume_skips_published_partitions(self, ray_session, tmp_path):
        import shutil

        import ray.data as rd

        from deepcrawl4ai_ray.stages.resumable import (
            done_partitions,
            read_resumable,
            resumable_write_parquet,
        )

        out = str(tmp_path / "out")
        df = _docs()
        resumable_write_parquet(rd.from_pandas(df), out, "doc_id", num_partitions=8)
        # simulate an interrupted run: partitions 0 and 3 never published
        for pid in (0, 3):
            shutil.rmtree(os.path.join(out, f"part={pid}"))
        # and partition 5 torn mid-write (files present, no _DONE marker)
        os.remove(os.path.join(out, "part=5", "_DONE"))
        assert done_partitions(out) == {1, 2, 4, 6, 7}
        intact_mtime = os.path.getmtime(os.path.join(out, "part=1", "data.parquet"))

        res = resumable_write_parquet(rd.from_pandas(df), out, "doc_id", num_partitions=8)
        assert res["skipped"] == 5
        assert res["written"] == 3  # 0, 3 re-written; 5 replaced
        assert done_partitions(out) == set(range(8))
        # published partitions were not rewritten
        assert os.path.getmtime(os.path.join(out, "part=1", "data.parquet")) == intact_mtime
        got = read_resumable(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, df)

    def test_fully_done_run_is_noop(self, ray_session, tmp_path):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.resumable import resumable_write_parquet

        out = str(tmp_path / "out")
        df = _docs(50)
        resumable_write_parquet(rd.from_pandas(df), out, "doc_id", num_partitions=4)
        res = resumable_write_parquet(rd.from_pandas(df), out, "doc_id", num_partitions=4)
        assert res == {"written": 0, "skipped": 4, "partitions": 4, "rows_written": 0}

    def test_partitioning_is_deterministic(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        import ray.data as rd

        from deepcrawl4ai_ray.stages.resumable import resumable_write_parquet

        df = _docs(100)
        outs = [str(tmp_path / f"o{i}") for i in range(2)]
        for o in outs:
            resumable_write_parquet(rd.from_pandas(df).repartition(5), o, "doc_id", num_partitions=8)
        for pid in range(8):
            ids = [
                sorted(
                    pq.read_table(os.path.join(o, f"part={pid}", "data.parquet"))["doc_id"].to_pylist()
                )
                for o in outs
            ]
            assert ids[0] == ids[1]

    def test_string_key_and_empty_partitions_marked(self, ray_session, tmp_path):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.resumable import (
            done_partitions,
            resumable_write_parquet,
        )

        out = str(tmp_path / "out")
        df = pd.DataFrame({"url": [f"https://h{i}.example/" for i in range(5)], "v": range(5)})
        res = resumable_write_parquet(rd.from_pandas(df), out, "url", num_partitions=32)
        # 5 rows over 32 partitions: empty ones still get _DONE markers
        assert done_partitions(out) == set(range(32))
        assert res["rows_written"] == 5

    def test_empty_dataset_roundtrip(self, ray_session, tmp_path):
        """An all-empty write must read back as an empty dataset WITH
        schema (empty partitions are published as schema-pinned empty
        parquet, not bare markers)."""
        import ray.data as rd

        from deepcrawl4ai_ray.stages.resumable import (
            done_partitions,
            read_resumable,
            resumable_write_parquet,
        )

        out = str(tmp_path / "out")
        empty = rd.from_pandas(
            pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "text": pd.Series(dtype=str)})
        )
        res = resumable_write_parquet(empty, out, "doc_id", num_partitions=4)
        assert res["rows_written"] == 0
        assert done_partitions(out) == {0, 1, 2, 3}
        back = read_resumable(out)
        assert back.count() == 0
        assert back.schema() is not None and "doc_id" in back.schema().names

    def test_bad_num_partitions(self, ray_session, tmp_path):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.resumable import resumable_write_parquet

        with pytest.raises(ValueError):
            resumable_write_parquet(
                rd.from_pandas(_docs(5)), str(tmp_path / "x"), "doc_id", num_partitions=0
            )
