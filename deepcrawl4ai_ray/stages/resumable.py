"""Resumable partitioned parquet sink — the batch-pipeline analog of the
crawler's atomic per-round publish (frontier/crawler.py manifests).

A 100-TB pipeline run WILL be interrupted; `ds.write_parquet(out)` then
restarts from zero and can leave torn files behind.  This sink instead:

- hash-partitions rows by a key column into ``num_partitions`` buckets
  (same deterministic siphash as the join/bucket family, so the row →
  partition mapping is stable across runs and processes),
- writes each partition in ONE task as ``out/part=K/data.parquet`` via
  a write-to-temp + ``os.replace`` rename, then touches ``_DONE`` —
  a partition is either completely published or absent, never torn,
- on rerun, finished partitions are detected from their ``_DONE``
  markers and their rows are FILTERED OUT MAP-SIDE before any shuffle
  or write — a resumed run pays only for the missing partitions.

Scale shape: the partition co-location is one all-to-all of the output
rows (shuffle_coalesce-bounded map side), which is the price of
partition-grained atomicity; the driver holds only the done-set (≤
num_partitions entries) and the per-partition manifest rows.

The reference's closest analog is its Redis-stream chunked result
publish (job.py:461-487, SURVEY §2 K2) — append-only with client-side
offsets; this generalizes it to idempotent whole-partition publishes.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from .join import _hash_col, shuffle_coalesce


def done_partitions(out_dir: str) -> set:
    """Partition ids under ``out_dir`` already published (have _DONE)."""
    done = set()
    for marker in glob.glob(os.path.join(out_dir, "part=*", "_DONE")):
        try:
            done.add(int(os.path.basename(os.path.dirname(marker)).split("=", 1)[1]))
        except ValueError:
            continue
    return done


def resumable_write_parquet(
    ds: "ray.data.Dataset",
    out_dir: str,
    key_col: str,
    num_partitions: int = 64,
    compression: str = "zstd",
) -> dict:
    """Write ``ds`` to ``out_dir/part=K/data.parquet`` (K = siphash(key)
    % num_partitions), skipping partitions already published by a prior
    (possibly interrupted) run.  Returns {"written", "skipped",
    "partitions", "rows_written"}.

    Rows of finished partitions are dropped map-side before the
    partition shuffle, so a resume run's cost is proportional to the
    UNFINISHED fraction.  Each partition publish is atomic (temp dir +
    rename + _DONE marker)."""
    if num_partitions <= 0:
        raise ValueError("num_partitions must be positive")
    os.makedirs(out_dir, exist_ok=True)
    done = done_partitions(out_dir)
    if len(done) >= num_partitions:
        return {
            "written": 0,
            "skipped": len(done),
            "partitions": num_partitions,
            "rows_written": 0,
        }
    done_ref = ray.put(frozenset(done))

    def tag(t: pa.Table) -> pa.Table:
        pid = (_hash_col(t[key_col]) % np.uint64(num_partitions)).astype(np.int32)
        t = t.append_column("__pid", pa.array(pid))
        if not done:
            return t
        from .join import cached_get

        skip = cached_get(done_ref, "resumable.done")
        keep = np.array([p not in skip for p in pid], dtype=bool)
        return t.filter(pa.array(keep))

    def write_group(g: pa.Table) -> pa.Table:
        pid = int(g["__pid"][0].as_py())
        body = g.drop_columns(["__pid"])
        final = os.path.join(out_dir, f"part={pid}")
        tmp = os.path.join(out_dir, f".tmp-part={pid}-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp, exist_ok=True)
        try:
            pq.write_table(body, os.path.join(tmp, "data.parquet"), compression=compression)
            # atomic publish: rename, then marker — a crash between the
            # two leaves a rename without _DONE, which the next run
            # replaces (idempotent: same rows → same partition content)
            if os.path.isdir(final):
                shutil.rmtree(final)  # unmarked leftover from a crash
            os.replace(tmp, final)
            with open(os.path.join(final, "_DONE"), "w") as f:
                f.write(str(len(body)))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return pa.table(
            {"pid": pa.array([pid], pa.int32()), "rows": pa.array([len(body)], pa.int64())}
        )

    manifest = (
        shuffle_coalesce(ds.map_batches(tag, batch_format="pyarrow"))
        .groupby("__pid")
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()  # ≤ num_partitions manifest rows
    )
    # partitions with zero rows never reach write_group; publish them as
    # schema-pinned EMPTY parquet + marker so a resume run distinguishes
    # "done, empty" from "missing" and read_resumable always yields a
    # schema (an all-empty write must read back as an empty dataset)
    written_pids = {int(r["pid"]) for r in manifest}
    empty_tbl = None
    for pid in range(num_partitions):
        if pid in done or pid in written_pids:
            continue
        if empty_tbl is None:
            from .join import _schema_types

            tmap = _schema_types(ds) or {}
            empty_tbl = pa.schema(
                [(c, t) for c, t in tmap.items() if c != "__pid"]
            ).empty_table()
        final = os.path.join(out_dir, f"part={pid}")
        os.makedirs(final, exist_ok=True)
        pq.write_table(empty_tbl, os.path.join(final, "data.parquet"), compression=compression)
        with open(os.path.join(final, "_DONE"), "w") as f:
            f.write("0")
    return {
        "written": len(written_pids),
        "skipped": len(done),
        "partitions": num_partitions,
        "rows_written": int(sum(r["rows"] for r in manifest)),
    }


def read_resumable(out_dir: str, columns=None) -> "ray.data.Dataset":
    """Read back ONLY published partitions (those with _DONE)."""
    paths = sorted(
        f
        for pid in done_partitions(out_dir)
        for f in glob.glob(os.path.join(out_dir, f"part={pid}", "*.parquet"))
    )
    if not paths:
        raise FileNotFoundError(f"no published partitions under {out_dir}")
    # partitioning=None: don't hive-infer a 'part' column from the
    # part=K directory names — the partition id is layout, not data
    return ray.data.read_parquet(paths, columns=columns, partitioning=None)
