"""Local stand-in for the driver's correctness gate: run each queries()
entry and its oracle SQL side-by-side, compare row-count / schema /
values (order-insensitive, column-name-sorted — like the driver).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
Set DCR_ORACLE_JSON=<path> to also write the per-query record as JSON
(the committed CORRECTNESS_local_r{N}.json round artifacts).
"""

import sys
import time

sys.path.insert(0, ".")

import duckdb
import numpy as np
import pandas as pd


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from deepcrawl4ai_ray.pipelines.queries import ORACLES, QUERIES

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    records = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = normalize(to_df(fn(sf_dir)))
        except Exception as e:
            import traceback

            traceback.print_exc()
            failures.append(name)
            records.append({"query": name, "status": "error", "error": f"{type(e).__name__}: {e}"})
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        sql = ORACLES.get(name)
        if sql is None:
            records.append({"query": name, "status": "no_oracle", "rows": len(mine), "sec": round(dt, 2)})
            print(f"ok?  {name}: rows-only ({len(mine)} rows, {dt:.1f}s)")
            continue
        oracle = normalize(con.execute(sql).fetchdf())
        status = []
        if len(mine) != len(oracle):
            status.append(f"ROWS {len(mine)} vs {len(oracle)}")
        if list(mine.columns) != list(oracle.columns):
            status.append(f"SCHEMA {list(mine.columns)} vs {list(oracle.columns)}")
        if not status:
            eq = True
            for c in mine.columns:
                a, b = mine[c], oracle[c]
                if pd.api.types.is_float_dtype(a):
                    same = np.allclose(a.to_numpy(), b.to_numpy(dtype=float), atol=1e-9, equal_nan=True)
                else:
                    same = a.astype(str).equals(b.astype(str))
                if not same:
                    eq = False
                    diff = (a.astype(str) != b.astype(str)) if not pd.api.types.is_float_dtype(a) else ~np.isclose(a.to_numpy(), b.to_numpy(dtype=float), atol=1e-9)
                    idx = np.nonzero(np.asarray(diff))[0][:3]
                    status.append(f"VALUES[{c}] e.g. rows {idx.tolist()}: {a.iloc[idx].tolist()} vs {b.iloc[idx].tolist()}")
            if eq:
                records.append({"query": name, "status": "pass", "rows": len(mine), "sec": round(dt, 2)})
                print(f"PASS {name} ({len(mine)} rows, {dt:.1f}s)")
                continue
        failures.append(name)
        records.append({"query": name, "status": "fail", "detail": "; ".join(status)})
        print(f"FAIL {name}: {'; '.join(status)}")

    print(f"\n{len(failures)} failures: {failures}")
    import json as _json
    import os as _os

    out_path = _os.environ.get("DCR_ORACLE_JSON")
    if out_path:
        summary = {
            "sf_dir": sf_dir,
            "total": len(records),
            "pass": sum(r["status"] == "pass" for r in records),
            "no_oracle": sum(r["status"] == "no_oracle" for r in records),
            "fail": len(failures),
            "queries": records,
        }
        with open(out_path, "w") as f:
            _json.dump(summary, f, indent=1)
        print(f"wrote {out_path}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
