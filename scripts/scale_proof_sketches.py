"""sf1 scale proof for the third-pass round-4 family: HyperLogLog
grouped-distinct registers, Count-Min frequency grid, spider-trap host
detection, and indexed exact phrase search — run over the ~2M-page sf1
corpus at 32 cpus with the same driver peak-RSS / RssAnon discipline as
scripts/scale_proof.py (flat RssAnon across stages = no hidden
driver-side materialization; the sketch outputs are bounded artifacts
by construction: groups x 4 KiB for HLL, 8192 rows for CMS).

Usage: python scripts/scale_proof_sketches.py [--tier sf1] [--cpus 32]
Writes one JSON line to stdout and SCALE_PROOF_r4_sketches.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def rss_mb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1)


def anon_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("RssAnon:"):
                return round(int(line.split()[1]) / 1024.0, 1)
    return -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="sf1")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from deepcrawl4ai_ray.sources.corpus import ensure

    corpus = ensure(args.tier)

    import pyarrow.parquet as pq_

    n_pages = sum(
        pq_.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(corpus, "pages", "*.parquet"))
    )

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False, logging_level="ERROR")
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.target_max_block_size = 8 * 1024 * 1024

    out: dict = {
        "metric": "scale_proof_sketches",
        "tier": args.tier,
        "num_cpus": args.cpus,
        "pages": n_pages,
        "stages": {},
        "rss_mb": {"start": rss_mb()},
        "rss_anon_mb": {"start": anon_mb()},
    }

    def record(name: str, secs: float, **kw) -> None:
        out["stages"][name] = {"sec": round(secs, 1), **{k: round(v, 1) for k, v in kw.items()}}
        out["rss_mb"][name] = rss_mb()
        out["rss_anon_mb"][name] = anon_mb()
        print(
            f"[scale_proof_sketches] {name}: {secs:.1f}s {kw} peak_rss={rss_mb()} MB"
            f" anon_rss={anon_mb()} MB",
            file=sys.stderr,
        )

    pages_path = os.path.join(corpus, "pages")

    def add_host(batch: pa.Table) -> pa.Table:
        rest = pc.replace_substring_regex(batch["url"], pattern="^[a-z]+://", replacement="")
        host = pc.replace_substring_regex(rest, pattern="/.*$", replacement="")
        return pa.table({"host": host, "url": batch["url"]})

    urls = rd.read_parquet(pages_path, columns=["url"]).map_batches(
        add_host, batch_format="pyarrow"
    )

    # ---- 1. HLL per-host distinct-URL registers (p=12) ------------------
    from deepcrawl4ai_ray.state.hll import HyperLogLog, hll_register_rows

    hll_out = "/tmp/dc4r_scale/sketches_hll"
    shutil.rmtree(hll_out, ignore_errors=True)
    t0 = time.time()
    # the 100-TB form: the O(groups x 2^p) register table goes to a
    # parquet sink, never through driver pandas
    hll_register_rows(urls, "host", "url", p=12, as_pandas=False).write_parquet(hll_out)
    dt = time.time() - t0
    reg_rows = sum(
        pq_.read_metadata(f).num_rows for f in glob.glob(f"{hll_out}/*.parquet")
    )
    # spot-check one host's registers reconstruct a sane estimate; Ray
    # can emit an empty FIRST file — scan until a non-empty frame
    sample = None
    for f in sorted(glob.glob(f"{hll_out}/*.parquet")):
        df_ = pq_.read_table(f).to_pandas()
        if len(df_):
            sample = df_
            break
    assert sample is not None, "register sink produced only empty files"
    hot = sample[sample["host"] == sample["host"].iloc[0]]
    sk = HyperLogLog(12)
    sk.registers[hot["reg"].to_numpy()] = hot["reg_rank"].to_numpy().astype(np.uint8)
    assert sk.estimate() > 0
    record(
        "hll_registers",
        dt,
        urls_per_sec=n_pages / dt,
        register_rows=float(reg_rows),
    )

    # ---- 2. Count-Min grid over the per-URL host stream -----------------
    from deepcrawl4ai_ray.state.cms import cms_counters, cms_estimate

    t0 = time.time()
    grid = cms_counters(urls, "host", depth=4, width=2048)
    dt = time.time() - t0  # operator cost only — the exact-count check below is verification, not the sketch
    from deepcrawl4ai_ray.stages.join import shuffle_coalesce

    hosts_top = (
        shuffle_coalesce(
            urls.map_batches(
                lambda t: t.select(["host"]).group_by("host").aggregate([([], "count_all")]),
                batch_format="pyarrow",
            )
        )
        .groupby("host")
        .sum("count_all")
        .to_pandas()
        .nlargest(5, "sum(count_all)")
    )
    est = cms_estimate(grid, hosts_top["host"].tolist())
    true = hosts_top["sum(count_all)"].to_numpy()
    assert (est >= true).all(), "CMS must never underestimate"
    record(
        "cms_grid",
        dt,
        urls_per_sec=n_pages / dt,
        grid_rows=float(len(grid)),
        top_host_overest_pct=float(100.0 * (est[0] - true[0]) / true[0]),
    )

    # ---- 3. spider-trap report over ~1.3x planted URL explosions --------
    from deepcrawl4ai_ray.stages.traps import trap_host_report

    def plant(batch: pa.Table) -> pa.Table:
        u = batch["url"].to_pylist()
        h = pd.util.hash_array(np.asarray(u, dtype=object), categorize=False)
        outl = list(u)
        for x in np.asarray(u, dtype=object)[h % 11 == 0]:
            outl.extend(f"{x}?sid={k}" for k in range(3))
        for x in np.asarray(u, dtype=object)[h % 37 == 0]:
            outl.append(f"{x}/cal/2024/01/0")
        return pa.table({"url": pa.array(outl, pa.string())})

    t0 = time.time()
    report = trap_host_report(
        rd.read_parquet(pages_path, columns=["url"]).map_batches(
            plant, batch_format="pyarrow"
        )
    )
    dt = time.time() - t0
    record(
        "trap_report",
        dt,
        urls_per_sec=n_pages * 1.3 / dt,
        hosts=float(len(report)),
        flagged=float(report["is_trap"].sum()),
    )

    # ---- 4. phrase search: index build once, candidate-bounded query ----
    from deepcrawl4ai_ray.stages.textindex import build_text_index, phrase_search_indexed

    idx_dir = "/tmp/dc4r_scale/sketches_phrase_idx"
    shutil.rmtree(idx_dir, ignore_errors=True)

    def doc_ids(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(batch["url"].to_pylist(), dtype=object), categorize=False)
        return pa.table(
            {
                "doc_id": pa.array((h >> np.uint64(1)).astype(np.int64), pa.int64()),
                "text": batch["text"],
            }
        )

    docs = rd.read_parquet(pages_path, columns=["url", "text"]).map_batches(
        doc_ids, batch_format="pyarrow"
    )
    t0 = time.time()
    build_text_index(docs, "doc_id", "text", idx_dir, num_buckets=32)
    t_build = time.time() - t0
    t0 = time.time()
    hits = phrase_search_indexed(
        idx_dir, "doc_id", ["crawl", "frontier"], docs, num_buckets=32
    )
    t_query = time.time() - t0
    record("phrase_index_build", t_build, docs_per_sec=n_pages / t_build)
    record("phrase_query", t_query, docs_per_sec=n_pages / t_query, hits=float(len(hits)))

    out["rss_mb"]["end"] = rss_mb()
    out["rss_anon_mb"]["end"] = anon_mb()
    line = json.dumps(out)
    print(line)
    with open(
        os.path.join(os.path.dirname(__file__), "..", "SCALE_PROOF_r4_sketches.json"), "w"
    ) as f:
        f.write(line + "\n")
    ray.shutdown()


if __name__ == "__main__":
    main()
