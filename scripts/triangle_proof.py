"""Triangle-family scale proof (r5, verdict #1 follow-up): time the
degree-oriented triangle count over the full link graph extracted from
HTML — the measurement behind the BASELINE.md triangle table — after
the wedge kernel was vectorized (numpy pair expansion) and the degree
attach / closure gained guarded broadcast paths.

Usage: python scripts/triangle_proof.py [--tier sf1] [--cpus 32]
Writes TRIANGLE_PROOF_r5.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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
    ap.add_argument("--out", default="TRIANGLE_PROOF_r5.json")
    args = ap.parse_args()

    from deepcrawl4ai_ray.sources.corpus import ensure

    corpus = ensure(args.tier)

    import ray

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from deepcrawl4ai_ray.pipelines.queries import _link_edges
    from deepcrawl4ai_ray.stages.triangles import triangle_corner_hosts

    n_pages = rd.read_parquet(os.path.join(corpus, "pages"), columns=["url"]).count()
    pages = rd.read_parquet(os.path.join(corpus, "pages"), columns=["url", "html"])
    start_anon = anon_mb()
    t0 = time.time()
    hosts = triangle_corner_hosts(pages.map_batches(_link_edges, batch_format="pyarrow"))
    dt = time.time() - t0
    corners = int(hosts["n_corners"].sum())
    out = {
        "metric": "triangle_proof",
        "tier": args.tier,
        "num_cpus": args.cpus,
        "pages": n_pages,
        "sec": round(dt, 1),
        "pages_per_sec": round(n_pages / dt, 1),
        "corners": corners,
        "triangles": corners // 3,
        "driver_anon_mb": {"start": start_anon, "end": anon_mb()},
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__), "..", args.out), "w") as f:
        json.dump(out, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
