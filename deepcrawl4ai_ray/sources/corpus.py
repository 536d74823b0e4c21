"""Deterministic synthetic web corpus generator (FIXTURES.md §1-3).

Builds "the web" the fetch stage reads: a Parquet ``pages`` table with
exactly the input_hint shape (url, warc_ts, html, text, lang) plus a
``host_bucket`` partition column, a ``seeds`` table, and a ``robots``
table.  Everything derives from a single integer seed — same seed, same
bytes, on any machine.

The HTML is produced from templates containing the structures the
extractor must handle: nav/footer boilerplate (dropped), short promo
divs (< 5 words, pruned), headings, bullet lists, paragraph content,
and <a href> links (intra-host + cross-host) that drive the crawl
frontier.  The ``text`` column is computed *at generation time by the
same extractor the engine runs* — the per-row byte-identity invariant.

Host sizes follow a Zipf-ish distribution with one deliberately hot
host (≥ ~20 % of pages at bench tier) to exercise skew handling.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.extract import extract_text
from ..functions.urlnorm import host_buckets
from ..schema import PAGES_SCHEMA, ROBOTS_SCHEMA, SEEDS_SCHEMA

_WORDS = (
    "stream data engine crawl frontier politeness shard arrow batch block "
    "vector column parquet schema filter bloom cuckoo token bucket robots "
    "priority queue ordering sequence deterministic replay lineage manifest "
    "checkpoint resume throughput scaling partition shuffle broadcast skew "
    "salting host quota budget discover extract markdown heading paragraph "
    "anchor navigation content signal boilerplate prune window language tag"
).split()

_LANGS = ["en", "de", "el", "fr", "es", "zh"]


@dataclass(frozen=True)
class CorpusSpec:
    name: str
    num_hosts: int
    pages_per_host_base: int  # host h gets ~ base / (1 + h)**0.5 pages (min 3)
    hot_host_pages: int  # extra pages on host 0 (the hot host)
    num_seeds: int
    seed: int = 42


TIERS = {
    # unit + smoke (FIXTURES.md: ~500 pages / 20 hosts)
    "tiny": CorpusSpec("tiny", num_hosts=20, pages_per_host_base=40, hot_host_pages=60, num_seeds=8),
    # conformance (~5k pages / 100 hosts)
    "small": CorpusSpec("small", num_hosts=100, pages_per_host_base=80, hot_host_pages=400, num_seeds=25),
    # skew/scaling bench (~200k pages / 2000 hosts, hot host ~20%)
    "bench": CorpusSpec("bench", num_hosts=2000, pages_per_host_base=1800, hot_host_pages=40000, num_seeds=2000),
    # scaling-run corpus (~590k pages): 3× the per-round work so the
    # per-round fixed pipeline-launch cost is amortized the way a real
    # cluster's multi-minute rounds amortize it (BASELINE.md protocol)
    "benchx3": CorpusSpec("benchx3", num_hosts=2000, pages_per_host_base=5400, hot_host_pages=120000, num_seeds=2000),
    # 10× scale-proof corpus (~2.05M pages / 8000 hosts, hot host ~10%):
    # the r3-verdict empirical check that no hidden driver-side
    # materialization survives past sf0.1 (scripts/scale_proof.py)
    "sf1": CorpusSpec("sf1", num_hosts=8000, pages_per_host_base=10500, hot_host_pages=200000, num_seeds=8000),
}

NUM_HOST_BUCKETS = 64  # corpus partition count (hash(host) % 64)


def _host_page_counts(spec: CorpusSpec) -> np.ndarray:
    h = np.arange(spec.num_hosts, dtype=np.float64)
    counts = np.maximum(3, (spec.pages_per_host_base / np.sqrt(1.0 + h)).astype(np.int64))
    counts[0] += spec.hot_host_pages
    return counts


def _page_html(rng: np.random.RandomState, host: str, page_id: int, links: list[str]) -> str:
    w = lambda n: " ".join(_WORDS[i] for i in rng.randint(0, len(_WORDS), n))
    paras = []
    for _ in range(int(rng.randint(2, 6))):
        paras.append(f"<p>{w(int(rng.randint(8, 30)))}</p>")
    bullets = "".join(f"<li>{w(int(rng.randint(2, 6)))}</li>" for _ in range(int(rng.randint(0, 4))))
    link_html = " ".join(
        f'<a href="{u}">{w(2)} link {i}</a>' for i, u in enumerate(links)
    )
    return (
        "<!DOCTYPE html><html><head><title>ignored</title>"
        "<script>var x = 'dropped';</script><style>.a{color:red}</style></head>"
        "<body>"
        f"<nav><a href='/'>home</a> <a href='/about'>about</a></nav>"
        f"<header>site header boilerplate</header>"
        f"<h1>{host} page {page_id} overview report</h1>"
        f"<div>promo box</div>"  # < 5 words → pruned
        f"<section>{paras[0]}"
        f"<h2>details section {page_id}</h2>"
        f"{''.join(paras[1:])}"
        f"<ul>{bullets}</ul>"
        f"<p>related pages and outbound references follow here {link_html}</p>"
        "</section>"
        "<aside>sidebar junk dropped</aside>"
        f"<footer>copyright {host} footer boilerplate text</footer>"
        "</body></html>"
    )


#: files per bucket are split into ≤ this many rows per part so no single
#: file (e.g. the hot host's bucket) becomes a straggler read task
ROWS_PER_FILE = 4096


def _gen_host_range(tier: str, chunk: int, h0: int, h1: int, pages_dir: str) -> int:
    """Generate hosts [h0, h1) of ``tier`` and write their per-bucket
    parquet parts; returns rows written.  Deterministic and
    range-independent: per-host RNG streams are keyed by host index, the
    per-host language and timestamp base are recomputed from the spec —
    so any partition of [0, num_hosts) into ranges yields the same row
    set as the single-range call (pinned by
    tests/test_crawl_fixtures.py::test_parallel_generation_row_identical).
    """
    import pyarrow.compute as pc

    spec = TIERS[tier]
    counts = _host_page_counts(spec)
    hosts = [f"host-{h}.example" for h in range(spec.num_hosts)]
    rng = np.random.RandomState(spec.seed)
    lang_of_host = [(_LANGS[int(x)]) for x in rng.randint(0, len(_LANGS), spec.num_hosts)]
    # global row index of each host's first page (host-major row order)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    base_ts = np.int64(1_700_000_000_000_000)  # fixed epoch µs

    urls: list[str] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    host_col: list[str] = []
    ts: list[int] = []

    # page url: https://host-{h}.example/p/{i}
    for h in range(h0, h1):
        host = hosts[h]
        n = int(counts[h])
        prng = np.random.RandomState(spec.seed * 1_000_003 + h)
        for i in range(n):
            links = []
            # intra-host links: deterministic fanout
            for j in range(int(prng.randint(2, 6))):
                tgt = (i * 7 + j * 13 + 1) % n
                if tgt != i:
                    links.append(f"/p/{tgt}")
            # cross-host links: ~30% of pages link to other hosts
            if prng.rand() < 0.3:
                oh = int(prng.randint(0, spec.num_hosts))
                oi = int(prng.randint(0, counts[oh]))
                links.append(f"https://{hosts[oh]}/p/{oi}")
            # occasional dead link (fetch-miss handling)
            if prng.rand() < 0.05:
                links.append(f"/p/{n + int(prng.randint(0, 5))}")
            html = _page_html(prng, host, i, links)
            urls.append(f"https://{host}/p/{i}")
            htmls.append(html.encode("utf-8"))
            texts.append(extract_text(html))  # the oracle column
            langs.append(lang_of_host[h])
            host_col.append(host)
            ts.append(int(base_ts) + (int(offsets[h]) + i) * 1_000_000)

    buckets = host_buckets(np.asarray(host_col, dtype=object), NUM_HOST_BUCKETS)
    tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.asarray(ts, dtype=np.int64), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "host_bucket": pa.array(buckets, pa.int32()),
        },
        schema=PAGES_SCHEMA,
    )
    for b in np.unique(buckets):
        sub = tbl.filter(pc.equal(tbl["host_bucket"], int(b)))
        for part, off in enumerate(range(0, sub.num_rows, ROWS_PER_FILE)):
            pq.write_table(
                sub.slice(off, ROWS_PER_FILE),
                os.path.join(pages_dir, f"bucket={int(b):03d}-c{chunk:04d}-p{part:03d}.parquet"),
                compression="zstd",  # reference stores markdown zstd-3 (storage.py:101)
            )
    return tbl.num_rows


def _host_chunks(counts: np.ndarray, target_chunks: int) -> list[tuple[int, int]]:
    """Partition [0, num_hosts) into ranges of ≈equal PAGE totals (the
    hot host 0 dominates, so equal-host ranges would straggle)."""
    total = int(counts.sum())
    per = max(1, total // max(1, target_chunks))
    ranges: list[tuple[int, int]] = []
    acc, start = 0, 0
    for h, c in enumerate(counts):
        acc += int(c)
        if acc >= per:
            ranges.append((start, h + 1))
            start, acc = h + 1, 0
    if start < len(counts):
        ranges.append((start, len(counts)))
    return ranges


def generate(
    out_dir: str, tier: str = "tiny", force: bool = False, parallel: int | None = None
) -> str:
    """Write pages/, seeds.parquet, robots.parquet under out_dir; returns out_dir.

    Idempotent: skips generation when the done-marker exists (unless
    ``force``).  Pages are written one parquet file per host_bucket so
    fetch actors can prune reads to a single bucket file.

    ``parallel``: worker processes for page generation (host-range
    chunked; row-identical to the serial path — see _gen_host_range).
    Default: serial for ≲200k-page tiers, cpu-count workers above, so
    the 2M-page sf1 tier generates in minutes with flat per-worker
    memory instead of one driver-side multi-GB row build.
    """
    spec = TIERS[tier]
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker) and not force:
        return out_dir
    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    for f in os.listdir(pages_dir):  # force=True: no stale parts
        os.unlink(os.path.join(pages_dir, f))

    counts = _host_page_counts(spec)
    hosts = [f"host-{h}.example" for h in range(spec.num_hosts)]
    total = int(counts.sum())

    if parallel is None:
        parallel = 1 if total <= 250_000 else min(32, os.cpu_count() or 1)
    if parallel <= 1:
        _gen_host_range(tier, 0, 0, spec.num_hosts, pages_dir)
    else:
        from multiprocessing import get_context

        ranges = _host_chunks(counts, target_chunks=parallel * 4)
        jobs = [(tier, c, h0, h1, pages_dir) for c, (h0, h1) in enumerate(ranges)]
        with get_context("spawn").Pool(parallel) as pool:
            pool.starmap(_gen_host_range, jobs)

    # seeds: first page of the first num_seeds hosts + 2 dead URLs
    seed_urls = [f"https://{hosts[h % spec.num_hosts]}/p/0" for h in range(spec.num_seeds)]
    seed_urls += [f"https://missing-{k}.example/p/0" for k in range(2)]
    seeds = pa.table(
        {
            "url": pa.array(seed_urls, pa.string()),
            "priority": pa.array([0] * len(seed_urls), pa.int32()),
        },
        schema=SEEDS_SCHEMA,
    )
    pq.write_table(seeds, os.path.join(out_dir, "seeds.parquet"))

    # robots: every 7th host disallows /p/1 and /p/2 prefixes; delays vary
    rrng = np.random.RandomState(spec.seed + 7)
    r_hosts, r_dis, r_delay = [], [], []
    for h, host in enumerate(hosts):
        r_hosts.append(host)
        r_dis.append(["/p/1", "/p/2"] if h % 7 == 3 else [])
        r_delay.append(int(rrng.choice([250, 500, 1000, 2000])))
    robots = pa.table(
        {
            "host": pa.array(r_hosts, pa.string()),
            "disallow": pa.array(r_dis, pa.list_(pa.string())),
            "crawl_delay_ms": pa.array(r_delay, pa.int64()),
        },
        schema=ROBOTS_SCHEMA,
    )
    pq.write_table(robots, os.path.join(out_dir, "robots.parquet"))

    with open(marker, "w") as f:
        f.write(f"{tier} total_pages={total}\n")
    return out_dir


def default_dir(tier: str) -> str:
    return os.path.join("/tmp/dc4r_corpus", tier)


def ensure(tier: str) -> str:
    """Generate-once cache of a corpus tier under /tmp."""
    return generate(default_dir(tier), tier)
