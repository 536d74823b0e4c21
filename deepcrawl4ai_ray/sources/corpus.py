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


def generate(out_dir: str, tier: str = "tiny", force: bool = False) -> str:
    """Write pages/, seeds.parquet, robots.parquet under out_dir; returns out_dir.

    Idempotent: skips generation when the done-marker exists (unless
    ``force``).  Pages are written one parquet file per host_bucket so
    fetch actors can prune reads to a single bucket file.
    """
    spec = TIERS[tier]
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker) and not force:
        return out_dir
    os.makedirs(os.path.join(out_dir, "pages"), exist_ok=True)

    counts = _host_page_counts(spec)
    hosts = [f"host-{h}.example" for h in range(spec.num_hosts)]
    total = int(counts.sum())

    urls: list[str] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    host_col: list[str] = []
    rng = np.random.RandomState(spec.seed)
    lang_of_host = [(_LANGS[int(x)]) for x in rng.randint(0, len(_LANGS), spec.num_hosts)]

    # page url: https://host-{h}.example/p/{i}
    for h, host in enumerate(hosts):
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

    base_ts = np.int64(1_700_000_000_000_000)  # fixed epoch µs
    ts = base_ts + np.arange(total, dtype=np.int64) * 1_000_000
    buckets = host_buckets(np.asarray(host_col, dtype=object), NUM_HOST_BUCKETS)

    tbl = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "host_bucket": pa.array(buckets, pa.int32()),
        },
        schema=PAGES_SCHEMA,
    )
    # files per bucket, split into ≤ ROWS_PER_FILE-row parts so no single
    # file (e.g. the hot host's bucket) becomes a straggler read task
    import pyarrow.compute as pc

    ROWS_PER_FILE = 4096
    for b in range(NUM_HOST_BUCKETS):
        sub = tbl.filter(pc.equal(tbl["host_bucket"], b))
        for part, off in enumerate(range(0, sub.num_rows, ROWS_PER_FILE)):
            pq.write_table(
                sub.slice(off, ROWS_PER_FILE),
                os.path.join(out_dir, "pages", f"bucket={b:03d}-p{part:03d}.parquet"),
                compression="zstd",  # reference stores markdown zstd-3 (storage.py:101)
            )

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
