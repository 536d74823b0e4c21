"""FetchActor — the stateful map_batches fetch stage.

Ray-Data-native replacement for the reference's browser pool + per-URL
``crawler.arun`` dispatch (crawler_pool.py:14-74, triggers.py:240-284,
tasks.py:361-368): a callable CLASS passed to ``map_batches(...,
concurrency=N)`` so per-actor state — robots cache, politeness buckets,
page-store handles — is built ONCE in ``__init__`` and reused across
batches (T1-T3, T8 in SURVEY.md §2.3).

In this sandbox "the web" is the corpus Parquet table; fetch is a keyed
lookup into the per-host-bucket page files.  Each actor lazily loads
only the bucket files its batches reference (column-pruned to
url/html/warc_ts/lang) and caches them — the ready set is partitioned
by host_bucket upstream, so a bucket file is read by few actors.  At
100 TB scale the in-memory dict becomes a row-group index + LRU over
memory-mapped Parquet; the actor signature and batch flow are unchanged.

Politeness accounting: the frontier already rate-limits selections per
round (shard-side token buckets on the virtual clock); the actor keeps
its own per-host buckets purely as *metrics* (would-have-waited ms), so
no wall-clock sleeping happens and runs stay deterministic.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..state.robots import DEFAULT_DELAY_MS, RobotsCache
from ..state.tokenbucket import TokenBucket


class FetchActor:
    def __init__(self, corpus_dir: str, max_cached_buckets: int = 64):
        self.pages_dir = os.path.join(corpus_dir, "pages")
        self.max_cached_buckets = max_cached_buckets
        robots_path = os.path.join(corpus_dir, "robots.parquet")
        if os.path.exists(robots_path):
            self.robots = RobotsCache.from_arrow(pq.read_table(robots_path))
        else:
            self.robots = RobotsCache({})
        # bucket -> {url: (html, warc_ts_us, lang)}
        self._bucket_cache: Dict[int, Dict[str, tuple]] = {}
        self._buckets_lru: list[int] = []
        self._politeness_wait_ms = 0.0
        self._buckets_tb: Dict[str, TokenBucket] = {}

    def _load_bucket(self, bucket: int) -> Dict[str, tuple]:
        store = self._bucket_cache.get(bucket)
        if store is not None:
            return store
        path = os.path.join(self.pages_dir, f"bucket={bucket:03d}.parquet")
        store = {}
        if os.path.exists(path):
            t = pq.read_table(path, columns=["url", "html", "warc_ts", "lang"])
            urls = t.column("url").to_pylist()
            htmls = t.column("html").to_pylist()
            ts = t.column("warc_ts").cast(pa.int64()).to_pylist()
            langs = t.column("lang").to_pylist()
            store = {u: (h, s, l) for u, h, s, l in zip(urls, htmls, ts, langs)}
        if len(self._buckets_lru) >= self.max_cached_buckets:
            evict = self._buckets_lru.pop(0)
            self._bucket_cache.pop(evict, None)
        self._bucket_cache[bucket] = store
        self._buckets_lru.append(bucket)
        return store

    def _politeness_tick(self, host: str, round_ms_now: int) -> None:
        tb = self._buckets_tb.get(host)
        if tb is None:
            delay = self.robots.get(host).crawl_delay_ms or DEFAULT_DELAY_MS
            tb = TokenBucket(max(1.0, 10_000 / delay), 1.0 / delay, round_ms_now)
            self._buckets_tb[host] = tb
        if not tb.try_take(round_ms_now):
            self._politeness_wait_ms += self.robots.get(host).crawl_delay_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        buckets = batch.column("host_bucket").to_pylist()
        rounds = batch.column("round").to_pylist()
        n = len(urls)
        htmls: list[Optional[bytes]] = [None] * n
        ts = np.zeros(n, dtype=np.int64)
        langs: list[str] = [""] * n
        status: list[str] = ["miss"] * n
        for i in range(n):
            host = hosts[i]
            self._politeness_tick(host, rounds[i] * 10_000)
            policy = self.robots.get(host)
            if not policy.allows(urls[i]):
                status[i] = "robots_denied"  # fetched-over-robots is a bug
                continue
            row = self._load_bucket(buckets[i]).get(urls[i])
            if row is not None:
                htmls[i], ts[i], langs[i] = row
                status[i] = "ok"
        return batch.drop_columns(["host_bucket"]).append_column(
            "html", pa.array(htmls, pa.binary())
        ).append_column(
            "warc_ts", pa.array(ts, pa.int64()).cast(pa.timestamp("us"))
        ).append_column(
            "lang", pa.array(langs, pa.string())
        ).append_column(
            "status", pa.array(status, pa.string())
        )
