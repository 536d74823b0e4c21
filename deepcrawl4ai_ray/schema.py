"""Arrow schemas for the crawl engine's tables.

The page table is exactly the ``input_hint`` shape from BASELINE.json:
(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string).  The reference has no columnar schema at all (SURVEY.md
§1.2 — row-oriented dicts); these schemas are the Ray-Data-native
re-expression of its page-result dict (reference: tasks.py:381-383
``{url, dump}`` projection and api.py:290-298 ``{url, markdown}``).
"""

from __future__ import annotations

import pyarrow as pa

# The synthetic web corpus ("the web" the fetch stage reads).
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        # partition key: hash(host) % num_buckets — kept in the file so
        # fetch actors can prune reads to one bucket.
        ("host_bucket", pa.int32()),
    ]
)

# Crawl entry points (FIXTURES.md §2).
SEEDS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("priority", pa.int32()),
    ]
)

# Per-host politeness policy (FIXTURES.md §3); analog of the reference's
# RateLimiter base_delay (actions.py:255, config.yml:71).
ROBOTS_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("disallow", pa.list_(pa.string())),
        ("crawl_delay_ms", pa.int64()),
    ]
)

# Output of one crawl: fetched + extracted pages, in deterministic
# crawl order (fetch_seq).  Replaces the reference's Redis-hash result
# sink (tasks.py:296-303) and stream sink (utils.py:305-380).
CRAWL_OUT_SCHEMA = pa.schema(
    [
        ("fetch_seq", pa.int64()),
        ("round", pa.int32()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("priority", pa.int32()),
        ("retries", pa.int32()),  # attempt number this row was fetched at
        ("status", pa.string()),  # ok | miss | robots_denied
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("n_links", pa.int32()),
    ]
)

# Per-round / per-shard lineage + metrics manifest (SURVEY.md §4
# checkpoint design; replaces monitor.py metrics hashes).
MANIFEST_SCHEMA = pa.schema(
    [
        ("round", pa.int32()),
        ("shard", pa.int32()),
        ("offered", pa.int64()),
        ("inserts", pa.int64()),
        ("dupes_skipped", pa.int64()),
        ("overflow_dropped", pa.int64()),
        ("fetched", pa.int64()),
        ("frontier_size", pa.int64()),
        ("peak_rss_mb", pa.int64()),
    ]
)
