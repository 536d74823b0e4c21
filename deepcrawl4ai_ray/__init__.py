"""deepcrawl4ai_ray — a Ray-Data-native data-processing / crawl engine.

From-scratch reimplementation of the capabilities of the reference
(deepscrape/deepcrawl4ai, surveyed in SURVEY.md) on idiomatic Ray Data:
``ray.data.Dataset`` pipelines, zero-copy Arrow ``map_batches`` stages,
actor pools for stateful stages (fetch, frontier shards), explicit
partitioning for the wide steps.

Layout:
  functions/  pure, deterministic per-value functions (url, extract, text)
  state/      serializable state structures (bloom, cuckoo, token bucket)
  stages/     map_batches stage functions / actor classes
  sources/    corpus generator + parquet read helpers
  frontier/   sharded URL-seen frontier actors + crawl driver
  pipelines/  end-user pipelines (generic queries over parquet tables)

Nothing in this package calls ``ray.init`` / ``ray.shutdown`` — sessions
are owned by the driver, ``bench.py``, or the test fixture.
"""

__version__ = "0.1.0"
