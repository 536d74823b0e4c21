"""Frozen-fixture replay (FIXTURES.md §4): the tiny-corpus crawl must
reproduce the committed crawl order, seen set, and extracted-text bytes
exactly.  Regenerate fixtures intentionally with
``python scripts/gen_fixtures.py`` after spec changes."""

import hashlib
import json
import os

import pandas as pd
import pytest

FIXTURE_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "tiny_crawl.json")


@pytest.fixture(scope="module")
def fixture():
    with open(FIXTURE_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def replay(ray_session, tiny_corpus, fixture):
    import shutil

    from deepcrawl4ai_ray.frontier.crawler import Crawler, CrawlConfig, read_crawl_output

    out_dir = "/tmp/dc4r_test/fixture_replay"
    shutil.rmtree(out_dir, ignore_errors=True)
    c = Crawler(tiny_corpus, out_dir, CrawlConfig(**fixture["config"], checkpoint=False))
    c.run()
    c.kill_shards()
    return read_crawl_output(out_dir)


def test_crawl_order_frozen(replay, fixture):
    urls = replay.column("url").to_pylist()
    assert urls[:50] == fixture["order_first_50"]
    assert hashlib.md5("\n".join(urls).encode()).hexdigest() == fixture["order_md5"]
    assert replay.column("round").to_pylist()[:50] == fixture["rounds_first_50"]


def test_seen_set_frozen(replay, fixture):
    urls = sorted(replay.column("url").to_pylist())
    assert len(urls) == fixture["n_fetched"]
    assert hashlib.md5("\n".join(urls).encode()).hexdigest() == fixture["seen_set_md5"]


def test_extracted_text_frozen(replay, fixture):
    texts = replay.column("text").to_pylist()
    assert hashlib.md5("\n".join(texts).encode()).hexdigest() == fixture["texts_md5"]


def test_status_counts_frozen(replay, fixture):
    status = replay.column("status").to_pylist()
    got = {s: status.count(s) for s in sorted(set(status))}
    assert got == fixture["status_counts"]


def test_parallel_generation_row_identical(tmp_path):
    """The chunked multi-process corpus generator must produce the exact
    row set of the serial path (per-host RNG streams are range-
    independent) — the invariant the sf1 scale-proof corpus rests on."""
    import pyarrow.parquet as pq

    from deepcrawl4ai_ray.sources.corpus import generate

    a = generate(str(tmp_path / "serial"), "tiny", force=True, parallel=1)
    b = generate(str(tmp_path / "par"), "tiny", force=True, parallel=4)

    def rows(d):
        t = pq.read_table(f"{d}/pages")
        return (
            t.to_pandas()
            .sort_values("url", kind="mergesort")
            .reset_index(drop=True)
        )

    ra, rb = rows(a), rows(b)
    assert len(ra) == len(rb) and len(ra) > 0
    pd.testing.assert_frame_equal(ra, rb)
