"""Localhost HTTP transport: the PageStore seam driven by a REAL socket
transport (stdlib http.server gateway serving the tiny corpus), proving
the HttpPageStore contract end to end without network access — the
reference's live-fetch path (crawler_pool.py:25-49, tasks.py:361-368)
re-expressed as a gateway the fetch stage talks to over HTTP/1.1
keep-alive connections.

Byte-identity criterion (VERDICT r2 #5): a crawl whose fetch stage goes
through localhost HTTP must produce output identical to the corpus-mode
crawl — same pages, same extracted text, same timestamps, same order.
"""

import glob
import os
import threading

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _make_gateway(tiny_corpus, protocol_version):
    """Shared gateway factory: GET /fetch?url=<quoted> → 200 + html body
    + X-Warc-Ts / X-Lang headers, 404 for unknown urls.  One contract,
    two protocol modes: HTTP/1.1 keep-alive vs HTTP/1.0 close-per-response
    (the reconnect-path stressor)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlsplit

    pages = pa.concat_tables(
        pq.read_table(f) for f in glob.glob(os.path.join(tiny_corpus, "pages", "*.parquet"))
    )
    lut = {}
    ts_us = pages["warc_ts"].cast(pa.int64()).to_pylist()  # timestamp[us] → epoch us
    for u, h, t, l in zip(
        pages["url"].to_pylist(), pages["html"].to_pylist(), ts_us, pages["lang"].to_pylist()
    ):
        lut[u] = (h, t, l)

    proto = protocol_version

    class Handler(BaseHTTPRequestHandler):
        protocol_version = proto

        def do_GET(self):  # noqa: N802 (stdlib API)
            q = parse_qs(urlsplit(self.path).query)
            url = q.get("url", [None])[0]
            hit = lut.get(url)
            if hit is None:
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            html, ts, lang = hit
            self.send_response(200)
            self.send_header("Content-Length", str(len(html)))
            self.send_header("X-Warc-Ts", str(ts))
            if lang:
                self.send_header("X-Lang", lang)
            self.end_headers()
            self.wfile.write(html)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


@pytest.fixture(scope="module")
def page_gateway(tiny_corpus):
    """HTTP/1.1 keep-alive gateway: the client reuses sockets."""
    srv, base = _make_gateway(tiny_corpus, "HTTP/1.1")
    yield base
    srv.shutdown()


class TestHttpPageStore:
    def test_fetch_actor_http_equals_corpus(self, ray_session, tiny_corpus, page_gateway):
        """FetchActor over the HTTP transport returns byte-identical
        output to the corpus store (including a planted miss)."""
        import numpy as np

        from deepcrawl4ai_ray.functions.urlnorm import host_buckets, hosts_of
        from deepcrawl4ai_ray.sources.corpus import NUM_HOST_BUCKETS
        from deepcrawl4ai_ray.stages.fetch import FetchActor, HttpPageStore

        pages = pa.concat_tables(
            pq.read_table(f, columns=["url"])
            for f in glob.glob(os.path.join(tiny_corpus, "pages", "*.parquet"))
        )
        urls = pages["url"].to_pylist()[:50] + ["https://host-000.example/nonexistent-page"]
        arr = np.asarray(urls, dtype=object)
        hosts = hosts_of(arr)
        hb = host_buckets(hosts, NUM_HOST_BUCKETS)
        batch = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": pa.array(list(hosts), pa.string()),
                "round": pa.array(np.zeros(len(urls), dtype=np.int32)),
                "host_bucket": pa.array(hb),
            }
        )
        corpus_out = FetchActor(tiny_corpus)(batch)
        http_out = FetchActor(tiny_corpus, page_store=HttpPageStore(page_gateway))(batch)
        assert corpus_out.equals(http_out)
        assert "miss" in http_out["status"].to_pylist()  # the planted 404

def test_crawl_http_vs_corpus(ray_session, tiny_corpus, page_gateway, tmp_path):
    """Full crawl loop over localhost HTTP == corpus-mode crawl,
    byte-identically (pages, text, warc_ts, fetch order)."""
    from deepcrawl4ai_ray.frontier.crawler import CrawlConfig, Crawler, read_crawl_output

    def run(out_dir, extra):
        cfg = CrawlConfig(
            num_shards=2,
            per_shard_budget=200,
            max_rounds=4,
            checkpoint=False,
            corpus_in_object_store=False,
            extra=dict(extra),
        )
        c = Crawler(tiny_corpus, str(out_dir), cfg)
        c.run()
        c.kill_shards()
        return read_crawl_output(str(out_dir))

    corpus_tbl = run(tmp_path / "corpus_mode", {})
    http_tbl = run(tmp_path / "http_mode", {"page_store": ("http", page_gateway)})
    assert corpus_tbl.num_rows > 0
    assert corpus_tbl.equals(http_tbl)


@pytest.fixture(scope="module")
def close_every_response_gateway(tiny_corpus):
    """Gateway that CLOSES the connection after every response (HTTP/1.0,
    no keep-alive) — exercises HttpPageStore's reconnect path."""
    srv, base = _make_gateway(tiny_corpus, "HTTP/1.0")
    yield base
    srv.shutdown()


def test_http_store_survives_connection_close_per_request(
    ray_session, tiny_corpus, close_every_response_gateway
):
    """A server that drops the connection after every response (no
    keep-alive) must still yield byte-identical fetches — the client
    reconnects transparently instead of reporting misses."""
    import numpy as np

    from deepcrawl4ai_ray.functions.urlnorm import host_buckets, hosts_of
    from deepcrawl4ai_ray.sources.corpus import NUM_HOST_BUCKETS
    from deepcrawl4ai_ray.stages.fetch import FetchActor, HttpPageStore

    pages = pa.concat_tables(
        pq.read_table(f, columns=["url"])
        for f in glob.glob(os.path.join(tiny_corpus, "pages", "*.parquet"))
    )
    urls = pages["url"].to_pylist()[:60]
    arr = np.asarray(urls, dtype=object)
    hosts = hosts_of(arr)
    batch = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(list(hosts), pa.string()),
            "round": pa.array(np.zeros(len(urls), dtype=np.int32)),
            "host_bucket": pa.array(host_buckets(hosts, NUM_HOST_BUCKETS)),
        }
    )
    corpus_out = FetchActor(tiny_corpus)(batch)
    http_out = FetchActor(
        tiny_corpus, page_store=HttpPageStore(close_every_response_gateway)
    )(batch)
    assert corpus_out.equals(http_out)
    assert set(http_out["status"].to_pylist()) == {"ok"}
