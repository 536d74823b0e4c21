"""Unit tests: pure functions (no Ray)."""

import numpy as np
import pytest

from deepcrawl4ai_ray.functions.extract import extract_links, extract_text
from deepcrawl4ai_ray.functions.hashing import (
    char_jaccard,
    hamming64,
    jaccard,
    lsh_band_keys,
    md5_hex,
    minhash_signature_fast,
    rolling_fingerprint,
    shingles,
    simhash64,
)
from deepcrawl4ai_ray.functions.textstats import lang_id, quality_metrics, ws_token_counts
from deepcrawl4ai_ray.functions.urlnorm import (
    hash64,
    host_buckets,
    host_of,
    hosts_of,
    normalize_url,
    url_to_slug,
)

HTML = (
    "<html><head><script>var x=1;</script><style>.a{}</style></head><body>"
    "<nav><a href='/x'>nav link</a></nav>"
    "<h1>Big Title</h1>"
    "<div>tiny promo</div>"
    "<p>alpha beta gamma delta epsilon zeta</p>"
    "<ul><li>first item</li><li>second item</li></ul>"
    "<p>outbound text with <a href='/p/7'>an inline anchor word link</a> trailing words</p>"
    "<aside>side</aside><footer>foot text</footer></body></html>"
)


class TestExtract:
    def test_pruning_and_structure(self):
        text = extract_text(HTML)
        blocks = text.split("\n\n")
        assert blocks[0] == "# Big Title"  # heading kept, short or not
        assert "tiny promo" not in text  # < 5 words pruned
        assert "nav link" not in text  # nav dropped
        assert "foot text" not in text  # footer dropped
        assert "var x=1" not in text  # script dropped
        assert "- first item" in blocks and "- second item" in blocks
        assert "alpha beta gamma delta epsilon zeta" in blocks

    def test_bytes_and_str_agree(self):
        assert extract_text(HTML.encode()) == extract_text(HTML)

    def test_deterministic(self):
        assert extract_text(HTML) == extract_text(HTML)

    def test_links_resolved_and_deduped(self):
        html = (
            "<a href='/p/1'>a</a><a href='https://other.example/q'>b</a>"
            "<a href='/p/1'>dup</a><a href='mailto:x@y'>m</a><a href='#frag'>f</a>"
        )
        links = extract_links(html, "https://h.example/p/0")
        assert links == [
            "https://h.example/p/1",
            "https://other.example/q",
            "https://h.example/p/0",  # '#frag' → fragment dropped → self
        ]
        internal = extract_links(html, "https://h.example/p/0", exclude_external=True)
        assert "https://other.example/q" not in internal


class TestUrlNorm:
    def test_scheme_prefix(self):
        assert normalize_url("h.example/p") == "https://h.example/p"

    def test_fragment_and_root_slash(self):
        assert normalize_url("https://h.example/#top") == "https://h.example"
        assert normalize_url("HTTPS://h.example/a") == "https://h.example/a"

    def test_percent_decode(self):
        assert normalize_url("https://h.example/a%20b") == "https://h.example/a b"

    def test_slug(self):
        assert url_to_slug("https://host-1.example/p/3") == "host-1-example-p-3"

    def test_hash64_deterministic(self):
        a = hash64(["x", "y"])
        b = hash64(["x", "y"])
        assert (a == b).all() and a.dtype == np.uint64 and a[0] != a[1]

    def test_hosts_and_buckets(self):
        hs = hosts_of(np.asarray(["https://a.x/p/1", "http://b.y", "noscheme/p"], dtype=object))
        assert list(hs[:2]) == ["a.x", "b.y"]
        bk = host_buckets(hs, 8)
        assert ((bk >= 0) & (bk < 8)).all()
        assert host_of("https://a.x/p/1") == "a.x"


class TestHashing:
    def test_md5_matches_duckdb(self):
        import duckdb

        val = duckdb.sql("select md5('hello world')").fetchone()[0]
        assert md5_hex("hello world") == val

    def test_canonical_url_key(self):
        import pyarrow as pa

        from deepcrawl4ai_ray.functions.urlnorm import canonical_url_key

        urls = pa.array(
            [
                "https://Host.Example/Page",
                "http://www.host.example/page?utm_source=x&b=2",
                "https://host.example/page/",
                "https://host.example/page",
                "https://www-site.example/p",  # 'www-' is not a 'www.' prefix
            ]
        )
        got = canonical_url_key(urls).to_pylist()
        assert got[0] == got[1] == got[2] == got[3] == "host.example/page"
        assert got[4] == "www-site.example/p"

    def test_md5_int63_matches_duckdb(self):
        import duckdb

        from deepcrawl4ai_ray.functions.hashing import md5_int63

        strs = ["example.com", "host-0.example", "", "ünïcode.example"]
        got = md5_int63(strs)
        for s, g in zip(strs, got):
            want = duckdb.sql(
                "select CAST(md5_number_lower(?) & 9223372036854775807 AS BIGINT)",
                params=[s],
            ).fetchone()[0]
            assert int(g) == want, s
        assert (got >= 0).all()

    def test_char_jaccard_matches_duckdb(self):
        import duckdb

        for a, b in [("abc", "abd"), ("same", "same"), ("xy", "ab")]:
            val = duckdb.sql(f"select jaccard('{a}','{b}')").fetchone()[0]
            assert char_jaccard(a, b) == pytest.approx(val)

    def test_minhash_similarity_tracks_jaccard(self):
        t1 = "the quick brown fox jumps over the lazy dog again and again today"
        t2 = "the quick brown fox jumps over the lazy cat again and again today"
        s1, s2 = shingles(t1), shingles(t2)
        j = jaccard(s1, s2)
        m1 = minhash_signature_fast(s1, 128)
        m2 = minhash_signature_fast(s2, 128)
        est = (m1 == m2).mean()
        assert abs(est - j) < 0.25
        assert len(lsh_band_keys(m1, 16)) == 16

    def test_simhash_near_dup(self):
        a = simhash64("one two three four five six seven eight nine ten")
        b = simhash64("one two three four five six seven eight nine eleven")
        c = simhash64("completely different words about other topics entirely here")
        assert hamming64(a, b) < hamming64(a, c)

    def test_simhash_minhash_frozen_spec(self):
        """Frozen-fixture hashes: the signature SPEC is part of the
        engine's contract (signatures persist in sinks and must be
        comparable across runs/versions).  Regenerate these constants
        ONLY on an intentional hash-family change."""
        import hashlib

        texts = [
            "the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "",
            "one",
            "Sphinx of black quartz judge my vow",
        ]
        assert [simhash64(t) for t in texts] == [
            16752526971192447336,
            7406011269483192384,
            0,
            10602548211567132629,
            8151218429091431610,
        ]
        sigs = [minhash_signature_fast(shingles(t), 16).tolist() for t in texts]
        assert hashlib.md5(repr(sigs).encode()).hexdigest() == "ca93cde4487dd17a599b0f358f734a7d"

    def test_fingerprint_deterministic(self):
        t = "some document text for fingerprinting purposes with enough length"
        assert rolling_fingerprint(t) == rolling_fingerprint(t)
        assert rolling_fingerprint(t) != rolling_fingerprint(t + " changed tail windows")


class TestTextStats:
    def test_ws_token_counts(self):
        import pyarrow as pa

        arr = pa.array(["a b c", "single", "x y"])
        assert ws_token_counts(arr).to_pylist() == [3, 1, 2]

    def test_quality(self):
        m = quality_metrics("the cat sat on the mat")
        assert m["n_tokens"] == 6
        assert 0 < m["stopword_ratio"] <= 1

    def test_lang_id(self):
        assert lang_id("") == "und"
        assert lang_id("the weather is nice and the children are in the garden") == "en"


class TestPageMetadata:
    def test_crafted_html(self):
        import pyarrow as pa

        from deepcrawl4ai_ray.functions.extract import page_metadata_columns

        html = (
            b"<html><head><title>My Page</title></head><body>"
            b"<h1 class='x'>Main Head</h1><h2>sub</h2>"
            b"<p>one</p><p>two</p><a href='/u'>l</a><a\nhref='/v'>m</a>"
            b"<img src='a.png'></body></html>"
        )
        cols = page_metadata_columns(pa.array([html, b"<html><body>bare</body></html>"]))
        assert cols["title"].to_pylist() == ["My Page", ""]
        assert cols["h1"].to_pylist() == ["Main Head", ""]
        assert cols["n_headings"].to_pylist() == [2, 0]
        assert cols["n_links"].to_pylist() == [2, 0]
        assert cols["n_paragraphs"].to_pylist() == [2, 0]
        assert cols["n_images"].to_pylist() == [1, 0]

    def test_empty_input_schema(self):
        import pyarrow as pa

        from deepcrawl4ai_ray.functions.extract import page_metadata_columns

        cols = page_metadata_columns(pa.array([], pa.binary()))
        assert set(cols) == {"title", "h1", "n_headings", "n_links", "n_paragraphs", "n_images"}
        for v in cols.values():
            assert len(v) == 0
