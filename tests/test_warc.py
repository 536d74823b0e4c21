"""WARC/WET source tests: spec-conformant writer → from-scratch parser
→ Ray datasource round-trips, plus malformed-input behavior."""

import gzip

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _mk(n=23):
    urls = [f"https://h{i % 5}.example/p/{i}" for i in range(n)]
    texts = [f"doc {i} body with ünïcode ✓ and\nnewlines {'x' * (i * 7 % 50)}" for i in range(n)]
    return urls, texts


class TestParser:
    def test_roundtrip_multi_member(self, tmp_path):
        from deepcrawl4ai_ray.sources.warc import open_warc_stream, parse_warc_records, write_wet_file

        urls, texts = _mk()
        p = write_wet_file(str(tmp_path / "a.warc.wet.gz"), urls, texts)
        with open(p, "rb") as f:
            recs = list(parse_warc_records(open_warc_stream(f)))
        assert recs[0]["headers"]["warc-type"] == "warcinfo"
        conv = [r for r in recs if r["headers"]["warc-type"] == "conversion"]
        assert [r["headers"]["warc-target-uri"] for r in conv] == urls
        assert [r["payload"].decode("utf-8") for r in conv] == texts

    def test_single_member_equals_multi_member(self, tmp_path):
        from deepcrawl4ai_ray.sources.warc import open_warc_stream, parse_warc_records, write_wet_file

        urls, texts = _mk(9)
        pm = write_wet_file(str(tmp_path / "m.gz"), urls, texts, member_per_record=True)
        ps = write_wet_file(str(tmp_path / "s.gz"), urls, texts, member_per_record=False)
        parse = lambda p: [
            (r["headers"].get("warc-target-uri"), r["payload"])
            for r in parse_warc_records(open_warc_stream(open(p, "rb")))
        ]
        assert parse(pm) == parse(ps)

    def test_plain_uncompressed_stream_sniffed(self, tmp_path):
        from deepcrawl4ai_ray.sources.warc import open_warc_stream, parse_warc_records, write_wet_file

        urls, texts = _mk(4)
        p = write_wet_file(str(tmp_path / "a.gz"), urls, texts)
        plain = tmp_path / "plain.warc"
        plain.write_bytes(gzip.decompress(open(p, "rb").read()))
        with open(plain, "rb") as f:
            recs = list(parse_warc_records(open_warc_stream(f)))
        assert len(recs) == 5

    def test_truncated_payload_raises(self, tmp_path):
        from deepcrawl4ai_ray.sources.warc import WarcFormatError, open_warc_stream, parse_warc_records

        body = b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 999\r\n\r\nshort"
        p = tmp_path / "t.warc"
        p.write_bytes(body)
        with pytest.raises(WarcFormatError, match="truncated"):
            list(parse_warc_records(open_warc_stream(open(p, "rb"))))

    def test_bad_version_line_raises(self, tmp_path):
        from deepcrawl4ai_ray.sources.warc import WarcFormatError, open_warc_stream, parse_warc_records

        p = tmp_path / "b.warc"
        p.write_bytes(b"HTTP/1.1 200 OK\r\n\r\n")
        with pytest.raises(WarcFormatError, match="version"):
            list(parse_warc_records(open_warc_stream(open(p, "rb"))))

    def test_missing_content_length_raises(self, tmp_path):
        from deepcrawl4ai_ray.sources.warc import WarcFormatError, open_warc_stream, parse_warc_records

        p = tmp_path / "c.warc"
        p.write_bytes(b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\n")
        with pytest.raises(WarcFormatError, match="Content-Length"):
            list(parse_warc_records(open_warc_stream(open(p, "rb"))))


class TestWetDatasource:
    def test_dataset_roundtrip_multi_file(self, ray_session, tmp_path):
        from deepcrawl4ai_ray.sources.warc import read_wet, write_wet_file

        urls, texts = _mk(40)
        for k in range(4):
            sel = [i for i in range(40) if i % 4 == k]
            write_wet_file(
                str(tmp_path / f"part-{k}.warc.wet.gz"),
                [urls[i] for i in sel],
                [texts[i] for i in sel],
            )
        ds = read_wet(str(tmp_path))
        df = ds.to_pandas().sort_values("url").reset_index(drop=True)
        want = (
            pd.DataFrame({"url": urls, "text": texts})
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert df["url"].tolist() == want["url"].tolist()
        assert df["text"].tolist() == want["text"].tolist()
        assert (df["record_type"] == "conversion").all()  # warcinfo filtered
        assert (df["n_bytes"] if "n_bytes" in df else df["content_length"]).tolist() == [
            len(t.encode("utf-8")) for t in want["text"]
        ]
        # schema is the declared WET_SCHEMA
        assert set(ds.schema().names) == {"url", "warc_ts", "record_type", "text", "content_length"}

    def test_batch_rows_bounds_block_size(self, ray_session, tmp_path):
        from deepcrawl4ai_ray.sources.warc import read_wet, write_wet_file

        urls, texts = _mk(30)
        write_wet_file(str(tmp_path / "one.warc.wet.gz"), urls, texts)
        ds = read_wet(str(tmp_path), batch_rows=7)
        assert ds.count() == 30

    def test_warc_ts_parsed(self, ray_session, tmp_path):
        from deepcrawl4ai_ray.sources.warc import read_wet, write_wet_file

        write_wet_file(
            str(tmp_path / "d.warc.wet.gz"),
            ["https://a.ex/1"],
            ["hello"],
            dates=["2021-06-15T12:34:56Z"],
        )
        df = read_wet(str(tmp_path)).to_pandas()
        assert str(df["warc_ts"].iloc[0]) == "2021-06-15 12:34:56"

    def test_conversion_only_false_includes_warcinfo(self, ray_session, tmp_path):
        from deepcrawl4ai_ray.sources.warc import read_wet, write_wet_file

        write_wet_file(str(tmp_path / "e.warc.wet.gz"), ["u1", "u2"], ["t1", "t2"])
        assert read_wet(str(tmp_path), conversion_only=False).count() == 3
        assert read_wet(str(tmp_path), conversion_only=True).count() == 2


class TestWarcResponseWriter:
    def test_roundtrip_bodies_byte_identical(self, tmp_path):
        import gzip

        from deepcrawl4ai_ray.sources.warc import (
            parse_warc_records,
            split_http_payload,
            write_warc_file,
        )

        urls = ["https://a.ex/1", "https://a.ex/2"]
        htmls = ["<html>ünïcode & <b>tags</b></html>", ""]
        path = str(tmp_path / "a.warc.gz")
        write_warc_file(path, urls, htmls)

        import io

        raw = gzip.decompress(open(path, "rb").read())
        recs = list(parse_warc_records(io.BytesIO(raw)))
        assert [r["headers"]["warc-type"] for r in recs] == [
            "warcinfo", "response", "response",
        ]
        got = []
        for r in recs[1:]:
            status, headers, body = split_http_payload(r["payload"])
            assert status == 200
            assert headers["content-type"].startswith("text/html")
            assert int(headers["content-length"]) == len(body)
            got.append(body)
        assert got == [h.encode("utf-8") for h in htmls]

    def test_bytes_html_passthrough(self, tmp_path):
        import gzip
        import io

        from deepcrawl4ai_ray.sources.warc import (
            parse_warc_records,
            split_http_payload,
            write_warc_file,
        )

        body = b"\xff\xfe raw bytes, not utf-8"
        path = str(tmp_path / "b.warc.gz")
        write_warc_file(path, ["https://b.ex"], [body])
        raw = gzip.decompress(open(path, "rb").read())
        recs = list(parse_warc_records(io.BytesIO(raw)))
        _, _, back = split_http_payload(recs[1]["payload"])
        assert back == body

    def test_split_http_payload_guards(self):
        import pytest as _pytest

        from deepcrawl4ai_ray.sources.warc import WarcFormatError, split_http_payload

        with _pytest.raises(WarcFormatError, match="no HTTP header block"):
            split_http_payload(b"not http")
        with _pytest.raises(WarcFormatError, match="status line"):
            split_http_payload(b"HTTP/1.1\r\n\r\nbody")

    def test_export_sink_deterministic_and_atomic(self, ray_session, tmp_path):
        import glob

        import pandas as pd
        import ray.data as rd

        from deepcrawl4ai_ray.sources.warc import read_wet, warc_export

        df = pd.DataFrame(
            {
                "url": [f"https://h{i%3}.ex/p{i}" for i in range(30)],
                "html": [f"<html>{i}</html>" for i in range(30)],
                "host": [f"h{i%3}.ex" for i in range(30)],
            }
        )
        out = str(tmp_path / "warcs")
        m1 = (
            warc_export(rd.from_pandas(df).repartition(5), out)
            .to_pandas()
            .sort_values("partition")
            .reset_index(drop=True)
        )
        assert m1["n_records"].tolist() == [10, 10, 10]
        sig1 = {p: open(p, "rb").read() for p in glob.glob(f"{out}/*.warc.gz")}
        # rerun with a different block layout: byte-identical archives
        warc_export(rd.from_pandas(df).repartition(2), out).materialize()
        sig2 = {p: open(p, "rb").read() for p in glob.glob(f"{out}/*.warc.gz")}
        assert sig1 == sig2
        # read back through the engine's parser
        back = read_wet(sorted(glob.glob(f"{out}/*.warc.gz")), conversion_only=False)
        n_resp = back.map_batches(
            lambda t: t.filter(__import__("pyarrow").compute.equal(t["record_type"], "response")),
            batch_format="pyarrow",
        ).count()
        assert n_resp == 30


class TestWarcResponseDatasource:
    """read_warc_responses: HTTP split + WARC-Payload-Digest and
    WARC-Record-ID verification per record (verdict r4 #6)."""

    def test_round_trip_digest_and_record_id(self, ray_session, tmp_path):
        from deepcrawl4ai_ray.sources.warc import (
            read_warc_responses,
            record_id_for,
            write_warc_file,
        )

        urls = [f"https://w.example/p/{i}" for i in range(9)]
        htmls = [f"<html><body><p>page {i} body</p></body></html>" for i in range(9)]
        p = write_warc_file(str(tmp_path / "a.warc.gz"), urls, htmls)
        got = read_warc_responses([p]).to_pandas().sort_values("url").reset_index(drop=True)
        assert got["url"].tolist() == sorted(urls)
        assert (got["http_status"] == 200).all()
        assert got["digest_ok"].all() and got["record_id_ok"].all()
        assert (got["content_type"] == "text/html; charset=utf-8").all()
        # body bytes survive exactly
        import hashlib

        want = {u: hashlib.md5(h.encode()).hexdigest() for u, h in zip(urls, htmls)}
        for _, row in got.iterrows():
            assert hashlib.md5(row["html"]).hexdigest() == want[row["url"]]
        # record ids are the deterministic urn:uuid round-trip
        assert got["record_id"].iloc[0] == record_id_for(
            got["url"].iloc[0], "2020-01-01T00:00:00Z"
        )

    def test_corrupted_body_flips_digest_ok(self, ray_session, tmp_path):
        """Flip one byte inside a record's HTTP body: the reader must
        mark THAT record digest_ok=False and leave the others True."""
        import gzip as _gz

        from deepcrawl4ai_ray.sources.warc import read_warc_responses, write_warc_file

        urls = [f"https://w.example/p/{i}" for i in range(3)]
        htmls = [f"<html><body>page {i} XYZQ</body></html>" for i in range(3)]
        p = write_warc_file(str(tmp_path / "b.warc.gz"), urls, htmls)
        # decompress members, corrupt the marker in the middle record only
        raw = _gz.decompress(open(p, "rb").read())
        assert raw.count(b"XYZQ") == 3
        first = raw.find(b"XYZQ", raw.find(b"page 1"))
        raw = raw[:first] + b"XYZA" + raw[first + 4 :]
        bad = str(tmp_path / "c.warc.gz")
        open(bad, "wb").write(_gz.compress(raw, mtime=0))
        got = read_warc_responses([bad]).to_pandas().sort_values("url").reset_index(drop=True)
        assert got["digest_ok"].tolist() == [True, False, True]
        assert got["record_id_ok"].all()  # ids untouched


class TestMalformedResponseRecord:
    def test_bad_http_block_flags_record_not_archive(self, ray_session, tmp_path):
        """One response record whose payload is not an HTTP block must
        yield a flagged row (status -1, digests false) while the rest of
        the archive reads normally — never abort the read task."""
        import gzip as _gz

        from deepcrawl4ai_ray.sources.warc import (
            _warc_record,
            read_warc_responses,
            write_warc_file,
        )

        urls = ["https://m.example/a", "https://m.example/b"]
        p = write_warc_file(str(tmp_path / "ok.warc.gz"), urls, ["<html>A</html>", "<html>B</html>"])
        # append a response record whose payload has NO HTTP header block
        junk = _warc_record(
            [
                ("WARC-Type", "response"),
                ("WARC-Target-URI", "https://m.example/broken"),
                ("WARC-Date", "2020-01-01T00:00:00Z"),
            ],
            b"this is not an http response",
        )
        with open(p, "ab") as f:
            f.write(_gz.compress(junk, mtime=0))
        got = read_warc_responses([p]).to_pandas().sort_values("url").reset_index(drop=True)
        assert len(got) == 3
        ok = got[got.url != "https://m.example/broken"]
        assert ok["digest_ok"].all() and (ok["http_status"] == 200).all()
        bad = got[got.url == "https://m.example/broken"].iloc[0]
        assert bad["http_status"] == -1
        assert not bad["digest_ok"] and not bad["record_id_ok"]
        assert bad["html"] == b"this is not an http response"
