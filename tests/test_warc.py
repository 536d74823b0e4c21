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
