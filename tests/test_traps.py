"""Spider-trap detection (stages/traps.py): signal extraction semantics,
per-host rule behavior, block-layout invariance, empty input."""

import pandas as pd
import pyarrow as pa
import pytest


class TestUrlTrapSignals:
    def test_signal_extraction(self):
        from deepcrawl4ai_ray.stages.traps import url_trap_signals

        batch = pa.table(
            {
                "url": [
                    "https://a.example/p/12",
                    "https://a.example/p/12?sid=3",
                    "https://b.example/x/2024/01/15/y/0",
                    "https://c.example/",
                ]
            }
        )
        out = url_trap_signals(batch).to_pandas()
        assert out["host"].tolist() == ["a.example", "a.example", "b.example", "c.example"]
        # query stripped before templating; digit runs collapse to N
        assert out["template"].tolist() == ["/p/N", "/p/N", "/x/N/N/N/y/N", "/"]
        assert out["depth"].tolist() == [2, 2, 6, 1]
        assert out["has_q"].tolist() == [0, 1, 0, 0]


class TestTrapHostReport:
    def _report(self, urls, **kw):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.traps import trap_host_report

        ds = rd.from_pandas(pd.DataFrame({"url": urls}))
        return trap_host_report(ds, **kw)

    def test_rules(self, ray_session):
        urls = (
            # session trap: 4 pages, each with 7 query variants -> 28/32 query urls
            [f"https://q.example/p/{i}" for i in range(4)]
            + [f"https://q.example/p/{i}?sid={k}" for i in range(4) for k in range(7)]
            # calendar trap: one deep path
            + ["https://d.example/p/0", "https://d.example/p/0/cal/2024/01/15/x/0"]
            # clean host: many urls, no query, shallow
            + [f"https://ok.example/p/{i}" for i in range(40)]
        )
        out = self._report(urls, min_urls=16, depth_cap=6).set_index("host")
        assert out.loc["q.example", "is_trap"] == 1  # 2*28 >= 32 and 32 >= 16
        assert out.loc["d.example", "is_trap"] == 1  # depth 8 >= 6
        assert out.loc["ok.example", "is_trap"] == 0
        assert out.loc["ok.example", "n_templates"] == 1
        assert out.loc["q.example", "n_query_urls"] == 28
        assert out.loc["d.example", "max_depth"] == 8

    def test_block_layout_invariant(self, ray_session):
        import ray.data as rd

        from deepcrawl4ai_ray.stages.traps import trap_host_report

        urls = [f"https://h{i % 5}.example/p/{i}?s={i % 3}" for i in range(200)]
        df = pd.DataFrame({"url": urls})
        one = trap_host_report(rd.from_pandas(df))
        many = trap_host_report(rd.from_pandas(df).repartition(17))
        pd.testing.assert_frame_equal(one, many)

    def test_empty_input(self, ray_session):
        out = self._report(pd.Series([], dtype="string"))
        assert len(out) == 0
        assert list(out.columns) == [
            "host",
            "n_urls",
            "n_templates",
            "n_query_urls",
            "max_depth",
            "is_trap",
        ]
