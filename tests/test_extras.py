"""Extract modes (M6), selectors (M8), status maps (M19), LLM stub (M7)."""

import json

import pyarrow as pa

from deepcrawl4ai_ray.functions.extract import extract_text, extract_text_bm25
from deepcrawl4ai_ray.functions.selectors import auto_detect_selectors
from deepcrawl4ai_ray.functions.statusmaps import convert_engine_status, task_status_color
from deepcrawl4ai_ray.stages.llm import LLMExtractStage

HTML = (
    "<html><body><h1>Title words</h1>"
    "<p>alpha beta gamma delta epsilon engines</p>"
    "<div>tiny</div>"
    "<p>parquet files and arrow batches move data quickly</p></body></html>"
)


class TestExtractModes:
    def test_raw_keeps_short_blocks(self):
        fit = extract_text(HTML, mode="fit")
        raw = extract_text(HTML, mode="raw")
        assert "tiny" not in fit
        assert "tiny" in raw
        assert fit == extract_text(HTML)  # default is fit

    def test_bm25_filters_by_query(self):
        out = extract_text_bm25(HTML, "parquet arrow", top_k=1)
        assert "parquet files" in out
        assert "alpha beta" not in out
        assert extract_text_bm25(HTML, "zzz absent") == ""


class TestSelectors:
    def test_css_and_xpath(self):
        html = "<html><body><div id='main' class='x'><p class='a b'>t</p><p>u</p></div></body></html>"
        sels = auto_detect_selectors(html)
        by_css = {s["css"]: s for s in sels}
        assert "div#main" in by_css
        assert by_css["div#main"]["xpath"] == "/html[1]/body[1]/div[1]"
        assert "p.a.b" in by_css
        # second p: positional xpath distinguishes it
        assert any(s["xpath"].endswith("/p[2]") for s in sels)

    def test_deterministic(self):
        assert auto_detect_selectors(HTML) == auto_detect_selectors(HTML)


class TestStatusMaps:
    def test_maps(self):
        assert convert_engine_status("success") == "Completed"
        assert convert_engine_status("weird") == "Unknown"
        assert task_status_color("Completed") == "#22c55e"
        assert task_status_color("nope") == "#9ca3af"


class TestLLMStub:
    def test_schema_filled_deterministically(self):
        schema = {
            "properties": {
                "title": {"type": "string"},
                "n_words": {"type": "integer"},
                "ok": {"type": "boolean"},
            }
        }
        stage = LLMExtractStage(schema, "extract the title", text_col="text", id_col="doc_id")
        batch = pa.table(
            {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["one two three four"], pa.string())}
        )
        out = stage(batch)
        rec = json.loads(out["extracted_content"][0].as_py())
        assert rec == {"title": "one two three four", "n_words": 4, "ok": True}
        assert stage(batch)["extracted_content"][0] == out["extracted_content"][0]


class TestGroupedQuantileSketch:
    def test_tdigest_pipeline_vs_exact(self, ray_session):
        """VERDICT r2 #6: the t-digest partial-merge plan must match the
        exact grouped quantiles within the sketch's rank-error bound on
        the real events table; counts are exact."""
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        from deepcrawl4ai_ray.pipelines.queries import value_quantiles_by_type

        sf = "/root/testdata/sf0.001"
        exact = value_quantiles_by_type(sf).set_index("event_type")
        sk = value_quantiles_by_type(sf, sketch=True).set_index("event_type")
        assert (sk["n"] == exact["n"]).all()

        ev = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "value"]).to_pandas()
        for et, row in sk.iterrows():
            vals = np.sort(ev.loc[ev["event_type"] == et, "value"].to_numpy(dtype=float))
            for q, col in ((0.5, "p50"), (0.9, "p90")):
                lo = np.searchsorted(vals, row[col], side="left") / len(vals)
                hi = np.searchsorted(vals, row[col], side="right") / len(vals)
                err = min(abs(lo - q), abs(hi - q))
                assert err <= 0.02, (et, col, err)

    def test_tdigest_partial_handles_empty_blocks(self, ray_session):
        """Blocks emptied by an upstream filter must emit key-TYPED
        partials (a null-typed key column would break schema unification
        in the groupby shuffle).  Null keys are unsupported engine-wide
        (Ray's sort-based groupby cannot order them) — filter upstream."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        from deepcrawl4ai_ray.stages.agg import grouped_quantiles_tdigest

        df = pd.DataFrame(
            {
                "k": pd.array(["a"] * 50 + ["b"] * 50 + ["drop"] * 20, dtype="string"),
                "v": np.arange(120, dtype=float),
            }
        )
        ds = rd.from_pandas(df).repartition(8).map_batches(
            # the 'drop' rows sit in the trailing blocks → some blocks
            # reach partial() completely empty
            lambda t: t.filter(pa.compute.not_equal(t["k"], "drop")), batch_format="pyarrow"
        )
        out = grouped_quantiles_tdigest(ds, "k", "v").to_pandas()
        assert set(out["k"]) == {"a", "b"}
        assert int(out["n"].sum()) == 100
