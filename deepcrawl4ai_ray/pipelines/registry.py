"""Pipeline-step registry — the user-extension surface (SURVEY.md §2.10).

The reference's extension points are config-as-code (``safe_eval_config``
AST-validates a single ``CrawlerRunConfig(...)`` expression,
utils.py:116-144), opaque ``browser_config``/``crawler_config`` dicts
merged by reflective setattr (tasks.py:355-359), and enum-selected
content filters (schemas.py:14-21).  The Ray-Data-native equivalent is
declarative: a pipeline is a list of named steps, each resolving to a
registered map_batches function / actor class with validated params —
no eval, no setattr.

    spec = [
        {"step": "select", "params": {"columns": ["doc_id", "text"]}},
        {"step": "md5", "params": {"text_col": "text"}},
        {"step": "filter_eq", "params": {"column": "lang", "value": "en"}},
    ]
    ds = build_pipeline(ds, spec)

Steps receive/return ``pyarrow.Table`` batches.  Register custom steps
with :func:`register` — the UDF hook is any callable over a
RecordBatch-shaped Table.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

import pyarrow as pa
import pyarrow.compute as pc

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(factory):
        if name in _REGISTRY:
            raise ValueError(f"step {name!r} already registered")
        _REGISTRY[name] = factory
        return factory

    return deco


def available_steps() -> List[str]:
    return sorted(_REGISTRY)


def build_pipeline(ds, spec: List[Dict[str, Any]]):
    """Apply a validated step list to a Dataset; unknown step → ValueError
    naming the valid steps (no silent fallthrough)."""
    for entry in spec:
        name = entry.get("step")
        if name not in _REGISTRY:
            raise ValueError(f"unknown step {name!r}; available: {available_steps()}")
        params = dict(entry.get("params") or {})
        ds = _REGISTRY[name](ds, **params)
    return ds


# --------------------------- built-in steps ------------------------------

@register("select")
def _select(ds, columns: List[str]):
    return ds.select_columns(columns)


@register("drop")
def _drop(ds, columns: List[str]):
    return ds.drop_columns(columns)


@register("filter_eq")
def _filter_eq(ds, column: str, value):
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t[column], value)), batch_format="pyarrow"
    )


@register("filter_le")
def _filter_le(ds, column: str, value):
    return ds.map_batches(
        lambda t: t.filter(pc.less_equal(t[column], value)), batch_format="pyarrow"
    )


@register("md5")
def _md5(ds, text_col: str, out_col: str = "text_hash"):
    from ..stages.dedup import add_md5_column

    return ds.map_batches(add_md5_column("", text_col, out_col), batch_format="pyarrow")


@register("extract_text")
def _extract_text(ds, html_col: str = "html", out_col: str = "text"):
    from ..functions.extract import extract_text

    def fn(t: pa.Table) -> pa.Table:
        texts = [extract_text(h) for h in t[html_col].to_pylist()]
        return t.append_column(out_col, pa.array(texts, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


@register("normalize_url")
def _normalize_url(ds, url_col: str = "url", out_col: str = "url_norm"):
    from ..functions.urlnorm import normalize_url

    def fn(t: pa.Table) -> pa.Table:
        urls = [normalize_url(u) for u in t[url_col].to_pylist()]
        return t.append_column(out_col, pa.array(urls, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


@register("token_count")
def _token_count(ds, text_col: str = "text", out_col: str = "n_tokens"):
    def fn(t: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(t[text_col], " "), 1)
        return t.append_column(out_col, pc.cast(n, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


@register("lang_id")
def _lang_id(ds, text_col: str = "text", out_col: str = "lang_pred"):
    from ..functions.textstats import lang_id

    class LangIdStage:
        def __call__(self, t: pa.Table) -> pa.Table:
            preds = [lang_id(x) for x in t[text_col].to_pylist()]
            return t.append_column(out_col, pa.array(preds, pa.string()))

    return ds.map_batches(LangIdStage, batch_format="pyarrow", concurrency=(1, 4))


@register("quality")
def _quality(ds, text_col: str = "text"):
    from ..functions.textstats import quality_batch

    def fn(t: pa.Table) -> pa.Table:
        cols = quality_batch(t[text_col].to_pylist())
        for name, arr in cols.items():
            t = t.append_column(name, pa.array(arr))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


@register("extract_text_bm25")
def _extract_text_bm25(ds, query: str, html_col: str = "html", out_col: str = "text", top_k: int = 5):
    """BM25 content filter (M6 analog of BM25ContentFilter(user_query))."""
    from ..functions.extract import extract_text_bm25

    def fn(t: pa.Table) -> pa.Table:
        texts = [extract_text_bm25(h, query, top_k) for h in t[html_col].to_pylist()]
        return t.append_column(out_col, pa.array(texts, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


@register("llm_extract")
def _llm_extract(ds, schema: dict, instruction: str = "", text_col: str = "text", id_col: str = "doc_id"):
    """LLM structured extraction (M7; deterministic stub in-sandbox)."""
    from ..stages.llm import LLMExtractStage

    return ds.map_batches(
        LLMExtractStage,
        fn_constructor_args=(schema, instruction, text_col, id_col),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


@register("bpe_token_count")
def _bpe_token_count(ds, text_col: str = "text", out_col: str = "n_bpe"):
    """Sub-word-ish token count (words + punctuation) via the vectorized
    RE2 kernel — the regex BPE stand-in of the training-data brief."""

    def fn(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t[text_col], r"\w+|[^\w\s]")
        return t.append_column(out_col, pc.cast(n, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


@register("simhash")
def _simhash(ds, text_col: str = "text", out_col: str = "simhash"):
    def fn(t: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions import hashing as H

        sigs = np.array([H.simhash64(x) for x in t[text_col].to_pylist()], dtype=np.uint64)
        return t.append_column(out_col, pa.array(sigs))

    return ds.map_batches(fn, batch_format="pyarrow")


@register("fingerprint")
def _fingerprint(ds, text_col: str = "text", out_col: str = "fingerprint"):
    """Winnowing-style rolling-hash document fingerprint."""

    def fn(t: pa.Table) -> pa.Table:
        from ..functions.hashing import rolling_fingerprint

        fps = [rolling_fingerprint(x) for x in t[text_col].to_pylist()]
        return t.append_column(out_col, pa.array(fps, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


@register("dedup_exact")
def _dedup_exact(ds, id_col: str, text_col: str = "text", num_buckets: int = 16):
    """Keep only the min-id row per distinct content (the J5 first-wins
    dedup as a pipeline step): md5 winners via groupby, applied back by
    a bucketed hash semi-join — fully distributed, no driver key list."""
    from ..stages.dedup import add_md5_column, exact_dedup_stats
    from ..stages.join import hash_join

    keep = exact_dedup_stats(ds, id_col, text_col).map_batches(
        lambda t: pa.table({"__keep_id": t[f"keep_{id_col}"]}), batch_format="pyarrow"
    )
    return hash_join(ds, keep, on=id_col, right_on="__keep_id", num_buckets=num_buckets).map_batches(
        lambda t: t.drop_columns(["__keep_id"]), batch_format="pyarrow"
    )


@register("near_dup_pairs")
def _near_dup_pairs(ds, id_col: str, text_col: str = "text", threshold: float = 0.9, payload_mode: str = "join"):
    """MinHash+LSH near-dup pairs with exact in-verify Jaccard — the
    dedup family as a declarative step.  TERMINAL-shaped: replaces the
    stream with Dataset(id_a, id_b, jac) (pairs stay distributed; sink
    with write_parquet)."""
    from ..stages.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        ds, id_col, text_col, threshold=threshold, verify="exact", payload_mode=payload_mode
    )


@register("dup_clusters")
def _dup_clusters(ds, id_col: str, text_col: str = "text", threshold: float = 0.9):
    """Near-dup pairs → cluster labels (min-label propagation).  Replaces
    the stream with Dataset(node, component)."""
    from ..stages.dedup import connected_components, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(ds, id_col, text_col, threshold=threshold, verify="exact")
    return connected_components(pairs)


@register("top_tokens")
def _top_tokens(ds, text_col: str = "text", k: int = 20, m: int = 4096):
    """EXACT corpus top-k tokens via bounded per-batch summaries (the
    token stream never shuffles; provable — raises when m is too small).
    TERMINAL-shaped: replaces the stream with Dataset(tok, cnt)."""
    from ..stages.textsearch import exact_top_tokens

    return exact_top_tokens(ds, text_col, k=k, m=m)


@register("bm25_topk")
def _bm25_topk(ds, terms: List[str], id_col: str = "doc_id", text_col: str = "text", k: int = 10):
    """Corpus-level BM25 retrieval (block-local scoring, no global
    shuffle; the reference's BM25 is only a per-page chunk filter,
    content_filter_strategy.py).  TERMINAL-shaped: replaces the stream
    with DataFrame(doc_id, bm25)."""
    from ..stages.textsearch import bm25_topk

    return bm25_topk(ds, id_col, text_col, terms, k=k)


@register("quantiles_sketch")
def _quantiles_sketch(ds, key: str, val: str, qs=(0.5, 0.9), compression: int = 200):
    """Grouped quantiles via the t-digest partial-merge plan (only
    sketch bytes shuffle).  Replaces the stream with
    Dataset(key, n, p50, p90, ...)."""
    from ..stages.agg import grouped_quantiles_tdigest

    return grouped_quantiles_tdigest(ds, key, val, qs=tuple(qs), compression=compression)


@register("image_decode")
def _image_decode(ds, payload_col: str = "payload", id_col: str = "doc_id", batch_size: int = 256):
    """Actor-pool binary-image decode stage (stubbed kernel, real
    plumbing; small batches — binary payload discipline)."""
    from ..stages.multimodal import ImageDecodeStage

    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_args=(payload_col, id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )


@register("write_parquet")
def _write_parquet(ds, path: str, **kwargs):
    """Terminal parquet sink (K2/K3 analog; zstd columnar replaces the
    reference's per-object zstd blobs).  Returns None (consumes)."""
    ds.write_parquet(path, **kwargs)
    return ds


@register("write_json")
def _write_json(ds, path: str):
    """NDJSON sink (K5 analog of the reference's NDJSON/SSE delivery)."""
    ds.write_json(path)
    return ds


@register("udf")
def _udf(ds, fn: Callable[[pa.Table], pa.Table], **kwargs):
    """Escape hatch: any callable over a pyarrow Table (the M-series
    map shape).  kwargs pass through to map_batches."""
    return ds.map_batches(fn, batch_format="pyarrow", **kwargs)


@register("hits")
def _hits(ds, src: str = "src", dst: str = "dst", iters: int = 2):
    """HITS hubs/authorities over an edge Dataset (stages/pagerank.hits)."""
    from ..stages.pagerank import hits

    return hits(ds, src, dst, iters=iters)


@register("pagerank")
def _pagerank(ds, src: str = "src", dst: str = "dst", iters: int = 3):
    """PageRank over an edge Dataset (stages/pagerank.pagerank)."""
    from ..stages.pagerank import pagerank

    return pagerank(ds, src, dst, iters=iters)


@register("remove_dup_spans")
def _remove_dup_spans(ds, id_col: str = "doc_id", text_col: str = "text", n: int = 13, min_df: int = 2):
    """Exact-substring span REMOVAL (Lee et al./RefinedWeb cleaning
    step; stages/dupspans.remove_duplicate_spans) → (id, cleaned)."""
    from ..stages.dupspans import remove_duplicate_spans

    return remove_duplicate_spans(ds, id_col, text_col, n=n, min_df=min_df)


@register("c4_clean")
def _c4_clean(ds, id_col: str = "url", text_col: str = "text", min_words: int = 5, min_kept: int = 2):
    """C4-style line-level cleaning (stages/c4filter): per-doc kept-line
    counts + cleaned-text md5; docs below min_kept dropped."""
    from ..stages.c4filter import c4_line_stats

    return c4_line_stats(ds, id_col, text_col, min_words, min_kept)


@register("boilerplate_dedup")
def _boilerplate_dedup(ds, id_col: str = "url", text_col: str = "text", min_docs: int = 5):
    """Cross-document boilerplate line removal (stages/c4filter)."""
    from ..stages.c4filter import boilerplate_line_dedup

    return boilerplate_line_dedup(ds, id_col, text_col, min_docs)


@register("anchor_stats")
def _anchor_stats(ds):
    """Anchor-text aggregation (stages/anchors): pages (url, html) →
    per-target inlink anchor-term stats."""
    from ..stages.anchors import anchor_term_stats

    return anchor_term_stats(ds)


@register("temperature_sample")
def _temperature_sample(ds, group_col: str, id_col: str, frac: float):
    """Temperature-balanced (T=2) group sampling (stages/sample)."""
    from ..stages.sample import temperature_sample

    return temperature_sample(ds, group_col, id_col, frac)


@register("recrawl_priority")
def _recrawl_priority(ds, key_col: str = "url", text_col: str = "text"):
    """Single-snapshot convenience wrapper is meaningless — recrawl
    planning needs a history — so this step expects ``ds`` to carry a
    ``snap`` int column tagging K snapshots stacked in one Dataset and
    splits on it before calling stages/snapshot.recrawl_priority."""
    import pyarrow.compute as _pc

    from ..stages.snapshot import recrawl_priority

    # materialize once: unique() + one filter pass per snapshot would
    # otherwise re-execute the (possibly expensive) upstream lineage
    # K+1 times
    ds = ds.materialize()
    snaps = sorted(
        ds.select_columns(["snap"]).unique("snap")
    )
    parts = [
        ds.map_batches(
            lambda t, s=s: t.filter(_pc.equal(t["snap"], s)).drop_columns(["snap"]),
            batch_format="pyarrow",
        )
        for s in snaps
    ]
    return recrawl_priority(parts, key_col, text_col)


@register("paragraph_dedup")
def _paragraph_dedup(ds, id_col: str = "doc_id", text_col: str = "text", sep: str = "\n"):
    from ..stages.paradedup import paragraph_dedup

    return paragraph_dedup(ds, id_col, text_col, sep)


@register("canonical_url_dedup")
def _canonical_url_dedup(ds, url_col: str = "url"):
    from ..stages.dedup import canonical_url_dedup

    return canonical_url_dedup(ds, url_col)


@register("weighted_sample")
def _weighted_sample(ds, id_col: str, weight_col: str, k: int):
    from ..stages.sample import weighted_sample_topk

    return weighted_sample_topk(ds, id_col, weight_col, k)


@register("quantile_gate")
def _quantile_gate(ds, group_col: str, score_col: str, q: float = 0.9):
    """Keep rows with score >= the group's q-th DISCRETE quantile (the
    FineWeb-style top-X% selection; quantile_disc semantics so the
    threshold is an actual data value).  Thresholds (one per group) are
    broadcast once; the gate is a map-side filter."""
    import numpy as _np
    import pandas as _pd
    import pyarrow as _pa

    import ray as _ray

    def thr_g(g: "_pd.DataFrame") -> "_pd.DataFrame":
        v = g[score_col].to_numpy(dtype=_np.float64)
        return _pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "__thr": [float(_np.quantile(v, q, method="inverted_cdf"))],
            }
        )

    rows = ds.groupby(group_col).map_groups(thr_g, batch_format="pandas").take_all()
    ref = _ray.put(
        (
            _pa.array([r[group_col] for r in rows]),
            _np.array([r["__thr"] for r in rows], dtype=_np.float64),
        )
    )

    def gate(t: "_pa.Table") -> "_pa.Table":
        import pyarrow.compute as _pc

        keys, vals = _ray.get(ref)  # index_in + take: the J2 pattern
        s = t[score_col].to_numpy(zero_copy_only=False)
        pos = _pc.index_in(t[group_col].combine_chunks(), value_set=keys).to_numpy(
            zero_copy_only=False
        )
        tv = vals[pos.astype(_np.int64)]
        return t.filter(_pa.array(s >= tv))

    return ds.map_batches(gate, batch_format="pyarrow")


@register("enrich_fingerprints")
def _enrich_fingerprints(ds, text_col: str = "text"):
    """The per-page enrich chain of the extract pipeline (token count,
    minhash signature, simhash, quality ratios) as ONE registry step, so
    a crawl can FUSE it into its round pipeline (CrawlConfig.enrich_spec)
    and publish already-enriched pages — saving the full corpus re-read
    of a separate crawl-then-extract pass (reference streaming-results
    UX, utils.py:272-300, generalized)."""

    def fn(t: pa.Table) -> pa.Table:
        import numpy as _np

        from ..functions import hashing as H
        from ..functions.textstats import quality_batch

        texts = t[text_col].to_pylist()
        n_tok = pc.cast(pc.add(pc.count_substring(t[text_col], " "), 1), pa.int64())
        # token hashes computed once per doc, shared by minhash + simhash
        ths = [H.token_hashes(x) for x in texts]
        sigs = [H.minhash_signature_fast(H.shingles(th), 64).tobytes() for th in ths]
        simh = _np.array([H.simhash64(th) for th in ths], dtype=_np.uint64)
        q = quality_batch(texts)
        return (
            t.append_column("n_tokens", n_tok)
            .append_column("minhash", pa.array(sigs, pa.binary()))
            .append_column("simhash", pa.array(simh))
            .append_column("stopword_ratio", pa.array(q["stopword_ratio"]))
            .append_column("alpha_ratio", pa.array(q["alpha_ratio"]))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


@register("fasttext_label")
def _fasttext_label(
    ds,
    vectors_path: str,
    labels_path: str,
    text_col: str = "text",
    keep_label: "str | None" = None,
    concurrency: int = 4,
):
    """Classify every row with a fastText ``.vec`` model (the M6
    content-filter family's learned member — stages/fasttext.py):
    appends ``label``/``logit``; with ``keep_label`` the step FILTERS to
    rows whose argmax label matches (the fastText-gated corpus filter
    shape, e.g. FineWeb-2's language/quality gates)."""
    import ray as _ray

    from ..stages.fasttext import FastTextScoreStage, load_fasttext_model

    model_ref = _ray.put(load_fasttext_model(vectors_path, labels_path))

    class Tag(FastTextScoreStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            scored = super().__call__(batch)
            out = batch.append_column("label", scored["label"]).append_column(
                "logit", scored["logit"]
            )
            if keep_label is not None:
                out = out.filter(pc.equal(out["label"], keep_label))
            return out

    return ds.map_batches(
        Tag,
        fn_constructor_kwargs={"model_ref": model_ref, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=1024,
    )
