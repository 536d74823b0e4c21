"""sf1-scale proof for the LM/tokenizer training family added late in
round 4: CCNet bigram-LM perplexity (broadcast + join modes), head/
middle/tail bucketing, DSIR importance resampling, BPE merge training,
and the domain-blocklist pass — all over the ~2.16M-doc extracted
corpus the main scale_proof produces, with per-stage wall time and
driver RSS tracked (the no-hidden-materialization check).

Reuses /tmp/dc4r_scale/extract_out when the main proof already ran;
otherwise extracts from the cached corpus first.  Writes
LM_SCALE_PROOF_r4.json.
"""

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM"):
                return round(int(line.split()[1]) / 1024.0, 1)
    return -1.0


def anon_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("RssAnon"):
                return round(int(line.split()[1]) / 1024.0, 1)
    return -1.0


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="sf1")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from deepcrawl4ai_ray.sources.corpus import ensure

    corpus = ensure(args.tier)

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False, logging_level="ERROR")
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.target_max_block_size = 8 * 1024 * 1024

    out: dict = {
        "metric": "lm_scale_proof",
        "tier": args.tier,
        "num_cpus": args.cpus,
        "stages": {},
        "rss_mb": {"start": rss_mb()},
        "rss_anon_mb": {"start": anon_mb()},
    }

    def record(name: str, secs: float, **kw) -> None:
        out["stages"][name] = {"sec": round(secs, 1), **{k: round(v, 1) for k, v in kw.items()}}
        out["rss_mb"][name] = rss_mb()
        out["rss_anon_mb"][name] = anon_mb()
        print(
            f"[lm_scale_proof] {name}: {secs:.1f}s {kw} peak_rss={rss_mb()} MB anon={anon_mb()} MB",
            file=sys.stderr,
        )

    # ---- 0. extracted text (reuse the main proof's output when present) --
    extract_out = "/tmp/dc4r_scale/extract_out"
    if not glob.glob(os.path.join(extract_out, "*.parquet")):
        from deepcrawl4ai_ray.functions.extract import extract_text

        os.makedirs(extract_out, exist_ok=True)
        t0 = time.time()
        (
            rd.read_parquet(os.path.join(corpus, "pages"), columns=["url", "html"])
            .map_batches(
                lambda b: pa.table(
                    {
                        "url": b["url"],
                        "text": pa.array(
                            [extract_text(h) for h in b["html"].to_pylist()], pa.string()
                        ),
                    }
                ),
                batch_format="pyarrow",
                batch_size=512,
            )
            .write_parquet(extract_out)
        )
        record("extract", time.time() - t0)

    # docs = (doc_id, lang, text): stable 63-bit url-hash ids (the main
    # proof's convention) + deterministic pseudo-lang for the bucketing
    # shape (the synthetic corpus is monolingual)
    def with_ids(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.asarray(batch["url"].to_pylist(), dtype=object), categorize=False
        ).astype(np.int64)
        h = np.abs(h)
        langs = np.array(["en", "de", "fr", "es", "pt"], dtype=object)[h % 5]
        return pa.table(
            {
                "doc_id": pa.array(h, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "text": batch["text"],
            }
        )

    docs = (
        rd.read_parquet(extract_out, columns=["url", "text"])
        .map_batches(with_ids, batch_format="pyarrow")
        .materialize()
    )
    n_docs = docs.count()
    out["docs"] = n_docs

    from deepcrawl4ai_ray.stages.ngramlm import (
        ppl_rank_buckets,
        score_perplexity,
        train_bigram_lm,
    )

    # ---- 1. LM training on the doc_id%7==0 slice (~14% of corpus) -------
    def is_train(batch: pa.Table) -> pa.Table:
        keep = (batch["doc_id"].to_numpy(zero_copy_only=False) % 7) == 0
        return batch.filter(pa.array(keep))

    t0 = time.time()
    uni, bg, vocab = train_bigram_lm(docs.map_batches(is_train, batch_format="pyarrow"))
    n_uni, n_bg = uni.count(), bg.count()
    dt = time.time() - t0
    record("lm_train", dt, docs_per_sec=(n_docs / 7) / dt, uni_rows=float(n_uni), bg_rows=float(n_bg))

    # ---- 2. broadcast-mode scoring of the FULL corpus --------------------
    t0 = time.time()
    scored = score_perplexity(docs, uni, bg, vocab, keep_cols=("lang",), mode="broadcast").materialize()
    dt = time.time() - t0
    record("ppl_broadcast", dt, docs_per_sec=n_docs / dt, scored=float(scored.count()))

    # ---- 3. join-mode scoring (the counts-too-big-to-broadcast path) on a
    # 1-in-8 slice — exercises the two bucketed joins at ~270k docs --------
    def slice8(batch: pa.Table) -> pa.Table:
        keep = (batch["doc_id"].to_numpy(zero_copy_only=False) % 8) == 0
        return batch.filter(pa.array(keep))

    sl = docs.map_batches(slice8, batch_format="pyarrow")
    t0 = time.time()
    jr = score_perplexity(sl, uni, bg, vocab, keep_cols=(), mode="join").materialize()
    dt = time.time() - t0
    record("ppl_join_slice", dt, docs_per_sec=(n_docs / 8) / dt, scored=float(jr.count()))

    # ---- 4. head/middle/tail bucketing of the full scored corpus --------
    t0 = time.time()
    buckets = ppl_rank_buckets(scored).materialize()
    # distribution check via the partial-agg combiner (a bare
    # groupby(bucket).Count over 2M rows measured 52 s of pure Ray
    # aggregate-state overhead — the exact pathology agg.py exists for)
    from deepcrawl4ai_ray.stages.agg import partial_grouped_sum

    dist = partial_grouped_sum(buckets, ["bucket"], count_alias="n").take_all()
    dt = time.time() - t0
    record(
        "ppl_buckets",
        dt,
        docs_per_sec=n_docs / dt,
        **{f"n_{r['bucket']}": float(r["n"]) for r in dist},
    )

    # ---- 5. DSIR importance weights + Gumbel top-k ------------------------
    from deepcrawl4ai_ray.stages.dsir import dsir_lambda, dsir_topk

    t0 = time.time()
    lam = dsir_lambda(docs, "doc_id % 7 == 0")
    sel = dsir_topk(docs, lam, "doc_id % 7 != 0", k=10_000)
    dt = time.time() - t0
    record("dsir", dt, docs_per_sec=n_docs / dt, selected=float(len(sel)))

    # ---- 6. BPE: word-frequency contraction + 24 merge rounds ------------
    from deepcrawl4ai_ray.stages.bpe import learn_bpe, word_counts

    t0 = time.time()
    wc = word_counts(docs).materialize()
    n_words = wc.count()
    dt_wc = time.time() - t0
    record("bpe_word_counts", dt_wc, docs_per_sec=n_docs / dt_wc, vocab_rows=float(n_words))

    t0 = time.time()
    merges = learn_bpe(wc, 24)
    dt = time.time() - t0
    record("bpe_merges", dt, merges=float(len(merges)), sec_per_merge=dt / max(len(merges), 1))

    # ---- 7. blocklist flags over synthesized multi-label hosts -----------
    from deepcrawl4ai_ray.stages.blocklist import domain_block_flags

    def mk_host(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sub = np.array(["ads.", "cdn.media.", "www.", ""], dtype=object)[ids % 4]
        base = np.array([f"site{i}.example" for i in range(997)], dtype=object)[ids % 997]
        return pa.table({"doc_id": batch["doc_id"], "host": pa.array(sub + base, pa.string())})

    blocked = [f"site{i}.example" for i in range(0, 997, 5)] + [
        f"ads.site{i}.example" for i in range(1, 997, 7)
    ]
    t0 = time.time()
    flags = domain_block_flags(
        docs.map_batches(mk_host, batch_format="pyarrow"), "host", blocked
    )
    n_blocked = flags.map_batches(
        lambda t: pa.table(
            {"n": pa.array([int(pc.sum(pc.not_equal(t["blocked_by"], "")).as_py() or 0)], pa.int64())}
        ),
        batch_format="pyarrow",
    ).sum("n")
    dt = time.time() - t0
    record("blocklist", dt, docs_per_sec=n_docs / dt, blocked=float(n_blocked))

    out["rss_mb"]["end"] = rss_mb()
    out["rss_anon_mb"]["end"] = anon_mb()
    ray.shutdown()
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__), "..", "LM_SCALE_PROOF_r4.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
