"""Driver contract: entry() smoke, queries() per-operator pipelines,
oracle_sql() DuckDB equivalents.

Ray is initialised by the driver BEFORE this module is imported; nothing
here (nor in deepcrawl4ai_ray) calls ray.init()/ray.shutdown().

Full operator-by-operator map: COVERAGE.md (every SURVEY.md §2 row →
implementation file → queries() key → check type).  Summary:
- S1/S5 sources + K2/K3 parquet sinks .... every query (column-pruned
  read_parquet), crawl_tiny_e2e (partitioned zstd parquet sink)
- M1 fetch / T1-T3,T8 stateful pool ...... crawl_tiny_e2e (FetchActor)
- M2/M3 url normalize+slug ............... normalized_sources
- M4/M5 HTML→text extraction ............. extract_corpus_text (+ pytest
  byte-identity conformance), crawl_tiny_e2e
- M10-M12 projections .................... q3_top_revenue, crawl pipeline
- M16/M17 filters/branches ............... orders_status_counts, due_events
- M18 link-scope filter .................. crawl_tiny_e2e
- J2/J3 broadcast joins .................. region_customer_rollup, q3
- J4 seen-set anti-join .................. customers_without_orders (+
  frontier cuckoo in crawl_tiny_e2e)
- J5 keyed first-wins dedup .............. first_event_per_key,
  dedup_exact_docs
- bucketed hash join (both sides large) .. q3_top_revenue,
  jaccard_adjacent_docs
- A1-A5 aggregations ..................... q1_lineitem_agg + partial-agg
  pattern everywhere
- O1 ready-time queue .................... due_events
- top-k / limits ......................... top_users_by_events, knn_*
- §2.9 streaming windows ................. events_hourly, user_sessions
- dedup family ........................... dedup_exact_docs (exact),
  minhash_near_dups (MinHash+LSH), simhash_signatures (SimHash),
  jaccard_adjacent_docs (n-gram/char Jaccard),
  embedding_near_dup_pairs (cosine)
- similarity search ...................... knn_cosine_top10 (brute
  force), knn_ivf_top10 (IVF scale path), knn_ivf_indexed_top10
  (persisted partition-pruned inverted file), knn_join_top5 (batched
  ANN kNN-JOIN, cluster-co-partitioned)
- semantic dedup / clustering ............ kmeans_clusters (distributed
  Lloyd, training loop SQL-oracled), semdedup_docs (SemDeDup,
  Abbas et al. 2023)
- eval hygiene ........................... source_disjoint_split
  (leakage-free keyed 80/10/10 split)
- text analysis .......................... token_stats_by_lang,
  bpe_token_stats (RE2 sub-word counts), quality_by_lang,
  doc_fingerprints, simhash, lang_id_counts (bigram language ID)
- multimodal binary columns .............. image_decode_meta,
  frame_samples (stubbed compressed decode, real actor-pool plumbing);
  REAL uncompressed codecs: image_real_decode_meta (PPM/BMP,
  pixel-digest verified), audio_wav_features (RIFF/WAV PCM16 +
  vectorized window features), video_frame_samples (Y4M skip-not-copy
  frame sampling)
- as-of join / rolling windows ........... asof_last_click,
  events_rolling_sum
- deterministic hash sampling ............ hash_sampled_events
- set intersection ....................... users_in_both_types
- dup clusters (label propagation) ....... minhash_dup_clusters
- sketches ............................... hll_user_registers
  (HyperLogLog registers, integer-exact), cms_user_est (Count-Min
  frequency estimates)
- graph metrics .......................... link_triangles (degree-
  oriented triangle counting), link_clustering (local clustering
  coefficient), webgraph_report (composed per-host report),
  link_degree_stats, pagerank_corpus, hits_corpus,
  host_components, hostrank_corpus
- frontier hygiene ....................... crawl_trap_hosts (spider-
  trap detection), robots_audit (the crawler's RobotsPolicy,
  oracle-gated), canonical_url_groups
- retrieval .............................. phrase_search_docs (indexed
  exact phrase search), bm25_top10 / bm25_indexed_top10 /
  bm25_appended_top10
- end-to-end cleaning pipeline ........... clean_corpus_stats
- JSON field extraction .................. props_k_stats
- part/supplier rollups .................. parts_by_brand,
  supplier_balance_by_nation
- r5 additions ........................... fasttext_doc_labels (real
  .vec model-file inference), warc_response_extract (digest-verified
  raw-capture ingestion), crawl_extract_e2e (FUSED crawl→extract
  rounds), crawl_tiny_e2e (now oracle-green against the closure),
  corpus_report (composed per-language dataset card)
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: the end-to-end crawl (frontier + fetch +
    extract + parquet sink) on the deterministic tiny corpus, with the
    full engine-ordered output schema (fetch_seq/round/priority)."""
    from deepcrawl4ai_ray.pipelines.queries import crawl_full_tiny

    return crawl_full_tiny()


def queries() -> dict[str, Callable[[str], Any]]:
    from deepcrawl4ai_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from deepcrawl4ai_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
