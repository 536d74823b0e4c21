"""Crawl driver: rounds of select → fetch → extract → discover → offer.

The Ray-Data-native lifecycle from SURVEY.md §3.4.  Each round is one
streaming Dataset pipeline; the loop lives on the driver (Ray Data is a
DAG per round).  The per-round flow:

    ready set (from frontier shards, deterministic order, fetch_seq
    assigned)
      → ray.data.from_arrow(one block per host_bucket)
      → map_batches(FetchActor, pyarrow, actor pool)       [M1, T1-T3]
      → map_batches(extract_stage)                          [M4, M12, M18]
      → map_batches(router.offer: explode links, normalize,
                    bloom pre-screen, shard actor offers)   [M2, M3, J4]
      → write_parquet(out/pages/round=r/)                   [K2→Parquet]

Then shards ``finalize_round`` (the determinism barrier), manifest rows
are appended, and shard state is checkpointed.  Resume = restore shards
from the latest checkpoint and continue; completed rounds' Parquet is
never rewritten (resumable-output contract).

Skew: candidates are routed to shards by host hash; the HOT-host risk
is bounded by the per-host politeness quota (a host yields at most
round_ms/crawl_delay URLs per round regardless of queue size) and by
``max_per_host`` queue depth.  Fetch blocks are built one per
host_bucket so a single host's pages never split across blocks
mid-round (politeness accounting stays per-actor coherent).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..functions.urlnorm import hash64, hosts_of, normalize_url
from ..schema import CRAWL_OUT_SCHEMA, MANIFEST_SCHEMA
from ..sources.corpus import NUM_HOST_BUCKETS
from ..stages.extract import make_extract_stage
from ..stages.fetch import load_bucket_refs, make_fetch_fn
from ..state.bloom import BloomFilter
from .shard import FrontierShard


@dataclass
class CrawlConfig:
    num_shards: int = 4
    round_ms: int = 10_000
    per_shard_budget: int = 2_000
    max_rounds: int = 50
    max_pages: int = 1_000_000
    shard_capacity: int = 1 << 20
    max_per_host: int = 10_000
    exclude_external: bool = False
    bloom_prescreen: bool = False  # lossy mode: drop bloom-positive candidates batch-side
    fetch_concurrency: int = 4
    checkpoint: bool = True
    # per-URL retry (reference utils.py:383-399 backoff, storage.py:200-235
    # 3x retry, Celery acks-late): a transiently-failed url is re-offered
    # (seen-set bypass) up to max_retries times, then written exactly once
    # to pages/dead_letter/round=r/.  0 = off (misses flow to the round
    # output as before).
    max_retries: int = 0
    # graceful mid-run cancel (reference api.py:484-606 revoke + state
    # reconciliation, re-expressed round-synchronously): when this file
    # appears — or request_stop() is called — the crawl finishes the
    # CURRENT round (atomic publish + checkpoint as usual) and returns
    # with stopped=True; resume() continues exactly where it left off.
    stop_file: Optional[str] = None
    # PREEMPTIVE mid-round cancel (the reference's SIGTERM/SIGKILL path,
    # api.py:508-530): when this file appears, in-flight fetch tasks
    # raise, every shard rolls back to its pre-round state, nothing is
    # published, and run() returns stopped=True with next_round
    # unchanged — resume (or the same object) re-runs the aborted round
    # identically (tested equivalence vs an uninterrupted run).
    abort_file: Optional[str] = None
    # pin corpus bucket tables in the object store once (zero-copy shared
    # across fetch actors); disable when the corpus exceeds plasma
    corpus_in_object_store: bool = True
    # skew mitigation: hosts whose frontier share is pathological get
    # salted across `factor` shards — routing key hash64(host#k) with
    # k = hash64(url) % factor (deterministic per URL, so the per-shard
    # cuckoo dedup stays exact); each shard's politeness bucket refills
    # at 1/factor of the host rate so the aggregate budget is preserved
    hot_hosts: Dict[str, int] = field(default_factory=dict)
    # alternative seed list (url, priority) — e.g. the recrawl planner's
    # output (stages/snapshot.recrawl_priority mapped to priority ints)
    # replacing the corpus seeds: the feedback loop of a continuous
    # crawler.  Defaults to <corpus_dir>/seeds.parquet.
    seeds_path: Optional[str] = None
    # push-based event channel (reference SSE job.py:461-487): when set,
    # one JSON line is APPENDED here per published round (and per
    # aborted round) — consumers block on file growth (events.tail_events,
    # the XREAD analog) instead of re-scanning the manifest directory
    events_file: Optional[str] = None
    # FUSED crawl→extract (reference streaming-results UX generalized):
    # a pipelines/registry step spec applied to each round's page rows
    # AFTER link routing and BEFORE the parquet publish — pages land in
    # the corpus already cleaned/fingerprinted, saving the full corpus
    # re-read of a separate extract pass.  Plain JSON (step names +
    # params), so it checkpoints like the rest of the config.
    enrich_spec: list = field(default_factory=list)
    extra: dict = field(default_factory=dict)


def _route_shards(urls: np.ndarray, hosts: np.ndarray, num_shards: int, hot_hosts: Dict[str, int]) -> np.ndarray:
    """host → shard routing with deterministic hot-host salting.

    Default: hash64(host) % num_shards.  Salted host h with factor s:
    shard = (hash64(h) + hash64(url) % s) % num_shards — the salt k is
    derived from the URL (so a URL's shard depends only on (host, url)
    and the sharded seen-set dedup stays exact) and shards are
    CONSECUTIVE from the host's base shard, guaranteeing exactly
    min(s, num_shards) distinct shards (a salted-name rehash would
    birthday-collide, e.g. s=2 can land both salts on one shard).

    Salting is FIXED for the life of a crawl (checkpoint-persisted in
    meta.json) by design: changing a host's salt factor mid-crawl would
    re-route urls whose seen-set entries live on the pre-change shard,
    silently breaking exact dedup (duplicate fetches).  An adaptive
    variant would need membership authority decoupled from queue
    placement — base-shard dedup with deterministic forwarding of new
    urls to salted queue shards — which is the documented extension
    point, not the default.
    """
    sid = (hash64(hosts) % np.uint64(num_shards)).astype(np.int64)
    if hot_hosts:
        for h, s in hot_hosts.items():
            m = hosts == h
            if m.any():
                base = int(hash64([h])[0] % np.uint64(num_shards))
                salts = (hash64(urls[m]) % np.uint64(s)).astype(np.int64)
                sid[m] = (base + salts) % num_shards
    return sid


class _Router:
    """Link → frontier offer stage (runs inside map_batches tasks).

    Explodes the ``links`` column, normalizes (M2), routes each URL to
    its shard by host hash (hot hosts salted — see _route_shards), and
    calls ``shard.offer`` remotely.  With ``bloom_prescreen`` a
    read-only bloom snapshot (merged across shards, broadcast via
    ray.put once per round) drops almost-certainly-seen URLs
    batch-side, cutting shard traffic at the cost of ~FPR lost new
    URLs — off by default so the seen set stays exact (conformance
    mode).
    """

    def __init__(self, shards, num_shards: int, bloom_ref=None, hot_hosts: Optional[Dict[str, int]] = None):
        self.shards = shards
        self.num_shards = num_shards
        self.bloom_ref = bloom_ref
        self.hot_hosts = hot_hosts or {}
        self._bloom = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        links_col = batch.column("links").to_pylist()
        prios = batch.column("priority").to_pylist()
        urls: List[str] = []
        cand_prio: List[int] = []
        for links, p in zip(links_col, prios):
            for u in links:
                # links arrive ALREADY normalized by extract_links (and
                # normalize_url is idempotent — property-tested), so no
                # second normalization pass here
                urls.append(u)
                cand_prio.append(p + 1)  # discovered depth = parent + 1
        if urls:
            arr = np.asarray(urls, dtype=object)
            pr = np.asarray(cand_prio, dtype=np.int64)
            if self.bloom_ref is not None:
                if self._bloom is None:
                    self._bloom = BloomFilter.from_bytes(ray.get(self.bloom_ref))
                keep = ~self._bloom.contains_many(hash64(arr))
                arr, pr = arr[keep], pr[keep]
            if arr.size:
                hosts = hosts_of(arr)
                sid = _route_shards(arr, hosts, self.num_shards, self.hot_hosts)
                refs = []
                for s in range(self.num_shards):
                    m = sid == s
                    if m.any():
                        refs.append(
                            self.shards[s].offer.remote(
                                list(arr[m]), [int(x) for x in pr[m]], list(hosts[m])
                            )
                        )
                ray.get(refs)  # backpressure: don't let offers pile up unacked
        return batch.drop_columns(["links"])


class _RetrySplit:
    """Between fetch and extract: route transient misses back to their
    frontier shard (retries+1, same determinism barrier as offers) and
    sink retry-exhausted misses to the round's dead-letter partition
    (deterministic part name = first fetch_seq → exactly-once under Ray
    task retries; the round dir is atomically published like pages/).
    Surviving rows (ok / robots_denied / first-time misses when the
    feature is off) flow on unchanged."""

    def __init__(self, shards, num_shards: int, max_retries: int, hot_hosts, dead_tmp_dir: str):
        self.shards = shards
        self.num_shards = num_shards
        self.max_retries = max_retries
        self.hot_hosts = hot_hosts or {}
        self.dead_tmp_dir = dead_tmp_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if len(batch) == 0:
            return batch
        status = np.asarray(batch["status"].to_pylist(), dtype=object)
        retries = batch["retries"].to_numpy(zero_copy_only=False)
        miss = status == "miss"
        retry_mask = miss & (retries < self.max_retries)
        dead_mask = miss & (retries >= self.max_retries)
        if retry_mask.any():
            urls = np.asarray(batch["url"].to_pylist(), dtype=object)[retry_mask]
            hosts = np.asarray(batch["host"].to_pylist(), dtype=object)[retry_mask]
            prios = batch["priority"].to_numpy(zero_copy_only=False)[retry_mask]
            nr = retries[retry_mask] + 1
            sid = _route_shards(urls, hosts, self.num_shards, self.hot_hosts)
            refs = []
            for s in range(self.num_shards):
                m = sid == s
                if m.any():
                    refs.append(
                        self.shards[s].reoffer.remote(
                            list(urls[m]), [int(x) for x in prios[m]], list(hosts[m]), [int(x) for x in nr[m]]
                        )
                    )
            ray.get(refs)  # backpressure, same as _Router offers
        if dead_mask.any():
            dead = batch.filter(pa.array(dead_mask)).select(
                ["fetch_seq", "round", "url", "host", "priority", "retries"]
            )
            os.makedirs(self.dead_tmp_dir, exist_ok=True)
            first_seq = int(dead["fetch_seq"][0].as_py())
            pq.write_table(dead, os.path.join(self.dead_tmp_dir, f"part-{first_seq:012d}.parquet"))
        keep = ~(retry_mask | dead_mask)
        return batch.filter(pa.array(keep))


class Crawler:
    def __init__(self, corpus_dir: str, out_dir: str, cfg: Optional[CrawlConfig] = None):
        self.corpus_dir = corpus_dir
        self.out_dir = out_dir
        self.cfg = cfg or CrawlConfig()
        os.makedirs(os.path.join(out_dir, "pages"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "checkpoint"), exist_ok=True)
        robots = self._host_delays()
        RemoteShard = ray.remote(num_cpus=0.25)(FrontierShard)
        self.shards = [
            RemoteShard.remote(
                s,
                capacity=self.cfg.shard_capacity,
                round_ms=self.cfg.round_ms,
                max_per_host=self.cfg.max_per_host,
                host_delays=robots,
            )
            for s in range(self.cfg.num_shards)
        ]
        self.bucket_refs = (
            load_bucket_refs(corpus_dir) if self.cfg.corpus_in_object_store else None
        )
        # disk-mode locality routing: a small BucketCacheActor pool owns
        # the bucket cache (bucket % pool_size → owner), so each bucket
        # is read from storage once total, not once per fetch worker
        self.cache_actors = []
        n_cache = int(self.cfg.extra.get("bucket_cache_actors", 0))
        if n_cache and self.bucket_refs is None:
            from ..stages.fetch import BucketCacheActor

            RemoteCache = ray.remote(num_cpus=0.25)(BucketCacheActor)
            self.cache_actors = [
                RemoteCache.remote(corpus_dir, read_log=self.cfg.extra.get("disk_read_log"))
                for _ in range(n_cache)
            ]
        self.next_round = 0
        self.total_fetched = 0
        self.fetch_seq = 0
        self._stop = False
        self._writer = None  # background round-publish thread (throughput mode)
        self._writer_exc: Optional[BaseException] = None

    def _join_writer(self) -> None:
        """Join the background publish thread and FAIL LOUDLY if it raised:
        a publish error (disk full, rename failure) must not let run()
        return success while the round's pages were silently lost."""
        if self._writer is not None:
            self._writer.join()
            self._writer = None
            if self._writer_exc is not None:
                exc, self._writer_exc = self._writer_exc, None
                raise RuntimeError("background round publish failed") from exc

    def _robots_delays(self) -> Dict[str, int]:
        """Raw per-host crawl delays from robots.parquet (no salting)."""
        path = os.path.join(self.corpus_dir, "robots.parquet")
        if not os.path.exists(path):
            return {}
        t = pq.read_table(path, columns=["host", "crawl_delay_ms"])
        return dict(zip(t.column("host").to_pylist(), t.column("crawl_delay_ms").to_pylist()))

    def _host_delays(self) -> Dict[str, int]:
        delays = self._robots_delays()
        # per-salt politeness quota split: a host salted s ways lives on
        # up to s shards; each shard refills its bucket at 1/s of the
        # host rate so the host's aggregate crawl rate is preserved
        from ..state.robots import DEFAULT_DELAY_MS

        for h, s in self.cfg.hot_hosts.items():
            delays[h] = delays.get(h, DEFAULT_DELAY_MS) * max(1, int(s))
        return delays

    # ------------------------------------------------------------------ seeds
    def offer_seeds(self) -> None:
        t = pq.read_table(self.cfg.seeds_path or os.path.join(self.corpus_dir, "seeds.parquet"))
        urls = [normalize_url(u) for u in t.column("url").to_pylist()]
        prios = t.column("priority").to_pylist()
        arr = np.asarray(urls, dtype=object)
        hosts = hosts_of(arr)
        sid = _route_shards(arr, hosts, self.cfg.num_shards, self.cfg.hot_hosts)
        refs = []
        for s in range(self.cfg.num_shards):
            m = sid == s
            if m.any():
                refs.append(
                    self.shards[s].offer.remote(
                        list(arr[m]), [int(prios[i]) for i in np.nonzero(m)[0]], list(hosts[m])
                    )
                )
        ray.get(refs)
        self._finalize_all()

    # -------------------------------------------------- adaptive salting
    def salt_host(self, host: str, factor: int) -> None:
        """Salt a host that became hot MID-CRAWL across ``factor``
        consecutive shards — without breaking exact dedup.

        Unlike ``cfg.hot_hosts`` (fixed at birth, re-routes candidates),
        adaptive salting keeps candidate routing AND seen-set authority
        on the host's base shard; the base forwards new-unique urls to
        the salted queue shards at the round barrier (enqueue-only).
        Membership never moves, so the fetched set is identical to an
        unsalted run; only queue depth (and politeness quota, split
        1/factor per shard) spreads.  Effective from the next round;
        checkpoint-persisted in shard state, so resume keeps it."""
        if host in self.cfg.hot_hosts:
            raise ValueError(f"{host} already statically salted")
        base_delay = self._base_host_delay(host)
        new_delay = base_delay * max(1, int(factor))
        ray.get([s.set_host_delay.remote(host, new_delay) for s in self.shards])
        base = int(hash64([host])[0] % np.uint64(self.cfg.num_shards))
        ray.get(self.shards[base].enable_forwarding.remote(host, int(factor), self.cfg.num_shards))

    def _base_host_delay(self, host: str) -> int:
        from ..state.robots import DEFAULT_DELAY_MS

        return int(self._robots_delays().get(host, DEFAULT_DELAY_MS))

    def _finalize_all(self) -> list:
        """Round barrier: finalize every shard, then route any
        adaptive-salting forwards (refs only — url data stays in the
        object store) and wait for the enqueues, so forwarded urls are
        committed before the next select / checkpoint."""
        stats = ray.get([s.finalize_round.remote() for s in self.shards])
        by_target: Dict[int, list] = {}
        for st in stats:
            for t, refs in (st.pop("forwards", None) or {}).items():
                by_target.setdefault(t, []).extend(refs)
        if by_target:
            ray.get(
                [self.shards[t].enqueue_forwarded.remote(refs) for t, refs in by_target.items()]
            )
        return stats

    # ------------------------------------------------------------------ round
    def run_round(self, r: int) -> Dict[str, int]:
        """One crawl round.  The driver does O(num_shards) work only:
        URL-level data never leaves the shards / object store.

        Phase 1: shards pick their politeness-ready sets (counts back).
        Phase 2: shards emit Arrow blocks (bucket-grouped, size-capped)
        into the object store with fetch_seq pre-assigned from the
        shard-offset prefix sums.  Crawl order spec: (round, shard_id,
        priority, host, url) — fully deterministic given the fixed
        host→shard hash.
        """
        cfg = self.cfg
        phases: Dict[str, float] = {}
        t0 = time.perf_counter()
        counts = ray.get(
            [s.select_pick.remote(r, cfg.per_shard_budget) for s in self.shards]
        )
        total = int(sum(counts))
        phases["select"] = time.perf_counter() - t0
        if total == 0:
            return {"fetched": 0, "phases": phases}
        max_block_rows = int(cfg.extra.get("max_block_rows", 4096))
        starts = self.fetch_seq + np.concatenate([[0], np.cumsum(counts[:-1])]).astype(np.int64)
        self.fetch_seq += total
        ref_lists = ray.get(
            [
                s.emit_ready.remote(int(starts[i]), r, NUM_HOST_BUCKETS, max_block_rows)
                for i, s in enumerate(self.shards)
            ]
        )
        block_refs = [ref for refs in ref_lists for ref in refs]
        ds = ray.data.from_arrow_refs(block_refs)
        rows_sel = total
        phases["build_ready"] = time.perf_counter() - t0 - sum(phases.values())

        bloom_ref = None
        if cfg.bloom_prescreen:
            merged = None
            for raw in ray.get([s.bloom_bytes.remote() for s in self.shards]):
                bf = BloomFilter.from_bytes(raw)
                if merged is None:
                    merged = bf
                else:
                    merged.bits |= bf.bits
            bloom_ref = ray.put(merged.to_bytes())

        router = _Router(self.shards, cfg.num_shards, bloom_ref, cfg.hot_hosts)
        out = ds.map_batches(
            # stateless tasks + process-global cache: warm across rounds
            make_fetch_fn(
                self.corpus_dir,
                self.bucket_refs,
                cfg.extra.get("flaky"),
                page_store=cfg.extra.get("page_store")
                or (("bucket_cache", tuple(self.cache_actors)) if self.cache_actors else None),
                abort_file=cfg.abort_file,
                stop_trigger=cfg.extra.get("stop_trigger"),
                read_log=cfg.extra.get("disk_read_log"),
            ),
            batch_format="pyarrow",
            batch_size=None,
            num_cpus=1,
        )
        dead_dir = dead_tmp = None
        if cfg.max_retries > 0:
            dead_dir = os.path.join(self.out_dir, "dead_letter", f"round={r:05d}")
            dead_tmp = dead_dir + ".tmp"
            shutil.rmtree(dead_tmp, ignore_errors=True)
            out = out.map_batches(
                _RetrySplit(self.shards, cfg.num_shards, cfg.max_retries, cfg.hot_hosts, dead_tmp),
                batch_format="pyarrow",
            )
        out = out.map_batches(make_extract_stage(cfg.exclude_external), batch_format="pyarrow").map_batches(
            router, batch_format="pyarrow"
        )
        if cfg.enrich_spec:
            from ..pipelines.registry import build_pipeline

            out = build_pipeline(out, cfg.enrich_spec)
        round_dir = os.path.join(self.out_dir, "pages", f"round={r:05d}")
        tmp_dir = round_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        # pre-create: a round whose rows were ALL retried/dead-lettered
        # writes zero files, and the atomic publish still needs the dir
        os.makedirs(tmp_dir, exist_ok=True)

        def publish(routed):
            routed.write_parquet(tmp_dir)
            shutil.rmtree(round_dir, ignore_errors=True)
            os.rename(tmp_dir, round_dir)  # atomic publish → resumable output
            if dead_tmp is not None and os.path.isdir(dead_tmp):
                shutil.rmtree(dead_dir, ignore_errors=True)
                os.rename(dead_tmp, dead_dir)  # atomic dead-letter publish

        if self._execute_round(out, publish, cfg):
            # mid-round cancel: every shard rolled back, nothing
            # published, fetch_seq restored — the round never happened;
            # resume (or this object) re-runs it identically
            self.fetch_seq -= total
            shutil.rmtree(tmp_dir, ignore_errors=True)
            if dead_tmp is not None:
                shutil.rmtree(dead_tmp, ignore_errors=True)
            phases["aborted"] = time.perf_counter() - t0 - sum(phases.values())
            if cfg.events_file:
                from ..events import append_event

                append_event(cfg.events_file, event="round_aborted", round=r)
            return {
                "fetched": 0,
                "aborted": True,
                "phases": {k: round(v, 3) for k, v in phases.items()},
            }
        phases["pipeline"] = time.perf_counter() - t0 - sum(phases.values())

        stats = self._finalize_all()
        phases["finalize"] = time.perf_counter() - t0 - sum(phases.values())
        fetched_by_shard = [int(c) for c in counts]
        man = pa.table(
            {
                "round": pa.array([r] * len(stats), pa.int32()),
                "shard": pa.array(list(range(len(stats))), pa.int32()),
                "offered": pa.array([s["offered"] for s in stats], pa.int64()),
                "inserts": pa.array([s["inserts"] for s in stats], pa.int64()),
                "dupes_skipped": pa.array([s["dupes_skipped"] for s in stats], pa.int64()),
                "overflow_dropped": pa.array([s["overflow_dropped"] for s in stats], pa.int64()),
                "fetched": pa.array(fetched_by_shard, pa.int64()),
                "frontier_size": pa.array([s["frontier_size"] for s in stats], pa.int64()),
                "peak_rss_mb": pa.array([s.get("peak_rss_mb", 0) for s in stats], pa.int64()),
            },
            schema=MANIFEST_SCHEMA,
        )
        # atomic publish: live tails (iter_progress, jobs.iter_events)
        # read this partition concurrently — a direct write lets a reader
        # see a footer-less half-file (found by test_jobs event-stream)
        man_final = os.path.join(self.out_dir, "manifest", f"round={r:05d}.parquet")
        pq.write_table(man, man_final + ".tmp")
        os.replace(man_final + ".tmp", man_final)
        if cfg.events_file:
            # pushed AFTER the manifest partition is durably visible, so
            # an event-woken consumer reading the manifest never races it
            from ..events import append_event

            append_event(
                cfg.events_file,
                event="round",
                round=r,
                fetched=rows_sel,
                frontier_size=sum(s["frontier_size"] for s in stats),
            )
        if cfg.checkpoint:
            self._write_checkpoint(r)
            phases["checkpoint"] = time.perf_counter() - t0 - sum(phases.values())
        self.total_fetched += rows_sel
        return {
            "fetched": rows_sel,
            "frontier": sum(s["frontier_size"] for s in stats),
            "phases": {k: round(v, 3) for k, v in phases.items()},
        }

    def _execute_round(self, out, publish, cfg) -> bool:
        """Run the round's Dataset pipeline to its barrier.  Returns True
        if the round was aborted mid-flight by the stop token (fetch
        tasks raise CrawlAborted; all shards are rolled back here);
        genuine pipeline failures re-raise."""
        try:
            if cfg.checkpoint:
                # resumability contract: round r's pages must be published
                # before round r's checkpoint says it's done → synchronous
                publish(out)
            else:
                # throughput mode: the round BARRIER only needs the router
                # offers acknowledged (they happen during execution), not
                # the parquet write — materialize the routed blocks, then
                # write + publish on a background thread overlapped with
                # the next round's select/fetch (round order preserved by
                # joining the previous writer first)
                import threading

                routed = out.materialize()
                self._join_writer()

                def publish_capturing(r_):
                    try:
                        publish(r_)
                    except BaseException as e:  # surfaced by _join_writer
                        self._writer_exc = e

                self._writer = threading.Thread(target=publish_capturing, args=(routed,), daemon=True)
                self._writer.start()
            return False
        except Exception as e:
            # only the abort token converts a failure into a clean abort;
            # anything else (with no abort requested) is a real error.
            # Ray wraps the worker's CrawlAborted in RayTaskError whose
            # repr omits the cause — search the full rendered chain.
            if self._abort_requested() and "CrawlAborted" in f"{e!r}\n{e}":
                ray.get([s.abort_round.remote() for s in self.shards])
                return True
            raise

    # ------------------------------------------------------------- checkpoint
    def _write_checkpoint(self, r: int) -> None:
        ck_dir = os.path.join(self.out_dir, "checkpoint", f"round={r:05d}.tmp")
        os.makedirs(ck_dir, exist_ok=True)
        # shards write their own files in parallel — no blob transfer
        # through the object store, no serial driver-side write loop
        ray.get(
            [
                s.save_to.remote(os.path.join(ck_dir, f"shard={i:03d}.bin"))
                for i, s in enumerate(self.shards)
            ]
        )
        meta = {
            "round": r,
            "fetch_seq": self.fetch_seq,
            "total_fetched": self.total_fetched,
            "num_shards": self.cfg.num_shards,
            # routing-affecting config must survive resume: changing it
            # mid-crawl would silently re-route URLs to different shards
            "hot_hosts": self.cfg.hot_hosts,
        }
        with open(os.path.join(ck_dir, "meta.json"), "w") as f:
            json.dump(meta, f)
        final = ck_dir[: -len(".tmp")]
        shutil.rmtree(final, ignore_errors=True)
        os.rename(ck_dir, final)
        # keep only the latest checkpoint
        keep = os.path.basename(final)
        base = os.path.join(self.out_dir, "checkpoint")
        for d in os.listdir(base):
            if d != keep and not d.endswith(".tmp"):
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    @classmethod
    def resume(cls, corpus_dir: str, out_dir: str, cfg: Optional[CrawlConfig] = None) -> "Crawler":
        """Rebuild a crawler from the latest checkpoint under out_dir."""
        base = os.path.join(out_dir, "checkpoint")
        rounds = sorted(d for d in os.listdir(base) if not d.endswith(".tmp"))
        if not rounds:
            raise FileNotFoundError(f"no checkpoint under {base}")
        ck = os.path.join(base, rounds[-1])
        with open(os.path.join(ck, "meta.json")) as f:
            meta = json.load(f)
        if cfg is None:
            cfg = CrawlConfig()
        cfg.num_shards = meta["num_shards"]
        cfg.hot_hosts = meta.get("hot_hosts", {})
        obj = cls(corpus_dir, out_dir, cfg)
        ray.get(
            [
                obj.shards[s].load_from.remote(os.path.join(ck, f"shard={s:03d}.bin"))
                for s in range(cfg.num_shards)
            ]
        )
        obj.next_round = meta["round"] + 1
        obj.fetch_seq = meta["fetch_seq"]
        obj.total_fetched = meta["total_fetched"]
        return obj

    # -------------------------------------------------------------------- run
    def request_stop(self) -> None:
        """Ask the crawl to stop after the round in flight completes."""
        self._stop = True

    def _stop_requested(self) -> bool:
        return self._stop or bool(self.cfg.stop_file and os.path.exists(self.cfg.stop_file))

    def _abort_requested(self) -> bool:
        return bool(self.cfg.abort_file and os.path.exists(self.cfg.abort_file))

    def run(self) -> Dict[str, int]:
        # a resumed run re-opens the stream: drop any end-of-stream marker
        # from a previous (stopped/completed) run before publishing more
        try:
            os.remove(os.path.join(self.out_dir, "_COMPLETE"))
        except FileNotFoundError:
            pass
        if self.next_round == 0:
            self.offer_seeds()
        r = self.next_round
        rounds_run = 0
        stopped = False
        while r < self.cfg.max_rounds and self.total_fetched < self.cfg.max_pages:
            res = self.run_round(r)
            rounds_run += 1
            if res.get("aborted"):
                # mid-round cancel: round r rolled back, next_round stays
                # r — resume() (or this object, once the token clears)
                # re-runs it identically
                stopped = True
                break
            if res["fetched"] == 0:
                break
            r += 1
            self.next_round = r
            if self._stop_requested():
                stopped = True  # round published + checkpointed; clean exit
                break
        self._join_writer()  # all rounds durably published before returning
        # end-of-stream marker for live tails (the SSE "stream closed"
        # event): published only after every round is durably visible, so
        # iter_progress(stop_file=...) can drain-then-stop deterministically
        with open(os.path.join(self.out_dir, "_COMPLETE"), "w") as f:
            f.write(str(rounds_run))
        return {
            "rounds": rounds_run,
            "total_fetched": self.total_fetched,
            "last_round": r,
            "stopped": stopped,
        }

    def kill_shards(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
        for a in self.cache_actors:
            ray.kill(a)
        self.cache_actors = []


def read_crawl_output(out_dir: str) -> pa.Table:
    """All fetched pages across rounds, in fetch_seq order."""
    import glob

    files = sorted(glob.glob(os.path.join(out_dir, "pages", "round=*", "*.parquet")))
    if not files:
        return CRAWL_OUT_SCHEMA.empty_table()
    tbl = pa.concat_tables([pq.read_table(f) for f in files], promote_options="default")
    return tbl.sort_by("fetch_seq")


def iter_progress(
    out_dir: str,
    poll_s: float = 0.5,
    stop_after_idle: Optional[int] = None,
    stop_on_complete: bool = False,
):
    """Live progress tail — the reference's SSE/NDJSON job-progress
    stream (utils.py:272-300, job.py:396-516) re-expressed over the
    manifest partition: yields one dict per (round, shard) manifest row
    as round files are atomically published (rounds arrive in order
    because publishes are ordered).  Termination: with
    ``stop_on_complete`` the tail drains every published row and returns
    once the crawl's ``_COMPLETE`` end-of-stream marker exists (written
    by ``Crawler.run`` strictly AFTER the last round is durably visible
    — the deterministic "stream closed" event, load-independent);
    ``stop_after_idle`` N consecutive empty polls is the fallback for
    tailing a crawl some OTHER process may still be running (None = tail
    forever).  Safe to run in a separate process from the crawl — it
    only reads published files."""
    import glob as _glob
    import time as _time

    seen: set = set()
    idle = 0
    while True:
        # order matters: check the marker BEFORE globbing, so rows
        # published between glob and marker-check are never dropped —
        # if done was set first, this glob already sees every file
        done = stop_on_complete and os.path.exists(os.path.join(out_dir, "_COMPLETE"))
        files = sorted(_glob.glob(os.path.join(out_dir, "manifest", "round=*.parquet")))
        new = [f for f in files if f not in seen]
        if new:
            idle = 0
            for f in new:
                seen.add(f)
                for row in pq.read_table(f).to_pylist():
                    yield row
        else:
            idle += 1
            if stop_after_idle is not None and idle >= stop_after_idle:
                return
        if done:
            return
        if not new:
            _time.sleep(poll_s)


def read_dead_letters(out_dir: str) -> pa.Table:
    """All retry-exhausted urls across rounds (url, retries, lineage)."""
    import glob

    files = sorted(glob.glob(os.path.join(out_dir, "dead_letter", "round=*", "*.parquet")))
    if not files:
        return pa.schema(
            [
                ("fetch_seq", pa.int64()),
                ("round", pa.int32()),
                ("url", pa.string()),
                ("host", pa.string()),
                ("priority", pa.int32()),
                ("retries", pa.int32()),
            ]
        ).empty_table()
    return pa.concat_tables([pq.read_table(f) for f in files]).sort_by("fetch_seq")
