"""FrontierShard — one shard of the sharded URL frontier.

Holds, per shard (SURVEY.md §7 step 4; the reference has *no* frontier —
its jobs are explicit ≤100-URL lists, schemas.py:8 — this is the scale
generalization the north rule requires):

- a :class:`CuckooFilter` URL-seen set (the J4 contains+insert anti-join)
- a companion :class:`BloomFilter` (read-only snapshots are exported for
  batch-side pre-screening)
- per-host priority queues, bounded depth (O2 analog of the reference's
  queue caps, crawl.py:66 / monitor.py:16-18)
- per-host politeness token buckets on a *virtual* clock (T8 analog of
  actions.py:251-257 / redisCache.py:85-89), refill rate from the robots
  table's ``crawl_delay_ms``

Hosts are routed to shards by ``hash64(host) % num_shards``, so one
host's queue + politeness bucket live on exactly one shard.

Determinism: offers within a round accumulate into a pending pool keyed
by url with min-priority merge; ``finalize_round`` processes pending in
sorted url order.  This makes the seen set and all queue contents
independent of the (nondeterministic) arrival order of parallel offer
batches — the round barrier is the determinism boundary.  All ordering
tie-breaks are on ``(priority, host, url)``.

This is a plain class; the crawl driver wraps it with ``ray.remote``.
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.urlnorm import hash64
from ..state.bloom import BloomFilter
from ..state.cuckoo import CuckooFilter
from ..state.robots import DEFAULT_DELAY_MS
from ..state.tokenbucket import TokenBucket


class FrontierShard:
    def __init__(
        self,
        shard_id: int,
        capacity: int = 1 << 20,
        round_ms: int = 10_000,
        max_per_host: int = 10_000,
        host_delays: Optional[Dict[str, int]] = None,
    ):
        self.shard_id = shard_id
        self.round_ms = round_ms
        self.max_per_host = max_per_host
        self.seen = CuckooFilter(capacity, seed_shift=shard_id)
        self.bloom = BloomFilter(capacity, fp_rate=0.01)
        self.host_delays = host_delays or {}
        # host -> list[(priority, url)] — sorted lazily at select time
        self.queues: Dict[str, List[Tuple[int, str]]] = {}
        # non-empty-queue index: select() scans only hosts that actually
        # hold work, not every host ever seen (r1 review finding #5 — at
        # 10^7 hosts/shard the full scan was the round-time floor)
        self._ready: set = set()
        self.buckets: Dict[str, TokenBucket] = {}
        # round-local pending pool: url -> (priority, host)
        self._pending: Dict[str, Tuple[int, str]] = {}
        # retry path (reference utils.py:383-399 exponential backoff /
        # storage.py:200-235 3x retry, re-expressed round-synchronously):
        # url -> (priority, host, retries); enqueued at the round barrier
        # WITHOUT a seen-set check (the url is already seen — it's being
        # re-offered after a transient fetch failure)
        self._pending_retry: Dict[str, Tuple[int, str, int]] = {}
        self.retry_counts: Dict[str, int] = {}
        self._picked = None
        self._stats = dict(offered=0, inserts=0, dupes_skipped=0, overflow_dropped=0)
        # ADAPTIVE hot-host salting (the _route_shards docstring's
        # membership-authority-decoupled design, now real): this shard
        # stays the DEDUP AUTHORITY for its hosts — candidates keep
        # routing here, the cuckoo insert happens here — but new-unique
        # urls of a host in ``forward_salts`` are FORWARDED to queue
        # shard (shard_id + hash64(url) % s) % num_shards for
        # enqueue-only.  Exactness is preserved because membership never
        # moves; only queue placement (load) spreads.
        self.forward_salts: Dict[str, int] = {}
        self.num_peer_shards: int = 0
        # mid-round cancel support: snapshot of what select/emit consumed
        # this round (picked urls, touched bucket states, popped retry
        # counts) so abort_round() can restore the exact pre-round state;
        # cleared at finalize_round (the commit point)
        self._round_backup: Optional[dict] = None

    # -------------------------------------------------- adaptive salting
    def enable_forwarding(self, host: str, factor: int, num_shards: int) -> None:
        """Salt ``host`` across ``factor`` consecutive shards from this
        (base) shard, effective at the next round barrier."""
        self.forward_salts[host] = int(factor)
        self.num_peer_shards = int(num_shards)

    def set_host_delay(self, host: str, delay_ms: int) -> None:
        """Update a host's politeness delay (quota-split for salting);
        an existing bucket keeps its token level but refills at the new
        rate with the new per-round cap."""
        self.host_delays[host] = int(delay_ms)
        b = self.buckets.get(host)
        if b is not None:
            b.refill_per_ms = 1.0 / delay_ms
            b.capacity = max(1.0, self.round_ms / delay_ms)
            b.tokens = min(b.tokens, b.capacity)

    def enqueue_forwarded(self, refs: list) -> int:
        """Enqueue urls deduped by their base (authority) shard — no
        seen-set check here.  ``refs`` are ObjectRefs of (urls,
        priorities, host) tuples placed by base shards."""
        n_added = 0
        for ref in refs:
            urls, prios, host = ray.get(ref)
            q = self.queues.setdefault(host, [])
            for u, p in zip(urls, prios):
                if len(q) >= self.max_per_host:
                    self._stats["overflow_dropped"] += 1
                    continue
                q.append((int(p), u))
                n_added += 1
            if q:
                self._ready.add(host)
            else:
                self.queues.pop(host, None)
        return n_added

    def host_queue_depth(self, host: str) -> int:
        return len(self.queues.get(host, ()))

    # ------------------------------------------------------------------ offer
    def offer(self, urls: List[str], priorities: List[int], hosts: List[str]) -> int:
        """Accumulate candidates for this round (min-priority merge)."""
        pend = self._pending
        self._stats["offered"] += len(urls)
        for u, p, h in zip(urls, priorities, hosts):
            cur = pend.get(u)
            if cur is None or p < cur[0]:
                pend[u] = (int(p), h)
        return len(urls)

    def reoffer(self, urls: List[str], priorities: List[int], hosts: List[str], retries: List[int]) -> int:
        """Re-queue transiently-failed urls (bypasses the seen set).
        Accumulated round-locally, committed in finalize_round (same
        determinism barrier as first-time offers)."""
        pend = self._pending_retry
        for u, p, h, r in zip(urls, priorities, hosts, retries):
            cur = pend.get(u)
            if cur is None or r > cur[2]:
                pend[u] = (int(p), h, int(r))
        return len(urls)

    # --------------------------------------------------------------- finalize
    def finalize_round(self) -> Dict[str, int]:
        """Commit pending candidates: seen-set insert + queue push.

        Deterministic: pending processed in sorted-url order.  Returns
        and resets the round's stats (manifest row fields).
        """
        self._round_backup = None  # commit point: abort no longer possible
        pend = self._pending
        self._pending = {}
        fwd: Dict[Tuple[int, str], List[Tuple[str, int]]] = {}  # (target, host) → [(url, prio)]
        if pend:
            urls = sorted(pend)
            h = hash64(urls)
            new = self.seen.add_if_absent_many(h)
            self.bloom.add_many(h[new])
            dropped = 0
            for i, u in enumerate(urls):
                if not new[i]:
                    continue
                p, host = pend[u]
                s = self.forward_salts.get(host)
                if s:
                    # enqueue-only forwarding to the salted queue shard
                    # (deterministic per url; k=0 stays local)
                    target = (self.shard_id + int(h[i] % np.uint64(s))) % self.num_peer_shards
                    if target != self.shard_id:
                        fwd.setdefault((target, host), []).append((u, p))
                        continue
                q = self.queues.setdefault(host, [])
                if len(q) >= self.max_per_host:
                    dropped += 1  # bounded per-partition queue depth
                    continue
                q.append((p, u))
                self._ready.add(host)
            self._stats["inserts"] += int(new.sum())
            # dupes = within-round merged offers + already-seen urls
            self._stats["dupes_skipped"] += self._stats["offered"] - int(new.sum())
            self._stats["overflow_dropped"] += dropped
        retry_pend = self._pending_retry
        self._pending_retry = {}
        for u in sorted(retry_pend):  # deterministic commit order
            p, host, r = retry_pend[u]
            self.queues.setdefault(host, []).append((p, u))
            self._ready.add(host)
            self.retry_counts[u] = r
        import resource

        stats = dict(
            self._stats,
            frontier_size=self.frontier_size(),
            # A5 analog (reference tasks.py:372-379 memory delta/peak):
            # per-shard peak RSS, emitted into the lineage manifest
            peak_rss_mb=resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024,
        )
        self._stats = dict(offered=0, inserts=0, dupes_skipped=0, overflow_dropped=0)
        if fwd:
            # urls leave via the object store (one ref per (target, host)
            # batch); the DRIVER routes refs to targets — never
            # actor→actor blocking calls inside finalize (two salted
            # bases waiting on each other's enqueue ack would deadlock
            # single-threaded actors)
            by_target: Dict[int, list] = {}
            for (t, host), rows in fwd.items():
                by_target.setdefault(t, []).append(
                    ray.put(([u for u, _ in rows], [p for _, p in rows], host))
                )
            stats["forwards"] = by_target
        return stats

    # ----------------------------------------------------------------- select
    def select(self, round_index: int, budget: int) -> Dict[str, list]:
        """Pop the politeness-ready URLs for this round (≤ budget).

        Per host: quota = tokens available in its bucket at virtual time
        ``round_index * round_ms`` (bucket refills at 1/crawl_delay_ms).
        Hosts' candidates are merged and globally ordered by
        ``(priority, host, url)``; overflow beyond ``budget`` is pushed
        back.  Returns columnar lists (url, priority, host).
        """
        now_ms = round_index * self.round_ms
        picked: List[Tuple[int, str, str]] = []  # (priority, host, url)
        drained: List[str] = []
        backup = self._round_backup = {"buckets": {}, "retries": {}, "sel": None}
        for host in sorted(self._ready):
            q = self.queues[host]
            bucket = self.buckets.get(host)
            if bucket is None:
                delay = self.host_delays.get(host, DEFAULT_DELAY_MS)
                cap = max(1.0, self.round_ms / delay)
                bucket = TokenBucket(cap, 1.0 / delay, now_ms)
                self.buckets[host] = bucket
            backup["buckets"][host] = bucket.state()  # pre-take snapshot
            q.sort()  # (priority, url) — deterministic within host
            n = 0
            while n < len(q) and bucket.try_take(now_ms):
                n += 1
            if n:
                take, rest = q[:n], q[n:]
                if rest:
                    self.queues[host] = rest
                else:
                    del self.queues[host]
                    drained.append(host)
                picked.extend((p, host, u) for p, u in take)
        for host in drained:
            self._ready.discard(host)
        picked.sort()
        if len(picked) > budget:
            # push back the overflow (tokens are *not* refunded — the
            # politeness budget was spent; mirrors a busy fetcher)
            for p, host, u in picked[budget:]:
                self.queues.setdefault(host, []).append((p, u))
                self._ready.add(host)
            picked = picked[:budget]
        return {
            "url": [u for _, _, u in picked],
            "priority": [p for p, _, _ in picked],
            "host": [h for _, h, _ in picked],
        }

    # ------------------------------------------- distributed ready emission
    def select_pick(self, round_index: int, budget: int) -> int:
        """Phase 1: pick this round's politeness-ready URLs (held
        internally), return only the COUNT — the driver never touches
        URL-level data (O(shards), not O(pages), driver work)."""
        sel = self.select(round_index, budget)
        self._picked = sel
        if self._round_backup is not None:
            self._round_backup["sel"] = sel
        return len(sel["url"])

    def emit_ready(self, seq_start: int, round_index: int, num_buckets: int, max_block_rows: int):
        """Phase 2: materialize the picked set as Arrow blocks in the
        object store; fetch_seq = seq_start + local index.  Returns a
        list of ObjectRefs (small), ready for ray.data.from_arrow_refs.

        Global crawl order spec: (round, shard_id, priority, host, url)
        — deterministic because host→shard is a fixed hash.
        """
        from ..functions.urlnorm import host_buckets

        sel = self._picked
        self._picked = None
        n = len(sel["url"])
        if n == 0:
            return []
        hosts = np.asarray(sel["host"], dtype=object)
        if self.retry_counts:
            popped = {u: self.retry_counts.pop(u) for u in sel["url"] if u in self.retry_counts}
            if self._round_backup is not None:
                self._round_backup["retries"] = popped
            retries = [popped.get(u, 0) for u in sel["url"]]
        else:
            retries = np.zeros(n, dtype=np.int32)
        tbl = pa.table(
            {
                "fetch_seq": pa.array(seq_start + np.arange(n, dtype=np.int64)),
                "round": pa.array(np.full(n, round_index, dtype=np.int32)),
                "url": pa.array(sel["url"], pa.string()),
                "host": pa.array(sel["host"], pa.string()),
                "priority": pa.array(np.asarray(sel["priority"], dtype=np.int32)),
                "retries": pa.array(np.asarray(retries, dtype=np.int32)),
                "host_bucket": pa.array(host_buckets(hosts, num_buckets)),
            }
        )
        # group rows by host_bucket (page-store locality), slice to cap
        # block size (skew mitigation)
        idx = pc.sort_indices(tbl, sort_keys=[("host_bucket", "ascending")])
        tbl = tbl.take(idx)
        refs = []
        buckets_np = tbl.column("host_bucket").to_numpy()
        boundaries = np.nonzero(np.diff(buckets_np))[0] + 1
        start = 0
        for end in list(boundaries) + [n]:
            for off in range(start, end, max_block_rows):
                refs.append(ray.put(tbl.slice(off, min(max_block_rows, end - off))))
            start = end
        return refs

    # -------------------------------------------------- mid-round cancel
    def abort_round(self) -> int:
        """Roll the shard back to its pre-round state after a mid-round
        cancel (reference api.py:508-530 SIGTERM revoke, re-expressed as
        clean rollback): re-enqueue the picked urls, restore politeness
        bucket token levels and popped retry counts, discard the aborted
        round's pending offers/stats.  The round can then be re-run —
        from this process or from the previous checkpoint — with results
        identical to an uninterrupted run."""
        b = self._round_backup
        self._round_backup = None
        self._pending = {}
        self._pending_retry = {}
        self._picked = None
        self._stats = dict(offered=0, inserts=0, dupes_skipped=0, overflow_dropped=0)
        if b is None:
            return 0
        sel = b["sel"]
        if sel:
            for u, p, h in zip(sel["url"], sel["priority"], sel["host"]):
                self.queues.setdefault(h, []).append((int(p), u))
                self._ready.add(h)
        for host, st in b["buckets"].items():
            self.buckets[host] = TokenBucket.from_state(st)
        self.retry_counts.update(b["retries"])
        return len(sel["url"]) if sel else 0

    # ------------------------------------------------------------------ misc
    def frontier_size(self) -> int:
        return sum(len(q) for q in self.queues.values())

    def seen_count(self) -> int:
        return self.seen.count

    def bloom_bytes(self) -> bytes:
        return self.bloom.to_bytes()

    # ------------------------------------------------------------ checkpoint
    def serialize(self) -> bytes:
        return pickle.dumps(
            {
                "shard_id": self.shard_id,
                "round_ms": self.round_ms,
                "max_per_host": self.max_per_host,
                "seen": self.seen.to_bytes(),
                "bloom": self.bloom.to_bytes(),
                "host_delays": self.host_delays,
                "queues": self.queues,
                "buckets": {h: b.state() for h, b in self.buckets.items()},
                "retry_counts": self.retry_counts,
                "forward_salts": self.forward_salts,
                "num_peer_shards": self.num_peer_shards,
            },
            protocol=4,
        )

    @classmethod
    def restore(cls, data: bytes) -> "FrontierShard":
        d = pickle.loads(data)
        obj = cls.__new__(cls)
        obj.shard_id = d["shard_id"]
        obj.round_ms = d["round_ms"]
        obj.max_per_host = d["max_per_host"]
        obj.seen = CuckooFilter.from_bytes(d["seen"])
        obj.bloom = BloomFilter.from_bytes(d["bloom"])
        obj.host_delays = d["host_delays"]
        obj.queues = {h: q for h, q in d["queues"].items() if q}
        obj._ready = set(obj.queues)
        obj.buckets = {h: TokenBucket.from_state(s) for h, s in d["buckets"].items()}
        obj.retry_counts = d.get("retry_counts", {})
        obj.forward_salts = d.get("forward_salts", {})
        obj.num_peer_shards = d.get("num_peer_shards", 0)
        obj._pending = {}
        obj._pending_retry = {}
        obj._picked = None
        obj._round_backup = None
        obj._stats = dict(offered=0, inserts=0, dupes_skipped=0, overflow_dropped=0)
        return obj

    def load_checkpoint(self, data: bytes) -> int:
        """Restore state in place (for an already-created actor)."""
        other = FrontierShard.restore(data)
        self.__dict__.update(other.__dict__)
        return self.shard_id

    # shard-side checkpoint IO: the blob never crosses the object store —
    # each shard writes/reads its own file on the shared output FS (the
    # same shared-FS assumption the parquet sinks already make)
    def save_to(self, path: str) -> int:
        blob = self.serialize()
        with open(path, "wb") as f:
            f.write(blob)
        return len(blob)

    def load_from(self, path: str) -> int:
        with open(path, "rb") as f:
            return self.load_checkpoint(f.read())
