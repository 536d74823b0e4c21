"""Multi-job service surface — enqueue / status / cancel / list many
concurrent jobs by id (reference job.py:211-331 crawl_job_enqueue /
crawl_job_cancel / crawl_job_status and api.py:380-476), minus the
Redis + Celery transport.

Re-expressed for a Ray engine:

- each RUNNING job executes inside its own ``_JobWorker`` Ray ACTOR —
  the Ray-native analog of a Celery worker process.  The actor drives
  the job's Dataset pipelines from its own process, so concurrent jobs
  never share a Python thread (driving multiple Ray Data streaming
  executors from threads of one process is a known crash surface), and
  a job crash is contained to its actor.
- ONE dispatcher thread owns all driver-side Ray calls for the
  manager: it launches up to ``max_workers`` actors, ``ray.wait``s for
  completions, and promotes queued jobs in submit order.
- ALL state lives in a filesystem registry — one directory per job
  with an atomically-replaced ``job.json`` — so status/list/cancel work
  from ANY process, the way the reference's Redis hash does (on a real
  cluster the registry root belongs on shared storage; the actor and
  the manager both write it).

Job kinds:

- ``crawl``: a full frontier crawl (frontier/crawler.Crawler) into the
  job's directory.  Cancel is the crawler's own two cancel tokens —
  graceful (finish current round, publish, checkpoint; resume works) or
  preemptive (abort mid-round, shards roll back) — selected per job by
  ``cancel_mode``; cancelling just touches the token file, so it works
  cross-process exactly like the reference's revoke.
- ``query``: any pipelines/queries.QUERIES entry over an sf_dir, result
  written as parquet into the job dir.  Cancellable while queued; a
  RUNNING query job finishes its current pipeline (documented —
  Celery's revoke(terminate=False) has the same semantics).

States: queued → running → succeeded | failed | cancelled.
"""

from __future__ import annotations

import glob
import json
import os
import threading
import time
import uuid
from typing import Any, Dict, Iterator, List, Optional

import ray

from .events import EVENTS_FILE, append_event, tail_events

STATES = ("queued", "running", "succeeded", "failed", "cancelled")
TERMINAL = ("succeeded", "failed", "cancelled")


def _events_path(job_dir: str) -> str:
    return os.path.join(job_dir, EVENTS_FILE)


def _push_state(job_dir: str, job_id: str, state: str, **extra) -> None:
    append_event(_events_path(job_dir), event="state", id=job_id, state=state, **extra)


def _now() -> float:
    return time.time()


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, default=str)
    os.replace(tmp, path)


def _read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _update_json(path: str, **fields) -> dict:
    meta = _read_json(path)
    meta.update(fields)
    _atomic_write_json(path, meta)
    return meta


@ray.remote(num_cpus=0)
class _JobWorker:
    """One job's executor process (the Celery-worker analog).  Runs the
    job, owns its job.json state transitions from running → terminal,
    returns nothing — results land in the registry."""

    def run(self, job_dir: str, kind: str, spec: dict) -> str:
        import traceback

        meta_path = os.path.join(job_dir, "job.json")
        # honor a cross-process cancel that landed between the
        # dispatcher's queued-check and this actor starting: the cancel
        # already wrote the TERMINAL state + event, so flipping to
        # running here would both resurrect a cancelled job and append
        # events after the terminal one (breaking tail_events' contract).
        # (A sub-ms TOCTOU window remains between this read and the
        # write below — full closure needs file locking; the in-process
        # JobManager.cancel path is already lock-serialized.)
        if _read_json(meta_path).get("state") == "cancelled":
            return "cancelled"
        meta = _update_json(meta_path, state="running", started_at=_now())
        _push_state(job_dir, meta["id"], "running")
        try:
            if kind == "crawl":
                result = self._run_crawl(job_dir, spec)
            else:
                result = self._run_query(job_dir, spec)
            meta = _read_json(meta_path)
            state = "cancelled" if meta.get("cancel_requested") else "succeeded"
            _update_json(meta_path, state=state, finished_at=_now(), result=result)
            _push_state(job_dir, meta["id"], state)
        except Exception as e:  # noqa: BLE001 — job isolation: record, don't propagate
            _update_json(
                meta_path,
                state="failed",
                finished_at=_now(),
                error=f"{type(e).__name__}: {e}",
                traceback=traceback.format_exc()[-4000:],
            )
            _push_state(job_dir, _read_json(meta_path)["id"], "failed", error=f"{type(e).__name__}: {e}")
        return _read_json(meta_path)["state"]

    def _run_crawl(self, job_dir: str, spec: dict) -> dict:
        from .frontier.crawler import CrawlConfig, Crawler

        meta_path = os.path.join(job_dir, "job.json")
        out_dir = _read_json(meta_path)["out_dir"]
        cfg_kwargs = dict(spec.get("config") or {})
        cfg_kwargs["stop_file"] = os.path.join(job_dir, "_STOP")
        cfg_kwargs["abort_file"] = os.path.join(job_dir, "_ABORT")
        # crawl rounds push into the job's event log as they publish
        cfg_kwargs.setdefault("events_file", _events_path(job_dir))
        cfg = CrawlConfig(**cfg_kwargs)
        c = Crawler(spec["corpus"], out_dir, cfg)
        try:
            res = c.run()
        finally:
            c.kill_shards()
        if res.get("stopped"):
            # a touched cancel token is the only way stopped gets set here
            _update_json(meta_path, cancel_requested=True)
        return {k: v for k, v in res.items() if isinstance(v, (int, float, bool, str))}

    def _run_query(self, job_dir: str, spec: dict) -> dict:
        import pandas as pd
        import pyarrow as pa

        import ray.data as rd

        from .pipelines.queries import QUERIES

        rd.DataContext.get_current().enable_progress_bars = False
        out_dir = _read_json(os.path.join(job_dir, "job.json"))["out_dir"]
        os.makedirs(out_dir, exist_ok=True)
        res = QUERIES[spec["name"]](spec["sf_dir"])
        if isinstance(res, rd.Dataset):
            res.write_parquet(out_dir)
            import pyarrow.parquet as pq

            n = sum(
                pq.read_metadata(f).num_rows for f in glob.glob(os.path.join(out_dir, "*.parquet"))
            )
        else:
            if isinstance(res, pa.Table):
                res = res.to_pandas()
            assert isinstance(res, pd.DataFrame)
            res.to_parquet(os.path.join(out_dir, "result.parquet"), index=False)
            n = len(res)
        return {"rows": n, "out_dir": out_dir}


class JobRegistry:
    """Read/cancel view of a job registry directory — usable from ANY
    process (the reference's "any API replica can answer status/cancel
    because state is in Redis" property).  No Ray session, no threads."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, job_id: str) -> str:
        return os.path.join(self.root, job_id)

    def _meta_path(self, job_id: str) -> str:
        return os.path.join(self._dir(job_id), "job.json")

    def list_jobs(self) -> List[dict]:
        out = []
        for p in sorted(glob.glob(os.path.join(self.root, "*", "job.json"))):
            try:
                out.append(_read_json(p))
            except (OSError, json.JSONDecodeError):
                continue  # mid-replace race: the next poll sees it
        return out

    def status(self, job_id: str) -> dict:
        """job.json plus live progress for crawl jobs (rounds published,
        pages fetched — read from the atomically-published manifest, the
        same rows iter_progress streams)."""
        meta = _read_json(self._meta_path(job_id))
        if meta["kind"] == "crawl":
            import pyarrow.parquet as pq

            man = sorted(glob.glob(os.path.join(meta["out_dir"], "manifest", "round=*.parquet")))
            fetched = 0
            rounds = set()
            for f in man:
                t = pq.read_table(f, columns=["round", "fetched"])
                fetched += sum(t["fetched"].to_pylist())
                rounds.update(t["round"].to_pylist())
            meta["progress"] = {
                "rounds_published": len(rounds),
                "pages_fetched": fetched,
                "complete_marker": os.path.exists(os.path.join(meta["out_dir"], "_COMPLETE")),
            }
        return meta

    def cancel(self, job_id: str) -> dict:
        """Cancel by id (reference crawl_job_cancel), from ANY process.
        Queued jobs are marked cancelled (the owning dispatcher re-reads
        job.json before launching, so the mark sticks cross-process); a
        running crawl job gets its cancel token touched (graceful = stop
        after current round, preemptive = abort + rollback); a running
        query job finishes (documented — Celery revoke(terminate=False)
        semantics)."""
        meta = _read_json(self._meta_path(job_id))
        if meta["state"] == "queued":
            out = _update_json(self._meta_path(job_id), state="cancelled", finished_at=_now())
            _push_state(self._dir(job_id), job_id, "cancelled")
            return out
        if meta["state"] == "running" and meta["kind"] == "crawl":
            token = "_ABORT" if meta.get("cancel_mode") == "preemptive" else "_STOP"
            # token path is fixed at submit time — touching it from ANY
            # process cancels (the crawler polls it per round / mid-round)
            open(os.path.join(self._dir(job_id), token), "w").close()
            append_event(
                _events_path(self._dir(job_id)),
                event="cancel_requested",
                id=job_id,
                mode=meta.get("cancel_mode", "graceful"),
            )
            return _update_json(self._meta_path(job_id), cancel_requested=True)
        return meta  # terminal or uncancellable-running: no-op

    def wait(self, job_id: str, timeout: float = 300.0, poll_s: float = 0.2) -> dict:
        t0 = time.time()
        while time.time() - t0 < timeout:
            meta = _read_json(self._meta_path(job_id))
            if meta["state"] in ("succeeded", "failed", "cancelled"):
                return meta
            time.sleep(poll_s)
        raise TimeoutError(f"job {job_id} still {meta['state']} after {timeout}s")

    def iter_events(self, job_id: str, poll_s: float = 0.2) -> Iterator[dict]:
        """Push-style event stream for one job (reference SSE
        job.py:389-516): yields ``{"event": "state", ...}`` on every
        state change and, for crawl jobs, ``{"event": "progress", ...}``
        per published (round, shard) manifest row; returns when the job
        reaches a terminal state and all published rows are drained."""
        last_state = None
        seen_files: set = set()
        while True:
            meta = _read_json(self._meta_path(job_id))
            if meta["state"] != last_state:
                last_state = meta["state"]
                yield {"event": "state", "state": last_state, "id": job_id, "ts": _now()}
            terminal = last_state in ("succeeded", "failed", "cancelled")
            if meta["kind"] == "crawl":
                import pyarrow.parquet as pq

                files = sorted(
                    glob.glob(os.path.join(meta["out_dir"], "manifest", "round=*.parquet"))
                )
                for f in [x for x in files if x not in seen_files]:
                    seen_files.add(f)
                    for row in pq.read_table(f).to_pylist():
                        yield {"event": "progress", "id": job_id, **row}
            if terminal:
                return
            time.sleep(poll_s)

    def tail_job_events(
        self, job_id: str, from_offset: int = 0, timeout: Optional[float] = None
    ) -> Iterator[dict]:
        """PUSH-based event stream (reference SSE over Redis-stream XREAD,
        job.py:461-487): tail the job's append-only ``events.jsonl`` —
        every writer (manager submit, worker state transitions, crawler
        round publishes, cross-process cancels) appends one line, and
        this consumer does O(new bytes) work per wakeup: no job.json
        re-read, no manifest directory scan (what ``iter_events`` does).

        Events arrive strictly in append order; each carries ``offset``
        (the XREAD last_id analog) — pass it back as ``from_offset`` to
        resume after a disconnect without loss or replay.  Returns after
        the terminal ``state`` event.  Unknown job ids raise
        FileNotFoundError immediately (a typo'd id would otherwise block
        forever on a log that will never exist)."""
        if not os.path.exists(self._meta_path(job_id)):
            raise FileNotFoundError(f"no such job {job_id!r} under {self.root}")
        # a job already terminal only DRAINS: emit what exists past the
        # offset and return — never block waiting for events that will
        # not come (the EventSource-reconnect-after-EOF shape)
        from .events import read_events

        if _read_json(self._meta_path(job_id)).get("state") in TERMINAL:
            events, _ = read_events(_events_path(self._dir(job_id)), from_offset)
            yield from events
            return
        yield from tail_events(
            _events_path(self._dir(job_id)), from_offset=from_offset, timeout=timeout
        )


class JobManager(JobRegistry):
    """Filesystem-registry job manager over a shared Ray session.

    ``max_workers`` bounds how many jobs RUN at once (the reference's
    Celery worker concurrency); submissions beyond it queue in order.
    The manager owns no Ray session — per the driver contract the caller
    has already initialised Ray — and routes ALL its driver-side Ray
    calls (actor creation, ray.wait) through one dispatcher thread.
    """

    def __init__(self, root: str, max_workers: int = 4):
        super().__init__(root)
        self.max_workers = max_workers
        self._lock = threading.Lock()
        self._queue: List[tuple] = []  # (job_id, kind, spec) in submit order
        self._running: Dict[Any, str] = {}  # object ref -> job_id
        self._actors: Dict[str, Any] = {}  # job_id -> actor handle
        self._wake = threading.Event()
        self._closed = False
        self._dispatcher = threading.Thread(
            target=self._dispatch_loop, name="dc4r-job-dispatch", daemon=True
        )
        self._dispatcher.start()

    def submit(self, kind: str, spec: dict, job_id: Optional[str] = None) -> str:
        """Enqueue a job; returns its id immediately (reference
        crawl_job_enqueue → task id)."""
        if kind not in ("crawl", "query"):
            raise ValueError(f"unknown job kind {kind!r}")
        job_id = job_id or uuid.uuid4().hex[:12]
        jd = self._dir(job_id)
        if os.path.exists(self._meta_path(job_id)):
            raise ValueError(f"job id {job_id!r} already exists")
        os.makedirs(jd, exist_ok=True)
        meta = {
            "id": job_id,
            "kind": kind,
            "spec": spec,
            "state": "queued",
            "submitted_at": _now(),
            "started_at": None,
            "finished_at": None,
            "error": None,
            "result": None,
            "out_dir": spec.get("out_dir") or os.path.join(jd, "out"),
            "cancel_mode": spec.get("cancel_mode", "graceful"),
        }
        _atomic_write_json(self._meta_path(job_id), meta)
        _push_state(jd, job_id, "queued")
        with self._lock:
            self._queue.append((job_id, kind, spec))
        self._wake.set()
        return job_id

    def cancel(self, job_id: str) -> dict:
        with self._lock:  # serialize with the dispatcher's launch check
            return super().cancel(job_id)

    def shutdown(self, wait: bool = True) -> None:
        self._closed = True
        self._wake.set()
        if wait:
            self._dispatcher.join(timeout=60)
            with self._lock:
                refs = list(self._running)
            if refs:
                ray.wait(refs, num_returns=len(refs), timeout=120)

    # ---- dispatch (the ONLY thread making driver-side Ray calls) ---------

    def _dispatch_loop(self) -> None:
        while True:
            with self._lock:
                # launch queued jobs while worker slots are free
                while self._queue and len(self._running) < self.max_workers:
                    job_id, kind, spec = self._queue.pop(0)
                    # re-read the registry: a cancel (this process or any
                    # other) marks queued jobs cancelled before launch
                    try:
                        if _read_json(self._meta_path(job_id))["state"] != "queued":
                            continue
                    except (OSError, json.JSONDecodeError):
                        continue
                    actor = _JobWorker.remote()
                    self._actors[job_id] = actor
                    self._running[actor.run.remote(self._dir(job_id), kind, spec)] = job_id
                refs = list(self._running)
                closed = self._closed
            if not refs:
                if closed:
                    return
                self._wake.wait(timeout=0.2)
                self._wake.clear()
                continue
            done, _ = ray.wait(refs, num_returns=1, timeout=0.25)
            if done:
                with self._lock:
                    jid = self._running.pop(done[0], None)
                    actor = self._actors.pop(jid, None)
                try:
                    ray.get(done[0])  # actor never raises; reap the ref
                except Exception:  # noqa: BLE001 — actor died hard: record it
                    if jid is not None:
                        try:
                            meta = _read_json(self._meta_path(jid))
                            if meta["state"] in ("queued", "running"):
                                _update_json(
                                    self._meta_path(jid),
                                    state="failed",
                                    finished_at=_now(),
                                    error="job worker actor died",
                                )
                                _push_state(
                                    self._dir(jid), jid, "failed", error="job worker actor died"
                                )
                        except OSError:
                            pass
                if actor is not None:
                    ray.kill(actor, no_restart=True)
