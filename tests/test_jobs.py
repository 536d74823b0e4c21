"""Multi-job service surface (jobs.JobManager): enqueue/status/cancel
by id over a shared Ray session — reference job.py:211-331 semantics
minus the Redis/Celery transport."""

import json
import os
import time

import pandas as pd
import pytest

from deepcrawl4ai_ray.jobs import JobManager
from deepcrawl4ai_ray.sources.corpus import ensure

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def mgr(tmp_path, ray_session):
    m = JobManager(str(tmp_path / "jobs"), max_workers=2)
    yield m
    m.shutdown(wait=False)


class TestJobLifecycle:
    def test_query_job_succeeds(self, mgr):
        jid = mgr.submit("query", {"name": "q1_lineitem_agg", "sf_dir": SF})
        meta = mgr.wait(jid, timeout=120)
        assert meta["state"] == "succeeded"
        assert meta["result"]["rows"] > 0
        out = pd.read_parquet(meta["result"]["out_dir"])
        assert len(out) == meta["result"]["rows"]
        # status readable cross-"process" (fresh manager over same root)
        other = JobManager(mgr.root)
        assert other.status(jid)["state"] == "succeeded"
        other.shutdown(wait=False)

    def test_concurrent_jobs_and_list(self, mgr):
        a = mgr.submit("query", {"name": "q1_lineitem_agg", "sf_dir": SF})
        b = mgr.submit("crawl", {"corpus": ensure("tiny"), "config": {"num_shards": 2}})
        assert {j["id"] for j in mgr.list_jobs()} == {a, b}
        ma, mb = mgr.wait(a, timeout=120), mgr.wait(b, timeout=180)
        assert ma["state"] == "succeeded" and mb["state"] == "succeeded"
        st = mgr.status(b)
        assert st["progress"]["pages_fetched"] > 0
        assert st["progress"]["complete_marker"]

    def test_failed_job_records_error(self, mgr):
        jid = mgr.submit("query", {"name": "q1_lineitem_agg", "sf_dir": "/nonexistent"})
        meta = mgr.wait(jid, timeout=60)
        assert meta["state"] == "failed"
        assert meta["error"]

    def test_bad_kind_rejected(self, mgr):
        with pytest.raises(ValueError):
            mgr.submit("nonsense", {})

    def test_duplicate_id_rejected(self, mgr):
        jid = mgr.submit("query", {"name": "q1_lineitem_agg", "sf_dir": SF}, job_id="fixed")
        with pytest.raises(ValueError):
            mgr.submit("query", {"name": "q1_lineitem_agg", "sf_dir": SF}, job_id="fixed")
        mgr.wait(jid, timeout=120)


class TestCancel:
    def test_cancel_queued_job_never_runs(self, tmp_path, ray_session):
        # 1 worker: first job occupies it; the second stays queued
        m = JobManager(str(tmp_path / "jobs"), max_workers=1)
        try:
            a = m.submit("crawl", {"corpus": ensure("tiny"), "config": {"num_shards": 2}})
            b = m.submit("query", {"name": "q1_lineitem_agg", "sf_dir": SF})
            meta_b = m.cancel(b)
            assert meta_b["state"] == "cancelled"
            m.wait(a, timeout=180)
            meta_b = m.status(b)
            assert meta_b["state"] == "cancelled"
            assert meta_b["started_at"] is None  # never ran
            assert not os.path.exists(os.path.join(meta_b["out_dir"]))
        finally:
            m.shutdown(wait=False)

    def test_cancel_running_crawl_graceful(self, mgr):
        # many tiny rounds so the stop token lands mid-crawl
        jid = mgr.submit(
            "crawl",
            {
                "corpus": ensure("small"),
                "config": {"num_shards": 2, "per_shard_budget": 40, "max_rounds": 60},
            },
        )
        # wait until running and at least one round published
        t0 = time.time()
        while time.time() - t0 < 120:
            st = mgr.status(jid)
            if st["state"] == "running" and st.get("progress", {}).get("rounds_published", 0) >= 1:
                break
            time.sleep(0.1)
        mgr.cancel(jid)
        meta = mgr.wait(jid, timeout=180)
        assert meta["state"] == "cancelled"
        # graceful: published rounds are intact and resumable state exists
        st = mgr.status(jid)
        assert st["progress"]["pages_fetched"] > 0
        # the crawl stopped early (small corpus full crawl needs ~>8 rounds
        # at budget 40; cancellation must have cut it short of max_rounds)
        assert st["progress"]["rounds_published"] < 60

    def test_events_stream_terminates(self, mgr):
        jid = mgr.submit("crawl", {"corpus": ensure("tiny"), "config": {"num_shards": 2}})
        events = list(mgr.iter_events(jid, poll_s=0.1))
        kinds = [e["event"] for e in events]
        assert kinds.count("state") >= 2  # queued/running... → terminal
        assert any(e["event"] == "progress" for e in events)
        assert events[-1]["event"] == "state" or any(
            e["event"] == "state" and e["state"] == "succeeded" for e in events
        )
        assert json.dumps(events[0])  # events are json-able (the SSE contract)


class TestPushEvents:
    """tail_job_events: the append-only event log + blocking tail (the
    XREAD analog) — push, ordered, resume-safe, no status polling."""

    def test_unit_append_read_resume(self, tmp_path):
        from deepcrawl4ai_ray.events import append_event, read_events

        p = str(tmp_path / "ev.jsonl")
        append_event(p, event="a", n=1)
        append_event(p, event="b", n=2)
        evs, off = read_events(p)
        assert [e["event"] for e in evs] == ["a", "b"]
        assert all("ts" in e for e in evs)
        # resume from the recorded offset: only NEW events arrive
        append_event(p, event="c", n=3)
        evs2, off2 = read_events(p, from_offset=off)
        assert [e["event"] for e in evs2] == ["c"]
        assert off2 > off
        # torn final line (writer mid-append) is withheld, not mangled
        with open(p, "a") as f:
            f.write('{"event": "torn"')  # no newline, incomplete json
        evs3, off3 = read_events(p, from_offset=off2)
        assert evs3 == [] and off3 == off2
        with open(p, "a") as f:
            f.write(', "n": 4}\n')
        evs4, _ = read_events(p, from_offset=off3)
        assert [e["event"] for e in evs4] == ["torn"]

    def test_tail_is_push_not_status_poll(self, tmp_path):
        """Events flow through the log alone: a concurrent writer thread
        appends while the tail blocks — no job.json, no manifest dir
        exists at all, so nothing CAN be polled."""
        import threading

        from deepcrawl4ai_ray.events import append_event, tail_events

        p = str(tmp_path / "only_log.jsonl")

        def writer():
            append_event(p, event="state", state="running")
            for i in range(5):
                time.sleep(0.02)
                append_event(p, event="round", round=i)
            append_event(p, event="state", state="succeeded")

        t = threading.Thread(target=writer)
        t.start()
        got = list(tail_events(p, timeout=30))
        t.join()
        kinds = [e["event"] for e in got]
        assert kinds[0] == "state" and kinds[-1] == "state"
        assert [e["round"] for e in got if e["event"] == "round"] == list(range(5))
        # offsets strictly increase (append order == yield order)
        offs = [e["offset"] for e in got]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)

    def test_job_event_log_order_and_resume(self, mgr):
        jid = mgr.submit("crawl", {"corpus": ensure("tiny"), "config": {"num_shards": 2}})
        got = list(mgr.tail_job_events(jid, timeout=180))
        kinds = [e["event"] for e in got]
        states = [e["state"] for e in got if e["event"] == "state"]
        # strict lifecycle order, rounds strictly between running and terminal
        assert states[0] == "queued" and states[1] == "running"
        assert states[-1] == "succeeded"
        ri = [i for i, e in enumerate(got) if e["event"] == "round"]
        assert ri, "crawl rounds must push round events"
        run_i = kinds.index("state", 1)  # index of 'running'
        term_i = len(got) - 1
        assert all(run_i < i < term_i for i in ri)
        rounds = [got[i]["round"] for i in ri]
        assert rounds == sorted(rounds)
        # resume-safety: re-tailing from any event's offset replays exactly
        # the suffix after that event
        mid = got[len(got) // 2]
        rest = list(mgr.tail_job_events(jid, from_offset=mid["offset"], timeout=30))
        assert [e["offset"] for e in rest] == [e["offset"] for e in got[len(got) // 2 + 1 :]]

    def test_cancel_queued_pushes_terminal_event(self, tmp_path, ray_session):
        m = JobManager(str(tmp_path / "jobs2"), max_workers=1)
        try:
            # occupy the single worker slot so the next job stays queued
            a = m.submit("query", {"name": "q1_lineitem_agg", "sf_dir": SF})
            b = m.submit("query", {"name": "q1_lineitem_agg", "sf_dir": SF})
            m.cancel(b)
            got = list(m.tail_job_events(b, timeout=60))
            states = [e["state"] for e in got if e["event"] == "state"]
            assert states[0] == "queued" and states[-1] == "cancelled"
            m.wait(a, timeout=120)
        finally:
            m.shutdown(wait=False)


class TestReviewFixes:
    """r5 self-review hardening: corrupt-line skip, bad-id fail-fast,
    terminal drain without blocking."""

    def test_corrupt_complete_line_skipped_not_stalled(self, tmp_path):
        from deepcrawl4ai_ray.events import append_event, read_events

        p = str(tmp_path / "ev.jsonl")
        append_event(p, event="a")
        with open(p, "a") as f:
            f.write("NOT JSON AT ALL\n")  # complete but invalid line
            f.write("[1, 2, 3]\n")  # valid JSON, not an event dict
        append_event(p, event="b")
        evs, off = read_events(p)
        assert [e["event"] for e in evs] == ["a", "b"]
        # offset advanced PAST the corrupt lines (no permanent stall)
        evs2, _ = read_events(p, from_offset=off)
        assert evs2 == []

    def test_tail_unknown_job_raises_immediately(self, tmp_path, ray_session):
        m = JobManager(str(tmp_path / "jobsx"), max_workers=1)
        try:
            with pytest.raises(FileNotFoundError, match="no such job"):
                list(m.tail_job_events("nope"))
        finally:
            m.shutdown(wait=False)

    def test_terminal_job_drains_without_blocking(self, mgr):
        jid = mgr.submit("query", {"name": "q1_lineitem_agg", "sf_dir": SF})
        mgr.wait(jid, timeout=120)
        t0 = time.time()
        evs = list(mgr.tail_job_events(jid))  # no timeout needed: drains
        assert time.time() - t0 < 5
        states = [e["state"] for e in evs if e["event"] == "state"]
        assert states[-1] == "succeeded"
        # resume PAST the terminal event also returns immediately, empty
        t0 = time.time()
        rest = list(mgr.tail_job_events(jid, from_offset=evs[-1]["offset"]))
        assert rest == [] and time.time() - t0 < 5
