"""HTTP + SSE surface (server.py): status/list/cancel JSON endpoints
and the text/event-stream push channel with Last-Event-ID resume — all
registry-only (no Ray session), driven with stdlib urllib."""

import json
import os
import threading
import time
import urllib.error
import urllib.request

import pytest

from deepcrawl4ai_ray.events import append_event
from deepcrawl4ai_ray.jobs import _atomic_write_json
from deepcrawl4ai_ray.server import JobsHttpServer


def _mk_job(root, job_id, state="running", kind="query"):
    jd = os.path.join(root, job_id)
    os.makedirs(jd, exist_ok=True)
    _atomic_write_json(
        os.path.join(jd, "job.json"),
        {
            "id": job_id,
            "kind": kind,
            "state": state,
            "spec": {},
            "submitted_at": 1.0,
            "started_at": None,
            "finished_at": None,
            "error": None,
            "result": None,
            "out_dir": os.path.join(jd, "out"),
            "cancel_mode": "graceful",
        },
    )
    return jd


@pytest.fixture()
def srv(tmp_path):
    s = JobsHttpServer(str(tmp_path / "reg")).start()
    yield s
    s.stop()


def _get(srv, path, headers=None):
    req = urllib.request.Request(f"http://{srv.host}:{srv.port}{path}", headers=headers or {})
    return urllib.request.urlopen(req, timeout=30)


def _parse_sse(stream):
    """→ list of (last_id, event, data_dict) frames until EOF."""
    frames = []
    cur = {}
    for raw in stream:
        line = raw.decode("utf-8").rstrip("\n")
        if not line:
            if cur:
                frames.append(
                    (int(cur["id"]), cur["event"], json.loads(cur["data"]))
                )
                cur = {}
            continue
        k, _, v = line.partition(": ")
        cur[k] = v
    return frames


class TestJsonEndpoints:
    def test_list_status_404(self, srv):
        _mk_job(srv.registry.root, "j1", state="succeeded")
        with _get(srv, "/jobs") as r:
            jobs = json.loads(r.read())
        assert [j["id"] for j in jobs] == ["j1"]
        with _get(srv, "/jobs/j1") as r:
            assert json.loads(r.read())["state"] == "succeeded"
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(srv, "/jobs/nope")
        assert e.value.code == 404

    def test_cancel_queued_via_post(self, srv):
        _mk_job(srv.registry.root, "j2", state="queued")
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/jobs/j2/cancel", method="POST"
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["state"] == "cancelled"
        with _get(srv, "/jobs/j2") as r:
            assert json.loads(r.read())["state"] == "cancelled"


class TestSse:
    def test_stream_frames_and_termination(self, srv):
        jd = _mk_job(srv.registry.root, "j3")
        ev = os.path.join(jd, "events.jsonl")
        append_event(ev, event="state", id="j3", state="queued")
        append_event(ev, event="state", id="j3", state="running")

        def writer():
            time.sleep(0.1)
            append_event(ev, event="round", id="j3", round=0, fetched=10)
            append_event(ev, event="state", id="j3", state="succeeded")

        t = threading.Thread(target=writer)
        t.start()
        with _get(srv, "/jobs/j3/events") as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            frames = _parse_sse(r)
        t.join()
        kinds = [f[1] for f in frames]
        assert kinds == ["state", "state", "round", "state"]
        assert frames[-1][2]["state"] == "succeeded"
        ids = [f[0] for f in frames]
        assert ids == sorted(ids) and len(set(ids)) == len(ids)

    def test_last_event_id_resume(self, srv):
        jd = _mk_job(srv.registry.root, "j4")
        ev = os.path.join(jd, "events.jsonl")
        append_event(ev, event="state", id="j4", state="queued")
        append_event(ev, event="round", id="j4", round=0)
        append_event(ev, event="round", id="j4", round=1)
        append_event(ev, event="state", id="j4", state="succeeded")
        with _get(srv, "/jobs/j4/events") as r:
            all_frames = _parse_sse(r)
        # reconnect from the SECOND frame's id: only the suffix replays
        resume_id = all_frames[1][0]
        with _get(srv, "/jobs/j4/events", headers={"Last-Event-ID": str(resume_id)}) as r:
            rest = _parse_sse(r)
        assert [f[0] for f in rest] == [f[0] for f in all_frames[2:]]
        assert [f[1] for f in rest] == ["round", "state"]

    def test_sse_404_for_unknown_job(self, srv):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(srv, "/jobs/ghost/events")
        assert e.value.code == 404


class TestLiveJobIntegration:
    def test_sse_streams_a_real_crawl_job(self, tmp_path, ray_session):
        """End to end: submit a crawl through JobManager, consume its
        lifecycle over HTTP SSE while it runs — queued → running →
        round* → succeeded, stream EOF at terminal."""
        from deepcrawl4ai_ray.jobs import JobManager
        from deepcrawl4ai_ray.sources.corpus import ensure

        mgr = JobManager(str(tmp_path / "reg2"), max_workers=1)
        s = JobsHttpServer(mgr.root).start()
        try:
            jid = mgr.submit(
                "crawl", {"corpus": ensure("tiny"), "config": {"num_shards": 2}}
            )
            with _get(s, f"/jobs/{jid}/events?timeout=180") as r:
                frames = _parse_sse(r)
            states = [f[2]["state"] for f in frames if f[1] == "state"]
            assert states[0] == "queued" and states[-1] == "succeeded"
            assert any(f[1] == "round" for f in frames)
            # status endpoint agrees post-hoc
            with _get(s, f"/jobs/{jid}") as r:
                assert json.loads(r.read())["state"] == "succeeded"
        finally:
            s.stop()
            mgr.shutdown(wait=False)
