"""Minimal HTTP surface over the job registry — the reference's FastAPI
status/SSE endpoints (`/root/reference/job.py:389-516` SSE framing,
`api.py:380-476` status/cancel) re-expressed stdlib-only over the
filesystem registry + append-only event log:

    GET  /jobs                       → JSON list (registry.list_jobs)
    GET  /jobs/<id>                  → status JSON (+ crawl progress)
    POST /jobs/<id>/cancel           → cancel (queued kill / crawl token)
    GET  /jobs/<id>/events           → text/event-stream (SSE)

The SSE stream is the PUSH channel: each frame is

    id: <byte offset after this event>
    event: <event name>
    data: <event json>

so a dropped consumer reconnects with the standard ``Last-Event-ID``
header (or ``?from_offset=N``) and resumes exactly — the browser
EventSource contract, backed by events.tail_events' offset cursor.  The
stream ends after the terminal ``state`` event (the reference's
``[DONE]`` analog is the clean EOF).

Registry-only: no Ray session is needed to serve — any process on a
node with the registry directory (shared storage on a cluster) can
answer, the same property the reference gets from Redis.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .jobs import JobRegistry


def _make_handler(registry: JobRegistry):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet by default
            pass

        # ----- helpers ------------------------------------------------
        def _json(self, obj, code: int = 200) -> None:
            body = json.dumps(obj, default=str).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _not_found(self) -> None:
            self._json({"error": "not found"}, 404)

        def _job_id(self, parts):
            return parts[1] if len(parts) >= 2 else None

        # ----- routes -------------------------------------------------
        def do_GET(self) -> None:  # noqa: N802 (stdlib casing)
            url = urlparse(self.path)
            parts = [p for p in url.path.split("/") if p]
            try:
                if parts == ["jobs"]:
                    return self._json(registry.list_jobs())
                if len(parts) == 2 and parts[0] == "jobs":
                    try:
                        return self._json(registry.status(parts[1]))
                    except FileNotFoundError:
                        return self._not_found()
                if len(parts) == 3 and parts[0] == "jobs" and parts[2] == "events":
                    return self._sse(parts[1], url)
            except (BrokenPipeError, ConnectionResetError):
                return  # client went away mid-stream
            except TimeoutError:
                return  # tail timeout: stream simply ends (client reconnects
                # with Last-Event-ID; a terminal job drains without blocking)
            self._not_found()

        def do_POST(self) -> None:  # noqa: N802
            parts = [p for p in urlparse(self.path).path.split("/") if p]
            if len(parts) == 3 and parts[0] == "jobs" and parts[2] == "cancel":
                try:
                    return self._json(registry.cancel(parts[1]))
                except FileNotFoundError:
                    return self._not_found()
            self._not_found()

        # ----- SSE ----------------------------------------------------
        def _sse(self, job_id: str, url) -> None:
            import os as _os

            if not _os.path.exists(registry._meta_path(job_id)):
                return self._not_found()
            q = parse_qs(url.query)
            # standard EventSource resume header wins; ?from_offset is
            # the curl-friendly spelling
            off = int(
                self.headers.get("Last-Event-ID")
                or (q.get("from_offset") or ["0"])[0]
            )
            timeout = float((q.get("timeout") or ["300"])[0])
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()
            for ev in registry.tail_job_events(job_id, from_offset=off, timeout=timeout):
                frame = (
                    f"id: {ev['offset']}\n"
                    f"event: {ev.get('event', 'message')}\n"
                    f"data: {json.dumps(ev, default=str)}\n\n"
                )
                self.wfile.write(frame.encode("utf-8"))
                self.wfile.flush()

    return Handler


class JobsHttpServer:
    """Threaded HTTP server over a registry root.  ``port=0`` binds an
    ephemeral port (read it back from ``.port`` — the test/CI shape)."""

    def __init__(self, root: str, host: str = "127.0.0.1", port: int = 0):
        self.registry = JobRegistry(root)
        self._httpd = ThreadingHTTPServer((host, port), _make_handler(self.registry))
        self._httpd.daemon_threads = True
        self.host = host
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "JobsHttpServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="dc4r-jobs-http", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=10)


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description="serve a job registry over HTTP (+SSE)")
    ap.add_argument("--root", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8750)
    args = ap.parse_args(argv)
    srv = JobsHttpServer(args.root, args.host, args.port).start()
    print(json.dumps({"serving": f"http://{srv.host}:{srv.port}", "root": args.root}), flush=True)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        srv.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
