"""Append-only JSONL event log + blocking tail — the push-based event
channel (reference: the SSE framing at job.py:461-487 over Redis-stream
XREAD, utils.py:305-380), minus Redis.

Writers (job manager, job worker actor, crawler rounds) APPEND one JSON
line per event with a single ``O_APPEND`` ``write()`` — atomic on a
local/POSIX filesystem, so concurrent writers from different processes
interleave whole lines, never bytes.  Readers tail the file: each
yielded event carries the byte ``offset`` where the NEXT event starts —
the XREAD ``last_id`` analog — so a disconnected consumer resumes
exactly where it left off (``from_offset``) without replay or loss.

Unlike a status poll, the tail does O(new bytes) work per wakeup — it
re-reads nothing: no job.json, no manifest directory scan.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator, Optional

EVENTS_FILE = "events.jsonl"


def append_event(path: str, **fields) -> dict:
    """Append one event line (adds ``ts``).  One write() call —
    concurrent appenders from any process interleave whole lines."""
    fields.setdefault("ts", time.time())
    data = (json.dumps(fields, default=str) + "\n").encode("utf-8")
    fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
    try:
        # loop on short writes (signal interruption / disk pressure): a
        # partial line would otherwise sit torn in the log forever
        view = memoryview(data)
        while view:
            n = os.write(fd, view)
            view = view[n:]
    finally:
        os.close(fd)
    return fields


def read_events(path: str, from_offset: int = 0) -> tuple:
    """One non-blocking drain: parse complete lines from ``from_offset``
    to EOF → (events, next_offset).  A torn final line (writer mid-
    append) is left for the next call — ``next_offset`` never points
    into the middle of an event."""
    try:
        size = os.path.getsize(path)
    except OSError:
        return [], from_offset
    if size <= from_offset:
        return [], from_offset
    with open(path, "rb") as f:
        f.seek(from_offset)
        buf = f.read(size - from_offset)
    events = []
    consumed = 0
    for raw in buf.split(b"\n"):
        end = consumed + len(raw) + 1
        if end > len(buf):  # no trailing newline yet: torn write, retry later
            break
        try:
            ev = json.loads(raw)
        except json.JSONDecodeError:
            # a COMPLETE (newline-terminated) but invalid line is corrupt,
            # not torn — skip past it, otherwise every tail stalls at this
            # offset forever in a busy poll
            consumed = end
            continue
        if not isinstance(ev, dict):  # valid JSON but not an event: skip
            consumed = end
            continue
        ev["offset"] = from_offset + end
        events.append(ev)
        consumed = end
    return events, from_offset + consumed


def tail_events(
    path: str,
    from_offset: int = 0,
    poll_s: float = 0.05,
    stop_states: tuple = ("succeeded", "failed", "cancelled"),
    timeout: Optional[float] = None,
) -> Iterator[dict]:
    """Blocking tail: yield events in append order from ``from_offset``,
    waking on file growth (size check — O(1) stat, no content re-read).
    Returns after yielding a ``state`` event whose state is terminal
    (writers append terminal state strictly after the job's last
    progress event).  ``timeout`` bounds total wait (None = forever)."""
    t0 = time.time()
    off = from_offset
    while True:
        events, off = read_events(path, off)
        terminal = False
        for ev in events:
            yield ev
            if ev.get("event") == "state" and ev.get("state") in stop_states:
                terminal = True
        if terminal:
            return
        if timeout is not None and time.time() - t0 > timeout:
            raise TimeoutError(f"tail_events({path}): no terminal state after {timeout}s")
        if not events:
            time.sleep(poll_s)
