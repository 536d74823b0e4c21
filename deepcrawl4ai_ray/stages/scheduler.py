"""Continuous due-task promotion loop — the reference's scheduler daemon.

Reference semantics (scrape.py:12-31): an APScheduler job fires every
18 s, and when the system is healthy (should_process_tasks,
scrape.py:24-31: queue below cap, error rate sane) promotes every ZSET
task with score <= now to the work list (crawl.py:146-168
process_scheduled_tasks: ZRANGEBYSCORE 0..now, then ZREM + RPUSH).

Batch-engine re-expression: ticks on an INJECTED clock (virtual in
tests — deterministic, no sleeping; wall clock in production via
``run_forever``).  Each tick selects pending rows with
``ready_ts_ms <= now`` and hands them to ``promote`` exactly once per
task id (the ZREM analog is a promoted-id seen set, checkpointable).
Unhealthy ticks skip — the backlog drains on the next healthy tick,
matching the reference's behavior.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, List, Optional

import pyarrow as pa
import pyarrow.compute as pc


class SchedulerDaemon:
    def __init__(
        self,
        pending: Callable[[], pa.Table],
        promote: Callable[[pa.Table], None],
        interval_ms: int = 18_000,
        healthy: Optional[Callable[[int], bool]] = None,
        id_col: str = "task_id",
        ts_col: str = "ready_ts_ms",
    ):
        self.pending = pending
        self.promote = promote
        self.interval_ms = int(interval_ms)
        self.healthy = healthy or (lambda now_ms: True)
        self.id_col = id_col
        self.ts_col = ts_col
        self.promoted: set = set()
        self.ticks = 0
        self.skipped_unhealthy = 0

    def tick(self, now_ms: int) -> int:
        """One scheduler firing at virtual time ``now_ms``; returns the
        number of tasks promoted (0 when unhealthy or nothing due)."""
        self.ticks += 1
        if not self.healthy(now_ms):
            self.skipped_unhealthy += 1
            return 0
        t = self.pending()
        if t is None or t.num_rows == 0:
            return 0
        due = t.filter(pc.less_equal(t[self.ts_col], pa.scalar(now_ms, t[self.ts_col].type)))
        if due.num_rows == 0:
            return 0
        ids = due[self.id_col].to_pylist()
        fresh = [i not in self.promoted for i in ids]
        if not any(fresh):
            return 0
        due = due.filter(pa.array(fresh))
        # deterministic promotion order: (ready_ts, id) — the ZSET's
        # score order with a stable tie-break
        due = due.take(
            pc.sort_indices(due, sort_keys=[(self.ts_col, "ascending"), (self.id_col, "ascending")])
        )
        # intra-tick dedup: a task re-inserted with a newer ready_ts can
        # appear on two due rows; keep the first (earliest) so exactly-once
        # holds WITHIN a tick too, not just across ticks
        seen_tick: set = set()
        keep = []
        for i in due[self.id_col].to_pylist():
            keep.append(i not in seen_tick)
            seen_tick.add(i)
        if not all(keep):
            due = due.filter(pa.array(keep))
        self.promote(due)
        self.promoted.update(due[self.id_col].to_pylist())
        return due.num_rows

    def run_virtual(self, start_ms: int, end_ms: int) -> int:
        """Deterministic tick loop on the virtual clock (tests / replay):
        fires at start, start+interval, ... < end.  Returns total
        promoted."""
        total = 0
        for now in range(int(start_ms), int(end_ms), self.interval_ms):
            total += self.tick(now)
        return total

    def run_forever(self, stop: Callable[[], bool], now_fn: Callable[[], int] = None) -> int:
        """Wall-clock daemon loop (production): tick, sleep interval,
        until ``stop()``.  ``now_fn`` injectable for tests."""
        now_fn = now_fn or (lambda: int(time.time() * 1000))
        total = 0
        while not stop():
            total += self.tick(now_fn())
            time.sleep(self.interval_ms / 1000.0)
        return total

    # ------------------------------------------------------------ checkpoint
    def state(self) -> Dict:
        return {"promoted": sorted(self.promoted)}

    def load_state(self, st: Dict) -> None:
        self.promoted = set(st["promoted"])
