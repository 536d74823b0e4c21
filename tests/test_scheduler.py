"""Scheduler daemon: continuous due-task promotion (reference
scrape.py:12-31 APScheduler loop + crawl.py:146-168 ZSET promotion),
re-expressed on a virtual clock — exactly-once, order, health gating,
checkpoint."""

import pyarrow as pa

from deepcrawl4ai_ray.stages.scheduler import SchedulerDaemon


def _pending_table(rows):
    return pa.table(
        {
            "task_id": pa.array([r[0] for r in rows], pa.string()),
            "ready_ts_ms": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


class TestSchedulerDaemon:
    def test_promotes_each_task_exactly_once_at_first_due_tick(self):
        rows = [("a", 5_000), ("b", 20_000), ("c", 20_001), ("d", 90_000)]
        tbl = _pending_table(rows)
        promoted = []
        d = SchedulerDaemon(lambda: tbl, lambda t: promoted.append(t), interval_ms=18_000)
        total = d.run_virtual(0, 100_000)
        assert total == 4
        flat = [i for t in promoted for i in t["task_id"].to_pylist()]
        assert sorted(flat) == ["a", "b", "c", "d"]
        assert len(flat) == len(set(flat))  # exactly once despite re-scans
        # first due tick: a at t=0? ready 5000 > 0 → tick 18000; b,c at 36000; d at 90000
        by_tick = {tuple(t["task_id"].to_pylist()) for t in promoted}
        assert ("a",) in by_tick and ("b", "c") in by_tick and ("d",) in by_tick

    def test_promotion_order_is_score_then_id(self):
        rows = [("z", 10), ("a", 10), ("m", 5)]
        tbl = _pending_table(rows)
        got = []
        d = SchedulerDaemon(lambda: tbl, lambda t: got.extend(t["task_id"].to_pylist()), interval_ms=1000)
        d.run_virtual(0, 2000)  # ticks at 0 (nothing due) and 1000 (all due)
        assert got == ["m", "a", "z"]  # (ready_ts, id) — ZSET score order

    def test_unhealthy_ticks_skip_then_backlog_drains(self):
        rows = [("a", 1_000), ("b", 2_000)]
        tbl = _pending_table(rows)
        promoted = []
        # unhealthy until t=50_000 (the reference's should_process gate)
        d = SchedulerDaemon(
            lambda: tbl,
            lambda t: promoted.extend(t["task_id"].to_pylist()),
            interval_ms=18_000,
            healthy=lambda now: now >= 50_000,
        )
        d.run_virtual(0, 40_000)
        assert promoted == [] and d.skipped_unhealthy == 3
        d.run_virtual(40_000, 80_000)
        assert promoted == ["a", "b"]  # whole backlog on the first healthy tick

    def test_checkpoint_roundtrip_prevents_duplicate_promotion(self):
        rows = [("a", 0), ("b", 100_000)]
        tbl = _pending_table(rows)
        p1 = []
        d1 = SchedulerDaemon(lambda: tbl, lambda t: p1.extend(t["task_id"].to_pylist()), interval_ms=10_000)
        d1.run_virtual(0, 20_000)
        assert p1 == ["a"]
        p2 = []
        d2 = SchedulerDaemon(lambda: tbl, lambda t: p2.extend(t["task_id"].to_pylist()), interval_ms=10_000)
        d2.load_state(d1.state())  # restart from checkpoint
        d2.run_virtual(20_000, 120_000)
        assert p2 == ["b"]  # 'a' not re-promoted

    def test_run_forever_wall_clock_smoke(self):
        """The production loop: injected now_fn, stop after 3 ticks."""
        rows = [("a", 0)]
        tbl = _pending_table(rows)
        promoted = []
        clock = {"now": 0, "ticks": 0}

        def now_fn():
            clock["now"] += 1
            return clock["now"]

        def stop():
            clock["ticks"] += 1
            return clock["ticks"] > 3

        d = SchedulerDaemon(
            lambda: tbl, lambda t: promoted.extend(t["task_id"].to_pylist()), interval_ms=1
        )
        d.run_forever(stop, now_fn=now_fn)
        assert promoted == ["a"]

    def test_intra_tick_duplicate_ids_promoted_once(self):
        """A task re-inserted with a newer ready_ts (two due rows, same
        id) must reach promote() once — earliest row wins."""
        t = pa.table(
            {
                "task_id": pa.array(["a", "a", "b"], pa.string()),
                "ready_ts_ms": pa.array([10, 500, 20], pa.int64()),
            }
        )
        got = []
        d = SchedulerDaemon(lambda: t, lambda x: got.extend(
            zip(x["task_id"].to_pylist(), x["ready_ts_ms"].to_pylist())
        ), interval_ms=1000)
        d.run_virtual(0, 2000)
        assert got == [("a", 10), ("b", 20)]
