"""CLI entrypoint — the ``ray job submit`` surface (SURVEY.md §7 step 9).

    python -m deepcrawl4ai_ray gen-corpus --tier bench
    python -m deepcrawl4ai_ray crawl --corpus /tmp/dc4r_corpus/tiny --out /tmp/crawl
    python -m deepcrawl4ai_ray crawl --resume --corpus ... --out ...
    python -m deepcrawl4ai_ray query q1_lineitem_agg --sf-dir /root/testdata/sf0.01

Owns a Ray session only when one isn't already running (guarded init),
per the driver contract.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def main(argv=None):
    p = argparse.ArgumentParser(prog="deepcrawl4ai_ray")
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-corpus", help="generate a synthetic web corpus tier", parents=[common])
    g.add_argument("--tier", choices=["tiny", "small", "bench", "benchx3"], default="tiny")
    g.add_argument("--out", default=None)
    g.add_argument("--force", action="store_true")

    c = sub.add_parser("crawl", help="run (or resume) a crawl", parents=[common])
    c.add_argument("--corpus", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--num-shards", type=int, default=4)
    c.add_argument("--max-rounds", type=int, default=50)
    c.add_argument("--per-shard-budget", type=int, default=2000)
    c.add_argument("--round-ms", type=int, default=10_000)
    c.add_argument("--bloom-prescreen", action="store_true")
    c.add_argument("--no-checkpoint", action="store_true")
    c.add_argument("--max-retries", type=int, default=0)
    c.add_argument("--stop-file", default=None, help="touch this file to stop after the current round")
    c.add_argument("--abort-file", default=None, help="touch this file to abort the in-flight round (rolls back; resume re-runs it)")
    c.add_argument("--http-gateway", default=None, help="fetch pages over this HTTP gateway (HttpPageStore) instead of the corpus parquet")
    c.add_argument("--bucket-cache-actors", type=int, default=0, help="disk-mode locality: route bucket reads through N cache actors")
    c.add_argument(
        "--enrich",
        default=None,
        help="FUSE extract/enrich into the crawl rounds: JSON step spec "
        '(e.g. \'[{"step": "enrich_fingerprints"}]\') applied to page '
        "rows before each round's atomic publish",
    )
    c.add_argument(
        "--events-file",
        default=None,
        help="append one JSON event line here per published round (the "
        "push channel `jobs events` tails)",
    )

    t = sub.add_parser("tail", help="stream crawl progress as NDJSON (manifest tail)")
    t.add_argument("--out", required=True)
    t.add_argument("--poll-s", type=float, default=0.5)
    t.add_argument("--idle-limit", type=int, default=None, help="stop after N empty polls (default: forever)")
    t.add_argument(
        "--follow",
        action="store_true",
        help="keep tailing past a _COMPLETE marker (for crawls another "
        "process may resume: a STALE marker from a previous stopped run "
        "would otherwise end the tail immediately)",
    )

    q = sub.add_parser("query", help="run a registered pipeline", parents=[common])
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    # multi-job registry surface (jobs.JobManager; reference job.py API)
    j = sub.add_parser("jobs", help="job registry: status/list/cancel by id; run a batch")
    jsub = j.add_subparsers(dest="jobs_cmd", required=True)
    js = jsub.add_parser("status", help="print one job's job.json + live progress")
    js.add_argument("--root", required=True)
    js.add_argument("job_id")
    jl = jsub.add_parser("list", help="list all jobs in a registry")
    jl.add_argument("--root", required=True)
    jc = jsub.add_parser("cancel", help="cancel a job by id (touches the crawl cancel token)")
    jc.add_argument("--root", required=True)
    jc.add_argument("job_id")
    jr = jsub.add_parser(
        "run-batch",
        help="enqueue jobs from a JSON file ([{kind, spec}, ...]) and wait for all",
        parents=[common],
    )
    jr.add_argument("--root", required=True)
    jr.add_argument("--max-workers", type=int, default=4)
    jr.add_argument("batch_file")
    je = jsub.add_parser(
        "events",
        help="PUSH-tail a job's append-only event log as NDJSON (the "
        "XREAD analog; resume with --from-offset)",
    )
    je.add_argument("--root", required=True)
    je.add_argument("job_id")
    je.add_argument("--from-offset", type=int, default=0)
    je.add_argument("--timeout", type=float, default=None)

    sv = sub.add_parser(
        "serve",
        help="HTTP surface over a job registry: status/list/cancel JSON + "
        "SSE event streams (server.py; reference job.py SSE framing)",
    )
    sv.add_argument("--root", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8750)

    args = p.parse_args(argv)

    if args.cmd == "gen-corpus":
        from .sources.corpus import default_dir, generate

        out = args.out or default_dir(args.tier)
        generate(out, args.tier, force=args.force)
        print(json.dumps({"corpus": out, "tier": args.tier}))
        return 0

    if args.cmd == "crawl":
        _ensure_ray(args.num_cpus)
        from .frontier.crawler import Crawler, CrawlConfig

        cfg = CrawlConfig(
            num_shards=args.num_shards,
            max_rounds=args.max_rounds,
            per_shard_budget=args.per_shard_budget,
            round_ms=args.round_ms,
            bloom_prescreen=args.bloom_prescreen,
            checkpoint=not args.no_checkpoint,
            max_retries=args.max_retries,
            stop_file=args.stop_file,
            abort_file=args.abort_file,
            enrich_spec=json.loads(args.enrich) if args.enrich else [],
            events_file=args.events_file,
        )
        if args.http_gateway and args.bucket_cache_actors:
            p.error("--http-gateway and --bucket-cache-actors are mutually exclusive: "
                    "the HTTP transport replaces the disk-bucket read path entirely")
        if args.http_gateway:
            cfg.extra["page_store"] = ("http", args.http_gateway)
            cfg.corpus_in_object_store = False  # transport replaces the corpus read
        if args.bucket_cache_actors:
            cfg.extra["bucket_cache_actors"] = args.bucket_cache_actors
            cfg.corpus_in_object_store = False
        if args.resume:
            crawler = Crawler.resume(args.corpus, args.out, cfg)
        else:
            crawler = Crawler(args.corpus, args.out, cfg)
        res = crawler.run()
        crawler.kill_shards()
        print(json.dumps(res))
        return 0

    if args.cmd == "tail":
        # no Ray needed: reads published manifest files only (K5/SSE analog)
        from .frontier.crawler import iter_progress

        for row in iter_progress(
            args.out,
            poll_s=args.poll_s,
            stop_after_idle=args.idle_limit,
            stop_on_complete=not args.follow,  # default: exit on end-of-stream marker
        ):
            print(json.dumps(row), flush=True)
        return 0

    if args.cmd == "query":
        _ensure_ray(args.num_cpus)
        from .pipelines.queries import QUERIES

        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}; available: {sorted(QUERIES)}", file=sys.stderr)
            return 2
        out = QUERIES[args.name](args.sf_dir)
        if hasattr(out, "to_pandas"):  # Dataset / Arrow results
            out = out.to_pandas()
        print(out.to_string() if hasattr(out, "to_string") else out)
        return 0

    if args.cmd == "serve":
        from .server import main as serve_main

        return serve_main(
            ["--root", args.root, "--host", args.host, "--port", str(args.port)]
        )

    if args.cmd == "jobs":
        from .jobs import JobManager

        if args.jobs_cmd == "events":
            # push tail: no Ray session, no polling of job.json — pure
            # O(new bytes) reads of the append-only log
            from .jobs import JobRegistry

            reg = JobRegistry(args.root)
            for ev in reg.tail_job_events(
                args.job_id, from_offset=args.from_offset, timeout=args.timeout
            ):
                print(json.dumps(ev, default=str), flush=True)
            return 0

        if args.jobs_cmd in ("status", "list", "cancel"):
            # registry-only operations: no Ray session needed (the cancel
            # token is a file the running crawl polls — cross-process)
            from .jobs import JobRegistry

            reg = JobRegistry(args.root)
            if args.jobs_cmd == "list":
                print(json.dumps(reg.list_jobs(), default=str))
            elif args.jobs_cmd == "status":
                print(json.dumps(reg.status(args.job_id), default=str))
            else:
                print(json.dumps(reg.cancel(args.job_id), default=str))
            return 0

        # run-batch owns a Ray session + a live manager
        _ensure_ray(args.num_cpus)
        with open(args.batch_file) as f:
            batch = json.load(f)
        mgr = JobManager(args.root, max_workers=args.max_workers)
        ids = [mgr.submit(item["kind"], item["spec"], job_id=item.get("id")) for item in batch]
        out = [mgr.wait(jid, timeout=3600) for jid in ids]
        mgr.shutdown()
        print(json.dumps(out, default=str))
        return 0 if all(m["state"] == "succeeded" for m in out) else 1

    return 2


if __name__ == "__main__":
    sys.exit(main())
