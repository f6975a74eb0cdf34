"""``ray job submit``-able crawl entrypoint (SURVEY.md §7 phase 4).

Runs the full crawl loop from a Larbin conf file over a pages Parquet
table, with checkpoint/resume so a killed job continues without
re-fetching:

    ray job submit --working-dir . -- \
        python -m larbin_ray --conf larbin.conf --pages pages.parquet \
            --out /data/crawl_out --checkpoint /data/crawl_ckpt --resume

On a workstation the same command runs standalone (Ray auto-inits a
local cluster).  The reference equivalent is ``./larbin -c larbin.conf``
(main.cxx:83-118); resume mirrors its dotted-state reload (``canReload``,
global.cxx:117-139) but from per-partition Parquet snapshots.

Only this CLI owns the Ray session decision: under ``ray job submit``
the job driver is already connected, so ``ray.init`` is guarded (the
library itself never calls init/shutdown — driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m larbin_ray",
        description="Ray-Data-native Larbin crawl over a pages Parquet table")
    p.add_argument("--conf", required=True,
                   help="Larbin configuration file (startUrl lines = seeds)")
    p.add_argument("--pages", required=True,
                   help="Parquet table of (url, warc_ts, html, text, lang)")
    p.add_argument("--out", default=None,
                   help="output directory (distributed per-tick Parquet "
                        "sink); omit for a no-output test crawl")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint directory (tick-boundary frontier/seen "
                        "snapshots + metrics.parquet lineage)")
    p.add_argument("--resume", action="store_true",
                   help="restore from --checkpoint and continue")
    p.add_argument("--max-ticks", type=int, default=None)
    p.add_argument("--watch-file", default=None,
                   help="live URL-submission file (the reference TCP input "
                        "port as a watched seed file: 'priority:P depth:D "
                        "test:T' header lines followed by URLs; appended "
                        "lines are drained at every tick start)")
    p.add_argument("--submit-port", type=int, default=None, metavar="PORT",
                   help="bind the live TCP submission daemon on "
                        "127.0.0.1:PORT (0 = ephemeral) — the reference "
                        "input port (io/input.cxx): connect and send a "
                        "'priority:P depth:D test:T' header line, then URL "
                        "lines; drained at every tick start")
    p.add_argument("--stats-report", action="store_true",
                   help="print the printStats-style text report at the end "
                        "(needs --checkpoint: the report reads the metrics "
                        "Parquet lineage)")
    p.add_argument("--serve", type=int, default=None, metavar="PORT",
                   help="after the crawl, serve the stats report over HTTP "
                        "on 127.0.0.1:PORT until interrupted (0 = ephemeral; "
                        "the bound port is announced as a JSON line) — the "
                        "reference webserver endpoint; needs --checkpoint")
    args = p.parse_args(argv)
    if args.resume and not args.checkpoint:
        p.error("--resume requires --checkpoint")
    if args.serve is not None and not args.checkpoint:
        p.error("--serve requires --checkpoint (the report reads the "
                "metrics Parquet lineage)")

    import ray
    if not ray.is_initialized():
        # plain init honors RAY_ADDRESS (the job agent / cluster address
        # under `ray job submit`); a standalone run on a workstation
        # auto-starts a local instance
        ray.init(include_dashboard=False, logging_level="ERROR")

    import pyarrow.parquet as pq

    from larbin_ray.pipelines.crawl import ray_crawl_from_conf

    pages = pq.read_table(args.pages)
    submit = args.submit_port
    if submit is not None:
        # bind HERE and announce the resolved port as a JSON line before
        # the crawl starts — otherwise --submit-port 0 (ephemeral) binds
        # a port no client can ever learn.  The crawl owns the server's
        # lifecycle (ray_crawl closes it).
        from larbin_ray.sources.submit import SubmissionServer
        submit = SubmissionServer(port=submit)
        print(json.dumps({"submit_port": submit.port}), flush=True)
    t0 = time.time()
    res = ray_crawl_from_conf(
        pages, args.conf, out_dir=args.out, build_rows=False,
        checkpoint_dir=args.checkpoint, resume=args.resume,
        max_ticks=args.max_ticks, watch_file=args.watch_file,
        submit_port=submit)
    wall = time.time() - t0

    if args.stats_report and args.checkpoint:
        from larbin_ray.pipelines.stats import crawl_stats_report
        print(crawl_stats_report(args.checkpoint))
    print(json.dumps({
        "fetched": res.fetched_count(),
        "seconds": round(wall, 3),
        "pages_per_sec": round(res.fetched_count() / max(wall, 1e-9), 1),
        "answers": dict(res.answers),
    }), flush=True)
    if args.serve is not None:
        from larbin_ray.pipelines.stats import serve_stats
        serve_stats(args.checkpoint, args.serve, out_dir=args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
