"""Live-stats surface — the webserver's text report (K8) over the
metrics Parquet the crawl writes.

The reference serves per-8-second rate windows and an error histogram
over HTTP (webserver.cxx:60-99, 260-540; rates computed in
main.cxx:214-233 as ``(counter - prev) >> 3``).  The rebuild's
equivalent: the crawl streams one metrics row per tick (plus the final
answers histogram into the checkpoint manifest); this module renders
them as the same report — totals, per-window rates, queue depth and
the error table — without a daemon (``python -m larbin_ray.pipelines.stats
<dir>`` over a checkpoint/metrics directory).
"""

from __future__ import annotations

import json
import os


def crawl_stats_report(path: str, window: int = 8) -> str:
    """``path``: a checkpoint dir (metrics.parquet [+ manifest.json]) or
    a metrics.parquet file.  Returns the formatted report."""
    import pyarrow.parquet as pq

    mpath = path if path.endswith(".parquet") else f"{path}/metrics.parquet"
    t = pq.read_table(mpath)
    rows = t.to_pylist()
    lines = []
    if rows:
        last = rows[-1]
        total_pages = sum(r["pages"] for r in rows)
        total_robots = sum(r["robots"] for r in rows)
        lines.append("=== larbin_ray crawl stats "
                     f"(tick {last['tick']}, {len(rows)} ticks) ===")
        lines.append(f"pages fetched:   {total_pages}")
        lines.append(f"robots fetched:  {total_robots}")
        lines.append(f"success (cum):   {last['cum_success']}")
        lines.append(f"urlDup  (cum):   {last['cum_url_dup']}")
        lines.append("")
        lines.append(f"--- per-{window}-tick windows "
                     "(pages/tick rate, printStats analog) ---")
        lines.append(f"{'ticks':>12} {'pages':>8} {'rate':>8} "
                     f"{'succ+':>8} {'dup+':>7}")
        prev_s = prev_d = 0
        for i in range(0, len(rows), window):
            win = rows[i:i + window]
            pages = sum(r["pages"] for r in win)
            s, d = win[-1]["cum_success"], win[-1]["cum_url_dup"]
            lines.append(f"{win[0]['tick']:>5}-{win[-1]['tick']:<6} "
                         f"{pages:>8} {pages // max(1, len(win)):>8} "
                         f"{s - prev_s:>8} {d - prev_d:>7}")
            prev_s, prev_d = s, d
    manifest = f"{path}/manifest.json" if not path.endswith(".parquet") else ""
    if manifest and os.path.exists(manifest):
        with open(manifest) as f:
            m = json.load(f)
        answers = m.get("answers", {})
        if answers:
            lines.append("")
            lines.append("--- answers histogram (webserver error table) ---")
            for k in sorted(answers, key=lambda k: -answers[k]):
                lines.append(f"{k:>18}: {answers[k]}")
        lines.append("")
        lines.append(f"resumable from tick {m.get('next_tick')} "
                     f"({m.get('num_scheduler_shards')} scheduler / "
                     f"{m.get('num_seen_shards')} seen shards)")
    return "\n".join(lines)


def serve_stats(path: str, port: int = 0, once: bool = False) -> None:
    """Serve the report over HTTP — the reference webserver's live
    endpoint (utils/webserver.cxx:840-870: accept, render current
    counters, close).  Each GET re-renders from the metrics lineage,
    so a crawl writing checkpoints alongside shows live totals.
    ``port=0`` binds an ephemeral port; the bound port is announced as
    a JSON line on stdout (``{"serving": <port>}``).  ``once`` handles
    a single request then returns (test harness)."""
    import http.server

    report_path = path

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = crawl_stats_report(report_path).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", port), Handler)
    print(json.dumps({"serving": srv.server_address[1]}), flush=True)
    try:
        if once:
            srv.handle_request()
        else:
            srv.serve_forever()
    except KeyboardInterrupt:
        pass    # documented exit path: Ctrl-C stops the server cleanly
    finally:
        srv.server_close()


if __name__ == "__main__":
    import sys

    print(crawl_stats_report(sys.argv[1]))
