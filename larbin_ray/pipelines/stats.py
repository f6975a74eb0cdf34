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


def _html(title: str, body: str) -> bytes:
    return (f"<!doctype html><html><head><title>{title}</title>"
            "<style>body{font-family:monospace}table{border-collapse:"
            "collapse}td,th{border:1px solid #999;padding:2px 8px;"
            "text-align:right}th{background:#eee}</style></head><body>"
            f"<h2>{title}</h2>{body}"
            '<p><a href="/index.html">index</a></p></body></html>'
            ).encode()


def _table(headers: list[str], rows: list[list]) -> str:
    # cell values include crawl-controlled strings (urls, statuses) —
    # escape everything so corpus data can never inject markup
    import html as _h
    h = "".join(f"<th>{_h.escape(str(c))}</th>" for c in headers)
    b = "".join(
        "<tr>" + "".join(f"<td>{_h.escape(str(c))}</td>" for c in r) + "</tr>"
        for r in rows)
    return f"<table><tr>{h}</tr>{b}</table>"


def urls_html(out_dir: str | None, limit: int = 50) -> bytes:
    """The reference's /urls.html (webserver.cxx:840-870 views): the
    most recently fetched urls.  Reads sink tick directories NEWEST
    first and stops at ``limit`` rows — never the whole sink."""
    import glob

    import pyarrow.parquet as pq
    if not out_dir:
        return _html("urls", "<p>no sink directory (--out) configured</p>")
    tick_dirs = sorted(glob.glob(f"{out_dir}/pages/tick=*"),
                       key=lambda p: int(p.rsplit("=", 1)[1]), reverse=True)
    rows: list[list] = []
    for d in tick_dirs:
        for f in sorted(glob.glob(f"{d}/part-*.parquet")):
            t = pq.read_table(f, columns=["url", "status", "tick", "depth"])
            rows.extend([r["tick"], r["depth"], r["status"], r["url"]]
                        for r in t.to_pylist())
        if len(rows) >= limit:
            break
    rows = rows[:limit]
    return _html(f"last {len(rows)} fetched urls",
                 _table(["tick", "depth", "status", "url"], rows))


def dns_html(ckpt_path: str) -> bytes:
    """The reference's /dns.html: DNS resolution state counts over the
    checkpointed host tables (per scheduler shard)."""
    import glob
    from collections import Counter

    import pyarrow.parquet as pq

    from larbin_ray.pipelines.checkpoint import state_path
    counts: Counter = Counter()
    n_hosts = 0
    for f in sorted(glob.glob(f"{state_path(ckpt_path)}/hosts/shard=*.parquet")):
        t = pq.read_table(f, columns=["dns_state"])
        n_hosts += t.num_rows
        for v in t["dns_state"].to_pylist():
            counts[v] += 1
    body = (f"<p>{n_hosts} hosts in the checkpointed scheduler tier</p>"
            + _table(["dns state", "hosts"],
                     [[k, v] for k, v in counts.most_common()]))
    return _html("dns", body)


def histograms_html(ckpt_path: str, window: int = 8) -> bytes:
    """The reference's /histograms.html: the answers histogram plus the
    per-window page rates, as HTML tables over the metrics lineage."""
    import pyarrow.parquet as pq
    parts = []
    manifest = f"{ckpt_path}/manifest.json"
    if os.path.exists(manifest):
        with open(manifest) as f:
            answers = json.load(f).get("answers", {})
        parts.append("<h3>answers histogram</h3>" + _table(
            ["status", "count"],
            [[k, answers[k]] for k in sorted(answers, key=lambda k: -answers[k])]))
    mpath = f"{ckpt_path}/metrics.parquet"
    if os.path.exists(mpath):
        rows = pq.read_table(mpath).to_pylist()
        win_rows = []
        for i in range(0, len(rows), window):
            win = rows[i:i + window]
            pages = sum(r["pages"] for r in win)
            win_rows.append([f"{win[0]['tick']}-{win[-1]['tick']}", pages,
                             pages // max(1, len(win)),
                             win[-1]["cum_success"]])
        parts.append("<h3>per-window page rates</h3>" + _table(
            ["ticks", "pages", "pages/tick", "cum success"], win_rows))
    return _html("histograms", "".join(parts) or "<p>no metrics yet</p>")


def make_stats_server(path: str, port: int = 0, out_dir: str | None = None):
    """The reference webserver's endpoint surface (utils/webserver.cxx
    :840-870): ``/`` serves the text report (back-compat contract of
    --serve), ``/urls.html`` ``/dns.html`` ``/histograms.html`` the
    HTML views, ``/index.html`` the link page.  Every GET re-renders
    from the on-disk lineage, so a crawl writing checkpoints alongside
    shows live state.  Returns the bound HTTPServer (caller serves)."""
    import http.server

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            try:
                if self.path in ("/", "/all.html"):
                    body = crawl_stats_report(path).encode()
                    ctype = "text/plain; charset=utf-8"
                elif self.path == "/index.html":
                    body = _html("larbin_ray crawl", (
                        '<ul><li><a href="/">text report</a></li>'
                        '<li><a href="/urls.html">recently fetched urls</a></li>'
                        '<li><a href="/dns.html">dns states</a></li>'
                        '<li><a href="/histograms.html">histograms</a></li></ul>'))
                    ctype = "text/html; charset=utf-8"
                elif self.path == "/urls.html":
                    body, ctype = urls_html(out_dir), "text/html; charset=utf-8"
                elif self.path == "/dns.html":
                    body, ctype = dns_html(path), "text/html; charset=utf-8"
                elif self.path == "/histograms.html":
                    body, ctype = (histograms_html(path),
                                   "text/html; charset=utf-8")
                else:
                    self.send_error(404)
                    return
            except Exception as e:           # render errors as 500, keep serving
                self.send_error(500, str(e))
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    return http.server.HTTPServer(("127.0.0.1", port), Handler)


def serve_stats(path: str, port: int = 0, once: bool = False,
                out_dir: str | None = None) -> None:
    """Serve the report + HTML views over HTTP (see make_stats_server).
    ``port=0`` binds an ephemeral port; the bound port is announced as
    a JSON line on stdout (``{"serving": <port>}``).  ``once`` handles
    a single request then returns (test harness)."""
    srv = make_stats_server(path, port, out_dir)
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
