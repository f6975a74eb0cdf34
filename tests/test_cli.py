"""`python -m larbin_ray` — the ray-job-submit entrypoint (SURVEY.md §7
phase 4): conf-driven crawl, JSON summary line, checkpoint + stats
report, and parity with the oracle's answers histogram."""

import json
import subprocess
import sys

import pyarrow.parquet as pq


CONF = """\
From t@example.org
UserAgent larbin_2.6.5
outputMode 1
pagesConnexions 16
dnsConnexions 2
depthInSite 5
depthBySite
waitDuration 0
limitTime 0
limitPage 0
startUrl http://h0.example/
startUrl http://h1.example/
pageNoDuplicate
forbiddenExtensions
.tar .gz
end
"""


def test_cli_crawl_from_conf(tmp_path):
    from larbin_ray.config import CrawlConfig
    from larbin_ray.kernels.confparse import parse_larbin_conf
    from larbin_ray.oracle.simcrawl import oracle_crawl
    from larbin_ray.sources.synthweb import gen_web

    web = gen_web(60, 6, seed=42)
    pages = tmp_path / "pages.parquet"
    pq.write_table(web, pages)
    conf = tmp_path / "t.conf"
    conf.write_text(CONF)

    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    p = subprocess.run(
        [sys.executable, "-m", "larbin_ray", "--conf", str(conf),
         "--pages", str(pages), "--out", str(out),
         "--checkpoint", str(ckpt), "--stats-report"],
        capture_output=True, text=True, timeout=300, check=True)
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    got = json.loads(line)

    cfg, seeds = parse_larbin_conf(CONF)
    o = oracle_crawl(web, seeds, cfg)
    assert got["fetched"] == len(o.fetched)
    assert got["answers"] == dict(o.answers)
    # stats report rendered from the metrics lineage
    assert "larbin_ray crawl stats" in p.stdout
    # distributed sink wrote per-tick slices
    assert list(out.glob("pages/tick=*/*.parquet"))


def test_cli_submit_port_announced(tmp_path):
    """--submit-port 0 (ephemeral) must announce the resolved port as a
    JSON line BEFORE the crawl starts — otherwise no client can ever
    learn where to connect (r5 review finding)."""
    import socket

    from larbin_ray.sources.synthweb import gen_web

    web = gen_web(60, 6, seed=42)
    pages = tmp_path / "pages.parquet"
    pq.write_table(web, pages)
    conf = tmp_path / "t.conf"
    conf.write_text(CONF)

    proc = subprocess.Popen(
        [sys.executable, "-m", "larbin_ray", "--conf", str(conf),
         "--pages", str(pages), "--submit-port", "0"],
        stdout=subprocess.PIPE, text=True)
    try:
        port = None
        for line in proc.stdout:
            if line.startswith("{") and "submit_port" in line:
                port = json.loads(line)["submit_port"]
                break
        assert port, "ephemeral submit port was never announced"
        # the daemon is live while the crawl runs: a client can connect
        # and speak the protocol (drain timing is covered by
        # test_submit.py; here we pin announce-before-crawl + liveness)
        with socket.create_connection(("127.0.0.1", port), timeout=10) as c:
            c.sendall(b"priority:1 depth:5 test:1\n")
        summary = None
        for line in proc.stdout:
            if line.startswith("{") and "fetched" in line:
                summary = json.loads(line)
        assert summary and summary["fetched"] > 0
        assert proc.wait(timeout=120) == 0
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_cli_serve_stats(tmp_path):
    """--serve exposes the stats report over HTTP (the reference
    webserver endpoint, utils/webserver.cxx:840-870)."""
    import time
    import urllib.request

    from larbin_ray.pipelines.stats import crawl_stats_report

    from larbin_ray.sources.synthweb import gen_web

    web = gen_web(60, 6, seed=42)
    pages = tmp_path / "pages.parquet"
    pq.write_table(web, pages)
    conf = tmp_path / "t.conf"
    conf.write_text(CONF)
    ckpt = tmp_path / "ckpt"

    proc = subprocess.Popen(
        [sys.executable, "-m", "larbin_ray", "--conf", str(conf),
         "--pages", str(pages), "--checkpoint", str(ckpt), "--serve", "0"],
        stdout=subprocess.PIPE, text=True)
    try:
        port = None
        deadline = time.time() + 240
        for line in proc.stdout:
            if line.startswith("{") and "serving" in line:
                port = json.loads(line)["serving"]
                break
            assert time.time() < deadline
        assert port is not None
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read().decode()
        assert body == crawl_stats_report(str(ckpt))
        assert "larbin_ray crawl stats" in body
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_stats_server_html_views(ray_session, tmp_path):
    """The webserver's HTML views (reference /urls.html /dns.html
    /histograms.html, webserver.cxx:840-870) render from the checkpoint
    + sink lineage; '/' keeps the text-report contract."""
    import threading
    import urllib.error
    import urllib.request

    from larbin_ray.config import CrawlConfig
    from larbin_ray.pipelines.crawl import ray_crawl
    from larbin_ray.pipelines.stats import crawl_stats_report, make_stats_server
    from larbin_ray.sources.synthweb import default_seeds, gen_web

    web = gen_web(60, 6, seed=42)
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    cfg = CrawlConfig(depth_by_site=True, num_scheduler_shards=2,
                      num_seen_shards=2, checkpoint_every=4)
    ray_crawl(web, default_seeds(6), cfg, out_dir=out, checkpoint_dir=ck,
              build_rows=False)

    srv = make_stats_server(ck, 0, out_dir=out)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        def get(p):
            return urllib.request.urlopen(base + p, timeout=10).read().decode()

        assert get("/") == crawl_stats_report(ck)
        idx = get("/index.html")
        for link in ("/urls.html", "/dns.html", "/histograms.html"):
            assert link in idx
        urls = get("/urls.html")
        assert "fetched urls" in urls and "http://" in urls
        dns = get("/dns.html")
        assert "dns state" in dns and "done" in dns
        hist = get("/histograms.html")
        assert "answers histogram" in hist and "success" in hist
        try:
            urllib.request.urlopen(base + "/nope", timeout=10)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
        srv.server_close()
