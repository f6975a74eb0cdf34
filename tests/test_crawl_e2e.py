"""End-to-end crawl correctness: the Ray engine must reproduce the
serial oracle bit-for-bit — crawl order keys (tick, ip, sub), the
URL-seen bitset, per-url extracted text, and the FetchError answers
histogram — independent of shard count (FIXTURES.md F5, BASELINE.md
correctness invariant)."""

import numpy as np
import pytest

from larbin_ray.config import CrawlConfig
from larbin_ray.oracle.simcrawl import oracle_crawl
from larbin_ray.sources.synthweb import default_seeds, gen_web


@pytest.fixture(scope="module")
def web():
    return gen_web(60, 6, seed=42)


@pytest.fixture(scope="module")
def seeds():
    return default_seeds(6)


@pytest.fixture(scope="module")
def cfg():
    return CrawlConfig(page_no_duplicate=True, depth_by_site=True,
                       num_scheduler_shards=3, num_seen_shards=2)


@pytest.fixture(scope="module")
def oracle_result(web, seeds, cfg):
    return oracle_crawl(web, seeds, cfg)


def assert_same_crawl(o, e):
    assert sorted(o.order_keys()) == sorted(e.order_keys())
    assert dict(o.answers) == dict(e.answers)
    assert np.array_equal(o.seen_indices, e.seen_indices)
    assert o.text_by_url() == e.text_by_url()


def test_engine_matches_oracle(ray_session, web, seeds, cfg, oracle_result):
    from larbin_ray.pipelines.crawl import ray_crawl

    e = ray_crawl(web, seeds, cfg)
    assert_same_crawl(oracle_result, e)


def test_shard_count_invariance(ray_session, web, seeds, oracle_result):
    """Different actor-shard counts (the analog of a different cluster
    size) must produce the identical crawl."""
    from larbin_ray.pipelines.crawl import ray_crawl

    cfg2 = CrawlConfig(page_no_duplicate=True, depth_by_site=True,
                       num_scheduler_shards=1, num_seen_shards=1)
    e = ray_crawl(web, seeds, cfg2)
    assert_same_crawl(oracle_result, e)


def test_drain_mode_matches(ray_session, web, seeds):
    """wait_duration=0 (no politeness): whole IP queues drain per tick."""
    from larbin_ray.pipelines.crawl import ray_crawl

    cfg = CrawlConfig(wait_duration=0, depth_by_site=True,
                      num_scheduler_shards=2, num_seen_shards=2)
    o = oracle_crawl(web, seeds, cfg)
    e = ray_crawl(web, seeds, cfg)
    assert_same_crawl(o, e)
    assert max(r["tick"] for r in e.fetched) < 10  # few ticks in drain mode


def test_oracle_error_taxonomy(oracle_result):
    a = oracle_result.answers
    for k in ("success", "urlDup", "err30X", "err40X", "noDNS", "fastNoDns",
              "noConnection", "fastNoConn", "forbiddenRobots", "fastRobots",
              "tooDeep", "badType", "tooBig", "earlyStop", "timeout"):
        assert a.get(k, 0) >= 1, (k, dict(a))


def test_oracle_politeness(oracle_result):
    """At most one page fetch per IP per tick under wait_duration=60."""
    from collections import Counter

    c = Counter((r["tick"], r["ip"]) for r in oracle_result.fetched
                if not r["is_robots"])
    assert max(c.values()) == 1


def test_url_injection_matches(ray_session, web, seeds):
    """S2 input-port equivalent: urls injected at tick starts run through
    check() like seeds; engine == oracle with injections."""
    from larbin_ray.pipelines.crawl import ray_crawl

    cfg = CrawlConfig(depth_by_site=True, num_scheduler_shards=2,
                      num_seen_shards=2)
    inject = {3: ["http://sitee.example/p/0.html"],
              6: ["http://10.77.0.1/ip.html", "http://sitef.example/p/0.html"]}
    o = oracle_crawl(web, seeds, cfg, inject=inject)
    e = ray_crawl(web, seeds, cfg, inject=inject)
    assert_same_crawl(o, e)
    injected_urls = {u for us in inject.values() for u in us}
    fetched_urls = {r["url"] for r in o.fetched}
    assert injected_urls & fetched_urls


def test_injection_into_fast_failable_host_matches(ray_session, web, seeds):
    """check()-path submissions bypass the initOK fast-fails
    (global.cxx:284-297; oracle admit(skip_fast=True)) even when the
    host is already in a fast-failable state: an injected url on a dead
    host must set its seen bit and take the slow-path failure (noDNS),
    not fastNoDns — the divergence the skip marker in
    SchedulerShardCore.pre_admit_links exists to prevent."""
    from larbin_ray.pipelines.crawl import ray_crawl

    cfg = CrawlConfig(depth_by_site=True, num_scheduler_shards=2,
                      num_seen_shards=2)
    # by tick 6 the fixture web has already driven nodns.dead.example
    # and noconn.down.example into error/noconn dns_state
    inject = {6: ["http://nodns.dead.example/injected.html",
                  "http://noconn.down.example/injected.html"]}
    o = oracle_crawl(web, seeds, cfg, inject=inject)
    e = ray_crawl(web, seeds, cfg, inject=inject)
    assert_same_crawl(o, e)
    base = oracle_crawl(web, seeds, cfg)
    # the injected urls reached the seen set (skip_fast admitted them)
    assert len(o.seen_indices) == len(base.seen_indices) + 2
    # and failed through the slow path, not the fast-fail counters
    assert o.answers.get("fastNoDns", 0) == base.answers.get("fastNoDns", 0)
    assert o.answers.get("fastNoConn", 0) == base.answers.get("fastNoConn", 0)


def test_specific_search_priority_matches(ray_session, web, seeds):
    """specificSearch: privileged-extension urls route via the priority
    queue (checker.cxx:50-56) -> sort first at admission; engine == oracle."""
    from larbin_ray.pipelines.crawl import ray_crawl

    cfg = CrawlConfig(depth_by_site=True, specific_search=True,
                      content_types=("text/plain",), privileged_exts=(".htm",),
                      num_scheduler_shards=2, num_seen_shards=2)
    o = oracle_crawl(web, seeds, cfg)
    e = ray_crawl(web, seeds, cfg)
    assert_same_crawl(o, e)


def test_kitchen_sink_profile_matches(ray_session, web, seeds):
    """The larbin-test.conf flag set (getImage, getCGI, anyType,
    pageNoDuplicate — SURVEY.md §5): exercises the image-tag, CGI-link
    and any-content-type paths end to end; engine == oracle."""
    from larbin_ray.pipelines.crawl import ray_crawl

    cfg = CrawlConfig(depth_by_site=True, get_image=True, get_cgi=True,
                      any_type=True, page_no_duplicate=True,
                      num_scheduler_shards=2, num_seen_shards=2)
    o = oracle_crawl(web, seeds, cfg)
    e = ray_crawl(web, seeds, cfg)
    assert_same_crawl(o, e)
    # anyType turns former badType fetches into successes; CGI links are
    # now admitted (the /search.html?q=1 decoy becomes crawlable)
    assert o.answers.get("badType", 0) == 0
    assert any("?q=1" in r["url"] for r in o.fetched)


def test_ray_data_tick_path_matches(ray_session, web, seeds, oracle_result):
    """Force every tick through the Ray Data map_batches pipeline (the
    cluster-scale regime, cfg.ray_data_min_tick_rows=0) — must equal the
    oracle exactly, like the task path."""
    from larbin_ray.pipelines.crawl import ray_crawl

    cfg = CrawlConfig(page_no_duplicate=True, depth_by_site=True,
                      num_scheduler_shards=3, num_seen_shards=2,
                      ray_data_min_tick_rows=0)
    e = ray_crawl(web, seeds, cfg)
    assert_same_crawl(oracle_result, e)


def test_use_cookies_matches_and_propagates(ray_session, seeds):
    """useCookies: Set-Cookie capture + same-host inheritance through the
    frontier; engine == oracle, and the cookie-chain page is reached with
    the inherited cookie visible in the dispatch."""
    from larbin_ray.pipelines.crawl import ray_crawl

    web = gen_web(60, 6, seed=42)
    cfg = CrawlConfig(depth_by_site=True, use_cookies=True,
                      num_scheduler_shards=2, num_seen_shards=2)
    o = oracle_crawl(web, seeds, cfg)
    e = ray_crawl(web, seeds, cfg)
    assert_same_crawl(o, e)
    # the cookie chain: /cookie/b is dispatched WITH the cookie captured
    # from /cookie/a's Set-Cookie headers and inherited same-host
    by_url = {r["url"]: r for r in o.fetched}
    a = next(v for u, v in by_url.items() if "/cookie/a.html" in u)
    b = next(v for u, v in by_url.items() if "/cookie/b.html" in u)
    assert a.get("cookie") is None
    assert b.get("cookie") == b"session=abc; trk=z9"


def test_punycode_site_identity(ray_session):
    """cfg.punycode: the NamedSite identity and DNS/robots go through the
    xn-- form (getPunycode parity, site.cxx:404/142); raw-byte identity
    without the flag.  Engine == oracle either way."""
    import pyarrow as pa

    from larbin_ray.kernels.urlnorm import puny_host
    from larbin_ray.pipelines.crawl import ray_crawl

    assert puny_host("例子.example".encode()) == b"xn--fsqu00a.example"

    def b2s(u: str) -> str:       # byte-transport form (latin-1-carried utf-8)
        return u.encode("utf-8").decode("latin-1")

    idn = b2s("http://例子.example")
    body1 = _mini_response(b'<a href="/p2.html">x</a>')
    body2 = _mini_response(b"done")
    pages = pa.table({
        "url": [idn + "/p1.html", idn + "/p2.html"],
        "warc_ts": pa.array([0, 1], pa.timestamp("us")),
        "html": pa.array([body1, body2], pa.binary()),
        "text": ["x", "done"],
        "lang": ["zh", "zh"],
    })
    seeds2 = [idn + "/p1.html"]
    for punycode in (False, True):
        cfg = CrawlConfig(punycode=punycode, num_scheduler_shards=2,
                          num_seen_shards=2)
        o = oracle_crawl(pages, seeds2, cfg)
        e = ray_crawl(pages, seeds2, cfg)
        assert_same_crawl(o, e)
        robots = [r["url"] for r in o.fetched if r["is_robots"]]
        assert len(robots) == 1
        if punycode:
            assert robots[0].startswith("http://xn--fsqu00a.example"), robots
        else:
            assert not robots[0].startswith("http://xn--"), robots
        succ = [r for r in o.fetched if r["status"] == "success"]
        assert len(succ) == 2   # both IDN pages crawled


def _mini_response(body: bytes) -> bytes:
    return (b"HTTP/1.0 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)


def test_seen_set_collision_parity(ray_session):
    """The 64M single-hash bitset silently drops hash-colliding URLs
    (hash_table.cxx:95-125) — the reference's false-positive behavior.
    Two distinct pages with the same hashCode: only the first in
    admission order is crawled, identically in oracle and engine at two
    seen-shard counts."""
    import pyarrow as pa

    from larbin_ray.kernels.urlnorm import Url, parse_url
    from larbin_ray.pipelines.crawl import ray_crawl

    # pre-searched colliding pair on sitea.example (poly-31 mod 64e6)
    f1, f2 = b"/c/cgaeidig.html", b"/c/fejiafge.html"
    assert Url(b"sitea.example", 80, f1, 5).hash_code() == \
        Url(b"sitea.example", 80, f2, 5).hash_code()

    def resp(b):
        return b"HTTP/1.0 200 OK\r\nContent-Type: text/html\r\n\r\n" + b
    root = "http://sitea.example"
    pages = pa.table({
        "url": [root + "/p0.html", root + f1.decode(), root + f2.decode()],
        "warc_ts": pa.array([0, 1, 2], pa.timestamp("us")),
        "html": pa.array([
            resp(b'<a href="' + f1 + b'"">a</a><a href="' + f2 + b'">b</a>'),
            resp(b"first"), resp(b"second")], pa.binary()),
        "text": ["", "first", "second"], "lang": ["en"] * 3,
    })
    for n_seen in (1, 3):
        cfg = CrawlConfig(num_scheduler_shards=2, num_seen_shards=n_seen)
        o = oracle_crawl(pages, [root + "/p0.html"], cfg)
        e = ray_crawl(pages, [root + "/p0.html"], cfg)
        assert_same_crawl(o, e)
        crawled = {r["url"] for r in o.fetched if r["status"] == "success"}
        # f1 appears first on the page => wins the bit; f2 is urlDup
        assert root + f1.decode() in crawled
        assert root + f2.decode() not in crawled
        assert o.answers["urlDup"] >= 1


def test_hot_host_cap_and_dispatch_budget(ray_session):
    """One viral host holds ~60% of all links (the skew case from
    SURVEY.md §4): with maxUrlsBySite (site.cxx:136-175, types.h:43)
    and a per-IP dispatch budget (sequencer.cxx:36-54 analog) the crawl
    stays bit-identical to the oracle at two shard counts, every page
    is still reached (overflow recycling, main.cxx:190-199), and no
    host ever holds more than the cap in RAM."""
    import pyarrow as pa

    from larbin_ray.pipelines.crawl import ray_crawl

    hot = "http://siteaa.example"
    cold = ["http://site" + c + ".example" for c in ("ab", "ac", "ad")]
    urls, bodies, texts = [], [], []
    # hub page on each cold host links to many hot-host pages + one local
    hot_files = [f"/h{i:03d}.html" for i in range(60)]
    for ci, c in enumerate(cold):
        links = "".join(f'<a href="{hot}{f}">x</a>' for f in hot_files)
        links += f'<a href="{c}/local.html">l</a>'
        urls.append(c + "/index.html")
        bodies.append(_mini_response(f"<html>{links}</html>".encode()))
        texts.append("")
        urls.append(c + "/local.html")
        bodies.append(_mini_response(b"cold page " + str(ci).encode()))
        texts.append("")
    for f in hot_files:
        urls.append(hot + f)
        bodies.append(_mini_response(b"hot " + f.encode()))
        texts.append("")
    pages = pa.table({
        "url": urls,
        "warc_ts": pa.array(list(range(len(urls))), pa.timestamp("us")),
        "html": pa.array(bodies, pa.binary()),
        "text": texts,
        "lang": ["en"] * len(urls),
    })
    seeds = [c + "/index.html" for c in cold]
    for shards in ((1, 1), (3, 2)):
        cfg = CrawlConfig(wait_duration=0, max_urls_by_site=8,
                          max_dispatch_per_ip=16,
                          num_scheduler_shards=shards[0],
                          num_seen_shards=shards[1])
        o = oracle_crawl(pages, seeds, cfg)
        e = ray_crawl(pages, seeds, cfg)
        assert_same_crawl(o, e)
        # every page reached despite the cap (overflow recycling works)
        assert o.answers["success"] == len(urls)
        # the per-host RAM bound held in oracle and engine
        assert 0 < o.max_host_ram <= 8
        assert 0 < e.max_host_ram <= 8
        # budget bounds the per-tick generation from the hot IP
        from collections import Counter as _C
        per_tick_ip = _C((r["tick"], r["ip"]) for r in o.fetched
                         if not r["is_robots"])
        assert max(per_tick_ip.values()) <= 16


def test_politeness_mode_with_host_cap(ray_session):
    """maxUrlsBySite under politeness (1 fetch/IP/tick): parity holds
    over the long tick sequence the cap+recycle interplay produces."""
    web = gen_web(60, 6, seed=42)
    seeds = default_seeds(6)
    from larbin_ray.pipelines.crawl import ray_crawl

    cfg = CrawlConfig(depth_by_site=True, max_urls_by_site=4,
                      num_scheduler_shards=2, num_seen_shards=2)
    o = oracle_crawl(web, seeds, cfg)
    e = ray_crawl(web, seeds, cfg)
    assert_same_crawl(o, e)


def test_long_crawl_throughput_mode(ray_session):
    """100+-tick politeness crawl in build_rows=False mode: the driver
    holds no per-tick metadata (res.fetched stays empty, n_fetched is
    aggregated incrementally) and the count matches build_rows=True."""
    import resource

    from larbin_ray.pipelines.crawl import ray_crawl

    web = gen_web(500, 4, seed=42)
    seeds = default_seeds(4)
    cfg = CrawlConfig(depth_by_site=True, num_scheduler_shards=2,
                      num_seen_shards=2)
    full = ray_crawl(web, seeds, cfg)
    assert max(r["tick"] for r in full.fetched) >= 100   # politeness = long
    rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    slim = ray_crawl(web, seeds, cfg, build_rows=False)
    rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert slim.fetched == []
    assert slim.fetched_count() == len(full.fetched)
    assert dict(slim.answers) == dict(full.answers)
    # driver peak RSS must not grow materially over a no-rows crawl
    assert rss_after - rss_before < 200_000   # < ~200 MB in KiB units


def test_throughput_mode_robots_prefire_state(ray_session, web, seeds):
    """Drain-mode throughput crawl (build_rows=False, dup off) takes the
    wave-end robots prefire path on every robots tick; the web's a./b.
    subdomains share domain 0's IP, so robots results applying in a
    different order would reorder that IP's queue.  The URL-seen set and
    answers histogram must still equal the oracle's bit-for-bit."""
    from larbin_ray.pipelines.crawl import ray_crawl

    cfg0 = CrawlConfig(wait_duration=0, depth_by_site=True,
                       num_scheduler_shards=3, num_seen_shards=2)
    o = oracle_crawl(web, seeds, cfg0)
    e = ray_crawl(web, seeds, cfg0, build_rows=False)
    assert dict(o.answers) == dict(e.answers)
    assert np.array_equal(o.seen_indices, e.seen_indices)
    assert e.fetched_count() == len(o.fetched)


def test_parse_batch_size_invariance(ray_session, web, seeds, oracle_result):
    """Crawl output must not depend on how ticks are sliced into
    fetch+parse tasks: tiny batches, big batches, and the auto policy
    (parse_batch_size=0, ~2 waves per CPU) all reproduce the oracle
    bit-for-bit."""
    from larbin_ray.pipelines.crawl import ray_crawl

    for bs in (0, 64, 1024):
        cfg = CrawlConfig(page_no_duplicate=True, depth_by_site=True,
                          num_scheduler_shards=3, num_seen_shards=2,
                          parse_batch_size=bs)
        e = ray_crawl(web, seeds, cfg)
        assert_same_crawl(oracle_result, e)


def test_periodic_admission_settle_parity(ray_session, monkeypatch):
    """The bounded lazy-settle window (crawl._SETTLE_EVERY): forcing a
    settle every 3 ticks over a 100+-tick politeness crawl is
    bit-identical to the default 256-tick window — urlDup counts land
    in the same answers histogram and order keys are unchanged."""
    from larbin_ray.pipelines import crawl as crawl_mod

    web = gen_web(500, 4, seed=42)
    seeds = default_seeds(4)
    cfg = CrawlConfig(depth_by_site=True, num_scheduler_shards=2,
                      num_seen_shards=2)
    base = crawl_mod.ray_crawl(web, seeds, cfg)
    assert max(r["tick"] for r in base.fetched) >= 100
    monkeypatch.setattr(crawl_mod, "_SETTLE_EVERY", 3)
    tight = crawl_mod.ray_crawl(web, seeds, cfg)
    assert sorted(base.order_keys()) == sorted(tight.order_keys())
    assert dict(base.answers) == dict(tight.answers)


def test_limit_time_and_limit_page_parity(ray_session, web, seeds):
    """limitTime (limit_time.cxx:40) on the simulated clock — tick k
    starts at k*waitDuration seconds — and limitPage (main.cxx:139-142)
    both stop the crawl identically in engine and oracle, strictly
    earlier than the unlimited run."""
    from larbin_ray.pipelines.crawl import ray_crawl

    base = dict(depth_by_site=True, wait_duration=30,
                num_scheduler_shards=2, num_seen_shards=2)
    full = oracle_crawl(web, seeds, CrawlConfig(**base))
    assert max(r["tick"] for r in full.fetched) >= 3

    # ticks 0..2 run (tick 3 would start at t=90 >= limit)
    cfg_t = CrawlConfig(**base, limit_time=90)
    o = oracle_crawl(web, seeds, cfg_t)
    e = ray_crawl(web, seeds, cfg_t)
    assert_same_crawl(o, e)
    assert max(r["tick"] for r in o.fetched) == 2
    assert len(o.fetched) < len(full.fetched)

    cfg_p = CrawlConfig(**base, limit_page=5)
    o = oracle_crawl(web, seeds, cfg_p)
    e = ray_crawl(web, seeds, cfg_p)
    assert_same_crawl(o, e)
    assert o.answers["success"] >= 5
    assert len(o.fetched) < len(full.fetched)


def test_ray_data_submit_idempotent_on_retry():
    """A re-executed Ray Data batch (task died after its submit ack)
    must not double-submit its candidates: submit_links_once dedupes on
    the batch token until the tick barrier resets it."""
    from larbin_ray.stages.scheduler import SchedulerShardCore

    core = SchedulerShardCore(0, CrawlConfig(num_scheduler_shards=1))
    entry = (1, "10.0.0.1", 0, 0, b"sitea.example", 80, b"/p/1.html",
             5, 12345, "10.0.0.1", 0, None)
    core.submit_links_once("tok-a", [entry])
    core.submit_links_once("tok-a", [entry])      # the retry
    assert len(core._buffer) == 1
    core.submit_links_once("tok-b", [entry])      # a different batch
    assert len(core._buffer) == 2
    core.pre_admit_links([])                      # tick barrier
    core.submit_links_once("tok-a", [entry])      # next tick reuses token
    assert len(core._buffer) == 1
