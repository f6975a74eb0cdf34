"""Live URL-submission surface (watched seed file — the reference TCP
input port, io/input.cxx:60-187): header parsing, partial-line
buffering, and mid-crawl submission parity vs the inject= path and the
oracle, including test=0 set-without-test semantics."""

import pytest

from larbin_ray.config import CrawlConfig
from larbin_ray.oracle.simcrawl import oracle_crawl
from larbin_ray.sources.submit import SubmissionWatcher
from larbin_ray.sources.synthweb import default_seeds, gen_web

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def web():
    return gen_web(60, 6, seed=42)


@pytest.fixture(scope="module")
def seeds():
    return default_seeds(6)


def _cfg():
    return CrawlConfig(page_no_duplicate=True, depth_by_site=True,
                       num_scheduler_shards=3, num_seen_shards=2)


def test_watcher_header_and_partial_lines(tmp_path):
    p = tmp_path / "sub.txt"
    p.write_bytes(b"http://early.example/a.html\n"      # before any header: dropped
                  b"priority:1 depth:5 test:1\n"
                  b"http://a.example/x.html\n"
                  b"http://b.example/y.h")               # partial: not consumed
    w = SubmissionWatcher(str(p))
    subs = w.drain()
    assert [(s.url, s.depth, s.prio, s.test) for s in subs] == [
        ("http://a.example/x.html", 5, 0, True)]
    with open(p, "ab") as f:                             # finish the line,
        f.write(b"tml\npriority:0 depth:2 test:0\n"      # then a test=0 block
                b"http://c.example/z.html\n")
    subs = w.drain()
    assert [(s.url, s.depth, s.prio, s.test) for s in subs] == [
        ("http://b.example/y.html", 5, 0, True),
        ("http://c.example/z.html", 2, 1, False)]
    assert w.drain() == []                               # nothing new


def test_watch_file_matches_inject_path(ray_session, web, seeds, tmp_path):
    """A mid-crawl test=1 submission through the watched file produces
    the identical crawl to the same url via inject= (and the oracle)."""
    from larbin_ray.pipelines.crawl import ray_crawl
    from tests.test_crawl_e2e import assert_same_crawl

    urls = ["http://sitee.example/p/0.html", "http://nosuch.example/q.html"]
    cfg = _cfg()
    o = oracle_crawl(web, seeds, cfg, inject={3: urls})
    e_inject = ray_crawl(web, seeds, cfg, inject={3: urls})
    feed = {3: "priority:1 depth:%d test:1\n%s\n" % (
        cfg.depth_in_site, "\n".join(urls))}
    e_watch = ray_crawl(web, seeds, cfg,
                        watch_file=str(tmp_path / "subs.txt"),
                        watch_feed=feed)
    assert_same_crawl(o, e_inject)
    assert_same_crawl(o, e_watch)


def test_watch_file_test0_set_without_test(ray_session, web, seeds, tmp_path):
    """test=0 enqueues even an already-seen url (the reference's
    seen->set branch): the url is fetched a second time, and the engine
    matches the oracle fed the equivalent submission tuple."""
    from larbin_ray.pipelines.crawl import ray_crawl
    from tests.test_crawl_e2e import assert_same_crawl

    cfg = _cfg()
    base = oracle_crawl(web, seeds, cfg)
    # a url certainly crawled by tick 4: the first seed itself
    target = f"http://{seeds[0].split('/')[2]}/p/0.html"
    fetched_urls = [r["url"] for r in base.fetched]
    assert fetched_urls.count(target) == 1

    o = oracle_crawl(web, seeds, cfg,
                     inject={4: [(target, cfg.depth_in_site, 0, False)]})
    feed = {4: "priority:1 depth:%d test:0\n%s\n" % (cfg.depth_in_site, target)}
    e = ray_crawl(web, seeds, cfg,
                  watch_file=str(tmp_path / "subs.txt"), watch_feed=feed)
    assert_same_crawl(o, e)
    assert [r["url"] for r in o.fetched].count(target) == 2

    # and with test=1 the same submission is a urlDup, no refetch
    o1 = oracle_crawl(web, seeds, cfg, inject={4: [target]})
    feed1 = {4: "priority:1 depth:%d test:1\n%s\n" % (cfg.depth_in_site, target)}
    e1 = ray_crawl(web, seeds, cfg,
                   watch_file=str(tmp_path / "subs1.txt"), watch_feed=feed1)
    assert_same_crawl(o1, e1)
    assert [r["url"] for r in o1.fetched].count(target) == 1
    assert o1.answers["urlDup"] == base.answers["urlDup"] + 1


def test_resume_does_not_redrain_watch_file(ray_session, web, seeds, tmp_path):
    """Socket semantics on resume: lines the checkpointing run already
    consumed (and any appended while the crawler was down) are treated
    as consumed — the resumed crawl equals the uninterrupted one instead
    of re-submitting every line from offset 0."""
    from larbin_ray.pipelines.crawl import ray_crawl

    cfg = CrawlConfig(page_no_duplicate=True, depth_by_site=True,
                      num_scheduler_shards=3, num_seen_shards=2,
                      checkpoint_every=4)
    target = f"http://{seeds[0].split('/')[2]}/p/0.html"
    feed = {3: "priority:1 depth:%d test:0\n%s\n" % (cfg.depth_in_site, target)}

    o = oracle_crawl(web, seeds, cfg,
                     inject={3: [(target, cfg.depth_in_site, 0, False)]})
    import numpy as np

    wf = str(tmp_path / "subs.txt")
    ck = str(tmp_path / "ck")
    ray_crawl(web, seeds, cfg, watch_file=wf, watch_feed=feed,
              checkpoint_dir=ck, max_ticks=8)
    resumed = ray_crawl(web, seeds, cfg, watch_file=wf,
                        checkpoint_dir=ck, resume=True)
    # resumed.fetched holds only post-resume rows; the invariants that
    # catch a re-drain are the answers histogram (a replayed test=0 line
    # means one extra success) and the seen bitset
    assert dict(resumed.answers) == dict(o.answers)
    assert np.array_equal(resumed.seen_indices, o.seen_indices)
    # the forced fetch happened before the checkpoint, not again after
    assert [r["url"] for r in resumed.fetched].count(target) == 0


def test_minhash_uneven_banding(ray_session):
    """num_hashes not divisible by bands: band b covers lanes
    [b*rpb, (b+1)*rpb), tail lanes unused — the vectorized banding must
    accept it like the slicing loop it replaced."""
    from larbin_ray.pipelines.textops import minhash_dedup

    t = minhash_dedup("/root/testdata/sf0.001", num_hashes=50, bands=16,
                      force_path="tasks")
    d = minhash_dedup("/root/testdata/sf0.001", num_hashes=50, bands=16,
                      force_path="data")
    assert t.equals(d)


def test_submission_server_protocol_unit():
    """Real socket daemon: per-connection header state, partial-line
    buffering across sends, urls-before-header dropped, EOF discards
    a trailing partial line."""
    import socket

    from larbin_ray.sources.submit import SubmissionServer

    srv = SubmissionServer(port=0)
    try:
        c1 = socket.create_connection((srv.host, srv.port))
        c1.sendall(b"http://early.example/a.html\n"       # no header yet
                   b"priority:1 depth:5 test:1\n"
                   b"http://a.example/x.html\n"
                   b"http://b.example/y.h")               # partial
        sent = len(b"http://early.example/a.html\n"
                   b"priority:1 depth:5 test:1\n"
                   b"http://a.example/x.html\n"
                   b"http://b.example/y.h")
        assert srv.wait_bytes(sent)
        subs = srv.drain()
        assert [(s.url, s.depth, s.prio, s.test) for s in subs] == [
            ("http://a.example/x.html", 5, 0, True)]
        c1.sendall(b"tml\n")                              # finish the line
        sent += 4
        assert srv.wait_bytes(sent)
        assert [s.url for s in srv.drain()] == ["http://b.example/y.html"]
        # a SECOND connection starts headerless (per-connection state)
        c2 = socket.create_connection((srv.host, srv.port))
        c2.sendall(b"http://dropped.example/\n"
                   b"priority:0 depth:2 test:0\nhttp://c.example/z.html\nhttp://partial")
        sent += len(b"http://dropped.example/\n"
                    b"priority:0 depth:2 test:0\nhttp://c.example/z.html\nhttp://partial")
        assert srv.wait_bytes(sent)
        subs = srv.drain()
        assert [(s.url, s.depth, s.prio, s.test) for s in subs] == [
            ("http://c.example/z.html", 2, 1, False)]
        c2.close()                                        # EOF drops partial
        c1.close()
        assert srv.drain() == []
    finally:
        srv.close()


def test_submit_socket_matches_inject_and_watch(ray_session, web, seeds):
    """The full S2 operational shape: a mid-crawl test=1 submission
    through a REAL localhost TCP connection produces the identical
    crawl to inject= and to the oracle — including a test=0 refetch."""
    from larbin_ray.pipelines.crawl import ray_crawl
    from tests.test_crawl_e2e import assert_same_crawl

    urls = ["http://sitee.example/p/0.html", "http://nosuch.example/q.html"]
    cfg = _cfg()
    o = oracle_crawl(web, seeds, cfg, inject={3: urls})
    feed = {3: "priority:1 depth:%d test:1\n%s\n" % (
        cfg.depth_in_site, "\n".join(urls))}
    e_sock = ray_crawl(web, seeds, cfg, submit_port=0, submit_feed=feed)
    assert_same_crawl(o, e_sock)

    # test=0 set-without-test through the socket: refetch of a seen url
    target = f"http://{seeds[0].split('/')[2]}/p/0.html"
    o0 = oracle_crawl(web, seeds, cfg,
                      inject={4: [(target, cfg.depth_in_site, 0, False)]})
    feed0 = {4: "priority:1 depth:%d test:0\n%s\n" % (cfg.depth_in_site, target)}
    e0 = ray_crawl(web, seeds, cfg, submit_port=0, submit_feed=feed0)
    assert_same_crawl(o0, e0)
    assert [r["url"] for r in o0.fetched].count(target) == 2
