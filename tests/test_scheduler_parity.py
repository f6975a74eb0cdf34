"""Fuzz parity: the vectorized shard barrier (`pre_admit_links`) vs the
serial executable spec (`SchedulerCore.pre_admit`).

The shard path sorts with a numpy lexsort over dense-ranked parent-ip
keys and runs the initOK fast-fails over raw entry tuples with a
per-tick (host, port) memo; the spec sorts tuples and walks UrlRecs one
by one.  Both must produce the same survivors (keys AND order), the
same answers histogram, the same failures list, and — after identical
seen verdicts — the same enqueued frontier.
"""

import random
from operator import itemgetter

import numpy as np

from larbin_ray.config import CrawlConfig
from larbin_ray.state.sites import HostState, SchedulerCore, UrlRec
from larbin_ray.stages.scheduler import SchedulerShardCore

HOSTS = [b"a.example", b"b.example", b"c.example", b"d.example",
         b"www.xn--caf-dma.example", b"e.example"]
FILES = [b"/", b"/p/1.html", b"/private/x.html", b"/p/2.html",
         b"/cgi-bin/q?x=1"]
IPS = ["", "10.0.0.1", "10.0.0.2", "192.168.7.13"]
STATES = ["wait", "done", "error", "noconn", "absent"]


def _seed_state(core: SchedulerCore, rng: random.Random) -> None:
    """Randomized host table: every dns_state, robots with and without
    patterns."""
    for h in HOSTS:
        st = rng.choice(STATES)
        if st == "absent":
            continue
        hs = HostState(core.site_key(h), 80)
        hs.dns_state = st
        if st == "done":
            hs.ip = rng.choice(IPS[1:])
            hs.robots = [b"/private", b"/cgi-bin"] if rng.random() < 0.5 else []
        core.hosts[(core.site_key(h), 80)] = hs
        if st == "done" and hs.ip:
            from larbin_ray.state.sites import IPState
            core.ips.setdefault(hs.ip, IPState())


def _entries(rng: random.Random, n: int) -> list[tuple]:
    out = []
    for i in range(n):
        host = rng.choice(HOSTS)
        file = rng.choice(FILES)
        ip = rng.choice(IPS)
        prio = rng.choice([0, 1])
        sub = rng.randrange(4)
        order = rng.randrange(64)
        psub = -1 if rng.random() < 0.1 else sub   # ~10% check()-path
        cookie = b"k=v" if rng.random() < 0.2 else None
        hc = rng.randrange(1 << 26)
        out.append((prio, ip, sub, order, host, 80, file, 3, hc,
                    ip, psub, cookie))
    return out


def _spec_run(cfg: CrawlConfig, seed: int, entries: list[tuple]):
    """The serial spec: tuple sort + UrlRec build + core.pre_admit."""
    core = SchedulerCore(cfg)
    _seed_state(core, random.Random(seed))
    buf = sorted(entries, key=itemgetter(0, 1, 2, 3))
    recs = [UrlRec(e[4], e[5], e[6], e[7], akey=(e[0], e[1], e[2], e[3]),
                   cookie=e[11], hc=e[8]) for e in buf]
    skip = [e[10] == -1 for e in buf]
    surv = core.pre_admit(recs, skip)
    return core, surv


def _frontier_snapshot(core: SchedulerCore):
    qs = {ip: [(r.host, r.port, r.file, r.depth, r.cookie, r.hc)
               for r in st.queue] for ip, st in core.ips.items()}
    pend = {k: [(r.host, r.port, r.file, r.depth, r.cookie, r.hc)
                for r in h.pending] for k, h in core.hosts.items()}
    return qs, pend, [(r.host, r.file) for r in core.overflow]


def test_pre_admit_links_matches_spec_fuzz():
    for seed in range(20):
        rng = random.Random(1000 + seed)
        cfg = CrawlConfig(num_scheduler_shards=1,
                          ignore_robots=rng.random() < 0.2,
                          max_urls_by_site=rng.choice([0, 3]))
        entries = _entries(rng, rng.randrange(1, 200))

        shard = SchedulerShardCore(0, cfg)
        _seed_state(shard.core, random.Random(seed))
        shard.submit_links(entries)
        keys = shard.pre_admit_links([])

        spec_core, spec_surv = _spec_run(cfg, seed, entries)

        # survivors: same keys, same global admission order
        assert len(shard._surv_entries) == len(spec_surv)
        for e, r in zip(shard._surv_entries, spec_surv):
            assert (e[0], e[1], e[2], e[3]) == r.akey
            assert (e[4], e[5], e[6], e[7], e[8]) == \
                (r.host, r.port, r.file, r.depth, r.hc)
        np.testing.assert_array_equal(
            keys["hash"], np.asarray([r.hc for r in spec_surv], np.int64))
        for col, ak in (("prio", 0), ("sub", 2), ("order", 3)):
            np.testing.assert_array_equal(
                keys[col],
                np.asarray([r.akey[ak] for r in spec_surv], np.int64))
        # the ip-encode columns must match the reference big-endian
        # int-pair encoding (the dense-rank scatter is an optimization)
        def _enc(ip: str) -> tuple[int, int]:
            b = ip.encode("latin-1")[:16].ljust(16, b"\0")
            return int.from_bytes(b[:8], "big"), int.from_bytes(b[8:], "big")
        np.testing.assert_array_equal(
            keys["ip_hi"],
            np.asarray([_enc(r.akey[1])[0] for r in spec_surv], np.int64))
        np.testing.assert_array_equal(
            keys["ip_lo"],
            np.asarray([_enc(r.akey[1])[1] for r in spec_surv], np.int64))

        # fast-fail bookkeeping: identical histogram AND failure rows
        assert shard.core.answers == spec_core.answers
        assert shard.core.failures == spec_core.failures

        # identical verdicts => identical frontier state
        verd = [rng.random() < 0.5 for _ in spec_surv]
        shard.enqueue_verdicts(verd)
        spec_core.enqueue([r for r, v in zip(spec_surv, verd) if v])
        assert _frontier_snapshot(shard.core) == _frontier_snapshot(spec_core)


def test_pre_admit_links_empty_tick():
    shard = SchedulerShardCore(0, CrawlConfig(num_scheduler_shards=1))
    keys = shard.pre_admit_links([])
    assert all(len(v) == 0 for v in keys.values())
    assert all(v.dtype == np.int64 for v in keys.values())
    assert shard.enqueue_verdicts([]) == 0
