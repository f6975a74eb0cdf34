"""Checkpoint/resume: an interrupted crawl resumed from its last
tick-boundary checkpoint (even with different shard counts) must end in
the same final state as an uninterrupted run — same answers histogram,
same URL-seen bitset, same sink pages."""

import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from larbin_ray.config import CrawlConfig
from larbin_ray.sources.synthweb import default_seeds, gen_web


@pytest.fixture(scope="module")
def web():
    return gen_web(60, 6, seed=42)


def _count_sink(out_dir):
    files = glob.glob(f"{out_dir}/pages/tick=*/part-*.parquet")
    n = 0
    by_status = {}
    for f in files:
        t = pq.read_table(f, columns=["status", "is_robots"])
        n += t.num_rows
        for s in t["status"].to_pylist():
            by_status[s] = by_status.get(s, 0) + 1
    return n, by_status


def test_resume_equals_uninterrupted(ray_session, web, tmp_path):
    from larbin_ray.pipelines.crawl import ray_crawl

    seeds = default_seeds(6)
    cfg = CrawlConfig(depth_by_site=True, num_scheduler_shards=3,
                      num_seen_shards=2, checkpoint_every=4)

    full = ray_crawl(web, seeds, cfg, out_dir=str(tmp_path / "full"))

    # interrupted run: stops mid-crawl right at a checkpoint boundary
    ck = str(tmp_path / "ck")
    part_out = str(tmp_path / "parts")
    ray_crawl(web, seeds, cfg, out_dir=part_out, checkpoint_dir=ck,
              max_ticks=8)
    assert os.path.exists(f"{ck}/manifest.json")
    assert os.path.exists(f"{ck}/metrics.parquet")

    # resume with DIFFERENT shard counts
    cfg2 = CrawlConfig(depth_by_site=True, num_scheduler_shards=2,
                       num_seen_shards=3, checkpoint_every=4)
    resumed = ray_crawl(web, seeds, cfg2, out_dir=part_out,
                        checkpoint_dir=ck, resume=True)

    assert dict(resumed.answers) == dict(full.answers)
    assert np.array_equal(resumed.seen_indices, full.seen_indices)
    n_full, st_full = _count_sink(str(tmp_path / "full"))
    n_part, st_part = _count_sink(part_out)
    assert n_full == n_part
    assert st_full == st_part
    # shard cores restart empty on resume: the failure log and RAM
    # high-water mark must survive through the manifest
    assert full.failures, "fixture web must produce admission failures"
    assert sorted(resumed.failures) == sorted(full.failures)
    assert resumed.max_host_ram == full.max_host_ram
    # metrics lineage stays continuous across the resume (the final
    # write must not overwrite the pre-resume tick rows)
    m = pq.read_table(f"{ck}/metrics.parquet").to_pylist()
    ticks = [r["tick"] for r in m]
    assert ticks == sorted(ticks) and ticks[0] == 0 and len(ticks) > 8


def test_checkpoint_metrics_lineage(ray_session, web, tmp_path):
    from larbin_ray.pipelines.crawl import ray_crawl

    cfg = CrawlConfig(depth_by_site=True, num_scheduler_shards=2,
                      num_seen_shards=2, checkpoint_every=3)
    ck = str(tmp_path / "ck2")
    ray_crawl(web, default_seeds(6), cfg, out_dir=str(tmp_path / "o2"),
              checkpoint_dir=ck)
    m = pq.read_table(f"{ck}/metrics.parquet").to_pylist()
    assert len(m) >= 3
    assert m[-1]["cum_success"] > 0
    ticks = [r["tick"] for r in m]
    assert ticks == sorted(ticks)
    # per-partition frontier/hosts/seen files exist under the
    # manifest's published state dir (atomic-publish layout)
    from larbin_ray.pipelines.checkpoint import state_path
    sp = state_path(ck)
    assert glob.glob(f"{sp}/frontier/shard=*.parquet")
    assert glob.glob(f"{sp}/hosts/shard=*.parquet")
    assert glob.glob(f"{sp}/seen/shard=*.npy")
    # exactly ONE live state dir: superseded ones were GC'd after the
    # manifest swap
    assert len(glob.glob(f"{ck}/state-*")) == 1


def test_frontier_roundtrip_preserves_admission_identity():
    """checkpoint_tables -> restore must carry each rec's akey + hc:
    a restored rec that later FAILS (noDNS at the first post-resume
    resolve, forbiddenRobots at transfer, overflow recycle) logs
    (url, reason, akey), so dropping the key would make a resumed
    crawl's failure log diverge from an uninterrupted one's (r5 review
    finding)."""
    from larbin_ray.stages.scheduler import SchedulerShardCore
    from larbin_ray.state.sites import HostState, IPState, UrlRec

    cfg = CrawlConfig(num_scheduler_shards=1)
    a = SchedulerShardCore(0, cfg)
    ca = a.core
    r_pend = UrlRec(b"waiting.example", 80, b"/p/1.html", 4,
                    akey=(1, "10.0.0.9", 3, 7), cookie=b"k=v", hc=111)
    r_queue = UrlRec(b"done.example", 80, b"/q.html", 5,
                     akey=(0, "10.0.0.2", 0, 1), hc=222)
    r_over = UrlRec(b"capped.example", 8080, b"/o.html", 2,
                    akey=(2, "10.0.0.3", 9, 0), hc=333)
    h_wait = HostState(b"waiting.example", 80)
    h_wait.pending.append(r_pend)
    h_wait.nburls = 1
    ca.hosts[(b"waiting.example", 80)] = h_wait
    ca.unresolved.append((b"waiting.example", 80))
    ca.hosts[(b"done.example", 80)] = HostState(
        b"done.example", 80, dns_state="done", ip="10.0.0.2")
    st = IPState()
    st.queue.append(r_queue)
    ca.ips["10.0.0.2"] = st
    ca.overflow.append(r_over)

    frontier, hosts = a.checkpoint_tables()
    b = SchedulerShardCore(0, cfg)
    b.restore(frontier, hosts)
    cb = b.core

    def key(rec):
        return (rec.host, rec.port, rec.file, rec.depth, rec.akey,
                rec.cookie, rec.hc)

    assert key(cb.hosts[(b"waiting.example", 80)].pending[0]) == key(r_pend)
    assert key(cb.ips["10.0.0.2"].queue[0]) == key(r_queue)
    assert key(cb.overflow[0]) == key(r_over)


def test_checkpoint_partial_state_dir_is_ignored(ray_session, web, tmp_path):
    """Atomic publish: a crashed mid-checkpoint write (a state dir that
    never made it into the manifest — possibly with truncated files)
    must not affect restore, which reads only the manifest's published
    state dir."""
    import numpy as np

    from larbin_ray.pipelines.crawl import ray_crawl

    seeds = default_seeds(6)
    cfg = CrawlConfig(depth_by_site=True, num_scheduler_shards=2,
                      num_seen_shards=2, checkpoint_every=4)
    full = ray_crawl(web, seeds, cfg)
    ck = str(tmp_path / "ck")
    ray_crawl(web, seeds, cfg, checkpoint_dir=ck, max_ticks=8)
    # simulate a crash during a LATER checkpoint: garbage state dir
    # (truncated parquet) alongside the published one
    bad = f"{ck}/state-999/frontier"
    os.makedirs(bad)
    with open(f"{bad}/shard=0.parquet", "wb") as f:
        f.write(b"PAR1 truncated garbage")
    resumed = ray_crawl(web, seeds, cfg, checkpoint_dir=ck, resume=True)
    assert dict(resumed.answers) == dict(full.answers)
    assert np.array_equal(resumed.seen_indices, full.seen_indices)


def test_resume_rejects_dup_config_mismatch(ray_session, web, tmp_path):
    """Resuming with page_no_duplicate flipped must raise — the stored
    content-dup state cannot be reconciled (off->on has no dup bitset;
    on->off would silently drop it and diverge the histogram)."""
    from larbin_ray.pipelines.crawl import ray_crawl

    seeds = default_seeds(6)
    cfg_off = CrawlConfig(depth_by_site=True, num_scheduler_shards=2,
                          num_seen_shards=2, checkpoint_every=4)
    ck = str(tmp_path / "ck")
    ray_crawl(web, seeds, cfg_off, checkpoint_dir=ck, max_ticks=8)
    cfg_on = CrawlConfig(page_no_duplicate=True, depth_by_site=True,
                         num_scheduler_shards=2, num_seen_shards=2,
                         checkpoint_every=4)
    with pytest.raises(ValueError, match="page_no_duplicate"):
        ray_crawl(web, seeds, cfg_on, checkpoint_dir=ck, resume=True)


def test_stats_report(ray_session, tmp_path):
    """K8 stats surface: the printStats/webserver-style report renders
    from a checkpoint's metrics.parquet + manifest."""
    from larbin_ray.config import CrawlConfig
    from larbin_ray.pipelines.crawl import ray_crawl
    from larbin_ray.pipelines.stats import crawl_stats_report
    from larbin_ray.sources.synthweb import default_seeds, gen_web

    ck = str(tmp_path / "ck_stats")
    cfg = CrawlConfig(depth_by_site=True, num_scheduler_shards=2,
                      num_seen_shards=2, checkpoint_every=5)
    res = ray_crawl(gen_web(60, 6, seed=42), default_seeds(6), cfg,
                    checkpoint_dir=ck)
    report = crawl_stats_report(ck)
    assert "crawl stats" in report
    assert f"success (cum):   {res.answers['success']}" in report
    assert "answers histogram" in report
    assert "resumable from tick" in report
    # bare metrics.parquet also works
    assert "crawl stats" in crawl_stats_report(f"{ck}/metrics.parquet")
