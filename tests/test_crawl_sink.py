"""Distributed sink under pageNoDuplicate (the larbin-test.conf shipped
profile): page text must never ship to the driver — tasks write their
own Parquet slices with pre-dup statuses and the driver records only a
tiny per-tick duplicate-url sidecar; read_crawl_pages() reassembles the
final table bit-identically to the in-memory crawl result."""

import glob

import pyarrow.parquet as pq

from larbin_ray.config import CrawlConfig
from larbin_ray.oracle.simcrawl import oracle_crawl
from larbin_ray.sources.synthweb import default_seeds, gen_web


def test_dup_mode_sink_distributed(ray_session, tmp_path):
    from larbin_ray.pipelines.crawl import ray_crawl, read_crawl_pages

    web = gen_web(60, 6, seed=42)
    seeds = default_seeds(6)
    cfg = CrawlConfig(page_no_duplicate=True, depth_by_site=True,
                      num_scheduler_shards=3, num_seen_shards=2)
    out = str(tmp_path / "sink")
    res = ray_crawl(web, seeds, cfg, out_dir=out)

    # the crawl result itself is unchanged by sink mode (== oracle)
    o = oracle_crawl(web, seeds, cfg)
    assert dict(o.answers) == dict(res.answers)
    assert sorted(o.order_keys()) == sorted(res.order_keys())

    # sink slices are task-written (multiple parts across ticks) and at
    # least one status was patched to `duplicate` via the sidecar
    parts = glob.glob(f"{out}/pages/tick=*/part-*.parquet")
    assert len(parts) > 1
    patches = glob.glob(f"{out}/dup_patches/tick=*.parquet")
    assert patches, "fixture web contains duplicate bodies"
    n_patched = sum(pq.read_table(p).num_rows for p in patches)
    assert n_patched == res.answers["duplicate"]

    # read-back == the in-memory result: status per url (incl. patched
    # duplicates) and byte-identical text for every successful page
    tbl = read_crawl_pages(out)
    sink_status = dict(zip(tbl["url"].to_pylist(), tbl["status"].to_pylist()))
    sink_text = dict(zip(tbl["url"].to_pylist(), tbl["text"].to_pylist()))
    assert len(sink_status) == tbl.num_rows == len(res.fetched)
    keep = ray_crawl(web, seeds, cfg)       # keep-text reference run
    for r in keep.fetched:
        st = "robots" if r["is_robots"] else r["status"]
        assert sink_status[r["url"]] == st
        if st == "success":
            assert sink_text[r["url"]] == r["text"]


def test_dup_mode_sink_ray_data_path(ray_session, tmp_path):
    """Same invariants with every tick forced through the Ray Data
    streaming pipeline (batch-side sink writes)."""
    from larbin_ray.pipelines.crawl import ray_crawl, read_crawl_pages

    web = gen_web(60, 6, seed=42)
    seeds = default_seeds(6)
    cfg = CrawlConfig(page_no_duplicate=True, depth_by_site=True,
                      num_scheduler_shards=2, num_seen_shards=2,
                      ray_data_min_tick_rows=0)
    out = str(tmp_path / "sink_rd")
    res = ray_crawl(web, seeds, cfg, out_dir=out)
    tbl = read_crawl_pages(out)
    assert tbl.num_rows == len(res.fetched)
    sink_status = dict(zip(tbl["url"].to_pylist(), tbl["status"].to_pylist()))
    for r in res.fetched:
        assert sink_status[r["url"]] == ("robots" if r["is_robots"]
                                         else r["status"])
    n_dup = sum(1 for s in sink_status.values() if s == "duplicate")
    assert n_dup == res.answers["duplicate"]


def test_sink_rerun_hygiene_and_empty_read(ray_session, tmp_path):
    """Re-crawling into the same out_dir must not leave stale parts or
    dup sidecars behind (a shorter rerun wipes prior output at start,
    each tick clears its own dir), and read_crawl_pages on a sink with
    no parts returns an empty table instead of raising."""
    from larbin_ray.pipelines.crawl import ray_crawl, read_crawl_pages

    web = gen_web(60, 6, seed=42)
    seeds = default_seeds(6)
    out = str(tmp_path / "sink")
    cfg = CrawlConfig(page_no_duplicate=True, depth_by_site=True,
                      num_scheduler_shards=2, num_seen_shards=2)
    full = ray_crawl(web, seeds, cfg, out_dir=out)
    assert read_crawl_pages(out).num_rows == len(full.fetched)

    # shorter rerun (limit_page) into the same dir: all output belongs
    # to the rerun — no stale later-tick parts or sidecars survive
    cfg_short = CrawlConfig(page_no_duplicate=True, depth_by_site=True,
                            num_scheduler_shards=2, num_seen_shards=2,
                            limit_page=5)
    short = ray_crawl(web, seeds, cfg_short, out_dir=out)
    tbl = read_crawl_pages(out)
    assert tbl.num_rows == len(short.fetched) < len(full.fetched)
    n_dup = sum(1 for r in short.fetched if r["status"] == "duplicate")
    assert (tbl.filter(
        __import__("pyarrow").compute.equal(tbl["status"], "duplicate"))
        .num_rows == n_dup)

    # identical rerun overwrites its own parts (no duplicated rows)
    again = ray_crawl(web, seeds, cfg, out_dir=out)
    assert read_crawl_pages(out).num_rows == len(again.fetched)

    # empty sink dir -> empty table, not ArrowInvalid
    assert read_crawl_pages(str(tmp_path / "nothing")).num_rows == 0


def test_dup_patch_scoped_to_tick(tmp_path):
    """A dup patch flips only its own tick's page row: the same url can
    appear in other sink rows legitimately (robots fetches bypass the
    url-seen set; test=0 submissions refetch)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from larbin_ray.pipelines.crawl import read_crawl_pages

    out = tmp_path / "sink"
    for tick, st in ((0, "success"), (1, "success")):
        d = out / "pages" / f"tick={tick}"
        d.mkdir(parents=True)
        pq.write_table(pa.table({
            "url": ["http://h.example/x.html"],
            "tick": pa.array([tick], pa.int64()),
            "sub": pa.array([0], pa.int64()),
            "is_robots": [False],
            "status": [st],
        }), d / "part-0.parquet")
    (out / "dup_patches").mkdir()
    pq.write_table(pa.table({"url": ["http://h.example/x.html"],
                             "sub": pa.array([0], pa.int64())}),
                   out / "dup_patches" / "tick=1.parquet")

    got = read_crawl_pages(str(out)).sort_by("tick")
    assert got["status"].to_pylist() == ["success", "duplicate"]


def test_pages_broadcast_uses_large_offsets(ray_session):
    """The broadcast html column must carry 64-bit offsets: past ~2 GiB
    of total page bytes a 32-bit binary column cannot combine into one
    chunk and ChunkedArray.take dies with "offset overflow while
    concatenating" (first hit at the 4M-page design-scale web).  fetch()
    casts each batch-sized gather back to plain binary so the pipeline
    schema is unchanged."""
    import pyarrow as pa
    import ray

    from larbin_ray.stages.fetch import make_fetch_fn, put_pages

    web = gen_web(64, 4, seed=7)
    ref = put_pages(web)
    stored = ray.get(ref[0])
    assert stored["html"].type == pa.large_binary()
    assert stored["html"].num_chunks == 1

    batch = pa.table({"url": web["url"].slice(0, 8).combine_chunks()})
    out = make_fetch_fn(ref)(batch)
    assert out["html"].type == pa.binary()
    assert out["html"].to_pylist() == web["html"].slice(0, 8).to_pylist()


def test_dup_patch_disambiguates_same_url_same_tick(tmp_path):
    """A url legitimately fetched TWICE within one tick (test=0 refetch
    in drain mode) where only the second fetch lost the content-dup
    race: the patch keys on (tick, sub, url), so only the losing sink
    row's status flips (r5 review finding — a (tick, url) key flipped
    both)."""
    import os

    import pyarrow as pa

    from larbin_ray.pipelines.crawl import read_crawl_pages

    out = str(tmp_path / "sink")
    os.makedirs(f"{out}/pages/tick=3", exist_ok=True)
    os.makedirs(f"{out}/dup_patches", exist_ok=True)
    rows = pa.table({
        "url": pa.array(["http://a.example/x.html"] * 2
                        + ["http://b.example/y.html"], pa.string()),
        "tick": pa.array([3, 3, 3], pa.int64()),
        "sub": pa.array([0, 5, 5], pa.int64()),
        "status": pa.array(["success"] * 3, pa.string()),
        "is_robots": pa.array([False] * 3, pa.bool_()),
    })
    pq.write_table(rows, f"{out}/pages/tick=3/part-0.parquet")
    # the dup barrier flagged only the SECOND fetch of a.example (sub=5)
    pq.write_table(pa.table({"url": pa.array(["http://a.example/x.html"],
                                             pa.string()),
                             "sub": pa.array([5], pa.int64())}),
                   f"{out}/dup_patches/tick=3.parquet")
    got = read_crawl_pages(out)
    by = {(r["sub"], r["url"]): r["status"] for r in got.to_pylist()}
    assert by[(0, "http://a.example/x.html")] == "success"
    assert by[(5, "http://a.example/x.html")] == "duplicate"
    assert by[(5, "http://b.example/y.html")] == "success"
