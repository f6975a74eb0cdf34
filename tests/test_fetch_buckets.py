"""Hash-partitioned fetch path (stages/fetch.py bucketed mode).

The broadcast index is the small-corpus fast path; past
``cfg.fetch_bucket_bytes`` of page bytes :func:`put_pages` partitions
the corpus into ``hash64(url) % B`` buckets and the fetch fn holds only
the buckets its batches touch (LRU-capped).  These tests pin the two
paths output-identical at the function level AND over a whole crawl,
including url misses (synthesized 404), the latency column, and the
LRU eviction path.
"""

import pyarrow as pa
import pytest

from larbin_ray.config import CrawlConfig
from larbin_ray.pipelines.crawl import ray_crawl
from larbin_ray.sources.synthweb import default_seeds, gen_web


def _frontier_batch(web: pa.Table, extra_miss: bool = True) -> pa.Table:
    urls = web["url"].to_pylist()[:40]
    # interleave order so one batch spans many buckets out of url order
    urls = urls[1::2] + urls[0::2]
    if extra_miss:
        urls.insert(3, "http://nosuchhost.example/missing.html")
        urls.append("http://miss2.example/")
    return pa.table({"url": pa.array(urls, pa.string())})


def test_bucketed_fetch_fn_matches_broadcast(ray_session):
    from larbin_ray.stages import fetch as F

    web = gen_web(120, 8, seed=11)
    assert "latency_ms" in web.column_names
    batch = _frontier_batch(web)

    ref_b = F.put_pages(web, 1)
    out_broadcast = F.make_fetch_fn(ref_b)(batch)
    refs = F.put_pages(web, 5)
    assert len(refs) == 5
    out_bucketed = F.make_fetch_fn(refs)(batch)

    assert out_bucketed.equals(out_broadcast)
    # misses synthesize the 404 on both paths
    i = batch["url"].to_pylist().index("http://miss2.example/")
    assert out_bucketed["html"].to_pylist()[i] == F.SYNTH_404
    assert out_bucketed["latency_ms"].to_pylist()[i] == 0


def test_bucketed_fetch_lru_eviction(ray_session, monkeypatch):
    """Correct output even when the LRU holds fewer buckets than the
    corpus has — every batch re-pulls evicted buckets transparently."""
    from larbin_ray.stages import fetch as F

    web = gen_web(96, 6, seed=13)
    batch = _frontier_batch(web)
    expect = F.make_fetch_fn(F.put_pages(web, 1))(batch)

    monkeypatch.setattr(F, "MAX_CACHED_BUCKETS", 2)
    F._BUCKET_CACHE.clear()
    refs = F.put_pages(web, 7)
    fn = F.make_fetch_fn(refs)
    got1 = fn(batch)
    got2 = fn(batch)           # second pass goes through evict/reload
    assert len(F._BUCKET_CACHE) <= 2
    assert got1.equals(expect) and got2.equals(expect)


def test_miss_hashing_to_empty_bucket(ray_session):
    """A frontier url absent from the corpus that lands in a bucket NO
    corpus url hashes to must synthesize the 404 like any other miss
    (regression: take() on the 0-row bucket array raised
    ArrowIndexError and killed the fetch task).  The empty bucket is
    derived with the ENGINE's bucket function (_url_bucket_array) so
    the premise survives hash changes — the original crc32 derivation
    stopped matching when bucketing moved to the sampled strhash."""
    from larbin_ray.stages import fetch as F

    web = gen_web(6, 2, seed=5)
    B = 64   # tiny corpus + many buckets guarantees empty buckets
    used = set(F._url_bucket_array(web["url"].combine_chunks(), B).tolist())
    assert len(used) < B

    def _bucket(u: str) -> int:
        return int(F._url_bucket_array(pa.array([u], pa.string()), B)[0])

    miss = next(u for u in (f"http://nosuch.example/{i}"
                            for i in range(10_000))
                if _bucket(u) not in used)
    refs = F.put_pages(web, B)
    batch = pa.table({"url": pa.array(
        [web["url"][0].as_py(), miss], pa.string())})
    out = F.make_fetch_fn(refs)(batch)
    assert out["html"].to_pylist()[1] == F.SYNTH_404
    assert out["latency_ms"].to_pylist()[1] == 0
    assert out["html"].to_pylist()[0] == web["html"][0].as_py()


def test_empty_batch_bucketed(ray_session):
    from larbin_ray.stages import fetch as F

    web = gen_web(32, 4, seed=3)
    refs = F.put_pages(web, 3)
    out = F.make_fetch_fn(refs)(pa.table({"url": pa.array([], pa.string())}))
    assert out.num_rows == 0
    assert out.column_names == ["url", "html", "latency_ms"]


def test_ray_data_tick_path_with_buckets(ray_session):
    """The streaming tick path's fetch closure carries the bucket refs
    through map_batches — must equal the task path's broadcast result."""
    web = gen_web(120, 8, seed=42)
    seeds = default_seeds(8)
    base = dict(depth_by_site=True, num_scheduler_shards=3,
                num_seen_shards=2)
    ref = ray_crawl(web, seeds, CrawlConfig(**base, fetch_num_buckets=1))
    got = ray_crawl(web, seeds, CrawlConfig(**base, fetch_num_buckets=4,
                                            ray_data_min_tick_rows=0))
    key = ("url", "tick", "ip", "sub", "status", "is_robots", "depth")
    assert [{k: r[k] for k in key} for r in got.fetched_sorted()] == \
           [{k: r[k] for k in key} for r in ref.fetched_sorted()]
    assert got.answers == ref.answers


def test_resume_with_buckets(ray_session, tmp_path):
    """Resume is fetch-path-agnostic: a crawl checkpointed on the
    broadcast path and resumed on the bucketed path (different shard
    counts too) ends in the uninterrupted run's exact state."""
    import numpy as np

    web = gen_web(60, 6, seed=42)
    seeds = default_seeds(6)
    cfg = CrawlConfig(depth_by_site=True, num_scheduler_shards=3,
                      num_seen_shards=2, checkpoint_every=4)
    full = ray_crawl(web, seeds, cfg)
    ck = str(tmp_path / "ck")
    ray_crawl(web, seeds, cfg, checkpoint_dir=ck, max_ticks=8)
    cfg2 = CrawlConfig(depth_by_site=True, num_scheduler_shards=2,
                       num_seen_shards=3, checkpoint_every=4,
                       fetch_num_buckets=5)
    resumed = ray_crawl(web, seeds, cfg2, checkpoint_dir=ck, resume=True)
    assert dict(resumed.answers) == dict(full.answers)
    assert np.array_equal(resumed.seen_indices, full.seen_indices)


@pytest.mark.parametrize("bucket_cfg", [dict(fetch_num_buckets=4),
                                        dict(fetch_bucket_bytes=1 << 12)])
def test_crawl_parity_bucketed_vs_broadcast(ray_session, bucket_cfg):
    """Whole-crawl equality: explicit B and the auto-by-bytes rule both
    produce the exact crawl the broadcast path produces (order keys,
    statuses, answers histogram)."""
    web = gen_web(240, 12, seed=42)
    seeds = default_seeds(12)
    base = dict(page_no_duplicate=True, depth_by_site=True, wait_duration=0,
                num_scheduler_shards=3, num_seen_shards=2)

    ref = ray_crawl(web, seeds, CrawlConfig(**base, fetch_num_buckets=1))
    got = ray_crawl(web, seeds, CrawlConfig(**base, **bucket_cfg))

    key = ("url", "tick", "ip", "sub", "status", "is_robots", "depth")
    assert [{k: r[k] for k in key} for r in got.fetched_sorted()] == \
           [{k: r[k] for k in key} for r in ref.fetched_sorted()]
    assert got.answers == ref.answers


def test_parquet_bucket_backend_matches_broadcast(ray_session, tmp_path):
    """The Parquet bucket backend (put_pages parquet_dir=...) must be
    output-identical to the broadcast and object-store-bucket paths at
    the function level — including misses, latency, and buckets no url
    hashes to (missing partition directories)."""
    from larbin_ray.stages import fetch as F

    web = gen_web(120, 8, seed=11)
    batch = _frontier_batch(web)
    expect = F.make_fetch_fn(F.put_pages(web, 1))(batch)

    paths = F.put_pages(web, 7, parquet_dir=str(tmp_path / "buckets"))
    assert len(paths) == 7 and all(isinstance(p, str) for p in paths)
    F._BUCKET_CACHE.clear()
    got = F.make_fetch_fn(paths)(batch)
    assert got.equals(expect)


def test_duplicate_urls_resolve_to_last_occurrence(ray_session, tmp_path):
    """Duplicate corpus urls resolve to the LAST occurrence in original
    table order — the oracle's dict-comprehension semantics
    (simcrawl.py index) and what the pre-r5 per-worker dict did — on
    all three fetch backends, and the whole crawl stays oracle-exact
    on the duplicated corpus."""
    from larbin_ray.oracle.simcrawl import oracle_crawl
    from larbin_ray.pipelines.crawl import ray_crawl
    from larbin_ray.stages import fetch as F
    from tests.test_crawl_e2e import assert_same_crawl

    web = gen_web(60, 6, seed=7)
    dup_url = web["url"][10].as_py()
    alt_html = web["html"][20].as_py()
    assert web["html"][10].as_py() != alt_html
    # a second row for dup_url with row 20's html: last occurrence wins
    extra = web.slice(20, 1).set_column(
        web.column_names.index("url"), "url",
        pa.array([dup_url], pa.string()))
    web2 = pa.concat_tables([web, extra])

    batch = pa.table({"url": pa.array([dup_url], pa.string())})
    for refs in (F.put_pages(web2, 1), F.put_pages(web2, 5),
                 F.put_pages(web2, 5, parquet_dir=str(tmp_path / "dupb"))):
        F._INDEX_CACHE.clear()
        F._BUCKET_CACHE.clear()
        out = F.make_fetch_fn(refs)(batch)
        assert out["html"].to_pylist()[0] == alt_html

    seeds = default_seeds(6)
    cfg = CrawlConfig(depth_by_site=True, num_scheduler_shards=3,
                      num_seen_shards=2)
    assert_same_crawl(oracle_crawl(web2, seeds, cfg),
                      ray_crawl(web2, seeds, cfg))


def test_parquet_bucket_backend_whole_crawl(ray_session, tmp_path):
    """Whole-crawl equality: the Parquet backend produces the identical
    crawl (order keys, answers, seen set) to the broadcast path."""
    from tests.test_crawl_e2e import assert_same_crawl

    web = gen_web(80, 6, seed=21)
    seeds = default_seeds(6)
    cfg = CrawlConfig(page_no_duplicate=True, depth_by_site=True,
                      num_scheduler_shards=3, num_seen_shards=2)
    base = ray_crawl(web, seeds, cfg)
    cfg_pq = CrawlConfig(page_no_duplicate=True, depth_by_site=True,
                         num_scheduler_shards=3, num_seen_shards=2,
                         fetch_num_buckets=4,
                         fetch_parquet_dir=str(tmp_path / "pqbuckets"))
    got = ray_crawl(web, seeds, cfg_pq)
    assert_same_crawl(base, got)
