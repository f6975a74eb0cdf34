"""Fetch stage — the "network" of the rebuild.

The reference's non-blocking socket fetch (site.cxx:572-644,
fetch_pipe.cxx) becomes a lookup of the frontier batch against the
web-pages Parquet table (SURVEY.md §2.1 S5): a ``map_batches`` function
over zero-copy Arrow batches that appends the ``html`` column.  A URL
absent from the table gets a synthesized 404 (the host resolved and
connected — only the path is unknown), keeping the error taxonomy live.

Scale notes (10^10 frontier):
- small corpora are broadcast once (``ray.put``) and indexed per worker
  process (cached by object-ref hex, so Ray's worker reuse amortizes
  the index build across ticks and stages);
- past ``CrawlConfig.fetch_bucket_bytes`` of page bytes the SAME stage
  runs hash-partitioned: :func:`put_pages` splits the table into
  ``crc32(url) % B`` buckets (one object-store entry each) and the
  fetch fn groups every batch by bucket, building/holding only the
  per-bucket indexes its batches actually touch, under an LRU cap
  (``MAX_CACHED_BUCKETS``).  No worker ever materializes an O(corpus)
  dict, no single object has to fit a node, and on a multi-node
  cluster each bucket is pulled only to the nodes whose frontier
  partitions hit it.  Both paths are output-identical
  (tests/test_fetch_buckets.py asserts fn-level and whole-crawl
  equality).  At real 100-TB scale the bucket objects become bucketed
  Parquet files read lazily per worker; only ``_load_bucket`` changes.
"""

from __future__ import annotations

from collections import OrderedDict

import pyarrow as pa
import ray

SYNTH_404 = b"HTTP/1.0 404 Not Found\r\nContent-Type: text/html\r\n\r\n"

_INDEX_CACHE: dict[str, tuple] = {}

# bucketed path: per-worker LRU of (url->row dict, html array, latency)
# keyed by bucket ref — bounds worker memory to MAX_CACHED_BUCKETS
# buckets regardless of corpus size
_BUCKET_CACHE: "OrderedDict[str, tuple]" = OrderedDict()
MAX_CACHED_BUCKETS = 64

# driver-side: one live broadcast per pages table object.  Re-crawling
# the same table (warm run -> timed runs; checkpoint resume; repeated
# tests) must NOT re-put the GB html column nor hand workers a fresh
# ref — a new ref invalidates every worker's url-index cache and the
# whole pool re-pays the ~0.5 s/worker build inside the first timed
# waves (measured: ~8 s of ramp across ticks 0-5 at 400k pages).
_PUT_CACHE: list = []      # [(pages_table, ref)] — single entry


def _url_bucket_array(urls: list, num_buckets: int):
    """Stable url -> bucket assignment shared by put and fetch sides."""
    import zlib

    import numpy as np
    return np.fromiter(
        (zlib.crc32(u.encode("utf-8", "surrogateescape")) % num_buckets
         for u in urls),
        dtype=np.int64, count=len(urls))


def put_pages(pages: pa.Table, num_buckets: int = 1) -> list:
    """Publish the pages table to the object store; returns the list of
    bucket refs (length 1 = the broadcast fast path).

    ``num_buckets > 1`` hash-partitions the corpus by ``crc32(url) % B``
    into B independent objects — the design path once the corpus
    outgrows a single broadcast (see module docstring).  The partition
    pass is one driver-side sort+take (the same single copy the
    broadcast path already pays in ``combine_chunks``); at real scale
    this pass is a one-time ``write_parquet(partition_cols=[bucket])``
    job, not driver work.

    Columns are combined to single chunks HERE (one driver-side copy):
    ``ChunkedArray.take`` is pathologically slow (measured 250 ms for a
    512-row gather over a 4-chunk 400k-row binary column vs 0.1 ms on
    the combined Array), and combining worker-side would copy the
    GB-scale html column into every worker heap.  Memoized on (table
    identity, ray job id): Arrow tables are immutable, so back-to-back
    crawls of the same web in one session share one object and one
    per-worker index, while a ray.shutdown()/init() cycle (new job id)
    invalidates the cached ref from the dead cluster."""
    job_id = ray.get_runtime_context().get_job_id()
    if (_PUT_CACHE and _PUT_CACHE[0][0] is pages
            and _PUT_CACHE[0][2] == job_id
            and _PUT_CACHE[0][3] == num_buckets):
        return _PUT_CACHE[0][1]
    cols = ["url", "html"]
    if "latency_ms" in pages.column_names:
        cols.append("latency_ms")
    tbl = pages.select(cols)
    # 64-bit offsets for the body column: past ~2 GiB of total page
    # bytes a 32-bit-offset binary column cannot combine into one chunk,
    # and ChunkedArray.take dies with "offset overflow while
    # concatenating" (first hit at the 4M-page design-scale web).  The
    # cast is one driver-side copy; fetch() casts each batch-sized
    # gather back to binary so the downstream schema is unchanged.
    h = tbl.column("html")
    if h.type == pa.binary():
        tbl = tbl.set_column(tbl.column_names.index("html"), "html",
                             h.cast(pa.large_binary()))
    tbl = tbl.combine_chunks()
    if num_buckets <= 1:
        refs = [ray.put(tbl)]
    else:
        import numpy as np
        bk = _url_bucket_array(tbl["url"].to_pylist(), num_buckets)
        order = np.argsort(bk, kind="stable")
        srt = tbl.take(pa.array(order)).combine_chunks()
        starts = np.searchsorted(bk[order], np.arange(num_buckets))
        ends = np.searchsorted(bk[order], np.arange(num_buckets), "right")
        # slices are zero-copy views; ray.put serializes each slice only
        refs = [ray.put(srt.slice(int(s), int(e - s)))
                for s, e in zip(starts, ends)]
    _PUT_CACHE.clear()           # hold one web at a time (frees the old objects)
    _PUT_CACHE.append((pages, refs, job_id, num_buckets))
    return refs


def _build_index(table: pa.Table) -> tuple:
    """(url->row dict, html array view, latency np array) for one pages
    table/bucket — the single definition both cache policies share."""
    idx = {u: i for i, u in enumerate(table["url"].to_pylist())}
    lat = (table["latency_ms"].combine_chunks().to_numpy()
           if "latency_ms" in table.column_names else None)
    html = table["html"]
    if html.num_chunks == 1:
        html = html.chunk(0)     # zero-copy Array view: fast take()
    return (idx, html, lat)


def _index_for(pages_ref) -> tuple:
    """Per-worker cached (url->row dict, html ChunkedArray, latency
    list).  The dict build is a one-time ~0.5 s per worker (amortized
    across the crawl; the raylet no longer culls and respawns workers —
    bench raises num_workers_soft_limit); the html column stays a
    ChunkedArray view into the shared object store — combining it would
    COPY the whole GB-scale body column into every worker heap."""
    key = pages_ref.hex()
    hit = _INDEX_CACHE.get(key)
    if hit is None:
        hit = _build_index(ray.get(pages_ref))
        _INDEX_CACHE.clear()   # one pages table per crawl; don't leak old ones
        _BUCKET_CACHE.clear()  # nor the other mode's per-bucket indexes
        _INDEX_CACHE[key] = hit
    return hit


def _load_bucket(ref) -> tuple:
    """Per-worker LRU-cached index for ONE bucket of a partitioned
    corpus.  Unlike :func:`_index_for`, many buckets coexist (a
    worker's batches span buckets) but never more than
    ``MAX_CACHED_BUCKETS`` — worker memory is bounded by bucket size x
    cap, not corpus size."""
    key = ref.hex()
    hit = _BUCKET_CACHE.get(key)
    if hit is not None:
        _BUCKET_CACHE.move_to_end(key)
        return hit
    hit = _build_index(ray.get(ref))
    _INDEX_CACHE.clear()   # a prior broadcast crawl's O(corpus) dict
    _BUCKET_CACHE[key] = hit
    while len(_BUCKET_CACHE) > MAX_CACHED_BUCKETS:
        _BUCKET_CACHE.popitem(last=False)
    return hit


def _make_bucketed_fetch(refs: list):
    """Fetch fn over a ``crc32(url) % B``-partitioned corpus: group the
    batch by bucket, gather per bucket through the LRU index, restore
    the batch's row order.  Output-identical to the broadcast path."""
    num_buckets = len(refs)

    def fetch(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc
        n = batch.num_rows
        urls = batch["url"].to_pylist()
        bk = _url_bucket_array(urls, num_buckets)
        order = np.argsort(bk, kind="stable")
        sb = bk[order]
        group_starts = (np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]])
                        if n else np.empty(0, dtype=np.int64))
        bounds = np.r_[group_starts, n]
        parts = []
        miss = np.zeros(n, dtype=bool)
        lat_out = np.zeros(n, dtype=np.int64)
        for gi in range(len(group_starts)):
            s, e = int(bounds[gi]), int(bounds[gi + 1])
            rows = order[s:e]
            idx, html_col, lat_col = _load_bucket(refs[int(sb[s])])
            if not idx:
                # a bucket no corpus url hashes to: every row is a miss
                # (pos would clamp to 0 and take() on the 0-row array
                # raises) — emit placeholders; the miss mask rewrites
                # them to SYNTH_404 below
                miss[rows] = True
                parts.append(pa.array([b""] * len(rows), pa.binary()))
                continue
            pos = np.fromiter((idx.get(urls[i], -1) for i in rows),
                              dtype=np.int64, count=len(rows))
            m = pos < 0
            pos[m] = 0
            taken = html_col.take(pa.array(pos))
            if isinstance(taken, pa.ChunkedArray):
                taken = taken.combine_chunks()
            if taken.type == pa.large_binary():
                taken = taken.cast(pa.binary())
            parts.append(taken)
            miss[rows] = m
            if lat_col is not None:
                v = lat_col[pos].astype(np.int64, copy=True)
                v[m] = 0
                lat_out[rows] = v
        if parts:
            inv = np.empty(n, dtype=np.int64)
            inv[order] = np.arange(n)
            gathered = pa.concat_arrays(parts).take(pa.array(inv))
        else:
            gathered = pa.array([], pa.binary())
        html_out = pc.if_else(pa.array(miss),
                              pa.scalar(SYNTH_404, pa.binary()), gathered)
        batch = batch.append_column("html", html_out)
        return batch.append_column("latency_ms", pa.array(lat_out))

    return fetch


def make_fetch_fn(pages_refs):
    """Returns a map_batches fn: adds ``html`` (binary) and
    ``latency_ms`` (simulated server latency, 0 when the pages table
    has no latency column) to the batch.

    ``pages_refs`` is :func:`put_pages`'s return: a 1-list (broadcast
    fast path) or a B-list (hash-partitioned scale path); a bare ref is
    accepted for back-compat."""
    if isinstance(pages_refs, (list, tuple)):
        if len(pages_refs) > 1:
            return _make_bucketed_fetch(list(pages_refs))
        pages_ref = pages_refs[0]
    else:
        pages_ref = pages_refs

    def fetch(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc
        idx, html_col, lat_col = _index_for(pages_ref)
        urls = batch["url"].to_pylist()
        if not idx:
            # empty pages table: every row is a miss (same guard as the
            # bucketed path — take() on a 0-row array raises)
            n = len(urls)
            batch = batch.append_column(
                "html", pa.array([SYNTH_404] * n, pa.binary()))
            return batch.append_column(
                "latency_ms", pa.array(np.zeros(n, dtype=np.int64)))
        pos = np.fromiter((idx.get(u, -1) for u in urls),
                          dtype=np.int64, count=len(urls))
        miss = pos < 0
        pos[miss] = 0
        # one vectorized gather of the batch's rows out of the shared
        # html column (copies only batch-sized data)
        taken = html_col.take(pa.array(pos))
        if isinstance(taken, pa.ChunkedArray):
            taken = taken.combine_chunks()
        if taken.type == pa.large_binary():
            taken = taken.cast(pa.binary())   # batch-sized, no overflow
        miss_arr = pa.array(miss)
        html_out = pc.if_else(miss_arr, pa.scalar(SYNTH_404, pa.binary()), taken)
        if lat_col is not None:
            lat_np = lat_col[pos].astype(np.int64, copy=True)
            lat_np[miss] = 0
            lat_out = pa.array(lat_np)
        else:
            lat_out = pa.array(np.zeros(len(urls), dtype=np.int64))
        batch = batch.append_column("html", html_out)
        return batch.append_column("latency_ms", lat_out)

    return fetch
