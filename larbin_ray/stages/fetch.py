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
  ``hash64(url) % B`` buckets (one object-store entry each) and the
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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from larbin_ray.kernels.strhash import hash_str_array

SYNTH_404 = b"HTTP/1.0 404 Not Found\r\nContent-Type: text/html\r\n\r\n"

_INDEX_CACHE: dict[str, "_UrlIndex"] = {}

# bucketed path: per-worker LRU of _UrlIndex objects keyed by bucket
# ref — bounds worker memory to MAX_CACHED_BUCKETS buckets regardless
# of corpus size
_BUCKET_CACHE: "OrderedDict[str, _UrlIndex]" = OrderedDict()
MAX_CACHED_BUCKETS = 64

# driver-side: one live broadcast per pages table object.  Re-crawling
# the same table (warm run -> timed runs; checkpoint resume; repeated
# tests) must NOT re-put the GB html column nor hand workers a fresh
# ref — a new ref invalidates every worker's url-index cache and the
# whole pool re-pays the ~0.5 s/worker build inside the first timed
# waves (measured: ~8 s of ramp across ticks 0-5 at 400k pages).
# Single entry: (pages_table, bucket_ref_list, job_id, num_buckets) —
# put_pages returns the ref LIST (len 1 = broadcast fast path).
_PUT_CACHE: list = []

# worker-side cache mode: 'broadcast' | 'bucketed' | None.  A mode
# SWITCH evicts the other mode's indexes once; repeated misses within
# one mode must not (alternating broadcast/bucketed work on a warm
# worker would otherwise rebuild the O(corpus) broadcast index on
# every bucket miss).
_CACHE_MODE: list = [None]


def _serialized_nbytes(obj) -> int:
    """Out-of-band serialized size — the same protocol-5 zero-copy path
    ray.put takes, so this measures what actually lands in plasma."""
    import pickle
    bufs: list = []
    n = len(pickle.dumps(obj, protocol=5, buffer_callback=bufs.append))
    return n + sum(b.raw().nbytes for b in bufs)


# one-time (per process) verdict on whether pickling a zero-copy table
# slice truncates the parent buffers.  Current pyarrow does; a version
# that serialized the PARENT buffer would make every bucket object embed
# the whole corpus, silently defeating the bucketed path's memory bound
# — in that case put_pages deep-copies each slice (gather) instead.
_SLICE_TRUNCATION_OK: list = [None]


def _slices_truncate_ok(full: pa.Table) -> bool:
    if _SLICE_TRUNCATION_OK[0] is None:
        # probe with a TINY slice, not the largest bucket: a truncating
        # pickle serializes to ~the slice's bytes, an embedding one to
        # ~the corpus, so the midpoint discriminates at ANY bucket
        # count — probing the largest bucket cannot (balanced B=2 puts
        # its nbytes at ~corpus/2, where both behaviors look alike).
        # pyarrow 16.1.0 EMBEDS parent buffers (measured), so today this
        # returns False and put_pages deep-gathers each bucket.
        probe = full.slice(0, min(64, full.num_rows))
        ser = _serialized_nbytes(probe)
        _SLICE_TRUNCATION_OK[0] = ser < (probe.nbytes + full.nbytes) // 2
    return _SLICE_TRUNCATION_OK[0]


def _url_bucket_array(urls: pa.Array | pa.ChunkedArray,
                      num_buckets: int) -> np.ndarray:
    """Stable url -> bucket assignment shared by put and fetch sides:
    the vectorized sampled hash mod B (deterministic across processes —
    pure numpy over the Arrow buffers, no per-row Python)."""
    return (hash_str_array(urls) % np.uint64(num_buckets)).astype(np.int64)


def put_pages(pages: pa.Table, num_buckets: int = 1,
              parquet_dir: str | None = None) -> list:
    """Publish the pages table; returns the list of bucket handles
    (length 1 = the broadcast fast path).

    ``num_buckets > 1`` hash-partitions the corpus by ``hash64(url) % B``
    into B independent buckets — the design path once the corpus
    outgrows a single broadcast (see module docstring).  Two backends:

    - object-store (default): one driver-side sort+take, one plasma
      object per bucket (handles are ObjectRefs);
    - ``parquet_dir`` set: the REAL 100-TB form — a distributed Ray
      Data ``write_parquet(partition_cols=["bucket"])`` job writes one
      directory per bucket and the handles are directory PATHS that
      workers read lazily (``_load_bucket``), so the driver never
      sorts, takes or holds the corpus and a bucket is only ever read
      by nodes whose frontier partitions hit it.  Both backends are
      output-identical (tests/test_fetch_buckets.py).

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
            and _PUT_CACHE[0][3] == (num_buckets, parquet_dir)):
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
    elif parquet_dir is not None:
        refs = _write_bucketed_parquet(tbl, num_buckets, parquet_dir)
    else:
        bk = _url_bucket_array(tbl["url"], num_buckets)
        order = np.argsort(bk, kind="stable")
        srt = tbl.take(pa.array(order)).combine_chunks()
        starts = np.searchsorted(bk[order], np.arange(num_buckets))
        ends = np.searchsorted(bk[order], np.arange(num_buckets), "right")
        # slices are zero-copy views; ray.put serializes each slice only.
        # Pin that assumption once per process (ADVICE r4): if this
        # pyarrow serialized the PARENT buffers, each bucket object would
        # embed the whole corpus — fall back to a per-slice deep gather.
        slices = [srt.slice(int(s), int(e - s))
                  for s, e in zip(starts, ends)]
        if srt.num_rows and not _slices_truncate_ok(srt):
            slices = [t.take(pa.array(np.arange(t.num_rows))) for t in slices]
        refs = [ray.put(t) for t in slices]
    _PUT_CACHE.clear()           # hold one web at a time (frees the old objects)
    _PUT_CACHE.append((pages, refs, job_id, (num_buckets, parquet_dir)))
    return refs


# per-process generation counter for Parquet bucket writes: the worker
# bucket cache is keyed by PATH, so rewriting the same parquet_dir with
# a new corpus must produce NEW paths or warm workers would serve the
# old corpus' indexes.  job id + counter makes paths unique across both
# repeated writes in one driver and different driver processes.
_PQ_GEN = [0]


def _write_bucketed_parquet(tbl: pa.Table, num_buckets: int,
                            parquet_dir: str) -> list[str]:
    """Distributed bucket write: Ray Data adds the bucket column batch-
    wise and writes hive-partitioned Parquet — no driver-side sort/take.
    Returns one directory path per bucket id under a generation-unique
    subdirectory (a bucket no url hashes to simply has no directory;
    _load_bucket treats it as empty)."""
    import os
    import shutil

    from larbin_ray.pipelines.extract import from_table

    # original row position rides along: a bucket directory's file
    # order need not preserve corpus order, and duplicate-url
    # resolution is defined as last-in-original-order (_UrlIndex)
    tbl = tbl.append_column(
        "__row__", pa.array(np.arange(tbl.num_rows, dtype=np.int64)))
    if os.path.isdir(parquet_dir):
        shutil.rmtree(parquet_dir)
    _PQ_GEN[0] += 1
    gen_dir = (f"{parquet_dir}/gen-"
               f"{ray.get_runtime_context().get_job_id()}-{_PQ_GEN[0]}")

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bucket", pa.array(_url_bucket_array(b["url"], num_buckets)))

    n_blocks = max(2, min(32, tbl.num_rows // 4096))
    (from_table(tbl, n_blocks)
     .map_batches(add_bucket, batch_format="pyarrow")
     .write_parquet(gen_dir, partition_cols=["bucket"]))
    return [f"{gen_dir}/bucket={k}" for k in range(num_buckets)]


def _read_bucket_table(path: str) -> pa.Table:
    """One bucket directory -> table (empty when no corpus url hashed
    to this bucket — partitioned writes skip empty partitions)."""
    import os

    import pyarrow.parquet as pq
    if not os.path.isdir(path):
        return pa.table({"url": pa.array([], pa.string()),
                         "html": pa.array([], pa.binary())})
    return pq.read_table(path)


class _UrlIndex:
    """Per-worker url -> row index over one pages table / bucket: a
    SORTED uint64 sampled-hash array + the row permutation + the url
    column for exact verification.  Build is all-numpy over the Arrow
    buffers (no per-row Python — replaces the r4 dict whose build cost
    ~0.5 s/worker and whose probe re-hashed fresh str objects per
    batch); probe is a C-speed ``searchsorted`` + vectorized
    ``pc.equal`` verify, with an equal-hash-run scan fallback so a
    sampled-hash collision costs extra comparisons, never a wrong row.

    Duplicate corpus urls resolve to the LAST occurrence in original
    table order — the oracle's dict-comprehension semantics
    (simcrawl.py:68) and what the replaced per-worker dict did.  Within
    an equal-hash run rows sort by descending original position, so the
    leftmost-searchsorted candidate (and the fallback scan's first
    match) is the last occurrence.  "Original position" is the local
    row for in-memory tables and the ``__row__`` column for
    Parquet-bucket reads, whose file order need not preserve the
    corpus order."""

    __slots__ = ("sorted_h", "order", "urls", "html", "lat", "n")

    def __init__(self, table: pa.Table):
        if "__row__" in table.column_names:
            rowids = table["__row__"].combine_chunks().to_numpy()
            table = table.drop_columns(["__row__"])
        else:
            rowids = np.arange(table.num_rows, dtype=np.int64)
        urls = table["url"].combine_chunks()
        h = hash_str_array(urls)
        # primary key h ascending, tiebreak rowid DESCENDING (lexsort:
        # last key is primary)
        self.order = np.lexsort((-rowids, h))
        self.sorted_h = h[self.order]
        self.urls = urls
        self.n = len(urls)
        self.lat = (table["latency_ms"].combine_chunks().to_numpy()
                    if "latency_ms" in table.column_names else None)
        html = table["html"]
        if html.num_chunks == 1:
            html = html.chunk(0)     # zero-copy Array view: fast take()
        self.html = html

    def probe(self, batch_urls, hq: np.ndarray | None = None) -> np.ndarray:
        """Row position per url, -1 for misses.  ``hq`` may pass in
        precomputed hashes (the bucketed path hashes each batch ONCE
        for bucket routing and reuses it here)."""
        if isinstance(batch_urls, pa.ChunkedArray):
            batch_urls = batch_urls.combine_chunks()
        if hq is None:
            hq = hash_str_array(batch_urls)
        if self.n == 0:
            return np.full(len(hq), -1, dtype=np.int64)
        p = np.searchsorted(self.sorted_h, hq)        # leftmost
        pcl = np.minimum(p, self.n - 1)
        cand = self.sorted_h[pcl] == hq
        rows = np.where(cand, self.order[pcl], 0)
        ok = cand & np.asarray(
            pc.equal(self.urls.take(pa.array(rows)),
                     batch_urls).to_numpy(zero_copy_only=False), dtype=bool)
        pos = np.where(ok, rows, np.int64(-1))
        bad = np.flatnonzero(cand & ~ok)
        if len(bad):
            # sampled-hash collision (or duplicate-hash corpus rows):
            # scan the equal-hash run — O(run) Python, collision-rare
            for i in bad:
                q = int(pcl[i]) + 1
                want = batch_urls[int(i)].as_py()
                while q < self.n and self.sorted_h[q] == hq[i]:
                    r = int(self.order[q])
                    if self.urls[r].as_py() == want:
                        pos[i] = r
                        break
                    q += 1
        return pos


def _build_index(table: pa.Table) -> _UrlIndex:
    """The single index constructor both cache policies share."""
    return _UrlIndex(table)


def _index_for(pages_ref) -> _UrlIndex:
    """Per-worker cached :class:`_UrlIndex`.  The build is a one-time
    vectorized hash+argsort per worker (amortized across the crawl; the
    raylet no longer culls and respawns workers — bench raises
    num_workers_soft_limit); the html column stays a zero-copy view
    into the shared object store — combining it would COPY the whole
    GB-scale body column into every worker heap."""
    key = pages_ref.hex()
    hit = _INDEX_CACHE.get(key)
    if hit is None:
        hit = _build_index(ray.get(pages_ref))
        _INDEX_CACHE.clear()   # one pages table per crawl; don't leak old ones
        if _CACHE_MODE[0] != "broadcast":
            _BUCKET_CACHE.clear()  # entering broadcast mode: drop bucket indexes
            _CACHE_MODE[0] = "broadcast"
        _INDEX_CACHE[key] = hit
    return hit


def _load_bucket(ref) -> _UrlIndex:
    """Per-worker LRU-cached index for ONE bucket of a partitioned
    corpus.  ``ref`` is an ObjectRef (object-store backend) or a
    bucket-directory path (Parquet backend — the lazy per-worker read
    that makes the bucketed path corpus-size-free end to end).  Unlike
    :func:`_index_for`, many buckets coexist (a worker's batches span
    buckets) but never more than ``MAX_CACHED_BUCKETS`` — worker memory
    is bounded by bucket size x cap, not corpus size."""
    key = ref if isinstance(ref, str) else ref.hex()
    hit = _BUCKET_CACHE.get(key)
    if hit is not None:
        _BUCKET_CACHE.move_to_end(key)
        return hit
    hit = _build_index(_read_bucket_table(ref) if isinstance(ref, str)
                       else ray.get(ref))
    if _CACHE_MODE[0] != "bucketed":
        _INDEX_CACHE.clear()   # entering bucketed mode: drop the O(corpus) dict
        _CACHE_MODE[0] = "bucketed"
    _BUCKET_CACHE[key] = hit
    while len(_BUCKET_CACHE) > MAX_CACHED_BUCKETS:
        _BUCKET_CACHE.popitem(last=False)
    return hit


def _make_bucketed_fetch(refs: list):
    """Fetch fn over a hash-partitioned corpus: group the batch by
    bucket, gather per bucket through the LRU index, restore the
    batch's row order.  Output-identical to the broadcast path.  The
    batch's urls are hashed ONCE (bucket routing reuses the probe
    hash)."""
    num_buckets = len(refs)

    def fetch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        u_arr = batch["url"].combine_chunks() \
            if isinstance(batch["url"], pa.ChunkedArray) else batch["url"]
        hq = hash_str_array(u_arr)
        bk = (hq % np.uint64(num_buckets)).astype(np.int64)
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
            index = _load_bucket(refs[int(sb[s])])
            if index.n == 0:
                # a bucket no corpus url hashes to: every row is a miss
                # (pos would clamp to 0 and take() on the 0-row array
                # raises) — emit placeholders; the miss mask rewrites
                # them to SYNTH_404 below
                miss[rows] = True
                parts.append(pa.array([b""] * len(rows), pa.binary()))
                continue
            pos = index.probe(u_arr.take(pa.array(rows)), hq[rows])
            m = pos < 0
            pos[m] = 0
            taken = index.html.take(pa.array(pos))
            if isinstance(taken, pa.ChunkedArray):
                taken = taken.combine_chunks()
            if taken.type == pa.large_binary():
                taken = taken.cast(pa.binary())
            parts.append(taken)
            miss[rows] = m
            if index.lat is not None:
                v = index.lat[pos].astype(np.int64, copy=True)
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
        index = _index_for(pages_ref)
        n = batch.num_rows
        if index.n == 0:
            # empty pages table: every row is a miss (same guard as the
            # bucketed path — take() on a 0-row array raises)
            batch = batch.append_column(
                "html", pa.array([SYNTH_404] * n, pa.binary()))
            return batch.append_column(
                "latency_ms", pa.array(np.zeros(n, dtype=np.int64)))
        pos = index.probe(batch["url"])
        miss = pos < 0
        pos[miss] = 0
        # one vectorized gather of the batch's rows out of the shared
        # html column (copies only batch-sized data)
        taken = index.html.take(pa.array(pos))
        if isinstance(taken, pa.ChunkedArray):
            taken = taken.combine_chunks()
        if taken.type == pa.large_binary():
            taken = taken.cast(pa.binary())   # batch-sized, no overflow
        miss_arr = pa.array(miss)
        html_out = pc.if_else(miss_arr, pa.scalar(SYNTH_404, pa.binary()), taken)
        if index.lat is not None:
            lat_np = index.lat[pos].astype(np.int64, copy=True)
            lat_np[miss] = 0
            lat_out = pa.array(lat_np)
        else:
            lat_out = pa.array(np.zeros(n, dtype=np.int64))
        batch = batch.append_column("html", html_out)
        return batch.append_column("latency_ms", lat_out)

    return fetch
