"""Fetch stage — the "network" of the rebuild.

The reference's non-blocking socket fetch (site.cxx:572-644,
fetch_pipe.cxx) becomes a lookup of the frontier batch against the
web-pages Parquet table (SURVEY.md §2.1 S5): a ``map_batches`` function
over zero-copy Arrow batches that appends the ``html`` column.  A URL
absent from the table gets a synthesized 404 (the host resolved and
connected — only the path is unknown), keeping the error taxonomy live.

Scale notes (10^10 frontier):
- here the pages table is broadcast once (``ray.put``) and indexed
  per worker process (cached by object-ref hex, so Ray's worker reuse
  amortizes the index build across ticks and stages);
- at cluster scale the same stage becomes a hash-partitioned join:
  bucket both the frontier batch and the pages table by
  ``hash(url) % B`` and look up per-bucket — the call signature and the
  rest of the pipeline are unchanged.  The broadcast index is the
  small-side fast path, not the design.
"""

from __future__ import annotations

import pyarrow as pa
import ray

SYNTH_404 = b"HTTP/1.0 404 Not Found\r\nContent-Type: text/html\r\n\r\n"

_INDEX_CACHE: dict[str, tuple] = {}

# driver-side: one live broadcast per pages table object.  Re-crawling
# the same table (warm run -> timed runs; checkpoint resume; repeated
# tests) must NOT re-put the GB html column nor hand workers a fresh
# ref — a new ref invalidates every worker's url-index cache and the
# whole pool re-pays the ~0.5 s/worker build inside the first timed
# waves (measured: ~8 s of ramp across ticks 0-5 at 400k pages).
_PUT_CACHE: list = []      # [(pages_table, ref)] — single entry


def put_pages(pages: pa.Table) -> "ray.ObjectRef":
    """Broadcast the pages table once; workers read it zero-copy.

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
            and _PUT_CACHE[0][2] == job_id):
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
    ref = ray.put(tbl.combine_chunks())
    _PUT_CACHE.clear()           # hold one web at a time (frees the old object)
    _PUT_CACHE.append((pages, ref, job_id))
    return ref


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
        table = ray.get(pages_ref)
        idx = {u: i for i, u in enumerate(table["url"].to_pylist())}
        lat = (table["latency_ms"].combine_chunks().to_numpy()
               if "latency_ms" in table.column_names else None)
        html = table["html"]
        if html.num_chunks == 1:
            html = html.chunk(0)     # zero-copy Array view: fast take()
        hit = (idx, html, lat)
        _INDEX_CACHE.clear()   # one pages table per crawl; don't leak old ones
        _INDEX_CACHE[key] = hit
    return hit


def make_fetch_fn(pages_ref):
    """Returns a map_batches fn: adds ``html`` (binary) and
    ``latency_ms`` (simulated server latency, 0 when the pages table
    has no latency column) to the batch."""

    def fetch(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc
        idx, html_col, lat_col = _index_for(pages_ref)
        urls = batch["url"].to_pylist()
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
