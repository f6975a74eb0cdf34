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

_INDEX_CACHE: dict[str, tuple[dict, pa.Table]] = {}


def put_pages(pages: pa.Table) -> "ray.ObjectRef":
    """Broadcast the pages table once; workers build their url index
    lazily (zero-copy read from the object store)."""
    return ray.put(pages.select(["url", "html"]))


def _index_for(pages_ref) -> tuple[dict, pa.Table]:
    key = pages_ref.hex()
    hit = _INDEX_CACHE.get(key)
    if hit is None:
        table = ray.get(pages_ref)
        idx = {u: i for i, u in enumerate(table["url"].to_pylist())}
        hit = (idx, table)
        _INDEX_CACHE.clear()   # one pages table per crawl; don't leak old ones
        _INDEX_CACHE[key] = hit
    return hit


def make_fetch_fn(pages_ref):
    """Returns a map_batches fn: adds ``html`` (binary) to the batch."""

    def fetch(batch: pa.Table) -> pa.Table:
        idx, table = _index_for(pages_ref)
        html_col = table["html"]
        out = []
        for u in batch["url"].to_pylist():
            i = idx.get(u)
            out.append(html_col[i].as_py() if i is not None else SYNTH_404)
        return batch.append_column("html", pa.array(out, pa.binary()))

    return fetch
