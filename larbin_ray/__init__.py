"""larbin_ray — a Ray-Data-native rebuild of the Larbin crawl engine.

A brand-new data-processing engine expressing the Larbin web-crawler's
fetch-parse-extract-links loop (reference: ictxiangxin/larbin v2.6.5) as a
streaming Ray Data pipeline over a Parquet web-page table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Layout:

- ``kernels/``   pure byte-exact functions (URL normalize, HTTP/HTML parse,
                 robots.txt) replicating the reference semantics cited in
                 each docstring.  No Ray dependency.
- ``state/``     bitset URL-seen / content-dup state (Larbin's hashTable /
                 hashDup, src/fetch/hash_table.cxx, src/utils/hash_duplicate.cxx).
- ``stages/``    Ray Data stages: actor-pool fetch join, vectorized
                 parse/extract map_batches, sharded seen-set actors,
                 host/IP scheduler actors (politeness + robots + DNS).
- ``sources/``   deterministic synthetic-web generator matching the
                 input_hint schema, seeds, fixture DNS.
- ``pipelines/`` the generation-synchronous crawl driver loop,
                 the flagship extract pipeline, text-analysis / dedup /
                 similarity pipelines for training-data workloads.
- ``oracle/``    pure-Python reference crawler replaying the Larbin queue
                 disciplines in simulated time (the correctness oracle).

Nothing in this package calls ``ray.init()``; sessions are owned by the
caller (tests, bench.py, CLI).
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Stop glibc from returning large free blocks to the kernel.

    numpy/pandas temporaries above malloc's default mmap threshold
    (128 KiB) are mmap'd on alloc and munmap'd on free; on this class of
    VM a fresh large allocation then costs ~45 us per 4 KiB page fault —
    measured 1.8 s for a 168 MB temporary vs 31 ms once the heap retains
    the block (60x).  Raising M_MMAP_THRESHOLD/M_TRIM_THRESHOLD to
    256 MiB keeps big numpy buffers on the reusable heap.  Per-process
    cost: up to 256 MiB of retained free heap — negligible against the
    128 GiB host.  Arrow's jemalloc/mimalloc pools already retain; this
    covers the glibc side (numpy, pandas).  Runs in every process that
    imports larbin_ray — the driver and every Ray worker."""
    import ctypes
    import sys
    if not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 256 * 1024 * 1024)   # M_MMAP_THRESHOLD
        libc.mallopt(-1, 256 * 1024 * 1024)   # M_TRIM_THRESHOLD
    except Exception:
        pass


_tune_malloc()
