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
