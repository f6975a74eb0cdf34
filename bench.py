#!/usr/bin/env python
"""Benchmark harness.

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: runs the same bench twice in fresh processes at 8 and
32 CPUs on the same input and reports both throughputs + the scaling
efficiency (the sandbox evidence protocol for BASELINE.json's
N-vs-4N-node criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CACHE = "/tmp/larbin_bench_cache"

# bench web scale per sf tier (pages, domains)
WEB_SCALE = {"0.001": (2_000, 100), "0.01": (12_000, 600), "0.1": (400_000, 8_000)}


def web_scale() -> tuple[int, int]:
    """(pages, domains) for the bench web.  ``GRAFT_BENCH_WEB=P,D``
    overrides the sf-tier default — used by the design-scale ``--scaling``
    protocol, where per-tick volume must be representative of the
    10^10-URL regime for the fixed per-tick coordination to amortize
    (see BASELINE.md scaling section)."""
    env = os.environ.get("GRAFT_BENCH_WEB")
    if env:
        p, d = env.split(",")
        return int(p), int(d)
    return WEB_SCALE[_sf_tag()]


def _sf_tag() -> str:
    if "0.001" in SF_DIR:
        return "0.001"
    if "0.01" in SF_DIR:
        return "0.01"
    return "0.1"


def bench_web_path() -> str:
    """Generate (once) and cache the bench-scale synthetic web."""
    import pyarrow.parquet as pq

    n_pages, n_domains = web_scale()
    os.makedirs(CACHE, exist_ok=True)
    path = f"{CACHE}/web_v2_{n_pages}_{n_domains}.parquet"
    if not os.path.exists(path):
        from larbin_ray.sources.synthweb import gen_web
        pq.write_table(gen_web(n_pages, n_domains, seed=42), path)
    return path


def run_bench() -> dict:
    import ray

    # num_workers_soft_limit defaults to num_cpus; with 12 scheduler/seen
    # actors alive the raylet then culls idle task workers between tick
    # waves, and every respawn re-pays fork + imports + pages-table read
    # (measured: 10-20 s stalls as the wave widens).  Keep the pool.
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False,
             _system_config={"num_workers_soft_limit": NUM_CPUS * 3,
                             "idle_worker_killing_time_threshold_ms": 600_000})
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow.parquet as pq

    from larbin_ray.config import CrawlConfig
    from larbin_ray.pipelines import relational as R
    from larbin_ray.pipelines import similarity as S
    from larbin_ray.pipelines import textops as T
    from larbin_ray.pipelines.crawl import ray_crawl
    from larbin_ray.sources.synthweb import breadth_seeds

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # warm the page cache (untimed)
    web_path = bench_web_path()
    web = pq.read_table(web_path)
    n_pages, n_domains = web_scale()

    # ---- headline: the crawl loop (drain mode = throughput config) ----
    # max_dispatch_per_ip bounds how much of one IP's queue a tick may
    # drain, so per-tick driver work (ctrl sort, admission merge) stays
    # bounded even when one IP queues millions of urls at design scale.
    # 1024 never binds at bench scale (tick volume and page counts are
    # identical with/without; measured 10.0-11.4 s both ways at 32
    # CPUs), while 16 splits the crawl into ~500 micro-ticks and pays
    # ~70 ms of fixed barrier cost per tick (38 s total) — the budget
    # must stay well above per-IP per-tick fan-out or tick count
    # explodes.
    # Shard counts size the POLITENESS/ADMISSION tier, whose per-shard
    # python work (pre_admit fast-fails, queue pops) is the inter-wave
    # pipeline bubble: at design-scale tick volume the per-tick 'begin'
    # phase measured 9.2 s/crawl at 8 shards vs 4.2 s at 16 (8 CPUs,
    # 1.6M web); 32 shards gains nothing more and inflates the per-task
    # return fan-out.  On a real cluster this tier scales with node
    # count — 16/8 models that; output is shard-count-invariant by
    # design (e2e suite asserts it).
    # parse_batch_size=0 = auto (~2 task waves per CPU per tick): at
    # design-scale tick volume a fixed 512 splits a 30k-row tick into
    # ~60 tasks x (1 + 16) return refs whose submit cost binds the
    # driver at low CPU counts; auto sizes the task count to the
    # executor (config.py rationale; output invariant by test)
    cfg = CrawlConfig(wait_duration=0, depth_by_site=True,
                      num_scheduler_shards=16, num_seen_shards=8,
                      parse_batch_size=0, max_dispatch_per_ip=1024)
    # untimed warmup: saturate the FULL worker pool (a small crawl only
    # spawns a few workers; the first big tick then stalls ~20s while Ray
    # forks and imports the rest of the pool all at once)
    import ray

    @ray.remote
    def _warm() -> int:
        import time as _t

        import larbin_ray.stages.parse  # noqa: F401  (heavy imports)
        import pandas  # noqa: F401
        _t.sleep(0.5)   # hold the slot so the raylet spawns the full pool
        return 1

    ray.get([_warm.remote() for _ in range(NUM_CPUS * 2)])
    # untimed warm crawl on the bench web itself: absorbs the one-time
    # worker-pool ramp (fork + imports + per-worker pages index) that
    # otherwise lands inside the first timed run as 10-40 s stalls.
    # The timed figure is steady-state throughput — the regime that
    # matters at the 10^10-URL design scale — taken as best of 3 with
    # all samples recorded (single-run variance on this shared host
    # is 2-3x; see BASELINE.md measurement protocol).
    ray_crawl(web, breadth_seeds(n_domains), cfg,
              out_dir=f"{CACHE}/crawl_warm_{NUM_CPUS}", build_rows=False)
    # GRAFT_CRAWL_SAMPLES trims the per-run sample count for the long
    # design-scale --scaling runs (a 4M-page crawl is ~4 min/sample at
    # 2 CPUs); the default stays best-of-3 per the measurement protocol.
    samples = []
    for i in range(max(1, int(os.environ.get("GRAFT_CRAWL_SAMPLES", "3")))):
        t0 = time.time()
        res = ray_crawl(web, breadth_seeds(n_domains), cfg,
                        out_dir=f"{CACHE}/crawl_out_{NUM_CPUS}",
                        build_rows=False)
        samples.append(round(time.time() - t0, 3))
    timings["crawl"] = min(samples)
    fetched = res.fetched_count()
    extras["crawl_pages"] = fetched
    extras["crawl_sec_samples"] = samples
    extras["crawl_pages_per_sec"] = round(fetched / timings["crawl"], 1)
    # output-identity fingerprint (protocol step 4 in BASELINE.md): the
    # answers histogram + the full URL-seen bitset indices hash equal
    # across parallelism levels iff the crawl ordering and seen set are
    # identical — --scaling asserts lo == hi
    import hashlib as _hl

    _h = _hl.md5(json.dumps(sorted(res.answers.items())).encode())
    _h.update(res.seen_indices.tobytes())
    extras["crawl_state_hash"] = _h.hexdigest()
    # frontier ops = urls through admission (seen testSet calls)
    frontier_ops = sum(res.answers.values()) + res.answers.get("urlDup", 0)
    extras["frontier_ops_per_sec"] = round(frontier_ops / timings["crawl"], 1)

    # Ray Data streaming tick path (the cluster-scale regime): every
    # tick through the map_batches pipeline instead of plain tasks.
    # Recorded as its own datapoint — the task path stays the headline
    # because per-tick Dataset overhead (~0.5 s fixed per pipeline)
    # only amortizes above ~10k rows/tick (see config.py
    # ray_data_min_tick_rows); oracle parity for this path is asserted
    # by tests/test_crawl_e2e.py::test_ray_data_tick_path_matches.
    # (GRAFT_NO_RD=1 skips it — used by the long design-scale --scaling
    # protocol, whose criterion is the headline task-path crawl)
    if not os.environ.get("GRAFT_NO_RD"):
        import dataclasses

        cfg_rd = dataclasses.replace(cfg, ray_data_min_tick_rows=0)
        t0 = time.time()
        res_rd = ray_crawl(web, breadth_seeds(n_domains), cfg_rd,
                           out_dir=f"{CACHE}/crawl_rd_{NUM_CPUS}",
                           build_rows=False)
        rd_sec = round(time.time() - t0, 3)
        extras["crawl_ray_data_sec"] = rd_sec
        extras["crawl_ray_data_pages_per_sec"] = round(
            res_rd.fetched_count() / rd_sec, 1)

    # ---- training-data pipelines over the sf tables ----
    timed("dedup_exact_hash", lambda: T.dedup_exact_hash(SF_DIR))
    timed("minhash_dedup", lambda: T.minhash_dedup(SF_DIR, num_hashes=32, bands=8))
    timed("token_stats", lambda: T.token_stats(SF_DIR).to_pandas())
    timed("quality_scores", lambda: T.quality_scores(SF_DIR).to_pandas())
    timed("lang_id", lambda: T.lang_id(SF_DIR).to_pandas())
    timed("knn_bruteforce", lambda: S.knn_bruteforce(SF_DIR, n_queries=10, k=10))
    timed("events_tumbling_window",
          lambda: R.events_tumbling_window(SF_DIR).to_pandas())
    timed("sessionize_events", lambda: R.sessionize_events(SF_DIR).to_pandas())
    timed("lineitem_pricing_summary",
          lambda: R.lineitem_pricing_summary(SF_DIR).to_pandas())
    timed("orders_by_segment", lambda: R.orders_by_segment(SF_DIR).to_pandas())

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "bench_total_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(_sf_tag()),
        "num_cpus": NUM_CPUS,
        **extras,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Same input, fresh processes at N and 4N CPUs -> efficiency.

    Default pair is (2, 8), pinned to that many cores via taskset (see
    the `pin` note below): a (8, 32) pair would leave the hi side no
    spare cores for the raylet/GCS and the external-load bursts this
    host takes, so its hi samples are dominated by whatever else runs.
    Override with GRAFT_SCALING_PAIR=8,32.

    Noise protocol (BASELINE.md "Measurement protocol"): the pair is
    run GRAFT_SCALING_BEST_OF times (default 3), interleaved lo/hi so
    background-load drift hits both sides equally, and the efficiency
    is computed from each side's MINIMUM wall time (the unperturbed
    run — a shared-host load shift can only inflate a sample, never
    deflate it).  All samples are reported for the sanity gate."""
    bench_web_path()   # build the cache once so both runs read warm input
    pair = os.environ.get("GRAFT_SCALING_PAIR", "2,8")
    repeats = int(os.environ.get("GRAFT_SCALING_BEST_OF", "3"))
    n_lo, n_hi = (int(x) for x in pair.split(","))

    # load gate: this shared host takes external load bursts (1-min
    # loadavg swings 0-15 on a ~15 min cadence) that inflate any
    # multi-minute sample; waiting for a quiet window before EACH
    # subprocess sample measures the engine, not the neighbors.  Set
    # GRAFT_LOAD_GATE=0 to disable (e.g. on a dedicated host).
    gate = float(os.environ.get("GRAFT_LOAD_GATE", "1.5"))

    def wait_quiet() -> bool:
        """True iff the host went quiet before the sample launched.  A
        30-min deadline keeps a sustained-load afternoon from hanging
        the protocol forever, but an ungated sample is NOT citable
        (BASELINE.md) — the caller marks it in the result JSON."""
        if gate <= 0:
            return True
        deadline = time.time() + 1800
        while time.time() < deadline:
            if os.getloadavg()[0] < gate:
                return True
            time.sleep(30)
        return False

    ungated = 0

    # OS-level CPU pinning (taskset) makes each sample a faithful
    # N-core machine: ray.init(num_cpus=N) only budgets TASK slots —
    # actors (the 16/8 scheduler/seen tier) hold 0 CPU while alive and
    # otherwise run unthrottled on all host cores, which overstates the
    # lo side exactly in proportion to how much work the engine
    # delegates to the actor tier.  GRAFT_PIN=0 restores the old
    # unpinned protocol (e.g. if taskset is unavailable).
    import shutil as _shutil
    pin = (os.environ.get("GRAFT_PIN", "1") != "0"
           and _shutil.which("taskset") is not None
           # a pair that exceeds the online CPUs (e.g. 8,32 on a
           # 16-CPU box) cannot be pinned faithfully — fall back to
           # the unpinned protocol rather than abort mid-run, and say
           # so in the result ("pinned": false)
           and n_hi <= len(os.sched_getaffinity(0)))

    def run(ncpu: int) -> dict:
        nonlocal ungated
        if not wait_quiet():
            ungated += 1
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        argv = [sys.executable, os.path.abspath(__file__)]
        if pin:
            argv = ["taskset", "-c", f"0-{ncpu - 1}"] + argv
        p = subprocess.run(argv, env=env, capture_output=True, text=True,
                           check=True)
        lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
        return json.loads(lines[-1])

    los, his = [], []
    for _ in range(repeats):
        los.append(run(n_lo))
        his.append(run(n_hi))
    lo = min(los, key=lambda r: r["queries"]["crawl"])
    hi = min(his, key=lambda r: r["queries"]["crawl"])
    ratio = n_hi / n_lo
    t_lo = min(r["value"] for r in los)
    t_hi = min(r["value"] for r in his)
    eff = (t_lo / t_hi) / ratio
    crawl_eff = (lo["queries"]["crawl"] / hi["queries"]["crawl"]) / ratio
    # protocol step 4: identical outputs at both parallelism levels
    hashes = {r["crawl_state_hash"] for r in los + his}
    assert len(hashes) == 1, f"crawl state diverged across levels: {hashes}"
    return {
        "outputs_identical": True,
        "crawl_state_hash": hashes.pop(),
        # >0 flags samples that launched after the 30-min gate deadline
        # under sustained load — such a run is not citable (BASELINE.md)
        "gate_timed_out_samples": ungated,
        "pinned": pin,
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": n_lo,
        "cpus_hi": n_hi,
        "best_of": repeats,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "crawl_sec_lo": lo["queries"]["crawl"],
        "crawl_sec_hi": hi["queries"]["crawl"],
        "crawl_pages_per_sec_lo": lo["crawl_pages_per_sec"],
        "crawl_pages_per_sec_hi": hi["crawl_pages_per_sec"],
        "crawl_scaling_efficiency": round(crawl_eff, 3),
        "crawl_sec_lo_samples": [r["queries"]["crawl"] for r in los],
        "crawl_sec_hi_samples": [r["queries"]["crawl"] for r in his],
        "queries_lo": lo["queries"],
        "queries_hi": hi["queries"],
    }


if __name__ == "__main__":
    # raylet warnings sometimes land on fd 1 even with log_to_driver=False;
    # the contract is ONE JSON line on stdout, so reroute fd 1 to stderr
    # for the duration of the run and write the JSON to the saved fd.
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = os.fdopen(os.dup(2), "w")
    try:
        result = run_scaling() if "--scaling" in sys.argv else run_bench()
    finally:
        sys.stdout.flush()
    os.write(real_stdout, (json.dumps(result) + "\n").encode())
