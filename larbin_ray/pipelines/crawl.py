"""The crawl pipeline — Larbin's event loop re-expressed as a
generation-synchronous Ray pipeline (SURVEY.md §3.1 "Ray lifecycle
equivalent").

Each simulated-time *tick* (politeness slot, see larbin_ray.state.sites):

    dispatch rows (from scheduler shards, one ``begin_tick`` RPC)
      -> fetch+parse+submit   : frontier ⨝ pages table, HTTP parse, HTML
         link extraction; each batch pushes its link candidates straight
         to the owning scheduler shards (actor-to-actor — the driver
         never touches per-candidate data)
      -> dup barrier          : content-hash testSet in global fetch order
      -> pre_admit barrier    : shards sort their candidates by the global
         admission key (prio, ip, sub, link order), drop dup-parents, run
         the initOK fast-fails
      -> seen merge           : fully actor-to-actor — each scheduler
         shard splits its survivors' key/hash columns by owning seen
         shard; each seen shard lexsorts its hash-subset by the (unique)
         admission key — equal to the global order restricted to that
         subset — and tests first-wins; the driver only wires refs
      -> enqueue              : each scheduler shard scatters the seen
         shards' verdict slices back onto its survivors and appends the
         new ones to its IP queues (every IP queue lives wholly in one
         shard, so local sorted order == global order per queue)

The fetch+parse stage runs as a Ray Data ``map_batches`` pipeline when
the tick is large (>= cfg.ray_data_min_tick_rows — the cluster-scale
regime where the streaming executor's fixed cost amortizes) and as
plain Ray tasks below that (micro-ticks; same batch function, no
semantic difference — verified by the oracle-equality tests either
way).  On the task path, each shard's tasks start the moment ITS
``begin_tick`` lands (``_early_wave``) — the global dispatch barrier
exists only on the Ray Data path and on tick 0 / resume.

State lives only in the named actor tiers; every ordering decision is
derived from data keys, so the crawl output is bit-identical at any CPU
count and any shard count.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from larbin_ray.config import CrawlConfig
from larbin_ray.kernels.urlnorm import parse_url
from larbin_ray.oracle.simcrawl import CrawlResult
from larbin_ray.pipelines.extract import from_table
from larbin_ray.stages.fetch import make_fetch_fn, put_pages
from larbin_ray.stages.parse import ParseExtract, worker_parse_extract
from larbin_ray.stages.scheduler import (DISPATCH_SCHEMA, SchedulerShard,
                                         route_host)
from larbin_ray.stages.seen import BitsetShard, gather_seen_indices


def _dispatch_table(rows: list[dict]) -> pa.Table:
    cols = {f.name: [r[f.name] for r in rows] for f in DISPATCH_SCHEMA}
    return pa.table({n: pa.array(v, DISPATCH_SCHEMA.field(n).type)
                     for n, v in cols.items()})


# routing lives in stages.scheduler.route_host — one implementation for
# the driver, the parse tasks and checkpoint restore
_route_host = route_host

# ticks between forced settles of the lazy admission-chain refs; see the
# settle site in _run_crawl (tests patch this down to exercise the path)
_SETTLE_EVERY = 256


def _process_batch(batch: pa.Table, fetch_fn, parse: ParseExtract,
                   sched, n_sched: int, sink_dir: str | None = None,
                   keep_text: bool = True) -> pa.Table:
    """fetch -> parse -> push link candidates to their scheduler shards
    (acked), return the parse table without the links column.  The
    Ray Data variant of the stage (blocking ack per batch).  When
    ``sink_dir`` is set the batch writes its own Parquet slice (the
    distributed sink, like the task path); the part name is the 64-bit
    md5 of the batch's first url — batch boundaries are deterministic
    per tick, so a rerun of the same tick overwrites its own parts
    (collision odds ~n_batches^2/2^65 per tick; the driver also clears
    each tick's sink dir before dispatch, so stale parts from a
    differently-batched earlier run cannot survive)."""
    import hashlib

    out, entries_by_shard = parse.parse_to_entries(fetch_fn(batch), n_sched)
    # batch token = first-url hash (unique within a tick: a url is
    # dispatched at most once per tick) — makes the submit idempotent
    # when Ray re-executes a died map_batches task (submit_links_once)
    tag = hashlib.md5(
        batch["url"][0].as_py().encode("latin-1")).hexdigest()[:16]
    if entries_by_shard:
        ray.get([sched[sid].submit_links_once.remote(tag, entries)
                 for sid, entries in entries_by_shard.items()])
    if sink_dir is not None and out.num_rows:
        import os

        import pyarrow.parquet as pq
        os.makedirs(sink_dir, exist_ok=True)
        pq.write_table(out, f"{sink_dir}/part-{tag}.parquet")
    if not keep_text:
        mask = out["is_robots"]
        text = pc.if_else(mask, out["text"], pa.scalar(b"", pa.binary()))
        out = out.set_column(out.schema.get_field_index("text"), "text", text)
    return out


@ray.remote
def _process_task(tick_refs: list, offset: int, length: int,
                  pages_ref_holder: list, cfg: CrawlConfig,
                  n_sched: int, sink_path: str | None,
                  keep_text: bool):
    """Task variant: never blocks on the shard actors — the per-shard
    entry lists are EXTRA return values (num_returns = 1 + n_sched, set
    via .options at the call site), so they land in the object store
    through the task-return path (ray.put costs ~16 ms per call on this
    host — 8 puts per task were ~85 cpu-s per crawl; small task returns
    are inlined) and each shard receives refs to exactly its own slice.
    The driver never deserializes a candidate.  (A producer blocking on
    a shard RPC at high CPU counts triggers Ray's blocked-worker
    spawning and a worker-churn spiral, hence no direct actor
    submission here.)

    When ``sink_path`` is set the task writes its own slice of the page
    table (with text) as Parquet — a distributed, resumable sink with no
    driver involvement; the driver then only ever sees slim metadata
    (text retained for robots rows, and for all rows in keep_text mode).
    """
    # pages_ref_holder is put_pages()'s bucket-ref list (len 1 = the
    # broadcast fast path); refs nested in a list are not
    # auto-dereferenced — the per-worker fetch index caches key on them.
    # tick_refs holds the tick's dispatch-table refs (the optional robots
    # table the driver put, then each scheduler shard's begin_tick table
    # IN SHARD ORDER — the shard tables are actor-return objects already
    # sitting in plasma, so the driver never re-serializes the tick:
    # each task reads them zero-copy, concats (zero-copy) and slices its
    # own window)
    tbl = pa.concat_tables(ray.get(list(tick_refs)))
    batch = tbl.slice(offset, length)
    fetch_fn = make_fetch_fn(pages_ref_holder)
    # per-worker instance (not per-task): keeps the href/hashCode memos
    # alive across tasks and ticks on the warm worker pool
    out, entries_by_shard = worker_parse_extract(cfg).parse_to_entries(
        fetch_fn(batch), n_sched)
    if sink_path is not None:
        import os

        import pyarrow.parquet as pq
        os.makedirs(os.path.dirname(sink_path), exist_ok=True)
        pq.write_table(out, sink_path)
    if not keep_text:
        # blank non-robots text before shipping meta to the driver
        mask = out["is_robots"]
        text = pc.if_else(mask, out["text"], pa.scalar(b"", pa.binary()))
        out = out.set_column(out.schema.get_field_index("text"), "text", text)
    return tuple([out] + [entries_by_shard.get(sid, [])
                          for sid in range(n_sched)])


def _early_wave(tick, begin_futs, sched, cfg, n_sched, n_cpus, pages_refs,
                sink_dir, ship_text, clk):
    """Per-shard task waves: start shard S's fetch+parse tasks the
    moment S's ``begin_tick`` lands instead of after a global barrier —
    the measured 22%-of-wall inter-wave 'begin' bubble becomes overlap
    (VERDICT r4 #1).  One combined ``ray.wait`` pool holds the not-yet-
    landed begin refs and the already-submitted task metas; completed
    metas prefeed their link entries to the shards mid-wave exactly
    like the global path.

    Ordering is safe by construction: every ctrl consumer either sorts
    by the unique (tick, ip, is_robots, sub) data key (build_rows /
    dup mode) or is order-free (throughput counters), robots results
    apply per-host independently, and pre_admit sorts its buffer by the
    unique admission key — the e2e suite's bit-exactness invariants
    hold at any arrival order.  Returns (begins, futs, rob_meta_futs)."""
    import time as _time

    begin_ref_of = {begin_futs[s][0]: s for s in range(n_sched)}
    begins: list = [None] * n_sched
    futs: list = []
    rob_meta_futs: list = []
    by_meta: dict = {}
    meta_buf: list = []
    task = _process_task.options(num_returns=1 + n_sched)
    pool = list(begin_ref_of.keys())
    n_begin_left = n_sched
    t0 = _time.time()

    def _flush():
        if meta_buf:
            for sid2 in range(n_sched):
                sched[sid2].prefeed_links.remote(
                    [by_meta[r][1 + sid2] for r in meta_buf])
            meta_buf.clear()

    while pool:
        # single-completion waits while begins are outstanding (a begin
        # must start its shard's tasks the instant it lands); batched
        # waits after, like the global path's prefeed loop.  Either way
        # drain everything ALREADY complete in one extra non-blocking
        # wait — one loop iteration per arrival burst, not per ref.
        k = 1 if n_begin_left else min(len(pool), 8)
        done, pool = ray.wait(pool, num_returns=k)
        if pool:
            more, pool = ray.wait(pool, num_returns=len(pool), timeout=0)
            done += more
        for r in done:
            sid = begin_ref_of.pop(r, None)
            if sid is None:
                meta_buf.append(r)
                continue
            rob_s, tbl_s, q_s = ray.get(list(begin_futs[sid]))
            begins[sid] = (rob_s, tbl_s, q_s)
            n_begin_left -= 1
            if n_begin_left == 0:
                clk("begin", t0)
                t0 = _time.time()
            rows_s = len(rob_s) + tbl_s.num_rows
            if rows_s == 0:
                continue
            # this shard's tick slice: its (tiny, rare) robots rows,
            # then its dispatch-table ref straight from begin_tick
            refs_s = ([ray.put(_dispatch_table(rob_s))] if rob_s else [])
            if tbl_s.num_rows:
                refs_s.append(begin_futs[sid][1])
            # per-shard batch size targeting the same global ~2 task
            # waves per CPU per tick (rows_s * n_sched ~ tick rows on
            # balanced shards; output is batch-size-invariant by test)
            bs = cfg.parse_batch_size or min(
                16384, max(512, -(-rows_s * n_sched // (2 * n_cpus))))
            shard_futs = [
                task.remote(
                    refs_s, i, bs, pages_refs, cfg, n_sched,
                    (f"{sink_dir}/part-s{sid}-{i // bs}.parquet"
                     if sink_dir is not None else None),
                    ship_text)
                for i in range(0, rows_s, bs)]
            futs.extend(shard_futs)
            if rob_s:
                # robots rows sit at the head of THIS shard's slice
                rob_meta_futs.extend(
                    f[0] for f in shard_futs[:-(-len(rob_s) // bs)])
            for f in shard_futs:
                by_meta[f[0]] = f
                pool.append(f[0])
        if len(meta_buf) >= 8 or n_begin_left == 0:
            _flush()
    _flush()
    clk("taskwave" if n_begin_left == 0 else "begin", t0)
    return begins, futs, rob_meta_futs


def ray_crawl(pages: pa.Table, seeds: list[str], cfg: CrawlConfig | None = None,
              out_dir: str | None = None, max_ticks: int | None = None,
              build_rows: bool = True, checkpoint_dir: str | None = None,
              resume: bool = False,
              inject: dict[int, list[str]] | None = None,
              watch_file: str | None = None,
              watch_feed: dict[int, str] | None = None,
              submit_port: int | None = None,
              submit_feed: dict[int, str] | None = None) -> CrawlResult:
    """Run the full crawl; returns the same result shape as the oracle.

    ``build_rows=False`` skips materializing ``res.fetched`` row dicts
    (throughput mode: counts/answers/seen still populated).
    ``checkpoint_dir`` + ``cfg.checkpoint_every`` write tick-boundary
    checkpoints (frontier/hosts/seen partitions + metrics + manifest);
    ``resume=True`` restores from ``checkpoint_dir`` and continues —
    seeds are not re-admitted, shard counts may differ from the
    checkpointing run.

    ``watch_file`` names a live URL-submission file (the reference's
    TCP input port, io/input.cxx:60-187, as a watched seed file —
    ``priority:P depth:D test:T`` header lines followed by URLs, see
    larbin_ray.sources.submit): newly appended complete lines are
    drained at every tick start.  ``watch_feed`` maps tick -> text the
    engine itself appends to the file before draining that tick — the
    deterministic harness for exercising mid-crawl submissions in
    tests; production writers simply append to the file at will.

    ``submit_port`` starts the real TCP daemon (SubmissionServer;
    0 = ephemeral port): clients connect to localhost:port and speak
    the reference protocol verbatim — header line, URL lines, test=0
    set-without-test, per-connection state (io/input.cxx:252-284).
    The queue drains at tick starts through the same admission path as
    the watched file.  ``submit_feed`` maps tick -> text the engine
    itself sends through a real client socket before draining that
    tick (the deterministic test harness; wait is handshake-based, no
    sleeps)."""
    cfg = cfg or CrawlConfig()
    max_ticks = max_ticks or cfg.max_ticks

    sched = [SchedulerShard.remote(i, cfg) for i in range(cfg.num_scheduler_shards)]
    seen = [BitsetShard.remote(i, cfg.num_seen_shards)
            for i in range(cfg.num_seen_shards)]
    dup = [BitsetShard.remote(i, cfg.num_seen_shards)
           for i in range(cfg.num_seen_shards)] if cfg.page_no_duplicate else None
    try:
        return _run_crawl(pages, seeds, cfg, out_dir, max_ticks, sched, seen,
                          dup, build_rows, checkpoint_dir, resume, inject,
                          watch_file, watch_feed, submit_port, submit_feed)
    finally:
        for a in sched + seen + (dup or []):
            ray.kill(a)


def _fire_pre_admit(sched, dup_parents: list[tuple],
                    robots_by_shard: dict[int, list] | None = None,
                    n_seen: int = 1) -> list[list]:
    """Send the pre_admit RPCs without waiting.  Per-actor ordering
    puts them after every prefeed_links already sent, so firing right
    at wave end lets the shards' sort+fast-fail run in the shadow of
    the driver's ctrl processing (answers/meta) instead of after it —
    only legal when that processing cannot feed the admission (no
    robots dispatched this tick, content-dup disabled).  Returns, per
    scheduler shard, the n_seen payload refs (separate task returns,
    one per seen shard)."""
    robots_by_shard = robots_by_shard or {}
    futs = []
    for sid, s in enumerate(sched):
        r = s.pre_admit_split.options(num_returns=n_seen).remote(
            dup_parents, robots_by_shard.get(sid, ()), n_seen)
        futs.append(list(r) if n_seen > 1 else [r])
    return futs


def _admit_barrier(cfg: CrawlConfig, sched, seen,
                   dup_parents: list[tuple],
                   robots_by_shard: dict[int, list] | None = None,
                   prefired: list | None = None) -> tuple[list, list]:
    """pre_admit -> seen-merge -> verdict scatter, fully actor-to-actor:
    the driver only WIRES refs (each scheduler shard's per-seen-shard
    payload to its seen shard, each seen shard's per-origin verdict
    slice back to its scheduler shard) and never touches per-candidate
    data or waits on the chain.  Robots results ride in the pre_admit
    RPC (one barrier, not three); the enqueue ack is pipelined —
    per-actor ordering guarantees the next begin_tick/stats/checkpoint
    call on a shard observes the enqueue.  Each seen shard lexsorts its
    own hash-subset by the (unique) admission key, which equals the
    global order restricted to that subset, so the outcome is
    bit-identical to a driver-side global merge.  Returns the
    per-seen-shard urlDup count refs plus the apply_verdicts result
    refs — callers settle BOTH lazily (_apply_dups), off the tick's
    critical path; getting the apply refs there surfaces any failure
    in the verdict scatter (a fire-and-forget error would silently
    drop that barrier's survivors from the frontier)."""
    n_seen = cfg.num_seen_shards
    pre = prefired if prefired is not None else _fire_pre_admit(
        sched, dup_parents, robots_by_shard, n_seen)
    return _wire_chain(sched, seen, pre)


def _wire_chain(sched, seen, pre) -> tuple[list, list]:
    """Wire the seen-merge + verdict-scatter refs for an already-fired
    pre_admit round.  Pure ref plumbing — no data touches the driver
    and nothing is waited on."""
    n_sched, n_seen = len(sched), len(seen)
    dup_refs, seen_parts = [], []
    for j, shard in enumerate(seen):
        rets = list(shard.test_set_merged.options(
            num_returns=1 + n_sched).remote(
                n_sched, [pre[sid][j] for sid in range(n_sched)]))
        dup_refs.append(rets[0])
        seen_parts.append(rets[1:])
    apply_refs = [sched[sid].apply_verdicts.remote(
        [seen_parts[j][sid] for j in range(n_seen)])
        for sid in range(n_sched)]
    return dup_refs, apply_refs


def _apply_dups(res: CrawlResult, pending: list, metrics_rows=None) -> None:
    """Settle accumulated admission-chain refs IN BARRIER ORDER, in one
    batched ray.get.  Each entry is (metrics_row_index | None,
    dup_count_refs, apply_verdicts_refs); row entries fill their tick's
    cum_url_dup.  Getting the apply refs here (values discarded) also
    propagates any error from the verdict scatter — without it a failed
    apply_verdicts would silently drop survivors.  Called at checkpoint
    boundaries and at run end — the only points that read
    res.answers['urlDup']."""
    flat = ([r for _, dups, _a in pending for r in dups]
            + [r for _, _d, applies in pending for r in applies])
    vals = iter(ray.get(flat))      # one round-trip; raises on chain error
    for row_idx, dup_refs, _applies in pending:
        dups = int(sum(next(vals) for _ in dup_refs))
        if dups:        # never materialize a zero key (oracle parity)
            res.answers["urlDup"] += dups
        if row_idx is not None and metrics_rows is not None:
            metrics_rows[row_idx]["cum_url_dup"] = \
                int(res.answers.get("urlDup", 0))
    pending.clear()


def _check_entry(prio: int, i: int, u) -> tuple:
    """The check()-path 12-tuple shared by every submission surface
    (seeds, inject=, watched file): parent_sub=-1 marks skip-fast
    admission (global.cxx:284-297); no parent ip/cookie."""
    return (prio, "", 0, i, u.host, u.port, u.file, u.depth,
            u.hash_code(), "", -1, None)


def _drain_submissions(subs, res, cfg, sched, seen, n_sched, n_seen,
                       pending_dup) -> None:
    """Process watched-file submissions in file order: consecutive
    same-(test, priority) runs form one admission group — a group's
    admission lexsort reduces to submission order when prio is uniform,
    so group-at-a-time equals the reference's sequential line loop.
    test=1 groups run the normal check()-path barrier; test=0 groups
    set the seen bits unconditionally and enqueue with no verdict
    (io/input.cxx:152-159 "set without test")."""
    i0 = 0
    while i0 < len(subs):
        key = (subs[i0].test, subs[i0].prio)
        grp = []
        j = i0
        while j < len(subs) and (subs[j].test, subs[j].prio) == key:
            grp.append(subs[j])
            j += 1
        i0 = j
        entries_by_shard: dict[int, list] = {}
        hcs = []
        for i, sub in enumerate(grp):
            u = parse_url(sub.url.encode("latin-1"), sub.depth, None)
            if not u.is_valid():
                continue
            sid = _route_host(u.host, n_sched, cfg.punycode)
            e = _check_entry(sub.prio, i, u)
            entries_by_shard.setdefault(sid, []).append(e)
            hcs.append(e[8])
        if not entries_by_shard:
            continue
        if key[0]:      # test=1: the check()-path admission barrier
            ray.get([sched[sid].submit_links.remote(e)
                     for sid, e in entries_by_shard.items()])
            pending_dup.append((None, *_admit_barrier(cfg, sched, seen, [])))
        else:           # test=0: set without test + forced enqueue
            codes = np.asarray(hcs, dtype=np.int64)
            mod = codes % n_seen
            futs = [seen[ssid].set_many.remote(codes[mod == ssid])
                    for ssid in range(n_seen) if bool((mod == ssid).any())]
            futs += [sched[sid].submit_forced.remote(e)
                     for sid, e in entries_by_shard.items()]
            ray.get(futs)


def _run_crawl(pages, seeds, cfg, out_dir, max_ticks, sched, seen, dup,
               build_rows=True, checkpoint_dir=None, resume=False, inject=None,
               watch_file=None, watch_feed=None, submit_port=None,
               submit_feed=None):
    import os as _os
    import time as _time
    debug = bool(_os.environ.get("LARBIN_TICK_DEBUG"))
    phase_t: dict[str, float] = {}
    # cluster CPU count for the auto parse-batch policy (one lookup)
    _n_cpus = max(1, int(ray.cluster_resources().get("CPU", 4)))
    watcher = None
    if watch_file is not None:
        from larbin_ray.sources.submit import SubmissionWatcher
        open(watch_file, "a").close()   # surface exists from tick 0
        watcher = SubmissionWatcher(watch_file)
        if resume:
            # socket semantics (io/input.cxx): a submission sent while
            # the crawler is down is never acknowledged.  A resumed run
            # treats the file's current content as consumed — otherwise
            # every line the checkpointing run already processed would
            # re-drain (test=0 lines would force a second fetch) and
            # the resumed crawl would diverge from an uninterrupted one.
            watcher._offset = _os.path.getsize(watch_file)
    server = None
    if submit_port is not None:
        from larbin_ray.sources.submit import SubmissionServer
        # an already-bound SubmissionServer is accepted so a caller can
        # announce an ephemeral port BEFORE the crawl starts (the CLI's
        # --submit-port 0); the crawl owns the lifecycle either way
        server = (submit_port if isinstance(submit_port, SubmissionServer)
                  else SubmissionServer(port=submit_port))
    try:
        return _run_crawl_inner(
            pages, seeds, cfg, out_dir, max_ticks, sched, seen, dup,
            build_rows, checkpoint_dir, resume, inject, watcher, watch_file,
            watch_feed, server, submit_feed, debug, phase_t, _n_cpus)
    finally:
        if server is not None:
            server.close()


def _run_crawl_inner(pages, seeds, cfg, out_dir, max_ticks, sched, seen, dup,
                     build_rows, checkpoint_dir, resume, inject, watcher,
                     watch_file, watch_feed, server, submit_feed, debug,
                     phase_t, _n_cpus):
    import os as _os
    import time as _time

    def _clk(name, t0):
        phase_t[name] = phase_t.get(name, 0.0) + _time.time() - t0

    n_sched = cfg.num_scheduler_shards
    n_seen = cfg.num_seen_shards
    n_buckets = cfg.fetch_num_buckets
    if n_buckets == 0:   # auto: partition when the corpus outgrows a broadcast
        hb = (pages.column("html").nbytes
              if "html" in pages.column_names else 0)
        n_buckets = max(1, -(-hb // cfg.fetch_bucket_bytes))
    pages_refs = put_pages(pages, n_buckets, cfg.fetch_parquet_dir)
    fetch_fn = make_fetch_fn(pages_refs)
    res = CrawlResult()
    if not build_rows:
        res.n_fetched = 0
    keep_text = out_dir is None
    meta_tables: list[pa.Table] = []
    metrics_rows: list[dict] = []
    start_tick = 0

    base_failures: list[tuple] = []
    base_host_ram = 0
    if resume:
        from larbin_ray.pipelines.checkpoint import restore_checkpoint
        manifest = restore_checkpoint(checkpoint_dir, cfg, sched, seen, dup)
        res.answers.update(manifest["answers"])
        base_failures = [tuple(f[:2]) + (tuple(f[2]),)
                         for f in manifest.get("failures", [])]
        base_host_ram = manifest.get("max_host_ram", 0)
        start_tick = manifest["next_tick"]
        seeds = []   # already admitted by the checkpointing run
        # carry the completed ticks' metrics rows forward so the next
        # checkpoint (and the final write) keeps the full lineage
        # instead of overwriting metrics.parquet with post-resume rows
        _mpath = f"{checkpoint_dir}/metrics.parquet"
        if _os.path.exists(_mpath):
            import pyarrow.parquet as _pq
            metrics_rows = [r for r in _pq.read_table(_mpath).to_pylist()
                            if r["tick"] < start_tick]
    elif out_dir is not None:
        # fresh run into an existing out_dir: wipe prior sink output so
        # ticks a shorter rerun never reaches can't leave stale slices
        # or dup sidecars behind (resume keeps completed ticks' output
        # and re-clears only the ticks it re-executes)
        import shutil
        for _sub in ("pages", "dup_patches"):
            _p = f"{out_dir}/{_sub}"
            if _os.path.isdir(_p):
                shutil.rmtree(_p)

    # ---- seeds: straight through check() (global.cxx:284-297) ----
    seed_entries: dict[int, list] = {}
    for i, s in enumerate(seeds):
        u = parse_url(s.encode("latin-1"), cfg.depth_in_site, None)
        if not u.is_valid():
            raise ValueError(f"invalid seed url: {s}")
        sid = _route_host(u.host, n_sched, cfg.punycode)
        seed_entries.setdefault(sid, []).append(_check_entry(0, i, u))
    ray.get([sched[sid].submit_links.remote(e) for sid, e in seed_entries.items()])
    # urlDup count refs from every barrier settle lazily in barrier
    # order — the chain itself is the per-actor-ordered barrier
    pending_dup: list[tuple] = []
    pending_dup.append((None, *_admit_barrier(cfg, sched, seen, [])))

    # throughput-mode fast path: when nothing out-of-band can feed or
    # observe a tick boundary (no watcher/injection between ticks, no
    # checkpoint reading the frontier, no limit that can stop the loop
    # mid-frontier), the NEXT tick's begin_tick can fire at wave end,
    # right behind apply_verdicts in each shard's actor queue — the
    # shards dispatch tick T+1 while the driver does tick T's ctrl
    # work, taking the admission-chain + dispatch latency off the
    # serial path.  (A prefired-but-unconsumed begin would pop queues
    # and resolve hosts the oracle never sees, hence the limit /
    # max_ticks gates; robots and content-dup feed the admission, so
    # those keep the late barrier.)
    prefire_ok = (watcher is None and server is None and not inject
                  and checkpoint_dir is None
                  and not cfg.limit_page and not cfg.limit_time)
    next_begin = None
    feed_sent = 0               # cumulative submit_feed bytes (handshake)
    # next-tick size prediction for the per-shard early-wave gate (None
    # until the first completed tick: tick 0 / the resume tick always
    # take the global path)
    predict_rows = None

    fed_ticks: set = set()

    def _drain_server() -> bool:
        """Feed (test harness) + drain the TCP daemon; True if any
        submission was admitted.  ``fed_ticks`` guards the feed: the
        idle-frontier final poll calls this a second time for the same
        tick and must only DRAIN, not re-send (a re-sent test=1 payload
        would double-count its rejections in the answers histogram)."""
        nonlocal feed_sent
        if submit_feed and tick in submit_feed and tick not in fed_ticks:
            import socket as _socket
            fed_ticks.add(tick)
            payload = submit_feed[tick].encode("latin-1")
            with _socket.create_connection((server.host, server.port)) as c:
                c.sendall(payload)
            feed_sent += len(payload)
            if not server.wait_bytes(feed_sent):
                raise RuntimeError("submit_feed handshake timed out")
        subs = server.drain()
        if subs:
            _drain_submissions(subs, res, cfg, sched, seen, n_sched, n_seen,
                               pending_dup)
        return bool(subs)

    # ---- tick loop ----
    for tick in range(start_tick, max_ticks):
        # limitTime on the simulated clock: tick k starts at
        # k*waitDuration seconds (1 s/tick in drain mode) — same
        # expression as the oracle (limit_time.cxx:40 semantics)
        if cfg.limit_time and tick * max(cfg.wait_duration, 1) >= cfg.limit_time:
            break
        if watcher is not None:
            if watch_feed and tick in watch_feed:
                with open(watch_file, "a") as _wf:
                    _wf.write(watch_feed[tick])
            _drain_submissions(watcher.drain(), res, cfg, sched, seen,
                               n_sched, n_seen, pending_dup)
        if server is not None:
            _drain_server()
        injected = (inject or {}).get(tick, [])
        if injected:
            # S2 input-port equivalent: submissions run straight through
            # check() like seeds (io/input.cxx:147-159 semantics, test=1)
            inj_entries: dict[int, list] = {}
            for i, s_url in enumerate(injected):
                u = parse_url(s_url.encode("latin-1"), cfg.depth_in_site, None)
                if u.is_valid():
                    sid = _route_host(u.host, n_sched, cfg.punycode)
                    inj_entries.setdefault(sid, []).append(_check_entry(0, i, u))
            ray.get([sched[sid].submit_links.remote(e)
                     for sid, e in inj_entries.items()])
            pending_dup.append((None, *_admit_barrier(cfg, sched, seen, [])))
        _t0 = _time.time()
        # num_returns=3 splits each shard's (robots, dispatch table,
        # queued) into separate objects: the driver reads all three
        # (the table read is a zero-copy plasma map), but the TASKS get
        # the table refs directly — the tick table is never re-serialized
        # through a driver ray.put
        if next_begin is not None:
            begin_futs, next_begin = next_begin, None
        else:
            begin_futs = [s.begin_tick.options(num_returns=3).remote(tick)
                          for s in sched]
        task_sink = out_dir is not None
        ship_text = keep_text
        sink_dir = f"{out_dir}/pages/tick={tick}" if task_sink else None
        if sink_dir is not None:
            # rerun over an existing out_dir: clear this tick's slices
            # (and its dup-status sidecar) BEFORE the first task can
            # write, so parts from an earlier, differently-batched run
            # can't survive alongside the fresh ones.  Resume
            # re-executes whole ticks, so per-tick clearing composes
            # with checkpoint-granularity resume.  (Hoisted above the
            # early/global fork — one copy for both paths; clearing an
            # empty tick's dir is a no-op.)
            if _os.path.isdir(sink_dir):
                import shutil
                shutil.rmtree(sink_dir)
            _patch = f"{out_dir}/dup_patches/tick={tick}.parquet"
            if _os.path.exists(_patch):
                _os.remove(_patch)
        # per-shard early waves whenever the predicted tick size stays
        # under the Ray Data threshold (prediction = 4x last tick's
        # rows — tick volume tracks active IPs under politeness, not
        # queue depth, and a miss costs only path choice, never output:
        # both paths are parity-tested).  Tick 0 / resume tick has no
        # prediction and takes the global path.
        early = None
        if (predict_rows is not None
                and predict_rows < cfg.ray_data_min_tick_rows):
            early = _early_wave(tick, begin_futs, sched, cfg, n_sched,
                                _n_cpus, pages_refs, sink_dir, ship_text,
                                _clk)
            begins = early[0]
        else:
            _flat = ray.get([r for f in begin_futs for r in f])
            begins = [tuple(_flat[i:i + 3]) for i in range(0, len(_flat), 3)]
            _clk("begin", _t0)
        robots_rows = [r for b in begins for r in b[0]]
        n_pages_tick = sum(b[1].num_rows for b in begins)
        queued = sum(b[2] for b in begins)
        if not robots_rows and n_pages_tick == 0:
            if (queued == 0 and not any(t > tick for t in (inject or {}))
                    and not any(t > tick for t in (watch_feed or {}))
                    and not any(t > tick for t in (submit_feed or {}))):
                # final poll: honor submissions fully delivered before
                # the idle-frontier exit (they admit now, dispatch next
                # tick).  Later arrivals are the daemon regime — a
                # batch run exits on an idle frontier by design.
                drained = False
                if watcher is not None:
                    subs = watcher.drain()
                    if subs:
                        _drain_submissions(subs, res, cfg, sched, seen,
                                           n_sched, n_seen, pending_dup)
                        drained = True
                if server is not None and _drain_server():
                    drained = True
                if drained:
                    continue
                break
            continue

        if early is not None:
            used_ray_data = False
            tbl_rows = len(robots_rows) + n_pages_tick
            _, futs, rob_meta_futs = early
        else:
            # robots rows first, then each shard's dispatch table in
            # shard order (same order the old driver-side column build
            # produced); the shard tables arrive Arrow-ready, so this is
            # a zero-copy concat, not a per-row python loop
            _t0 = _time.time()
            rob_tbl = _dispatch_table(robots_rows) if robots_rows else None
            parts = ([rob_tbl] if rob_tbl is not None else [])
            parts += [b[1] for b in begins if b[1].num_rows]
            tbl = pa.concat_tables(parts)
            tbl_rows = tbl.num_rows
            # parse_batch_size=0 -> auto: ~2 task waves per CPU per tick
            # (config.py rationale); crawl output is batch-size-invariant
            bs = cfg.parse_batch_size or min(
                16384, max(512, -(-tbl.num_rows // (2 * _n_cpus))))
            # the sink is ALWAYS task/batch-side (distributed,
            # resumable); under page_no_duplicate the statuses resolved
            # to `duplicate` at the dup barrier are recorded in a tiny
            # per-tick sidecar that read_crawl_pages applies — page text
            # never ships to the driver
            used_ray_data = tbl.num_rows >= cfg.ray_data_min_tick_rows
            _clk("concat", _t0)
        pre_futs = None     # set when admission is fired early at wave end
        chain = None        # set when the WHOLE chain is wired at wave end
        robots_sent = False  # robots results already rode the pre_admit RPC
        if used_ray_data:
            # cluster-scale path: Ray Data streaming pipeline
            blocks = max(1, min(64, tbl.num_rows // bs))
            ds = from_table(tbl, blocks).map_batches(
                # worker_parse_extract resolves worker-side: the memos
                # persist across batches instead of deserializing the
                # driver's instance fresh per task
                lambda b: _process_batch(b, fetch_fn,
                                         worker_parse_extract(cfg), sched,
                                         n_sched, sink_dir, ship_text),
                batch_format="pyarrow", batch_size=bs)
            # drain the stream's ref bundles directly: no MaterializedDataset
            # copy, two fewer Dataset constructions (each pays a StatsActor
            # RPC) and no legacy block-list conversion — measured ~15% off
            # the per-tick fixed cost vs materialize().to_arrow_refs().
            # Bundle arrival order may differ from block order; every
            # consumer is either order-free (throughput mode) or re-sorts
            # ctrl by the unique admission key (dup/build_rows mode).
            ctrl = pa.concat_tables(ray.get(
                [r for b in ds.iter_internal_ref_bundles()
                 for r in b.block_refs]))
        else:
            if early is None:
                _t0 = _time.time()
                # robots rows (rare, small) are the only part the driver
                # puts; the shard dispatch tables travel as their
                # begin_tick return refs — empty shard tables contribute
                # 0 rows to the task-side concat, so the offsets computed
                # from the driver's `tbl` match
                tick_refs = (([ray.put(rob_tbl)] if rob_tbl is not None else [])
                             + [f[1] for f in begin_futs])
                task = _process_task.options(num_returns=1 + n_sched)
                futs = [
                    task.remote(
                        tick_refs, i, bs, pages_refs, cfg, n_sched,
                        f"{sink_dir}/part-{i // bs}.parquet" if task_sink else None,
                        ship_text)
                    for i in range(0, tbl.num_rows, bs)]
                # robots rows sit at the head of the global table
                rob_meta_futs = ([f[0] for f in
                                  futs[:-(-len(robots_rows) // bs)]]
                                 if robots_rows else [])
                _clk("submit", _t0)
                _t0 = _time.time()
                # each task returns (meta table, entries-shard-0, ..., -N).
                # The driver waits on the meta refs and, as tasks COMPLETE,
                # forwards their entry refs to the scheduler shards
                # (prefeed_links): the shards' entry deserialize+buffer work
                # runs in the shadow of the wave instead of inside the
                # admission barrier.  The shards never block — a forwarded
                # ref is already complete (all of a task's returns commit
                # when it exits).  (Streaming refs from INSIDE the tasks was
                # tried and measured 20-25% slower: actors then block in
                # ray.get on unfinished outputs, pin workers, and trigger
                # the raylet's blocked-worker handling; pre_admit sorts the
                # buffer by the unique admission key, so arrival order
                # cannot change the result.)
                by_meta = {f[0]: f for f in futs}
                pending = [f[0] for f in futs]
                while pending:
                    done, pending = ray.wait(
                        pending, num_returns=min(len(pending), 8))
                    for sid in range(n_sched):
                        sched[sid].prefeed_links.remote(
                            [by_meta[r][1 + sid] for r in done])
                _clk("taskwave", _t0)
            _t0 = _time.time()
            if dup is None and not robots_rows:
                # nothing downstream can feed this tick's admission
                # (dup_parents stays [], robots_payload stays {}): start
                # the shards' sort+fast-fail now, overlapped with the
                # driver's ctrl processing below
                pre_futs = _fire_pre_admit(sched, [], None, n_seen)
            elif dup is None and not build_rows:
                # robots tick, throughput mode: the robots results sit
                # in the head task metas (rob_meta_futs — global-table
                # head, or each shard's slice head under early waves),
                # all complete at wave end.  Extract them now and let
                # them ride the pre_admit RPC, so robots ticks overlap
                # the admission chain too; application is per-host
                # independent, so meta order is immaterial.  (build_rows
                # / dup mode keeps the late barrier: there the robots
                # payload is read from the sorted ctrl.)
                rob_metas = ray.get(rob_meta_futs)
                payload: dict[int, list] = {}
                for mt in rob_metas:
                    mrob = mt["is_robots"].to_numpy(zero_copy_only=False)
                    for i in np.flatnonzero(mrob):
                        i = int(i)
                        host_b = mt["host"][i].as_py().encode("latin-1")
                        sid = _route_host(host_b, n_sched, cfg.punycode)
                        payload.setdefault(sid, []).append(
                            (host_b, mt["port"][i].as_py(),
                             mt["text"][i].as_py()))
                pre_futs = _fire_pre_admit(sched, [], payload, n_seen)
                robots_sent = True
            if pre_futs is not None and prefire_ok and tick + 1 < max_ticks:
                # wire the whole chain and fire the NEXT begin now:
                # per-actor ordering runs begin_tick(T+1) right
                # after apply_verdicts(T), overlapped with the
                # driver's ctrl processing below
                chain = _wire_chain(sched, seen, pre_futs)
                next_begin = [
                    s.begin_tick.options(num_returns=3).remote(tick + 1)
                    for s in sched]
            ctrl = pa.concat_tables(ray.get([f[0] for f in futs]))
            _clk("wave_end", _t0)

        _t0 = _time.time()
        # the global fetch order is observable only through the content-dup
        # barrier (first-occurrence-wins, file.cxx:583-588) and the
        # res.fetched row order; in throughput mode with dup off every
        # consumer below is order-free (answers = bincount, robots results
        # apply per-host independently, metrics are counters, the sink was
        # written task-side), so the O(rows log rows) driver sort is skipped
        # (parity: test_long_crawl_throughput_mode asserts answers equality
        # against the sorted build_rows=True run)
        if dup is not None or build_rows:
            ctrl = ctrl.sort_by([("tick", "ascending"), ("ip", "ascending"),
                                 ("is_robots", "descending"), ("sub", "ascending")])
        is_rob = ctrl["is_robots"].to_numpy(zero_copy_only=False)
        # statuses stay dictionary-encoded on the driver: int codes +
        # an O(unique) value list — never an O(rows) python list
        _enc = ctrl["status"].combine_chunks().dictionary_encode()
        st_codes = _enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        status_vals = _enc.dictionary.to_pylist()
        code_of = {s: i for i, s in enumerate(status_vals)}
        _clk("ctrl_sort", _t0)

        # content-dup resolution in global fetch order (file.cxx:583-588)
        _t0 = _time.time()
        dup_parents: list[tuple] = []
        if dup is not None:
            succ_idx = np.flatnonzero(
                (st_codes == code_of.get("success", -1)) & ~is_rob)
            codes = ctrl["content_hash"].to_numpy(zero_copy_only=False)[succ_idx]
            dmod = codes % n_seen
            d_futs, d_sel = [], []
            for ssid in range(n_seen):
                sel = np.flatnonzero(dmod == ssid)
                if len(sel):
                    d_futs.append(dup[ssid].test_set_sorted.remote(codes[sel]))
                    d_sel.append(sel)
            dup_rows = []
            for sel, verdicts in zip(d_sel, ray.get(d_futs)):
                dup_rows.extend(succ_idx[sel[~np.asarray(verdicts, dtype=bool)]])
            if dup_rows:
                dup_rows = np.asarray(sorted(dup_rows))
                dup_code = code_of.get("duplicate")
                if dup_code is None:
                    dup_code = len(status_vals)
                    status_vals.append("duplicate")
                    code_of["duplicate"] = dup_code
                st_codes[dup_rows] = dup_code
                # per-index scalar access: cost scales with the tick's
                # duplicates, not its row count (no full-column pylist)
                subs_np = ctrl["sub"].to_numpy(zero_copy_only=False)
                dup_parents = [(ctrl["ip"][int(i)].as_py(), int(subs_np[i]))
                               for i in dup_rows]
                if out_dir is not None:
                    # status-patch sidecar: the distributed task-side sink
                    # wrote this tick's slices with pre-dup statuses (the
                    # dup verdict needs the global fetch order and can't
                    # exist task-side); the patch holds ONE (url, sub) per
                    # duplicate row — O(dups this tick), never page text.
                    # sub disambiguates a url legitimately fetched twice
                    # within one tick (test=0 refetch in drain mode):
                    # only the losing row's status flips
                    import os

                    import pyarrow.parquet as pq
                    _dri = pa.array(dup_rows, pa.int64())
                    os.makedirs(f"{out_dir}/dup_patches", exist_ok=True)
                    pq.write_table(
                        pa.table({"url": pc.take(ctrl["url"], _dri),
                                  "sub": pc.take(ctrl["sub"], _dri)}),
                        f"{out_dir}/dup_patches/tick={tick}.parquet")

        _clk("dup", _t0)
        _t0 = _time.time()
        # answers: fetch statuses + stateless extraction errors
        # (bincount over int codes; python work is O(unique statuses))
        _cnt = np.bincount(st_codes[~is_rob], minlength=len(status_vals))
        res.answers.update({status_vals[i]: int(c)
                            for i, c in enumerate(_cnt) if c})
        # value_counts in C; the driver touches O(unique error kinds)
        _vc = pc.value_counts(pc.list_flatten(ctrl["stateless_errors"]))
        res.answers.update({v["values"]: v["counts"] for v in _vc.to_pylist()})

        # robots bodies -> owning shards (per-index scalar access: the
        # robots rows are few — no full host/port column materialization).
        # Skipped when the payload already rode a wave-end pre_admit.
        robots_payload: dict[int, list] = {}
        if not robots_sent:
            rob_idx = np.flatnonzero(is_rob)
            for i in rob_idx:
                i = int(i)
                host_b = ctrl["host"][i].as_py().encode("latin-1")
                sid = _route_host(host_b, n_sched, cfg.punycode)
                robots_payload.setdefault(sid, []).append(
                    (host_b, ctrl["port"][i].as_py(), ctrl["text"][i].as_py()))
        _clk("robots_mid", _t0)
        _t0 = _time.time()

        # record result meta (tables; dicts are built once at the end);
        # decode = one C-speed take of the tiny dictionary by the codes
        meta = ctrl.set_column(ctrl.schema.get_field_index("status"), "status",
                               pc.take(pa.array(status_vals, pa.string()),
                                       pa.array(st_codes, pa.int64())))
        meta = meta.drop_columns(["stateless_errors", "interesting"])
        if out_dir is not None:
            meta = meta.drop_columns(["text"])
        if build_rows:
            meta_tables.append(meta)
        else:
            # throughput mode: aggregate incrementally, hold nothing —
            # driver memory stays flat over arbitrarily long crawls
            res.n_fetched += meta.num_rows
        _clk("meta", _t0)

        _t0 = _time.time()
        if chain is not None:
            dup_refs, apply_refs = chain
        else:
            dup_refs, apply_refs = _admit_barrier(
                cfg, sched, seen, dup_parents,
                robots_by_shard=robots_payload, prefired=pre_futs)
        _clk("admit", _t0)

        # early-wave gate for the NEXT tick: frontier growth between
        # consecutive ticks is bounded by per-IP politeness (tick rows ~
        # active IPs, not queue depth), so 4x last rows is a safe
        # envelope; a miss only picks the other parity-tested path
        predict_rows = 4 * tbl_rows
        metrics_rows.append({
            "tick": tick, "rows": tbl_rows,
            "robots": int(len(robots_rows)),
            "pages": int(n_pages_tick),
            "cum_success": int(res.answers["success"]),
            "cum_url_dup": -1,      # filled by _apply_dups at settle
        })
        pending_dup.append((len(metrics_rows) - 1, dup_refs, apply_refs))
        # bound the lazy-settle window: without checkpoints a long crawl
        # would otherwise accumulate O(ticks x (n_seen + n_sched)) live
        # ObjectRefs on the driver, each pinning its (tiny) result in
        # the owner store — at design scale (millions of ticks) that is
        # tens of millions of pinned objects.  The two most recent
        # entries stay in flight (the current tick's chain — and its
        # prefired successor — may still be running; settling them here
        # would serialize the wave-end overlap), so the batched get
        # only touches chains that finished ticks ago and returns
        # immediately, keeping throughput mode's flat-driver-memory
        # contract.  Settling a prefix preserves barrier order.
        if len(pending_dup) >= _SETTLE_EVERY:
            older = pending_dup[:-2]
            del pending_dup[:-2]
            _apply_dups(res, older, metrics_rows)
        if (checkpoint_dir and cfg.checkpoint_every
                and (tick + 1) % cfg.checkpoint_every == 0):
            from larbin_ray.pipelines.checkpoint import write_checkpoint

            # settle the admission chains first: the manifest reads
            # res.answers['urlDup'] and the metrics rows' cum values
            _apply_dups(res, pending_dup, metrics_rows)
            # manifest answers/failures must include the shard-held
            # state (noDNS/fastRobots/... live in the scheduler cores)
            # plus anything restored from a prior manifest
            ck_answers = Counter(res.answers)
            ck_failures = list(base_failures)
            ck_host_ram = base_host_ram
            for st in ray.get([s.stats.remote() for s in sched]):
                ck_answers.update(st["answers"])
                ck_failures.extend(st["failures"])
                ck_host_ram = max(ck_host_ram, st.get("max_host_ram", 0))
            write_checkpoint(checkpoint_dir, tick + 1, cfg, sched, seen, dup,
                             ck_answers, metrics_rows,
                             failures=ck_failures, max_host_ram=ck_host_ram)
        if debug:
            # nb: 'admit' times only the ref wiring — the chain itself
            # runs actor-side and overlaps the NEXT tick's begin phase
            print(f"[tick {tick}] rows={tbl_rows} " +
                  " ".join(f"{k}={v:.2f}" for k, v in sorted(phase_t.items())),
                  flush=True)
            phase_t.clear()

        if cfg.limit_page and res.answers["success"] >= cfg.limit_page:
            break

    # ---- build the result rows once ----
    _apply_dups(res, pending_dup, metrics_rows)
    if build_rows:
        res.n_fetched = sum(t.num_rows for t in meta_tables)
    for t in meta_tables:
        has_text = "text" in t.column_names
        texts = t["text"].to_pylist() if has_text else None
        cols = {n: t[n].to_pylist() for n in
                ("url", "host", "port", "ip", "depth", "is_robots", "tick", "sub", "status")}
        for i in range(t.num_rows):
            st = cols["status"][i]
            rob = cols["is_robots"][i]
            txt = b""
            if has_text and (rob or (keep_text and st == "success")):
                txt = texts[i]
            res.fetched.append({
                "url": cols["url"][i], "host": cols["host"][i],
                "port": cols["port"][i], "ip": cols["ip"][i],
                "depth": cols["depth"][i], "is_robots": rob,
                "tick": cols["tick"][i], "sub": cols["sub"][i],
                "status": "robots" if rob else st, "text": txt})

    res.failures.extend(base_failures)       # pre-resume entries first
    res.max_host_ram = max(res.max_host_ram, base_host_ram)
    for st in ray.get([s.stats.remote() for s in sched]):
        res.answers.update(st["answers"])
        res.failures.extend(st["failures"])
        res.max_host_ram = max(res.max_host_ram, st.get("max_host_ram", 0))
    res.seen_indices = gather_seen_indices(seen)
    if checkpoint_dir and metrics_rows:
        import pyarrow.parquet as pq
        _os.makedirs(checkpoint_dir, exist_ok=True)
        pq.write_table(pa.Table.from_pylist(metrics_rows),
                       f"{checkpoint_dir}/metrics.parquet")
    return res


def read_crawl_pages(out_dir: str) -> pa.Table:
    """Read a crawl sink directory back into one table with FINAL
    statuses.

    The sink is written distributedly by the fetch+parse tasks/batches
    *before* content-dup resolution (the dup verdict needs the global
    fetch order — file.cxx:583-588 — so it can only exist at the tick
    barrier); under ``page_no_duplicate`` the driver records each tick's
    duplicate urls in a tiny sidecar (``dup_patches/tick=N.parquet``).
    This helper applies the patches.  It materializes the whole sink —
    a test/inspection utility; at scale, apply the patch as a broadcast
    semi-join inside ``map_batches`` over ``read_parquet(out_dir)``
    (the patch side is O(duplicates), the classic small side)."""
    import glob

    import pyarrow.parquet as pq
    files = sorted(glob.glob(f"{out_dir}/pages/tick=*/part-*.parquet"))
    if not files:
        # empty sink (crawl fetched nothing, or a fresh/failed out_dir)
        return pa.table({"url": pa.array([], pa.string())})
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    patches = sorted(glob.glob(f"{out_dir}/dup_patches/tick=*.parquet"))
    if patches:
        import re as _re

        # scope each patch to its own tick, dispatch sub and non-robots
        # rows: the same url can legitimately appear in several sink
        # rows (a robots fetch bypasses the url-seen set; test=0
        # submissions refetch — even twice within ONE tick in drain
        # mode) and only the losing row was the dup
        parts = []
        for p in patches:
            t = int(_re.search(r"tick=(\d+)", p).group(1))
            pt = pq.read_table(p)
            u = pt["url"].combine_chunks()
            parts.append(pa.table({
                "tick": pa.array([t] * len(u), pa.int64()),
                "sub": pt["sub"].combine_chunks().cast(pa.int64()),
                "url": u}))
        pats = pa.concat_tables(parts)
        sep = pa.scalar("|")
        key_tbl = pc.binary_join_element_wise(
            pc.cast(tbl["tick"], pa.string()),
            pc.cast(tbl["sub"], pa.string()), tbl["url"], sep)
        key_pat = pc.binary_join_element_wise(
            pc.cast(pats["tick"], pa.string()),
            pc.cast(pats["sub"], pa.string()), pats["url"], sep)
        mask = pc.and_(pc.is_in(key_tbl, value_set=key_pat.combine_chunks()),
                       pc.invert(tbl["is_robots"]))
        status = pc.if_else(mask, pa.scalar("duplicate"), tbl["status"])
        tbl = tbl.set_column(tbl.schema.get_field_index("status"),
                             "status", status)
    return tbl


def ray_crawl_from_conf(pages: pa.Table, conf_path: str, *,
                        seeds: list[str] | None = None, **kw) -> CrawlResult:
    """Run a crawl from a Larbin configuration file — the switch-over
    surface for a reference user: ``./larbin -c my.conf`` becomes
    ``ray_crawl_from_conf(pages, "my.conf")``.  ``startUrl`` lines in
    the conf are the seeds unless overridden."""
    from larbin_ray.kernels.confparse import parse_larbin_conf

    with open(conf_path) as f:
        cfg, conf_seeds = parse_larbin_conf(f.read())
    return ray_crawl(pages, seeds if seeds is not None else conf_seeds,
                     cfg, **kw)
