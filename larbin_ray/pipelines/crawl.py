"""The crawl pipeline — Larbin's event loop re-expressed as a
generation-synchronous Ray pipeline (SURVEY.md §3.1 "Ray lifecycle
equivalent").

Each simulated-time *tick* (politeness slot, see larbin_ray.state.sites)
runs one Ray Data pipeline:

    dispatch rows (from scheduler shards)
      -> map_batches(fetch)   : frontier ⨝ pages table (broadcast index)
      -> map_batches(parse)   : HTTP parse + HTML link extraction (kernels)
      -> materialize          : one tick's worth of blocks
      -> page results         : recorded / written as Parquet per tick
      -> candidate links      : barrier+sort admission through
         scheduler shards (initOK fast-fails) -> seen shards (testSet)
         -> scheduler shards (enqueue)

State lives only in the named actor tiers (scheduler shards keyed by
politeness IP, seen/dup bitset shards keyed by hash code); every
ordering decision is derived from the data keys (tick, ip, sub, link
order), so the crawl output is bit-identical at any CPU count and any
shard count — the oracle-equality tests assert exactly that.

Driver-side routing note: candidate tables per tick are routed on the
driver (sort + group by shard).  At 10^10-URL scale this step becomes a
Dataset ``map_batches`` that calls the same shard RPCs with the same
sort-at-barrier protocol — the actor interfaces are already
batch-shaped for that.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import ray
import ray.data as rd

from larbin_ray.config import CrawlConfig
from larbin_ray.kernels.textutil import match_priv_ext
from larbin_ray.kernels.urlnorm import parse_url
from larbin_ray.oracle.simcrawl import CrawlResult
from larbin_ray.pipelines.extract import from_table
from larbin_ray.stages.fetch import make_fetch_fn, put_pages
from larbin_ray.stages.parse import ParseExtract
from larbin_ray.stages.scheduler import SchedulerShard, shard_of_host
from larbin_ray.stages.seen import BitsetShard, gather_seen_indices


def _flat(lists):
    return [x for sub in lists for x in sub]


DISPATCH_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("host", pa.string()),
    ("port", pa.int32()),
    ("ip", pa.string()),
    ("depth", pa.int32()),
    ("is_robots", pa.bool_()),
    ("tick", pa.int32()),
    ("sub", pa.int32()),
])


def _dispatch_table(rows: list[dict]) -> pa.Table:
    cols = {f.name: [r[f.name] for r in rows] for f in DISPATCH_SCHEMA}
    return pa.table({n: pa.array(v, DISPATCH_SCHEMA.field(n).type)
                     for n, v in cols.items()})


def ray_crawl(pages: pa.Table, seeds: list[str], cfg: CrawlConfig | None = None,
              out_dir: str | None = None, max_ticks: int | None = None) -> CrawlResult:
    """Run the full crawl; returns the same result shape as the oracle."""
    cfg = cfg or CrawlConfig()
    max_ticks = max_ticks or cfg.max_ticks
    n_sched = cfg.num_scheduler_shards
    n_seen = cfg.num_seen_shards
    priv_exts = tuple(e.encode() for e in cfg.privileged_exts)

    pages_ref = put_pages(pages)
    fetch_fn = make_fetch_fn(pages_ref)
    parse = ParseExtract(cfg)

    sched = [SchedulerShard.remote(i, cfg) for i in range(n_sched)]
    seen = [BitsetShard.remote(i, n_seen) for i in range(n_seen)]
    dup = [BitsetShard.remote(i, n_seen) for i in range(n_seen)] \
        if cfg.page_no_duplicate else None

    res = CrawlResult()
    keep_text = out_dir is None
    try:
        return _run_crawl(res, pages, seeds, cfg, out_dir, max_ticks,
                          n_sched, n_seen, priv_exts, fetch_fn, parse,
                          sched, seen, dup, keep_text)
    finally:
        for a in sched + seen + (dup or []):
            ray.kill(a)


def _run_crawl(res, pages, seeds, cfg, out_dir, max_ticks, n_sched, n_seen,
               priv_exts, fetch_fn, parse, sched, seen, dup, keep_text):

    def admit_survivor_rows(survivors: list[tuple]) -> None:
        """survivors: (akey, host, port, file, depth, hash) — run the
        seen-set phase then enqueue the new ones, preserving akey order."""
        if not survivors:
            return
        survivors.sort(key=lambda t: t[0])
        by_seen: dict[int, list] = {}
        for seq, (akey, _h, _p, _f, _d, hc) in enumerate(survivors):
            by_seen.setdefault(hc % n_seen, []).append((akey, seq, hc))
        futs = []
        for sid, entries in by_seen.items():
            seen[sid].submit.remote(entries)
            futs.append(seen[sid].resolve.remote())
        is_new = {}
        for pairs in ray.get(futs):
            for seq, new in pairs:
                is_new[seq] = new
        by_sched: dict[int, list] = {}
        for seq, (akey, h, p, f, d, _hc) in enumerate(survivors):
            if not is_new[seq]:
                res.answers["urlDup"] += 1
                continue
            sid = shard_of_host(h.decode("latin-1"), n_sched)
            by_sched.setdefault(sid, []).append((akey, h, p, f, d))
        ray.get([sched[sid].enqueue.remote(sorted(rows))
                 for sid, rows in by_sched.items()])

    # ---- seeds: straight through check() (global.cxx:284-297) ----
    seed_rows = []
    for i, s in enumerate(seeds):
        u = parse_url(s.encode("latin-1"), cfg.depth_in_site, None)
        if not u.is_valid():
            raise ValueError(f"invalid seed url: {s}")
        akey = (-1, 0, "", 0, 0, i)
        seed_rows.append((akey, u.host, u.port, u.file, u.depth, u.hash_code()))
    admit_survivor_rows(seed_rows)

    # ---- tick loop ----
    for tick in range(max_ticks):
        robots_rows = _flat(ray.get([s.resolve_new_hosts.remote(tick) for s in sched]))
        page_rows = _flat(ray.get([s.dispatch.remote(tick) for s in sched]))
        if not robots_rows and not page_rows:
            if sum(ray.get([s.queued_count.remote() for s in sched])) == 0:
                break
            continue

        tbl = _dispatch_table(robots_rows + page_rows)
        blocks = max(1, min(32, tbl.num_rows // max(1, cfg.parse_batch_size // 4)))
        ds = (from_table(tbl, blocks)
              .map_batches(fetch_fn, batch_format="pyarrow",
                           batch_size=cfg.parse_batch_size)
              .map_batches(parse, batch_format="pyarrow",
                           batch_size=cfg.parse_batch_size))
        parsed = ds.materialize()
        if out_dir is not None:
            parsed.drop_columns(["links", "stateless_errors"]) \
                  .write_parquet(f"{out_dir}/pages/tick={tick}")
        ctrl = pa.concat_tables(ray.get(parsed.to_arrow_refs()))

        rows = ctrl.to_pylist()
        rows.sort(key=lambda r: (r["tick"], r["ip"], 0 if r["is_robots"] else 1, r["sub"]))

        # content-dup resolution in fetch order
        if dup is not None:
            by_dup: dict[int, list] = {}
            for seq, r in enumerate(rows):
                if r["status"] == "success" and not r["is_robots"]:
                    code = r["content_hash"]
                    by_dup.setdefault(code % n_seen, []).append(((seq,), seq, code))
            futs = []
            for sid, entries in by_dup.items():
                dup[sid].submit.remote(entries)
                futs.append(dup[sid].resolve.remote())
            dup_new = {seq: new for pairs in ray.get(futs) for seq, new in pairs}
        else:
            dup_new = None

        robots_by_shard: dict[int, list] = {}
        candidates: list[tuple] = []
        for seq, r in enumerate(rows):
            if r["is_robots"]:
                host_b = r["host"].encode("latin-1")
                sid = shard_of_host(r["host"], n_sched)
                robots_by_shard.setdefault(sid, []).append((host_b, r["port"], r["text"]))
                res.fetched.append({
                    "url": r["url"], "host": r["host"], "port": r["port"],
                    "ip": r["ip"], "depth": r["depth"], "is_robots": True,
                    "tick": r["tick"], "sub": r["sub"], "status": "robots",
                    "text": r["text"] if keep_text else b""})
                continue
            st = r["status"]
            links = r["links"] or []
            for e in r["stateless_errors"] or []:
                res.answers[e] += 1
            if dup_new is not None and st == "success" and not dup_new.get(seq, True):
                st, links = "duplicate", []   # file.cxx:583-588
            res.answers[st] += 1
            res.fetched.append({
                "url": r["url"], "host": r["host"], "port": r["port"],
                "ip": r["ip"], "depth": r["depth"], "is_robots": False,
                "tick": r["tick"], "sub": r["sub"], "status": st,
                "text": (r["text"] if (st == "success" and keep_text) else b"")})
            pkey = (r["tick"], r["ip"], 1, r["sub"])
            for d in links:
                prio = -1 if (cfg.specific_search and priv_exts
                              and match_priv_ext(d["file"], priv_exts)) else 0
                candidates.append(((tick, prio) + pkey + (d["order"],),
                                   d["host"], d["port"], d["file"], d["depth"], d["hash"]))

        ray.get([sched[sid].robots_results.remote(items)
                 for sid, items in robots_by_shard.items()])

        # route candidates: scheduler fast-fail phase
        by_sched: dict[int, list] = {}
        for c in candidates:
            sid = shard_of_host(c[1].decode("latin-1"), n_sched)
            by_sched.setdefault(sid, []).append(c)
        futs = []
        for sid, items in by_sched.items():
            sched[sid].submit_candidates.remote(items)
            futs.append(sched[sid].pre_admit.remote())
        survivors = _flat(ray.get(futs))
        admit_survivor_rows(survivors)

        if cfg.limit_page and res.answers["success"] >= cfg.limit_page:
            break

    # ---- collect final state ----
    for st in ray.get([s.stats.remote() for s in sched]):
        res.answers.update(st["answers"])
        res.failures.extend(st["failures"])
    res.seen_indices = gather_seen_indices(seen)
    return res
