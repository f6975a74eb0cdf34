"""Serial oracle crawl.

Runs the SimCrawl discipline (see larbin_ray.state.sites docstring) in a
single process, candidate-by-candidate in fully sequential order — no
phases, no shards.  The Ray engine (larbin_ray.pipelines.crawl) must
produce an identical crawl: same (tick, ip, sub) fetch keys, same
per-url extracted text, same URL-seen bitset, same answers histogram —
at any parallelism level.  That equality is the e2e correctness gate
(FIXTURES.md F5).

Seed admission follows global.cxx:284-297: seeds go straight through
``check()`` — seen-set testSet then the frontier — skipping filter1 and
initOK.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from larbin_ray.config import CrawlConfig
from larbin_ray.kernels.urlnorm import Url, parse_url
from larbin_ray.state.bitset import Bitset
from larbin_ray.state.sites import SchedulerCore, UrlRec
from larbin_ray.stages.parse import parse_one

SYNTH_404 = b"HTTP/1.0 404 Not Found\r\nContent-Type: text/html\r\n\r\n"


@dataclass
class CrawlResult:
    fetched: list[dict] = field(default_factory=list)   # url/tick/ip/sub/depth/status/text/is_robots
    answers: Counter = field(default_factory=Counter)
    failures: list[tuple[str, str, tuple]] = field(default_factory=list)
    seen_indices: np.ndarray | None = None
    n_fetched: int | None = None      # set by the engine in build_rows=False mode
    max_host_ram: int = 0             # high-water per-host RAM (maxUrlsBySite)

    def fetched_count(self) -> int:
        return self.n_fetched if self.n_fetched is not None else len(self.fetched)

    def order_keys(self) -> list[tuple]:
        return [(r["tick"], r["ip"], 0 if r["is_robots"] else 1, r["sub"], r["url"])
                for r in self.fetched]

    def fetched_sorted(self) -> list[dict]:
        return sorted(self.fetched,
                      key=lambda r: (r["tick"], r["ip"], 0 if r["is_robots"] else 1, r["sub"]))

    def text_by_url(self) -> dict[str, bytes]:
        return {r["url"]: r["text"] for r in self.fetched
                if r["status"] == "success" and not r["is_robots"]}


def oracle_crawl(pages: pa.Table, seeds: list[str], cfg: CrawlConfig | None = None,
                 max_ticks: int | None = None,
                 inject: dict[int, list[str]] | None = None) -> CrawlResult:
    """``inject`` maps tick -> urls submitted at that tick's start — the
    batch equivalent of the reference's TCP input port (io/input.cxx:
    60-187): submissions run straight through check() like seeds."""
    cfg = cfg or CrawlConfig()
    max_ticks = max_ticks or cfg.max_ticks
    lats = (pages["latency_ms"].to_pylist()
            if "latency_ms" in pages.column_names else [0] * pages.num_rows)
    index = {u: (h, lat or 0) for u, h, lat in
             zip(pages["url"].to_pylist(), pages["html"].to_pylist(), lats)}

    seen = Bitset()
    dup = Bitset() if cfg.page_no_duplicate else None
    core = SchedulerCore(cfg)
    res = CrawlResult()
    domains = cfg.domains_bytes()
    forb = cfg.forbidden_ext_bytes()

    def admit(rec: UrlRec, skip_fast: bool = False) -> None:
        """Sequential admission: initOK fast-fail -> seen testSet -> route."""
        if not skip_fast:
            reason = core.fast_check(rec)
            if reason is not None:
                core.answers[reason] += 1
                core.failures.append((rec.url_str(), reason, rec.akey))
                return
        u = Url(rec.host, rec.port, rec.file, rec.depth)
        if not seen.test_set(u.hash_code()):
            res.answers["urlDup"] += 1
            return
        core.enqueue([rec])

    # ---- seeds (tick -1) ----
    for i, s in enumerate(seeds):
        u = parse_url(s.encode("latin-1"), cfg.depth_in_site, None)
        if not u.is_valid():
            raise ValueError(f"invalid seed url: {s}")  # global.cxx:292-296 exits
        admit(UrlRec(u.host, u.port, u.file, u.depth, akey=(-1, "", 0, 0, i)),
              skip_fast=True)

    # ---- tick loop ----
    for tick in range(max_ticks):
        # limitTime (limit_time.cxx:40: endTime-startTime >= limitTime
        # stops the crawl).  The batch engine has no wall clock; its
        # simulated clock is the politeness tick — tick k starts at
        # k*waitDuration seconds (1 s/tick in drain mode), so the crawl
        # ends before the first tick whose start time reaches the limit.
        if cfg.limit_time and tick * max(cfg.wait_duration, 1) >= cfg.limit_time:
            break
        for i, item in enumerate((inject or {}).get(tick, [])):
            # item: url string (legacy: check()-path, test=1) or a
            # (url, depth, prio, test) tuple — the input-port header
            # semantics (io/input.cxx:111-160); test=False is the
            # "set without test" branch: mark seen unconditionally and
            # enqueue with no admission verdict
            if isinstance(item, str):
                s_url, depth, test = item, cfg.depth_in_site, True
            else:
                s_url, depth, _prio, test = item
            u = parse_url(s_url.encode("latin-1"), depth, None)
            if not u.is_valid():
                continue
            rec = UrlRec(u.host, u.port, u.file, u.depth,
                         akey=(tick, -2, "", 0, 0, i))
            if test:
                admit(rec, skip_fast=True)
            else:
                seen.test_set(u.hash_code())    # seen->set, verdict ignored
                core.enqueue([rec])
        robots_rows = core.resolve_new_hosts(tick)
        page_rows = core.dispatch(tick)
        if not robots_rows and not page_rows:
            if core.queued_count() == 0 and not any(
                    t > tick for t in (inject or {})):
                break
            continue

        parsed = []
        for row in robots_rows + page_rows:
            raw, lat = index.get(row["url"], (SYNTH_404, 0))
            if row["is_robots"]:
                res.fetched.append({**row, "status": "robots", "text": raw})
                parsed.append((row, "robots", raw, -1, [], []))
            else:
                st, text, chash, _inter, links, errs = parse_one(
                    row["url"], row["depth"], raw, cfg, domains, forb, (),
                    row.get("cookie"), lat)
                parsed.append((row, st, text, chash, links, errs))

        # deterministic order: (tick, ip, robots-first, sub)
        parsed.sort(key=lambda t: (t[0]["tick"], t[0]["ip"],
                                   0 if t[0]["is_robots"] else 1, t[0]["sub"]))

        # content-dup resolution in fetch order (file.cxx:583-588)
        candidates: list[UrlRec] = []
        for row, st, text, chash, links, errs in parsed:
            if st == "robots":
                continue
            for e in errs:
                res.answers[e] += 1
            if st == "success" and dup is not None and not dup.test_set(chash):
                st, text, links = "duplicate", b"", []
            res.answers[st] += 1
            res.fetched.append({**row, "status": st,
                                "text": text if st == "success" else b""})
            pkey = (row["tick"], row["ip"], 1, row["sub"])
            for d in links:
                prio = 0  # priority routing (specificSearch) sorts first
                if cfg.specific_search and cfg.privileged_exts:
                    from larbin_ray.kernels.textutil import match_priv_ext
                    if match_priv_ext(d["file"], tuple(e.encode() for e in cfg.privileged_exts)):
                        prio = -1
                candidates.append(UrlRec(d["host"], d["port"], d["file"], d["depth"],
                                         akey=(tick, prio) + pkey + (d["order"],),
                                         cookie=d.get("cookie")))

        # robots results apply at end of tick
        for row, st, text, chash, links, errs in parsed:
            if st == "robots":
                core.robots_result(row["host"].encode("latin-1"), row["port"], text)

        # link admission, sequential in akey order
        candidates.sort(key=lambda r: r.akey)
        for rec in candidates:
            admit(rec)

        if cfg.limit_page and res.answers["success"] >= cfg.limit_page:
            break

    res.answers.update(core.answers)
    res.failures = list(core.failures)
    res.seen_indices = seen.set_indices()
    res.max_host_ram = core.max_host_ram
    return res
