"""Scheduler shard actors — the distributed NamedSite/IPSite tier
(SURVEY.md §2.4 T3-T5).

Partitioning: a host is owned by the shard of its *politeness key* —
the resolved IP when DNS succeeds, else the host name.  The fixture DNS
is a pure function computable anywhere, so routing a candidate to its
shard requires no lookup round-trip; and because every host of a
registered domain maps to one IP, a shard owns complete politeness
queues (two hosts sharing an IP can never straddle shards — Larbin's
IPSite invariant, site.cxx:424-436).

Determinism: barrier + sort — ``submit_links``/``prefeed_links``
buffer entries in any arrival order; ``pre_admit_links`` sorts by the
global admission key and runs the initOK fast-fails sequentially;
``pre_admit_split`` partitions the survivors' key/hash columns by
owning seen shard, each seen shard merge-sorts and tests its subset,
and ``apply_verdicts`` admits the seen-survivors in that order (the
driver only wires refs between the tiers).  All dispatch rows carry
the global (tick, ip, sub) key, so the merged crawl order is
independent of shard count and CPU count.
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import ray

from larbin_ray.config import CrawlConfig
from larbin_ray.sources import dns as fixture_dns
from larbin_ray.kernels.urlnorm import Url
from larbin_ray.state.sites import SchedulerCore, UrlRec

# one row per fetch the tick dispatches (robots + pages)
DISPATCH_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("host", pa.string()),
    ("port", pa.int32()),
    ("ip", pa.string()),
    ("depth", pa.int32()),
    ("is_robots", pa.bool_()),
    ("tick", pa.int32()),
    ("sub", pa.int32()),
    ("cookie", pa.binary()),
])

_CRC_CACHE: dict[str, int] = {}


def shard_of_host(host: str, num_shards: int) -> int:
    """Politeness-key sharding; memoized per process (the fixture DNS
    hash is pure but not free).  The cache stores the raw crc so the
    same process can serve crawls with different shard counts."""
    crc = _CRC_CACHE.get(host)
    if crc is None:
        _status, ip = fixture_dns.resolve(host)
        key = ip if ip is not None else host
        crc = zlib.crc32(key.encode())
        _CRC_CACHE[host] = crc
    return crc % max(num_shards, 1)


def route_host(host_b: bytes, num_shards: int, punycode: bool) -> int:
    """THE shard-routing function: punycode-normalize (site identity
    under cfg.punycode — url.cxx:474-482) then politeness-key shard.
    Every router (driver seed/injection path, parse-task candidate
    routing, checkpoint restore) must call this one helper — the
    IP-queue-locality invariant breaks if any copy drifts."""
    from larbin_ray.kernels.urlnorm import puny_host
    key = puny_host(host_b) if punycode else host_b
    return shard_of_host(key.decode("latin-1"), num_shards)


class SchedulerShardCore:
    """Testable core around a SchedulerCore partition."""

    def __init__(self, shard_id: int, cfg: CrawlConfig):
        self.shard_id = shard_id
        self.core = SchedulerCore(cfg)
        # buffered admission entries — the 12-tuple wire format
        # (prio, ip, sub, order, host, port, file, depth, hash,
        #  parent_ip, parent_sub, cookie); pre_admit_links hard-depends
        # on indices 0..11 (see submit_links docstring)
        self._buffer: list[tuple] = []
        self._surv_entries: list[tuple] = []   # last pre_admit survivors
        self._batch_tokens: set[str] = set()   # submit_links_once dedup
        self._ip_enc_cache: dict[str, tuple[int, int]] = {}  # ip -> int64 pair
        # cumulative seconds per admission-chain phase (diagnostics;
        # read via stats()["chain_t"] — negligible overhead)
        self._chain_t: dict[str, float] = {}

    def _clk(self, name: str, t0: float) -> None:
        import time
        self._chain_t[name] = (self._chain_t.get(name, 0.0)
                               + time.perf_counter() - t0)

    # ---- actor-to-actor link flow (no per-candidate driver work) ----
    # Parse tasks push link entries here directly (any arrival order
    # within a tick); at the tick barrier ``pre_admit_links`` sorts by
    # the global admission key (prio, ip, sub, order), drops candidates
    # whose parent page was a content-duplicate, runs the initOK
    # fast-fails, and keeps the survivors locally.  The seen-set phase
    # is actor-to-actor (pre_admit_split -> BitsetShard.test_set_merged
    # -> apply_verdicts below); the shard enqueues its own survivors
    # (each IP queue lives wholly in one shard, so local sorted order
    # == global order per queue).

    def submit_links(self, entries: list[tuple]) -> None:
        """entries: (prio, ip, sub, order, host, port, file, depth,
        hash, parent_ip, parent_sub, cookie)."""
        self._buffer.extend(entries)

    def submit_forced(self, entries: list[tuple]) -> int:
        """test=0 input-port submissions (io/input.cxx:152-159): no
        seen test, no fast-fail — straight to the site queues in
        submission order.  The caller sets the seen bits
        unconditionally in parallel (seen shards ``set_many``)."""
        recs = [UrlRec(e[4], e[5], e[6], e[7],
                       akey=(e[0], e[1], e[2], e[3]),
                       cookie=e[11], hc=e[8])
                for e in entries]
        self.core.enqueue(recs)
        return len(recs)

    def submit_links_once(self, token: str, entries: list[tuple]) -> None:
        """Idempotent variant for the Ray Data tick path: a map_batches
        task that dies after its submit ack but before its output
        commits is re-executed by Ray and would double-submit its
        candidates (inflating urlDup vs the oracle).  The token — the
        batch's first url hash, unique within a tick — makes the retry
        a no-op; the token set resets at the tick barrier.  (The
        micro-tick task path is naturally idempotent: entries travel as
        task RETURNS, which a re-execution replaces.)"""
        if token in self._batch_tokens:
            return
        self._batch_tokens.add(token)
        self._buffer.extend(entries)

    def submit_links_refs(self, refs: list) -> None:
        """Pull entry batches from the object store: each ref is this
        shard's own entries list, returned by a fetch+parse task as a
        dedicated per-shard task output — no producer ever blocks on
        this actor."""
        import time

        import ray as _ray
        t0 = time.perf_counter()
        for payload in _ray.get(refs):
            self._buffer.extend(payload)
        self._clk("prefeed", t0)

    def prefeed_links(self, refs: list) -> None:
        """Mid-wave entry delivery: the DRIVER forwards refs of tasks it
        has already seen complete (ray.wait), so the ray.get here never
        blocks — the deserialize+buffer cost runs in the shadow of the
        task wave instead of inside the admission barrier.  (Contrast
        the measured-negative variant where tasks streamed refs
        directly: actors then blocked on unfinished outputs and pinned
        workers.)  Per-submitter actor ordering puts every prefeed
        before the tick's pre_admit_links."""
        self.submit_links_refs(refs)

    def begin_tick(self, tick: int) -> tuple[list[dict], pa.Table, int]:
        """Dispatch rows leave the shard as an Arrow table: the python
        list -> pa.array conversion runs on the 8 shards in parallel and
        the driver's per-tick table build shrinks to a zero-copy
        concat_tables (measured ~2 s of serial driver work per 400k-page
        crawl before this)."""
        import time
        t0 = time.perf_counter()
        robots_rows = self.core.resolve_new_hosts(tick)
        page_cols = self.core.dispatch_columns(tick)
        page_tbl = pa.table({n: pa.array(page_cols[n],
                                         DISPATCH_SCHEMA.field(n).type)
                             for n in DISPATCH_SCHEMA.names})
        self._clk("begin_tick", t0)
        return robots_rows, page_tbl, self.core.queued_count()

    def pre_admit_links(self, dup_parents: list[tuple],
                        robots_items: list[tuple] = ()) -> dict:
        """Fused tick barrier: apply robots results, then sort +
        fast-fail (fewer RPC round-trips per tick; robots MUST apply
        before the fast-checks, matching the oracle's end-of-tick
        order).  Entry refs were already delivered mid-wave by
        prefeed_links.

        This is the vectorized twin of ``SchedulerCore.pre_admit`` (the
        serial executable spec the oracle runs): the sort is a numpy
        lexsort over dense-ranked parent-ip keys, the initOK fast-fails
        run over the raw entry tuples with a per-tick (host, port)
        state memo (state is frozen for the duration of the barrier —
        robots results applied above, nothing else mutates host state
        mid-call), and ``UrlRec`` objects are built in
        ``enqueue_verdicts`` for ADMITTED entries only (~1/6 of
        candidates; links repeat across a site, so most die at the seen
        test).  Equality with the spec is enforced by
        ``tests/test_scheduler_parity.py`` fuzz parity plus the whole-crawl
        bit-exactness suite."""
        import time

        import numpy as np

        t0 = time.perf_counter()
        if robots_items:
            self.robots_results(list(robots_items))
        if dup_parents:
            dup = set(dup_parents)
            buf = [e for e in self._buffer if (e[9], e[10]) not in dup]
        else:               # no dup parents this tick: skip the O(buffer) pass
            buf = self._buffer
        self._buffer = []
        self._batch_tokens.clear()
        n = len(buf)
        if n == 0:
            self._surv_entries = []
            empty = np.empty(0, dtype=np.int64)
            return {k: empty for k in ("prio", "ip_hi", "ip_lo",
                                       "sub", "order", "hash")}
        # columnar views of the entry tuples (one C pass each); entries
        # are the 12-tuple wire format, so indices 0..10 always exist
        cols = list(zip(*buf))
        prio = np.fromiter(cols[0], np.int64, n)
        sub = np.fromiter(cols[2], np.int64, n)
        order = np.fromiter(cols[3], np.int64, n)
        psub = np.fromiter(cols[10], np.int64, n)
        hashes = np.fromiter(cols[8], np.int64, n)
        # parent-ip sort key: dense rank over the tick's DISTINCT parent
        # ips (a handful per tick) — rank order == string order, which
        # the 16-byte big-endian int-pair encoding below also preserves
        # (dotted quads are <= 15 ASCII bytes), so the local lexsort,
        # the seen shards' global lexsort, and the old per-tuple string
        # sort all agree.
        enc = self._ip_enc_cache
        uniq = sorted(set(cols[1]))
        for ip in uniq:
            if ip not in enc:
                b = ip.encode("latin-1")[:16].ljust(16, b"\0")
                enc[ip] = (int.from_bytes(b[:8], "big"),
                           int.from_bytes(b[8:], "big"))
        rank_of = {ip: r for r, ip in enumerate(uniq)}
        ipr = np.fromiter((rank_of[ip] for ip in cols[1]), np.int64, n)
        hi_uniq = np.asarray([enc[ip][0] for ip in uniq], dtype=np.int64)
        lo_uniq = np.asarray([enc[ip][1] for ip in uniq], dtype=np.int64)
        g = np.lexsort((order, sub, ipr, prio))
        self._clk("pre_sort", t0)
        t0 = time.perf_counter()
        # initOK fast-fails (url.cxx:371-389) in global admission order.
        # Per-tick memo: (host, port) -> None (admit) | reason str |
        # robots list (state "done" with patterns: per-file test below).
        # parent_sub == -1 marks check()-path submissions (seeds and
        # input-port injections): they bypass the fast-fails, matching
        # the oracle's admit(skip_fast=True).
        core = self.core
        fast_state = core.fast_state
        answers = core.answers
        failures = core.failures
        from larbin_ray.kernels.robots import test_robots
        memo: dict[tuple, object] = {}
        fmemo: dict[tuple, bool] = {}
        keep = np.ones(n, dtype=bool)
        g_list = g.tolist()
        for j, i in enumerate(g_list):
            if psub[i] == -1:
                continue
            e = buf[i]
            key = (e[4], e[5])
            try:
                v = memo[key]
            except KeyError:
                v = fast_state(e[4], e[5])
                memo[key] = v
            if v is None:
                continue
            if type(v) is str:
                reason = v
            else:               # per-file robots test, memoized
                fkey = (e[4], e[5], e[6])
                r = fmemo.get(fkey)
                if r is None:
                    r = test_robots(e[6], v)
                    fmemo[fkey] = r
                if r:
                    continue
                reason = "fastRobots"
            keep[j] = False
            answers[reason] += 1
            failures.append((Url(e[4], e[5], e[6], e[7]).give_url()
                             .decode("latin-1"),
                             reason, (e[0], e[1], e[2], e[3])))
        sp = g[keep]            # survivor indices, global admission order
        sp_list = sp.tolist()
        self._surv_entries = [buf[i] for i in sp_list]
        self._clk("pre_admit", t0)
        # numpy key columns for the seen-shard merge (fast pickling +
        # C-speed lexsort there); per-survivor cost is pure fancy
        # indexing — the ip encode already ran once per DISTINCT ip.
        ipr_s = ipr[sp]
        return {
            "prio": prio[sp],
            "ip_hi": hi_uniq[ipr_s],
            "ip_lo": lo_uniq[ipr_s],
            "sub": sub[sp],
            "order": order[sp],
            "hash": hashes[sp],
        }

    def enqueue_verdicts(self, verdicts) -> int:
        """verdicts aligned with the last pre_admit_links survivors (local
        sorted order); enqueue the new ones.  UrlRec objects are built
        HERE, for admitted entries only."""
        new = [UrlRec(e[4], e[5], e[6], e[7], akey=(e[0], e[1], e[2], e[3]),
                      cookie=e[11], hc=e[8])
               for e, v in zip(self._surv_entries, verdicts) if v]
        self.core.enqueue(new)
        self._surv_entries = []
        return len(new)

    # ---- decentralized admission (sched -> seen -> sched, no driver
    # data motion): pre_admit_split partitions the survivors' key/hash
    # columns by their owning SEEN shard (hash % n_seen) as SEPARATE
    # task returns; each seen shard merges its subset across all
    # scheduler shards (BitsetShardCore.test_set_merged) and returns
    # per-origin verdict slices that apply_verdicts scatters back.
    # Correctness: the admission key (prio, parent-ip, sub, order) is
    # unique across a tick's candidates and two bit-colliding hash
    # codes always share hash % n_seen, so each seen shard's local
    # lexsort of its subset reproduces the global admission order
    # restricted to that subset — bit-identical to the old driver-side
    # global merge at any shard/CPU count.

    def pre_admit_split(self, dup_parents: list[tuple],
                        robots_items: list[tuple] = (), n_seen: int = 1):
        import numpy as np

        d = self.pre_admit_links(dup_parents, robots_items)
        idx = np.arange(len(d["hash"]), dtype=np.int64)
        mod = d["hash"] % n_seen
        outs = []
        for j in range(n_seen):
            sel = np.flatnonzero(mod == j)
            p = {k: v[sel] for k, v in d.items()}
            p["idx"] = idx[sel]
            outs.append(p)
        # with num_returns=n_seen the actor call maps each payload to
        # its own object; n_seen == 1 returns the single payload
        return tuple(outs) if n_seen > 1 else outs[0]

    def apply_verdicts(self, parts_refs: list) -> int:
        """Scatter the seen shards' verdict slices back onto the last
        pre_admit survivors and enqueue the new ones.  ``parts_refs``
        are refs to (idx, verdict) pairs — one per seen shard — read
        straight from plasma (zero-copy numpy)."""
        import time

        import numpy as np
        import ray as _ray

        t0 = time.perf_counter()
        v = np.zeros(len(self._surv_entries), dtype=bool)
        for idx, verd in _ray.get(list(parts_refs)):
            if len(idx):
                v[idx] = verd
        n = self.enqueue_verdicts(v)
        self._clk("apply", t0)
        return n

    def resolve_new_hosts(self, tick: int) -> list[dict]:
        return self.core.resolve_new_hosts(tick)

    def dispatch(self, tick: int) -> list[dict]:
        return self.core.dispatch(tick)

    def robots_results(self, results: list[tuple[bytes, int, bytes]]) -> None:
        for host, port, raw in results:
            self.core.robots_result(host, port, raw)

    def queued_count(self) -> int:
        return self.core.queued_count()

    def stats(self) -> dict:
        return {"answers": dict(self.core.answers),
                "failures": list(self.core.failures),
                "hosts": len(self.core.hosts),
                "ips": len(self.core.ips),
                "max_host_ram": self.core.max_host_ram,
                "overflow": len(self.core.overflow),
                "chain_t": dict(self._chain_t)}

    # ---- checkpoint / restore (SURVEY.md K6/K7, S3/S4) ----
    # The reference persists disk fifos + the seen bitset on a rotation
    # cadence (persistent_fifo.cxx:201-216, hash_table.cxx:78-88); here a
    # shard serializes its frontier (IP queues + per-host pending, with
    # positions) and its host table (dns state + robots patterns) as
    # Arrow tables the driver writes per-partition.  Restore re-routes by
    # the politeness key, so the shard count may change between runs.

    def checkpoint_tables(self):
        import pyarrow as _pa
        f_host, f_port, f_file, f_depth, f_ip, f_kind, f_pos, f_cookie = \
            [], [], [], [], [], [], [], []
        # akey + hc ride along: a restored rec that later FAILS (noDNS,
        # forbiddenRobots, recycle_overflow forget) logs (url, reason,
        # akey), so dropping the key would make a resumed crawl's
        # failure log diverge from an uninterrupted one's
        f_ak_prio, f_ak_pip, f_ak_sub, f_ak_order, f_hc = [], [], [], [], []

        def _rec_cols(rec, ip_str, kind, pos):
            f_host.append(rec.host)
            f_port.append(rec.port)
            f_file.append(rec.file)
            f_depth.append(rec.depth)
            f_ip.append(ip_str)
            f_kind.append(kind)
            f_pos.append(pos)
            f_cookie.append(rec.cookie)
            ak = rec.akey if len(rec.akey) == 4 else (0, "", 0, 0)
            f_ak_prio.append(int(ak[0]))
            f_ak_pip.append(str(ak[1]))
            f_ak_sub.append(int(ak[2]))
            f_ak_order.append(int(ak[3]))
            f_hc.append(int(rec.hc))

        for ip_str, st in self.core.ips.items():
            for pos, rec in enumerate(st.queue):
                _rec_cols(rec, ip_str, "queue", pos)
        for (hname, hport), h in self.core.hosts.items():
            for pos, rec in enumerate(h.pending):
                _rec_cols(rec, "", "pending", pos)
        for pos, rec in enumerate(self.core.overflow):
            _rec_cols(rec, "", "overflow", pos)
        frontier = _pa.table({
            "host": _pa.array(f_host, _pa.binary()),
            "port": _pa.array(f_port, _pa.int32()),
            "file": _pa.array(f_file, _pa.binary()),
            "depth": _pa.array(f_depth, _pa.int32()),
            "ip": _pa.array(f_ip, _pa.string()),
            "kind": _pa.array(f_kind, _pa.string()),
            "pos": _pa.array(f_pos, _pa.int64()),
            "cookie": _pa.array(f_cookie, _pa.binary()),
            "akey_prio": _pa.array(f_ak_prio, _pa.int64()),
            "akey_pip": _pa.array(f_ak_pip, _pa.string()),
            "akey_sub": _pa.array(f_ak_sub, _pa.int64()),
            "akey_order": _pa.array(f_ak_order, _pa.int64()),
            "hc": _pa.array(f_hc, _pa.int64()),
        })
        rank = {k: i for i, k in enumerate(self.core.unresolved)}
        hosts = _pa.table({
            "host": _pa.array([k[0] for k in self.core.hosts], _pa.binary()),
            "port": _pa.array([k[1] for k in self.core.hosts], _pa.int32()),
            "dns_state": _pa.array([h.dns_state for h in self.core.hosts.values()],
                                   _pa.string()),
            "ip": _pa.array([h.ip or "" for h in self.core.hosts.values()],
                            _pa.string()),
            "robots": _pa.array([list(h.robots) for h in self.core.hosts.values()],
                                _pa.list_(_pa.binary())),
            "robots_inflight": _pa.array(
                [h.robots_inflight for h in self.core.hosts.values()], _pa.bool_()),
            "unresolved_rank": _pa.array(
                [rank.get(k, -1) for k in self.core.hosts], _pa.int64()),
        })
        return frontier, hosts

    def restore(self, frontier, hosts) -> None:
        """Rebuild state from checkpoint tables (rows already filtered to
        this shard, any previous shard count)."""
        from larbin_ray.state.sites import HostState, IPState
        core = self.core
        ranked = sorted(
            zip(hosts["unresolved_rank"].to_pylist(), hosts["host"].to_pylist(),
                hosts["port"].to_pylist(), hosts["dns_state"].to_pylist(),
                hosts["ip"].to_pylist(), hosts["robots"].to_pylist(),
                hosts["robots_inflight"].to_pylist()),
            key=lambda t: (t[0] < 0, t[0]))
        for rank, hname, hport, dstate, hip, robots, inflight in ranked:
            if inflight:
                # a checkpoint is taken at a tick boundary, where no robots
                # fetch is in flight; defensively re-resolve if one ever is
                dstate, inflight = "wait", False
            h = HostState(hname, hport, dns_state=dstate, ip=hip or None,
                          robots=list(robots or []),
                          robots_inflight=False)
            core.hosts[(hname, hport)] = h
            if dstate == "wait":
                core.unresolved.append((hname, hport))
            if hip:
                core.ips.setdefault(hip, IPState())
        n_rows = frontier.num_rows
        cookies = frontier["cookie"].to_pylist() if "cookie" in frontier.column_names \
            else [None] * n_rows
        # akey/hc columns restore each rec's admission identity: a
        # restored rec that later fails must log the SAME (url, reason,
        # akey) tuple an uninterrupted run logs
        if "akey_prio" in frontier.column_names:
            akeys = list(zip(frontier["akey_prio"].to_pylist(),
                             frontier["akey_pip"].to_pylist(),
                             frontier["akey_sub"].to_pylist(),
                             frontier["akey_order"].to_pylist()))
            hcs = frontier["hc"].to_pylist()
        else:
            akeys = [()] * n_rows
            hcs = [0] * n_rows
        rows = sorted(zip(frontier["ip"].to_pylist(), frontier["pos"].to_pylist(),
                          frontier["kind"].to_pylist(), frontier["host"].to_pylist(),
                          frontier["port"].to_pylist(), frontier["file"].to_pylist(),
                          frontier["depth"].to_pylist(), cookies, akeys, hcs),
                      key=lambda t: t[:7])
        for ip_str, _pos, kind, hname, hport, file, depth, ck, ak, hc in rows:
            rec = UrlRec(hname, hport, file, depth, akey=ak, cookie=ck, hc=hc)
            if kind == "queue":
                core.ips.setdefault(ip_str, IPState()).queue.append(rec)
                h = core.hosts.get((core.site_key(hname), hport))
                if h is not None:
                    h.nburls += 1
            elif kind == "pending":
                # hosts dict keys are site_key'd (punycode form when
                # cfg.punycode); frontier rows carry the raw host, so the
                # lookup must key the same way as the enqueue side
                h = core.hosts[(core.site_key(hname), hport)]
                h.pending.append(rec)
                h.nburls += 1
            else:           # overflow (maxUrlsBySite wait fifo)
                core.overflow.append(rec)


@ray.remote
class SchedulerShard(SchedulerShardCore):
    pass
