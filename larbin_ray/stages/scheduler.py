"""Scheduler shard actors — the distributed NamedSite/IPSite tier
(SURVEY.md §2.4 T3-T5).

Partitioning: a host is owned by the shard of its *politeness key* —
the resolved IP when DNS succeeds, else the host name.  The fixture DNS
is a pure function computable anywhere, so routing a candidate to its
shard requires no lookup round-trip; and because every host of a
registered domain maps to one IP, a shard owns complete politeness
queues (two hosts sharing an IP can never straddle shards — Larbin's
IPSite invariant, site.cxx:424-436).

Determinism: same barrier+sort protocol as the seen shards —
``submit_candidates`` buffers in any arrival order; ``pre_admit``
sorts by admission key and runs the initOK fast-fails sequentially;
``enqueue`` receives seen-survivors already sorted.  All dispatch rows
carry the global (tick, ip, sub) key, so the merged crawl order is
independent of shard count and CPU count.
"""

from __future__ import annotations

import zlib

import ray

from larbin_ray.config import CrawlConfig
from larbin_ray.sources import dns as fixture_dns
from larbin_ray.state.sites import SchedulerCore, UrlRec

_SHARD_CACHE: dict[str, int] = {}


def shard_of_host(host: str, num_shards: int) -> int:
    """Politeness-key sharding; memoized per process (the fixture DNS
    hash is pure but not free)."""
    hit = _SHARD_CACHE.get(host)
    if hit is None:
        _status, ip = fixture_dns.resolve(host)
        key = ip if ip is not None else host
        hit = zlib.crc32(key.encode()) % max(num_shards, 1)
        _SHARD_CACHE[host] = hit
    return hit % max(num_shards, 1)


class SchedulerShardCore:
    """Testable core around a SchedulerCore partition."""

    def __init__(self, shard_id: int, cfg: CrawlConfig):
        self.shard_id = shard_id
        self.core = SchedulerCore(cfg)
        self._buffer: list[tuple] = []   # (akey, host, port, file, depth)

    def submit_candidates(self, rows: list[tuple]) -> None:
        self._buffer.extend(rows)

    def pre_admit(self) -> list[tuple]:
        """Barrier: sort by akey, run initOK fast-fails; return survivors
        as (akey, host, port, file, depth, hash)."""
        self._buffer.sort(key=lambda t: t[0])
        recs = [UrlRec(h, p, f, d, akey=k) for k, h, p, f, d, _hc in self._buffer]
        hashes = {id(r): hc for r, (_k, _h, _p, _f, _d, hc) in zip(recs, self._buffer)}
        survivors = self.core.pre_admit(recs)
        self._buffer = []
        return [(r.akey, r.host, r.port, r.file, r.depth, hashes[id(r)])
                for r in survivors]

    def enqueue(self, rows: list[tuple]) -> None:
        """rows: (akey, host, port, file, depth) sorted by akey."""
        self.core.enqueue([UrlRec(h, p, f, d, akey=k) for k, h, p, f, d in rows])

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
                "ips": len(self.core.ips)}


@ray.remote
class SchedulerShard(SchedulerShardCore):
    pass
