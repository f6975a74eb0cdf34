"""Crawl checkpoint / resume (SURVEY.md §2.2 K6/K7, §2.1 S3/S4).

The reference persists its disk fifos and the URL-seen bitset on a
file-rotation cadence (persistent_fifo.cxx:201-216, hash_table.cxx:
78-88) and reloads them with ``--reload`` (global.cxx:137-146).  Here a
checkpoint is taken at a tick boundary and contains:

    <dir>/manifest.json            next_tick, answers, shard counts, lineage
    <dir>/frontier/shard=K.parquet IP queues + per-host pending (ordered)
    <dir>/hosts/shard=K.parquet    dns state + robots cache per host
    <dir>/seen/shard=K.npy         URL-seen bitset partition
    <dir>/dup/shard=K.npy          content-dup bitset partition (if on)
    <dir>/metrics.parquet          per-tick metrics rows (K8 equivalent)

Restore re-routes every row by its politeness key, so the scheduler /
seen shard counts may change between runs (the cluster-resize story);
the tick-boundary semantics make the resumed crawl identical to an
uninterrupted one.  This is strictly stronger than the reference, which
loses its in-RAM site queues on crash (SURVEY.md §3.3).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


def write_checkpoint(ckpt_dir: str, next_tick: int, cfg, sched, seen, dup,
                     answers: dict, metrics_rows: list[dict],
                     failures: list[tuple] = (),
                     max_host_ram: int = 0) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    for sub in ("frontier", "hosts", "seen", "dup"):
        os.makedirs(f"{ckpt_dir}/{sub}", exist_ok=True)
    tables = ray.get([s.checkpoint_tables.remote() for s in sched])
    for i, (frontier, hosts) in enumerate(tables):
        pq.write_table(frontier, f"{ckpt_dir}/frontier/shard={i}.parquet")
        pq.write_table(hosts, f"{ckpt_dir}/hosts/shard={i}.parquet")
    for i, b in enumerate(ray.get([s.table_bytes.remote() for s in seen])):
        np.save(f"{ckpt_dir}/seen/shard={i}.npy",
                np.frombuffer(b, dtype=np.uint8))
    if dup:
        for i, b in enumerate(ray.get([s.table_bytes.remote() for s in dup])):
            np.save(f"{ckpt_dir}/dup/shard={i}.npy",
                    np.frombuffer(b, dtype=np.uint8))
    if metrics_rows:
        pq.write_table(pa.Table.from_pylist(metrics_rows),
                       f"{ckpt_dir}/metrics.parquet")
    manifest = {
        "next_tick": next_tick,
        "answers": dict(answers),
        # shard cores restart empty on resume, so the cumulative failure
        # log and the RAM high-water mark must ride in the manifest or a
        # resumed crawl silently loses the pre-checkpoint entries
        "failures": [list(f) for f in failures],
        "max_host_ram": int(max_host_ram),
        "num_scheduler_shards": len(sched),
        "num_seen_shards": len(seen),
        "page_no_duplicate": dup is not None,
        "lineage": {"engine": "larbin_ray", "kind": "tick-boundary checkpoint"},
    }
    tmp = f"{ckpt_dir}/manifest.json.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, f"{ckpt_dir}/manifest.json")   # atomic: last write wins


def _gather_codes(npy_dir: str, old_n: int) -> np.ndarray:
    """Merge stored shard bitsets back into global bit indices."""
    parts = []
    for i in range(old_n):
        table = np.load(f"{npy_dir}/shard={i}.npy")
        nz = np.flatnonzero(table).astype(np.int64)
        vals = table[nz]
        local = np.concatenate(
            [(nz[(vals & (1 << b)) != 0] << 3) + b for b in range(8)]) \
            if len(nz) else np.empty(0, np.int64)
        parts.append(local * old_n + i)    # local index -> global code
    return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)


def restore_checkpoint(ckpt_dir: str, cfg, sched, seen, dup) -> dict:
    """Load a checkpoint into freshly created shard actors (any shard
    counts); returns the manifest."""
    from larbin_ray.stages.scheduler import route_host

    def route(h: bytes) -> int:
        return route_host(h, len(sched), cfg.punycode)

    with open(f"{ckpt_dir}/manifest.json") as f:
        manifest = json.load(f)
    old_n = manifest["num_scheduler_shards"]
    frontier = pa.concat_tables(
        [pq.read_table(f"{ckpt_dir}/frontier/shard={i}.parquet")
         for i in range(old_n)])
    hosts = pa.concat_tables(
        [pq.read_table(f"{ckpt_dir}/hosts/shard={i}.parquet")
         for i in range(old_n)])
    n_new = len(sched)
    f_sids = [route(h) for h in frontier["host"].to_pylist()]
    h_sids = [route(h) for h in hosts["host"].to_pylist()]
    futs = []
    for sid in range(n_new):
        fmask = pa.array([s == sid for s in f_sids])
        hmask = pa.array([s == sid for s in h_sids])
        futs.append(sched[sid].restore.remote(frontier.filter(fmask),
                                              hosts.filter(hmask)))
    ray.get(futs)

    for actors, sub, old in ((seen, "seen", manifest["num_seen_shards"]),
                             (dup or [], "dup", manifest["num_seen_shards"])):
        if not actors:
            continue
        codes = _gather_codes(f"{ckpt_dir}/{sub}", old)
        n = len(actors)
        futs = []
        for sid in range(n):
            sel = codes[codes % n == sid]
            futs.append(actors[sid].load_codes.remote(sel.tolist()))
        ray.get(futs)
    return manifest
