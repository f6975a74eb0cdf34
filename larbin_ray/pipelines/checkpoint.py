"""Crawl checkpoint / resume (SURVEY.md §2.2 K6/K7, §2.1 S3/S4).

The reference persists its disk fifos and the URL-seen bitset on a
file-rotation cadence (persistent_fifo.cxx:201-216, hash_table.cxx:
78-88) and reloads them with ``--reload`` (global.cxx:137-146).  Here a
checkpoint is taken at a tick boundary and contains:

    <dir>/manifest.json               next_tick, answers, shard counts,
                                      lineage, and the live state dir
    <dir>/state-T/frontier/shard=K.parquet  IP queues + per-host pending
    <dir>/state-T/hosts/shard=K.parquet     dns state + robots cache
    <dir>/state-T/seen/shard=K.npy          URL-seen bitset partition
    <dir>/state-T/dup/shard=K.npy           content-dup partition (if on)
    <dir>/metrics.parquet             per-tick metrics rows (K8 equivalent)

Each checkpoint stages its data files into its own ``state-T`` dir and
publishes it with an atomic manifest swap, so a crash mid-checkpoint
can never corrupt the last good checkpoint; superseded state dirs are
garbage-collected after the swap.

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
    import shutil

    os.makedirs(ckpt_dir, exist_ok=True)
    # every checkpoint stages its data files into its OWN state dir and
    # publishes it via the atomic manifest swap below — overwriting the
    # previous checkpoint's files in place would let a crash mid-write
    # corrupt the last good checkpoint (truncated parquet, or a
    # frankenstate mixing two ticks), exactly the failure a checkpoint
    # exists to survive.  Superseded state dirs are removed AFTER the
    # swap.
    state = f"state-{next_tick}"
    sdir = f"{ckpt_dir}/{state}"
    if os.path.isdir(sdir):     # partial dir from a crashed attempt
        shutil.rmtree(sdir)
    for sub in ("frontier", "hosts", "seen", "dup"):
        os.makedirs(f"{sdir}/{sub}", exist_ok=True)
    tables = ray.get([s.checkpoint_tables.remote() for s in sched])
    for i, (frontier, hosts) in enumerate(tables):
        pq.write_table(frontier, f"{sdir}/frontier/shard={i}.parquet")
        pq.write_table(hosts, f"{sdir}/hosts/shard={i}.parquet")
    for i, b in enumerate(ray.get([s.table_bytes.remote() for s in seen])):
        np.save(f"{sdir}/seen/shard={i}.npy",
                np.frombuffer(b, dtype=np.uint8))
    if dup:
        for i, b in enumerate(ray.get([s.table_bytes.remote() for s in dup])):
            np.save(f"{sdir}/dup/shard={i}.npy",
                    np.frombuffer(b, dtype=np.uint8))
    if metrics_rows:
        tmp_m = f"{ckpt_dir}/metrics.parquet.tmp"
        pq.write_table(pa.Table.from_pylist(metrics_rows), tmp_m)
        os.replace(tmp_m, f"{ckpt_dir}/metrics.parquet")
    manifest = {
        "next_tick": next_tick,
        "state_dir": state,
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
    # GC superseded state dirs (best-effort: a failure here leaves
    # garbage, never corruption)
    for d in os.listdir(ckpt_dir):
        if d.startswith("state-") and d != state:
            shutil.rmtree(f"{ckpt_dir}/{d}", ignore_errors=True)


def state_path(ckpt_dir: str) -> str:
    """Directory holding the LIVE checkpoint's state files — the
    manifest's published state dir ("" reads a legacy flat layout).
    Every reader of frontier/hosts/seen/dup files must go through the
    manifest; globbing ckpt_dir directly would see superseded or
    in-progress state dirs."""
    with open(f"{ckpt_dir}/manifest.json") as f:
        return os.path.join(ckpt_dir, json.load(f).get("state_dir", ""))


def _gather_codes(npy_dir: str, old_n: int) -> np.ndarray:
    """Merge stored shard bitsets back into global bit indices (bit
    unpacking delegated to Bitset.set_indices — ONE home for the
    reference's LSB-first packing convention, hash_table.cxx)."""
    from larbin_ray.state.bitset import Bitset

    parts = []
    for i in range(old_n):
        b = Bitset(8)
        b.table = np.load(f"{npy_dir}/shard={i}.npy")
        parts.append(b.set_indices() * old_n + i)  # local index -> global code
    return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)


def restore_checkpoint(ckpt_dir: str, cfg, sched, seen, dup) -> dict:
    """Load a checkpoint into freshly created shard actors (any shard
    counts); returns the manifest."""
    from larbin_ray.stages.scheduler import route_host

    def route(h: bytes) -> int:
        return route_host(h, len(sched), cfg.punycode)

    with open(f"{ckpt_dir}/manifest.json") as f:
        manifest = json.load(f)
    # the dup config must match the checkpointing run: resuming with
    # page_no_duplicate flipped either finds no dup/ bitset files
    # (off -> on) or silently drops the content-dup state (on -> off),
    # so the resumed histogram would diverge with no error
    want_dup = manifest.get("page_no_duplicate")
    if want_dup is not None and want_dup != (dup is not None):
        raise ValueError(
            f"checkpoint was written with page_no_duplicate={want_dup}; "
            f"the resume config has page_no_duplicate={dup is not None} — "
            "the content-dup state cannot be reconciled across that change")
    # state files live in the manifest's state dir (atomic-publish
    # layout); "" reads a legacy flat checkpoint
    sdir = os.path.join(ckpt_dir, manifest.get("state_dir", ""))
    old_n = manifest["num_scheduler_shards"]
    frontier = pa.concat_tables(
        [pq.read_table(f"{sdir}/frontier/shard={i}.parquet")
         for i in range(old_n)])
    hosts = pa.concat_tables(
        [pq.read_table(f"{sdir}/hosts/shard={i}.parquet")
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
        codes = _gather_codes(f"{sdir}/{sub}", old)
        n = len(actors)
        futs = []
        for sid in range(n):
            # ship the ndarray itself (zero-copy through the object
            # store), not a pickled list of Python ints
            sel = codes[codes % n == sid]
            futs.append(actors[sid].load_codes.remote(sel))
        ray.get(futs)
    return manifest
