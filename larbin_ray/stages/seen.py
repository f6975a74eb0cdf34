"""Sharded bitset actors — the distributed form of Larbin's global
``hashTable seen`` / ``hashDup`` singletons (SURVEY.md §2.4 T1/T2).

Sharding is by ``code % num_shards``; shard ``k`` stores bit
``code // num_shards`` of a local bitset, so the global 64M-bit space
(or an 8-GB one at 10^10 scale) is partitioned with no overlap.  Two
colliding codes (same bit) always land in the same shard, so
first-wins resolution inside a shard is globally correct for ANY shard
count — which is what makes the crawl output independent of
parallelism.

Determinism protocol (the barrier+sort pattern): callers may send
candidate batches in any order during a tick; each batch carries sort
keys; ``resolve()`` at the tick barrier sorts everything buffered and
applies ``testSet`` sequentially.  Arrival order therefore never
influences which of two bit-colliding URLs survives.
"""

from __future__ import annotations

import numpy as np
import ray

from larbin_ray.config import HASH_SIZE
from larbin_ray.state.bitset import Bitset


class BitsetShardCore:
    """Testable core (the Ray actor below is a thin wrapper)."""

    def __init__(self, shard_id: int, num_shards: int, nbits: int = HASH_SIZE):
        self.shard_id = shard_id
        self.num_shards = num_shards
        local = (nbits + num_shards - 1) // num_shards
        local = ((local + 7) // 8) * 8          # whole bytes
        self.bitset = Bitset(local)
    def test_set_sorted(self, codes) -> np.ndarray:
        """Batch testSet in the caller's (admission-sorted) order.
        Vectorized: Bitset.test_set_many keeps first-occurrence-wins
        for duplicate codes within the batch, so this equals the
        sequential loop bit for bit.  Accepts list or ndarray; numpy
        in/out keeps the RPC payload zero-copy-picklable (a 500k-code
        tick costs ~ms, not the ~0.2 s of the Python loop + list)."""
        codes = np.asarray(codes, dtype=np.int64) // self.num_shards
        return self.bitset.test_set_many(codes)

    def test_set_merged(self, n_origin: int, payload_refs: list):
        """Decentralized admission merge: each payload ref (one per
        scheduler shard, read zero-copy from plasma) carries this seen
        shard's subset of that shard's survivors — key columns + hash +
        local index.  The subset is lexsorted by the global admission
        key (unique per tick, so the local sort equals the global order
        restricted to this shard's hash space), tested first-wins, and
        the verdicts are returned as per-origin (idx, verdict) slices —
        ``num_returns=1+n_origin`` at the call site routes each slice
        straight to its scheduler shard without driver data motion.
        First return is this shard's urlDup count for the batch."""
        import ray as _ray

        pays = _ray.get(list(payload_refs))
        counts = [len(p["hash"]) for p in pays]
        if sum(counts) == 0:
            empty = (np.empty(0, np.int64), np.empty(0, bool))
            return (0,) + tuple(empty for _ in range(n_origin))
        origin = np.repeat(np.arange(len(pays), dtype=np.int64), counts)
        cat = {k: np.concatenate([p[k] for p in pays])
               for k in ("prio", "ip_hi", "ip_lo", "sub", "order",
                         "hash", "idx")}
        g = np.lexsort((cat["order"], cat["sub"], cat["ip_lo"],
                        cat["ip_hi"], cat["prio"]))
        verd = self.test_set_sorted(cat["hash"][g])
        og, ig = origin[g], cat["idx"][g]
        parts = [(ig[og == sid], verd[og == sid]) for sid in range(n_origin)]
        return (int(len(verd) - verd.sum()), *parts)

    def set_many(self, codes) -> None:
        """Unconditional set (io/input.cxx:152 ``seen->set``): the
        test=0 input path marks urls seen without an admission
        verdict.  Accepts codes in submission order (no sortedness
        contract — a plain bitwise-or, no first-wins bookkeeping)."""
        codes = np.asarray(codes, dtype=np.int64) // self.num_shards
        self.bitset.set_many(codes)

    def global_indices(self) -> np.ndarray:
        return self.bitset.set_indices() * self.num_shards + self.shard_id

    def table_bytes(self) -> bytes:
        return self.bitset.table.tobytes()

    def load_table(self, b: bytes) -> None:
        self.bitset.table = np.frombuffer(b, dtype=np.uint8).copy()

    def load_codes(self, codes) -> None:
        """Restore from global bit indices (checkpoint resharding path).
        Vectorized set_many — the restore discards test verdicts, so the
        per-code Python test_set loop bought nothing but seconds of
        serial work per shard at design-scale seen sets."""
        codes = np.asarray(codes, dtype=np.int64) // self.num_shards
        self.bitset.set_many(codes)


@ray.remote
class BitsetShard(BitsetShardCore):
    pass


def gather_seen_indices(shards) -> np.ndarray:
    """Merge per-shard snapshots back into global sorted bit indices."""
    parts = ray.get([s.global_indices.remote() for s in shards])
    return np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
