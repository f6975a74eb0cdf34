"""Similarity search over an embedding column (``embeddings(vec_id,
embedding list<float>, label)``).

- brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (``ray.put`` once, read per actor), with REAL per-batch
  local top-k (``np.lexsort`` on the rounded sims) so the driver merge
  sees only Q x k rows per block, never Q x N;
- IVF variant: k-means-ish coarse centroids (deterministic seed), probe
  the nearest ``nprobe`` cells, per-batch top-k — the 10^10-scale path
  where the matmul against everything is impossible;
- embedding near-dup (exact): all block pairs scored by distributed Ray
  tasks over the materialized normalized blocks — O(N^2) compute but
  distributed and memory-bounded; no driver materialization of the
  embedding matrix and no full-matrix broadcast;
- embedding near-dup (LSH): random-hyperplane band bucketing with exact
  in-bucket verification — the 10^10-scale path (approximate recall;
  measured against the exact variant in tests/test_textops.py).

All math in float64 with results rounded to 6 dp so the DuckDB oracle
(``list_cosine_similarity``) hashes identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from larbin_ray.pipelines import round_half_away


def load_embeddings(sf_dir: str, min_blocks: int | None = None) -> rd.Dataset:
    from larbin_ray.pipelines.relational import _sized_read
    return _sized_read(f"{sf_dir}/embeddings.parquet", min_blocks=min_blocks)


def _normalize(m: np.ndarray) -> np.ndarray:
    """L2-normalize rows.  Documented contract deviation: a zero-norm
    embedding gets cosine 0.0 against everything (the common engine
    convention), where DuckDB's list_cosine_similarity yields NULL
    (which ORDER BY sim DESC sorts last) — on a corpus containing
    zero vectors the knn oracles would rank such rows differently.
    The fixture embeddings are all nonzero; callers feeding real data
    with zero vectors should filter them ahead of the scorer."""
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _to_matrix(col) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


def _topk_rows(qid: int, ids: np.ndarray, sims: np.ndarray, k: int):
    """Deterministic local top-k: order by (sim desc, neighbor_id asc)
    over the 6-dp-rounded sims — the same tie-break the global merge
    uses, so per-batch pruning never changes the final result."""
    order = np.lexsort((ids, -sims))[:k]
    return (np.full(len(order), qid, dtype=np.int64), ids[order], sims[order])


class KnnScorer:
    """Per-worker stage (pipelines.worker_stage): holds the normalized
    query matrix, fetched from the object store once per worker per run.
    Emits only each batch's local top-k per query (self-matches excluded
    batch-side)."""

    def __init__(self, queries_ref, k: int):
        qids, qmat = ray.get(queries_ref)
        self.qids = qids
        self.q = _normalize(qmat)           # (Q, D)
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy()
        m = _normalize(_to_matrix(df["embedding"]))     # (B, D)
        sims = round_half_away(self.q @ m.T, 6)          # (Q, B)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            mask = ids != qid
            q_col, n_col, s_col = _topk_rows(qid, ids[mask], sims[qi][mask], self.k)
            out_q.append(q_col)
            out_n.append(n_col)
            out_s.append(s_col)
        return pd.DataFrame({"query_id": np.concatenate(out_q),
                             "neighbor_id": np.concatenate(out_n),
                             "sim": np.concatenate(out_s)})


def _query_rows(sf_dir: str, n: int) -> tuple[np.ndarray, np.ndarray]:
    """The n smallest vec_ids + their embeddings — the SQL oracles pick
    queries with ORDER BY vec_id LIMIT n, so the engine must too (file
    row order is NOT contractually sorted even though the current
    fixture happens to be).  Reads the slim vec_id column to find the
    cutoff, then only the matching row groups."""
    import pyarrow.parquet as pq
    path = f"{sf_dir}/embeddings.parquet"
    ids = pq.read_table(path, columns=["vec_id"])["vec_id"].to_numpy()
    want = np.sort(ids)[:n]
    t = pq.read_table(path, columns=["vec_id", "embedding"],
                      filters=[("vec_id", "in", want.tolist())])
    df = t.to_pandas().sort_values("vec_id").reset_index(drop=True)
    return df["vec_id"].to_numpy(), _to_matrix(df["embedding"])


def knn_bruteforce(sf_dir: str, n_queries: int = 5, k: int = 10,
                   concurrency: int | None = None) -> pd.DataFrame:
    """Top-k cosine neighbors of the ``n_queries`` smallest vec_ids
    (excluding self).  Per-batch local top-k -> driver merge of the
    tiny Q x k x n_blocks partials.  ``concurrency`` now sets only the
    MINIMUM read block count (task-pool parallelism floor); the scorer
    runs on the shared task pool, not a dedicated actor pool."""
    from larbin_ray.pipelines import pool_size, worker_stage
    pool = concurrency or pool_size()
    ds = load_embeddings(sf_dir, min_blocks=pool)
    qids, qmat = _query_rows(sf_dir, n_queries)
    queries_ref = ray.put((qids, qmat))

    # task-pool + per-worker instance cache, not an actor pool: setup is
    # one object-store get of a tiny Q x D matrix (ms), while spinning a
    # fresh actor pool costs ~1-2 s and grows with CPU count (8 actors at
    # 32 CPUs) — the same trade that halved quality_scores in round 3.
    # The ref keys the cache, so a new run's state never aliases an old
    # instance on a long-lived worker.
    scored = ds.map_batches(
        lambda df: worker_stage(KnnScorer, queries_ref, k)(df),
        batch_format="pandas", batch_size=1024)
    partials = scored.to_pandas()       # Q x k x n_blocks rows only
    top = (partials.sort_values(["query_id", "sim", "neighbor_id"],
                                ascending=[True, False, True])
           .groupby("query_id").head(k).reset_index(drop=True))
    return top[["query_id", "neighbor_id", "sim"]]


# ---------------------------------------------------------------------------
# embedding near-dup — exact, distributed block-pair join


def _pack_block(t: pa.Table) -> pa.Table:
    """Normalize a batch of embeddings into a flat float64 list column
    (one object-store block of the pairwise join)."""
    m = _normalize(_to_matrix(t["embedding"].to_pylist()))
    return pa.table({
        "vec_id": t["vec_id"].cast(pa.int64()),
        "emb": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float64()), m.shape[1]),
    })


def _block_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].to_numpy()
    arr = t["emb"].combine_chunks()
    mat = arr.flatten().to_numpy().reshape(len(t), -1)
    return ids, mat


@ray.remote
def _score_block_pair(ta: pa.Table, tb: pa.Table, threshold: float,
                      same: bool) -> pa.Table:
    """One (block_i, block_j) tile of the pairwise cosine join."""
    ids_a, ma = _block_matrix(ta)
    ids_b, mb = _block_matrix(tb)
    sims = ma @ mb.T
    ii, jj = np.nonzero(sims >= threshold)
    if same:
        keep = ids_a[ii] < ids_b[jj]
    else:
        keep = ids_a[ii] != ids_b[jj]
    ii, jj = ii[keep], jj[keep]
    a, b = ids_a[ii], ids_b[jj]
    s = round_half_away(sims[ii, jj], 6)
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    return pa.table({"id_a": pa.array(a2, pa.int64()),
                     "id_b": pa.array(b2, pa.int64()),
                     "sim": pa.array(s, pa.float64())})


def _embedding_dup_tile_refs(sf_dir: str, threshold: float,
                             block_rows: int) -> list:
    """Launch the tiled cosine self-join; returns the tile-result REFS
    (qualifying-pair tables) without driver materialization — shared by
    the pair query (which ray.gets them: the pair list IS its result)
    and embedding_dup_clusters' distributed component path."""
    packed = load_embeddings(sf_dir).map_batches(
        _pack_block, batch_format="pyarrow", batch_size=block_rows)
    refs = packed.materialize().to_arrow_refs()
    futs = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            futs.append(_score_block_pair.remote(refs[i], refs[j],
                                                 threshold, i == j))
    return futs


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.45,
                        block_rows: int = 2048) -> pd.DataFrame:
    """(id_a, id_b, sim) for cosine >= threshold, id_a < id_b — exact.

    The embeddings are normalized + packed into object-store blocks by a
    map_batches stage; every (i, j<=i) block pair is scored by its own
    Ray task (a tiled cartesian self-join — the operator Ray Data can't
    express natively, so raw tasks per SURVEY custom-operator rule (c)).
    Compute is O(N^2) by definition of the exact op; memory per task is
    two blocks; the driver only ever holds the qualifying pairs.  For
    the sub-quadratic scale path see embedding_dup_pairs_lsh."""
    futs = _embedding_dup_tile_refs(sf_dir, threshold, block_rows)
    tiles = [t for t in ray.get(futs) if t.num_rows]
    if not tiles:
        return pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                             "id_b": pd.array([], dtype="int64"),
                             "sim": pd.array([], dtype="float64")})
    out = pa.concat_tables(tiles).to_pandas()
    # cross-block tiles score unordered (a,b) once; drop the mirrored
    # dup that appears when both orders land in one tile set
    out = out.drop_duplicates(["id_a", "id_b"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def embedding_dup_clusters(sf_dir: str, threshold: float = 0.45,
                           force_path: str | None = None) -> pd.DataFrame:
    """Transitive embedding near-dup clusters: connected components over
    the exact cosine pair list, (vec_id, cluster_id) with cluster_id =
    the component's min vec_id — the same closure dedup_clusters applies
    to the text pair list.  The tile-result refs feed the component
    labeler as a Dataset (``from_arrow_refs``) so the distributed path
    never brings the pair list to the driver; mirrored cross-tile
    duplicates are harmless (min-label is idempotent).  Path selection
    as in pipelines.components.cluster_df."""
    import ray.data as rd

    from larbin_ray.pipelines.components import cluster_df

    futs = _embedding_dup_tile_refs(sf_dir, threshold, block_rows=2048)
    lab = cluster_df(rd.from_arrow_refs(futs), "id_a", "id_b", force_path)
    return lab.rename(columns={"node": "vec_id", "label": "cluster_id"})


# ---------------------------------------------------------------------------
# embedding near-dup — random-hyperplane LSH (the 10^10-scale path)


class _HyperplaneBander:
    """Per-worker stage (pipelines.worker_stage): signs against a
    broadcast random-hyperplane
    matrix -> one row per (band, key) with the normalized vector riding
    along (the vector is shuffled once per band to its buckets)."""

    def __init__(self, planes_ref, bands: int, n_buckets: int):
        self.R = ray.get(planes_ref)          # (planes, D)
        self.bands = bands
        self.rows = self.R.shape[0] // bands
        self.n_buckets = n_buckets

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from larbin_ray.pipelines.textops import _mix_bucket
        ids = df["vec_id"].to_numpy()
        m = _normalize(_to_matrix(df["embedding"]))
        bits = (m @ self.R.T) > 0                     # (B, planes)
        n = len(ids)
        out = []
        for b in range(self.bands):
            chunk = bits[:, b * self.rows:(b + 1) * self.rows]
            key = np.packbits(chunk, axis=1)
            key = key @ (np.uint64(256) ** np.arange(key.shape[1], dtype=np.uint64))
            key = key.astype(np.int64)
            band = np.full(n, b, dtype=np.int64)
            out.append(pd.DataFrame({
                "band": band, "key": key, "vec_id": ids,
                "bucket": _mix_bucket(band, key, self.n_buckets),
                "emb": list(m)}))
        return pd.concat(out, ignore_index=True)


def _verify_bucket(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Exact cosine verification inside one shuffle bucket."""
    g = g[g.duplicated(["band", "key"], keep=False)]
    out = []
    for _, grp in g.groupby(["band", "key"], sort=False):
        ids = grp["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        keep = np.concatenate(([True], ids[1:] != ids[:-1]))
        sel = order[keep]
        ids = grp["vec_id"].to_numpy()[sel]
        if len(ids) < 2:
            continue
        m = np.stack(grp["emb"].to_numpy()[sel])
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        ok = sims[ia, ib] >= threshold
        ia, ib = ia[ok], ib[ok]
        a, b = ids[ia], ids[ib]
        swap = a > b
        out.append(pd.DataFrame({
            "id_a": np.where(swap, b, a),
            "id_b": np.where(swap, a, b),
            "sim": round_half_away(sims[ia, ib], 6)}))
    if not out:
        return pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                             "id_b": pd.array([], dtype="int64"),
                             "sim": pd.array([], dtype="float64")})
    return pd.concat(out, ignore_index=True)


def embedding_dup_pairs_lsh(sf_dir: str, threshold: float = 0.7,
                            planes: int = 128, bands: int = 32,
                            concurrency: int | None = None) -> pd.DataFrame:
    """Near-dup pairs via random-hyperplane LSH: band signatures ->
    groupby(bucket) shuffle (each vector moves once per band) -> exact
    in-bucket cosine verification -> groupby(pair) dedupe.  Approximate:
    recall vs the exact join is 1 - (1 - p^r)^b with p = 1 - theta/pi;
    the defaults give >0.99 for cosine >= 0.7.  Deterministic planes
    (fixed seed) so results are stable across runs and workers.
    ``concurrency`` now sets only the MINIMUM read block count (the
    bander runs on the shared task pool)."""
    from larbin_ray.pipelines import pool_size
    from larbin_ray.pipelines.relational import _table_rows
    from larbin_ray.pipelines.textops import shuffle_buckets

    n_rows = _table_rows(sf_dir, "embeddings")
    n_buckets = shuffle_buckets(n_rows * bands)
    pool = concurrency or pool_size()

    ds = load_embeddings(sf_dir, min_blocks=pool)
    dim = len(ds.take(1)[0]["embedding"])
    rng = np.random.RandomState(20240817)
    planes_ref = ray.put(rng.standard_normal((planes, dim)))

    from larbin_ray.pipelines.reduce import hash_reduce

    # task-pool + per-worker cache (see knn_bruteforce note): the plane
    # matrix is planes x D floats, trivially re-fetched per worker
    from larbin_ray.pipelines import worker_stage
    banded = ds.map_batches(
        lambda df: worker_stage(_HyperplaneBander, planes_ref, bands,
                                n_buckets)(df),
        batch_format="pandas", batch_size=1024)
    pairs = (banded.groupby("bucket")
             .map_groups(lambda g: _verify_bucket(g, threshold),
                         batch_format="pandas"))
    out = hash_reduce(
        pairs, ["id_a", "id_b"],
        lambda df: df.groupby(["id_a", "id_b"], as_index=False).agg(
            sim=("sim", "min")),
        shuffle_buckets(n_rows)).to_pandas()
    if out.empty:
        return pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                             "id_b": pd.array([], dtype="int64"),
                             "sim": pd.array([], dtype="float64")})
    return (out[["id_a", "id_b", "sim"]]
            .astype({"id_a": "int64", "id_b": "int64"})
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# IVF


def ivf_build_centroids(mat: np.ndarray, n_cells: int, iters: int = 5) -> np.ndarray:
    """Deterministic k-means (fixed seed, Lloyd iterations) over a
    sample — the coarse quantizer of the IVF index."""
    rng = np.random.RandomState(7)
    idx = rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)
    cent = mat[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class IvfScorer:
    """Per-worker stage (pipelines.worker_stage): holds centroids +
    per-query probe sets; each
    batch assigns its vectors to cells and scores only the vectors that
    fall in a probed cell (the pruning that makes IVF the 10^10-scale
    path), then keeps its local top-k per query."""

    def __init__(self, state_ref, k: int):
        self.cent, self.qids, self.q, self.probe = ray.get(state_ref)
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy()
        m = _normalize(_to_matrix(df["embedding"]))
        assign = np.argmax(m @ self.cent.T, axis=1)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            mask = np.isin(assign, self.probe[qi]) & (ids != qid)
            if not mask.any():
                continue
            sims = round_half_away(m[mask] @ self.q[qi], 6)
            q_col, n_col, s_col = _topk_rows(qid, ids[mask], sims, self.k)
            out_q.append(q_col)
            out_n.append(n_col)
            out_s.append(s_col)
        if not out_q:
            return pd.DataFrame({"query_id": pd.array([], dtype="int64"),
                                 "neighbor_id": pd.array([], dtype="int64"),
                                 "sim": pd.array([], dtype="float64")})
        return pd.DataFrame({"query_id": np.concatenate(out_q),
                             "neighbor_id": np.concatenate(out_n),
                             "sim": np.concatenate(out_s)})


def knn_ivf(sf_dir: str, n_queries: int = 5, k: int = 10, n_cells: int = 16,
            nprobe: int = 4) -> pd.DataFrame:
    """IVF-style ANN as a Ray Data pipeline: centroids trained on a
    driver-side sample (small), then a per-worker map_batches stage
    (pipelines.worker_stage on the shared task pool) assigns+prunes+
    scores per batch against the broadcast (centroids, queries, probe
    sets) and emits per-batch local top-k; the driver merges only
    Q x k x n_blocks pruned partials."""
    from larbin_ray.pipelines import pool_size

    pool = pool_size()
    ds = load_embeddings(sf_dir, min_blocks=pool)
    sample = ds.take(2048)          # centroid training sample
    smat = _normalize(_to_matrix([r["embedding"] for r in sample]))
    cent = ivf_build_centroids(smat, n_cells)
    qids, qmat = _query_rows(sf_dir, n_queries)   # ORDER BY vec_id LIMIT n
    q = _normalize(qmat)
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    state_ref = ray.put((cent, qids, q, probe))

    # task-pool + per-worker cache (see knn_bruteforce note): the IVF
    # state is a few KB, the actor-pool spin-up dominated the query
    from larbin_ray.pipelines import worker_stage
    scored = ds.map_batches(
        lambda df: worker_stage(IvfScorer, state_ref, k)(df),
        batch_format="pandas", batch_size=1024).to_pandas()
    top = (scored.sort_values(["query_id", "sim", "neighbor_id"],
                              ascending=[True, False, True])
           .groupby("query_id").head(k).reset_index(drop=True))
    return top[["query_id", "neighbor_id", "sim"]]
