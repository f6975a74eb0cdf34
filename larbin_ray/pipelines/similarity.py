"""Similarity search over an embedding column (``embeddings(vec_id,
embedding list<float>, label)``).

- brute-force cosine top-k: numpy matmul per batch against a broadcast
  query matrix (``ray.put`` once, read per actor) — the baseline;
- IVF variant: k-means-ish coarse centroids (deterministic seed), probe
  the nearest ``nprobe`` cells — the 10^10-scale path where the matmul
  against everything is impossible;
- embedding near-dup: cosine > threshold pairs via the same broadcast.

All math in float64 with results rounded to 6 dp so the DuckDB oracle
(``list_cosine_similarity``) hashes identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def load_embeddings(sf_dir: str) -> rd.Dataset:
    from larbin_ray.pipelines.relational import _sized_read
    return _sized_read(f"{sf_dir}/embeddings.parquet")


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _to_matrix(col) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


class KnnScorer:
    """Actor-pool stage: holds the normalized query matrix (fetched from
    the object store once per actor)."""

    def __init__(self, queries_ref, k: int):
        qids, qmat = ray.get(queries_ref)
        self.qids = qids
        self.q = _normalize(qmat)           # (Q, D)
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy()
        m = _normalize(_to_matrix(df["embedding"]))     # (B, D)
        sims = self.q @ m.T                              # (Q, B)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            for bi in range(len(ids)):
                out_q.append(qid)
                out_n.append(ids[bi])
                out_s.append(sims[qi, bi])
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                             "sim": np.round(out_s, 6)})


def knn_bruteforce(sf_dir: str, n_queries: int = 5, k: int = 10,
                   concurrency: int | None = None) -> pd.DataFrame:
    """Top-k cosine neighbors of the first ``n_queries`` vectors
    (excluding self).  Per-batch partial scores -> driver-side top-k
    merge (the partials are tiny: Q x B rows pre-filtered to each
    batch's local top-k)."""
    ds = load_embeddings(sf_dir)
    head = ds.take(n_queries)
    qids = np.asarray([r["vec_id"] for r in head])
    qmat = _to_matrix([r["embedding"] for r in head])
    queries_ref = ray.put((qids, qmat))

    from larbin_ray.pipelines import pool_size
    scored = ds.map_batches(KnnScorer, fn_constructor_args=(queries_ref, k),
                            batch_format="pandas", concurrency=concurrency or pool_size(),
                            batch_size=1024)
    all_scores = scored.to_pandas()
    all_scores = all_scores[all_scores["query_id"] != all_scores["neighbor_id"]]
    top = (all_scores.sort_values(["query_id", "sim", "neighbor_id"],
                                  ascending=[True, False, True])
           .groupby("query_id").head(k).reset_index(drop=True))
    return top[["query_id", "neighbor_id", "sim"]]


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.45,
                        concurrency: int = 4) -> pd.DataFrame:
    """(id_a, id_b, sim) for cosine >= threshold, id_a < id_b.  The full
    matrix is broadcast (small side); each batch scores itself against
    it — at scale, replace the broadcast with LSH bucketing (below)."""
    ds = load_embeddings(sf_dir)
    full = ds.to_pandas()
    ids = full["vec_id"].to_numpy()
    mat = _normalize(_to_matrix(full["embedding"]))
    ref = ray.put((ids, mat))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_mat = ray.get(ref)
        m = _normalize(_to_matrix(df["embedding"]))
        bids = df["vec_id"].to_numpy()
        sims = m @ all_mat.T
        a, b, s = [], [], []
        for i in range(len(bids)):
            js = np.nonzero(sims[i] >= threshold)[0]
            for j in js:
                if bids[i] < all_ids[j]:
                    a.append(bids[i])
                    b.append(all_ids[j])
                    s.append(round(float(sims[i, j]), 6))
        return pd.DataFrame({"id_a": pd.array(a, dtype="int64"),
                             "id_b": pd.array(b, dtype="int64"),
                             "sim": pd.array(s, dtype="float64")})

    out = ds.map_batches(score, batch_format="pandas",
                         batch_size=1024).to_pandas()
    if out.empty:
        return pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                             "id_b": pd.array([], dtype="int64"),
                             "sim": pd.array([], dtype="float64")})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


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
    """Actor-pool stage: holds centroids + per-query probe sets; each
    batch assigns its vectors to cells and scores only the vectors that
    fall in a probed cell (the pruning that makes IVF the 10^10-scale
    path — per-batch work drops by ~(1 - nprobe/n_cells))."""

    def __init__(self, state_ref):
        self.cent, self.qids, self.q, self.probe = ray.get(state_ref)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy()
        m = _normalize(_to_matrix(df["embedding"]))
        assign = np.argmax(m @ self.cent.T, axis=1)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            mask = np.isin(assign, self.probe[qi]) & (ids != qid)
            if not mask.any():
                continue
            sims = m[mask] @ self.q[qi]
            out_q.extend([qid] * int(mask.sum()))
            out_n.extend(ids[mask].tolist())
            out_s.extend(np.round(sims, 6).tolist())
        return pd.DataFrame({"query_id": pd.array(out_q, dtype="int64"),
                             "neighbor_id": pd.array(out_n, dtype="int64"),
                             "sim": pd.array(out_s, dtype="float64")})


def knn_ivf(sf_dir: str, n_queries: int = 5, k: int = 10, n_cells: int = 16,
            nprobe: int = 4) -> pd.DataFrame:
    """IVF-style ANN as a Ray Data pipeline: centroids trained on a
    driver-side sample (small), then an actor-pool map_batches stage
    assigns+prunes+scores per batch against the broadcast (centroids,
    queries, probe sets); the driver merges only the pruned partial
    scores into top-k."""
    from larbin_ray.pipelines import pool_size

    ds = load_embeddings(sf_dir)
    sample = ds.take(2048)          # centroid training sample
    smat = _normalize(_to_matrix([r["embedding"] for r in sample]))
    cent = ivf_build_centroids(smat, n_cells)
    head = sample[:n_queries]
    qids = np.asarray([r["vec_id"] for r in head])
    q = _normalize(_to_matrix([r["embedding"] for r in head]))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    state_ref = ray.put((cent, qids, q, probe))

    scored = ds.map_batches(IvfScorer, fn_constructor_args=(state_ref,),
                            batch_format="pandas", batch_size=1024,
                            concurrency=pool_size()).to_pandas()
    top = (scored.sort_values(["query_id", "sim", "neighbor_id"],
                              ascending=[True, False, True])
           .groupby("query_id").head(k).reset_index(drop=True))
    return top[["query_id", "neighbor_id", "sim"]]
