"""Distributed connected components over an edge Dataset.

The cluster ops (textops.dedup_clusters, similarity.
embedding_dup_clusters) label transitive near-dup components.  Their
edge lists are the threshold-qualifying pair lists — bounded in normal
corpora, but QUADRATIC in component size, so a boilerplate-heavy corpus
(one mirrored page across 10^6 hosts) can explode them past one
machine.  Below ``CLUSTER_TASK_MAX_PAIRS`` the driver runs a plain
union-find over the materialized pairs (textops.cluster_pairs); above
it — or when ``force_path="distributed"`` — this module labels
components WITHOUT any driver-side O(pairs) structure.

Algorithm: iterative min-label propagation with label-link
shortcutting (hash-to-min style), two bucketed shuffles per round:

    label[x] := x
    repeat:  label[x] := min(label[x],
                             min_{(x,y) in E ∪ L} label[y])
    until the global label sum stops changing (labels only decrease,
    so an unchanged sum == a fixed point)

where L is the CURRENT label table read as edges (x <-> label[x]).
The label links double the propagation horizon every round (pointer
jumping), so convergence is O(log diameter) rounds, not O(diameter) —
a 10^6-doc boilerplate chain converges in ~20 rounds where plain
neighbor propagation would need 10^6.  Label values are always node
ids of the same component (they enter via edge endpoints), so the
links never cross components.

Every step is a ``map_batches`` + bucketed ``groupby(bucket)``
``map_groups`` with a vectorized pandas merge inside — one Python call
per bucket, C-speed joins inside, never a per-edge Python loop and
never a full edge list on the driver.  The final (node, label) table
is O(clustered nodes) — the same order as the result the cluster ops
already return by contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

# pairs above this threshold auto-select the distributed path; below
# it the driver union-find is strictly faster (a Ray Data shuffle has
# ~0.5-1 s fixed cost per round on a single node)
CLUSTER_TASK_MAX_PAIRS = 2_000_000

_MAX_ROUNDS = 64


def _bucket_of(vals: pd.Series, n_buckets: int) -> np.ndarray:
    """Deterministic bucket of an int64 node id (Fibonacci mixing,
    stable across processes — both sides of every join below must
    agree)."""
    mix = vals.to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((mix >> np.uint64(33)) % np.uint64(n_buckets)).astype(np.int64)


def connected_components(edges: rd.Dataset, col_a: str, col_b: str,
                         n_buckets: int = 16) -> pd.DataFrame:
    """Label the connected components of an undirected edge Dataset.

    Returns a pandas DataFrame (node, label) covering every node that
    appears in an edge, label = the component's min node id — the exact
    contract of textops.cluster_pairs, distributed.  ``edges`` may
    contain duplicates or both orientations; min() is idempotent."""

    # symmetrize once: (a,b) -> (a,b)+(b,a), so one join per round
    # covers both propagation directions.  The edge-row tag columns
    # (label=0, kind=0) are emitted here so the ONE materialized copy
    # is already join-ready — a separate tag_edges pass would hold a
    # second full copy of the symmetrized edge set alive for the whole
    # propagation loop.
    def sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df[col_a].to_numpy(dtype=np.int64)
        b = df[col_b].to_numpy(dtype=np.int64)
        out = pd.DataFrame({"src": np.concatenate([a, b]),
                            "dst": np.concatenate([b, a])})
        out["_bucket"] = _bucket_of(out["src"], n_buckets)
        out["label"] = np.int64(0)
        out["kind"] = np.int8(0)
        return out

    e_tagged = edges.map_batches(sym, batch_format="pandas").materialize()
    if e_tagged.count() == 0:
        return pd.DataFrame({"node": pd.array([], dtype="int64"),
                             "label": pd.array([], dtype="int64")})

    # initial labels: label[x] = x over the distinct nodes
    def init_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(df["src"].to_numpy(dtype=np.int64))
        out = pd.DataFrame({"node": u, "label": u})
        out["_bucket"] = _bucket_of(out["node"], n_buckets)
        return out

    def dedup_nodes(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False).agg(label=("label", "min"))

    labels = (e_tagged.map_batches(init_partial, batch_format="pandas")
              .groupby("_bucket").map_groups(dedup_nodes,
                                             batch_format="pandas")
              .materialize())
    prev_sum = labels.sum(on="label")

    def relabel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """One join bucket: edge rows (src,dst) x label rows (node=src,
        label) -> candidate labels keyed by dst, plus the label rows
        themselves (a node keeps its own label when no neighbor beats
        it).  Output is keyed by NODE for the min-reduce."""
        e = g.loc[g["kind"] == 0, ["src", "dst"]]
        l_ = g[g["kind"] == 1]
        m = e.merge(l_[["src", "label"]], on="src", how="left")
        out = pd.DataFrame({"node": m["dst"].to_numpy(dtype=np.int64),
                            "label": m["label"].to_numpy(dtype=np.int64)})
        own = pd.DataFrame({"node": l_["src"].to_numpy(dtype=np.int64),
                            "label": l_["label"].to_numpy(dtype=np.int64)})
        out = pd.concat([out, own], ignore_index=True)
        out["_b2"] = _bucket_of(out["node"], n_buckets)
        return out

    def min_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False).agg(label=("label", "min"))

    def tag_labels(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"src": df["node"].to_numpy(dtype=np.int64),
                            "dst": np.int64(0),
                            "_bucket": _bucket_of(df["node"], n_buckets),
                            "label": df["label"].to_numpy(dtype=np.int64),
                            "kind": np.int8(1)})
        return out

    def label_links(df: pd.DataFrame) -> pd.DataFrame:
        """The current labels as symmetric edges (pointer jumping)."""
        node = df["node"].to_numpy(dtype=np.int64)
        lab = df["label"].to_numpy(dtype=np.int64)
        nz = node != lab
        node, lab = node[nz], lab[nz]
        out = pd.DataFrame({"src": np.concatenate([node, lab]),
                            "dst": np.concatenate([lab, node])})
        out["_bucket"] = _bucket_of(out["src"], n_buckets)
        out["label"] = np.int64(0)
        out["kind"] = np.int8(0)
        return out

    for _ in range(_MAX_ROUNDS):
        cand = (e_tagged
                .union(labels.map_batches(label_links, batch_format="pandas"))
                .union(labels.map_batches(tag_labels, batch_format="pandas"))
                .groupby("_bucket")
                .map_groups(relabel_bucket, batch_format="pandas"))
        labels = (cand.groupby("_b2")
                  .map_groups(min_reduce, batch_format="pandas")
                  .materialize())
        cur_sum = labels.sum(on="label")
        if cur_sum == prev_sum:     # labels only decrease: fixed point
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components: no fixed point in {_MAX_ROUNDS} rounds")
    return (labels.to_pandas()[["node", "label"]]
            .astype({"node": "int64", "label": "int64"})
            .sort_values("node").reset_index(drop=True))


def cluster_df(pairs: rd.Dataset, col_a: str, col_b: str,
               force_path: str | None = None,
               n_buckets: int = 16) -> pd.DataFrame:
    """(node, label) component labels for a pair Dataset, auto-selecting
    the driver union-find below CLUSTER_TASK_MAX_PAIRS and the
    distributed min-label propagation above it.  ``force_path`` pins
    "driver" or "distributed" (parity tests)."""
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        # a column-less empty to_pandas() would KeyError below; zero
        # pairs means zero clustered nodes on either path
        return pd.DataFrame({"node": pd.array([], dtype="int64"),
                             "label": pd.array([], dtype="int64")})
    use_driver = (force_path == "driver"
                  or (force_path is None
                      and n_pairs <= CLUSTER_TASK_MAX_PAIRS))
    if use_driver:
        from larbin_ray.pipelines.textops import cluster_pairs
        df = pairs.to_pandas()
        lbl = cluster_pairs(df[col_a].to_numpy(), df[col_b].to_numpy())
        items = sorted(lbl.items())
        return pd.DataFrame({"node": pd.array([k for k, _ in items],
                                              dtype="int64"),
                             "label": pd.array([v for _, v in items],
                                               dtype="int64")})
    return connected_components(pairs, col_a, col_b, n_buckets)
