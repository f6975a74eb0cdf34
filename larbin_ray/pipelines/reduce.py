"""Distributed high-cardinality reduces.

Ray Data's sort-based ``groupby().aggregate()`` pays ~1-3 ms of Python
per GROUP in the reduce stage (measured on Ray 2.49: 14k rows / 13k
groups -> 43 s; the hash-shuffle strategy has a ~20 s fixed cost and a
worker-spawn spiral on a single node).  That makes it unusable for
high-cardinality keys (content hashes, candidate pairs, doc ids).

``hash_reduce`` is the scale-correct alternative: bucket rows by a
deterministic hash of the key columns (few buckets, sized to the data),
shuffle by bucket, and run a VECTORIZED pandas aggregation once per
bucket — one Python call per bucket instead of per group, C-speed
grouping inside.  Exactness: every row of a key lands in the same
bucket, so per-bucket aggregation over complete groups equals the
global aggregation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def hash_bucket(df: pd.DataFrame, keys: list[str], n_buckets: int) -> np.ndarray:
    """Deterministic per-row bucket from the key columns.  Uses pandas'
    fixed-key siphash (stable across processes — builtin hash() is
    per-process randomized and would scatter a key over buckets)."""
    h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int64)


def hash_reduce(ds: rd.Dataset, keys: list[str], agg, n_buckets: int) -> rd.Dataset:
    """ds -> groupby(keys) via bucketed shuffle + per-bucket vectorized
    pandas ``agg(df) -> df``.  ``agg`` must aggregate by ``keys`` itself
    (pandas groupby) and must be algebraic (rows of one key always
    arrive complete within a bucket, never split)."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = hash_bucket(df, keys, n_buckets)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return agg(g.drop(columns=["_bucket"]))

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def task_parquet_exchange(path: str, columns: list[str], map_fn,
                          bucket_col: str, n_buckets: int, reduce_fn,
                          n_inputs: int | None = None) -> pd.DataFrame:
    """Small-corpus hash exchange on plain Ray tasks.

    Below ~10k-row shuffles, a Ray Data ``groupby(bucket).map_groups``
    pays ~0.5-1 s of fixed sort/stage cost per exchange (measured, see
    module docstring and MEMORY traps).  This runs the same bucketed
    data flow with raw tasks: ``n_inputs`` map tasks each read a slice
    of the parquet file, apply ``map_fn(df) -> df`` (which must attach
    ``bucket_col`` with values in [0, n_buckets)), and return one object
    per bucket; ``n_buckets`` reduce tasks apply ``reduce_fn`` over
    their bucket's concatenated rows; the driver concatenates the
    reduce outputs (bounded: callers use this path only under a
    documented corpus-size threshold — the Ray Data pipeline remains
    the scale path and tests assert both paths agree).

    Each map task re-reads the (small) file and slices rows
    ``[i*n/k, (i+1)*n/k)`` — no driver-side materialization of the
    input, no shared state."""
    import ray

    if n_inputs is None:
        from larbin_ray.pipelines import pool_size
        n_inputs = max(2, pool_size(frac=0.5, cap=16))

    @ray.remote
    def map_split(i: int):
        import pyarrow.parquet as pq
        t = pq.read_table(path, columns=columns)
        n = t.num_rows
        lo, hi = i * n // n_inputs, (i + 1) * n // n_inputs
        out = map_fn(t.slice(lo, hi - lo).to_pandas())
        if n_buckets == 1:
            return out
        b = out[bucket_col].to_numpy()
        return tuple(out[b == j] for j in range(n_buckets))

    @ray.remote
    def reduce_bucket(*parts):
        return reduce_fn(pd.concat(parts, ignore_index=True))

    parts = [map_split.options(num_returns=n_buckets).remote(i)
             for i in range(n_inputs)]
    if n_buckets == 1:
        parts = [[p] for p in parts]
    outs = ray.get([reduce_bucket.remote(*[parts[i][b]
                                           for i in range(n_inputs)])
                    for b in range(n_buckets)])
    return pd.concat(outs, ignore_index=True)
