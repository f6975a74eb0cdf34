"""Relational-shaped pipelines: the crawl engine's aggregate surfaces
(answers histogram analog, the K4 stats-sink page-size histogram,
windowed event rollups) plus join/sort/limit demonstrations over the
TPC-H-ish tables.  Everything is Ray Data with pre-aggregation before
the shuffle and broadcast for small join sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum


def _read(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    return _sized_read(f"{sf_dir}/{table}.parquet", columns)

def _sized_read(path: str, columns=None, min_blocks: int | None = None) -> rd.Dataset:
    """read_parquet with a block count sized to the file (~8 MiB/block,
    min 2): the default splitting of small files into cpu-count blocks
    makes downstream groupby shuffles quadratically worse on a single
    node (64 tiny blocks -> 20s for a 100k-row window aggregate vs 3s
    at 4 blocks).  ``min_blocks``: stages feeding an actor pool pass the
    pool size here so the pool is never starved (a 2-block read into an
    8-actor map_batches launches only 2 tasks)."""
    import os as _os
    try:
        nb = max(2, min(32, _os.path.getsize(path) // (8 << 20) + 1))
    except OSError:
        nb = 4
    if min_blocks:
        nb = max(nb, min_blocks)
    return rd.read_parquet(path, columns=columns, override_num_blocks=int(nb))



def _table_rows(sf_dir: str, table: str) -> int:
    from larbin_ray.pipelines import table_rows
    return table_rows(sf_dir, table, default=100_000)


def _id_bucket(ids: pd.Series, n_buckets: int) -> np.ndarray:
    """Fibonacci-mixed shuffle bucket of an int id column.  A raw
    ``id % n`` collapses structured ids (stride sharing a factor with
    n) into few buckets — the skew the bucketing exists to avoid."""
    mix = ids.to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((mix >> np.uint64(33)) % np.uint64(n_buckets)).astype(np.int64)


def doc_count_by_lang_source(sf_dir: str) -> rd.Dataset:
    """groupby count — the crawl's answers[]-histogram analog
    (debug.h:104 -> results.groupby(status).count()).  Partial counts
    per batch; the shuffle moves one row per (lang, source) per batch."""
    ds = _read(sf_dir, "documents", ["lang", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("lang", "size"))

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby(["lang", "source"])
            .aggregate(Sum("n_docs", alias_name="n_docs")))


def page_size_histogram(sf_dir: str, bucket: int = 128) -> rd.Dataset:
    """The K4 stats sink (io/stats_user_output.cxx:48-62): page-size
    histogram with fixed-width buckets — counts + total bytes per
    bucket.  Pre-aggregated per batch before the tiny groupby."""
    ds = _read(sf_dir, "documents", ["n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        b = pc.floor(pc.divide(t["n_chars"], bucket)).cast(pa.int64())
        tt = pa.table({"bucket": b, "n_chars": t["n_chars"]})
        g = tt.group_by("bucket").aggregate(
            [("n_chars", "count"), ("n_chars", "sum")])
        return g.rename_columns(["bucket", "n_pages", "total_chars"])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("n_pages", alias_name="n_pages"),
                       Sum("total_chars", alias_name="total_chars")))


def events_tumbling_window(sf_dir: str, window_s: int = 3600) -> rd.Dataset:
    """Tumbling event-time window per event_type: count + sum(value).
    Windowing = epoch bucketing inside map_batches (no watermark needed
    for a closed batch input), then a small groupby."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        epoch_us = t["ts"].cast(pa.int64())
        w_us = window_s * 1_000_000
        # TRUE floor division: arrow's int64 divide truncates toward
        # zero (the old pc.floor was a no-op on the already-truncated
        # int), while the SQL oracle floors — pre-1970 timestamps would
        # land one window high
        q = pc.divide(epoch_us, w_us)
        r = pc.subtract(epoch_us, pc.multiply(q, w_us))
        q = pc.if_else(pc.less(r, 0), pc.subtract(q, 1), q)
        w = pc.multiply(q, w_us)
        tt = pa.table({"window_start_us": w, "event_type": t["event_type"],
                       "value": t["value"]})
        g = tt.group_by(["window_start_us", "event_type"]).aggregate(
            [("value", "count"), ("value", "sum")])
        return g.rename_columns(["window_start_us", "event_type",
                                 "n_events", "sum_value"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["window_start_us", "event_type"])
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("sum_value", alias_name="sum_value")))

    def round_val(t: pa.Table) -> pa.Table:
        # numpy round_half_away == DuckDB round(v*100)/100 bit-for-bit;
        # pyarrow's explicit round modes land 1 ulp off DuckDB's doubles
        from larbin_ray.pipelines import round_half_away
        return t.set_column(t.schema.get_field_index("sum_value"), "sum_value",
                            pa.array(round_half_away(
                                t["sum_value"].to_numpy(zero_copy_only=False),
                                2), pa.float64()))

    return out.map_batches(round_val, batch_format="pyarrow")


def sessionize_events(sf_dir: str, gap_s: int = 1800) -> rd.Dataset:
    """Session windows per user: a new session starts after a gap >
    ``gap_s``.  groupby(user) -> map_groups with sorted-within-group
    pandas logic (the documented Ray Data pattern for streaming-shaped
    state; ordering assumption: one group fits in memory)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    # bucket users (a few shuffle groups instead of one python
    # map_groups call per user); all events of a user land in one
    # bucket, so the per-user windowing inside the bucket is exact.
    # Bucket count derives from the data size (~10k events/bucket).
    from larbin_ray.pipelines.textops import shuffle_buckets
    n_buckets = shuffle_buckets(_table_rows(sf_dir, "events"),
                                rows_per_bucket=10_000)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = _id_bucket(df["user_id"], n_buckets)
        return df

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        gap = g.groupby("user_id")["ts"].diff().dt.total_seconds().fillna(np.inf)
        sid = (gap > gap_s).groupby(g["user_id"]).cumsum()
        agg = g.groupby([g["user_id"], sid]).agg(
            session_start=("ts", "min"), n_events=("ts", "size"),
            sum_value=("value", "sum")).reset_index(level=0)
        # unit-safe epoch: a bare astype('int64') yields the column's
        # NATIVE resolution (ns on an ns-typed input = 1000x the oracle)
        agg["session_start_us"] = (agg["session_start"]
                                   .astype("datetime64[us]").astype("int64"))
        from larbin_ray.pipelines import round_half_away
        agg["sum_value"] = round_half_away(agg["sum_value"], 2)
        return agg[["user_id", "session_start_us", "n_events", "sum_value"]]

    return (ds.map_batches(bucketize, batch_format="pandas")
            .groupby("bucket")
            .map_groups(sessions_bucket, batch_format="pandas")
            .select_columns(["user_id", "session_start_us", "n_events", "sum_value"]))


def top_users_by_value(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """sort + limit over a groupby sum (deterministic tie-break by
    user_id)."""
    ds = _read(sf_dir, "events", ["user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(
            total_value=("value", "sum"), n_events=("value", "size"))

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("user_id")
           .aggregate(Sum("total_value", alias_name="total_value"),
                      Sum("n_events", alias_name="n_events"))).to_pandas()
    from larbin_ray.pipelines import round_half_away
    agg["total_value"] = round_half_away(agg["total_value"], 2)
    agg = agg.sort_values(["total_value", "user_id"],
                          ascending=[False, True]).head(k)
    return agg.reset_index(drop=True)[["user_id", "total_value", "n_events"]]


def orders_by_segment(sf_dir: str) -> rd.Dataset:
    """Broadcast hash join: orders ⨝ customer (small side via ray.put,
    looked up inside map_batches — no shuffle; SURVEY.md §2.5), then
    count + revenue per market segment."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def join_partial(df: pd.DataFrame) -> pd.DataFrame:
        seg = ray.get(seg_ref)
        df["c_mktsegment"] = df["o_custkey"].map(seg)
        return df.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("o_totalprice", "size"),
            revenue=("o_totalprice", "sum"))

    out = (orders.map_batches(join_partial, batch_format="pandas")
           .groupby("c_mktsegment")
           .aggregate(Sum("n_orders", alias_name="n_orders"),
                      Sum("revenue", alias_name="revenue")))

    def round_rev(t: pa.Table) -> pa.Table:
        from larbin_ray.pipelines import round_half_away
        return t.set_column(t.schema.get_field_index("revenue"), "revenue",
                            pa.array(round_half_away(
                                t["revenue"].to_numpy(zero_copy_only=False),
                                2), pa.float64()))

    return out.map_batches(round_rev, batch_format="pyarrow")


def lineitem_pricing_summary(sf_dir: str, ship_cutoff: str = "1998-09-02") -> rd.Dataset:
    """TPC-H Q1-shaped: filter -> per-batch partial aggregation ->
    tiny groupby merge (the partial/combiner pattern: the shuffle moves
    one row per (flag,status) per batch, not 600k rows)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])
    cutoff = pd.Timestamp(ship_cutoff)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"] <= cutoff]
        # no empty-frame special case: the normal path yields a
        # correctly-TYPED empty aggregate (an object/float64 literal
        # frame here would hand Ray blocks with a mismatched schema)
        disc_price = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.assign(disc_price=disc_price).groupby(
            ["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            n_rows=("l_quantity", "size"))
        return g

    out = (ds.map_batches(partial, batch_format="pandas")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                      Sum("sum_base_price", alias_name="sum_base_price"),
                      Sum("sum_disc_price", alias_name="sum_disc_price"),
                      Sum("n_rows", alias_name="n_rows")))

    def round_cols(t: pa.Table) -> pa.Table:
        from larbin_ray.pipelines import round_half_away
        for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
            t = t.set_column(t.schema.get_field_index(c), c,
                             pa.array(round_half_away(
                                 t[c].to_numpy(zero_copy_only=False), 2),
                                 pa.float64()))
        return t

    return out.map_batches(round_cols, batch_format="pyarrow")


def events_asof_prev_error(sf_dir: str) -> rd.Dataset:
    """As-of join (the custom-operator class Ray Data lacks natively):
    for every event, the most recent 'error' event of the same user at
    or before it.  Expressed as groupby(user) -> sorted-group
    ``pd.merge_asof`` (the documented composition for as-of/range joins:
    partition by the equality key, order by time within the partition).
    Inner semantics — events before a user's first error are dropped —
    matching DuckDB's ASOF JOIN oracle.

    Bucketed like sessionize_events: users hash into a few shuffle
    buckets (one python call per bucket, not per user) and the whole
    bucket joins in ONE vectorized ``pd.merge_asof(..., by="user_id")``
    — the per-key as-of matching runs in C."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    from larbin_ray.pipelines.textops import shuffle_buckets
    n_buckets = shuffle_buckets(_table_rows(sf_dir, "events"),
                                rows_per_bucket=10_000)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df["bucket"] = _id_bucket(df["user_id"], n_buckets)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="stable")
        errors = g.loc[g["event_type"] == "error",
                       ["ts", "user_id", "event_id"]] \
                  .rename(columns={"event_id": "prev_error_id"})
        if errors.empty:
            return pd.DataFrame({"event_id": pd.array([], dtype="int64"),
                                 "prev_error_id": pd.array([], dtype="int64")})
        m = pd.merge_asof(g, errors, on="ts", by="user_id",
                          direction="backward", allow_exact_matches=True)
        m = m.dropna(subset=["prev_error_id"])
        return m[["event_id", "prev_error_id"]].astype("int64")

    return (ds.map_batches(bucketize, batch_format="pandas")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pandas")
            .select_columns(["event_id", "prev_error_id"]))
