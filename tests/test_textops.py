"""Training-data pipelines: dedup / text analysis / similarity over the
driver testdata at sf0.001 (sf0.01 is exercised by the driver gate)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_dedup_exact_matches_hash_path(ray_session):
    from larbin_ray.pipelines.textops import dedup_exact, dedup_exact_hash

    a = dedup_exact(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = dedup_exact_hash(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = b.astype(a.dtypes.to_dict())
    assert a.equals(b)
    assert a["n_copies"].sum() == 500


def test_minhash_finds_exact_dups(ray_session):
    """Exact duplicates have Jaccard 1.0 and must be found by LSH."""
    from larbin_ray.pipelines.textops import dedup_exact, minhash_dedup

    groups = dedup_exact(SF).to_pandas()
    dup_groups = groups[groups["n_copies"] > 1]
    pairs = minhash_dedup(SF, threshold=0.99)
    if len(dup_groups) > 0:
        assert len(pairs) >= 1
        assert (pairs["jaccard"] >= 0.99).all()


def test_minhash_deterministic(ray_session):
    from larbin_ray.pipelines.textops import minhash_dedup

    a = minhash_dedup(SF, threshold=0.7)
    b = minhash_dedup(SF, threshold=0.7)
    assert a.equals(b)


def test_simhash_pairs_symmetric_and_bounded(ray_session):
    from larbin_ray.pipelines.textops import simhash_dup_pairs

    p = simhash_dup_pairs(SF, max_hamming=3)
    assert (p["doc_a"] < p["doc_b"]).all()
    assert (p["hamming"] <= 3).all()


def test_token_stats_vs_python(ray_session):
    from larbin_ray.pipelines.textops import token_stats

    out = token_stats(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for _, row in docs.head(20).iterrows():
        assert out.loc[row["doc_id"], "n_tokens"] == len(row["text"].strip().split())


def test_lang_id_runs(ray_session):
    from larbin_ray.pipelines.textops import lang_id

    out = lang_id(SF).to_pandas()
    assert len(out) == 500
    assert set(out["pred_lang"]).issubset({"en", "de", "fr", "es", "zh"})


def test_knn_bruteforce_topk(ray_session):
    from larbin_ray.pipelines.similarity import knn_bruteforce

    out = knn_bruteforce(SF, n_queries=3, k=5)
    assert len(out) == 15
    # per-query sims are non-increasing
    for _, g in out.groupby("query_id"):
        sims = g["sim"].to_numpy()
        assert (np.diff(sims) <= 1e-9).all()
    assert (out["query_id"] != out["neighbor_id"]).all()


def test_knn_ivf_recall(ray_session):
    """IVF with nprobe=all cells must equal brute force; fewer probes
    must still recover most of the true top-k."""
    from larbin_ray.pipelines.similarity import knn_bruteforce, knn_ivf

    bf = knn_bruteforce(SF, n_queries=3, k=5)
    ivf_all = knn_ivf(SF, n_queries=3, k=5, n_cells=8, nprobe=8)
    assert bf[["query_id", "neighbor_id"]].reset_index(drop=True).equals(
        ivf_all[["query_id", "neighbor_id"]].reset_index(drop=True))
    ivf = knn_ivf(SF, n_queries=3, k=5, n_cells=8, nprobe=3)
    hits = len(set(map(tuple, bf[["query_id", "neighbor_id"]].values))
               & set(map(tuple, ivf[["query_id", "neighbor_id"]].values)))
    assert hits / len(bf) >= 0.5


def test_sessionize(ray_session):
    from larbin_ray.pipelines.relational import sessionize_events

    out = sessionize_events(SF).to_pandas()
    assert (out["n_events"] >= 1).all()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert out["n_events"].sum() == len(ev)


def test_curate_documents(ray_session):
    from larbin_ray.pipelines.textops import curate_documents, dedup_exact

    out = curate_documents(SF)
    keepers = set(dedup_exact(SF).to_pandas()["doc_id"])
    assert set(out["doc_id"]).issubset(keepers)
    assert (out["n_tokens"] >= 20).all() and (out["n_tokens"] <= 1000).all()
    assert (out["keep_reason"] == "keeper+quality").all()


def test_events_asof_prev_error(ray_session):
    from larbin_ray.pipelines.relational import events_asof_prev_error

    out = events_asof_prev_error(SF).to_pandas()
    assert len(out) > 0
    assert (out["prev_error_id"] >= 0).all()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    errors = ev[ev["event_type"] == "error"].set_index("event_id")
    # every matched prev_error is a real error event of the same user
    merged = out.merge(ev[["event_id", "user_id", "ts"]], on="event_id")
    for _, r in merged.head(50).iterrows():
        err = errors.loc[r["prev_error_id"]]
        assert err["event_type"] == "error"
        assert err["user_id"] == r["user_id"]
        assert err["ts"] <= r["ts"]


def test_simhash_matches_bruteforce(ray_session):
    """The distributed chunk-bucketed pipeline equals the exact all-pairs
    hamming join (pigeonhole: d<=3 pairs agree on one of 4 chunks)."""
    import numpy as np

    from larbin_ray.pipelines.textops import (_popcount64, simhash_dup_pairs,
                                              simhash_signatures)

    sigs = simhash_signatures(SF).to_pandas()
    vals = sigs["simhash"].to_numpy().view(np.uint64) + np.uint64(1 << 63)
    ids = sigs["doc_id"].to_numpy()
    ia, ib = np.triu_indices(len(ids), k=1)
    d = _popcount64(vals[ia] ^ vals[ib])
    ok = d <= 3
    exact = sorted(zip(np.minimum(ids[ia][ok], ids[ib][ok]),
                       np.maximum(ids[ia][ok], ids[ib][ok]), d[ok]))
    got = sorted(map(tuple, simhash_dup_pairs(SF, max_hamming=3).values))
    assert got == exact


def test_ngram_jaccard_matches_bruteforce(ray_session):
    from larbin_ray.pipelines.textops import _gram_hashes, ngram_jaccard_pairs

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    sets = {d: set(_gram_hashes(t, 3).tolist())
            for d, t in zip(docs["doc_id"], docs["text"])}
    ids = sorted(sets)
    exact = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            j = len(sa & sb) / (len(sa) + len(sb) - len(sa & sb))
            if j >= 0.5:
                exact.append((a, b, round(j, 6)))
    got = sorted(map(tuple, ngram_jaccard_pairs(SF).values))
    assert got == sorted(exact)


def test_cluster_pairs_unit():
    """Union-find semantics: transitive chains collapse, components are
    labeled by their min member, disjoint edges stay separate."""
    from larbin_ray.pipelines.textops import cluster_pairs

    # chain 5-3, 3-9 plus isolated pair 2-7: components {3,5,9} and {2,7}
    got = cluster_pairs([5, 3, 2], [3, 9, 7])
    assert got == {3: 3, 5: 3, 9: 3, 2: 2, 7: 2}
    assert cluster_pairs([], []) == {}
    # edge order / direction must not matter
    assert cluster_pairs([9, 3], [3, 5]) == {3: 3, 5: 3, 9: 3}


def test_dedup_clusters_matches_duckdb_closure(ray_session):
    """Exact value equality vs the recursive-CTE SQL oracle the driver
    runs (same compare: sorted rows, both columns)."""
    import duckdb

    import __ray_entry__ as entry
    from larbin_ray.pipelines.textops import dedup_clusters

    got = dedup_clusters(SF).sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    ref = (con.execute(entry.oracle_sql()["dedup_clusters"]).df()
           .astype("int64").sort_values("doc_id").reset_index(drop=True))
    assert not got.empty, "fixture corpus must contain near-dup pairs"
    # at least one transitive (size>2) component, or the closure is
    # vacuously the pair list
    assert (got.groupby("cluster_id").size() > 2).any()
    pd.testing.assert_frame_equal(got, ref)


def test_embedding_dup_clusters_matches_duckdb_closure(ray_session):
    import duckdb

    import __ray_entry__ as entry
    from larbin_ray.pipelines.similarity import embedding_dup_clusters

    got = embedding_dup_clusters(SF).sort_values("vec_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    ref = (con.execute(entry.oracle_sql()["embedding_dup_clusters"]).df()
           .astype("int64").sort_values("vec_id").reset_index(drop=True))
    assert not got.empty
    pd.testing.assert_frame_equal(got, ref)


def test_minhash_recall_vs_exact_jaccard(ray_session):
    """LSH candidates + exact verification: output pairs must be a
    subset of the exact-Jaccard pairs at the threshold, and recall on
    high-similarity pairs (j >= 0.8) must be high."""
    from larbin_ray.pipelines.textops import _shingle_hashes64, minhash_dedup

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    sets = {d: set(_shingle_hashes64(t).tolist())
            for d, t in zip(docs["doc_id"], docs["text"])}
    ids = sorted(sets)
    exact, high = set(), set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            j = len(sa & sb) / max(1, len(sa) + len(sb) - len(sa & sb))
            if j >= 0.7:
                exact.add((a, b))
            if j >= 0.8:
                high.add((a, b))
    got = set(map(tuple, minhash_dedup(SF, threshold=0.7)
                  [["doc_a", "doc_b"]].values))
    assert got <= exact                      # precision 1 (exact verify)
    if high:
        assert len(got & high) / len(high) >= 0.9


def test_embedding_lsh_recall(ray_session):
    """Deterministic-seed hyperplane LSH: precision 1 (exact in-bucket
    verify) and full recall on this data at threshold 0.45."""
    from larbin_ray.pipelines.similarity import (embedding_dup_pairs,
                                                 embedding_dup_pairs_lsh)

    exact = set(map(tuple, embedding_dup_pairs(SF, threshold=0.45)
                    [["id_a", "id_b"]].values))
    lsh = set(map(tuple, embedding_dup_pairs_lsh(SF, threshold=0.45)
                  [["id_a", "id_b"]].values))
    assert lsh == exact


def test_hash_reduce_equals_pandas_groupby(ray_session):
    """Property: the bucketed distributed reduce equals a plain pandas
    groupby for any key distribution (including heavy skew) and any
    bucket count — the exactness invariant every dedup pipeline rests
    on (rows of one key never split across buckets)."""
    import ray.data as rd

    from larbin_ray.pipelines.reduce import hash_reduce

    rng = np.random.RandomState(11)
    for nkeys, nbuckets in ((7, 3), (1000, 8), (5000, 64)):
        df = pd.DataFrame({
            "k": rng.zipf(1.5, 4000) % nkeys,        # skewed keys
            "k2": rng.randint(0, 3, 4000),
            "v": rng.randint(0, 100, 4000),
        })
        expect = df.groupby(["k", "k2"], as_index=False).agg(
            s=("v", "sum"), mn=("v", "min"), n=("v", "size"))
        got = hash_reduce(
            rd.from_pandas(df).repartition(5),
            ["k", "k2"],
            lambda g: g.groupby(["k", "k2"], as_index=False).agg(
                s=("v", "sum"), mn=("v", "min"), n=("v", "size")),
            nbuckets).to_pandas()
        got = got.sort_values(["k", "k2"]).reset_index(drop=True)
        expect = expect.sort_values(["k", "k2"]).reset_index(drop=True)
        assert got.astype("int64").equals(expect.astype("int64")), (nkeys, nbuckets)


def test_minhash_task_and_data_paths_agree(ray_session):
    """The small-corpus task exchange and the Ray Data scale path are
    the same algorithm over different substrates: identical output,
    including at the graded 64x32 banding config."""
    from larbin_ray.pipelines.textops import minhash_dedup

    for nh, b in ((32, 8), (64, 32)):
        t = minhash_dedup(SF, num_hashes=nh, bands=b, force_path="tasks")
        d = minhash_dedup(SF, num_hashes=nh, bands=b, force_path="data")
        assert t.equals(d), (nh, b, len(t), len(d))


def test_fixture_whitespace_class():
    """Engine tokenizers use Python \\s (also matches \\x0b, \\x1c-\\x1f,
    Unicode spaces); the SQL oracles use RE2 \\s = [\\t\\n\\f\\r ].  The
    value-exact claims hold because fixture texts stay inside the shared
    class -- assert that, so a fixture change fails here instead of as a
    silent oracle divergence."""
    import re

    import pyarrow.parquet as pq

    exotic = re.compile("[\x0b\x1c-\x1f\x85\xa0\u2000-\u200a\u2028"
                        "\u2029\u202f\u205f\u3000\u1680]")
    for sf in ("0.001", "0.01", "0.1"):
        texts = pq.read_table(f"/root/testdata/sf{sf}/documents.parquet",
                              columns=["text"])["text"].to_pylist()
        assert not any(exotic.search(t) for t in texts), sf


def test_curate_paths_agree(ray_session):
    """Broadcast keeper filter and bucketed cogroup produce identical
    curated output."""
    from larbin_ray.pipelines.textops import curate_documents

    a = curate_documents(SF, force_path="broadcast")
    b = curate_documents(SF, force_path="cogroup")
    assert a.equals(b), (len(a), len(b))


def test_connected_components_distributed_unit(ray_session):
    """Min-label propagation over an edge Dataset: a long chain (many
    propagation rounds, nodes scattered across shuffle buckets), a
    separate component, dup/mirrored edges, self-contained ids."""
    import ray.data as rd

    from larbin_ray.pipelines.components import connected_components
    from larbin_ray.pipelines.textops import cluster_pairs

    # chain 0-10-20-...-150 (diameter 15 forces >1 round), triangle
    # {1000,2000,3000}, mirrored + duplicate edges sprinkled in
    chain = [(i * 10, (i + 1) * 10) for i in range(15)]
    tri = [(1000, 2000), (2000, 3000), (3000, 1000)]
    edges = chain + tri + [(b, a) for a, b in chain[:4]] + tri[:2]
    df = pd.DataFrame({"a": [e[0] for e in edges],
                       "b": [e[1] for e in edges]})
    got = connected_components(rd.from_pandas(df), "a", "b", n_buckets=5)
    ref = sorted(cluster_pairs(df["a"].to_numpy(), df["b"].to_numpy()).items())
    assert list(map(tuple, got.values)) == ref

    # empty edge set
    empty = connected_components(
        rd.from_pandas(pd.DataFrame({"a": pd.array([], dtype="int64"),
                                     "b": pd.array([], dtype="int64")})),
        "a", "b")
    assert empty.empty


def test_dedup_clusters_paths_agree(ray_session):
    """The distributed component path must label exactly like the
    driver union-find on a fixture whose components span buckets."""
    from larbin_ray.pipelines.textops import dedup_clusters

    drv = dedup_clusters(SF, force_path="driver")
    dst = dedup_clusters(SF, force_path="distributed")
    pd.testing.assert_frame_equal(
        drv.sort_values("doc_id").reset_index(drop=True),
        dst.sort_values("doc_id").reset_index(drop=True))
    assert not drv.empty


def test_embedding_dup_clusters_paths_agree(ray_session):
    from larbin_ray.pipelines.similarity import embedding_dup_clusters

    drv = embedding_dup_clusters(SF, force_path="driver")
    dst = embedding_dup_clusters(SF, force_path="distributed")
    pd.testing.assert_frame_equal(
        drv.sort_values("vec_id").reset_index(drop=True),
        dst.sort_values("vec_id").reset_index(drop=True))
    assert not drv.empty


def test_connected_components_chain_shortcutting(ray_session, monkeypatch):
    """Label-link shortcutting makes rounds O(log diameter): a 40-node
    chain (diameter 39) must converge within 12 rounds — plain neighbor
    propagation would need 39 and hit the patched cap."""
    import ray.data as rd

    from larbin_ray.pipelines import components as C

    monkeypatch.setattr(C, "_MAX_ROUNDS", 12)
    n = 40
    df = pd.DataFrame({"a": np.arange(n - 1) * 7 + 3,
                       "b": np.arange(1, n) * 7 + 3})
    got = C.connected_components(rd.from_pandas(df), "a", "b", n_buckets=3)
    assert len(got) == n
    assert (got["label"] == 3).all()


def test_dedup_clusters_empty_pair_list(ray_session):
    """Zero qualifying pairs must yield an empty typed frame, not a
    KeyError off a column-less empty to_pandas() (round-5 review fix)."""
    from larbin_ray.pipelines.similarity import embedding_dup_clusters
    from larbin_ray.pipelines.textops import dedup_clusters

    got = dedup_clusters(SF, threshold=1.5)
    assert got.empty and list(got.columns) == ["doc_id", "cluster_id"]
    got_e = embedding_dup_clusters(SF, threshold=1.5)
    assert got_e.empty and list(got_e.columns) == ["vec_id", "cluster_id"]


def test_parameter_guards_and_empty_cogroup(ray_session):
    """r5 review findings: degenerate LSH parameters must raise instead
    of silently emitting incomplete (simhash radius > pigeonhole bound)
    or quadratic (zero rows per band) candidate sets; an all-filtered
    curate cogroup returns an empty TYPED frame instead of KeyError on
    the schema-less map_groups output."""
    from larbin_ray.pipelines.textops import (curate_documents,
                                              minhash_dedup,
                                              simhash_dup_pairs)

    with pytest.raises(ValueError, match="hamming"):
        simhash_dup_pairs(SF, max_hamming=4)
    with pytest.raises(ValueError, match="bands"):
        minhash_dedup(SF, num_hashes=32, bands=64)

    out = curate_documents(SF, min_tokens=10**9, force_path="cogroup")
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "n_tokens", "stop_ratio",
                                 "keep_reason"]


def test_tumbling_window_floors_pre_epoch(ray_session, tmp_path):
    """Window assignment is FLOOR division (the SQL oracle's floor()
    over double division): a pre-1970 timestamp lands in the window
    BELOW zero, not in window 0 (arrow int division truncates toward
    zero — r5 review finding)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from larbin_ray.pipelines.relational import events_tumbling_window

    ts = pa.array([-1_800_000_000, -3_600_000_001, 1_800_000_000, 0],
                  pa.timestamp("us"))
    tbl = pa.table({"ts": ts,
                    "event_type": pa.array(["a"] * 4),
                    "value": pa.array([1.0, 2.0, 3.0, 4.0])})
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = (events_tumbling_window(str(tmp_path)).to_pandas()
           .sort_values("window_start_us").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    ref = con.execute("""
        SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600000000 AS BIGINT)
                   AS window_start_us,
               event_type, count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY 1""").df()
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    assert got["window_start_us"].min() == -7_200_000_000
