"""Text-analysis + deduplication pipelines over a documents table
``(doc_id, text, lang, source, n_chars)`` — the training-data operators
a 100-TB pipeline needs next to the crawl loop (exact dedup, MinHash-LSH
/ SimHash near-dup, token/quality stats, language ID, fingerprinting).

All stages are vectorized ``map_batches`` over pandas/Arrow batches;
wide steps pre-aggregate before the shuffle; stateful pieces (compiled
regexes, stopword tables, hash seeds) live in callable-class actors
initialized once per actor.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import ray.data as rd
from ray.data.aggregate import Count, Min

# Python \s also matches \x0b, \x1c-\x1f and Unicode whitespace, which
# RE2 (the SQL oracles' \s = [\t\n\f\r ]) does not.  The oracle equality
# contract therefore requires corpus texts to stay inside the shared
# class — tests/test_textops.py::test_fixture_whitespace_class asserts
# it for the shipped fixtures.
_WS = re.compile(r"\s+")

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# byte-popcount table (numpy 1.26 has no bitwise_count)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    return _POP8[x.view(np.uint8)].reshape(len(x), 8).sum(axis=1).astype(np.int64)


def _mix_bucket(hi: np.ndarray, lo: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic bucket id from two int columns (Fibonacci mixing —
    builtin hash() is per-process randomized and would break bucketing
    across workers)."""
    mix = (hi.astype(np.uint64) << np.uint64(32)) ^ lo.astype(np.uint64)
    mix *= np.uint64(0x9E3779B97F4A7C15)
    return (mix >> np.uint64(33)).astype(np.int64) % n_buckets


def _doc_rows(sf_dir: str) -> int:
    from larbin_ray.pipelines import table_rows
    return table_rows(sf_dir, "documents", default=10_000)


def shuffle_buckets(n_rows: int, rows_per_bucket: int = 2000,
                    lo: int = 8, hi: int = 4096) -> int:
    """Bucket count for groupby(bucket).map_groups shuffles: one python
    call per *bucket* (not per key), sized so buckets stay ~rows_per_bucket
    rows and grow with the data (fixed 16 would make one bucket hold
    millions of rows at 10^10 scale)."""
    return int(max(lo, min(hi, n_rows // rows_per_bucket + 1)))


def load_documents(sf_dir: str, columns: list[str] | None = None,
                   min_blocks: int | None = None) -> rd.Dataset:
    from larbin_ray.pipelines.relational import _sized_read
    return _sized_read(f"{sf_dir}/documents.parquet", columns,
                       min_blocks=min_blocks)


# ---------------------------------------------------------------------------
# exact dedup


def dedup_exact(sf_dir: str) -> rd.Dataset:
    """Exact duplicate groups by full text: keeper = min doc_id.
    SQL oracle: SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY text.

    Scale path: at 100 TB, group by a 128-bit content hash instead of the
    full text so the shuffle moves 16-byte keys, not documents — see
    dedup_exact_hash."""
    ds = load_documents(sf_dir, ["doc_id", "text"])
    out = ds.groupby("text").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Count(alias_name="n_copies"),
    )
    return out.select_columns(["doc_id", "n_copies"])


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big", signed=True)


def dedup_exact_hash(sf_dir: str) -> rd.Dataset:
    """Exact dedup via 64-bit content hash: the shuffle key is 8 bytes.
    Returns (doc_id, n_copies) for group keepers (min doc_id).

    Combiner pattern, fully distributed: per-batch partials (one row per
    distinct hash per batch — the text never leaves the map stage), then
    a hash-partitioned bucket reduce (see pipelines.reduce: Ray's
    sort-aggregate pays per-GROUP python overhead, unusable over
    unbounded distinct-hash cardinality).  No driver-side merge."""
    from larbin_ray.pipelines.reduce import hash_reduce
    ds = load_documents(sf_dir, ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"doc_id": df["doc_id"],
                           "h": [_md5_64(t) for t in df["text"]]})
        return df.groupby("h", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("h", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("n_copies", "sum"))

    out = hash_reduce(ds.map_batches(partial, batch_format="pandas"),
                      ["h"], merge, shuffle_buckets(_doc_rows(sf_dir)))
    return out.select_columns(["doc_id", "n_copies"])


# ---------------------------------------------------------------------------
# token / quality stats


def token_stats(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, n_chars2) — whitespace tokenization, matching
    the SQL oracle: array_length(regexp_split_to_array(trim(text),'\\s+'))."""
    ds = load_documents(sf_dir, ["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].str.strip()
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": t.str.count(_WS) + 1,
            "n_chars2": df["text"].str.len(),
        }).astype({"n_tokens": "int64", "n_chars2": "int64"})

    return ds.map_batches(stats, batch_format="pandas")


# BPE-ish pre-tokenizer (GPT-2-style contraction/letter/number/punct
# classes, ASCII form so python re and DuckDB RE2 agree byte-for-byte)
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


def token_stats_bpe(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_bpe_tokens) — BPE-style pre-tokenization count.
    SQL oracle: length(regexp_extract_all(text, BPE_PATTERN))."""
    ds = load_documents(sf_dir, ["doc_id", "text"])
    pat = re.compile(BPE_PATTERN)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_bpe_tokens": [len(pat.findall(t)) for t in df["text"]],
        }).astype({"n_bpe_tokens": "int64"})

    return ds.map_batches(stats, batch_format="pandas")


class QualityScorer:
    """Stopword/punct/length quality signals.  Regexes compiled once per
    worker (cheap-setup stage -> pipelines.worker_stage cache, not an
    actor pool)."""

    def __init__(self):
        self.ws = re.compile(r"\s+")
        # explicit ASCII class: the oracle's RE2 '[a-zA-Z0-9_\s]'
        # (RE2 \s = [\t\n\f\r ]); python's unicode \w would exempt
        # accented/CJK word chars the oracle counts as punctuation
        self.punct = re.compile(r"[^a-zA-Z0-9_\t\n\f\r ]")
        self.stop = set(STOPWORDS)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"]
        toks = texts.str.strip().str.split(self.ws)
        n_tokens = toks.map(len)
        stop_ratio = toks.map(
            lambda ws: sum(1 for w in ws if w in self.stop)) / n_tokens
        n_punct = texts.str.count(self.punct)
        from larbin_ray.pipelines import round_half_away
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": n_tokens.astype("int64"),
            # rounding must be half-away-from-zero to match the DuckDB
            # oracles (see pipelines.round_half_away); a zero-length
            # text yields NaN here exactly like the oracle's x/0 NULL
            "stop_ratio": round_half_away(stop_ratio, 6),
            "punct_ratio": round_half_away(n_punct / texts.str.len(), 6),
            "mean_token_len": round_half_away(toks.map(
                lambda ws: sum(map(len, ws)) / max(1, len(ws))), 6),
        })


def quality_scores(sf_dir: str, concurrency: int | None = None) -> rd.Dataset:
    from larbin_ray.pipelines import pool_size, worker_stage
    pool = concurrency or pool_size()
    ds = load_documents(sf_dir, ["doc_id", "text"], min_blocks=pool)
    return ds.map_batches(lambda df: worker_stage(QualityScorer)(df),
                          batch_format="pandas", batch_size=512)


def doc_fingerprint(sf_dir: str) -> rd.Dataset:
    """(doc_id, fp) — md5 of whitespace-normalized lowercase text.
    SQL oracle: md5(lower(regexp_replace(text,'\\s+',' ','g')))."""
    ds = load_documents(sf_dir, ["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        norm = df["text"].str.lower().str.replace(_WS, " ", regex=True)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "fp": [hashlib.md5(t.encode()).hexdigest() for t in norm],
        })

    return ds.map_batches(fp, batch_format="pandas")


def rolling_fingerprint(sf_dir: str, window: int = 8) -> rd.Dataset:
    """Karp-Rabin rolling-hash document sketch: min rolling hash over
    token windows.  Useful as a cheap containment fingerprint.

    Token hash is md5-low-32 (not crc32) so the whole sketch is
    SQL-expressible: the DuckDB oracle recomputes the identical windowed
    polynomial with HUGEINT arithmetic (see __ray_entry__.oracle_sql)."""
    ds = load_documents(sf_dir, ["doc_id", "text"])
    B, M = 1_000_003, (1 << 61) - 1

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in df["text"]:
            toks = _WS.split(t.strip())
            hs = [int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
                  for w in toks]
            if len(hs) < window:
                out.append(min(hs) if hs else 0)
                continue
            pw = pow(B, window - 1, M)
            h = 0
            best = None
            for i, v in enumerate(hs):
                if i >= window:
                    h = (h - hs[i - window] * pw) % M
                h = (h * B + v) % M
                if i >= window - 1:
                    best = h if best is None else min(best, h)
            out.append(best)
        return pd.DataFrame({"doc_id": df["doc_id"], "min_rhash": out})

    return ds.map_batches(fp, batch_format="pandas")


# ---------------------------------------------------------------------------
# language ID (character/stopword heuristic; engine-only)

_LANG_MARKERS = {
    "en": {"the", "and", "of", "is", "to", "a", "in", "that", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"},
    "fr": {"le", "la", "les", "et", "est", "une", "pour", "dans", "que", "des"},
    "es": {"el", "la", "los", "y", "es", "una", "para", "en", "que", "de"},
}


class LangId:
    """n-gram/stopword heuristic language ID; zh detected by CJK chars."""

    def __init__(self):
        self.ws = re.compile(r"\s+")
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}

    def classify(self, text: str) -> str:
        if any("一" <= c <= "鿿" for c in text[:400]):
            return "zh"
        toks = self.ws.split(text.lower().strip())[:200]
        best, best_n = "en", -1
        for lang, mark in self.markers.items():
            n = sum(1 for t in toks if t in mark)
            if n > best_n:
                best, best_n = lang, n
        return best

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "pred_lang": [self.classify(t) for t in df["text"]],
        })


def lang_id(sf_dir: str, concurrency: int | None = None) -> rd.Dataset:
    from larbin_ray.pipelines import pool_size, worker_stage
    pool = concurrency or pool_size()
    ds = load_documents(sf_dir, ["doc_id", "text"], min_blocks=pool)
    return ds.map_batches(lambda df: worker_stage(LangId)(df),
                          batch_format="pandas", batch_size=512)


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """Shingle -> minhash signature stage.  Hash seeds generated once per
    worker from a fixed seed (deterministic across runs and workers)."""

    def __init__(self, num_hashes: int = 64, shingle: int = 3):
        # a < 2^31 and shingle values < 2^32 keep a*x + b < 2^64: the
        # permutation hash vectorizes in plain uint64 (no bigints)
        rng = np.random.RandomState(12345)
        self.a = rng.randint(1, 1 << 31, size=num_hashes).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_hashes).astype(np.uint64)
        self.num_hashes = num_hashes
        self.k = shingle
        self.ws = re.compile(r"\s+")

    def shingles(self, text: str) -> np.ndarray:
        toks = self.ws.split(text.lower().strip())
        if len(toks) < self.k:
            toks = toks + [""] * (self.k - len(toks))
        # zlib.crc32: deterministic across processes (builtin hash() is
        # randomized per worker and would break LSH bucketing)
        vals = {zlib.crc32(" ".join(toks[i:i + self.k]).encode())
                for i in range(len(toks) - self.k + 1)}
        return np.fromiter(vals, dtype=np.uint64, count=len(vals))

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if len(sh) == 0:
            return np.zeros(self.num_hashes, dtype=np.int64)
        m = (sh[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return m.min(axis=1).astype(np.int64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in df["text"]]
        return pd.DataFrame({"doc_id": df["doc_id"], "sig": sigs})


# setup is microseconds (seeded RandomState + one regex) -> per-worker
# instance cache on the warm task pool, not an actor pool
# (pipelines.worker_stage rationale)
def _minhash_sig_batch(df: pd.DataFrame, num_hashes: int) -> pd.DataFrame:
    from larbin_ray.pipelines import worker_stage
    return worker_stage(MinHasher, num_hashes)(df)


def _band_rows(df: pd.DataFrame, bands: int, rows_per_band: int,
               n_buckets: int) -> pd.DataFrame:
    """Vectorized banding: stack signatures into an (N, bands, rows)
    array and fold each band's lanes with a Fibonacci-multiply mix —
    equal band chunks still get equal keys (all LSH needs; a false key
    collision only adds a candidate the exact-Jaccard verify discards),
    and the whole batch hashes without a per-doc Python loop."""
    n = len(df)
    if n == 0:
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "band": pd.array([], dtype="int64"),
                             "key": pd.array([], dtype="int64"),
                             "bucket": pd.array([], dtype="int64")})
    sig = np.stack([np.asarray(s) for s in df["sig"]]).astype(np.uint64)
    # num_hashes need not divide bands evenly: band b covers lanes
    # [b*rpb, (b+1)*rpb) and the tail lanes are unused, exactly like the
    # slicing loop this replaced
    sig = sig[:, :bands * rows_per_band].reshape(n, bands, rows_per_band)
    key = np.zeros((n, bands), dtype=np.uint64)
    for j in range(rows_per_band):        # rows_per_band lanes, not N docs
        key = (key * np.uint64(0x9E3779B97F4A7C15)) ^ sig[:, :, j]
    key ^= key >> np.uint64(29)
    key_np = (key & np.uint64(0xFFFFFFFF)).astype(np.int64).ravel()
    band_np = np.tile(np.arange(bands, dtype=np.int64), n)
    return pd.DataFrame({"doc_id": np.repeat(df["doc_id"].to_numpy(np.int64),
                                             bands),
                         "band": band_np, "key": key_np,
                         "bucket": _mix_bucket(band_np, key_np, n_buckets)})


def _emit_bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Within one shuffle bucket: (band,key) groups with >=2 members emit
    all doc pairs (vectorized prefilter; the python loop runs only over
    the few non-singleton LSH buckets)."""
    g = g[g.duplicated(["band", "key"], keep=False)]
    out_a, out_b = [], []
    for _, grp in g.groupby(["band", "key"], sort=False):
        ids = np.unique(grp["doc_id"].to_numpy())
        if len(ids) < 2:
            continue
        ia, ib = np.triu_indices(len(ids), k=1)
        out_a.append(ids[ia])
        out_b.append(ids[ib])
    if not out_a:
        return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                             "doc_b": pd.array([], dtype="int64")})
    # dedupe within the bucket: a pair matching in several (band, key)
    # groups of this bucket emits once, bounding the driver pull in
    # minhash_dedup at O(candidates x distinct buckets hit)
    return pd.DataFrame({"doc_a": np.concatenate(out_a),
                         "doc_b": np.concatenate(out_b)}).drop_duplicates()


def _minhash_candidate_pairs(sf_dir: str, num_hashes: int = 64,
                             bands: int = 16,
                             concurrency: int | None = None) -> rd.Dataset:
    """documents -> minhash signatures (distributed actor pool) -> banded
    (band, key) rows -> groupby(bucket) pair emission.  Returns the RAW
    candidate-pair stream: a pair appears once per matching band (callers
    that need multiplicity or uniqueness reduce/unique it themselves).

    The banded rows shuffle by a hash bucket of (band, key) — one python
    map_groups call per *bucket* (sized by shuffle_buckets, not per LSH
    key: most LSH keys are singletons and a per-key map_groups would pay
    a python call each)."""
    from larbin_ray.pipelines import pool_size
    if bands < 1 or num_hashes // bands < 1:
        # a zero rows_per_band degenerates every band key to a constant
        # and candidate emission goes all-pairs O(N^2).  UNEVEN splits
        # are fine: band b covers lanes [b*rpb, (b+1)*rpb), tail lanes
        # unused (test_minhash_uneven_banding pins path parity).
        raise ValueError(
            f"bands={bands} exceeds num_hashes={num_hashes}: zero hash "
            "rows per band degenerates every band key to a constant "
            "(all-pairs O(N^2) candidate emission)")
    rows_per_band = num_hashes // bands
    n_buckets = shuffle_buckets(_doc_rows(sf_dir) * bands)
    pool = concurrency or pool_size()
    ds = load_documents(sf_dir, ["doc_id", "text"], min_blocks=pool)
    sigs = ds.map_batches(lambda df: _minhash_sig_batch(df, num_hashes),
                          batch_format="pandas", batch_size=512)
    banded = sigs.map_batches(
        lambda df: _band_rows(df, bands, rows_per_band, n_buckets),
        batch_format="pandas")
    return (banded.groupby("bucket")
            .map_groups(_emit_bucket_pairs, batch_format="pandas"))


def _jaccard_from_counts(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """(doc_a, doc_b, inter, sz_a, sz_b) -> thresholded jaccard rows.
    Filter applies to the UNROUNDED ratio — the SQL oracles' WHERE uses
    the raw expression, so thresholding the 6-dp-rounded value would
    admit boundary pairs the oracle excludes — then round for output."""
    iv = g["inter"].to_numpy(dtype=np.int64)
    union = np.maximum(g["sz_a"].to_numpy(dtype=np.int64)
                       + g["sz_b"].to_numpy(dtype=np.int64) - iv, 1)
    jac = iv / union
    from larbin_ray.pipelines import round_half_away
    g = g.copy()
    g["jaccard"] = round_half_away(jac, 6)
    return g.loc[jac >= threshold, ["doc_a", "doc_b", "jaccard"]]


def _pair_partial_counts(df: pd.DataFrame) -> pd.DataFrame:
    """Partial |A ∩ B| over one bucket's pair rows (sizes ride along)."""
    return df.groupby(["doc_a", "doc_b"], as_index=False).agg(
        inter=("doc_a", "size"), sz_a=("sz_a", "first"),
        sz_b=("sz_b", "first"))


def _jaccard_pair_agg(df: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Shared pair reduce for the posting-list jaccard ops: count
    |A ∩ B| per (doc_a, doc_b) group (sizes ride on every pair row),
    then threshold (see _jaccard_from_counts for rounding semantics)."""
    return _jaccard_from_counts(_pair_partial_counts(df), threshold)


def _shingle_hashes64(text: str, k: int = 3) -> np.ndarray:
    """Distinct k-token shingle 64-bit hashes for exact verification.
    64-bit (vs the crc32 used inside the minhash *signature*, which must
    stay < 2^32 for the uint64 permutation trick) so hash-set Jaccard
    equals string-set Jaccard up to a ~m^2/2^65 birthday term — the
    property the exact-Jaccard SQL oracle relies on.  Short texts pad
    with empty tokens exactly like MinHasher.shingles."""
    toks = _WS.split(text.lower().strip())
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    vals = {_md5_64(" ".join(toks[i:i + k]))
            for i in range(len(toks) - k + 1)}
    return np.fromiter(vals, dtype=np.int64, count=len(vals))


# Below this many documents the whole dedup exchange runs on plain Ray
# tasks (task_parquet_exchange): two Ray Data sort shuffles cost ~1.5-2 s
# of fixed stage time that never amortizes on small corpora (same
# crossover logic as the crawl's ray_data_min_tick_rows).  The Ray Data
# pipeline is the scale path; tests assert both paths agree.
TASK_DEDUP_MAX_DOCS = 100_000


def minhash_dedup(sf_dir: str, threshold: float = 0.7,
                  num_hashes: int = 64, bands: int = 16,
                  concurrency: int | None = None,
                  force_path: str | None = None) -> pd.DataFrame:
    """LSH candidates verified by exact shingle Jaccard — distributed
    end to end; the driver holds only the candidate pair/doc-id arrays
    (the accepted O(candidates) broadcast) and the final qualifying
    pairs.

    Verification is a posting-list intersection restricted to candidate
    documents: each candidate doc explodes to (shingle-hash, doc_id, sz)
    rows -> groupby(bucket-of-shingle) pair emission (sz rides on every
    row, so |A ∪ B| needs no join), with emitted pairs filtered to the
    broadcast LSH candidate set right at emission -> ONE bucketed pair
    reduce counts |A ∩ B|, computes jaccard and threshold-filters.  No
    driver-side per-pair loop and no driver-held shingle table.

    Below TASK_DEDUP_MAX_DOCS the same bucketed data flow runs on plain
    tasks (``force_path`` in {"tasks", "data"} pins it for tests); on
    the task path the final pair combine happens driver-side over
    per-bucket partial counts — bounded by the threshold."""
    import ray
    from larbin_ray.pipelines.reduce import task_parquet_exchange

    if bands < 1 or num_hashes // bands < 1:
        # same contract as _minhash_candidate_pairs — guard HERE too so
        # the small-corpus task path rejects degenerate band configs.
        # (UNEVEN splits are supported: band b covers lanes
        # [b*rpb, (b+1)*rpb), tail lanes unused — parity-tested.)
        raise ValueError(
            f"bands={bands} exceeds num_hashes={num_hashes}: zero hash "
            "rows per band degenerates every band key to a constant "
            "(all-pairs O(N^2) candidate emission)")
    n_docs = _doc_rows(sf_dir)
    use_tasks = (force_path == "tasks" or
                 (force_path is None and n_docs <= TASK_DEDUP_MAX_DOCS))
    doc_path = f"{sf_dir}/documents.parquet"
    empty = pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                          "doc_b": pd.array([], dtype="int64"),
                          "jaccard": pd.array([], dtype="float64")})
    # unique candidate pairs straight off the banded emission — pairs
    # are deduped inside each shuffle bucket (_emit_bucket_pairs), so
    # the driver pull is O(unique candidates x distinct buckets hit),
    # bounded by the constant band count; uniquing the remainder here
    # beats a whole extra reduce shuffle (measured: the count_bands
    # hash_reduce cost ~0.5 s of fixed stage time at sf0.1)
    if use_tasks:
        rows_per_band = num_hashes // bands
        n_buckets1 = shuffle_buckets(n_docs * bands)

        def band_map(df: pd.DataFrame) -> pd.DataFrame:
            from larbin_ray.pipelines import worker_stage
            sigs = worker_stage(MinHasher, num_hashes)(df)
            return _band_rows(sigs, bands, rows_per_band, n_buckets1)

        raw = task_parquet_exchange(doc_path, ["doc_id", "text"],
                                    band_map, "bucket", n_buckets1,
                                    _emit_bucket_pairs)
    else:
        raw = _minhash_candidate_pairs(
            sf_dir, num_hashes, bands, concurrency).to_pandas()
    raw = raw.drop_duplicates(["doc_a", "doc_b"])
    if raw.empty:
        return empty
    pa_ids = raw["doc_a"].to_numpy(np.int64)
    pb_ids = raw["doc_b"].to_numpy(np.int64)
    need = np.unique(np.concatenate([pa_ids, pb_ids]))
    # compact pair key ia*M+ib (ia, ib = positions in `need`): fits int64
    # while M < ~3e9 — the candidate-doc broadcast is small-side by
    # contract long before that
    m = len(need)
    pair_keys = np.unique(np.searchsorted(need, pa_ids) * m
                          + np.searchsorted(need, pb_ids))
    need_ref = ray.put(need)     # sorted — batches use searchsorted membership
    keys_ref = ray.put(pair_keys)
    n_buckets = shuffle_buckets(len(need) * 64, rows_per_bucket=50_000)

    def cand_postings(df: pd.DataFrame) -> pd.DataFrame:
        need_ids = ray.get(need_ref)
        ids = df["doc_id"].to_numpy()
        pos = np.searchsorted(need_ids, ids)
        pos[pos >= len(need_ids)] = 0
        sub = df[need_ids[pos] == ids]
        docs, grams, sizes = [], [], []
        for d, t in zip(sub["doc_id"], sub["text"]):
            h = _shingle_hashes64(t)
            docs.append(np.full(len(h), d, dtype=np.int64))
            sizes.append(np.full(len(h), len(h), dtype=np.int64))
            grams.append(h)
        gram_np = np.concatenate(grams) if grams else np.empty(0, np.int64)
        return pd.DataFrame({
            "doc_id": (np.concatenate(docs) if docs else np.empty(0, np.int64)),
            "gram": gram_np,
            "sz": (np.concatenate(sizes) if sizes else np.empty(0, np.int64)),
            "bucket": _mix_bucket(np.zeros(len(gram_np), dtype=np.int64),
                                  gram_np, n_buckets)})

    def emit_cand_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # gram-co-occurrence pairs, kept only if LSH-candidate (broadcast
        # sorted compact-key membership) — non-candidate pairs never
        # enter the reduce shuffle
        out = _emit_gram_pairs(g)
        if out.empty:
            return out
        need_ids, keys = ray.get(need_ref), ray.get(keys_ref)
        k = (np.searchsorted(need_ids, out["doc_a"].to_numpy(np.int64))
             * len(need_ids)
             + np.searchsorted(need_ids, out["doc_b"].to_numpy(np.int64)))
        pos = np.searchsorted(keys, k)
        pos[pos >= len(keys)] = 0
        return out[keys[pos] == k]

    if use_tasks:
        partials = task_parquet_exchange(
            doc_path, ["doc_id", "text"], cand_postings, "bucket",
            n_buckets, lambda g: _pair_partial_counts(emit_cand_pairs(g)))
        if partials.empty:
            return empty
        totals = partials.groupby(["doc_a", "doc_b"], as_index=False).agg(
            inter=("inter", "sum"), sz_a=("sz_a", "first"),
            sz_b=("sz_b", "first"))
        out = _jaccard_from_counts(totals, threshold)
    else:
        from larbin_ray.pipelines.reduce import hash_reduce

        out = hash_reduce(
            (load_documents(sf_dir, ["doc_id", "text"])
             .map_batches(cand_postings, batch_format="pandas")
             .groupby("bucket")
             .map_groups(emit_cand_pairs, batch_format="pandas")),
            ["doc_a", "doc_b"], lambda df: _jaccard_pair_agg(df, threshold),
            shuffle_buckets(len(need))).to_pandas()
    if out.empty:
        return empty
    return (out.astype({"doc_a": "int64", "doc_b": "int64"})
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# exact n-gram Jaccard near-dup (posting-list join)


def _gram_hashes(text: str, n: int) -> np.ndarray:
    """Distinct token n-gram 64-bit hashes (md5 first 8 bytes).  The op
    is graded EXACT against a string-based SQL oracle, so gram-hash
    collisions must be negligible: 64-bit keeps the birthday term at
    ~m^2/2^65 (crc32's ~m^2/2^33 becomes material above ~10^5 distinct
    grams).  Gram strings never leave the map stage."""
    toks = _WS.split(text.lower().strip())
    if len(toks) < n:
        return np.empty(0, dtype=np.int64)
    vals = {_md5_64(" ".join(toks[i:i + n]))
            for i in range(len(toks) - n + 1)}
    return np.fromiter(vals, dtype=np.int64, count=len(vals))


def _emit_gram_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Within one shuffle bucket: co-occurring doc pairs per gram, with
    multiplicity 1 per gram (the downstream reduce counts |A ∩ B|).
    Every posting row carries its doc's total gram-set size, so the pair
    rows carry (sz_a, sz_b) and the union size needs no join."""
    g = g[g.duplicated("gram", keep=False)]
    out_a, out_b, out_sa, out_sb = [], [], [], []
    for _, grp in g.groupby("gram", sort=False):
        order = np.argsort(grp["doc_id"].to_numpy())
        ids = grp["doc_id"].to_numpy()[order]
        szs = grp["sz"].to_numpy()[order]
        ia, ib = np.triu_indices(len(ids), k=1)
        out_a.append(ids[ia])
        out_b.append(ids[ib])
        out_sa.append(szs[ia])
        out_sb.append(szs[ib])
    if not out_a:
        return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                             "doc_b": pd.array([], dtype="int64"),
                             "sz_a": pd.array([], dtype="int64"),
                             "sz_b": pd.array([], dtype="int64")})
    return pd.DataFrame({"doc_a": np.concatenate(out_a),
                         "doc_b": np.concatenate(out_b),
                         "sz_a": np.concatenate(out_sa),
                         "sz_b": np.concatenate(out_sb)})


def _ngram_jaccard_pairs_ds(sf_dir: str, n: int = 3,
                            threshold: float = 0.5) -> rd.Dataset:
    """The qualifying-pair DATASET behind ngram_jaccard_pairs — shared
    by the pair query (which materializes it: the pair list IS its
    result contract) and dedup_clusters' distributed component path
    (which must NOT bring pairs to the driver)."""
    n_buckets = shuffle_buckets(_doc_rows(sf_dir) * 64, rows_per_bucket=50_000)
    ds = load_documents(sf_dir, ["doc_id", "text"])

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        docs, grams, sizes = [], [], []
        for d, t in zip(df["doc_id"], df["text"]):
            h = _gram_hashes(t, n)
            docs.append(np.full(len(h), d, dtype=np.int64))
            sizes.append(np.full(len(h), len(h), dtype=np.int64))
            grams.append(h)
        gram_np = np.concatenate(grams) if grams else np.empty(0, np.int64)
        doc_np = np.concatenate(docs) if docs else np.empty(0, np.int64)
        sz_np = np.concatenate(sizes) if sizes else np.empty(0, np.int64)
        return pd.DataFrame({
            "doc_id": doc_np, "gram": gram_np, "sz": sz_np,
            "bucket": _mix_bucket(np.zeros(len(gram_np), dtype=np.int64),
                                  gram_np, n_buckets)})

    from larbin_ray.pipelines.reduce import hash_reduce

    pairs = (ds.map_batches(postings, batch_format="pandas")
             .groupby("bucket")
             .map_groups(_emit_gram_pairs, batch_format="pandas"))
    return hash_reduce(pairs, ["doc_a", "doc_b"],
                       lambda df: _jaccard_pair_agg(df, threshold),
                       shuffle_buckets(_doc_rows(sf_dir)))


def ngram_jaccard_pairs(sf_dir: str, n: int = 3,
                        threshold: float = 0.5) -> pd.DataFrame:
    """EXACT n-gram Jaccard near-dup pairs: (doc_a < doc_b, jaccard)
    with jaccard >= threshold over distinct token n-gram sets.

    Posting-list join, fully distributed with NO driver-side structure
    proportional to document count: documents -> (gram, doc_id, sz)
    posting rows, where sz is the doc's total distinct-gram count (each
    posting row carries its doc's size, so the union size needs no join
    and no broadcast) -> groupby(bucket-of-gram) pair emission of
    (doc_a, doc_b, sz_a, sz_b) -> groupby(pair) reduce counts |A ∩ B|,
    computes jaccard, and threshold-filters inside the bucket.  The
    driver sees only the qualifying pairs.  The emission volume is sum
    over grams of C(df, 2): exact by definition; the MinHash pipeline is
    the approximate scale path when that sum explodes."""
    out = _ngram_jaccard_pairs_ds(sf_dir, n, threshold).to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                             "doc_b": pd.array([], dtype="int64"),
                             "jaccard": pd.array([], dtype="float64")})
    return (out.astype({"doc_a": "int64", "doc_b": "int64"})
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


def cluster_pairs(doc_a, doc_b) -> dict[int, int]:
    """Union-find connected components over an edge list; returns
    {doc_id: cluster_id} with cluster_id = the component's min doc_id.
    Pure function (unit-tested directly).  Union is BY MIN (the label
    requirement), not by rank, so the bound is the path-compression-only
    amortized O(pairs log pairs) worst case — still linear-ish in
    practice and trivially fast at pair-list sizes."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:           # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(doc_a, doc_b):
        a, b = int(a), int(b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min keeps the root the smallest member, so the
            # final find() IS the cluster id
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {v: find(v) for v in parent}


def dedup_clusters(sf_dir: str, n: int = 3, threshold: float = 0.5,
                   force_path: str | None = None) -> pd.DataFrame:
    """Transitive near-dup clusters: connected components over the EXACT
    n-gram Jaccard pair list (``ngram_jaccard_pairs``), one row
    (doc_id, cluster_id) per clustered doc with cluster_id = the
    component's min doc_id.  Pair lists alone under-dedup: A~B and B~C
    must drop two of three docs even when A and C don't pair directly —
    the cluster id is what a keeper policy needs.

    Scale shape: the pair emission/reduction is distributed (see
    ngram_jaccard_pairs); the component labeling auto-selects by pair
    count (pipelines.components.cluster_df): a driver union-find below
    CLUSTER_TASK_MAX_PAIRS (strictly faster while pairs fit one
    machine), iterative min-label propagation over the edge Dataset
    above it — O(log component diameter) bucketed-shuffle rounds, no
    driver-side O(pairs) structure.  ``force_path`` pins "driver" /
    "distributed" (parity tests); both produce identical labels."""
    from larbin_ray.pipelines.components import cluster_df

    lab = cluster_df(_ngram_jaccard_pairs_ds(sf_dir, n, threshold),
                     "doc_a", "doc_b", force_path)
    return lab.rename(columns={"node": "doc_id", "label": "cluster_id"})


# ---------------------------------------------------------------------------
# SimHash near-dup


class SimHasher:
    """64-bit simhash over token 2-grams (deterministic md5 feature
    hashes).  The per-feature bit loop is vectorized: all feature
    digests unpack to a (n_features, 64) bit matrix in one numpy call."""

    def __init__(self, nbits: int = 64):
        self.nbits = nbits
        self.ws = re.compile(r"\s+")

    def simhash(self, text: str) -> int:
        toks = self.ws.split(text.lower().strip())
        n = len(toks) - 1
        if n <= 0:
            return -(1 << 63)
        dig = np.frombuffer(
            b"".join(hashlib.md5((toks[i] + " " + toks[i + 1]).encode()).digest()[:8]
                     for i in range(n)), dtype=np.uint8).reshape(n, 8)
        # _md5_64 reads the 8 bytes big-endian: byte 7 holds bits 0-7, so
        # reversing the byte axis + little bitorder yields column b = bit b
        bits = np.unpackbits(dig[:, ::-1], axis=1, bitorder="little")
        v = bits.sum(axis=0, dtype=np.int64) * 2 - n   # (+1/-1 vote sums)
        raw = int(np.packbits(v > 0, bitorder="little").view("<u8")[0])
        return raw - (1 << 63)  # stored biased-signed (legacy layout)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "simhash": [self.simhash(t) for t in df["text"]],
        })


def simhash_signatures(sf_dir: str, concurrency: int | None = None) -> rd.Dataset:
    from larbin_ray.pipelines import pool_size, worker_stage
    pool = concurrency or pool_size()
    ds = load_documents(sf_dir, ["doc_id", "text"], min_blocks=pool)
    # cheap setup (one regex) -> worker cache, not an actor pool
    return ds.map_batches(lambda df: worker_stage(SimHasher)(df),
                          batch_format="pandas", batch_size=512)


def _simhash_chunk_rows(df: pd.DataFrame, n_buckets: int) -> pd.DataFrame:
    """(doc_id, simhash) -> 4 rows per doc: (chunk 0-3, 16-bit chunk
    value) plus the shuffle bucket — a pair within hamming distance 3
    agrees on at least one of the 4 chunks (pigeonhole)."""
    vals = (df["simhash"].to_numpy().astype(np.int64)
            .view(np.uint64) + np.uint64(1 << 63))
    ids = df["doc_id"].to_numpy()
    n = len(ids)
    chunk = np.repeat(np.arange(4, dtype=np.int64), n)
    doc = np.tile(ids, 4)
    sig = np.tile(vals, 4)
    cval = ((sig >> (chunk.astype(np.uint64) * np.uint64(16)))
            & np.uint64(0xFFFF)).astype(np.int64)
    return pd.DataFrame({
        "doc_id": doc, "chunk": chunk, "cval": cval,
        "sig": sig.astype(np.int64),   # two's-complement carry of uint64
        "bucket": _mix_bucket(chunk, cval, n_buckets)})


def _emit_simhash_pairs(g: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    g = g[g.duplicated(["chunk", "cval"], keep=False)]
    out_a, out_b, out_d = [], [], []
    for _, grp in g.groupby(["chunk", "cval"], sort=False):
        ids = grp["doc_id"].to_numpy()
        sig = grp["sig"].to_numpy().view(np.uint64)
        order = np.argsort(ids)
        ids, sig = ids[order], sig[order]
        keep = np.concatenate(([True], ids[1:] != ids[:-1]))
        ids, sig = ids[keep], sig[keep]
        if len(ids) < 2:
            continue
        ia, ib = np.triu_indices(len(ids), k=1)
        d = _popcount64(sig[ia] ^ sig[ib])
        ok = d <= max_hamming
        out_a.append(ids[ia][ok])
        out_b.append(ids[ib][ok])
        out_d.append(d[ok])
    if not out_a:
        return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                             "doc_b": pd.array([], dtype="int64"),
                             "hamming": pd.array([], dtype="int64")})
    return pd.DataFrame({"doc_a": np.concatenate(out_a),
                         "doc_b": np.concatenate(out_b),
                         "hamming": np.concatenate(out_d)})


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by simhash hamming distance, bucketed by 16-bit
    chunks (a pair within distance 3 shares at least one of 4 chunks).

    Distributed end to end: signatures (actor pool) -> 4 chunk rows per
    doc -> groupby(bucket) vectorized pair emission -> groupby(pair)
    dedupe (a pair can match in several chunks; Min folds the copies).
    The driver sees only the final pair list."""
    if not 0 <= max_hamming <= 3:
        # pigeonhole over 4 chunks covers distance <= 3; a larger radius
        # needs max_hamming+1 chunks — without this guard pairs whose
        # differing bits span all 4 chunks would be SILENTLY dropped
        raise ValueError(
            f"max_hamming={max_hamming}: the 4x16-bit chunk bucketing "
            "is complete only for hamming <= 3")
    n_buckets = shuffle_buckets(_doc_rows(sf_dir) * 4)
    sigs = simhash_signatures(sf_dir)
    chunked = sigs.map_batches(
        lambda df: _simhash_chunk_rows(df, n_buckets), batch_format="pandas")
    from larbin_ray.pipelines.reduce import hash_reduce
    pairs = (chunked.groupby("bucket")
             .map_groups(lambda g: _emit_simhash_pairs(g, max_hamming),
                         batch_format="pandas"))

    def dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            hamming=("hamming", "min"))

    out = hash_reduce(pairs, ["doc_a", "doc_b"], dedupe,
                      shuffle_buckets(_doc_rows(sf_dir))).to_pandas()
    if out.empty:
        # map_groups over an empty pair stream loses the column schema
        return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                             "doc_b": pd.array([], dtype="int64"),
                             "hamming": pd.array([], dtype="int64")})
    return (out[["doc_a", "doc_b", "hamming"]]
            .astype({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# composite curation pipeline


# Above this many documents (an upper bound on distinct texts, read
# from the parquet footer) the keeper decision switches from the
# sorted-id-array broadcast to a bucketed cogroup on h — no structure
# proportional to distinct-key cardinality anywhere.
CURATE_BROADCAST_MAX_KEYS = 5_000_000


def curate_documents(sf_dir: str, min_tokens: int = 20, max_tokens: int = 1000,
                     min_stop_ratio: float = 0.0,
                     force_path: str | None = None) -> pd.DataFrame:
    """Training-data curation composite: keep a document iff it is the
    exact-dedup keeper (min doc_id of its text group) AND its token count
    is within [min_tokens, max_tokens] AND its stopword ratio clears the
    floor.  Returns (doc_id, n_tokens, stop_ratio, keep_reason) for kept
    docs — the composition of the dedup + quality stages into one
    decision, the shape of a real corpus-curation job.

    SQL oracle: join of the GROUP BY text keeper subquery with the same
    token/stopword expressions.

    Distributed shape, two paths behind CURATE_BROADCAST_MAX_KEYS
    (``force_path`` in {"broadcast", "cogroup"} pins one for tests):

    - broadcast (default at moderate cardinality): the scored table
      (slim int/float columns — text never leaves the map stage) is
      materialized in the object store; the keeper set comes from a
      bucketed min-reduce and is broadcast as a sorted id array (one
      int per distinct text); the keep-filter runs vectorized per batch
      with no second shuffle of the scored rows.
    - cogroup (the scale path): ONE bucketed shuffle of the scored rows
      on h; each bucket holds every row of its text groups, so keeper =
      (doc_id == group min) and the quality filter apply in-bucket.  No
      broadcast, no driver- or object-store-resident keeper set."""
    import ray

    ds = load_documents(sf_dir, ["doc_id", "text"])
    n_docs = _doc_rows(sf_dir)
    use_cogroup = (force_path == "cogroup" or
                   (force_path is None and n_docs > CURATE_BROADCAST_MAX_KEYS))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        from larbin_ray.pipelines import round_half_away
        t = df["text"].str.strip()
        toks = t.str.split(_WS)
        n = toks.map(len)
        stop = set(STOPWORDS)
        ratio = toks.map(lambda ws: sum(1 for w in ws if w in stop)) / n
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "h": [_md5_64(x) for x in df["text"]],
            "n_tokens": n.astype("int64"),
            "stop_ratio": round_half_away(ratio, 6),
        })

    from larbin_ray.pipelines.reduce import hash_reduce

    def _finish(kept: pd.DataFrame) -> pd.DataFrame:
        out = kept[["doc_id", "n_tokens", "stop_ratio"]].copy()
        out["keep_reason"] = "keeper+quality"
        return out

    if use_cogroup:
        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            kmin = df.groupby("h")["doc_id"].transform("min")
            return _finish(df[(df["doc_id"] == kmin)
                              & (df["n_tokens"] >= min_tokens)
                              & (df["n_tokens"] <= max_tokens)
                              & (df["stop_ratio"] >= min_stop_ratio)])

        out = hash_reduce(ds.map_batches(score, batch_format="pandas"),
                          ["h"], per_bucket,
                          shuffle_buckets(n_docs)).to_pandas()
        if out.empty:
            # map_groups over an all-empty stream loses the column
            # schema (same guard as the sibling pair pipelines)
            return pd.DataFrame({
                "doc_id": pd.array([], dtype="int64"),
                "n_tokens": pd.array([], dtype="int64"),
                "stop_ratio": pd.array([], dtype="float64"),
                "keep_reason": pd.array([], dtype=object)})
        return out.sort_values("doc_id").reset_index(drop=True)

    scored = ds.map_batches(score, batch_format="pandas").materialize()
    keepers = hash_reduce(
        scored, ["h"],
        lambda df: df.groupby("h", as_index=False).agg(keeper=("doc_id", "min")),
        shuffle_buckets(n_docs)).to_pandas()["keeper"].to_numpy()
    keeper_ref = ray.put(np.sort(keepers))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        kset = ray.get(keeper_ref)
        ids = df["doc_id"].to_numpy()
        pos = np.searchsorted(kset, ids)
        pos[pos >= len(kset)] = 0
        is_keeper = kset[pos] == ids
        return _finish(df[is_keeper
                          & (df["n_tokens"] >= min_tokens)
                          & (df["n_tokens"] <= max_tokens)
                          & (df["stop_ratio"] >= min_stop_ratio)])

    out = scored.map_batches(keep, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)
