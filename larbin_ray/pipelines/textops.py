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
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Min

_WS = re.compile(r"\s+")

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def load_documents(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    from larbin_ray.pipelines.relational import _sized_read
    return _sized_read(f"{sf_dir}/documents.parquet", columns)


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
    Returns (doc_id, n_copies) for group keepers (min doc_id)."""
    ds = load_documents(sf_dir, ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"doc_id": df["doc_id"],
                           "h": [_md5_64(t) for t in df["text"]]})
        return df.groupby("h", as_index=False).agg(
            doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))

    # combiner pattern: per-batch partials, merged once (the partial set
    # is one row per distinct hash per batch).  At 100-TB scale the merge
    # becomes a hash-partitioned reduce (bucket by h % B -> per-bucket
    # pandas merge); the driver-side merge here is the small-cardinality
    # fast path.
    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("h", as_index=False).agg(
        doc_id=("doc_id", "min"), n_copies=("n_copies", "sum"))
    return out[["doc_id", "n_copies"]]


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
    """Actor-pool stage: stopword/punct/length quality signals.  Regexes
    compiled once per actor (SURVEY.md actor-pool pattern)."""

    def __init__(self):
        self.ws = re.compile(r"\s+")
        self.punct = re.compile(r"[^\w\s]")
        self.stop = set(STOPWORDS)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"]
        toks = texts.str.strip().str.split(self.ws)
        n_tokens = toks.map(len)
        stop_ratio = toks.map(
            lambda ws: sum(1 for w in ws if w in self.stop)) / n_tokens
        n_punct = texts.str.count(self.punct)
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": n_tokens.astype("int64"),
            "stop_ratio": stop_ratio.round(6),
            "punct_ratio": (n_punct / texts.str.len()).round(6),
            "mean_token_len": toks.map(
                lambda ws: sum(map(len, ws)) / max(1, len(ws))).round(6),
        })


def quality_scores(sf_dir: str, concurrency: int | None = None) -> rd.Dataset:
    from larbin_ray.pipelines import pool_size
    ds = load_documents(sf_dir, ["doc_id", "text"])
    return ds.map_batches(QualityScorer, batch_format="pandas",
                          concurrency=concurrency or pool_size(), batch_size=512)


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
    token windows (engine-only; no SQL equivalent).  Useful as a cheap
    containment fingerprint."""
    ds = load_documents(sf_dir, ["doc_id", "text"])
    B, M = 1_000_003, (1 << 61) - 1

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in df["text"]:
            toks = _WS.split(t.strip())
            hs = [zlib.crc32(w.encode()) for w in toks]
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
    from larbin_ray.pipelines import pool_size
    ds = load_documents(sf_dir, ["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pandas",
                          concurrency=concurrency or pool_size(), batch_size=512)


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """Shingle -> minhash signature stage.  Hash seeds generated once per
    actor from a fixed seed (deterministic across runs and actors)."""

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


def _band_rows(df: pd.DataFrame, bands: int, rows_per_band: int) -> pd.DataFrame:
    out_doc, out_band, out_key = [], [], []
    for doc_id, sig in zip(df["doc_id"], df["sig"]):
        sig = np.asarray(sig)
        for b in range(bands):
            chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
            key = zlib.crc32(chunk.tobytes())
            out_doc.append(doc_id)
            out_band.append(b)
            out_key.append(key)
    return pd.DataFrame({"doc_id": out_doc, "band": out_band, "key": out_key})


def minhash_candidates(sf_dir: str, num_hashes: int = 64, bands: int = 16,
                       concurrency: int | None = None) -> pd.DataFrame:
    """documents -> minhash signatures (distributed actor pool) -> banded
    LSH buckets -> candidate pairs (doc_a < doc_b, with the band-match
    count).

    The signature + banding stages are distributed map_batches; the
    bucket-join runs on the collected (band, key, doc_id) table — tiny
    (bands x docs rows of ints).  At 10^10 docs that join becomes a
    groupby((band, key)) shuffle whose groups-with->1-member emit pairs;
    Ray's per-group map_groups costs a python call per *singleton*
    bucket, which is the wrong trade below millions of docs."""
    from larbin_ray.pipelines import pool_size
    rows_per_band = num_hashes // bands
    ds = load_documents(sf_dir, ["doc_id", "text"])
    sigs = ds.map_batches(MinHasher, fn_constructor_kwargs={"num_hashes": num_hashes},
                          batch_format="pandas", concurrency=concurrency or pool_size(),
                          batch_size=512)
    banded = sigs.map_batches(
        lambda df: _band_rows(df, bands, rows_per_band),
        batch_format="pandas").to_pandas()
    # vectorized pre-filter: only buckets with >= 2 members can emit pairs
    banded = banded[banded.duplicated(["band", "key"], keep=False)]
    pairs: dict[tuple, int] = {}
    for _, group in banded.groupby(["band", "key"]):
        ids = sorted(group["doc_id"].unique())
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs[(ids[i], ids[j])] = pairs.get((ids[i], ids[j]), 0) + 1
    if not pairs:
        return pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                             "doc_b": pd.array([], dtype="int64"),
                             "n_bands": pd.array([], dtype="int64")})
    items = sorted(pairs.items())
    return pd.DataFrame({"doc_a": [k[0] for k, _ in items],
                         "doc_b": [k[1] for k, _ in items],
                         "n_bands": [v for _, v in items]})


def minhash_dedup(sf_dir: str, threshold: float = 0.7, **kw) -> pd.DataFrame:
    """Candidates verified by exact shingle Jaccard.  The verification
    broadcast (doc_id -> shingle set) is the small side at test scale;
    at 100 TB it becomes a cogroup join of candidates with documents."""
    import ray

    cand = minhash_candidates(sf_dir, **kw)
    need = set(cand["doc_a"]) | set(cand["doc_b"])
    docs = load_documents(sf_dir, ["doc_id", "text"]).to_pandas()
    docs = docs[docs["doc_id"].isin(need)]
    mh = MinHasher()
    sh = {d: set(mh.shingles(t).tolist()) for d, t in zip(docs["doc_id"], docs["text"])}
    out = []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = sh[a], sh[b]
        j = len(sa & sb) / max(1, len(sa | sb))
        if j >= threshold:
            out.append((a, b, round(j, 6)))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"]) \
             .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash near-dup


class SimHasher:
    """64-bit simhash over token 2-grams (deterministic md5 feature
    hashes)."""

    def __init__(self, nbits: int = 64):
        self.nbits = nbits
        self.ws = re.compile(r"\s+")

    def simhash(self, text: str) -> int:
        toks = self.ws.split(text.lower().strip())
        v = np.zeros(self.nbits, dtype=np.int64)
        for i in range(len(toks) - 1):
            h = _md5_64(toks[i] + " " + toks[i + 1])
            for b in range(self.nbits):
                v[b] += 1 if (h >> b) & 1 else -1
        out = 0
        for b in range(self.nbits):
            if v[b] > 0:
                out |= 1 << b
        return out - (1 << 63)  # store as signed int64

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "simhash": [self.simhash(t) for t in df["text"]],
        })


def simhash_signatures(sf_dir: str, concurrency: int | None = None) -> rd.Dataset:
    from larbin_ray.pipelines import pool_size
    ds = load_documents(sf_dir, ["doc_id", "text"])
    return ds.map_batches(SimHasher, batch_format="pandas",
                          concurrency=concurrency or pool_size(), batch_size=512)


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by simhash hamming distance, bucketed by 16-bit
    chunks (a pair within distance 3 shares at least one of 4 chunks)."""
    sigs = simhash_signatures(sf_dir).to_pandas()
    vals = (sigs["simhash"].to_numpy().astype(np.int64) + (1 << 63)).astype(np.uint64)
    ids = sigs["doc_id"].to_numpy()
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, v in enumerate(vals):
        for c in range(4):
            chunk = int((v >> np.uint64(16 * c)) & np.uint64(0xFFFF))
            buckets.setdefault((c, chunk), []).append(i)
    seen_pairs = set()
    out = []
    for members in buckets.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                if (i, j) in seen_pairs:
                    continue
                seen_pairs.add((i, j))
                d = int(bin(int(vals[i]) ^ int(vals[j])).count("1"))
                if d <= max_hamming:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    out.append((a, b, d))
    return pd.DataFrame(sorted(set(out)), columns=["doc_a", "doc_b", "hamming"])


# ---------------------------------------------------------------------------
# composite curation pipeline


def curate_documents(sf_dir: str, min_tokens: int = 20, max_tokens: int = 1000,
                     min_stop_ratio: float = 0.0) -> pd.DataFrame:
    """Training-data curation composite: keep a document iff it is the
    exact-dedup keeper (min doc_id of its text group) AND its token count
    is within [min_tokens, max_tokens] AND its stopword ratio clears the
    floor.  Returns (doc_id, n_tokens, stop_ratio, keep_reason) for kept
    docs — the composition of the dedup + quality stages into one
    decision, the shape of a real corpus-curation job.

    SQL oracle: join of the GROUP BY text keeper subquery with the same
    token/stopword expressions."""
    ds = load_documents(sf_dir, ["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].str.strip()
        toks = t.str.split(_WS)
        n = toks.map(len)
        stop = set(STOPWORDS)
        ratio = toks.map(lambda ws: sum(1 for w in ws if w in stop)) / n
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "h": [_md5_64(x) for x in df["text"]],
            "n_tokens": n.astype("int64"),
            "stop_ratio": ratio.round(6),
        })

    scored = ds.map_batches(score, batch_format="pandas").to_pandas()
    keepers = scored.groupby("h", as_index=False).agg(keeper=("doc_id", "min"))
    merged = scored.merge(keepers, on="h")
    kept = merged[(merged["doc_id"] == merged["keeper"])
                  & (merged["n_tokens"] >= min_tokens)
                  & (merged["n_tokens"] <= max_tokens)
                  & (merged["stop_ratio"] >= min_stop_ratio)]
    out = kept[["doc_id", "n_tokens", "stop_ratio"]].copy()
    out["keep_reason"] = "keeper+quality"
    return out.sort_values("doc_id").reset_index(drop=True)
