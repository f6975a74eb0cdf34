"""strhash kernel + fetch _UrlIndex probe, incl. forced collisions."""

import numpy as np
import pyarrow as pa

from larbin_ray.kernels.strhash import HEAD, TAIL, hash_str_array
from larbin_ray.stages.fetch import _UrlIndex


def _scalar_ref(s: str) -> int:
    """Independent scalar implementation of the sampled hash."""
    b = s.encode()
    P, M = 1099511628211, 2 ** 64
    k = HEAD + TAIL
    pos = [min(j, max(len(b) - 1, 0)) for j in range(HEAD)]
    pos += [max(len(b) - TAIL + j, 0) for j in range(TAIL)]
    h = 0
    for j, p in enumerate(pos):
        v = b[p] if b else 0
        h = (h + v * pow(P, j, M)) % M
    return (h * P + len(b)) % M


def test_matches_scalar_reference():
    vals = ["", "a", "ab", "http://x.com/", "ümlaut", "a" * 300,
            "http://x.com/a", "x" * TAIL, "x" * (TAIL + 1)]
    h = hash_str_array(pa.array(vals, pa.string()))
    for i, s in enumerate(vals):
        assert int(h[i]) == _scalar_ref(s), s


def test_representations_agree():
    vals = ["", "a", "http://x.com/q?a=1", "ü" * 80, ""]
    arr = pa.array(vals, pa.string())
    h = hash_str_array(arr)
    assert np.array_equal(hash_str_array(pa.array(vals, pa.large_string())), h)
    assert np.array_equal(
        hash_str_array(pa.array([v.encode() for v in vals], pa.binary())), h)
    assert np.array_equal(hash_str_array(arr.slice(1, 3)), h[1:4])
    assert np.array_equal(
        hash_str_array(pa.chunked_array([arr.slice(0, 2), arr.slice(2)])), h)


def test_short_strings_fully_discriminated():
    # len <= TAIL is covered byte-for-byte: any single-byte change hashes
    # differently
    a = "http://host/p/abcdefghij.html"
    assert len(a) <= TAIL
    variants = [a[:i] + "Z" + a[i + 1:] for i in range(len(a))]
    h = hash_str_array(pa.array([a] + variants, pa.string()))
    assert len(np.unique(h)) == len(variants) + 1


def _colliding_pair() -> tuple[str, str]:
    """Two long urls differing only in unsampled middle bytes."""
    mid_a, mid_b = "AAAA", "BBBB"
    base = "http://hhh.example.com/"          # > HEAD chars
    tail = "/" + "t" * (TAIL - 1)
    ua, ub = base + mid_a + tail, base + mid_b + tail
    assert len(ua) == len(ub) > HEAD + TAIL
    return ua, ub


def test_collision_pair_collides():
    ua, ub = _colliding_pair()
    h = hash_str_array(pa.array([ua, ub], pa.string()))
    assert h[0] == h[1], "expected a sampled-hash collision by construction"


def test_probe_resolves_collisions_exactly():
    ua, ub = _colliding_pair()
    urls = [ua, ub, "http://other.example.com/x.html"]
    tbl = pa.table({"url": pa.array(urls, pa.string()),
                    "html": pa.array([b"A", b"B", b"C"], pa.binary())})
    index = _UrlIndex(tbl)
    batch = pa.array([ub, ua, "http://miss.example.com/", ua, ub], pa.string())
    pos = index.probe(batch)
    assert list(pos) == [1, 0, -1, 0, 1]
    # a colliding url NOT in the corpus must be a miss, not a wrong row
    uc = ua.replace("AAAA", "CCCC")
    assert list(index.probe(pa.array([uc], pa.string()))) == [-1]


def test_probe_duplicates_fuzz_vs_dict():
    """Randomized corpora with duplicate urls (incl. colliding pairs
    duplicated): probe must agree everywhere with the oracle's dict
    semantics — LAST occurrence wins (simcrawl.py:68) — with misses at
    -1.  Locks the r5 lexsort tiebreak under every mix of dup runs,
    collisions and misses."""
    rng = np.random.RandomState(1234)
    ua, ub = _colliding_pair()
    pool = ([f"http://s{i % 7}.example.com/p{i}.html" for i in range(40)]
            + [ua, ub])
    for trial in range(25):
        n = int(rng.randint(1, 120))
        urls = [pool[i] for i in rng.randint(0, len(pool), n)]
        tbl = pa.table({"url": pa.array(urls, pa.string()),
                        "html": pa.array([str(i).encode() for i in range(n)],
                                         pa.binary())})
        index = _UrlIndex(tbl)
        ref = {u: i for i, u in enumerate(urls)}        # last wins
        queries = ([pool[i] for i in rng.randint(0, len(pool), 30)]
                   + ["http://miss.example.com/a", ua + "x"])
        pos = index.probe(pa.array(queries, pa.string()))
        expect = [ref.get(q, -1) for q in queries]
        assert list(pos) == expect, f"trial {trial}"


def test_probe_empty_and_bulk():
    rng = np.random.RandomState(7)
    urls = [f"http://s{i % 13}.example.com/p/{i}/d{i}.html"
            for i in range(5000)]
    tbl = pa.table({"url": pa.array(urls, pa.string()),
                    "html": pa.array([b"x"] * 5000, pa.binary())})
    index = _UrlIndex(tbl)
    sel = rng.randint(0, 5000, 1000)
    batch = pa.array([urls[i] for i in sel] + ["http://nope/x"] * 10,
                     pa.string())
    pos = index.probe(batch)
    assert np.array_equal(pos[:1000], sel)
    assert (pos[1000:] == -1).all()
