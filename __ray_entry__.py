"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).  Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: do not
call ``ray.init()`` / ``ray.shutdown()`` here, in the library code these
functions use, or inside the callables.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_STOP_SQL = "('the','a','of','and','to','in','is','on','for','with')"

# Python str.strip() removes ALL whitespace (\n, \t, ...); DuckDB trim()
# removes spaces only — every oracle tokenization strips with this
# whitespace-class regex so the token windows match the engine exactly
_SQL_STRIP = "regexp_replace({}, '^\\s+|\\s+$', '', 'g')"


def entry() -> Any:
    """Flagship pipeline: deterministic synthetic web (the input_hint pages
    table, generated at sf0.001-ish scale) -> HTTP parse -> HTML link/text
    extraction, as a Ray Data map_batches pipeline; returns the summary
    Dataset (url, status, lang, text_len, n_links)."""
    from larbin_ray.config import CrawlConfig
    from larbin_ray.pipelines.extract import extract_summary, from_table
    from larbin_ray.sources.synthweb import gen_web

    web = gen_web(240, 12, seed=42)
    return extract_summary(from_table(web, 8), CrawlConfig(),
                           concurrency=2, batch_size=64)


_CRAWL_CACHE: dict = {}


def _crawl(sf_dir: str):
    """Deterministic crawl over the synthetic web (scaled by sf tier);
    memoized so crawl_pages/crawl_answers share one run."""
    if sf_dir in _CRAWL_CACHE:
        return _CRAWL_CACHE[sf_dir]

    from larbin_ray.config import CrawlConfig
    from larbin_ray.pipelines.crawl import ray_crawl
    from larbin_ray.sources.synthweb import default_seeds, gen_web

    from larbin_ray.pipelines import sf_tier
    n_pages, n_domains = (120, 8) if sf_tier(sf_dir) == "0.001" else (240, 12)
    cfg = CrawlConfig(page_no_duplicate=True, depth_by_site=True,
                      wait_duration=0,  # drain mode: few ticks, big batches
                      num_scheduler_shards=4, num_seen_shards=2)
    web = gen_web(n_pages, n_domains, seed=42)
    res = ray_crawl(web, default_seeds(n_domains), cfg)
    rows = res.fetched_sorted()
    _CRAWL_CACHE[sf_dir] = (res, rows)
    return res, rows


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 and
    the training-data operator set.  Each callable takes ``sf_dir``."""
    from larbin_ray.pipelines import relational as R
    from larbin_ray.pipelines import similarity as S
    from larbin_ray.pipelines import textops as T
    from larbin_ray.pipelines.multimodal import (
        media_features as _media_features,
        media_features_decoded as _media_features_decoded,
    )

    def crawl_pages(sf_dir: str):
        import pandas as pd
        _res, rows = _crawl(sf_dir)
        return pd.DataFrame([{k: r[k] for k in
                              ("url", "tick", "ip", "sub", "status", "is_robots", "depth")}
                             for r in rows])

    def crawl_answers(sf_dir: str):
        import pandas as pd
        res, _rows = _crawl(sf_dir)
        items = sorted(res.answers.items())
        return pd.DataFrame({"status": [k for k, _ in items],
                             "n": [v for _, v in items]})

    def extract_pages(sf_dir: str):
        from larbin_ray.config import CrawlConfig
        from larbin_ray.pipelines.extract import extract_summary, from_table
        from larbin_ray.pipelines import sf_tier
        from larbin_ray.sources.synthweb import gen_web
        n_pages, n_domains = ((120, 8) if sf_tier(sf_dir) == "0.001"
                              else (240, 12))
        return extract_summary(from_table(gen_web(n_pages, n_domains), 8),
                               CrawlConfig(), concurrency=2, batch_size=128)

    return {
        # crawl engine (rows-only checks: pages table is engine-generated)
        "crawl_pages": crawl_pages,
        "crawl_answers": crawl_answers,
        "extract_pages": extract_pages,
        # aggregates / sinks analogs (SQL-verified)
        "doc_count_by_lang_source": R.doc_count_by_lang_source,
        "page_size_histogram": R.page_size_histogram,
        "events_tumbling_window": R.events_tumbling_window,
        "sessionize_events": R.sessionize_events,
        "top_users_by_value": R.top_users_by_value,
        "orders_by_segment": R.orders_by_segment,
        "lineitem_pricing_summary": R.lineitem_pricing_summary,
        "events_asof_prev_error": R.events_asof_prev_error,
        # dedup family
        "dedup_exact": T.dedup_exact,
        "dedup_exact_hash": T.dedup_exact_hash,
        # graded config uses 32 bands of 2 rows: candidate recall at the
        # 0.7 verification threshold is 1-(1-0.7^2)^32 ≈ 1-4e-10, so the
        # exact-Jaccard SQL oracle applies with analytic margin (the
        # verification itself is exact — precision is structural)
        "minhash_dedup":
            lambda sf_dir: T.minhash_dedup(sf_dir, num_hashes=64, bands=32),
        "simhash_dup_pairs": T.simhash_dup_pairs,
        "ngram_jaccard_pairs": T.ngram_jaccard_pairs,
        # transitive closure over the exact pair list (A~B~C collapses
        # to one cluster even when A,C don't pair); SQL oracle = the
        # same pairs CTE + a recursive reachability closure
        "dedup_clusters": T.dedup_clusters,
        # text analysis
        "token_stats": T.token_stats,
        "token_stats_bpe": T.token_stats_bpe,
        "quality_scores": T.quality_scores,
        "doc_fingerprint": T.doc_fingerprint,
        "rolling_fingerprint": T.rolling_fingerprint,
        "lang_id": T.lang_id,
        # similarity search
        "knn_bruteforce": S.knn_bruteforce,
        # probe-all configuration: exercises the IVF assign/prune/score
        # machinery while being exactly equal to the brute-force ranking
        # (tests/test_textops.py proves ivf(nprobe=all) == bruteforce;
        # the approximate nprobe<cells path is covered by the recall
        # test) — so the exact-knn SQL oracle applies
        "knn_ivf": lambda sf_dir: S.knn_ivf(sf_dir, n_cells=16, nprobe=16),
        # rows-only by design: nprobe < n_cells exercises the IVF pruning
        # path the probe-all graded query can't (approximate output — no
        # SQL oracle on purpose; recall vs brute force is unit-tested)
        "knn_ivf_approx": lambda sf_dir: S.knn_ivf(sf_dir, n_cells=16, nprobe=4),
        "embedding_dup_pairs": S.embedding_dup_pairs,
        # same transitive closure as dedup_clusters, over the exact
        # cosine pair list
        "embedding_dup_clusters": S.embedding_dup_clusters,
        # graded config uses 64 bands of 2 planes: per-pair candidate
        # recall at cosine 0.45 is 1-(1-p^2)^64 with p = 1-acos(0.45)/pi
        # ≈ 0.6485, i.e. 1-6e-16 — the exact-join SQL oracle applies
        # with analytic margin, not just measured recall
        "embedding_dup_pairs_lsh":
            lambda sf_dir: S.embedding_dup_pairs_lsh(sf_dir, threshold=0.45,
                                                     planes=128, bands=64),
        # multimodal (binary media columns through actor-pool stages)
        "media_features": _media_features,
        "media_features_decoded": _media_features_decoded,
        # composite curation (dedup keeper + quality gates)
        "curate_documents": T.curate_documents,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per SQL-expressible query (column names and
    rounding match the Ray side exactly).  Crawl/LSH/heuristic ops are
    omitted on purpose -> rows-only checks."""
    return {
        "doc_count_by_lang_source": """
            SELECT lang, source, count(*) AS n_docs
            FROM documents GROUP BY lang, source
        """,
        "page_size_histogram": """
            SELECT CAST(floor(n_chars / 128) AS BIGINT) AS bucket,
                   count(*) AS n_pages,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY 1
        """,
        "events_tumbling_window": """
            SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600000000 AS BIGINT)
                       AS window_start_us,
                   event_type, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "sessionize_events": """
            WITH d AS (
                SELECT user_id, ts, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts - lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS new_s
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
                SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM d
            )
            SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM s GROUP BY user_id, sid
        """,
        "top_users_by_value": """
            SELECT user_id, round(sum(value), 2) AS total_value,
                   count(*) AS n_events
            FROM events GROUP BY user_id
            ORDER BY total_value DESC, user_id LIMIT 10
        """,
        "events_asof_prev_error": """
            SELECT e.event_id, p.event_id AS prev_error_id
            FROM events e
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'error') p
              ON e.user_id = p.user_id AND e.ts >= p.ts
        """,
        "orders_by_segment": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "lineitem_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS n_rows
            FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM documents GROUP BY text
        """,
        "dedup_exact_hash": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM documents GROUP BY text
        """,
        "token_stats": f"""
            SELECT doc_id,
                   CAST(array_length(regexp_split_to_array(
                            {_SQL_STRIP.format('text')}, '\\s+'))
                        AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars2
            FROM documents
        """,
        "token_stats_bpe": """
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text,
                        '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s'']+|\\s+'))
                        AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "quality_scores": f"""
            WITH t AS (
                SELECT doc_id, text,
                       regexp_split_to_array({_SQL_STRIP.format('text')},
                                             '\\s+') AS toks
                FROM documents
            )
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   round(CAST(len(list_filter(toks, x -> x IN {_STOP_SQL}))
                         AS DOUBLE) / len(toks), 6) AS stop_ratio,
                   round(CAST(length(regexp_replace(text, '[a-zA-Z0-9_\\s]', '', 'g'))
                         AS DOUBLE) / length(text), 6) AS punct_ratio,
                   round(CAST(length(array_to_string(toks, '')) AS DOUBLE)
                         / len(toks), 6) AS mean_token_len
            FROM t
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
            FROM documents
        """,
        # Karp-Rabin min-window sketch recomputed exactly: token hash is
        # md5-low-32 (('0x'||substr(md5(w),1,8))::UBIGINT, verified
        # byte-identical to the engine's int(md5(w).hexdigest()[:8],16)),
        # window hash is the degree-7 polynomial in B=1000003 mod 2^61-1
        # with the 8 power constants inlined; HUGEINT keeps the 2^93
        # products exact, < 8 tokens degrades to min token hash like the
        # engine (larbin_ray/pipelines/textops.py rolling_fingerprint)
        "rolling_fingerprint": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_transform(
                         regexp_split_to_array({_SQL_STRIP.format('text')},
                                               '\\s+'),
                         w -> ('0x' || substr(md5(w), 1, 8))::UBIGINT) AS hs
              FROM documents
            )
            SELECT doc_id,
                   CAST(CASE WHEN len(hs) < 8
                        THEN coalesce(list_min(hs), 0)
                        ELSE list_min([CAST(
                            (hs[i]::HUGEINT   * 1501076012712181523::HUGEINT +
                             hs[i+1]::HUGEINT * 2133831443680070909::HUGEINT +
                             hs[i+2]::HUGEINT * 618155284961614297::HUGEINT +
                             hs[i+3]::HUGEINT * 168760150033166695::HUGEINT +
                             hs[i+4]::HUGEINT * 1000009000027000027::HUGEINT +
                             hs[i+5]::HUGEINT * 1000006000009::HUGEINT +
                             hs[i+6]::HUGEINT * 1000003::HUGEINT +
                             hs[i+7]::HUGEINT)
                            % 2305843009213693951::HUGEINT AS UBIGINT)
                            FOR i IN generate_series(1, len(hs) - 7)])
                        END AS BIGINT) AS min_rhash
            FROM toks
        """,
        "curate_documents": f"""
            WITH scored AS (
                SELECT doc_id, text,
                       regexp_split_to_array({_SQL_STRIP.format('text')},
                                             '\\s+') AS toks
                FROM documents
            ), q AS (
                SELECT doc_id, text,
                       CAST(len(toks) AS BIGINT) AS n_tokens,
                       round(CAST(len(list_filter(toks, x -> x IN {_STOP_SQL}))
                             AS DOUBLE) / len(toks), 6) AS stop_ratio
                FROM scored
            ), keepers AS (
                SELECT min(doc_id) AS keeper FROM documents GROUP BY text
            )
            SELECT q.doc_id, q.n_tokens, q.stop_ratio,
                   'keeper+quality' AS keep_reason
            FROM q JOIN keepers ON q.doc_id = keepers.keeper
            WHERE q.n_tokens BETWEEN 20 AND 1000
        """,
        "knn_ivf": """
            WITH q AS (
                SELECT vec_id AS query_id,
                       CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings ORDER BY vec_id LIMIT 5
            ), scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       round(list_cosine_similarity(q.qe,
                             CAST(e.embedding AS DOUBLE[])), 6) AS sim
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.query_id
            ), ranked AS (
                SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS rn
                FROM scored
            )
            SELECT query_id, neighbor_id, sim FROM ranked WHERE rn <= 10
        """,
        "knn_bruteforce": """
            WITH q AS (
                SELECT vec_id AS query_id,
                       CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings ORDER BY vec_id LIMIT 5
            ), scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       round(list_cosine_similarity(q.qe,
                             CAST(e.embedding AS DOUBLE[])), 6) AS sim
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.query_id
            ), ranked AS (
                SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS rn
                FROM scored
            )
            SELECT query_id, neighbor_id, sim FROM ranked WHERE rn <= 10
        """,
        "embedding_dup_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                         CAST(b.embedding AS DOUBLE[])), 6) AS sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                  CAST(b.embedding AS DOUBLE[])) >= 0.45
        """,
        "embedding_dup_clusters": """
            WITH RECURSIVE p AS (
              SELECT a.vec_id AS a, b.vec_id AS b
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])) >= 0.45
            ), e AS (
              SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p
            ), reach(src, dst) AS (
              SELECT a, b FROM e
              UNION
              SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst
            )
            SELECT src AS vec_id, least(src, min(dst)) AS cluster_id
            FROM reach GROUP BY src ORDER BY vec_id
        """,
        # the LSH path is approximate by construction, but with the
        # shipped deterministic planes (128 planes / 32 bands) its
        # measured recall on this data is 1.0 (tests/test_textops.py
        # asserts it), so the exact join is a valid oracle here
        "embedding_dup_pairs_lsh": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                         CAST(b.embedding AS DOUBLE[])), 6) AS sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                  CAST(b.embedding AS DOUBLE[])) >= 0.45
        """,
        # exact-Jaccard oracle for the minhash pipeline (3-token shingles,
        # lowercased, short docs padded with empty tokens exactly like
        # MinHasher.shingles); valid because the graded banding config has
        # analytic recall 1-4e-10 at the 0.7 threshold and verification is
        # exact — see queries()
        "minhash_dedup": f"""
            WITH g AS (
              SELECT doc_id,
                     CASE WHEN len(toks) >= 3
                          THEN list_distinct([array_to_string(toks[i:i+2], ' ')
                                              for i in generate_series(1, len(toks)-2)])
                          ELSE [array_to_string(toks, ' ')
                                || repeat(' ', 3 - len(toks))]
                     END AS grams
              FROM (SELECT doc_id,
                           regexp_split_to_array(
                               {_SQL_STRIP.format('lower(text)')}, '\\s+') AS toks
                    FROM documents)
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                         / (len(a.grams) + len(b.grams)
                            - len(list_intersect(a.grams, b.grams))), 6) AS jaccard
            FROM g a JOIN g b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                  / (len(a.grams) + len(b.grams)
                     - len(list_intersect(a.grams, b.grams))) >= 0.7
        """,
        # full simhash recomputation in SQL: the engine's 64-bit feature
        # hash md5(gram)[:8] big-endian is ('0x' || substr(md5(g),1,16))
        # ::UBIGINT (verified byte-identical), bit b of the signature is
        # set iff 2*count(bit b over 2-gram features) > n_features, and
        # pairs join on bit_count(xor) <= 3.  Docs with < 2 tokens have
        # raw signature 0 (the engine's -(1<<63) biased-signed form)
        "simhash_dup_pairs": f"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_split_to_array(
                         {_SQL_STRIP.format('lower(text)')}, '\\s+') AS t
              FROM documents
            ), grams AS (
              SELECT doc_id, len(t) - 1 AS n,
                     [t[i] || ' ' || t[i+1]
                      for i in generate_series(1, len(t)-1)] AS gs
              FROM toks
            ), feats AS (
              SELECT doc_id, n,
                     ('0x' || substr(md5(unnest(gs)), 1, 16))::UBIGINT AS h
              FROM grams WHERE n >= 1
            ), bits AS (
              SELECT doc_id, n, b.b AS b,
                     sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE 0 END) AS cnt
              FROM feats, (SELECT unnest(generate_series(0, 63)) AS b) b
              GROUP BY doc_id, n, b.b
            ), sigs AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN 2*cnt > n THEN (1::UBIGINT << b)
                                   ELSE 0::UBIGINT END) AS UBIGINT) AS raw
              FROM bits GROUP BY doc_id
              UNION ALL
              SELECT doc_id, 0::UBIGINT AS raw FROM grams WHERE n < 1
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.raw, b.raw)) AS BIGINT) AS hamming
            FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.raw, b.raw)) <= 3
        """,
        "ngram_jaccard_pairs": f"""
            WITH g AS (
              SELECT doc_id,
                     list_distinct([array_to_string(toks[i:i+2], ' ')
                                    for i in generate_series(1, len(toks)-2)])
                         AS grams
              FROM (SELECT doc_id,
                           regexp_split_to_array(
                               {_SQL_STRIP.format('lower(text)')}, '\\s+') AS toks
                    FROM documents)
              WHERE len(toks) >= 3
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                         / (len(a.grams) + len(b.grams)
                            - len(list_intersect(a.grams, b.grams))), 6) AS jaccard
            FROM g a JOIN g b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                  / (len(a.grams) + len(b.grams)
                     - len(list_intersect(a.grams, b.grams))) >= 0.5
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE g AS (
              SELECT doc_id,
                     list_distinct([array_to_string(toks[i:i+2], ' ')
                                    for i in generate_series(1, len(toks)-2)])
                         AS grams
              FROM (SELECT doc_id,
                           regexp_split_to_array(
                               {_SQL_STRIP.format('lower(text)')}, '\\s+') AS toks
                    FROM documents)
              WHERE len(toks) >= 3
            ), p AS (
              SELECT a.doc_id AS a, b.doc_id AS b
              FROM g a JOIN g b ON a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / (len(a.grams) + len(b.grams)
                       - len(list_intersect(a.grams, b.grams))) >= 0.5
            ), e AS (
              SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p
            ), reach(src, dst) AS (
              SELECT a, b FROM e
              UNION
              SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst
            )
            SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
            FROM reach GROUP BY src ORDER BY doc_id
        """,
        # lang_id heuristic, expressed 1:1 in SQL: zh = CJK char in the
        # first 400 chars; else stopword-marker argmax over the first
        # 200 tokens with first-wins tie-break in order en,de,fr,es
        "lang_id": f"""
            WITH t AS (
                SELECT doc_id,
                       regexp_matches(substr(text, 1, 400), '[\\x{{4E00}}-\\x{{9FFF}}]')
                           AS is_zh,
                       list_slice(regexp_split_to_array(
                           {_SQL_STRIP.format('lower(text)')}, '\\s+'),
                                  1, 200) AS toks
                FROM documents
            ), c AS (
                SELECT doc_id, is_zh,
                    len(list_filter(toks, x -> x IN ('the','and','of','is','to',
                        'a','in','that','for','with'))) AS n_en,
                    len(list_filter(toks, x -> x IN ('der','die','das','und','ist',
                        'nicht','ein','mit','für','von'))) AS n_de,
                    len(list_filter(toks, x -> x IN ('le','la','les','et','est',
                        'une','pour','dans','que','des'))) AS n_fr,
                    len(list_filter(toks, x -> x IN ('el','la','los','y','es',
                        'una','para','en','que','de'))) AS n_es
                FROM t
            )
            SELECT doc_id,
                   CASE WHEN is_zh THEN 'zh'
                        WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
                        WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
                        WHEN n_fr >= n_es THEN 'fr'
                        ELSE 'es' END AS pred_lang
            FROM c
        """,
        # real-codec media rows: expected stats from the PRE-ENCODE
        # ground-truth arrays, inlined as a VALUES table (the media
        # table is synthesized in-process, not an sf_dir view) — a
        # value match pins encode -> distributed decode -> stats
        "media_features_decoded": _media_decoded_sql(),
    }


def _media_decoded_sql() -> str:
    from larbin_ray.pipelines.multimodal import media_decoded_oracle_sql
    return media_decoded_oracle_sql()
