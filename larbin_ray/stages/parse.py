"""Parse + extract stage: the per-batch transform that turns raw fetched
responses into page results + candidate links.

This is the Ray-Data expression of the reference's per-connection parser
(``html`` state machine, file.cxx) — reference parses incrementally per
socket; we parse completed response buffers per Arrow batch.  Stateless
per row, so it runs as a ``map_batches`` callable-class actor pool
(config precompiled once per actor in ``__init__``).

Input batch columns  : url(string), depth(int32), is_robots(bool) [+ passthrough]
plus html(binary) — the fetched response (empty => noConnection).
Output batch columns : url, depth, is_robots, status, text(binary),
content_hash(int64), interesting(bool), links(list<struct<host:binary,
port:int32, file:binary, depth:int32, redir:bool, order:int32>>),
stateless_errors(list<string>).
"""

from __future__ import annotations

import pyarrow as pa

from larbin_ray.config import CrawlConfig
from larbin_ray.kernels.extract import ExtractResult, admit_link, extract_links
from larbin_ray.kernels.httpparse import content_dup_code, parse_response
from larbin_ray.kernels.urlnorm import Url, parse_url

LINK_STRUCT = pa.struct([
    ("host", pa.binary()),
    ("port", pa.int32()),
    ("file", pa.binary()),
    ("depth", pa.int32()),
    ("redir", pa.bool_()),
    ("order", pa.int32()),
    ("hash", pa.int64()),       # url.cxx:474-482 hashCode, precomputed in-stage
    ("prio", pa.int8()),        # 0 = priority-ext url (specificSearch), 1 = normal
    ("cookie", pa.binary()),    # inherited same-host cookie (useCookies)
])

PARSE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("depth", pa.int32()),
    ("is_robots", pa.bool_()),
    ("status", pa.string()),
    ("text", pa.binary()),
    ("content_hash", pa.int64()),
    ("interesting", pa.bool_()),
    ("links", pa.list_(LINK_STRUCT)),
    ("stateless_errors", pa.list_(pa.string())),
])


def candidate_dicts(res: ExtractResult, priv_exts: tuple[bytes, ...] = ()) -> list[dict]:
    from larbin_ray.kernels.textutil import match_priv_ext

    return [
        {"host": c.url.host, "port": c.url.port, "file": c.url.file,
         "depth": c.url.depth, "redir": c.is_redir, "order": c.order,
         "hash": c.url.hash_code(),
         "prio": 0 if (priv_exts and match_priv_ext(c.url.file, priv_exts)) else 1,
         "cookie": c.url.cookie}
        for c in res.candidates
    ]


def timed_out(raw: bytes, latency_ms: int, cfg: CrawlConfig) -> bool:
    """The fetch timeout model (fetch_pipe.cxx:48-72 + :208): a fetch
    gets ``timeout_page`` seconds plus 1 s per ``timeout_incr`` bytes
    delivered; simulated server latency beyond that budget means the
    read never completed -> FetchError ``timeout`` (types.h:114)."""
    if latency_ms <= cfg.timeout_page * 1000:
        return False
    return latency_ms > (cfg.timeout_page + len(raw) // cfg.timeout_incr) * 1000


def parse_one(url_s: str, depth: int, raw: bytes, cfg: CrawlConfig,
              domains, forb, priv_exts: tuple[bytes, ...] = (),
              cookie: bytes | None = None, latency_ms: int = 0,
              url_memo: dict | None = None
              ) -> tuple[str, bytes, int, bool, list[dict], list[str]]:
    """-> (status, text, content_hash, interesting, links, stateless_errors).

    ``status`` here is pre-dedup: 'success' means an HTML body was parsed
    (the content-dup check happens in the driver against the sharded dup
    bitset, preserving deterministic order — file.cxx:583-588 runs it
    before parseHtml; we compute the hash here and let the dup owner
    decide, discarding the links of dropped duplicates)."""
    if len(raw) == 0:
        return "noConnection", b"", -1, False, [], []
    if timed_out(raw, latency_ms, cfg):
        return "timeout", b"", -1, False, [], []
    here = parse_url(url_s.encode("latin-1"), depth, None)
    here.cookie = cookie
    r = parse_response(raw, cfg, cookie)
    if r.status == "err30X":
        links: list[dict] = []
        errors: list[str] = []
        if r.location is not None:
            res = ExtractResult([], [])
            base = here.give_base()
            nouv = parse_url(r.location, here.depth, base)  # same depth, file.cxx:550
            admit_link(nouv, here, True, cfg, 0, res, domains, forb)
            links = candidate_dicts(res, priv_exts)
            errors = res.errors
        return "err30X", b"", -1, False, links, errors
    if r.status != "html":
        return r.status, b"", -1, False, [], []
    here.cookie = r.cookie          # Set-Cookie capture before link admission
    chash = content_dup_code(r.body) if cfg.page_no_duplicate else -1
    res = extract_links(here, r.body, cfg, domains, forb, url_memo=url_memo)
    return "success", r.body, chash, r.interesting, candidate_dicts(res, priv_exts), res.errors


class ParseExtract:
    """map_batches callable: one instance per actor, config baked in."""

    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self.domains = cfg.domains_bytes()
        self.forb = cfg.forbidden_ext_bytes()
        self.priv_exts = (tuple(e.encode() for e in cfg.privileged_exts)
                          if cfg.specific_search else ())
        # Per-actor caches (live across batches and ticks).  Links repeat
        # heavily across a site's pages, so the href -> (host, port, file)
        # parse memo and the (host, port, file) -> hashCode memo each turn
        # the per-candidate cost into one dict probe after first sight.
        # Capped (extract._MEMO_CAP / here) by wholesale clear — the hot
        # keys re-enter within a batch.  hash_memo keys carry file paths
        # (≤ 1024 B each), so it is ALSO byte-bounded: an adversarial
        # long-href corpus stays ~64 MB/worker instead of ~0.5 GB at the
        # entry cap alone (checked per batch via _hash_memo_bytes).
        from larbin_ray.kernels.extract import UrlMemo
        self._url_memo: dict = UrlMemo()
        self._hash_memo: dict = {}
        self._hash_memo_bytes = 0
        self._route_cache: dict[bytes, int] = {}

    def parse_to_entries(self, batch: pa.Table, n_sched: int
                         ) -> tuple[pa.Table, dict[int, list]]:
        """Crawl-path variant of __call__: returns the parse table
        WITHOUT the links column plus the per-scheduler-shard admission
        entries directly — candidates go straight from the extractor to
        entry tuples, skipping the dict -> Arrow struct -> pylist ->
        tuple round-trip of the generic ``__call__`` path (per-candidate
        cost is the crawl's hot loop; the flagship extract pipeline keeps
        the links column and never builds entries)."""
        from larbin_ray.kernels.textutil import match_priv_ext
        from larbin_ray.stages.scheduler import route_host

        cfg = self.cfg
        puny = cfg.punycode
        urls = batch["url"].to_pylist()
        depths = batch["depth"].to_pylist()
        robots_flags = batch["is_robots"].to_pylist()
        cookies = batch["cookie"].to_pylist() if "cookie" in batch.column_names \
            else [None] * len(urls)
        ips = batch["ip"].to_pylist()
        subs = batch["sub"].to_pylist()
        raws = batch["html"].to_pylist()
        lats = batch["latency_ms"].to_pylist() if "latency_ms" in batch.column_names \
            else [0] * len(urls)
        statuses, texts, chashes, interests, err_col = [], [], [], [], []
        entries_by_shard: dict[int, list] = {}
        route_cache = self._route_cache
        hash_memo = self._hash_memo
        if len(route_cache) >= 1 << 19:
            route_cache.clear()
        if len(hash_memo) >= 1 << 19 or self._hash_memo_bytes >= 64 << 20:
            hash_memo.clear()
            self._hash_memo_bytes = 0
        memo_bytes = 0
        for i, (url_s, depth, is_rob, raw, ck) in enumerate(
                zip(urls, depths, robots_flags, raws, cookies)):
            raw = raw or b""
            if is_rob:
                statuses.append("robots")
                texts.append(raw)
                chashes.append(-1)
                interests.append(False)
                err_col.append([])
                continue
            st, text, ch, inter, res = self._parse_res(url_s, depth, raw, ck,
                                                       lats[i] or 0)
            statuses.append(st)
            texts.append(text)
            chashes.append(ch)
            interests.append(inter)
            err_col.append(res.errors if res is not None else [])
            if res is None or not res.candidates:
                continue
            p_ip, p_sub = ips[i], subs[i]
            for c in res.candidates:
                cu = c.url
                host = cu.host
                sid = route_cache.get(host)
                if sid is None:
                    sid = route_host(host, n_sched, puny)
                    route_cache[host] = sid
                prio = 0 if (self.priv_exts
                             and match_priv_ext(cu.file, self.priv_exts)) else 1
                hkey = (host, cu.port, cu.file)
                hc = hash_memo.get(hkey)
                if hc is None:
                    hc = cu.hash_code()
                    hash_memo[hkey] = hc
                    memo_bytes += len(host) + len(cu.file) + 120
                entries_by_shard.setdefault(sid, []).append(
                    (prio, p_ip, p_sub, c.order, host, cu.port, cu.file,
                     cu.depth, hc, p_ip, p_sub, cu.cookie))
        self._hash_memo_bytes += memo_bytes
        cols = {
            "url": batch["url"],
            "depth": batch["depth"],
            "is_robots": batch["is_robots"],
            "status": pa.array(statuses, pa.string()),
            "text": pa.array(texts, pa.binary()),
            "content_hash": pa.array(chashes, pa.int64()),
            "interesting": pa.array(interests, pa.bool_()),
            "stateless_errors": pa.array(err_col, pa.list_(pa.string())),
        }
        for name in batch.column_names:
            if name not in ("url", "depth", "is_robots", "html",
                            "latency_ms") and name not in cols:
                cols[name] = batch[name]
        return pa.table(cols), entries_by_shard

    def _parse_res(self, url_s: str, depth: int, raw: bytes,
                   cookie: bytes | None, latency_ms: int = 0):
        """parse_one, but returning the raw ExtractResult (no candidate
        dicts).  -> (status, text, chash, interesting, res|None)."""
        cfg = self.cfg
        if len(raw) == 0:
            return "noConnection", b"", -1, False, None
        if timed_out(raw, latency_ms, cfg):
            return "timeout", b"", -1, False, None
        here = parse_url(url_s.encode("latin-1"), depth, None)
        here.cookie = cookie
        r = parse_response(raw, cfg, cookie)
        if r.status == "err30X":
            res = None
            if r.location is not None:
                res = ExtractResult([], [])
                base = here.give_base()
                nouv = parse_url(r.location, here.depth, base)
                admit_link(nouv, here, True, cfg, 0, res, self.domains, self.forb)
            return "err30X", b"", -1, False, res
        if r.status != "html":
            return r.status, b"", -1, False, None
        here.cookie = r.cookie
        chash = content_dup_code(r.body) if cfg.page_no_duplicate else -1
        res = extract_links(here, r.body, cfg, self.domains, self.forb,
                            url_memo=self._url_memo)
        return "success", r.body, chash, r.interesting, res

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        urls = batch["url"].to_pylist()
        depths = batch["depth"].to_pylist() if "depth" in batch.column_names \
            else [cfg.depth_in_site] * len(urls)
        robots_flags = batch["is_robots"].to_pylist() if "is_robots" in batch.column_names \
            else [False] * len(urls)
        cookies = batch["cookie"].to_pylist() if "cookie" in batch.column_names \
            else [None] * len(urls)
        raws = batch["html"].to_pylist()
        lats = batch["latency_ms"].to_pylist() if "latency_ms" in batch.column_names \
            else [0] * len(urls)
        statuses, texts, chashes, interests, links_col, err_col = [], [], [], [], [], []
        for url_s, depth, is_rob, raw, ck, lat in zip(urls, depths, robots_flags,
                                                      raws, cookies, lats):
            raw = raw or b""
            if is_rob:
                # robots bodies are parsed by the scheduler shard that owns
                # the host; pass the raw body through as text
                statuses.append("robots")
                texts.append(raw)
                chashes.append(-1)
                interests.append(False)
                links_col.append([])
                err_col.append([])
                continue
            st, text, ch, inter, links, errs = parse_one(
                url_s, depth, raw, cfg, self.domains, self.forb,
                self.priv_exts, ck, lat or 0, url_memo=self._url_memo)
            statuses.append(st)
            texts.append(text)
            chashes.append(ch)
            interests.append(inter)
            links_col.append(links)
            err_col.append(errs)
        cols = {
            "url": pa.array(urls, pa.string()),
            "depth": pa.array(depths, pa.int32()),
            "is_robots": pa.array(robots_flags, pa.bool_()),
            "status": pa.array(statuses, pa.string()),
            "text": pa.array(texts, pa.binary()),
            "content_hash": pa.array(chashes, pa.int64()),
            "interesting": pa.array(interests, pa.bool_()),
            "links": pa.array(links_col, pa.list_(LINK_STRUCT)),
            "stateless_errors": pa.array(err_col, pa.list_(pa.string())),
        }
        # passthrough columns (warc_ts, lang, tick, ip, ...) ride along
        for name in batch.column_names:
            if name not in ("url", "depth", "is_robots", "html") and name not in cols:
                cols[name] = batch[name]
        return pa.table(cols)


_WORKER_PE: dict = {}


def worker_parse_extract(cfg: CrawlConfig) -> ParseExtract:
    """Per-worker-process ParseExtract cache for the TASK-based crawl
    path (``_process_task`` is a stateless Ray task; a fresh instance
    per task would drop the href/hashCode memos every batch).  Keyed by
    the pickled config so runs with different configs never alias; one
    instance is kept (inserting a new key evicts the old), so a
    long-lived worker serving many crawls holds one memo set.  Reuse
    across runs of the SAME config is sound: the memoized functions
    (parse_url, hashCode, shard routing) are pure in (cfg, inputs)."""
    import pickle

    key = pickle.dumps(cfg)
    pe = _WORKER_PE.get(key)
    if pe is None:
        _WORKER_PE.clear()
        pe = _WORKER_PE[key] = ParseExtract(cfg)
    return pe


def links_from_row(links_cell: list[dict]) -> list[tuple[Url, bool, int]]:
    return [
        (Url(d["host"], d["port"], d["file"], d["depth"]), d["redir"], d["order"])
        for d in links_cell
    ]
