"""Deterministic synthetic web — the pages table of the ``input_hint``:

    url:      string       (absolute http URL, normalized form)
    warc_ts:  timestamp[us]
    html:     binary       (full HTTP response: status line + headers + CRLF CRLF + body)
    text:     string       (oracle column: body bytes after the header terminator)
    lang:     string

Deterministic in (n_pages, n_domains, seed); closed link graph (links
point only at generated URLs or at deliberate decoys the kernels must
drop).  The generator exercises every FetchError outcome of the
reference taxonomy (types.h:108-127) plus the parser quirks:
normalization variants, comment decoys, base-href overrides, robots
records (weak/strong/404), redirect chains, duplicate bodies,
wrong-content-type / too-big / truncated responses, dead-DNS and
no-connection hosts, a literal-IP host.
"""

from __future__ import annotations

import datetime
import itertools
import random

import pyarrow as pa

_BASE_TS = datetime.datetime(2024, 1, 1, 0, 0, 0)
_LANGS = ["en", "zh", "de", "fr"]


def domain_name(d: int) -> str:
    """Letter-encoded domain names: the content-dup hash only feeds on
    letters (hash_duplicate.cxx:88), so hostnames must differ in letters
    or structurally-identical pages on different hosts collide."""
    return "site" + "".join(chr(ord("a") + int(c)) for c in str(d)) + ".example"


def _response(body: bytes, status: bytes = b"200 OK",
              ctype: bytes | None = b"text/html",
              extra: list[bytes] = (), clen: int | None = None) -> bytes:
    head = b"HTTP/1.0 " + status + b"\r\nServer: synthweb\r\n"
    if ctype is not None:
        head += b"Content-Type: " + ctype + b"\r\n"
    if clen is not None:
        head += b"Content-Length: %d\r\n" % clen
    for h in extra:
        head += h + b"\r\n"
    return head + b"\r\n" + body


def _page_body(host: str, links: list[str], title: str,
               base_href: str | None = None, filler: str = "") -> bytes:
    parts = [f"<html><head><title>{title}</title>"]
    if base_href:
        parts.append(f'<base href="{base_href}">')
    parts.append("</head><body>")
    parts.append(f"<h1>{title} on {host}</h1>")
    parts.append(f"<p>{filler}</p>")
    for i, l in enumerate(links):
        parts.append(f'<a href="{l}">link {i}</a>')
    # decoys every page: comment-wrapped, non-http schemes, fragment, cgi
    parts.append('<!-- <a href="/decoy/hidden.html"> -->')
    parts.append('<a href="mailto:x@example.org">mail</a>')
    parts.append('<a href="ftp://ftp.example.org/f">ftp</a>')
    parts.append('<a href="/search.html?q=1">cgi</a>')
    parts.append("</body></html>")
    return "".join(parts).encode()


def gen_web(n_pages: int = 240, n_domains: int = 12, seed: int = 42) -> pa.Table:
    """Build the pages table.  ~n_pages regular pages spread over
    n_domains with a Zipf-ish skew, plus special hosts/pages."""
    rng = random.Random(seed)
    domains = [domain_name(d) for d in range(n_domains)]
    weights = [1.0 / (d + 1) for d in range(n_domains)]
    # precomputed cum_weights: random.choices(weights=...) re-accumulates
    # the whole weight list PER CALL (O(n_domains) each — hours for a
    # 1.6M x 32k web); cum_weights= consumes the identical random()
    # draw and bisects, so the generated web is bit-identical
    cum_weights = list(itertools.accumulate(weights))

    # per-domain page path lists (regular pages only)
    pages_of: dict[str, list[str]] = {d: [] for d in domains}
    for i in range(n_pages):
        d = rng.choices(domains, cum_weights=cum_weights)[0]
        pages_of[d].append(f"/p/{len(pages_of[d])}.html")

    # sibling subdomains of domain 0 share its registered domain => same
    # fixture-DNS IP => shared politeness queue
    hosts_of: dict[str, str] = {}   # url-host -> its domain
    for d in domains:
        hosts_of[d] = d
    if n_domains >= 1 and pages_of[domains[0]]:
        hosts_of[f"a.{domains[0]}"] = domains[0]
        hosts_of[f"b.{domains[0]}"] = domains[0]

    rows: list[tuple[str, bytes]] = []       # (url, html)
    url_of: dict[str, list[str]] = {}        # host -> list of its page urls

    def all_urls_of(host: str) -> list[str]:
        return url_of.setdefault(host, [])

    # regular pages for the main domain hosts
    for d in domains:
        for path in pages_of[d]:
            all_urls_of(d).append(f"http://{d}{path}")
    for extra_host in (f"a.{domains[0]}", f"b.{domains[0]}"):
        if extra_host in hosts_of and extra_host != hosts_of[extra_host]:
            for j in range(3):
                all_urls_of(extra_host).append(f"http://{extra_host}/s/{j}.html")

    hosts = [h for h, urls in url_of.items() if urls]

    def pick_link(rng: random.Random, host: str) -> str:
        if rng.random() < 0.75 or len(hosts) == 1:
            cand = url_of[host]
        else:
            cand = url_of[rng.choice(hosts)]
        return rng.choice(cand)

    for host in hosts:
        urls = url_of[host]
        n = len(urls)
        for j, u in enumerate(urls):
            path = u.split(host, 1)[1]
            links: list[str] = []
            # ring link keeps the domain connected
            nxt = urls[(j + 1) % n]
            links.append(nxt)
            # relative form of another same-host page (same dir => basename)
            other = urls[rng.randrange(n)]
            links.append(other.rsplit("/", 1)[1])
            # absolute same-host + cross-host picks
            links.append(pick_link(rng, host))
            links.append(pick_link(rng, host))
            # normalization exercise on some pages
            if j % 5 == 0 and n > 1:
                tgt = urls[(j + 2) % n].split(host, 1)[1]
                links.append("/p/.." + tgt)              # /p/../p/x.html
                links.append(tgt.replace("/p/", "/p/./", 1))
                links.append("/%70" + tgt[2:])           # %70 decodes to 'p'
            if j % 7 == 0:
                links.append("/file.zip")            # forbidden extension
                links.append("/private/secret.html")  # robots-forbidden area
            if j % 11 == 0 and n > 2:
                # base-href page: relative links resolve against another dir
                body = _page_body(host, [urls[(j + 3) % n].rsplit("/", 1)[1]],
                                  f"page {j}", base_href=f"http://{host}/p/",
                                  filler="base page filler %s %s" % (
                                      host, "".join(chr(ord("a") + int(c)) for c in str(j))))
                rows.append((u, _response(body)))
                continue
            body = _page_body(host, links, f"page {j}",
                              filler="deterministic filler %s %s" % (
                                  host, "".join(chr(ord("a") + int(c)) for c in str(j))))
            rows.append((u, _response(body)))

    # ---- robots.txt fixtures ----
    for k, d in enumerate(domains):
        if k % 4 == 0:
            body = b"User-agent: *\nDisallow: /private/\n"
        elif k % 4 == 1:
            body = (b"User-agent: googlebot\nDisallow: /\n"
                    b"User-agent: larbin\nDisallow: /private/\nDisallow: /tmp/\n"
                    b"User-agent: *\nDisallow: /also-private/\n")
        elif k % 4 == 2:
            continue  # no robots.txt row => synthesized 404 => no limits
        else:
            body = b"# nothing disallowed\nUser-agent: *\nDisallow:\n"
        rows.append((f"http://{d}/robots.txt",
                     _response(body, ctype=b"text/plain")))

    # ---- special pages on domain 1 (exists for n_domains >= 2) ----
    sp = domains[1 % n_domains]
    sp_target = url_of[sp][0]
    specials = [
        # redirect chain: /r/0 -> /r/1 -> a real page
        (f"http://{sp}/r/0.html",
         _response(b"", status=b"301 Moved", extra=[b"Location: http://" + sp.encode() + b"/r/1.html"])),
        (f"http://{sp}/r/1.html",
         _response(b"", status=b"302 Found", extra=[b"Location: " + sp_target.encode()])),
        # redirect without location -> err40X
        (f"http://{sp}/r/nole.html", _response(b"", status=b"303 See Other")),
        # 404 / 500
        (f"http://{sp}/gone.html", _response(b"gone", status=b"404 Not Found")),
        (f"http://{sp}/err.html", _response(b"boom", status=b"500 Oops")),
        # wrong content type
        (f"http://{sp}/data.html", _response(b"1,2,3", ctype=b"text/csv")),
        # content-length over the 8 MiB cap
        (f"http://{sp}/big.html", _response(b"tiny", clen=9_000_000)),
        # truncated: headers never terminated
        (f"http://{sp}/broken.html", b"HTTP/1.0 200 OK\r\nContent-Type: text/html\r\n"),
        # duplicate bodies (content-dedup when pageNoDuplicate)
        (f"http://{sp}/dup/a.html", _response(_page_body(sp, [], "dupe"))),
        (f"http://{sp}/dup/b.html", _response(_page_body(sp, [], "dupe"))),
        # slow server: latency beyond timeoutPage + size/timeoutIncr
        # (types.h:46-47) -> FetchError `timeout`
        (f"http://{sp}/slow.html", _response(_page_body(sp, [], "slow page"))),
        # Set-Cookie chain (useCookies): /cookie/a sets a cookie and links
        # /cookie/b same-host (inherits) + a cross-host link (does not)
        (f"http://{sp}/cookie/a.html",
         _response(_page_body(sp, [f"http://{sp}/cookie/b.html",
                                   f"http://{domains[0]}/p/0.html"], "cookie page"),
                   extra=[b"Set-Cookie: session=abc; Path=/",
                          b"Set-Cookie: trk=z9; HttpOnly"])),
        (f"http://{sp}/cookie/b.html",
         _response(_page_body(sp, [], "cookie child"))),
    ]
    rows.extend(specials)
    # a hub page linking every special (reachable from the seed page)
    # the cookie child must only be reachable through /cookie/a.html so
    # the inherited cookie is observable on its fetch
    hub_links = [u for u, _ in specials if "/cookie/b" not in u] + [
        "http://nodns.dead.example/x.html",     # -> noDNS
        "http://nodns.dead.example/y.html",     # -> fastNoDns
        "http://noconn.down.example/x.html",    # -> noConnection
        "http://noconn.down.example/y.html",    # -> fastNoConn
        "http://10.77.0.1/ip.html",             # literal-IP host
        "http://9bad/x.html",                   # digit-lead junk host -> noDNS
        sp_target,                               # seen-dup -> urlDup
    ]
    if n_domains >= 5:
        # first contact with domain 4 (robots: Disallow /private/) is a
        # forbidden url: it waits in pending during the robots fetch and
        # dies at transfer time -> forbiddenRobots (site.cxx:482-496),
        # unlike the fastRobots initOK path
        hub_links.append(f"http://{domains[4]}/private/first-contact.html")
        hub_links.append(f"http://{domains[4]}/p/0.html")
    hub_url = f"http://{sp}/hub.html"
    rows.append((hub_url, _response(_page_body(sp, hub_links, "hub"))))
    # link the hub from the domain's first page by appending a row variant:
    # simplest closed-graph trick: hub is a seed in default_seeds().
    # the ip page is fetched ticks after the hub, when the dead hosts have
    # already resolved: its links hit the initOK fast-fail paths
    # (fastNoDns / fastNoConn, url.cxx:371-389)
    rows.append(("http://10.77.0.1/ip.html",
                 _response(_page_body("10.77.0.1", [
                     hub_url,
                     "http://nodns.dead.example/late.html",
                     "http://noconn.down.example/late.html",
                 ], "ip page"))))

    # ---- assemble the Arrow table ----
    seen_urls = set()
    urls, tss, htmls, texts, langs, lat_col = [], [], [], [], [], []
    slow_latency = {f"http://{sp}/slow.html": 45_000}   # > 30 s budget
    for i, (u, html) in enumerate(rows):
        if u in seen_urls:
            continue
        seen_urls.add(u)
        urls.append(u)
        tss.append(_BASE_TS + datetime.timedelta(seconds=i))
        htmls.append(html)
        sep = html.find(b"\r\n\r\n")
        texts.append(html[sep + 4:].decode("latin-1") if sep != -1 else "")
        langs.append(_LANGS[i % len(_LANGS)])
        lat_col.append(slow_latency.get(u, (i * 37) % 900))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "latency_ms": pa.array(lat_col, pa.int64()),
    })


def default_seeds(n_domains: int = 12) -> list[str]:
    """One seed per interesting host class (FIXTURES.md F2)."""
    seeds = [f"http://{domain_name(d)}/p/0.html" for d in range(min(4, n_domains))]
    if n_domains >= 2:
        seeds.append(f"http://{domain_name(1 % n_domains)}/hub.html")
    if n_domains >= 1:
        seeds.append(f"http://a.{domain_name(0)}/s/0.html")
        seeds.append(f"http://b.{domain_name(0)}/s/0.html")
    return seeds


def breadth_seeds(n_domains: int, step: int = 4) -> list[str]:
    """Bench seeding: one seed per ``step`` domains — broad fronts make
    big politeness waves (the throughput configuration), while the
    remaining domains are discovered through cross-links."""
    return [f"http://{domain_name(d)}/p/0.html" for d in range(0, n_domains, step)]


def write_web(path: str, n_pages: int, n_domains: int, seed: int = 42) -> str:
    import pyarrow.parquet as pq

    table = gen_web(n_pages, n_domains, seed)
    pq.write_table(table, path)
    return path
