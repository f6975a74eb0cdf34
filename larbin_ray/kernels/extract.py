"""HTML link extraction — byte-exact port of the reference scanner
/root/reference/src/fetch/file.cxx:597-798 (``parseHtml`` /
``parseComment`` / ``parseTag`` / ``parseContent``) plus the stateless
part of link admission (``manageUrl`` file.cxx:329-357, ``filter1``
fetch/checker.cxx:70-90, stateless half of ``initOK`` url.cxx:343-391).

Replicated quirks (each is observable in link output and therefore part
of the URL-seen-set invariant):

- tags are recognized by first letter: ANY tag starting with ``a`` is
  scanned for ``href``; ``l``/``b``/``f``/``i`` must spell link / base /
  frame / img (file.cxx:677-699); matching is ``byte | 32``;
- after the parameter name matches, the reference tests
  ``posParse[i]`` — a lookahead *i* bytes past the value start — against
  ``'>'``/NUL (file.cxx:712), so very short values just before ``>`` are
  dropped;
- attribute values stop at quotes/whitespace/``>`` or a CGI char
  (``? = *`` unless getCGI; file.cxx:291,737-747); ``\\`` becomes ``/``;
  values longer than 1024 or stopped by a CGI char are dropped; a value
  running to end-of-buffer is dropped (truncation guard, file.cxx:753);
- comments skip to ``-->``; an unterminated comment ends parsing
  (file.cxx:621-634);
- ``<base href>`` rewrites the base only when the value has a ``/``
  after position 7; an invalid rewritten base sets base to None so later
  relative links are dropped (file.cxx:766-790);
- scanning stops at the first NUL byte (C strchr semantics).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from larbin_ray.config import CrawlConfig
from larbin_ray.kernels.textutil import end_with, end_with_ignore_case
from larbin_ray.kernels.urlnorm import Url, parse_url

_LINK = 0
_BASE = 1

_SPACES = (0x20, 0x0A, 0x0D, 0x09)
_TEXT_STOP = (0x20, 0x0A, 0x3E, 0x0D, 0x09, 0)

# Vectorized scanning classes for the fast path.  Byte sets MUST mirror
# the reference loops exactly (parse_html_ref is the executable spec):
#   skipText stop  = _TEXT_STOP (0 included: C loop stops at NUL/EOF)
#   value stop     = quote/space/'>' (+ '?','=','*' when !getCGI); NUL is
#                    NOT a stop — the C loop copies it into the value.
_RX_TEXT_STOP = re.compile(rb"[ \n>\r\t\x00]")
_RX_VAL_STOP_CGI = re.compile(rb"[\"' \n>\r\t]")
_RX_VAL_STOP_NOCGI = re.compile(rb"[\"' \n>\r\t?=*]")
# Next '<' the dispatch could act on: immediate '!' (comment check runs
# before the space skip) or spaces then a candidate tag letter.  A '<'
# this pattern skips is exactly one the spec falls through ('else:
# continue') on, so skipping it at C speed is behavior-preserving; 'i'
# is included even when get_image is off because that dispatch arm also
# just continues.
_RX_TAG_OPEN = re.compile(rb"<(?:!|[ \n\r\t]*[aAbBlLfFiI])")
# Param fast path: the first word after the tag name is almost always
# the wanted parameter itself ("<a href=...").  These match the generic
# loop's first iteration exactly — same space class, same case-fold
# (byte|32 on [a-zA-Z] == the two-case classes) — so a hit replaces the
# per-char compare; a miss falls through to the loop untouched.
_RX_PARAM_HREF = re.compile(rb"[ \n\r\t]*[hH][rR][eE][fF]")
_RX_PARAM_SRC = re.compile(rb"[ \n\r\t]*[sS][rR][cC]")
# Whole-construct fused path: the dominant page byte shape is an
# 'a'/'link' tag whose FIRST word is href, '='-assigned, with a
# backslash-free value — one anchored C match replaces the dispatch +
# param + value scans.  Group 1 starts at the first non-space after
# href (the spec's post-skipSpace position p0: its first byte is the
# char the spec consumes blindly — fused only fires when that char is
# '=' — then the ' '/'=' skip and at most one opening quote); group 2
# is the value, capped at 1023 so a cap-length value falls back to the
# generic 1024-window rule.  The caller still applies the posParse[i]
# lookahead quirk at p0 and the CGI/EOF stop-char rules — every
# construct the pattern cannot prove simple falls through to the
# generic path untouched, so fused output == spec output by
# construction (property-fuzzed in tests/test_properties.py).
_RX_FUSED_HREF_NOCGI = re.compile(
    rb"<[ \n\r\t]*(?:[aA]|[lL][iI][nN][kK])[ \n\r\t]*"
    rb"[hH][rR][eE][fF][ \n\r\t]*"
    rb"(=[ =]*[\"']?)"
    rb"([^\"' \n>\r\t?=*\\]{0,1023})")
_RX_FUSED_HREF_CGI = re.compile(
    rb"<[ \n\r\t]*(?:[aA]|[lL][iI][nN][kK])[ \n\r\t]*"
    rb"[hH][rR][eE][fF][ \n\r\t]*"
    rb"(=[ =]*[\"']?)"
    rb"([^\"' \n>\r\t\\]{0,1023})")


def _strchr(buf: bytes, ch: int, start: int) -> int:
    """C strchr over a NUL-terminated view: -1 if ch not before a NUL."""
    idx = buf.find(bytes([ch]), start)
    if idx == -1:
        return -1
    nul = buf.find(b"\0", start)
    if nul != -1 and nul < idx:
        return -1
    return idx


def parse_html_ref(body: bytes, get_image: bool, get_cgi: bool) -> list[tuple[int, bytes]]:
    """Scan a page body; return ``[(action, value_bytes), ...]`` in
    document order, action in {0: link, 1: base}.

    This is the readable per-byte port and the executable SPEC for
    ``parse_html`` below; tests assert the two agree on adversarial
    inputs.  Production code calls ``parse_html``."""
    out: list[tuple[int, bytes]] = []
    n = len(body)

    def at(p: int) -> int:
        return body[p] if 0 <= p < n else 0

    def not_cgi(c: int) -> bool:
        return get_cgi or (c != 0x3F and c != 0x3D and c != 0x2A)

    p = 0
    while True:
        p = _strchr(body, 0x3C, p)  # '<'
        if p == -1:
            return out
        if at(p + 1) == 0x21:  # '!'
            if at(p + 2) == 0x2D and at(p + 3) == 0x2D:  # '<!--'
                p += 4
                # parseComment, file.cxx:621-634
                while True:
                    p = _strchr(body, 0x2D, p)  # '-'
                    if p == -1:
                        return out  # posParse = buffer+pos: parsing over
                    if at(p + 1) == 0x2D and at(p + 2) == 0x3E:
                        p += 3
                        break
                    p += 1
            else:
                p += 2
            continue
        p += 1
        # ---- parseTag, file.cxx:671-723 ----
        while at(p) in _SPACES:
            p += 1

        def this_char_is(i: int, c: int) -> bool:
            return c == (at(p + i) | 32)

        c0 = at(p) | 32
        if c0 == 0x61:  # 'a'
            param, action = b"href", _LINK
            p += 1
        elif c0 == 0x6C:  # 'l'
            if this_char_is(1, 0x69) and this_char_is(2, 0x6E) and this_char_is(3, 0x6B):
                param, action = b"href", _LINK
                p += 4
            else:
                p += 1
                continue
        elif c0 == 0x62:  # 'b'
            if this_char_is(1, 0x61) and this_char_is(2, 0x73) and this_char_is(3, 0x65):
                param, action = b"href", _BASE
                p += 4
            else:
                p += 1
                continue
        elif c0 == 0x66:  # 'f'
            if (this_char_is(1, 0x72) and this_char_is(2, 0x61)
                    and this_char_is(3, 0x6D) and this_char_is(4, 0x65)):
                param, action = b"src", _LINK
                p += 5
            else:
                p += 1
                continue
        elif get_image and c0 == 0x69:  # 'i'
            if this_char_is(1, 0x6D) and this_char_is(2, 0x67):
                param, action = b"src", _LINK
                p += 3
            else:
                p += 1
                continue
        else:
            continue

        # find the parameter
        while at(p) in _SPACES:
            p += 1
        found = False
        while True:
            i = 0
            while i < len(param) and param[i] == (at(p + i) | 32):
                i += 1
            p += i
            while at(p) in _SPACES:
                p += 1
            look = at(p + i)  # the reference's posParse[i] lookahead quirk
            if look == 0x3E or look == 0:
                break
            if i == len(param):
                found = True
                break
            # nextWord(): skipText + skipSpace
            while at(p) not in _TEXT_STOP:
                p += 1
            while at(p) in _SPACES:
                p += 1
        if not found:
            continue

        # ---- parseContent, file.cxx:726-798 ----
        p += 1
        while at(p) in (0x20, 0x3D):  # ' ' '='
            p += 1
        if at(p) in (0x22, 0x27):  # '"' '\''
            p += 1
        area = p
        end_item = min(area + 1024, n)  # maxUrlSize
        value = bytearray()
        while p < end_item:
            c = body[p]
            if c in (0x22, 0x27, 0x0A, 0x20, 0x3E, 0x0D, 0x09) or not not_cgi(c):
                break
            value.append(0x2F if c == 0x5C else c)  # '\' -> '/'
            p += 1
        if p == n:
            return out  # value truncated at EOF: whole parse ends (file.cxx:753)
        if p < end_item and not_cgi(at(p)):
            out.append((action, bytes(value)))
        p += 1
    return out


def parse_html(body: bytes, get_image: bool, get_cgi: bool) -> list[tuple[int, bytes]]:
    """Fast path of :func:`parse_html_ref` — identical output, but the
    three hot loops run at C speed:

    - ``strchr`` precomputes NUL positions once (the readable version
      re-scanned for NUL on every call — O(n^2) on NUL-free pages);
    - inter-word ``skipText`` and the attribute-value copy loop are
      regex ``search`` over the exact stop classes;
    - ``at()`` is inlined (bounds-checked indexing, 0 past EOF).

    ``tests/test_extract.py`` property-tests equality with the spec on
    synthetic pages, random bytes, and adversarial fragments."""
    if body.find(b"\0") != -1:
        # NUL bytes re-introduce C strchr stop-at-NUL semantics mid-scan;
        # rare enough that the readable spec handles them.
        return parse_html_ref(body, get_image, get_cgi)
    out: list[tuple[int, bytes]] = []
    n = len(body)
    find = body.find
    rx_val_stop = _RX_VAL_STOP_CGI if get_cgi else _RX_VAL_STOP_NOCGI
    fused_match = (_RX_FUSED_HREF_CGI if get_cgi
                   else _RX_FUSED_HREF_NOCGI).match

    p = 0
    while True:
        m_tag = _RX_TAG_OPEN.search(body, p)
        if m_tag is None:
            return out
        p = m_tag.start()
        if p + 1 < n and body[p + 1] == 0x21:  # '!'
            if p + 3 < n and body[p + 2] == 0x2D and body[p + 3] == 0x2D:  # '<!--'
                p += 4
                # parseComment, file.cxx:621-634
                while True:
                    p = find(b"-", p)
                    if p == -1:
                        return out
                    if p + 2 < n and body[p + 1] == 0x2D and body[p + 2] == 0x3E:
                        p += 3
                        break
                    p += 1
            else:
                p += 2
            continue
        # fused whole-construct path (see the pattern's comment): one C
        # match emits the link; any miss falls through UNCHANGED into
        # the generic dispatch below (p still at the '<')
        m = fused_match(body, p)
        if m is not None:
            p0 = m.start(1)   # first non-space after href (spec's p0)
            look = body[p0 + 4] if p0 + 4 < n else 0  # posParse[i] quirk
            if look == 0x3E or look == 0:
                p = p0        # not found: rescan from p0, like the spec
                continue
            vs, vend = m.span(2)
            if vend - vs < 1023:
                if vend == n:
                    return out  # value truncated at EOF (file.cxx:753)
                c = body[vend]
                if c != 0x5C:  # backslash needs the '\'->'/' rewrite: generic
                    if get_cgi or (c != 0x3F and c != 0x3D and c != 0x2A):
                        out.append((_LINK, body[vs:vend]))
                    p = vend + 1
                    continue
            # cap-length capture or backslash in the value: generic path
        p += 1
        # ---- parseTag, file.cxx:671-723 ----
        while p < n and body[p] in _SPACES:
            p += 1

        c0 = (body[p] | 32) if p < n else 32
        if c0 == 0x61:  # 'a'
            param, action = b"href", _LINK
            p += 1
        elif c0 == 0x6C:  # 'l'
            if body[p + 1:p + 4].lower() == b"ink":
                param, action = b"href", _LINK
                p += 4
            else:
                p += 1
                continue
        elif c0 == 0x62:  # 'b'
            if body[p + 1:p + 4].lower() == b"ase":
                param, action = b"href", _BASE
                p += 4
            else:
                p += 1
                continue
        elif c0 == 0x66:  # 'f'
            if body[p + 1:p + 5].lower() == b"rame":
                param, action = b"src", _LINK
                p += 5
            else:
                p += 1
                continue
        elif get_image and c0 == 0x69:  # 'i'
            if body[p + 1:p + 3].lower() == b"mg":
                param, action = b"src", _LINK
                p += 3
            else:
                p += 1
                continue
        else:
            continue

        # find the parameter
        found = False
        plen = len(param)
        # fast path: first word IS the parameter (equivalent to the
        # generic loop's first iteration fully matching — beyond-EOF
        # compares as a space there, which never equals a param letter,
        # so a regex hit and an i == plen first pass coincide exactly)
        m = (_RX_PARAM_HREF if plen == 4 else _RX_PARAM_SRC).match(body, p)
        if m is not None:
            p = m.end()
            while p < n and body[p] in _SPACES:
                p += 1
            look = body[p + plen] if p + plen < n else 0  # posParse quirk
            if look != 0x3E and look != 0:
                found = True
        else:
            while p < n and body[p] in _SPACES:
                p += 1
            while True:
                i = 0
                while i < plen and param[i] == ((body[p + i] | 32) if p + i < n else 32):
                    i += 1
                p += i
                while p < n and body[p] in _SPACES:
                    p += 1
                look = body[p + i] if p + i < n else 0  # posParse[i] lookahead quirk
                if look == 0x3E or look == 0:
                    break
                if i == plen:
                    found = True
                    break
                # nextWord(): skipText + skipSpace
                m = _RX_TEXT_STOP.search(body, p)
                p = m.start() if m is not None else n
                while p < n and body[p] in _SPACES:
                    p += 1
        if not found:
            continue

        # ---- parseContent, file.cxx:726-798 ----
        p += 1
        while p < n and (body[p] == 0x20 or body[p] == 0x3D):  # ' ' '='
            p += 1
        if p < n and (body[p] == 0x22 or body[p] == 0x27):  # '"' '\''
            p += 1
        area = p
        end_item = min(area + 1024, n)  # maxUrlSize
        m = rx_val_stop.search(body, p, end_item)
        p = m.start() if m is not None else end_item
        if p == n:
            return out  # value truncated at EOF: whole parse ends (file.cxx:753)
        if p < end_item:
            c = body[p]
            if get_cgi or (c != 0x3F and c != 0x3D and c != 0x2A):
                out.append((action, body[area:p].replace(b"\\", b"/")))
        p += 1
    return out


def filter1(host: bytes, file: bytes, cfg: CrawlConfig,
            _domains: tuple[bytes, ...] | None = None,
            _forb: tuple[bytes, ...] | None = None) -> bool:
    """fetch/checker.cxx:70-90: domain allow-list, then allow
    ``*html``/``*htm``/trailing ``/`` (suffix without a dot!), else
    reject forbidden extensions."""
    domains = _domains if _domains is not None else cfg.domains_bytes()
    if domains is not None:
        if not any(end_with(d, host) for d in domains):
            return False
    if (end_with_ignore_case(b"html", file)
            or end_with_ignore_case(b"htm", file)
            or file[-1:] == b"/"):
        return True
    forb = _forb if _forb is not None else cfg.forbidden_ext_bytes()
    for ext in forb:
        if end_with_ignore_case(ext, file):
            return False
    return True


@dataclass
class Candidate:
    """A link that survived the stateless admission chain and is bound for
    the stateful checks (fast-fail + seen-set)."""
    url: Url
    is_redir: bool
    order: int          # document order of the link on the page


@dataclass
class ExtractResult:
    candidates: list[Candidate]
    errors: list[str]   # stateless initOK failures, in order (outSite / tooDeep)


def admit_link(nouv: Url, here: Url, is_redir: bool, cfg: CrawlConfig,
               order: int, result: ExtractResult,
               _domains=None, _forb=None, prechecked: bool = False) -> None:
    """manageUrl (file.cxx:329-357) + the stateless half of initOK
    (url.cxx:343-369): validity, filter1, external-link policy, lockSite
    => outSite, depthBySite reset, depth<0 => tooDeep.  The cached-DNS /
    cached-robots fast-fails (url.cxx:371-389) run later in the
    scheduler shard that owns the host.

    ``prechecked=True`` skips is_valid + filter1 — the memoized
    extract_links path already classified this (host, file) pair (both
    checks are pure in (url, cfg)); the per-page policy below (external
    links, lockSite, depth, cookies) always runs."""
    if not prechecked:
        if not nouv.is_valid():
            return
        if not filter1(nouv.host, nouv.file, cfg, _domains, _forb):
            return
    if not (cfg.external_links or is_redir or nouv.host == here.host):
        return
    # initOK stateless part
    if nouv.host != here.host:
        if cfg.lock_site:
            result.errors.append("outSite")
            return
        if cfg.depth_by_site:
            nouv.depth = cfg.depth_in_site
    else:
        if cfg.use_cookies and here.cookie is not None:
            nouv.cookie = here.cookie[:128]
    if nouv.depth < 0:
        result.errors.append("tooDeep")
        return
    result.candidates.append(Candidate(nouv, is_redir, order))


# Per-actor parse memo caps: typical href -> (host, port, file) entries
# are ~100 B, so half a million ≈ 50 MB per worker — but keys carry the
# raw href (≤ maxUrlSize 1024 B) plus the base identity, so a corpus of
# many distinct LONG hrefs could reach GBs under an entry cap alone.
# UrlMemo therefore also tracks approximate bytes, and the memo is
# dropped wholesale at whichever cap hits first (hits are front-loaded —
# popular nav links re-enter within one batch).
_MEMO_CAP = 1 << 19
_MEMO_MAX_BYTES = 64 << 20


class UrlMemo(dict):
    """Parse-memo dict with a byte counter riding alongside (a plain
    dict also works — it is then bounded by the entry cap only)."""
    __slots__ = ("nbytes",)

    def __init__(self):
        super().__init__()
        self.nbytes = 0

    def clear(self):
        super().clear()
        self.nbytes = 0


def extract_links(here: Url, body: bytes, cfg: CrawlConfig,
                  _domains=None, _forb=None,
                  url_memo: dict | None = None) -> ExtractResult:
    """Full per-page extraction: scan + base handling + admission chain.
    ``here`` is the fetched page's URL; depth of extracted links is
    ``here.depth - 1`` (file.cxx:764); redirects keep the same depth and
    are admitted separately via ``admit_link(..., is_redir=True)``.

    ``url_memo`` (optional, owned by the calling actor) caches
    ``parse_url`` results keyed by the raw href plus the base identity it
    resolves against — links repeat heavily across a site's pages (nav
    bars, footers), so the normalize/parse chain runs once per distinct
    href.  The memo stores only the immutable (host, port, file) triple;
    every admission still gets a fresh ``Url`` (``admit_link`` mutates
    depth/cookie per page)."""
    result = ExtractResult([], [])
    base: Url | None = here.give_base()
    order = 0
    depth = here.depth - 1
    for action, value in parse_html(body, cfg.get_image, cfg.get_cgi):
        if action == _LINK:
            if url_memo is None:
                nouv = parse_url(value, depth, base)
            else:
                # absolute parses ignore the base; relative ones resolve
                # against (host, port, file) of the current base
                if value.startswith(b"http://"):
                    key = value
                elif base is None:
                    key = (value,)
                else:
                    key = (value, base.host, base.port, base.file)
                hit = url_memo.get(key)
                if hit is None:
                    nouv = parse_url(value, depth, base)
                    # classify once: is_valid + filter1 are pure in
                    # (url, cfg) — rejects are silent drops, so a cached
                    # reject skips even the Url construction next time
                    admitted = (nouv.is_valid()
                                and filter1(nouv.host, nouv.file, cfg,
                                            _domains, _forb))
                    if (len(url_memo) >= _MEMO_CAP
                            or getattr(url_memo, "nbytes", 0)
                            >= _MEMO_MAX_BYTES):
                        url_memo.clear()
                    url_memo[key] = (nouv.host, nouv.port, nouv.file,
                                     admitted)
                    if isinstance(url_memo, UrlMemo):
                        # approximate accounting (checked BEFORE insert,
                        # so the 64 MB cap can overshoot by one entry —
                        # safe by design); 4-tuple keys count base.host
                        # AND base.file
                        url_memo.nbytes += (
                            len(value)
                            + (len(key[1]) + len(key[3])
                               if isinstance(key, tuple) and len(key) == 4
                               else 0)
                            + len(nouv.host or b"")
                            + len(nouv.file or b"") + 160)
                    if admitted:
                        admit_link(nouv, here, False, cfg, order, result,
                                   _domains, _forb, prechecked=True)
                    order += 1
                    continue
                if hit[3]:
                    nouv = Url(hit[0], hit[1], hit[2], depth)
                    admit_link(nouv, here, False, cfg, order, result,
                               _domains, _forb, prechecked=True)
                order += 1
                continue
            admit_link(nouv, here, False, cfg, order, result, _domains, _forb)
            order += 1
        else:  # BASE, file.cxx:766-790
            if len(value) == 0:
                continue
            end = len(value) - 1
            while end > 7 and value[end] != 0x2F:
                end -= 1
            if end > 7:
                tmpbase = parse_url(value[:end + 1], 0, None)
                if tmpbase.is_valid():
                    base = tmpbase
                else:
                    base = None
    return result
