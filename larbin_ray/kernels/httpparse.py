"""HTTP response parsing — the ``html`` parser state machine of
/root/reference/src/fetch/file.cxx:366-562, run over a completed response
buffer (status line + headers + body bytes, as stored in the ``html``
column of the pages table).

Semantics replicated:

- ``parseCmdline`` file.cxx:415-438: first line must reach >= 12 bytes
  before its '\\n' else ``earlyStop``; ``buffer[9]`` selects 2xx (headers)
  / 3xx (location scan) / anything else ``err40X``.
- ``parseHeader`` file.cxx:443-475: a line shorter than 2 bytes ends the
  headers; ``contentStart`` is the byte after its '\\n'.
- ``verifType`` file.cxx:477-502: non-``text/html`` content-type =>
  ``badType`` unless specific-search matches, ``anyType``, or
  ``getImage`` + ``image/*``.
- ``verifLength`` file.cxx:508-526: Content-Length > 8 MiB => ``tooBig``
  (skipped entirely under specificSearch).
- ``parseHeader30X`` file.cxx:531-562: first ``Location:`` header yields a
  redirect link at the *same* depth, result is always ``err30X``; a blank
  line (or end of buffer) without Location => ``err40X``.
- ``endInput`` file.cxx:571-594: running out of input in ANSWER/HEADERS
  state => ``earlyStop``.

Header-prefix compares intentionally run against the *raw buffer* from
the line start (not a line slice) because the reference compares C
strings that run past the '\\n' — visible when a header line is shorter
than the compared prefix.
"""

from __future__ import annotations

from dataclasses import dataclass

from larbin_ray.config import CrawlConfig, MAX_PAGE_SIZE
from larbin_ray.kernels.textutil import match_content_type, start_with_ignore_case


@dataclass
class HttpResult:
    status: str                     # "html" (body ready) or a FetchError name
    content_start: int = -1         # body offset in the raw buffer
    body: bytes = b""
    location: bytes | None = None   # 30X redirect target (raw header value)
    interesting: bool = False       # specific-search content-type matched
    ext_index: int = -1
    cookie: bytes | None = None     # url cookie after Set-Cookie capture


MAX_COOKIE_LEN = 127                # maxCookieSize buffer, NUL at index 127


def add_cookie(cookie: bytes | None, header: bytes) -> bytes | None:
    """``url::addCookie`` url.cxx:614-634: a ``Set-Cookie:`` header whose
    value contains a ``;`` (required — no semicolon, no capture) appends
    the value-before-; with a ``"; "`` separator, capped at 127 bytes."""
    if not start_with_ignore_case(b"set-cookie: ", header):
        return cookie
    rest = header[12:]
    semi = rest.find(b";")
    if semi == -1:
        return cookie
    value = rest[:semi]
    if cookie is None:
        out = value
    else:
        out = cookie + b"; " + value
    return out[:MAX_COOKIE_LEN]


def _not_cgi(c: int, get_cgi: bool) -> bool:
    """file.cxx:291: ``notCgiChar``."""
    return get_cgi or (c != 0x3F and c != 0x3D and c != 0x2A)  # ? = *


def parse_response(raw: bytes, cfg: CrawlConfig,
                   cookie: bytes | None = None) -> HttpResult:
    n = len(raw)
    nl = raw.find(b"\n")
    if nl == -1:
        return HttpResult("earlyStop")
    if nl < 12:
        return HttpResult("earlyStop")
    code = raw[9]
    if code == 0x32:        # '2'
        state30x = False
    elif code == 0x33:      # '3'
        state30x = True
    else:
        return HttpResult("err40X")

    area = nl + 1
    interesting = False
    ext_index = -1
    while True:
        nl2 = raw.find(b"\n", area)
        if nl2 == -1:
            # endInput: state <= HEADERS => earlyStop; HEADERS30X => err40X
            return HttpResult("err40X" if state30x else "earlyStop")
        if nl2 - area < 2:
            # blank line: end of headers
            if state30x:
                return HttpResult("err40X")     # 30X without Location
            body = raw[nl2 + 1:]
            return HttpResult("html", content_start=nl2 + 1, body=body,
                              interesting=interesting, ext_index=ext_index,
                              cookie=cookie)
        if state30x:
            if start_with_ignore_case(b"location: ", raw, area):
                i = 10
                while area + i < n:
                    c = raw[area + i]
                    if c in (0x20, 0x0A, 0x0D) or not _not_cgi(c, cfg.get_cgi):
                        break
                    i += 1
                stop = raw[area + i] if area + i < n else 0x0A
                location = None
                if _not_cgi(stop, cfg.get_cgi):
                    location = raw[area + 10:area + i]
                return HttpResult("err30X", location=location)
        else:
            if cfg.use_cookies:
                # here->addCookie per header line (file.cxx:468)
                cookie = add_cookie(cookie, raw[area:nl2])
            if start_with_ignore_case(b"content-type: ", raw, area):
                ct_off = area + 14
                if not start_with_ignore_case(b"text/html", raw, ct_off):
                    idx = -1
                    if cfg.specific_search:
                        idx = match_content_type(
                            raw[ct_off:ct_off + 128],
                            tuple(c.encode() for c in cfg.content_types))
                    if cfg.specific_search and idx != -1:
                        interesting = True
                        ext_index = idx
                    elif cfg.any_type:
                        pass
                    elif cfg.get_image and start_with_ignore_case(b"image", raw, ct_off):
                        pass
                    else:
                        return HttpResult("badType")
            if not cfg.specific_search and start_with_ignore_case(b"content-length: ", raw, area):
                p = area + 16
                length = 0
                while p < n and 0x30 <= raw[p] <= 0x39:
                    length = length * 10 + raw[p] - 0x30
                    p += 1
                if length > MAX_PAGE_SIZE:
                    return HttpResult("tooBig")
        area = nl2 + 1


# ---------------------------------------------------------------------------
# content duplicate hash — hashDup::testSet, src/utils/hash_duplicate.cxx:83-95


_POW23: dict[int, "object"] = {}


def _pow23(n: int, size: int):
    """23^0..23^(n-1) mod size, cached & grown on demand (vectorized
    evaluation of the rolling hash as a dot product)."""
    import numpy as np
    arr = _POW23.get(size)
    if arr is None or len(arr) < n:
        m = max(n, 4096, 0 if arr is None else len(arr) * 2)
        out = np.empty(m, dtype=np.uint64)
        out[0] = 1
        for i in range(1, m):
            out[i] = (out[i - 1] * 23) % size
        _POW23[size] = arr = out
    return arr


def content_dup_code(body: bytes, size: int = 64_000_000) -> int:
    """poly-23 over body chars ``c`` with ``'A' < c < 'z'`` (exclusive,
    i.e. bytes 0x42..0x79; high-bit bytes are negative signed chars and
    never qualify), mod ``size``, stopping at the first NUL byte (the
    reference hashes a C string).  Vectorized: code = sum c_i * 23^(m-1-i)
    mod size (products < 2^33, sums safe in uint64 for bodies < 8 MiB)."""
    import numpy as np
    nul = body.find(b"\0")
    if nul != -1:
        body = body[:nul]
    arr = np.frombuffer(body, dtype=np.uint8)
    kept = arr[(arr > 0x41) & (arr < 0x7A)].astype(np.uint64)
    m = len(kept)
    if m == 0:
        return 0
    powers = _pow23(m, size)[:m][::-1]
    return int((kept * powers).sum() % np.uint64(size))
