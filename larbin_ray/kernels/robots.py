"""robots.txt fetching/parsing — byte-exact port of the reference
``robots`` parser, /root/reference/src/fetch/file.cxx:95-250, plus the
match predicate ``NamedSite::testRobots`` (fetch/site.cxx:383-392).

Replicated semantics:

- the response must be 2xx (``buffer[9] == '2'``, file.cxx:102-114; a
  403/404 leaves the forbidden list untouched — i.e. empty for a fresh
  host: no restrictions);
- headers end at the first ``\\n\\n``-ish sequence scanned from offset 9
  (file.cxx:147-168);
- record states: 0 = not concerned, 1 = weak (``User-agent: *`` — also
  the *initial* state, so disallows before any User-agent line apply),
  2 = strong (a User-agent token contained in our agent name,
  ``caseContain(tok, userAgent)`` file.cxx:197);
- a matched record *replaces* earlier ones (``forbidden.recycle()``
  file.cxx:207 — even weak-replaces-weak); parsing stops at the end of a
  strong record (file.cxx:189);
- disallow values: leading ``*`` becomes ``/``, a missing leading ``/``
  is prepended, then ``fileNormalize``; at most 256 kept (the counter
  still increments for dropped ones, file.cxx:223);
- bodies over 64 KiB are truncated and the last (possibly cut) token is
  blanked (file.cxx:115-122, 134-139).
"""

from __future__ import annotations

from larbin_ray.config import MAX_ROBOTS_ITEM, MAX_ROBOTS_SIZE
from larbin_ray.kernels.textutil import case_contain, next_token, robots_match
from larbin_ray.kernels.urlnorm import file_normalize

_COLON = 0x3A


def _find_header_end(buf: bytes) -> int:
    """robots::parseHeaders file.cxx:147-168: scan from offset 9 for
    ``\\n[\\n?]\\n`` / ``\\r[\\r?]\\r`` patterns; return the match offset
    (the reference leaves posParse there and tokenizes from it), -1 if
    not found."""
    n = len(buf)
    p = 9
    while p + 3 < n:  # posParse[3] != '\0'
        c0 = buf[p]
        if c0 == 0x0A and (buf[p + 1] == 0x0A or buf[p + 2] == 0x0A):
            return p
        if c0 == 0x0D and (buf[p + 1] == 0x0D or buf[p + 2] == 0x0D):
            return p
        p += 1
    return -1


def parse_robots_response(raw: bytes, user_agent: bytes) -> list[bytes]:
    """Full response bytes -> forbidden pattern list.

    Returns [] (no restrictions) when the response is not 2xx or has no
    header terminator — mirroring robots::parse file.cxx:127-142 which
    simply leaves the (fresh, empty) forbidden list alone."""
    if len(raw) <= 12 or raw[9] != 0x32:  # answerCode: buffer[9]=='2'
        return []
    truncated = False
    if len(raw) > MAX_ROBOTS_SIZE:
        raw = raw[:MAX_ROBOTS_SIZE]
        truncated = True
    start = _find_header_end(raw)
    if start == -1:
        return []
    if truncated:
        # isError path file.cxx:134-139: blank the last token
        buf = bytearray(raw)
        i = len(buf) - 1
        while i > 0 and buf[i] not in (0x20, 0x09, 0x0A, 0x0B, 0x0C, 0x0D):
            buf[i] = 0x20
            i -= 1
        raw = bytes(buf)
    return parse_robots_body(raw, start, user_agent)


def parse_robots_body(buf: bytes, pos: int, user_agent: bytes) -> list[bytes]:
    """robots::parseRobots file.cxx:172-250, tokenizing from ``pos``."""
    # a NUL terminates the C scan
    nul = buf.find(b"\0", pos)
    if nul != -1:
        buf = buf[:nul]
    forbidden: list[bytes] = []
    items = 0
    state = 1  # weakly concerned by default
    tok, pos = next_token(buf, pos, _COLON)
    while tok is not None:
        low = tok.lower()
        if low in (b"useragent", b"user-agent"):
            if state == 2:
                return forbidden  # end of the strong record
            state = 0
            tok, pos = next_token(buf, pos, _COLON)
            while tok is not None and tok.lower() not in (b"useragent", b"user-agent", b"disallow"):
                if case_contain(tok, user_agent):
                    state = 2
                elif state == 0 and tok == b"*":
                    state = 1
                tok, pos = next_token(buf, pos, _COLON)
            if state:
                forbidden = []  # better record replaces older ones
                items = 0
            else:
                # not our record: skip its disallows
                while tok is not None and tok.lower() not in (b"useragent", b"user-agent"):
                    tok, pos = next_token(buf, pos, _COLON)
        elif low == b"disallow":
            tok, pos = next_token(buf, pos, _COLON)
            while tok is not None and tok.lower() not in (b"useragent", b"user-agent", b"disallow"):
                items += 1
                if items <= MAX_ROBOTS_ITEM:
                    if tok[0:1] == b"*":
                        tok = b"/" + tok[1:]
                    elif tok[0:1] != b"/":
                        tok = b"/" + tok
                    norm = file_normalize(tok)
                    if norm is not None:
                        forbidden.append(norm)
                tok, pos = next_token(buf, pos, _COLON)
        else:
            tok, pos = next_token(buf, pos, _COLON)
    return forbidden


def test_robots(file: bytes, forbidden: list[bytes], ignore_robots: bool = False) -> bool:
    """NamedSite::testRobots site.cxx:383-392: True = allowed."""
    if ignore_robots:
        return True
    return not any(robots_match(pat, file) for pat in forbidden)
