"""URL parsing / normalization / hashing — byte-exact vs the reference.

Replicates (all citations into /root/reference/):

- ``fileNormalize``      src/utils/url.cxx:82-172
- ``url::normalize``     src/utils/url.cxx:566-594 (high-bit %-re-escape)
- ``url::parse``         src/utils/url.cxx:488-529 (absolute)
- ``url::parseWithBase`` src/utils/url.cxx:533-560 (relative + base)
- ``url::url(u,d,base)`` src/utils/url.cxx:177-211 (scheme dispatch)
- ``url::isValid``       src/utils/url.cxx:316-322
- ``url::hashCode``      src/utils/url.cxx:474-482 (poly-31 mod 64e6)
- ``siteHashCode``       src/utils/url.cxx:40-46   (poly-37 mod 20000)
- ``url::giveBase``      src/utils/url.cxx:394-404
- ``url::isProtocol``    src/utils/url.cxx:597-603

These definitions fix URL identity, and therefore the URL-seen set: the
seen bitset is 64,000,000 bits with a single poly-31 hash (types.h:26),
so hash collisions silently drop URLs — replicating the collision
behavior requires replicating the exact polynomial, modulus, and the
byte-exact normalized form being hashed.

All functions operate on ``bytes`` (the reference operates on signed
``char*``; where signedness matters — high-bit bytes in hash codes — we
reproduce two's-complement behavior explicitly).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from larbin_ray.config import HASH_SIZE, MAX_SITE_SIZE, MAX_URL_SIZE, NAMED_SITE_LIST_SIZE

_SLASH = 0x2F
_DOT = 0x2E
_HASH = 0x23
_PERCENT = 0x25
_COLON = 0x3A

_RX_FN_SPECIAL = re.compile(rb"[%#\x00]|/[/.]")
_RX_HOST_END = re.compile(rb"[/:]")


def _hex_to_int(c: int) -> int:
    """url.cxx:52-62."""
    if 0x30 <= c <= 0x39:
        return c - 0x30
    if 0x61 <= c <= 0x66:
        return c - 0x61 + 10
    if 0x41 <= c <= 0x46:
        return c - 0x41 + 10
    return -1


def file_normalize(file: bytes) -> bytes | None:
    """In-place path normalization, url.cxx:82-172 (``fileNormalize``).

    Returns the normalized path, or None when the reference returns false
    (bad %-escape, non-graph escaped char other than %20, or ``..``
    escaping above the root).  Notes on quirks kept on purpose:

    - scanning stops at ``#`` (fragment truncated);
    - ``%xx`` decodes when the char is "graph" (0x21..0x7e — this includes
      ``/``: ``%2f`` IS decoded, the ``c=='/'`` keep-branch at url.cxx:162
      is unreachable because isgraph('/') is true); ``%20`` is kept
      escaped; any other value (controls, high-bit as signed char) rejects
      the whole URL;
    - a decoded char is skipped, never re-examined (no double decoding,
      and a decoded ``/`` does not participate in ``//`` collapsing).
    """
    # Fast path: the loop below only rewrites/rejects when it sees '%',
    # '#', NUL, or '/' followed by '/' or '.'; absent all of those the
    # input comes back unchanged ('/.x' is a harmless false positive
    # that just takes the slow path).
    if _RX_FN_SPECIAL.search(file) is None:
        return file
    buf = bytearray(file)

    def at(j: int) -> int:
        return buf[j] if j < len(buf) else 0

    i = 0
    while i < len(buf) and buf[i] != 0 and buf[i] != _HASH:
        c = buf[i]
        if c == _SLASH:
            n1, n2, n3 = at(i + 1), at(i + 2), at(i + 3)
            if n1 == _DOT and n2 == _SLASH:
                del buf[i + 1:i + 3]            # suppress /./
            elif n1 == _SLASH:
                del buf[i + 1:i + 2]            # // -> /
            elif n1 == _DOT and n2 == _DOT and n3 == _SLASH:
                if i == 0:
                    return None                 # starts with /../
                j = i - 1
                while j >= 0 and buf[j] != _SLASH:
                    j -= 1
                if j < 0:
                    return None                 # no '/' before (defensive; file[0]=='/' normally)
                del buf[j + 1:i + 4]            # resolve /../
                i = j                           # re-examine the '/' we landed on
            elif n1 == _DOT and n2 == 0:
                del buf[i + 1:]                 # trailing /.
                return bytes(buf)
            elif n1 == _DOT and n2 == _DOT and n3 == 0:
                if i == 0:
                    return None                 # starts with /..
                j = i - 1
                while j >= 0 and buf[j] != _SLASH:
                    j -= 1
                if j < 0:
                    return None
                del buf[j + 1:]                 # trailing /..
                return bytes(buf)
            else:
                i += 1
        elif c == _PERCENT:
            v1 = _hex_to_int(at(i + 1))
            v2 = _hex_to_int(at(i + 2))
            if v1 < 0 or v2 < 0:
                return None
            ch = 16 * v1 + v2
            if 0x21 <= ch <= 0x7E:              # isgraph on signed char
                buf[i] = ch
                del buf[i + 1:i + 3]
                i += 1                          # decoded char is not re-examined
            elif ch == 0x20:
                i += 3                          # keep %20 escaped
            else:
                return None                     # control / high-bit escape: bad url
        else:
            i += 1
    del buf[i:]                                 # truncate at '#' or NUL
    return bytes(buf)


def normalize_file(file: bytes) -> bytes | None:
    """``url::normalize`` url.cxx:566-594: fileNormalize, then re-escape
    high-bit bytes (signed char < 0) to lowercase ``%xx``."""
    f = file_normalize(file)
    if f is None:
        return None
    if f.isascii():
        return f
    out = bytearray()
    for b in f:
        if b >= 0x80:
            out += b"%%%02x" % b
        else:
            out.append(b)
    return bytes(out)


def lower_case(b: int) -> int:
    """utils/text.cxx:33-39 — ASCII A-Z only."""
    if 0x41 <= b <= 0x5A:
        return b + 0x20
    return b


def _lower_bytes(s: bytes) -> bytes:
    return s.lower()  # bytes.lower() is ASCII A-Z only == text.cxx:33-39


def is_protocol(u: bytes) -> bool:
    """url.cxx:597-603: ``[[:alnum:]]*:`` prefix (ASCII alnum)."""
    i = 0
    while i < len(u) and (0x30 <= u[i] <= 0x39 or 0x41 <= u[i] <= 0x5A or 0x61 <= u[i] <= 0x7A):
        i += 1
    return i < len(u) and u[i] == _COLON


def _signed(b: int) -> int:
    return b - 256 if b >= 0x80 else b


# byte -> signed char, as a table: the poly-hash loops below are the
# crawl's hottest per-candidate kernel, and a tuple index beats a
# function call + comparison per byte
_SIGNED_TAB = tuple(b - 256 if b >= 0x80 else b for b in range(256))


@dataclass
class Url:
    """The frontier record (reference ``url``, src/utils/url.h:31-128).

    ``host is None or file is None`` means the parse failed (reference
    deletes both on bad normalize, url.cxx:193-199).
    """

    host: bytes | None
    port: int
    file: bytes | None
    depth: int
    cookie: bytes | None = None

    def is_valid(self) -> bool:
        """url.cxx:316-322."""
        if self.host is None or self.file is None:
            return False
        lh = len(self.host)
        return lh < MAX_SITE_SIZE and lh + len(self.file) + 18 < MAX_URL_SIZE

    def give_url(self) -> bytes:
        """url.cxx:433-439 (``writeUrl``): port elided when 80."""
        assert self.host is not None and self.file is not None
        if self.port == 80:
            return b"http://" + self.host + self.file
        return b"http://%s:%u%s" % (self.host, self.port, self.file)

    def give_base(self) -> "Url":
        """url.cxx:394-404: path truncated after the last '/'."""
        assert self.file is not None and self.file[0:1] == b"/"
        i = len(self.file) - 1
        while self.file[i] != _SLASH:
            i -= 1
        return Url(self.host, self.port, self.file[:i + 1], 0)

    def hash_code(self) -> int:
        """url.cxx:474-482: uint32 poly-31 over (port, host, file) mod 64e6.

        Bytes feed in as *signed* chars (two's complement) — matters for
        high-bit bytes in IDN hosts.

        The mask is deferred to once per string: mod-2^32 distributes
        over the Horner steps, and Python bigints carry the unreduced
        value exactly (host <= 255 B, file <= ~1 KiB, so h stays under
        ~5100 bits — 2x faster than masking per byte on typical URLs)."""
        S = _SIGNED_TAB
        h = self.port & 0xFFFFFFFF
        for b in self.host:
            h = 31 * h + S[b]
        h &= 0xFFFFFFFF
        for b in self.file:
            h = 31 * h + S[b]
        return (h & 0xFFFFFFFF) % HASH_SIZE

    def host_hash_code(self) -> int:
        """url.cxx:40-46: uint32 poly-37 over host mod 20000."""
        return site_hash_code(self.host)


_PUNY_CACHE: dict[bytes, bytes] = {}


def puny_host(host: bytes) -> bytes:
    """IDN host -> ASCII (xn--) form, the reference's ``getPunycode``
    (url.cxx:331-338, utils/punycode.cxx).  ASCII hosts pass through
    unchanged; labels that fail to encode stay raw (the reference's
    encoder also passes already-ASCII labels through).  Uses the
    standard IDNA/Punycode algorithm (RFC 3492), which is what
    punycode.cxx implements."""
    if all(b < 0x80 for b in host):
        return host
    hit = _PUNY_CACHE.get(host)
    if hit is None:
        labels = []
        for label in host.split(b"."):
            if all(b < 0x80 for b in label):
                labels.append(label)
            else:
                try:
                    labels.append(b"xn--" + label.decode("utf-8")
                                  .encode("punycode"))
                except (UnicodeDecodeError, UnicodeEncodeError):
                    labels.append(label)
        hit = b".".join(labels)
        _PUNY_CACHE[host] = hit
    return hit


def site_hash_code(host: bytes) -> int:
    # mask deferred to the end, see Url.hash_code (host <= 255 bytes)
    S = _SIGNED_TAB
    h = 0
    for b in host:
        h = 37 * h + S[b]
    return (h & 0xFFFFFFFF) % NAMED_SITE_LIST_SIZE


def _parse_absolute(arg: bytes, depth: int) -> Url:
    """url.cxx:488-529 (after ``http://`` has been stripped)."""
    m = _RX_HOST_END.search(arg)
    fin = m.start() if m is not None else len(arg)
    if fin == 0:
        return Url(None, 80, None, depth)
    host = _lower_bytes(arg[:fin])
    port = 80
    if fin < len(arg) and arg[fin] == _COLON:
        port = 0
        fin += 1
        while fin < len(arg) and 0x30 <= arg[fin] <= 0x39:
            port = (port * 10 + arg[fin] - 0x30) & 0xFFFF  # uint16 member wraps
            fin += 1
    if fin >= len(arg) or arg[fin] != _SLASH:
        file = b"/"     # no path (or junk after port): final '/' added
    else:
        file = arg[fin:]
    return Url(host, port, file, depth)


def _parse_with_base(u: bytes, base: Url, depth: int) -> Url:
    """url.cxx:533-560."""
    if u[0:1] == b"/":
        file = u
    else:
        assert base.file is not None
        file = base.file + u
    file = normalize_file(file)
    if file is None:
        return Url(None, 80, None, depth)
    return Url(base.host, base.port, file, depth)


def parse_url(u: bytes, depth: int, base: Url | None) -> Url:
    """The ``url(char*, int, url*)`` constructor, url.cxx:177-211.

    - ``http://...`` (case-sensitive prefix): absolute parse + normalize;
    - else, with a base: ``http:<path>`` joins with base; other
      ``scheme:`` URLs are dropped; everything else is relative;
    - no base and not absolute: dropped (seed context).
    """
    # NUL-terminated semantics: a C string stops at the first NUL byte.
    nul = u.find(b"\0")
    if nul != -1:
        u = u[:nul]
    if u.startswith(b"http://"):
        r = _parse_absolute(u[7:], depth)
        if r.file is not None:
            f = normalize_file(r.file)
            if f is None:
                return Url(None, 80, None, depth)
            r.file = f
        return r
    if base is not None and base.host is not None:
        if u.startswith(b"http:"):
            return _parse_with_base(u[5:], base, depth)
        if is_protocol(u):
            return Url(None, 80, None, depth)
        return _parse_with_base(u, base, depth)
    return Url(None, 80, None, depth)
