"""Byte-string helpers replicating /root/reference/src/utils/text.cxx.

The reference's case-insensitive compares use ``b[i] | 0x20`` (text.cxx:
77-83, 97-109) — not tolower — so they are reproduced bit-for-bit here,
including the quirk that ``'\\r' | 0x20 == '-'``.
"""

from __future__ import annotations


def start_with(a: bytes, b: bytes) -> bool:
    """text.cxx:43-49 (b NUL-padded past its end)."""
    for i, ca in enumerate(a):
        cb = b[i] if i < len(b) else 0
        if ca != cb:
            return False
    return True


# b -> b | 0x20 for every byte: the reference's case fold as a C-speed
# translate table (NOT tolower — '\r' | 0x20 == '-' etc., see module doc)
_OR20 = bytes(c | 0x20 for c in range(256))


def start_with_ignore_case(amin: bytes, b: bytes, offset: int = 0) -> bool:
    """text.cxx:77-83: ``amin[i] == (b[i] | 0x20)``; amin must be lowercase.

    Fast path: when the window is fully inside ``b``, a translate+compare
    runs at C speed.  Past-the-end bytes read as NUL in the reference
    (``0 | 0x20 == 0x20``), so short buffers take the exact loop."""
    end = offset + len(amin)
    if end <= len(b):
        return b[offset:end].translate(_OR20) == amin
    for i, ca in enumerate(amin):
        j = offset + i
        cb = b[j] if j < len(b) else 0
        if ca != (cb | 0x20):
            return False
    return True


def end_with(a: bytes, b: bytes) -> bool:
    """text.cxx:87-92."""
    return len(a) <= len(b) and b.endswith(a)


def end_with_ignore_case(amin: bytes, b: bytes) -> bool:
    """text.cxx:97-109: suffix compare with ``| 0x20`` (in-bounds by the
    length guard, so the translate+compare is exact)."""
    la = len(amin)
    if la > len(b):
        return False
    return b[len(b) - la:].translate(_OR20) == amin


def case_contain(a: bytes, b: bytes) -> bool:
    """text.cxx:112-119 (strncasecmp — ASCII case-insensitive substring)."""
    return a.lower() in b.lower()


def robots_match(a: bytes, b: bytes) -> bool:
    """text.cxx:52-73: pattern ``a`` vs path ``b``; ``*`` skips forward to
    the next occurrence of the char following the star (strchr semantics:
    a trailing ``*`` matches to end-of-string)."""
    i = 0
    j = 0
    while i < len(a):
        if a[i] == 0x2A:  # '*'
            i += 1
            target = a[i] if i < len(a) else 0
            if target == 0:
                j = len(b)  # strchr(b+j, '\0') finds the terminator
            else:
                k = b.find(bytes([target]), j)
                if k == -1:
                    return False
                j = k
        else:
            cb = b[j] if j < len(b) else 0
            if a[i] != cb:
                return False
            i += 1
            j += 1
    return True


_WS = (0x20, 0x09, 0x0D, 0x0A)


def next_token(buf: bytes, pos: int, sep: int) -> tuple[bytes | None, int]:
    """text.cxx:173-212 tokenizer (as used by the robots parser with
    ``sep == ord(':')``): skips sep/whitespace, ``#`` comments to end of
    line, honors ``\"``-quoting; returns (token, new_pos); token None at
    end of input (a NUL terminates the scan, as in C)."""
    n = len(buf)

    def at(p: int) -> int:
        return buf[p] if p < n else 0

    while True:
        c = at(pos)
        if c == sep or c in _WS:
            pos += 1
        elif c == 0x23:  # '#'
            nl = buf.find(b"\n", pos)
            if nl == -1:
                return None, n
            pos = nl + 1
        else:
            break
    deb = pos
    if at(pos) == 0x22:  # '"'
        deb += 1
        pos += 1
        while at(pos) != 0 and at(pos) != 0x22:
            pos += 1
        tok = buf[deb:pos]
    else:
        while at(pos) != 0 and at(pos) != sep and at(pos) not in _WS:
            pos += 1
        if pos == deb:
            return None, pos  # EOF (or NUL byte)
        tok = buf[deb:pos]
    if at(pos) != 0:
        pos += 1
    return tok, pos


def match_priv_ext(file: bytes, privileged_exts: tuple[bytes, ...]) -> bool:
    """text.cxx:215-223 (caller guards on specificSearch)."""
    return any(end_with_ignore_case(e, file) for e in privileged_exts)


def match_content_type(ct_area: bytes, content_types: tuple[bytes, ...]) -> int:
    """text.cxx:226-234: index of the first content-type prefix match, -1."""
    for i, ct in enumerate(content_types):
        if start_with_ignore_case(ct.lower(), ct_area):
            return i
    return -1
