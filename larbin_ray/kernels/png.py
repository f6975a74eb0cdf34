"""Pure-stdlib PNG codec (zlib + struct — this container ships no
image libraries, and the multimodal pipeline still needs ONE real
codec path so the decode plumbing is exercised on genuine encoded
bytes, not only the deterministic fake backend).

Supports 8-bit RGB/RGBA, non-interlaced, all five PNG scanline filters
on decode (the encoder emits filter 0).  This is a fixture-scale codec:
correctness over speed; a production pipeline swaps in PIL/libpng via
the import-guarded ``PilBackend``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (len(data).to_bytes(4, "big") + typ + data
            + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big"))


def png_encode(arr: np.ndarray) -> bytes:
    """RGB(A) uint8 (h, w, 3|4) -> PNG bytes (filter 0, one IDAT)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("png_encode expects uint8 (h, w, 3|4)")
    h, w, ch = arr.shape
    color_type = 2 if ch == 3 else 6
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> RGB uint8 (h, w, 3).  8-bit RGB/RGBA only."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, []
    w = h = bitd = ct = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, bitd, ct, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk[:13])
            if bitd != 8 or ct not in (2, 6) or interlace:
                raise ValueError("unsupported PNG (need 8-bit RGB/RGBA, "
                                 "non-interlaced)")
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    ch = 3 if ct == 2 else 4
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(h):
        f = raw[p]
        cur = np.frombuffer(raw[p + 1:p + 1 + stride], dtype=np.uint8).copy()
        p += 1 + stride
        if f == 0:
            pass
        elif f == 2:                                   # Up — vectorized
            cur += prev
        elif f == 1:                                   # Sub
            for i in range(ch, stride):
                cur[i] = (int(cur[i]) + int(cur[i - ch])) & 0xFF
        elif f == 3:                                   # Average
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:                                   # Paeth
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                c = int(prev[i - ch]) if i >= ch else 0
                cur[i] = (int(cur[i]) + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        prev = cur
        out[y] = cur
    return out.reshape(h, w, ch)[:, :, :3]
