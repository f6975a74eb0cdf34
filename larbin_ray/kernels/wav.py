"""Pure-stdlib WAV (RIFF PCM) codec — the audio analog of kernels/png:
one REAL audio codec path so the decode plumbing runs on genuine
encoded bytes (this container ships no soundfile/ffmpeg).

Supports 16-bit PCM mono/stereo, the format the synthetic media table
emits.  Fixture-scale codec: correctness over speed.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_SIG = b"RIFF"


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """float samples in [-1, 1] (n,) or (n, channels) -> 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 samples in [-1, 1] shaped (n,) mono /
    (n, ch), sample_rate).  16-bit PCM only."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sr = ch = bits = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        ln = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if cid == b"fmt ":
            audio_fmt, ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", chunk[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError("unsupported WAV (need 16-bit PCM)")
        elif cid == b"data":
            pcm = chunk
    if pcm is None or sr is None:
        raise ValueError("missing fmt/data chunk")
    arr = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32767.0
    if ch > 1:
        arr = arr.reshape(-1, ch)
    return arr, sr
