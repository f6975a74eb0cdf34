"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode/resize/feature stages are the real Ray-side plumbing a
100-TB media pipeline needs — schema, actor signatures, batch sizing
for large binary rows, partitioned output layout.  The codec layer
itself is pluggable: this container ships no image/audio libraries, so
the default backend is a clearly-marked DETERMINISTIC FAKE that derives
pixel/sample arrays from the payload bytes (stable across runs and
workers); ``PilBackend``/``SoundfileBackend`` slot in when the real
libraries exist (import-guarded).

Batch-size note: rows carry payloads of 10s-100s of KiB, so stages use
small ``batch_size`` (32-128) to keep batch x concurrency within worker
heap — the guidance from SURVEY.md §4 memory-awareness applied to wide
binary rows.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),          # images/video
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),    # audio
    ("duration_ms", pa.int32()),    # audio/video
    ("codec", pa.string()),
])


def _image_stats(arr: np.ndarray, thumb: int = 32) -> dict:
    """Pixel stats + thumbnail dims of a decoded (h, w, 3) array — THE
    formulas ImageFeatures emits, shared with the truth side
    (media_truth) so the value-exact oracle checks the codec round-trip,
    never formula drift."""
    scale = max(arr.shape[0], arr.shape[1]) / thumb
    return {"px_mean": round(float(arr.mean()), 4),
            "px_std": round(float(arr.std()), 4),
            "decoded_h": arr.shape[0], "decoded_w": arr.shape[1],
            "thumb_h": max(1, int(arr.shape[0] / scale)),
            "thumb_w": max(1, int(arr.shape[1] / scale))}


def _audio_stats(wave: np.ndarray) -> dict:
    """Waveform stats of a decoded mono float wave — shared by
    AudioFeatures and the truth side (see _image_stats)."""
    return {"rms": round(float(np.sqrt((wave ** 2).mean())), 6),
            "zcr": round(float((np.diff(np.sign(wave)) != 0).mean()), 6),
            "n_samples": len(wave)}


def gen_media(n: int = 120, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table.  Every second image row is
    a REAL PNG (encoded by the stdlib codec in kernels/png.py) and
    every second audio row a REAL 16-bit PCM WAV (kernels/wav.py) so
    the decode stages run on genuine encoded bytes; the rest are seeded
    noise stand-ins that exercise the fake-backend path."""
    return _gen_media(n, seed)[0]


def media_truth(n: int = 120, seed: int = 42) -> pd.DataFrame:
    """Expected decoded stats for the REAL-codec rows of gen_media(n,
    seed), in long form (media_id, metric, value) — computed from the
    PRE-ENCODE ground-truth arrays (the pixel/sample data gen_media fed
    the encoders), NOT by decoding, so a value match pins the whole
    encode->Ray-pipeline->decode->stats chain.  The audio truth applies
    the encoder's documented int16 quantization (kernels/wav.py) before
    the stats — the only lossy step in the chain."""
    _tbl, truths = _gen_media(n, seed)
    rows = []
    for mid in sorted(truths):
        kind, arr = truths[mid]
        if kind == "image":
            stats = _image_stats(arr)
        else:
            pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
            stats = _audio_stats(pcm.astype(np.float32) / 32767.0)
        rows.extend((mid, k, float(v)) for k, v in sorted(stats.items()))
    return pd.DataFrame(rows, columns=["media_id", "metric", "value"]) \
        .astype({"media_id": "int64", "metric": "string", "value": "float64"})


def _gen_media(n: int, seed: int) -> tuple[pa.Table, dict]:
    """(media table, {media_id: (kind, ground-truth array)} for the
    real-codec rows)."""
    from larbin_ray.kernels.png import png_encode
    from larbin_ray.kernels.wav import wav_encode

    truths: dict[int, tuple[str, np.ndarray]] = {}
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        w = int(rng.choice([320, 640, 1024])) if kind != "audio" else 0
        h = int(rng.choice([240, 480, 768])) if kind != "audio" else 0
        codec = {"image": "fake-jpeg", "audio": "fake-pcm",
                 "video": "fake-h264"}[kind]
        if kind == "image" and (i // 3) % 2 == 0:
            # real PNG: small deterministic gradient + seeded noise
            pw, ph = 24 + (i % 5) * 4, 16 + (i % 7) * 4
            yy, xx = np.mgrid[0:ph, 0:pw]
            base = ((xx * 5 + yy * 3 + i) % 256).astype(np.uint8)
            arr = np.stack([base,
                            ((base.astype(int) + 85) % 256).astype(np.uint8),
                            rng.randint(0, 256, (ph, pw), dtype=np.uint8)],
                           axis=2)
            payload, codec, w, h = png_encode(arr), "png", pw, ph
            truths[i] = ("image", arr)
        elif kind == "audio" and (i // 3) % 2 == 0:
            # real WAV: deterministic tone + seeded noise, short clip
            sr = 16_000
            dur = 0.05 + (i % 7) * 0.01
            t = np.arange(int(sr * dur)) / sr
            wave = (0.4 * np.sin(2 * np.pi * (200 + i * 13) * t)
                    + 0.05 * rng.standard_normal(len(t)))
            payload, codec = wav_encode(wave, sr), "pcm_s16le"
            truths[i] = ("audio", wave)
        else:
            payload = rng.bytes(int(rng.randint(2_000, 40_000)))
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["sample_rate"].append(16_000 if kind == "audio" else 0)
        rows["duration_ms"].append(int(rng.randint(500, 30_000)) if kind != "image" else 0)
        rows["codec"].append(codec)
    tbl = pa.table({k.name: pa.array(rows[k.name], k.type)
                    for k in MEDIA_SCHEMA})
    return tbl, truths


class FakeCodecBackend:
    """Decode backend.  PNG payloads decode FOR REAL via the stdlib
    codec (kernels/png.py); other codecs fall back to a DETERMINISTIC
    FAKE (STUB — the container has no PIL/soundfile/ffmpeg): arrays
    derive from a crc32 of the payload, identical on every worker and
    every run.  A real deployment swaps in PilBackend / SoundfileBackend
    below."""

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        from larbin_ray.kernels.png import PNG_SIG, png_decode
        if payload[:8] == PNG_SIG:
            return png_decode(payload)       # the real codec path
        rng = np.random.RandomState(zlib.crc32(payload) & 0x7FFFFFFF)
        w, h = max(1, width) % 64 + 8, max(1, height) % 64 + 8   # bounded fake
        return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)

    def decode_audio(self, payload: bytes, sample_rate: int,
                     duration_ms: int) -> np.ndarray:
        from larbin_ray.kernels.wav import WAV_SIG, wav_decode
        if payload[:4] == WAV_SIG:
            wave, _sr = wav_decode(payload)      # the real codec path
            return wave if wave.ndim == 1 else wave.mean(axis=1)
        rng = np.random.RandomState(zlib.crc32(payload) & 0x7FFFFFFF)
        n = max(8, min(16_000, sample_rate * duration_ms // 1000 // 100))
        return (rng.rand(n) * 2 - 1).astype(np.float32)

    def frame_count(self, duration_ms: int) -> int:
        return max(1, duration_ms * 25 // 1000)   # fake 25fps


class PilBackend(FakeCodecBackend):
    """Real image decoding when Pillow is available."""

    def __init__(self):
        import io

        from PIL import Image  # raises ImportError if absent
        self._Image = Image
        self._io = io

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        img = self._Image.open(self._io.BytesIO(payload))
        return np.asarray(img.convert("RGB"))


def default_backend() -> FakeCodecBackend:
    try:
        return PilBackend()
    except ImportError:
        return FakeCodecBackend()


class ImageFeatures:
    """Actor-pool stage: decode + pixel statistics (+ thumbnail dims).
    Backend constructed ONCE per actor (the model-load slot)."""

    def __init__(self, thumb: int = 32):
        self.backend = default_backend()
        self.thumb = thumb

    def __call__(self, t: pa.Table) -> pa.Table:
        stats = [_image_stats(self.backend.decode_image(payload, w, h),
                              self.thumb)
                 for payload, w, h in zip(t["payload"].to_pylist(),
                                          t["width"].to_pylist(),
                                          t["height"].to_pylist())]
        return pa.table({
            "media_id": t["media_id"],
            "px_mean": pa.array([s["px_mean"] for s in stats], pa.float64()),
            "px_std": pa.array([s["px_std"] for s in stats], pa.float64()),
            "decoded_w": pa.array([s["decoded_w"] for s in stats], pa.int32()),
            "decoded_h": pa.array([s["decoded_h"] for s in stats], pa.int32()),
            "thumb_w": pa.array([s["thumb_w"] for s in stats], pa.int32()),
            "thumb_h": pa.array([s["thumb_h"] for s in stats], pa.int32()),
        })


class AudioFeatures:
    """Actor-pool stage: waveform stats (rms, zero-crossing rate)."""

    def __init__(self):
        self.backend = default_backend()

    def __call__(self, t: pa.Table) -> pa.Table:
        stats = [_audio_stats(self.backend.decode_audio(payload, sr, dur))
                 for payload, sr, dur in zip(t["payload"].to_pylist(),
                                             t["sample_rate"].to_pylist(),
                                             t["duration_ms"].to_pylist())]
        return pa.table({
            "media_id": t["media_id"],
            "rms": pa.array([s["rms"] for s in stats], pa.float64()),
            "zcr": pa.array([s["zcr"] for s in stats], pa.float64()),
            "n_samples": pa.array([s["n_samples"] for s in stats], pa.int64()),
        })


class VideoFrameSample:
    """Actor-pool stage: sample every Nth frame, emit per-frame feature
    rows (explodes: one input row -> many output rows)."""

    def __init__(self, every_n: int = 50):
        self.backend = default_backend()
        self.every_n = every_n

    def __call__(self, t: pa.Table) -> pa.Table:
        mids, frames, feats = [], [], []
        for mid, payload, dur in zip(t["media_id"].to_pylist(),
                                     t["payload"].to_pylist(),
                                     t["duration_ms"].to_pylist()):
            total = self.backend.frame_count(dur)
            for f in range(0, total, self.every_n):
                mids.append(mid)
                frames.append(f)
                feats.append(round(
                    float(zlib.crc32(payload + f.to_bytes(4, "big")) % 1000) / 1000, 6))
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "frame": pa.array(frames, pa.int32()),
            "frame_feat": pa.array(feats, pa.float64()),
        })


class MediaEmbedder:
    """Actor-pool stage: payload -> deterministic pseudo-embedding (the
    model-inference slot; md5-seeded so it is stable everywhere)."""

    def __init__(self, dim: int = 32):
        self.dim = dim

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for payload in t["payload"].to_pylist():
            seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
            v = np.random.RandomState(seed).randn(self.dim)
            v /= np.linalg.norm(v)
            out.append(np.round(v, 6).tolist())
        return pa.table({
            "media_id": t["media_id"],
            "embedding": pa.array(out, pa.list_(pa.float64())),
        })


def media_pipeline(media: pa.Table, out_dir: str | None = None,
                   concurrency: int | None = None) -> dict[str, rd.Dataset]:
    """Route each kind to its stage; optionally write Parquet partitioned
    by kind (the resumable layout).  Returns the per-kind datasets."""
    from larbin_ray.pipelines import pool_size
    from larbin_ray.pipelines.extract import from_table

    c = concurrency or pool_size()
    ds = from_table(media, 8)
    images = ds.filter(expr="kind == 'image'").map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=64, concurrency=c)
    audio = ds.filter(expr="kind == 'audio'").map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=64, concurrency=c)
    video = ds.filter(expr="kind == 'video'").map_batches(
        VideoFrameSample, batch_format="pyarrow", batch_size=32, concurrency=c)
    embed = ds.map_batches(MediaEmbedder, batch_format="pyarrow",
                           batch_size=64, concurrency=c)
    out = {"image": images, "audio": audio, "video": video, "embedding": embed}
    if out_dir:
        for kind, d in out.items():
            d.write_parquet(f"{out_dir}/kind={kind}")
    return out


MEDIA_DECODED_N = 360


class _DecodedStatsLong:
    """Actor-pool stage behind media_features_decoded: decode the
    real-codec rows of a mixed batch (png images, pcm_s16le audio) and
    emit the long (media_id, metric, value) rows both kinds share."""

    def __init__(self):
        self.backend = default_backend()

    def __call__(self, t: pa.Table) -> pa.Table:
        mids, metrics, values = [], [], []
        for mid, kind, payload, w, h, sr, dur in zip(
                t["media_id"].to_pylist(), t["kind"].to_pylist(),
                t["payload"].to_pylist(), t["width"].to_pylist(),
                t["height"].to_pylist(), t["sample_rate"].to_pylist(),
                t["duration_ms"].to_pylist()):
            if kind == "image":
                stats = _image_stats(self.backend.decode_image(payload, w, h))
            else:
                stats = _audio_stats(self.backend.decode_audio(payload, sr, dur))
            for k in sorted(stats):
                mids.append(mid)
                metrics.append(k)
                values.append(float(stats[k]))
        return pa.table({"media_id": pa.array(mids, pa.int64()),
                         "metric": pa.array(metrics, pa.string()),
                         "value": pa.array(values, pa.float64())})


def media_features_decoded(sf_dir: str) -> pd.DataFrame:
    """queries() entry, VALUE-EXACT: the decoded stats of the real-codec
    rows (png / pcm_s16le) in long form (media_id, metric, value).  The
    oracle is the inlined ``media_truth`` table — expected values from
    the PRE-ENCODE ground-truth arrays — so the check pins the
    encode -> Ray actor-pool decode -> stats chain end to end.
    Deliberately sf-independent (the media table is synthesized, not
    read from sf_dir), keeping the oracle SQL a static string at any
    graded scale."""
    import pyarrow.compute as pc

    from larbin_ray.pipelines import pool_size
    from larbin_ray.pipelines.extract import from_table

    media = gen_media(MEDIA_DECODED_N, seed=42)
    real = media.filter(pc.is_in(media["codec"],
                                 value_set=pa.array(["png", "pcm_s16le"])))
    # ONE actor-pool stage handling both kinds per batch (running the
    # image and audio pools sequentially paid two spin-ups back to back
    # — the kinds are independent, the long output schema is shared)
    out = (from_table(real, 8)
           .map_batches(_DecodedStatsLong, batch_format="pyarrow",
                        batch_size=64, concurrency=pool_size())
           .to_pandas()
           .astype({"media_id": "int64", "metric": "string",
                    "value": "float64"}))
    return out.sort_values(["media_id", "metric"]).reset_index(drop=True)


def media_decoded_oracle_sql() -> str:
    """DuckDB oracle for media_features_decoded: the truth table inlined
    as VALUES with string-literal DOUBLE casts (exact shortest-repr
    round-trip, no decimal-type unification surprises)."""
    t = media_truth(MEDIA_DECODED_N, seed=42)
    vals = ",\n".join(
        f"(CAST({int(r.media_id)} AS BIGINT), '{r.metric}', "
        f"CAST('{float(r.value)!r}' AS DOUBLE))"
        for r in t.itertuples())
    return ("SELECT media_id, metric, value FROM (VALUES\n" + vals +
            "\n) AS t(media_id, metric, value)")


def media_features(sf_dir: str) -> pd.DataFrame:
    """queries() entry: summary row per media item (rows-only check)."""
    from larbin_ray.pipelines import sf_tier
    n = 120 if sf_tier(sf_dir) == "0.001" else 360
    media = gen_media(n, seed=42)
    out = media_pipeline(media)
    img = out["image"].to_pandas()
    aud = out["audio"].to_pandas()
    vid = out["video"].to_pandas().groupby("media_id", as_index=False).agg(
        n_frames=("frame", "size"))
    base = media.select(["media_id", "kind"]).to_pandas()
    merged = (base.merge(img, on="media_id", how="left")
                  .merge(aud, on="media_id", how="left")
                  .merge(vid, on="media_id", how="left"))
    return merged.sort_values("media_id").reset_index(drop=True)
