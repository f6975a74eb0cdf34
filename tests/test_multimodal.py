"""Multimodal plumbing: typed binary media columns through actor-pool
decode/feature stages (codec layer is the documented deterministic
stub; the Ray-side schema/batching/output layout is real)."""

import glob

import pyarrow as pa
import pytest

from larbin_ray.pipelines.multimodal import (
    MEDIA_SCHEMA,
    FakeCodecBackend,
    gen_media,
    media_features,
    media_pipeline,
)


def test_media_schema_and_determinism():
    a, b = gen_media(60, seed=42), gen_media(60, seed=42)
    assert a.schema.equals(MEDIA_SCHEMA)
    assert a.equals(b)
    assert set(a["kind"].to_pylist()) == {"image", "audio", "video"}


def test_fake_backend_deterministic():
    be = FakeCodecBackend()
    p = b"payload-bytes"
    x, y = be.decode_image(p, 640, 480), be.decode_image(p, 640, 480)
    assert (x == y).all() and x.ndim == 3 and x.shape[2] == 3
    w1, w2 = be.decode_audio(p, 16000, 2000), be.decode_audio(p, 16000, 2000)
    assert (w1 == w2).all()


def test_media_pipeline(ray_session, tmp_path):
    media = gen_media(90, seed=42)
    out = media_pipeline(media, out_dir=str(tmp_path / "media"), concurrency=2)
    img = out["image"].to_pandas()
    aud = out["audio"].to_pandas()
    vid = out["video"].to_pandas()
    emb = out["embedding"].to_pandas()
    assert len(img) == 30 and len(aud) == 30
    assert len(emb) == 90
    assert vid["frame"].min() == 0
    assert (img["px_std"] > 0).all()
    assert (aud["n_samples"] > 0).all()
    assert all(len(v) == 32 for v in emb["embedding"])
    # partitioned, resumable layout
    for kind in ("image", "audio", "video", "embedding"):
        assert glob.glob(str(tmp_path / "media" / f"kind={kind}" / "*.parquet")), kind


def test_media_pipeline_deterministic(ray_session):
    a = media_features("/root/testdata/sf0.001")
    b = media_features("/root/testdata/sf0.001")
    assert a.equals(b)


def test_png_roundtrip():
    """The stdlib PNG codec: encode -> decode is lossless for RGB, and
    decode handles every scanline filter type."""
    import numpy as np
    import zlib as _z

    from larbin_ray.kernels.png import PNG_SIG, _chunk, png_decode, png_encode

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    data = png_encode(arr)
    assert data[:8] == PNG_SIG
    out = png_decode(data)
    assert np.array_equal(out, arr)

    # hand-build a PNG whose rows use filters 1..4 (Sub/Up/Average/Paeth)
    import struct as _s
    h, w, ch = 5, 7, 3
    src = rng.randint(0, 256, (h, w, ch), dtype=np.uint8)
    lines = []
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y, f in zip(range(h), (0, 1, 2, 3, 4)):
        cur = src[y].reshape(-1).astype(np.int64)
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur.copy()
            filt[ch:] = (cur[ch:] - cur[:-ch]) % 256
        elif f == 2:
            filt = (cur - prev) % 256
        elif f == 3:
            filt = cur.copy()
            for i in range(w * ch):
                left = cur[i - ch] if i >= ch else 0
                filt[i] = (cur[i] - ((int(left) + int(prev[i])) >> 1)) % 256
        else:
            def paeth(a, b, c):
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                return a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            filt = cur.copy()
            for i in range(w * ch):
                a = cur[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                filt[i] = (cur[i] - paeth(int(a), int(prev[i]), int(c))) % 256
        lines.append(bytes([f]) + bytes(filt.astype(np.uint8)))
        prev = cur
    ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data2 = (PNG_SIG + _chunk(b"IHDR", ihdr)
             + _chunk(b"IDAT", _z.compress(b"".join(lines)))
             + _chunk(b"IEND", b""))
    assert np.array_equal(png_decode(data2), src)


def test_image_stage_decodes_real_png(ray_session):
    """px_mean of a PNG media row equals the numpy mean of the source
    pixels — proof the decode path runs on real encoded bytes."""
    import numpy as np

    from larbin_ray.kernels.png import png_decode
    from larbin_ray.pipelines.multimodal import ImageFeatures, gen_media

    media = gen_media(24, seed=42)
    png_rows = [i for i, c in enumerate(media["codec"].to_pylist()) if c == "png"]
    assert png_rows, "fixture must contain real PNG rows"
    t = media.take(png_rows)
    out = ImageFeatures()(t)
    for row in range(t.num_rows):
        arr = png_decode(t["payload"][row].as_py())
        assert abs(out["px_mean"][row].as_py() - float(arr.mean())) < 1e-3
        assert out["decoded_w"][row].as_py() == arr.shape[1]
        assert out["decoded_h"][row].as_py() == arr.shape[0]


def test_wav_roundtrip():
    import numpy as np

    from larbin_ray.kernels.wav import wav_decode, wav_encode

    rng = np.random.RandomState(5)
    mono = (rng.rand(800) * 2 - 1).astype(np.float64)
    data = wav_encode(mono, 16_000)
    out, sr = wav_decode(data)
    assert sr == 16_000
    assert out.shape == (800,)
    assert np.abs(out - mono).max() < 1.0 / 32000   # 16-bit quantization
    stereo = np.stack([mono, -mono], axis=1)
    out2, _ = wav_decode(wav_encode(stereo, 8_000))
    assert out2.shape == (800, 2)
    assert np.abs(out2[:, 0] - mono).max() < 1.0 / 32000


def test_audio_stage_decodes_real_wav(ray_session):
    """rms of a WAV media row equals the rms of the decoded samples —
    proof the audio decode path runs on real encoded bytes."""
    import numpy as np

    from larbin_ray.kernels.wav import wav_decode
    from larbin_ray.pipelines.multimodal import AudioFeatures, gen_media

    media = gen_media(24, seed=42)
    wav_rows = [i for i, c in enumerate(media["codec"].to_pylist())
                if c == "pcm_s16le"]
    assert wav_rows, "fixture must contain real WAV rows"
    t = media.take(wav_rows)
    out = AudioFeatures()(t)
    for row in range(t.num_rows):
        wave, _sr = wav_decode(t["payload"][row].as_py())
        assert abs(out["rms"][row].as_py()
                   - float(np.sqrt((wave ** 2).mean()))) < 1e-4
        assert out["n_samples"][row].as_py() == len(wave)


def test_media_features_decoded_matches_truth_oracle(ray_session):
    """The value-exact slice: decoded stats of real-codec rows must equal
    the pre-encode ground-truth stats (driver compare semantics: sorted
    rows/columns, exact values)."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as entry

    mine = entry.queries()["media_features_decoded"]("/root/testdata/sf0.001")
    ref = duckdb.connect().execute(
        entry.oracle_sql()["media_features_decoded"]).df()
    cols = sorted(mine.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = ref[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    # both real codecs are represented
    assert set(mine["metric"]) >= {"px_mean", "rms", "n_samples", "thumb_w"}
