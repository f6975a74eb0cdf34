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
