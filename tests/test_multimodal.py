"""Multimodal plumbing: schemas, Arrow batching, column pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.operators.multimodal import (
    extract_image_features,
    gen_media,
    media_stats,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return gen_media(spark, n_rows=120).cache()


def test_gen_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    assert media.count() == 120
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_image_features_fake_kernel(media):
    feats = extract_image_features(media, dim=32, fake=True)
    rows = feats.collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(rows) == n_images
    assert all(len(r.features) == 32 for r in rows)
    assert all(0.0 <= v <= 1.0 for v in rows[0].features)
    # deterministic: same payload → same features
    again = extract_image_features(media, dim=32, fake=True).collect()
    assert {r.media_id: r.features for r in rows} == {r.media_id: r.features for r in again}


def test_image_features_real_ppm_decode(media):
    """The non-fake kernel genuinely parses the P6 payload bytes."""
    from logstash_integration_jdbc_spark.operators.multimodal import parse_ppm

    rows = extract_image_features(media, dim=8, fake=False).collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(rows) == n_images
    payloads = {r.media_id: bytes(r.payload)
                for r in media.filter(F.col("kind") == "image").collect()}
    for r in rows[:5]:
        w, h, start, end = parse_ppm(payloads[r.media_id])
        assert (r.width, r.height) == (w, h)
        assert r.n_bytes == len(payloads[r.media_id])
        # first bucket feature = mean of the first pixel-byte slice
        import numpy as np
        px = np.frombuffer(payloads[r.media_id][start:end], dtype=np.uint8)
        first = np.array_split(px.astype(float), 8)[0].mean() / 255.0
        assert abs(r.features[0] - first) < 1e-6


def test_image_decode_unsupported_mime_raises(spark):
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"\xff\xd8\xff\xe0 fake jpeg"),
          (4, 4, 0, 0, "image/jpeg"))],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,mime:string>",
    )
    with pytest.raises(Exception, match="Pillow|NotImplementedError"):
        extract_image_features(df, fake=False).collect()


def test_audio_features_real_wav_decode(media):
    from logstash_integration_jdbc_spark.operators.multimodal import (
        extract_audio_features,
    )

    rows = extract_audio_features(media).collect()
    n_audio = media.filter(F.col("kind") == "audio").count()
    assert len(rows) == n_audio
    metas = {r.media_id: r.meta for r in media.filter(F.col("kind") == "audio").collect()}
    for r in rows:
        assert r.sample_rate == metas[r.media_id]["sample_rate"]  # from header
        assert r.n_samples == r.sample_rate // 10                 # 100 ms clips
        assert abs(r.duration_s - 0.1) < 1e-9
        assert r.rms > 0


def test_frame_sampling_real_container(media):
    """Non-fake path walks the concatenated-PPM container; every emitted
    frame is itself a complete, parseable PPM."""
    from logstash_integration_jdbc_spark.operators.multimodal import parse_ppm

    rows = sample_frames(media, every_n=2, max_frames=3, fake=False).collect()
    metas = {r.media_id: r.meta for r in media.filter(F.col("kind") == "video").collect()}
    assert {r.media_id for r in rows} == set(metas)
    for r in rows:
        b = bytes(r.frame_bytes)
        w, h, _start, end = parse_ppm(b)
        assert end == len(b)
        assert (w, h) == (metas[r.media_id]["width"], metas[r.media_id]["height"])
        assert r.frame_idx % 2 == 0


def test_frame_sampling_explodes_rows(media):
    frames = sample_frames(media, every_n=30, max_frames=4, fake=True)
    rows = frames.collect()
    n_videos = media.filter(F.col("kind") == "video").count()
    assert len(rows) >= n_videos  # ≥1 frame per video
    per_vid = {}
    for r in rows:
        per_vid.setdefault(r.media_id, []).append(r.frame_idx)
    assert all(len(v) <= 4 for v in per_vid.values())
    assert all(sorted(v) == v for v in per_vid.values())


def test_media_stats_prunes_payload_column(media, spark, tmp_path):
    # from parquet (pruning is a scan property), payload must not be read
    p = str(tmp_path / "media.parquet")
    media.write.parquet(p)
    df = spark.read.parquet(p)
    plan = media_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan.split("ReadSchema")[1][:400]


def test_resize_real_nearest_neighbor(media):
    from logstash_integration_jdbc_spark.operators.multimodal import (
        parse_ppm,
        resize_images,
    )

    out = resize_images(media, out_w=8, out_h=6)
    rows = {r.media_id: r for r in out.collect()}
    srcs = {r.media_id: bytes(r.payload)
            for r in media.filter(F.col("kind") == "image").collect()}
    assert rows.keys() == srcs.keys()
    for mid, r in rows.items():
        b = bytes(r.payload)
        w, h, start, end = parse_ppm(b)
        assert (w, h) == (8, 6) and end == len(b)
        # independent pure-Python nearest-neighbor expectation
        sb = srcs[mid]
        sw, sh, sstart, send = parse_ppm(sb)
        px = sb[sstart:send]
        expected = bytearray()
        for rr in range(6):
            sr = (rr * sh) // 6
            for cc in range(8):
                sc = (cc * sw) // 8
                o = (sr * sw + sc) * 3
                expected += px[o:o + 3]
        assert b[start:end] == bytes(expected)


def test_resize_upscale_and_identity(spark):
    from logstash_integration_jdbc_spark.operators.multimodal import (
        parse_ppm,
        resize_images,
    )

    df = gen_media(spark, n_rows=40).filter(F.col("kind") == "image").limit(1)
    src = df.collect()[0]
    sw, sh = src.meta["width"], src.meta["height"]
    # identity resize reproduces the source payload byte-for-byte
    same = resize_images(df, out_w=sw, out_h=sh).collect()[0]
    assert bytes(same.payload) == bytes(src.payload)
    # upscale: dims change, payload stays a valid standalone PPM
    up = resize_images(df, out_w=sw * 2, out_h=sh * 2).collect()[0]
    w, h, _s, end = parse_ppm(bytes(up.payload))
    assert (w, h) == (sw * 2, sh * 2) and end == len(bytes(up.payload))


def test_resize_unsupported_mime_raises(spark):
    from pyspark.sql import Row

    from logstash_integration_jdbc_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    jpeg = spark.createDataFrame(
        [Row(media_id=1, kind="image", payload=b"\xff\xd8\xff\xe0fakejpeg",
             meta=Row(width=4, height=4, sample_rate=0, n_frames=0,
                      mime="image/jpeg"))],
        schema=MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="Pillow"):
        resize_images(jpeg, out_w=2, out_h=2).collect()
