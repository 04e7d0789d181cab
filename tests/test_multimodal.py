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


def test_image_decode_stub_raises_without_libs(media):
    with pytest.raises(Exception, match="Pillow|NotImplementedError"):
        extract_image_features(media, fake=False).collect()


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
