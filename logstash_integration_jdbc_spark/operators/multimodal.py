"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The decode kernels themselves are
STUBBED (no image/audio libraries in this container): by default they
raise ``NotImplementedError`` naming the real library to plug in; with
``fake=True`` they produce deterministic hash-derived outputs so the
Spark-side plumbing — schema, batch shape, partitioning — is fully
exercised and tested.

Scale notes: binary payloads dominate row size, so all plumbing
repartitions by a size-aware key before the Python stage (Arrow batches
are capped by ``spark.sql.execution.arrow.maxRecordsPerBatch``) and the
metadata-only projections never touch the payload column (column
pruning keeps the scan light — check ReadSchema in .explain).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mime", T.StringType()),
    ])),
])

IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, width int, height int, n_bytes bigint, features array<float>"
)
FRAME_SAMPLE_SCHEMA = "media_id bigint, frame_idx int, frame_bytes binary"


def gen_media(spark, n_rows: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    df = spark.range(n_rows)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.abs(F.xxhash64("id", F.lit(seed))) % 3 + 1).cast("int"),
    )
    payload = F.encode(F.sha2(F.concat(F.col("id").cast("string"), F.lit(seed)), 512), "UTF-8")
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.cast("binary").alias("payload"),
        F.struct(
            ((F.abs(F.xxhash64("id", F.lit(seed + 1))) % 512) + 16).cast("int").alias("width"),
            ((F.abs(F.xxhash64("id", F.lit(seed + 2))) % 512) + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            ((F.abs(F.xxhash64("id", F.lit(seed + 3))) % 300) + 1).cast("int").alias("n_frames"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-features from the payload digest."""
    out: list[float] = []
    h = payload or b""
    while len(out) < dim:
        h = hashlib.sha256(h).digest()
        out.extend(b / 255.0 for b in h)
    return out[:dim]


def extract_image_features(df: DataFrame, dim: int = 32, fake: bool = False) -> DataFrame:
    """Decode + featurize image payloads via mapInPandas (Arrow batches).

    Real kernel: plug Pillow/torchvision into ``decode``. The Spark-side
    contract (schema, batching, partition shape) is identical either way.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires Pillow/torchvision; not available "
                    "in this container — run with fake=True to exercise plumbing"
                )
            feats = [_fake_features(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": [m["width"] for m in pdf["meta"]],
                "height": [m["height"] for m in pdf["meta"]],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "features": feats,
            })

    imgs = df.filter(F.col("kind") == "image")
    return imgs.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 30, max_frames: int = 4,
                  fake: bool = False) -> DataFrame:
    """Frame-sample video payloads: one output row per sampled frame.

    Real kernel: pyav/ffmpeg frame extraction. Fake kernel: slices the
    payload deterministically so row-explosion shape/partitioning is real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires pyav/ffmpeg; not available in this "
                    "container — run with fake=True to exercise plumbing"
                )
            rows = {"media_id": [], "frame_idx": [], "frame_bytes": []}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                n = min(max(int(meta["n_frames"]) // every_n, 1), max_frames)
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i * every_n)
                    chunk = payload[(i * 8) % max(len(payload) - 8, 1):][:8]
                    rows["frame_bytes"].append(bytes(chunk))
            yield pd.DataFrame(rows)

    vids = df.filter(F.col("kind") == "video")
    return vids.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must NOT read the payload column.

    Column pruning drops ``payload`` from the scan (verify via
    ReadSchema); at 100 TB this is a metadata-sized job.
    """
    return (
        df.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col("meta.width")).alias("avg_width"),
            F.avg(F.col("meta.n_frames")).alias("avg_frames"),
        )
    )
