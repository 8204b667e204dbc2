"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (training-data pipeline suite).

The Spark-side mechanics here are real and tested — schemas, Arrow-batched
`mapInPandas` UDF signatures, partition sizing guidance — while the actual
codec work is STUBBED: this container ships no image/audio libraries, so
`decode` raises NotImplementedError unless a decoder import succeeds, and
the test path uses `deterministic_fake_features` (clearly marked) to
exercise the full pipeline shape end-to-end.

Scale notes: binary payloads dominate row size, so
- keep media in its own column family / file group (parquet already splits
  pages per column — select() without the media column never reads bytes);
- size partitions by bytes not rows (`spark.sql.files.maxPartitionBytes`);
- feature extraction is mapInPandas: one Python worker per partition,
  Arrow-zero-copy batches, no per-row pickling.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def synthesize_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (seeded by asset id)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"asset-{i}".encode()).digest() * 4  # 128 B
        mt = ["image", "audio", "video"][i % 3]
        meta = {
            "width": 64 + i if mt != "audio" else None,
            "height": 48 + i if mt != "audio" else None,
            "sample_rate": 16000 if mt != "image" else None,
            "duration_ms": 1000 * (i + 1) if mt != "image" else None,
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[mt],
        }
        rows.append((i, payload, mt, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _try_decoder(media_type: str):
    """Real decoders, if the environment has them. This container doesn't —
    callers fall back to the stub or propagate NotImplementedError."""
    try:
        if media_type == "image":
            from PIL import Image  # noqa: F401

            return Image
    except ImportError:
        pass
    return None


def decode(media: bytes, media_type: str):
    """STUB — real codec decode is not available in this environment.

    The contract: returns a decoded object (PIL image / waveform ndarray /
    frame list). With no decoder installed it raises, and pipelines must use
    the deterministic fake-feature path instead.
    """
    dec = _try_decoder(media_type)
    if dec is None:
        raise NotImplementedError(
            f"no {media_type} decoder in this environment; "
            "use extract_features(..., fake=True) for the tested stub path"
        )
    return dec.open(media)  # pragma: no cover


def deterministic_fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """STUB feature extractor: sha256-seeded, deterministic, unit-length.
    Stands in for an embedding model so the Spark plumbing (schema, batch
    shape, downstream similarity ops) is fully exercised."""
    h = hashlib.sha256(payload).digest()
    vals = [int.from_bytes(h[2 * i : 2 * i + 2], "big") / 65535.0 - 0.5 for i in range(dim)]
    s = sum(v * v for v in vals) ** 0.5 or 1.0
    return [v / s for v in vals]


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "asset_id",
    fake: bool = True,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """asset_id → feature vector via Arrow-batched mapInPandas.

    `fake=False` would call the real decoder per batch (NotImplementedError
    here). Output schema: (asset_id long, features array<float>).
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:
                feats = [deterministic_fake_features(b, dim) for b in pdf[media_col]]
            else:  # pragma: no cover — no decoder in this environment
                feats = [decode(b, "image") for b in pdf[media_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, media_col).mapInPandas(batches, out_schema)


def resize_plan(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: validates metadata, computes target geometry
    JVM-side, and marks rows needing decode work. The pixel work itself is
    the stubbed decode; everything around it is real and tested."""
    return df.withColumn(
        "resize_to", F.struct(F.lit(width).alias("width"), F.lit(height).alias("height"))
    ).withColumn(
        "needs_resize",
        (F.col("meta.width") != width) | (F.col("meta.height") != height),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: explode target timestamps from
    duration metadata (JVM-side sequence) — the decode of each frame is the
    stubbed part."""
    frames = F.sequence(
        F.lit(0).cast("long"), F.col("meta.duration_ms"), F.lit(every_ms).cast("long")
    )
    return (
        df.filter(F.col("media_type") == "video")
        .withColumn("frame_ts_ms", F.explode(frames))
        .select("asset_id", "frame_ts_ms", "media")
    )
