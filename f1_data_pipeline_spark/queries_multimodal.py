"""Registry entries for multimodal column plumbing (training-data suite).

Compressed-format codecs are stubbed (no media libs in this container),
but WAV audio, PPM images, and PPMV video decode REAL bytes
(operators/multimodal.py). These are rows-only checks: they exercise the
real Spark plumbing — binary columns, Arrow-batched mapInPandas feature
extraction, metadata-driven frame explosion — with deterministic payloads
(fake-feature arm over `documents`-derived bytes, real-codec arm over
synthesized WAV/PPMV assets) so results are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import multimodal as M
from f1_data_pipeline_spark.queries import register
from f1_data_pipeline_spark.sources import load_table


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two tagged arms of the Arrow-batched feature pipeline: `stub` —
    documents.text → opaque binary payload → fake-embedding extraction
    (the full media-pipeline shape for formats whose codec is stubbed);
    `codec` — REAL WAV and PPMV payloads through `fake=False`, i.e. actual
    stdlib decode + signal/pixel/temporal features over Arrow batches.
    Both end in a JVM-side norm check.

    Round-13 in-callable gates (operators/gates.py): (1) codec parity —
    one KNOWN pixel array encoded as PNG, BMP, and PPM (three disjoint
    decoders) plus a WAV tone re-parsed by an independent numpy RIFF
    reader must all come back from `extract_features(fake=False)` equal
    to features of the source pixels/waveform; (2) every returned row
    must carry the declared dim and a unit norm. RAISES on violation."""
    from f1_data_pipeline_spark.operators import gates

    gates.assert_codec_parity(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "UTF-8").alias("media"),
    )
    feats = M.extract_features(media, media_col="media", id_col="asset_id")

    def norms(f: DataFrame, arm: str) -> DataFrame:
        return f.select(
            F.lit(arm).alias("arm"),
            "asset_id",
            F.size("features").alias("dim"),
            F.expr(
                "round(aggregate(features, cast(0.0 as double),"
                " (acc, x) -> acc + cast(x as double) * cast(x as double)), 4)"
            ).alias("sq_norm"),
        )

    # video ids offset so (arm, asset_id) stays a key in the composite —
    # audio ids are 0..31 and an overlapping video id would map one key to
    # two rows of different modality
    video = M.synthesize_video_assets(spark, n=16).withColumn(
        "asset_id", (F.col("asset_id") + F.lit(1000)).cast("long")
    )
    real_assets = M.synthesize_audio_assets(spark, n=32).unionByName(video)
    real_feats = M.extract_features(real_assets, fake=False)
    out = norms(feats, "stub").unionByName(norms(real_feats, "codec"))
    gates.assert_unit_norm_features(out, dim=M.FEATURE_DIM)
    return out


register("multimodal_features", q_multimodal_features, None)


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side metadata validation + resize planning over the deterministic
    asset table (operators/multimodal.py:synthesize_assets is pure arithmetic
    in the asset id, so DuckDB generate_series reproduces it exactly —
    oracle-checkable even with codecs stubbed). Audio rows carry NULL
    geometry, so needs_resize is NULL for them (three-valued logic on both
    engines).

    Round-12 probe arm: REAL MP3 / MP4 / WAV container bytes — genuine
    frame headers and box trees from synthesize_mp3/mp4/wav, with
    id-derived parameters — run through `probe_media_metadata`'s
    stdlib parsers (MPEG frame walk, ISO-BMFF box walk, RIFF header)
    over Arrow batches, so the hash now verifies metadata EXTRACTED
    from the payloads themselves, not just carried column values; a
    truncated mp3 surfaces as container='corrupt' and junk bytes as
    'unknown' (the route-don't-die contract for crawl garbage)."""
    assets = M.synthesize_assets(spark, n=96)
    planned = M.resize_plan(assets, width=64, height=48)
    base = planned.select(
        "asset_id",
        "media_type",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.duration_ms").alias("duration_ms"),
        F.col("meta.format").alias("format"),
        "needs_resize",
    )
    rows = []
    for i in range(16):
        rows.append((1000 + i, bytearray(M.synthesize_mp3(n_frames=30 + i))))
        rows.append((2000 + i, bytearray(M.synthesize_mp4(
            duration_units=(i + 1) * 500, timescale=1000,
            width=320 + i, height=240 + i,
        ))))
        rows.append((3000 + i, bytearray(
            M.synthesize_wav(duration_ms=(i + 1) * 100)
        )))
    for i in range(8):
        rows.append((5000 + i, bytearray(
            M.synthesize_png(width=16 + i, height=12 + i, seed=i)
        )))
        rows.append((6000 + i, bytearray(
            M.synthesize_ppmv(width=8 + i, height=6 + i, n_frames=2)
        )))
        # round-13: JPEG SOFn marker walk — geometry extracted from a
        # real JFIF marker stream, completing the container matrix
        rows.append((7000 + i, bytearray(
            M.synthesize_jpeg(width=32 + i, height=20 + i)
        )))
    rows.append((4000, bytearray(M.synthesize_mp3(n_frames=3)[:-10])))
    rows.append((4001, bytearray(b"\x00garbage-bytes")))
    payloads = spark.createDataFrame(rows, "asset_id long, media binary")
    probed = M.probe_media_metadata(payloads).select(
        "asset_id",
        F.col("container").alias("media_type"),
        "width",
        "height",
        "sample_rate",
        "duration_ms",
        "format",
        F.lit(None).cast("boolean").alias("needs_resize"),
    )
    return base.unionByName(probed)


register(
    "multimodal_metadata",
    q_multimodal_metadata,
    """
    SELECT i AS asset_id,
           ['image','audio','video'][i % 3 + 1] AS media_type,
           CASE WHEN i % 3 <> 1 THEN CAST(64 + i AS INT) END AS width,
           CASE WHEN i % 3 <> 1 THEN CAST(48 + i AS INT) END AS height,
           CASE WHEN i % 3 <> 0 THEN CAST(16000 AS INT) END AS sample_rate,
           CASE WHEN i % 3 <> 0 THEN CAST(1000 * (i + 1) AS BIGINT) END AS duration_ms,
           ['png','wav','mp4'][i % 3 + 1] AS format,
           CASE WHEN i % 3 <> 1 THEN (64 + i <> 64) OR (48 + i <> 48) END AS needs_resize
    FROM generate_series(0, 95) t(i)
    UNION ALL
    SELECT 1000 + i, 'mp3', CAST(NULL AS INT), CAST(NULL AS INT),
           CAST(44100 AS INT),
           CAST(((30 + i) * 1152 * 1000) // 44100 AS BIGINT), 'mp3',
           CAST(NULL AS BOOLEAN)
    FROM generate_series(0, 15) t(i)
    UNION ALL
    SELECT 2000 + i, 'mp4', CAST(320 + i AS INT), CAST(240 + i AS INT),
           NULL, CAST((i + 1) * 500 AS BIGINT), 'avc1', NULL
    FROM generate_series(0, 15) t(i)
    UNION ALL
    SELECT 3000 + i, 'wav', NULL, NULL, CAST(16000 AS INT),
           CAST((i + 1) * 100 AS BIGINT), 'wav', NULL
    FROM generate_series(0, 15) t(i)
    UNION ALL
    SELECT 5000 + i, 'png', CAST(16 + i AS INT), CAST(12 + i AS INT),
           NULL, CAST(NULL AS BIGINT), 'png', NULL
    FROM generate_series(0, 7) t(i)
    UNION ALL
    SELECT 6000 + i, 'ppmv', CAST(8 + i AS INT), CAST(6 + i AS INT),
           NULL, CAST(NULL AS BIGINT), 'ppmv', NULL
    FROM generate_series(0, 7) t(i)
    UNION ALL
    SELECT 7000 + i, 'jpeg', CAST(32 + i AS INT), CAST(20 + i AS INT),
           NULL, CAST(NULL AS BIGINT), 'jpeg', NULL
    FROM generate_series(0, 7) t(i)
    UNION ALL
    SELECT 4000, 'corrupt', NULL, NULL, NULL, NULL, NULL, NULL
    UNION ALL
    SELECT 4001, 'unknown', NULL, NULL, NULL, NULL, NULL, NULL
    """,
)


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-driven frame sampling: video rows explode to one row per
    sampled frame timestamp (JVM-side sequence + explode; the per-frame
    decode is the stubbed part). Durations are id-derived arithmetic, so the
    explode fan-out is oracle-checkable via DuckDB generate_series."""
    assets = M.synthesize_assets(spark, n=96)
    frames = M.frame_sample_plan(assets, every_ms=1000)
    return frames.groupBy("asset_id").agg(
        F.count("*").alias("n_frames"),
        F.max("frame_ts_ms").alias("last_frame_ts_ms"),
    )


register(
    "multimodal_frame_sample",
    q_multimodal_frame_sample,
    """
    WITH assets AS (
        SELECT i AS asset_id, 1000 * (i + 1) AS duration_ms
        FROM generate_series(0, 95) t(i) WHERE i % 3 = 2
    ), frames AS (
        SELECT asset_id, unnest(generate_series(0, duration_ms, 1000)) AS frame_ts_ms
        FROM assets
    )
    SELECT asset_id, COUNT(*) AS n_frames,
           CAST(MAX(frame_ts_ms) AS BIGINT) AS last_frame_ts_ms
    FROM frames GROUP BY asset_id
    """,
)
