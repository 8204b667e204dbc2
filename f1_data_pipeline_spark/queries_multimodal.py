"""Registry entries for multimodal column plumbing (training-data suite).

The codec step is stubbed (no image/audio libs in this container —
operators/multimodal.py), so these are rows-only checks: they exercise the
real Spark plumbing — binary columns, Arrow-batched mapInPandas feature
extraction, metadata-driven frame explosion — with deterministic fake
payloads derived from the `documents` table so results are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import multimodal as M
from f1_data_pipeline_spark.queries import register
from f1_data_pipeline_spark.sources import load_table


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → opaque binary payload → Arrow-batched feature
    extraction (the stub embedding), then a JVM-side norm check — the full
    media-pipeline shape minus the codec."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "UTF-8").alias("media"),
    )
    feats = M.extract_features(media, media_col="media", id_col="asset_id")
    return feats.select(
        "asset_id",
        F.size("features").alias("dim"),
        F.expr(
            "round(aggregate(features, cast(0.0 as double),"
            " (acc, x) -> acc + cast(x as double) * cast(x as double)), 4)"
        ).alias("sq_norm"),
    )


register("multimodal_features", q_multimodal_features, None)


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-driven frame sampling over the deterministic fake asset
    table: video rows explode to one row per sampled frame timestamp."""
    assets = M.synthesize_assets(spark, n=96)
    frames = M.frame_sample_plan(assets, every_ms=1000)
    return frames.groupBy("asset_id").agg(
        F.count("*").alias("n_frames"),
        F.max("frame_ts_ms").alias("last_frame_ts_ms"),
    )


register("multimodal_frame_sample", q_multimodal_frame_sample, None)
