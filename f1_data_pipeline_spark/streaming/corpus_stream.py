"""Incremental (streaming) corpus curation.

The batch plan (plans/curation.py) curates a corpus at rest; this module
curates documents AS THEY ARRIVE: each micro-batch is quality-filtered,
exact-deduplicated, contamination-flagged against a static eval pool, and
PII-scrubbed, then MERGEd into the curated table keyed on the content
fingerprint. Keying the MERGE on md5(text) makes the sink:

- cross-batch content-deduplicating — a document whose text already landed
  (any batch, any doc_id) updates the one canonical row instead of
  appending a duplicate;
- idempotent under micro-batch replay — replaying a batch MERGEs the same
  rows to the same keys (the streaming exactly-once-effect pattern shared
  with start_merge_sink, streaming/structured.py:89).

Near-dedup (minhash clustering) stays a periodic batch compaction over the
curated table — clustering is a global fixpoint and has no incremental
one-pass form; run plans/curation.py's dedup stage as the compaction job.

Scale posture: per batch, every stage is an already-audited operator plan;
the eval n-gram pool is broadcast (small by construction); state lives in
the target table, not executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from f1_data_pipeline_spark.functions.text import fingerprint
from f1_data_pipeline_spark.operators import corpus as C
from f1_data_pipeline_spark.operators import dedup as D
from f1_data_pipeline_spark.operators import sinks

DOCUMENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def curate_batch(batch: DataFrame, eval_df: DataFrame, *, n: int = 5,
                 min_score: float = 0.2) -> DataFrame:
    """One micro-batch through the curation stages (also the unit the
    parity test replays in batch mode)."""
    keep = C.quality_signals(batch, "doc_id", "text").filter("keep").select("doc_id")
    quality = batch.join(keep, "doc_id", "left_semi")
    deduped = D.exact_dedup(quality, "text", "doc_id")
    flagged = C.contamination_flags(
        deduped, eval_df, "doc_id", "text", n=n, min_score=min_score
    )
    scrubbed = C.pii_redact(flagged, "text")
    return scrubbed.select(
        fingerprint("text").alias("fp"),
        "doc_id",
        F.col("redacted").alias("text"),
        "lang",
        "source",
        "score",
        "contaminated",
        (F.col("n_emails") + F.col("n_phones")).alias("n_pii"),
    )


def start_curation_sink(
    doc_stream: DataFrame,
    eval_df: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    *,
    n: int = 5,
    min_score: float = 0.2,
) -> StreamingQuery:
    """readStream(documents) → curate each micro-batch → MERGE on content
    fingerprint into `target_path`."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        out = curate_batch(batch, eval_df, n=n, min_score=min_score)
        sinks.merge_upsert(out.sparkSession, out, target_path, ["fp"])

    return (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_neardup_sink(
    doc_stream: DataFrame,
    index_path: str,
    target_path: str,
    checkpoint_dir: str,
    *,
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
) -> StreamingQuery:
    """Incremental NEAR-dup curation: per micro-batch, exact-dedup, drop
    intra-batch near-dups (keep lowest doc_id), query the persisted
    minhash index for near-dups of anything already accepted (corpus
    signatures never recomputed — operators/dedup.py index), then add the
    survivors to the index and MERGE them into the target.

    Replay-idempotent end to end: a doc never matches itself in the index
    (id equality is excluded), surviving batch-mates are below threshold
    by construction, and the index add anti-joins already-indexed ids —
    so re-running a micro-batch after any crash point converges to the
    same target AND the same index.

    MAINTENANCE: every micro-batch appends one file batch to the index's
    `bands/` and `sigs/`, so a long-running crawl degrades its own
    per-batch index scan by file count alone. Schedule
    `operators/dedup.py:compact_minhash_index` out-of-band — every ~100
    ingest batches, or when `bands/` file count exceeds a few × the band
    count — it swaps atomically (readers see old or new, never partial),
    preserves the band partitioning, and is parity-tested against live
    queries, so it can run while this sink is between batches.
    """
    import os

    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        keep = D.exact_dedup(batch, "text", "doc_id")
        intra = D.minhash_lsh_pairs(
            keep, "doc_id", "text", threshold=threshold,
            max_bucket_size=max_bucket_size,
        )
        drop = intra.select(
            F.greatest("id_a", "id_b").alias("doc_id")
        ).distinct()
        keep = keep.join(drop, "doc_id", "left_anti")
        if os.path.exists(os.path.join(index_path, "params.json")):
            flagged = (
                D.query_minhash_index(
                    keep, index_path, "doc_id", "text", threshold,
                    max_bucket_size=max_bucket_size,
                )
                .select(F.col("new_id").alias("doc_id"))
                .distinct()
            )
            keep = keep.join(flagged, "doc_id", "left_anti").persist()
            # idempotency keys on BANDS ids — the index add's commit
            # signal (sigs append first and may survive a crashed add)
            indexed = D.minhash_index_ids(spark, index_path).withColumnRenamed(
                "id", "doc_id"
            )
            to_add = keep.join(indexed, "doc_id", "left_anti")
            if to_add.limit(1).count():
                D.minhash_index_add(to_add, index_path, "doc_id", "text")
        else:
            keep = keep.persist()
            D.build_minhash_index(keep, index_path, "doc_id", "text")
        sinks.merge_upsert(spark, keep, target_path, ["doc_id"])
        keep.unpersist()

    return (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
