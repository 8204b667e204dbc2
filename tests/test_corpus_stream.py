"""Streaming incremental curation (streaming/corpus_stream.py): quality
gate, cross-batch content dedup, contamination flag, PII scrub, replay
idempotence."""

from __future__ import annotations

import pyspark.sql.functions as F

from f1_data_pipeline_spark.streaming.corpus_stream import (
    DOCUMENTS_STREAM_SCHEMA,
    start_curation_sink,
)

EVAL_TEXT = "the quick brown fox jumps over the lazy dog tonight"


def _doc(i, text):
    return (i, text, "en", f"src{i % 3}", len(text))


def _good_text(tag, k=24):
    return " ".join(f"{tag}{j}" for j in range(k))


def _write_batches(spark, stream_dir):
    b1 = [
        _doc(1, _good_text("alpha")),
        _doc(2, _good_text("beta")),
        _doc(3, _good_text("beta")),          # in-batch duplicate content of 2
        _doc(4, "spam spam spam"),            # fails quality (3 tokens)
        _doc(5, "padding " + EVAL_TEXT + " " + _good_text("fill", 12)),  # contaminated
        _doc(6, _good_text("mail", 22) + " write user6@example.org now"),  # PII
    ]
    b2 = [
        _doc(7, _good_text("alpha")),         # cross-batch duplicate of 1
        _doc(8, _good_text("delta")),
    ]
    for name, rows in (("b1", b1), ("b2", b2)):
        spark.createDataFrame(rows, DOCUMENTS_STREAM_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{stream_dir}/{name}")
    return b1, b2


def _run(spark, stream_dir, target, ckpt, eval_df):
    stream = (
        spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/*")
    )
    q = start_curation_sink(stream, eval_df, target, ckpt)
    q.awaitTermination(120)
    q.stop()


def test_streaming_curation(spark, tmp_path):
    stream_dir, target, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    _write_batches(spark, stream_dir)
    eval_df = spark.createDataFrame([(99, EVAL_TEXT)], ["doc_id", "text"])

    _run(spark, stream_dir, target, ckpt, eval_df)
    out = spark.read.parquet(target)

    # quality gate dropped doc 4; dedup collapsed {2,3} and {1,7};
    # survivors: one of {1,7}, one of {2,3}, 5, 6, 8 → 5 rows, unique fp
    assert out.count() == 5
    assert out.select("fp").distinct().count() == 5
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 4 not in ids
    assert len(ids & {1, 7}) == 1 and len(ids & {2, 3}) == 1

    flagged = {r["doc_id"]: r for r in out.collect()}
    planted = flagged[5]
    assert planted["contaminated"] and planted["score"] > 0
    pii_doc = flagged[6]
    assert "<EMAIL>" in pii_doc["text"] and pii_doc["n_pii"] == 1
    assert out.filter(F.col("text").contains("@")).count() == 0

    # replay with a fresh checkpoint: MERGE on fp keeps the table identical
    before = {(r["fp"], r["text"]) for r in out.collect()}
    _run(spark, stream_dir, target, str(tmp_path / "ckpt2"), eval_df)
    after = {
        (r["fp"], r["text"]) for r in spark.read.parquet(target).collect()
    }
    assert before == after


def test_neardup_sink_incremental_and_replay_idempotent(spark, tmp_path):
    """Near-dup streaming curation: batch 2's near-duplicate of an
    accepted batch-1 doc is dropped via the persisted index (no corpus
    recompute); full replay with a fresh checkpoint changes neither the
    target nor the index."""
    from f1_data_pipeline_spark.streaming.corpus_stream import start_neardup_sink

    stream_dir = str(tmp_path / "in")
    base = _good_text("story", 30)
    b1 = [
        _doc(1, base),
        _doc(2, _good_text("other", 30)),
        _doc(3, base + " extraword"),     # intra-batch near-dup of 1 → dropped
    ]
    b2 = [
        _doc(7, base + " tailbit"),       # near-dup of accepted doc 1 → dropped
        _doc(8, _good_text("fresh", 30)),
    ]
    for name, rows in (("b1", b1), ("b2", b2)):
        spark.createDataFrame(rows, DOCUMENTS_STREAM_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{stream_dir}/{name}")

    idx = str(tmp_path / "idx")
    target = str(tmp_path / "target")

    def run(ckpt):
        stream = (
            spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{stream_dir}/*")
        )
        q = start_neardup_sink(
            stream, idx, target, str(tmp_path / ckpt), threshold=0.5
        )
        q.awaitTermination(300)
        q.stop()

    run("ck1")
    kept = {r["doc_id"] for r in spark.read.parquet(target).collect()}
    assert kept == {1, 2, 8}
    indexed = {r["id"] for r in spark.read.parquet(f"{idx}/sigs").collect()}
    assert indexed == {1, 2, 8}

    run("ck2")  # full replay, fresh checkpoint
    assert {r["doc_id"] for r in spark.read.parquet(target).collect()} == {1, 2, 8}
    # index unchanged too — no duplicate signature rows
    sig_rows = spark.read.parquet(f"{idx}/sigs").groupBy("id").count().collect()
    assert {r["id"]: r["count"] for r in sig_rows} == {1: 1, 2: 1, 8: 1}
