"""End-to-end curation plan (plans/curation.py): stage monotonicity, split
integrity, packing conservation, idempotent re-run."""

from __future__ import annotations

import pyspark.sql.functions as F

from f1_data_pipeline_spark.plans.curation import curate, read_curated


def test_curate_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    stats = curate(spark, sf_dir, out)

    # stage counts shrink monotonically; split partitions the survivors
    assert stats["n_input"] >= stats["n_quality"] >= stats["n_exact"] >= stats["n_curated"]
    assert stats["n_curated"] > 0
    assert stats["n_train"] + stats["n_test"] == stats["n_curated"]

    corpus, packs = read_curated(spark, out)
    assert corpus.count() == stats["n_curated"]
    # split column materialized from the partition dirs; no doc straddles
    assert corpus.select("split").distinct().count() <= 2
    per_doc = corpus.groupBy("doc_id").agg(F.countDistinct("split").alias("k"))
    assert per_doc.filter(F.col("k") > 1).count() == 0

    # packing conserves the curated corpus token count, per split
    tok = F.size(F.split(F.trim("text"), r"\s+"))
    for s in ("train", "test"):
        total = (
            corpus.filter(F.col("split") == s)
            .agg(F.sum(tok))
            .first()[0]
            or 0
        )
        packed = (
            packs.filter(F.col("split") == s).agg(F.sum("pack_tokens")).first()[0]
            or 0
        )
        assert packed == total, s

    # no unredacted PII in the curated text (scrub ran before the write)
    leaked = corpus.filter(
        F.col("text").rlike(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}")
        | F.col("text").rlike(r"\d{3}-\d{3}-\d{4}")
    ).count()
    assert leaked == 0


def test_curate_idempotent_rerun(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    s1 = curate(spark, sf_dir, out)
    s2 = curate(spark, sf_dir, out)
    assert s1 == s2
    corpus, _ = read_curated(spark, out)
    assert corpus.count() == s2["n_curated"]


def test_curate_with_line_dedup(spark, tmp_path):
    """Opt-in boilerplate line removal runs ahead of the quality stats and
    preserves the pipeline's invariants (monotone counts, split-total
    identity) on a corpus without shared lines (no-op here — semantics of
    the operator itself are pinned in test_dedup_similarity)."""
    out = str(tmp_path / "curated_ld")
    stats = curate(
        spark, "/root/testdata/sf0.001", out, line_dedup_frac=0.02
    )
    assert stats["n_input"] >= stats["n_quality"] >= stats["n_curated"] > 0
    assert stats["n_train"] + stats["n_test"] == stats["n_curated"]
