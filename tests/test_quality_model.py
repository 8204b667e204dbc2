"""Model-based quality filter (operators/quality_model.py): separation,
smoothing vs the rule conjunction, determinism, label plumbing, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import quality_model as QM


def _corpus(spark):
    """Clearly good docs, clearly junky docs, and boundary docs that pass
    some heuristics and fail others."""
    good = [
        (i, "the quick brown fox jumps over the lazy dog near the quiet "
            "river bank while morning light settles across the wide valley "
            f"and birds circle slowly above field number {i}")
        for i in range(40)
    ]
    junk = [
        (100 + i, ("spam " * 30).strip())  # one token repeated: max top_token_frac
        for i in range(40)
    ]
    boundary = [
        (200 + i, "word " * 10 + f"unique{i} tail filler text ends here")
        for i in range(10)
    ]
    return spark.createDataFrame(good + junk + boundary, "doc_id long, text string")


def test_quality_model_separates_good_from_junk(spark):
    df = _corpus(spark)
    scored = QM.quality_filter(df, threshold=0.5)
    rows = {r["doc_id"]: r for r in scored.collect()}
    good_probs = [rows[i]["quality_prob"] for i in range(40)]
    junk_probs = [rows[100 + i]["quality_prob"] for i in range(40)]
    assert min(good_probs) > max(junk_probs)
    assert all(rows[i]["keep_model"] for i in range(40))
    assert not any(rows[100 + i]["keep_model"] for i in range(40))
    # boundary docs get GRADED scores strictly inside the two masses —
    # the smoothing-over-the-cliff property the model exists for
    b_probs = [rows[200 + i]["quality_prob"] for i in range(10)]
    assert max(junk_probs) < min(b_probs) or min(good_probs) > max(b_probs)
    assert scored.columns[0] == "doc_id" and "quality_prob" in scored.columns


def test_quality_model_deterministic(spark):
    df = _corpus(spark)
    a = {(r["doc_id"], r["quality_prob"]) for r in QM.quality_filter(df).collect()}
    b = {(r["doc_id"], r["quality_prob"]) for r in QM.quality_filter(df).collect()}
    assert a == b


def test_quality_model_curated_labels_override_heuristics(spark):
    """With curated labels the model learns THEM, not the keep flag: label
    the repeated-token docs as good and the prose as bad, and the scores
    flip accordingly."""
    df = _corpus(spark).filter(F.col("doc_id") < 200)
    labels = df.select(
        "doc_id", (F.col("doc_id") >= 100).cast("int").alias("label")
    )
    scored = QM.quality_filter(df, labels=labels)
    rows = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    assert min(rows[100 + i] for i in range(40)) > max(rows[i] for i in range(40))


def test_quality_model_single_class_guard(spark):
    df = _corpus(spark)
    labels = df.select("doc_id", F.lit(1).alias("label"))
    with pytest.raises(ValueError, match="single-class"):
        QM.train_quality_model(df, labels=labels)


def test_quality_model_threshold_is_keep_rate_knob(spark):
    df = _corpus(spark)
    model = QM.train_quality_model(df)
    strict = QM.score_quality(df, model, threshold=0.9)
    loose = QM.score_quality(df, model, threshold=0.1)
    n_strict = strict.filter("keep_model").count()
    n_loose = loose.filter("keep_model").count()
    assert n_strict <= n_loose
    assert n_loose >= 40  # at least the good mass survives a loose gate
