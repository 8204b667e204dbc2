"""Model-based document quality filtering — the classifier stage of an
LLM data pipeline (the fastText-classifier shape from CCNet/GPT-3-style
curation: hand rules catch gross junk, a learned model generalizes them).

The workflow here is WEAK-SUPERVISION BOOTSTRAP, the form that works when
no labeled corpus exists: take high-precision seed labels (by default the
heuristic `quality_signals.keep` flag — or pass curated labels), train a
seeded logistic regression on cheap per-document statistics, and score
the whole corpus with a calibrated probability. The model's value over
the rules it was seeded from is interpolation: documents that pass some
rules and fail others get a graded score instead of a cliff, and the
decision threshold becomes a tunable knob (keep-rate vs quality) instead
of a hard-coded conjunction.

Scale shape: features are the existing one-pass `quality_signals`
aggregate (JVM, no Python); training runs on a BOUNDED sample (L-BFGS
logistic regression saturates long before millions of rows — same
bounded-sample stance as PQ codebook training); scoring is a Spark ML
transform — JVM-side vector math, one projection, no shuffle, no UDF.
Seeded and deterministic for a fixed training frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators.corpus import quality_signals

FEATURE_COLS = [
    "n_tokens", "distinct_tokens", "dup_token_frac", "top_token_frac",
    "mean_word_len",
]


def _featurize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    sig = quality_signals(df, id_col, text_col)
    # log-compress the unbounded counts so the linear model sees bounded,
    # comparable magnitudes; fractions pass through
    feats = F.array(
        F.log1p(F.col("n_tokens").cast("double")),
        F.log1p(F.col("distinct_tokens").cast("double")),
        F.col("dup_token_frac").cast("double"),
        F.col("top_token_frac").cast("double"),
        F.col("mean_word_len").cast("double"),
    )
    return sig.withColumn("features", array_to_vector(feats))


def train_quality_model(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    labels: DataFrame | None = None,
    sample_size: int = 100_000,
    reg_param: float = 0.01,
):
    """Fit the quality classifier; returns a Spark ML
    LogisticRegressionModel.

    `labels` is an optional (id_col, label∈{0,1}) frame of curated
    judgments; without it, the heuristic `quality_signals.keep` flag
    bootstraps the training labels (weak supervision — the model then
    SMOOTHS the rule conjunction rather than copying it, because the
    features disagree with the rules on boundary documents). Training
    reads at most `sample_size` documents (limit — bounded driver-side
    optimizer input, corpus size irrelevant). Raises when the labels are
    single-class: a degenerate corpus cannot train a filter."""
    from pyspark.ml.classification import LogisticRegression

    feat = _featurize(df, id_col, text_col)
    if labels is not None:
        train = feat.join(
            labels.select(id_col, F.col("label").cast("double")), id_col
        )
    else:
        train = feat.withColumn("label", F.col("keep").cast("double"))
    train = train.select("features", "label").limit(sample_size)
    n_classes = train.select("label").distinct().count()
    if n_classes < 2:
        raise ValueError(
            "quality-model training labels are single-class — a filter "
            "cannot be learned; pass curated `labels` with both classes"
        )
    lr = LogisticRegression(
        featuresCol="features", labelCol="label",
        regParam=reg_param, maxIter=100, standardization=True,
    )
    return lr.fit(train)


def score_quality(
    df: DataFrame,
    model,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Score every document: (id, quality features…, quality_prob,
    keep_model). `quality_prob` is P(good); `keep_model` thresholds it —
    the tunable keep-rate knob. One ML transform, JVM-side."""
    from pyspark.ml.functions import vector_to_array

    feat = _featurize(df, id_col, text_col)
    scored = model.transform(feat)
    return scored.select(
        id_col,
        *FEATURE_COLS,
        F.col("keep").alias("keep_heuristic"),
        F.round(vector_to_array("probability")[1], 6).alias("quality_prob"),
        (vector_to_array("probability")[1] >= threshold).alias("keep_model"),
    )


def quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    labels: DataFrame | None = None,
    threshold: float = 0.5,
    sample_size: int = 100_000,
) -> DataFrame:
    """One-call bootstrap: train on the corpus's own weak labels (or
    curated `labels`), score everything, return the scored frame."""
    model = train_quality_model(
        df, id_col, text_col, labels=labels, sample_size=sample_size
    )
    return score_quality(df, model, id_col, text_col, threshold=threshold)
