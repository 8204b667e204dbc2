"""The composed 100 TB LLM-data story, end to end on a manifest-backed
corpus: raw manifest table → CDC-driven incremental curation
(`curate_table_increment`) → PII scrub → contamination gate →
token-weighted `mixture_sample` → `shuffle_shards` →
`write_training_shards`. The stages are individually tested elsewhere;
this pins the COMPOSITION: token conservation into the final shards,
determinism across replays, exactly-once coverage, and zero
PII/contamination leaks in what a training job would actually read.
"""
from __future__ import annotations

import json
import os
import re

import pytest
from pyspark.sql import functions as F

from f1_data_pipeline_spark.functions.text import token_count
from f1_data_pipeline_spark.operators import corpus as C
from f1_data_pipeline_spark.operators import sinks
from f1_data_pipeline_spark.plans.curation import curate_table_increment

SF = "/root/testdata/sf0.001"


def _raw_docs(spark):
    """Raw corpus: real sf0.001 documents + adversarial rows — PII
    carriers, an exact duplicate, a contaminated doc copying an eval
    text verbatim."""
    docs = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "text", "lang", "source")
        .filter(F.col("doc_id") < 300)
    )
    base = {r.doc_id: r for r in docs.limit(3).collect()}
    keep0 = base[min(base)]
    extra = spark.createDataFrame(
        [
            # PII carriers (long enough to pass quality screens)
            (9001, keep0.text + " contact me at alice@example.com today",
             "en", "srcpii"),
            (9002, keep0.text + " or call 555-867-5309 at any hour",
             "en", "srcpii"),
            # exact duplicate of a real doc (same text, new id)
            (9003, keep0.text, keep0.lang, keep0.source),
            # eval-set contamination: verbatim eval text inside filler
            (9004, keep0.text + " " + EVAL_TEXTS[0], "en", "srceval"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    return docs.unionByName(extra)


EVAL_TEXTS = [
    "the quick brown benchmark fox jumps over the held out lazy dog "
    "and the answer to the secret eval question is forty two exactly",
]


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    """Run the whole chain once; tests assert different facets."""
    root = tmp_path_factory.mktemp("e2e_corpus")
    raw = str(root / "raw")
    curated = str(root / "curated")
    index = str(root / "index")

    # ---- raw table lands via ordinary MERGE writers ----
    sinks.merge_upsert_manifest(
        spark, _raw_docs(spark), raw, keys=["doc_id"],
        partition_col="bucket(8, doc_id)",
    )
    # ---- cycle 1: bootstrap curation ----
    s1 = curate_table_increment(
        spark, raw, curated, index, partition_spec="bucket(8, doc_id)"
    )
    # ---- cycle 2: an increment (new docs + a takedown) ----
    inc = spark.createDataFrame(
        [(9100, "a genuinely new document about distributed query engines "
                "and the partition pruning they perform at scale "
                "with plenty of ordinary prose to pass the quality band",
          "en", "src0")],
        "doc_id long, text string, lang string, source string",
    )
    sinks.merge_upsert_manifest(
        spark, inc, raw, keys=["doc_id"], partition_col="bucket(8, doc_id)"
    )
    sinks.delete_manifest_rows(spark, raw, [("doc_id", "=", 7)])
    s2 = curate_table_increment(
        spark, raw, curated, index, partition_spec="bucket(8, doc_id)"
    )
    s3 = curate_table_increment(  # replay with nothing new: no-op
        spark, raw, curated, index, partition_spec="bucket(8, doc_id)"
    )

    # ---- post-curation assembly (what a training-set build runs) ----
    eval_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EVAL_TEXTS)], "doc_id long, text string"
    )
    cur = sinks.read_manifest_table(spark, curated)
    scrubbed = C.pii_redact(cur, "text").select(
        "doc_id", F.col("redacted").alias("text"), "lang", "source"
    )
    clean = (
        C.contamination_flags(scrubbed, eval_df, min_score=0.2)
        .filter(~F.col("contaminated"))
        .drop("score", "contaminated")
    )
    weights = {"src0": 2.0, "src1": 1.0, "src2": 1.0}
    mix = C.mixture_sample(
        clean, "source", weights, mass_col=token_count("text")
    ).withColumn(
        "row_id", F.concat_ws(":", F.col("doc_id"), F.col("epoch"))
    )
    out1, out2 = str(root / "shards_a"), str(root / "shards_b")
    man1 = C.write_training_shards(mix, out1, id_col="row_id", n_shards=4)
    man2 = C.write_training_shards(mix, out2, id_col="row_id", n_shards=4)
    return {
        "raw": raw, "curated": curated, "s1": s1, "s2": s2, "s3": s3,
        "mix": mix.persist(), "out1": out1, "out2": out2,
        "man1": man1, "man2": man2,
    }


def _shard_rows(spark, out_dir):
    return (
        spark.read.parquet(os.path.join(out_dir, "data"))
        .orderBy("shard", "pos")
        .collect()
    )


def test_curation_cycles_converge(spark, pipeline):
    s1, s2, s3 = pipeline["s1"], pipeline["s2"], pipeline["s3"]
    # bootstrap curated a meaningful corpus and dropped the exact dup
    assert s1["merged"] > 100 and s1["dup_dropped"] >= 1
    # the increment merged the new doc and removed the takedown
    assert s2["merged"] == 1 and s2["removed"] == 1
    assert s3["merged"] == 0 and s3["removed"] == 0  # replay no-ops
    ids = {
        r.doc_id
        for r in sinks.read_manifest_table(spark, pipeline["curated"])
        .select("doc_id").collect()
    }
    assert 9100 in ids and 7 not in ids and 9003 not in ids


def test_token_conservation_into_shards(spark, pipeline):
    want = pipeline["mix"].select(
        F.sum(token_count("text")).alias("t")
    ).collect()[0]["t"]
    rows = _shard_rows(spark, pipeline["out1"])
    got = sum(len(r.text.split()) for r in rows)
    # token_count is the whitespace+BPE-ish regex; recompute through the
    # same Spark function for exactness
    got_exact = (
        spark.read.parquet(os.path.join(pipeline["out1"], "data"))
        .select(F.sum(token_count("text")).alias("t")).collect()[0]["t"]
    )
    assert got_exact == want and got > 0
    # exactly-once coverage: every (doc, epoch) replica appears once
    seen = [r.row_id for r in rows]
    assert len(seen) == len(set(seen)) == pipeline["man1"]["rows"]
    mix_ids = sorted(
        r.row_id for r in pipeline["mix"].select("row_id").collect()
    )
    assert sorted(seen) == mix_ids


def test_export_is_deterministic_across_replays(spark, pipeline):
    assert pipeline["man1"] == pipeline["man2"]
    a = [(r.shard, r.pos, r.row_id) for r in _shard_rows(spark, pipeline["out1"])]
    b = [(r.shard, r.pos, r.row_id) for r in _shard_rows(spark, pipeline["out2"])]
    assert a == b
    with open(os.path.join(pipeline["out1"], "shards.json")) as fh:
        m = json.load(fh)
    assert m == pipeline["man1"]


def test_no_pii_or_contamination_in_final_shards(spark, pipeline):
    rows = _shard_rows(spark, pipeline["out1"])
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    phone = re.compile(r"\b\d{3}[-.]\d{3}[-.]\d{4}\b")
    for r in rows:
        assert not email.search(r.text), r.row_id
        assert not phone.search(r.text), r.row_id
    # the contaminated doc (verbatim eval text) never reached a shard
    assert all(EVAL_TEXTS[0] not in r.text for r in rows)
    # mixture honored: only weighted sources are present
    assert {r.source for r in rows} <= {"src0", "src1", "src2", "srcpii"}