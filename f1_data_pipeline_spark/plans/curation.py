"""End-to-end corpus curation: the training-data pipeline the individual
operators exist for, composed as one plan.

    raw documents
      → line dedup           (opt-in: strip lines shared across many docs —
                              nav/banners/footers, dedup.frequent_lines —
                              BEFORE quality stats so boilerplate doesn't
                              inflate repetition counts)
      → quality filter       (repetition caps + length band, corpus.quality_signals;
                              + deflate compression band, corpus.compression_signals —
                              catches long-range boilerplate and base64/binary junk
                              the token statistics miss)
      → exact dedup          (md5 content hash, dedup.exact_dedup)
      → near dedup           (minhash LSH pairs → connected components →
                              one representative per cluster, dedup.*)
      → PII scrub            (corpus.pii_redact)
      → train/test split     (deterministic md5 buckets, corpus.train_test_split)
      → sequence packing     (per-shard greedy fill, corpus.pack_sequences)
      → out_dir/corpus       parquet partitioned by split
        out_dir/packs        pack manifest parquet (split, shard, pack_id, ...)

Scale posture: every stage is one of the already-audited operator plans
(no new join shapes); the curated frame is persisted once before the two
writes + stats so the quality/dedup work isn't recomputed per output. At
warehouse scale the same plan runs with out_dir on object storage; the
stats dict is a handful of driver-side scalars, never data.

The reference has no curation analog (it is an ETL pipeline into a star
schema); this plan is the beyond-reference LLM-data suite composed
end-to-end, mirroring its orchestrator idea (main.py:286-342 runs loaders
in dependency order) at the corpus level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import corpus as C
from f1_data_pipeline_spark.operators import dedup as D
from f1_data_pipeline_spark.sources import load_table


def curate(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    *,
    minhash_threshold: float = 0.7,
    train_buckets: int = 230,
    max_tokens: int = 2048,
    n_shards: int = 8,
    compression_band: bool = True,
    line_dedup_frac: float | None = None,
) -> dict[str, int]:
    """Run the full curation flow over `{sf_dir}/documents.parquet`; write
    the curated corpus and pack manifest under `out_dir`; return stage
    counts (monotonicity of which is pinned by tests/test_curation.py).

    `compression_band=False` disables the deflate-ratio gate — relevant
    for corpora of very short documents, whose per-document zlib header
    overhead pushes ratios above the band's natural-prose ceiling.
    `line_dedup_frac` (e.g. 0.01) enables cross-document boilerplate
    line removal first: lines shared by at least that fraction of
    documents are stripped before any per-document statistic sees them.
    Off by default — it rewrites text, so enabling it is a corpus
    decision, not a tuning knob."""
    docs = load_table(spark, sf_dir, "documents")
    n_input = docs.count()

    line_dedup_applied = False
    if line_dedup_frac is not None:
        bp = D.frequent_lines(docs, min_doc_frac=line_dedup_frac)
        cleaned = D.remove_frequent_lines(docs, bp)
        # persist the rewritten corpus: three downstream branches read it
        # (both quality screens + the semi-join left side) and would each
        # re-run the whole explode/anti-join/reassemble subtree otherwise
        docs = docs.drop("text").join(
            cleaned.select("doc_id", F.col("clean_text").alias("text")),
            "doc_id",
        ).persist()
        line_dedup_applied = True

    keep_ids = C.quality_signals(docs, "doc_id", "text").filter("keep").select("doc_id")
    if compression_band:
        # intersect the two independent keep screens (both projections of
        # docs — no new shuffle shapes beyond a broadcast-able semi-join)
        keep_ids = keep_ids.join(
            C.compression_signals(docs).filter("keep_compression").select("doc_id"),
            "doc_id",
            "left_semi",
        )
    # persist the intermediate stages: the stats block counts them, and an
    # unpersisted `quality` would re-run the quality aggregation (explode +
    # two shuffles) once per downstream count — 3× on a large corpus
    quality = docs.join(keep_ids, "doc_id", "left_semi").persist()

    exact = D.exact_dedup(quality, "text", "doc_id").persist()
    pairs = D.minhash_lsh_pairs(exact, "doc_id", "text", threshold=minhash_threshold)
    near = D.dedup_by_clusters(exact, pairs, "doc_id")

    scrubbed = C.pii_redact(near, "text").select(
        "doc_id",
        F.col("redacted").alias("text"),
        "lang",
        "source",
        (F.col("n_emails") + F.col("n_phones")).alias("n_pii"),
    )
    curated = C.train_test_split(scrubbed, "doc_id", train_buckets).persist()

    curated.write.mode("overwrite").partitionBy("split").parquet(f"{out_dir}/corpus")
    packs = (
        C.pack_sequences(
            curated.filter(F.col("split") == s),
            max_tokens=max_tokens,
            n_shards=n_shards,
        ).withColumn("split", F.lit(s))
        for s in ("train", "test")
    )
    manifest = next(packs)
    for p in packs:
        manifest = manifest.unionByName(p)
    manifest.write.mode("overwrite").parquet(f"{out_dir}/packs")

    # one job over the persisted frame covers total / per-split / pii counts
    per_split = {
        r["split"]: (r["cnt"], r["pii"] or 0)
        for r in curated.groupBy("split")
        .agg(F.count("*").alias("cnt"), F.sum("n_pii").alias("pii"))
        .collect()
    }
    stats = {
        "n_input": n_input,
        "n_quality": quality.count(),
        "n_exact": exact.count(),
        "n_curated": sum(c for c, _ in per_split.values()),
        "n_train": per_split.get("train", (0, 0))[0],
        "n_test": per_split.get("test", (0, 0))[0],
        "n_pii_hits": sum(p for _, p in per_split.values()),
        "n_packs": spark.read.parquet(f"{out_dir}/packs").count(),
    }
    curated.unpersist()
    exact.unpersist()
    quality.unpersist()
    if line_dedup_applied:
        docs.unpersist()
    return stats


def read_curated(spark: SparkSession, out_dir: str) -> tuple[DataFrame, DataFrame]:
    """(corpus, pack manifest) back from a curate() output directory."""
    return (
        spark.read.parquet(f"{out_dir}/corpus"),
        spark.read.parquet(f"{out_dir}/packs"),
    )


def curate_table_increment(
    spark: SparkSession,
    raw_path: str,
    curated_path: str,
    index_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_spec: str = "bucket(16, doc_id)",
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
) -> dict:
    """CDC-driven incremental curation: maintain a CURATED manifest table
    from a RAW manifest table, consuming only what changed since the last
    run — the 100 TB continuously-curated-corpus shape (a crawl lands in
    the raw table by any MERGE-family writer; each curation cycle costs
    the changed partitions, never the corpus).

    Per cycle (one call = one cycle; schedule it like any maintenance
    job):

    1. window = (last consumed raw version, current latest), read from
       the CURATED table's own app metadata — the consumer state lives
       WITH the output, committed atomically with it, so state and data
       can never diverge (the matview exactly-once pattern).
    2. The raw change feed splits into upserts (insert/update_postimage)
       and deletes.
    3. Upserts pass the curation screens: quality_signals keep → exact
       dedup → intra-batch near-dup drop → near-dup-vs-index drop
       (persisted minhash index of everything previously accepted —
       corpus signatures are never recomputed). Survivors join the index
       (anti-joined on already-indexed ids) and MERGE into the curated
       table keyed on `id_col`.
    4. Raw deletes, plus updated docs that now FAIL the screens (their
       new text is junk or a duplicate), are removed from the curated
       table via a conditional MERGE (matched→delete; never-curated ids
       fall through as no-ops). The curated table holds the latest
       ACCEPTED version of a document or nothing.

    Replay safety (single curator, like the streaming sink): every crash
    point converges — a doc never matches itself in the index, index
    adds anti-join already-indexed ids, MERGE/delete are idempotent, and
    the watermark advances only in a commit that also carries that
    cycle's output (or a watermark-only commit when the window produced
    no output).

    INDEX STALENESS: the minhash index is append-only; deleted docs'
    signatures linger and can suppress a future identical doc as "a dup
    of something deleted". Rebuild the index from the curated table
    (build_minhash_index) on the same out-of-band cadence as
    compact_minhash_index if deletes matter for your corpus.

    Returns stage counts; "window" is the consumed (from, to] raw
    version span (None → full-snapshot bootstrap)."""
    import os

    from f1_data_pipeline_spark.operators import sinks

    raw_versions = sinks.manifest_versions(raw_path)
    if not raw_versions:
        raise FileNotFoundError(f"no manifest at {raw_path}")
    latest = raw_versions[-1]
    curated_exists = bool(sinks.manifest_versions(curated_path))
    last = (
        sinks.manifest_app_metadata(curated_path).get("raw_version")
        if curated_exists
        else None
    )
    stats = {"window": [last, latest], "merged": 0, "removed": 0,
             "quality_dropped": 0, "dup_dropped": 0}
    if last == latest:
        return stats

    if last is None:
        ups = sinks.read_manifest_table(spark, raw_path, version=latest)
        dels = ups.select(id_col).limit(0)
    else:
        feed = sinks.manifest_row_changes(
            spark, raw_path, [id_col], last, latest
        )
        ups = feed.filter(
            F.col("_change").isin("insert", "update_postimage")
        ).drop("_change")
        dels = (
            feed.filter(F.col("_change") == "delete")
            .select(id_col)
            .distinct()
        )

    ups = ups.persist()
    try:
        n_in = ups.count()
        keep_ids = (
            C.quality_signals(ups, id_col, text_col)
            .filter("keep")
            .select(id_col)
        )
        quality = ups.join(keep_ids, id_col, "left_semi")
        deduped = D.exact_dedup(quality, text_col, id_col)
        intra = D.minhash_lsh_pairs(
            deduped, id_col, text_col, threshold=threshold,
            max_bucket_size=max_bucket_size,
        )
        drop = intra.select(
            F.greatest("id_a", "id_b").alias(id_col)
        ).distinct()
        survivors = deduped.join(drop, id_col, "left_anti")
        if os.path.exists(os.path.join(index_path, "params.json")):
            flagged = (
                D.query_minhash_index(
                    survivors, index_path, id_col, text_col, threshold,
                    max_bucket_size=max_bucket_size,
                )
                .select(F.col("new_id").alias(id_col))
                .distinct()
            )
            survivors = survivors.join(flagged, id_col, "left_anti").persist()
            indexed = D.minhash_index_ids(spark, index_path).withColumnRenamed(
                "id", id_col
            )
            to_add = survivors.join(indexed, id_col, "left_anti")
            if to_add.limit(1).count():
                D.minhash_index_add(to_add, index_path, id_col, text_col)
        else:
            survivors = survivors.persist()
            if survivors.limit(1).count():
                D.build_minhash_index(survivors, index_path, id_col, text_col)

        n_kept = survivors.count()
        n_quality = quality.count()
        stats["quality_dropped"] = n_in - n_quality
        stats["dup_dropped"] = n_quality - n_kept

        # removals: raw deletes + windowed docs that no longer pass
        removals = dels.union(
            ups.select(id_col).join(
                survivors.select(id_col), id_col, "left_anti"
            )
        ).distinct()
        wm = {"raw_version": latest}
        committed_wm = False
        if curated_exists and removals.limit(1).count():
            res = sinks.merge_into_manifest(
                spark, removals, curated_path, keys=[id_col],
                when_matched="delete", when_not_matched=None,
                app_metadata=None if n_kept else wm,
            )
            stats["removed"] = res["deleted"]
            # a delete where nothing matched commits NOTHING — the
            # watermark only advanced if a version was actually written
            committed_wm = bool(
                not n_kept
                and res["partitions_rewritten"] + res["partitions_dropped"]
            )
        if n_kept:
            sinks.merge_upsert_manifest(
                spark, survivors, curated_path, keys=[id_col],
                partition_col=partition_spec, count_rows=False,
                app_metadata=wm,
            )
            stats["merged"] = n_kept
            committed_wm = True
        if not committed_wm and curated_exists:
            sinks.manifest_set_app_metadata(spark, curated_path, wm)
        survivors.unpersist()
    finally:
        ups.unpersist()
    return stats
