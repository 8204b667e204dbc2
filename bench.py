"""Benchmark runner — driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed (count + a cheap checksum action) so lazy plans
can't fake speed; the session is warmed once so JVM startup isn't billed to
the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # relational core
    "standings_recompute",
    "pricing_summary",
    "top_revenue_orders",
    "join_fk_lookup",
    "join_anti_existing",
    "dedup_first",
    "agg_running_total",
    # training-data extensions
    "text_stats",
    "dedup_exact",
    "dedup_minhash",
    "topk_similarity",
    "topk_similarity_arrow",
    "contamination_check",
    "token_packing",
    # streaming-analog windows
    "stream_tumbling_window",
    "stream_session_window",
    "as_of_join",
    # round-2 additions
    "tfidf_top_terms",
    "profile_events",
    "duplicate_spans",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from f1_data_pipeline_spark import queries_relational
    from f1_data_pipeline_spark.queries import QUERIES
    from f1_data_pipeline_spark.session import get_spark

    # Three headline keys were consolidated out of the registry in round 2
    # (dedup_first → dedup_first_top1, join_fk_lookup → filter_fk_resolved,
    # agg_running_total → the window_sums composite); bench keeps the
    # original standalone forms so per-query timings stay comparable.
    from f1_data_pipeline_spark import queries_streaming

    calls = dict(QUERIES)
    calls["dedup_first"] = queries_relational.q_dedup_first
    calls["join_fk_lookup"] = queries_relational.q_join_fk_lookup
    calls["agg_running_total"] = queries_relational.q_agg_running_total
    calls["join_anti_existing"] = queries_relational.q_join_anti_existing
    # round-2 registry folds: bench keeps the standalone forms so the
    # per-query series stays comparable across rounds
    calls["stream_tumbling_window"] = queries_streaming.q_tumbling
    from f1_data_pipeline_spark import queries_text

    calls["dedup_minhash"] = queries_text.q_dedup_minhash

    def _topk_arrow(spark, sf_dir):
        import pyspark.sql.functions as F

        from f1_data_pipeline_spark.operators.similarity import brute_force_topk_arrow
        from f1_data_pipeline_spark.sources import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        return brute_force_topk_arrow(emb.filter(F.col("vec_id") < 20), emb, k=5)

    calls["topk_similarity_arrow"] = _topk_arrow

    spark = get_spark("bench")
    # warm the JVM, codegen, and parquet footer/metadata caches outside the
    # timed region — steady-state query time is the metric, not cold-start
    spark.range(1).count()
    from f1_data_pipeline_spark.sources import load_table

    for t in ("lineitem", "orders", "customer", "nation", "events"):
        load_table(spark, sf_dir, t).count()

    names = [n for n in HEADLINE if n in calls]
    timings: dict[str, float] = {}
    total = 0.0
    def run(name: str) -> None:
        # force full execution of every output row/column
        calls[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in names:
        run(name)  # untimed warmup iteration: codegen compile + broadcast build
        t0 = time.time()
        run(name)
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
