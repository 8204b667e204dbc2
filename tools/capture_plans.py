"""Capture .explain("formatted") for every declared query + bench standalones.

Usage:
    python tools/capture_plans.py <sf_dir> <out_dir> [suffix] [only,names]

Writes one <out_dir>/<name>_<suffix>.txt per query (suffix defaults to
"before") containing the formatted physical plan, plus a one-line shape
summary (Exchange count, join strategies, Python-eval nodes, scans) at the
top so plan diffs are greppable. Queries whose *construction* runs real jobs
(in-callable gates, manifest builds) still work — only the plan of the
returned frame is recorded; nothing is executed beyond what the callable
itself does at build time.
"""

from __future__ import annotations

import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_text(df) -> str:
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def shape_summary(plan: str) -> str:
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    n_reused = len(re.findall(r"ReusedExchange", plan))
    joins = sorted(
        set(
            re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)",
                plan,
            )
        )
    )
    py = sorted(
        set(
            re.findall(
                r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
                r"FlatMapGroupsInPandas)",
                plan,
            )
        )
    )
    n_scans = len(re.findall(r"Scan parquet", plan))
    n_codegen = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
    n_window = len(re.findall(r"\bWindow\b", plan))
    n_agg = len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan))
    return (
        f"# shape: exchanges={n_exchange} (reused={n_reused}) "
        f"joins={joins or '[]'} python={py or '[]'} scans={n_scans} "
        f"codegen_spans={n_codegen} windows={n_window} agg_nodes={n_agg}\n"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "plans/r13"
    suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    os.makedirs(out_dir, exist_ok=True)

    from f1_data_pipeline_spark import (
        queries_relational,
        queries_streaming,
        queries_text,
    )
    from f1_data_pipeline_spark.queries import QUERIES
    from f1_data_pipeline_spark.session import get_spark

    calls = dict(QUERIES)
    # bench-only standalone forms (bench.py main)
    calls["dedup_first"] = queries_relational.q_dedup_first
    calls["join_fk_lookup"] = queries_relational.q_join_fk_lookup
    calls["agg_running_total"] = queries_relational.q_agg_running_total
    calls["join_anti_existing"] = queries_relational.q_join_anti_existing
    calls["stream_tumbling_window"] = queries_streaming.q_tumbling
    calls["dedup_minhash"] = queries_text.q_dedup_minhash

    def _topk_arrow(spark, sf_dir):
        import pyspark.sql.functions as F

        from f1_data_pipeline_spark.operators.similarity import (
            brute_force_topk_arrow,
        )
        from f1_data_pipeline_spark.sources import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        return brute_force_topk_arrow(emb.filter(F.col("vec_id") < 20), emb, k=5)

    calls["topk_similarity_arrow"] = _topk_arrow

    spark = get_spark("capture_plans")
    ok, failed = 0, []
    for name in sorted(calls):
        if only and name not in only:
            continue
        try:
            spark.sparkContext.setJobDescription(f"plan: {name}")
            df = calls[name](spark, sf_dir)
            plan = plan_text(df)
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(shape_summary(plan))
                fh.write(plan)
            ok += 1
            print(f"OK   {name}")
        except Exception as exc:  # noqa: BLE001 — record and continue
            failed.append(name)
            print(f"FAIL {name}: {type(exc).__name__}: {exc}")
        finally:
            spark.sparkContext.setJobDescription(None)
    print(f"captured {ok} plans -> {out_dir} (suffix {suffix}); failed: {failed}")


if __name__ == "__main__":
    main()
