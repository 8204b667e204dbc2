"""f1_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference batch ETL
pipeline (el-03/f1-data-pipeline, surveyed in SURVEY.md) as an idiomatic
Apache Spark engine: declarative DataFrame/SQL plans optimized by Catalyst,
Structured Streaming for incremental/streaming semantics, and a set of
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal column plumbing) designed for 100 TB-class inputs.

Layout:
    session.py    SparkSession factory (AQE, Arrow, UTC)
    schemas.py    StructType registry (testdata tables + F1 logical schema)
    sources/      parquet/csv/json-payload readers, HTTP-source scaffolding
    functions/    scalar/text/vector expression helpers (JVM-side first)
    operators/    relational ops, sinks, dedup, similarity, text, multimodal
    plans/        pipeline orchestration + incremental watermark control plane
    streaming/    Structured Streaming windows/as-of/approx-distinct
"""

__version__ = "0.1.0"
