"""Vector expression helpers over array<float> embedding columns.

Pure Spark SQL higher-order functions (zip_with/aggregate) — computed in
double, element order preserved, no Python UDF (no serialization, no
Python workers). Note HOFs evaluate JVM-side but *outside* whole-stage
codegen (~10 µs per 64-dim cosine measured); that's fine here because the
operators (blocking/LSH/IVF) bound how many pairs ever reach these
kernels — the quadratic part is never their job. If a profile ever shows
the kernel itself dominating, the escape hatch is an Arrow pandas_udf
batch kernel, not a row UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in index order (deterministic double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
