"""Similarity search over embedding columns (SURVEY.md §2.L X4).

Three tiers, by scale:

- brute-force top-k: exact, query-set × corpus. Correctness baseline and the
  right choice when |queries| is small (broadcast the queries, stream the
  corpus — one pass, no corpus shuffle).
- LSH ANN: random-hyperplane signatures → bucket-equality join. Sub-linear
  candidate sets; recall controlled by number of hyperplane tables.
- IVF ANN: KMeans coarse quantizer (Spark ML, trained once), probe the
  nearest `nprobe` centroids. The industry-standard scale path: candidate
  count ≈ corpus/nlist × nprobe.

Distance kernels come from functions.vectors (pure SQL expressions). The
deterministic hyperplanes are generated from a fixed seed at import time —
no randomness at query time.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from f1_data_pipeline_spark.functions.vectors import cosine, dot, norm

# ---------------------------------------------------------------------------
# brute-force exact top-k
# ---------------------------------------------------------------------------

def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus (self excluded).

    Plan shape: broadcast(queries) ⨯ corpus → per-row cosine → windowed
    top-k partitioned by query. The corpus is scanned once and never
    shuffled before the (small) per-query candidate reduction.

    r13: vector norms are computed as columns BELOW the join (once per
    query row and once per corpus row) instead of inside the per-pair
    cosine — the HOF norm kernel otherwise re-runs |queries| times per
    corpus vector. The cosine arithmetic is unchanged
    (dot / sqrt(Σq²)·sqrt(Σc²), same op order), so values are
    bit-identical; the projections sit under the join, where Catalyst
    cannot re-inline them into the pair expression. Measured at sf0.1:
    1.14 → 0.84 s.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("__qn", norm(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("__cn", norm(F.col("c_vec")))
    sim = F.round(
        dot(F.col("q_vec"), F.col("c_vec")) / (F.col("__qn") * F.col("__cn")), 4
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def brute_force_topk_arrow(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k via an Arrow-batched numpy GEMM kernel.

    Same contract and results as `brute_force_topk`, different physical
    plan: the (small) query matrix is row-normalized on the driver and
    broadcast; each corpus partition streams through `mapInPandas`, where
    one `C_norm @ Q_norm.T` matrix multiply scores the whole Arrow batch
    against every query at once (BLAS, cache-blocked — versus one codegen'd
    scalar expression per row-pair in the SQL form). Each batch emits only
    its per-query top candidates (with a one-rounding-quantum safety
    margin, so the final rounded-sim/id tie-break can't lose a winner);
    the global exact top-k reduces the small candidate union JVM-side.

    Scale shape: corpus scanned once, never shuffled; Python↔JVM traffic is
    one Arrow batch in, ≤ |queries|·(k+ties) rows out per batch.
    """
    import pandas as pd

    q_rows = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("v")
    ).collect()
    q_ids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["v"] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, Qn))

    def score(batches):
        ids_q, Qn_ = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids_c = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            C = np.array(pdf["c_vec"].tolist(), dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = Cn @ Qn_.T  # (batch, queries)
            take = min(k + 1, S.shape[0])  # +1: self-match may occupy a slot
            # per-query candidate cut, widened by the 1e-4 rounding quantum
            kth = np.partition(S, S.shape[0] - take, axis=0)[S.shape[0] - take, :]
            rows_c, rows_q = np.nonzero(S >= kth - 1e-4)
            yield pd.DataFrame(
                {
                    "query_id": ids_q[rows_q],
                    "neighbor_id": ids_c[rows_c],
                    "cos_sim_raw": S[rows_c, rows_q],
                }
            )

    cand = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    ).mapInPandas(score, "query_id long, neighbor_id long, cos_sim_raw double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round("cos_sim_raw", 4))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank")
        )
    )


# ---------------------------------------------------------------------------
# LSH ANN (random hyperplanes, deterministic)
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Bucket id = sign-bit pattern of the vector against each hyperplane."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, plane) > 0)
        bucket = bucket + F.when(bit, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
    return bucket


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    `n_tables` independent hash tables of `n_planes` sign bits each;
    candidates are the union of same-bucket vectors across tables
    (deduplicated before scoring). Single-table LSH has vanishing recall
    once 2^planes ≫ per-bucket density — multiple tables is the standard
    recall knob: P(candidate) = 1 − (1 − p^planes)^tables where
    p = 1 − θ/π. Join is equality on (table, bucket); candidate volume
    ≈ tables · N / 2^planes per query.
    """
    sigs = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        sigs.append(
            F.struct(F.lit(t).alias("tbl"), lsh_bucket(vec_col, planes).alias("bkt"))
        )
    bucket_rows = F.explode(F.array(*sigs)).alias("tb")

    # r13: norms as per-row columns below the candidate join (the
    # brute_force_topk discipline) — computed BEFORE the bucket explode,
    # so once per vector rather than per (table-replica × candidate pair).
    # Same op order as `cosine` → bit-identical values.
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("__qn"), bucket_rows
    ).select("query_id", "q_vec", "__qn",
             F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("__cn"), bucket_rows
    ).select("neighbor_id", "c_vec", "__cn",
             F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"))

    cand = (
        c.join(F.broadcast(q), ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # a pair can collide in several tables — score it once
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = F.round(
        dot(F.col("q_vec"), F.col("c_vec")) / (F.col("__qn") * F.col("__cn")), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# IVF ANN (KMeans coarse quantizer via Spark ML)
# ---------------------------------------------------------------------------

def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k with an inverted-file (IVF) index.

    Train KMeans(nlist) on the corpus (one pass, seeded → deterministic),
    assign every corpus vector to its nearest centroid, then search each
    query only within its `nprobe` nearest centroid cells.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus_ml = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    km = KMeans(k=nlist, seed=seed, maxIter=10).fit(corpus_ml.select("features"))
    # r13: corpus norm once per row below the cell join (brute_force_topk
    # discipline; same op order as `cosine` → bit-identical values)
    assigned = km.transform(corpus_ml).select(
        "neighbor_id", "c_vec", F.col("prediction").alias("cell")
    ).withColumn("__cn", norm(F.col("c_vec")))

    centroids = [c.tolist() for c in km.clusterCenters()]
    # per-query: distances to all centroids (tiny — nlist entries), take nprobe
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("__qn", norm(F.col("q_vec")))
    cell_dists = F.array(
        *[
            F.struct(
                (
                    -2 * dot(F.col("q_vec"), F.array(*[F.lit(float(x)) for x in cent]))
                    + F.lit(float(sum(x * x for x in cent)))
                ).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, cent in enumerate(centroids)
        ]
    )
    q_cells = q.withColumn(
        "cell",
        F.explode(
            F.transform(
                F.slice(F.array_sort(cell_dists), 1, nprobe), lambda s: s["cell"]
            )
        ),
    )
    sim = F.round(
        dot(F.col("q_vec"), F.col("c_vec")) / (F.col("__qn") * F.col("__cn")), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        assigned.join(F.broadcast(q_cells), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# persisted IVF index: build once, search many (the production shape —
# retraining the quantizer per query batch would dominate at scale)
# ---------------------------------------------------------------------------

def build_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 8,
    seed: int = 42,
) -> None:
    """Train the coarse quantizer and persist the index:

    - `{path}/cells`: corpus vectors with their cell id, *partitioned by
      cell* so a probe reads only its cells' directories (partition
      pruning = the IVF inverted list);
    - `{path}/centroids`: nlist centroid vectors (broadcast-sized).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus_ml = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    km = KMeans(k=nlist, seed=seed, maxIter=10).fit(corpus_ml.select("features"))
    km.transform(corpus_ml).select(
        "neighbor_id", "c_vec", F.col("prediction").alias("cell")
    ).write.mode("overwrite").partitionBy("cell").parquet(f"{path}/cells")

    spark = corpus.sparkSession
    cents = [(i, [float(x) for x in c]) for i, c in enumerate(km.clusterCenters())]
    spark.createDataFrame(
        cents, "cell int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_index_add(
    new_vectors: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incremental index maintenance: assign new vectors to their nearest
    EXISTING centroid (same JVM-side distance expression the search uses —
    no KMeans retrain, no shuffle of the existing index) and append them
    under the matching cell partitions. Search results for the added
    vectors are exact within the probed cells immediately.

    At scale this is the freshness path between periodic rebuilds: adds
    are cheap (one pass over the new batch), the cost is gradual cell
    imbalance as the data distribution drifts from the trained quantizer.

    REBUILD THRESHOLD (measured, tools/scale_probe.py ivf_drift +
    SCALE_NOTES): rebuild with `build_ivf_index` when max/median cell
    size exceeds ~2.5, or on adding ~50% of the indexed volume, whichever
    comes first. Under emerging-topic drift (added batches drawn from
    clusters the quantizer never saw — the crawl-realistic drift; small
    mean shifts are near-orthogonal in high dimension and degrade
    nothing), imbalance grew 1.05 → 3.35 at 100% adds, per-query scanned
    fraction rose ~23%, and recall@5 lost ~0.02 (nprobe=2); an in-place
    rebuild recovered recall to 1.0 and reset imbalance to ~1.5. Returns
    rows added.
    """
    spark = new_vectors.sparkSession
    centroids = [
        (r["cell"], r["centroid"])
        for r in spark.read.parquet(f"{index_path}/centroids").collect()
    ]
    if not centroids:
        # an empty centroid list would make array_min return NULL and
        # strand every vector under cell=__HIVE_DEFAULT_PARTITION__,
        # unreachable by ivf_search's probe filter — fail instead
        raise ValueError(f"no centroids at {index_path} — build the index first")
    cell_dists = F.array(
        *[
            F.struct(
                (
                    -2 * dot(F.col("c_vec"), F.array(*[F.lit(float(x)) for x in cent]))
                    + F.lit(float(sum(x * x for x in cent)))
                ).alias("d"),
                F.lit(int(cell)).alias("cell"),
            )
            for cell, cent in centroids
        ]
    )
    assigned = (
        new_vectors.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        )
        .withColumn("cell", F.array_min(cell_dists)["cell"])
        .persist()  # one evaluation feeds both the count and the write —
        # the upstream (often embedding extraction) is expensive and may
        # be nondeterministic
    )
    try:
        n = assigned.count()
        assigned.write.mode("append").partitionBy("cell").parquet(
            f"{index_path}/cells"
        )
    finally:
        assigned.unpersist()
    return n


def ivf_search(
    queries: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Search a persisted IVF index: nearest `nprobe` centroids per query
    (tiny broadcast-side computation), then scan only those cells — the
    cell partition filter prunes the index directories."""
    spark = queries.sparkSession
    centroids = [
        (r["cell"], r["centroid"])
        for r in spark.read.parquet(f"{index_path}/centroids").collect()
    ]
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cell_dists = F.array(
        *[
            F.struct(
                (
                    -2 * dot(F.col("q_vec"), F.array(*[F.lit(float(x)) for x in cent]))
                    + F.lit(float(sum(x * x for x in cent)))
                ).alias("d"),
                F.lit(int(cell)).alias("cell"),
            )
            for cell, cent in centroids
        ]
    )
    q_cells = q.withColumn(
        "cell",
        F.explode(
            F.transform(F.slice(F.array_sort(cell_dists), 1, nprobe), lambda s: s["cell"])
        ),
    )
    # One collect does double duty: the (query, cell) assignment is tiny by
    # contract (queries broadcast below), so materialize it once on the
    # driver, derive the partition filter from it, and rebuild the broadcast
    # side as a local frame — the assignment expression runs exactly once.
    q_rows = q_cells.collect()
    probed = sorted({r["cell"] for r in q_rows})
    q_cells = spark.createDataFrame(q_rows, q_cells.schema)
    cells = spark.read.parquet(f"{index_path}/cells").filter(
        F.col("cell").isin(probed)  # partition pruning on the index layout
    ).withColumn("__cn", norm(F.col("c_vec")))
    # r13: per-row norms below the join (brute_force_topk discipline; same
    # op order as `cosine` → bit-identical values)
    q_cells = q_cells.withColumn("__qn", norm(F.col("q_vec")))
    sim = F.round(
        dot(F.col("q_vec"), F.col("c_vec")) / (F.col("__qn") * F.col("__cn")), 4
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cells.join(F.broadcast(q_cells), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def _ivf_remove_ids(spark, index_path: str, ids_df: DataFrame) -> int:
    """Remove the given `neighbor_id`s from the persisted IVF cells —
    only the CELL PARTITIONS that actually hold one of the ids are
    rewritten (dynamic partition overwrite); a cell emptied entirely is
    deleted outright (dynamic overwrite never touches a partition it has
    no rows for — leaving the stale directory would resurrect removed
    vectors). Idempotent: removing absent ids touches nothing."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    cells_dir = f"{index_path}/cells"
    ids = ids_df.toDF("__rm_id").distinct()
    cells = spark.read.parquet(cells_dir)
    touched = [
        r["cell"]
        for r in cells.join(
            F.broadcast(ids), cells["neighbor_id"] == ids["__rm_id"]
        ).select("cell").distinct().collect()
    ]
    if not touched:
        return 0
    # the write below READS cells_dir while dynamically OVERWRITING it —
    # localCheckpoint (eager) materializes the survivors and CUTS the
    # lineage, so no task can ever recompute a partition from the
    # already-overwritten files (a persist() would leave that lineage
    # live behind a cache eviction)
    survivors = (
        spark.read.parquet(cells_dir)
        .filter(F.col("cell").isin(touched))
        .join(F.broadcast(ids),
              F.col("neighbor_id") == F.col("__rm_id"), "left_anti")
        .localCheckpoint()
    )
    kept_cells = {
        r["cell"] for r in survivors.select("cell").distinct().collect()
    }
    conf = spark.conf
    prev = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        if kept_cells:
            survivors.write.mode("overwrite").partitionBy(
                "cell"
            ).parquet(cells_dir)
    finally:
        conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    for c in set(touched) - kept_cells:
        for d in _glob.glob(_os.path.join(cells_dir, f"cell={c}")):
            _shutil.rmtree(d, ignore_errors=True)
    return len(touched)


def maintain_ivf_index(
    spark,
    source_path: str,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 8,
    seed: int = 42,
    rebuild_imbalance: float = 2.5,
    rebuild_added_frac: float = 0.5,
) -> dict:
    """Incremental similarity search over a manifest embeddings table —
    the documented `consume_table_changes` composition (round-7 verdict
    #7): each call consumes exactly the source's row changes since the
    last call and folds them into the persisted IVF index, so index
    freshness costs ∝ changed rows, never corpus size — the
    "incremental ANN at 100 TB" loop assembled from existing parts.

    Per cycle: bootstrap (no index yet) runs `build_ivf_index` over the
    full snapshot; afterwards deletes and update-preimages are REMOVED
    from their cells (only touched cell partitions rewritten) and
    inserts + update-postimages are `ivf_index_add`-ed to their nearest
    existing centroid. Remove-then-add makes a replayed window converge:
    a crash after the index write but before the watermark commit
    re-runs the same window, whose removal pass strips the previous
    attempt's rows before re-adding them — never duplicates (the
    exactly-once contract `consume_table_changes` requires of its
    apply_fn, since a blind parquet append is not idempotent by itself).

    The consumer watermark lives in a one-row manifest STATE table at
    `{index_path}/_state` (columns: slot, indexed_rows,
    added_since_rebuild, rebuilds) — `consume_table_changes` stores its
    version watermark in that table's app metadata, committed atomically
    WITH the cycle's stats row.

    Drift policy (measured: SCALE_NOTES ivf_drift study): after the
    adds, when max/median cell size exceeds `rebuild_imbalance` OR
    cumulative adds since the last (re)build exceed `rebuild_added_frac`
    of the indexed volume, the quantizer is retrained from the source
    snapshot at the consumed version (`build_ivf_index` full rebuild —
    recall and balance reset, the counter restarts).

    Returns consume_table_changes' dict + {"action", "added",
    "removed_cells", "rebuilt"}."""
    import os as _os

    from .sinks import consume_table_changes, merge_upsert_manifest

    state_path = _os.path.join(index_path, "_state")
    outcome = {"action": "noop", "added": 0, "removed_cells": 0,
               "rebuilt": False}

    def _commit_state(indexed_rows: int, added_cum: int, rebuilds: int,
                      app_metadata: dict) -> None:
        row = spark.createDataFrame(
            [("s", int(indexed_rows), int(added_cum), int(rebuilds))],
            "slot string, indexed_rows long, added_since_rebuild long, "
            "rebuilds long",
        )
        merge_upsert_manifest(
            spark, row, state_path, keys=["slot"], partition_col="slot",
            app_metadata=app_metadata,
        )

    def _state_row() -> dict:
        from .sinks import read_manifest_table

        try:
            r = read_manifest_table(spark, state_path).first()
        except FileNotFoundError:
            r = None
        return (
            {"indexed_rows": 0, "added_since_rebuild": 0, "rebuilds": 0}
            if r is None
            else r.asDict()
        )

    def apply_fn(feed: DataFrame, app_metadata: dict) -> None:
        st = _state_row()
        # explicit key (the consumer_key passed below) — a future extra
        # app-metadata entry must not silently change which version the
        # drift rebuild snapshots
        consumed_v = app_metadata["ivf_consumed_src_version"]
        have_index = _os.path.isdir(_os.path.join(index_path, "centroids"))
        if not have_index:
            base = feed.filter(F.col("_change") == "insert").drop("_change")
            build_ivf_index(
                base, index_path, id_col=id_col, vec_col=vec_col,
                nlist=nlist, seed=seed,
            )
            n = base.count()
            outcome.update(action="bootstrap", added=n, rebuilt=True)
            _commit_state(n, 0, st["rebuilds"] + 1, app_metadata)
            return
        # remove EVERY id the window touches before adding: deleted rows
        # go away, updated rows' stale vectors go away, and — the replay
        # case — a crashed previous attempt's already-added inserts go
        # away before being re-added (this is what makes the cycle
        # idempotent; removing an absent id is a no-op)
        gone = feed.select(id_col)
        upserts = feed.filter(
            F.col("_change").isin("insert", "update_postimage")
        ).drop("_change")
        removed_cells = _ivf_remove_ids(spark, index_path, gone)
        added = ivf_index_add(
            upserts, index_path, id_col=id_col, vec_col=vec_col
        )
        added_cum = st["added_since_rebuild"] + added
        # drift check: imbalance from the live cells, adds from state
        sizes = [
            r["n"]
            for r in spark.read.parquet(f"{index_path}/cells")
            .groupBy("cell").count().withColumnRenamed("count", "n")
            .collect()
        ]
        sizes.sort()
        imbalance = (
            sizes[-1] / max(sizes[len(sizes) // 2], 1) if sizes else 0.0
        )
        total = sum(sizes)
        rebuilt = False
        if sizes and (
            imbalance > rebuild_imbalance
            or added_cum > rebuild_added_frac * max(total - added_cum, 1)
        ):
            from .sinks import read_manifest_table

            snap = read_manifest_table(
                spark, source_path, version=consumed_v
            )
            build_ivf_index(
                snap, index_path, id_col=id_col, vec_col=vec_col,
                nlist=nlist, seed=seed,
            )
            total = snap.count()
            added_cum = 0
            rebuilt = True
        outcome.update(
            action="incremental", added=added,
            removed_cells=removed_cells, rebuilt=rebuilt,
        )
        _commit_state(
            total, added_cum,
            st["rebuilds"] + (1 if rebuilt else 0), app_metadata,
        )

    r = consume_table_changes(
        spark, source_path, [id_col], state_path, apply_fn,
        consumer_key="ivf_consumed_src_version",
    )
    return {**r, **outcome}


# ---------------------------------------------------------------------------
# Product quantization (PQ): the ANN memory tier. IVF bounds how many
# vectors a probe SCANS; PQ bounds how many BYTES each scanned vector
# costs — m sub-codes of log2(ksub) bits replace d floats (64-dim float64
# = 512 B → 8 B at m=8, a 64× compression), so a 100 TB embedding corpus's
# candidate lists fit in executor memory instead of thrashing the scan.
# Search is ADC (asymmetric distance computation): the query stays
# full-precision, one m×ksub lookup table of subspace inner products is
# built per query, and a coded vector scores as m table lookups — no
# decode, no per-pair float math. An optional exact re-rank over the top
# refine·k ADC candidates restores near-exact recall at a bounded extra
# cost (the FAISS IVFPQ + refine shape).
# ---------------------------------------------------------------------------

def pq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    sample_size: int = 100_000,
    iters: int = 20,
    seed: int = 42,
) -> list:
    """Train PQ codebooks: split the (L2-normalized) vector into `m`
    contiguous subspaces and run seeded Lloyd's k-means with `ksub`
    centroids in each.

    Training is DRIVER-SIDE numpy over a bounded sample (`sample_size`
    rows via limit — the standard PQ practice: FAISS trains on ~100k
    vectors regardless of corpus size, because codebook quality saturates
    long before that). The returned codebooks are a plain nested list,
    JSON/parquet-serializable: shape (m, ksub, dim/m).

    Vectors are normalized before training/encoding so ADC inner products
    approximate cosine directly."""
    rows = corpus.select(F.col(vec_col).cast("array<double>")).limit(
        sample_size
    ).collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    if X.ndim != 2 or X.shape[0] < ksub:
        raise ValueError(
            f"PQ training needs ≥ksub={ksub} sample vectors, got {X.shape}"
        )
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = []
    for i in range(m):
        S = X[:, i * dsub : (i + 1) * dsub]
        # k-means++ style seeding would add little on subspace slices;
        # seeded random distinct rows + enough Lloyd's iterations is the
        # deterministic, reproducible choice
        cb = S[rng.choice(S.shape[0], ksub, replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(ksub):
                mask = assign == j
                if mask.any():
                    cb[j] = S[mask].mean(axis=0)
                else:  # empty cell: re-seed on the farthest point
                    cb[j] = S[d2.min(axis=1).argmax()]
        books.append(cb.round(9).tolist())
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every corpus vector to its `m` nearest-subcentroid codes:
    (id, codes array<int>). Arrow-batched numpy kernel — per batch, one
    (batch × ksub) distance GEMM per subspace; corpus scanned once, never
    shuffled, output is m small ints per vector."""
    import pandas as pd

    cb = np.array(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, ksub, dsub = cb.shape
    bcast = corpus.sparkSession.sparkContext.broadcast(cb)

    def encode(batches):
        cb_ = bcast.value
        cb_sq = (cb_**2).sum(axis=2)  # (m, ksub)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            X = X / np.linalg.norm(X, axis=1, keepdims=True)
            codes = np.empty((X.shape[0], cb_.shape[0]), dtype=np.int32)
            for i in range(cb_.shape[0]):
                S = X[:, i * dsub : (i + 1) * dsub]
                # argmin over ‖s−c‖² = ‖c‖² − 2 s·c (+‖s‖², constant per row)
                codes[:, i] = (cb_sq[i][None, :] - 2.0 * S @ cb_[i].T).argmin(
                    axis=1
                )
            yield pd.DataFrame(
                {"pq_id": pdf["pq_id"], "codes": list(codes)}
            )

    return corpus.select(
        F.col(id_col).alias("pq_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).mapInPandas(encode, "pq_id long, codes array<int>").select(
        F.col("pq_id").alias(id_col), "codes"
    )


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: list,
    corpus: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    refine: int = 4,
) -> DataFrame:
    """Approximate cosine top-k over PQ codes via ADC, with optional exact
    re-rank.

    Per query (queries are broadcast-sized by contract, same as every
    top-k entry point here): an m×ksub inner-product lookup table against
    the codebooks, built driver-side. Each codes partition streams through
    an Arrow kernel where a coded vector scores as m table gathers —
    `refine·k` candidates per query survive per batch. When `corpus` is
    given, the global ADC top `refine·k` joins back to the full-precision
    vectors for an EXACT cosine re-rank (broadcast semi-join on candidate
    ids — candidate volume is queries·refine·k, never corpus-sized);
    otherwise ADC scores rank directly (cos_sim = the ADC estimate)."""
    import pandas as pd

    cb = np.array(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, ksub, dsub = cb.shape
    q_rows = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("v")
    ).collect()
    q_ids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    Q = np.array([r["v"] for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    # LUT[q, i, j] = q_sub_i · cb[i, j]  → ADC(q, x) = Σ_i LUT[q, i, code_i]
    lut = np.stack(
        [Qn[:, i * dsub : (i + 1) * dsub] @ cb[i].T for i in range(m)], axis=1
    )
    bq = codes.sparkSession.sparkContext.broadcast((q_ids, lut))
    n_keep = refine * k + 1  # +1: self-match may occupy a slot

    def adc(batches):
        ids_q, lut_ = bq.value
        nq = lut_.shape[0]
        for pdf in batches:
            if not len(pdf):
                continue
            ids_c = pdf["pq_id"].to_numpy(dtype=np.int64)
            C = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
            S = np.zeros((C.shape[0], nq), dtype=np.float64)
            for i in range(lut_.shape[1]):
                S += lut_[:, i, C[:, i]].T  # gather: (n, nq)
            take = min(n_keep, S.shape[0])
            kth = np.partition(S, S.shape[0] - take, axis=0)[S.shape[0] - take, :]
            rows_c, rows_q = np.nonzero(S >= kth[None, :])
            yield pd.DataFrame(
                {
                    "query_id": ids_q[rows_q],
                    "neighbor_id": ids_c[rows_c],
                    "adc_sim": S[rows_c, rows_q],
                }
            )

    cand = codes.select(
        F.col(id_col).alias("pq_id"), "codes"
    ).mapInPandas(adc, "query_id long, neighbor_id long, adc_sim double").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("adc_sim"), F.asc("neighbor_id")
    )
    shortlist = cand.withColumn("adc_rank", F.row_number().over(w_adc)).filter(
        F.col("adc_rank") <= refine * k
    )
    if corpus is None:
        return (
            shortlist.withColumn("cos_sim", F.round("adc_sim", 4))
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.desc("cos_sim"), F.asc("neighbor_id")
                    )
                ),
            )
            .filter(F.col("rank") <= k)
            .select(
                "query_id", "neighbor_id", "cos_sim",
                F.col("rank").cast("long").alias("rank"),
            )
        )
    # exact re-rank: candidates are queries·refine·k rows — broadcast them
    # against the corpus scan, never the reverse
    qv = queries.sparkSession.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(q_ids, Qn)],
        f"query_id long, q_vec array<double>",
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    rejoined = c.join(
        F.broadcast(shortlist.select("query_id", "neighbor_id")), "neighbor_id"
    ).join(F.broadcast(qv), "query_id")
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        rejoined.withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cos_sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def build_pq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    sample_size: int = 100_000,
    seed: int = 42,
) -> None:
    """Persist a PQ index: `{path}/codes` (id, m small codes — the only
    corpus-sized artifact, ~m bytes/vector) and `{path}/codebooks`
    (m·ksub subcentroids, broadcast-sized). Same build-once/search-many
    shape as the IVF index; at 100 TB the codes table is what a search
    fleet keeps hot while the raw vectors stay cold until re-rank."""
    books = pq_train(
        corpus, vec_col=vec_col, m=m, ksub=ksub,
        sample_size=sample_size, seed=seed,
    )
    spark = corpus.sparkSession
    spark.createDataFrame(
        [
            (i, j, books[i][j])
            for i in range(len(books))
            for j in range(len(books[i]))
        ],
        "sub int, code int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    pq_encode(corpus, books, id_col, vec_col).write.mode("overwrite").parquet(
        f"{path}/codes"
    )


def load_pq_codebooks(spark, path: str) -> list:
    rows = spark.read.parquet(f"{path}/codebooks").collect()
    by = {}
    for r in rows:
        by.setdefault(r["sub"], {})[r["code"]] = list(r["centroid"])
    return [
        [by[i][j] for j in sorted(by[i])] for i in sorted(by)
    ]


def pq_search(
    queries: DataFrame,
    index_path: str,
    corpus: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    refine: int = 4,
) -> DataFrame:
    """Search a persisted PQ index (ADC over `{path}/codes`; exact re-rank
    against `corpus` when provided)."""
    spark = queries.sparkSession
    books = load_pq_codebooks(spark, index_path)
    codes = spark.read.parquet(f"{index_path}/codes")
    return pq_topk(
        queries, codes, books, corpus=corpus,
        id_col=id_col, vec_col=vec_col, k=k, refine=refine,
    )
