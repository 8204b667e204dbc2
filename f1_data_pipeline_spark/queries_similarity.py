"""Registry entries for similarity search (SURVEY.md §2.L X4).

Brute-force and cosine-pair operators carry an exact DuckDB oracle built on
explicit unnest-based dot products (double arithmetic, rounded once at the
end). LSH/IVF approximate variants have no SQL twin → rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import dedup as D
from f1_data_pipeline_spark.operators import similarity as S
from f1_data_pipeline_spark.queries import register
from f1_data_pipeline_spark.sources import load_table

N_QUERIES = 20  # query subset for top-k checks (keeps the oracle O(20·N·dim))


def q_topk_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return S.brute_force_topk(queries, emb, k=5)


register(
    "topk_similarity",
    q_topk_similarity,
    f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings
        WHERE vec_id < {N_QUERIES}
    ), pairs AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.q_vec::DOUBLE[], c.embedding::DOUBLE[]) AS raw_sim
        FROM q, embeddings c
        WHERE q.query_id <> c.vec_id
    ), ranked AS (
        SELECT query_id, neighbor_id, ROUND(raw_sim, 4) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY ROUND(raw_sim, 4) DESC, neighbor_id ASC
               ) AS rank
        FROM pairs
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
    """,
)


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_cosine_pairs(
        emb, "vec_id", "embedding", threshold=0.35, block_col="label"
    )


register(
    "dedup_embedding_cosine",
    q_dedup_embedding_cosine,
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.35
    """,
)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    # planes/tables tuned for ≈0.9 recall@5 on the synthetic embeddings
    # (uniform-random 64-dim vectors are LSH's worst case — real embedding
    # manifolds cluster, so production would raise planes, not tables)
    return S.lsh_ann_topk(queries, emb, k=5, n_planes=4, n_tables=16)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    # nprobe tuned for ≈0.9 recall@5 on uniform-random vectors (nprobe/nlist
    # = 1/2 here because random data spreads neighbors across cells; real
    # clustered embeddings reach the same recall at far lower probe ratios)
    return S.ivf_ann_topk(queries, emb, k=5, nlist=8, nprobe=4)


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    # 64-bit codes + refine=8 for the uniform-random worst case (measured
    # 0.92 recall@5 in tests; clustered real embeddings need less of both).
    # The exact re-rank makes returned cos_sim values true cosines, but
    # WHICH pairs surface still depends on the ADC shortlist → rows-only.
    books = S.pq_train(emb, m=16, ksub=16, seed=42)
    codes = S.pq_encode(emb, books)
    return S.pq_topk(queries, codes, books, corpus=emb, k=5, refine=8)


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three ANN tiers, method-tagged, in one rows-only registry slot
    (approximate results have no SQL twin): LSH (bucketed candidates), IVF
    (cell-pruned scan), PQ (compressed-domain ADC + exact re-rank — the
    memory tier for 100 TB corpora).

    Round-13 in-callable gate: the callable computes the EXACT brute-force
    top-k over the same queries in-Spark and RAISES unless every method's
    pooled recall@5 clears the 0.8 floor the pytest suite pins — a
    degraded index or broken candidate machinery can no longer ship a
    green rows-only row (operators/gates.py)."""
    from f1_data_pipeline_spark.operators import gates

    lsh = q_ann_lsh_topk(spark, sf_dir).select(F.lit("lsh").alias("method"), "*")
    ivf = q_ann_ivf_topk(spark, sf_dir).select(F.lit("ivf").alias("method"), "*")
    pq = q_ann_pq_topk(spark, sf_dir).select(F.lit("pq").alias("method"), "*")
    out = lsh.unionByName(ivf).unionByName(pq)

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = S.brute_force_topk(queries, emb, k=5)
    gates.assert_topk_recall(out, exact, floor=0.8, methods=("lsh", "ivf", "pq"))
    return out


register("ann_topk", q_ann_topk, None)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: seeded-KMeans cells, 0.35-cosine
    within-cell pairs, one representative kept per component (rows-only:
    the KMeans quantizer has no SQL twin).

    Round-13 in-callable gates: (1) cluster-dedup invariants against the
    detector's own pair set — no pair ships with both endpoints kept, no
    row is dropped without an implicating pair, kept ⊆ input; (2) every
    emitted pair's cosine re-derived by an independent float64 numpy path
    must match the carried value and clear the threshold
    (operators/gates.py)."""
    from f1_data_pipeline_spark.operators import gates

    emb = load_table(spark, sf_dir, "embeddings")
    kept, pairs = D.semantic_dedup_parts(
        emb, "vec_id", "embedding", threshold=0.35, n_clusters=8
    )
    # the gates run several actions over kept/pairs (invariant joins, the
    # numpy cosine recompute) and the result is collected after them —
    # materialize both bounded frames once instead of re-running the
    # KMeans transform + blocked self-join per action
    pairs = pairs.localCheckpoint()
    kept = kept.localCheckpoint()
    gates.assert_cluster_dedup_gate(emb, kept, pairs, "vec_id")
    vecs = emb.select("vec_id", "embedding")
    pairs_v = (
        pairs.join(
            vecs.select(
                F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a")
            ),
            "id_a",
        ).join(
            vecs.select(
                F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b")
            ),
            "id_b",
        )
    )
    gates.assert_semantic_pair_cosines(pairs_v, threshold=0.35)
    return kept.select("vec_id", "label")


register("semantic_dedup", q_semantic_dedup, None)
