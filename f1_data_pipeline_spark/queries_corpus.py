"""Registry entries for corpus-preparation operators (operators/corpus.py):
deterministic train/test split, PII redaction, eval-set contamination, and
sequence packing — the beyond-reference training-data pipeline suite.

Oracle-parity notes: md5 hex is identical across engines (split buckets);
regex patterns stay in the Java/RE2-common dialect (DuckDB needs the 'g'
flag on regexp_replace — Spark replaces all matches by default); n-gram
sets are list-comprehension + list_distinct in DuckDB vs word_shingles
(sequence/transform/slice + array_distinct) in Spark — same distinct-set
semantics, verified down to short-doc (< n tokens → empty) behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_data_pipeline_spark.operators import corpus as C
from f1_data_pipeline_spark.queries import register
from f1_data_pipeline_spark.sources import load_table


# --- deterministic train/test split --------------------------------------------

def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split assignment over documents, two tagged arms: `doc` — row-level
    md5-bucket 230/256 ≈ 90% train; `group` — the same assignment keyed on
    `source` instead, so every doc from one source lands in one split (the
    leakage-preventing group split: near-duplicate docs cluster within a
    source and must not straddle train/test). Full assignments are the
    oracle-checked output, so determinism is verified row-by-row."""
    docs = load_table(spark, sf_dir, "documents")
    by_doc = C.train_test_split(docs, "doc_id").select(
        F.lit("doc").alias("grain"), "doc_id", "lang", "bucket", "split"
    )
    by_source = C.train_test_split(docs.withColumnRenamed("source", "grp"), "grp")
    by_source = by_source.select(
        F.lit("group").alias("grain"), "doc_id", "lang", "bucket", "split"
    )
    return by_doc.unionAll(by_source)


register(
    "train_test_split",
    q_train_test_split,
    """
    SELECT 'doc' AS grain, doc_id, lang,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT
                AS INT) AS bucket,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT
                     < 230
                THEN 'train' ELSE 'test' END AS split
    FROM documents
    UNION ALL
    SELECT 'group', doc_id, lang,
           CAST(('0x' || substr(md5(source), 1, 2))::BIGINT AS INT) AS bucket,
           CASE WHEN ('0x' || substr(md5(source), 1, 2))::BIGINT < 230
                THEN 'train' ELSE 'test' END AS split
    FROM documents
    """,
)


# --- deterministic stratified sampling ------------------------------------------

_SAMPLE_RATES = {"en": 128, "de": 256, "es": 64, "fr": 26, "zh": 13}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three deterministic corpus-mix samplers in one tagged composite:
    `rate` — per-language bucket allowances out of 256 (en 50%, de 100%,
    es 25%, fr ~10%, zh ~5%) via salted md5; `cap` — at most 25 docs per
    source (the domain-cap rule), hash-ranked; `mix` (round 5) — token-
    weighted mixture rebalancing to target shares en 50% / de 25% / fr 25%
    (es/zh unweighted → dropped): abundant en downsamples (rate ≈ 0.8),
    scarce de/fr run a full epoch plus a fractional one (rate ≈ 1.3), so
    the arm exercises replication AND fractional hash selection. `pick` is
    the md5 bucket (rate), the within-group hash rank (cap), or the epoch
    id (mix). Full sampled rows are the oracle output, so membership —
    including per-epoch replicas — is verified row-by-row on all arms."""
    docs = load_table(spark, sf_dir, "documents")
    rate = C.stratified_sample(docs, "lang", "doc_id", _SAMPLE_RATES).select(
        F.lit("rate").alias("arm"),
        "doc_id",
        "lang",
        "source",
        F.col("bucket").cast("long").alias("pick"),
    )
    cap = C.cap_per_group(docs, "source", "doc_id", k=25).select(
        F.lit("cap").alias("arm"),
        "doc_id",
        "lang",
        "source",
        F.col("rn").cast("long").alias("pick"),
    )
    from f1_data_pipeline_spark.functions.text import token_count

    mix = C.mixture_sample(
        docs,
        "lang",
        {"en": 0.5, "de": 0.25, "fr": 0.25},  # binary-exact shares
        "doc_id",
        mass_col=token_count("text"),
        scale=1.0,
    ).select(
        F.lit("mix").alias("arm"),
        "doc_id",
        "lang",
        "source",
        F.col("epoch").cast("long").alias("pick"),
    )
    return rate.unionAll(cap).unionAll(mix)


register(
    "stratified_sample",
    q_stratified_sample,
    """
    WITH b AS (
        SELECT doc_id, lang, source,
               CAST(('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)),
                                    1, 2))::BIGINT AS INT) AS bucket
        FROM documents
    )
    SELECT 'rate' AS arm, doc_id, lang, source, CAST(bucket AS BIGINT) AS pick
    FROM b
    WHERE bucket < CASE lang WHEN 'en' THEN 128 WHEN 'de' THEN 256
                             WHEN 'es' THEN 64 WHEN 'fr' THEN 26
                             WHEN 'zh' THEN 13 ELSE 8 END
    UNION ALL
    SELECT 'cap', doc_id, lang, source, CAST(rn AS BIGINT) FROM (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 25
    UNION ALL
    SELECT 'mix', doc_id, lang, source, CAST(epoch AS BIGINT) FROM (
        SELECT j.doc_id, j.lang, j.source, j.rate, j.nrep, j.b,
               unnest(generate_series(0, j.nrep)) AS epoch
        FROM (
            SELECT t.doc_id, t.lang, t.source, r.rate,
                   CAST(FLOOR(r.rate) AS INT) AS nrep,
                   CAST(('0x' || substr(md5('mix:' || CAST(t.doc_id AS VARCHAR)),
                                        1, 2))::BIGINT AS INT) AS b
            FROM (
                SELECT doc_id, lang, source FROM documents
            ) t JOIN (
                SELECT lang,
                       w * CAST(SUM(dmass) OVER () AS DOUBLE)
                         * CAST(1.0 AS DOUBLE)
                         / CAST(dmass AS DOUBLE) AS rate
                FROM (
                    SELECT lang,
                           SUM(CAST(len(string_split_regex(trim(text), '\\s+'))
                                    AS BIGINT)) AS dmass,
                           CASE lang WHEN 'en' THEN CAST(0.5 AS DOUBLE)
                                     WHEN 'de' THEN CAST(0.25 AS DOUBLE)
                                     WHEN 'fr' THEN CAST(0.25 AS DOUBLE)
                           END AS w
                    FROM documents GROUP BY lang
                ) WHERE w IS NOT NULL AND dmass > 0
            ) r USING (lang)
        ) j
    ) WHERE epoch < nrep OR b < (rate - FLOOR(rate)) * 256.0
    """,
)


# --- corpus-level term statistics (TF-IDF) --------------------------------------

def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per doc by TF-IDF with BM25-style rational
    idf (bit-identical across engines — see operators/corpus.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return C.tfidf_top_terms(docs, "doc_id", "text", k=5)


register(
    "tfidf_top_terms",
    q_tfidf_top_terms,
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), dl AS (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS doc_len FROM tf GROUP BY 1
    ), dfreq AS (
        SELECT term, COUNT(*) AS df_t FROM tf GROUP BY 1
    ), nd AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM dl
    ), scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_t,
               (CAST(tf.tf AS DOUBLE) / CAST(dl.doc_len AS DOUBLE))
               * ((CAST(nd.n_docs AS DOUBLE) - CAST(dfreq.df_t AS DOUBLE) + 0.5)
                  / (CAST(dfreq.df_t AS DOUBLE) + 0.5)) AS tfidf
        FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN nd
    )
    SELECT doc_id, term, tf, df_t, ROUND(tfidf, 6) AS tfidf, "rank"
    FROM (
        SELECT doc_id, term, tf, df_t, tfidf,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term
               ) AS INT) AS "rank"
        FROM scored
    ) WHERE "rank" <= 5
    """,
)


# --- PII redaction --------------------------------------------------------------

def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PII is first INJECTED (synthetic docs carry none), then
    scrubbed: docs with doc_id%3==0 gain an id-derived email, %5==0 a phone
    number. The redacted text and both match counts are oracle-checked, so
    the scrub is verified on text that genuinely contains PII."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    injected = docs.withColumn(
        "text",
        F.concat(
            F.when(
                d % 3 == 0,
                F.concat(
                    F.lit("contact user"), d.cast("string"), F.lit("@example.com ")
                ),
            ).otherwise(F.lit("")),
            F.when(d % 5 == 0, F.lit("call 555-867-5309 ")).otherwise(F.lit("")),
            F.col("text"),
        ),
    )
    out = C.pii_redact(injected, "text")
    return out.select(
        "doc_id",
        "redacted",
        F.col("n_emails").cast("long").alias("n_emails"),
        F.col("n_phones").cast("long").alias("n_phones"),
    )


register(
    "pii_redaction",
    q_pii_redaction,
    r"""
    WITH inj AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN 'contact user' || CAST(doc_id AS VARCHAR) || '@example.com '
                    ELSE '' END
               || CASE WHEN doc_id % 5 = 0 THEN 'call 555-867-5309 ' ELSE '' END
               || text AS t
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(
               regexp_replace(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
                              '<EMAIL>', 'g'),
               '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
                AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones
    FROM inj
    """,
)


# --- eval-set contamination -----------------------------------------------------

def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination: 5-gram overlap between the pretend benchmark slice
    (doc_id % 97 == 0) and the rest of the corpus. Eval n-gram pool is
    broadcast; corpus read once."""
    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train_df = docs.filter(F.col("doc_id") % 97 != 0)
    out = C.contamination(train_df, eval_df, "doc_id", "text", n=5, min_score=0.2)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        "n_matched",
        "score",
        "contaminated",
    )


register(
    "contamination_check",
    q_contamination_check,
    r"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               list_distinct([array_to_string(toks[CAST(i AS INT):CAST(i AS INT)+4], ' ')
                              FOR i IN range(1, len(toks) - 3)]) AS gs
        FROM tok
    ),
    eg AS (
        SELECT DISTINCT unnest(gs) AS ngram FROM grams WHERE doc_id % 97 = 0
    ),
    cg AS (
        SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams, unnest(gs) AS ngram
        FROM grams WHERE doc_id % 97 <> 0
    )
    SELECT cg.doc_id, cg.n_grams, COUNT(*) AS n_matched,
           ROUND(CAST(COUNT(*) AS DOUBLE) / cg.n_grams, 4) AS score,
           ROUND(CAST(COUNT(*) AS DOUBLE) / cg.n_grams, 4) >= 0.2 AS contaminated
    FROM cg JOIN eg USING (ngram)
    GROUP BY cg.doc_id, cg.n_grams
    """,
)


# --- sequence packing -----------------------------------------------------------

def q_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack-level output of contiguous greedy packing (2048-token packs,
    8 shards): pack sizes, doc ranges, utilization."""
    docs = load_table(spark, sf_dir, "documents")
    return C.pack_sequences(docs, "doc_id", "text", max_tokens=2048, n_shards=8)


register(
    "token_packing",
    q_token_packing,
    r"""
    WITH d AS (
        SELECT doc_id % 8 AS shard, doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT shard, doc_id, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM d
    )
    SELECT shard,
           CAST(FLOOR((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE) / 2048.0, 4) AS utilization
    FROM c
    GROUP BY shard, CAST(FLOOR((cum - n_tokens) / 2048.0) AS BIGINT)
    """,
)
