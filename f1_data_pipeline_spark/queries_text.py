"""Registry entries for text analysis + dedup operators (SURVEY.md §2.L
X2/X3/X5 and the training-data pipeline suite).

Oracle-parity approach: tokenization and counting are expressed with
replace/length and split primitives that behave identically in DuckDB; hash
functions are md5 (portable). xxhash64-based operators (minhash/simhash)
have no DuckDB twin → rows-only checks + pytest goldens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from f1_data_pipeline_spark.functions import text as X
from f1_data_pipeline_spark.operators import dedup as D
from f1_data_pipeline_spark.queries import register
from f1_data_pipeline_spark.sources import load_table


# --- X5 text_stats: per-language corpus profile --------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(X.token_count("text").cast("long")).alias("total_tokens"),
            F.round(
                F.sum("n_chars").cast("double") / F.count("*"), 2
            ).alias("avg_chars"),
        )
    )


register(
    "text_stats",
    q_text_stats,
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 2) AS avg_chars
    FROM documents GROUP BY lang
    """,
)


# --- token counting + quality scoring (one per-doc composite) --------------------

def q_text_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface-level quality signals (tokenization/punct/stopword density).
    Standalone form; the registry entry is the text_quality composite."""
    docs = load_table(spark, sf_dir, "documents")
    # BPE-ish proxy: word-character runs count as tokens, as do punctuation
    # marks — regexp_count with an identical pattern on both engines.
    bpe = F.regexp_count("text", F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"))
    n_chars = F.length("text")
    n_tokens = X.token_count("text")
    punct = X.punct_count("text")
    stop_hits = sum(X.occurrences("text", w) for w in X.LANG_MARKERS["en"])
    # score: length-normalized stopword density minus punctuation noise —
    # deterministic rational arithmetic, rounded once.
    score = F.round(
        (stop_hits.cast("double") / (n_tokens + 1))
        - (punct.cast("double") / (n_chars + 1)),
        4,
    )
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
        n_chars.cast("long").alias("n_chars"),
        punct.cast("long").alias("n_punct"),
        stop_hits.cast("long").alias("stopword_hits"),
        score.alias("quality_score"),
    )


_PUNCT_STRIP_SQL = (
    "replace(replace(replace(replace(replace(replace(text,'.',''),',',''),"
    "'!',''),'?',''),';',''),':','')"
)
_OCC = (
    "CAST((len(' ' || text || ' ') - len(replace(' ' || text || ' ', ' {w} ', '')))"
    " / {n} AS BIGINT)"
)


def _occ_sql(w: str) -> str:
    return _OCC.format(w=w, n=len(f" {w} "))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite per-doc quality row: surface signals (q_text_surface) joined
    with token-level repetition signals + keep/drop decision
    (operators/corpus.py quality_signals) and the add-k unigram-LM score
    (operators/corpus.py unigram_logprob — LN((c+k)/(total+k·vocab)),
    rounded to 6 decimals on both engines, which tames libm drift) — the
    full Gopher/CCNet-style filter input in one oracle-checked frame. All
    sides key on doc_id, so the joins are co-partitioned equi-joins; docs
    with zero tokens keep their surface row (left joins) with repetition
    and LM columns NULL on both engines (unigram_logprob's documented
    dropped-row edge, routed explicitly here)."""
    from f1_data_pipeline_spark.operators.corpus import (
        quality_signals,
        unigram_logprob,
    )

    docs = load_table(spark, sf_dir, "documents")
    surface = q_text_surface(spark, sf_dir)
    # r13: one shared token explode for the three downstream consumers
    # (repetition counts + the LM's term counts AND scoring join) instead
    # of three scan→split→explode passes; localCheckpoint materializes it
    # once. Aggregation arithmetic is untouched — oracle re-proved both SFs.
    tok = docs.select(
        "doc_id", F.explode(X.tokens("text")).alias("tok")
    ).localCheckpoint()
    rep = quality_signals(docs, "doc_id", "text", tok_rows=tok).select(
        "doc_id",
        F.col("n_tokens").alias("rep_n_tokens"),
        "distinct_tokens",
        "dup_token_frac",
        "top_token_frac",
        "mean_word_len",
        "keep",
    )
    lm = unigram_logprob(
        docs, "doc_id", "text", smoothing_k=0.5,
        tok_rows=tok.select("doc_id", F.col("tok").alias("term")),
    ).select(
        "doc_id",
        F.col("n_tokens").alias("lm_n_tokens"),
        "mean_logprob",
    )
    return surface.join(rep, "doc_id", "left").join(lm, "doc_id", "left")


register(
    "text_quality",
    q_text_quality,
    f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens,
               CAST(len(text) AS BIGINT) AS n_chars,
               CAST(len(text) - len({_PUNCT_STRIP_SQL}) AS BIGINT) AS n_punct,
               {" + ".join(_occ_sql(w) for w in X.LANG_MARKERS["en"])} AS stopword_hits
        FROM documents
    ),
    tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
    ), cnt AS (
        SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ), sig AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS rep_n_tokens,
               COUNT(*) AS distinct_tokens,
               ROUND(1 - COUNT(*) / CAST(SUM(c) AS DOUBLE), 4) AS dup_token_frac,
               ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 4) AS top_token_frac,
               ROUND(SUM(len(tok) * c) / CAST(SUM(c) AS DOUBLE), 4) AS mean_word_len
        FROM cnt GROUP BY doc_id
    ),
    term AS (
        SELECT tok, CAST(SUM(c) AS BIGINT) AS tc FROM cnt GROUP BY tok
    ),
    lmtot AS (
        SELECT CAST(SUM(tc) AS DOUBLE) AS total,
               CAST(COUNT(*) AS DOUBLE) AS vocab
        FROM term
    ),
    lp AS (
        SELECT tok, LN((CAST(tc AS DOUBLE) + 0.5) / (total + 0.5 * vocab)) AS logp
        FROM term CROSS JOIN lmtot
    ),
    lm AS (
        SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS lm_n_tokens,
               ROUND(AVG(lp.logp), 6) AS mean_logprob
        FROM tok JOIN lp USING (tok) GROUP BY tok.doc_id
    )
    SELECT t.doc_id, t.ws_tokens, t.bpe_tokens, t.n_chars, t.n_punct,
           t.stopword_hits,
           ROUND(CAST(t.stopword_hits AS DOUBLE) / (t.ws_tokens + 1)
                 - CAST(t.n_punct AS DOUBLE) / (t.n_chars + 1), 4) AS quality_score,
           sig.rep_n_tokens, sig.distinct_tokens, sig.dup_token_frac,
           sig.top_token_frac, sig.mean_word_len,
           (sig.rep_n_tokens >= 20 AND sig.dup_token_frac <= 0.9
            AND sig.top_token_frac <= 0.3
            AND sig.mean_word_len BETWEEN 2.0 AND 12.0) AS keep,
           lm.lm_n_tokens, lm.mean_logprob
    FROM t LEFT JOIN sig ON t.doc_id = sig.doc_id
         LEFT JOIN lm ON t.doc_id = lm.doc_id
    """,
)


# --- language-ID heuristic + document fingerprinting (one per-doc composite) -------

def q_lang_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        X.lang_id("text").alias("predicted_lang"),
        X.fingerprint("text").alias("fp_md5"),
        F.substring(X.fingerprint("text"), 1, 8).alias("fp_bucket"),
    )


def _lang_score_sql(lang: str) -> str:
    return " + ".join(_occ_sql(w) for w in X.LANG_MARKERS[lang])


register(
    "lang_fingerprint",
    q_lang_fingerprint,
    f"""
    WITH s AS (
        SELECT doc_id, lang, text,
               {_lang_score_sql("en")} AS s_en,
               {_lang_score_sql("de")} AS s_de,
               {_lang_score_sql("es")} AS s_es,
               {_lang_score_sql("fr")} AS s_fr
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN GREATEST(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                WHEN s_de = GREATEST(s_en, s_de, s_es, s_fr) THEN 'de'
                WHEN s_en = GREATEST(s_en, s_de, s_es, s_fr) THEN 'en'
                WHEN s_es = GREATEST(s_en, s_de, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS predicted_lang,
           md5(text) AS fp_md5,
           substr(md5(text), 1, 8) AS fp_bucket
    FROM s
    """,
)


# --- X2 exact dedup -----------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(docs, "text", "doc_id").select("doc_id", "lang", "source")


register(
    "dedup_exact",
    q_dedup_exact,
    """
    SELECT doc_id, lang, source FROM documents
    QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) = 1
    """,
)


# --- X3 exact token-set Jaccard (inverted index; full SQL oracle) --------------------

def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.token_jaccard_pairs(docs, "doc_id", "text", threshold=0.8)


register(
    "dedup_ngram_jaccard",
    q_dedup_ngram_jaccard,
    """
    WITH toks AS (
        SELECT doc_id AS id, list_distinct(string_split_regex(trim(text), '\\s+')) AS toks
        FROM documents
    ), sized AS (
        SELECT id, len(toks) AS n, unnest(toks) AS tok FROM toks
    ), shared AS (
        SELECT a.id AS id_a, b.id AS id_b, a.n AS n_a, b.n AS n_b,
               COUNT(*) AS shared
        FROM sized a JOIN sized b ON a.tok = b.tok AND a.id < b.id
        GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b,
           ROUND(CAST(shared AS DOUBLE) / (n_a + n_b - shared), 4) AS jaccard
    FROM shared
    WHERE ROUND(CAST(shared AS DOUBLE) / (n_a + n_b - shared), 4) >= 0.8
    """,
)


# --- exact substring duplicate spans (suffix-array-style dedup) ----------------------

def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-doc duplicated token ranges (15-gram formulation of
    substring dedup — operators/dedup.py duplicate_spans): the spans an
    exact-substring deduper would cut. Full span list is oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    out = D.duplicate_spans(docs, "doc_id", "text", n=15, min_docs=2)
    return out.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
        F.col("n_dup_grams").cast("long").alias("n_dup_grams"),
    )


register(
    "duplicate_spans",
    q_duplicate_spans,
    r"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ), pos AS (
        SELECT doc_id,
               unnest([{'p': i, 'g': md5(array_to_string(toks[i+1:i+15], ' '))}
                       FOR i IN range(0, greatest(len(toks) - 14, 0))]) AS pg
        FROM tok
    ), grams AS (
        SELECT doc_id, pg.p AS pos, pg.g AS gh FROM pos
    ), dup AS (
        SELECT gh FROM grams GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2
    ), flagged AS (
        SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gh)
    ), isl AS (
        SELECT doc_id, pos,
               SUM(CASE WHEN prev IS NULL OR pos - prev > 15 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS island
        FROM (
            SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM flagged
        )
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + 14 AS BIGINT) AS span_end,
           CAST(MAX(pos) + 14 - MIN(pos) + 1 AS BIGINT) AS span_tokens,
           COUNT(*) AS n_dup_grams
    FROM isl GROUP BY doc_id, island
    """,
)


def q_dedup_clip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply step of substring dedup: duplicated 15-gram ranges are cut out
    of every doc (operators/dedup.py remove_duplicate_spans); one row per
    doc with the clipped text and kept/removed token counts — all
    oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    return D.remove_duplicate_spans(docs, "doc_id", "text", n=15, min_docs=2)


register(
    "dedup_clip_spans",
    q_dedup_clip_spans,
    r"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents
    ), pos AS (
        SELECT doc_id,
               unnest([{'p': i, 'g': md5(array_to_string(toks[i+1:i+15], ' '))}
                       FOR i IN range(0, greatest(len(toks) - 14, 0))]) AS pg
        FROM tok
    ), grams AS (
        SELECT doc_id, pg.p AS pos, pg.g AS gh FROM pos
    ), dup AS (
        SELECT gh FROM grams GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2
    ), flagged AS (
        SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gh)
    ), isl AS (
        SELECT doc_id, pos,
               SUM(CASE WHEN prev IS NULL OR pos - prev > 15 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS island
        FROM (
            SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM flagged
        )
    ), spans AS (
        SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 14 AS span_end
        FROM isl GROUP BY doc_id, island
    ), tp AS (
        SELECT doc_id, pt.p AS pos, pt.t AS tok FROM (
            SELECT doc_id,
                   unnest([{'p': i, 't': toks[i+1]} FOR i IN range(0, len(toks))]) AS pt
            FROM tok
        )
    ), clean AS (
        SELECT t.doc_id,
               string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text,
               COUNT(*) AS kept_tokens
        FROM tp t
        WHERE NOT EXISTS (
            SELECT 1 FROM spans s
            WHERE s.doc_id = t.doc_id
              AND t.pos BETWEEN s.span_start AND s.span_end
        )
        GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           COALESCE(c.clean_text, '') AS clean_text,
           CAST(COALESCE(c.kept_tokens, 0) AS BIGINT) AS kept_tokens,
           CAST(len(string_split_regex(trim(d.text), '\s+'))
                - COALESCE(c.kept_tokens, 0) AS BIGINT) AS removed_tokens
    FROM documents d LEFT JOIN clean c USING (doc_id)
    """,
)


# --- X3 MinHash LSH + SimHash (no SQL twin → rows-only) ------------------------------

def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone minhash form (benched standalone); the registry entry is
    the dedup_near_pairs composite below."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs(docs, "doc_id", "text", max_hamming=10)


def q_dedup_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both seeded-hash near-dup pair detectors, method-tagged, in one
    rows-only slot (xxhash64 signatures have no SQL twin). `score` is
    est_jaccard for the minhash arm, hamming distance for the simhash arm.

    Round-13 in-callable gates (operators/gates.py): the minhash arm's
    emitted pairs must clear an exact string-n-gram Jaccard floor and a
    sampled all-pairs sweep must find nothing ≥ threshold+margin that the
    banding missed; the simhash arm's carried hamming must equal an
    independently recomputed signature distance, and sampled pairs at
    hamming ≤ 3 (the pigeonhole guarantee of 4×16-bit chunk blocking)
    must all be present. Each callable RAISES on violation, so the
    rows-only row can never be green over a broken detector."""
    from f1_data_pipeline_spark.operators import gates

    docs = load_table(spark, sf_dir, "documents")
    # localCheckpoint: the gates run several actions over each pair set
    # (soundness join, completeness anti-join, violation counts) and the
    # final union is collected after them — materialize the bounded pair
    # frames once instead of recomputing the LSH plan per action
    mh_raw = D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).localCheckpoint()
    gates.assert_minhash_pairs_gate(docs, mh_raw, "doc_id", "text", threshold=0.5)
    sh_raw = D.simhash_pairs(docs, "doc_id", "text", max_hamming=10).localCheckpoint()
    gates.assert_simhash_pairs_gate(docs, sh_raw, "doc_id", "text", max_hamming=10)

    mh = mh_raw.select(
        F.lit("minhash").alias("method"),
        "id_a",
        "id_b",
        F.col("est_jaccard").cast("double").alias("score"),
    )
    sh = sh_raw.select(
        F.lit("simhash").alias("method"),
        "id_a",
        "id_b",
        F.col("hamming").cast("double").alias("score"),
    )
    return mh.unionAll(sh)


register("dedup_near_pairs", q_dedup_near_pairs, None)


def q_dedup_near_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dedup: minhash pairs → connected components → keep one
    representative per duplicate cluster (rows-only: minhash has no SQL
    twin).

    Round-13 in-callable gate: the kept set is checked against the
    detector's own pair set — no pair survives with both endpoints kept,
    every dropped doc appears in ≥1 pair, kept ⊆ input
    (operators/gates.py assert_cluster_dedup_gate; RAISES on violation)."""
    from f1_data_pipeline_spark.operators import gates

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).localCheckpoint()
    kept = D.dedup_by_clusters(docs, pairs, "doc_id").localCheckpoint()
    gates.assert_cluster_dedup_gate(docs, kept, pairs, "doc_id")
    return kept.select("doc_id", "lang", "source")


register("dedup_near_end_to_end", q_dedup_near_end_to_end, None)


# --- repetition signals + keep/drop decision (Gopher-style filters) ------------

def q_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition statistics used as LLM training-data
    filters — duplicate-token fraction, most-common-token dominance, mean
    word length — plus the composite keep/drop decision built from them
    (thresholds are the standard shape: repetition caps + length band).
    Token-level (this corpus is single-line); one explode + two
    aggregates — shuffle keyed on (doc, token) then doc. Standalone form;
    the registry entry is the text_quality composite above."""
    from f1_data_pipeline_spark.operators.corpus import quality_signals

    docs = load_table(spark, sf_dir, "documents")
    return quality_signals(docs, "doc_id", "text")


# --- text normalization (cleaning step before dedup/tokenization) -------------

def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text form: lowercase, strip the punctuation set, collapse
    whitespace runs — the normalization that feeds exact dedup so that
    case/punct variants hash identically."""
    docs = load_table(spark, sf_dir, "documents")
    stripped = F.lower("text")
    for ch in [".", ",", "!", "?", ";", ":"]:
        stripped = F.replace(stripped, F.lit(ch), F.lit(""))
    norm = F.trim(F.regexp_replace(stripped, r"\s+", " "))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.md5(norm.cast("binary")).alias("norm_fp"),
    )


register(
    "text_normalize",
    q_text_normalize,
    """
    SELECT doc_id,
           trim(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                   lower(text), '.',''), ',',''), '!',''), '?',''), ';',''), ':',''),
               '\\s+', ' ', 'g')) AS norm_text,
           md5(trim(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                   lower(text), '.',''), ',',''), '!',''), '?',''), ';',''), ':',''),
               '\\s+', ' ', 'g'))) AS norm_fp
    FROM documents
    """,
)
