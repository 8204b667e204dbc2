"""Corpus-preparation operators for large-scale training-data pipelines.

Beyond-reference suite (the reference pipeline has no sampling, scrubbing,
decontamination, or packing story — see SURVEY.md §2.L): four operator
families, all pure built-in expressions (JVM-side, no Python UDFs), each
registered with a DuckDB oracle twin in queries_corpus.py.

- train/test split: deterministic md5-bucket assignment. md5 of the id is
  identical hex in every engine, so the split is reproducible anywhere with
  no RNG/seed drift, stable under repartitioning and re-runs, and
  stratifiable post-hoc (group the assignment by any column). At 100 TB this
  is a narrow projection + two scalar expressions — no shuffle at all.
- PII redaction: regexp scrubbing with per-class match counts. Patterns are
  kept in the Java/RE2-common dialect so the same regex runs on any engine.
  One pass over the text column, no shuffle.
- contamination check: token n-gram overlap between a small eval/benchmark
  set and the training corpus (the decontamination step every LLM data
  pipeline needs). The eval n-gram set is distinct'd and BROADCAST; the
  corpus side is one explode + broadcast-hash join + per-doc aggregation —
  a single corpus pass whose only shuffle is the final per-doc groupBy,
  which AQE partial-aggregates map-side. Never an all-pairs join.
- sequence packing: contiguous greedy packing of tokenized docs into
  fixed-token-budget packs, per shard. The shard (id hash) is the parallel
  unit: each pack id depends only on rows within its shard, so results are
  reproducible under any executor count, and the per-shard window sort is
  the only shuffle. Pack utilization falls out of the same aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from f1_data_pipeline_spark.functions.text import (
    positional_ngrams,
    token_count,
    tokens,
)

# --- deterministic train/test split -------------------------------------------


def split_bucket(id_col: Column | str, n_buckets: int = 256) -> Column:
    """Deterministic bucket 0..n_buckets-1 from the md5 of the id.

    Uses the first two hex chars (256 buckets max) so the same expression —
    ('0x' || substr(md5(id),1,2))::int — is computable in any SQL engine.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    hex2 = F.substring(F.md5(c.cast("string")), 1, 2)
    return F.pmod(F.conv(hex2, 16, 10).cast("int"), F.lit(n_buckets))


def train_test_split(
    df: DataFrame, id_col: str = "doc_id", train_buckets: int = 230
) -> DataFrame:
    """Assign each row to 'train'/'test' by md5 bucket (230/256 ≈ 90%).

    Adds `bucket` (0..255) and `split` columns; no shuffle, no RNG.
    """
    b = split_bucket(id_col)
    return df.withColumn("bucket", b).withColumn(
        "split", F.when(b < train_buckets, F.lit("train")).otherwise(F.lit("test"))
    )


# --- deterministic stratified sampling ------------------------------------------


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str = "doc_id",
    rates: dict[str, int] | None = None,
    default_buckets: int = 8,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row when its salted md5
    bucket (0..255) falls under the stratum's bucket allowance — e.g.
    {'en': 128} keeps exactly the 50% of English docs whose hash lands in
    buckets 0..127. The standard corpus-mix move (downsample over-represented
    languages/sources, keep low-resource strata whole) with zero RNG: the
    sample is reproducible on any engine, stable under repartitioning, and a
    row's membership never changes as the corpus grows. The hash is salted
    ('sample:' prefix) so sample membership is independent of the
    train/test split bucket above. No shuffle — one projection + filter.
    """
    rates = rates or {}
    b = split_bucket(F.concat(F.lit("sample:"), F.col(id_col).cast("string")))
    allow = F.lit(default_buckets)
    for stratum, n in rates.items():
        allow = F.when(F.col(strata_col) == stratum, F.lit(n)).otherwise(allow)
    return df.withColumn("bucket", b).filter(F.col("bucket") < allow)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    k: int = 100,
) -> DataFrame:
    """Deterministic per-group cap: keep at most `k` rows per group — the
    domain-cap rule of corpus curation (no single source may dominate the
    mix). Rows are ranked by a salted md5 of their id, so the kept subset
    is (a) unbiased w.r.t. id assignment order, (b) reproducible on any
    engine, and (c) monotone under corpus growth within a group only up to
    the cap — unlike rate sampling, a group at its cap swaps members as
    better-hashed rows arrive, which is exactly the semantics of a cap.

    Adds `rn` (1..k hash rank within the group). One window shuffle keyed
    on the group; at 100 TB a pathological mega-group serializes its own
    sort, so pre-prune with a hash threshold (keep rows whose bucket <
    ~2k/|group| estimate) before ranking when group skew is extreme.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.lit("cap:"), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    id_col: str = "doc_id",
    mass_col: Column | None = None,
    scale: float = 1.0,
    max_epochs: int = 100,
) -> DataFrame:
    """Rebalance a corpus to a target domain MIXTURE — the data-mixing
    stage of LLM training-set assembly ("40% web, 30% code, 30% books",
    with scarce domains seen for multiple epochs and abundant ones
    downsampled).

    `weights` are relative target shares of total mass per domain (any
    positive numbers — normalized internally); `mass_col` is each row's
    mass (pass a token count for token-weighted mixing; default 1 = doc
    mixing) and MUST be integral so per-domain totals sum exactly (no
    float-summation order sensitivity); `scale` sizes the output pool
    relative to the weighted input mass. Per domain d:
    rate_d = share_d · pool_mass · scale / mass_d. Whole epochs replicate
    every row with `epoch` = 0..⌊rate⌋−1 (training pipelines keep the
    epoch id so shuffling can differ per pass); the fractional remainder
    keeps the salted-md5-bucketed subset of rows at the final epoch —
    fully deterministic, reproducible on any engine, stable under
    repartitioning (same contract as `stratified_sample`, and SQL-twin
    exact because the rate arithmetic is a fixed op sequence over exact
    integer totals). Domains without a weight are DROPPED (target share
    zero). Raises when any rate exceeds `max_epochs` — a weight that asks
    hundreds of epochs of a tiny domain is a config bug, not a mix.

    Plan: one integer aggregate over domains, a broadcast rates join, an
    epoch explode, a hash filter — no corpus-sized shuffle."""
    if not weights:
        raise ValueError("mixture_sample needs at least one domain weight")
    if any(v <= 0 for v in weights.values()):
        raise ValueError(f"weights must be positive: {weights}")
    wsum = float(sum(weights.values()))
    wn = {k: float(v) / wsum for k, v in weights.items()}
    mass = (mass_col if mass_col is not None else F.lit(1)).cast("long")
    d = df.withColumn("__mass", F.coalesce(mass, F.lit(0)))
    wmap = F.create_map(
        *[x for k, v in wn.items() for x in (F.lit(k), F.lit(v))]
    )
    totals = (
        d.groupBy(domain_col)
        .agg(F.sum("__mass").alias("__dmass"))
        .withColumn("__w", wmap[F.col(domain_col)])
        .filter(F.col("__w").isNotNull() & (F.col("__dmass") > 0))
    )
    # pool/rate over the (≤ |weights|-row) totals frame — bounded window
    rates = totals.withColumn(
        "__pool", F.sum("__dmass").over(Window.partitionBy())
    ).withColumn(
        "__rate",
        F.col("__w") * F.col("__pool").cast("double") * F.lit(float(scale))
        / F.col("__dmass").cast("double"),
    ).select(domain_col, "__rate")
    overshoot = rates.filter(F.col("__rate") > max_epochs).limit(1).collect()
    if overshoot:
        r = overshoot[0]
        raise ValueError(
            f"mixture weight for {r[domain_col]!r} implies rate "
            f"{r['__rate']:.1f} > max_epochs={max_epochs} — the domain is "
            "too small for its target share"
        )
    b = split_bucket(F.concat(F.lit("mix:"), F.col(id_col).cast("string")))
    return (
        d.join(F.broadcast(rates), domain_col)
        .withColumn("__nrep", F.floor("__rate").cast("int"))
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("__nrep"))))
        .withColumn("__b", b)
        .filter(
            (F.col("epoch") < F.col("__nrep"))
            | (F.col("__b") < (F.col("__rate") - F.floor("__rate")) * 256.0)
        )
        .drop("__mass", "__rate", "__nrep", "__b")
    )


# --- quality signals ------------------------------------------------------------


def quality_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tok_rows: DataFrame | None = None,
) -> DataFrame:
    """Per-document repetition/quality statistics + composite keep flag
    (the standard LLM-data filter shape: repetition caps + length band).
    One explode + two aggregates — shuffles keyed on (doc, token) then doc.
    Shared by the `repetition_quality` registry query and the curation plan
    (plans/curation.py).

    `tok_rows` (r13): optionally pass a pre-exploded (id_col, tok) frame so
    a composite that also tokenizes for other signals (q_text_quality)
    explodes the corpus once instead of once per consumer — the aggregation
    arithmetic is unchanged, only where the rows come from."""
    if tok_rows is None:
        tok_rows = df.select(
            F.col(id_col), F.explode(tokens(text_col)).alias("tok")
        )
    per_tok = tok_rows.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    n = F.sum("c")
    sig = per_tok.groupBy(id_col).agg(
        n.cast("long").alias("n_tokens"),
        F.count("*").alias("distinct_tokens"),
        F.round(1 - F.count("*") / n.cast("double"), 4).alias("dup_token_frac"),
        F.round(F.max("c") / n.cast("double"), 4).alias("top_token_frac"),
        F.round(
            F.sum(F.length("tok") * F.col("c")) / n.cast("double"), 4
        ).alias("mean_word_len"),
    )
    keep = (
        (F.col("n_tokens") >= 20)
        & (F.col("dup_token_frac") <= 0.9)
        & (F.col("top_token_frac") <= 0.3)
        & (F.col("mean_word_len").between(2.0, 12.0))
    )
    return sig.withColumn("keep", keep)


def compression_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_ratio: float = 0.1,
    max_ratio: float = 0.7,
) -> DataFrame:
    """Compression-ratio quality signal — the deflate heuristic from
    large-corpus curation (used alongside Gopher-style rules): documents
    that compress FAR BETTER than natural prose are boilerplate/template
    repetition the token-level stats can miss (long-range repeats beyond
    any n-gram window), and documents that barely compress are
    random/binary junk, base64 blobs, or minified code. Measured with
    zlib level 6: natural prose ~0.2–0.45, template boilerplate <0.05,
    base64 blobs ~0.76, uniform printable noise ~0.84 — so
    `keep_compression` flags the [min_ratio, max_ratio] band, default
    [0.1, 0.7].

    Adds: `zlib_ratio` (compressed bytes / raw UTF-8 bytes, ROUND(·,4);
    NULL for NULL/empty text — an empty document has no ratio, callers
    route it explicitly like the other vanishing-row edges) and
    `keep_compression`.

    Scale shape: ONE projection, no shuffle, no joins. zlib has no JVM
    expression, so this is the documented Python path: an Arrow-batched
    pandas UDF (zlib releases the GIL, compressing ~100 MB/s/core) — a
    per-document map over partition-sized batches, embarrassingly
    parallel at any corpus size."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    lvl = 6

    # NB: no pd.Series annotations on the kernel — this module has
    # `from __future__ import annotations`, which turns them into strings
    # that pandas_udf's signature inference rejects
    @pandas_udf("double")
    def _ratio(texts):
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8", "ignore")
            if not raw:
                return None
            return round(len(zlib.compress(raw, lvl)) / len(raw), 4)

        return texts.map(one)

    out = df.select(id_col, _ratio(F.col(text_col)).alias("zlib_ratio"))
    return out.withColumn(
        "keep_compression",
        F.col("zlib_ratio").between(min_ratio, max_ratio),
    )


# --- PII redaction --------------------------------------------------------------

# Java-regex / RE2 common dialect: no backrefs, no lookaround, \d and
# character classes only — portable to DuckDB (add the 'g' flag there).
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails/phones from `text_col` into `redacted`, with per-class
    match counts (`n_emails`, `n_phones`). Single projection, no shuffle."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "redacted": F.regexp_replace(
                F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
            ),
            "n_emails": F.regexp_count(t, F.lit(EMAIL_RE)),
            "n_phones": F.regexp_count(t, F.lit(PHONE_RE)),
        }
    )


# --- eval-set contamination check ----------------------------------------------


def contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_score: float = 0.2,
) -> DataFrame:
    """Per-corpus-doc n-gram overlap with the eval set's n-gram pool.

    Returns (doc_id, n_grams, n_matched, score, contaminated) for every
    corpus doc sharing ≥1 token n-gram with any eval doc. The eval pool is
    distinct'd then BROADCAST (benchmarks are small by construction); the
    corpus grams take ONE pass after shingling: a broadcast left join tags
    each gram with an eval-pool marker, and a single per-doc aggregate
    counts grams and matched grams together — gram count and match count
    share one shuffle (keyed by doc id, partial-aggregated map-side)
    instead of two aggregates joined afterward. Never an all-pairs
    document join.

    r13: grams travel as xxhash64 longs, not ngram strings — the gram
    text never reaches the output (only counts do), and the hash keys the
    distinct shuffle, the broadcast pool, and the probe join, so 8-byte
    keys replace ~30-byte strings end to end (guide §2.3 "narrower
    types"; the duplicate_spans discipline). Measured at sf0.1:
    1.58 → 1.11 s, byte-identical output, oracle re-proved both SFs.
    """
    eval_grams = (
        positional_ngrams(eval_df, id_col, text_col, n)
        .select(F.xxhash64("ngram").alias("__gh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    grams = (
        positional_ngrams(corpus, id_col, text_col, n)
        .select(F.col(id_col), F.xxhash64("ngram").alias("__gh"))
        .distinct()
    )
    counts = (
        grams.join(F.broadcast(eval_grams), "__gh", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.count("__hit").alias("n_matched"),
        )
        .filter(F.col("n_matched") >= 1)
    )
    score = F.round(F.col("n_matched").cast("double") / F.col("n_grams"), 4)
    return counts.select(
        id_col,
        "n_grams",
        "n_matched",
        score.alias("score"),
        (score >= min_score).alias("contaminated"),
    )


def contamination_flags(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_score: float = 0.2,
) -> DataFrame:
    """`corpus` with contamination columns attached for EVERY row (score 0 /
    contaminated false when no n-gram matches) — the keep-all variant used
    when contamination is a flag on the curated output rather than a
    report."""
    scores = contamination(corpus, eval_df, id_col, text_col, n, min_score)
    return (
        corpus.join(
            scores.select(id_col, "score", "contaminated"), id_col, "left"
        )
        .withColumn("score", F.coalesce(F.col("score"), F.lit(0.0)))
        .withColumn(
            "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
        )
    )


# --- corpus-level term statistics (TF-IDF) --------------------------------------


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_df: int = 1,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Top-k most characteristic terms per document by TF-IDF.

    idf is the BM25-style odds ratio (N - df + 0.5)/(df + 0.5) rather than
    its logarithm: every arithmetic op is then IEEE-exact (+,-,*,/ are
    bit-specified; ln is a libm call that may differ by 1 ulp across
    engines), so scores — and therefore the top-k ranking — are
    bit-identical on any engine with no float-tolerance escape hatch.

    Plan shape: explode → (doc, term) partial-aggregated counts; term-level
    document frequency is a second aggregate on the SAME (term-keyed)
    exchange; N is a 1-row broadcast. The only per-doc shuffle is the final
    top-k window, keyed on doc id. No driver-side scalars, no UDFs.

    Scale mitigation (the df-band pre-filter): `min_df` drops the hapax /
    rare-term tail and `max_df_ratio` drops the stopword head from the
    document-frequency side BEFORE the tf⋈dfreq join. Vocabulary at crawl
    scale is dominated by the df=1 tail (typos, ids, boilerplate hashes) —
    min_df=2 cuts the join build side and the term-keyed shuffle state by
    the tail's share without touching doc_len normalization (doc_len is
    aggregated from the unfiltered tf, so surviving terms score
    identically). The ceiling kills hot stopword keys (df ≈ N ⇒ idf ≈ 0 —
    never top-k material for any doc with ≥ k mid-band terms). Measured:
    see SCALE_NOTES "tfidf_top_terms scale probe" — the 16× vocab-growth
    superlinearity collapses under min_df=2.

    Edge of a non-trivial band: a document EVERY one of whose terms falls
    outside [min_df, max_df_ratio·N] disappears from the output entirely
    (the tf⋈dfreq join is inner), rather than appearing with < k terms —
    at crawl scale that's e.g. a doc of pure unique line-noise under
    min_df=2, which is usually the right outcome for a "characteristic
    terms" feed. Callers that must keep a row per input doc should
    left-join the result back to the doc ids.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    doc_len = tf.groupBy(id_col).agg(F.sum("tf").cast("long").alias("doc_len"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    n_docs = doc_len.agg(F.count("*").cast("long").alias("n_docs"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df_t") >= F.lit(min_df))
    if max_df_ratio is not None:
        # n_docs rides in as a 1-row broadcast, so the ceiling needs no
        # driver-side collect and composes into the same stage
        dfreq = (
            dfreq.crossJoin(F.broadcast(n_docs.withColumnRenamed("n_docs", "_nd")))
            .filter(
                F.col("df_t").cast("double")
                <= F.lit(float(max_df_ratio)) * F.col("_nd").cast("double")
            )
            .drop("_nd")
        )
    d = F.col("tf").cast("double") / F.col("doc_len").cast("double")
    i = (F.col("n_docs").cast("double") - F.col("df_t").cast("double") + F.lit(0.5)) / (
        F.col("df_t").cast("double") + F.lit(0.5)
    )
    scored = (
        tf.join(doc_len, id_col)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", d * i)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            "tf",
            "df_t",
            F.round("tfidf", 6).alias("tfidf"),
            "rank",
        )
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing_k: float = 0.5,
    tok_rows: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean token log-probability under the corpus's OWN
    add-k-smoothed unigram LM — the scalable stand-in for LM-perplexity
    quality filters (CCNet-style): documents far below the corpus mode
    are line noise, wrong-language, or boilerplate soup; rank/threshold
    on `mean_logprob` to drop them.

    Plan shape (same audited skeleton as tfidf_top_terms): explode →
    term-keyed count aggregate; corpus totals ride in as a 1-row
    broadcast; per-doc score is one term-keyed join + one doc-keyed
    aggregate. No driver-side state, no UDFs. Unseen-term mass exists by
    construction (the LM is trained on the scored corpus itself); to
    score NEW batches against a reference corpus, train on the reference
    and join the new batch's tokens the same way.

    Output: (id, n_tokens, mean_logprob) — natural log; higher is more
    typical of the corpus.

    DROPPED-ROW EDGE (same as tfidf_top_terms): documents whose text
    tokenizes to ZERO tokens produce no output row at all — the inner join
    on exploded tokens has nothing to carry. A quality filter thresholding
    on mean_logprob must route empty docs explicitly (they are usually
    exactly the junk such a filter wants to drop): left-join this result
    back to the corpus ids and treat NULL mean_logprob as its own class —
    the `text_quality` registry composite does precisely that.

    `tok_rows` (r13): optionally pass a pre-exploded (id_col, term) frame —
    this plan consumes the token stream TWICE (term counts + the scoring
    join), so a composite caller handing in a localCheckpointed frame cuts
    two more explode passes; the arithmetic is unchanged.
    """
    tok = (
        tok_rows
        if tok_rows is not None
        else df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    )
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").cast("double").alias("_total"),
        F.count(F.lit(1)).cast("double").alias("_vocab"),
    )
    k = float(smoothing_k)
    scored = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        F.log(
            (F.col("c").cast("double") + F.lit(k))
            / (F.col("_total") + F.lit(k) * F.col("_vocab"))
        ).alias("logp"),
    )
    return (
        tok.join(scored, "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg("logp"), 6).alias("mean_logprob"),
        )
    )


# --- sequence packing -----------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Contiguous greedy packing: within each shard (id mod n_shards), docs
    in id order fill packs of `max_tokens`; a doc opens a new pack when the
    running total before it crosses the budget. Returns pack-level rows
    (shard, pack_id, n_docs, pack_tokens, first_doc, last_doc, utilization).

    Deterministic under any partitioning: pack ids depend only on the
    (shard, id-order, token-count) sequence. max_tokens is kept a power of
    two so utilization = pack_tokens / max_tokens is an exact binary ratio
    on every engine.
    """
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard")
    docs = df.select(shard, F.col(id_col), token_count(text_col).alias("n_tokens"))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    packed = docs.withColumn(
        "pack_id",
        F.floor((cum - F.col("n_tokens")) / F.lit(float(max_tokens))).cast("long"),
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
        F.round(F.sum("n_tokens") / F.lit(float(max_tokens)), 4).alias("utilization"),
    )


# --- document chunking -----------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split long documents into overlapping token-window chunks — the
    context-window stage between curation and packing (a doc longer than
    the model's window must be cut; the overlap keeps boundary sentences
    learnable from both sides). Where `pack_sequences` composes SHORT
    docs up to the budget, this cuts LONG ones down to it; chain them
    (chunk → pack) for a full fill.

    Whitespace tokenization (the engine's token_count convention); chunk
    i covers tokens [i·stride, i·stride + max_tokens) with
    stride = max_tokens − overlap. Every token lands in ≥ 1 chunk;
    consecutive chunks share exactly `overlap` tokens (the final chunk
    may be shorter, never empty); docs at or under `max_tokens` pass
    through as their own single chunk; whitespace-only docs yield no
    rows. Entirely JVM-side — split → sequence → explode → slice →
    array_join, no Python on the data path — and embarrassingly
    parallel: no shuffle at all (`chunk_index` derives from the doc,
    not a window).

    Returns one row per chunk: (id_col, chunk_index, n_chunks,
    chunk_tokens, chunk_text); (id_col, chunk_index) is the natural key
    downstream stages treat as the new document id."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"need 0 <= overlap ({overlap}) < max_tokens ({max_tokens}) — "
            "stride would be non-positive and chunking would never advance"
        )
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.when(F.trim(F.col(text_col)) == "", F.array()).otherwise(toks)
    n = F.size("__toks")
    # ceil((n - overlap) / stride), min 1 for any non-empty doc: the
    # last chunk starts at the last stride boundary strictly below
    # n - overlap, so it is never a pure suffix of its predecessor
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(float(stride))).cast("int"),
        F.lit(1),
    )
    out = (
        df.withColumn("__toks", toks)
        .filter(F.size("__toks") > 0)
        .withColumn("__nc", n_chunks)
        .select(
            F.col(id_col),
            F.col("__toks"),
            F.col("__nc").alias("n_chunks"),
            F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias(
                "chunk_index"
            ),
        )
        .withColumn(
            "__chunk",
            F.slice(
                F.col("__toks"),
                F.col("chunk_index") * stride + 1,
                max_tokens,
            ),
        )
        .select(
            id_col,
            "chunk_index",
            "n_chunks",
            F.size("__chunk").alias("chunk_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# training export: deterministic global shuffle → ordered shard files
# (the last stage of the pipeline: what the training job actually reads)
# ---------------------------------------------------------------------------


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Deterministic global pseudorandom training order WITHOUT a global
    sort: every row gets `shard` (which file group it lands in) and `pos`
    (its rank inside the shard), both pure functions of (seed, id).
    Consuming shards round-robin — or all of them in (shard, pos) order —
    yields a reproducible shuffle of the corpus; changing `seed` gives an
    independent epoch order with zero data movement beyond the rewrite.

    Scale shape: rank key = md5(seed ‖ id); shard = hash prefix mod
    n_shards (≈uniform sizes); pos = row_number over a PER-SHARD window —
    parallel across shards, never the single-partition global window a
    naive ORDER BY rand() shuffle degenerates to. One shuffle on the hash,
    one per-shard sort. No RNG state anywhere — re-running any subset of
    the pipeline reproduces identical placement (the md5-bucket idiom
    shared with train_test_split).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = F.md5(
        F.concat_ws("\x1f", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    out = df.withColumn("__h", h).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring(F.col("__h"), 1, 8), 16, 10).cast("long"),
            F.lit(n_shards),
        ),
    )
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return out.withColumn("pos", F.row_number().over(w) - 1).drop("__h")


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    n_shards: int = 64,
    seed: int = 0,
    keep_previous: int = 1,
) -> dict:
    """Materialize the shuffled corpus as ordered shard files — the
    tokenizer-ready export: `{out_dir}/data/shard=N/` holds shard N's
    rows physically sorted by `pos` (each shard hashes to one writer
    task, so file order IS training order), and `{out_dir}/shards.json`
    records per-shard row counts + the (n_shards, seed) identity so a
    loader can size its epoch without scanning. The WHOLE export — data
    and manifest together — lands in an immutable VERSIONED directory
    (`{out_dir}.__v_<uuid>`) and `out_dir` itself is a SYMLINK flipped
    onto it with one atomic rename, so `out_dir` resolves to a complete
    export at EVERY instant: a crash anywhere leaves either the previous
    or the new export live, and — unlike the earlier
    rename-away-then-rename-in dance (round-6 advice) — there is no
    window where `out_dir` doesn't exist at all. The symlink is the
    POSIX analogue of an object store's pointer object; a cloud
    deployment publishes the versioned prefix name in a tiny pointer
    file with the same one-write flip. The newest `keep_previous`
    superseded exports are retained for in-flight readers (default 1 —
    raise it when readers may span several publish cycles, the same
    age-vs-reclaim dial as `vacuum_manifest`); older ones are reclaimed.
    A pre-symlink real-directory export migrates on first publish; that
    one-time migration renames the legacy directory into the versioned
    scheme BEFORE the flip, so the at-every-instant guarantee starts
    with the first symlink publish — during the migration itself there
    is a brief window where `out_dir` is absent (unavoidable: a real
    directory cannot be atomically replaced by a symlink on POSIX).
    Returns the manifest dict."""
    if keep_previous < 0:
        raise ValueError("keep_previous must be >= 0")
    import glob as _glob
    import json as _json
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    sh = shuffle_shards(df, id_col, n_shards, seed)
    ordered = sh.repartition("shard").sortWithinPartitions("pos")
    version = f"{out_dir}.__v_{_uuid.uuid4().hex[:8]}"
    published = False
    try:
        ordered.write.mode("overwrite").partitionBy("shard").parquet(
            _os.path.join(version, "data")
        )
        counts = {
            int(r["shard"]): r["n"]
            for r in sh.groupBy("shard").agg(F.count("*").alias("n")).collect()
        }
        manifest = {
            "n_shards": n_shards,
            "seed": seed,
            "rows": sum(counts.values()),
            "shard_rows": {str(k): counts[k] for k in sorted(counts)},
        }
        with open(_os.path.join(version, "shards.json"), "w") as fh:
            _json.dump(manifest, fh, indent=1, sort_keys=True)
        if _os.path.isdir(out_dir) and not _os.path.islink(out_dir):
            # legacy real-directory export: one-time migration into the
            # versioned scheme (itself crash-safe: if the rename lands
            # and the flip below doesn't, the next publish's GC keeps
            # the migrated dir as "previous" and out_dir flips fresh)
            _os.rename(out_dir, f"{out_dir}.__v_legacy_{_uuid.uuid4().hex[:8]}")
        # the atomic pointer flip: rename of a symlink over a symlink
        tmp_link = f"{out_dir}.__ln_{_uuid.uuid4().hex[:8]}"
        _os.symlink(_os.path.basename(version), tmp_link)
        _os.rename(tmp_link, out_dir)
        published = True
    finally:
        if not published:
            _shutil.rmtree(version, ignore_errors=True)
    # reclaim exports older than (current + keep_previous) — superseded
    # generations stay for readers that resolved the symlink before the
    # flip (and, with keep_previous > 1, for readers spanning cycles)
    gens = [
        d
        for d in _glob.glob(f"{out_dir}.__v_*")
        if _os.path.isdir(d) and not _os.path.samefile(d, version)
    ]
    gens.sort(key=_os.path.getmtime, reverse=True)
    for stale in gens[keep_previous:]:
        _shutil.rmtree(stale, ignore_errors=True)
    return manifest
