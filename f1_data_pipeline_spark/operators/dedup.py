"""Deduplication operators for training-data pipelines (SURVEY.md §2.L X2/X3).

Five escalating strategies, all shuffle-conscious:

- exact:        content-hash groupBy (one shuffle on the hash)
- minhash LSH:  shingle → 64 minhashes → banded buckets → bucket-local join.
                The candidate join is on (band, band_hash) — never all-pairs —
                which is the property that survives 100 TB.
- simhash:      64-bit signature from token hashes; candidate blocking on
                16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ ≥1 identical chunk).
- n-gram Jaccard: exact token-set similarity on candidate pairs via an
                inverted-index join (token → docs), no cross join.
- embedding cosine: exact near-dup pairs over a label-blocked candidate set.

Everything is built-in expressions (xxhash64, higher-order array functions,
bit ops) — no Python UDFs anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from f1_data_pipeline_spark.functions.text import (
    fingerprint,
    positional_ngrams,
    tokens,
    word_shingles,
)
from f1_data_pipeline_spark.functions.vectors import dot, norm

# ---------------------------------------------------------------------------
# X2 — exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, content_col: str, id_col: str, keep: str = "min"
) -> DataFrame:
    """Keep one row per identical content (hash-based, deterministic winner).

    groupBy on md5(content) with min/max id: a single shuffle keyed on the
    hash — at scale the hash distributes uniformly, so no skew.
    """
    h = fingerprint(content_col)
    w = Window.partitionBy(h).orderBy(
        F.asc(id_col) if keep == "min" else F.desc(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# X3 — MinHash + LSH banding
# ---------------------------------------------------------------------------

def minhash_signature(
    text_col: Column | str, num_hashes: int = 64, shingle_size: int = 3
) -> Column:
    """Array of `num_hashes` minhash values over word shingles.

    Each hash family member is xxhash64 seeded by its index (an extra hashed
    literal column perturbs the hash — standard seeding trick). Empty shingle
    sets yield nulls so degenerate docs never collide into one bucket.
    """
    sh = word_shingles(text_col, shingle_size)

    def _hash_i(i: int):
        # closure factory, NOT `lambda s, i=i` — a 2-param lambda would be
        # interpreted by pyspark as the (element, index) higher-order form
        # and every family member would hash with the same "seed".
        return lambda s: F.xxhash64(F.lit(i), s)

    sig = F.array(
        *[F.array_min(F.transform(sh, _hash_i(i))) for i in range(num_hashes)]
    )
    return F.when(F.size(sh) > 0, sig)


def _minhash_banded(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    bands: int,
    shingle_size: int,
    materialize_sig: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Shared banding pipeline: returns (sig, banded) where sig has one row
    per doc with columns m0..m{num_hashes-1} and banded has one row per
    (doc, band) carrying only (id, band, band_hash).

    `materialize_sig=True` localCheckpoints the signature table before
    fanning it out (r13 optimization): a consumer that self-joins `banded`
    and joins `sig` back twice (minhash_lsh_pairs) otherwise re-runs the
    whole scan→shingle→64-min-aggregate pipeline FOUR times — the plan's
    four branches are not exchange-reusable because two of them sit under
    BroadcastExchange. The signature table is tiny relative to the work
    that builds it (docs × (id + 64 longs) ≈ 0.5 KB/doc — the guide §8
    "decide with small rows" proxy), so materializing it once turns four
    shingle passes into one. Measured at sf0.1: pairs query 4.18 → 2.78 s,
    byte-identical output. Left False for single-consumer callers
    (bucket stats, index build) where the plan uses each branch once."""
    rows_per_band = num_hashes // bands
    # Shared codegen'd shingler (functions/text.py positional_ngrams; the
    # array-HOF form dominated runtime — ~4.6s of a 5.4s sf0.1 run).
    # Duplicate shingles need no dedup — MIN is idempotent over multisets.
    shingled = positional_ngrams(
        df.select(F.col(id_col).alias("id"), F.col(text_col)),
        "id",
        text_col,
        shingle_size,
    ).select("id", F.xxhash64("ngram").alias("h"))

    # 64 hash-family members: xxhash64 re-seeded by index over the one base
    # hash. All 64 mins compute in a single codegen'd aggregate pass.
    sig = shingled.groupBy("id").agg(
        *[F.min(F.xxhash64(F.lit(i), "h")).alias(f"m{i}") for i in range(num_hashes)]
    )
    if materialize_sig:
        sig = sig.localCheckpoint()

    # banded rows carry only (id, band, band_hash) — not the 64-long
    # signature (16× per doc through the shuffle adds up at scale); the
    # signature joins back for the (much smaller) candidate set only.
    banded = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[F.col(f"m{b * rows_per_band + j}") for j in range(rows_per_band)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    return sig, banded


def minhash_bucket_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """One-row bucket-population summary of the LSH banded join's key space
    — the capacity-planning/probe companion to `minhash_lsh_pairs`
    (max/p99/p50 bucket size, bucket count, candidate-pair volume implied
    by the current bucketing). A max_bucket far above p99 is the
    boilerplate-skew signature that `max_bucket_size` caps."""
    _, banded = _minhash_banded(
        df, id_col, text_col, num_hashes, bands, shingle_size
    )
    sizes = banded.groupBy("band", "band_hash").agg(F.count(F.lit(1)).alias("n"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").alias("max_bucket"),
        F.expr("percentile_approx(n, 0.99)").alias("p99_bucket"),
        F.expr("percentile_approx(n, 0.5)").alias("p50_bucket"),
        F.sum(F.expr("n * (n - 1) / 2")).cast("long").alias("candidate_pairs"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs (id_a < id_b) with estimated Jaccard.

    shingle rows → one base xxhash64 per shingle → 64 seeded-hash `min`
    aggregates (whole-stage-codegen'd hash aggregate, one shuffle on doc
    id) → `bands` band-hashes → explode → self-join on (band, hash) →
    distinct pairs → estimate = fraction of agreeing minhashes. The join
    key cardinality is O(docs × bands), and only same-bucket docs ever
    meet — the all-pairs quadratic never materializes.

    `max_bucket_size` is the hot-bucket guard for boilerplate-heavy
    corpora: headers/footers/license blocks shared by a large doc
    fraction make some (band, band_hash) buckets O(corpus)-sized, and a
    B-doc bucket emits B² candidate pairs — the one way this plan goes
    quadratic. Buckets over the cap are DROPPED whole: a bucket hit by
    thousands of documents is a boilerplate band with no discriminative
    signal, while genuinely near-duplicate pairs (J ≥ threshold) agree on
    most minhashes and meet again in their body-content bands, so
    above-threshold output is unchanged in practice (measured in
    tools/scale_probe.py mode=boilerplate; recall property tested in
    tests/test_dedup_similarity.py). Mechanics: bucket sizes come from a
    map-side-combined aggregate (a hot key never funnels raw rows to one
    reducer), and the hot-bucket set — tiny by construction — comes back
    as a broadcast anti-join, so the banded rows are never re-shuffled.
    Measured cost of the sizes pass: ~5% on top of the uncapped run at
    sf0.1 (9.25 → 9.72 s, tools/scale_probe.py) — and under actual skew
    the cap is a large net win (SCALE_NOTES round-4 table).
    Run exact dedup first (curation order, plans/curation.py): a cluster
    of byte-identical docs would otherwise legitimately exceed any cap.
    Default None keeps exact candidate parity for oracle queries.

    Deliberately row-based, not array-HOF-based: computing the signature
    as 64 `array_min(transform(...))` higher-order calls evaluates
    interpreted (outside codegen), and Catalyst's project collapsing
    re-inlines the whole signature expression into every band — measured
    ~20× slower than this aggregate form at sf0.01.

    r13: the signature table is localCheckpointed before fan-out (see
    _minhash_banded.materialize_sig) — this function's plan consumes it
    four times (banded self-join left/right + two sig join-backs) and the
    branches are not exchange-reusable. Makes the call EAGER (one job at
    build time); every current caller is a batch/foreachBatch context.
    """
    sig, banded = _minhash_banded(
        df, id_col, text_col, num_hashes, bands, shingle_size,
        materialize_sig=True,
    )

    if max_bucket_size is not None:
        sizes = banded.groupBy("band", "band_hash").agg(
            F.count(F.lit(1)).alias("__bn")
        )
        hot = sizes.filter(F.col("__bn") > max_bucket_size).select(
            "band", "band_hash"
        )
        banded = banded.join(F.broadcast(hot), ["band", "band_hash"], "left_anti")

    cand = (
        banded.select(F.col("id").alias("id_a"), "band", "band_hash")
        .join(banded.select(F.col("id").alias("id_b"), "band", "band_hash"),
              ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sig_arr = sig.select(
        "id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig")
    )
    cand = (
        cand.join(sig_arr.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
        .join(sig_arr.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
    )
    est = (
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.lit(num_hashes)
    )
    return (
        cand.withColumn("est_jaccard", F.round(est, 4))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# persisted minhash index — incremental near-dup dedup (build once, query
# every new batch: the crawl-ingest workflow. Recomputing the corpus's
# signatures per arriving batch is O(corpus) work per batch; the index
# makes it O(batch) + one scan of band-matched index rows)
# ---------------------------------------------------------------------------

def build_minhash_index(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
) -> None:
    """Persist the LSH state for a corpus: `{path}/bands` (one row per
    (id, band, band_hash), partitioned by band) and `{path}/sigs` (one
    signature array per doc). Parameters are stored alongside so queries
    can't silently mix hash families."""
    import json as _json

    sig, banded = _minhash_banded(df, id_col, text_col, num_hashes, bands, shingle_size)
    banded.write.mode("overwrite").partitionBy("band").parquet(f"{path}/bands")
    sig.select(
        "id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig")
    ).write.mode("overwrite").parquet(f"{path}/sigs")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "params.json"), "w") as fh:
        _json.dump(
            {
                "num_hashes": num_hashes,
                "bands": bands,
                "shingle_size": shingle_size,
            },
            fh,
        )


def _minhash_index_params(path: str) -> dict:
    import json as _json

    with open(os.path.join(path, "params.json")) as fh:
        return _json.load(fh)


def minhash_index_add(df: DataFrame, path: str, id_col: str, text_col: str) -> None:
    """Append a new batch's LSH state to the index (same hash family by
    construction — parameters come from the index). Run AFTER
    `query_minhash_index` has flagged the batch's near-dups, so the index
    grows with the accepted corpus.

    Crash contract (single writer — the streaming sink's checkpoint
    serializes batches): signatures append FIRST, bands LAST, so bands
    are the commit signal. A crash between the two leaves sig rows whose
    docs are simply not yet discoverable (no band rows → never a
    candidate → no wrong results), and a replay re-adds both — the
    resulting duplicate sig rows are harmless because the query
    deduplicates pairs after scoring. Idempotency checks must therefore
    key on BANDS ids (`minhash_index_ids`), not sigs."""
    p = _minhash_index_params(path)
    sig, banded = _minhash_banded(
        df, id_col, text_col, p["num_hashes"], p["bands"], p["shingle_size"]
    )
    sig.select(
        "id", F.array(*[F.col(f"m{i}") for i in range(p["num_hashes"])]).alias("sig")
    ).write.mode("append").parquet(f"{path}/sigs")
    banded.write.mode("append").partitionBy("band").parquet(f"{path}/bands")


def minhash_index_ids(spark, path: str) -> DataFrame:
    """Distinct doc ids COMMITTED to the index (present in bands — the
    last-written, authoritative side; see minhash_index_add's crash
    contract). One column `id`."""
    return spark.read.parquet(f"{path}/bands").select("id").distinct()


def compact_minhash_index(
    spark, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Rewrite the persisted index into few files, preserving the band
    partitioning `query_minhash_index` scans by.

    `minhash_index_add` appends one parquet write per ingest batch to
    `bands/` and `sigs/`, so a long-running crawl accumulates small files
    without bound — and the per-batch index scan the incremental design
    depends on degrades with file count, not data size. Compaction:

    - `sigs/`: dedup (replayed adds leave identical duplicate rows — the
      documented crash contract) and coalesce to ≈target-sized files;
    - `bands/`: dedup and repartition BY BAND, so each `band=` directory
      collapses to ~one file and stays the partition-pruned layout the
      query's broadcast join scans.

    Both sides swap in atomically (staged write + directory rename — the
    same `write_atomic` idiom as every table sink), sigs first and bands
    last to mirror the add contract, so a concurrent `query_minhash_index`
    reader resolves either the old or the new directory, never a partial
    rewrite, and a crash between the two swaps leaves a fully consistent
    index (new sigs cover every id the old bands reference). Query results
    are identical pre/post (parity-tested). Returns file counts.

    Cadence: run out-of-band every N ingest batches or on a size trigger —
    `start_neardup_sink`'s docstring wires this into the streaming loop.
    """
    import glob as _glob

    from f1_data_pipeline_spark.operators.sinks import write_atomic

    def _count(sub: str) -> int:
        return len(
            _glob.glob(os.path.join(path, sub, "**", "*.parquet"), recursive=True)
        )

    def _bytes(sub: str) -> int:
        return sum(
            os.path.getsize(f)
            for f in _glob.glob(
                os.path.join(path, sub, "**", "*.parquet"), recursive=True
            )
        )

    before = {"sigs": _count("sigs"), "bands": _count("bands")}
    n_sig_files = max(1, -(-_bytes("sigs") // target_file_bytes))  # ceil
    sigs = spark.read.parquet(f"{path}/sigs").dropDuplicates().coalesce(n_sig_files)
    write_atomic(sigs, f"{path}/sigs")
    bands = spark.read.parquet(f"{path}/bands").dropDuplicates().repartition("band")
    write_atomic(bands, f"{path}/bands", partition_by=["band"])
    return {
        "sigs_files_before": before["sigs"],
        "sigs_files_after": _count("sigs"),
        "bands_files_before": before["bands"],
        "bands_files_after": _count("bands"),
    }


def query_minhash_index(
    new_docs: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs (new_id, index_id, est_jaccard) of a NEW batch
    against the indexed corpus — the incremental form of
    `minhash_lsh_pairs`. The batch side (small by construction: one
    ingest batch) is BROADCAST against the band-partitioned index, so the
    corpus-sized side is scanned once and never shuffled; its signatures
    join only for the matched candidates. `max_bucket_size` caps hot
    index buckets exactly like the batch operator (sizes from the index
    side only — the boilerplate hazard lives in the corpus)."""
    spark = new_docs.sparkSession
    p = _minhash_index_params(path)
    new_sig, new_banded = _minhash_banded(
        new_docs, id_col, text_col, p["num_hashes"], p["bands"], p["shingle_size"]
    )
    idx_banded = spark.read.parquet(f"{path}/bands")
    if max_bucket_size is not None:
        sizes = idx_banded.groupBy("band", "band_hash").agg(
            F.count(F.lit(1)).alias("__bn")
        )
        hot = sizes.filter(F.col("__bn") > max_bucket_size).select(
            "band", "band_hash"
        )
        idx_banded = idx_banded.join(
            F.broadcast(hot), ["band", "band_hash"], "left_anti"
        )

    cand = (
        idx_banded.withColumnRenamed("id", "index_id")
        .join(
            F.broadcast(
                new_banded.withColumnRenamed("id", "new_id")
            ),
            ["band", "band_hash"],
        )
        .filter(F.col("new_id") != F.col("index_id"))
        .select("new_id", "index_id")
        .dropDuplicates(["new_id", "index_id"])
    )
    new_sigs = new_sig.select(
        F.col("id").alias("new_id"),
        F.array(*[F.col(f"m{i}") for i in range(p["num_hashes"])]).alias("sig_new"),
    )
    idx_sigs = spark.read.parquet(f"{path}/sigs").select(
        F.col("id").alias("index_id"), F.col("sig").alias("sig_idx")
    )
    est = (
        F.aggregate(
            F.zip_with("sig_new", "sig_idx", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.lit(p["num_hashes"])
    )
    return (
        cand.join(F.broadcast(new_sigs), "new_id")
        .join(idx_sigs, "index_id")
        .withColumn("est_jaccard", F.round(est, 4))
        .filter(F.col("est_jaccard") >= threshold)
        .select("new_id", "index_id", "est_jaccard")
        # a replayed index add can leave duplicate sig rows (crash
        # contract in minhash_index_add) — identical scores, dedup here
        .dropDuplicates(["new_id", "index_id"])
    )


# ---------------------------------------------------------------------------
# X3 variant — SimHash
# ---------------------------------------------------------------------------

def simhash64(text_col: Column | str) -> Column:
    """64-bit SimHash of the token multiset, as a signed long.

    Per token: h = xxhash64(token); bit i contributes +1 if set else −1.
    Sign of each bit-sum becomes the signature bit. Expressed as one
    aggregate over the token array — no explode, no shuffle.
    """
    toks = tokens(text_col)

    # closure factory, NOT `lambda t, i=i`: pyspark interprets a 2-param
    # lambda as the (element, index) higher-order form.
    def _contrib(i: int):
        return lambda t: (
            F.when(F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        )

    bit_sums = [
        F.aggregate(F.transform(toks, _contrib(i)), F.lit(0), lambda acc, x: acc + x)
        for i in range(64)
    ]
    out = F.lit(0).cast("long")
    for i, s in enumerate(bit_sums):
        out = out + F.when(s > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Blocking: split the 64-bit signature into 4 × 16-bit chunks; by
    pigeonhole any pair within hamming ≤ 3 shares at least one exact chunk,
    so candidates come from 4 chunk-equality joins — never all pairs.

    r13: the signature table is localCheckpointed before the chunk
    self-join — both join branches otherwise re-run the full
    scan→shingle→simhash pipeline (the minhash_lsh_pairs finding; the
    signature is one long per doc, the §8 small-rows proxy). Makes the
    call eager; every caller is a batch context.
    """
    sig = df.select(
        F.col(id_col).alias("id"), simhash64(text_col).alias("sim")
    ).localCheckpoint()
    chunks = sig.select(
        "id",
        "sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sim", 16 * c).bitwiseAND(F.lit(0xFFFF)).cast("int")
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    left = chunks.select(
        F.col("id").alias("id_a"), F.col("sim").alias("sim_a"), "chunk_idx", "chunk_val"
    )
    right = chunks.select(
        F.col("id").alias("id_b"), F.col("sim").alias("sim_b"), "chunk_idx", "chunk_val"
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        left.join(right, ["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# X3 variant — exact n-gram (token-set) Jaccard via inverted index
# ---------------------------------------------------------------------------

def token_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard over distinct token sets, threshold-filtered.

    Prefix-filter candidate generation (exact — no recall loss):

    1. Any valid pair needs overlap s ≥ t(n_x+n_y)/(1+t) ≥ ⌈t·n_small⌉.
       Pigeonhole: the smaller record's suffix of ⌈t·n⌉−1 rarest-last
       tokens cannot hold all s shared tokens, so at least one shared
       token lies in its prefix of n − ⌈t·n⌉ + 1 tokens (sorted
       rarest-first by global document frequency).
    2. Therefore joining prefix(smaller) × full-tokens(larger) finds
       every valid pair; "smaller" is well-defined per pair via
       (n, id) lexicographic order. A length filter n_small ≥ t·n_large
       (exact in decimal — float boundaries would drop pairs) prunes
       size-incompatible pairs in the join.
    3. Candidates verify exactly via array_intersect on the full token
       sets — O(candidates), never a token-level pair explosion.

    Join traffic falls from Σ_token df(token)² (every shared stopword
    pairs all its docs) to Σ_token prefix_df(token)·df(token), where
    stopwords almost never appear in rarest-first prefixes — on templated
    corpora this is the difference between quadratic blowup and
    near-linear candidates.
    """
    t_dec = F.lit(threshold).cast("decimal(10,6)")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokens(text_col)).alias("toks"),
    ).withColumn("n", F.size("toks"))
    inv = toks.select("id", "n", F.explode("toks").alias("tok"))

    # global df-order, rarest first (ties by token for determinism)
    dfreq = inv.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = inv.join(dfreq, "tok").withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("id").orderBy("df", "tok")),
    )
    prefix_len = F.col("n") - F.ceil(t_dec * F.col("n")) + 1
    prefix = ranked.filter(F.col("rk") <= prefix_len).select("id", "n", "tok")

    small = prefix.select(F.col("id").alias("id_s"), F.col("n").alias("n_s"), "tok")
    large = inv.select(F.col("id").alias("id_l"), F.col("n").alias("n_l"), "tok")
    cand = (
        small.join(large, "tok")
        .filter(
            # strict (n, id) order makes "smaller" unambiguous per pair
            (F.col("n_s") < F.col("n_l"))
            | ((F.col("n_s") == F.col("n_l")) & (F.col("id_s") < F.col("id_l")))
        )
        .filter(F.col("n_s").cast("decimal(20,6)") >= t_dec * F.col("n_l"))
        .select(
            F.least("id_s", "id_l").alias("id_a"),
            F.greatest("id_s", "id_l").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    # exact verification: join the full token sets back per candidate pair
    # and intersect — O(candidates), never a token-level pair explosion.
    shared = (
        cand.join(
            toks.select(
                F.col("id").alias("id_a"),
                F.col("toks").alias("toks_a"),
                F.col("n").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            toks.select(
                F.col("id").alias("id_b"),
                F.col("toks").alias("toks_b"),
                F.col("n").alias("n_b"),
            ),
            "id_b",
        )
        .withColumn("shared", F.size(F.array_intersect("toks_a", "toks_b")))
    )
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        shared.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# X4-adjacent — embedding cosine near-dup
# ---------------------------------------------------------------------------

EMBEDDING_PAIRS_UNBLOCKED_MAX = 100_000


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine ≥ threshold.

    With `block_col` the join is blocked (cluster/label/LSH bucket) so the
    quadratic stays within blocks. Without one, the all-pairs crossJoin is
    gated behind a corpus-size guard (≤ EMBEDDING_PAIRS_UNBLOCKED_MAX rows):
    above it the quadratic path is certainly a mistake — raise and point at
    LSH bucketing (similarity.lsh_ann_topk buckets) or a cluster/label
    column rather than silently planning an N² join.
    """
    if block_col is None:
        # bounded probe — a plain count() would materialize the whole
        # upstream plan just to check the threshold
        over = df.limit(EMBEDDING_PAIRS_UNBLOCKED_MAX + 1).count()
        if over > EMBEDDING_PAIRS_UNBLOCKED_MAX:
            raise ValueError(
                f"unblocked embedding_cosine_pairs over >"
                f"{EMBEDDING_PAIRS_UNBLOCKED_MAX} rows would crossJoin N² "
                "pairs; pass block_col (label/cluster/LSH bucket) for a "
                "blocked join"
            )
    # r13: norms are columns computed once per ROW below the join (the
    # brute_force_topk discipline) — inside `cosine` they would re-run per
    # PAIR, i.e. block-size times per vector. Same op order
    # (dot / sqrt(Σa²)·sqrt(Σb²)) → bit-identical cos_sim.
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        *([F.col(block_col).alias("blk")] if block_col else []),
    ).withColumn("__n", norm(F.col("vec")))
    a = base.select(
        F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
        F.col("__n").alias("__na"),
        *([F.col("blk").alias("blk")] if block_col else []),
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
        F.col("__n").alias("__nb"),
        *([F.col("blk").alias("blk")] if block_col else []),
    )
    joined = a.join(b, ["blk"]) if block_col else a.crossJoin(b)
    sim = F.round(
        dot(F.col("vec_a"), F.col("vec_b")) / (F.col("__na") * F.col("__nb")), 4
    )
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", sim)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


# ---------------------------------------------------------------------------
# duplicate-cluster resolution: pairs → connected components → canonical doc
# (the step that turns any pair-producing detector above into an actual
# dedup: keep one representative per duplicate cluster)
# ---------------------------------------------------------------------------

def duplicate_clusters(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over duplicate pairs → (id, cluster_id), where
    cluster_id = min member id of the component.

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels; converges in O(diameter)
    rounds (duplicate clusters are shallow — near-dup graphs are dense
    cliques, so 2-3 rounds in practice). Each round is one join + one
    aggregate; `localCheckpoint` truncates the growing lineage so round N
    doesn't replay rounds 1..N-1. Driver sees only the converged flag
    (a count), never the data.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        # materialize ONCE: every propagation round joins against edges,
        # and without this the detector plan upstream of `pairs` (minhash
        # banding / blocked cosine self-join) re-executes per round — at
        # sf0.1 that re-execution was ~25× the cost of the labels
        # themselves (112 s → 4 s for semantic_dedup_parts)
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("cluster_id"))


def dedup_by_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Keep one representative per duplicate cluster (min id), plus every
    row that appears in no pair. The end-to-end near-dedup: detector pairs
    in, deduplicated corpus out."""
    clusters = duplicate_clusters(pairs, a_col, b_col)
    losers = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# exact substring duplicate spans (suffix-array-style, n-gram formulation)
# ---------------------------------------------------------------------------

def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 15,
    min_docs: int = 2,
) -> DataFrame:
    """Exact substring-duplication spans: maximal token ranges of each doc
    whose every n-gram also appears in ≥ `min_docs-1` OTHER documents — the
    distributed formulation of suffix-array substring dedup (find repeated
    byte/token runs across the corpus, then cut them): any cross-doc
    repeated run of length ≥ n is covered exactly by its member n-grams, so
    flagging duplicated n-grams and merging overlapping/adjacent hits
    recovers the maximal duplicated ranges without any suffix sorting.

    Returns (id, span_start, span_end, span_tokens, n_dup_grams): token
    positions are 0-based inclusive; overlapping or touching gram hits
    (gap ≤ n) merge into one span.

    Plan shape (all linear, never all-pairs): positional grams stream
    through the codegen'd posexplode+lead pattern (the minhash/
    contamination shingler); the gram→doc-frequency aggregate shuffles on
    the gram hash (uniform); flagged positions re-join gram-keyed
    (AQE splits boilerplate-gram skew); interval merging is one per-doc
    window (gaps-and-islands) keyed on the id. At 100 TB the gram aggregate
    is the big shuffle — it partial-aggregates map-side and its key space
    is bounded by total corpus tokens, the same scaling as the minhash
    shingle pass.

    r13 optimizations (output byte-identical, oracle re-proved both SFs):
    the gram hash is xxhash64 (8-byte long) instead of md5 (32-char hex
    string) — the hash never reaches the output (only positions do), and
    it keys the doc-frequency shuffle and the flagged join, so 4× narrower
    keys cut both shuffles (guide §2.3 "narrower types"); and the gram
    table is localCheckpointed — the plan consumes it twice (doc-frequency
    aggregate + flagged join) and would otherwise run the scan→posexplode→
    window shingler twice end to end. Measured together at sf0.1:
    2.55 → 1.61 s. Makes the call EAGER (one job at build time). Scale
    note: the materialized gram table is (id, pos, hash) ≈ 20 B/token —
    about the bytes ONE of the two saved shuffles would move; on a
    cluster, executor loss under localCheckpoint forfeits lineage, so a
    long-running job would swap this for persist(DISK_ONLY) — same reuse,
    recoverable lineage.
    """
    grams = positional_ngrams(df, id_col, text_col, n).select(
        id_col, "pos", F.xxhash64("ngram").alias("gh")
    ).localCheckpoint()
    dup_grams = (
        grams.groupBy("gh")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gh")
    )
    flagged = grams.join(dup_grams, "gh").select(id_col, "pos")
    w_m = Window.partitionBy(id_col).orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(w_m)
    island = F.sum(
        F.when(gap.isNull() | (gap > n), 1).otherwise(0)
    ).over(w_m.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        flagged.withColumn("__island", island)
        .groupBy(id_col, "__island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_grams"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
            "n_dup_grams",
        )
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic (embedding-space) deduplication
# ---------------------------------------------------------------------------

def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int = 8,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings
    with a seeded KMeans coarse quantizer, compare pairs only WITHIN each
    cluster, and keep one representative per near-duplicate component.

    Returns the deduplicated rows of `df` (duplicates dropped, min-id
    representative kept). The cluster blocking is the approximation that
    makes embedding dedup tractable: the quadratic stays inside cells
    (N²/k per cell for balanced clusters), and cross-cluster near-dups are
    deliberately sacrificed — the paper's finding is that semantic dups
    overwhelmingly co-cluster. Same KMeans machinery as the IVF index
    (operators/similarity.py); deterministic under the fixed seed.

    Plan shape: one KMeans fit, one cell-blocked self-join (shuffle keyed
    on cell id; AQE splits oversized cells), then min-label propagation
    over the pair graph (duplicate_clusters) and an anti-join to drop
    non-representatives. Never an unblocked N² join. At 100 TB, fit the
    quantizer on a deterministic sample (`df.sample(fraction, seed)` or an
    md5-bucket slice) instead of the full corpus — the fit is maxIter
    corpus scans, while transform/assign stays one — and raise n_clusters
    so cells stay broadcast-sized; the paper uses ~100k clusters at
    LAION scale.
    """
    kept, _pairs = semantic_dedup_parts(
        df, id_col, vec_col, threshold, n_clusters, seed
    )
    return kept


def semantic_dedup_parts(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int = 8,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """`semantic_dedup` with its evidence exposed: returns (kept, pairs)
    so callers can gate the dedup decision against the detector's own pair
    set (operators/gates.py assert_cluster_dedup_gate — the round-13
    in-callable ground-truth discipline for rows-only registry keys)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ml = df.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__features"),
    )
    km = KMeans(
        k=n_clusters, seed=seed, maxIter=10, featuresCol="__features"
    ).fit(ml.select("__features"))
    assigned = km.transform(ml).select(
        F.col(id_col), F.col(vec_col), F.col("prediction").alias("__cell")
    )
    pairs = embedding_cosine_pairs(
        assigned, id_col, vec_col, threshold=threshold, block_col="__cell"
    )
    return dedup_by_clusters(df, pairs, id_col), pairs


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 15,
    min_docs: int = 2,
) -> DataFrame:
    """Cut the cross-doc duplicated ranges out of every document — the
    apply step of substring dedup (train on unique text, keep the unique
    remainder of partially-duplicated docs rather than dropping them).

    Returns one row per input doc: (id, clean_text, kept_tokens,
    removed_tokens). Tokens covered by any duplicate_spans range are
    dropped; the remainder re-joins in position order (sort_array over
    (pos, tok) structs — collect_list alone is not order-stable under
    shuffle). Docs with no duplicated span pass through unchanged; fully
    duplicated docs come back with empty text, which a downstream quality
    filter then drops.

    Plan shape: duplicate_spans' linear plan, plus one id-keyed anti join
    (equi on id, range residual on pos — spans per doc are few, so the
    residual scan per key is short) and one per-doc aggregate.
    """
    spans = duplicate_spans(df, id_col, text_col, n, min_docs)
    tok = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    uncovered = tok.alias("t").join(
        spans.alias("s"),
        (F.col(f"t.{id_col}") == F.col(f"s.{id_col}"))
        & (F.col("t.pos") >= F.col("s.span_start"))
        & (F.col("t.pos") <= F.col("s.span_end")),
        "left_anti",
    )
    clean = uncovered.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("kept_tokens"),
    )
    total = df.select(
        F.col(id_col), F.size(tokens(text_col)).cast("long").alias("__total")
    )
    return (
        total.join(clean, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("long").alias("kept_tokens"),
            (F.col("__total") - F.coalesce(F.col("kept_tokens"), F.lit(0)))
            .cast("long")
            .alias("removed_tokens"),
        )
    )


def _normalize_line(raw: Column) -> Column:
    """THE line match key, shared by detect and remove so it can never
    drift: lowercase, collapse ALL whitespace runs (tabs, CR — `trim`
    alone strips only ASCII spaces, so collapse must come FIRST or a
    tab-indented copy of a banner gets a different key), then trim.
    Whitespace-only lines normalize to ''."""
    return F.trim(F.regexp_replace(F.lower(raw), r"\s+", " "))


def frequent_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_frac: float = 0.01,
    min_docs: int = 2,
) -> DataFrame:
    """Boilerplate LINES: normalized lines appearing in at least
    `max(min_docs, ceil(min_doc_frac * n_docs))` DISTINCT documents —
    nav menus, cookie banners, footers, license headers (the
    CCNet/RefinedWeb line-dedup prefilter; per-document repetition is
    `quality_signals`' job, so a line repeated inside ONE document does
    not qualify). Returns (line, n_docs, doc_frac); `line` is trimmed,
    lowercased, whitespace-collapsed — the match key `remove_frequent_lines`
    uses. Empty lines never qualify.

    Plan: explode to (doc, line), distinct, count by line — one shuffle
    keyed on line content with map-side partials. The distinct-docs
    grain bounds the exchange by unique (doc, line) pairs; the output is
    boilerplate-sized, broadcastable downstream."""
    import math

    n_docs_total = df.select(id_col).distinct().count()
    thr = max(int(min_docs), math.ceil(n_docs_total * min_doc_frac))
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
    ).select(
        id_col,
        _normalize_line(F.col("raw")).alias("line"),
    ).filter(F.col("line") != "")
    return (
        lines.distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= F.lit(thr))
        .select(
            "line",
            "n_docs",
            F.round(F.col("n_docs") / F.lit(float(n_docs_total)), 6).alias(
                "doc_frac"
            ),
        )
    )


def remove_frequent_lines(
    df: DataFrame,
    boilerplate: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Strip every line whose normalized form is in `boilerplate` (the
    `frequent_lines` output or any (line) frame), preserving the order
    and original text of the lines that remain. Returns (id, clean_text,
    kept_lines, removed_lines); documents reduced to nothing come back
    with clean_text = '' rather than vanishing.

    Plan: positional explode → broadcast anti-join against the
    boilerplate set (output-bounded, never pairs-bounded) → per-document
    reassembly via collect_list + array_sort (grouped by the id we just
    exploded — one shuffle back to document grain)."""
    pos_lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"),
    ).withColumn("line", _normalize_line(F.col("raw")))
    kept = pos_lines.join(
        F.broadcast(boilerplate.select("line").distinct()), "line", "left_anti"
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("raw")))
                ),
                lambda s: s["raw"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("kept_lines"),
    )
    totals = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), "\n")).cast("long").alias("__total"),
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.coalesce(F.col("kept_lines"), F.lit(0)).cast("long").alias("kept_lines"),
        (F.col("__total") - F.coalesce(F.col("kept_lines"), F.lit(0)))
        .cast("long")
        .alias("removed_lines"),
    )
