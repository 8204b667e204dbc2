"""In-callable ground-truth gates for the rows-only registry keys.

Round 12 made the materialized-view rewrite hashable by EXPLAIN-gating its
oracle callables: the callable RAISES unless the plan it claims to test
actually fired. This module applies the same discipline to the six
`no_oracle` registry keys (`ann_topk`, `dedup_near_pairs`,
`dedup_near_end_to_end`, `approx_sketches`, `semantic_dedup`,
`multimodal_features`): each callable computes its own exact ground truth
in-Spark at whatever SF the driver passes and RAISES on violation, so a
wrong answer can never ship under a rows-only green row. The invariants
previously lived only in pytest at fixed fixtures; now they guard the
hashed path itself.

Reference tie: the reference's only correctness mechanism is constraints
enforced at write time (reference loaders/__init__.py:87-101) — gates in
the path, not beside it.

Scale posture: every ground-truth computation here is either bounded by
the emitted result size (per-pair exact Jaccard, per-pair cosine
recompute), restricted to a deterministic sample capped at a few hundred
docs (all-pairs completeness sweeps — quadratic work stays O(cap²)
regardless of corpus size), or O(queries·corpus) brute force over the
bounded query subset. Driver-side collects are violation counts plus at
most a few sample rows — the same control-plane budget class as the
EXPLAIN gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class GateViolation(RuntimeError):
    """An in-callable ground-truth gate failed: the operator's answer
    violates its own exactly-computed contract. Raised so the driver's
    rows-only sweep can never record a green row over a wrong answer."""


def _fail(gate: str, detail: str) -> None:
    raise GateViolation(f"ground-truth gate {gate!r} failed: {detail}")


# ---------------------------------------------------------------------------
# ANN recall vs exact brute force (ann_topk)
# ---------------------------------------------------------------------------

def assert_topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    floor: float,
    methods: tuple[str, ...],
    method_col: str = "method",
) -> None:
    """Every ANN method's pooled recall@k against the exact brute-force
    top-k (same queries, same corpus) must clear `floor` — the floor the
    pytest suite pins at fixed fixtures, now enforced on the driver's own
    data at the driver's own SF. Recall is |approx ∩ exact| / |exact|
    pooled over all (query, neighbor) pairs, the same measure as
    tests/test_dedup_similarity.py::test_ann_recall_floors."""
    truth = exact.select("query_id", "neighbor_id")
    n_truth = truth.count()
    if n_truth == 0:
        _fail("ann_recall", "exact brute-force top-k returned no rows")
    hit = (
        approx.select(method_col, "query_id", "neighbor_id")
        .join(truth, ["query_id", "neighbor_id"])
        .groupBy(method_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    got = {r[method_col]: r["n_hit"] for r in hit.collect()}  # ≤ |methods| rows
    for m in methods:
        recall = got.get(m, 0) / n_truth
        if recall < floor:
            _fail(
                "ann_recall",
                f"method {m!r} recall@k {recall:.3f} < floor {floor} "
                f"({got.get(m, 0)}/{n_truth} exact pairs recovered)",
            )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard machinery (dedup_near_pairs / _end_to_end)
# ---------------------------------------------------------------------------

def _distinct_grams(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, ngram) distinct word n-grams — the exact string shingle space
    the minhash signatures approximate (functions/text.py shingler; the
    gate never touches xxhash, so the hash family under test contributes
    nothing to its own ground truth)."""
    from f1_data_pipeline_spark.functions.text import positional_ngrams

    return (
        positional_ngrams(
            docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
            "id",
            "__t",
            n,
        )
        .select("id", "ngram")
        .distinct()
    )


def exact_jaccard_for_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """pairs (id_a, id_b) + `exact_j`: the exact n-gram-set Jaccard of each
    pair, computed from the raw strings. Work is bounded by the emitted
    pair set: grams are built only for docs appearing in a pair (semi-join)
    and the common-gram join fans out per (pair, shared gram), never
    corpus-wide. Pairs sharing zero grams get exact_j = 0.0."""
    member = (
        pairs.select(F.col("id_a").alias("id"))
        .unionAll(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sub = docs.select(F.col(id_col).alias("id"), F.col(text_col)).join(
        member, "id", "left_semi"
    )
    g = _distinct_grams(sub, "id", text_col, n)
    sizes = g.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    ga = g.select(F.col("id").alias("id_a"), "ngram")
    gb = g.select(F.col("id").alias("id_b"), "ngram")
    common = (
        pairs.select("id_a", "id_b")
        .join(ga, "id_a")
        .join(gb, ["id_b", "ngram"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__common"))
    )
    out = (
        pairs.join(common, ["id_a", "id_b"], "left")
        .join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("__sa")), "id_a", "left")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("__sb")), "id_b", "left")
    )
    c = F.coalesce(F.col("__common"), F.lit(0))
    denom = F.coalesce(F.col("__sa"), F.lit(0)) + F.coalesce(F.col("__sb"), F.lit(0)) - c
    return out.withColumn(
        "exact_j", F.when(denom > 0, c / denom).otherwise(F.lit(0.0))
    ).drop("__common", "__sa", "__sb")


def _sample_docs(docs: DataFrame, id_col: str, cap: int) -> DataFrame:
    """Deterministic doc subset of ≈cap rows: keep ids whose xxhash64 falls
    in 1/mod of the key space. Quadratic completeness sweeps run over this
    sample, so their cost is O(cap²) at ANY corpus size — the property that
    keeps the gate viable at 100 TB (the sample checks the machinery; the
    per-emitted-pair arm covers the full output)."""
    n = docs.count()
    mod = max(1, -(-n // cap))  # ceil
    if mod == 1:
        return docs
    return docs.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0)


def assert_minhash_pairs_gate(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_size: int = 3,
    lo_margin: float = 0.10,
    hi_margin: float = 0.25,
    sample_cap: int = 600,
) -> None:
    """Two exact-Jaccard arms over the minhash LSH output:

    - soundness (every emitted pair): exact n-gram Jaccard ≥ threshold −
      lo_margin. The estimate is a 64-draw binomial of J, so P(est ≥ t |
      J < t − 0.10) ≤ exp(−2·64·0.10²) ≈ 28% per borderline pair in
      general — but the seeded hash family is deterministic, and the
      margin exists for estimator variance, not for bugs: broken banding,
      swapped ids, or a corrupted shingle pipeline emit near-random pairs
      with exact J ≈ 0, far below any margin. (Measured on the driver's
      corpus: every emitted pair has exact J ≥ 0.888 at both oracle SFs.)
    - completeness (sampled all-pairs): every pair of sampled docs with
      exact J ≥ threshold + hi_margin must have been emitted. Banding
      math: P(miss | J) = (1 − J^rows)^bands; at J = 0.75 with 16 bands ×
      4 rows ≈ 0.3% and falling fast — genuinely-similar pairs that the
      operator misses are a machinery bug, not estimator noise.
    """
    lo = threshold - lo_margin
    ej = exact_jaccard_for_pairs(pairs, docs, id_col, text_col, shingle_size)
    bad = ej.filter(F.col("exact_j") < lo)
    sample_bad = bad.select("id_a", "id_b", "exact_j").limit(3).collect()
    if sample_bad:
        n_bad = bad.count()
        _fail(
            "minhash_soundness",
            f"{n_bad} emitted pair(s) have exact {shingle_size}-gram "
            f"Jaccard < {lo:.2f} (threshold {threshold} − margin "
            f"{lo_margin}); e.g. {[tuple(r) for r in sample_bad]}",
        )

    hi = threshold + hi_margin
    samp = _sample_docs(docs, id_col, sample_cap)
    g = _distinct_grams(samp, id_col, text_col, shingle_size)
    sizes = g.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    ga = g.select(F.col("id").alias("id_a"), "ngram")
    gb = g.select(F.col("id").alias("id_b"), "ngram")
    truth = (
        ga.join(gb, "ngram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__common"))
        .join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("__sa")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("__sb")), "id_b")
        .withColumn(
            "exact_j",
            F.col("__common")
            / (F.col("__sa") + F.col("__sb") - F.col("__common")),
        )
        .filter(F.col("exact_j") >= hi)
    )
    missed = truth.join(pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
    sample_missed = missed.select("id_a", "id_b", "exact_j").limit(3).collect()
    if sample_missed:
        n_missed = missed.count()
        _fail(
            "minhash_completeness",
            f"{n_missed} sampled pair(s) with exact Jaccard ≥ {hi:.2f} "
            f"were NOT emitted; e.g. {[tuple(r) for r in sample_missed]}",
        )


def assert_simhash_pairs_gate(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int,
    sample_cap: int = 300,
) -> None:
    """Simhash arm gates (hamming space, not Jaccard — a 64-bit simhash at
    hamming ≤ 10 legitimately pairs docs with near-zero n-gram overlap, so
    an exact-Jaccard floor would be the WRONG contract here):

    - soundness (every emitted pair): the carried `hamming` equals the
      true popcount of the two docs' signature XOR, recomputed from the
      raw text through an independent plan (one signature per doc, pair
      join — not the chunk-explode candidate machinery under test), and
      respects `max_hamming`. Catches swapped ids, chunk-join key bugs,
      and dedup errors; the signature expression itself is pytest-pinned.
    - completeness (sampled all-pairs, pigeonhole contract): any sampled
      pair with true hamming ≤ 3 MUST be emitted — with 4 × 16-bit chunk
      blocking, hamming ≤ 3 guarantees a shared chunk, so a miss is a
      blocking bug, not probability. (Pairs at hamming 4..max_hamming may
      legitimately be missed when differing bits spread across all four
      chunks — deliberately NOT gated.)
    """
    from f1_data_pipeline_spark.operators.dedup import simhash64

    sig = docs.select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sim")
    )
    joined = (
        pairs.select("id_a", "id_b", "hamming")
        .join(sig.select(F.col("id").alias("id_a"), F.col("sim").alias("__sa")), "id_a")
        .join(sig.select(F.col("id").alias("id_b"), F.col("sim").alias("__sb")), "id_b")
        .withColumn(
            "__true_h", F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
        )
    )
    bad = joined.filter(
        (F.col("hamming") != F.col("__true_h"))
        | (F.col("__true_h") > max_hamming)
    )
    sample_bad = bad.select("id_a", "id_b", "hamming", "__true_h").limit(3).collect()
    if sample_bad:
        _fail(
            "simhash_soundness",
            f"{bad.count()} emitted pair(s) carry a hamming that differs "
            f"from the recomputed signature distance or exceeds "
            f"{max_hamming}; e.g. {[tuple(r) for r in sample_bad]}",
        )

    samp_sig = _sample_docs(docs, id_col, sample_cap).select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sim")
    )
    # bounded all-pairs: ≤ cap² rows of two longs, broadcast the sample
    left = samp_sig.select(F.col("id").alias("id_a"), F.col("sim").alias("__sa"))
    right = samp_sig.select(F.col("id").alias("id_b"), F.col("sim").alias("__sb"))
    truth = (
        left.crossJoin(F.broadcast(right))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("__h", F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))))
        .filter(F.col("__h") <= 3)
    )
    missed = truth.join(pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
    sample_missed = missed.select("id_a", "id_b", "__h").limit(3).collect()
    if sample_missed:
        _fail(
            "simhash_completeness",
            f"{missed.count()} sampled pair(s) at hamming ≤ 3 (the "
            f"pigeonhole guarantee) were NOT emitted; e.g. "
            f"{[tuple(r) for r in sample_missed]}",
        )


# ---------------------------------------------------------------------------
# duplicate-cluster dedup invariants (dedup_near_end_to_end, semantic_dedup)
# ---------------------------------------------------------------------------

def assert_cluster_dedup_gate(
    all_rows: DataFrame, kept: DataFrame, pairs: DataFrame, id_col: str
) -> None:
    """Exact invariants of keep-one-per-duplicate-component dedup, given
    the detector's pair set as ground truth:

    - no emitted pair survives whole: a pair with BOTH endpoints kept
      means two duplicates shipped (broken component labels or a wrong
      anti-join direction);
    - no orphan drops: every dropped row appears in ≥ 1 pair — dedup may
      only remove rows the detector actually implicated;
    - partition: kept ∪ dropped = all rows (no row invented or lost).
    """
    ids_all = all_rows.select(F.col(id_col).alias("id"))
    ids_kept = kept.select(F.col(id_col).alias("id"))
    n_all, n_kept = ids_all.count(), ids_kept.count()

    ka = ids_kept.select(F.col("id").alias("id_a"))
    kb = ids_kept.select(F.col("id").alias("id_b"))
    both = pairs.select("id_a", "id_b").join(ka, "id_a", "left_semi").join(
        kb, "id_b", "left_semi"
    )
    sample_both = both.limit(3).collect()
    if sample_both:
        _fail(
            "cluster_dedup_both_kept",
            f"{both.count()} detector pair(s) have BOTH endpoints kept — "
            f"duplicates shipped; e.g. {[tuple(r) for r in sample_both]}",
        )

    dropped = ids_all.join(ids_kept, "id", "left_anti")
    endpoints = (
        pairs.select(F.col("id_a").alias("id"))
        .unionAll(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    orphan = dropped.join(endpoints, "id", "left_anti")
    sample_orphan = orphan.limit(3).collect()
    if sample_orphan:
        _fail(
            "cluster_dedup_orphan_drop",
            f"{orphan.count()} row(s) were dropped without appearing in "
            f"any detector pair; e.g. {[r.id for r in sample_orphan]}",
        )

    extra = ids_kept.join(ids_all, "id", "left_anti").count()
    if extra:
        _fail(
            "cluster_dedup_partition",
            f"{extra} kept id(s) do not exist in the input "
            f"({n_kept} kept of {n_all})",
        )


def assert_semantic_pair_cosines(
    pairs_with_vecs: DataFrame,
    threshold: float,
    tol: float = 2e-4,
) -> None:
    """Independent numpy recompute of every emitted near-dup pair's cosine
    (float64 dot/norms over the raw vectors — a different arithmetic path
    from the JVM higher-order-function dot product): the recomputed value
    must match the carried `cos_sim` (rounded to 4 decimals upstream) and
    clear the dedup threshold. Columns: vec_a, vec_b, cos_sim."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NB: no pd.Series annotations on the kernel — this module has
    # `from __future__ import annotations`, which turns them into strings
    # that pandas_udf's signature inference rejects
    @pandas_udf("double")
    def _np_cos(va, vb):
        import numpy as np

        out = []
        for a, b in zip(va, vb):
            x = np.asarray(a, dtype=np.float64)
            y = np.asarray(b, dtype=np.float64)
            nx, ny = np.linalg.norm(x), np.linalg.norm(y)
            out.append(float(x @ y / (nx * ny)) if nx and ny else 0.0)
        return pd.Series(out)

    checked = pairs_with_vecs.withColumn(
        "__np_cos", _np_cos(F.col("vec_a"), F.col("vec_b"))
    )
    bad = checked.filter(
        (F.abs(F.col("__np_cos") - F.col("cos_sim")) > tol)
        | (F.col("__np_cos") < threshold - tol)
    )
    sample_bad = bad.select("cos_sim", "__np_cos").limit(3).collect()
    if sample_bad:
        _fail(
            "semantic_pair_cosine",
            f"{bad.count()} emitted pair(s) fail the independent cosine "
            f"recompute (tol {tol}, threshold {threshold}); e.g. "
            f"{[tuple(r) for r in sample_bad]}",
        )


# ---------------------------------------------------------------------------
# sketch error bounds (approx_sketches)
# ---------------------------------------------------------------------------

def assert_sketch_bounds(
    returned: DataFrame,
    events: DataFrame,
    hll_rel_bound: float = 0.15,
    pct_rank_window: float = 0.02,
) -> None:
    """The RETURNED sketch values (not a recompute) must sit within their
    documented error envelopes of the exact aggregates:

    - approx_users per event_type: HyperLogLog++ at Spark's default
      rsd = 0.05 → |approx − exact| / exact ≤ 0.15 (3× the target rsd;
      measured ≤ 0.067 on the driver's data at every SF);
    - p50 / p99: approx_percentile(accuracy=10000) guarantees rank error
      ≤ 1e-4, and it returns an actual element, while exact `percentile`
      interpolates — so the gate brackets each approx value between the
      exact interpolated percentiles at q ± `pct_rank_window`;
    - sum_daily_approx_users: within hll_rel_bound of the exact
      sum-of-daily-distincts.
    """
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("__exact_users"),
        F.expr("percentile(value, 0.48)").alias("__p50_lo"),
        F.expr("percentile(value, 0.52)").alias("__p50_hi"),
        F.expr("percentile(value, 0.97)").alias("__p99_lo"),
        F.expr("percentile(value, 1.0)").alias("__p99_hi"),
    )
    j = returned.join(exact, "event_type")
    bad = j.filter(
        (
            F.abs(F.col("approx_users") - F.col("__exact_users"))
            / F.col("__exact_users")
            > hll_rel_bound
        )
        | (F.col("p50") < F.col("__p50_lo"))
        | (F.col("p50") > F.col("__p50_hi"))
        | (F.col("p99") < F.col("__p99_lo"))
        | (F.col("p99") > F.col("__p99_hi"))
    )
    sample_bad = bad.select(
        "event_type", "approx_users", "__exact_users", "p50", "__p50_lo",
        "__p50_hi", "p99", "__p99_lo", "__p99_hi"
    ).limit(3).collect()
    if sample_bad:
        _fail(
            "sketch_bounds",
            "returned sketch estimates fall outside their documented "
            f"error envelopes: {[r.asDict() for r in sample_bad]}",
        )

    # daily-HLL sum: one exact number vs the one carried on every row
    exact_daily = (
        events.select(F.window("ts", "1 day").alias("__w"), "user_id")
        .groupBy("__w")
        .agg(F.count_distinct("user_id").alias("__n"))
        .agg(F.sum("__n").alias("__exact_sum"))
        .collect()[0]["__exact_sum"]
    )
    carried = returned.select("sum_daily_approx_users").limit(1).collect()
    if carried:
        got = carried[0]["sum_daily_approx_users"]
        if exact_daily and abs(got - exact_daily) / exact_daily > hll_rel_bound:
            _fail(
                "sketch_daily_sum",
                f"sum of daily HLL distincts {got} deviates more than "
                f"{hll_rel_bound:.0%} from exact {exact_daily}",
            )


# ---------------------------------------------------------------------------
# multimodal codec ground truth (multimodal_features)
# ---------------------------------------------------------------------------

def assert_codec_parity(spark) -> None:
    """Decode ground truth through the REAL Spark feature path: encode one
    KNOWN pixel array as PNG (zlib + filters), BMP (padded BGR scanlines),
    and PPM (raw) — three disjoint decode implementations — run all three
    through `extract_features(fake=False)` (Arrow-batched mapInPandas, the
    exact path the registry key uses), and require every feature vector to
    equal `_grid_features` of the source pixels. A WAV tone goes through
    the same path and must match features computed from an independent
    numpy RIFF parse (stdlib `wave` never touched) with the windowed
    RMS/ZCR math reimplemented inline. This is the PIL-parity gate the
    container supports without PIL: same-pixels-same-features across every
    decoder that exists here."""
    import numpy as np

    from f1_data_pipeline_spark.operators.multimodal import (
        FEATURE_DIM,
        MEDIA_SCHEMA,
        _grid_features,
        encode_bmp,
        encode_png,
        extract_features,
        synthesize_wav,
    )

    rows, expected = [], {}
    for i, (w, h, seed) in enumerate([(16, 12, 0), (9, 7, 3), (24, 18, 7)]):
        px = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8
        )
        feats = _grid_features(px, FEATURE_DIM)
        ppm = f"P6\n{w} {h}\n255\n".encode() + px.tobytes()
        for j, payload in enumerate((encode_png(px), encode_bmp(px), ppm)):
            rows.append((i * 10 + j, bytearray(payload), "image", None))
            expected[i * 10 + j] = feats

    # audio: independent RIFF parse (byte offsets, not the wave module)
    wav = synthesize_wav(freq_hz=330.0, duration_ms=120)
    data_at = wav.index(b"data") + 8
    x = np.frombuffer(wav[data_at:], dtype="<i2").astype(np.float32) / 32768.0
    half = FEATURE_DIM // 2
    win = -(-x.size // half)
    xp = np.pad(x, (0, win * half - x.size))
    seg = xp.reshape(half, win)
    rms = np.sqrt((seg.astype(np.float64) ** 2).mean(axis=1))
    zcr = np.abs(np.diff(np.signbit(seg), axis=1)).sum(axis=1) / win
    feats = np.concatenate([rms, zcr])
    feats = feats / (float(np.linalg.norm(feats)) or 1.0)
    rows.append((99, bytearray(wav), "audio", None))
    expected[99] = [float(v) for v in feats.astype(np.float32)]

    assets = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["asset_id"]: r["features"]
        for r in extract_features(assets, fake=False).collect()  # 10 rows
    }
    for aid, want in expected.items():
        have = got.get(aid)
        if have is None or len(have) != len(want):
            _fail(
                "codec_parity",
                f"asset {aid}: feature vector missing or wrong length "
                f"({None if have is None else len(have)} vs {len(want)})",
            )
        err = max(abs(a - b) for a, b in zip(have, want))
        if err > 1e-6:
            _fail(
                "codec_parity",
                f"asset {aid}: decoded features deviate from the "
                f"ground-truth pixels/waveform by {err:.2e} (tol 1e-6) — "
                "a decoder (PNG/BMP/PPM/WAV) disagrees with the source",
            )


def assert_unit_norm_features(
    feats: DataFrame, dim: int, norm_col: str = "sq_norm", dim_col: str = "dim"
) -> None:
    """Every returned feature row must carry the declared dimension and an
    (approximately) unit squared norm — the contract of all extractors
    (fake and codec arms both L2-normalize). One aggregation, one row."""
    r = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(norm_col).alias("lo"),
        F.max(norm_col).alias("hi"),
        F.min(dim_col).alias("dlo"),
        F.max(dim_col).alias("dhi"),
    ).collect()[0]
    if r["n"] == 0:
        _fail("unit_norm", "feature pipeline returned no rows")
    if r["dlo"] != dim or r["dhi"] != dim:
        _fail(
            "unit_norm",
            f"feature dimension drifted: min {r['dlo']} / max {r['dhi']} "
            f"vs declared {dim}",
        )
    if r["lo"] < 0.99 or r["hi"] > 1.01:
        _fail(
            "unit_norm",
            f"squared norms outside [0.99, 1.01]: min {r['lo']}, "
            f"max {r['hi']} — an extractor stopped L2-normalizing",
        )
