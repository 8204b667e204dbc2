"""Corpus-preparation operators: deterministic split, PII redaction,
contamination, sequence packing (operators/corpus.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from f1_data_pipeline_spark.operators import corpus as C


# --- train/test split ----------------------------------------------------------


def test_split_deterministic_and_partitioning_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = C.train_test_split(df, "doc_id").select("doc_id", "split")
    b = C.train_test_split(df.repartition(13), "doc_id").select("doc_id", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_split_fraction_near_nominal(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = C.train_test_split(df, "doc_id")
    frac = out.filter(F.col("split") == "train").count() / 2000
    # nominal 230/256 = 0.898; md5 buckets are uniform so ±3% at n=2000
    assert 0.86 < frac < 0.93
    buckets = out.agg(F.min("bucket"), F.max("bucket")).first()
    assert buckets[0] >= 0 and buckets[1] <= 255


# --- PII redaction -------------------------------------------------------------


def test_pii_redact_counts_and_text(spark):
    rows = [
        (1, "reach me at alice.smith+spam@mail.example.org today"),
        (2, "call 415-555-0199 or 650-555-0100 now"),
        (3, "bob@corp.io and 212-555-0177 both here"),
        (4, "no pii in this one"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in C.pii_redact(df, "text").collect()}
    assert out[1]["redacted"] == "reach me at <EMAIL> today"
    assert (out[1]["n_emails"], out[1]["n_phones"]) == (1, 0)
    assert out[2]["redacted"] == "call <PHONE> or <PHONE> now"
    assert (out[2]["n_emails"], out[2]["n_phones"]) == (0, 2)
    assert out[3]["redacted"] == "<EMAIL> and <PHONE> both here"
    assert out[4]["redacted"] == "no pii in this one"
    assert (out[4]["n_emails"], out[4]["n_phones"]) == (0, 0)


# --- contamination -------------------------------------------------------------


def test_contamination_flags_copied_eval_text(spark):
    bench = "the quick brown fox jumps over the lazy dog tonight"
    corpus_rows = [
        # doc 10 embeds the benchmark verbatim → every benchmark 5-gram hits
        (10, "prefix words " + bench + " suffix words"),
        # doc 11 shares no 5-gram with the benchmark
        (11, "completely unrelated text about spark partitions and shuffles ok"),
        # doc 12 shares exactly one 5-gram window
        (12, "xx the quick brown fox jumps yy zz ww vv uu"),
    ]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    eval_df = spark.createDataFrame([(99, bench)], ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in C.contamination(corpus, eval_df, n=5, min_score=0.2).collect()
    }
    assert 11 not in out  # no shared gram → no row
    assert out[10]["n_matched"] == 6 and out[10]["contaminated"]
    assert out[12]["n_matched"] == 1
    assert out[12]["n_grams"] == 7  # 11 tokens → 7 five-gram windows
    assert out[12]["score"] == pytest.approx(1 / 7, abs=1e-4)


def test_contamination_no_false_positives_on_disjoint_sets(spark):
    corpus = spark.createDataFrame(
        [(i, f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}") for i in range(20)],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame([(0, "one two three four five six")], ["doc_id", "text"])
    assert C.contamination(corpus, eval_df, n=5).count() == 0


# --- sequence packing ----------------------------------------------------------


def test_pack_sequences_exact_layout(spark):
    # one shard (n_shards=1), budget 10 tokens: docs of 4/4/4 tokens →
    # cum-before = 0,4,8 → packs 0,0,0; fourth doc (cum-before 12) → pack 1
    rows = [(i, "t t t t") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = C.pack_sequences(df, max_tokens=10, n_shards=1).orderBy("pack_id").collect()
    assert [(r["pack_id"], r["n_docs"], r["pack_tokens"]) for r in out] == [
        (0, 3, 12),
        (1, 1, 4),
    ]
    assert out[0]["first_doc"] == 0 and out[0]["last_doc"] == 2


def test_pack_sequences_conserves_tokens_and_bounds_packs(spark, sf_dir):
    from f1_data_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    packed = C.pack_sequences(docs, max_tokens=2048, n_shards=8)
    total_packed = packed.agg(F.sum("pack_tokens")).first()[0]
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).first()[0]
    assert total_packed == total_tokens
    # every pack except possibly each shard's last is filled past the budget's
    # start (a new pack only opens when the previous crossed max_tokens)
    per_shard_max = {
        r["shard"]: r["mx"]
        for r in packed.groupBy("shard").agg(F.max("pack_id").alias("mx")).collect()
    }
    for r in packed.collect():
        if r["pack_id"] < per_shard_max[r["shard"]]:
            assert r["pack_tokens"] >= 2048 - 200  # docs are ≤ ~200 tokens


# --- stratified sampling --------------------------------------------------------


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(4000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = C.stratified_sample(df, "lang", "doc_id", {"en": 128, "zh": 256})
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["zh"] == 2000  # 256/256 keeps every row
    assert 0.44 < by_lang["en"] / 2000 < 0.56  # nominal 50%, md5-uniform
    # deterministic and partitioning-invariant membership
    again = C.stratified_sample(
        df.repartition(7), "lang", "doc_id", {"en": 128, "zh": 256}
    )
    assert out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0
    assert again.select("doc_id").exceptAll(out.select("doc_id")).count() == 0


def test_stratified_sample_membership_stable_under_corpus_growth(spark):
    """A doc's sample membership depends only on its own id — growing the
    corpus must not flip existing rows (the property RNG sampling lacks)."""
    small = spark.createDataFrame([(i, "en") for i in range(500)], ["doc_id", "lang"])
    big = spark.createDataFrame([(i, "en") for i in range(5000)], ["doc_id", "lang"])
    kept_small = {
        r["doc_id"]
        for r in C.stratified_sample(small, "lang", "doc_id", {"en": 64}).collect()
    }
    kept_big = {
        r["doc_id"]
        for r in C.stratified_sample(big, "lang", "doc_id", {"en": 64}).collect()
    }
    assert kept_small == {d for d in kept_big if d < 500}


def test_stratified_sample_independent_of_split_bucket(spark):
    """The sample hash is salted: membership must not equal the train/test
    bucket (an unsalted hash would make 'sample 50%' ≡ 'train half')."""
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id").withColumn(
        "lang", F.lit("en")
    )
    sample = C.stratified_sample(df, "lang", "doc_id", {"en": 128})
    split = C.train_test_split(df, "doc_id")
    joined = sample.join(split.select("doc_id", "split"), "doc_id")
    n_train = joined.filter(F.col("split") == "train").count()
    # if buckets were shared, the 50% sample would be ~100% train-bucket rows
    # (128 < 230); salted, it tracks the 90/10 split mix instead
    assert n_train / sample.count() < 0.95


# --- TF-IDF top terms -----------------------------------------------------------


def test_tfidf_ranks_characteristic_terms_first(spark):
    rows = [
        (0, "common common common unique_zero"),
        (1, "common common unique_one unique_one"),
        (2, "common unique_two"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = C.tfidf_top_terms(df, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'common' appears in all 3 docs → lowest idf; each doc's unique term wins
    assert top == {0: "unique_zero", 1: "unique_one", 2: "unique_two"}


def test_tfidf_plan_no_cartesian_and_k_bound(spark, sf_dir):
    from f1_data_pipeline_spark.plans import audit
    from f1_data_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = C.tfidf_top_terms(docs, k=5)
    js = audit.join_strategies(out)
    assert js["cartesian"] == 0  # the N-docs scalar joins as a 1-row broadcast
    per_doc = out.groupBy("doc_id").count().agg(F.max("count")).first()[0]
    assert per_doc <= 5


def test_cap_per_group_caps_and_is_deterministic(spark):
    rows = [(i, "big" if i < 900 else f"s{i % 7}") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = C.cap_per_group(df, "source", "doc_id", k=50)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["big"] == 50  # dominant source capped
    for s, n in by_src.items():
        if s != "big":
            assert n <= 50  # small sources keep everything they have
    again = C.cap_per_group(df.repartition(9), "source", "doc_id", k=50)
    assert out.select("doc_id").exceptAll(again.select("doc_id")).count() == 0


def test_cap_per_group_unbiased_by_id_order(spark):
    """Hash-ranked, not id-ranked: the kept set must not be the first k ids
    (an id-ordered cap would bias toward whatever arrived first)."""
    df = spark.createDataFrame(
        [(i, "only") for i in range(200)], ["doc_id", "source"]
    )
    kept = {r["doc_id"] for r in C.cap_per_group(df, "source", "doc_id", k=20).collect()}
    assert kept != set(range(20))


def test_unigram_logprob_golden_and_ranks_outliers(spark):
    """Exact hand-computed golden for the add-k unigram LM, and the
    quality-filter property: a line-noise doc scores far below docs made
    of corpus-typical tokens."""
    import math

    from f1_data_pipeline_spark.operators.corpus import unigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "aa aa bb"),
            (2, "aa bb"),
            (3, "zz"),  # singleton token → corpus outlier
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unigram_logprob(docs, smoothing_k=0.5).collect()}
    # corpus: aa=3, bb=2, zz=1, total=6, vocab=3 → denom = 6 + 0.5*3 = 7.5
    lp = {t: math.log((c + 0.5) / 7.5) for t, c in (("aa", 3), ("bb", 2), ("zz", 1))}
    assert out[1]["n_tokens"] == 3
    assert out[1]["mean_logprob"] == round((2 * lp["aa"] + lp["bb"]) / 3, 6)
    assert out[2]["mean_logprob"] == round((lp["aa"] + lp["bb"]) / 2, 6)
    assert out[3]["mean_logprob"] == round(lp["zz"], 6)
    assert out[3]["mean_logprob"] < out[1]["mean_logprob"]  # outlier ranks lowest


# --- mixture sampling -----------------------------------------------------------


def _mix_manual(rows, weights, scale=1.0):
    """Reference recomputation of mixture_sample membership in plain
    python (same md5-bucket arithmetic)."""
    import hashlib
    import math

    dmass = {}
    for _id, dom, mass in rows:
        dmass[dom] = dmass.get(dom, 0) + mass
    wsum = sum(weights.values())
    wn = {k: v / wsum for k, v in weights.items()}
    pool = sum(m for d, m in dmass.items() if d in wn)
    out = set()
    for _id, dom, mass in rows:
        if dom not in wn or dmass[dom] == 0:
            continue
        rate = wn[dom] * float(pool) * scale / float(dmass[dom])
        nrep = math.floor(rate)
        b = int(hashlib.md5(f"mix:{_id}".encode()).hexdigest()[:2], 16)
        for epoch in range(nrep + 1):
            if epoch < nrep or b < (rate - nrep) * 256.0:
                out.add((_id, epoch))
    return out


def test_mixture_sample_exact_epochs_and_fractions(spark):
    """Output == the hand-computed reference: scarce domains replicate
    with epoch ids, abundant ones hash-downsample, unweighted ones drop."""
    rows = (
        [(i, "web", 10) for i in range(100)]        # 1000 mass
        + [(100 + i, "code", 10) for i in range(20)]  # 200 mass
        + [(200 + i, "junk", 10) for i in range(50)]  # unweighted
    )
    df = spark.createDataFrame(rows, "doc_id long, dom string, toks long").repartition(5)
    weights = {"web": 0.5, "code": 0.5}
    got = {
        (r["doc_id"], r["epoch"])
        for r in C.mixture_sample(
            df, "dom", weights, "doc_id", mass_col=F.col("toks")
        ).collect()
    }
    want = _mix_manual([(i, d, m) for i, d, m in rows], weights)
    assert got == want
    # code (200 mass, target 600) runs 3 full epochs; web downsamples
    assert {e for i, e in got if i >= 100 and i < 200} == {0, 1, 2}
    assert all(e == 0 for i, e in got if i < 100)
    assert not any(i >= 200 for i, _ in got)  # junk dropped
    # repartitioning never changes membership
    got2 = {
        (r["doc_id"], r["epoch"])
        for r in C.mixture_sample(
            df.repartition(13), "dom", weights, "doc_id", mass_col=F.col("toks")
        ).collect()
    }
    assert got2 == got


def test_mixture_sample_hits_target_shares(spark):
    """Achieved token shares land within hash granularity of the target."""
    import random

    rng = random.Random(3)
    rows = []
    i = 0
    for dom, n in (("web", 3000), ("code", 600), ("books", 400)):
        for _ in range(n):
            rows.append((i, dom, rng.randint(5, 50)))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, dom string, toks long")
    weights = {"web": 0.5, "code": 0.25, "books": 0.25}
    out = C.mixture_sample(df, "dom", weights, "doc_id", mass_col=F.col("toks"))
    shares = {
        r["dom"]: r["m"]
        for r in out.groupBy("dom").agg(F.sum("toks").alias("m")).collect()
    }
    total = sum(shares.values())
    for dom, w in weights.items():
        assert abs(shares[dom] / total - w) < 0.02, (dom, shares)


def test_mixture_sample_guards(spark):
    df = spark.createDataFrame([(1, "a", 1000), (2, "b", 1)], "doc_id long, dom string, toks long")
    with pytest.raises(ValueError, match="at least one"):
        C.mixture_sample(df, "dom", {}, "doc_id")
    with pytest.raises(ValueError, match="positive"):
        C.mixture_sample(df, "dom", {"a": -1.0}, "doc_id")
    # b has 1/1001 of the mass but a 50% target → rate ~500 > max_epochs
    with pytest.raises(ValueError, match="max_epochs"):
        C.mixture_sample(
            df, "dom", {"a": 0.5, "b": 0.5}, "doc_id",
            mass_col=F.col("toks"), max_epochs=100,
        )


def test_compression_signals_bands_and_edges(spark):
    """The deflate heuristic separates the three regimes: repetitive
    boilerplate compresses to a tiny fraction, natural-ish prose lands in
    the keep band, incompressible noise approaches (or exceeds) 1.0.
    NULL/empty text yields NULL ratio (routable, not silently kept),
    and the computation matches a driver-side zlib reference exactly."""
    import base64
    import random
    import zlib

    from f1_data_pipeline_spark.operators.corpus import compression_signals

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(5000)]
    prose = " ".join(rng.choice(vocab) for _ in range(400))
    boiler = "click here to subscribe " * 100
    noise = base64.b64encode(rng.randbytes(3000)).decode()
    rows = [(1, prose), (2, boiler), (3, noise), (4, None), (5, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_signals(df).collect()}

    for i, t in rows:
        if not t:
            assert got[i]["zlib_ratio"] is None
            assert got[i]["keep_compression"] is None
        else:
            raw = t.encode("utf-8", "ignore")
            assert got[i]["zlib_ratio"] == round(
                len(zlib.compress(raw, 6)) / len(raw), 4
            )
    assert got[2]["zlib_ratio"] < 0.1 and got[2]["keep_compression"] is False
    assert got[3]["zlib_ratio"] > 0.7 and got[3]["keep_compression"] is False
    assert 0.1 <= got[1]["zlib_ratio"] <= 0.7
    assert got[1]["keep_compression"] is True


def test_chunk_documents_invariants(spark):
    """Coverage, overlap exactness, pass-through, empty-doc drop, and
    reconstruction: dropping each chunk's leading `overlap` tokens
    (except chunk 0) and concatenating rebuilds the document exactly."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(1000))),   # 3 chunks
            (2, " ".join(f"s{i}" for i in range(512))),    # exactly max
            (3, " ".join(f"u{i}" for i in range(513))),    # one over
            (4, "short doc"),                               # under overlap
            (5, "   "),                                     # whitespace-only
            (6, None),                                      # null
        ],
        "doc_id long, text string",
    )
    out = C.chunk_documents(docs, max_tokens=512, overlap=64)
    rows = sorted(
        out.collect(), key=lambda r: (r["doc_id"], r["chunk_index"])
    )
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2, 3, 4}  # 5 and 6 yield nothing
    assert [len(by_doc[d]) for d in (1, 2, 3, 4)] == [3, 1, 2, 1]
    for d, chunks in by_doc.items():
        assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))
        assert all(c["n_chunks"] == len(chunks) for c in chunks)
        # consecutive chunks share exactly `overlap` tokens
        for a, b in zip(chunks, chunks[1:]):
            ta, tb = a["chunk_text"].split(), b["chunk_text"].split()
            assert ta[-64:] == tb[:64]
            assert len(tb) > 64  # every chunk carries NEW tokens
        # de-overlapped concatenation reconstructs the document
        rebuilt = chunks[0]["chunk_text"].split()
        for c in chunks[1:]:
            rebuilt += c["chunk_text"].split()[64:]
        orig = [
            r["text"] for r in docs.filter(F.col("doc_id") == d).collect()
        ][0].split()
        assert rebuilt == orig
    # exact-max doc passes through as one chunk of itself
    [two] = by_doc[2]
    assert two["chunk_tokens"] == 512
    assert two["chunk_text"].split()[0] == "s0"
    # one-over doc: second chunk = 64 overlap + 1 new token
    assert by_doc[3][1]["chunk_tokens"] == 65


def test_chunk_documents_guards_and_plan(spark):
    with pytest.raises(ValueError, match="stride"):
        C.chunk_documents(spark.range(1).selectExpr(
            "id AS doc_id", "'x' AS text"), max_tokens=64, overlap=64)
    # no shuffle: chunking is per-row derivation only
    df = C.chunk_documents(
        spark.createDataFrame([(1, "a b c")], "doc_id long, text string"),
        max_tokens=2, overlap=1,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["chunk_index"]: r["chunk_text"] for r in df.collect()}
    assert got == {0: "a b", 1: "b c"}


def test_chunk_then_pack_composition(spark):
    """The docstring's chain: long docs chunk down to the window, then
    chunks pack up to it — every pack respects the budget and every
    chunk lands exactly once."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"d{i}t{j}" for j in range(50 + 37 * i)))
         for i in range(8)],
        "doc_id long, text string",
    )
    chunks = C.chunk_documents(docs, max_tokens=64, overlap=8)
    # synthetic per-chunk id preserving (doc, position) order
    packable = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_index")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    packs = C.pack_sequences(packable, max_tokens=128, n_shards=2)
    rows = packs.collect()
    assert sum(r["n_docs"] for r in rows) == chunks.count()
    # a chunk is ≤ 64 tokens and the pack budget is 128: a pack whose
    # RUNNING TOTAL opened under the budget never exceeds budget + one
    # chunk; utilization is positive everywhere
    assert all(0 < r["pack_tokens"] <= 128 + 64 for r in rows)
    assert all(r["utilization"] > 0 for r in rows)
