"""Property-based tests (hypothesis) for the operators whose correctness
rests on a non-obvious argument.

The prefix-filter lemma in token_jaccard_pairs (dedup.py) is the main
target: a subtle off-by-one in prefix length or a float boundary in the
length filter silently loses pairs — exactly the bug class a random corpus
shakes out. Oracle: a brute-force all-pairs Jaccard in plain Python.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from f1_data_pipeline_spark.functions.scalars import laptime_to_ms
from f1_data_pipeline_spark.operators import dedup

import pyspark.sql.functions as F

WORDS = [f"w{i}" for i in range(12)]  # small vocab → dense overlap


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(2, 8))
    docs = []
    for i in range(n_docs):
        toks = draw(st.lists(st.sampled_from(WORDS), min_size=1, max_size=10))
        docs.append((i, " ".join(toks)))
    return docs


def brute_force_jaccard(docs, threshold):
    sets = {i: set(t.split()) for i, t in docs}
    out = set()
    for a in sets:
        for b in sets:
            if a < b:
                s = len(sets[a] & sets[b])
                u = len(sets[a] | sets[b])
                jac = round(s / u, 4)
                if jac >= threshold:
                    out.add((a, b, jac))
    return out


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpora(), threshold=st.sampled_from([0.3, 0.5, 0.8, 0.9, 1.0]))
def test_prefix_filtered_jaccard_is_exact(spark, docs, threshold):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.token_jaccard_pairs(df, "doc_id", "text", threshold).collect()
    }
    assert got == brute_force_jaccard(docs, threshold)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    minutes=st.integers(0, 59),
    seconds=st.integers(0, 59),
    millis=st.integers(0, 999),
)
def test_laptime_roundtrip(spark, minutes, seconds, millis):
    s = f"{minutes}:{seconds:02d}.{millis:03d}"
    expected = (minutes * 60 + seconds) * 1000 + millis
    row = spark.createDataFrame([(s,)], "t string").select(
        laptime_to_ms("t").alias("ms")
    ).collect()[0]
    assert row["ms"] == expected


@pytest.mark.parametrize("bad", [None, "", "garbage", "1:2:3:4", ":."])
def test_laptime_malformed_null(spark, bad):
    row = spark.createDataFrame([(bad,)], "t string").select(
        laptime_to_ms("t").alias("ms")
    ).collect()[0]
    assert row["ms"] is None


# --- corpus ops: contamination exactness, packing conservation ------------------

def brute_force_contamination(corpus, eval_docs, n, min_score):
    def grams(t):
        toks = t.split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    pool = set()
    for _, t in eval_docs:
        pool |= grams(t)
    out = {}
    for i, t in corpus:
        g = grams(t)
        m = len(g & pool)
        if m:
            score = round(m / len(g), 4)
            out[i] = (len(g), m, score, score >= min_score)
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpora(), n=st.sampled_from([2, 3]))
def test_contamination_matches_brute_force(spark, docs, n):
    from f1_data_pipeline_spark.operators import corpus as C

    eval_docs, corpus_docs = docs[:1], docs[1:]
    df_c = spark.createDataFrame(corpus_docs, "doc_id long, text string")
    df_e = spark.createDataFrame(eval_docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_matched"], r["score"], r["contaminated"])
        for r in C.contamination(df_c, df_e, n=n, min_score=0.5).collect()
    }
    assert got == brute_force_contamination(corpus_docs, eval_docs, n, 0.5)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(st.integers(0, 40), min_size=1, max_size=30),
    max_tokens=st.sampled_from([16, 32]),
)
def test_packing_conserves_and_orders(spark, counts, max_tokens):
    """Every token lands in exactly one pack; pack ids are dense from 0 in
    doc order; a pack closes only once the budget is crossed."""
    from f1_data_pipeline_spark.operators import corpus as C

    rows = [(i, " ".join(["t"] * c)) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = C.pack_sequences(df, max_tokens=max_tokens, n_shards=1).collect()
    assert sum(r["pack_tokens"] for r in out) == sum(counts)
    # replay the greedy rule in python
    expected = {}
    cum = 0
    for i, c in enumerate(counts):
        pack = (cum) // max_tokens
        expected.setdefault(pack, 0)
        expected[pack] += c
        cum += c
    got = {r["pack_id"]: r["pack_tokens"] for r in out}
    assert got == expected


# --- duplicate_spans exactness --------------------------------------------------


def brute_force_spans(docs, n, min_docs=2):
    """Reference implementation: per-position n-grams, cross-doc duplicated
    grams, merge hits with gap <= n into (start, end) spans."""
    grams = {}  # gram -> set(doc)
    pos_grams = {}  # doc -> [(pos, gram)]
    for i, t in docs:
        toks = t.split()
        pg = [(p, tuple(toks[p : p + n])) for p in range(len(toks) - n + 1)]
        pos_grams[i] = pg
        for _, g in pg:
            grams.setdefault(g, set()).add(i)
    dup = {g for g, ds in grams.items() if len(ds) >= min_docs}
    out = set()
    for i, pg in pos_grams.items():
        hits = sorted(p for p, g in pg if g in dup)
        while hits:
            start = prev = hits.pop(0)
            count = 1
            while hits and hits[0] - prev <= n:
                prev = hits.pop(0)
                count += 1
            out.add((i, start, prev + n - 1, count))
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpora(), n=st.sampled_from([2, 3, 4]))
def test_duplicate_spans_matches_brute_force(spark, docs, n):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_grams"])
        for r in dedup.duplicate_spans(df, "doc_id", "text", n=n).collect()
    }
    assert got == brute_force_spans(docs, n)


# --- tfidf exactness ------------------------------------------------------------


def brute_force_tfidf_topk(docs, k):
    from collections import Counter

    tfs = {i: Counter(t.split()) for i, t in docs}
    tfs = {i: c for i, c in tfs.items() if c}
    n_docs = len(tfs)
    dfreq = Counter()
    for c in tfs.values():
        for term in c:
            dfreq[term] += 1
    out = set()
    for i, c in tfs.items():
        doc_len = sum(c.values())
        scored = sorted(
            (
                (
                    -(tf / doc_len) * ((n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5)),
                    t,
                )
                for t, tf in c.items()
            ),
        )
        for rank, (neg, t) in enumerate(scored[:k], start=1):
            out.add((i, t, rank, round(-neg, 6)))
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpora(), k=st.sampled_from([1, 3]))
def test_tfidf_topk_matches_brute_force(spark, docs, k):
    from f1_data_pipeline_spark.operators.corpus import tfidf_top_terms

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["term"], r["rank"], r["tfidf"])
        for r in tfidf_top_terms(df, "doc_id", "text", k=k).collect()
    }
    assert got == brute_force_tfidf_topk(docs, k)


@settings(max_examples=40, deadline=None)
@given(
    freq=st.floats(min_value=20.0, max_value=7000.0),
    duration_ms=st.integers(min_value=1, max_value=500),
    sample_rate=st.sampled_from([8000, 16000, 44100]),
    amplitude=st.floats(min_value=0.0, max_value=0.99),
)
def test_wav_synth_decode_roundtrip_invariants(freq, duration_ms, sample_rate, amplitude):
    """Property: the stdlib WAV codec roundtrip preserves sample rate,
    frame count, and peak amplitude (to PCM16 quantization) for ANY tone
    parameters — no Spark needed, pure codec contract."""
    import numpy as np

    from f1_data_pipeline_spark.operators import multimodal as M

    payload = M.synthesize_wav(
        freq_hz=freq,
        duration_ms=duration_ms,
        sample_rate=sample_rate,
        amplitude=amplitude,
    )
    sr, x = M.decode_wav(payload)
    assert sr == sample_rate
    assert x.size == int(sample_rate * duration_ms / 1000)
    if x.size:
        # peak can't exceed the requested amplitude (+1 LSB of PCM16)
        assert float(np.abs(x).max()) <= amplitude + 1.0 / 32768.0
    # features are well-formed for any payload the synth can produce
    feats = M.audio_features(payload)
    assert len(feats) == M.FEATURE_DIM
    assert all(np.isfinite(feats))


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=64),
    height=st.integers(min_value=1, max_value=64),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_ppm_synth_decode_roundtrip_invariants(width, height, seed):
    """Property: the pure-bytes PPM codec roundtrip preserves geometry and
    every pixel of the analytic pattern for ANY dimensions/seed, and
    features are well-formed."""
    import numpy as np

    from f1_data_pipeline_spark.operators import multimodal as M

    payload = M.synthesize_ppm(width=width, height=height, seed=seed)
    w, h, px = M.decode_ppm(payload)
    assert (w, h) == (width, height) and px.shape == (height, width, 3)
    ys, xs = np.mgrid[0:height, 0:width]
    expected = np.stack(
        [(xs * 8 + seed) % 256, (ys * 8 + seed * 3) % 256, (xs + ys + seed * 7) % 256],
        axis=2,
    ).astype(np.uint8)
    assert np.array_equal(px, expected)
    feats = M.image_features(payload)
    assert len(feats) == M.FEATURE_DIM and all(np.isfinite(feats))


@settings(max_examples=25, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=32),
    height=st.integers(min_value=1, max_value=32),
    n_frames=st.integers(min_value=1, max_value=10),
    interval=st.integers(min_value=1, max_value=1000),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_ppmv_synth_decode_roundtrip_invariants(
    width, height, n_frames, interval, seed
):
    """Property: the PPMV container roundtrip preserves frame count,
    interval, geometry, and every pixel of every frame for ANY
    geometry/length/seed, and video features are well-formed."""
    import numpy as np

    from f1_data_pipeline_spark.operators import multimodal as M

    payload = M.synthesize_ppmv(width, height, n_frames, interval, seed)
    got_interval, w, h, fx = M.decode_ppmv(payload)
    assert (got_interval, w, h) == (interval, width, height)
    assert fx.shape == (n_frames, height, width, 3)
    ys, xs = np.mgrid[0:height, 0:width]
    for f in range(n_frames):
        s = seed + f
        expected = np.stack(
            [(xs * 8 + s) % 256, (ys * 8 + s * 3) % 256, (xs + ys + s * 7) % 256],
            axis=2,
        ).astype(np.uint8)
        assert np.array_equal(fx[f], expected)
    feats = M.video_features(payload)
    assert len(feats) == M.FEATURE_DIM and all(np.isfinite(feats))


# ---------------------------------------------------------------------------
# Misra-Gries merge invariants (operators/frequency.py) — the guarantees
# the two-phase heavy-hitter operator and the streaming summary rest on,
# checked over arbitrary streams, batch splits, and counter budgets.
# ---------------------------------------------------------------------------


@given(
    stream=st.lists(st.integers(min_value=0, max_value=30), max_size=400),
    splits=st.lists(st.integers(min_value=1, max_value=50), max_size=8),
    k=st.integers(min_value=1, max_value=12),
)
@settings(max_examples=150, deadline=None)
def test_mg_merge_bounds_and_superset_property(stream, splits, k):
    """For ANY stream cut into ANY batch sequence merged through
    `_mg_merge` with ANY k: (1) the summary never exceeds k counters;
    (2) every stored count is a LOWER bound on the item's true count;
    (3) the cumulative undercount of any item is ≤ removed_units/(k+1);
    (4) every item with true count > N/(k+1) SURVIVES in the summary —
    the superset guarantee phase 2 and the streaming ub/lb rest on."""
    from f1_data_pipeline_spark.operators.frequency import _mg_merge

    true: dict = {}
    for v in stream:
        true[v] = true.get(v, 0) + 1

    counter: dict = {}
    i = 0
    pieces = []
    for s in splits:
        pieces.append(stream[i : i + s])
        i += s
    pieces.append(stream[i:])
    for piece in pieces:
        vc: dict = {}
        for v in piece:
            vc[v] = vc.get(v, 0) + 1
        if vc:
            _mg_merge(counter, list(vc.keys()), list(vc.values()), k)

    n = len(stream)
    removed = n - sum(counter.values())
    assert len(counter) <= k
    for it, lb in counter.items():
        assert 1 <= lb <= true[it]
    err = removed / (k + 1)
    for it, c in true.items():
        got = counter.get(it, 0)
        assert c - got <= err + 1e-9  # per-item undercount bound
        if c > n / (k + 1):
            assert it in counter  # superset: heavy items always survive


# ---------------------------------------------------------------------------
# Line-level boilerplate removal invariants
# ---------------------------------------------------------------------------

_line_texts = st.lists(
    st.lists(
        st.text(
            alphabet=st.sampled_from("ab XY.\t"), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=6,
    ).map(lambda ls: "\n".join(ls)),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=_line_texts, frac=st.sampled_from([0.4, 0.7, 1.0]))
def test_line_removal_invariants(spark, texts, frac):
    """For arbitrary corpora: (1) removal against an EMPTY boilerplate set
    reproduces every document byte-identically (posexplode→reassemble is
    lossless); (2) against frequent_lines output, kept+removed == total
    lines per doc, no kept line normalizes into the boilerplate set, and
    a second application over the cleaned text removes nothing further
    (idempotence)."""
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    empty_bp = spark.createDataFrame([], "line string")
    out0 = {
        r["doc_id"]: r
        for r in dedup.remove_frequent_lines(df, empty_bp).collect()
    }
    for i, t in enumerate(texts):
        assert out0[i]["clean_text"] == t, (i, t)
        assert out0[i]["removed_lines"] == 0

    bp = dedup.frequent_lines(df, min_doc_frac=frac, min_docs=2)
    bp_set = {r["line"] for r in bp.collect()}
    out = {r["doc_id"]: r for r in dedup.remove_frequent_lines(df, bp).collect()}
    for i, t in enumerate(texts):
        n_lines = len(t.split("\n"))
        r = out[i]
        assert r["kept_lines"] + r["removed_lines"] == n_lines
        if r["kept_lines"]:
            import re as _re

            for raw in r["clean_text"].split("\n"):
                # the SAME normalization the operators share
                # (collapse-then-trim): Python strip() removes tabs that
                # Spark trim does not, so mirror the Spark key exactly
                norm = _re.sub(r"\s+", " ", raw.lower()).strip()
                assert norm not in bp_set
    cleaned = spark.createDataFrame(
        [(i, out[i]["clean_text"]) for i in range(len(texts))],
        "doc_id long, text string",
    )
    again = {
        r["doc_id"]: r
        for r in dedup.remove_frequent_lines(cleaned, bp).collect()
    }
    for i in range(len(texts)):
        assert again[i]["removed_lines"] == 0
        assert again[i]["clean_text"] == out[i]["clean_text"]


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    ftype=st.integers(min_value=0, max_value=4),
)
def test_png_roundtrip_property(w, h, seed, ftype):
    """PNG encode→decode is the identity on arbitrary RGB pixel arrays,
    for every scanline filter type the decoder supports — including 1-px
    edge geometries where the left/up filter references fall off."""
    import numpy as np

    from f1_data_pipeline_spark.operators import multimodal as M
    from tests.test_multimodal import _encode_png_filtered

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = (
        M.encode_png(px) if ftype == 0 else _encode_png_filtered(px, ftype)
    )
    w2, h2, back = M.decode_png(payload)
    assert (w2, h2) == (w, h)
    assert np.array_equal(np.asarray(back), px)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_tokens=st.lists(st.integers(min_value=0, max_value=300), min_size=1,
                      max_size=5),
    max_tokens=st.sampled_from([8, 32, 100]),
    overlap_frac=st.sampled_from([0.0, 0.25, 0.75]),
)
def test_chunk_documents_properties(spark, n_tokens, max_tokens, overlap_frac):
    """chunk_documents invariants over arbitrary doc lengths and dials:
    every token covered exactly once after de-overlap, consecutive
    chunks share exactly `overlap` tokens, every chunk carries more
    than `overlap` tokens (never a pure suffix of its predecessor), and
    chunk counts match the closed form."""
    from f1_data_pipeline_spark.operators.corpus import chunk_documents

    overlap = int(max_tokens * overlap_frac)
    stride = max_tokens - overlap
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(n)))
         for i, n in enumerate(n_tokens)],
        "doc_id long, text string",
    )
    out = chunk_documents(
        docs, max_tokens=max_tokens, overlap=overlap
    ).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(n_tokens):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_index"])
        if n == 0:
            assert chunks == []
            continue
        expect = max(1, -(-(n - overlap) // stride))
        assert len(chunks) == expect
        assert all(c["n_chunks"] == expect for c in chunks)
        toks = [c["chunk_text"].split() for c in chunks]
        for a, b in zip(toks, toks[1:]):
            assert overlap == 0 or a[-overlap:] == b[:overlap]
            assert len(b) > overlap
        rebuilt = toks[0] + [
            t for b in toks[1:] for t in (b[overlap:] if overlap else b)
        ]
        assert rebuilt == [f"w{i}x{j}" for j in range(n)]


# ---------------------------------------------------------------------------
# File-stats pruning soundness (round 9, incl. IS NULL / IS NOT NULL / !=):
# against ANY rows and ANY well-typed predicate conjunction, with stats
# derived exactly the way the commit-time footer collector derives them —
# and with stats arbitrarily DEGRADED to unknown —
#   (a) a file holding a matching row is never pruned, and
#   (b) a file _file_always_matches claims is all-matching really is.
# These two implications are the entire correctness contract of data
# skipping; everything else is an I/O optimization.
# ---------------------------------------------------------------------------


@st.composite
def _file_and_preds(draw):
    n = draw(st.integers(0, 12))
    ints = st.one_of(st.none(), st.integers(-5, 5))
    floats = st.one_of(st.none(), st.sampled_from(
        [-2.5, -1.0, 0.0, 0.5, 1.0, 3.25]))
    strs = st.one_of(st.none(), st.sampled_from(["a", "b", "cc", "d"]))
    rows = [
        {"a": draw(ints), "b": draw(floats), "s": draw(strs)}
        for _ in range(n)
    ]
    stats = {}
    for col in ("a", "b", "s"):
        vals = [r[col] for r in rows if r[col] is not None]
        st_entry = {
            "min": min(vals) if vals else None,
            "max": max(vals) if vals else None,
            "nulls": sum(1 for r in rows if r[col] is None),
        }
        # degrade arbitrarily: bounds and/or null counts may be unknown
        if draw(st.booleans()):
            st_entry["min"] = st_entry["max"] = None
        if draw(st.booleans()):
            st_entry["nulls"] = None
        if draw(st.booleans()):
            stats[col] = st_entry  # sometimes the column has no stats row
    fmeta = {"rows": n, "stats": stats}

    domains = {
        "a": st.integers(-6, 6),
        "b": st.sampled_from([-2.5, -1.0, 0.0, 0.5, 1.0, 3.25, 9.0]),
        "s": st.sampled_from(["a", "b", "cc", "d", "zz"]),
    }
    preds = []
    for _ in range(draw(st.integers(0, 4))):
        col = draw(st.sampled_from(["a", "b", "s"]))
        op = draw(st.sampled_from(
            ["=", "<", "<=", ">", ">=", "!=", "in", "isnull", "notnull"]))
        if op == "in":
            v = tuple(
                draw(domains[col]) for _ in range(draw(st.integers(1, 3)))
            )
        elif op in ("isnull", "notnull"):
            v = None
        else:
            v = draw(domains[col])
        preds.append((col, op, v))
    return rows, fmeta, preds


def _row_sat(row, preds) -> bool:
    for col, op, v in preds:
        x = row[col]
        if op == "isnull":
            if x is not None:
                return False
            continue
        if x is None:
            return False  # NULL satisfies no comparison / IS NOT NULL
        if op == "notnull":
            continue
        if op == "in":
            if not any(x == m for m in v):
                return False
        elif op == "=":
            if not x == v:
                return False
        elif op == "!=":
            if not x != v:
                return False
        elif op == "<":
            if not x < v:
                return False
        elif op == "<=":
            if not x <= v:
                return False
        elif op == ">":
            if not x > v:
                return False
        elif op == ">=":
            if not x >= v:
                return False
    return True


@settings(max_examples=400, deadline=None)
@given(case=_file_and_preds())
def test_stats_pruning_never_wrong(case):
    from f1_data_pipeline_spark.operators.sinks import (
        _file_always_matches,
        _file_maybe_matches,
    )

    rows, fmeta, preds = case
    sat = [_row_sat(r, preds) for r in rows]
    if any(sat):
        assert _file_maybe_matches(fmeta, preds), (
            f"pruned a file holding a matching row: {rows} {preds} {fmeta}"
        )
    if _file_always_matches(fmeta, preds):
        # vacuously true on an empty file: callers add its 0 rows
        assert all(sat), (
            f"always-matches claimed over a non-matching row: "
            f"{rows} {preds} {fmeta}"
        )


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 20),
    colors=st.integers(2, 256),
    seed=st.integers(0, 10_000),
)
def test_gif_lzw_roundtrip_property(w, h, colors, seed):
    """GIF encode→decode identity over arbitrary geometry × palette
    size × pixel field — the property that pins the LZW code-width and
    CLEAR mechanics (the classic off-by-one bug class in this codec)."""
    import numpy as np

    from f1_data_pipeline_spark.operators import multimodal as M

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(colors, 3), dtype=np.uint8)
    idx = rng.integers(0, colors, size=(h, w), dtype=np.uint8)
    w2, h2, px = M.decode_gif(M.encode_gif(idx, pal))
    assert (w2, h2) == (w, h)
    assert (px == pal[idx]).all()
