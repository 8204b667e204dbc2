"""Scale-linearity probe for the MinHash LSH banded join.

The 100 TB claim for `minhash_lsh_pairs` rests on candidate volume staying
~linear in corpus size (same-bucket docs only, never all pairs). No sf>0.1
testdata exists in this environment, so this probe replicates the sf0.1
documents table in memory N× (doc ids offset per replica, texts perturbed
with a replica tag so replicas aren't trivial exact dupes of each other)
and measures candidate-pair counts and wall time at 1x/4x/16x.

A quadratic regression would show candidates growing ~N²; linear behavior
shows ~N growth (each replica's near-dup structure is internal to the
replica, plus cross-replica collisions from shared band buckets).

Usage: python tools/scale_probe.py [op] [sf_dir] [factors...] [mode=...] [cap=N]
  op: minhash (default) | contamination | spans | tfidf | tfidf_mindf
  mode=clique | disjoint | tail | boilerplate (default: clique,disjoint)
  cap=N → minhash_lsh_pairs(max_bucket_size=N) (minhash op only)

The `boilerplate` mode prepends an IDENTICAL 40-token prefix to ~30% of
docs across ALL replicas — the crawl pathology (shared headers/footers/
license blocks) that makes some (band, band_hash) buckets O(corpus)-sized
and candidate pairs quadratic. The minhash JSON lines include bucket-size
stats (max/p99) so the cap's effect is directly visible: uncapped,
max_bucket ~0.3×corpus and pairs/doc grows with the corpus; with cap=N,
max surviving bucket ≤ N and pairs/doc stays flat, while above-threshold
output is unchanged (boilerplate-only overlap sits far below J=0.5; true
near-dups also collide in body-content bands).

The `tail` mode appends 8 per-doc unique tokens to every replica doc: the
synthetic corpus has a 31-term vocabulary with df >= 25 everywhere, so the
plain disjoint mode cannot model crawl-scale vocabulary growth (real crawls
are Zipfian — the df=1 tail of typos/ids/hashes dominates the vocabulary).
Under `tail`, vocab grows ~8 terms/doc with the corpus; `tfidf_mindf`
(min_df=2) drops that tail from the df side before the tf⋈dfreq join —
the measured difference is the value of the df-band pre-filter.
Prints one JSON line per factor. Results recorded in SCALE_NOTES.md.

The contamination probe keeps the eval pool FIXED (the base corpus's
doc_id%97 slice) while the corpus replicates — the realistic shape: the
benchmark doesn't grow with the crawl. Linear behavior = wall time ~corpus
size with flat match counts in disjoint mode.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    op = "minhash"
    if args and args[0] in (
        "minhash", "contamination", "spans", "tfidf", "tfidf_mindf", "unigram"
    ):
        op = args.pop(0)
    modes = ("clique", "disjoint")
    cap = None
    for a in list(args):
        if a.startswith("mode="):
            modes = tuple(a.split("=", 1)[1].split(","))
            args.remove(a)
        elif a.startswith("cap="):
            cap = int(a.split("=", 1)[1])
            args.remove(a)
    sf_dir = args.pop(0) if args else "/root/testdata/sf0.1"
    factors = [int(a) for a in args] or [1, 4, 16]

    from f1_data_pipeline_spark.operators.corpus import (
        contamination,
        tfidf_top_terms,
        unigram_logprob,
    )
    from f1_data_pipeline_spark.operators.dedup import (
        duplicate_spans,
        minhash_bucket_stats,
        minhash_lsh_pairs,
    )
    from f1_data_pipeline_spark.session import get_spark
    from f1_data_pipeline_spark.sources import load_table

    spark = get_spark("scale_probe")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base_n = docs.count()  # also warms the scan

    def with_tail(frame, width=8):
        # 8 per-doc unique tokens: a genuine hapax tail whose vocabulary
        # grows linearly with the corpus (the Zipfian-tail shape real
        # crawls have and the 31-term synthetic corpus lacks)
        uniq = [
            F.concat(F.lit("u"), F.col("doc_id").cast("string"), F.lit(f"x{j}"))
            for j in range(width)
        ]
        return frame.select(
            "doc_id", F.concat_ws(" ", F.col("text"), *uniq).alias("text")
        )

    # an identical 40-token prefix on ~30% of docs, SAME across replicas
    # (replica offsets are multiples of 10M ≡ 0 mod 10, so doc_id % 10
    # keeps the same 30% slice in every replica) — the shared-header
    # pathology that makes LSH buckets O(corpus)-sized. Applied only to
    # docs with ≥ 300 chars of body (~55+ shingles): that pins every
    # boilerplate-only pair's true Jaccard ≤ 38/(38+2·55) ≈ 0.26, >4σ of
    # 64-hash estimator noise below the 0.5 threshold, so the cap's
    # unchanged-output property is measurable. On shorter docs an
    # identical 40-token header makes the pair GENUINELY near-duplicate
    # (J > 0.5 template pages) — a corpus like that needs boilerplate
    # stripping upstream, not LSH tuning.
    boiler_prefix = " ".join(f"boilertok{j}" for j in range(40))

    def with_boiler(frame):
        return frame.select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 10 < 3) & (F.length("text") >= 300),
                F.concat(F.lit(boiler_prefix + " "), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )

    seen_1x: set[str] = set()
    for factor in factors:
        for mode in modes:
            if factor == 1:
                # clique/disjoint are identical at 1× (no replication), but
                # tail/boilerplate change the 1× frame itself — dedupe 1×
                # runs per distinct scaled-frame shape, don't break early
                shape = mode if mode in ("tail", "boilerplate") else "plain"
                if shape in seen_1x:
                    continue
                seen_1x.add(shape)
                scaled = docs
                if mode == "tail":
                    scaled = with_tail(docs)
                elif mode == "boilerplate":
                    scaled = with_boiler(docs)
            else:
                replicas = []
                for i in range(factor):
                    if mode in ("tail", "disjoint", "boilerplate"):
                        # per-replica token suffix makes every body shingle
                        # replica-local: constant dup density — candidates
                        # per doc should stay ~flat as the corpus grows
                        # (tail: hapax tail appended after union;
                        # boilerplate: shared prefix applied after union)
                        text = F.regexp_replace(
                            "text", r"(\S+)", r"$1" + f"r{i}"
                        )
                    else:
                        # clique: replicas stay near-dups of each other
                        # (one tag token): TRUE pair count grows ~f²/2 per
                        # original doc — observed candidates should track
                        # it, not corpus², and time should stay ~linear
                        text = F.concat(F.col("text"), F.lit(f" replica{i}tag"))
                    replicas.append(
                        docs.select(
                            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                            text.alias("text"),
                        )
                    )
                scaled = replicas[0]
                for r in replicas[1:]:
                    scaled = scaled.unionAll(r)
                if mode == "tail":
                    # doc_id is replica-offset, so the tail is unique
                    # corpus-wide: vocab grows ~8×docs with the corpus
                    scaled = with_tail(scaled)
                elif mode == "boilerplate":
                    scaled = with_boiler(scaled)
            t0 = time.time()
            if op == "minhash":
                out = minhash_lsh_pairs(
                    scaled, "doc_id", "text", threshold=0.5, max_bucket_size=cap
                )
            elif op == "tfidf":
                # disjoint: vocabulary grows ~factor×, doc frequencies stay
                # flat → term-aggregate key space scales with the corpus;
                # clique: vocabulary fixed, every df grows ~factor× → the
                # worst-case hot-term skew. rows = docs×k in both; time ~N.
                out = tfidf_top_terms(scaled, "doc_id", "text", k=5)
            elif op == "tfidf_mindf":
                # the df-band pre-filter arm: min_df=2 drops the hapax
                # tail from the df side before the tf⋈dfreq join
                out = tfidf_top_terms(scaled, "doc_id", "text", k=5, min_df=2)
            elif op == "unigram":
                # same skeleton as tfidf (term agg + broadcast totals +
                # term join): under `tail` the vocabulary grows ~8
                # terms/doc — rows stay docs×1, time should stay ~N
                # (term-keyed state grows with vocab, not with pairs)
                out = unigram_logprob(scaled, "doc_id", "text")
            elif op == "spans":
                # disjoint: no cross-replica grams → span rows ~factor×base
                # (each replica keeps only the base corpus's internal spans);
                # clique: every doc's full text duplicates across replicas →
                # ~one whole-doc span per doc. Both: rows/doc flat, time ~N.
                out = duplicate_spans(scaled, "doc_id", "text", n=15)
            else:
                # fixed eval pool from the BASE corpus; the crawl grows,
                # the benchmark doesn't
                eval_df = docs.filter(F.col("doc_id") % 97 == 0)
                out = contamination(scaled, eval_df, "doc_id", "text", n=5)
            n_pairs = out.count()
            dt = time.time() - t0
            rec = {
                "op": op,
                "mode": mode,
                "factor": factor,
                "docs": base_n * factor,
                "rows": n_pairs,
                "rows_per_doc": round(n_pairs / (base_n * factor), 4),
                "sec": round(dt, 2),
            }
            if op == "minhash":
                # pre-cap bucket population (untimed): the skew the cap
                # bounds, visible next to the capped/uncapped pair counts
                stats = minhash_bucket_stats(scaled, "doc_id", "text").collect()[0]
                rec.update(
                    cap=cap,
                    max_bucket=stats["max_bucket"],
                    p99_bucket=stats["p99_bucket"],
                    candidate_pairs=stats["candidate_pairs"],
                )
            print(json.dumps(rec))


if __name__ == "__main__":
    main()
