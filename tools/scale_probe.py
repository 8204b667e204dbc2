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

Usage: python tools/scale_probe.py [op] [sf_dir] [factors...] [mode=...]
  op: minhash (default) | contamination | spans | tfidf | tfidf_mindf
  mode=clique | disjoint | tail (default: clique,disjoint)

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
    if args and args[0] in ("minhash", "contamination", "spans", "tfidf", "tfidf_mindf"):
        op = args.pop(0)
    modes = ("clique", "disjoint")
    for a in list(args):
        if a.startswith("mode="):
            modes = tuple(a.split("=", 1)[1].split(","))
            args.remove(a)
    sf_dir = args.pop(0) if args else "/root/testdata/sf0.1"
    factors = [int(a) for a in args] or [1, 4, 16]

    from f1_data_pipeline_spark.operators.corpus import (
        contamination,
        tfidf_top_terms,
    )
    from f1_data_pipeline_spark.operators.dedup import (
        duplicate_spans,
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

    for factor in factors:
        for mode in modes:
            if factor == 1:
                scaled = with_tail(docs) if mode == "tail" else docs
            else:
                replicas = []
                for i in range(factor):
                    if mode == "tail":
                        # disjoint-style suffix so replicas stay
                        # independent; hapax tail appended after union
                        text = F.regexp_replace(
                            "text", r"(\S+)", r"$1" + f"r{i}"
                        )
                    elif mode == "clique":
                        # replicas stay near-dups of each other (one tag
                        # token): TRUE pair count grows ~f²/2 per original
                        # doc — observed candidates should track it, not
                        # corpus², and time should stay ~linear
                        text = F.concat(F.col("text"), F.lit(f" replica{i}tag"))
                    else:
                        # per-replica token suffix makes every shingle
                        # replica-local: constant dup density — candidates
                        # per doc should stay ~flat as the corpus grows
                        text = F.regexp_replace(
                            "text", r"(\S+)", r"$1" + f"r{i}"
                        )
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
            t0 = time.time()
            if op == "minhash":
                out = minhash_lsh_pairs(scaled, "doc_id", "text", threshold=0.5)
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
            print(
                json.dumps(
                    {
                        "op": op,
                        "mode": mode,
                        "factor": factor,
                        "docs": base_n * factor,
                        "rows": n_pairs,
                        "rows_per_doc": round(n_pairs / (base_n * factor), 4),
                        "sec": round(dt, 2),
                    }
                )
            )
            if factor == 1:
                break  # modes identical at 1x


if __name__ == "__main__":
    main()
