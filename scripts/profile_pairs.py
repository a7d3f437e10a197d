#!/usr/bin/env python
"""Cumulative per-stage wall profile of ngram_jaccard_pairs and
minhash_near_dups (VERDICT r14 Next #1c): each listed frame is timed with
the noop sink (guide §1.4), min-of-N. Stages are cumulative (each includes
its upstream), so stage cost = delta to the previous line.

    python scripts/profile_pairs.py [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def timed(spark, label, df, runs):
    best = None
    for _ in range(runs):
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"profile_pairs: {label}")
        df.write.format("noop").mode("overwrite").save()
        best = min(best or 1e9, time.time() - t0)
    print(f"{best:8.3f}s  {label}", flush=True)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from instagram_data_pipeline_spark.extensions import dedup as D
    from instagram_data_pipeline_spark.functions import text as X
    from instagram_data_pipeline_spark.io import load_testdata
    from instagram_data_pipeline_spark.session import build_session

    spark = build_session(app_name="profile_pairs")
    docs = load_testdata(spark, args.sf, "documents")
    npart = spark.sparkContext.defaultParallelism

    # ---- ngram_jaccard_pairs (n=3, threshold=0.1, max_df=100) ----
    print("== ngram_jaccard_pairs ==", flush=True)
    sh = D._distinct_shingles(docs, "doc_id", "text", 3)
    timed(spark, "1 shingles (tokenize+shingle+explode)", sh, args.runs)
    shr = sh.repartition(npart, "shingle")
    groups = shr.groupBy("shingle").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ids")
    ).filter(F.size("ids") <= 100)
    timed(spark, "2 + inverted index (groupBy collect_list)", groups,
          args.runs)
    sizes = (
        groups.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    )
    timed(spark, "3 + sizes (explode ids + groupBy id)", sizes, args.runs)
    pairs = (
        groups.select(F.explode(F.expr(
            "flatten(transform(ids, (x, i) -> "
            "transform(slice(ids, i + 2, size(ids)), "
            "y -> struct(x AS doc_a, y AS doc_b))))")).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"),
                 F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    timed(spark, "4 + pairs (fan-out + groupBy pair)", pairs, args.runs)
    full = D.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.1, 100)
    timed(spark, "5 full (pairs + 2 size joins + filter)", full, args.runs)

    # ---- minhash_near_dups (n=3, 32 hashes, 8 bands, thr 0.5) ----
    print("== minhash_near_dups ==", flush=True)
    sigs = D.minhash_signatures(docs, "doc_id", "text", 3, 32, False)
    timed(spark, "1 signatures (32x xxhash64 + groupBy id)", sigs, args.runs)
    band = D.lsh_band_rows(sigs, "doc_id", 8, 4, False)
    timed(spark, "2 + band rows", band, args.runs)
    cand = D.lsh_candidate_pairs(sigs, "doc_id", 8, 4, False)
    timed(spark, "3 + candidates (band self-join + dedup)", cand, args.runs)
    sets = D._tokenized(docs, "doc_id", "text").select(
        F.col("doc_id"),
        F.array_distinct(X.word_shingles(F.col("_w"), 3)).alias("sh"),
    )
    timed(spark, "4 shingle sets alone (verify input)", sets, args.runs)
    full = D.minhash_near_dups(docs, "doc_id", "text", 3, 32, 8, 0.5, False)
    timed(spark, "5 full (cand + set joins + exact jaccard)", full,
          args.runs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
