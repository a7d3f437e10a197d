#!/usr/bin/env python
"""Microbench: candidate rewrites of the text-function expression trees
(guide §1: measure first; §2.3/§4: cut per-row work). Times each variant
with the noop sink over the sf documents table, min-of-N.

    python scripts/microbench_text.py [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def timed(spark, label, df, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"microbench: {label}")
        df.write.format("noop").mode("overwrite").save()
        best = min(best or 1e9, time.time() - t0)
    print(f"{best:8.3f}s  {label}")
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from instagram_data_pipeline_spark.functions import text as X
    from instagram_data_pipeline_spark.io import load_testdata
    from instagram_data_pipeline_spark.session import build_session

    spark = build_session(app_name="microbench_text")
    docs = load_testdata(spark, args.sf, "documents")
    # parallelize the single-file scan the same way _tokenized does, so
    # we time expression cost, not the 1-task scan
    docs = docs.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).cache()
    docs.count()

    LANGS = ("en", "de", "es", "fr")

    def fold_lang_id(col):
        toks = F.split(F.lower(col), "[^a-z0-9]+")
        zero = F.struct(*(F.lit(0).alias(k) for k in LANGS))

        def step(acc, t):
            return F.struct(*[
                (acc[k] + F.when(t.isin(*X.LANG_MARKERS[k]), 1)
                 .otherwise(0)).alias(k)
                for k in LANGS
            ])

        def fin(acc):
            total = acc["en"] + acc["de"] + acc["es"] + acc["fr"]
            return (
                F.when(total == 0, F.lit("und"))
                .when(acc["en"] >= F.greatest(acc["de"], acc["es"],
                                              acc["fr"]), F.lit("en"))
                .when(acc["de"] >= F.greatest(acc["es"], acc["fr"]),
                      F.lit("de"))
                .when(acc["es"] >= acc["fr"], F.lit("es"))
                .otherwise(F.lit("fr"))
            )

        return F.aggregate(toks, zero, step, fin)

    def fast_norm(col):
        return F.array_join(
            F.filter(F.split(F.lower(col), "[^a-z0-9]+"),
                     lambda x: x != F.lit("")), " ")

    def fast_words(col):
        return F.filter(F.split(F.lower(col), "[^a-z0-9]+"),
                        lambda x: x != F.lit(""))

    def fold_quality(col):
        toks = F.split(F.lower(col), "[^a-z0-9]+")
        zero = F.struct(F.lit(0).alias("n"), F.lit(0).alias("hits"))

        def step(acc, t):
            return F.struct(
                (acc["n"] + F.when(t != "", 1).otherwise(0)).alias("n"),
                (acc["hits"] + F.when(t.isin(*X.EN_STOPWORDS), 1)
                 .otherwise(0)).alias("hits"),
            )

        def fin(acc):
            stop_ratio = acc["hits"] / F.greatest(acc["n"], F.lit(1))
            len_score = F.least(F.length(col) / F.lit(500.0), F.lit(1.0))
            punct_pen = F.lit(1.0) - F.least(
                X.punct_ratio(col) * 5, F.lit(1.0))
            stop_sig = F.least(stop_ratio * 4, F.lit(1.0))
            return len_score * 0.4 + punct_pen * 0.3 + stop_sig * 0.3

        return F.aggregate(toks, zero, step, fin)

    t = F.col("text")
    variants = [
        ("lang_id OLD", docs.select("doc_id", X.lang_id(t).alias("p"))),
        ("lang_id FOLD", docs.select("doc_id", fold_lang_id(t).alias("p"))),
        ("quality OLD", docs.select(
            "doc_id", F.round(X.quality_score(t), 6).alias("q"))),
        ("quality FOLD", docs.select(
            "doc_id", F.round(fold_quality(t), 6).alias("q"))),
        ("normalized OLD", docs.select(
            "doc_id", X.normalized(t).alias("n"))),
        ("normalized SPLITJOIN", docs.select(
            "doc_id", fast_norm(t).alias("n"))),
        ("fingerprint OLD", docs.select(
            "doc_id", F.md5(X.normalized(t)).alias("fp"))),
        ("fingerprint SPLITJOIN", docs.select(
            "doc_id", F.md5(fast_norm(t)).alias("fp"))),
        ("tokens OLD", docs.select(
            "doc_id", X.tokens(t).alias("w"))),
        ("tokens FASTWORDS", docs.select(
            "doc_id", fast_words(t).alias("w"))),
        ("shingles OLD", docs.select(
            "doc_id", F.array_distinct(
                X.word_shingles(X.tokens(t), 3)).alias("s"))),
        ("shingles FASTWORDS", docs.select(
            "doc_id", F.array_distinct(
                X.word_shingles(fast_words(t), 3)).alias("s"))),
    ]
    for label, df in variants:
        timed(spark, label, df, args.runs)

    # equivalence spot-checks (full equality at sf): old vs new
    def assert_same(a, b, name):
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(f"equal {name}: {'OK' if diff == 0 else f'DIFF {diff}'}")

    assert_same(
        docs.select("doc_id", X.lang_id(t).alias("p")),
        docs.select("doc_id", fold_lang_id(t).alias("p")),
        "lang_id",
    )
    assert_same(
        docs.select("doc_id", F.round(X.quality_score(t), 6).alias("q")),
        docs.select("doc_id", F.round(fold_quality(t), 6).alias("q")),
        "quality",
    )
    assert_same(
        docs.select("doc_id", X.normalized(t).alias("n")),
        docs.select("doc_id", fast_norm(t).alias("n")),
        "normalized",
    )
    assert_same(
        docs.select("doc_id", X.tokens(t).alias("w")),
        docs.select(
            "doc_id",
            F.when(F.size(fast_words(t)) == 0,
                   F.array(F.lit(""))).otherwise(fast_words(t)).alias("w"),
        ),
        "tokens-with-empty-wrap",
    )
    assert_same(
        docs.select("doc_id", F.explode(F.array_distinct(
            X.word_shingles(X.tokens(t), 3))).alias("s")),
        docs.select("doc_id", F.explode(F.array_distinct(
            X.word_shingles(fast_words(t), 3))).alias("s")),
        "shingles",
    )
    # NULL-text behavior of old vs fold lang_id (not in testdata; pin it)
    nulls = spark.createDataFrame([(1, None), (2, ""), (3, "der und ist")],
                                  "doc_id long, text string")
    old = {r.doc_id: r.p for r in
           nulls.select("doc_id", X.lang_id(t).alias("p")).collect()}
    new = {r.doc_id: r.p for r in
           nulls.select("doc_id", fold_lang_id(t).alias("p")).collect()}
    print("null/empty lang_id old:", old, "new:", new)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
