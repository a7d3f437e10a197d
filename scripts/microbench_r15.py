#!/usr/bin/env python
"""r15 A/B microbench: every operator changed this round timed OLD shape
vs NEW shape with the noop sink (guide §1.4), min-of-N, and RESULT
EQUALITY asserted in the same run (sorted-collect comparison). Old shapes
are the r14 expression trees copied inline (the package now holds the new
ones).

    python scripts/microbench_r15.py [--sf DIR] [--runs N] [--only a,b]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def timed(spark, label, df, runs):
    best = None
    for _ in range(runs):
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"microbench_r15: {label}")
        df.write.format("noop").mode("overwrite").save()
        best = min(best or 1e9, time.time() - t0)
    print(f"{best:8.3f}s  {label}", flush=True)
    return best


def assert_equal(label, old_df, new_df):
    o = sorted(map(tuple, old_df.collect()))
    n = sorted(map(tuple, new_df.collect()))
    assert o == n, (
        f"{label}: RESULT CHANGED old={len(o)} rows new={len(n)} rows; "
        f"first diff: {next((a, b) for a, b in zip(o, n) if a != b) if len(o) == len(n) else 'row count'}"
    )
    print(f"   equal  {label} ({len(o)} rows)", flush=True)


# --------------------------------------------------------------------------
# OLD shapes (r14 tree, commit fd59c60) copied inline
# --------------------------------------------------------------------------

def old_cosine_topk(S, corpus, queries, k=5,
                    id_col="vec_id", vec_col="embedding",
                    query_id_col="query_id"):
    c = corpus.select(
        F.col(id_col), S.as_double_vec(F.col(vec_col)).alias("_cv")
    )
    q = queries.select(
        F.col(query_id_col), S.as_double_vec(F.col(vec_col)).alias("_qv")
    )
    sim = S.cosine(F.col("_qv"), F.col("_cv"))
    scored = c.join(F.broadcast(q)).select(
        query_id_col, id_col, sim.alias("_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col,
                F.round(F.col("_sim"), 6).alias("cosine"), "rank")
    )


def old_near_dup_exact(S, df, threshold=0.35, id_col="vec_id",
                       vec_col="embedding"):
    v = df.select(F.col(id_col), S.as_double_vec(F.col(vec_col)).alias("_v"))
    a = v.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"))
    b = v.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"))
    joined = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = S.cosine(F.col("_va"), F.col("_vb"))
    return (
        joined.select("id_a", "id_b", sim.alias("_sim"))
        .filter(F.col("_sim") >= threshold)
        .select("id_a", "id_b", F.round(F.col("_sim"), 6).alias("cosine"))
    )


def old_bigram_lm(X, docs, id_col="doc_id", text_col="text", add_k=0.5):
    npart = docs.sparkSession.sparkContext.defaultParallelism
    d = docs.repartition(npart, F.col(id_col))
    w = X.tokens(F.col(text_col))
    n = F.size(w)
    grams = d.select(
        F.col(id_col),
        F.explode(F.arrays_zip(
            F.slice(w, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
            F.slice(w, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
        )).alias("g"),
    ).select(
        F.col(id_col), F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"),
    ).filter((F.col("w1") != "") & (F.col("w2") != ""))
    toks = d.select(
        F.col(id_col), F.explode(X.tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    uni = toks.groupBy(F.col("term").alias("w1")).agg(
        F.count(F.lit(1)).alias("cu"))
    vocab = F.broadcast(toks.select("term").dropDuplicates().agg(
        F.count(F.lit(1)).alias("_v")))
    bi = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    lp = (
        bi.join(uni, "w1").crossJoin(vocab)
        .select("w1", "w2", F.round(F.log(
            (F.col("cb") + F.lit(add_k))
            / (F.col("cu") + F.lit(add_k) * F.col("_v"))), 9)
            .cast("decimal(18,10)").alias("_lp"))
    )
    scored = grams.join(lp, ["w1", "w2"]).select(F.col(id_col), "_lp")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-(F.sum("_lp").cast("double")) / F.count(F.lit(1)), 6)
        .alias("avg_nll"))


def old_bigram_lm_interp(X, docs, id_col="doc_id", text_col="text",
                         add_k=0.5, lam=0.75):
    w = X.tokens(F.col(text_col))
    n = F.size(w)
    grams = docs.select(
        F.col(id_col),
        F.explode(F.arrays_zip(
            F.slice(w, 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
            F.slice(w, 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
        )).alias("g"),
    ).select(
        F.col(id_col), F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"),
    ).filter((F.col("w1") != "") & (F.col("w2") != ""))
    toks = docs.select(
        F.col(id_col), F.explode(X.tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    uni = toks.groupBy(F.col("term").alias("w1")).agg(
        F.count(F.lit(1)).alias("cu"))
    uni2 = toks.groupBy(F.col("term").alias("w2")).agg(
        F.count(F.lit(1)).alias("cu2"))
    stats = F.broadcast(toks.agg(
        F.count(F.lit(1)).alias("_t"), F.countDistinct("term").alias("_v")))
    bi = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    p_bi = (F.col("cb") + F.lit(add_k)) / (
        F.col("cu") + F.lit(add_k) * F.col("_v"))
    p_un = (F.col("cu2") + F.lit(add_k)) / (
        F.col("_t") + F.lit(add_k) * F.col("_v"))
    scored = (
        grams.join(bi, ["w1", "w2"]).join(uni, "w1").join(uni2, "w2")
        .crossJoin(stats)
        .select(F.col(id_col),
                F.round(F.log(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_un), 9)
                .cast("decimal(18,10)").alias("_lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-(F.sum("_lp").cast("double")) / F.count(F.lit(1)), 6)
        .alias("avg_nll"))


def old_bigram_lm_kn(R, docs, id_col="doc_id", text_col="text",
                     discount=0.75):
    grams = R._bigram_stream(docs, id_col, text_col)
    probs = R.kneser_ney_prob_table(docs, id_col, text_col, discount)
    scored = grams.join(probs.select("w1", "w2", "p"), ["w1", "w2"]).select(
        F.col(id_col),
        F.round(F.log(F.col("p")), 9).cast("decimal(18,10)").alias("_lp"))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-(F.sum("_lp").cast("double")) / F.count(F.lit(1)), 6)
        .alias("avg_nll"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from instagram_data_pipeline_spark.extensions import ranking as R
    from instagram_data_pipeline_spark.extensions import similarity as S
    from instagram_data_pipeline_spark.functions import text as X
    from instagram_data_pipeline_spark.io import load_testdata
    from instagram_data_pipeline_spark.session import build_session

    spark = build_session(app_name="microbench_r15")
    docs = load_testdata(spark, args.sf, "documents")
    emb = load_testdata(spark, args.sf, "embeddings")

    def want(name):
        return only is None or name in only

    if want("cosine_topk"):
        queries = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding")
        corpus = emb.filter(F.col("vec_id") >= 10)
        old = old_cosine_topk(S, corpus, queries, k=5)
        new = S.cosine_topk(corpus, queries, k=5)
        assert_equal("cosine_topk", old, new)
        timed(spark, "cosine_topk OLD (per-pair cosine)", old, args.runs)
        timed(spark, "cosine_topk NEW (hoisted norms)", new, args.runs)

    if want("near_dups"):
        old = old_near_dup_exact(S, emb)
        new = S.near_dup_pairs(emb, threshold=0.35, bucketed=False)
        assert_equal("embedding_near_dups", old, new)
        timed(spark, "near_dups OLD", old, args.runs)
        timed(spark, "near_dups NEW", new, args.runs)

    if want("lm"):
        old = old_bigram_lm(X, docs)
        new = R.bigram_lm_scores(docs, add_k=0.5)
        assert_equal("lm_perplexity", old, new)
        timed(spark, "lm_perplexity OLD (SMJ stream join)", old, args.runs)
        timed(spark, "lm_perplexity NEW (SHJ + gated spread)", new, args.runs)

    if want("lm_interp"):
        old = old_bigram_lm_interp(X, docs)
        new = R.bigram_lm_scores_interpolated(docs, add_k=0.5, lam=0.75)
        assert_equal("lm_perplexity_interpolated", old, new)
        timed(spark, "lm_interp OLD (stream through 4 joins)", old, args.runs)
        timed(spark, "lm_interp NEW (distinct-lp + SHJ)", new, args.runs)

    if want("lm_kn"):
        old = old_bigram_lm_kn(R, docs)
        new = R.bigram_lm_scores_kneser_ney(docs, discount=0.75)
        assert_equal("lm_perplexity_kneser_ney", old, new)
        timed(spark, "lm_kn OLD (SMJ stream join)", old, args.runs)
        timed(spark, "lm_kn NEW (SHJ + distinct-log)", new, args.runs)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
