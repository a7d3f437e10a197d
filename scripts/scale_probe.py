#!/usr/bin/env python
"""Scale-trend probe (VERDICT r6 Next #8): measure the top-3 expensive
document queries at sf0.1 AND at an 8x synthetic scale-up, and report
the fitted scaling exponent alpha = log(T_8x / T_1x) / log(8) — one
number that says whether the claimed near-linear shapes hold beyond
the largest fixture.

The 8x corpus is NOT 8 verbatim copies: identical (or near-identical)
replicas would multiply every doc's near-duplicate cluster by 8 and
grow candidate PAIRS quadratically, so the probe would measure the
pair explosion of a degenerate corpus, not the operator's scaling.
Each replica k instead word-permutes the text by a distinct stride
coprime to the word count (replica 0 is the original), which destroys
almost all shared 3-gram shingles between replicas while preserving
word counts, lengths, and vocabulary — the size grows 8x, the
similarity structure per document stays comparable.

    python scripts/scale_probe.py [--sf DIR] [--factor 8] [--runs 2]

Prints one JSON line {query: {t_1x, t_8x, alpha}} and a markdown table
to paste into BENCHNOTES.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PROBE_QUERIES = ["curation_pipeline", "ngram_jaccard_pairs",
                 "minhash_near_dups"]

# the remaining >0.5s headline queries (VERDICT r7 Next #8): the J1
# self-join over scaled lineitem edges, per-user window sessionization
# over scaled events, fixed-probe brute-force ANN over a scaled corpus
# (queries stay the 10 originals, so the expected shape is linear in
# corpus), and text scoring over the scaled documents
HEADLINE_PROBE_QUERIES = ["mutual_edges", "sessionize_batch",
                          "cosine_topk", "lang_id"]

# write-path probes over the scaled ORDERS table: merge + clustered
# write + manifest-pruned read (txlog_zorder_scan), merge + refresh +
# delete + version diff (txlog_change_feed), and the five-version
# distributed CDF backfill (txlog_changes_backfill) — the format's
# cost must track the data it rewrites/replays, not the table.
# Round 9 (VERDICT r8 Next #4) adds the r8 format work: the full-table
# modulus rewrite (rebucket moves EVERY bucket, so its cost must track
# the moved data — alpha ~1), the quantile-rank Z-order write + box
# scan, and merge-on-read deletion vectors + compaction.
TXLOG_PROBE_QUERIES = ["txlog_zorder_scan", "txlog_change_feed",
                       "txlog_changes_backfill",
                       "txlog_rebucket_layout", "txlog_zorder_equidepth",
                       "txlog_delete_vectors"]

# Round 10 (VERDICT r9 Next #3/#6): the r9/r10 additions. The SQL
# shim adds parse/view plumbing on top of the same scans, so the
# time-travel/merge/DML probes should track their API twins (~linear
# in rewritten/read data); FLAC decode is per-payload map work, so
# ~linear like lang_id; dpp_partition_prune re-lands the fact then
# reads 2 of 7 partitions — wall tracks the selected partitions'
# bytes (alpha ~1 against a uniform 8x, with the in-query
# `dynamicpruning` assert holding at scale).
R10_PROBE_QUERIES = ["txlog_time_travel_sql", "txlog_merge_into_sql",
                     "txlog_update_sql", "txlog_delete_sql",
                     "multimodal_flac_stats", "dpp_partition_prune",
                     # late r10 additions: INSERT pays the bucket-scoped
                     # existence probe + merge of the inserted rows
                     # (sublinear — the probe reads touched buckets, not
                     # the table); RESTORE is control-plane only (one
                     # manifest read + one publish), so its alpha should
                     # be ~0 net of the fixture build it sits behind;
                     # CTAS is dominated by the initial data merge
                     # (~linear in created data); ALTER's four schema
                     # statements are each one manifest publish, so like
                     # restore its cost is the fixture + the one UPDATE
                     "txlog_insert_into_sql", "txlog_restore_sql",
                     "txlog_ctas_sql", "txlog_alter_sql",
                     # constraint enforcement costs one filter-count per
                     # statement over the BATCH (never the table) plus
                     # ADD's one-time validation scan (~linear in table);
                     # convert harvests one footer per adopted file then
                     # pays the first-merge migration (~linear in adopted
                     # data — the documented one-time cost)
                     "txlog_constraints_sql", "txlog_convert_sql"]

# Round 11: the overwrite family — INSERT OVERWRITE rewrites the
# whole (aggregated) table as one commit, so its cost tracks the
# written data (~linear); TRUNCATE inside the same query is a
# manifest-only publish
R11_PROBE_QUERIES = ["txlog_overwrite_sql"]

# Round 12: predicate-scoped overwrite (replaceWhere). The CTAS
# fixture dominates (~linear in created data); the scoped rewrite
# itself replaces the 3 smallest keys and so touches <= 3 key-buckets
# at ANY table size (carried-file overlap asserted in-query) — the
# probe's alpha reads the fixture + the one pushdown-filtered
# matching-bucket scan, the in-query assert reads the touched-fraction
# story
R12_PROBE_QUERIES = ["txlog_replace_where_sql"]

# distinct strides, coprime to virtually all word counts
_STRIDES = [1, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]


def build_scaled_documents(spark, sf_dir: str, out_dir: str,
                           factor: int) -> None:
    import pyspark.sql.functions as F

    from instagram_data_pipeline_spark.io import load_testdata

    docs = load_testdata(spark, sf_dir, "documents")
    n_docs = docs.count()
    reps = []
    for k in range(factor):
        stride = _STRIDES[k % len(_STRIDES)]
        words = F.split(F.col("text"), " ")
        n = F.size(words)
        permuted = F.when(n <= 1, F.col("text")).otherwise(
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), n - 1),
                    lambda i: F.element_at(
                        words, (F.pmod(i * F.lit(stride), n) + 1).cast("int")
                    ),
                ),
                " ",
            )
        )
        reps.append(
            docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(k * 10 * n_docs)
            ).withColumn("text", permuted if k else F.col("text"))
        )
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def build_scaled_orders(spark, sf_dir: str, out_dir: str,
                        factor: int) -> None:
    """factor x orders: replica k shifts both keys past the originals
    (rows are independent — no permutation needed; value/date
    distributions, and so zone-map selectivity, stay identical)."""
    import pyspark.sql.functions as F

    from instagram_data_pipeline_spark.io import load_testdata

    orders = load_testdata(spark, sf_dir, "orders")
    n_keys = orders.count()
    reps = [
        orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(k * 10 * n_keys)
        ).withColumn(
            "o_custkey", F.col("o_custkey") + F.lit(k * 10 * n_keys)
        )
        for k in range(factor)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "orders.parquet")
    )


def build_scaled_simple(spark, sf_dir: str, out_dir: str, factor: int,
                        table: str, shift_cols: list[str]) -> None:
    """factor x ``table``: replica k shifts the named id columns past
    the originals — rows/groups stay independent across replicas, so
    the operator under probe sees factor x its real key space, not a
    degenerate all-duplicates corpus."""
    import pyspark.sql.functions as F

    from instagram_data_pipeline_spark.io import load_testdata

    base = load_testdata(spark, sf_dir, table)
    n = base.count()
    reps = []
    for k in range(factor):
        r = base
        for c in shift_cols:
            r = r.withColumn(c, F.col(c) + F.lit(k * 10 * n))
        reps.append(r)
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, f"{table}.parquet")
    )


def build_scaled_embeddings(spark, sf_dir: str, out_dir: str,
                            factor: int) -> None:
    """factor x embeddings CORPUS with the 10 probe queries kept
    un-replicated (vec_id < 10 stays singular): replica k shifts only
    corpus ids, so cosine_topk's work is linear in corpus size — the
    operator's real scaling — instead of quadratic in the replica
    count."""
    import pyspark.sql.functions as F

    from instagram_data_pipeline_spark.io import load_testdata

    emb = load_testdata(spark, sf_dir, "embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    reps = [
        corpus.withColumn("vec_id", F.col("vec_id") + F.lit(k * 10 * n))
        for k in range(factor)
    ]
    out = queries
    for r in reps:
        out = out.unionByName(r)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


# LIMIT-free queries whose output grows with the input (~1M rows at
# 8x): count() executes the identical full join/window plan while a
# collect() would time driver-side row serialization, not the operator
COUNT_QUERIES = {"mutual_edges", "sessionize_batch"}


def time_query(registry, spark, name: str, sf_dir: str, runs: int) -> float:
    best = None
    for _ in range(runs):
        t0 = time.time()
        df = registry[name].spark_fn(spark, sf_dir)
        if name in COUNT_QUERIES:
            df.count()
        else:
            # collect(), not count(): a trailing LIMIT lets count()
            # plan an early-exit that skips the upstream full-corpus
            # aggregations, which would fake a flat (even negative)
            # scaling exponent
            len(df.collect())
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return best


def probe_constraints_convert(spark, sf_dir: str, factor: int,
                              runs: int) -> dict:
    """VERDICT r10 Next #7 — the two costs the registry fixtures
    structurally hide (txlog_convert_sql adopts a constant 4 files;
    txlog_constraints_sql amortizes ADD across many statements):

    * convert_files:        CONVERT at 12 vs 12*factor FILES (fixed
                            rows/file) — footer harvest is per-file,
                            so alpha ~1 in FILE COUNT is the claim.
    * convert_rows_per_file: CONVERT at 12 files, 5k vs 5k*factor
                            ROWS per file — zero bytes rewritten, so
                            alpha ~0 in DATA SIZE is the claim (the
                            harvest reads footers, not rows).
    * add_constraint_scan:  one ADD CONSTRAINT over the 1x vs
                            factor-x table — the documented one-time
                            full validation scan, alpha ~1 in table.
    * insert_with_constraint: a fixed 200-row INSERT under the
                            recorded constraint at both table sizes —
                            statement-boundary enforcement costs the
                            BATCH, so alpha ~0 in table.
    * set_not_null_scan:    one SET NOT NULL promote (r13) over the 1x
                            vs factor-x table — the validated promote
                            pays the same one-time existing-rows scan
                            as ADD CONSTRAINT, alpha ~1 in table (the
                            paired DROP NOT NULL inside the timed
                            toggle is metadata-only).
    """
    import pyspark.sql.functions as F  # noqa: F401

    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    results = {}

    def timed(fn) -> float:
        best = None
        for _ in range(runs):
            t0 = time.time()
            fn()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        return best

    def convert_time(n_files: int, rows_per_file: int, tag: str) -> float:
        # runs>1 must re-adopt a FRESH directory each time (convert
        # refuses an existing log), so the fixture build is inside
        # the loop but the clock only covers the CONVERT statement
        best = None
        for r in range(runs):
            loc = tempfile.mkdtemp(prefix=f"probe_conv_{tag}_{r}_")
            shutil.rmtree(loc)
            spark.range(n_files * rows_per_file).selectExpr(
                "id AS k", "CAST(id AS DOUBLE) AS v",
                "repeat('x', 32) AS pad",
            ).repartition(n_files).write.parquet(loc)
            cat = TxlogSqlCatalog(spark)
            t0 = time.time()
            m = cat.sql(
                f"CONVERT TO TXLOG conv_{tag}_{r} LOCATION '{loc}' "
                f"CLUSTERED BY (k)"
            ).first()
            el = time.time() - t0
            assert m.num_files == n_files
            shutil.rmtree(loc, ignore_errors=True)
            best = el if best is None else min(best, el)
        return best

    # (a) file-count scaling at fixed rows/file: O(files) claim
    t1 = convert_time(12, 5000, "f1")
    t8 = convert_time(12 * factor, 5000, "f8")
    results["convert_files"] = {
        "t_1x": round(t1, 3), f"t_{factor}x": round(t8, 3),
        "alpha": round(math.log(t8 / t1) / math.log(factor), 3),
    }
    # (b) rows-per-file scaling at fixed file count: zero-rewrite claim
    t1 = convert_time(12, 5000, "r1")
    t8 = convert_time(12, 5000 * factor, "r8")
    results["convert_rows_per_file"] = {
        "t_1x": round(t1, 3), f"t_{factor}x": round(t8, 3),
        "alpha": round(math.log(t8 / t1) / math.log(factor), 3),
    }

    # (c)+(d) ADD CONSTRAINT scan and under-constraint INSERT vs
    # table size: orders-derived txlog tables at 1x and factor-x
    ins_cols = (
        "id + 900000000 AS o_orderkey, id AS o_custkey, "
        "'O' AS o_orderstatus, CAST(id AS DOUBLE) AS o_totalprice, "
        "TIMESTAMP '1995-06-01' AS o_orderdate, "
        "'3-MEDIUM' AS o_orderpriority"
    )
    for fac, tag in ((1, "1x"), (factor, f"{factor}x")):
        src_dir = tempfile.mkdtemp(prefix=f"probe_con_{tag}_")
        build_scaled_orders(spark, sf_dir, src_dir, fac)
        spark.read.parquet(
            os.path.join(src_dir, "orders.parquet")
        ).createOrReplaceTempView("probe_ord_src")
        loc = os.path.join(src_dir, "ord_txlog")
        cat = TxlogSqlCatalog(spark)
        cat.sql(
            f"CREATE TABLE ord_{tag} USING txlog CLUSTERED BY "
            f"(o_orderkey) INTO 16 BUCKETS LOCATION '{loc}' "
            f"AS SELECT * FROM probe_ord_src"
        )
        # ADD pays the one-time validation scan; runs>1 re-times it
        # after a DROP (sidecar-only, so the re-ADD rescans honestly)
        def add_drop(tag=tag, cat=cat):
            cat.sql(
                f"ALTER TABLE ord_{tag} ADD CONSTRAINT price_pos "
                f"CHECK (o_totalprice >= 0)"
            )
            cat.sql(f"ALTER TABLE ord_{tag} DROP CONSTRAINT price_pos")

        t_add = timed(add_drop)

        # SET NOT NULL promote (r13): same one-scan validation shape
        def nn_toggle(tag=tag, cat=cat):
            cat.sql(
                f"ALTER TABLE ord_{tag} ALTER COLUMN o_orderstatus "
                f"SET NOT NULL"
            )
            cat.sql(
                f"ALTER TABLE ord_{tag} ALTER COLUMN o_orderstatus "
                f"DROP NOT NULL"
            )

        t_nn = timed(nn_toggle)
        results.setdefault("set_not_null_scan", {})[f"t_{tag}"] = \
            round(t_nn, 3)
        cat.sql(
            f"ALTER TABLE ord_{tag} ADD CONSTRAINT price_pos "
            f"CHECK (o_totalprice >= 0)"
        )
        # fixed-size INSERT under the constraint; distinct key range
        # per run so the key-unique contract holds
        run_i = [0]

        def ins(tag=tag, cat=cat):
            off = run_i[0] * 1000
            run_i[0] += 1
            cat.sql(
                f"INSERT INTO ord_{tag} SELECT {ins_cols.replace('900000000', str(900000000 + off))} "
                f"FROM range(200)"
            )

        t_ins = timed(ins)
        results.setdefault("add_constraint_scan", {})[f"t_{tag}"] = \
            round(t_add, 3)
        results.setdefault("insert_with_constraint", {})[f"t_{tag}"] = \
            round(t_ins, 3)
        shutil.rmtree(src_dir, ignore_errors=True)
    for key in ("add_constraint_scan", "insert_with_constraint",
                "set_not_null_scan"):
        r = results[key]
        r["alpha"] = round(
            math.log(r[f"t_{factor}x"] / r["t_1x"]) / math.log(factor), 3
        )

    print(f"| probe | t_1x (s) | t_{factor}x (s) | alpha |")
    print("|---|---|---|---|")
    for name, r in results.items():
        print(f"| {name} | {r['t_1x']:.2f} | {r[f't_{factor}x']:.2f} "
              f"| {r['alpha']:.3f} |")
    print(json.dumps({"special": "constraints-convert",
                      "factor": factor, "sf": sf_dir,
                      "results": results}))
    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--only",
        help="comma-separated query subset (default: all probe sets)",
    )
    ap.add_argument(
        "--special",
        choices=["constraints-convert"],
        help="run a targeted probe instead of the registry sets "
             "(constraints-convert: VERDICT r10 Next #7 — CONVERT at "
             "O(100) files / fixed files with fatter rows, ADD "
             "CONSTRAINT scan and under-constraint INSERT vs table "
             "size)",
    )
    args = ap.parse_args()

    from instagram_data_pipeline_spark.queries import load_all
    from instagram_data_pipeline_spark.session import build_session

    spark = build_session(app_name="scale_probe")
    if args.special == "constraints-convert":
        probe_constraints_convert(spark, args.sf, args.factor, args.runs)
        return 0
    registry = load_all()

    base = tempfile.mkdtemp(prefix="scale_probe_1x_")
    big = tempfile.mkdtemp(prefix=f"scale_probe_{args.factor}x_")
    try:
        # re-land 1x through the same writer so both sides read
        # identically-encoded parquet (no INT96/nanos asymmetry)
        for dst, fac in ((base, 1), (big, args.factor)):
            build_scaled_documents(spark, args.sf, dst, fac)
            build_scaled_orders(spark, args.sf, dst, fac)
            build_scaled_simple(spark, args.sf, dst, fac, "lineitem",
                                ["l_orderkey", "l_suppkey"])
            build_scaled_simple(spark, args.sf, dst, fac, "events",
                                ["event_id", "user_id"])
            build_scaled_embeddings(spark, args.sf, dst, fac)

        results = {}
        names = (PROBE_QUERIES + HEADLINE_PROBE_QUERIES
                 + TXLOG_PROBE_QUERIES + R10_PROBE_QUERIES
                 + R11_PROBE_QUERIES + R12_PROBE_QUERIES)
        if args.only:
            want = {n.strip() for n in args.only.split(",")}
            unknown = want - set(names)
            if unknown:
                raise SystemExit(f"--only: not probe queries: {unknown}")
            names = [n for n in names if n in want]
        print(f"| query | t_1x (s) | t_{args.factor}x (s) | alpha |")
        print("|---|---|---|---|")
        for name in names:
            t1 = time_query(registry, spark, name, base, args.runs)
            t8 = time_query(registry, spark, name, big, args.runs)
            alpha = math.log(t8 / t1) / math.log(args.factor)
            results[name] = {
                "t_1x": round(t1, 3),
                f"t_{args.factor}x": round(t8, 3),
                "alpha": round(alpha, 3),
            }
            print(f"| {name} | {t1:.2f} | {t8:.2f} | {alpha:.3f} |")
        print(json.dumps({"factor": args.factor, "sf": args.sf,
                          "results": results}))
        return 0
    finally:
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
