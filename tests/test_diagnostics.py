"""Skew profiling and declarative constraints on planted fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from instagram_data_pipeline_spark.operators.diagnostics import (
    check_constraints,
    in_range,
    matches,
    not_null,
    skew_report,
)


def test_skew_report_surfaces_celebrity_key(spark):
    # 90 rows on key 1, 10 uniform keys with 1 row each -> 100 rows/11 keys
    rows = [(1,)] * 90 + [(k,) for k in range(2, 12)]
    df = spark.createDataFrame(rows, "k long")
    top = skew_report(df, ["k"], top_n=3).collect()
    assert [r.k for r in top] == [1, 2, 3]  # count desc, key asc tiebreak
    head = top[0]
    assert head.n_rows == 90
    assert head.share_ppm == 900000
    # 90 * 11 keys * 100 / 100 rows = 990 -> ~9.9x the uniform share
    assert head.skew_factor_x100 == 990
    assert [r.rank for r in top] == [1, 2, 3]
    uni = top[1]
    assert uni.n_rows == 1 and uni.skew_factor_x100 == 11


def test_check_constraints_counts_planted_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -5.0, "B"),      # range violation
            (None, 20.0, "C"),   # null violation
            (4, 30.0, "xx"),     # format violation
            (4, 40.0, None),     # dup key + null format
        ],
        "k long, price double, status string",
    )
    parent = spark.createDataFrame([(1,), (2,), (4,)], "k long")
    rep = {
        r.constraint: (r.n_checked, r.n_violations)
        for r in check_constraints(
            df,
            [
                not_null("k_not_null", "k"),
                in_range("price_range", "price", 0, 100),
                matches("status_format", "status", "^[A-Z]$"),
            ],
            unique_keys=[["k"]],
            references=[(["k"], parent, ["k"])],
        ).collect()
    }
    assert rep["k_not_null"] == (5, 1)
    assert rep["price_range"] == (5, 1)
    assert rep["status_format"] == (5, 2)  # 'xx' and NULL
    assert rep["unique(k)"] == (5, 1)  # key 4 twice -> one extra row
    # NULL child key never matches the parent -> counted as orphan
    assert rep["ref(k)"] == (5, 1)


def test_check_constraints_clean_table_all_zero(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B")], "k long, s string")
    rep = check_constraints(
        df,
        [not_null("k_nn", "k"), matches("s_fmt", "s", "^[A-Z]$")],
        unique_keys=[["k"]],
    ).collect()
    assert all(r.n_violations == 0 for r in rep)
    assert {r.constraint for r in rep} == {"k_nn", "s_fmt", "unique(k)"}


def test_check_constraints_requires_expectations(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="no expectations"):
        check_constraints(df, [])


def test_skew_report_uniform_keys_factor_100(spark):
    df = spark.range(100).select((F.col("id") % 10).alias("k"))
    top = skew_report(df, ["k"], top_n=10).collect()
    assert all(r.skew_factor_x100 == 100 for r in top)
    assert all(r.share_ppm == 100000 for r in top)


def test_join_size_preflight_flags_the_hot_key(spark):
    """sum of squares, exactly: a 100-row key contributes 10000 pairs
    while 10 ten-row keys contribute 100 each — the preflight must put
    the hot key first with the right integer share."""
    from instagram_data_pipeline_spark.operators.diagnostics import (
        join_size_preflight,
    )

    rows = [(0,) for _ in range(100)] + [
        (k,) for k in range(1, 11) for _ in range(10)
    ]
    df = spark.createDataFrame(rows, "user_id long")
    got = join_size_preflight(df, ["user_id"], top_n=3).collect()
    total = 100 * 100 + 10 * 10 * 10
    assert got[0].user_id == 0
    assert got[0].pairs == 10000 and got[0].est_join_rows == total
    assert got[0].share_ppm == 10000 * 1_000_000 // total
    assert [r.user_id for r in got[1:]] == [1, 2]  # tie-break on key


def test_join_size_preflight_survives_bigint_overflow_regime(spark):
    """ADVICE r6 #2 regression: a celebrity key with >~3.03M rows makes
    pairs * 1_000_000 exceed 2^63 — BIGINT multiply would silently wrap
    negative under non-ANSI Spark, exactly the regime the preflight
    exists to catch. The decimal cross-multiply must return the exact
    integer share instead."""
    import pyspark.sql.functions as F

    from instagram_data_pipeline_spark.operators.diagnostics import (
        join_size_preflight,
    )

    hot_n = 3_200_000  # pairs*1e6 = 1.024e19 > 2^63 = 9.22e18
    df = spark.range(hot_n + 100).select(
        F.when(F.col("id") < hot_n, F.lit(0)).otherwise(F.lit(1))
        .alias("user_id")
    )
    got = join_size_preflight(df, ["user_id"], top_n=2).collect()
    total = hot_n * hot_n + 100 * 100
    assert got[0].user_id == 0 and got[0].n_rows == hot_n
    assert got[0].pairs == hot_n * hot_n
    assert got[0].share_ppm == hot_n * hot_n * 1_000_000 // total
    assert got[0].share_ppm >= 0 and got[0].est_join_rows == total
    assert got[1].share_ppm == 100 * 100 * 1_000_000 // total


def test_mad_outlier_report_planted(spark):
    from instagram_data_pipeline_spark.operators.diagnostics import (
        mad_outlier_report,
    )

    # Group 'a': values 1..9 (median 5, deviations 0..4, MAD 2) plus a
    # wild 1000.0 -> n=10, lower median of [1..9, 1000] is 5 at
    # rank 5; deviations [0,1,1,2,2,3,3,4,4,995], lower-median MAD at
    # rank 5 = 2; threshold 3*1.4826*2 = 8.8956 -> only 1000 flagged.
    rows = [("a", i, float(v)) for i, v in enumerate([1,2,3,4,5,6,7,8,9])]
    rows.append(("a", 99, 1000.0))
    rows += [("b", i, 7.0) for i in range(4)]   # constant group: MAD 0
    df = spark.createDataFrame(
        rows, "grp string, event_id long, value double"
    )
    got = {
        r.grp: (r.n_rows, r.med, r.mad, r.n_outliers)
        for r in mad_outlier_report(df, "grp", "value", "event_id").collect()
    }
    assert got["a"] == (10, 5.0, 2.0, 1)
    # MAD 0 (constant metric): anything not exactly the median is an
    # outlier; here all rows equal it, so none are.
    assert got["b"] == (4, 7.0, 0.0, 0)
