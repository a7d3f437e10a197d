"""As-of join and range join semantics: ties, tolerance, unmatched rows,
interval boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from instagram_data_pipeline_spark.operators.asof import (
    asof_join,
    range_bucket_join,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_asof_backward_match_ties_and_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(5)), (2, 200, _ts(10)),
         (3, 300, _ts(1))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 900, _ts(5)), (1, 901, _ts(7)), (2, 902, _ts(10))],
        "user_id long, click_id long, ts timestamp",
    )
    out = {r.event_id: r for r in
           asof_join(left, right, on="user_id",
                     right_cols=["click_id"]).collect()}
    assert out[100].click_id_r == 901      # latest right <= ts(10)
    assert out[101].click_id_r == 900      # tie: right at EXACTLY ts(5) matches
    assert out[200].click_id_r == 902      # tie at same ts for other key
    assert out[300].click_id_r is None     # no right row at or before
    assert out[300].ts_r is None


def test_asof_tolerance_cutoff(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(100))], "user_id long, event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, 900, _ts(10))], "user_id long, click_id long, ts timestamp"
    )
    hit = asof_join(left, right, on="user_id", right_cols=["click_id"],
                    tolerance_us=90_000_000).collect()[0]
    assert hit.click_id_r == 900  # 90s old, tolerance exactly 90s -> match
    miss = asof_join(left, right, on="user_id", right_cols=["click_id"],
                     tolerance_us=89_999_999).collect()[0]
    assert miss.click_id_r is None and miss.ts_r is None


def test_asof_does_not_cross_keys(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10))], "user_id long, event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(2, 900, _ts(5))], "user_id long, click_id long, ts timestamp"
    )
    out = asof_join(left, right, on="user_id", right_cols=["click_id"]).collect()
    assert out[0].click_id_r is None


def test_range_bucket_join_boundaries(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 749.99), (3, 750.0), (4, 5000.0), (5, -10.0)],
        "pid long, x double",
    )
    bands = spark.createDataFrame(
        [(0, 0.0, 749.99), (1, 750.0, 1499.99)],
        "band_id long, lo double, hi double",
    )
    out = {r.pid: r.band_id for r in
           range_bucket_join(points, bands, "x", "lo", "hi",
                             bucket_width=500.0).collect()}
    # inclusive on both ends; out-of-range points drop (inner join)
    assert out == {1: 0, 2: 0, 3: 1}


def test_range_bucket_join_matches_naive_theta(spark, sf_dir):
    from instagram_data_pipeline_spark.io import load_testdata

    li = load_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    ).limit(500)
    bands = spark.range(150).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 750.0).alias("lo"),
        (F.col("id") * 750.0 + 749.99).alias("hi"),
    )
    fast = range_bucket_join(li, bands, "l_extendedprice", "lo", "hi", 500.0)
    naive = li.join(
        bands,
        (F.col("l_extendedprice") >= F.col("lo"))
        & (F.col("l_extendedprice") <= F.col("hi")),
    )
    a = sorted((r.l_orderkey, r.l_linenumber, r.band_id) for r in fast.collect())
    b = sorted((r.l_orderkey, r.l_linenumber, r.band_id) for r in naive.collect())
    assert a == b


def test_asof_forward_match_ties_tolerance_and_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(6)), (2, 200, _ts(10)),
         (3, 300, _ts(50))],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 900, _ts(6)), (1, 901, _ts(20)), (2, 902, _ts(10))],
        "user_id long, purchase_id long, ts timestamp",
    )
    out = {r.event_id: r for r in
           asof_join(left, right, on="user_id",
                     right_cols=["purchase_id"],
                     direction="forward").collect()}
    assert out[100].purchase_id_r == 901   # earliest right >= ts(10)
    assert out[101].purchase_id_r == 900   # tie: right at EXACTLY ts(6)
    assert out[200].purchase_id_r == 902   # tie at same ts for other key
    assert out[300].purchase_id_r is None  # nothing at or after ts(50)

    # tolerance: next right is 10s ahead; 5s window drops it
    tight = {r.event_id: r for r in
             asof_join(left, right, on="user_id",
                       right_cols=["purchase_id"],
                       direction="forward",
                       tolerance_us=5_000_000).collect()}
    assert tight[100].purchase_id_r is None
    assert tight[101].purchase_id_r == 900  # zero-gap tie survives


def test_asof_direction_validated(spark):
    import pytest

    left = spark.createDataFrame(
        [(1, 1, _ts(0))], "user_id long, event_id long, ts timestamp"
    )
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, left, on="user_id", direction="sideways")


def test_multitouch_linear_and_position_weights(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from instagram_data_pipeline_spark.operators.asof import (
        multitouch_attribution,
    )

    def ts(m):
        return datetime(2024, 1, 1, 12, m)

    conv = spark.createDataFrame(
        [(1, ts(30), 100, 12.0), (2, ts(30), 200, 9.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    touches = spark.createDataFrame(
        # user 1: three touches inside the hour, one outside
        [(1, ts(0), 11), (1, ts(10), 12), (1, ts(29), 13),
         (1, datetime(2024, 1, 1, 10, 0), 10),
         # user 2: single touch
         (2, ts(5), 21)],
        "user_id long, ts timestamp, click_id long",
    )
    lin = multitouch_attribution(conv, touches, window="1 hour")
    got = {(r.user_id, r.click_id): (r.weight, r.credited)
           for r in lin.collect()}
    assert (1, 10) not in got  # outside the window
    assert got[(1, 11)][0] == got[(1, 12)][0] == got[(1, 13)][0]
    assert abs(got[(1, 11)][0] - 1 / 3) < 1e-9
    assert abs(sum(v for _, v in
                   [got[(1, c)] for c in (11, 12, 13)]) - 12.0) < 1e-4
    assert got[(2, 21)] == (1.0, 9.0)

    pos = multitouch_attribution(conv, touches, window="1 hour",
                                 position_weighted=True)
    pgot = {(r.user_id, r.click_id): r.weight for r in pos.collect()}
    # n=3: first/last get 2/5, middle 1/5
    assert abs(pgot[(1, 11)] - 0.4) < 1e-9
    assert abs(pgot[(1, 12)] - 0.2) < 1e-9
    assert abs(pgot[(1, 13)] - 0.4) < 1e-9
    assert pgot[(2, 21)] == 1.0
