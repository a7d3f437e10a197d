"""Approximate aggregates: sketch results must land within documented
error of the exact answers (they can't be oracle-hashed — engine sketches
differ — so tolerance against exact IS the contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from instagram_data_pipeline_spark.io import load_testdata


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    li = load_testdata(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_percentile_approx_brackets_exact(spark, sf_dir):
    orders = load_testdata(spark, sf_dir, "orders")
    row = orders.agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
    ).collect()[0]
    # high-accuracy sketch: within 1% of the exact interpolated median
    assert abs(row.approx - row.exact) / row.exact < 0.01


def test_hll_error_bound(spark, sf_dir):
    """HLL++ estimate within 3*rsd of the exact distinct count."""
    import pyspark.sql.functions as F

    from instagram_data_pipeline_spark.io import load_testdata

    ev = load_testdata(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(3, 0.06 * r["exact"]), (
            r["event_type"], r["approx"], r["exact"],
        )


def test_portable_hll_error_bound_and_determinism(spark, sf_dir):
    """The engine-portable HLL (md5 registers, shared estimator) must
    land within HLL error bounds of the exact count — and, unlike
    approx_count_distinct, be bit-deterministic across runs (it is a
    pure function of the data, no engine-internal hashing)."""
    import pyspark.sql.functions as F

    from instagram_data_pipeline_spark.extensions.sketches import (
        portable_hll_distinct,
    )
    from instagram_data_pipeline_spark.io import load_testdata

    ev = load_testdata(spark, sf_dir, "events")
    est = portable_hll_distinct(ev, ["event_type"], "user_id", p=12)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact")
    )
    rows = est.join(exact, "event_type").collect()
    assert rows
    for r in rows:
        # m=4096 -> rsd ~1.6%; linear-counting regime is tighter still
        assert abs(r.approx_users - r.exact) <= max(3, 0.05 * r.exact), (
            r.event_type, r.approx_users, r.exact,
        )
    again = sorted(map(tuple, est.collect()))
    assert again == sorted(
        (r.event_type, r.approx_users) for r in rows
    )
