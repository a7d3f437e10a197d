"""Bucketed-table layout: co-located joins without a shuffle — the 100 TB
strategy for the edge tables (SURVEY §4: partition fact/edge tables by
join key)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from instagram_data_pipeline_spark.io import write_bucketed
from instagram_data_pipeline_spark.operators.mutuals import mutual_edges
from instagram_data_pipeline_spark.testing import fixture_edges


@pytest.fixture(scope="module")
def bucketed_edges(spark):
    followers, following = fixture_edges(spark)
    write_bucketed(followers, "b_followers", 4, ["user_id"])
    write_bucketed(following, "b_following", 4, ["user_id"])
    return spark.table("b_followers"), spark.table("b_following")


def test_bucketed_join_has_no_exchange(spark, bucketed_edges):
    followers, following = bucketed_edges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = followers.join(following, "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucket co-location, no shuffle
        assert "Bucketed: true" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucket_pruning_per_user_filter(spark, bucketed_edges):
    """The per-user mutuals variant (J1's WHERE user_id=%s) reads ONE
    bucket of a bucketed edge table, not the full table."""
    followers, _ = bucketed_edges
    # autoBucketedScan skips bucketed reads when no operator needs the
    # distribution — turn it off so the filter-only scan bucket-prunes
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = (
            followers.filter(F.col("user_id") == "12345")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SelectedBucketsCount: 1 out of 4" in plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")


def test_partitioned_write_prunes(spark, tmp_path):
    """Date-partitioned layout: a day predicate must prune at the file
    index (PartitionFilters), not post-scan."""
    from instagram_data_pipeline_spark.io import load_testdata

    events = load_testdata(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "events_by_day")
    events.withColumn("day", F.to_date("ts")).write.partitionBy("day").parquet(out)
    back = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan
    got = back.count()
    expected = events.filter(F.to_date("ts") == "2024-01-05").count()
    assert got == expected > 0


def test_bucketed_mutuals_same_result(spark, bucketed_edges):
    b_followers, b_following = bucketed_edges
    followers, following = fixture_edges(spark)
    plain = sorted(map(tuple, mutual_edges(followers, following).collect()))
    bucketed = sorted(map(tuple, mutual_edges(b_followers, b_following).collect()))
    assert plain == bucketed


def test_registered_bucketed_join_plan_is_hinted_smj(spark):
    """The REGISTERED query's returned DataFrame must itself carry the
    bucketed sort-merge plan — via the in-plan MERGE hint, not a
    restored session conf — so any later explain (the driver's plans
    dump included) shows the strategy the query actually runs: SMJ on
    two bucketed scans, the ONLY exchange being the final nationkey
    aggregate, and no broadcast fallback."""
    from instagram_data_pipeline_spark.queries import load_all

    spec = load_all()["bucketed_join"]
    df = spec.spark_fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert plan.count("Exchange") == 1  # the groupBy(nationkey) only
    assert plan.count("Bucketed: true") == 2


def test_bucketed_join_query_plan_and_oracle_shape(spark):
    """The registered `bucketed_join` query's join must hit the
    bucketed sort-merge path with ZERO exchange below the aggregate
    (the write-time shuffle is the only one ever paid for this key)."""
    from instagram_data_pipeline_spark.io import load_testdata, write_bucketed

    sf = "/root/testdata/sf0.001"
    orders = load_testdata(spark, sf, "orders").select("o_custkey", "o_totalprice")
    customer = load_testdata(spark, sf, "customer").select("c_custkey", "c_nationkey")
    write_bucketed(orders, "bjt_orders", 8, ["o_custkey"])
    write_bucketed(customer, "bjt_customer", 8, ["c_custkey"])
    b_o, b_c = spark.table("bjt_orders"), spark.table("bjt_customer")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = b_o.join(b_c, b_o.o_custkey == b_c.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert plan.count("Bucketed: true") == 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_sorted_bucketed_join_needs_no_sort_at_all(spark):
    """The FULL bucketed-layout story: write each side ONCE as
    bucketBy(k).sortBy(k) with one file per bucket, and a sort-merge
    join on the key needs neither an Exchange NOR a Sort — the
    write-time layout pays for both forever after. Requires one file
    per bucket (a multi-file bucket's concatenated read order isn't
    sorted) plus the sorted-scan conf, which Spark gates because of
    exactly that multi-file hazard."""
    from instagram_data_pipeline_spark.io import load_testdata, write_bucketed

    sf = "/root/testdata/sf0.001"
    o = load_testdata(spark, sf, "orders").select(
        "o_custkey", "o_totalprice"
    ).repartition(1)
    c = load_testdata(spark, sf, "customer").select(
        "c_custkey", "c_nationkey"
    ).repartition(1)
    write_bucketed(o, "sorted_o", 4, ["o_custkey"], sort_cols=["o_custkey"])
    write_bucketed(c, "sorted_c", 4, ["c_custkey"], sort_cols=["c_custkey"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    try:
        bo, bc = spark.table("sorted_o"), spark.table("sorted_c")
        j = bo.join(bc, bo.o_custkey == bc.c_custkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert "Sort [" not in plan  # scan order satisfies the SMJ
        # and the sort-free plan returns the same rows as a plain join
        got = j.count()
        expected = o.join(c, o.o_custkey == c.c_custkey).count()
        assert got == expected > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset(
            "spark.sql.legacy.bucketedTableScan.outputOrdering"
        )
