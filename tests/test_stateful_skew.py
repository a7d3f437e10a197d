"""Custom stateful streaming operator (applyInPandasWithState) + the
salted-join skew utility."""

from __future__ import annotations

import datetime as dt
import uuid

import pytest
from pyspark.sql import functions as F

from instagram_data_pipeline_spark.operators.skew import salted_join
from instagram_data_pipeline_spark.schemas import EVENTS
from instagram_data_pipeline_spark.streaming.events import (
    run_available_now,
    stream_from_parquet,
)
from instagram_data_pipeline_spark.streaming.stateful import quota_gate


def test_quota_gate_stateful_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    # user 7: 5 events across TWO files (state must persist across
    # micro-batches); user 8: 2 events
    f1 = [(i, base + dt.timedelta(minutes=i), 7, "click", 1.0, None) for i in range(3)]
    f1 += [(10, base, 8, "view", 1.0, None)]
    f2 = [(i, base + dt.timedelta(minutes=i), 7, "click", 1.0, None) for i in range(3, 6)]
    f2 += [(11, base + dt.timedelta(minutes=9), 8, "view", 1.0, None)]
    spark.createDataFrame(f1, EVENTS).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(f2, EVENTS).coalesce(1).write.mode("append").parquet(src)

    stream = stream_from_parquet(spark, src, max_files_per_trigger=1)
    gated = quota_gate(stream, quota=4)
    qname = f"q_{uuid.uuid4().hex[:8]}"
    run_available_now(gated, qname, str(tmp_path / "ckpt"))
    rows = spark.table(qname).collect()

    admitted = {(r.user_id, r.event_id) for r in rows if r.admitted}
    rejected = {(r.user_id, r.event_id) for r in rows if not r.admitted}
    u7_admitted = sorted(e for u, e in admitted if u == 7)
    assert len(u7_admitted) == 4          # quota caps at 4 across batches
    assert len([e for u, e in rejected if u == 7]) == 2  # audit rows kept
    assert u7_admitted == [0, 1, 2, 3]    # admission in event order
    assert len([e for u, e in admitted if u == 8]) == 2  # under quota


@pytest.fixture()
def skewed(spark):
    # hot key 1 (500 rows), cold keys 2..50 (1 row each)
    rows = [(1, i) for i in range(500)] + [(k, 0) for k in range(2, 51)]
    big = spark.createDataFrame(rows, "k long, payload long")
    small = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(1, 51)], "k long, name string"
    )
    return big, small


def test_salted_join_matches_plain_join(skewed):
    big, small = skewed
    plain = big.join(small, ["k"], "inner").select("k", "payload", "name")
    salted = salted_join(big, small, ["k"], salt=8).select("k", "payload", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(skewed):
    big, small = skewed
    lonely = big.union(big.sparkSession.createDataFrame([(99, 1)], "k long, payload long"))
    plain = lonely.join(small, ["k"], "left").select("k", "payload", "name")
    salted = salted_join(lonely, small, ["k"], salt=4, how="left").select(
        "k", "payload", "name"
    )
    assert sorted(map(tuple, plain.collect()), key=str) == sorted(
        map(tuple, salted.collect()), key=str
    )


def test_salted_join_spreads_hot_key(skewed):
    big, small = skewed
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8))
    n_salts = (
        big.filter(F.col("k") == 1)
        .select(salt_col.cast("int").alias("s"))
        .distinct()
        .count()
    )
    assert n_salts >= 6  # the hot key really fans out across sub-keys


# ---------------------------------------------------------------------------
# Celebrity fan-out through the flagship J1 operator (SURVEY §7 risk 5)
# ---------------------------------------------------------------------------

@pytest.fixture()
def celebrity_edges(spark):
    """Genuinely skewed edge tables: user 1 (the celebrity) holds ~98% of
    all edges; users 2..40 have 2 edges each. Mutual overlap is planted:
    the celebrity follows back every 3rd follower."""
    followers = [(1, f) for f in range(100, 4100)]  # 4000 followers
    followers += [(u, 50 + u) for u in range(2, 41)]
    followers += [(u, 90 + u) for u in range(2, 41)]
    following = [(1, f) for f in range(100, 4100, 3)]  # every 3rd back
    following += [(u, 50 + u) for u in range(2, 41)]  # mutual for all
    f1 = spark.createDataFrame(followers, "user_id long, follower_id long")
    f2 = spark.createDataFrame(following, "user_id long, following_id long")
    return f1, f2


def test_mutual_edges_salted_parity_on_celebrity_fanout(spark, celebrity_edges):
    from instagram_data_pipeline_spark.operators.mutuals import (
        mutual_edges,
        mutual_edges_intersect,
        mutual_edges_salted,
    )

    f1, f2 = celebrity_edges
    plain = sorted(map(tuple, mutual_edges(f1, f2).collect()))
    salted = sorted(map(tuple, mutual_edges_salted(f1, f2, salt=8).collect()))
    setform = sorted(map(tuple, mutual_edges_intersect(f1, f2).collect()))
    assert salted == plain == setform
    # sanity: the skew is real and the overlap planted as designed
    assert len(plain) == 1334 + 39  # ceil(4000/3) celebrity + 39 normals
    celeb = [p for p in plain if p[0] == 1]
    assert len(celeb) == 1334


def test_mutual_edges_salted_spreads_celebrity_key(spark, celebrity_edges):
    """The salted plan must spread the hot user's rows across salt
    sub-keys — no single (user, salt) group holds all celebrity edges."""
    from pyspark.sql import functions as F

    f1, _ = celebrity_edges
    salt_col = F.pmod(
        F.xxhash64(F.col("user_id"), F.col("follower_id")), F.lit(8)
    ).cast("int")
    dist = (
        f1.filter(F.col("user_id") == 1)
        .withColumn("_salt", salt_col)
        .groupBy("_salt")
        .count()
        .collect()
    )
    assert len(dist) == 8  # every sub-key takes a share
    assert max(r["count"] for r in dist) < 4000  # nobody holds it all
