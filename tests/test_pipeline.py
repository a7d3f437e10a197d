"""End-to-end lifecycles on a temp warehouse: the manual 5-stage DAG and
the quota-gated scheduler (SURVEY §3.1-§3.2) — the rebuild analog of the
reference's tests/test_pipeline.py integration suite, hermetic."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from instagram_data_pipeline_spark.plans.manual import Pipeline
from instagram_data_pipeline_spark.plans.scheduler import JobScheduler
from instagram_data_pipeline_spark.schemas import FOLLOWERS, FOLLOWING, USERS
from instagram_data_pipeline_spark.testing import fixture_edges, fixture_users

NOW = dt.datetime(2024, 1, 20, 12, 0, 0)


@pytest.fixture()
def pipeline(spark, tmp_path):
    return Pipeline(spark, str(tmp_path / "wh"), now=NOW)


def _profile(spark):
    return fixture_users(spark).filter(F.col("user_id") == "12345")


def test_manual_dag_end_to_end(spark, pipeline):
    users = fixture_users(spark)
    followers, following = fixture_edges(spark)
    pipeline.upsert_profiles(users)  # seed all profiles
    # complete 'following' jobs so stage 5 sees pending users (J3 gate)
    from instagram_data_pipeline_spark.schemas import SCRAPE_JOBS

    jobs = spark.createDataFrame(
        [
            (1, "instagram", "followers", "completed", NOW, NOW, None, 3, 3, None),
            (2, "instagram", "following", "completed", NOW, NOW, None, 4, 4, None),
        ],
        SCRAPE_JOBS,
    )
    pipeline.wh.overwrite_atomic("scrape_jobs", jobs)

    stats = pipeline.run_manual(_profile(spark), followers, following)
    assert stats["followers"] == 4 and stats["following"] == 5
    assert stats["mutuals"] == 2  # the planted overlap
    got = {
        (r.user_id, r.mutual_id)
        for r in pipeline.wh.read("mutuals").collect()
    }
    assert got == {("12345", "following_0"), ("12345", "follower_1")}
    # interests stored for 12345's followings with category-signal bios
    interests = pipeline.wh.read("interests")
    assert stats["interests"] >= 3 and interests.count() >= 3


def test_manual_dag_idempotent(spark, pipeline):
    users = fixture_users(spark)
    followers, following = fixture_edges(spark)
    pipeline.upsert_profiles(users)
    s1 = pipeline.run_manual(_profile(spark), followers, following)
    s2 = pipeline.run_manual(_profile(spark), followers, following)
    # second run: every insert-if-absent path is a no-op
    assert s2["followers"] == 0 and s2["following"] == 0 and s2["mutuals"] == 0
    assert pipeline.wh.read("users").count() == pipeline.wh.read("users").dropDuplicates(["user_id"]).count()


def test_edge_append_creates_stub_users(spark, pipeline):
    followers, _ = fixture_edges(spark)
    pipeline.append_edges("followers", followers, "follower_id")
    users = pipeline.wh.read("users")
    # endpoints materialized as stub rows (username == user_id)
    stub = users.filter(F.col("user_id") == "follower_0").collect()[0]
    assert stub.username == "follower_0" and stub.bio is None


# ---------------------------------------------------------------------------
# Scheduler (SURVEY §3.2)
# ---------------------------------------------------------------------------


@pytest.fixture()
def sched(spark, pipeline):
    return JobScheduler(spark, pipeline.wh, daily_quota=200, batch_size=10, now=NOW)


def test_enqueue_respects_7day_window(spark, pipeline, sched):
    assert sched.enqueue_users(["alice", "bob"]) == 6  # 3 types x 2 users
    # re-enqueue before any run: jobs are pending (no started_at) -> the
    # 7-day guard keys on started_at, so pending dupes are re-enqueued in
    # the reference too; run one then retry
    handlers = {t: (lambda u: None) for t in ("profile", "followers", "following")}
    sched.process_pending_jobs(handlers)
    assert sched.enqueue_users(["alice", "bob"]) == 0  # started within 7d
    assert sched.enqueue_users(["carol"]) == 3


def test_scheduler_tick_dispatch_and_ledger(spark, pipeline, sched):
    sched.enqueue_users(["alice"])
    seen = []
    handlers = {
        "profile": lambda u: seen.append(("profile", u)),
        "followers": lambda u: seen.append(("followers", u)),
        "following": lambda u: (_ for _ in ()).throw(RuntimeError("rate limited")),
    }
    stats = sched.process_pending_jobs(handlers)
    assert stats == {"dispatched": 3, "completed": 2, "failed": 1}
    jobs = {r.job_type: r for r in pipeline.wh.read("scrape_jobs").collect()}
    assert jobs["profile"].status == "completed"
    assert jobs["following"].status == "failed"
    assert jobs["following"].error_message == "rate limited"
    assert jobs["profile"].completed_at is not None


def test_scheduler_quota_gate(spark, pipeline):
    tight = JobScheduler(spark, pipeline.wh, daily_quota=2, batch_size=10, now=NOW)
    tight.enqueue_users(["alice", "bob"])
    handlers = {t: (lambda u: None) for t in ("profile", "followers", "following")}
    s1 = tight.process_pending_jobs(handlers)
    assert s1["dispatched"] == 2  # capped by quota, not batch size
    s2 = tight.process_pending_jobs(handlers)
    assert s2["dispatched"] == 0  # quota exhausted for the day
    # next day: quota resets (T3 reset-on-day-change)
    tomorrow = JobScheduler(
        spark, pipeline.wh, daily_quota=2, batch_size=10,
        now=NOW + dt.timedelta(days=1),
    )
    assert tomorrow.process_pending_jobs(handlers)["dispatched"] == 2


def test_completeness_trigger_fires_mutuals(spark, pipeline, sched):
    users = fixture_users(spark)
    followers, following = fixture_edges(spark)
    pipeline.upsert_profiles(users)
    pipeline.append_edges("followers", followers, "follower_id")
    pipeline.append_edges("following", following, "following_id")
    sched.enqueue_users(["instagram"])
    fired = []
    handlers = {t: (lambda u: None) for t in ("profile", "followers", "following")}
    sched.process_pending_jobs(
        handlers, on_both_complete=lambda u: fired.append(u)
    )
    # both followers+following completed in this tick -> trigger fired
    # (once per completed edge-job row, T7)
    assert fired == ["instagram", "instagram"]
    assert pipeline.derive_mutuals("12345") == 2
