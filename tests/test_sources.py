"""Ingest boundary (S3): JSON-lines profile parsing with quarantine, and
env-driven engine config."""

from __future__ import annotations

from instagram_data_pipeline_spark.config import EngineConfig, load_config
from instagram_data_pipeline_spark.sources.profiles import (
    parse_profile_records,
    read_profile_jsonl,
)

GOOD = '{"user_id": "u1", "username": "alice", "full_name": "Alice", "bio": "hi", "profile_pic_url": null, "follower_count": 10, "following_count": 5, "is_private": false}'
MISSING_KEY = '{"username": "no_id"}'
GARBAGE = "not json at all {"


def test_parse_profiles_good_and_quarantine(spark):
    raw = spark.createDataFrame(
        [(GOOD,), (MISSING_KEY,), (GARBAGE,)], "value string"
    )
    good, bad = parse_profile_records(raw)
    rows = good.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == "u1" and r.follower_count == 10 and r.is_private is False
    assert r.last_updated is None  # the writer stamps it (A1)
    quarantined = {b.raw_payload for b in bad.collect()}
    assert quarantined == {MISSING_KEY, GARBAGE}


def test_read_profile_jsonl_roundtrip(spark, tmp_path):
    p = tmp_path / "profiles.jsonl"
    p.write_text(GOOD + "\n" + GARBAGE + "\n")
    good, bad = read_profile_jsonl(spark, str(p))
    assert good.count() == 1 and bad.count() == 1
    # good output is upsert-ready: schema matches the users table
    from instagram_data_pipeline_spark.schemas import USERS

    assert [f.name for f in good.schema.fields] == [f.name for f in USERS.fields]


def test_config_defaults_and_env(monkeypatch):
    cfg = load_config()
    assert cfg.daily_quota == 200 and cfg.batch_size == 10
    assert cfg.model_batch_size == 20 and cfg.analysis_limit == 5
    monkeypatch.setenv("PIPELINE_DAILY_QUOTA", "7")
    monkeypatch.setenv("PIPELINE_BATCH_SIZE", "junk")  # bad value -> default
    cfg2 = load_config()
    assert cfg2.daily_quota == 7 and cfg2.batch_size == 10


# ---------------------------------------------------------------------------
# S4/S5 live-source connector: protocol + file-landing adapter
# ---------------------------------------------------------------------------

def test_landing_adapter_pages_to_files(spark, tmp_path):
    from instagram_data_pipeline_spark.sources.live import (
        FakePaginatedSource,
        FileLandingAdapter,
        read_edges,
    )

    spool = str(tmp_path / "spool")
    adapter = FileLandingAdapter(spool)
    n = adapter.land(FakePaginatedSource(35, page_size=10), "acct")
    assert n == 35
    import os

    files = [f for f in os.listdir(spool) if f.endswith(".jsonl")]
    assert len(files) == 4  # 10+10+10+5
    assert not [f for f in os.listdir(spool) if f.endswith(".tmp")]
    raw = read_edges(spark, spool)
    assert raw.count() == 35
    # max_count honored (the reference's early break)
    n2 = FileLandingAdapter(str(tmp_path / "s2")).land(
        FakePaginatedSource(100, page_size=10), "acct", max_count=25
    )
    assert n2 == 25


def test_parse_edge_records_edges_and_stubs(spark, tmp_path):
    from instagram_data_pipeline_spark.sources.live import (
        FakePaginatedSource,
        FileLandingAdapter,
        parse_edge_records,
        read_edges,
    )

    spool = str(tmp_path / "spool")
    FileLandingAdapter(spool).land(FakePaginatedSource(12, page_size=5), "acct")
    edges, stubs = parse_edge_records(read_edges(spark, spool))
    e = edges.collect()
    assert len(e) == 12
    assert all(r.relation == "followers" and r.user_id == "acct" for r in e)
    s = {r.user_id: r for r in stubs.collect()}
    assert len(s) == 12
    assert s["acct_f0"].username == "fan_0" and s["acct_f0"].is_private is True
    assert s["acct_f1"].bio is None  # stub profile, to be enriched later


def test_spool_streams_as_micro_batches(spark, tmp_path, tmp_path_factory):
    """Each landed page file becomes one micro-batch under
    maxFilesPerTrigger=1 — pagination maps 1:1 onto triggers (T3), and
    the checkpoint is the resumable cursor (T6)."""
    from instagram_data_pipeline_spark.sources.live import (
        FakePaginatedSource,
        FileLandingAdapter,
        stream_edges,
    )

    spool = str(tmp_path / "spool")
    FileLandingAdapter(spool).land(FakePaginatedSource(30, page_size=10), "acct")
    epochs = []
    q = (
        stream_edges(spark, spool, max_files_per_trigger=1)
        .writeStream.foreachBatch(
            lambda df, eid: epochs.append((eid, df.count()))
        )
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert [n for _, n in epochs if n > 0] == [10, 10, 10]
