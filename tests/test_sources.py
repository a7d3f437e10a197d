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
