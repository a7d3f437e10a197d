"""Flagship J1 semantics on reference-shaped fixtures (FIXTURES.md)."""

from __future__ import annotations

from instagram_data_pipeline_spark.operators.mutuals import (
    mutual_edges,
    mutual_edges_intersect,
)
from instagram_data_pipeline_spark.testing import fixture_edges


def test_mutuals_planted_overlap(spark):
    followers, following = fixture_edges(spark)
    got = {
        (r.user_id, r.mutual_id)
        for r in mutual_edges(followers, following).collect()
    }
    assert got == {("12345", "following_0"), ("12345", "follower_1")}


def test_mutuals_per_user_filter(spark):
    followers, following = fixture_edges(spark)
    got = mutual_edges(followers, following, user_id="lurker_9").collect()
    assert got == []  # lurker_9 has follower_0 in, following_2 out — no overlap


def test_intersect_formulation_agrees(spark):
    followers, following = fixture_edges(spark)
    a = set(map(tuple, mutual_edges(followers, following).collect()))
    b = set(map(tuple, mutual_edges_intersect(followers, following).collect()))
    assert a == b


def test_mutuals_dedups_dirty_ingest(spark):
    followers, following = fixture_edges(spark)
    dirty = followers.union(followers)  # duplicate-key ingest attempt
    got = mutual_edges(dirty, following).collect()
    assert len(got) == 2  # dedup before join: no multiplied matches
