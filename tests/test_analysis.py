"""U1/U2: batched categorization table function + validation join,
mirroring the reference's mocked-LLM component tests
(tests/test_scraper.py:161-278)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from instagram_data_pipeline_spark.analysis.categorizer import (
    KeywordCategorizer,
    build_prompt,
    categorize_following,
    parse_response,
)
from instagram_data_pipeline_spark.analysis.interests import (
    default_categories,
    validate_results,
)
from instagram_data_pipeline_spark.testing import fixture_users


def test_keyword_categorizer_matches_reference_fixture_bios():
    model = KeywordCategorizer()
    out = model.categorize(
        [
            {"username": "fashionaccount", "full_name": "Fashion Blogger",
             "bio": "Fashion enthusiast. Sharing daily fashion tips and trends."},
            {"username": "techguru", "full_name": "Tech Expert",
             "bio": "Software engineer. AI enthusiast. Coding and machine learning."},
            {"username": "foodlover", "full_name": "Chef Michael",
             "bio": "Professional chef. Sharing recipes and food photography."},
            {"username": "empty", "full_name": None, "bio": None},
        ]
    )
    got = {r["username"]: r["category"] for r in out}
    assert got == {
        "fashionaccount": "Fashion",
        "techguru": "Technology",
        "foodlover": "Food",
    }  # 'empty' dropped: no keyword hits
    assert all(0.0 < r["confidence"] <= 0.95 for r in out)


def test_categorize_following_mapinpandas(spark):
    profiles = spark.createDataFrame(
        [
            ("fashionaccount", "Fashion Blogger", "fashion tips and style"),
            ("techguru", "Tech Expert", "software engineer coding ai"),
            ("nobody", None, None),
        ],
        "username string, full_name string, bio string",
    )
    out = categorize_following(profiles, batch_size=2).collect()
    got = {r.username: (r.category, r.confidence) for r in out}
    assert got["fashionaccount"][0] == "Fashion"
    assert got["techguru"][0] == "Technology"
    assert "nobody" not in got


def test_prompt_and_parse_roundtrip():
    prompt = build_prompt(
        [{"username": "u1", "full_name": "N", "bio": "B"}]
    )
    assert "u1" in prompt and "results" in prompt and "Fashion" in prompt
    parsed = parse_response(
        '{"results": [{"username": "u1", "category": "Fashion", '
        '"confidence": 0.9}, {"username": "u2", "category": "Cryptozoology"}, '
        '"garbage", {"no_username": 1}]}'
    )
    assert parsed[0] == {"username": "u1", "category": "Fashion", "confidence": 0.9}
    assert parsed[1]["confidence"] == 0.5  # missing confidence default
    assert len(parsed) == 2  # malformed entries dropped
    assert parse_response("not json") == []


def test_validate_results_drops_unknown_and_maps_ids(spark):
    users = fixture_users(spark)
    cats = default_categories(spark)
    results = spark.createDataFrame(
        [
            ("fashionaccount", "Fashion", 0.95),
            ("techguru", "Cryptozoology", 0.99),   # unknown -> dropped (P8)
            ("ghost_user", "Food", 0.9),           # unknown username -> dropped
            ("foodlover", "Food", None),           # null confidence -> 0.5
        ],
        "username string, category string, confidence double",
    )
    out = validate_results(results, users, cats).collect()
    got = {(r.user_id, r.category_id): r.confidence_score for r in out}
    assert len(got) == 2
    assert got[("following_0", 1)] == 0.95  # Fashion == category_id 1
    food_id = {r.category_name: r.category_id for r in cats.collect()}["Food"]
    assert got[("following_2", food_id)] == 0.5


def test_default_categories_shape(spark):
    cats = default_categories(spark)
    main = cats.filter(F.col("parent_category_id").isNull())
    sub = cats.filter(F.col("parent_category_id").isNotNull())
    assert main.count() == 18 and sub.count() == 9  # reference taxonomy
    names = {r.category_name for r in cats.collect()}
    assert {"Fashion", "Streetwear", "AI & Machine Learning"} <= names
