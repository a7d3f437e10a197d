"""Test support: DuckDB oracle comparison + reference-shaped fixtures.

The compare mimics the driver's correctness gate: row count, column-name
set, and an order-insensitive value comparison after sorting columns by
name (FIXTURES.md determinism rules).
"""

from __future__ import annotations

import datetime as dt
import math
from pathlib import Path

import duckdb
from pyspark.sql import DataFrame, SparkSession

from .schemas import (
    FOLLOWERS,
    FOLLOWING,
    INTEREST_CATEGORIES,
    INTERESTS,
    SCRAPE_JOBS,
    USERS,
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for p in sorted(Path(sf_dir).glob("*.parquet")):
        con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(v):
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("f", float(v)) if abs(v) < 2**52 else ("i", v)
    if v is None:
        return ("z",)
    return ("s", str(v))


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def nested_output_columns(sdf: DataFrame) -> list[str]:
    """Columns whose type the DRIVER's canonicalizer cannot sort.

    The driver harness canonicalizes results with a pandas
    ``sort_values`` over every column; ARRAY/MAP/STRUCT values arrive as
    Python lists/dicts, which are unhashable there and crash the row
    (VERDICT r5 #1 — ``pca_project_fixed``). Our own tuple-based
    ``normalize`` above handles them fine, which is exactly how that
    escaped five CI-green runs: the CI gate was not harness-faithful on
    output dtypes. Every oracle-paired query's FINAL schema must
    therefore be scalar-only; this returns the offending column names.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def compare_to_oracle(
    sdf: DataFrame, con: duckdb.DuckDBPyConnection, sql: str
) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    bad = nested_output_columns(sdf)
    if bad:
        return [
            f"driver-incompatible nested output columns {bad} — the "
            "driver's pandas canonicalizer cannot sort ARRAY/MAP/STRUCT; "
            "reshape to scalar columns (posexplode or p0..pN)"
        ]
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    problems: list[str] = []
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
    if not problems:
        ns, nd = normalize(srows, scols), normalize(drows, dcols)
        if ns != nd:
            i = next((i for i, (a, b) in enumerate(zip(ns, nd)) if a != b), -1)
            problems.append(
                f"values differ at sorted row {i}: "
                f"{ns[i] if i >= 0 else ''} != {nd[i] if i >= 0 else ''}"
            )
    return problems


# ---------------------------------------------------------------------------
# Reference-shaped fixtures (FIXTURES.md; pattern from the reference's own
# component tests, tests/test_scraper.py:44-116)
# ---------------------------------------------------------------------------

TS = dt.datetime(2024, 1, 15, 12, 0, 0)


def _ts(days: int = 0, hours: int = 0) -> dt.datetime:
    return TS + dt.timedelta(days=days, hours=hours)


def fixture_users(spark: SparkSession) -> DataFrame:
    rows = [
        ("12345", "instagram", "Instagram", "Official account", None, 600, 100, False, _ts()),
        ("following_0", "fashionaccount", "Fashion Blogger",
         "Fashion enthusiast. Sharing daily fashion tips and trends.", None, 10, 5, False, _ts()),
        ("following_1", "techguru", "Tech Expert",
         "Software engineer. AI enthusiast. Coding and machine learning.", None, 20, 8, True, _ts()),
        ("following_2", "foodlover", "Chef Michael",
         "Professional chef. Sharing recipes and food photography.", None, 30, 9, False, _ts()),
        ("follower_0", "fan_zero", None, None, None, 1, 2, False, _ts()),
        ("follower_1", "fan_one", "Fan One", None, None, 2, 3, True, _ts()),
        ("lurker_9", "lurker", "Lurker", "just watching", None, 0, 0, False, _ts()),
    ]
    return spark.createDataFrame(rows, USERS)


def fixture_edges(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """followers + following for user 12345 with a planted overlap.

    Mutuals of 12345 must be exactly {following_0, follower_1}: present in
    both edge sets; follower_0 only follows, following_1/2 only followed.
    """
    followers = spark.createDataFrame(
        [
            (1, "12345", "follower_0", _ts(-3)),
            (2, "12345", "follower_1", _ts(-2)),
            (3, "12345", "following_0", _ts(-1)),
            (4, "lurker_9", "follower_0", _ts(-1)),
        ],
        FOLLOWERS,
    )
    following = spark.createDataFrame(
        [
            (1, "12345", "following_0", _ts(-3)),
            (2, "12345", "following_1", _ts(-3)),
            (3, "12345", "following_2", _ts(-2)),
            (4, "12345", "follower_1", _ts(-1)),
            (5, "lurker_9", "following_2", _ts(-1)),
        ],
        FOLLOWING,
    )
    return followers, following


def fixture_categories(spark: SparkSession) -> DataFrame:
    """Subset of the reference taxonomy (interest_analyzer.py:42-93)."""
    rows = [
        (1, "Fashion", None, "Fashion and style"),
        (2, "Technology", None, "Tech and innovation"),
        (3, "Food", None, "Food and cooking"),
        (4, "Sports", None, "Sports"),
        (5, "Streetwear", 1, "Urban fashion"),
        (6, "Luxury Fashion", 1, "High-end fashion"),
        (7, "AI & Machine Learning", 2, "AI/ML"),
        (8, "Programming", 2, "Software development"),
        (9, "Football", 4, "Football"),
    ]
    return spark.createDataFrame(rows, INTEREST_CATEGORIES)


def fixture_interests(spark: SparkSession) -> DataFrame:
    rows = [
        (1, "following_0", 1, 0.95, _ts()),
        (2, "following_1", 2, 0.92, _ts()),
    ]
    return spark.createDataFrame(rows, INTERESTS)


def fixture_jobs(spark: SparkSession) -> DataFrame:
    """Ledger rows: pending FIFO mix, completed pairs vs singletons,
    inside/outside the 7-day dedup window, one failure."""
    rows = [
        (1, "instagram", "profile", "completed", _ts(-10), _ts(-10), None, 1, 1, None),
        (2, "instagram", "followers", "completed", _ts(-2), _ts(-2), None, 3, 3, None),
        (3, "instagram", "following", "completed", _ts(-2), _ts(-2), None, 4, 4, None),
        (4, "lurker", "followers", "completed", _ts(-1), _ts(-1), None, 1, 1, None),
        (5, "lurker", "following", "pending", None, None, None, None, 0, None),
        (6, "fashionaccount", "profile", "pending", None, None, None, None, 0, None),
        (7, "techguru", "profile", "pending", None, None, None, None, 0, None),
        (8, "foodlover", "profile", "failed", _ts(-1), None, None, None, 0, "boom"),
    ]
    return spark.createDataFrame(rows, SCRAPE_JOBS)
