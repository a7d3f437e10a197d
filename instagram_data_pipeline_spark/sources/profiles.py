"""S3: profile-record ingest — the reference's in-flight dict IR
(``instagram_scraper.py:181-190``: an 8-field dict per profile) parsed
from JSON lines into the typed users table.

The scraper emitted one dict per HTTP fetch; a landed deployment writes
those as JSON-lines files, and this connector parses them with the
explicit schema (F5: ``from_json``) — no inference, bad records
quarantined, counts preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import USERS

# The raw dict shape the scraper produced (instagram_scraper.py:181-190)
RAW_PROFILE = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("username", T.StringType()),
        T.StructField("full_name", T.StringType()),
        T.StructField("bio", T.StringType()),
        T.StructField("profile_pic_url", T.StringType()),
        T.StructField("follower_count", T.LongType()),
        T.StructField("following_count", T.LongType()),
        T.StructField("is_private", T.BooleanType()),
    ]
)


def parse_profile_records(
    raw: DataFrame, json_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) from a DataFrame of JSON strings.

    Good rows are users-shaped (minus last_updated — the writer stamps
    it, A1); quarantine keeps the raw payload for replay. A record is
    quarantined when it fails to parse or misses the keys the reference
    treated as mandatory (user_id, username)."""
    parsed = raw.withColumn("_rec", F.from_json(F.col(json_col), RAW_PROFILE))
    good = (
        parsed.filter(
            F.col("_rec").isNotNull()
            & F.col("_rec.user_id").isNotNull()
            & F.col("_rec.username").isNotNull()
        )
        .select(
            F.col("_rec.user_id").alias("user_id"),
            F.col("_rec.username").alias("username"),
            F.col("_rec.full_name").alias("full_name"),
            F.col("_rec.bio").alias("bio"),
            F.col("_rec.profile_pic_url").alias("profile_pic_url"),
            F.col("_rec.follower_count").cast("int").alias("follower_count"),
            F.col("_rec.following_count").cast("int").alias("following_count"),
            F.col("_rec.is_private").alias("is_private"),
            F.lit(None).cast("timestamp").alias("last_updated"),
        )
    )
    bad = parsed.filter(
        F.col("_rec").isNull()
        | F.col("_rec.user_id").isNull()
        | F.col("_rec.username").isNull()
    ).select(F.col(json_col).alias("raw_payload"))
    return good, bad


def read_profile_jsonl(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Read landed JSON-lines profile records from disk."""
    raw = spark.read.text(path)
    return parse_profile_records(raw, "value")
