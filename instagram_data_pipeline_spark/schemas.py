"""Explicit schemas for every engine table.

Two families:

* the 7 reference-shaped tables (PostgreSQL DDL at
  ``reference:instagram_pipeline/database/setup.py:27-127``), re-typed for
  Spark — SERIAL becomes a caller-assigned BIGINT surrogate (unique, not
  dense; see ``writes.assign_ids``);
* the 10 driver testdata tables (``/root/testdata/sf*/*.parquet``).

Core tables never rely on schema inference: readers pass these StructTypes.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Reference-shaped tables (setup.py:39-123)
# --------------------------------------------------------------------------

USERS = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("username", T.StringType(), False),
        T.StructField("full_name", T.StringType(), True),
        T.StructField("bio", T.StringType(), True),
        T.StructField("profile_pic_url", T.StringType(), True),
        T.StructField("follower_count", T.IntegerType(), True),
        T.StructField("following_count", T.IntegerType(), True),
        T.StructField("is_private", T.BooleanType(), True),
        T.StructField("last_updated", T.TimestampType(), True),
    ]
)

FOLLOWERS = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("follower_id", T.StringType(), False),
        T.StructField("follow_date", T.TimestampType(), True),
    ]
)

FOLLOWING = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("following_id", T.StringType(), False),
        T.StructField("follow_date", T.TimestampType(), True),
    ]
)

MUTUALS = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("mutual_id", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

INTEREST_CATEGORIES = T.StructType(
    [
        T.StructField("category_id", T.IntegerType(), False),
        T.StructField("category_name", T.StringType(), False),
        T.StructField("parent_category_id", T.IntegerType(), True),
        T.StructField("description", T.StringType(), True),
    ]
)

INTERESTS = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("category_id", T.IntegerType(), False),
        T.StructField("confidence_score", T.DoubleType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

SCRAPE_JOBS = T.StructType(
    [
        T.StructField("job_id", T.LongType(), False),
        T.StructField("target_username", T.StringType(), False),
        T.StructField("job_type", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("completed_at", T.TimestampType(), True),
        T.StructField("last_cursor", T.StringType(), True),
        T.StructField("total_items", T.IntegerType(), True),
        T.StructField("processed_items", T.IntegerType(), True),
        T.StructField("error_message", T.StringType(), True),
    ]
)

REFERENCE_TABLES: dict[str, T.StructType] = {
    "users": USERS,
    "followers": FOLLOWERS,
    "following": FOLLOWING,
    "mutuals": MUTUALS,
    "interest_categories": INTEREST_CATEGORIES,
    "interests": INTERESTS,
    "scrape_jobs": SCRAPE_JOBS,
}

# Uniqueness contracts the reference enforced with UNIQUE constraints
# (setup.py:61, 72, 83, 94, 106) — enforced procedurally by writes.py.
UNIQUE_KEYS: dict[str, list[str]] = {
    "users": ["user_id"],
    "followers": ["user_id", "follower_id"],
    "following": ["user_id", "following_id"],
    "mutuals": ["user_id", "mutual_id"],
    "interest_categories": ["category_name"],
    "interests": ["user_id", "category_id"],
    "scrape_jobs": ["job_id"],
}

# --------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md)
# --------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), True),
        T.StructField("r_name", T.StringType(), True),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), True),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), True),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), True),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), True),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TESTDATA_TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
