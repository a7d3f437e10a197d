"""IO layer: warehouse DDL semantics, atomic overwrite, format roundtrips."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from instagram_data_pipeline_spark.io import (
    Warehouse,
    load_testdata,
    read_source,
    register_testdata_views,
    write_sink,
)
from instagram_data_pipeline_spark.schemas import TESTDATA_TABLES, USERS
from instagram_data_pipeline_spark.testing import fixture_users


def test_ensure_tables_idempotent(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.ensure_tables()
    users = fixture_users(spark)
    wh.overwrite_atomic("users", users)
    wh.ensure_tables()  # must NOT clobber existing data (IF NOT EXISTS)
    assert wh.read("users").count() == users.count()


def test_overwrite_atomic_self_read(spark, tmp_path):
    """A plan reading the table it overwrites must not race its input."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.ensure_tables()
    wh.overwrite_atomic("users", fixture_users(spark))
    current = wh.read("users").withColumn("follower_count", F.lit(1))
    wh.overwrite_atomic("users", current)  # derived from its own table
    assert wh.read("users").count() == fixture_users(spark).count()
    assert all(r.follower_count == 1 for r in wh.read("users").collect())


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc"])
def test_format_roundtrip(spark, tmp_path, fmt):
    users = fixture_users(spark).select(
        "user_id", "username", "follower_count", "is_private"
    )
    path = str(tmp_path / f"out_{fmt}")
    write_sink(users, path, fmt=fmt)
    back = read_source(spark, path, fmt=fmt, schema=users.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, users.collect()))


def test_register_views_sql_access(spark, sf_dir):
    register_testdata_views(spark, sf_dir)
    n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0].n
    assert n == load_testdata(spark, sf_dir, "lineitem").count()
    assert set(TESTDATA_TABLES) <= {
        t.name for t in spark.catalog.listTables()
    }
