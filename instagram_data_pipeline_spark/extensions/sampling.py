"""Dataset splitting + sampling for training pipelines.

The canonical reproducible split: bucket every record by a hash of its
key and carve buckets into train/val/test. Properties that matter at
100 TB: deterministic (no RNG state, same split every run, any engine),
stable under appends (a record's split never changes), and computable
in a single narrow projection (no shuffle, no join).

md5 is used as the portable hash (same answer in Spark, DuckDB, any
warehouse SQL) — at ingest-scale cost is negligible next to IO.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def split_bucket(key: Column) -> Column:
    """Stable bucket in [0, N_BUCKETS): first 8 hex digits of
    md5(key-as-string), mod buckets. SQL mirror:
    CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % N."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
    return F.pmod(h.cast("long"), F.lit(N_BUCKETS))


def assign_split(
    df: DataFrame,
    key_col: str,
    train: float = 0.9,
    val: float = 0.05,
    split_col: str = "split",
) -> DataFrame:
    """Label rows train/val/test by stable key-hash buckets."""
    b = split_bucket(F.col(key_col))
    t_edge = int(train * N_BUCKETS)
    v_edge = t_edge + int(val * N_BUCKETS)
    return df.withColumn(
        split_col,
        F.when(b < t_edge, F.lit("train"))
        .when(b < v_edge, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float
) -> DataFrame:
    """Stable fraction-sample: keep keys whose bucket falls below the
    cut. Unlike df.sample() this is reproducible across runs/engines
    and consistent for the same key across tables (joinable samples)."""
    cut = int(fraction * N_BUCKETS)
    return df.filter(split_bucket(F.col(key_col)) < cut)
