"""JSONL (newline-delimited JSON) source with corrupt-record quarantine.

The workhorse interchange format for web corpora and model-output dumps
(every public crawl/pipeline release ships JSONL next to parquet). At
100 TB the operational problem isn't parsing — it's the handful of
truncated/garbled lines per shard that must neither fail the job
(FAILFAST) nor vanish silently (DROPMALFORMED). This reader uses
Spark's native JSON DataSource in PERMISSIVE mode with an explicit
corrupt-record column: good lines parse to the typed schema, bad lines
land with their raw bytes in ``_corrupt_record`` for quarantine — one
scan, no Python, splittable per-file parallelism like any text source.

Reference parity: the reference persists scraped rows straight to
relational tables (``instagram_scraper.py``); a line-oriented ingest
with quarantine is the engine-side generalization of that load path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Read JSONL at ``path`` under ``schema``; adds ``quarantined``
    (bool) and keeps the raw line in ``_corrupt_record`` for bad rows.

    The schema is REQUIRED on purpose: schema inference is a second
    full scan of the data — never acceptable at corpus scale — and
    inference also can't distinguish "corrupt" from "new field".
    """
    full = schema.add(T.StructField(CORRUPT_COL, T.StringType()))
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return df.withColumn(
        "quarantined", F.col(CORRUPT_COL).isNotNull()
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad): good rows drop the corrupt column; bad rows carry
    only the raw line — the shape you'd write to a quarantine sink for
    re-parse after an upstream fix.

    The scan is cached first: Spark refuses plans whose referenced
    columns are ONLY the internal corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    documented remedy is materializing the parse once — which is also
    what you want operationally, since good and bad sides both read it.
    """
    df = df.cache()
    good = df.filter(~F.col("quarantined")).drop(CORRUPT_COL, "quarantined")
    bad = df.filter(F.col("quarantined")).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad
