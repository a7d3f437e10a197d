"""CSV/TSV source with malformed-row quarantine.

Same operational contract as :mod:`.jsonl`: typed rows under an
explicit REQUIRED schema, damaged rows (wrong column count, type
garbage, broken quoting) quarantined with their raw bytes in
``_corrupt_record`` instead of failing the job (FAILFAST) or silently
vanishing (DROPMALFORMED). Spark's native CSV DataSource does the
parsing — splittable, whole-stage codegen downstream, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .jsonl import CORRUPT_COL


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ",",
    header: bool = False,
) -> DataFrame:
    """Read delimited text at ``path`` under ``schema``; adds
    ``quarantined`` (bool), raw line kept in ``_corrupt_record`` for
    bad rows. Schema is required — inference is a second full scan and
    can't tell "corrupt" from "schema drift"."""
    full = schema.add(T.StructField(CORRUPT_COL, T.StringType()))
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("sep", sep)
        .option("header", str(header).lower())
        .csv(path)
    )
    return df.withColumn(
        "quarantined", F.col(CORRUPT_COL).isNotNull()
    )
