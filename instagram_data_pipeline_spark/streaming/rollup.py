"""Continuous rollup: incrementally-maintained multi-granularity time
aggregates (the hypertable / continuous-aggregate pattern, task north
star).

A raw event stream maintains bucketed aggregate TABLES (hourly, daily)
that answer dashboard queries without scanning raw data. In Structured
Streaming the maintenance is a ``foreachBatch`` sink: each micro-batch
is bucketed and MERGED into the rollup tables by (bucket, dims) key —
counts and sums add (the aggregate is a monoid, same property that makes
the CMS sketch mergeable), so replays must be fenced (epoch skip) rather
than re-added. Bucket arithmetic is pure column math (``date_trunc``),
so the same ``rollup_increment`` powers batch backfills and the
streaming path identically.

Scale: the rollup tables are stored partitioned by bucket DATE, and the
merge reads + rewrites only the dates present in the micro-batch
(dynamic partition overwrite via ``Warehouse.overwrite_partitions``) —
an anti-join-free upsert because counters ADD instead of replace. A
steady stream touches 1-2 date partitions per batch regardless of how
much history the rollup holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import Warehouse

GRAINS = {"hour": "hour", "day": "day"}


def rollup_increment(
    batch: DataFrame, grain: str, ts_col: str = "ts"
) -> DataFrame:
    """Aggregate one slice of events to (bucket, event_type) partial
    sums — the monoid element merged into the rollup table."""
    bucket = F.date_trunc(GRAINS[grain], F.col(ts_col))
    return (
        batch.groupBy(
            bucket.alias("bucket"), F.col("event_type")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,10)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def merge_rollup(existing: DataFrame, increment: DataFrame) -> DataFrame:
    """Counter-wise merge by (bucket, event_type): counts/sums add."""
    return (
        existing.unionByName(increment)
        .groupBy("bucket", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum(F.col("total_value").cast("decimal(28,10)"))
            .cast("double")
            .alias("total_value"),
        )
    )


class ContinuousRollupSink:
    """foreachBatch sink maintaining one rollup table per grain.

    Epoch replays are skipped, and the epoch is fenced only AFTER every
    grain's merge committed — with additive merges, fencing first would
    silently LOSE a batch whose write failed (the retry would be
    skipped). The fence set is in-memory: the guarantee is
    within-process, same-instance dedup only, and a replay after a
    partial success (one grain committed, the next failed) double-counts
    the committed grain — the transactional fix is a table format whose
    MERGE carries the epoch id.

    Storage: each rollup table is partitioned by bucket date
    (``_pd=yyyy-MM-dd``); a merge reads only the touched dates and
    rewrites only those partitions."""

    PART_COL = "_pd"

    def __init__(self, warehouse: Warehouse, grains: tuple[str, ...] = ("hour", "day"),
                 prefix: str = "rollup"):
        self.wh = warehouse
        self.grains = grains
        self.prefix = prefix
        self.epochs: set[int] = set()

    def table(self, grain: str) -> str:
        return f"{self.prefix}_{grain}"

    def read(self, grain: str) -> DataFrame:
        """Rollup contents without the internal date-partition column."""
        return self.wh.read(self.table(grain)).drop(self.PART_COL)

    def _with_pd(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            self.PART_COL, F.date_format("bucket", "yyyy-MM-dd")
        )

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id in self.epochs:
            return
        if not batch_df.isEmpty():
            for grain in self.grains:
                self._merge_grain(batch_df, grain)
        # fence only after all grains committed (see class docstring)
        self.epochs.add(epoch_id)

    def _merge_grain(self, batch_df: DataFrame, grain: str) -> None:
        inc = rollup_increment(batch_df, grain)
        name = self.table(grain)
        if not self.wh.exists(name):
            self._with_pd(inc).write.partitionBy(self.PART_COL).mode(
                "overwrite"
            ).parquet(self.wh.path(name))
            return
        # touched dates: tiny driver-side list (1-2 for a steady stream)
        touched = [
            r[0]
            for r in self._with_pd(inc)
            .select(self.PART_COL)
            .dropDuplicates()
            .collect()
        ]
        scoped = (
            self.wh.read(name)
            .filter(F.col(self.PART_COL).cast("string").isin(touched))
            .drop(self.PART_COL)
        )
        merged = self._with_pd(merge_rollup(scoped, inc))
        self.wh.overwrite_partitions(name, merged, self.PART_COL)
