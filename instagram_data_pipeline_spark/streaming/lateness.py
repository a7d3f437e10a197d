"""Watermark late-data accounting: what the watermark DROPS, counted —
the first question an operator asks a 100 TB streaming ingest ("are we
silently losing events?") and exactly what a bare windowed aggregation
cannot answer, because Structured Streaming discards late rows BEFORE
any user-visible operator.

The accounting replicates the engine's published watermark rule
(Structured Streaming guide): the watermark after micro-batch k is
``max(event_time seen in batches <= k) - delay``, and it gates the
NEXT batch — a row in batch k+1 with ``event_time < watermark_k`` is
dropped. :class:`LateDataAccountingSink` applies that rule per epoch
from inside ``foreachBatch`` and records per-window admitted vs
late-discarded counts; :func:`late_data_accounting` is the pure-plan
batch twin over data carrying an arrival-batch column, so the identical
decision is DuckDB-replayable (the ``monitor.drift_report`` pattern).

Scale shape: per batch, ONE map-side-combined aggregation for the max
event time (1-row bounded driver read) and ONE window-grouped count
aggregation; stats land as one tiny parquet partition per epoch with
overwrite, so at-least-once replays converge. The batch twin is two
aggregations plus a broadcast of the #batches-sized watermark table —
nothing row-sized shuffles twice.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LateDataAccountingSink:
    """foreachBatch sink: per-epoch, per-window admitted/late counts
    under the engine's watermark semantics.

    The running max event time lives in the sink instance for the
    query's lifetime (the engine keeps the real watermark in the
    checkpoint; a restart of THIS accounting resets it to -inf, which
    only under-counts lateness for one batch — it never drops data,
    because the accounting observes, it does not filter)."""

    def __init__(
        self,
        root: str,
        ts_col: str = "ts",
        delay_seconds: int = 3600,
        window_seconds: int = 3600,
    ) -> None:
        if delay_seconds < 0 or window_seconds <= 0:
            raise ValueError(
                "LateDataAccountingSink: delay_seconds must be >= 0 and "
                f"window_seconds > 0 (got {delay_seconds}, "
                f"{window_seconds})"
            )
        self.root = root
        self.ts_col = ts_col
        self.delay = int(delay_seconds)
        self.window = int(window_seconds)
        self._max_seen: int | None = None  # epoch seconds

    def process_batch(self, df: DataFrame, epoch: int) -> None:
        ts = F.col(self.ts_col)
        wm = (
            None if self._max_seen is None else self._max_seen - self.delay
        )
        late = (
            F.lit(False)
            if wm is None
            else F.unix_timestamp(ts) < F.lit(wm)
        )
        counts = (
            df.filter(ts.isNotNull())
            .groupBy(
                F.window(ts, f"{self.window} seconds")
                .start.alias("window_start")
            )
            .agg(
                F.sum(F.when(~late, 1).otherwise(0)).cast("long")
                .alias("n_admitted"),
                F.sum(F.when(late, 1).otherwise(0)).cast("long")
                .alias("n_late"),
            )
            .withColumn("epoch", F.lit(int(epoch)).cast("long"))
        )
        spark = df.sparkSession
        out = os.path.join(self.root, "stats", f"epoch={int(epoch)}")
        counts.select(
            "window_start", "n_admitted", "n_late"
        ).coalesce(1).write.mode("overwrite").parquet(out)
        # advance the replicated watermark AFTER the batch (the
        # engine's rule: batch k's data can never be dropped by the
        # watermark its own max produces) — one bounded 1-row read
        row = df.agg(
            F.max(F.unix_timestamp(ts)).alias("mx")
        ).collect()[0]
        if row.mx is not None:
            self._max_seen = (
                int(row.mx)
                if self._max_seen is None
                else max(self._max_seen, int(row.mx))
            )

    def __call__(self, df: DataFrame, epoch: int) -> None:
        self.process_batch(df, epoch)

    def results(self, spark: SparkSession) -> DataFrame:
        base = os.path.join(self.root, "stats")
        return spark.read.option("basePath", base).parquet(base)

    def totals(self, spark: SparkSession) -> DataFrame:
        """Per-window totals across all epochs — the shape the batch
        twin produces."""
        return (
            self.results(spark)
            .groupBy("window_start")
            .agg(
                F.sum("n_admitted").cast("long").alias("n_admitted"),
                F.sum("n_late").cast("long").alias("n_late"),
            )
        )


def late_data_accounting(
    df: DataFrame,
    batch_col: str,
    ts_col: str = "ts",
    delay_seconds: int = 3600,
    window_seconds: int = 3600,
) -> DataFrame:
    """Pure-plan batch twin of :class:`LateDataAccountingSink`: given
    historical data carrying an arrival-batch column, replay the
    watermark rule — watermark for batch k is ``max(ts of batches < k)
    - delay``; a row is late iff its event time is strictly below its
    batch's watermark — and return per-window ``(window_start,
    n_admitted, n_late)``.

    Plan: one per-batch max aggregation (#batches rows), a running-max
    window over that TINY frame (control-plane sized; the unpartitioned
    window never sees row-scale data), one broadcast join back onto the
    rows, one window-grouped count. At 100 TB the row side is touched
    exactly twice (max + count), both map-side combined."""
    ts = F.col(ts_col)
    per_batch = (
        df.filter(ts.isNotNull())
        .groupBy(F.col(batch_col).alias("_b"))
        .agg(F.max(F.unix_timestamp(ts)).alias("_mx"))
    )
    from pyspark.sql import Window

    prev = (
        Window.orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wm = per_batch.select(
        "_b",
        (F.max("_mx").over(prev) - F.lit(delay_seconds)).alias("_wm"),
    )
    rows = df.filter(ts.isNotNull()).join(
        F.broadcast(wm), F.col(batch_col) == F.col("_b"), "left"
    )
    late = F.col("_wm").isNotNull() & (
        F.unix_timestamp(ts) < F.col("_wm")
    )
    return (
        rows.groupBy(
            F.window(ts, f"{window_seconds} seconds")
            .start.alias("window_start")
        )
        .agg(
            F.sum(F.when(~late, 1).otherwise(0)).cast("long")
            .alias("n_admitted"),
            F.sum(F.when(late, 1).otherwise(0)).cast("long")
            .alias("n_late"),
        )
    )
