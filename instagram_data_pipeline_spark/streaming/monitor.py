"""Streaming data-quality monitor: per-micro-batch distribution drift
against a FROZEN reference histogram — the observability layer that
catches a broken upstream (unit change, dead segment, filter
regression) while the batch is landing, not after it poisons a
training run.

Same exactness discipline as ``extensions.sketches.histogram_drift``:
shares are never materialized as doubles — the L1 numerator is the
cross-multiplied integer

    sum_b | c_batch(b) * T_ref  -  c_ref(b) * T_batch |

with one integer floor-division to ppm at the end, so the alert
decision is bit-identical across engines and replays.

Scale shape: the per-batch histogram is ONE map-side-combined
aggregation; the driver reads back at most ``n_bins`` rows (a bounded
control-plane read, audited in the collect allowlist). Stats rows land
as one parquet partition per epoch with overwrite, so at-least-once
replays converge to exactly-once without a fence.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class QualityMonitorSink:
    """foreachBatch sink: per-epoch histogram stats + drift alert."""

    def __init__(
        self,
        root: str,
        reference: dict[int, int],
        lo: float,
        hi: float,
        n_bins: int = 10,
        alert_l1_ppm: int = 200_000,
        value_col: str = "value",
        dead_after: int = 3,
    ) -> None:
        if dead_after < 1:
            raise ValueError(
                f"QualityMonitorSink: dead_after must be >= 1 "
                f"(got {dead_after})"
            )
        if not reference or sum(reference.values()) <= 0:
            raise ValueError("QualityMonitorSink: empty reference")
        if not lo < hi:
            raise ValueError(
                f"QualityMonitorSink: lo must be < hi (got lo={lo}, "
                f"hi={hi}) — a zero/negative span would divide by zero "
                "inside the running stream"
            )
        if n_bins < 1:
            raise ValueError(
                f"QualityMonitorSink: n_bins must be >= 1 (got {n_bins})"
            )
        self.root = root
        self.ref = {int(b): int(c) for b, c in reference.items()}
        self.lo, self.hi, self.n_bins = lo, hi, n_bins
        self.alert_l1_ppm = alert_l1_ppm
        self.value_col = value_col
        self.dead_after = dead_after
        self._empty_streak = 0

    def _bin(self):
        span = self.hi - self.lo
        b = F.floor(
            (F.col(self.value_col).cast("double") - F.lit(self.lo))
            / F.lit(span) * F.lit(float(self.n_bins))
        ).cast("long")
        return F.least(F.lit(self.n_bins - 1), F.greatest(F.lit(0), b))

    @staticmethod
    def batch_histogram(
        df: DataFrame, value_col: str, lo: float, hi: float, n_bins: int
    ) -> dict[int, int]:
        """One map-side-combined aggregation -> {bin: count}; the
        driver read is <= n_bins rows (bounded)."""
        sink = QualityMonitorSink.__new__(QualityMonitorSink)
        sink.lo, sink.hi, sink.n_bins = lo, hi, n_bins
        sink.value_col = value_col
        rows = (
            df.filter(F.col(value_col).isNotNull())
            .select(sink._bin().alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        return {int(r.bin): int(r.c) for r in rows}

    def process_batch(self, df: DataFrame, epoch: int) -> None:
        counts = self.batch_histogram(
            df, self.value_col, self.lo, self.hi, self.n_bins
        )
        t_b = sum(counts.values())
        t_r = sum(self.ref.values())
        if t_b == 0:
            # "No data this trigger" is NOT distribution drift: idle
            # periods legitimately produce empty micro-batches, and a
            # fake maximal-drift l1 would page on every quiet trigger.
            # A genuinely dead upstream instead surfaces as the
            # separate dead_upstream flag after ``dead_after``
            # CONSECUTIVE empty batches (streak resets on data; it also
            # resets on restart, which only delays the flag — never
            # false-alarms). Drift alerting stays distribution-only.
            self._empty_streak += 1
            l1_ppm, alert = 0, False
            dead = self._empty_streak >= self.dead_after
        else:
            self._empty_streak = 0
            num = sum(
                abs(counts.get(b, 0) * t_r - self.ref.get(b, 0) * t_b)
                for b in range(self.n_bins)
            )
            l1_ppm = num * 1_000_000 // (t_b * t_r)
            alert = l1_ppm >= self.alert_l1_ppm
            dead = False
        spark = df.sparkSession
        row = spark.createDataFrame(
            [(int(t_b), int(l1_ppm), bool(alert), bool(dead))],
            "n_rows long, l1_ppm long, alert boolean, "
            "dead_upstream boolean",
        )
        # one partition per epoch, overwritten: replays converge
        row.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.root, "stats", f"epoch={int(epoch)}")
        )

    def results(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", os.path.join(
            self.root, "stats"
        )).parquet(os.path.join(self.root, "stats"))

    def __call__(self, df: DataFrame, epoch: int) -> None:
        self.process_batch(df, epoch)


def drift_report(
    batch: DataFrame,
    reference: DataFrame,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 10,
    alert_l1_ppm: int = 200_000,
) -> DataFrame:
    """Batch twin of :class:`QualityMonitorSink`: the SAME integer-exact
    cross-multiplied L1 drift decision, expressed as one pure DataFrame
    plan (no driver collect) so it can be DuckDB-oracle-checked — the
    hash-checked evidence for the streaming sink's alert math.

    Returns one row ``(n_rows, l1_ppm, alert, dead_upstream)``. The
    cross-multiplies run in DECIMAL(38,0) so the arithmetic stays exact
    at counts far beyond bigint cross-products (the sink uses Python
    ints; this is the codegen equivalent). An empty batch is NOT drift:
    l1_ppm = 0, alert stays false, and the separate ``dead_upstream``
    flag carries the no-data signal — the stateless twin of the sink's
    ``dead_after``-consecutive-empty streak (a single batch has no
    streak context, so it flags immediately; parity-test the sink with
    ``dead_after=1``).

    Plan shape: two map-side-combined histogram aggregations (n_bins
    rows each), a full-outer merge on bin, window totals over the tiny
    merged frame, one final aggregate. Nothing row-sized leaves the
    histogram stage, so the cost at 100 TB is the two scans."""
    if not lo < hi:
        raise ValueError(f"drift_report: lo must be < hi (got {lo}, {hi})")
    if n_bins < 1:
        raise ValueError(f"drift_report: n_bins must be >= 1 (got {n_bins})")
    from pyspark.sql import Window

    span = hi - lo

    def hist(df: DataFrame, out: str) -> DataFrame:
        b = F.floor(
            (F.col(value_col).cast("double") - F.lit(lo))
            / F.lit(span) * F.lit(float(n_bins))
        ).cast("long")
        b = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b))
        return (
            df.filter(F.col(value_col).isNotNull())
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    j = hist(batch, "cb").join(hist(reference, "cr"), "bin", "full")
    everything = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dec = "decimal(38,0)"
    cb = F.coalesce(F.col("cb"), F.lit(0)).cast(dec)
    cr = F.coalesce(F.col("cr"), F.lit(0)).cast(dec)
    j2 = j.select(
        cb.alias("cb"),
        cr.alias("cr"),
        F.sum(cb).over(everything).alias("tb"),
        F.sum(cr).over(everything).alias("tr"),
    )
    agg = j2.agg(
        F.sum(F.abs(F.col("cb") * F.col("tr") - F.col("cr") * F.col("tb")))
        .alias("num"),
        F.max("tb").alias("tb"),
        F.max("tr").alias("tr"),
    )
    tb = F.coalesce(F.col("tb"), F.lit(0).cast("decimal(38,0)"))
    l1 = F.when(tb == 0, F.lit(0).cast("long")).otherwise(
        F.floor(
            (F.col("num") * F.lit(1_000_000)) / (F.col("tb") * F.col("tr"))
        ).cast("long")
    )
    return agg.select(
        tb.cast("long").alias("n_rows"),
        l1.alias("l1_ppm"),
        ((tb > 0) & (l1 >= F.lit(alert_l1_ppm))).alias("alert"),
        (tb == 0).alias("dead_upstream"),
    )
