"""Multi-dimensional data layout: Z-order clustering for file skipping.

Partition pruning handles ONE dimension; queries that filter two or
more independent columns (e.g. ``l_partkey`` AND ``l_suppkey``) leave
every file overlapping on the second key under any single-column sort.
Z-ordering interleaves the bits of the filter columns into one
clustering key, so files become axis-aligned hyper-rectangles in key
space and a conjunctive range filter touches O(few) of them — this is
what Delta's OPTIMIZE ZORDER BY does; here it is plain expressions +
``repartitionByRange`` over vanilla parquet, with the min/max row-group
statistics parquet already writes doing the skipping.

Everything is built-in integer expressions (shiftleft/and/or) inside
whole-stage codegen — no UDFs. Ranks are normalized per column from a
1-row broadcast min/max frame, so the operator is a pure two-pass
DataFrame plan (stats pass + layout pass), no driver-side math over
data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Map a numeric column to an integer rank in [0, 2^bits): linear
    min/max scaling — rank fidelity is all Z-ordering needs ON
    ROUGHLY-UNIFORM columns. A power-law column collapses under linear
    ranks (most rows land in a handful of codes, one outlier stretches
    the range), degrading box pruning — use :func:`_equidepth_rank`
    for those."""
    span = (mx - mn).cast("double")
    scaled = F.when(
        span > 0,
        (
            (col.cast("double") - mn.cast("double"))
            / span
            * F.lit(float((1 << bits) - 1))
        ),
    ).otherwise(F.lit(0.0))
    return F.floor(scaled).cast("long")


#: rank resolution for equi-depth Z-ordering: 2^8 = 256 quantile
#: buckets per dimension. File-granularity pruning needs far fewer
#: distinct ranks than files, and 255 cut points keeps the
#: approx_percentile stats pass and the per-row fold cheap.
EQUIDEPTH_BITS = 8


def equidepth_bounds(col_name: str, bits: int = EQUIDEPTH_BITS) -> Column:
    """The (2^bits - 1) quantile cut points of a column as ONE
    approx_percentile aggregate — the stats-pass half of equi-depth
    ranking (computed once, broadcast as part of the 1-row stats
    frame)."""
    n = (1 << bits) - 1
    probs = ", ".join(f"{(i + 1) / (n + 1)!r}" for i in range(n))
    return F.expr(
        f"approx_percentile(CAST({col_name} AS DOUBLE), array({probs}))"
    )


def _equidepth_rank(col: Column, bounds: Column) -> Column:
    """Equi-depth rank: the number of quantile cut points <= value —
    every rank bucket holds ~the same ROW COUNT whatever the value
    distribution, so Z-order boxes stay balanced under power-law skew
    (the reason Delta's OPTIMIZE uses range_partition_id, i.e. rank
    space, not raw value space). One JVM-side HOF fold over the
    broadcast bounds array; NULL ranks 0 (placement only — zone maps
    over-approximate)."""
    return F.aggregate(
        bounds,
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(col.cast("double") >= b, 1).otherwise(0),
    )


def zorder_key(ranks: list[Column], bits: int = 16) -> Column:
    """Interleave ``bits`` bits from each rank column into one long.

    With k columns the result uses k*bits bits: output bit (i*k + j)
    takes bit i of column j — the classic Morton code, as a sum of
    shifted masked terms (pure codegen; 2 cols x 16 bits = 32 terms).
    """
    k = len(ranks)
    terms = []
    for j, r in enumerate(ranks):
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(r, i).bitwiseAND(F.lit(1)), i * k + j
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    equidepth: bool = False,
) -> DataFrame:
    """Return ``df`` re-clustered on the Z-order key of ``cols`` into
    ``n_files`` range partitions, rows sorted by key within each — write
    the result with ``.write.parquet`` and every file covers a compact
    hyper-rectangle of the key space (tight min/max stats per column).

    The stats frame is 1 row, broadcast — the only extra pass.
    ``repartitionByRange`` samples the key to build balanced range
    bounds, so skew in the raw columns does not skew file SIZES; with
    ``equidepth=True`` the per-column ranks themselves are quantile
    buckets (``EQUIDEPTH_BITS``-bit), so a power-law column also keeps
    balanced box PRUNING (linear min/max ranks collapse its dense
    region into a few codes)."""
    if equidepth:
        bits = EQUIDEPTH_BITS
        stats = F.broadcast(
            df.agg(
                *[equidepth_bounds(c, bits).alias(f"_bd_{c}")
                  for c in cols]
            )
        )
        with_key = df.crossJoin(stats).withColumn(
            "_z",
            zorder_key(
                [
                    _equidepth_rank(F.col(c), F.col(f"_bd_{c}"))
                    for c in cols
                ],
                bits,
            ),
        ).drop(*[f"_bd_{c}" for c in cols])
    else:
        aggs = []
        for c in cols:
            aggs += [
                F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")
            ]
        stats = F.broadcast(df.agg(*aggs))
        with_key = df.crossJoin(stats).withColumn(
            "_z",
            zorder_key(
                [
                    _normalize(
                        F.col(c), F.col(f"_mn_{c}"), F.col(f"_mx_{c}"),
                        bits,
                    )
                    for c in cols
                ],
                bits,
            ),
        ).drop(*[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols])
    return (
        with_key.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
