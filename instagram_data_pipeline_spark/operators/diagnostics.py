"""Operability diagnostics: key-skew profiling and declarative data
constraints — the checks a 100 TB deployment runs BEFORE trusting a
join plan or a landed batch.

The reference pipeline trusts its inputs implicitly (psycopg2 inserts
in instagram_pipeline/database/db_manager.py perform no validation
beyond the DDL types); at warehouse scale both halves below are
standing infrastructure:

* :func:`skew_report` — the empirical answer to "will this key
  shuffle?" A celebrity key that owns 10% of a fact table turns a
  sort-merge join into one straggler task; the report surfaces exactly
  which keys and how badly, feeding the choice of salting factor /
  AQE skew thresholds / broadcast cutoffs.
* :func:`check_constraints` — Deequ-style declarative expectations
  (not-null, uniqueness, range, referential integrity) evaluated in
  ONE pass per table side, producing a small violations report instead
  of a crash deep inside a downstream join.

Everything is built-in expressions — aggregations the optimizer
map-side combines; nothing collects more than the report itself.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def skew_report(
    df: DataFrame,
    keys: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Top-``top_n`` heaviest key groups with exact integer shares.

    Output per heavy key: the key columns, ``n_rows``, ``share_ppm``
    (floor(n * 1e6 / total) — integer-exact, engine-portable), and
    ``skew_factor_x100`` = floor(n * n_keys * 100 / total): 100 means
    the key holds exactly its uniform share; 10_000 means 100x uniform
    — a salting candidate. One shuffle (the key count), then a
    top-k over the count frame (TakeOrderedAndProject-sized)."""
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"), F.count(F.lit(1)).alias("_nkeys")
    )
    order = [F.col("n_rows").desc()] + [F.col(k) for k in keys]
    # orderBy + limit plans TakeOrderedAndProject (per-partition top-n,
    # merged on the driver) — NOT a global single-partition window sort,
    # which would funnel the whole count frame through one task at
    # exactly the scale this diagnostic targets. The rank window then
    # runs over only the top_n surviving rows.
    top = (
        counts.crossJoin(F.broadcast(totals)).orderBy(*order).limit(top_n)
    )
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            *keys,
            "n_rows",
            F.floor(F.col("n_rows") * 1000000 / F.col("_total"))
            .cast("long")
            .alias("share_ppm"),
            F.floor(F.col("n_rows") * F.col("_nkeys") * 100 / F.col("_total"))
            .cast("long")
            .alias("skew_factor_x100"),
            "rank",
        )
    )


@dataclass
class Constraint:
    """One declarative expectation. ``predicate`` marks a VIOLATING row
    (True = bad); constraints whose violation needs another frame
    (uniqueness, referential integrity) use the dedicated helpers."""

    name: str
    predicate: Column


def not_null(name: str, *cols: str) -> Constraint:
    cond = F.lit(False)
    for c in cols:
        cond = cond | F.col(c).isNull()
    return Constraint(name, cond)


def in_range(name: str, col: str, lo, hi) -> Constraint:
    return Constraint(
        name, F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi)
    )


def matches(name: str, col: str, pattern: str) -> Constraint:
    return Constraint(
        name, F.col(col).isNull() | ~F.col(col).rlike(pattern)
    )


def check_constraints(
    df: DataFrame,
    constraints: list[Constraint],
    unique_keys: Optional[list[list[str]]] = None,
    references: Optional[list[tuple[list[str], DataFrame, list[str]]]] = None,
) -> DataFrame:
    """Evaluate every expectation and return the report frame
    ``(constraint, n_checked, n_violations)``.

    Row-local constraints fold into ONE aggregation pass (each is a
    conditional count — map-side combined, single scan regardless of
    how many constraints are declared). ``unique_keys`` adds one
    count-per-key aggregation per key set (rows beyond the first of a
    key count as violations); ``references`` adds one anti-join per
    foreign key (child rows whose key is absent from the parent
    frame). The report is a handful of rows — collect it freely."""
    parts: list[DataFrame] = []
    if constraints:
        total = F.count(F.lit(1))
        aggs = [total.alias("n_checked")] + [
            F.sum(c.predicate.cast("long")).alias(c.name) for c in constraints
        ]
        row_local = df.agg(*aggs)
        names = [c.name for c in constraints]
        parts.append(
            row_local.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(n).alias("constraint"),
                                F.col("n_checked").alias("n_checked"),
                                F.coalesce(F.col(n), F.lit(0)).alias(
                                    "n_violations"
                                ),
                            )
                            for n in names
                        ]
                    )
                ).alias("r")
            ).select("r.constraint", "r.n_checked", "r.n_violations")
        )
    for keyset in unique_keys or []:
        name = "unique(" + ",".join(keyset) + ")"
        dup = (
            df.groupBy(*keyset)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.coalesce(F.sum("_n"), F.lit(0)).alias("n_checked"),
                F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias(
                    "n_violations"
                ),
            )
            .select(
                F.lit(name).alias("constraint"), "n_checked", "n_violations"
            )
        )
        parts.append(dup)
    for child_keys, parent, parent_keys in references or []:
        name = "ref(" + ",".join(child_keys) + ")"
        cond = None
        for ck, pk in zip(child_keys, parent_keys):
            c = df[ck] == parent[pk]
            cond = c if cond is None else (cond & c)
        orphans = df.join(parent, cond, "left_anti")
        ref = (
            df.agg(F.count(F.lit(1)).alias("n_checked"))
            .crossJoin(
                F.broadcast(
                    orphans.agg(F.count(F.lit(1)).alias("n_violations"))
                )
            )
            .select(
                F.lit(name).alias("constraint"), "n_checked", "n_violations"
            )
        )
        parts.append(ref)
    if not parts:
        raise ValueError("check_constraints: no expectations declared")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def join_size_preflight(
    df: DataFrame,
    keys: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Pre-flight cardinality check for a SELF-join on ``keys``: the
    exact output size is ``sum_k c(k)^2`` over the key-count table, so
    the blowup is computable from ONE cheap aggregation before
    committing to the join (the mutual-edges/sessionize self-joins die
    at scale precisely when one hot key contributes c^2 of the total).
    Returns the ``top_n`` keys by contribution with integer share-ppm
    of the estimated join output — the keys to salt, cap, or drop.

    Plan: one groupBy on the join keys, a 1-row total broadcast back
    over the count table, ordered-limit (TakeOrderedAndProject). The
    count table is #distinct-keys sized; nothing row-sized shuffles
    twice.

    All blowup arithmetic runs in DECIMAL(38,0): a hot key with >~3.03M
    rows makes ``pairs * 1_000_000`` exceed 2^63, and BIGINT multiply
    silently wraps under non-ANSI Spark — producing negative share_ppm
    exactly in the celebrity-key regime this preflight exists to catch.
    The decimal cross-multiply + integer ``div`` is engine-exact and
    matches the oracle's ``//`` at any count."""
    n_dec = F.count(F.lit(1)).cast("decimal(38,0)")
    c = df.groupBy(*keys).agg(n_dec.alias("_n"))
    tot = c.agg(F.sum(F.col("_n") * F.col("_n")).alias("_total"))
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            *keys,
            F.col("_n").cast("long").alias("n_rows"),
            (F.col("_n") * F.col("_n")).cast("long").alias("pairs"),
            F.expr("CAST((_n * _n * 1000000) div _total AS BIGINT)")
            .alias("share_ppm"),
            F.col("_total").cast("long").alias("est_join_rows"),
        )
        .orderBy(F.col("pairs").desc(), *keys)
        .limit(top_n)
    )


def mad_outlier_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    c: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier report via median absolute deviation:
    flag x where |x - median| > c * 1.4826 * MAD (1.4826 scales MAD to
    sigma under normality — Hampel's rule). Median/MAD resist the very
    outliers a mean/stddev z-score would absorb, which is why data
    monitors use them for metric anomalies.

    Engine-exactness: both medians are LOWER medians SELECTED by rank
    (ordered by (value, id), rank = (n+1) div 2) — never interpolated —
    so no averaging float enters the decision; deviations and the
    c*1.4826*MAD threshold use one shared expression shape, making the
    outlier count bit-stable across engines.

    Shape: two windowed selections + one aggregate, all shuffling on
    the group key only. Exact grouped medians sort within groups — for
    100 TB-scale groups use the mergeable histogram sketch twin
    (``extensions.sketches.grouped_quantile_sketch``); this exact
    report is for the bounded-cardinality monitoring grain (per
    metric/day), where a group fits a partition.
    """
    n_w = Window.partitionBy(group_col)
    rank_w = n_w.orderBy(F.col(value_col).asc(), F.col(id_col).asc())
    base = (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("_rn", F.row_number().over(rank_w))
        .withColumn("_n", F.count(F.lit(1)).over(n_w))
    )
    med = base.filter(
        F.col("_rn") == F.floor((F.col("_n") + 1) / 2)
    ).select(F.col(group_col), F.col(value_col).alias("_med"))
    dev = (
        df.filter(F.col(value_col).isNotNull())
        .join(med, group_col)
        .withColumn("_dev", F.abs(F.col(value_col) - F.col("_med")))
    )
    dev_rank_w = Window.partitionBy(group_col).orderBy(
        F.col("_dev").asc(), F.col(id_col).asc()
    )
    devs = (
        dev.withColumn("_rn", F.row_number().over(dev_rank_w))
        .withColumn("_n", F.count(F.lit(1)).over(n_w))
    )
    mad = devs.filter(
        F.col("_rn") == F.floor((F.col("_n") + 1) / 2)
    ).select(F.col(group_col), F.col("_dev").alias("_mad"))
    thresh = F.lit(c) * F.lit(1.4826) * F.col("_mad")
    return (
        dev.join(mad, group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.max("_med"), 6).alias("med"),
            F.round(F.max("_mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("_dev") > thresh, 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )
