"""Mergeable frequency sketches as DataFrame aggregations (task north
star: "a novel sketch" — the custom-operator class where Spark's
built-ins stop at approx_count_distinct / percentile_approx).

Count-Min sketch (Cormode & Muthukrishnan 2005): a depth x width counter
matrix; item increments one counter per row (chosen by that row's hash),
estimate = min over rows. Guarantees: estimate >= true count ALWAYS
(deterministic one-sided error); estimate <= true + eps*N with
probability 1-delta for width=ceil(e/eps), depth=ceil(ln(1/delta)).

Spark shape: the sketch IS a DataFrame (depth_id, bucket, cnt) built by
one explode + one groupBy — map-side partial aggregation does the heavy
lifting, the shuffle carries at most depth*width rows per partition, and
two sketches merge by unionByName + re-aggregate (the monoid property,
which is what makes sketches the scalable answer: combine per-partition,
per-day, per-shard summaries without touching raw data again).
Hashes are xxhash64 with fixed row tags — deterministic, rerun-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key_col: str, d: int, width: int, portable: bool) -> Column:
    """Row-d bucket for a key: pmod(hash_d(key), width).

    Default hash is xxhash64 (JVM-native, the scale path); ``portable``
    uses the md5-based 32-bit family reproducible in DuckDB
    (``CAST(concat('0x', substr(md5(d || ':' || key), 1, 8)) AS BIGINT)``)
    so sketch contents and estimates can be oracle-checked."""
    if portable:
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{d}:"), F.col(key_col).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
    else:
        h = F.xxhash64(F.lit(d), F.col(key_col))
    return F.pmod(h, F.lit(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
    portable: bool = False,
) -> DataFrame:
    """Build the sketch: (depth_id, bucket, cnt), at most depth*width
    rows. ``weight_col`` makes it a weighted-frequency sketch."""
    wexpr = F.col(weight_col) if weight_col else F.lit(1)
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth_id"),
                        _bucket(key_col, d, width, portable).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
        wexpr.alias("_w"),
    )
    return (
        rows.select("c.depth_id", "c.bucket", "_w")
        .groupBy("depth_id", "bucket")
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (depth, width): counter-wise
    sum — the monoid op enabling per-shard build + cheap combine."""
    return (
        a.unionByName(b)
        .groupBy("depth_id", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    portable: bool = False,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over depth rows of the
    key's counter (missing counter = 0). The sketch side is tiny
    (<= depth*width rows) and broadcasts."""
    probes = keys.select(F.col(key_col)).dropDuplicates().select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth_id"),
                        _bucket(key_col, d, width, portable).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.depth_id", "c.bucket")
    joined = probes.join(F.broadcast(sketch), ["depth_id", "bucket"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 2048,
    portable: bool = False,
) -> DataFrame:
    """Keys whose estimated frequency reaches ``min_count``. One-sided
    error means NO false negatives: every key with true count >=
    min_count is returned (some lighter keys may slip in when buckets
    collide)."""
    sketch = cms_build(df, key_col, depth, width, portable=portable)
    est = cms_estimate(sketch, df, key_col, depth, width, portable=portable)
    return est.filter(F.col("est") >= min_count)


# ---------------------------------------------------------------------------
# Equi-width histogram quantile sketch
# ---------------------------------------------------------------------------
def _hll_estimator_sql(m: int) -> str:
    """The HLL estimator as ONE SQL expression string over columns
    ``sum_int`` (exact integer register sum, see below) and ``n_zero``
    (empty registers) — evaluated verbatim by BOTH Spark (F.expr) and
    DuckDB, so every float op has identical literals and association
    order. Includes the standard small-range linear-counting branch;
    the large-range branch is unnecessary below 2^32 distinct."""
    raw = (
        f"0.7213 / (1.0 + 1.079 / {m}.0) * {m}.0 * {m}.0 * "
        "POWER(2.0, 40) / sum_int"
    )
    return (
        f"CASE WHEN {raw} <= 2.5 * {m}.0 AND n_zero > 0 "
        f"THEN {m}.0 * LN({m}.0 / n_zero) ELSE {raw} END"
    )


def portable_hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """Engine-portable HyperLogLog distinct count per group: the
    hash-checkable twin of ``approx_count_distinct`` (whose HLL++ is
    engine-specific and therefore rows-only against any oracle).

    Portability discipline:
    * hash = md5 of the value's string form — bucket from hex chars 1-8
      (mod m), the rho word from chars 9-16 (independent bits);
    * rho = 33 - bit_length(w) via ``LENGTH(BIN(w))`` — INTEGER-exact in
      both engines (no log2 floats near power-of-two boundaries);
    * the register sum is EXACT: each register contributes the integer
      2^(40-M_j) (M_j <= 33), so the sum is order-independent — float
      summation would diverge across engines on partition order;
    * the estimator (with small-range linear counting) is one shared
      SQL string (:func:`_hll_estimator_sql`) evaluated by both
      engines. The single transcendental (LN) is the documented 1-ulp
      cross-engine risk; it sits behind floor(x+0.5) of a value with
      ~1e-12 absolute error margin.

    Shape: one groupBy to (group, bucket) registers — map-side combined,
    the shuffle carries <= m rows per group — then a per-group aggregate
    over register rows. Same monoid merge story as the other sketches:
    registers merge by MAX."""
    m = 1 << p
    regs = hll_registers(df, group_cols, value_col, p)
    return hll_estimate_from_registers(regs, group_cols, p, "approx_users")


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """Per-group HLL register frame ``(*group_cols, _bkt, _m)`` — the
    mergeable sketch state.  Registers from ANY partitioning of the
    same data merge by MAX on ``(_bkt)``: per-day registers roll up to
    per-month/global with one re-aggregate instead of a re-scan — the
    mergeability that makes sketch rollups work at 100 TB (compute once
    at the finest grain, derive every coarser grain from state)."""
    m = 1 << p
    md5 = F.md5(F.col(value_col).cast("string").cast("binary"))
    bkt = F.pmod(
        F.conv(F.substring(md5, 1, 8), 16, 10).cast("long"), F.lit(m)
    )
    w = F.conv(F.substring(md5, 9, 8), 16, 10).cast("long")
    rho = F.when(w == F.lit(0), F.lit(33)).otherwise(
        F.lit(33) - F.length(F.bin(w))
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, bkt.alias("_bkt"), rho.alias("_rho"))
        .groupBy(*group_cols, "_bkt")
        .agg(F.max("_rho").alias("_m"))
    )


def hll_merge_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge register frames down to a coarser grouping (possibly
    none): MAX per (group, bucket) — associative, commutative,
    idempotent, so any merge tree gives the identical sketch."""
    return regs.groupBy(*group_cols, "_bkt").agg(
        F.max("_m").alias("_m")
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: list[str],
    p: int = 12,
    out_col: str = "approx_users",
) -> DataFrame:
    """Evaluate the shared estimator over a register frame (see
    :func:`portable_hll_distinct` for the portability discipline)."""
    m = 1 << p
    agg = regs.groupBy(*group_cols).agg(
        F.sum(
            F.pow(F.lit(2.0), F.lit(40) - F.col("_m")).cast("long")
        ).alias("_sp"),
        F.count(F.lit(1)).alias("_present"),
    )
    framed = agg.select(
        *group_cols,
        (
            F.col("_sp")
            + (F.lit(m) - F.col("_present")) * F.lit(1 << 40)
        ).alias("sum_int"),
        (F.lit(m) - F.col("_present")).alias("n_zero"),
    )
    return framed.select(
        *group_cols,
        F.floor(F.expr(_hll_estimator_sql(m)) + F.lit(0.5))
        .cast("long")
        .alias(out_col),
    )


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Mergeable equi-width histogram sketch over a bounded numeric
    domain: (bin, cnt), at most ``n_bins`` rows.

    The deterministic cousin of percentile_approx: rank error is
    bounded by the largest bin's mass and value error by the bin width
    (hi-lo)/n_bins — and unlike t-digest/GK the sketch is an exact
    monoid (merge = unionByName + sum), so per-partition / per-day /
    per-shard sketches roll up without touching raw data again, and the
    same construction in any engine yields bit-identical results
    (oracle-checkable, rerun-stable). Values outside [lo, hi] clamp to
    the edge bins (they count toward rank, as extreme values should).
    NULL values are excluded before binning — floor(NULL) would
    otherwise propagate into a NULL bin, and NULL bins sort FIRST in
    Spark windows but LAST in most other engines, silently shifting
    every cumulative rank.

    One map-side-combined groupBy; the shuffle carries <= n_bins rows
    per partition.
    """
    span = hi - lo
    b = F.floor(
        (F.col(value_col).cast("double") - F.lit(lo)) / F.lit(span)
        * F.lit(float(n_bins))
    ).cast("long")
    bin_ = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quantile_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Monoid merge: same (lo, hi, n_bins) sketches add bin-wise."""
    return (
        a.unionByName(b).groupBy("bin").agg(F.sum("cnt").alias("cnt"))
    )


def quantile_estimate(
    sketch: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """(q, value) per requested quantile: the upper edge of the first
    bin whose cumulative count reaches ceil(q * total) — a conservative
    (never-underestimating) rank answer, off by at most one bin width.

    The cumulative scan runs over <= n_bins rows — a single-partition
    window over the SKETCH, not the data (that is the point of
    sketching: the expensive part stays map-side combined)."""
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    width = (hi - lo) / n_bins
    out = None
    for q in qs:
        hit = (
            cum.filter(
                F.col("cum") >= F.ceil(F.lit(q) * F.col("total"))
            )
            .agg(F.min("bin").alias("bin"))
            .select(
                F.lit(q).alias("q"),
                F.round(
                    F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6
                ).alias("value"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


def histogram_drift(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 32,
) -> DataFrame:
    """Day-over-day distribution drift: per day d, the L1 distance
    between that day's and the previous day's value histograms —
    the pipeline-monitoring signal that catches a broken upstream
    (schema drift, unit change, dead segment) before it poisons a
    training run.

    Exactness discipline: shares c/T are never materialized as doubles.
    The distance is computed over cross-multiplied INTEGER terms,
      L1(d) = sum_b |c_d(b)*T_{d-1} - c_{d-1}(b)*T_d| / (T_d*T_{d-1}),
    with one double division + round at the very end — bit-identical in
    any engine, no float accumulation anywhere.

    Shape: one groupBy to (day, bin), a 1-per-day totals frame with a
    lag window (days are few — the window is over the SUMMARY), a
    signed union re-aggregation for the per-bin differences. The raw
    data is scanned once.
    """
    span = hi - lo
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    b = F.floor(
        (F.col(value_col).cast("double") - F.lit(lo)) / F.lit(span)
        * F.lit(float(n_bins))
    ).cast("long")
    bin_ = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b))
    s = (
        # NULL values excluded before binning (see quantile_sketch)
        df.filter(F.col(value_col).isNotNull())
        .select(day.alias("day"), bin_.alias("bin"))
        .groupBy("day", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    totals = s.groupBy("day").agg(F.sum("c").alias("tot"))
    w = Window.orderBy("day")
    pairs = totals.select(
        "day",
        F.col("tot").alias("tot_cur"),
        F.lag("tot").over(w).alias("tot_prev"),
        F.lag("day").over(w).alias("prev_day"),
    ).filter(
        # only adjacent calendar days compare meaningfully
        F.col("prev_day") == F.date_sub(F.col("day"), 1)
    )
    cur = s.join(pairs, "day").select(
        "day", "bin", (F.col("c") * F.col("tot_prev")).alias("v")
    )
    prev = (
        s.select(F.date_add("day", 1).alias("day"), "bin", "c")
        .join(pairs, "day")
        .select("day", "bin", (-F.col("c") * F.col("tot_cur")).alias("v"))
    )
    return (
        cur.unionByName(prev)
        .groupBy("day", "bin")
        .agg(F.sum("v").alias("d"))
        .select("day", F.abs("d").alias("ad"))
        .groupBy("day")
        .agg(F.sum("ad").alias("_num"))
        .join(pairs, "day")
        .select(
            "day",
            F.round(
                F.col("_num").cast("double")
                / (F.col("tot_cur") * F.col("tot_prev")).cast("double"),
                6,
            ).alias("l1_drift"),
        )
    )


def grouped_quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Per-group histogram sketch: (groups..., bin, cnt) — the grouped
    form of :func:`quantile_sketch`, still an exact monoid per group
    and still one map-side-combined shuffle (the group key simply joins
    the bin in the aggregation key). NULL values excluded before
    binning (see :func:`quantile_sketch`)."""
    span = hi - lo
    b = F.floor(
        (F.col(value_col).cast("double") - F.lit(lo)) / F.lit(span)
        * F.lit(float(n_bins))
    ).cast("long")
    bin_ = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, bin_.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def grouped_quantile_estimate(
    sketch: DataFrame,
    group_cols: list[str],
    q: float,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """(groups..., value) — quantile ``q`` per group from a grouped
    sketch. The cumulative window partitions by group and runs over the
    sketch rows (<= n_bins per group), not the data."""
    from pyspark.sql import Window

    wc = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy(*group_cols)
    width = (hi - lo) / n_bins
    cum = sketch.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wt).alias("total"),
    )
    return (
        cum.filter(F.col("cum") >= F.ceil(F.lit(q) * F.col("total")))
        .groupBy(*group_cols)
        .agg(F.min("bin").alias("_bin"))
        .select(
            *group_cols,
            F.round(
                F.lit(lo) + (F.col("_bin") + 1) * F.lit(width), 6
            ).alias("value"),
        )
    )
