"""Operability-diagnostic queries: key-skew profiling and declarative
data constraints (operators/diagnostics.py) over the star schema."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_testdata
from ..operators.diagnostics import (
    check_constraints,
    in_range,
    matches,
    not_null,
    skew_report,
)
from . import register

# ---------------------------------------------------------------------------
_SKEW_ORACLE = """
WITH counts AS (
  SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id
), tot AS (
  SELECT SUM(n_rows) AS total, COUNT(*) AS nkeys FROM counts
), ranked AS (
  SELECT c.user_id, c.n_rows,
         ROW_NUMBER() OVER (ORDER BY c.n_rows DESC, c.user_id) AS rank
  FROM counts c
)
SELECT r.user_id, r.n_rows,
       CAST(FLOOR(r.n_rows * 1000000.0 / t.total) AS BIGINT) AS share_ppm,
       CAST(FLOOR(r.n_rows * t.nkeys * 100.0 / t.total) AS BIGINT)
         AS skew_factor_x100,
       r.rank
FROM ranked r CROSS JOIN tot t
WHERE r.rank <= 10
"""


@register(
    "skew_report",
    _SKEW_ORACLE,
    doc="key-skew profile of events.user_id: the 10 heaviest keys with "
        "integer-exact corpus share (ppm) and skew factor vs the uniform "
        "share — the pre-flight answer to whether a join on this key "
        "needs salting / AQE skew thresholds / broadcast",
    tags=("diagnostics", "skew"),
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_testdata(spark, sf_dir, "events")
    return skew_report(events, ["user_id"], top_n=10)


# ---------------------------------------------------------------------------
_CONSTRAINT_ORACLE = """
SELECT 'o_custkey_not_null' AS check_name,
       (SELECT COUNT(*) FROM orders) AS n_checked,
       (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS n_violations
UNION ALL
SELECT 'o_totalprice_range',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders
        WHERE o_totalprice IS NULL OR o_totalprice < 0
           OR o_totalprice > 1000000)
UNION ALL
SELECT 'o_status_format',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders
        WHERE o_orderstatus IS NULL
           OR NOT regexp_matches(o_orderstatus, '^[A-Z]$'))
UNION ALL
SELECT 'unique(o_orderkey)',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
UNION ALL
SELECT 'ref(l_orderkey)',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
"""


@register(
    "constraint_report",
    _CONSTRAINT_ORACLE,
    doc="declarative data-quality expectations (Deequ-style) over "
        "orders/lineitem: not-null, range, format, key uniqueness, and "
        "lineitem->orders referential integrity — all row-local checks "
        "fold into one aggregation pass; uniqueness adds one key count, "
        "the foreign key one anti-join. The report is rows, not a crash.",
    tags=("diagnostics", "quality"),
)
def q_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_testdata(spark, sf_dir, "orders")
    lineitem = load_testdata(spark, sf_dir, "lineitem")
    order_checks = check_constraints(
        orders,
        [
            not_null("o_custkey_not_null", "o_custkey"),
            in_range("o_totalprice_range", "o_totalprice", 0, 1000000),
            matches("o_status_format", "o_orderstatus", "^[A-Z]$"),
        ],
        unique_keys=[["o_orderkey"]],
    )
    ref_checks = check_constraints(
        lineitem,
        [],
        references=[(["l_orderkey"], orders, ["o_orderkey"])],
    )
    return order_checks.unionByName(ref_checks).withColumnRenamed(
        "constraint", "check_name"
    )


# ---------------------------------------------------------------------------
# Join-size preflight: the exact self-join output size from one key
# aggregation — run BEFORE the expensive join; the top contributors are
# the keys to salt/cap (companion to skew_report, which profiles raw
# row counts rather than join blowup).
# ---------------------------------------------------------------------------
_JOIN_PREFLIGHT_ORACLE = """
WITH c AS (
  SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id
), t AS (
  SELECT SUM(n_rows * n_rows) AS total FROM c
)
SELECT user_id, n_rows, n_rows * n_rows AS pairs,
       CAST(n_rows * n_rows * 1000000 // total AS BIGINT) AS share_ppm,
       CAST(total AS BIGINT) AS est_join_rows
FROM c, t
ORDER BY pairs DESC, user_id
LIMIT 10
"""


@register(
    "join_size_preflight",
    _JOIN_PREFLIGHT_ORACLE,
    doc="exact self-join output size (sum of per-key count squares) "
        "from ONE aggregation, with the top-10 contributing keys and "
        "their integer share-ppm — the pre-flight that decides salt/"
        "cap/drop before a mutual-edges-style self-join is allowed to "
        "run at 100 TB; count-table-sized work, 1-row total broadcast, "
        "TakeOrderedAndProject",
    tags=("diagnostics", "join", "skew"),
)
def q_join_size_preflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.diagnostics import join_size_preflight

    events = load_testdata(spark, sf_dir, "events")
    return join_size_preflight(events, ["user_id"], top_n=10)


# ---------------------------------------------------------------------------
# Robust outlier report (median / MAD, Hampel's 3-sigma rule). Both
# medians are rank-SELECTED lower medians — never interpolated — so no
# averaging float enters the decision and the outlier count is
# engine-exact; the threshold expression (c * 1.4826 * MAD) has the
# same literals on both sides.
# ---------------------------------------------------------------------------
_MAD_ORACLE = """
WITH v AS (
  SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
), r AS (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY value, event_id
         ) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
), med AS (
  SELECT event_type, value AS med FROM r WHERE rn = FLOOR((n + 1) / 2)
), d AS (
  SELECT v.event_type, v.event_id,
         ABS(v.value - med.med) AS dev, med.med AS med
  FROM v JOIN med USING (event_type)
), dr AS (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY dev, event_id
         ) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d
), mad AS (
  SELECT event_type, dev AS mad FROM dr WHERE rn = FLOOR((n + 1) / 2)
)
SELECT d.event_type, COUNT(*) AS n_rows,
       ROUND(MAX(d.med), 6) AS med, ROUND(MAX(mad.mad), 6) AS mad,
       CAST(SUM(CASE WHEN d.dev > 3.0 * 1.4826 * mad.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM d JOIN mad USING (event_type) GROUP BY 1
"""


@register(
    "mad_outliers",
    _MAD_ORACLE,
    doc="robust per-metric outlier report: median + MAD (both lower "
        "medians selected by rank, never interpolated) and Hampel's "
        "|x - med| > 3 * 1.4826 * MAD count — the monitoring rule that "
        "survives the outliers a mean/stddev z-score absorbs; exact "
        "grouped medians for the bounded monitoring grain, sketch twin "
        "(grouped_median_sketch) for unbounded groups",
    tags=("diagnostics", "monitoring"),
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.diagnostics import mad_outlier_report

    events = load_testdata(spark, sf_dir, "events")
    return mad_outlier_report(events, "event_type", "value", "event_id")
