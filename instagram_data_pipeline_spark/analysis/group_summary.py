"""Grouped pandas UDAF (SURVEY §2.11: "UDAF via Pandas — applyInPandas
with one-row output").

The aggregate itself is deliberately SQL-expressible (count / max /
argmax-with-tie-break / min-date) so the DuckDB oracle can verify the
pandas path end-to-end — proving the Arrow group-transfer boundary
preserves semantics, which is the risky part of any custom UDAF.

Only exact operations are used (counts, max, min, argmax): no float
summation whose order pandas would own.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

SUMMARY_SCHEMA = (
    "o_custkey long, n_orders long, top_priority string, "
    "max_price double, first_order_us long"
)


def _summarize(pdf: pd.DataFrame) -> pd.DataFrame:
    counts = (
        pdf.groupby("o_orderpriority").size().reset_index(name="c")
        .sort_values(["c", "o_orderpriority"], ascending=[False, True])
    )
    return pd.DataFrame(
        {
            "o_custkey": [pdf["o_custkey"].iloc[0]],
            "n_orders": [len(pdf)],
            "top_priority": [counts["o_orderpriority"].iloc[0]],
            "max_price": [pdf["o_totalprice"].max()],
            "first_order_us": [int(pdf["o_orderdate"].min().value // 1000)],
        }
    )


def customer_order_summary(orders: DataFrame) -> DataFrame:
    """Per-customer order profile via grouped-map pandas (one output row
    per group)."""
    return (
        orders.select("o_custkey", "o_orderpriority", "o_totalprice", "o_orderdate")
        .groupBy("o_custkey")
        .applyInPandas(_summarize, schema=SUMMARY_SCHEMA)
    )
