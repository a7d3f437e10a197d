#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names, and
an order-insensitive value comparison. Usage::

    python scripts/verify_local.py [--sf /root/testdata/sf0.01] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for p in sorted(Path(sf_dir).glob("*.parquet")):
        con.execute(
            f"CREATE VIEW {p.stem} AS SELECT * FROM read_parquet('{p}')"
        )
    return con


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, then rows; canonicalize values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def canon(v):
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            # collapse float noise below the rounding we applied in queries
            return ("f", round(v, 9))
        if isinstance(v, int):
            return ("f", float(v)) if abs(v) < 2**52 else ("i", v)
        if v is None:
            return ("z",)
        return ("s", str(v))

    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as e
    from instagram_data_pipeline_spark.session import build_session

    spark = build_session(app_name="verify_local")
    qs = e.queries()
    oracles = e.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    con = duck_connection(args.sf)
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            ns, nd = normalize(srows, scols), normalize(drows, dcols)
            if ns != nd:
                diff = next(
                    (i for i, (a, b) in enumerate(zip(ns, nd)) if a != b), -1
                )
                problems.append(
                    f"values differ (first diff at sorted row {diff}: "
                    f"{ns[diff] if diff >= 0 else ''} vs "
                    f"{nd[diff] if diff >= 0 else ''})"
                )
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
