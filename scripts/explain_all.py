#!/usr/bin/env python
"""Dump the physical plan of every registry query and flag anti-patterns.

Checks per plan: filters reached the parquet scan (PushedFilters), no
row-at-a-time Python (BatchEvalPython), and reports exchange counts —
the per-query evidence that Catalyst produced the plan we designed for.

    python scripts/explain_all.py [--sf DIR] [--out PLANS.md]
"""

from __future__ import annotations

import argparse
import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from instagram_data_pipeline_spark.queries import load_all
    from instagram_data_pipeline_spark.session import build_session

    spark = build_session(app_name="explain_all")
    reg = load_all()
    sections, flags = [], []
    for name, spec in sorted(reg.items()):
        df = spec.spark_fn(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        n_exchanges = len(re.findall(r"\bExchange\b", plan))
        python_eval = "BatchEvalPython" in plan  # row-at-a-time UDF: forbidden
        arrow_eval = "ArrowEvalPython" in plan or "MapInPandas" in plan
        shuffled_literal = re.search(  # literal frame must broadcast
            r"Exchange[^\n]*\n[^\n]*?[+:]-\s*\*?\s*LocalTableScan", plan
        )
        scans = plan.count("Scan parquet")
        pushed = len(re.findall(r"PushedFilters: \[(?!\])", plan))
        line = (
            f"{name}: scans={scans} pushed_filter_scans={pushed} "
            f"exchanges={n_exchanges}"
            + (" PYTHON-ROW-UDF!" if python_eval else "")
            + (" SHUFFLED-LITERAL!" if shuffled_literal else "")
            + (" arrow" if arrow_eval else "")
        )
        print(line)
        if python_eval:
            flags.append(f"{name}: row-at-a-time Python in plan")
        if shuffled_literal:
            flags.append(
                f"{name}: literal frame shuffled instead of broadcast"
            )
        sections.append(f"## {name}\n\n```\n{plan}\n```\n")
    if flags:
        print("\nANTI-PATTERNS:\n" + "\n".join(flags))
    if args.out:
        Path(args.out).write_text(
            "# Physical plans for every registry query\n\n" + "\n".join(sections)
        )
        print(f"\nwrote {args.out}")
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
