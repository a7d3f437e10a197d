#!/usr/bin/env python
"""Per-statement wall profile of the three txlog bench queries + a count
of manifest reads (_latest/_snap_at json loads) per query execution
(VERDICT r14 Next #3: find repeated manifest parse/listing WITHIN one
query execution). min-of-N per query; statement timings from run 1.

    python scripts/profile_txlog.py [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from instagram_data_pipeline_spark import formats
    from instagram_data_pipeline_spark.queries import load_all
    from instagram_data_pipeline_spark.session import build_session

    # count manifest json reads without changing behavior
    counters = {"latest": 0, "snap_at": 0}
    orig_latest = formats.TransactionLogFormat._latest
    orig_snap = formats.TransactionLogFormat._snap_at

    def counted_latest(self, wh, table):
        counters["latest"] += 1
        return orig_latest(self, wh, table)

    def counted_snap(self, wh, table, version):
        counters["snap_at"] += 1
        return orig_snap(self, wh, table, version)

    formats.TransactionLogFormat._latest = counted_latest
    formats.TransactionLogFormat._snap_at = counted_snap

    spark = build_session(app_name="profile_txlog")
    reg = load_all()

    for name in ("txlog_zorder_scan", "txlog_change_feed",
                 "txlog_delete_vectors"):
        best = None
        for i in range(args.runs):
            counters["latest"] = counters["snap_at"] = 0
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"profile: {name}")
            n = len(reg[name].spark_fn(spark, args.sf).collect())
            el = time.time() - t0
            best = min(best or 1e9, el)
            print(f"# {name} run{i}: {el:.3f}s rows={n} "
                  f"manifest_reads latest={counters['latest']} "
                  f"snap_at={counters['snap_at']}", flush=True)
        print(f"{best:8.3f}s  {name} (min of {args.runs})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
