#!/usr/bin/env python
"""Commit-latency-under-contention probe (VERDICT r11 Next #5).

Round 11 raised MAX_COMMIT_RETRIES 5 -> 20 because a 3-writer race
starved the old budget — which legitimized a real, unmeasured cost:
the rebase/redo tax a loser pays per publish conflict. This probe
measures it directly: N writer PROCESSES (own JVMs — the real
multi-driver topology) each apply K fixed-size merge batches drawn
from ONE shared key range against ONE table, so writers collide on
buckets and keys and losers take the redo path. Reported per N:

* commits/s (aggregate merge throughput at that contention level),
* mean/max wall seconds per merge,
* publish-conflict counts per merge: mean / p95 / max (counted by a
  _publish wrapper in each worker — every CommitConflict is one lost
  CAS, i.e. one rebase or redo),

confirming retries stay well under the budget of 20 and quantifying
how throughput degrades from N=1 to N=4.

Usage: python scripts/contention_probe.py [--workers 1,2,4]
       [--merges 6] [--out /tmp/contention_probe.json] [--disjoint]

``--disjoint`` (round 13, VERDICT r12 #3) measures the OTHER contention
shape — the one the format's 100 TB concurrency story actually rests
on: key-partitioned writers whose batches hash to disjoint bucket
subsets, so a lost CAS is a REBASE (re-point carried files at the
winner and re-publish — one manifest write, our data files reused)
instead of a redo (recompute the merge from the winning snapshot).
Expected: near-linear aggregate commits/s and redos ~= 0; per-op
``redos`` counts extra ``_write_commit`` calls, separating the two
costs that "conflicts" alone conflates.

Run it ALONE (no concurrent Spark work) — it is a timing probe.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_WORKER = """
import json, random, sys, time

wid, root, n_merges, out, mode, widx, n_workers = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4],
    sys.argv[5], int(sys.argv[6]), int(sys.argv[7]),
)
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName(f"contention-{wid}")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from instagram_data_pipeline_spark.formats import (
    CommitConflict,
    TransactionLogFormat,
)


class CountingFormat(TransactionLogFormat):
    conflicts = 0
    writes = 0  # _write_commit calls: redos re-write, rebases do not

    def _publish(self, *a, **kw):
        try:
            return super()._publish(*a, **kw)
        except CommitConflict:
            CountingFormat.conflicts += 1
            raise

    def _write_commit(self, *a, **kw):
        CountingFormat.writes += 1
        return super()._write_commit(*a, **kw)


class Handle:
    def __init__(self, spark, root):
        self.spark, self._root = spark, root

    def path(self, _t):
        return self._root


fmt = CountingFormat()
wh = Handle(spark, root)
rng = random.Random(hash(wid) & 0xFFFF)

if mode == "disjoint":
    # key-partitioned writers: this worker only writes keys hashing to
    # ITS bucket subset, so every concurrent winner is bucket-disjoint
    # and losers ride the one-manifest-re-point REBASE (no redo) — the
    # format's stated production-concurrency path (VERDICT r12 #3)
    from instagram_data_pipeline_spark.formats import bucket_expr
    from pyspark.sql import functions as F

    pool = [
        r.k
        for r in spark.range(0, 200)
        .select(F.col("id").alias("k"), bucket_expr(["k"], 8).alias("b"))
        .collect()
        if r.b % n_workers == widx
    ]
else:
    pool = list(range(0, 200))

ops = []
for i in range(n_merges):
    ks = sorted(rng.sample(pool, min(40, len(pool))))
    rows = ", ".join(f"({k}, '{wid}.{i}.{k}')" for k in ks)
    df = spark.sql(
        f"SELECT CAST(k AS BIGINT) AS k, v FROM VALUES {rows} AS t(k, v)"
    )
    before = CountingFormat.conflicts
    w_before = CountingFormat.writes
    t0 = time.time()
    fmt.merge_source_wins(wh, "t", df, ["k"], num_buckets=8)
    ops.append({
        "wall_s": round(time.time() - t0, 3),
        "conflicts": CountingFormat.conflicts - before,
        "redos": CountingFormat.writes - w_before - 1,
    })
json.dump(ops, open(out, "w"))
spark.stop()
"""


def _p95(xs: list[float]) -> float:
    s = sorted(xs)
    return s[min(len(s) - 1, math.ceil(0.95 * len(s)) - 1)]


def run_level(n_workers: int, n_merges: int, mode: str = "overlap") -> dict:
    from pyspark.sql import SparkSession

    tmp = tempfile.mkdtemp(prefix=f"contention_{mode}_{n_workers}w_")
    root = os.path.join(tmp, "t")
    # seed from the parent so workers never race the first-commit path
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("contention-seed")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from instagram_data_pipeline_spark.formats import TransactionLogFormat

    class Handle:
        def __init__(self, spark, root):
            self.spark, self._root = spark, root

        def path(self, _t):
            return self._root

    fmt = TransactionLogFormat()
    wh = Handle(spark, root)
    fmt.merge_source_wins(
        wh, "t",
        spark.sql("SELECT id AS k, concat('seed.', id) AS v "
                  "FROM range(200)"),
        ["k"], num_buckets=8,
    )
    spark.stop()

    env = {
        **os.environ,
        "PYTHONPATH": str(Path(__file__).resolve().parent.parent),
    }
    outs, procs = [], []
    t0 = time.time()
    for w in range(n_workers):
        out = os.path.join(tmp, f"w{w}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER,
             f"w{w}", root, str(n_merges), out,
             mode, str(w), str(n_workers)],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        ))
    for p in procs:
        _, err = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(err.decode()[-2000:])
    wall = time.time() - t0

    ops = []
    for out in outs:
        ops.extend(json.load(open(out)))
    walls = [o["wall_s"] for o in ops]
    confs = [o["conflicts"] for o in ops]
    redos = [o.get("redos", 0) for o in ops]
    # merge wall-clock only (JVM startup excluded from commits/s by
    # measuring from each worker's own per-op clocks)
    busy = sum(walls)
    return {
        "mode": mode,
        "workers": n_workers,
        "merges": len(ops),
        "wall_s_total": round(wall, 1),
        "commits_per_s_aggregate": round(
            len(ops) / (busy / n_workers), 3
        ),
        "merge_wall_mean_s": round(sum(walls) / len(walls), 3),
        "merge_wall_max_s": round(max(walls), 3),
        "conflicts_mean": round(sum(confs) / len(confs), 2),
        "conflicts_p95": _p95(confs),
        "conflicts_max": max(confs),
        "redos_mean": round(sum(redos) / len(redos), 2),
        "redos_max": max(redos),
        "retry_budget": 20,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", default="1,2,4")
    ap.add_argument("--merges", type=int, default=6)
    ap.add_argument("--out", default="/tmp/contention_probe.json")
    ap.add_argument(
        "--disjoint", action="store_true",
        help="key-partitioned writers on disjoint bucket subsets: "
             "losers ride the rebase (one manifest re-point, no redo) "
             "— the production multi-writer path (VERDICT r12 #3)",
    )
    args = ap.parse_args()

    mode = "disjoint" if args.disjoint else "overlap"
    results = []
    for n in [int(x) for x in args.workers.split(",")]:
        print(f"# level: {n} writer(s) x {args.merges} merges ({mode})",
              file=sys.stderr)
        r = run_level(n, args.merges, mode)
        print(f"#   {json.dumps(r)}", file=sys.stderr)
        results.append(r)
    json.dump(results, open(args.out, "w"), indent=1)
    print(json.dumps({"contention_probe": results}))


if __name__ == "__main__":
    main()
