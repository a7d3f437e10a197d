#!/usr/bin/env python
"""Per-query drift attribution probe (VERDICT r12 #2).

The envelope trend flagged three EXTRA queries whose per-query minima
rose across r11->r12 (txlog_zorder_scan 1.25x, mixture_epochs 1.25x,
txlog_change_feed 1.15x) in rounds where formats.py changed but the
CI-pinned plans did not — so if it is code, it is constant-factor.
This probe answers code-vs-regime with arithmetic: run the SAME
queries min-of-N under the SAME session shape against TWO builds
(HEAD and a git worktree of an older round's close), alternating
builds per repetition so co-tenant noise hits both equally.

Usage:
  git worktree add /tmp/r11wt <r11-close-sha>
  python scripts/drift_probe.py \
      --queries txlog_zorder_scan,mixture_epochs,txlog_change_feed \
      --repos /root/repo,/tmp/r11wt --runs 5 \
      --out /tmp/drift_probe.json

Each repo runs in its OWN subprocess (fresh JVM, that build's package
on sys.path) per repetition; per-query minima across the N reps are
compared. Run it ALONE — it is a timing probe.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

_RUNNER = """
import json, sys, time

repo, sf_dir, names, out = (
    sys.argv[1], sys.argv[2], sys.argv[3].split(","), sys.argv[4]
)
sys.path.insert(0, repo)
from instagram_data_pipeline_spark.queries import load_all
from instagram_data_pipeline_spark.session import build_session

registry = load_all()
spark = build_session(app_name="drift-probe")
spark.sparkContext.setLogLevel("ERROR")

# same warm-up shape as bench.py: force a full column decode of every
# input so the first timed run starts from a warm page cache
import pyspark.sql.functions as F
from instagram_data_pipeline_spark.io import load_testdata

for table in ("lineitem", "orders", "customer", "events",
              "documents", "embeddings"):
    df = load_testdata(spark, sf_dir, table)
    df.agg(
        F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000)))
    ).collect()

res = {}
for name in names:
    t0 = time.time()
    n = len(registry[name].spark_fn(spark, sf_dir).collect())
    res[name] = {"s": round(time.time() - t0, 3), "rows": n}
json.dump(res, open(out, "w"))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--repos", required=True,
                    help="comma-separated build roots, first = HEAD")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument(
        "--sf", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    ap.add_argument("--out", default="/tmp/drift_probe.json")
    args = ap.parse_args()

    names = args.queries.split(",")
    repos = args.repos.split(",")
    tmp = tempfile.mkdtemp(prefix="drift_probe_")
    times: dict[str, dict[str, list[float]]] = {
        r: {n: [] for n in names} for r in repos
    }
    loads = []
    for rep in range(args.runs):
        for repo in repos:  # alternate builds inside each repetition
            loads.append(round(os.getloadavg()[0], 2))
            out = os.path.join(tmp, f"r{rep}_{Path(repo).name}.json")
            env = {**os.environ, "PYTHONPATH": repo}
            p = subprocess.run(
                [sys.executable, "-c", _RUNNER,
                 repo, args.sf, args.queries, out],
                env=env, capture_output=True, text=True, timeout=1800,
            )
            if p.returncode != 0:
                raise RuntimeError(p.stderr[-2000:])
            got = json.load(open(out))
            for n in names:
                times[repo][n].append(got[n]["s"])
            print(
                f"# rep {rep} {Path(repo).name}: "
                + ", ".join(f"{n}={got[n]['s']}" for n in names),
                file=sys.stderr,
            )

    result = {
        "sf": args.sf,
        "runs": args.runs,
        "loadavg_samples": loads,
        "per_repo": {
            Path(r).name: {
                n: {"min": min(v), "all": v}
                for n, v in times[r].items()
            }
            for r in repos
        },
    }
    if len(repos) == 2:
        a, b = repos
        result["min_ratio_head_over_base"] = {
            n: round(
                min(times[a][n]) / min(times[b][n]), 3
            )
            for n in names
        }
    json.dump(result, open(args.out, "w"), indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
