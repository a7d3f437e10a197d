#!/usr/bin/env python
"""VACUUM liveness-scan cost at real history depth (VERDICT r12 #7).

``TransactionLogFormat.vacuum`` computes the live file set as the
union over EVERY surviving manifest — an O(versions x files-per-
manifest) driver-side JSON walk per vacuum. At 100 TB with thousands
of commits and ~100k files per manifest that walk is the suspected
bottleneck; this probe measures it directly on SYNTHETIC history
(pure JSON + empty data files — vacuum never opens parquet, so Spark
is irrelevant to the cost being measured) and reports seconds per
depth plus the fitted scaling exponent alpha (time ~ depth^alpha).

History model per version: F files referenced, CHURN of them fresh
(a merge rewriting CHURN of F buckets), the rest carried by
reference — the steady-state manifest shape. Distinct files on disk
= F + CHURN x (V - 1), every one created so the rglob half of the
walk is measured too.

Usage: python scripts/vacuum_depth_probe.py [--depths 100,500,1000]
       [--files 1000] [--churn 8] [--out /tmp/vacuum_depth.json]

Run it ALONE — it is a timing probe.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


class _Handle:
    """Sparkless table-root adapter: vacuum's code path only calls
    ``wh.path(table)``."""

    def __init__(self, root: str) -> None:
        self._root = root

    def path(self, _t: str) -> str:
        return self._root


def build_history(root: Path, depth: int, files: int, churn: int) -> int:
    """Synthesize ``depth`` manifests of ``files`` entries each with
    ``churn`` fresh files per version; create every referenced file
    (plus a handful of orphans so the vacuum has real work)."""
    data = root / "data"
    log = root / "_txlog"
    data.mkdir(parents=True)
    log.mkdir()
    # file slots: slot s at generation g -> data/g/f{s}.parquet
    gen = [0] * files
    rows = {}

    def rel(s: int) -> str:
        return f"data/{gen[s]:05d}/f{s}.parquet"

    old = time.time() - 10_000  # older than any grace window

    def mk(s: int) -> None:
        p = root / rel(s)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.touch()
        os.utime(p, (old, old))

    created = 0
    for s in range(files):  # v1 references every slot: create them all
        mk(s)
        created += 1
    for v in range(1, depth + 1):
        if v > 1:
            for i in range(churn):
                s = ((v - 2) * churn + i) % files
                gen[s] = v
                mk(s)
                created += 1
        # manifests record paths relative to root (data/... included)
        manifest = {
            "version": v,
            "files": {rel(s): s % 8 for s in range(files)},
            "rows": rows,
            "keys": ["k"],
            "num_buckets": 8,
        }
        with open(log / f"{v:08d}.json", "w") as f:
            json.dump(manifest, f)
    # orphans: files no manifest references, aged out of any grace
    for i in range(16):
        p = data / "orphan" / f"o{i}.parquet"
        p.parent.mkdir(parents=True, exist_ok=True)
        p.touch()
        os.utime(p, (old, old))
    return created


def probe(depth: int, files: int, churn: int) -> dict:
    from instagram_data_pipeline_spark.formats import TransactionLogFormat

    tmp = tempfile.mkdtemp(prefix=f"vacuum_depth_{depth}_")
    root = Path(tmp) / "t"
    n_files = build_history(root, depth, files, churn)
    fmt = TransactionLogFormat()
    wh = _Handle(str(root))

    t0 = time.time()
    deleted = fmt.vacuum(wh, "t", grace_seconds=3600.0)
    cold_s = time.time() - t0  # full O(versions x files) walk
    assert len(deleted) == 16, (len(deleted), "orphan accounting")

    # warm: the live-set checkpoint written by the cold walk makes the
    # next vacuum O(new commits) — here zero new commits
    t0 = time.time()
    deleted2 = fmt.vacuum(wh, "t", grace_seconds=3600.0)
    warm_s = time.time() - t0
    assert deleted2 == []

    # the retention two-step at the same depth: expire all but 2
    # manifests, then reclaim what only they referenced (the expiry
    # invalidates the checkpoint, so this pays one fresh full walk
    # over the 2 survivors)
    t0 = time.time()
    expired, reclaimed = fmt.expire_versions(
        wh, "t", keep_last=2, grace_seconds=3600.0
    )
    expire_s = time.time() - t0
    return {
        "depth": depth,
        "files_per_manifest": files,
        "distinct_files": n_files,
        "vacuum_cold_s": round(cold_s, 3),
        "vacuum_warm_s": round(warm_s, 3),
        "expire_s": round(expire_s, 3),
        "expired": len(expired),
        "reclaimed": len(reclaimed),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--depths", default="100,500,1000")
    ap.add_argument("--files", type=int, default=1000)
    ap.add_argument("--churn", type=int, default=8)
    ap.add_argument("--out", default="/tmp/vacuum_depth.json")
    args = ap.parse_args()

    results = []
    for d in [int(x) for x in args.depths.split(",")]:
        r = probe(d, args.files, args.churn)
        print(f"#   {json.dumps(r)}", file=sys.stderr)
        results.append(r)
    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        alpha = math.log(
            hi["vacuum_cold_s"] / lo["vacuum_cold_s"]
        ) / math.log(hi["depth"] / lo["depth"])
    else:
        alpha = None
    out = {"vacuum_depth_probe": results, "alpha": round(alpha, 3)
           if alpha is not None else None}
    json.dump(out, open(args.out, "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
