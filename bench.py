#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (collect) — results are small
aggregates/top-ks by design, so collect measures the full plan without a
driver-memory hazard. A session warm-up query runs first so JVM startup
is not attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: every class of operator with nontrivial work at scale.
BENCH_QUERIES = [
    "pricing_summary",      # wide agg over the fact table
    "mutual_edges",         # flagship 2-key self-join
    "three_way_join",       # chained joins + agg
    "upsert_keep_newest",   # window-based merge emulation
    "running_total",        # ordered running window
    "insert_if_absent",     # anti-join write pattern
    "daily_counts",         # temporal rollup
    "top_k_per_group",      # per-group top-k
    "hourly_window_counts", # event-time tumbling windows
    "regional_revenue",     # 6-relation join chain
    "sessionize_batch",     # lag + cumsum sessionization
    "dedup_exact",          # fingerprint hash-groupBy
    "ngram_jaccard_pairs",  # shingle inverted-index self-join
    "minhash_near_dups",    # LSH candidates + exact verify
    "cosine_topk",          # brute-force ANN baseline
    "lang_id",              # text scoring over documents
]

# Timed and reported under "extra_queries" — NOT in the headline value,
# which must stay sum-of-the-16 comparable across rounds.
EXTRA_QUERIES = [
    "mutual_edges_salted",  # skew-safe J1 twin (same inputs as flagship)
    "curation_pipeline",    # the composed 6-stage curation showcase
    "bucketed_join",        # bucketBy layout: write-once, join shuffle-free
    "mixture_epochs",       # epoch-repeat mixture (sequence-explode fan-out)
    "txlog_zorder_scan",    # Z-order write + manifest box-pruned 2-D scan
    "txlog_change_feed",    # merge+delete+CDF diff over the txlog
    "txlog_delete_vectors", # merge-on-read deletes: zero-file point
    #                         erase (asserted in-query) + compaction
    # r15 additions (additive only — the protocol value stays the
    # sum of the 16 headline queries): the two LM scorers restructured
    # this round (VERDICT r14 Next #1b), so their trend is
    # driver-measured from now on.
    "lm_perplexity_interpolated",
    "lm_perplexity_kneser_ney",
]

# SURVEY §7 risk 5: celebrity fan-out. One synthetic hot key owning
# HOT_EDGES rows on BOTH edge sides, unioned onto the sf fact-derived
# edge sets; timed through the plain join and the salted twin so the
# skew answer is a recorded number, not a code path. Measured verdict
# (see BENCHNOTES.md): J1 joins on the COMPOSITE (user_id, edge) key,
# which a celebrity fans out into distinct values — the composite key
# is never skewed, plain wins, and the salted twin's 8x replication is
# pure overhead here. Salting pays only where a single-column hot key
# is forced (single-key joins/groupBys), which this records as data.
HOT_USER = 1 << 40
HOT_EDGES = 150_000


def _skew_bench(spark, registry, extras, runs: int) -> None:
    import pyspark.sql.functions as F

    from instagram_data_pipeline_spark.io import load_testdata
    from instagram_data_pipeline_spark.operators.mutuals import (
        mutual_edges,
        mutual_edges_salted,
    )

    li = load_testdata(spark, SF_DIR, "lineitem")
    followers = li.filter(F.col("l_discount") > 0.05).select(
        F.col("l_orderkey").alias("user_id"),
        F.col("l_suppkey").alias("follower_id"),
    )
    following = li.filter(F.col("l_tax") > 0.04).select(
        F.col("l_orderkey").alias("user_id"),
        F.col("l_suppkey").alias("following_id"),
    )
    hot = spark.range(HOT_EDGES).select(
        F.lit(HOT_USER).alias("user_id"), F.col("id").alias("edge")
    )
    skew_followers = followers.unionByName(
        hot.select("user_id", F.col("edge").alias("follower_id"))
    )
    skew_following = following.unionByName(
        hot.select("user_id", F.col("edge").alias("following_id"))
    )
    for label, fn in (
        ("mutual_edges_skew_plain",
         lambda: mutual_edges(skew_followers, skew_following)),
        ("mutual_edges_skew_salted",
         lambda: mutual_edges_salted(skew_followers, skew_following,
                                     salt=8)),
    ):
        best, n = None, 0
        for _ in range(runs):
            t0 = time.time()
            n = fn().count()  # count, not collect: hot key emits 150k rows
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
        extras[label] = round(best, 3)
        print(f"# {label}: {extras[label]:.3f}s ({n} rows)",
              file=sys.stderr)


def _wait_for_quiet() -> tuple[float, bool]:
    """Gate the run on machine quiet (VERDICT r7 What's-wrong #2: four
    rounds of co-tenant-polluted artifacts; VERDICT r8 Next #3: the r8
    artifact started at loadavg 1.82, just under the old 2.0 gate, and
    recorded a polluted regime anyway — the start gate is now 0.75): if
    the 1-min load average exceeds SPARK_GRAFT_BENCH_MAX_LOAD (default
    0.75), wait up to SPARK_GRAFT_BENCH_MAX_WAIT seconds (default 600)
    for it to drop, polling every 15s. Returns (loadavg at go-time,
    exceeded flag) — if the box never quiets, the run proceeds but the
    artifact carries loadavg_exceeded=true so the number is
    self-describing."""
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "0.75"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT", "600"))
    deadline = time.time() + max_wait
    load = os.getloadavg()[0]
    while load > max_load and time.time() < deadline:
        print(
            f"# load {load:.2f} > {max_load:.2f}: waiting for quiet "
            f"({deadline - time.time():.0f}s left)",
            file=sys.stderr,
        )
        time.sleep(15)
        load = os.getloadavg()[0]
    return load, load > max_load


# Per-query min-of-N spread above this fraction of the min flags the
# query as contended (VERDICT r8 Next #3): a quiet box repeats a
# 32-thread local query within a few percent; a co-tenant stealing
# cores between repeats shows up as spread long before it shows up in
# the 1-min loadavg (which our OWN executors also inflate mid-run, so
# an absolute mid-run load gate cannot discriminate).
SPREAD_FLAG_PCT = float(os.environ.get("SPARK_GRAFT_BENCH_SPREAD_PCT", "20"))


def _timed(fn, runs: int) -> tuple[float, float, int]:
    """(best_seconds, spread_pct, rows) over ``runs`` repeats. The
    best is min over ALL runs; the spread stamp is computed over runs
    2..N only — run 1 pays JVM JIT / codegen warm-up on every query,
    which is a constant of the harness, not contention. spread_pct =
    (worst_warm - best_warm) / best_warm * 100; with fewer than 3 runs
    there are not two warmed repeats to compare, so spread is 0."""
    times = []
    n = 0
    for _ in range(runs):
        t0 = time.time()
        n = fn()
        times.append(time.time() - t0)
    warm = times[1:]
    spread = (
        (max(warm) - min(warm)) / min(warm) * 100 if len(warm) >= 2 else 0.0
    )
    return min(times), spread, n


def envelope(paths: list[str]) -> None:
    """``bench.py --envelope run1.json run2.json ...`` — the per-query
    MIN across N round-close runs (VERDICT r11 Next #4: five protocol
    runs, zero unflagged — the quiet-trend table was blind for two
    rounds). A co-tenant inflates each run's TOTAL, but per-query
    minima across runs are a defensible quiet proxy: a query's best
    repeat across 5 runs had the fewest stolen cores, and plans are
    CI-pinned byte-stable between runs. Prints ONE JSON line mirroring
    the run shape, with per-run provenance stamps in-band; the
    BENCHNOTES trend table reads this envelope, the committed
    BENCH_r{N}.json stays the best single protocol run."""
    runs = [json.load(open(p)) for p in paths]
    if len(runs) < 2:
        raise SystemExit("--envelope needs >= 2 run files")
    # every run must cover the SAME query sets at the SAME sf — a
    # partial run file would silently bias the per-query minima and
    # the composite total (ADVICE r12)
    qk, xk, sf = (
        set(runs[0].get("queries", {})),
        set(runs[0].get("extra_queries", {})),
        runs[0].get("sf"),
    )
    for p, r in zip(paths, runs):
        if set(r.get("queries", {})) != qk:
            raise SystemExit(
                f"--envelope: {p} query set differs from {paths[0]} "
                f"(symmetric diff: "
                f"{sorted(set(r.get('queries', {})) ^ qk)})"
            )
        if set(r.get("extra_queries", {})) != xk:
            raise SystemExit(
                f"--envelope: {p} extra_queries set differs from "
                f"{paths[0]} (symmetric diff: "
                f"{sorted(set(r.get('extra_queries', {})) ^ xk)})"
            )
        if r.get("sf") != sf:
            raise SystemExit(
                f"--envelope: {p} sf={r.get('sf')} differs from "
                f"{paths[0]} sf={sf}"
            )
    q_min: dict[str, float] = {}
    x_min: dict[str, float] = {}
    for r in runs:
        for k, v in r.get("queries", {}).items():
            q_min[k] = min(v, q_min.get(k, v))
        for k, v in r.get("extra_queries", {}).items():
            x_min[k] = min(v, x_min.get(k, v))
    out = {
        "metric": "headline_suite_seconds_min_composite",
        "value": round(sum(q_min.values()), 3),
        # extras min-composite, so the trend table covers the extra
        # queries too — per-query extras drift was invisible to the
        # headline-only narrative (VERDICT r12 #2)
        "extras_value": round(sum(x_min.values()), 3),
        "unit": "sec",
        "queries": q_min,
        "extra_queries": x_min,
        "sf": runs[0].get("sf"),
        "n_runs": len(runs),
        "runs": [
            {
                "value": r.get("value"),
                "loadavg_start": r.get("loadavg_start"),
                "loadavg_peak": r.get("loadavg_peak"),
                "spread_flagged": bool(r.get("spread_flagged")),
                "n_noisy": len(r.get("noisy_queries", {})),
            }
            for r in runs
        ],
    }
    print(json.dumps(out))


def main() -> None:
    from instagram_data_pipeline_spark.queries import load_all
    from instagram_data_pipeline_spark.session import build_session

    load_start, load_exceeded = _wait_for_quiet()
    registry = load_all()
    spark = build_session(app_name="bench")
    # warm-up: JVM + parquet footers + OS page cache for every input
    # table. count() alone is near metadata-only and leaves the column
    # pages cold — hash-aggregating every column forces a full decode,
    # so the first TIMED run of each query starts from a warm cache
    # (this box drops its page cache aggressively; see BENCHNOTES.md).
    import pyspark.sql.functions as F

    from instagram_data_pipeline_spark.io import load_testdata

    for table in ("lineitem", "orders", "customer", "events",
                  "documents", "embeddings"):
        df = load_testdata(spark, SF_DIR, table)
        # pmod keeps the ANSI-mode sum far from long overflow
        df.agg(
            F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000)))
        ).collect()

    timings: dict[str, float] = {}
    noisy: dict[str, float] = {}
    load_peak = os.getloadavg()[0]
    # min-of-3 by default: BENCHNOTES.md — machine noise between rounds
    # exceeds most real deltas, min-of-N absorbs scheduler jitter
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    def run_set(names: list[str], sink: dict[str, float]) -> None:
        nonlocal load_peak
        for name in names:
            if name not in registry:
                continue
            best, spread, n = _timed(
                lambda: len(
                    registry[name].spark_fn(spark, SF_DIR).collect()
                ),
                runs,
            )
            sink[name] = round(best, 3)
            note = ""
            if runs > 1 and spread > SPREAD_FLAG_PCT:
                noisy[name] = round(spread, 1)
                note = f" [NOISY: spread {spread:.0f}%]"
            print(
                f"# {name}: {sink[name]:.3f}s ({n} rows){note}",
                file=sys.stderr,
            )
            # between-query load sample (VERDICT r8 Next #3): our own
            # executors inflate the 1-min loadavg, so this is recorded
            # provenance, not a gate — the spread stamp above is the
            # discriminating contention signal
            load_peak = max(load_peak, os.getloadavg()[0])

    run_set(BENCH_QUERIES, timings)
    extras: dict[str, float] = {}
    run_set(EXTRA_QUERIES, extras)
    _skew_bench(spark, registry, extras, runs)
    load_peak = max(load_peak, os.getloadavg()[0])

    # VERDICT r13 Next #3: a co-tenant storm mid-suite inflates exactly
    # the queries it overlapped (the r13 driver re-run read 1.92x r1
    # from one such storm). Spread-flagged HEADLINE queries get one
    # more timed run at suite end — usually after the storm — and the
    # retry composite is reported NEXT TO the protocol value, which
    # stays the untouched trend metric (same query set, same
    # methodology, same sf).
    retry: dict[str, float] = {}
    for name in [n for n in BENCH_QUERIES if n in noisy and n in timings]:
        t0 = time.time()
        registry[name].spark_fn(spark, SF_DIR).collect()
        retry[name] = round(min(timings[name], time.time() - t0), 3)
        print(
            f"# retry {name}: {retry[name]:.3f}s "
            f"(was {timings[name]:.3f}s)",
            file=sys.stderr,
        )

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "extra_queries": extras,
        "sf": sf_val,
        # machine-noise provenance: the committed artifact must be
        # self-describing about co-tenancy (VERDICT r7 #2, r8 Next #3)
        "loadavg_start": round(load_start, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
        "loadavg_peak": round(load_peak, 2),
    }
    if load_exceeded:
        out["loadavg_exceeded"] = True
    if noisy:
        # per-query min-of-N spread above SPREAD_FLAG_PCT: the number
        # was taken under contention — read it with that context
        out["noisy_queries"] = noisy
        out["spread_flagged"] = True
    if retry:
        out["queries_spread_retry"] = retry
        out["value_spread_retry"] = round(
            sum(retry.get(k, v) for k, v in timings.items()), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--envelope":
        envelope(sys.argv[2:])
    else:
        main()
