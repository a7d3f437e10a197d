"""Cross-process concurrent writers vs the CAS publish path (VERDICT
r10 Next #5): at 100 TB the writers of one table are SEPARATE DRIVERS,
so the conflict classification + disjoint-winner rebase
(`formats.py:420` — os.link create-if-absent as the CAS; losers rebase
carried files on disjoint-bucket wins or redo the merge on overlap)
must hold across OS processes, not just deterministic in-process
interleavings.

The test launches real worker PROCESSES (each its own JVM/SparkSession)
running overlapping merges / DV-deletes / compactions against ONE
table, then proves the committed history is SERIALIZABLE: every version
step must equal the atomic application of exactly ONE worker operation
to the prior committed state (model-compared by full-state replay), and
every operation that must commit — merges, and deletes that found live
victims — appears exactly once, no lost op, no double-publish from a
retry, no torn interleaving (no-op deletes and unneeded compactions
legitimately publish nothing). Bounded retries: a worker that exhausts
MAX_COMMIT_RETRIES raises and exits nonzero, failing the test."""

from __future__ import annotations

import json
import os
import subprocess
import sys

# Each worker is a standalone driver: own SparkSession, own
# TransactionLogFormat instance, shared table root on disk — the same
# topology as N cluster drivers sharing an object-store table.
_WORKER = """
import json, random, sys

wid, root, seed, n_ops, out = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
    sys.argv[5],
)
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName(f"txlog-writer-{wid}")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from instagram_data_pipeline_spark.formats import TransactionLogFormat


class Handle:  # table-root adapter, the shape the SQL catalog uses too
    def __init__(self, spark, root):
        self.spark, self._root = spark, root

    def path(self, _t):
        return self._root


fmt = TransactionLogFormat()
wh = Handle(spark, root)
rng = random.Random(seed)
log = []
for i in range(n_ops):
    kind = rng.choice(["merge", "merge", "merge", "delete", "optimize"])
    if kind == "merge":
        # keys drawn from ONE shared [0, 40) range: workers collide on
        # buckets AND keys, forcing redo-from-winning-snapshot paths
        ks = sorted(rng.sample(range(0, 40), rng.randrange(4, 10)))
        rows = ", ".join(f"({k}, '{wid}.{i}.{k}')" for k in ks)
        df = spark.sql(
            f"SELECT CAST(k AS BIGINT) AS k, v "
            f"FROM VALUES {rows} AS t(k, v)"
        )
        fmt.merge_source_wins(wh, "t", df, ["k"], num_buckets=4)
        log.append(
            {"op": "merge", "rows": {str(k): f"{wid}.{i}.{k}" for k in ks}}
        )
    elif kind == "delete":
        ks = sorted(rng.sample(range(0, 40), rng.randrange(2, 5)))
        df = spark.createDataFrame([(k,) for k in ks], "k long")
        n = fmt.delete_keys_dv(wh, "t", ["k"], df, num_buckets=4)
        # n > 0 <=> exactly one version published (n == 0 means every
        # victim was already absent and the op committed NOTHING)
        log.append(
            {"op": "delete", "keys": [str(k) for k in ks], "n": int(n)}
        )
    else:
        fmt.compact(wh, "t", ["k"], num_buckets=4)
        log.append({"op": "optimize"})

json.dump(log, open(out, "w"))
spark.stop()
"""


def _apply(state: dict, op: dict) -> dict:
    """The intended ATOMIC effect of one worker op on a key->value
    state — the serializability oracle each commit is matched against."""
    if op["op"] == "merge":
        return {**state, **{int(k): v for k, v in op["rows"].items()}}
    if op["op"] == "delete":
        gone = {int(k) for k in op["keys"]}
        return {k: v for k, v in state.items() if k not in gone}
    return dict(state)  # optimize/compact: layout-only, state-identical


def test_cross_process_writers_serialize(spark, tmp_path):
    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse

    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    root = wh.path("t")

    # seed v1 from the parent so every worker starts on a live table
    fmt.merge_source_wins(
        wh, "t",
        spark.sql(
            "SELECT id AS k, concat('seed.', id) AS v FROM range(40)"
        ),
        ["k"], num_buckets=4,
    )

    n_workers, n_ops = 3, 4
    env = {**os.environ, "PYTHONPATH": os.getcwd()}
    procs, outs = [], []
    for w in range(n_workers):
        out = str(tmp_path / f"worker{w}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-c", _WORKER,
                    f"w{w}", root, str(1000 + w), str(n_ops), out,
                ],
                env=env,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.PIPE,
            )
        )
    for p in procs:
        _, err = p.communicate(timeout=600)
        # nonzero exit = an op raised (e.g. CommitConflict after
        # MAX_COMMIT_RETRIES) — retries must stay bounded AND succeed
        # at this contention level
        assert p.returncode == 0, err.decode()[-2000:]

    ops = []
    for out in outs:
        ops.extend(json.load(open(out)))
    assert len(ops) == n_workers * n_ops

    # publish accounting: every merge and every delete that FOUND live
    # victims (n > 0) published exactly one version; a delete whose
    # victims were all already absent publishes nothing, and compact
    # publishes only when there is something to rewrite — no lost op,
    # no double-publish from a rebase/retry
    merges = [op for op in ops if op["op"] == "merge"]
    live_deletes = [
        op for op in ops if op["op"] == "delete" and op["n"] > 0
    ]
    optimizes = [op for op in ops if op["op"] == "optimize"]
    vs = fmt.versions(wh, "t")
    n_commits = len(vs) - 1
    must_commit = len(merges) + len(live_deletes)
    assert must_commit <= n_commits <= must_commit + len(optimizes), (
        vs, {op["op"]: 1 for op in ops}
    )

    # serializability by full-state replay: each committed step must
    # equal exactly one unmatched worker op applied atomically to the
    # prior committed state (optimize commits are state-identical)
    states = {
        v: {r.k: r.v for r in fmt.read_version(wh, "t", v).collect()}
        for v in vs
    }
    state = states[vs[0]]
    unmatched: list = list(ops)
    order = []
    for vb in vs[1:]:
        post = states[vb]
        hit = next(
            (
                j
                for j, op in enumerate(unmatched)
                if op is not None and _apply(state, op) == post
            ),
            None,
        )
        assert hit is not None, (
            f"commit v{vb} is not the atomic application of any single "
            f"worker op — torn or interleaved write"
        )
        order.append(unmatched[hit]["op"])
        unmatched[hit] = None
        state = post
    # every must-commit op was consumed by exactly one version step;
    # only no-op deletes (n == 0) and unneeded compactions may remain
    leftovers = [op for op in unmatched if op is not None]
    assert all(
        op["op"] == "optimize" or (op["op"] == "delete" and op["n"] == 0)
        for op in leftovers
    ), leftovers

    # the walk genuinely mixed op kinds across processes
    assert "merge" in order and (live_deletes or optimizes)

    # final live state agrees with the merged read and the metadata count
    final = {r.k: r.v for r in fmt.read_merged(wh, "t").collect()}
    assert final == state
    assert fmt.count_rows(wh, "t") == len(state)
