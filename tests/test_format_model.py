"""Model-based sequence test for TransactionLogFormat: deterministic
pseudo-random interleavings of every table operation, each step checked
against a pure-Python reference model of the table state.

The unit tests pin each feature in isolation; THIS test pins their
compositions — merge after rename after DV-delete after widen after
compact after rebucket — where metadata-carrying bugs live (the r8
code review found exactly one such: delete_keys dropping the column
mapping). A fixed seed keeps runs reproducible."""

from __future__ import annotations

import datetime as dt
import random

import pytest


def _expected_rows(model: dict) -> dict:
    """model['rows']: {k: (val_by_logical_colname dict)}"""
    return model["rows"]


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_txlog_random_op_sequences_match_reference_model(
    spark, tmp_path, seed
):
    from pyspark.sql import functions as F

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse

    rng = random.Random(seed)
    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / f"wh{seed}"), fmt=fmt)
    KEYS = ["k"]
    BUCKETS = 4

    # reference model: logical column list + {k: row dict} + a clock
    model = {
        "cols": ["k", "v", "cnt", "ts"],
        "rows": {},
        "t": dt.datetime(2024, 1, 1),
        "buckets": BUCKETS,
        "widened": False,
    }

    def tick() -> dt.datetime:
        model["t"] += dt.timedelta(days=1)
        return model["t"]

    def spark_batch(ks, tag, ts):
        cnt_t = "BIGINT" if model["widened"] else "INT"
        rows = ", ".join(
            f"({k}, '{tag}{k}', CAST({k * 3} AS {cnt_t}), "
            f"TIMESTAMP '{ts.isoformat()}')"
            for k in ks
        )
        cols = model["cols"]
        df = spark.sql(
            f"SELECT * FROM VALUES {rows} AS t(k, {cols[1]}, "
            f"{cols[2]}, ts)"
        )
        return df

    def op_merge():
        lo = rng.randrange(0, 400)
        ks = sorted(rng.sample(range(lo, lo + 60), rng.randrange(5, 25)))
        ts = tick()
        tag = f"m{ts.day}{ts.month}"
        wh.upsert_partitioned(
            "t", spark_batch(ks, tag, ts), KEYS, "ts",
            num_buckets=model["buckets"],
        )
        for k in ks:
            model["rows"][k] = {
                model["cols"][1]: f"{tag}{k}",
                model["cols"][2]: k * 3,
                "ts": ts,
            }

    def op_merge_source_wins():
        # MERGE INTO semantics: the source replaces matched rows even
        # though its ts is deliberately OLDER than anything stored —
        # keep-newest would reject these rows; source-wins must not
        lo = rng.randrange(0, 400)
        ks = sorted(rng.sample(range(lo, lo + 60), rng.randrange(5, 25)))
        ts = model["t"] - dt.timedelta(days=5)
        tag = "s"
        fmt.merge_source_wins(
            wh, "t", spark_batch(ks, tag, ts), KEYS,
            num_buckets=model["buckets"],
        )
        for k in ks:
            model["rows"][k] = {
                model["cols"][1]: f"{tag}{k}",
                model["cols"][2]: k * 3,
                "ts": ts,
            }

    def op_delete(dv: bool):
        existing = list(model["rows"])
        if not existing:
            return
        ks = rng.sample(existing, min(len(existing), rng.randrange(1, 6)))
        ks += [10**9]  # one never-present key
        frame = spark.createDataFrame([(k,) for k in ks], "k long")
        fn = fmt.delete_keys_dv if dv else fmt.delete_keys
        n = fn(wh, "t", KEYS, frame, num_buckets=model["buckets"])
        assert n == len(ks) - 1
        for k in ks[:-1]:
            model["rows"].pop(k, None)

    def op_rename():
        old = model["cols"][1]
        new = f"{old}x"
        fmt.rename_column(wh, "t", old, new)
        for r in model["rows"].values():
            r[new] = r.pop(old)
        model["cols"][1] = new

    def op_widen():
        if model["widened"]:
            return
        fmt.widen_column(wh, "t", model["cols"][2], "long")
        model["widened"] = True

    def op_compact():
        fmt.compact(wh, "t", KEYS, num_buckets=model["buckets"])

    def op_rebucket():
        new_b = rng.choice([2, 3, 5, 8])
        fmt.rebucket(wh, "t", new_b)
        model["buckets"] = new_b

    # seed the table, then a random walk over every op
    op_merge()
    ops = [
        op_merge, op_merge,  # merges twice as likely
        op_merge_source_wins,
        lambda: op_delete(True), lambda: op_delete(False),
        op_rename, op_widen, op_compact, op_rebucket,
    ]
    for _ in range(12):
        rng.choice(ops)()
        # invariant: metadata-only count equals the model
        assert fmt.count_rows(wh, "t") == len(model["rows"])

    # final state: every column of every row matches the model
    got = {
        r["k"]: {c: r[c] for c in model["cols"] if c != "k"}
        for r in (
            fmt.read_merged(wh, "t")
            .withColumn("ts", F.date_format("ts", "yyyy-MM-dd"))
            .collect()
        )
    }
    want = {
        k: {
            **{c: v for c, v in row.items() if c != "ts"},
            "ts": row["ts"].strftime("%Y-%m-%d"),
        }
        for k, row in model["rows"].items()
    }
    assert got == want

    # and the whole history replays: CDF v1 -> latest nets out to the
    # final state as pure inserts (keys only; values checked above)
    vs = fmt.versions(wh, "t")
    feed = fmt.changes_between(wh, "t", KEYS, vs[0], vs[-1])
    by_type: dict[str, set] = {}
    for r in feed.select("_change_type", "k").collect():
        by_type.setdefault(r._change_type, set()).add(r.k)
    v1 = {r.k for r in fmt.read_version(wh, "t", vs[0]).collect()}
    final = set(model["rows"])
    assert by_type.get("insert", set()) == final - v1
    assert by_type.get("delete", set()) == v1 - final
    assert by_type.get("update_preimage", set()) == by_type.get(
        "update_postimage", set()
    )
    assert by_type.get("update_preimage", set()) <= (v1 & final)
