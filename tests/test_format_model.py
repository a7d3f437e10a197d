"""Model-based sequence test for TransactionLogFormat: deterministic
pseudo-random interleavings of every table operation, each step checked
against a pure-Python reference model of the table state.

The unit tests pin each feature in isolation; THIS test pins their
compositions — merge after rename after DV-delete after widen after
compact after rebucket — where metadata-carrying bugs live (the r8
code review found exactly one such: delete_keys dropping the column
mapping; the r9 run of this test found the type-sensitive bucket-probe
bug). Round 10 (VERDICT r9 Next #5): the op mix now ALSO drives the
TEXT-LEVEL SQL surface (TxlogSqlCatalog) — random time-travel reads
checked against recorded historical key sets, MERGE INTO, UPDATE,
DELETE, INSERT INTO (with duplicate-key refusal re-checked in-op),
and RESTORE (which rewinds the whole model state: rows, schema shape,
bucket contract) — interleaved with the API ops against the same
reference model, so rewriter/validation/DML bugs surface under
composition too. A fixed seed keeps runs reproducible.

Round 11 (VERDICT r10 Next #4) points the walk at the r10 statement
set: CHECK constraints (ADD with its validation scan, violating
INSERT/UPDATE refused mid-walk, DROP re-opening the policy — sidecar
state deliberately NOT rewound by RESTORE), CTAS + CREATE OR REPLACE
(forward commit over the side table's log), CONVERT TO TXLOG (adopt a
directory mid-walk, then DELETE/MERGE against it), VACUUM KEEP k
VERSIONS composed with time travel (the model forgets expired versions
and asserts reads of them refuse cleanly), plus the r11 overwrite
family — self-referencing INSERT OVERWRITE (the source must read the
pre-overwrite table) and TRUNCATE (both one forward commit under the
recorded contract, composed with rename/widen/DV/rebucket state). Each
fires at random walk positions AND once per seed in a scripted coda,
so every seed covers the full op set under composition."""

from __future__ import annotations

import datetime as dt
import random

import pytest


def _expected_rows(model: dict) -> dict:
    """model['rows']: {k: (val_by_logical_colname dict)}"""
    return model["rows"]


# seed 101 chosen deliberately: its walk fires op_sql_restore twice
# (the r10 op with the deepest state rewind), composed with rebucket,
# rename, and DV deletes
@pytest.mark.parametrize("seed", [11, 23, 47, 101])
def test_txlog_random_op_sequences_match_reference_model(
    spark, tmp_path, seed
):
    from pyspark.sql import functions as F

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    rng = random.Random(seed)
    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / f"wh{seed}"), fmt=fmt)
    KEYS = ["k"]
    BUCKETS = 4
    cat = TxlogSqlCatalog(spark)

    # reference model: logical column list + {k: row dict} + a clock
    # + per-committed-version FULL-STATE history (rows/cols/widened/
    # buckets — time-travel checks read the key set; RESTORE rewinds
    # the whole model state to a recorded version, schema and bucket
    # contract included)
    model = {
        "cols": ["k", "v", "cnt", "ts"],
        "rows": {},
        "t": dt.datetime(2024, 1, 1),
        "buckets": BUCKETS,
        "widened": False,
        "versions": {},
        # round-12 statement-surface state: CHECK-constraint active
        # flag — since the set moved INTO the versioned manifest, it
        # rewinds with RESTORE like every other metadata section (the
        # round-11 sidecar deliberately did not) — and per-walk
        # counters for CTAS / CONVERT side tables
        "constraint": False,
        "ctas_n": 0,
        "conv_n": 0,
        # round-13: NOT NULL promote state for cols[1] — nullability
        # lives in the manifest SCHEMA, so it must survive merges
        # (carry-nullability), follow renames, and rewind with RESTORE
        "not_null": False,
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
        # half the time through the SQL shim (ALTER TABLE), half the
        # API — same primitive, two entry points under composition
        if rng.random() < 0.5:
            cat.register("t", wh.path("t"))
            cat.sql(f"ALTER TABLE t RENAME COLUMN {old} TO {new}")
        else:
            fmt.rename_column(wh, "t", old, new)
        for r in model["rows"].values():
            r[new] = r.pop(old)
        model["cols"][1] = new

    def op_widen():
        if model["widened"]:
            return
        if rng.random() < 0.5:
            cat.register("t", wh.path("t"))
            cat.sql(
                f"ALTER TABLE t ALTER COLUMN {model['cols'][2]} "
                f"TYPE BIGINT"
            )
        else:
            fmt.widen_column(wh, "t", model["cols"][2], "long")
        model["widened"] = True

    def op_compact():
        fmt.compact(wh, "t", KEYS, num_buckets=model["buckets"])

    def op_rebucket():
        new_b = rng.choice([2, 3, 5, 8])
        fmt.rebucket(wh, "t", new_b)
        model["buckets"] = new_b

    # ---- text-level SQL surface (round 10: rewriter/DML under the
    # same random composition; the catalog reads keys/buckets from
    # the RECORDED contract, so rebucket/rename must stay invisible)
    def op_sql_time_travel():
        if not model["versions"]:
            return
        v = rng.choice(sorted(model["versions"]))
        cat.register("t", wh.path("t"))
        # trailing literal + comment are masking red herrings
        got = {
            r.k
            for r in cat.sql(
                f"SELECT k, 't VERSION AS OF 999999' AS lit "
                f"FROM t VERSION AS OF {v} "
                f"-- t VERSION AS OF 999999\n"
            ).collect()
        }
        assert got == set(
            model["versions"][v]["rows"]
        ), f"time travel to v{v}"

    def op_sql_merge():
        lo = rng.randrange(0, 400)
        ks = sorted(rng.sample(range(lo, lo + 60), rng.randrange(5, 20)))
        ts = model["t"] - dt.timedelta(days=3)
        spark_batch(ks, "q", ts).createOrReplaceTempView("model_sql_src")
        cat.register("t", wh.path("t"))
        m = cat.sql(
            "MERGE INTO t USING model_sql_src "
            "ON t.k = model_sql_src.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        ).first()
        assert m.num_source_rows == len(ks)
        for k in ks:
            model["rows"][k] = {
                model["cols"][1]: f"q{k}",
                model["cols"][2]: k * 3,
                "ts": ts,
            }

    def op_sql_update():
        mod, rem = rng.choice([(3, 0), (5, 2), (7, 4)])
        col = model["cols"][1]
        cat.register("t", wh.path("t"))
        m = cat.sql(
            f"UPDATE t SET {col} = concat({col}, '!') "
            f"WHERE k % {mod} = {rem}"
        ).first()
        hit = [k for k in model["rows"] if k % mod == rem]
        assert m.num_affected_rows == len(hit)
        for k in hit:
            model["rows"][k][col] = model["rows"][k][col] + "!"

    def op_sql_delete():
        existing = list(model["rows"])
        if not existing:
            return
        ks = rng.sample(existing, min(len(existing), rng.randrange(1, 5)))
        in_list = ", ".join(str(k) for k in ks + [10**9])
        cat.register("t", wh.path("t"))
        m = cat.sql(f"DELETE FROM t WHERE k IN ({in_list})").first()
        assert m.num_affected_rows == len(ks)
        for k in ks:
            model["rows"].pop(k, None)

    def op_sql_optimize():
        # layout-only: rows/values unchanged by contract
        cat.register("t", wh.path("t"))
        m = cat.sql("OPTIMIZE t").first()
        assert m.files_after <= m.files_before

    def op_sql_insert():
        # keys from a range no other op touches (merges draw from
        # [0, 460)), so the key-unique contract is satisfied; the
        # model adds the rows like any merge
        lo = 1000 + rng.randrange(0, 5000)
        ks = sorted(rng.sample(range(lo, lo + 60), rng.randrange(3, 9)))
        ks = [k for k in ks if k not in model["rows"]]
        if not ks:
            return
        ts = tick()
        cnt_t = "BIGINT" if model["widened"] else "INT"
        vals = ", ".join(
            f"({k}, 'i{k}', CAST({k * 3} AS {cnt_t}), "
            f"TIMESTAMP '{ts.isoformat()}')"
            for k in ks
        )
        cols = model["cols"]
        cat.register("t", wh.path("t"))
        m = cat.sql(
            f"INSERT INTO t (k, {cols[1]}, {cols[2]}, ts) VALUES {vals}"
        ).first()
        assert m.num_inserted_rows == len(ks)
        for k in ks:
            model["rows"][k] = {
                model["cols"][1]: f"i{k}",
                model["cols"][2]: k * 3,
                "ts": ts,
            }
        # and a colliding re-insert of the same keys is refused
        try:
            cat.sql(
                f"INSERT INTO t (k, {cols[1]}, {cols[2]}, ts) "
                f"VALUES {vals}"
            )
            raise AssertionError("duplicate-key INSERT not refused")
        except ValueError:
            pass

    def op_sql_restore():
        if len(model["versions"]) < 2:
            return
        v = rng.choice(sorted(model["versions"])[:-1])
        cat.register("t", wh.path("t"))
        m = cat.sql(f"RESTORE TABLE t TO VERSION AS OF {v}").first()
        assert m.restored_source_version == v
        # rewind the WHOLE model state: rows, schema shape, bucket
        # contract (the restored manifest is what v's readers saw)
        rec = model["versions"][v]
        model["rows"] = {
            k: dict(row) for k, row in rec["rows"].items()
        }
        model["cols"] = list(rec["cols"])
        model["widened"] = rec["widened"]
        model["buckets"] = rec["buckets"]
        # constraints are manifest metadata since round 12: the
        # restored version's CHECK set is live policy again
        model["constraint"] = rec["constraint"]
        # nullability is schema metadata (round 13): it rewinds too
        model["not_null"] = rec["not_null"]

    # ---- round-11 statement surface (VERDICT r10 Next #4): point the
    # random walk at the newest least-hardened ops — CHECK constraints,
    # CTAS/OR-REPLACE, CONVERT TO TXLOG, VACUUM KEEP k VERSIONS
    def op_sql_constraints():
        cnt = model["cols"][2]
        cnt_t = "BIGINT" if model["widened"] else "INT"
        cat.register("t", wh.path("t"))
        if not model["constraint"]:
            # ADD runs its one-time full validation scan (cnt = k*3 is
            # always >= 0, so the current table must pass it)
            cat.sql(
                f"ALTER TABLE t ADD CONSTRAINT cnt_nonneg "
                f"CHECK ({cnt} >= 0)"
            )
            model["constraint"] = True
            # a violating INSERT is refused atomically mid-walk
            cols = model["cols"]
            try:
                cat.sql(
                    f"INSERT INTO t (k, {cols[1]}, {cnt}, ts) VALUES "
                    f"(888888888, 'bad', CAST(-1 AS {cnt_t}), "
                    f"TIMESTAMP '2030-01-01')"
                )
                raise AssertionError(
                    "constraint-violating INSERT not refused"
                )
            except ValueError as e:
                assert "violate constraint" in str(e)
        else:
            # a violating UPDATE is refused (when it would hit rows);
            # then DROP re-opens the policy
            if any(k % 2 == 0 for k in model["rows"]):
                try:
                    cat.sql(
                        f"UPDATE t SET {cnt} = CAST(-5 AS {cnt_t}) "
                        f"WHERE k % 2 = 0"
                    )
                    raise AssertionError(
                        "constraint-violating UPDATE not refused"
                    )
                except ValueError as e:
                    assert "violate constraint" in str(e)
            cat.sql("ALTER TABLE t DROP CONSTRAINT cnt_nonneg")
            model["constraint"] = False

    def op_sql_ctas():
        # CTAS from the live table; later firings exercise OR REPLACE
        # (a FORWARD commit over the side table's existing log)
        model["ctas_n"] += 1
        loc = str(tmp_path / f"side{seed}")
        cat.register("t", wh.path("t"))
        stmt = (
            "CREATE OR REPLACE TABLE"
            if model["ctas_n"] > 1
            else "CREATE TABLE"
        )
        m = cat.sql(
            f"{stmt} side USING txlog CLUSTERED BY (k) INTO 2 BUCKETS "
            f"LOCATION '{loc}' AS SELECT * FROM t"
        ).first()
        assert m.num_rows == len(model["rows"])
        assert (
            cat.sql("SELECT count(*) AS n FROM side").first().n
            == len(model["rows"])
        )

    def op_sql_convert():
        # adopt a fresh flat parquet directory mid-walk, then run DML
        # against the adopted table immediately
        model["conv_n"] += 1
        name = f"conv{model['conv_n']}"
        loc = str(tmp_path / f"{name}_{seed}")
        spark.sql(
            "SELECT id AS k, CAST(id AS DOUBLE) AS val FROM range(30)"
        ).coalesce(2).write.parquet(loc)
        m = cat.sql(
            f"CONVERT TO TXLOG {name} LOCATION '{loc}' "
            f"CLUSTERED BY (k)"
        ).first()
        assert m.num_rows == 30 and m.table_version == 1
        md = cat.sql(
            f"DELETE FROM {name} WHERE k IN (0, 1, 2, 999)"
        ).first()
        assert md.num_affected_rows == 3
        spark.sql(
            "SELECT id AS k, CAST(id * 10 AS DOUBLE) AS val "
            "FROM range(25, 40)"
        ).createOrReplaceTempView("conv_src")
        cat.sql(
            f"MERGE INTO {name} USING conv_src ON {name}.k = conv_src.k "
            f"WHEN MATCHED THEN UPDATE SET * "
            f"WHEN NOT MATCHED THEN INSERT *"
        )
        got = {
            r.k: r.val
            for r in cat.sql(f"SELECT * FROM {name}").collect()
        }
        assert len(got) == 30 - 3 + 10
        assert got[3] == 3.0 and got[25] == 250.0 and got[39] == 390.0

    def op_sql_overwrite():
        # self-referencing INSERT OVERWRITE: keeps the odd keys — the
        # source must read the PRE-overwrite table (files-first
        # ordering), composed with whatever mapping/widening/DV state
        # the walk built up
        cat.register("t", wh.path("t"))
        m = cat.sql(
            "INSERT OVERWRITE t SELECT * FROM t WHERE k % 2 = 1"
        ).first()
        want = {k: r for k, r in model["rows"].items() if k % 2 == 1}
        assert m.num_overwritten_rows == len(want)
        model["rows"] = want

    def op_sql_replace_where():
        # predicate-scoped overwrite (round 12, Delta replaceWhere):
        # replace exactly the k%3==0 slice with fresh rows — incoming
        # keys are multiples of 3 so they satisfy the predicate AND
        # can never clash with a non-matching row's key
        cat.register("t", wh.path("t"))
        cols = model["cols"]
        cnt_t = "BIGINT" if model["widened"] else "INT"
        ks = sorted(
            {3 * x for x in rng.sample(range(0, 130), rng.randrange(3, 8))}
        )
        ts = tick()
        tag = f"rw{ts.day}{ts.month}"
        vals = ", ".join(
            f"({k}, '{tag}{k}', CAST({k * 3} AS {cnt_t}), "
            f"TIMESTAMP '{ts.isoformat()}')"
            for k in ks
        )
        m = cat.sql(
            f"INSERT OVERWRITE t WHERE k % 3 = 0 "
            f"SELECT * FROM VALUES {vals} AS "
            f"s(k, {cols[1]}, {cols[2]}, ts)"
        ).first()
        matching = [k for k in model["rows"] if k % 3 == 0]
        assert m.num_replaced_rows == len(matching)
        assert m.num_inserted_rows == len(ks)
        model["rows"] = {
            k: r for k, r in model["rows"].items() if k % 3 != 0
        }
        for k in ks:
            model["rows"][k] = {
                cols[1]: f"{tag}{k}",
                cols[2]: k * 3,
                "ts": ts,
            }

    def op_sql_not_null():
        # round-13 validated promote: toggle NOT NULL on cols[1]
        # (every model row holds a non-null tag there, so the
        # promote's validation scan must pass), then prove a
        # NULL-bearing INSERT is refused mid-walk; DROP releases it
        col = model["cols"][1]
        cols = model["cols"]
        cnt_t = "BIGINT" if model["widened"] else "INT"
        cat.register("t", wh.path("t"))
        if not model["not_null"]:
            m = cat.sql(
                f"ALTER TABLE t ALTER COLUMN {col} SET NOT NULL"
            ).first()
            assert m.operation == f"set not null {col}"
            model["not_null"] = True
            try:
                cat.sql(
                    f"INSERT INTO t (k, {cols[1]}, {cols[2]}, ts) "
                    f"VALUES (777777777, NULL, CAST(1 AS {cnt_t}), "
                    f"TIMESTAMP '2030-01-01')"
                )
                raise AssertionError("NULL-bearing INSERT not refused")
            except ValueError as e:
                assert "NOT NULL" in str(e)
        else:
            cat.sql(f"ALTER TABLE t ALTER COLUMN {col} DROP NOT NULL")
            model["not_null"] = False

    def op_sql_truncate():
        cat.register("t", wh.path("t"))
        m = cat.sql("TRUNCATE TABLE t").first()
        assert m.num_removed_rows == len(model["rows"])
        model["rows"] = {}

    def op_sql_vacuum_keep():
        vs = fmt.versions(wh, "t")
        if len(vs) < 3:
            return
        keep = rng.randrange(2, min(len(vs), 6))
        cat.register("t", wh.path("t"))
        m = cat.sql(f"VACUUM t KEEP {keep} VERSIONS").first()
        assert fmt.versions(wh, "t") == vs[-keep:]
        assert m.num_expired_versions == len(vs) - keep
        expired = vs[:-keep]
        # the model forgets expired versions — and time travel to one
        # must now refuse cleanly, naming it (manifests-before-files
        # ordering made this model-checkable)
        try:
            cat.sql(
                f"SELECT k FROM t VERSION AS OF {expired[-1]}"
            ).collect()
            raise AssertionError("expired-version read not refused")
        except Exception as e:
            assert "expired" in str(e)
        for v in expired:
            model["versions"].pop(v, None)

    def record_version():
        vs = fmt.versions(wh, "t")
        model["versions"][vs[-1]] = {
            "rows": {k: dict(row) for k, row in model["rows"].items()},
            "cols": list(model["cols"]),
            "widened": model["widened"],
            "buckets": model["buckets"],
            "constraint": model["constraint"],
            "not_null": model["not_null"],
        }

    # seed the table, then a random walk over every op
    op_merge()
    record_version()
    ops = [
        op_merge, op_merge,  # merges twice as likely
        op_merge_source_wins,
        lambda: op_delete(True), lambda: op_delete(False),
        op_rename, op_widen, op_compact, op_rebucket,
        op_sql_time_travel, op_sql_merge, op_sql_update, op_sql_delete,
        op_sql_optimize, op_sql_insert, op_sql_restore,
        op_sql_constraints, op_sql_ctas, op_sql_convert,
        op_sql_vacuum_keep, op_sql_overwrite, op_sql_truncate,
        op_sql_replace_where, op_sql_not_null,
    ]
    for _ in range(14):
        rng.choice(ops)()
        record_version()
        # invariant: metadata-only count equals the model
        assert fmt.count_rows(wh, "t") == len(model["rows"])
    # scripted coda: every round-11 op fires at least once PER SEED,
    # composed with whatever state the random walk left behind (the
    # walk above additionally interleaves them at random positions).
    # TRUNCATE fires mid-coda with a repopulating merge after it, so
    # the end-of-walk full-state check still compares real data.
    for op in (
        op_sql_constraints, op_sql_truncate, op_merge,
        op_sql_not_null, op_sql_overwrite, op_sql_replace_where,
        op_sql_ctas, op_sql_convert, op_sql_vacuum_keep,
    ):
        op()
        record_version()
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
