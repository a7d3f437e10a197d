"""Ingest boundary (S3): JSON-lines profile parsing with quarantine, and
env-driven engine config."""

from __future__ import annotations

from instagram_data_pipeline_spark.config import EngineConfig, load_config
from instagram_data_pipeline_spark.sources.profiles import (
    parse_profile_records,
    read_profile_jsonl,
)

GOOD = '{"user_id": "u1", "username": "alice", "full_name": "Alice", "bio": "hi", "profile_pic_url": null, "follower_count": 10, "following_count": 5, "is_private": false}'
MISSING_KEY = '{"username": "no_id"}'
GARBAGE = "not json at all {"


def test_parse_profiles_good_and_quarantine(spark):
    raw = spark.createDataFrame(
        [(GOOD,), (MISSING_KEY,), (GARBAGE,)], "value string"
    )
    good, bad = parse_profile_records(raw)
    rows = good.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == "u1" and r.follower_count == 10 and r.is_private is False
    assert r.last_updated is None  # the writer stamps it (A1)
    quarantined = {b.raw_payload for b in bad.collect()}
    assert quarantined == {MISSING_KEY, GARBAGE}


def test_read_profile_jsonl_roundtrip(spark, tmp_path):
    p = tmp_path / "profiles.jsonl"
    p.write_text(GOOD + "\n" + GARBAGE + "\n")
    good, bad = read_profile_jsonl(spark, str(p))
    assert good.count() == 1 and bad.count() == 1
    # good output is upsert-ready: schema matches the users table
    from instagram_data_pipeline_spark.schemas import USERS

    assert [f.name for f in good.schema.fields] == [f.name for f in USERS.fields]


def test_config_defaults_and_env(monkeypatch):
    cfg = load_config()
    assert cfg.daily_quota == 200 and cfg.batch_size == 10
    assert cfg.model_batch_size == 20 and cfg.analysis_limit == 5
    monkeypatch.setenv("PIPELINE_DAILY_QUOTA", "7")
    monkeypatch.setenv("PIPELINE_BATCH_SIZE", "junk")  # bad value -> default
    cfg2 = load_config()
    assert cfg2.daily_quota == 7 and cfg2.batch_size == 10


# ---------------------------------------------------------------------------
# S4/S5 live-source connector: protocol + file-landing adapter
# ---------------------------------------------------------------------------

def test_landing_adapter_pages_to_files(spark, tmp_path):
    from instagram_data_pipeline_spark.sources.live import (
        FakePaginatedSource,
        FileLandingAdapter,
        read_edges,
    )

    spool = str(tmp_path / "spool")
    adapter = FileLandingAdapter(spool)
    n = adapter.land(FakePaginatedSource(35, page_size=10), "acct")
    assert n == 35
    import os

    files = [f for f in os.listdir(spool) if f.endswith(".jsonl")]
    assert len(files) == 4  # 10+10+10+5
    assert not [f for f in os.listdir(spool) if f.endswith(".tmp")]
    raw = read_edges(spark, spool)
    assert raw.count() == 35
    # max_count honored (the reference's early break)
    n2 = FileLandingAdapter(str(tmp_path / "s2")).land(
        FakePaginatedSource(100, page_size=10), "acct", max_count=25
    )
    assert n2 == 25


def test_parse_edge_records_edges_and_stubs(spark, tmp_path):
    from instagram_data_pipeline_spark.sources.live import (
        FakePaginatedSource,
        FileLandingAdapter,
        parse_edge_records,
        read_edges,
    )

    spool = str(tmp_path / "spool")
    FileLandingAdapter(spool).land(FakePaginatedSource(12, page_size=5), "acct")
    edges, stubs = parse_edge_records(read_edges(spark, spool))
    e = edges.collect()
    assert len(e) == 12
    assert all(r.relation == "followers" and r.user_id == "acct" for r in e)
    s = {r.user_id: r for r in stubs.collect()}
    assert len(s) == 12
    assert s["acct_f0"].username == "fan_0" and s["acct_f0"].is_private is True
    assert s["acct_f1"].bio is None  # stub profile, to be enriched later


def test_spool_streams_as_micro_batches(spark, tmp_path, tmp_path_factory):
    """Each landed page file becomes one micro-batch under
    maxFilesPerTrigger=1 — pagination maps 1:1 onto triggers (T3), and
    the checkpoint is the resumable cursor (T6)."""
    from instagram_data_pipeline_spark.sources.live import (
        FakePaginatedSource,
        FileLandingAdapter,
        stream_edges,
    )

    spool = str(tmp_path / "spool")
    FileLandingAdapter(spool).land(FakePaginatedSource(30, page_size=10), "acct")
    epochs = []
    q = (
        stream_edges(spark, spool, max_files_per_trigger=1)
        .writeStream.foreachBatch(
            lambda df, eid: epochs.append((eid, df.count()))
        )
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ckpt")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert [n for _, n in epochs if n > 0] == [10, 10, 10]


# ---------------------------------------------------------------------------
# Concrete connector proof (VERDICT r3 #7): a cursor-paginated local
# fixture driven through land_resumable into the file stream, followers
# table and ledger — with TWO mid-run crashes (connector dies between
# pages; process dies between page publish and cursor write) and exact
# resume on both.
# ---------------------------------------------------------------------------


def _edge_rec(i: int) -> dict:
    return {
        "user_id": "acct",
        "relation": "followers",
        "other_id": f"acct_f{i}",
        "other_username": f"fan_{i}",
        "other_full_name": f"Fan {i}",
        "other_profile_pic_url": None,
        "other_is_private": i % 3 == 0,
    }


def _write_fixture(root, username="acct"):
    """5 pages of 10/10/10/10/5 records chained through deliberately
    unordered tokens — the walk must follow next_token links, not
    directory order."""
    import json as _json

    d = root / username
    d.mkdir(parents=True)
    tokens = ["start", "t_zz", "t_aa", "t_q9", "t_m4"]
    sizes = [10, 10, 10, 10, 5]
    at = 0
    for p, (tok, n) in enumerate(zip(tokens, sizes)):
        nxt = tokens[p + 1] if p + 1 < len(tokens) else None
        body = {
            "records": [_edge_rec(i) for i in range(at, at + n)],
            "next_token": nxt,
        }
        (d / f"page-{tok}.json").write_text(_json.dumps(body))
        at += n
    return at


class _CrashAfter:
    """Connector wrapper that dies mid-pagination (network blip)."""

    def __init__(self, inner, n_pages: int):
        self.inner = inner
        self.n = n_pages

    def pages_from(self, username, token, max_count=None):
        for k, item in enumerate(
            self.inner.pages_from(username, token, max_count)
        ):
            if k == self.n:
                raise ConnectionError("simulated connector crash")
            yield item


def test_connector_crash_resume_end_to_end(spark, tmp_path, tmp_path_factory):
    import datetime as dt

    from pyspark.sql import functions as F

    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.schemas import REFERENCE_TABLES
    from instagram_data_pipeline_spark.sources.live import (
        FileLandingAdapter,
        JsonFixtureSource,
        LandCursor,
        land_resumable,
        parse_edge_records,
        stream_edges,
    )
    from instagram_data_pipeline_spark.streaming.ledger import (
        LedgerProgressSink,
    )

    total = _write_fixture(tmp_path / "fixture")
    assert total == 45
    source = JsonFixtureSource(str(tmp_path / "fixture"))
    spool = tmp_path / "spool"
    adapter = FileLandingAdapter(str(spool))
    cursor = LandCursor(str(tmp_path / "cursor.json"))

    # -- crash 1: connector dies after 2 pages ------------------------------
    import pytest as _pytest

    with _pytest.raises(ConnectionError):
        land_resumable(adapter, _CrashAfter(source, 2), "acct", cursor)
    assert cursor.get("acct")["pages"] == 2
    assert cursor.get("acct")["token"] == "t_aa"  # resume mid-chain
    assert len(list(spool.glob("*.jsonl"))) == 2

    # -- drain what landed into followers + ledger --------------------------
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.ensure_tables(REFERENCE_TABLES)
    wh.overwrite_atomic(
        "scrape_jobs",
        spark.createDataFrame(
            [(1, "acct", "followers", "in_progress", None, None,
              None, None, None, None)],
            wh.read("scrape_jobs").schema,
        ),
    )

    def followers_shape(raw):
        edges, _ = parse_edge_records(raw)
        return edges.filter(F.col("relation") == "followers").select(
            F.lit(None).cast("long").alias("id"),
            "user_id",
            F.col("edge_id").alias("follower_id"),
            F.lit(None).cast("timestamp").alias("follow_date"),
        )

    sink = LedgerProgressSink(wh, "followers", job_id=1,
                              now=dt.datetime(2024, 3, 1))
    ckpt = str(tmp_path_factory.mktemp("ckpt_connector"))

    def drain():
        q = (
            followers_shape(stream_edges(spark, str(spool)))
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert wh.read("followers").count() == 20
    assert wh.read("scrape_jobs").collect()[0].processed_items == 20

    # -- crash 2: process dies between page publish and cursor write --------
    class _DyingCursor(LandCursor):
        def __init__(self, path):
            super().__init__(path)
            self.calls = 0

        def put(self, username, entry):
            self.calls += 1
            if self.calls == 1:
                raise OSError("simulated crash before cursor write")
            super().put(username, entry)

    dying = _DyingCursor(str(tmp_path / "cursor.json"))
    with _pytest.raises(OSError):
        land_resumable(adapter, source, "acct", dying)
    # page 2 published but cursor still points at it
    assert len(list(spool.glob("*.jsonl"))) == 3
    assert cursor.get("acct")["pages"] == 2

    # -- clean resume: re-lands page 2 under the SAME name (no dupes),
    #    then finishes the chain --------------------------------------------
    landed = land_resumable(adapter, source, "acct", cursor)
    assert landed == 25  # pages 2,3,4 (page 2 re-landed, not duplicated)
    files = sorted(p.name for p in spool.glob("*.jsonl"))
    assert files == [f"acct-{i:06d}.jsonl" for i in range(5)]
    state = cursor.get("acct")
    assert state == {"pages": 5, "token": None, "done": True}

    drain()
    sink.complete()
    followers = wh.read("followers")
    assert followers.count() == 45
    assert followers.select("follower_id").distinct().count() == 45
    job = wh.read("scrape_jobs").collect()[0]
    assert job.status == "completed"
    assert job.processed_items == 45 and job.total_items == 45

    # done cursor -> landing is a no-op forever after
    assert land_resumable(adapter, source, "acct", cursor) == 0


class TestJsonlQuarantine:
    def test_good_bad_split(self, spark, tmp_path):
        from pyspark.sql import types as T

        from instagram_data_pipeline_spark.sources.jsonl import (
            quarantine_split,
            read_jsonl_quarantine,
        )

        p = tmp_path / "in.jsonl"
        p.write_text(
            '{"id": 1, "name": "a"}\n'
            '{"id": 2, "name": "b"}\n'
            '{"id": 3, "name": '  # truncated mid-record
            "\nnot json at all\n"
            '{"id": 4}\n'  # missing field: valid JSON, null-filled
        )
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType()),
            ]
        )
        df = read_jsonl_quarantine(spark, str(p), schema)
        good, bad = quarantine_split(df)
        good_rows = sorted(map(tuple, good.collect()))
        assert good_rows == [(1, "a"), (2, "b"), (4, None)]
        bad_rows = sorted(r.raw_line for r in bad.collect())
        assert bad_rows == ["not json at all", '{"id": 3, "name": ']

    def test_type_mismatch_quarantines_not_corrupts(self, spark, tmp_path):
        from pyspark.sql import types as T

        from instagram_data_pipeline_spark.sources.jsonl import (
            read_jsonl_quarantine,
        )

        p = tmp_path / "in.jsonl"
        p.write_text('{"id": "not-a-number"}\n{"id": 7}\n')
        schema = T.StructType([T.StructField("id", T.LongType())])
        df = read_jsonl_quarantine(spark, str(p), schema)
        rows = sorted(
            df.select("id", "quarantined").collect(),
            key=lambda r: (r.id is None, r.id or 0),
        )
        assert (rows[0].id, rows[0].quarantined) == (7, False)
        assert (rows[1].id, rows[1].quarantined) == (None, True)


class TestCsvQuarantine:
    def test_partial_fill_and_quarantine(self, spark, tmp_path):
        from pyspark.sql import types as T

        from instagram_data_pipeline_spark.sources.csvq import (
            read_csv_quarantine,
        )

        p = tmp_path / "in.csv"
        p.write_text(
            "1,en,157\n"
            "2,de\n"          # short row: parsed prefix kept, corrupt set
            "garbage\n"       # junk: all-null, corrupt set
            "4,xx,notanint\n"  # type failure: corrupt set
        )
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("lang", T.StringType()),
                T.StructField("n_chars", T.LongType()),
            ]
        )
        rows = sorted(
            map(tuple, read_csv_quarantine(spark, str(p), schema).collect()),
            key=lambda t: (t[0] is None, t[0] or 0),
        )
        assert rows[0] == (1, "en", 157, None, False)
        # PERMISSIVE keeps the parseable prefix of malformed rows
        assert rows[1] == (2, "de", None, "2,de", True)
        assert rows[2] == (4, "xx", None, "4,xx,notanint", True)
        assert rows[3] == (None, None, None, "garbage", True)


def test_txlog_datasource_reads_prunes_and_time_travels(spark, tmp_path):
    """format("txlog"): batch reads of a TransactionLogFormat table
    through the PySpark 4 Python DataSource API — snapshot + time
    travel + additive-evolution null-fill — with Spark's pushFilters
    driving the manifest zone maps and blooms (files dropped, rows
    never; every filter re-evaluated exactly post-scan)."""
    import datetime as dt

    import pyspark.sql.functions as F
    from pyspark.sql.datasource import (
        EqualTo, GreaterThanOrEqual, LessThanOrEqual,
    )

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_source import (
        TxlogBatchReader, TxlogDataSource,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TxlogDataSource)
    fmt = TransactionLogFormat(
        cluster_col="ts", bloom_cols=["s"], bloom_bits=4096,
        max_records_per_file=64,
    )
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    df = spark.sql(
        "SELECT id AS k, concat('s', CAST(id AS STRING)) AS s, "
        "TIMESTAMP '2024-01-01' + make_interval(0,0,0,0,0,CAST(id AS INT),0)"
        " AS ts FROM range(500)"
    )
    wh.upsert_partitioned("facts", df, ["k"], "ts", num_buckets=4)
    root = wh.path("facts")

    got = spark.read.format("txlog").load(root)
    assert got.count() == 500
    assert got.schema.fieldNames() == ["k", "s", "ts"]
    # exact answers under pushed filters
    assert got.filter(
        (F.col("ts") >= "2024-01-01 02:00:00")
        & (F.col("ts") <= "2024-01-01 04:00:00")
    ).count() == 121
    assert [r.k for r in got.filter(F.col("s") == "s123").collect()] == [123]
    # fully-pruned probe: empty result, not an error
    assert got.filter(F.col("s") == "nope").count() == 0

    # the pruning itself, pinned on the reader directly
    r = TxlogBatchReader(got.schema, {"path": root})
    total = len(r.keep)
    assert total > 4
    r.pushFilters([EqualTo(("s",), "s123")])
    assert len(r.keep) <= 2  # 1 true file + rare false positives
    r2 = TxlogBatchReader(got.schema, {"path": root})
    back = list(r2.pushFilters([
        GreaterThanOrEqual(("ts",), dt.datetime(2024, 1, 1, 2, 0)),
        LessThanOrEqual(("ts",), dt.datetime(2024, 1, 1, 4, 0)),
    ]))
    assert 0 < len(r2.keep) < total  # zone maps pruned
    assert len(back) == 2  # every filter returned for exact re-eval

    # additive evolution: a second merge adds a column; the source
    # null-fills the older files under the new manifest schema
    df2 = spark.sql(
        "SELECT id AS k, concat('s', CAST(id AS STRING)) AS s, "
        "TIMESTAMP '2025-01-01' AS ts, CAST(id AS DOUBLE) AS extra "
        "FROM range(490, 510)"
    )
    wh.upsert_partitioned("facts", df2, ["k"], "ts", num_buckets=4)
    evolved = spark.read.format("txlog").load(root)
    assert evolved.schema.fieldNames() == ["k", "s", "ts", "extra"]
    assert evolved.count() == 510
    assert evolved.filter("k = 10").first().extra is None
    assert evolved.filter("k = 505").first().extra == 505.0

    # time travel through the source: version 1 keeps ITS schema
    v1 = spark.read.format("txlog").option("version", 1).load(root)
    assert v1.schema.fieldNames() == ["k", "s", "ts"]
    assert v1.count() == 500


def test_txlog_changes_stream_matches_batch_cdf(spark, tmp_path):
    """readStream.format('txlog_changes'): version-offset micro-batches
    whose rows must equal the Spark-side changes_between twin for each
    version step — exactly-once across drains of one checkpoint, delete
    rows included, idle drains emitting nothing."""
    import pyspark.sql.functions as F

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_source import (
        TxlogChangesDataSource,
    )

    spark.dataSource.register(TxlogChangesDataSource)
    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    root = wh.path("facts")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("txlog_changes")
            .option("keys", "k").load(root)
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    def feed_rows():
        return {
            (r._change_type, r.k, r.v)
            for r in spark.read.parquet(out).collect()
        }

    def batch_cdf(v0, v1):
        return {
            (r._change_type, r.k, r.v)
            for r in fmt.changes_between(wh, "facts", ["k"], v0, v1)
            .collect()
        } if v0 > 0 else {
            ("insert", r.k, r.v)
            for r in fmt.read_version(wh, "facts", v1).collect()
        }

    wh.upsert_partitioned(
        "facts",
        spark.sql("SELECT id AS k, CAST(id AS DOUBLE) AS v, "
                  "TIMESTAMP '2024-01-01' AS ts FROM range(50)"),
        ["k"], "ts", num_buckets=4,
    )
    drain()
    want = batch_cdf(0, 1)
    assert feed_rows() == want

    # v2: 3 updates, 2 identical re-writes (silent), 4 inserts
    wh.upsert_partitioned(
        "facts",
        spark.sql(
            "SELECT id AS k, CAST(IF(id < 48, id * 100, id) AS DOUBLE) "
            "AS v, IF(id < 48, TIMESTAMP '2024-02-01', "
            "TIMESTAMP '2024-01-01') AS ts FROM range(45, 54)"
        ),
        ["k"], "ts", num_buckets=4,
    )
    drain()
    want |= batch_cdf(1, 2)
    assert feed_rows() == want
    # the identical re-writes (48, 49) stayed silent in the v2 step:
    # their only feed rows are the legitimate v1 inserts
    assert {
        t for (t, k, _v) in feed_rows() if k in (48, 49)
    } == {"insert"}

    # v3: targeted erasure flows as delete rows
    fmt.delete_keys(
        wh, "facts", ["k"],
        spark.sql("SELECT id * 7 AS k FROM range(4)"), num_buckets=4,
    )
    drain()
    want |= batch_cdf(2, 3)
    assert feed_rows() == want
    assert ("delete", 7, 7.0) in feed_rows()

    # idle drain: no new version -> nothing new, no error
    before = feed_rows()
    drain()
    assert feed_rows() == before


def test_txlog_changes_across_replace_where_and_truncate(spark, tmp_path):
    """The CDF contract across the shape-changing replace family
    (round 13, VERDICT r12 #4): the feed is a NET row-level diff by
    key, so a scoped overwrite emits exactly its row-level consequence
    — updates for re-valued keys, deletes for dropped keys, inserts
    for new keys, SILENCE for carried buckets and for kept rows
    rewritten byte-identical — and TRUNCATE emits one delete per
    then-live key. Both faces pinned: the readStream per-version
    steps must equal the batch changes_between twin at each step, and
    a batch span across truncate + identical re-insert nets out to
    nothing for the surviving key."""
    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )
    from instagram_data_pipeline_spark.sources.txlog_source import (
        TxlogChangesDataSource,
    )

    spark.dataSource.register(TxlogChangesDataSource)
    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    root = wh.path("facts")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    cat = TxlogSqlCatalog(spark)
    cat.sql(f"CREATE TABLE facts (k BIGINT, grp STRING, v DOUBLE) USING "
            f"txlog CLUSTERED BY (k) INTO 4 BUCKETS LOCATION '{root}'")
    cat.sql("INSERT INTO facts SELECT id AS k, IF(id < 10, 'a', 'b') AS "
            "grp, CAST(id AS DOUBLE) AS v FROM range(20)")  # v2

    def drain():
        q = (
            spark.readStream.format("txlog_changes")
            .option("keys", "k").load(root)
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    def feed_rows():
        return {
            (r._change_type, r.k, r.grp, r.v)
            for r in spark.read.parquet(out).collect()
        }

    def batch_cdf(v0, v1):
        return {
            (r._change_type, r.k, r.grp, r.v)
            for r in fmt.changes_between(
                wh, "facts", ["k"], v0, v1
            ).collect()
        }

    drain()
    want = {
        ("insert", k, "a" if k < 10 else "b", float(k))
        for k in range(20)
    }
    assert feed_rows() == want

    # v3: scoped overwrite of the 'a' slice — keys 0-2 re-valued
    # (updates), 3-4 and 6-9 dropped (deletes), 100 new (insert), and
    # key 5 deliberately written back with its ORIGINAL values (the
    # byte-identical rewrite that must stay silent)
    cat.sql(
        "INSERT OVERWRITE facts WHERE grp = 'a' "
        "SELECT k, grp, v * 100 AS v FROM facts "
        "WHERE grp = 'a' AND k < 3 "
        "UNION ALL SELECT 5 AS k, 'a' AS grp, CAST(5 AS DOUBLE) AS v "
        "UNION ALL SELECT 100 AS k, 'a' AS grp, CAST(-1 AS DOUBLE) AS v"
    )
    drain()
    step = batch_cdf(2, 3)
    want |= step
    assert feed_rows() == want
    # the step is exactly the row-level consequence:
    assert {t for (t, k, g, v) in step if k in (0, 1, 2)} == {
        "update_preimage", "update_postimage",
    }
    assert {(t, k) for (t, k, g, v) in step if t == "delete"} == {
        ("delete", k) for k in (3, 4, 6, 7, 8, 9)
    }
    assert ("insert", 100, "a", -1.0) in step
    # key 5 was rewritten byte-identical: silent; 'b' rows: silent
    assert not {r for r in step if r[1] == 5}
    assert not {r for r in step if r[2] == "b"}

    # v4: TRUNCATE — one delete per then-live key
    live = {
        (r.k, r.grp, r.v)
        for r in cat.sql("SELECT * FROM facts").collect()
    }
    cat.sql("TRUNCATE TABLE facts")
    drain()
    step = batch_cdf(3, 4)
    want |= step
    assert feed_rows() == want
    assert step == {("delete", k, g, v) for (k, g, v) in live}

    # v5: identical re-insert of ONE surviving row, then the batch NET
    # span across truncate+re-insert: that key emits nothing, every
    # other then-live key nets to a delete
    cat.sql("INSERT INTO facts VALUES (10, 'b', CAST(10 AS DOUBLE))")
    span = batch_cdf(3, 5)
    assert not {r for r in span if r[1] == 10}
    assert span == {
        ("delete", k, g, v) for (k, g, v) in live if k != 10
    }
    # while the per-version stream (which drained v4 before v5
    # committed) keeps both intermediate images
    drain()
    assert feed_rows() == want | {("insert", 10, "b", 10.0)}


def test_txlog_changes_stream_refuses_vacuumed_offset(spark, tmp_path):
    """VACUUM KEEP k VERSIONS vs the streaming change feed (VERDICT
    r10 Next #6): a checkpointed-but-unread offset whose manifest the
    vacuum expired must fail CLEANLY — an error naming the expired
    version and the surviving span (Delta parity) — never silently
    skip ahead to a surviving version, which would drop the
    intermediate changes without a trace. Same refusal for time travel
    and RESTORE to the expired version."""
    import pytest as _pytest

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )
    from instagram_data_pipeline_spark.sources.txlog_source import (
        TxlogChangesDataSource,
    )

    spark.dataSource.register(TxlogChangesDataSource)
    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    root = wh.path("facts")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def commit(lo, hi, ts):
        wh.upsert_partitioned(
            "facts",
            spark.sql(
                f"SELECT id AS k, CAST(id AS DOUBLE) AS v, "
                f"TIMESTAMP '{ts}' AS ts FROM range({lo}, {hi})"
            ),
            ["k"], "ts", num_buckets=2,
        )

    def drain():
        q = (
            spark.readStream.format("txlog_changes")
            .option("keys", "k").load(root)
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    commit(0, 20, "2024-01-01")
    drain()  # checkpoint now holds offset version=1
    n_before = spark.read.parquet(out).count()
    assert n_before == 20

    # three more versions land while the consumer lags...
    commit(0, 10, "2024-02-01")
    commit(20, 30, "2024-02-02")
    commit(5, 15, "2024-02-03")
    # ...then retention expires everything but the newest manifest —
    # including v1, the offset the checkpoint still points at
    cat = TxlogSqlCatalog(spark)
    cat.register("facts", root)
    m = cat.sql("VACUUM facts KEEP 1 VERSIONS").first()
    assert m.num_expired_versions == 3
    assert fmt.versions(wh, "facts") == [4]

    # the stream fails loudly, naming the expired version and the
    # surviving span — and appends nothing
    with _pytest.raises(Exception, match=r"version 1 .*surviving.*4"):
        drain()
    assert spark.read.parquet(out).count() == n_before

    # same clean refusal on the batch faces of the same offset space
    with _pytest.raises(FileNotFoundError, match="version 2 is not"):
        fmt.read_version(wh, "facts", 2)
    with _pytest.raises(FileNotFoundError, match="expired"):
        fmt.changes_between(wh, "facts", ["k"], 1, 4)
    with _pytest.raises(Exception, match="not in"):
        cat.sql("SELECT * FROM facts VERSION AS OF 2").collect()
    with _pytest.raises(Exception, match="expired"):
        cat.sql("RESTORE TABLE facts TO VERSION AS OF 2")
    # the surviving version still serves everything
    assert cat.sql("SELECT count(*) AS n FROM facts").first().n == 30


def test_txlog_changes_batch_backfill_distributed(spark, tmp_path):
    """format('txlog_changes') BATCH reader (VERDICT r7 Next #6): a
    many-version backfill replays partition-per-changed-bucket — the
    distributed CDF path — matching the Spark-side changes_between
    classification exactly, across renames (field-id aligned), DV
    deletes, and a carried-by-reference bucket (which ships no
    partition)."""
    import pyspark.sql.functions as F

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_source import (
        TxlogChangesBatchReader, TxlogChangesDataSource,
    )

    spark.dataSource.register(TxlogChangesDataSource)
    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)

    def batch(lo, n, tag, ts):
        return spark.sql(
            f"SELECT id AS k, '{tag}' AS v, TIMESTAMP '{ts}' AS ts "
            f"FROM range({lo}, {lo + n})"
        )

    wh.upsert_partitioned(
        "t", batch(0, 60, "a", "2024-01-01"), ["k"], "ts", num_buckets=4
    )
    wh.upsert_partitioned(
        "t", batch(50, 20, "b", "2024-02-01"), ["k"], "ts", num_buckets=4
    )
    fmt.rename_column(wh, "t", "v", "val")
    fmt.delete_keys_dv(
        wh, "t", ["k"],
        spark.createDataFrame([(3,), (51,)], "k long"), num_buckets=4,
    )
    tbl = str(tmp_path / "wh" / "t")

    # full-history backfill nets out to the live snapshot as inserts
    bf = (
        spark.read.format("txlog_changes")
        .option("keys", "k").option("v_from", "0").load(tbl)
    )
    assert bf.columns == ["_change_type", "k", "val", "ts"]
    got = {r._change_type: r["count"]
           for r in bf.groupBy("_change_type").count().collect()}
    assert got == {"insert": 68}  # 70 keys - 2 DV-deleted
    live = {r.k for r in bf.filter("_change_type = 'insert'").collect()}
    assert live == set(range(70)) - {3, 51}

    # window v1->v2: 50..59 update a->b, 60..69 insert — and it must
    # agree row-for-row with the Spark-side changes_between
    win = (
        spark.read.format("txlog_changes")
        .option("keys", "k")
        .option("v_from", "1").option("v_to", "2").load(tbl)
    )
    # v2 predates the rename: its own schema serves 'v'
    assert win.columns == ["_change_type", "k", "v", "ts"]
    spark_side = fmt.changes_between(wh, "t", ["k"], 1, 2)
    assert sorted(map(tuple, win.collect())) == sorted(
        map(tuple, spark_side.select(win.columns).collect())
    )

    # rename-only window: zero rows AND zero scheduled partitions
    r = TxlogChangesBatchReader(
        spark.read.format("txlog_changes")
        .option("keys", "k")
        .option("v_from", "2").option("v_to", "3").load(tbl).schema,
        {"path": tbl, "keys": "k", "v_from": "2", "v_to": "3"},
    )
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].value is None

    # DV window: only the two deletes, under the renamed column
    dvw = (
        spark.read.format("txlog_changes")
        .option("keys", "k")
        .option("v_from", "3").option("v_to", "4").load(tbl)
    )
    rows = dvw.collect()
    assert {r._change_type for r in rows} == {"delete"}
    assert {r.k for r in rows} == {3, 51}
    # the DV window scheduled only the CHANGED buckets' partitions
    r2 = TxlogChangesBatchReader(
        dvw.schema, {"path": tbl, "keys": "k", "v_from": "3",
                     "v_to": "4"},
    )
    n_changed = len(r2.partitions())
    assert n_changed <= 2  # the two victims' buckets at most


def test_txlog_changes_stream_across_rename_and_dv(spark, tmp_path):
    """The STREAMING face of the change feed across the r8 lifecycle
    ops: a metadata-only rename between drains emits NOTHING (field-id
    alignment — same field, new name), and a deletion-vector point
    delete emits exactly its delete rows — matching the Spark-side
    changes_between for every step. The stream schema follows the
    manifest current at stream start; keys are current logical names."""
    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_source import (
        TxlogChangesDataSource,
    )

    spark.dataSource.register(TxlogChangesDataSource)
    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    root = wh.path("facts")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    wh.upsert_partitioned(
        "facts",
        spark.sql("SELECT id AS k, CAST(id AS DOUBLE) AS v, "
                  "TIMESTAMP '2024-01-01' AS ts FROM range(30)"),
        ["k"], "ts", num_buckets=4,
    )
    fmt.rename_column(wh, "facts", "v", "score")

    def drain():
        q = (
            spark.readStream.format("txlog_changes")
            .option("keys", "k").load(root)
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    def feed_rows():
        # the sink dir legitimately accumulates BOTH schemas once a
        # drain restarts after the second rename (each availableNow
        # run re-derives the source schema — even an idle drain can
        # land an empty file under the new name, which un-merged
        # schema inference picks nondeterministically): always merge
        # and coalesce the two eras of the value column
        import pyspark.sql.functions as F

        df = spark.read.option("mergeSchema", "true").parquet(out)
        vals = [c for c in ("score", "quality") if c in df.columns]
        return {
            (r[0], r[1], r[2])
            for r in df.select(
                "_change_type", "k", F.coalesce(*map(F.col, vals))
            ).collect()
        }

    # stream starts after the rename: schema speaks 'score', and the
    # v1 rows (physically stored under 'v') surface through the
    # mapping as inserts
    drain()
    assert feed_rows() == {("insert", k, float(k)) for k in range(30)}

    # a DV point delete between drains: exactly its delete rows
    fmt.delete_keys_dv(
        wh, "facts", ["k"],
        spark.createDataFrame([(5,), (17,)], "k long"), num_buckets=4,
    )
    drain()
    got = feed_rows()
    deletes = {(t, k, s) for (t, k, s) in got if t == "delete"}
    assert deletes == {("delete", 5, 5.0), ("delete", 17, 17.0)}
    # and nothing else changed: inserts stay the original 30
    assert len(got) == 32

    # a rename between drains is metadata-only: NO feed rows for it.
    # (each drain RESTARTS the availableNow query, so the next run's
    # schema legitimately speaks the new name — the sink dir evolves)
    fmt.rename_column(wh, "facts", "score", "quality")
    drain()
    assert len(feed_rows()) == 32  # idle drain, rename stayed silent

    # code-review r8 #2, restart half: a DATA change after the rename
    # flows through the restarted query under the NEW name — merge the
    # sink dir's two schemas and the values line up
    up = spark.sql(
        "SELECT id AS k, CAST(id * 100 AS DOUBLE) AS quality, "
        "TIMESTAMP '2024-06-01' AS ts FROM range(2, 4)"
    )
    wh.upsert_partitioned("facts", up, ["k"], "ts", num_buckets=4)
    drain()
    got = feed_rows()
    assert ("update_preimage", 2, 2.0) in got
    assert ("update_postimage", 2, 200.0) in got
    assert ("update_postimage", 3, 300.0) in got
    assert len(got) == 36  # 32 + 2x(pre+post)
    assert None not in {s for (_t, _k, s) in got}

    # code-review r8 #2, long-running half: a reader whose schema was
    # FROZEN before a rename must keep emitting real values afterwards
    # — _aligned() maps the frozen names to the current logical names
    # by field id (without it, updates silently suppress and inserts
    # emit NULLs)
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
        TimestampType,
    )

    from instagram_data_pipeline_spark.sources.txlog_source import (
        TxlogChangesStreamReader,
    )

    frozen = StructType([
        StructField("_change_type", StringType()),
        StructField("k", LongType()),
        StructField("score", DoubleType()),
        StructField("ts", TimestampType()),
    ])
    reader = TxlogChangesStreamReader(
        frozen, {"path": root, "keys": "k"},
    )
    # pin the reader to the manifest its frozen schema came from: the
    # 'score' era, while the table now speaks 'quality'
    reader.schema_snap = fmt._snap_at(wh, "facts", 2)
    v_last = fmt.versions(wh, "facts")[-1]
    rows, off = reader.read({"version": v_last - 1})
    tuples = list(rows)
    assert off == {"version": v_last}
    by_type = {}
    for t in tuples:
        by_type.setdefault(t[0], set()).add((t[1], t[2]))
    # frozen column position 2 ('score') carries the CURRENT values
    assert by_type["update_preimage"] == {(2, 2.0), (3, 3.0)}
    assert by_type["update_postimage"] == {(2, 200.0), (3, 300.0)}


def test_txlog_changes_across_widen_and_add(spark, tmp_path):
    """CDF schema-evolution contract (round 12, VERDICT r11 #7),
    pinned in txlog_source.py: the BATCH backfill serves the UNIFIED
    v_to schema — pre-ALTER rows upcast into widened types and
    null-fill added columns; the STREAM's schema is frozen at start,
    so an ADD COLUMN stays invisible until restart and a mid-stream
    TYPE change of a tracked column FAILS the stream by name instead
    of dying later as an opaque conversion error."""
    import pytest as _pytest

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_source import (
        TxlogChangesDataSource,
        TxlogChangesStreamReader,
    )

    spark.dataSource.register(TxlogChangesDataSource)
    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    root = wh.path("facts")

    wh.upsert_partitioned(
        "facts",
        spark.sql("SELECT id AS k, CAST(id AS INT) AS cnt, "
                  "TIMESTAMP '2024-01-01' AS ts FROM range(10)"),
        ["k"], "ts", num_buckets=4,
    )  # v1: cnt is INT
    fmt.widen_column(wh, "facts", "cnt", "bigint")  # v2 (metadata)
    fmt.add_column(wh, "facts", "extra", "double")  # v3 (metadata)
    # v4: post-evolution data — a BIGINT-sized cnt and a live extra
    wh.upsert_partitioned(
        "facts",
        spark.sql("SELECT id AS k, CAST(id + 5000000000 AS BIGINT) AS "
                  "cnt, TIMESTAMP '2024-06-01' AS ts, "
                  "CAST(id AS DOUBLE) AS extra FROM range(2, 4)"),
        ["k"], "ts", num_buckets=4,
    )
    vs = fmt.versions(wh, "facts")
    assert len(vs) == 4

    # -- batch backfill v1 -> v4: UNIFIED v_to schema ----------------------
    feed = (
        spark.read.format("txlog_changes")
        .option("keys", "k")
        .option("v_from", str(vs[0])).option("v_to", str(vs[-1]))
        .load(root)
    )
    # v_to's schema: widened cnt, added extra
    assert dict(feed.dtypes)["cnt"] == "bigint"
    assert "extra" in feed.columns
    got = {
        (r._change_type, r.k, r.cnt, r.extra) for r in feed.collect()
    }
    assert ("update_preimage", 2, 2, None) in got
    assert ("update_postimage", 2, 5000000002, 2.0) in got
    assert ("update_postimage", 3, 5000000003, 3.0) in got
    assert len(got) == 4  # two updates, pre+post each
    # metadata-only window (widen+add, no data): empty feed
    assert (
        spark.read.format("txlog_changes")
        .option("keys", "k")
        .option("v_from", str(vs[0])).option("v_to", str(vs[2]))
        .load(root).count()
        == 0
    )

    # -- stream frozen at v1's schema: ADD invisible, widen refused --------
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
        TimestampType,
    )

    frozen = StructType([
        StructField("_change_type", StringType()),
        StructField("k", LongType()),
        StructField("cnt", IntegerType()),   # pre-widen type
        StructField("ts", TimestampType()),
    ])
    reader = TxlogChangesStreamReader(frozen, {"path": root, "keys": "k"})
    reader.schema_snap = fmt._snap_at(wh, "facts", vs[0])
    with _pytest.raises(ValueError, match="widened from integer to long"):
        reader.read({"version": vs[0]})

    # a stream frozen AFTER the widen (at v3) serves the post-ALTER
    # delta with the added column simply absent from its frozen schema
    frozen_v3 = StructType([
        StructField("_change_type", StringType()),
        StructField("k", LongType()),
        StructField("cnt", LongType()),
        StructField("ts", TimestampType()),
    ])
    reader3 = TxlogChangesStreamReader(
        frozen_v3, {"path": root, "keys": "k"},
    )
    reader3.schema_snap = fmt._snap_at(wh, "facts", vs[2])
    rows, off = reader3.read({"version": vs[2]})
    tuples = list(rows)
    assert off == {"version": vs[-1]}
    by_type = {}
    for t in tuples:
        by_type.setdefault(t[0], set()).add((t[1], t[2]))
    assert by_type["update_postimage"] == {
        (2, 5000000002), (3, 5000000003)
    }
    # updates confined to a column OUTSIDE the frozen schema would be
    # invisible — pinned as documented behavior: change ONLY `extra`
    # (source-wins merge so the otherwise-identical row replaces)
    fmt.merge_source_wins(
        wh, "facts",
        spark.sql("SELECT CAST(2 AS BIGINT) AS k, "
                  "CAST(5000000002 AS BIGINT) AS cnt, "
                  "TIMESTAMP '2024-06-01' AS ts, "
                  "CAST(99 AS DOUBLE) AS extra"),
        ["k"], num_buckets=4,
    )
    rows, _ = reader3.read({"version": vs[-1]})
    assert list(rows) == []  # invisible to the frozen stream
    # ...but fully visible to a batch backfill under the unified schema
    tail = (
        spark.read.format("txlog_changes")
        .option("keys", "k")
        .option("v_from", str(vs[-1]))
        .load(root)
    )
    assert {
        (r._change_type, r.k, r.extra) for r in tail.collect()
    } == {
        ("update_preimage", 2, 2.0),
        ("update_postimage", 2, 99.0),
    }


def test_txlog_changes_backfill_across_rebucket(spark, tmp_path):
    """ADVICE r8 #1: a backfill window spanning a rebucket() must not
    emit spurious delete+insert pairs for carried rows — bucket ids are
    not version-stable across a modulus change, so the reader falls
    back to ONE partition running the joint diff, agreeing with the
    Spark-side changes_between row-for-row."""
    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_source import (
        TxlogChangesBatchReader, TxlogChangesDataSource,
    )

    spark.dataSource.register(TxlogChangesDataSource)
    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)

    def batch(lo, n, tag, ts):
        return spark.sql(
            f"SELECT id AS k, '{tag}' AS v, TIMESTAMP '{ts}' AS ts "
            f"FROM range({lo}, {lo + n})"
        )

    # v1: 60 rows @ 4 buckets; v2: rebucket to 8; v3: update 5, add 10
    wh.upsert_partitioned(
        "t", batch(0, 60, "a", "2024-01-01"), ["k"], "ts", num_buckets=4
    )
    fmt.rebucket(wh, "t", 8)
    wh.upsert_partitioned(
        "t", batch(55, 15, "b", "2024-02-01"), ["k"], "ts", num_buckets=8
    )
    tbl = str(tmp_path / "wh" / "t")

    def backfill(v0, v1):
        return (
            spark.read.format("txlog_changes")
            .option("keys", "k")
            .option("v_from", str(v0)).option("v_to", str(v1)).load(tbl)
        )

    # window v1 -> v2 (the rebucket itself): NO logical change at all
    assert backfill(1, 2).count() == 0

    # window v1 -> v3 (spans the rebucket): only the real changes —
    # 5 updates (55..59 a->b) and 10 inserts (60..69); rows 0..54 are
    # carried and MUST NOT surface as delete+insert churn
    win = backfill(1, 3)
    got = {r._change_type: r["count"]
           for r in win.groupBy("_change_type").count().collect()}
    assert got == {"update_preimage": 5, "update_postimage": 5,
                   "insert": 10}
    spark_side = fmt.changes_between(wh, "t", ["k"], 1, 3)
    assert sorted(map(tuple, win.collect())) == sorted(
        map(tuple, spark_side.select(win.columns).collect())
    )

    # the cross-modulus window planned ONE joint partition; the
    # same-modulus window (v2 -> v3) still fans out per changed bucket
    r_cross = TxlogChangesBatchReader(
        win.schema, {"path": tbl, "keys": "k", "v_from": "1",
                     "v_to": "3"},
    )
    parts = r_cross.partitions()
    assert len(parts) == 1 and isinstance(parts[0].value, list)
    r_same = TxlogChangesBatchReader(
        win.schema, {"path": tbl, "keys": "k", "v_from": "2",
                     "v_to": "3"},
    )
    same_parts = r_same.partitions()
    assert len(same_parts) >= 1
    assert all(isinstance(p.value, int) for p in same_parts)
    # and the same-modulus window agrees with changes_between too
    win23 = backfill(2, 3)
    s23 = fmt.changes_between(wh, "t", ["k"], 2, 3)
    assert sorted(map(tuple, win23.collect())) == sorted(
        map(tuple, s23.select(win23.columns).collect())
    )


def test_txlog_legacy_bare_bloom_entry_prunes_only_with_explicit_k(
    spark, tmp_path
):
    """ADVICE r8 #3: a LEGACY bare-string bloom entry (pre-k manifest)
    written with a non-default k must not be probed with the reader's
    hard-coded default — that silently false-negative-prunes files
    containing the value. Without an explicit k the reader keeps the
    file (no pruning, correct rows); with option('bloom_hashes', k)
    matching the writer, pruning engages and rows stay correct."""
    import json as _json

    from instagram_data_pipeline_spark.formats import (
        BLOOM_KEY, TransactionLogFormat,
    )
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_source import (
        TxlogBatchReader,
    )

    writer = TransactionLogFormat(
        bloom_cols=["fp"], bloom_bits=4096, bloom_hashes=3,
        max_records_per_file=64,
    )
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=writer)
    df = spark.sql(
        "SELECT id AS k, concat('fp-', md5(CAST(id AS STRING))) AS fp, "
        "TIMESTAMP '2024-01-01' AS ts FROM range(1000)"
    )
    wh.upsert_partitioned("facts", df, ["k"], "ts", num_buckets=8)
    tbl = tmp_path / "wh" / "facts"

    # rewrite the manifest to the LEGACY shape: bare b64 strings (built
    # with k=3), dropping the persisted k
    log = sorted((tbl / "_txlog").glob("*.json"))[-1]
    m = _json.loads(log.read_text())
    for s in m["stats"].values():
        if BLOOM_KEY in s:
            s[BLOOM_KEY] = {
                c: e["bm"] for c, e in s[BLOOM_KEY].items()
            }
    log.write_text(_json.dumps(m))

    probe = df.filter("k = 37").select("fp").first().fp
    from pyspark.sql.datasource import EqualTo

    def run_reader(options, strip_blooms=False):
        r = TxlogBatchReader(schema=None, options=options)
        if strip_blooms:
            for s in r.snap.get("stats", {}).values():
                s.pop(BLOOM_KEY, None)
        r.pushFilters([EqualTo(("fp",), probe)])
        return set(r.keep)

    # zone-map-only baseline (blooms removed entirely)
    keep_zone = run_reader({"path": str(tbl)}, strip_blooms=True)
    # no explicit k: legacy bare entries contribute NOTHING — pruning
    # equals the zone-map baseline, no silent false-negative drops
    keep_nok = run_reader({"path": str(tbl)})
    assert keep_nok == keep_zone
    # explicit writer k: bloom pruning engages on top of zone maps
    keep_k = run_reader({"path": str(tbl), "bloom_hashes": "3"})
    assert keep_k <= keep_zone and 1 <= len(keep_k) < len(keep_zone)

    # end-to-end rows stay correct both ways
    from instagram_data_pipeline_spark.sources.txlog_source import (
        TxlogDataSource,
    )

    spark.dataSource.register(TxlogDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    import pyspark.sql.functions as F

    got = (
        spark.read.format("txlog").load(str(tbl))
        .filter(F.col("fp") == probe).collect()
    )
    assert len(got) == 1 and got[0].k == 37
    got_k = (
        spark.read.format("txlog").option("bloom_hashes", "3")
        .load(str(tbl)).filter(F.col("fp") == probe).collect()
    )
    assert len(got_k) == 1 and got_k[0].k == 37


def test_txlog_sql_catalog_time_travel(spark, tmp_path):
    """TxlogSqlCatalog (VERDICT r8 Next #5): snapshot + VERSION AS OF
    through spark.sql text — rewrite scoped to registered names only,
    pinned-version views immutable, latest view tracking new commits,
    and catalog-level errors for unknown tables/versions."""
    import pytest as _pytest

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)

    def batch(lo, n, tag, ts):
        return spark.sql(
            f"SELECT id AS k, '{tag}' AS v, TIMESTAMP '{ts}' AS ts "
            f"FROM range({lo}, {lo + n})"
        )

    wh.upsert_partitioned(
        "orders_t", batch(0, 30, "a", "2024-01-01"), ["k"], "ts",
        num_buckets=4,
    )
    wh.upsert_partitioned(
        "orders_t", batch(20, 20, "b", "2024-02-01"), ["k"], "ts",
        num_buckets=4,
    )

    cat = TxlogSqlCatalog(spark)
    cat.register("orders_t", wh.path("orders_t"))
    assert cat.versions("orders_t") == [1, 2]

    # latest view == merged state
    assert spark.sql("SELECT count(*) AS n FROM orders_t").first().n == 40
    # time travel in plain SQL, both spellings, same statement as a join
    got = cat.sql(
        "SELECT cur.k FROM orders_t cur "
        "LEFT JOIN orders_t VERSION AS OF 1 old ON cur.k = old.k "
        "WHERE old.k IS NULL ORDER BY cur.k"
    ).collect()
    assert [r.k for r in got] == list(range(30, 40))
    n_v1 = cat.sql(
        "SELECT count(*) AS n FROM orders_t FOR SYSTEM_VERSION AS OF 1"
    ).first().n
    assert n_v1 == 30

    # updated keys read their PINNED values through the version view
    row = cat.sql(
        "SELECT old.v AS was, cur.v AS now FROM orders_t cur "
        "JOIN orders_t VERSION AS OF 1 old ON cur.k = old.k "
        "WHERE cur.k = 25"
    ).first()
    assert (row.was, row.now) == ("a", "b")

    # a NEW commit is visible through cat.sql without re-registering
    # (the DataSource pins manifests at view creation; sql() refreshes
    # the latest view of every referenced table)
    wh.upsert_partitioned(
        "orders_t", batch(100, 5, "c", "2024-03-01"), ["k"], "ts",
        num_buckets=4,
    )
    assert cat.sql("SELECT count(*) AS n FROM orders_t").first().n == 45

    # rewrite is scoped: an UNREGISTERED name passes through untouched
    # (Spark raises its own error, not a catalog KeyError)
    with _pytest.raises(Exception) as ei:
        cat.sql("SELECT * FROM nope VERSION AS OF 1")
    assert not isinstance(ei.value, KeyError)
    # unknown version fails fast at the catalog layer
    with _pytest.raises(FileNotFoundError):
        cat.sql("SELECT * FROM orders_t VERSION AS OF 99")
    with _pytest.raises(KeyError):
        cat.snapshot("never_registered")
    # programmatic twin agrees with the SQL surface
    assert cat.snapshot("orders_t", 1).count() == 30
    assert cat.snapshot("orders_t").count() == 45


def test_txlog_sql_catalog_merge_into_and_timestamp_travel(
    spark, tmp_path
):
    """Round-9 SQL-surface extensions: MERGE INTO (source-wins upsert
    through the format's CAS machinery, keys/buckets from the recorded
    contract) and TIMESTAMP AS OF (commit-stamp resolution), both as
    plain SQL text; malformed/contract-violating MERGEs are rejected
    loudly."""
    import time

    import pytest as _pytest

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    wh.upsert_partitioned(
        "facts",
        spark.sql("SELECT id AS k, 'a' AS v, TIMESTAMP '2024-01-01' AS ts "
                  "FROM range(30)"),
        ["k"], "ts", num_buckets=4,
    )
    cat = TxlogSqlCatalog(spark)
    cat.register("facts", wh.path("facts"))

    t_between = time.time()  # strictly after v1's commit stamp
    time.sleep(0.02)

    # MERGE INTO via SQL: 10 updates (keys 20..29) + 10 inserts (30..39)
    spark.sql(
        "SELECT id AS k, 'b' AS v, TIMESTAMP '2023-06-01' AS ts "
        "FROM range(20, 40)"
    ).createOrReplaceTempView("updates_src")
    metrics = cat.sql(
        "MERGE INTO facts t USING updates_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    ).first()
    assert metrics.num_source_rows == 20 and metrics.table_version == 2

    # source-wins: the source's OLDER ts replaced the target row anyway
    got = {r.k: r.v for r in cat.sql("SELECT k, v FROM facts").collect()}
    assert len(got) == 40
    assert got[5] == "a" and got[25] == "b" and got[35] == "b"

    # TIMESTAMP AS OF: a stamp between the commits resolves to v1
    iso = __import__("datetime").datetime.fromtimestamp(
        t_between
    ).isoformat()
    n_v1 = cat.sql(
        f"SELECT count(*) AS n FROM facts TIMESTAMP AS OF '{iso}'"
    ).first().n
    assert n_v1 == 30
    assert cat.version_as_of("facts", t_between) == 1
    # a stamp after the merge resolves to v2; one before v1 errors
    assert cat.version_as_of("facts", time.time()) == 2
    with _pytest.raises(ValueError):
        cat.version_as_of("facts", 1.0)

    # contract violations are loud, never silently narrowed
    with _pytest.raises(ValueError, match="recorded merge keys"):
        cat.sql(
            "MERGE INTO facts t USING updates_src s ON t.v = s.v "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    with _pytest.raises(ValueError, match="unsupported ON clause"):
        cat.sql(
            "MERGE INTO facts t USING updates_src s "
            "ON t.k = s.k AND t.v > s.v "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
    # idempotence of the merge path under replay (txn-less: a second
    # identical merge is a plain re-apply and must not duplicate rows)
    cat.sql(
        "MERGE INTO facts USING updates_src ON facts.k = updates_src.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert cat.sql("SELECT count(*) AS n FROM facts").first().n == 40


def test_txlog_sql_catalog_describe_history(spark, tmp_path):
    """DESCRIBE HISTORY through the SQL surface: one manifest-derived
    row per version — live row counts subtract deletion-vector
    popcounts, commit stamps are monotone, layout changes surface in
    n_buckets — with no data file opened."""
    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    wh.upsert_partitioned(
        "facts",
        spark.sql("SELECT id AS k, 'a' AS v, TIMESTAMP '2024-01-01' AS ts "
                  "FROM range(50)"),
        ["k"], "ts", num_buckets=4,
    )
    fmt.delete_keys_dv(
        wh, "facts", ["k"], spark.createDataFrame([(1,), (2,)], "k long"), 4
    )
    fmt.rebucket(wh, "facts", 8)

    cat = TxlogSqlCatalog(spark)
    cat.register("facts", wh.path("facts"))
    hist = {r.version: r for r in
            cat.sql("DESCRIBE HISTORY facts").collect()}
    assert sorted(hist) == [1, 2, 3]
    assert hist[1].n_rows == 50 and hist[1].n_deleted == 0
    assert hist[2].n_rows == 48 and hist[2].n_deleted == 2
    # rebucket materialized the DVs away under the new modulus
    assert hist[3].n_rows == 48 and hist[3].n_deleted == 0
    assert hist[1].n_buckets == 4 and hist[3].n_buckets == 8
    stamps = [hist[v].committed_at for v in (1, 2, 3)]
    assert all(s is not None for s in stamps)
    assert stamps == sorted(stamps)
    # DV version carried every data file by reference
    assert hist[2].n_files == hist[1].n_files


def test_txlog_sql_catalog_update_delete_dml(spark, tmp_path):
    """Round-10 SQL DML completion (VERDICT r9 Next #4): UPDATE and
    DELETE statements on the txlog catalog map onto the format's
    merge_source_wins / delete_keys_dv primitives; WHERE clauses are
    key-scoped by contract (non-key predicates refused loudly), SET
    expressions see the OLD row values, and metrics frames come back
    Delta-style."""
    import pytest as _pytest

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    wh.upsert_partitioned(
        "facts",
        spark.sql(
            "SELECT id AS k, CAST(id * 10 AS DOUBLE) AS v, "
            "TIMESTAMP '2024-01-01' AS ts FROM range(100)"
        ),
        ["k"], "ts", num_buckets=4,
    )
    cat = TxlogSqlCatalog(spark)
    cat.register("facts", wh.path("facts"))

    # UPDATE: expressions evaluate against the OLD row (v and ts both
    # read pre-update state in one statement); key-scoped WHERE
    m = cat.sql(
        "UPDATE facts SET v = v * 2, ts = ts + INTERVAL 1 DAY "
        "WHERE k % 7 = 3"
    ).first()
    assert m.num_affected_rows == 14 and m.table_version == 2
    got = {r.k: (r.v, str(r.ts)) for r in
           cat.sql("SELECT k, v, ts FROM facts").collect()}
    assert got[3] == (60.0, "2024-01-02 00:00:00")
    assert got[4] == (40.0, "2024-01-01 00:00:00")

    # DELETE: deletion-vector path, zero data files rewritten
    m = cat.sql("DELETE FROM facts WHERE k IN (1, 2, 3, 999)").first()
    assert m.num_affected_rows == 3 and m.table_version == 3
    assert cat.sql("SELECT count(*) AS n FROM facts").first().n == 97
    hist = {r.version: r for r in
            cat.sql("DESCRIBE HISTORY facts").collect()}
    assert hist[3].n_files == hist[2].n_files  # DV: files by reference

    # zero-match UPDATE publishes no version
    m = cat.sql("UPDATE facts SET v = 0 WHERE k = 123456").first()
    assert m.num_affected_rows == 0 and m.table_version == 3

    # contract violations: non-key WHERE (even though the column
    # exists on the table), SET of a key, unknown SET column, bad
    # assignment syntax — all loud
    with _pytest.raises(ValueError, match="recorded merge keys"):
        cat.sql("UPDATE facts SET v = 1 WHERE v > 5")
    with _pytest.raises(ValueError, match="recorded merge keys"):
        cat.sql("DELETE FROM facts WHERE ts < TIMESTAMP '2025-01-01'")
    with _pytest.raises(ValueError, match="cannot SET key"):
        cat.sql("UPDATE facts SET k = 0 WHERE k = 5")
    with _pytest.raises(ValueError, match="unknown column"):
        cat.sql("UPDATE facts SET bogus = 1 WHERE k = 5")
    with _pytest.raises(ValueError, match="SET twice"):
        cat.sql("UPDATE facts SET v = 1, v = 2 WHERE k = 5")
    # statements on unregistered names pass through to spark.sql
    with _pytest.raises(Exception) as ei:
        cat.sql("DELETE FROM not_ours WHERE k = 1")
    assert not isinstance(ei.value, (ValueError, KeyError))

    # paren/quote-aware SET splitting: function calls with commas
    m = cat.sql(
        "UPDATE facts SET v = round(v + 0.4, 1) WHERE k BETWEEN 10 AND 11"
    ).first()
    assert m.num_affected_rows == 2


def test_txlog_sql_catalog_rewrite_masks_literals_and_comments(
    spark, tmp_path
):
    """ADVICE r9: a registered name followed by VERSION AS OF inside a
    string literal or SQL comment must NOT be rewritten — the shim's
    'arbitrary SQL passes through byte-identical' contract."""
    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog, _masked_spans,
    )

    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    wh.upsert_partitioned(
        "facts",
        spark.sql("SELECT id AS k, 'a' AS v, TIMESTAMP '2024-01-01' AS ts "
                  "FROM range(10)"),
        ["k"], "ts", num_buckets=2,
    )
    wh.upsert_partitioned(
        "facts",
        spark.sql("SELECT id AS k, 'b' AS v, TIMESTAMP '2024-02-01' AS ts "
                  "FROM range(10, 15)"),
        ["k"], "ts", num_buckets=2,
    )
    cat = TxlogSqlCatalog(spark)
    cat.register("facts", wh.path("facts"))

    # literal survives verbatim; comment spans don't rewrite; a REAL
    # travel clause in the same statement still does
    row = cat.sql(
        "SELECT 'facts VERSION AS OF 1' AS lit, "
        "count(*) AS n_old, "  # the real clause below
        "  /* facts VERSION AS OF 99 never resolves */ "
        "max('it''s facts TIMESTAMP AS OF ''2024-01-01''') AS lit2 "
        "FROM facts VERSION AS OF 1 "
        "-- facts VERSION AS OF 99\n"
    ).first()
    assert row.lit == "facts VERSION AS OF 1"
    assert row.n_old == 10
    assert "facts TIMESTAMP AS OF" in row.lit2

    # the span scanner itself: escapes, nesting, line comments
    text = "a 'x''y' b \"z\" /* c /* d */ e */ f -- g\nh"
    spans = _masked_spans(text)
    masked = [text[a:b] for a, b in spans]
    assert masked == ["'x''y'", '"z"', "/* c /* d */ e */", "-- g"]


def test_txlog_sql_catalog_merge_on_clause_sides(spark, tmp_path):
    """ADVICE r9: degenerate equalities (ON t.k = t.k) and shared
    qualifiers must be rejected — each ON equality pairs exactly one
    target-side and one source-side column."""
    import pytest as _pytest

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    wh.upsert_partitioned(
        "facts",
        spark.sql("SELECT id AS k, 'a' AS v, TIMESTAMP '2024-01-01' AS ts "
                  "FROM range(10)"),
        ["k"], "ts", num_buckets=2,
    )
    spark.sql(
        "SELECT id AS k, 'b' AS v, TIMESTAMP '2024-02-01' AS ts "
        "FROM range(5)"
    ).createOrReplaceTempView("merge_src")
    cat = TxlogSqlCatalog(spark)
    cat.register("facts", wh.path("facts"))

    tail = (" WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *")
    # same qualifier on both sides of the equality
    with _pytest.raises(ValueError, match="exactly one target-side"):
        cat.sql("MERGE INTO facts USING merge_src "
                "ON facts.k = facts.k" + tail)
    with _pytest.raises(ValueError, match="exactly one target-side"):
        cat.sql("MERGE INTO facts USING merge_src "
                "ON merge_src.k = merge_src.k" + tail)
    # target and source sharing one alias is ambiguous
    with _pytest.raises(ValueError, match="share a qualifier"):
        cat.sql("MERGE INTO facts AS t USING merge_src AS t "
                "ON t.k = t.k" + tail)
    # once aliased, the base name is no longer a valid qualifier
    with _pytest.raises(ValueError, match="exactly one target-side"):
        cat.sql("MERGE INTO facts AS t USING merge_src AS s "
                "ON facts.k = s.k" + tail)
    # the well-formed statement still merges (either side order)
    m = cat.sql("MERGE INTO facts AS t USING merge_src AS s "
                "ON s.k = t.k" + tail).first()
    assert m.num_source_rows == 5 and m.table_version == 2


def test_txlog_sql_catalog_timestamp_as_of_session_timezone(
    spark, tmp_path
):
    """ADVICE r9: naive AS-OF timestamps resolve in
    spark.sql.session.timeZone (Delta semantics), not the Python
    process's local zone; explicit ISO offsets are honored; offset
    spellings of the session zone parse."""
    import datetime as dt

    import pytest as _pytest

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )
    from instagram_data_pipeline_spark.sources.txlog_source import (
        _load_manifest,
    )

    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    wh.upsert_partitioned(
        "facts",
        spark.sql("SELECT id AS k, 'a' AS v, TIMESTAMP '2024-01-01' AS ts "
                  "FROM range(10)"),
        ["k"], "ts", num_buckets=2,
    )
    cat = TxlogSqlCatalog(spark)
    cat.register("facts", wh.path("facts"))
    stamp = _load_manifest(wh.path("facts"), "1")["committed_at"]
    # the UTC wall-clock string one second AFTER the commit
    wall = dt.datetime.fromtimestamp(
        stamp + 1, dt.timezone.utc
    ).replace(tzinfo=None).isoformat()

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        # session zone AHEAD of UTC: the naive string means 9h EARLIER
        # in epoch terms -> predates the commit -> no version
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        with _pytest.raises(ValueError, match="no version"):
            cat.version_as_of("facts", wall)
        # explicit offset wins over the session zone
        assert cat.version_as_of("facts", wall + "+00:00") == 1
        # offset-style session zones parse too
        spark.conf.set("spark.sql.session.timeZone", "GMT+9")
        with _pytest.raises(ValueError, match="no version"):
            cat.version_as_of("facts", wall)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        assert cat.version_as_of("facts", wall) == 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_txlog_scan_survives_fully_deleted_file(spark, tmp_path):
    """Regression (found by the round-10 model-test SQL ops): a data
    file whose rows are ALL deletion-vector'd must scan as an empty
    batch — the Arrow take() of a plain empty list infers a null-typed
    index array, which has no (T, null) kernel and crashed the read."""
    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    wh.upsert_partitioned(
        "facts",
        spark.sql("SELECT id AS k, 'a' AS v, TIMESTAMP '2024-01-01' AS ts "
                  "FROM range(40)"),
        ["k"], "ts", num_buckets=2,
    )
    # DV-delete EVERY key: every data file ends up fully deleted
    n = fmt.delete_keys_dv(
        wh, "facts", ["k"],
        spark.sql("SELECT id AS k FROM range(40)"), 2,
    )
    assert n == 40
    cat = TxlogSqlCatalog(spark)
    cat.register("facts", wh.path("facts"))
    assert cat.sql("SELECT count(*) AS n FROM facts").first().n == 0
    assert cat.sql(
        "SELECT count(*) AS n FROM facts VERSION AS OF 2"
    ).first().n == 0
    # v1 still reads the pre-delete state
    assert cat.sql(
        "SELECT count(*) AS n FROM facts VERSION AS OF 1"
    ).first().n == 40


def test_txlog_sql_catalog_optimize_and_vacuum(spark, tmp_path):
    """Round-10 maintenance statements: OPTIMIZE compacts small files
    (ZORDER form re-clusters every bucket), VACUUM reclaims orphans,
    VACUUM KEEP expires old versions first — all layout/retention
    only, answers never change; metrics frames come back Delta-style."""
    import pytest as _pytest

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    fmt = TransactionLogFormat(max_records_per_file=20)
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)

    def batch(lo, n, ts):
        return spark.sql(
            f"SELECT id AS k, CAST(id * 2 AS DOUBLE) AS v, "
            f"TIMESTAMP '{ts}' AS ts FROM range({lo}, {lo + n})"
        )

    wh.upsert_partitioned("facts", batch(0, 100, "2024-01-01"),
                          ["k"], "ts", num_buckets=4)
    wh.upsert_partitioned("facts", batch(50, 100, "2024-02-01"),
                          ["k"], "ts", num_buckets=4)
    cat = TxlogSqlCatalog(spark)
    cat.register("facts", wh.path("facts"))
    want = sorted(
        map(tuple, cat.sql("SELECT k, v, ts FROM facts").collect())
    )

    m = cat.sql("OPTIMIZE facts").first()
    assert m.files_after < m.files_before and m.table_version == 3
    assert sorted(
        map(tuple, cat.sql("SELECT k, v, ts FROM facts").collect())
    ) == want

    # ZORDER form: re-clusters every bucket (min_files=1), new commit
    m = cat.sql("OPTIMIZE facts ZORDER BY (k, v)").first()
    assert m.table_version == 4
    assert sorted(
        map(tuple, cat.sql("SELECT k, v, ts FROM facts").collect())
    ) == want
    with _pytest.raises(ValueError, match="ZORDER BY column"):
        cat.sql("OPTIMIZE facts ZORDER BY (bogus)")
    with _pytest.raises(ValueError, match="empty ZORDER"):
        cat.sql("OPTIMIZE facts ZORDER BY ( )")

    # plain VACUUM: nothing orphaned, nothing expired
    m = cat.sql("VACUUM facts").first()
    assert m.num_deleted_files == 0 and m.num_expired_versions == 0

    # KEEP 1 VERSIONS: manifests 1-3 expire, their files reclaim,
    # the survivor stays byte-identical and time travel to v1 is gone
    m = cat.sql("VACUUM facts RETAIN 0 HOURS KEEP 1 VERSIONS").first()
    assert m.num_expired_versions == 3 and m.num_deleted_files > 0
    assert cat.versions("facts") == [4]
    assert sorted(
        map(tuple, cat.sql("SELECT k, v, ts FROM facts").collect())
    ) == want
    with _pytest.raises(FileNotFoundError):
        cat.sql("SELECT * FROM facts VERSION AS OF 1")


def test_txlog_sql_catalog_insert_into(spark, tmp_path):
    """INSERT INTO completes the DML square (round 10): append through
    the format's transactional merge with the KEY-UNIQUE contract
    enforced up front — batch-internal duplicates, NULL keys, and
    keys already present are all refused loudly (the existence probe
    is the bucket-scoped read_for_keys path, not a full-table
    anti-join). Column list is positional with null-fill; the source
    tail may itself time travel."""
    import pytest as _pytest

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    wh.upsert_partitioned(
        "facts",
        spark.sql(
            "SELECT id AS k, CAST(id * 10 AS DOUBLE) AS v, "
            "TIMESTAMP '2024-01-01' AS ts FROM range(10)"
        ),
        ["k"], "ts", num_buckets=4,
    )
    cat = TxlogSqlCatalog(spark)
    cat.register("facts", wh.path("facts"))

    # full-arity positional VALUES
    m = cat.sql(
        "INSERT INTO facts VALUES "
        "(100, 1.5, TIMESTAMP '2024-02-01'), "
        "(101, 2.5, TIMESTAMP '2024-02-02')"
    ).first()
    assert m.num_inserted_rows == 2 and m.table_version == 2
    got = {r.k: r.v for r in
           cat.sql("SELECT k, v FROM facts").collect()}
    assert len(got) == 12 and got[100] == 1.5 and got[3] == 30.0

    # column list: positional mapping, unlisted columns null-fill,
    # values cast to the table's types (int literal -> double column)
    m = cat.sql("INSERT INTO facts (k, v) VALUES (102, 7)").first()
    assert m.num_inserted_rows == 1 and m.table_version == 3
    row = cat.sql("SELECT * FROM facts WHERE k = 102").first()
    assert row.v == 7.0 and row.ts is None

    # SELECT source, including a time-traveling tail
    m = cat.sql(
        "INSERT INTO facts "
        "SELECT k + 200 AS k, v, ts FROM facts VERSION AS OF 1 "
        "WHERE k < 3"
    ).first()
    assert m.num_inserted_rows == 3
    assert cat.sql(
        "SELECT count(*) AS n FROM facts WHERE k >= 200"
    ).first().n == 3

    # empty source publishes no version (Delta-alike)
    before = cat.versions("facts")[-1]
    m = cat.sql(
        "INSERT INTO facts SELECT k, v, ts FROM facts WHERE k < 0"
    ).first()
    assert m.num_inserted_rows == 0 and m.table_version == before

    # contract violations, all loud
    with _pytest.raises(ValueError, match="already present"):
        cat.sql("INSERT INTO facts VALUES (3, 0.0, TIMESTAMP '2024-01-01')")
    with _pytest.raises(ValueError, match="repeated within"):
        cat.sql(
            "INSERT INTO facts VALUES "
            "(300, 0.0, TIMESTAMP '2024-01-01'), "
            "(300, 1.0, TIMESTAMP '2024-01-02')"
        )
    with _pytest.raises(ValueError, match="NULL merge key"):
        cat.sql("INSERT INTO facts VALUES (NULL, 0.0, TIMESTAMP '2024-01-01')")
    with _pytest.raises(ValueError, match="every merge key"):
        cat.sql("INSERT INTO facts (v, ts) VALUES (0.0, TIMESTAMP '2024-01-01')")
    with _pytest.raises(ValueError, match="unknown column"):
        cat.sql("INSERT INTO facts (k, bogus) VALUES (300, 1)")
    with _pytest.raises(ValueError, match="duplicate column"):
        cat.sql("INSERT INTO facts (k, v, v) VALUES (300, 1, 2)")
    with _pytest.raises(ValueError, match="column"):
        cat.sql("INSERT INTO facts (k) VALUES (300, 1)")
    # unregistered names pass through to spark.sql untouched
    with _pytest.raises(Exception) as ei:
        cat.sql("INSERT INTO not_ours VALUES (1)")
    assert not isinstance(ei.value, (ValueError, KeyError))


def test_txlog_sql_catalog_restore(spark, tmp_path):
    """RESTORE TABLE rolls back as a FORWARD commit: the new version
    copies the target manifest by reference (zero data files written
    — asserted by on-disk parquet census), history stays intact (the
    rolled-back version remains time-travel-able), TO TIMESTAMP AS OF
    resolves through the same session-tz rules as SELECT travel, and
    restoring to the current version is a no-op."""
    import pytest as _pytest

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.io import Warehouse
    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    fmt = TransactionLogFormat()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)

    def batch(lo, n, ts):
        return spark.sql(
            f"SELECT id AS k, CAST(id * 2 AS DOUBLE) AS v, "
            f"TIMESTAMP '{ts}' AS ts FROM range({lo}, {lo + n})"
        )

    wh.upsert_partitioned("facts", batch(0, 50, "2024-01-01"),
                          ["k"], "ts", num_buckets=4)
    wh.upsert_partitioned("facts", batch(40, 20, "2024-02-01"),
                          ["k"], "ts", num_buckets=4)  # v2: 60 keys
    cat = TxlogSqlCatalog(spark)
    cat.register("facts", wh.path("facts"))
    want_v2 = sorted(
        map(tuple, cat.sql("SELECT k, v, ts FROM facts").collect())
    )
    cat.sql("DELETE FROM facts WHERE k IN (1, 2, 3)")  # v3

    n_parquet = len(list((tmp_path / "wh").rglob("*.parquet")))
    m = cat.sql("RESTORE TABLE facts TO VERSION AS OF 2").first()
    assert m.restored_source_version == 2 and m.table_version == 4
    assert m.num_rows == 60
    # control-plane only: not one data file written
    assert len(list((tmp_path / "wh").rglob("*.parquet"))) == n_parquet
    assert sorted(
        map(tuple, cat.sql("SELECT k, v, ts FROM facts").collect())
    ) == want_v2
    # the rolled-back version is still history, not erased
    assert cat.sql(
        "SELECT count(*) AS n FROM facts VERSION AS OF 3"
    ).first().n == 57

    # TO TIMESTAMP AS OF: a stamp strictly between v1 and v2 resolves
    # to v1 (same rules as SELECT time travel)
    hist = {r.version: r.committed_at for r in
            cat.sql("DESCRIBE HISTORY facts").collect()}
    mid = hist[1] + (hist[2] - hist[1]) / 2
    m = cat.sql(
        f"RESTORE facts TO TIMESTAMP AS OF '{mid.isoformat()}'"
    ).first()
    assert m.restored_source_version == 1 and m.table_version == 5
    assert cat.sql("SELECT count(*) AS n FROM facts").first().n == 50

    # no-op restore to the current version publishes nothing
    m = cat.sql("RESTORE TABLE facts TO VERSION AS OF 5").first()
    assert m.table_version == 5 and cat.versions("facts")[-1] == 5

    # restoring to a never-committed / expired version fails loudly
    with _pytest.raises(FileNotFoundError, match="never committed"):
        cat.sql("RESTORE TABLE facts TO VERSION AS OF 99")
    # unregistered names pass through to spark.sql (parse error there)
    with _pytest.raises(Exception) as ei:
        cat.sql("RESTORE TABLE not_ours TO VERSION AS OF 1")
    assert not isinstance(ei.value, (ValueError, KeyError))


def test_txlog_sql_catalog_create_drop_show_detail(spark, tmp_path):
    """DDL + introspection complete the SQL catalog (round 10):
    CREATE TABLE publishes an EMPTY v1 recording the declared
    schema/key/bucket contract (readable immediately; later DML
    validates against it), CTAS follows with an ordinary transactional
    merge under the same key-unique enforcement as INSERT, DROP
    unregisters (data stays without PURGE — external-table semantics,
    re-attachable), SHOW TXLOG TABLES / DESCRIBE DETAIL serve the
    registry and per-table control-plane facts from manifests alone."""
    import os

    import pytest as _pytest

    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    cat = TxlogSqlCatalog(spark)
    loc = str(tmp_path / "t1")

    # plain CREATE: empty v1, valid contract, readable immediately
    m = cat.sql(
        f"CREATE TABLE t1 (k BIGINT, v DOUBLE, ts TIMESTAMP) "
        f"USING txlog CLUSTERED BY (k) INTO 4 BUCKETS LOCATION '{loc}'"
    ).first()
    assert m.created and m.table_version == 1 and m.num_rows == 0
    assert cat.sql("SELECT count(*) AS n FROM t1").first().n == 0
    # DML against the DECLARED contract (no bootstrap merge needed)
    m = cat.sql(
        "INSERT INTO t1 VALUES (1, 1.5, TIMESTAMP '2024-01-01'), "
        "(2, 2.5, TIMESTAMP '2024-01-02')"
    ).first()
    assert m.num_inserted_rows == 2 and m.table_version == 2

    # CTAS: schema from the query, data merged as v2
    loc2 = str(tmp_path / "t2")
    m = cat.sql(
        f"CREATE TABLE t2 USING txlog CLUSTERED BY (k) INTO 4 BUCKETS "
        f"LOCATION '{loc2}' AS SELECT k, v * 10 AS v10 FROM t1"
    ).first()
    assert m.created and m.num_rows == 2 and m.table_version == 2
    got = {r.k: r.v10 for r in cat.sql("SELECT * FROM t2").collect()}
    assert got == {1: 15.0, 2: 25.0}

    # introspection: registry listing + control-plane detail
    shown = {r.table: (r.location, r.version)
             for r in cat.sql("SHOW TXLOG TABLES").collect()}
    assert shown == {"t1": (loc, 2), "t2": (loc2, 2)}
    d = cat.sql("DESCRIBE DETAIL t2").first()
    assert (d.format, d.version, d.num_rows, d.num_deleted) == \
        ("txlog", 2, 2, 0)
    assert d.keys == ["k"] and d.num_buckets == 4 and d.size_bytes > 0

    # refusals
    with _pytest.raises(ValueError, match="already holds"):
        cat.sql(f"CREATE TABLE t9 (k BIGINT) USING txlog "
                f"CLUSTERED BY (k) INTO 4 BUCKETS LOCATION '{loc}'")
    with _pytest.raises(ValueError, match="exactly one"):
        cat.sql(f"CREATE TABLE t9 USING txlog CLUSTERED BY (k) "
                f"INTO 4 BUCKETS LOCATION '{tmp_path / 't9'}'")
    with _pytest.raises(ValueError, match="key column"):
        cat.sql(f"CREATE TABLE t9 (k BIGINT) USING txlog "
                f"CLUSTERED BY (nope) INTO 4 BUCKETS "
                f"LOCATION '{tmp_path / 't9'}'")
    with _pytest.raises(ValueError, match="mutually exclusive"):
        cat.sql(f"CREATE OR REPLACE TABLE IF NOT EXISTS t9 (k BIGINT) "
                f"USING txlog CLUSTERED BY (k) INTO 4 BUCKETS "
                f"LOCATION '{tmp_path / 't9'}'")
    with _pytest.raises(ValueError, match="repeated within"):
        cat.sql(f"CREATE TABLE t9 USING txlog CLUSTERED BY (k) "
                f"INTO 4 BUCKETS LOCATION '{tmp_path / 't9'}' "
                f"AS SELECT 1 AS k UNION ALL SELECT 1 AS k")

    # IF NOT EXISTS no-ops on an existing table — but ONLY when the
    # statement's declared contract matches the committed one; a
    # different key list / bucket count / schema is refused instead of
    # silently succeeding under a contract the caller didn't declare
    # (ADVICE r10)
    m = cat.sql(f"CREATE TABLE IF NOT EXISTS t1 "
                f"(k BIGINT, v DOUBLE, ts TIMESTAMP) USING txlog "
                f"CLUSTERED BY (k) INTO 4 BUCKETS LOCATION '{loc}'").first()
    assert not m.created and m.table_version == 2
    with _pytest.raises(ValueError, match="different contract"):
        cat.sql(f"CREATE TABLE IF NOT EXISTS t1 (k BIGINT) USING txlog "
                f"CLUSTERED BY (k) INTO 4 BUCKETS LOCATION '{loc}'")
    with _pytest.raises(ValueError, match="different contract"):
        cat.sql(f"CREATE TABLE IF NOT EXISTS t1 "
                f"(k BIGINT, v DOUBLE, ts TIMESTAMP) USING txlog "
                f"CLUSTERED BY (v) INTO 4 BUCKETS LOCATION '{loc}'")
    with _pytest.raises(ValueError, match="different contract"):
        cat.sql(f"CREATE TABLE IF NOT EXISTS t1 "
                f"(k BIGINT, v DOUBLE, ts TIMESTAMP) USING txlog "
                f"CLUSTERED BY (k) INTO 8 BUCKETS LOCATION '{loc}'")

    # OR REPLACE is a FORWARD commit (ADVICE r10): the new contract
    # AND data land as ONE version N+1 (files written first — a
    # self-referencing AS query must read the pre-replace table), and
    # every pre-replace version stays time-travel-able
    m = cat.sql(f"CREATE OR REPLACE TABLE t2 USING txlog CLUSTERED BY (k) "
                f"INTO 2 BUCKETS LOCATION '{loc2}' AS SELECT 9 AS k").first()
    assert m.created and m.num_rows == 1 and m.table_version == 3
    assert cat.sql("SELECT count(*) AS n FROM t2").first().n == 1
    d = cat.sql("DESCRIBE DETAIL t2").first()
    assert d.num_buckets == 2 and d.keys == ["k"]
    # pre-replace history intact: v2 still serves the OLD schema+data
    old = cat.sql("SELECT * FROM t2 VERSION AS OF 2")
    assert set(old.columns) == {"k", "v10"}
    assert {r.k: r.v10 for r in old.collect()} == {1: 15.0, 2: 25.0}
    # REPLACE ... AS SELECT from the table being replaced reads the
    # PRE-replace snapshot (the silent-empty-table hazard this
    # ordering exists to prevent)
    m = cat.sql(f"CREATE OR REPLACE TABLE t2 USING txlog CLUSTERED BY (k) "
                f"INTO 2 BUCKETS LOCATION '{loc2}' "
                f"AS SELECT k + 1 AS k FROM t2").first()
    assert m.created and m.num_rows == 1 and m.table_version == 4
    assert [r.k for r in cat.sql("SELECT k FROM t2").collect()] == [10]

    # DROP keeps data (re-attachable); DROP PURGE deletes the root
    m = cat.sql("DROP TABLE t2").first()
    assert not m.purged and os.path.isdir(os.path.join(loc2, "_txlog"))
    assert [r.table for r in cat.sql("SHOW TXLOG TABLES").collect()] == ["t1"]
    cat.register("t2b", loc2)
    assert cat.sql("SELECT count(*) AS n FROM t2b").first().n == 1
    m = cat.sql("DROP TABLE t2b PURGE").first()
    assert m.purged and not os.path.exists(loc2)
    # unregistered DROP passes through to spark.sql (IF EXISTS no-op)
    cat.sql("DROP TABLE IF EXISTS never_registered")


def test_txlog_sql_catalog_alter_table(spark, tmp_path):
    """ALTER TABLE (round 10): the four metadata-only schema-evolution
    statements — RENAME COLUMN (column-mapping indirection), ADD
    COLUMN (nullable append; old files read back NULL; the next
    INSERT carries the evolved shape), ALTER COLUMN TYPE (safe-lattice
    widening), DROP COLUMN (tombstoned physical name) — each ONE
    manifest publish, with history serving every version under its
    own schema, and the format's key-protection refusals surfacing
    through the SQL shim."""
    import pytest as _pytest

    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    cat = TxlogSqlCatalog(spark)
    loc = str(tmp_path / "t")
    cat.sql(f"CREATE TABLE t (k BIGINT, v STRING, cnt INT) USING txlog "
            f"CLUSTERED BY (k) INTO 4 BUCKETS LOCATION '{loc}'")
    cat.sql("INSERT INTO t VALUES (1, 'a', 10), (2, 'b', 20)")

    m = cat.sql("ALTER TABLE t RENAME COLUMN v TO label").first()
    assert m.table_version == 3
    assert {r.label for r in cat.sql("SELECT label FROM t").collect()} \
        == {"a", "b"}

    m = cat.sql("ALTER TABLE t ADD COLUMN score DOUBLE").first()
    assert m.table_version == 4
    assert all(r.score is None
               for r in cat.sql("SELECT score FROM t").collect())
    cat.sql("INSERT INTO t VALUES (3, 'c', 30, 0.5)")
    got = {r.k: r.score for r in cat.sql("SELECT k, score FROM t").collect()}
    assert got == {1: None, 2: None, 3: 0.5}

    m = cat.sql("ALTER TABLE t ALTER COLUMN cnt TYPE BIGINT").first()
    assert m.table_version == 6
    assert dict(cat.snapshot("t").dtypes)["cnt"] == "bigint"

    m = cat.sql("ALTER TABLE t DROP COLUMN label").first()
    assert m.table_version == 7
    assert "label" not in cat.snapshot("t").columns
    # time travel serves the pre-drop shape
    assert "label" in cat.sql("SELECT * FROM t VERSION AS OF 5").columns

    with _pytest.raises(ValueError, match="merge key"):
        cat.sql("ALTER TABLE t DROP COLUMN k")
    with _pytest.raises(ValueError, match="merge key"):
        cat.sql("ALTER TABLE t ALTER COLUMN k TYPE BIGINT")
    with _pytest.raises(ValueError, match="already exists"):
        cat.sql("ALTER TABLE t ADD COLUMN cnt INT")
    with _pytest.raises(ValueError, match="unsupported action"):
        cat.sql("ALTER TABLE t SET TBLPROPERTIES ('a'='b')")
    # unregistered names pass through to spark.sql
    with _pytest.raises(Exception) as ei:
        cat.sql("ALTER TABLE not_ours DROP COLUMN x")
    assert not isinstance(ei.value, (ValueError, KeyError))


def test_txlog_sql_catalog_alter_add_columns_spellings(spark, tmp_path):
    """ADD COLUMN(S) spec parsing (ADVICE r10): the plural
    'ADD COLUMNS (a INT, b STRING)' list adds EVERY column (the old
    field regex silently dropped all but the first) in ONE manifest
    commit, and parenthesized types — DECIMAL(10,2) — parse via
    Spark's own DDL parser instead of failing. Garbage specs are
    refused loudly with no version published."""
    import pytest as _pytest

    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    cat = TxlogSqlCatalog(spark)
    loc = str(tmp_path / "t")
    cat.sql(f"CREATE TABLE t (k BIGINT, v STRING) USING txlog "
            f"CLUSTERED BY (k) INTO 2 BUCKETS LOCATION '{loc}'")
    cat.sql("INSERT INTO t VALUES (1, 'a')")

    # multi-column list: one statement, one manifest, ALL columns added
    m = cat.sql("ALTER TABLE t ADD COLUMNS (score INT, tag STRING)").first()
    assert m.operation == "add score, tag" and m.table_version == 3
    snap = cat.snapshot("t")
    assert snap.columns == ["k", "v", "score", "tag"]
    r = cat.sql("SELECT * FROM t").first()
    assert (r.score, r.tag) == (None, None)
    # both columns are writable in the evolved shape
    cat.sql("INSERT INTO t VALUES (2, 'b', 7, 'x')")
    got = {r.k: (r.score, r.tag) for r in cat.sql("SELECT * FROM t").collect()}
    assert got == {1: (None, None), 2: (7, "x")}

    # parenthesized type: the trailing ')' belongs to the type
    m = cat.sql("ALTER TABLE t ADD COLUMN price DECIMAL(10,2)").first()
    assert m.table_version == 5
    assert dict(cat.snapshot("t").dtypes)["price"] == "decimal(10,2)"
    # wrapped single-column spelling with a parenthesized type too
    m = cat.sql("ALTER TABLE t ADD COLUMNS (label VARCHAR(8))").first()
    assert m.table_version == 6
    assert "label" in cat.snapshot("t").columns

    # refusals: a duplicate inside the list, an existing name in the
    # list (whole statement refused — no partial add), garbage spec
    with _pytest.raises(ValueError, match="listed twice"):
        cat.sql("ALTER TABLE t ADD COLUMNS (x INT, x STRING)")
    with _pytest.raises(ValueError, match="already exists"):
        cat.sql("ALTER TABLE t ADD COLUMNS (brand STRING, score INT)")
    assert "brand" not in cat.snapshot("t").columns  # nothing partial
    with _pytest.raises(ValueError, match="cannot parse"):
        cat.sql("ALTER TABLE t ADD COLUMN broken NOT_A_TYPE(")
    assert cat.sql("DESCRIBE DETAIL t").first().version == 6


def test_txlog_sql_catalog_set_not_null_promote(spark, tmp_path):
    """``ALTER COLUMN c SET NOT NULL`` (round 13, VERDICT r12 #5): the
    VALIDATED promote completing the legal path the NOT-NULL-ADD
    refusal points at — add nullable, backfill, promote. Promote with
    surviving NULLs is refused; after promote every write statement
    enforces the invariant (the implicit-constraint pass); nullability
    survives later merges (the published schema carries the snapshot's
    flags, not the incoming batch's all-nullable ones); RESTORE
    reverts the promote with the rest of the metadata; DROP NOT NULL
    releases it with no scan."""
    import json as _json
    import os

    import pytest as _pytest

    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    cat = TxlogSqlCatalog(spark)
    loc = str(tmp_path / "t")
    cat.sql(f"CREATE TABLE t (k BIGINT, v DOUBLE) USING txlog "
            f"CLUSTERED BY (k) INTO 4 BUCKETS LOCATION '{loc}'")
    cat.sql("INSERT INTO t SELECT id AS k, CAST(id AS DOUBLE) AS v "
            "FROM range(6)")
    # NOT NULL on a metadata-only ADD stays refused, pointing here
    with _pytest.raises(ValueError, match="SET NOT NULL"):
        cat.sql("ALTER TABLE t ADD COLUMN tag STRING NOT NULL")
    cat.sql("ALTER TABLE t ADD COLUMN tag STRING")  # v3

    # promote with NULLs present (every existing row) is refused
    with _pytest.raises(ValueError, match="backfill first"):
        cat.sql("ALTER TABLE t ALTER COLUMN tag SET NOT NULL")
    cat.sql("UPDATE t SET tag = 'x' WHERE k >= 0")  # backfill, v4
    m = cat.sql("ALTER TABLE t ALTER COLUMN tag SET NOT NULL").first()
    assert m.operation == "set not null tag" and m.table_version == 5

    def nullable_of(col):
        with open(os.path.join(loc, "_txlog", sorted(
                os.listdir(os.path.join(loc, "_txlog")))[-1])) as f:
            man = _json.load(f)
        return {
            fld["name"]: fld["nullable"]
            for fld in _json.loads(man["schema"])["fields"]
        }[col]

    assert nullable_of("tag") is False
    # enforcement at every write statement
    with _pytest.raises(ValueError, match="NOT NULL"):
        cat.sql("INSERT INTO t VALUES (100, 1.0, NULL)")
    with _pytest.raises(ValueError, match="NOT NULL"):
        cat.sql("UPDATE t SET tag = NULL WHERE k = 1")
    with _pytest.raises(ValueError, match="NOT NULL"):
        cat.sql("INSERT OVERWRITE t VALUES (0, 1.0, NULL)")
    # a compliant merge commits — and does NOT regress the promote
    # (incoming DataFrame schemas are nullable-typed by default)
    cat.sql("INSERT INTO t VALUES (100, 1.0, 'y')")  # v6
    assert nullable_of("tag") is False
    # idempotent promote: no publish
    m = cat.sql("ALTER TABLE t ALTER COLUMN tag SET NOT NULL").first()
    assert "(already)" in m.operation and m.table_version == 6

    # RESTORE to the pre-promote version reverts the invariant
    cat.sql("RESTORE TABLE t TO VERSION AS OF 4")  # v7
    assert nullable_of("tag") is True
    cat.sql("INSERT INTO t VALUES (101, 1.0, NULL)")  # legal again

    # re-promote fails on the NULL row just written, then DROP NOT
    # NULL releases a real promote without a scan
    with _pytest.raises(ValueError, match="1 existing row"):
        cat.sql("ALTER TABLE t ALTER COLUMN tag SET NOT NULL")
    cat.sql("UPDATE t SET tag = 'z' WHERE k = 101")
    cat.sql("ALTER TABLE t ALTER COLUMN tag SET NOT NULL")
    m = cat.sql("ALTER TABLE t ALTER COLUMN tag DROP NOT NULL").first()
    assert m.operation == "drop not null tag"
    assert nullable_of("tag") is True
    cat.sql("INSERT INTO t VALUES (102, 1.0, NULL)")
    # unknown column refused
    with _pytest.raises(ValueError, match="no column"):
        cat.sql("ALTER TABLE t ALTER COLUMN nope SET NOT NULL")


def test_txlog_sql_catalog_insert_overwrite_and_truncate(spark, tmp_path):
    """INSERT OVERWRITE + TRUNCATE TABLE (round 11): both land as ONE
    forward commit under the UNCHANGED recorded contract — overwrite
    writes the new files BEFORE publishing (so a self-referencing
    source reads the pre-overwrite table), truncate publishes an empty
    file set touching zero data files — and every prior version stays
    time-travel-able. Key-unique and CHECK-constraint enforcement
    apply to the overwrite batch; constraints survive TRUNCATE."""
    import pytest as _pytest

    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    cat = TxlogSqlCatalog(spark)
    loc = str(tmp_path / "t")
    cat.sql(f"CREATE TABLE t (k BIGINT, v DOUBLE) USING txlog "
            f"CLUSTERED BY (k) INTO 4 BUCKETS LOCATION '{loc}'")
    cat.sql("INSERT INTO t SELECT id AS k, CAST(id AS DOUBLE) AS v "
            "FROM range(10)")

    # overwrite with a SELF-REFERENCING source: reads pre-overwrite rows
    m = cat.sql("INSERT OVERWRITE t SELECT k, v * 10 AS v FROM t "
                "WHERE k < 4").first()
    assert m.num_overwritten_rows == 4 and m.table_version == 3
    got = {r.k: r.v for r in cat.sql("SELECT * FROM t").collect()}
    assert got == {0: 0.0, 1: 10.0, 2: 20.0, 3: 30.0}
    # pre-overwrite version intact
    assert cat.sql("SELECT count(*) AS n FROM t VERSION AS OF 2") \
        .first().n == 10
    d = cat.sql("DESCRIBE DETAIL t").first()
    assert d.num_buckets == 4 and d.keys == ["k"] and d.num_rows == 4

    # column list + null-fill, key-unique + constraint enforcement
    m = cat.sql("INSERT OVERWRITE t (k) SELECT id FROM range(3)").first()
    assert m.num_overwritten_rows == 3 and m.table_version == 4
    assert all(r.v is None for r in cat.sql("SELECT v FROM t").collect())
    with _pytest.raises(ValueError, match="repeated within"):
        cat.sql("INSERT OVERWRITE t SELECT 1 AS k, 0.0 AS v "
                "UNION ALL SELECT 1 AS k, 1.0 AS v")
    cat.sql("ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v >= 0)")
    with _pytest.raises(ValueError, match="violate constraint"):
        cat.sql("INSERT OVERWRITE t VALUES (1, -2.0)")
    # ADD CONSTRAINT is ONE manifest commit (round 12: the set lives in
    # the versioned manifest, not a sidecar) — version 5; the refused
    # overwrite left no version
    assert cat.sql("DESCRIBE DETAIL t").first().version == 5

    # TRUNCATE: one empty forward commit; history + constraints survive
    m = cat.sql("TRUNCATE TABLE t").first()
    assert m.num_removed_rows == 3 and m.table_version == 6
    assert cat.sql("SELECT count(*) AS n FROM t").first().n == 0
    assert cat.sql("SELECT count(*) AS n FROM t VERSION AS OF 4") \
        .first().n == 3
    with _pytest.raises(ValueError, match="violate constraint"):
        cat.sql("INSERT INTO t VALUES (9, -1.0)")
    m = cat.sql("INSERT INTO t VALUES (9, 1.5)").first()
    assert m.table_version == 7
    assert cat.sql("SELECT count(*) AS n FROM t").first().n == 1

    # overwriting an EMPTY result set is a valid (empty) commit
    cat.sql("TRUNCATE TABLE t")
    m = cat.sql("INSERT OVERWRITE t SELECT k, v FROM t WHERE k < 0") \
        .first()
    assert m.num_overwritten_rows == 0
    assert cat.sql("SELECT count(*) AS n FROM t").first().n == 0


def test_txlog_sql_catalog_insert_overwrite_where(spark, tmp_path):
    """Predicate-scoped INSERT OVERWRITE (round 12, Delta replaceWhere
    parity): exactly the matching rows are replaced as ONE commit;
    every incoming row must satisfy the predicate; an incoming key on
    a NON-matching row is refused (key-unique contract); non-matching
    BUCKETS' files are carried by reference (the touched-fraction
    scale story); history stays time-travel-able."""
    import json as _json
    import os

    import pytest as _pytest

    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    cat = TxlogSqlCatalog(spark)
    loc = str(tmp_path / "t")
    cat.sql(f"CREATE TABLE t (k BIGINT, grp STRING, v DOUBLE) USING "
            f"txlog CLUSTERED BY (k) INTO 8 BUCKETS LOCATION '{loc}'")
    cat.sql("INSERT INTO t SELECT id AS k, "
            "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS grp, "
            "CAST(id AS DOUBLE) AS v FROM range(40)")

    def files_of(v):
        with open(os.path.join(loc, "_txlog", f"{v:08d}.json")) as f:
            return set(_json.load(f)["files"])

    # replace the 'a' slice with a smaller recomputed slice (self-
    # referencing source reads the pre-overwrite pinned snapshot)
    m = cat.sql(
        "INSERT OVERWRITE t WHERE grp = 'a' "
        "SELECT k, grp, v * 100 AS v FROM t WHERE grp = 'a' AND k < 10"
    ).first()
    assert m.num_replaced_rows == 20 and m.num_inserted_rows == 5
    assert m.table_version == 3
    rows = {r.k: (r.grp, r.v) for r in cat.sql("SELECT * FROM t").collect()}
    assert sum(1 for g, _ in rows.values() if g == "a") == 5
    assert all(v == k * 100.0 for k, (g, v) in rows.items() if g == "a")
    assert sum(1 for g, _ in rows.values() if g == "b") == 20
    assert all(v == float(k) for k, (g, v) in rows.items() if g == "b")
    # pre-replace version intact; some v2 files carried by reference
    assert cat.sql("SELECT count(*) AS n FROM t VERSION AS OF 2") \
        .first().n == 40
    assert files_of(2) & files_of(3), "no carried files — full rewrite"

    # incoming row outside the predicate is refused
    with _pytest.raises(ValueError, match="do not satisfy"):
        cat.sql("INSERT OVERWRITE t WHERE grp = 'a' VALUES (100, 'b', 1.0)")
    # incoming key living on a NON-matching row is refused
    with _pytest.raises(ValueError, match="key-unique"):
        cat.sql("INSERT OVERWRITE t WHERE grp = 'a' VALUES (1, 'a', 1.0)")
    # predicate over an unknown column is refused at analysis
    with _pytest.raises(ValueError, match="does not analyze"):
        cat.sql("INSERT OVERWRITE t WHERE nope = 1 VALUES (2, 'a', 1.0)")
    # a keyword INSIDE the predicate (here, mid-string-literal after
    # whitespace) ends the lazy WHERE capture — refused BEFORE the
    # body parse, with the restricted grammar named (ADVICE r12)
    with _pytest.raises(ValueError, match="restricted grammar"):
        cat.sql("INSERT OVERWRITE t WHERE grp = 'a select b' "
                "VALUES (2, 'a', 1.0)")
    # the refusals committed nothing
    assert cat.sql("DESCRIBE DETAIL t").first().version == 3

    # empty source = scoped DELETE of the matching slice, one commit
    m = cat.sql("INSERT OVERWRITE t WHERE grp = 'a' "
                "SELECT k, grp, v FROM t WHERE false").first()
    assert m.num_replaced_rows == 5 and m.num_inserted_rows == 0
    assert cat.sql("SELECT count(*) AS n FROM t").first().n == 20
    # constraints are kept and enforced on the scoped batch
    cat.sql("ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v >= 0)")
    with _pytest.raises(ValueError, match="violate constraint"):
        cat.sql("INSERT OVERWRITE t WHERE grp = 'b' VALUES (1, 'b', -5.0)")


def test_txlog_sql_catalog_check_constraints(spark, tmp_path):
    """CHECK constraints (round 10; manifest-recorded since round 12 —
    ADD/DROP is one CAS commit, so the policy is transactional with
    every concurrent writer), enforced at every catalog write statement
    (INSERT / UPDATE / MERGE INTO) against the STATEMENT's rows only;
    ADD CONSTRAINT validates the expression analyzes and that every
    existing row satisfies it; NULL satisfies CHECK (ANSI three-valued
    logic); DESCRIBE DETAIL lists the recorded set."""
    import pytest as _pytest

    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
    )

    cat = TxlogSqlCatalog(spark)
    loc = str(tmp_path / "t")
    cat.sql(f"CREATE TABLE t (k BIGINT, v DOUBLE, tag STRING) USING txlog "
            f"CLUSTERED BY (k) INTO 4 BUCKETS LOCATION '{loc}'")
    cat.sql("INSERT INTO t VALUES (1, 1.0, 'a'), (2, 2.0, 'b')")

    m = cat.sql("ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v > 0)").first()
    assert m.num_constraints == 1
    m = cat.sql(
        "ALTER TABLE t ADD CONSTRAINT tag_ok "
        "CHECK (tag IN ('a','b','c'))"
    ).first()
    assert m.num_constraints == 2

    # every write statement validates its rows
    with _pytest.raises(ValueError, match="v_pos"):
        cat.sql("INSERT INTO t VALUES (3, -1.0, 'a')")
    with _pytest.raises(ValueError, match="tag_ok"):
        cat.sql("INSERT INTO t VALUES (3, 1.0, 'z')")
    with _pytest.raises(ValueError, match="v_pos"):
        cat.sql("UPDATE t SET v = v - 5 WHERE k = 1")
    spark.sql(
        "SELECT 3 AS k, CAST(-1 AS DOUBLE) AS v, 'a' AS tag"
    ).createOrReplaceTempView("constraint_bad_src")
    with _pytest.raises(ValueError, match="v_pos"):
        cat.sql("MERGE INTO t USING constraint_bad_src "
                "ON t.k = constraint_bad_src.k "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *")

    # NULL satisfies CHECK; valid rows pass
    assert cat.sql(
        "INSERT INTO t (k, tag) VALUES (4, 'c')"
    ).first().num_inserted_rows == 1
    assert cat.sql(
        "INSERT INTO t VALUES (5, 9.0, 'a')"
    ).first().num_inserted_rows == 1

    # ADD validates existing rows and expression analysis
    with _pytest.raises(ValueError, match="existing row"):
        cat.sql("ALTER TABLE t ADD CONSTRAINT big CHECK (v > 100)")
    with _pytest.raises(ValueError, match="does not analyze"):
        cat.sql("ALTER TABLE t ADD CONSTRAINT bogus CHECK (nope > 1)")
    with _pytest.raises(ValueError, match="already exists"):
        cat.sql("ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v > 1)")

    d = cat.sql("DESCRIBE DETAIL t").first()
    assert d.constraints == [
        "tag_ok CHECK (tag IN ('a','b','c'))", "v_pos CHECK (v > 0)"
    ]

    # DROP releases the policy; IF EXISTS no-ops; unknown drop is loud
    assert cat.sql(
        "ALTER TABLE t DROP CONSTRAINT v_pos"
    ).first().num_constraints == 1
    cat.sql("INSERT INTO t VALUES (6, -2.0, 'a')")  # now admissible
    assert cat.sql(
        "ALTER TABLE t DROP CONSTRAINT IF EXISTS gone"
    ).first().num_constraints == 1
    with _pytest.raises(ValueError, match="no constraint"):
        cat.sql("ALTER TABLE t DROP CONSTRAINT gone")
    assert cat.sql("SELECT count(*) AS n FROM t").first().n == 5


def test_txlog_sql_catalog_convert_to_txlog(spark, tmp_path):
    """CONVERT TO TXLOG (round 10): adopt a flat parquet directory in
    place — zero bytes rewritten (on-disk census pinned), footer
    metadata harvested into the v1 manifest (metadata COUNT serves
    immediately), key-uniqueness validated up front, contract
    recorded as 1 bucket so the FIRST merge migrates the layout
    through the ordinary machinery; time travel to v1 keeps reading
    the original files."""
    import glob
    import os

    import pytest as _pytest

    from instagram_data_pipeline_spark.formats import TransactionLogFormat
    from instagram_data_pipeline_spark.sources.txlog_catalog import (
        TxlogSqlCatalog,
        _TableHandle,
    )

    loc = str(tmp_path / "plain")
    spark.sql(
        "SELECT id AS k, CAST(id * 2 AS DOUBLE) AS v, "
        "concat('u', id) AS name FROM range(100)"
    ).repartition(4).write.parquet(loc)
    n_before = len(glob.glob(os.path.join(loc, "*.parquet")))

    cat = TxlogSqlCatalog(spark)
    m = cat.sql(
        f"CONVERT TO TXLOG adopted LOCATION '{loc}' CLUSTERED BY (k)"
    ).first()
    assert (m.table_version, m.num_rows, m.num_files) == (1, 100, n_before)
    assert len(glob.glob(os.path.join(loc, "*.parquet"))) == n_before
    assert cat.sql("SELECT count(*) AS n FROM adopted").first().n == 100
    # metadata-only count served from the harvested footer numbers
    fmt = TransactionLogFormat()
    assert fmt.count_rows(_TableHandle(spark, loc), "adopted") == 100
    d = cat.sql("DESCRIBE DETAIL adopted").first()
    assert d.num_buckets == 1 and d.keys == ["k"]

    # the full write surface works through the 1-bucket contract
    assert cat.sql(
        "INSERT INTO adopted VALUES (500, 1.5, 'new')"
    ).first().num_inserted_rows == 1
    cat.sql("UPDATE adopted SET v = 0 WHERE k = 500")
    cat.sql("DELETE FROM adopted WHERE k IN (1, 2)")
    assert cat.sql("SELECT count(*) AS n FROM adopted").first().n == 99
    got = cat.sql("SELECT v, name FROM adopted WHERE k = 7").first()
    assert (got.v, got.name) == (14.0, "u7")
    # v1 still reads the adopted files
    assert cat.sql(
        "SELECT count(*) AS n FROM adopted VERSION AS OF 1"
    ).first().n == 100

    # refusals: double-convert, duplicate keys, unknown key column
    with _pytest.raises(ValueError, match="already holds"):
        cat.sql(f"CONVERT TO TXLOG a2 LOCATION '{loc}' CLUSTERED BY (k)")
    loc2 = str(tmp_path / "dups")
    spark.sql(
        "SELECT 1 AS k, 1.0 AS x UNION ALL SELECT 1, 2.0"
    ).write.parquet(loc2)
    with _pytest.raises(ValueError, match="duplicate key"):
        cat.sql(f"CONVERT TO TXLOG d LOCATION '{loc2}' CLUSTERED BY (k)")
    with _pytest.raises(ValueError, match="key column"):
        cat.sql(f"CONVERT TO TXLOG d LOCATION '{loc2}' CLUSTERED BY (nope)")
