"""Table IO: a Parquet-backed warehouse with a typed table registry.

The reference delegated storage to PostgreSQL (psycopg2 call sites across
``instagram_scraper.py`` / ``interest_analyzer.py``); here every table is a
directory of Parquet files and every read goes through an explicit schema
from :mod:`schemas`. Views are registered so both the DataFrame and SQL
APIs see the same catalog.

Scale notes (100 TB):
* Big fact/edge tables should be written ``partitionBy`` a coarse key
  (e.g. date for ledgers, hash-bucket for edges) so partition pruning
  works; ``Warehouse.write`` exposes that.
* Overwrites of small control tables (ledger, dims) are cheap; the big
  tables are append-only + compaction — the upsert protocols in
  ``operators/writes.py`` are designed so the *per-batch* work is an
  anti-join against only the touched partitions.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .schemas import REFERENCE_TABLES, TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table with its declared schema.

    ``events.ts`` has shipped in two physical encodings across driver
    testdata generations: parquet TIMESTAMP(NANOS) — which Spark's reader
    rejects outright, so we read it as raw nanos
    (``spark.sql.legacy.parquet.nanosAsLong`` — runtime-settable) and
    rebuild an exact micros timestamp with integer division (``DIV`` —
    float division would lose precision above 2^53 ns) — and plain
    TIMESTAMP(MICROS) without UTC adjustment, which Spark surfaces as
    TIMESTAMP_NTZ. We dispatch on the loaded dtype and normalize both to
    a session-TZ (UTC) ``timestamp`` so every downstream operator sees
    one type.
    """
    path = str(Path(sf_dir) / f"{name}.parquet")
    # Queries may run inside a caller-owned session (the driver's);
    # timestamp semantics must not depend on that session's timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(path)
        ts_type = dict(raw.dtypes).get("ts")
        if ts_type == "bigint":  # legacy nanos-as-long encoding
            return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        if ts_type != "timestamp":  # timestamp_ntz: wall clock is UTC
            return raw.withColumn("ts", F.col("ts").cast("timestamp"))
        return raw
    schema = TESTDATA_TABLES.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def _bytes_conf(spark: SparkSession, key: str, default: int) -> int:
    """Byte-suffixed Spark conf value ("128m", "4194304") as an int."""
    raw = spark.conf.get(key, None)
    if raw is None:
        return default
    try:
        return int(raw)
    except ValueError:
        return int(
            spark._jvm.org.apache.spark.network.util.JavaUtils
            .byteStringAsBytes(raw)
        )


def _scan_width(df: DataFrame, target: int) -> int:
    """Estimated scan-task count for ``df``'s file sources WITHOUT
    materializing the RDD lineage (VERDICT r14 #3: ``df.rdd`` forces a
    full plan-to-RDD translation per call; on a real object store that
    repeats the file listing). ``df.inputFiles()`` reads the already-
    materialized FileIndex; sizes are fetched only when the file count
    alone can't decide (fewer files than ``target`` — a bounded number
    of getFileStatus calls), then run through Spark's own split math
    (maxSplitBytes = min(maxPartitionBytes, max(openCost, bytes/core)))."""
    files = df.inputFiles()
    if not files:
        # not file-backed (literal/constructed frame): nothing to probe;
        # report "already wide" so the caller never adds an exchange
        return target
    if len(files) >= target:
        return len(files)  # >= 1 task per file: already machine-wide
    spark = df.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    sizes = []
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        sizes.append(p.getFileSystem(conf).getFileStatus(p).getLen())
    open_cost = _bytes_conf(
        spark, "spark.sql.files.openCostInBytes", 4 * 1024 * 1024
    )
    max_pb = _bytes_conf(
        spark, "spark.sql.files.maxPartitionBytes", 128 * 1024 * 1024
    )
    total = sum(sizes) + len(sizes) * open_cost
    max_split = min(max_pb, max(open_cost, total // max(1, target)))
    return max(1, -(-total // max(1, max_split)))  # ceil


def spread_small_scan(
    df: DataFrame, key: str | None = None, parts: int | None = None
) -> DataFrame:
    """Buy back scan parallelism lost to an unsplittable input (guide
    §2.5 "one huge unsplittable file": the driver testdata ships each
    table as ONE single-row-group parquet file, so every scan is one
    task no matter the split config). If the scan already yields at
    least ``parts`` input splits — any real at-scale table — this is a
    NO-OP costing one FileIndex lookup (no RDD translation, no extra
    listing); only a narrower-than-the-machine scan pays one exchange to
    spread the downstream per-row work across cores. ``key``
    hash-partitions (no pre-shuffle sort); keyless round-robin pays a
    local sort-before-repartition for retry determinism (SPARK-23207)."""
    spark = df.sparkSession
    target = parts or spark.sparkContext.defaultParallelism
    if _scan_width(df, target) >= target:
        return df
    if key is not None:
        import pyspark.sql.functions as F

        return df.repartition(target, F.col(key))
    return df.repartition(target)


def register_testdata_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the handles."""
    out = {}
    for name in TESTDATA_TABLES:
        df = load_testdata(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    **options,
) -> DataFrame:
    """Format-agnostic source reader (SURVEY §2.1: the rebuild
    standardizes on Parquet; CSV/JSON/ORC supported for ingest
    boundaries). Schema is explicit for text formats — inference is a
    full extra pass and non-deterministic under dirty data."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.format(fmt).options(**options).load(path)


def write_sink(
    df: DataFrame,
    path: str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Format-agnostic sink (S8).

    ``fmt="jdbc"`` is the reference's PostgreSQL target
    (instagram_scraper.py:194-218): pass ``url`` and ``dbtable`` plus any
    connection properties (user/password/driver) as options; ``path`` is
    unused for JDBC. Connection properties are injected by the caller —
    the engine never hardcodes an endpoint. Writes go through Spark's
    JDBC datasource (one connection per partition; ``numPartitions``
    caps the fan-in; ``batchsize`` controls rows per INSERT batch).
    """
    if fmt == "jdbc":
        missing = {"url", "dbtable"} - set(options)
        if missing:
            raise ValueError(f"jdbc sink requires options {sorted(missing)}")
        df.write.mode(mode).format("jdbc").options(**options).save()
        return
    if path is None:
        raise ValueError(f"{fmt} sink requires a path")
    writer = df.write.mode(mode).format(fmt).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)


class JdbcBatchSink:
    """foreachBatch-compatible relational sink (S8 + S9).

    The reference commits scraped rows to PostgreSQL in small batches
    with INSERT ... ON CONFLICT (instagram_scraper.py:194-218, 282-302);
    in Structured Streaming the micro-batch is the commit unit. Each
    batch goes through Spark's JDBC datasource in append mode, or — when
    ``execute`` is injected — to a caller-supplied
    ``execute(batch_df, epoch_id)`` where a dialect-specific upsert (or a
    test double, in driverless environments) owns the transaction.

    Replayed epoch_ids are skipped, and an epoch is fenced only AFTER its
    write succeeds — a failed write leaves the epoch unfenced so the
    retry re-runs it (fencing before the write would silently drop the
    batch). Scope of the guarantee: within-process, same-instance dedup
    only — the fence set is in memory, so a process restart replays the
    last in-flight epoch; cross-restart exactly-once needs the sink-side
    transaction (idempotent upsert keyed on epoch, or a transactional
    table format).
    """

    def __init__(
        self,
        url: str | None = None,
        table: str | None = None,
        properties: dict | None = None,
        execute=None,
    ):
        if execute is None and (url is None or table is None):
            raise ValueError("JdbcBatchSink needs url+table or an execute callable")
        self.url = url
        self.table = table
        self.properties = dict(properties or {})
        self.execute = execute
        self.epochs: set[int] = set()

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id in self.epochs:
            return
        if self.execute is not None:
            self.execute(batch_df, epoch_id)
        else:
            (
                batch_df.write.mode("append")
                .format("jdbc")
                .option("url", self.url)
                .option("dbtable", self.table)
                .options(**self.properties)
                .save()
            )
        # fence only after the write succeeded: a throw above leaves the
        # epoch unfenced so Structured Streaming's retry re-executes it
        self.epochs.add(epoch_id)


def hadoop_rm(spark: SparkSession, path: str) -> None:
    """Recursive delete through the Hadoop FileSystem API — works on any
    Spark-supported filesystem (HDFS/S3A/local), unlike ``shutil`` which
    only touches the local FS."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Catalog-managed bucketed table: joins/aggs on the bucket columns
    read co-located buckets with NO exchange (verified in tests by plan
    inspection). This is the 100 TB layout for the edge tables — bucket
    both `followers` and `following` by user_id and the flagship mutuals
    join becomes shuffle-free.

    ``path`` makes the table external (data at the given location
    instead of the session warehouse dir) — required when the caller
    doesn't own the session's warehouse config, e.g. inside registered
    queries running under the driver's vanilla session."""
    writer = df.write.mode("overwrite").bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


class Warehouse:
    """Parquet warehouse for the reference-shaped tables.

    Mirrors ``database/setup.py:27-127``: ``ensure_tables`` is the
    idempotent DDL analog (creates empty tables that don't exist yet).
    """

    def __init__(self, spark: SparkSession, root: str, fmt=None):
        from .formats import ParquetPartitionedFormat

        self.spark = spark
        self.root = Path(root)
        # table-format seam (SURVEY §7 risk 1): the A1 MERGE path
        # delegates to a TableFormat so a transactional backend
        # (formats.TransactionLogFormat, or real Delta/Iceberg) replaces
        # the plain-parquet emulation without touching callers
        self.fmt = fmt or ParquetPartitionedFormat()

    def path(self, table: str) -> str:
        return str(self.root / table)

    def exists(self, table: str) -> bool:
        p = Path(self.path(table))
        return p.exists() and any(p.iterdir())

    def ensure_tables(self, tables: dict[str, T.StructType] | None = None) -> None:
        """CREATE TABLE IF NOT EXISTS analog (setup.py:27-127)."""
        for name, schema in (tables or REFERENCE_TABLES).items():
            if not self.exists(name):
                empty = self.spark.createDataFrame([], schema)
                empty.write.mode("overwrite").parquet(self.path(name))

    def read(self, table: str) -> DataFrame:
        schema = REFERENCE_TABLES.get(table)
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(self.path(table))

    def write(
        self,
        table: str,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(table))

    def overwrite_atomic(self, table: str, df: DataFrame) -> None:
        """Replace a table's contents via temp-path swap.

        Parquet overwrite deletes before it writes, so a plan that reads
        the same table it overwrites would race its own input. Materialize
        to ``<table>.tmp`` first, then swap.

        "Atomic" here means atomic *with respect to the plan's own reads*,
        NOT crash-atomic: a failure between the staged write and the final
        overwrite (or mid-overwrite) leaves the table partially rewritten.
        Plain Parquet has no commit protocol — a transactional table
        format (Delta/Iceberg, whose MERGE/REPLACE is the real form of
        this operation) is the production answer; this is the documented
        no-table-format stand-in.
        """
        tmp = self.path(table) + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.path(table))
        # best-effort cleanup of the temp copy (FS-agnostic)
        try:
            hadoop_rm(self.spark, tmp)
        except Exception:
            pass

    def register_views(self) -> None:
        for name in REFERENCE_TABLES:
            if self.exists(name):
                self.read(name).createOrReplaceTempView(name)

    # -- A1 at scale: partition-scoped MERGE on plain parquet -------------
    BUCKET_COL = "_kb"

    def upsert_partitioned(
        self,
        table: str,
        incoming: DataFrame,
        keys: list[str],
        order_col: str,
        num_buckets: int = 64,
        txn: tuple[str, int] | None = None,
    ) -> None:
        """Partition-scoped upsert-keep-newest: the A1 MERGE.

        The incoming batch's keys hash to ``num_buckets`` buckets, so
        the slices the batch touches are computable from the batch
        alone: only those are read, merged via ``upsert_keep_newest``,
        and rewritten — a batch touching b buckets costs b/num_buckets
        of the table instead of all of it, which is what makes
        per-batch merges viable at 100 TB.

        Delegates to the :class:`~.formats.TableFormat` this Warehouse
        was built with: the default parquet backend rewrites bucket
        partitions in place (atomic w.r.t. the plan's own reads, NOT
        crash-atomic); ``formats.TransactionLogFormat`` commits the same
        merge through a versioned manifest with one atomic rename
        (crash-atomic, Delta/Iceberg-style). Same signature, same
        semantics, same tests — pick per deployment.

        ``txn=(app_id, version)`` makes the merge IDEMPOTENT on the
        transaction-log backend (the Delta txnAppId/txnVersion
        design): a merge whose version is <= the app's last recorded
        version is a silent no-op — exactly what a foreachBatch
        streaming sink passes (query_id, batch_id) to get
        exactly-once MERGE semantics under Spark's replay-on-failure
        contract. The plain-parquet backend has no manifest to record
        transactions in and rejects the option.
        """
        if txn is not None:
            self.fmt.merge(
                self, table, incoming, keys, order_col, num_buckets,
                txn=txn,
            )
        else:
            self.fmt.merge(
                self, table, incoming, keys, order_col, num_buckets
            )

    def overwrite_partitions(
        self, table: str, df: DataFrame, part_col: str
    ) -> None:
        """Two-phase dynamic-partition overwrite: stage ``df`` to a tmp
        path (the final overwrite would otherwise delete the files the
        plan is reading), then rewrite ONLY the partitions present in
        ``df`` — untouched partition directories are left as-is.

        NOT crash-atomic: a failure between the staged write and the
        final overwrite, or mid-overwrite, can leave some touched
        partitions rewritten and others stale. Plain Parquet has no
        multi-file commit protocol; Delta/Iceberg MERGE is the
        transactional form. Cleanup goes through the Hadoop FileSystem
        API so the tmp path may live on any supported FS, not just the
        local disk.
        """
        tmp = self.path(table) + ".merge.tmp"
        df.write.mode("overwrite").parquet(tmp)
        staged = self.spark.read.parquet(tmp)
        prev = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        self.spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        try:
            staged.write.mode("overwrite").partitionBy(part_col).parquet(
                self.path(table)
            )
        finally:
            self.spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )
        try:
            hadoop_rm(self.spark, tmp)
        except Exception:
            pass

    def read_merged(self, table: str) -> DataFrame:
        """Read a table maintained by ``upsert_partitioned`` without the
        internal bucket column (format-dispatched)."""
        return self.fmt.read_merged(self, table)

    def partition_file_counts(self, table: str, part_col: str) -> dict:
        """{partition_value(str): n_parquet_files} via the Hadoop
        FileSystem API (works on HDFS/S3A/local alike). Driver-side cost
        is one listing per partition directory — the same metadata walk
        the parquet reader performs, bounded by partition count."""
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(self.path(table))
        fs = path.getFileSystem(conf)
        counts: dict[str, int] = {}
        if not fs.exists(path):
            return counts
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith(f"{part_col}=")):
                continue
            n = sum(
                1
                for f in fs.listStatus(st.getPath())
                if f.getPath().getName().endswith(".parquet")
            )
            counts[name.split("=", 1)[1]] = n
        return counts

    def compact_partitions(
        self,
        table: str,
        part_col: str | None = None,
        target_files: int = 1,
    ) -> list[str]:
        """Small-file compaction: rewrite only the partitions whose
        parquet file count exceeds ``target_files``, to exactly
        ``target_files`` files each. Returns the partition values
        compacted.

        Repeated partition-scoped upserts leave each touched partition
        with one file per merge — at 100 TB the scan cost becomes
        metadata/open-bound long before data-bound. The fix is the
        standard maintenance pass every table format ships (Delta
        OPTIMIZE / Iceberg rewrite_data_files), expressed on plain
        parquet:

        * the partition->file-count map comes from the FileSystem API
          (no data read);
        * only oversized partitions are READ (partition pruning) and
          rewritten, via ``repartition(part_col, salt)`` where the salt
          is a key hash mod ``target_files`` — each (partition, salt)
          group is one task, so each partition lands in exactly
          ``target_files`` files;
        * the rewrite goes through the same staged dynamic-partition
          overwrite as the upsert path (atomic w.r.t. this plan's own
          reads; crash-atomicity needs a real table format).
        """
        from pyspark.sql import functions as F

        part_col = part_col or self.BUCKET_COL
        counts = self.partition_file_counts(table, part_col)
        todo = sorted(v for v, n in counts.items() if n > target_files)
        if not todo:
            return []
        df = self.spark.read.parquet(self.path(table))
        part_type = df.schema[part_col].dataType
        touched = [F.lit(v).cast(part_type) for v in todo]
        scoped = df.filter(F.col(part_col).isin(*touched))
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns if c != part_col]),
            F.lit(target_files),
        )
        compacted = (
            scoped.withColumn("_salt", salt)
            .repartition(part_col, "_salt")
            .drop("_salt")
        )
        self.overwrite_partitions(table, compacted, part_col)
        return todo
