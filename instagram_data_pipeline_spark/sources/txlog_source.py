"""The transaction-log table as a first-class Spark data source.

``spark.dataSource.register(TxlogDataSource)`` then
``spark.read.format("txlog").load(<table root>)`` reads any
:class:`~..formats.TransactionLogFormat` table — snapshot or time
travel (``option("version", N)``) — through the PySpark 4 Python
DataSource API, with **Spark's own filter pushdown driving the
manifest's statistics**: ``pushFilters`` receives the query's
conjuncts and prunes the file list with the same zone-map range
overlap and bloom membership tests ``read_for_range`` /
``read_for_value`` run, then returns every filter back to Spark for
exact post-scan evaluation — pruning is lossy-safe by construction
(the parquet row-group-skipping contract: statistics drop files,
never rows).

Scale shape: one input partition per surviving data file (Spark
schedules them across executors; a 100 TB table scans as wide as its
file count), each read as Arrow RecordBatches. The format's NATIVE
read paths (``read_merged`` and friends — direct parquet scans inside
whole-stage codegen) remain the hot path; this source is the
interoperability surface, paying one Arrow marshalling hop for
``format("txlog")`` ergonomics and engine-driven pushdown.

No reference analog (the reference delegates storage to PostgreSQL);
this is the Delta/Iceberg "table format speaks DataSource" leg of the
format story.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from ..formats import BLOOM_KEY, _bloom_maybe_contains, _stat_key


def _load_manifest(root: str, version: str | None) -> dict:
    log = os.path.join(root, "_txlog")
    if version is not None:
        path = os.path.join(log, f"{int(version):08d}.json")
    else:
        names = sorted(
            n for n in os.listdir(log)
            if n.endswith(".json") and not n.startswith(".")
        )
        if not names:
            raise FileNotFoundError(f"no committed version under {log}")
        path = os.path.join(log, names[-1])
    with open(path) as f:
        return json.load(f)


class TxlogBatchReader(DataSourceReader):
    """One partition per surviving data file; pushFilters prunes the
    file list via manifest zone maps + blooms before planning."""

    #: bloom hash count must match the writer's (format default)
    BLOOM_HASHES = 7

    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.root = options.get("path")
        if not self.root:
            raise ValueError("txlog: .load(<table root>) path is required")
        self.snap = _load_manifest(self.root, options.get("version"))
        self.keep = sorted(self.snap["files"])

    # -- pushdown ---------------------------------------------------------
    def _prune_range(self, col: str, lo, hi) -> None:
        stats = self.snap.get("stats", {})
        lo_k = _stat_key(lo) if lo is not None else None
        hi_k = _stat_key(hi) if hi is not None else None
        if (lo is not None and lo_k is None) or (
            hi is not None and hi_k is None
        ):
            return  # un-keyable bound type: no pruning
        kept = []
        for f in self.keep:
            mm = stats.get(f, {}).get(col)
            if mm is None:
                kept.append(f)  # absent stats: conservatively keep
                continue
            if hi_k is not None and mm[0] > hi_k:
                continue
            if lo_k is not None and mm[1] < lo_k:
                continue
            kept.append(f)
        self.keep = kept

    def _prune_bloom(self, col: str, value) -> None:
        stats = self.snap.get("stats", {})
        kept = []
        for f in self.keep:
            b64 = stats.get(f, {}).get(BLOOM_KEY, {}).get(col)
            if b64 is None or _bloom_maybe_contains(
                b64, value, self.BLOOM_HASHES
            ):
                kept.append(f)
        self.keep = kept

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:
                continue
            col = attr[0]
            if isinstance(f, EqualTo):
                self._prune_bloom(col, f.value)
                self._prune_range(col, f.value, f.value)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                # zone maps are closed intervals: the open/closed
                # distinction only ever keeps one extra boundary file
                self._prune_range(col, f.value, None)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                self._prune_range(col, None, f.value)
        # statistics pruning is approximate (blooms have false
        # positives, zone maps are ranges): EVERY filter goes back to
        # Spark for exact evaluation — files are dropped, rows never
        return filters

    # -- scan --------------------------------------------------------------
    def partitions(self):
        return [InputPartition(f) for f in self.keep] or [
            InputPartition(None)  # fully pruned: one empty partition
        ]

    def read(self, partition: InputPartition):
        if partition.value is None:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.schema)
        target = pa.schema([f.with_nullable(True) for f in target])
        path = os.path.join(self.root, partition.value)
        avail = set(pq.ParquetFile(path).schema_arrow.names)
        table = pq.read_table(
            path, columns=[n for n in target.names if n in avail]
        )
        # additive schema evolution: null-fill columns this (older)
        # file doesn't physically carry, then cast to the manifest
        # schema's arrow types (e.g. tz normalization on timestamps)
        cols = []
        for field in target:
            if field.name in table.column_names:
                cols.append(table.column(field.name))
            else:
                cols.append(pa.nulls(len(table), type=field.type))
        out = pa.table(dict(zip(target.names, cols))).cast(
            target, safe=False
        )
        yield from out.to_batches()


class TxlogDataSource(DataSource):
    """``format("txlog")``: batch reads of a TransactionLogFormat table
    with manifest-driven pushdown. Schema comes from the manifest the
    requested version recorded (time travel keeps its own schema)."""

    @classmethod
    def name(cls) -> str:
        return "txlog"

    def schema(self) -> StructType:
        snap = _load_manifest(
            self.options.get("path"), self.options.get("version")
        )
        if "schema" not in snap:
            raise ValueError(
                "txlog: manifest records no schema (pre-schema version)"
            )
        schema = StructType.fromJson(json.loads(snap["schema"]))
        # additive evolution null-fills older files, so every column is
        # honestly nullable through this surface
        for f in schema.fields:
            f.nullable = True
        return schema

    def reader(self, schema: StructType) -> TxlogBatchReader:
        return TxlogBatchReader(schema, dict(self.options))


# ---------------------------------------------------------------------------
# Streaming change feed: the transaction log as a readStream source
# ---------------------------------------------------------------------------

def _rows_by_key(root: str, snap: dict, buckets: set, keys: list[str]):
    """{key tuple: row dict} for the given buckets of one version —
    pure pyarrow, no Spark (this reader is driver-side control plane)."""
    import pyarrow.parquet as pq

    out: dict[tuple, dict] = {}
    for f, b in snap.get("files", {}).items():
        if b not in buckets:
            continue
        for row in pq.read_table(os.path.join(root, f)).to_pylist():
            out[tuple(row[k] for k in keys)] = row
    return out


def _cdf_tuples(
    root: str, keys: list[str], cols: list[str], v_from: int, v_to: int
):
    """Net change rows between two versions as schema-ordered tuples —
    the same classification changes_between runs in Spark (insert /
    delete / update pre+post, silent on identical re-writes), scoped to
    buckets whose file sets differ. ``v_from=0`` is the empty table."""
    empty = {"files": {}}
    snap_a = _load_manifest(root, str(v_from)) if v_from > 0 else empty
    snap_b = _load_manifest(root, str(v_to))
    by_a: dict[int, set] = {}
    by_b: dict[int, set] = {}
    for f, b in snap_a["files"].items():
        by_a.setdefault(b, set()).add(f)
    for f, b in snap_b["files"].items():
        by_b.setdefault(b, set()).add(f)
    changed = {
        b
        for b in (by_a.keys() | by_b.keys())
        if by_a.get(b, set()) != by_b.get(b, set())
    }
    old = _rows_by_key(root, snap_a, changed, keys)
    new = _rows_by_key(root, snap_b, changed, keys)
    vals = [c for c in cols if c not in keys and c != "_change_type"]

    def tup(tag: str, row: dict) -> tuple:
        return tuple(
            tag if c == "_change_type" else row.get(c) for c in cols
        )

    for k in old.keys() | new.keys():
        o, n = old.get(k), new.get(k)
        if o is None:
            yield tup("insert", n)
        elif n is None:
            yield tup("delete", o)
        elif any(o.get(c) != n.get(c) for c in vals):
            yield tup("update_preimage", o)
            yield tup("update_postimage", n)


class TxlogChangesStreamReader(SimpleDataSourceStreamReader):
    """Version-number offsets: each micro-batch emits the NET change
    rows between the last-seen and the current manifest version —
    exactly-once through Spark's offset log (readBetweenOffsets replays
    a batch deterministically from the immutable manifests). Net
    semantics per batch: a trigger spanning several versions collapses
    them (same end state, fewer intermediate images than a per-version
    replay). Driver-side by design — the SIMPLE stream-reader API is
    Spark's control-plane path; a bulk backfill belongs on the batch
    ``changes_between`` (distributed) inside foreachBatch."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self.root = options.get("path")
        if not self.root:
            raise ValueError("txlog_changes: path is required")
        keys = options.get("keys")
        if not keys:
            raise ValueError(
                "txlog_changes: option('keys', 'col1,col2') is required"
            )
        self.keys = [k.strip() for k in keys.split(",")]
        self.cols = schema.fieldNames()

    def _latest_version(self) -> int:
        log = os.path.join(self.root, "_txlog")
        names = sorted(
            n for n in os.listdir(log)
            if n.endswith(".json") and not n.startswith(".")
        )
        return int(names[-1].split(".")[0]) if names else 0

    def initialOffset(self) -> dict:
        return {"version": 0}

    def read(self, start: dict):
        latest = self._latest_version()
        v0 = int(start["version"])
        if latest <= v0:
            return iter(()), {"version": v0}
        return (
            iter(list(_cdf_tuples(self.root, self.keys, self.cols,
                                  v0, latest))),
            {"version": latest},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(_cdf_tuples(
            self.root, self.keys, self.cols,
            int(start["version"]), int(end["version"]),
        )))

    def commit(self, end: dict) -> None:
        pass  # manifests are immutable; nothing to release


class TxlogChangesDataSource(DataSource):
    """``readStream.format("txlog_changes")``: stream a transaction-log
    table's change feed (Delta CDF streaming-source analog). Schema =
    ``_change_type`` + the current manifest schema, all nullable."""

    @classmethod
    def name(cls) -> str:
        return "txlog_changes"

    def schema(self) -> StructType:
        from pyspark.sql.types import StringType, StructField

        snap = _load_manifest(self.options.get("path"), None)
        if "schema" not in snap:
            raise ValueError("txlog_changes: manifest records no schema")
        base = StructType.fromJson(json.loads(snap["schema"]))
        fields = [StructField("_change_type", StringType(), False)]
        for f in base.fields:
            f.nullable = True
            fields.append(f)
        return StructType(fields)

    def simpleStreamReader(
        self, schema: StructType
    ) -> TxlogChangesStreamReader:
        return TxlogChangesStreamReader(schema, dict(self.options))
