"""SQL surface for transaction-log tables: snapshot + time travel
through ``spark.sql`` (VERDICT r8 Next #5).

A real user's first attempt at a table format is

    spark.sql("SELECT ... FROM orders VERSION AS OF 3")

Spark only parses ``VERSION AS OF`` into a resolvable relation for
DSv2 catalog tables, and the PySpark 4 Python DataSource API (which
``format("txlog")`` is built on, `txlog_source.py`) has no catalog
plugin hook — a Python process cannot register a JVM `TableCatalog`.
So the SQL ergonomics layer is an explicit, documented shim:

* ``register(name, root)`` publishes the table's LATEST snapshot as a
  temp view ``name`` (re-resolved against the newest manifest on every
  execution — the reader loads the manifest per scan, so new commits
  are visible without re-registering);
* ``sql(query)`` rewrites ``<name> VERSION AS OF <n>`` (and the
  ``FOR SYSTEM_VERSION AS OF <n>`` spelling) into per-version temp
  views backed by ``option("version", n)`` reads, then hands the
  rewritten text to ``spark.sql``. Rewrites touch ONLY registered
  names, so arbitrary SQL passes through byte-identical.

Everything downstream is the ordinary txlog DataSource scan: manifest
schema, one input partition per surviving file, zone-map/bloom
pushdown via Spark's own ``pushFilters`` — the shim adds parsing
sugar, never a second execution path. At 100 TB the per-version views
cost one manifest read each; data files are only opened by the scan
itself.

No reference analog (the reference delegates storage to PostgreSQL);
this is the "table format speaks SQL time travel" leg of the
Delta/Iceberg story (`DeltaCatalog` / Iceberg's `SparkCatalog`),
re-expressed within what a pure-Python engine can register.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .txlog_source import TxlogDataSource, _load_manifest

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
# `<name> VERSION AS OF <n>` or `<name> FOR [SYSTEM_]VERSION AS OF <n>`
_TRAVEL = re.compile(
    rf"\b({_IDENT})\s+(?:FOR\s+)?(?:SYSTEM_)?VERSION\s+AS\s+OF\s+(\d+)",
    re.IGNORECASE,
)
# `<name> TIMESTAMP AS OF '<ts>'` / `<name> FOR SYSTEM_TIME AS OF '<ts>'`
_TRAVEL_TS = re.compile(
    rf"\b({_IDENT})\s+(?:FOR\s+)?(?:SYSTEM_TIME|TIMESTAMP)\s+AS\s+OF\s+"
    r"'([^']+)'",
    re.IGNORECASE,
)
# restricted MERGE INTO (the Delta simple-merge / source-wins form):
#   MERGE INTO <target> USING <source> [AS alias] ON <equi-keys>
#   WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
_MERGE = re.compile(
    rf"^\s*MERGE\s+INTO\s+({_IDENT})\s+(?:AS\s+)?(?:({_IDENT})\s+)?"
    rf"USING\s+({_IDENT})\s+(?:AS\s+)?(?:({_IDENT})\s+)?"
    r"ON\s+(.*?)\s+"
    r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+"
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ON_EQ = re.compile(
    rf"({_IDENT})\s*\.\s*({_IDENT})\s*=\s*({_IDENT})\s*\.\s*({_IDENT})"
)


class TxlogSqlCatalog:
    """Name -> table-root registry exposing txlog tables to SQL text,
    snapshot and time travel included. One instance per SparkSession;
    view names are plain temp views, so they compose with every other
    registered view (testdata tables, CTEs, joins across versions)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.roots: dict[str, str] = {}
        spark.dataSource.register(TxlogDataSource)
        # the reader implements pushFilters, which Spark refuses to
        # plan unless the session opts in; set-and-leave (views plan
        # at execution time, after any registering function returns)
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")

    # -- registration -------------------------------------------------------
    def register(self, name: str, root: str) -> None:
        """Publish the LATEST snapshot of the table at ``root`` as temp
        view ``name``. The Python DataSource pins the manifest when the
        view is created, so ``sql()`` transparently re-registers the
        latest view of every referenced table before parsing — direct
        ``spark.sql`` users see the version current as of the last
        ``register``/``sql`` call."""
        if not re.fullmatch(_IDENT, name):
            raise ValueError(f"txlog catalog: invalid table name {name!r}")
        self.roots[name] = root
        self.spark.read.format("txlog").load(root).createOrReplaceTempView(
            name
        )

    def snapshot(self, name: str, version: int | None = None) -> DataFrame:
        """DataFrame of one version (latest when ``version`` is None) —
        the programmatic twin of the SQL surface."""
        root = self._root(name)
        reader = self.spark.read.format("txlog")
        if version is not None:
            reader = reader.option("version", int(version))
        return reader.load(root)

    def versions(self, name: str) -> list[int]:
        """Committed version numbers of a registered table (ascending)."""
        import os

        log = os.path.join(self._root(name), "_txlog")
        return sorted(
            int(n.split(".")[0])
            for n in os.listdir(log)
            if n.endswith(".json") and not n.startswith(".")
        )

    def _root(self, name: str) -> str:
        if name not in self.roots:
            raise KeyError(
                f"txlog catalog: {name!r} is not registered "
                f"(known: {sorted(self.roots)})"
            )
        return self.roots[name]

    # -- SQL with time travel ------------------------------------------------
    def _travel_view(self, name: str, version: int) -> str:
        """Materialize (idempotently) the temp view serving one pinned
        version and return its view name. Manifests are immutable, so
        the view never goes stale; re-creating it is a no-op."""
        root = self._root(name)
        # fail fast with a catalog-level error instead of a deep scan
        # error when the version was never committed / already expired
        _load_manifest(root, str(version))
        view = f"{name}__v{int(version)}"
        (
            self.spark.read.format("txlog")
            .option("version", int(version))
            .load(root)
            .createOrReplaceTempView(view)
        )
        return view

    def version_as_of(self, name: str, ts: "str | float") -> int:
        """Newest committed version whose commit stamp is <= ``ts``
        (Delta TIMESTAMP AS OF semantics). ``ts`` is an ISO string or
        an epoch-seconds float; manifests predating the commit stamp
        fall back to the manifest file's mtime."""
        import datetime as dt
        import os

        if isinstance(ts, str):
            at = dt.datetime.fromisoformat(ts).timestamp()
        else:
            at = float(ts)
        root = self._root(name)
        log = os.path.join(root, "_txlog")
        best = None
        for v in self.versions(name):
            snap = _load_manifest(root, str(v))
            stamp = snap.get("committed_at")
            if stamp is None:
                stamp = os.path.getmtime(
                    os.path.join(log, f"{v:08d}.json")
                )
            if float(stamp) <= at:
                best = v
        if best is None:
            raise ValueError(
                f"txlog catalog: {name!r} has no version committed at "
                f"or before {ts!r} (earliest is after it)"
            )
        return best

    def history(self, name: str) -> DataFrame:
        """``DESCRIBE HISTORY`` analog: one row per committed version —
        (version, committed_at, n_files, n_rows, n_deleted, n_buckets)
        — computed from the manifests alone (control-plane sized, no
        data file opened). ``committed_at`` is NULL for manifests
        predating the commit stamp; ``n_rows`` is the LIVE row count
        (recorded footer counts minus deletion-vector popcounts),
        NULL for pre-rows manifests."""
        import datetime as dt

        root = self._root(name)
        out = []
        for v in self.versions(name):
            snap = _load_manifest(root, str(v))
            rows = snap.get("rows")
            dv = snap.get("dv", {})
            n_deleted = sum(
                int(e.get("n", 0)) for e in dv.values() if e
            )
            n_rows = (
                sum(int(rows.get(f, 0)) for f in snap["files"]) - n_deleted
                if rows is not None
                else None
            )
            stamp = snap.get("committed_at")
            out.append(
                (
                    v,
                    dt.datetime.fromtimestamp(stamp) if stamp else None,
                    len(snap["files"]),
                    n_rows,
                    n_deleted,
                    snap.get("num_buckets"),
                )
            )
        return self.spark.createDataFrame(
            out,
            "version int, committed_at timestamp, n_files int, "
            "n_rows long, n_deleted long, n_buckets int",
        )

    def merge_into(self, target: str, source_df: DataFrame) -> DataFrame:
        """Programmatic MERGE INTO (source-wins upsert) against a
        registered table: keys and bucket modulus come from the
        table's recorded contract, concurrency from the format's CAS
        machinery. Returns a 1-row metrics frame (Delta-style)."""
        from ..formats import TransactionLogFormat

        root = self._root(target)
        snap = _load_manifest(root, None)
        keys, num_buckets = snap.get("keys"), snap.get("num_buckets")
        if not keys or not num_buckets:
            raise ValueError(
                f"txlog catalog: {target!r} records no key/bucket "
                f"contract; MERGE INTO needs both"
            )
        fmt = TransactionLogFormat()
        handle = _TableHandle(self.spark, root)
        n_source = source_df.count()
        fmt.merge_source_wins(
            handle, target, source_df, list(keys), int(num_buckets)
        )
        self.register(target, root)  # latest view reflects the merge
        new_version = _load_manifest(root, None)["version"]
        return self.spark.createDataFrame(
            [(n_source, int(new_version))],
            "num_source_rows long, table_version long",
        )

    def sql(self, query: str) -> DataFrame:
        """``spark.sql`` with txlog extensions for registered tables:

        * ``<name> VERSION AS OF <n>`` / ``<name> TIMESTAMP AS OF
          '<ts>'`` (also the ``FOR SYSTEM_VERSION/SYSTEM_TIME``
          spellings) rewrite to pinned-version temp views;
        * ``MERGE INTO <name> USING <view> ON <keys> WHEN MATCHED THEN
          UPDATE SET * WHEN NOT MATCHED THEN INSERT *`` executes the
          format's source-wins transactional merge and returns a
          metrics frame;
        * everything else passes through to ``spark.sql`` untouched
          (unregistered names included)."""
        m = _MERGE.match(query)
        if m and m.group(1) in self.roots:
            return self._sql_merge(m)
        dh = re.match(
            rf"^\s*DESCRIBE\s+HISTORY\s+({_IDENT})\s*;?\s*$",
            query,
            re.IGNORECASE,
        )
        if dh and dh.group(1) in self.roots:
            return self.history(dh.group(1))

        def repl(mt: re.Match) -> str:
            name, version = mt.group(1), int(mt.group(2))
            if name not in self.roots:
                return mt.group(0)  # not ours: leave for Spark to judge
            return self._travel_view(name, version)

        def repl_ts(mt: re.Match) -> str:
            name, ts = mt.group(1), mt.group(2)
            if name not in self.roots:
                return mt.group(0)
            return self._travel_view(name, self.version_as_of(name, ts))

        rewritten = _TRAVEL.sub(repl, query)
        rewritten = _TRAVEL_TS.sub(repl_ts, rewritten)
        # refresh the LATEST view of every referenced table: the
        # DataSource pins its manifest at view creation, so a commit
        # since then would otherwise be invisible (one manifest-JSON
        # read per referenced table — control-plane sized)
        for name, root in self.roots.items():
            if re.search(rf"\b{name}\b", rewritten):
                self.register(name, root)
        return self.spark.sql(rewritten)

    def _sql_merge(self, m: re.Match) -> DataFrame:
        """Execute a parsed MERGE INTO statement. The ON clause must be
        a conjunction of equality predicates pairing the SAME column
        name across the two aliases, and that column set must equal the
        table's recorded merge keys — anything else is rejected loudly
        (the restricted grammar IS the contract; a silently-narrowed
        MERGE would corrupt data)."""
        target, t_alias, source, s_alias, cond = (
            m.group(1), m.group(2), m.group(3), m.group(4), m.group(5),
        )
        aliases = {target, source}
        if t_alias:
            aliases.add(t_alias)
        if s_alias:
            aliases.add(s_alias)
        stripped = _ON_EQ.sub("", cond)
        if re.sub(r"(?i)\bAND\b|\s", "", stripped):
            raise ValueError(
                f"MERGE INTO: unsupported ON clause {cond!r} — only "
                f"AND-ed equality predicates on the merge keys are "
                f"supported"
            )
        keys = set()
        for qa, ca, qb, cb in _ON_EQ.findall(cond):
            if ca != cb or qa not in aliases or qb not in aliases:
                raise ValueError(
                    f"MERGE INTO: ON pairs different columns "
                    f"({qa}.{ca} = {qb}.{cb}); only same-named key "
                    f"equality is supported"
                )
            keys.add(ca)
        snap = _load_manifest(self._root(target), None)
        recorded = set(snap.get("keys") or [])
        if keys != recorded:
            raise ValueError(
                f"MERGE INTO: ON keys {sorted(keys)} != the table's "
                f"recorded merge keys {sorted(recorded)}"
            )
        return self.merge_into(target, self.spark.table(source))


class _TableHandle:
    """Minimal Warehouse-shaped adapter for one table root: the format
    methods only need ``.spark`` and ``.path(table) -> root``, and the
    catalog addresses tables by root, not by warehouse layout."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self._root = root

    def path(self, table: str) -> str:
        return self._root
