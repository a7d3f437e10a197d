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

    def sql(self, query: str) -> DataFrame:
        """``spark.sql`` with ``VERSION AS OF`` support for registered
        txlog tables: each ``<name> VERSION AS OF <n>`` occurrence is
        rewritten to a pinned-version temp view (created on demand);
        unregistered names and the rest of the text pass through
        untouched."""

        def repl(m: re.Match) -> str:
            name, version = m.group(1), int(m.group(2))
            if name not in self.roots:
                return m.group(0)  # not ours: leave for Spark to judge
            return self._travel_view(name, version)

        rewritten = _TRAVEL.sub(repl, query)
        # refresh the LATEST view of every referenced table: the
        # DataSource pins its manifest at view creation, so a commit
        # since then would otherwise be invisible (one manifest-JSON
        # read per referenced table — control-plane sized)
        for name, root in self.roots.items():
            if re.search(rf"\b{name}\b", rewritten):
                self.register(name, root)
        return self.spark.sql(rewritten)
