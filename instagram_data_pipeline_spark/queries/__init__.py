"""Query registry: every operator exposed as a named (spark_fn, oracle_sql)
pair over the driver testdata tables.

``spark_fn(spark, sf_dir) -> DataFrame`` is the engine's DataFrame-API
implementation; ``oracle`` is the equivalent ANSI SQL DuckDB runs on the
same parquet (None for ops SQL can't express — the driver then records a
rows-only check). Column names/aliases MUST match between the two sides.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: Optional[str], doc: str = "", tags: tuple[str, ...] = ()
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc, tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so the registry is populated."""
    from . import core  # noqa: F401
    from . import extensions  # noqa: F401
    from . import ledger  # noqa: F401
    from . import model  # noqa: F401
    from . import temporal  # noqa: F401
    from . import text  # noqa: F401

    return REGISTRY
