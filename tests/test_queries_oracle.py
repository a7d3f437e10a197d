"""Registered queries hash-match their DuckDB oracle at sf0.001.

This is the same gate the driver applies at sf0.01 (CORRECTNESS_r{N});
running it in CI at the smallest SF keeps the loop fast.

Default scope (VERDICT r14 "Next round" #2: the 240-query sweep outgrew
the driver's pytest budget — the r14 driver run was cut off at ~69% with
zero failures): the DRIVER WINDOW (first ``DRIVER_WINDOW`` entries of
``REGISTRY_ORDER`` — exactly the slice the driver itself gates on, which
by standing policy includes every query whose oracle or implementation
changed this round). The FULL 240-query sweep still runs on demand:

    SPARK_GRAFT_FULL_ORACLE=1 python -m pytest tests/test_queries_oracle.py

and is what ``scripts/verify_local.py`` (the round-close gate) executes
at sf0.01 regardless of this default. Plan invariants over all 240
queries stay in the default run via tests/test_plans.py.
"""

from __future__ import annotations

import os

import pytest

from instagram_data_pipeline_spark.queries import DRIVER_WINDOW, load_all
from instagram_data_pipeline_spark.testing import compare_to_oracle, duck_connection

REGISTRY = load_all()

_FULL = os.environ.get("SPARK_GRAFT_FULL_ORACLE") == "1"
# load_all() returns REGISTRY_ORDER order, so the first DRIVER_WINDOW
# names ARE the driver's check window
_NAMES = sorted(REGISTRY) if _FULL else list(REGISTRY)[:DRIVER_WINDOW]


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", _NAMES)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    sdf = spec.spark_fn(spark, sf_dir)
    if spec.oracle is None:
        # rows-only contract: must at least run and return a stable schema
        assert sdf.columns
        sdf.collect()
        return
    problems = compare_to_oracle(sdf, duck, spec.oracle)
    assert not problems, f"{name}: {problems}"


def test_nested_output_guard_catches_array_column(spark):
    """Seeded negative: the harness-faithfulness guard must reject an
    ARRAY-valued output column the way the driver's pandas canonicalizer
    would (VERDICT r5 #1)."""
    from instagram_data_pipeline_spark.testing import nested_output_columns

    df = spark.sql("SELECT 1 AS id, array(1.0, 2.0) AS projected")
    assert nested_output_columns(df) == ["projected"]
    import duckdb

    con = duckdb.connect()
    problems = compare_to_oracle(
        df, con, "SELECT 1 AS id, [1.0, 2.0] AS projected"
    )
    assert problems and "nested" in problems[0]
