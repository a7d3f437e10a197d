"""Connected components: planted-component recovery, convergence,
determinism."""

from __future__ import annotations

from instagram_data_pipeline_spark.operators.graph import (
    component_sizes,
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df)
    return {r.node: r.component for r in out.collect()}


def test_cc_two_chains_and_isolated_pair(spark):
    # chain 1-2-3-4, chain 10-11, edge 20-21; direction mixed on purpose
    got = _cc(spark, [(1, 2), (3, 2), (3, 4), (11, 10), (20, 21)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_cc_merged_rings_and_self_loop(spark):
    # two rings joined by a bridge + a self loop (ignored)
    ring1 = [(1, 2), (2, 3), (3, 1)]
    ring2 = [(7, 8), (8, 9), (9, 7)]
    got = _cc(spark, ring1 + ring2 + [(3, 7), (5, 5)])
    assert {got[n] for n in (1, 2, 3, 7, 8, 9)} == {1}
    assert 5 not in got  # pure self-loop node never enters the graph


def test_cc_long_chain_converges(spark):
    # diameter 15 chain: needs multiple rounds, still converges exactly
    edges = [(i, i + 1) for i in range(15)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 16


def test_cc_deterministic_and_sizes(spark):
    edges = [(i, i % 5) for i in range(5, 40)]  # 5 stars
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, connected_components(df).collect()))
    b = sorted(map(tuple, connected_components(df).collect()))
    assert a == b
    sizes = {
        r.component: r.n_nodes
        for r in component_sizes(connected_components(df)).collect()
    }
    assert sizes == {0: 8, 1: 8, 2: 8, 3: 8, 4: 8}
