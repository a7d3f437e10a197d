"""Training-shard export: layout determinism, file-per-shard writes,
manifest integrity."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from instagram_data_pipeline_spark.extensions.export import (
    assign_shards,
    export_shards,
    shard_manifest,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        (F.col("id") % 17 + 1).alias("n_chars"),
    )


def test_assignment_is_deterministic_and_total(spark, corpus):
    a = assign_shards(corpus, n_shards=8, seed=0).collect()
    b = assign_shards(corpus, n_shards=8, seed=0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    shards = {}
    for r in a:
        shards.setdefault(r.shard, []).append(r.pos)
    assert set(shards) <= set(range(8))
    # positions are exactly 0..n-1 within every shard
    for positions in shards.values():
        assert sorted(positions) == list(range(len(positions)))


def test_seed_reshuffles_layout(spark, corpus):
    a = {r.doc_id: (r.shard, r.pos) for r in assign_shards(corpus, seed=0).collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in assign_shards(corpus, seed=1).collect()}
    assert a != b  # an epoch reshuffle actually moves rows
    assert set(a) == set(b)  # ...but loses none


def test_shuffle_decorrelates_input_order(spark, corpus):
    """Consecutive input ids should not stay neighbors: within a shard,
    the mean absolute id gap of adjacent positions should be near the
    random expectation (~n/3), far above the sorted-order gap of ~8."""
    rows = assign_shards(corpus, n_shards=4, seed=0).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append((r.pos, r.doc_id))
    gaps = []
    for seq in by_shard.values():
        seq.sort()
        gaps += [abs(b[1] - a[1]) for a, b in zip(seq, seq[1:])]
    assert sum(gaps) / len(gaps) > 50


def test_export_one_file_per_shard_and_roundtrip(spark, corpus, tmp_path):
    path = str(tmp_path / "shards")
    manifest = export_shards(corpus, path, n_shards=8, token_col="n_chars")
    for s in range(8):
        files = [
            f
            for f in os.listdir(os.path.join(path, f"shard={s}"))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, f"shard {s}: {files}"
    back = spark.read.parquet(path)
    assert back.count() == 500
    assert sorted(r.doc_id for r in back.collect()) == list(range(500))
    on_disk = json.load(open(os.path.join(path, "_manifest.json")))
    assert on_disk["total_rows"] == 500 == manifest["total_rows"]
    assert on_disk["shards"] == sorted(
        manifest["shards"], key=lambda r: r["shard"]
    )
    # manifest counts match the files
    per_shard = {
        r.shard: r.cnt
        for r in back.groupBy("shard").agg(F.count("*").alias("cnt")).collect()
    }
    for row in on_disk["shards"]:
        assert per_shard[row["shard"]] == row["n_rows"]


def test_export_rerun_is_stable(spark, corpus, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = export_shards(corpus, p1, n_shards=4, token_col="n_chars")
    m2 = export_shards(corpus, p2, n_shards=4, token_col="n_chars")
    assert m1 == m2


def test_layout_sum_detects_reorder(spark, corpus):
    base = shard_manifest(assign_shards(corpus, n_shards=4, seed=0))
    # swap two positions within each shard: content unchanged, layout not
    perturbed = assign_shards(corpus, n_shards=4, seed=0).withColumn(
        "pos",
        F.when(F.col("pos") == 0, F.lit(1))
        .when(F.col("pos") == 1, F.lit(0))
        .otherwise(F.col("pos")),
    )
    pert = shard_manifest(perturbed)
    b = {r.shard: (r.content_sum, r.layout_sum) for r in base.collect()}
    p = {r.shard: (r.content_sum, r.layout_sum) for r in pert.collect()}
    for s in b:
        assert b[s][0] == p[s][0]
        assert b[s][1] != p[s][1]


def test_shard_source_mix_balance_and_shares(spark):
    from instagram_data_pipeline_spark.extensions.export import (
        assign_shards,
        shard_source_mix,
    )

    rows = [(i, "web" if i % 4 else "books", 10 + i % 5)
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, nt int")
    mix = shard_source_mix(
        assign_shards(df, n_shards=4), token_col="nt"
    ).collect()
    by_shard = {}
    for r in mix:
        by_shard.setdefault(r.shard, {})[r.source] = r
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, srcs in by_shard.items():
        # every shard sees both sources (hash is source-blind)
        assert set(srcs) == {"web", "books"}
        # shares sum to ~1e6 (floor rounding can lose < n_sources ppm)
        tot = sum(r.share_ppm for r in srcs.values())
        assert 999998 <= tot <= 1000000
        # rough corpus mix (75/25) survives in every shard
        assert 600000 < srcs["web"].share_ppm < 900000
        assert srcs["web"].n_tokens > 0
