"""Deterministic splitting/sampling invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from instagram_data_pipeline_spark.extensions.sampling import (
    assign_split,
    deterministic_sample,
)
from instagram_data_pipeline_spark.io import load_testdata


def test_split_stable_and_partitioning(spark, sf_dir):
    docs = load_testdata(spark, sf_dir, "documents")
    a = assign_split(docs, "doc_id")
    b = assign_split(docs, "doc_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    counts = {r.split: r.n for r in a.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / total > 0.8  # ~90% with 500-doc variance


def test_split_stable_under_append(spark, sf_dir):
    """A record's split never changes when the corpus grows."""
    docs = load_testdata(spark, sf_dir, "documents")
    half = docs.filter(F.col("doc_id") < 250)
    full_split = {r.doc_id: r.split for r in assign_split(docs, "doc_id").collect()}
    half_split = {r.doc_id: r.split for r in assign_split(half, "doc_id").collect()}
    assert all(full_split[k] == v for k, v in half_split.items())


def test_deterministic_sample_is_subset_and_joinable(spark, sf_dir):
    docs = load_testdata(spark, sf_dir, "documents")
    s10 = deterministic_sample(docs, "doc_id", 0.10)
    s20 = deterministic_sample(docs, "doc_id", 0.20)
    ids10 = {r.doc_id for r in s10.select("doc_id").collect()}
    ids20 = {r.doc_id for r in s20.select("doc_id").collect()}
    assert ids10 <= ids20  # nested samples: bigger fraction contains smaller
    assert 0.03 < len(ids10) / docs.count() < 0.2
