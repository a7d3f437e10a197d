"""Z-order layout: file-skipping effectiveness measured from the
parquet min/max footer statistics the layout exists to tighten."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pyarrow.parquet as pq

from instagram_data_pipeline_spark.io import load_testdata
from instagram_data_pipeline_spark.operators.layout import zorder_layout


def _files_overlapping(dirname: str, a_col: str, a_rng, b_col: str, b_rng):
    """Count parquet files whose [min,max] envelope intersects BOTH
    ranges — the files a stats-pruning reader must open."""
    hit, total = 0, 0
    for f in glob.glob(f"{dirname}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        cols = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }
        amin = min(md.row_group(g).column(cols[a_col]).statistics.min
                   for g in range(md.num_row_groups))
        amax = max(md.row_group(g).column(cols[a_col]).statistics.max
                   for g in range(md.num_row_groups))
        bmin = min(md.row_group(g).column(cols[b_col]).statistics.min
                   for g in range(md.num_row_groups))
        bmax = max(md.row_group(g).column(cols[b_col]).statistics.max
                   for g in range(md.num_row_groups))
        total += 1
        if amax >= a_rng[0] and amin <= a_rng[1] \
                and bmax >= b_rng[0] and bmin <= b_rng[1]:
            hit += 1
    return hit, total


def test_zorder_improves_two_column_skipping(spark, sf_dir):
    li = load_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    n_files = 16
    plain_dir = tempfile.mkdtemp(prefix="layout_plain_")
    z_dir = tempfile.mkdtemp(prefix="layout_z_")
    try:
        # natural layout: sorted by orderkey (the ingest order) —
        # partkey/suppkey stats span everything in every file
        li.repartitionByRange(n_files, "l_orderkey").write.mode(
            "overwrite"
        ).parquet(plain_dir)
        zorder_layout(li, ["l_partkey", "l_suppkey"], n_files).write.mode(
            "overwrite"
        ).parquet(z_dir)

        # conjunctive point-ish filter on both z columns
        mx_p = li.agg({"l_partkey": "max"}).collect()[0][0]
        mx_s = li.agg({"l_suppkey": "max"}).collect()[0][0]
        a_rng = (1, max(1, mx_p // 20))       # low 5% of partkeys
        b_rng = (1, max(1, mx_s // 20))       # low 5% of suppkeys
        hit_p, tot_p = _files_overlapping(
            plain_dir, "l_partkey", a_rng, "l_suppkey", b_rng
        )
        hit_z, tot_z = _files_overlapping(
            z_dir, "l_partkey", a_rng, "l_suppkey", b_rng
        )
        assert tot_p >= n_files // 2 and tot_z >= n_files // 2
        # natural layout prunes nothing: every file overlaps
        assert hit_p == tot_p
        # z-order layout confines the filter to a small corner
        assert hit_z < tot_p // 2

        # and the layout is a pure permutation: same rows, same content
        zdf = spark.read.parquet(z_dir)
        assert zdf.count() == li.count()
        assert (
            zdf.selectExpr("sum(hash(l_orderkey, l_partkey, l_suppkey))")
            .collect()[0][0]
            == li.selectExpr("sum(hash(l_orderkey, l_partkey, l_suppkey))")
            .collect()[0][0]
        )
    finally:
        shutil.rmtree(plain_dir, ignore_errors=True)
        shutil.rmtree(z_dir, ignore_errors=True)
