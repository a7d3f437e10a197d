"""Count-Min sketch guarantees: deterministic overestimate, exactness at
generous width, merge = build-on-union, heavy-hitter recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from instagram_data_pipeline_spark.extensions.sketches import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
    cms_merge,
)


def _freq_df(spark, freqs):
    rows = [(k,) for k, n in freqs.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_underestimates_and_exact_when_wide(spark):
    freqs = {f"key_{i}": (i % 7) + 1 for i in range(50)}
    df = _freq_df(spark, freqs)
    sketch = cms_build(df, "k", depth=4, width=2048)
    est = {r.k: r.est for r in cms_estimate(sketch, df, "k", 4, 2048).collect()}
    for k, true in freqs.items():
        assert est[k] >= true          # one-sided error: always
    # 50 keys in 2048 buckets x 4 rows: collisions in all 4 rows are
    # vanishingly unlikely -> exact
    assert est == freqs


def test_cms_overestimates_under_pressure_but_never_under(spark):
    freqs = {f"key_{i}": 3 for i in range(200)}
    df = _freq_df(spark, freqs)
    sketch = cms_build(df, "k", depth=2, width=32)  # heavy collision regime
    est = {r.k: r.est for r in cms_estimate(sketch, df, "k", 2, 32).collect()}
    assert all(est[k] >= 3 for k in freqs)
    assert any(est[k] > 3 for k in freqs)  # pressure must show somewhere


def test_cms_merge_equals_union_build(spark):
    a = _freq_df(spark, {"x": 5, "y": 2})
    b = _freq_df(spark, {"y": 3, "z": 7})
    merged = cms_merge(cms_build(a, "k"), cms_build(b, "k"))
    direct = cms_build(a.unionByName(b), "k")
    ma = sorted(map(tuple, merged.collect()))
    mb = sorted(map(tuple, direct.collect()))
    assert ma == mb
    est = {r.k: r.est for r in
           cms_estimate(merged, a.unionByName(b), "k").collect()}
    assert est == {"x": 5, "y": 5, "z": 7}


def test_cms_heavy_hitters_no_false_negatives(spark):
    freqs = {f"h{i}": 40 for i in range(5)}
    freqs.update({f"l{i}": 2 for i in range(100)})
    df = _freq_df(spark, freqs)
    got = {r.k for r in cms_heavy_hitters(df, "k", min_count=40,
                                          depth=4, width=512).collect()}
    assert {f"h{i}" for i in range(5)} <= got  # every true heavy hitter


def test_cms_weighted(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 5.0), ("b", 1.0)], "k string, w double"
    )
    sketch = cms_build(df, "k", weight_col="w")
    est = {r.k: r.est for r in cms_estimate(sketch, df, "k").collect()}
    assert est == {"a": 15, "b": 1}


# ---------------------------------------------------------------------------
# Quantile sketch
# ---------------------------------------------------------------------------
def test_quantile_sketch_error_bounded_by_bin_width(spark, sf_dir):
    from instagram_data_pipeline_spark.extensions.sketches import (
        quantile_estimate,
        quantile_sketch,
    )
    from instagram_data_pipeline_spark.io import load_testdata

    li = load_testdata(spark, sf_dir, "lineitem")
    lo, hi, bins = 0.0, 120000.0, 256
    sk = quantile_sketch(li, "l_extendedprice", lo, hi, bins)
    est = {r.q: r.value
           for r in quantile_estimate(sk, [0.5, 0.95], lo, hi, bins).collect()}
    exact = li.selectExpr(
        "percentile(l_extendedprice, 0.5) AS p50",
        "percentile(l_extendedprice, 0.95) AS p95",
    ).collect()[0]
    width = (hi - lo) / bins
    assert abs(est[0.5] - exact.p50) <= width
    assert abs(est[0.95] - exact.p95) <= width


def test_quantile_sketch_merge_equals_whole(spark, sf_dir):
    from instagram_data_pipeline_spark.extensions.sketches import (
        quantile_estimate,
        quantile_merge,
        quantile_sketch,
    )
    from instagram_data_pipeline_spark.io import load_testdata
    from pyspark.sql import functions as F

    li = load_testdata(spark, sf_dir, "lineitem")
    lo, hi, bins = 0.0, 120000.0, 64
    half_a = li.filter(F.col("l_orderkey") % 2 == 0)
    half_b = li.filter(F.col("l_orderkey") % 2 == 1)
    merged = quantile_merge(
        quantile_sketch(half_a, "l_extendedprice", lo, hi, bins),
        quantile_sketch(half_b, "l_extendedprice", lo, hi, bins),
    )
    whole = quantile_sketch(li, "l_extendedprice", lo, hi, bins)
    q = [0.25, 0.5, 0.9]
    got_m = sorted(quantile_estimate(merged, q, lo, hi, bins).collect())
    got_w = sorted(quantile_estimate(whole, q, lo, hi, bins).collect())
    assert got_m == got_w


def test_quantile_sketch_clamps_out_of_range(spark):
    from instagram_data_pipeline_spark.extensions.sketches import quantile_sketch

    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (1.5,), (99.0,)], "x double"
    )
    bins = {r.bin: r.cnt for r in quantile_sketch(df, "x", 0.0, 2.0, 4).collect()}
    # -5 clamps to bin 0; 99 clamps to the top bin (joining 1.5);
    # 0.5 lands in bin 1; totals preserved
    assert sum(bins.values()) == 4
    assert bins == {0: 1, 1: 1, 3: 2}


def test_histogram_drift_flags_the_shifted_day(spark):
    from datetime import datetime

    from instagram_data_pipeline_spark.extensions.sketches import histogram_drift

    # days 1-3 uniform low values; day 4 shifts the distribution high
    rows = []
    for d in (1, 2, 3):
        rows += [(datetime(2024, 3, d, h), float(h % 10)) for h in range(24)]
    rows += [(datetime(2024, 3, 4, h), 90.0 + h % 10) for h in range(24)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {str(r.day): r.l1_drift
           for r in histogram_drift(df, "ts", "value", 0.0, 100.0, 10).collect()}
    # identical consecutive days -> zero drift; the shift day maxes out
    assert got["2024-03-02"] == 0.0 and got["2024-03-03"] == 0.0
    assert got["2024-03-04"] == 2.0  # disjoint supports -> L1 = 2
    assert "2024-03-01" not in got  # no previous day to compare


def test_grouped_quantile_sketch_matches_per_group_exact(spark, sf_dir):
    from instagram_data_pipeline_spark.extensions.sketches import (
        grouped_quantile_estimate,
        grouped_quantile_sketch,
    )
    from instagram_data_pipeline_spark.io import load_testdata

    li = load_testdata(spark, sf_dir, "lineitem")
    lo, hi, bins = 0.0, 120000.0, 256
    sk = grouped_quantile_sketch(li, ["l_returnflag"], "l_extendedprice",
                                 lo, hi, bins)
    est = {r.l_returnflag: r.value
           for r in grouped_quantile_estimate(
               sk, ["l_returnflag"], 0.5, lo, hi, bins).collect()}
    exact = {r.l_returnflag: r.p50 for r in li.groupBy("l_returnflag")
             .agg(F.expr("percentile(l_extendedprice, 0.5)").alias("p50"))
             .collect()}
    width = (hi - lo) / bins
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) <= width


def test_equidepth_buckets_carry_roughly_equal_mass(spark, sf_dir):
    from instagram_data_pipeline_spark.queries import load_all

    got = load_all()["equidepth_buckets"].spark_fn(spark, sf_dir).collect()
    counts = {r.bucket: r.n_rows for r in got}
    total = sum(counts.values())
    assert set(counts) == set(range(10))
    # each decile bucket holds ~10% of rows, within sketch-bin tolerance
    for b, n in counts.items():
        assert 0.05 <= n / total <= 0.15, (b, n / total)


def test_hll_register_merge_equals_direct(spark):
    from instagram_data_pipeline_spark.extensions.sketches import (
        hll_estimate_from_registers,
        hll_merge_registers,
        hll_registers,
    )

    df = spark.range(0, 3000).select(
        (F.col("id") % 3).alias("part"), F.col("id").alias("uid")
    )
    # Merging per-part registers must give the IDENTICAL sketch (and
    # hence the identical estimate) as registers built over all rows:
    # the merge is a lossless MAX over register state.
    per_part = hll_registers(df, ["part"], "uid", p=10)
    merged = hll_merge_registers(per_part, [])
    direct = hll_registers(df, [], "uid", p=10)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    est = hll_estimate_from_registers(merged, [], 10).collect()[0][0]
    assert abs(est - 3000) / 3000 < 0.1  # ~3.25% expected at m=1024
