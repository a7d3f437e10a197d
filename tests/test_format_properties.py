"""Property tests for the transaction-log pruning arithmetic.

The safety contract of every statistics path — zone maps, Z-order
boxes, blooms — is one-sided: pruning may KEEP extra files (false
positives, absent stats), it must NEVER drop a file containing a
matching row. These invariants are pure manifest arithmetic (no Spark,
no IO), so hypothesis can hammer them with hundreds of synthetic
manifests in milliseconds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from instagram_data_pipeline_spark.formats import (
    BLOOM_KEY,
    TransactionLogFormat,
    _bloom_build,
    _stat_key,
)

SETTINGS = settings(max_examples=300, deadline=None)

# a "file" is a list of (x, y, s) rows; a manifest is a list of files
row = st.tuples(
    st.integers(min_value=-1000, max_value=1000),
    st.integers(min_value=-1000, max_value=1000),
    st.text(min_size=0, max_size=6),
)
files = st.lists(
    st.lists(row, min_size=1, max_size=20), min_size=1, max_size=12
)


def _snap(file_rows, drop_stats_for: int | None = None,
          with_blooms: bool = False) -> dict:
    """Build the manifest a writer would record for these files."""
    snap = {"version": 1, "files": {}, "stats": {}}
    for i, rows in enumerate(file_rows):
        rel = f"data/f{i}.parquet"
        snap["files"][rel] = i % 4
        if i == drop_stats_for:
            snap["stats"][rel] = {}  # pre-stats file: unprunable
            continue
        xs = [r[0] for r in rows]
        ys = [r[1] for r in rows]
        entry = {
            "x": [min(xs), max(xs)],
            "y": [min(ys), max(ys)],
        }
        if with_blooms:
            # alternate the CURRENT {"k","bm"} entry form with the
            # legacy bare string so both probe paths stay exercised
            bm = _bloom_build([r[2] for r in rows], 256, 7)
            entry[BLOOM_KEY] = {
                "s": {"k": 7, "bm": bm} if i % 2 == 0 else bm
            }
        snap["stats"][rel] = entry
    return snap


@SETTINGS
@given(
    file_rows=files,
    lo=st.integers(min_value=-1200, max_value=1200),
    span=st.integers(min_value=0, max_value=800),
    victim=st.integers(min_value=0, max_value=12),
)
def test_zone_map_range_prune_never_drops_a_matching_row(
    file_rows, lo, span, victim
):
    hi = lo + span
    snap = _snap(
        file_rows,
        drop_stats_for=victim if victim < len(file_rows) else None,
    )
    keep = set(TransactionLogFormat.files_for_range(snap, "x", lo, hi))
    for i, rows in enumerate(file_rows):
        if any(lo <= r[0] <= hi for r in rows):
            assert f"data/f{i}.parquet" in keep
    # the stats-less file must always survive
    if victim < len(file_rows):
        assert f"data/f{victim}.parquet" in keep


@SETTINGS
@given(
    file_rows=files,
    xlo=st.integers(min_value=-1200, max_value=1200),
    xspan=st.integers(min_value=0, max_value=600),
    ylo=st.integers(min_value=-1200, max_value=1200),
    yspan=st.integers(min_value=0, max_value=600),
)
def test_box_prune_never_drops_a_matching_row(
    file_rows, xlo, xspan, ylo, yspan
):
    xhi, yhi = xlo + xspan, ylo + yspan
    snap = _snap(file_rows)
    box = {"x": (xlo, xhi), "y": (ylo, yhi)}
    keep = set(TransactionLogFormat.files_for_box(snap, box))
    keep_x = set(TransactionLogFormat.files_for_range(snap, "x", xlo, xhi))
    keep_y = set(TransactionLogFormat.files_for_range(snap, "y", ylo, yhi))
    assert keep == keep_x & keep_y  # box == intersection of legs
    for i, rows in enumerate(file_rows):
        if any(xlo <= r[0] <= xhi and ylo <= r[1] <= yhi for r in rows):
            assert f"data/f{i}.parquet" in keep


@SETTINGS
@given(file_rows=files, data=st.data())
def test_bloom_prune_never_drops_a_containing_file(file_rows, data):
    snap = _snap(file_rows, with_blooms=True)
    fmt = TransactionLogFormat(bloom_cols=["s"], bloom_bits=256)
    # probe a value that IS somewhere: every containing file survives
    all_vals = sorted({r[2] for rows in file_rows for r in rows})
    probe = data.draw(
        st.one_of(st.sampled_from(all_vals), st.text(max_size=6))
    )
    keep = set(fmt.files_for_value(snap, "s", probe))
    for i, rows in enumerate(file_rows):
        if any(r[2] == probe for r in rows):
            assert f"data/f{i}.parquet" in keep


@SETTINGS
@given(
    v=st.one_of(
        st.integers(min_value=-10**9, max_value=10**9),
        st.floats(allow_nan=False, allow_infinity=False,
                  min_value=-1e9, max_value=1e9),
        st.text(max_size=12),
        st.datetimes(),
        st.booleans(),
    ),
    w=st.one_of(
        st.integers(min_value=-10**9, max_value=10**9),
        st.datetimes(),
    ),
)
def test_stat_key_is_order_preserving_within_a_type(v, w):
    """_stat_key must preserve order within comparable types — the
    property every pruning comparison relies on."""
    if type(v) is not type(w):
        return
    kv, kw = _stat_key(v), _stat_key(w)
    if kv is None or kw is None:
        return
    assert (v < w) == (kv < kw) and (v == w) == (kv == kw)


def test_rebucket_snapshot_isolation_for_pinned_reader(spark, tmp_path):
    """VERDICT r8 Next #8: a reader pinned to the pre-rebucket version
    sees identical results WHILE the rebucket commits (collected
    mid-publish, between the rewrite's data-file write and its manifest
    CAS), after it commits, and after a vacuum — manifests and data
    files are immutable, so the rebucket can only add, never disturb."""
    import datetime as dt

    from instagram_data_pipeline_spark.io import Warehouse

    collected_mid_publish = {}

    class Fmt(TransactionLogFormat):
        """Fires a pinned-version read in the window between the
        rebucket's data write and its manifest publish (the same
        deterministic interleave the two-writer race tests use)."""

        on_publish = None

        def _publish(self, *args, **kwargs):
            if Fmt.on_publish is not None:
                cb, Fmt.on_publish = Fmt.on_publish, None
                cb()
            return TransactionLogFormat._publish(self, *args, **kwargs)

    fmt = Fmt()
    wh = Warehouse(spark, str(tmp_path / "wh"), fmt=fmt)
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, f"v{i}", t0) for i in range(200)],
        "k long, v string, ts timestamp",
    )
    wh.upsert_partitioned("t", df, ["k"], "ts", num_buckets=4)
    # a deletion vector rides version 1 so the pinned read exercises
    # the full merge-on-read path across the rebucket too
    fmt.delete_keys_dv(
        wh, "t", ["k"], spark.createDataFrame([(7,), (11,)], "k long"), 4
    )
    pinned = fmt.read_version(wh, "t", 2)
    expected = sorted(map(tuple, pinned.collect()))
    assert len(expected) == 198

    def mid_publish_read():
        got = sorted(map(tuple, fmt.read_version(wh, "t", 2).collect()))
        collected_mid_publish["rows"] = got

    Fmt.on_publish = mid_publish_read
    fmt.rebucket(wh, "t", 8)
    assert collected_mid_publish["rows"] == expected

    # after the commit: the pinned version still answers identically,
    # the new version re-answers the same LOGICAL content at the new
    # modulus, and bucket ops speak the new contract
    assert sorted(map(tuple, fmt.read_version(wh, "t", 2).collect())) \
        == expected
    latest = sorted(map(tuple, wh.read_merged("t").collect()))
    assert latest == expected
    snap = fmt._latest(wh, "t")
    assert snap["num_buckets"] == 8

    # vacuum must not reclaim files a live (non-expired) manifest still
    # references: the pinned read survives it
    fmt.vacuum(wh, "t", grace_seconds=0.0)
    assert sorted(map(tuple, fmt.read_version(wh, "t", 2).collect())) \
        == expected
