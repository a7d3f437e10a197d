"""Token-bucket admission: exact bucket dynamics, burst/refill
behavior, jitter determinism."""

from __future__ import annotations

from instagram_data_pipeline_spark.operators.ratelimit import (
    admission_summary,
    token_bucket_admission,
)


def _replay(spark, rows, **kw):
    df = spark.createDataFrame(rows, "k long, id long, ts long")
    out = token_bucket_admission(
        df, key_col="k", ts_col="ts", id_col="id", **kw
    )
    return {r.id: r for r in out.collect()}


def test_burst_drains_then_refills(spark):
    # capacity 100, cost 60, rate 1/s: first request (full bucket)
    # admits, immediate second has 40 < 60 -> rejected; +30s still 70-?
    rows = [(1, 1, 1000), (1, 2, 1000), (1, 3, 1030), (1, 4, 1100)]
    got = _replay(spark, rows, rate=1, capacity=100, cost=60,
                  backoff=60, jitter_max=30)
    assert got[1].admitted and got[1].tokens_after == 40
    assert not got[2].admitted and got[2].tokens_after == 40
    assert got[3].admitted and got[3].tokens_after == 10  # 40+30-60
    assert got[4].admitted and got[4].tokens_after == 20  # 10+70 -> 80-60


def test_refill_caps_at_capacity(spark):
    rows = [(1, 1, 0), (1, 2, 100000)]  # huge gap
    got = _replay(spark, rows, rate=1, capacity=80, cost=60,
                  backoff=10, jitter_max=5)
    # second request refilled to cap 80, not 100000
    assert got[2].tokens_after == 20


def test_keys_are_independent(spark):
    rows = [(1, 1, 0), (1, 2, 0), (2, 3, 0)]
    got = _replay(spark, rows, rate=1, capacity=60, cost=60,
                  backoff=10, jitter_max=5)
    assert got[1].admitted and not got[2].admitted
    assert got[3].admitted  # key 2's bucket untouched by key 1


def test_retry_jitter_deterministic_and_bounded(spark):
    rows = [(1, i, 0) for i in range(1, 9)]
    kw = dict(rate=1, capacity=60, cost=60, backoff=100, jitter_max=7)
    a = _replay(spark, rows, **kw)
    b = _replay(spark, rows, **kw)
    rej = [i for i in a if not a[i].admitted]
    assert rej  # everything after the first is rejected at t=0
    for i in rej:
        assert a[i].retry_at == b[i].retry_at
        assert 100 <= a[i].retry_at - a[i].ts_s < 107
    assert a[1].retry_at is None  # admitted rows carry no retry
    # jitter decorrelates: not all retries identical
    assert len({a[i].retry_at for i in rej}) > 1


def test_admission_summary_rollup(spark):
    df = spark.createDataFrame(
        [(1, 1, 0), (1, 2, 0), (2, 3, 0)], "k long, id long, ts long"
    )
    dec = token_bucket_admission(
        df, "k", "ts", "id", rate=1, capacity=60, cost=60,
        backoff=1, jitter_max=2,
    )
    got = {r.k: (r.n_requests, r.n_admitted, r.n_rejected)
           for r in admission_summary(dec, "k").collect()}
    assert got == {1: (2, 1, 1), 2: (1, 1, 0)}


def test_reset_gap_segmentation_matches_global_replay(spark):
    """The fold is segmented at reset gaps (gap * rate >= capacity);
    the output must still equal a single global per-key replay —
    segmentation is a memory bound, never a semantics change."""
    rows, rid, ts = [], 0, 0
    for _burst in range(3):  # key 1: bursts split by reset gaps
        for i in range(10):
            rid += 1
            rows.append((1, rid, ts + i * 7))
        ts += 500  # >= capacity/rate = 100 -> bucket resets
    for i in range(40):  # key 2: continuous, never resets
        rid += 1
        rows.append((2, rid, i * 3))
    kw = dict(rate=1, capacity=100, cost=60, backoff=60, jitter_max=30)
    got = _replay(spark, rows, **kw)

    per: dict[int, list] = {}
    for k, i, t in rows:
        per.setdefault(k, []).append((t, i))
    exp = {}
    for k, rs in per.items():
        rs.sort()
        tokens, prev = 100, rs[0][0]
        for t, i in rs:
            tokens = min(100, tokens + max(t - prev, 0))
            prev = t
            ok = tokens >= 60
            if ok:
                tokens -= 60
            exp[i] = (tokens, ok)
    assert {i: (got[i].tokens_after, got[i].admitted) for i in exp} == exp


def test_hot_key_max_segment_guard(spark):
    """A pathological never-idle key (no reset gap anywhere) must fail
    LOUDLY when its continuous burst exceeds max_segment — and fold
    fine without the guard (the documented bound, VERDICT r4 #5)."""
    import pytest

    rows = [(1, i, i) for i in range(1, 301)]  # gap 1 << capacity/rate
    df = spark.createDataFrame(rows, "k long, id long, ts long")
    guarded = token_bucket_admission(
        df, "k", "ts", "id", rate=1, capacity=1000, cost=60,
        max_segment=100,
    )
    with pytest.raises(Exception, match="max_segment"):
        guarded.collect()
    unguarded = token_bucket_admission(
        df, "k", "ts", "id", rate=1, capacity=1000, cost=60
    )
    assert unguarded.count() == 300
