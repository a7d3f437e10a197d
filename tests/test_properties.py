"""Property-based tests (hypothesis) for the write-pattern guarantees —
the ON CONFLICT semantics must hold for arbitrary data, not just fixtures.

Spark-session-per-example would be unusably slow, so strategies generate
small row lists and each property runs a bounded number of examples
against the shared session.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from instagram_data_pipeline_spark.extensions.dedup import ngram_jaccard_pairs
from instagram_data_pipeline_spark.operators.mutuals import (
    mutual_edges,
    mutual_edges_intersect,
)
from instagram_data_pipeline_spark.operators.writes import (
    insert_if_absent,
    upsert_keep_newest,
)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

key = st.integers(min_value=0, max_value=9)
ts = st.datetimes(
    min_value=dt.datetime(2024, 1, 1), max_value=dt.datetime(2024, 12, 31)
)
user_rows = st.lists(
    st.tuples(key, st.integers(min_value=0, max_value=99), ts),
    min_size=0, max_size=25,
)
edge_rows = st.lists(st.tuples(key, key), min_size=0, max_size=30)

SCHEMA = "k long, v long, updated timestamp"


def _df(spark, rows):
    return spark.createDataFrame(
        [(int(k), int(v), t) for k, v, t in rows], SCHEMA
    )


@given(existing=user_rows, incoming=user_rows)
@SETTINGS
def test_upsert_properties(spark, existing, incoming):
    ex = _df(spark, existing).dropDuplicates(["k"])
    inc = _df(spark, incoming).dropDuplicates(["k"])
    out = upsert_keep_newest(ex, inc, ["k"], "updated", tiebreak=["v"])
    rows = out.collect()
    # key-uniqueness invariant
    assert len(rows) == len({r.k for r in rows})
    # key set == union of inputs
    assert {r.k for r in rows} == {int(k) for k, _, _ in existing} | {
        int(k) for k, _, _ in incoming
    }
    # idempotency: applying the same incoming again changes nothing
    again = upsert_keep_newest(out, inc, ["k"], "updated", tiebreak=["v"])
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))


@given(existing=user_rows, incoming=user_rows)
@SETTINGS
def test_insert_if_absent_properties(spark, existing, incoming):
    ex = _df(spark, existing)
    inc = _df(spark, incoming)
    new = insert_if_absent(ex, inc, ["k"])
    new_keys = {r.k for r in new.collect()}
    # never collides with existing, always subset of incoming
    assert not (new_keys & {int(k) for k, _, _ in existing})
    assert new_keys <= {int(k) for k, _, _ in incoming}
    # append-then-rerun is a no-op
    appended = ex.unionByName(new)
    assert insert_if_absent(appended, inc, ["k"]).count() == 0


@given(f_rows=edge_rows, g_rows=edge_rows)
@SETTINGS
def test_mutuals_equals_set_intersection(spark, f_rows, g_rows):
    followers = spark.createDataFrame(
        [(int(u), int(p)) for u, p in f_rows] or [(0, 0)],
        "user_id long, follower_id long",
    )
    following = spark.createDataFrame(
        [(int(u), int(p)) for u, p in g_rows] or [(1, 1)],
        "user_id long, following_id long",
    )
    join_form = {
        (r.user_id, r.mutual_id)
        for r in mutual_edges(followers, following).collect()
    }
    intersect_form = {
        (r.user_id, r.mutual_id)
        for r in mutual_edges_intersect(followers, following).collect()
    }
    expected = ({(int(u), int(p)) for u, p in f_rows}
                & {(int(u), int(p)) for u, p in g_rows})
    if not f_rows or not g_rows:
        expected = join_form  # sentinel rows; just require form-agreement
    assert join_form == intersect_form == expected


@given(
    texts=st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=40), min_size=1, max_size=6
    )
)
@SETTINGS
def test_jaccard_bounds_and_symmetry(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    pairs = ngram_jaccard_pairs(docs, n=2, threshold=0.0).collect()
    for r in pairs:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.doc_a < r.doc_b


@given(
    texts=st.lists(
        st.text(alphabet="abcdefg ", min_size=0, max_size=60),
        min_size=1, max_size=5,
    )
)
@SETTINGS
def test_winnow_properties(spark, texts):
    """Winnowing invariants on arbitrary text: every fingerprint hash
    equals the md5-derived hash of the gram at its position, and
    fingerprints only exist for docs with >= k normalized chars."""
    from instagram_data_pipeline_spark.extensions.dedup import (
        winnow_fingerprints,
    )
    from instagram_data_pipeline_spark.functions.text import normalized
    from pyspark.sql import functions as F2

    k, w = 4, 3
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    fp = winnow_fingerprints(docs, k=k, window=w)
    norm = {
        r.doc_id: r.n
        for r in docs.select("doc_id", normalized(F2.col("text")).alias("n")).collect()
    }
    import hashlib

    for r in fp.collect():
        txt = norm[r.doc_id]
        assert len(txt) >= k + w - 1  # at least one full window exists
        gram = txt[r.pos - 1 : r.pos - 1 + k]
        want = int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)
        assert r.fp_hash == want


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2"]),
            st.integers(min_value=0, max_value=200),
        ),
        min_size=1, max_size=12, unique=True,
    )
)
@SETTINGS
def test_packing_stream_invariants(spark, rows):
    """Packing invariants: per shard, offsets are contiguous in id order
    (start_off = sum of earlier docs' tokens) and chunk ranges are
    consistent with offsets."""
    from instagram_data_pipeline_spark.extensions.sampling import (
        pack_token_stream,
    )

    data = [(s, i, (i * 7) % 40) for i, (s, _x) in enumerate(rows)]
    df = spark.createDataFrame(data, "source string, doc_id long, n_tok long")
    out = sorted(
        pack_token_stream(df, "doc_id", "n_tok", budget=16,
                          shard_col="source").collect(),
        key=lambda r: (r.source, r.doc_id),
    )
    running = {}
    for r in out:
        assert r.start_off == running.get(r.source, 0)
        running[r.source] = r.start_off + r.n_tok
        assert r.pack_start == r.start_off // 16
        last = max(r.start_off + r.n_tok - 1, r.start_off)
        assert r.pack_end == max(last // 16, r.pack_start)
