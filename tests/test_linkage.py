"""Record linkage: blocking, integer scoring, best-match selection."""

from __future__ import annotations

from instagram_data_pipeline_spark.extensions.linkage import blocked_link


def test_blocked_link_threshold_ties_and_blocking(spark):
    clean = spark.createDataFrame(
        [
            (1, "b1", "alice smith", "p1234567"),
            (2, "b1", "alide smith", "p1234567"),  # near-twin of 1
            (3, "b2", "alice smith", "p1234567"),  # right name, WRONG block
            (4, "b1", "zzzzz qqqqq", "p0000000"),
        ],
        "clean_id long, blk string, name string, phone string",
    )
    dirty = spark.createDataFrame(
        [
            (101, "b1", "alice smith", "p1234567"),  # exact -> ties 1 vs 2?
            (102, "b1", "totally different", "x9"),  # below threshold
            (103, "b3", "alice smith", "p1234567"),  # empty block
        ],
        "dirty_id long, blk string, d_name string, d_phone string",
    )
    got = {
        r.dirty_id: (r.clean_id, r.score_pm)
        for r in blocked_link(
            clean, dirty, ["blk"],
            [("name", "d_name", 1), ("phone", "d_phone", 1)],
            threshold_pm=800,
        ).collect()
    }
    # 101: clean 1 scores 1000 (exact); clean 2 scores lower (1 edit);
    # clean 3 is blocked away despite being identical
    assert got[101] == (1, 1000)
    # 102 clears no threshold; 103 has no candidates at all
    assert 102 not in got and 103 not in got


def test_blocked_link_deterministic_tie_break(spark):
    clean = spark.createDataFrame(
        [(7, "b", "same"), (3, "b", "same")],
        "clean_id long, blk string, name string",
    )
    dirty = spark.createDataFrame(
        [(100, "b", "same")], "dirty_id long, blk string, d_name string"
    )
    got = blocked_link(
        clean, dirty, ["blk"], [("name", "d_name", 1)], threshold_pm=500
    ).collect()
    assert len(got) == 1
    assert got[0].clean_id == 3  # equal scores: lowest clean id wins
