"""Skew-handling join utilities (SURVEY §7 risk 5: celebrity fan-out in
the followers table).

First line of defense is AQE's skew-join splitting (enabled in the
session factory). ``salted_join`` is the manual fallback for when one
side is so hot that even split partitions overwhelm a task: the big side
is spread across ``salt`` sub-keys (deterministic hash of the whole row —
no RNG, reruns identical) and the small side is replicated ``salt``
times. Shuffle volume on the replicated side grows by the salt factor —
use only on measured hot keys (at production scale: split the input into
hot/cold by a key-frequency sketch, salt only the hot slice, union)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``keys`` with the hot side salted ``salt`` ways.

    Result is column-identical to ``big.join(small, keys, how)`` for
    inner/left joins (asserted in tests)."""
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    b = big.withColumn("_salt", salt_col.cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    # SHUFFLE_HASH on the replicated side (guide §3.1): salting exists
    # to make every post-shuffle partition bounded, which is exactly
    # the shuffled-hash build-side requirement — and it skips the two
    # full sorts sort-merge would add on top of the salt's replication
    # cost (r14: 2.67s -> 1.18s on the J1 salted twin at sf0.1).
    out = b.join(s.hint("shuffle_hash"), keys + ["_salt"], how)
    return out.drop("_salt")
