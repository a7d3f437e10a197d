"""Bloom-filter join pruning: pre-filter a huge fact table with a tiny
broadcast bitmap before the (semi-)join shuffle.

The problem at 100 TB: a semi-join ``fact ⋉ dim`` shuffles every fact
row on the join key, even though most rows match nothing. When ``dim``
is small enough, Spark broadcasts it and no shuffle happens — but a dim
of tens of millions of keys exceeds the broadcast threshold while its
*Bloom filter* (a few MB of bits) still fits. The classic fix (what
Spark's own AQE ``spark.sql.optimizer.runtime.bloomFilter.enabled``
does inside the engine, and what the reference's single-node engine
never needs) is:

1. aggregate the dim keys into an ``n_bits`` Bloom bitmap — ``k``
   xxhash64 probes per key, OR-ed into 64-bit words. The bitmap is a
   DataFrame aggregate (≤ ``n_bits/64`` rows), collected once — it is
   fixed-size regardless of fact cardinality, the same contract as the
   G4 tiny-dim collect;
2. filter the fact side with the broadcast bitmap: a row survives only
   if ALL ``k`` probed bits are set. False positives pass (tunable via
   ``n_bits``/``k``), false negatives are impossible;
3. run the exact semi-join on the survivors only — the shuffle moves
   just the candidate rows, and the residual join removes the false
   positives.

Because step 3 is exact, the composition equals a plain semi-join —
the oracle is ordinary join SQL and needs no knowledge of the hash
family. The membership test itself is pure built-in exprs (xxhash64 /
shiftright / bitwise AND) inside whole-stage codegen; no UDFs.

No analog in the reference (psycopg2 pushes joins to Postgres:
``database_manager.py``); this is engine-side machinery the reference
gets for free from its RDBMS and a Spark deployment needs at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(key_col, n_bits: int, k: int, seed: int):
    """k Bloom bit positions for a key: pmod(xxhash64(key, seed+i), n_bits)."""
    return [
        F.pmod(F.xxhash64(key_col, F.lit(seed + i)), F.lit(n_bits)).cast("long")
        for i in range(k)
    ]


def bloom_bitmap(
    dim: DataFrame, key: str, n_bits: int = 1 << 16, k: int = 5, seed: int = 0
) -> DataFrame:
    """Aggregate ``dim[key]`` into a Bloom bitmap DataFrame of
    ``(word_idx: long, bits: long)`` rows — at most ``n_bits/64`` rows,
    one per 64-bit word with at least one set bit.

    The build is one explode + one aggregation: each key contributes
    ``k`` bit positions; positions group by word index and OR into the
    word. Mergeable monoid: bitmaps of two key sets OR together (union
    semantics), so incremental dims can maintain the filter without a
    rebuild.
    """
    pos = F.explode(F.array(*_positions(F.col(key), n_bits, k, seed))).alias(
        "pos"
    )
    return (
        dim.select(pos)
        .groupBy(F.shiftright(F.col("pos"), 6).alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(1L, cast(pos % 64 as int))")
            ).alias("bits")
        )
    )


def bloom_words(
    dim: DataFrame, key: str, n_bits: int = 1 << 16, k: int = 5, seed: int = 0
) -> list[int]:
    """Collect the bitmap into a dense ``n_bits/64``-long word list.

    The collect is bounded by ``n_bits`` (8 KiB of bits at the default),
    NOT by dim cardinality — safe at any dim size, same contract as the
    G4 tiny-dim map.
    """
    n_words = max(1, n_bits // 64)
    words = [0] * n_words
    for row in bloom_bitmap(dim, key, n_bits, k, seed).collect():
        words[int(row["word_idx"])] = int(row["bits"])
    return words


def bloom_prune(
    fact: DataFrame,
    key: str,
    words: list[int],
    n_bits: int = 1 << 16,
    k: int = 5,
    seed: int = 0,
) -> DataFrame:
    """Keep only fact rows whose ``key`` MAY be in the filter (all ``k``
    probed bits set). Never drops a true match; passes a tunable
    fraction of false positives. Pure codegen exprs — the bitmap rides
    into the task as a literal array (a broadcast variable in spirit;
    8 KiB at the default ``n_bits``)."""
    bitmap = F.array(*[F.lit(w).cast("long") for w in words])
    out = fact.withColumn("_bloom", bitmap)
    cond = F.lit(True)
    for i, h in enumerate(_positions(F.col(key), n_bits, k, seed)):
        out = out.withColumn(f"_h{i}", h)
        word = f"element_at(_bloom, cast(shiftright(_h{i}, 6) as int) + 1)"
        cond = cond & (
            F.expr(f"shiftright({word}, cast(_h{i} % 64 as int)) & 1L") == 1
        )
    return (
        out.filter(cond)
        .drop("_bloom", *[f"_h{i}" for i in range(k)])
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    n_bits: int = 1 << 16,
    k: int = 5,
    seed: int = 0,
) -> DataFrame:
    """Exact ``fact ⋉ dim`` with Bloom pre-pruning: equals
    ``fact.join(dim, on, "left_semi")`` row-for-row, but the shuffle
    (or broadcast-join probe) sees only the pruned candidates. The
    residual semi-join removes false positives, so correctness never
    depends on the hash family or the filter's error rate."""
    dim_key = dim_key or fact_key
    words = bloom_words(dim, dim_key, n_bits, k, seed)
    pruned = bloom_prune(fact, fact_key, words, n_bits, k, seed)
    return pruned.join(
        dim.select(F.col(dim_key).alias(fact_key)).dropDuplicates(),
        on=fact_key,
        how="left_semi",
    )
