"""Training-shard export: the last stage of a training-data pipeline —
deterministic global shuffle, fixed shard assignment, one file per
shard, and a manifest the training job can trust (SURVEY §2.12
extension family).

Why a DETERMINISTIC shuffle: training wants examples decorrelated from
their storage order (crawl order clusters domains/time together), but
`orderBy(rand())` is irreproducible and a full sort by random key is a
global sort. Hashing instead gives both properties in one pass:

* ``shard  = md5(id, seed) mod n_shards``  — which file a row lands in
* ``pos    = row_number over shard ordered by the same hash``  — the
  order within the file

Both are pure functions of (id, seed), so the export is byte-stable
across reruns and engines, any subset of shards is a valid uniform
sample of the corpus, and a re-export with a new seed is a fresh
epoch-level reshuffle. The hash is the md5-prefix integer (not
xxhash64) so external systems — and the DuckDB oracle — can replay the
exact layout.

Scale: assignment is map-only; the write is ONE exchange on the shard
id. ``row_number`` within a shard is the only per-shard serial step —
shards should be sized so one shard fits one task (n_shards ≈
corpus/256 MB), which is the same constraint the training loader has.
The manifest collects n_shards aggregate rows (bounded control-plane
read, not a data-plane collect).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^52: hash values stay exactly representable as doubles so every
# engine (and JSON) agrees on checksum arithmetic
_HASH_MOD = 1 << 52


def shuffle_hash(id_col: Column, seed: int) -> Column:
    """Deterministic engine-portable shuffle key: first 13 md5 hex
    digits of ``seed:id`` as a bigint (< 2^52)."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), id_col.cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")


def assign_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Adds ``shard`` (int) and ``pos`` (0-based position within the
    shard, in shuffled order). Ties on the hash (only possible for
    duplicate ids) break by id to stay total."""
    h = shuffle_hash(F.col(id_col), seed)
    with_hash = df.withColumn("_h", h).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return with_hash.withColumn(
        "pos", F.row_number().over(w).cast("long") - 1
    ).drop("_h")


def shard_manifest(
    sharded: DataFrame, id_col: str = "doc_id", token_col: str | None = None
) -> DataFrame:
    """Per-shard manifest rows: counts, an order-INsensitive content
    checksum (sum of shuffle hashes mod 2^52 — catches membership
    drift), and an order-SENSITIVE layout checksum (sum of pos * hash
    mod 2^52 — catches any reordering within a shard)."""
    h = shuffle_hash(F.col(id_col), 0)  # manifest hash is seed-free
    # per-row terms stay < 2^52; the SUM runs in DECIMAL(38,0) so no
    # shard size can overflow it (DuckDB's BIGINT sum widens to
    # HUGEINT, same guarantee)
    content_term = F.pmod(h, F.lit(_HASH_MOD))
    layout_term = F.pmod(
        (F.col("pos") + 1) * F.pmod(h, F.lit(1 << 20)), F.lit(_HASH_MOD)
    )
    cols = [
        F.count("*").alias("n_rows"),
        F.pmod(F.sum(content_term.cast("decimal(38,0)")), F.lit(_HASH_MOD))
        .cast("long")
        .alias("content_sum"),
        F.pmod(F.sum(layout_term.cast("decimal(38,0)")), F.lit(_HASH_MOD))
        .cast("long")
        .alias("layout_sum"),
    ]
    if token_col is not None:
        cols.append(F.sum(token_col).alias("n_tokens"))
    return sharded.groupBy("shard").agg(*cols)


def export_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 0,
    token_col: str | None = None,
) -> dict:
    """Write the shuffled corpus as exactly one parquet file per shard
    under ``path/shard=<n>/`` plus ``path/_manifest.json``; returns the
    manifest dict. Re-running with the same inputs is byte-stable."""
    sharded = assign_shards(df, id_col, n_shards, seed)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    manifest_rows = sorted(
        (
            r.asDict()
            for r in shard_manifest(sharded, id_col, token_col).collect()
        ),
        key=lambda r: r["shard"],
    )
    manifest = {
        "n_shards": n_shards,
        "seed": seed,
        "total_rows": sum(r["n_rows"] for r in manifest_rows),
        "shards": manifest_rows,
    }
    tmp = os.path.join(path, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, "_manifest.json"))
    return manifest


def shard_source_mix(
    sharded: DataFrame,
    source_col: str = "source",
    token_col: str | None = None,
) -> DataFrame:
    """Per-(shard, source) provenance rows — the mix manifest a
    training run records next to the layout checksums: how many docs
    (and tokens) of each source landed in each shard, plus the
    source's integer-exact ppm share of its shard. Because the shuffle
    hash is source-blind, every shard should show approximately the
    corpus-wide mix — a skewed row here means the export was built
    from a filtered or unbalanced input, caught BEFORE training reads
    it. One aggregation, map-side combined."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(token_col).alias("n_tokens"))
    per = sharded.groupBy("shard", source_col).agg(*aggs)
    w_tot = Window.partitionBy("shard")
    return per.select(
        "shard",
        source_col,
        "n_rows",
        *( ["n_tokens"] if token_col is not None else [] ),
        F.floor(
            F.col("n_rows") * 1000000 / F.sum("n_rows").over(w_tot)
        ).cast("long").alias("share_ppm"),
    )
