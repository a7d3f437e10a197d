"""Streaming NEAR-dup dedup: a foreachBatch sink that maintains the
persistent MinHash-LSH index (extensions.dedup.lsh_index_*) across
micro-batches.

Exact streaming dedup (streaming/dedup.py) collapses redelivered
copies; this sink goes further: each micro-batch is near-dup-checked
against everything kept so far, intra-batch near-dups are dropped, and
only the kept docs' signatures/band rows are appended to the index —
the streaming form of the incremental_minhash_dedup query.

Reference scope note: the reference repo
(instagram_pipeline/scraper/instagram_scraper.py) lands follower pages
append-only with no content dedup at all; this operator is part of the
§2.12 training-data extension family.

Replay safety WITHOUT a fence: every persisted table (kept docs,
decisions, signatures, band rows) is written to a ``batch=<id>``
partition directory with overwrite, and the probe reads the index
FILTERED to ``batch < current`` — so a redelivered micro-batch
recomputes identical decisions (its own half-written rows are invisible
to it) and overwrites its own partitions byte-for-byte. foreachBatch's
at-least-once replay therefore converges to exactly-once output.

Scale shape per micro-batch: signature agg over the batch (one
shuffle), band equi-join against the index (one shuffle; at scale the
index is bucketed by (band_id, band_hash) so this is a co-located
join), intra-batch LSH self-join (batch-sized, small), and blind
partition appends — the corpus-sized index is never rewritten, and
corpus text is never re-read (verification is signature agreement).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..extensions.dedup import (
    lsh_band_rows,
    lsh_candidate_pairs,
    lsh_index_probe,
    minhash_signatures,
)


class NearDupIndexSink:
    """foreachBatch target maintaining ``<root>/{kept,decisions,sigs,
    index}/batch=<id>`` parquet partitions plus the probe/append logic.

    Within-batch policy: a doc is dropped when it near-matches ANY
    lower-id doc of the same batch (non-recursive — a doc matching only
    dropped docs is still kept and enters the index; deterministic and
    single-pass, documented over-keep on chains).
    """

    def __init__(
        self,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        num_hashes: int = 32,
        bands: int = 8,
        threshold: float = 0.5,
        max_bucket: int | None = None,
        portable: bool = False,
    ) -> None:
        self.root = root
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.threshold = threshold
        self.max_bucket = max_bucket
        self.portable = portable

    # -- persisted-table plumbing -------------------------------------------
    def _sig_schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(self.id_col, T.LongType()),
                T.StructField("signature", T.ArrayType(T.LongType())),
            ]
        )

    def _band_schema(self) -> T.StructType:
        hash_t = T.StringType() if self.portable else T.LongType()
        return T.StructType(
            [
                T.StructField(self.id_col, T.LongType()),
                T.StructField("band_id", T.IntegerType()),
                T.StructField("band_hash", hash_t),
            ]
        )

    def _read_parts(
        self, spark: SparkSession, name: str, schema: T.StructType,
        before_batch: int,
    ) -> DataFrame:
        """All ``batch < before_batch`` partitions of a persisted table,
        or an empty typed frame when nothing has been committed yet."""
        path = os.path.join(self.root, name)
        if not any(
            e.startswith("batch=") for e in (
                os.listdir(path) if os.path.isdir(path) else []
            )
        ):
            return spark.createDataFrame([], schema)
        df = spark.read.option("basePath", path).parquet(path)
        return df.filter(F.col("batch") < before_batch).drop("batch")

    def _write_part(self, df: DataFrame, name: str, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(self.root, name, f"batch={batch_id}")
        )

    # -- the batch body ------------------------------------------------------
    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        rows_per_band = self.num_hashes // self.bands
        corpus_sigs = self._read_parts(
            spark, "sigs", self._sig_schema(), batch_id
        )
        corpus_idx = self._read_parts(
            spark, "index", self._band_schema(), batch_id
        )
        # one signature pass over the batch feeds the index probe, the
        # intra-batch pass, AND (filtered to kept) the index append
        batch_sigs = minhash_signatures(
            batch, self.id_col, self.text_col, self.n, self.num_hashes,
            self.portable,
        ).localCheckpoint()
        # vs the already-kept corpus
        idx_dec = lsh_index_probe(
            corpus_sigs,
            corpus_idx,
            batch,
            self.id_col,
            self.text_col,
            self.n,
            self.num_hashes,
            self.bands,
            self.threshold,
            self.max_bucket,
            self.portable,
            batch_sigs=batch_sigs,
        )
        # vs lower-id docs of the SAME batch (pairs come doc_a < doc_b)
        pairs = lsh_candidate_pairs(
            batch_sigs, self.id_col, self.bands, rows_per_band, self.portable
        )
        agree = F.aggregate(
            F.zip_with(
                F.col("_sa"), F.col("_sb"), lambda x, y: (x == y).cast("int")
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        intra = (
            pairs.join(
                batch_sigs.select(
                    F.col(self.id_col).alias("doc_a"),
                    F.col("signature").alias("_sa"),
                ),
                "doc_a",
            )
            .join(
                batch_sigs.select(
                    F.col(self.id_col).alias("doc_b"),
                    F.col("signature").alias("_sb"),
                ),
                "doc_b",
            )
            .filter(agree * F.lit(1.0) / self.num_hashes >= self.threshold)
            .select(F.col("doc_b").alias(self.id_col))
            .distinct()
        )
        decisions = (
            idx_dec.join(
                intra.withColumn("_intra", F.lit(True)), self.id_col, "left"
            )
            .select(
                self.id_col,
                F.when(
                    (F.col("decision") == "drop") | F.col("_intra").isNotNull(),
                    F.lit("drop"),
                )
                .otherwise(F.lit("keep"))
                .alias("decision"),
            )
        )
        keep_ids = decisions.filter(F.col("decision") == "keep").select(
            self.id_col
        )
        kept = batch.join(keep_ids, self.id_col, "semi")
        kept_sigs = batch_sigs.join(keep_ids, self.id_col, "semi")
        kept_bands = lsh_band_rows(
            kept_sigs, self.id_col, self.bands, rows_per_band, self.portable
        )
        self._write_part(kept, "kept", batch_id)
        self._write_part(decisions, "decisions", batch_id)
        self._write_part(kept_sigs, "sigs", batch_id)
        self._write_part(kept_bands, "index", batch_id)

    # -- stream driver -------------------------------------------------------
    def run_available_now(self, stream: DataFrame, checkpoint: str) -> None:
        """Drain the stream through the sink (foreachBatch, availableNow)."""
        q = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def results(self, spark: SparkSession, name: str = "decisions") -> DataFrame:
        """Read back a persisted table across all batches (with the
        ``batch`` partition column)."""
        path = os.path.join(self.root, name)
        return spark.read.option("basePath", path).parquet(path)
