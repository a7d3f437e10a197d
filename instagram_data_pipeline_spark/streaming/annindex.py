"""Streaming ANN-index ingestion: a foreachBatch sink that folds
arriving embedding batches into the persisted IVF index
(extensions.similarity.ivf_index_*) — the vector-side sibling of
streaming/neardup.py.

Assignment against FROZEN centroids is a pure per-vector function, so
(unlike the near-dup sink) a batch's decisions never depend on index
state: replay safety needs only per-batch partition overwrite, and
append-then-probe stays exactly equivalent to a full rebuild (the
property ivf_incremental_topk hash-proves in batch mode).

What state the sink does track is DRIFT: per batch it appends one row
per cluster with that batch's assignment counts. As the ingested
distribution drifts away from the centroids' training distribution,
list balance degrades and recall follows — the drift table is the
retrain trigger (compare early-epoch vs late-epoch shares, e.g. with
extensions.sketches.histogram_drift).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extensions.similarity import ivf_index_build, ivf_index_topk


class IvfIndexSink:
    """foreachBatch target writing ``<root>/{index,stats}/batch=<id>``.

    ``centroids``: the frozen (cluster, centroid array<double>) frame
    from a trainer run (kmeans_centroids_train / label centroids);
    persisted once under ``<root>/centroids`` so a restarted stream
    reuses the exact same model."""

    def __init__(
        self,
        root: str,
        centroids: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        self.root = root
        self.id_col = id_col
        self.vec_col = vec_col
        cpath = os.path.join(root, "centroids")
        if not os.path.isdir(cpath):
            centroids.write.mode("overwrite").parquet(cpath)
        self._spark = centroids.sparkSession

    def centroids(self) -> DataFrame:
        return self._spark.read.parquet(os.path.join(self.root, "centroids"))

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        cents = self.centroids()
        rows = ivf_index_build(batch, cents, self.id_col, self.vec_col)
        rows.write.mode("overwrite").parquet(
            os.path.join(self.root, "index", f"batch={batch_id}")
        )
        stats = rows.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n_assigned")
        )
        stats.write.mode("overwrite").parquet(
            os.path.join(self.root, "stats", f"batch={batch_id}")
        )

    def run_available_now(self, stream: DataFrame, checkpoint: str) -> None:
        q = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def index(self, spark: SparkSession) -> DataFrame:
        path = os.path.join(self.root, "index")
        return spark.read.option("basePath", path).parquet(path).drop("batch")

    def drift_stats(self, spark: SparkSession) -> DataFrame:
        path = os.path.join(self.root, "stats")
        return spark.read.option("basePath", path).parquet(path)

    def topk(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 2,
        query_id_col: str = "query_id",
    ) -> DataFrame:
        """Probe the full ingested index."""
        return ivf_index_topk(
            self.index(spark),
            self.centroids(),
            queries,
            self.id_col,
            self.vec_col,
            query_id_col,
            k,
            n_probe,
        )
