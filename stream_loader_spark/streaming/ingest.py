"""Streaming corpus ingest: per-micro-batch dedup against history.

Composes the incremental training-corpus operators with Structured
Streaming: each micro-batch of documents is exact-deduped within
itself and against the persisted content-hash history, survivors land
in the corpus directory, and exactly their hashes are appended to the
history — so the history table stays the authoritative 32-bytes-per-
document dedup state across restarts.

Exactly-once shape (same discipline as sinks/manifest.py): both the
corpus rows and the history append for batch ``n`` write to
deterministic ``batch=n`` subdirectories in overwrite mode, so a
replayed batch overwrites its own output instead of duplicating it —
and because the batch's own hashes live in ``batch=n`` of the history,
a replay reads a history WITHOUT that batch's hashes (its own partial
write is overwritten, not double-counted).

Scale: the per-batch work is the batch's hash aggregate plus an
anti-join against the history table; with both sides bucketed on
content_hash (operators/bucketing.py) the anti-join co-locates. The
history grows 32 bytes per unique document — at 10B documents that is
~320 GB, a normal Spark table, never driver-resident.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_loader_spark.operators.dedup import incremental_exact_dedup


class DedupIngestSink:
    """``foreachBatch`` callable: dedup each batch against history and
    append survivors.

    Layout under ``out_dir``::

        corpus/batch=<n>/   surviving document rows (+ content_hash)
        hashes/batch=<n>/   exactly the hashes this batch added
    """

    def __init__(self, out_dir: str, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.out_dir = out_dir
        self.text_col = text_col
        self.id_col = id_col
        os.makedirs(self._hashes_dir, exist_ok=True)

    @property
    def _corpus_dir(self) -> str:
        return os.path.join(self.out_dir, "corpus")

    @property
    def _hashes_dir(self) -> str:
        return os.path.join(self.out_dir, "hashes")

    def _history(self, spark: SparkSession, exclude_batch: int) -> DataFrame:
        """All committed hashes EXCEPT the given batch's own (a replay
        must not see its previous partial write as 'history')."""
        try:
            hist = spark.read.option("basePath", self._hashes_dir).parquet(
                self._hashes_dir
            )
        except Exception:  # noqa: BLE001 — no batches yet
            return spark.createDataFrame([], "content_hash string")
        if "batch" in hist.columns:
            hist = hist.where(F.col("batch") != exclude_batch)
        return hist.select("content_hash")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        seen = self._history(spark, exclude_batch=batch_id)
        survivors = incremental_exact_dedup(
            batch_df, seen, text_col=self.text_col, id_col=self.id_col
        )
        # deterministic dirs + overwrite = replay-safe (see module doc)
        survivors.write.mode("overwrite").parquet(
            os.path.join(self._corpus_dir, f"batch={batch_id}")
        )
        survivors.select("content_hash").write.mode("overwrite").parquet(
            os.path.join(self._hashes_dir, f"batch={batch_id}")
        )

    def committed_corpus(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self._corpus_dir).parquet(
            self._corpus_dir
        )


class NearDupIngestSink:
    """``foreachBatch`` callable: near-dup gate each batch against the
    corpus's persisted LSH band index.

    Policy per micro-batch (the practical ingest rule):

    - a batch document near-dup to ANY historical document is dropped
      (history always wins — it is already written);
    - within the batch, near-dup clusters keep their min-id member
      (connected components over the batch-only pairs);
    - survivors' band rows are appended to the index under
      ``bands/batch=<n>`` — deterministic dir + overwrite, so replays
      are idempotent and a replay never sees its own partial append
      as history.

    Scale: the per-batch cost is the batch's own MinHash (corpus text
    is shingled only for collision-touched ids, see
    ``incremental_near_dup_pairs``); the index grows NUM_BANDS rows
    (~a few hundred bytes) per kept document.
    """

    def __init__(self, out_dir: str, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.out_dir = out_dir
        self.text_col = text_col
        self.id_col = id_col
        os.makedirs(self._bands_dir, exist_ok=True)

    @property
    def _corpus_dir(self) -> str:
        return os.path.join(self.out_dir, "corpus")

    @property
    def _bands_dir(self) -> str:
        return os.path.join(self.out_dir, "bands")

    @property
    def _docs_dir(self) -> str:
        return os.path.join(self.out_dir, "docs")

    def _index(self, spark: SparkSession, exclude_batch: int):
        empty_bands = spark.createDataFrame(
            [], f"{self.id_col} long, band int, band_hash bigint"
        )
        empty_docs = spark.createDataFrame(
            [], f"{self.id_col} long, {self.text_col} string"
        )
        try:
            bands = spark.read.option("basePath", self._bands_dir).parquet(
                self._bands_dir
            )
            docs = spark.read.option("basePath", self._docs_dir).parquet(
                self._docs_dir
            )
        except Exception:  # noqa: BLE001 — no batches yet
            return empty_bands, empty_docs
        if "batch" in bands.columns:
            bands = bands.where(F.col("batch") != exclude_batch)
            docs = docs.where(F.col("batch") != exclude_batch)
        return (
            bands.select(self.id_col, "band", "band_hash"),
            docs.select(self.id_col, self.text_col),
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from stream_loader_spark.operators.dedup import (
            band_index,
            dedup_components,
            incremental_near_dup_pairs,
        )

        spark = batch_df.sparkSession
        hist_bands, hist_docs = self._index(spark, exclude_batch=batch_id)
        batch_df = batch_df.persist()
        pairs = incremental_near_dup_pairs(
            batch_df, hist_docs, hist_bands, self.text_col, self.id_col
        ).persist()

        hist_hit = (
            pairs.join(hist_docs.select(self.id_col).withColumnRenamed(self.id_col, "doc_a"), "doc_a")
            .select(F.col("doc_b").alias(self.id_col))
            .union(
                pairs.join(
                    hist_docs.select(self.id_col).withColumnRenamed(self.id_col, "doc_b"),
                    "doc_b",
                ).select(F.col("doc_a").alias(self.id_col))
            )
            .distinct()
        )
        remaining = batch_df.join(hist_hit, self.id_col, "left_anti")
        # batch-only pairs among still-standing docs -> min-id per cluster
        rem_ids = remaining.select(self.id_col)
        batch_pairs = (
            pairs.join(rem_ids.withColumnRenamed(self.id_col, "doc_a"), "doc_a")
            .join(rem_ids.withColumnRenamed(self.id_col, "doc_b"), "doc_b")
            .select("doc_a", "doc_b")
        )
        comps = dedup_components(remaining, batch_pairs, self.id_col)
        losers = comps.where(F.col(self.id_col) != F.col("cluster_id")).select(self.id_col)
        survivors = remaining.join(losers, self.id_col, "left_anti").persist()

        survivors.write.mode("overwrite").parquet(
            os.path.join(self._corpus_dir, f"batch={batch_id}")
        )
        survivors.select(self.id_col, self.text_col).write.mode("overwrite").parquet(
            os.path.join(self._docs_dir, f"batch={batch_id}")
        )
        band_index(survivors, self.text_col, self.id_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(self._bands_dir, f"batch={batch_id}"))
        pairs.unpersist()
        batch_df.unpersist()
        survivors.unpersist()

    def committed_corpus(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self._corpus_dir).parquet(
            self._corpus_dir
        )


class IvfIngestSink:
    """``foreachBatch`` callable: streaming maintenance of an IVF
    similarity index — the ANN twin of ``DedupIngestSink``.

    - The coarse quantizer (centroids) trains ONCE on the first
      non-empty batch (Lloyd refinement of the batch's smallest-id
      vectors) and is frozen thereafter — the standard IVF discipline:
      a quantizer that drifted per batch would strand earlier
      assignments in stale cells.
    - Every batch's vectors are assigned to their nearest centroid
      (broadcast argmax, one corpus pass) and land under
      ``assignments/batch=<n>/cluster_id=<c>/`` — Hive-partitioned by
      cluster, so a probe reads only its nprobe clusters' directories
      AT THE SCAN, at any index size.
    - Deterministic dirs + overwrite keep replays idempotent (same
      discipline as the dedup ingest sinks); training is deterministic,
      so a replayed first batch rewrites the identical quantizer.

    ``topk`` probes the persisted index via ``ivf_probe`` — queries
    never trigger an index rebuild.
    """

    def __init__(
        self,
        out_dir: str,
        num_centroids: int = 16,
        kmeans_iterations: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        self.out_dir = out_dir
        self.num_centroids = num_centroids
        self.kmeans_iterations = kmeans_iterations
        self.id_col = id_col
        self.vec_col = vec_col
        os.makedirs(self.out_dir, exist_ok=True)

    @property
    def _centroids_dir(self) -> str:
        return os.path.join(self.out_dir, "centroids")

    @property
    def _assignments_dir(self) -> str:
        return os.path.join(self.out_dir, "assignments")

    def centroids(self, spark: SparkSession) -> DataFrame | None:
        try:
            return spark.read.parquet(self._centroids_dir)
        except Exception:  # noqa: BLE001 — not trained yet
            return None

    def _train(self, batch_df: DataFrame) -> DataFrame:
        from stream_loader_spark.operators.similarity import kmeans_centroids

        spark = batch_df.sparkSession
        rows = (
            batch_df.orderBy(F.col(self.id_col))
            .limit(self.num_centroids)
            .select(self.vec_col)
            .collect()
        )  # ≤ num_centroids × dim values — never corpus-sized
        initial = spark.createDataFrame(
            [(i, [float(x) for x in r[0]]) for i, r in enumerate(rows)],
            "centroid_id int, centroid_vec array<double>",
        )
        if self.kmeans_iterations <= 0:
            return initial
        return kmeans_centroids(
            batch_df,
            min(self.num_centroids, len(rows)),
            self.kmeans_iterations,
            self.id_col,
            self.vec_col,
            initial=initial,
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from stream_loader_spark.operators.similarity import assign_clusters

        spark = batch_df.sparkSession
        cents = self.centroids(spark)
        if cents is None:
            if not batch_df.take(1):
                return  # nothing to train on yet
            self._train(batch_df).write.mode("overwrite").parquet(
                self._centroids_dir
            )
            cents = self.centroids(spark)
        assigned = assign_clusters(
            batch_df,
            self.num_centroids,
            self.id_col,
            self.vec_col,
            centroids=cents,
        )
        assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(
            os.path.join(self._assignments_dir, f"batch={batch_id}")
        )

    def assignments(self, spark: SparkSession) -> DataFrame:
        return (
            spark.read.option("basePath", self._assignments_dir)
            .parquet(self._assignments_dir)
            .select(self.id_col, self.vec_col, "cluster_id")
        )

    def topk(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 4,
    ) -> DataFrame:
        """Approximate top-k over the committed index. ``queries`` is
        (query_id, query_vec); with nprobe = num_centroids the probe is
        exhaustive and the result exact."""
        from stream_loader_spark.operators.similarity import ivf_probe

        cents = self.centroids(spark)
        if cents is None:
            raise ValueError(f"no trained index under {self.out_dir}")
        return ivf_probe(
            self.assignments(spark),
            cents,
            queries,
            k,
            nprobe,
            self.id_col,
            self.vec_col,
        )
