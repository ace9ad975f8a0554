"""Pins the scale-probe harness (tools/scale_probe.py): the replication
semantics SCALE_TREND.md's exponents depend on.

What must hold for the trend to measure corpus GROWTH rather than
replication artifacts:

* document replicas are token-disjoint from the original (replicated
  text never collides in shingle space), while replica 0 is bit-equal
  to the source corpus;
* embedding replicas preserve within-replica dot products EXACTLY
  (sign-flip transform) and are quasi-orthogonal across replicas —
  an additive perturbation here once inflated the near-dup exponent
  to 1.7 by manufacturing cross-replica duplicate clusters;
* ids are disjoint across replicas; non-scaled tables stay readable
  (symlinked); the tier build is idempotent (completion marker).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from tools.scale_probe import build_tier, ID_STRIDE

SF = "/root/testdata/sf0.001"


class TestScaleProbeTiers:
    def _tier(self, spark, tmp_path, mult=2):
        return build_tier(spark, SF, mult, str(tmp_path / "scratch"))

    def test_document_replicas_token_disjoint_and_replica0_identical(
        self, spark, tmp_path
    ):
        tier = self._tier(spark, tmp_path)
        docs = spark.read.parquet(os.path.join(tier, "documents.parquet"))
        src = spark.read.parquet(os.path.join(SF, "documents.parquet"))
        r0 = docs.where(F.col("doc_id") < ID_STRIDE)
        assert r0.count() == src.count()
        assert r0.exceptAll(src).count() == 0  # replica 0 bit-equal
        # replica 1 tokens all carry the tag -> disjoint shingle space
        r1_toks = (
            docs.where(F.col("doc_id") >= ID_STRIDE)
            .select(F.explode(F.split(F.col("text"), r"\s+")).alias("tok"))
            .where(F.col("tok") != "")
        )
        untagged = r1_toks.where(~F.col("tok").startswith("r1")).count()
        assert untagged == 0

    def test_embedding_replicas_preserve_within_cosines_exactly(
        self, spark, tmp_path
    ):
        tier = self._tier(spark, tmp_path)
        emb = spark.read.parquet(os.path.join(tier, "embeddings.parquet"))
        src = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
        # within-replica dot products == source dot products, exactly:
        # pick the two smallest-id vectors and compare across replicas
        a0, b0 = [
            r["embedding"]
            for r in src.orderBy("vec_id").limit(2).collect()
        ]
        a1, b1 = [
            r["embedding"]
            for r in emb.where(F.col("vec_id") >= ID_STRIDE)
            .orderBy("vec_id")
            .limit(2)
            .collect()
        ]
        dot = lambda x, y: sum(float(i) * float(j) for i, j in zip(x, y))  # noqa: E731
        assert dot(a0, b0) == dot(a1, b1)  # exact, not approximate
        assert dot(a0, a0) == dot(a1, a1)  # norms preserved
        # cross-replica: quasi-orthogonal, far below any near-dup bar
        cos = dot(a0, a1) / math.sqrt(dot(a0, a0) * dot(a1, a1))
        assert abs(cos) < 0.6

    def test_ids_disjoint_and_idempotent_rebuild(self, spark, tmp_path):
        tier = self._tier(spark, tmp_path)
        ev = spark.read.parquet(os.path.join(tier, "events.parquet"))
        n = ev.count()
        assert ev.select("event_id").distinct().count() == n
        # events replica offsets are monotone per replica block
        assert (
            ev.where(
                (F.col("event_id") >= ID_STRIDE) & (F.col("event_id") < 2 * ID_STRIDE)
            ).count()
            == n // 2
        )
        # non-scaled tables readable through the symlinks
        assert spark.read.parquet(os.path.join(tier, "region.parquet")).count() > 0
        # second build call reuses the completed tier (marker present)
        marker = os.path.join(tier, "_PROBE_TIER_COMPLETE")
        mtime = os.stat(marker).st_mtime_ns
        assert build_tier(spark, SF, 2, str(tmp_path / "scratch")) == tier
        assert os.stat(marker).st_mtime_ns == mtime
