"""Interleaved A/B: dsir hashed_feature_counts scatter(by=doc_id) vs the
old round-robin scatter, in ONE process (box-noise protocol).

Variant NEW = current source. Variant OLD = monkeypatched scatter that
ignores ``by`` (exactly the pre-change call shape). Alternating rounds,
min/median reported, results compared bit-for-bit.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import split_bytes_for, warm_session  # noqa: E402
from stream_loader_spark.session import get_spark  # noqa: E402
from stream_loader_spark.sources.tables import load_table, scatter  # noqa: E402
import stream_loader_spark.operators.dsir as dsir_mod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def old_scatter(df, min_partitions=None, by=()):
    # pre-change call shape: plain round-robin scatter, no hash key
    return scatter(df, min_partitions)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    split = split_bytes_for(sf_dir)
    spark = get_spark(
        "ab_dsir",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.sql.files.openCostInBytes": str(min(split, 1 << 20)),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
        },
    )
    warm_session(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    is_target = F.col("source").isin("src0", "src1", "src2", "src3")

    def run(variant: str) -> float:
        dsir_mod.scatter = old_scatter if variant == "old" else scatter
        t0 = time.time()
        dsir_mod.dsir_logratio(docs, is_target=is_target).write.format(
            "noop"
        ).mode("overwrite").save()
        took = time.time() - t0
        dsir_mod.scatter = scatter
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist(True)
        return took

    # result equality first (sorted collect)
    dsir_mod.scatter = old_scatter
    r_old = sorted(map(tuple, dsir_mod.dsir_logratio(docs, is_target=is_target).collect()))
    dsir_mod.scatter = scatter
    r_new = sorted(map(tuple, dsir_mod.dsir_logratio(docs, is_target=is_target).collect()))
    print(f"rows old={len(r_old)} new={len(r_new)} identical={r_old == r_new}")
    assert r_old == r_new

    olds, news = [], []
    for i in range(5):
        olds.append(run("old"))
        news.append(run("new"))
        print(f"round {i}: old={olds[-1]:.3f}s new={news[-1]:.3f}s")
    olds.sort(); news.sort()
    print(
        f"OLD min={olds[0]:.3f} med={olds[len(olds)//2]:.3f} | "
        f"NEW min={news[0]:.3f} med={news[len(news)//2]:.3f}"
    )


if __name__ == "__main__":
    main()
