"""Interleaved A/B: bigram_logprob vocab counted straight off the pinned
bigram blocks (NEW) vs re-aggregated through the freq type table (OLD),
one process, alternating rounds, bit-equality checked."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import split_bytes_for, warm_session  # noqa: E402
from stream_loader_spark.session import get_spark  # noqa: E402
from stream_loader_spark.sources.tables import load_table  # noqa: E402
from stream_loader_spark.operators.text import bigram_logprob, tokens_col  # noqa: E402
from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def bigram_logprob_old(documents: DataFrame, text_col="text", id_col="doc_id") -> DataFrame:
    # pre-change body: vocab derives from freq (extra (prev,cur) agg)
    toks = documents.select(F.col(id_col), tokens_col(F.col(text_col)).alias("toks"))
    bg = (
        toks.where(F.size("toks") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "zip_with(slice(toks, 1, size(toks) - 1),"
                    " slice(toks, 2, size(toks) - 1),"
                    " (a, b) -> struct(a AS prev, b AS cur))"
                )
            ).alias("z"),
        )
        .select(id_col, "z.prev", "z.cur")
        .localCheckpoint(eager=True)
    )
    freq = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c"))
    vocab = freq.agg(F.count_distinct("cur").alias("v"))
    model = freq.select(
        "prev", "cur", "c",
        F.sum("c").over(Window.partitionBy("prev")).alias("cf"),
    ).crossJoin(F.broadcast(vocab))
    model = F.broadcast(model)
    scored = bg.join(model, ["prev", "cur"]).select(
        id_col,
        F.round(F.log((F.col("c") + F.lit(1.0)) / (F.col("cf") + F.col("v"))), 6)
        .cast("decimal(18,6)")
        .alias("lp"),
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum(F.col("lp")).cast("decimal(38,6)").cast("double")
            / F.count(F.lit(1))
        ).alias("mean_logprob"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    split = split_bytes_for(sf_dir)
    spark = get_spark(
        "ab_bigram",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.sql.files.openCostInBytes": str(min(split, 1 << 20)),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
        },
    )
    warm_session(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")

    r_old = sorted(map(tuple, bigram_logprob_old(docs).collect()))
    r_new = sorted(map(tuple, bigram_logprob(docs).collect()))
    print(f"rows old={len(r_old)} new={len(r_new)} identical={r_old == r_new}")
    assert r_old == r_new

    def run(fn) -> float:
        t0 = time.time()
        fn(docs).write.format("noop").mode("overwrite").save()
        took = time.time() - t0
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist(True)
        return took

    olds, news = [], []
    for i in range(5):
        olds.append(run(bigram_logprob_old))
        news.append(run(bigram_logprob))
        print(f"round {i}: old={olds[-1]:.3f}s new={news[-1]:.3f}s")
    olds.sort(); news.sort()
    print(
        f"OLD min={olds[0]:.3f} med={olds[len(olds)//2]:.3f} | "
        f"NEW min={news[0]:.3f} med={news[len(news)//2]:.3f}"
    )


if __name__ == "__main__":
    main()
