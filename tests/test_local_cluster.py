"""Multi-JVM executor smoke: the exactly-once file sink and the
broadcast/shuffle surface on ``local-cluster[2,2,...]``.

Every other test runs ``local[32]`` — one JVM, executors as threads —
which cannot catch closure-serialization or cross-process shuffle
issues (a sink object captured by a task, a broadcast that only worked
because the "executor" shared the driver's heap). local-cluster spawns
REAL separate executor JVMs with their own Python workers, the closest
local approximation of a production cluster.

Spark allows one active SparkContext per process and the suite's
session fixture owns it, so this test runs the cluster in a
SUBPROCESS — full isolation, no fixture interference.
"""

from __future__ import annotations

import pytest

import os
import subprocess
import sys

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import sys, tempfile
from datetime import datetime, timezone

sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from stream_loader_spark.streaming.pipeline import StreamPipeline
from stream_loader_spark.sinks.manifest import ManifestFileSink

spark = (
    SparkSession.builder.master("local-cluster[2,2,2048]")
    # executor Python workers are separate processes that don't inherit
    # the driver's sys.path — ship the package location the way a real
    # cluster would (PYTHONPATH / --py-files)
    .config("spark.executorEnv.PYTHONPATH", sys.argv[1])
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "true")
    .config("spark.ui.enabled", "false")
    .appName("lc-smoke")
    .getOrCreate()
)
tmp = tempfile.mkdtemp(prefix="lc_smoke_")
src = f"{tmp}/src"
ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
schema = "topic string, partition int, offset bigint, ts timestamp"
for i in range(3):
    spark.createDataFrame(
        [("t", 0, i * 10 + j, ts) for j in range(10)], schema
    ).coalesce(1).write.parquet(f"{src}/f{i}")

# exactly-once manifest sink end-to-end across real executor JVMs
sink = ManifestFileSink(f"{tmp}/out")
(
    StreamPipeline(spark)
    .from_file_stream(f"{src}/*", schema, maxFilesPerTrigger=1)
    .sink(sink, f"{tmp}/cp")
    .run_available()
)
data = sink.committed_data(spark)
assert data.count() == 30, data.count()
assert data.select("offset").distinct().count() == 30
pos = sink.committed_positions()
assert pos[("t", 0)].offset == 30, pos

# broadcast join + shuffle aggregation crossing executor processes
big = spark.range(10000).selectExpr("id", "id % 97 as k")
dim = spark.createDataFrame([(i, f"d{i}") for i in range(97)], "k long, name string")
out = big.join(F.broadcast(dim), "k").groupBy("name").count().collect()
assert len(out) == 97 and sum(r["count"] for r in out) == 10000

# higher-order-function pipeline (the dedup/text family's hot path)
# through a real cross-process shuffle
docs = spark.createDataFrame(
    [(i, " ".join(f"w{(i + j) % 5}" for j in range(6))) for i in range(200)],
    "doc_id long, text string",
)
toks = docs.select(
    "doc_id", F.explode(F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))).alias("tok")
)
counts = toks.groupBy("tok").count().collect()
assert sum(r["count"] for r in counts) == 1200

# Arrow-batched mapInPandas partial aggregation (the covariance moment
# fold) across real executor Python workers: partials serialize over
# Arrow from separate processes, the long combine crosses the shuffle
import numpy as np
from stream_loader_spark.operators.embstats import embedding_covariance

rng = np.random.default_rng(2)
X = rng.normal(scale=0.25, size=(120, 4)).astype(np.float32)
emb = spark.createDataFrame(
    [(i, x.tolist()) for i, x in enumerate(X)],
    "vec_id long, embedding array<float>",
).repartition(4)
cov = {(r.i, r.j): r.cov for r in embedding_covariance(emb, dim=4).collect()}
assert len(cov) == 10
S = np.where(X >= 0, np.floor(X.astype(np.float64) * 1e6 + 0.5),
             -np.floor(-X.astype(np.float64) * 1e6 + 0.5)).astype(np.int64)
n = float(len(S))
want = (float(np.sum(S[:, 0] * S[:, 0])) / 1e12
        - (S[:, 0].sum() / 1e6) ** 2 / n) / n
assert abs(cov[(0, 0)] - round(want, 6)) <= 1e-6, (cov[(0, 0)], want)

# blocked fuzzy join (distinct-compression + expansion joins) across
# executor processes
from stream_loader_spark.operators.fuzzy import blocked_fuzzy_pairs

names = spark.createDataFrame(
    [(i, ["alpha", "alphq", "beta", "gamma"][i % 4], "B") for i in range(40)],
    "id long, name string, blk string",
)
fp = blocked_fuzzy_pairs(names, "id", "name", ["blk"], 1).collect()
# alpha↔alphq pairs (10×10) + same-name pairs (4 groups of 10 → 45 each)
assert len(fp) == 100 + 4 * 45, len(fp)

# iterative Pregel loop (pagerank) across executor processes: per-round
# localCheckpoint blocks live on REAL executors here, and the broadcast
# path collects |V| rows from them each round — both invisible on
# local[n] where executor storage shares the driver heap
from stream_loader_spark.operators.graph import pagerank

edges = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1), (4, 1), (1, 4), (5, 1)]
edf = spark.createDataFrame(edges, "src long, dst long")
dist = {r.node: r.rank_scaled for r in pagerank(edf, iterations=3).collect()}
bcast = {
    r.node: r.rank_scaled
    for r in pagerank(edf, iterations=3, broadcast_ranks=True).collect()
}
assert dist == bcast and len(dist) == 5, (dist, bcast)
# pure-python fixed-point reference (same integer arithmetic)
deg = {}
for s_, _ in set(edges):
    deg[s_] = deg.get(s_, 0) + 1
r = {n: 10**9 for n in {x for e in edges for x in e}}
for _ in range(3):
    msg = {}
    for s_, d_ in set(edges):
        msg[d_] = msg.get(d_, 0) + r[s_] // deg[s_]
    r = {n: 15 * 10**9 // 100 + (85 * msg.get(n, 0)) // 100 for n in r}
assert dist == r, (dist, r)

print("LC-OK")
spark.stop()
"""


class TestLocalClusterSmoke:
    def test_manifest_sink_and_shuffle_on_separate_executor_jvms(self, tmp_path):
        script_path = tmp_path / "lc_smoke.py"
        script_path.write_text(SCRIPT)
        proc = subprocess.run(
            [sys.executable, str(script_path), REPO],
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "LC-OK" in proc.stdout
