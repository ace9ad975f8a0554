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

import os
import subprocess
import sys

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
