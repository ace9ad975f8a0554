"""Streaming-ingest throughput benchmark: the one reference capability
with no quantitative coverage until round 9 (the reference's entire
published perf story is loader overhead — reference README.md:92-100).

Drives the two stateful foreachBatch sinks over N micro-batches of the
events fixture and records:

* **rows/s** end-to-end (plan + write + two-phase commit per batch);
* **commit latency** p50/p95 per micro-batch;
* **recovery time vs committed-batch count** — the manifest recovery
  path is a JSON-per-batch directory scan (sinks/manifest.py:273), so
  this is the number that would grow unbounded at 100k batches;
* **recovery after compaction + vacuum** — proving the existing
  compaction bounds that growth (one consolidated record replaces the
  per-batch tail);
* a **synthetic manifest-scan curve** (dataless manifests at 100/1k/5k
  batches) isolating the pure scan cost from Spark write time.

Prints ONE JSON line and stamps INGEST_BENCH.json at the repo root.

Usage::

    python tools/ingest_bench.py                   # sf0.1, 60 batches
    INGEST_BENCH_BATCHES=10 python tools/ingest_bench.py --sf /root/testdata/sf0.001
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from stream_loader_spark.session import get_spark  # noqa: E402
from stream_loader_spark.sources.kafka_view import as_stream_records  # noqa: E402


def _pctl(sorted_vals: list[float], q: float) -> float:
    if not sorted_vals:
        return 0.0
    i = min(len(sorted_vals) - 1, int(round(q * (len(sorted_vals) - 1))))
    return sorted_vals[i]


def bench_manifest_sink(spark, rec, n_batches: int, root: str) -> dict:
    from stream_loader_spark.sinks.manifest import ManifestFileSink

    sink = ManifestFileSink(os.path.join(root, "manifest_sink"))
    hi = int(rec.agg(F.max("offset")).first()[0]) + 1
    slice_col = F.expr(f"CAST((offset * {n_batches}) DIV {hi} AS INT)")
    total_rows = rec.count()

    lat_ms: list[float] = []
    recovery_curve: dict[str, float] = {}
    checkpoints = sorted({max(1, n_batches // 4), max(1, n_batches // 2), n_batches})
    t_start = time.time()
    for b in range(n_batches):
        t0 = time.time()
        sink.write_batch(rec.where(slice_col == b), b)
        lat_ms.append((time.time() - t0) * 1000)
        if (b + 1) in checkpoints:
            t0 = time.time()
            pos = sink.committed_positions()
            recovery_curve[str(b + 1)] = round((time.time() - t0) * 1000, 1)
            assert pos, "recovery returned no positions"
    wall = time.time() - t_start

    # compaction bounds the manifest/data-dir growth: one consolidated
    # record + dir replaces the whole committed tail, vacuum removes it
    t0 = time.time()
    target = sink.compact_data(spark)
    compact_ms = (time.time() - t0) * 1000
    removed = sink.vacuum()
    t0 = time.time()
    pos_after = sink.committed_positions()
    recovery_after_ms = (time.time() - t0) * 1000
    assert pos_after == pos, "compaction changed recovered positions"

    lat_sorted = sorted(lat_ms)
    return {
        "batches": n_batches,
        "rows": total_rows,
        "rows_per_sec": round(total_rows / wall, 1),
        "wall_sec": round(wall, 2),
        "commit_p50_ms": round(_pctl(lat_sorted, 0.5), 1),
        "commit_p95_ms": round(_pctl(lat_sorted, 0.95), 1),
        "recovery_ms_by_batches": recovery_curve,
        "compact_ms": round(compact_ms, 1),
        "vacuumed_paths": len(removed),
        "recovery_after_compaction_ms": round(recovery_after_ms, 1),
        "compacted_dir": bool(target),
    }


def bench_upsert_sink(spark, rec, n_batches: int, root: str) -> dict:
    from stream_loader_spark.sinks.upsert import UpsertSink

    sink = UpsertSink(
        os.path.join(root, "upsert_sink"),
        key_cols=["topic", "partition"],
        order_col="offset",
    )
    base = rec.where(F.col("topic").isNotNull() & F.col("partition").isNotNull())
    hi = int(base.agg(F.max("offset")).first()[0]) + 1
    slice_col = F.expr(f"CAST((offset * {n_batches}) DIV {hi} AS INT)")
    total_rows = base.count()

    lat_ms: list[float] = []
    t_start = time.time()
    for b in range(n_batches):
        t0 = time.time()
        sink.write_batch(base.where(slice_col == b), b)
        lat_ms.append((time.time() - t0) * 1000)
    wall = time.time() - t_start

    # min-of-3 on BOTH recovery reads: current_state resolves the SAME
    # live bucket-version dirs before and after vacuum (vacuum removes
    # only unreachable versions), so any before/after delta is
    # measurement, not plan — the r10 artifact's single-sample reads
    # recorded recovery_after_vacuum (846ms) > recovery (661ms), which
    # was GC/listing noise right after the write loop and the rmtree
    # sweep, not a real regression.
    def _state_count_ms() -> tuple[int, float]:
        best, n = None, 0
        for _ in range(3):
            t0 = time.time()
            n = sink.current_state(spark).count()
            took = (time.time() - t0) * 1000
            best = took if best is None else min(best, took)
        return n, best

    n_state, recovery_ms = _state_count_ms()
    removed = sink.vacuum(keep_last=1)
    n_state2, recovery_after_ms = _state_count_ms()
    assert n_state == n_state2, "vacuum changed current state"

    lat_sorted = sorted(lat_ms)
    return {
        "batches": n_batches,
        "rows": total_rows,
        "rows_per_sec": round(total_rows / wall, 1),
        "wall_sec": round(wall, 2),
        "commit_p50_ms": round(_pctl(lat_sorted, 0.5), 1),
        "commit_p95_ms": round(_pctl(lat_sorted, 0.95), 1),
        "state_keys": n_state,
        "recovery_ms": round(recovery_ms, 1),
        "vacuumed_paths": len(removed),
        "recovery_after_vacuum_ms": round(recovery_after_ms, 1),
    }


def bench_neardup_growth(spark, sf_dir: str, root: str) -> dict:
    """Growth-guard evidence for the persisted LSH index (r10 verdict:
    a long-lived index built at N silently re-enters the candidate
    floor as the corpus grows). Builds a NearDupIngestSink at a small
    baseline, grows the corpus ~10x in micro-batches past the guard
    factor, and records per-stage: live/built counts, the guard's
    needs_rebuild flag, batch latency, and the probed index size (band
    rows — the candidate-generation input, which must stay linear in
    docs). Then rebands and shows the guard re-baselined with history
    still blocking near-dups."""
    import warnings

    from stream_loader_spark.streaming.ingest import NearDupIngestSink

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .where(F.col("text").isNotNull())
    )
    total = docs.count()
    sink = NearDupIngestSink(os.path.join(root, "neardup_growth"), growth_factor=4.0)
    # batch 0 = the build-time baseline (~1/16 of the corpus), then 9
    # batches growing the corpus past 4x the baseline
    slice_col = F.expr("CAST(pmod(doc_id, 16) AS INT)")
    stages = []
    warned_batches = 0
    for b in range(10):
        batch = docs.where(slice_col == b) if b < 9 else docs.where(slice_col >= 9)
        t0 = time.time()
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            sink(batch, b)
        ms = (time.time() - t0) * 1000
        if any("grown" in str(w.message) for w in caught):
            warned_batches += 1
        st = sink.growth.status()
        from stream_loader_spark.streaming.ingest import _has_data_files

        band_rows = spark.read.parquet(
            *[d for d in sink._band_state.dirs() if _has_data_files(d)]
        ).count()
        stages.append(
            {
                "batch": b,
                "batch_ms": round(ms, 1),
                "live_n": st["live_n"],
                "growth": st["growth"],
                "needs_rebuild": st["needs_rebuild"],
                "band_rows": band_rows,
            }
        )
    st_before = sink.growth.status()
    t0 = time.time()
    reband_rows = sink.reband(spark)
    reband_ms = (time.time() - t0) * 1000
    st_after = sink.growth.status()
    # post-reband probe: a duplicate of an already-ingested doc must
    # still be dropped (history wins across the rebuild)
    first = docs.orderBy("doc_id").limit(1).collect()[0]
    sink(
        spark.createDataFrame(
            [(int(1 << 40), first["text"])], "doc_id long, text string"
        ),
        10,
    )
    post_probe_dropped = (
        sink.committed_corpus(spark).where(F.col("doc_id") == (1 << 40)).count() == 0
    )
    return {
        "docs_total": total,
        "built_n": st_before["built_n"],
        "final_growth": st_before["growth"],
        "warned_batches": warned_batches,
        "stages": stages,
        "reband_rows": reband_rows,
        "reband_ms": round(reband_ms, 1),
        "growth_after_reband": st_after["growth"],
        "needs_rebuild_after_reband": st_after["needs_rebuild"],
        "post_reband_duplicate_dropped": post_probe_dropped,
    }


def bench_index_sink(spark, sf_dir: str, n_batches: int, root: str) -> dict:
    """IndexIngestSink throughput: documents stream in as micro-batches,
    each landing a token-bucketed (term, doc, tc) segment; measures
    segment-commit latency, a postings read over the un-merged segment
    tail, the compaction (segment merge) cost, and the pruned term
    lookup before/after the merge."""
    from stream_loader_spark.streaming.ingest import IndexIngestSink

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    total = docs.count()
    sink = IndexIngestSink(os.path.join(root, "index_sink"), n=2)
    slice_col = F.expr(f"CAST(pmod(doc_id, {n_batches}) AS INT)")

    lat_ms: list[float] = []
    t_start = time.time()
    for b in range(n_batches):
        t0 = time.time()
        sink(docs.where(slice_col == b), b)
        lat_ms.append((time.time() - t0) * 1000)
    wall = time.time() - t_start

    t0 = time.time()
    n_terms = sink.postings(spark, min_df=2, max_df=400).count()
    postings_ms = (time.time() - t0) * 1000
    # one mid-frequency probe term, measured pre/post merge
    term = sink.postings(spark, min_df=2, max_df=400).orderBy("token").first().token
    t0 = time.time()
    hits_before = sink.lookup(spark, [term]).count()
    lookup_before_ms = (time.time() - t0) * 1000
    t0 = time.time()
    folded = sink.compact(spark)
    compact_ms = (time.time() - t0) * 1000
    t0 = time.time()
    hits_after = sink.lookup(spark, [term]).count()
    lookup_after_ms = (time.time() - t0) * 1000
    assert hits_after == hits_before, "merge changed lookup results"

    lat_sorted = sorted(lat_ms)
    return {
        "batches": n_batches,
        "docs": total,
        "docs_per_sec": round(total / wall, 1),
        "wall_sec": round(wall, 2),
        "segment_commit_p50_ms": round(_pctl(lat_sorted, 0.5), 1),
        "segment_commit_p95_ms": round(_pctl(lat_sorted, 0.95), 1),
        "postings_read_ms": round(postings_ms, 1),
        "banded_terms": n_terms,
        "lookup_ms_before_merge": round(lookup_before_ms, 1),
        "rows_merged": folded,
        "compact_ms": round(compact_ms, 1),
        "lookup_ms_after_merge": round(lookup_after_ms, 1),
    }


def bench_index_tiered(spark, sf_dir: str, n_segments: int, root: str) -> dict:
    """Generational-merge proof at 200+ segments: stream the documents
    fixture in as ``n_segments`` micro-batches with TIERED compaction
    every 10, recording each maintenance call's cost and the pruned
    term-lookup latency along the way. The claim under test: per-call
    compaction cost tracks the newly-arrived tail (bounded series),
    NOT the accumulated index — the full-refold shape is timed once at
    the end for contrast."""
    import glob

    from stream_loader_spark.streaming.ingest import IndexIngestSink

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sink = IndexIngestSink(os.path.join(root, "index_tiered"), n=2)
    slice_col = F.expr(f"CAST(pmod(doc_id, {n_segments}) AS INT)")

    term = None
    compact_ms: list[float] = []
    lookup_ms: list[float] = []
    t_start = time.time()
    for b in range(n_segments):
        sink(docs.where(slice_col == b), b)
        if (b + 1) % 10 == 0:
            t0 = time.time()
            sink.compact(spark, tiered=True)
            compact_ms.append((time.time() - t0) * 1000)
            if term is None:
                term = (
                    sink.postings(spark, min_df=2, max_df=400)
                    .orderBy("token")
                    .first()
                    .token
                )
            t0 = time.time()
            sink.lookup(spark, [term]).count()
            lookup_ms.append((time.time() - t0) * 1000)
    wall = time.time() - t_start

    gens = len(
        glob.glob(os.path.join(root, "index_tiered", "segments", "compact", "g=*"))
    )
    hits_before = sink.lookup(spark, [term]).count()
    t0 = time.time()
    sink.compact(spark)  # the O(index) full refold, for contrast
    full_refold_ms = (time.time() - t0) * 1000
    assert sink.lookup(spark, [term]).count() == hits_before

    cs = sorted(compact_ms)
    half = len(compact_ms) // 2
    return {
        "segments": n_segments,
        "wall_sec": round(wall, 2),
        "tiered_compactions": len(compact_ms),
        "tiered_compact_p50_ms": round(_pctl(cs, 0.5), 1),
        "tiered_compact_p95_ms": round(_pctl(cs, 0.95), 1),
        # bounded-cost evidence: the late half vs the early half — a
        # full-refold shape would roughly double as the index does
        "tiered_compact_mean_first_half_ms": round(
            sum(compact_ms[:half]) / max(1, half), 1
        ),
        "tiered_compact_mean_second_half_ms": round(
            sum(compact_ms[half:]) / max(1, len(compact_ms) - half), 1
        ),
        "lookup_ms_first": round(lookup_ms[0], 1),
        "lookup_ms_last": round(lookup_ms[-1], 1),
        "lookup_p95_ms": round(_pctl(sorted(lookup_ms), 0.95), 1),
        "live_generations": gens,
        "full_refold_ms_at_end": round(full_refold_ms, 1),
    }


def bench_manifest_sustained(spark, rec, n_batches: int, root: str) -> dict:
    """Sustained-load manifest sink run: ``n_batches`` micro-batches
    with compaction + vacuum every 50 INSIDE the run (not after it),
    asserting recovery time and commit latency stay bounded mid-flight
    — the 100k-batch lifetime argument measured, not extrapolated."""
    from stream_loader_spark.sinks.manifest import ManifestFileSink

    sink = ManifestFileSink(os.path.join(root, "manifest_sustained"))
    hi = int(rec.agg(F.max("offset")).first()[0]) + 1
    slice_col = F.expr(f"CAST((offset * {n_batches}) DIV {hi} AS INT)")

    lat_ms: list[float] = []
    recovery_ms: list[float] = []
    compact_ms: list[float] = []
    t_start = time.time()
    pos_prev = None
    for b in range(n_batches):
        t0 = time.time()
        sink.write_batch(rec.where(slice_col == b), b)
        lat_ms.append((time.time() - t0) * 1000)
        if (b + 1) % 50 == 0:
            t0 = time.time()
            sink.compact_data(spark)
            sink.vacuum()
            compact_ms.append((time.time() - t0) * 1000)
            t0 = time.time()
            pos = sink.committed_positions()
            recovery_ms.append((time.time() - t0) * 1000)
            assert pos, "mid-flight recovery returned no positions"
            if pos_prev is not None:
                # StreamPosition defines __lt__ only (offset ordering)
                assert not any(
                    pos[k] < pos_prev[k] for k in pos_prev
                ), "positions regressed mid-flight"
            pos_prev = pos
    wall = time.time() - t_start

    lat_sorted = sorted(lat_ms)
    half = len(recovery_ms) // 2
    return {
        "batches": n_batches,
        "wall_sec": round(wall, 2),
        "commit_p50_ms": round(_pctl(lat_sorted, 0.5), 1),
        "commit_p95_ms": round(_pctl(lat_sorted, 0.95), 1),
        # bounded mid-flight: late-half recovery/compaction vs early
        "recovery_mean_first_half_ms": round(
            sum(recovery_ms[:half]) / max(1, half), 1
        ),
        "recovery_mean_second_half_ms": round(
            sum(recovery_ms[half:]) / max(1, len(recovery_ms) - half), 1
        ),
        "recovery_max_ms": round(max(recovery_ms), 1),
        "compact_vacuum_p95_ms": round(_pctl(sorted(compact_ms), 0.95), 1),
        "maintenance_cycles": len(compact_ms),
    }


def bench_manifest_scan_synthetic(root: str, counts: list[int]) -> dict:
    """Pure manifest-scan cost vs committed-batch count, isolated from
    Spark write time: dataless manifests (a committed batch whose data
    dir is empty — the heartbeat-flush shape) written straight through
    the sink's own atomic writer, then timed through the sink's own
    recovery read. This is the curve that says whether a 100k-batch
    stream NEEDS compaction or merely benefits from it."""
    from stream_loader_spark.sinks.manifest import ManifestFileSink

    out: dict[str, float] = {}
    for n in counts:
        d = os.path.join(root, f"scan_{n}")
        sink = ManifestFileSink(d)
        for b in range(n):
            sink._commit_manifest(b, [])
        t0 = time.time()
        sink.committed_positions()
        out[str(n)] = round((time.time() - t0) * 1000, 1)
        shutil.rmtree(d)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    n_batches = int(os.environ.get("INGEST_BENCH_BATCHES", "60"))
    spark = get_spark("ingest_bench")
    rec = as_stream_records(spark.read.parquet(os.path.join(sf_dir, "events.parquet")))
    root = tempfile.mkdtemp(prefix="ingest_bench_", dir=os.path.join(REPO, "spark-warehouse"))
    only = os.environ.get("INGEST_BENCH_ONLY")
    if only:
        # run one section and MERGE it into the committed artifact —
        # re-running the full 20-minute suite to add a row is wasteful
        sections = {
            "neardup_growth": lambda: bench_neardup_growth(spark, sf_dir, root),
        }
        try:
            row = sections[only]()
        finally:
            shutil.rmtree(root, ignore_errors=True)
        path = os.path.join(REPO, "INGEST_BENCH.json")
        with open(path) as fh:
            result = json.load(fh)
        result[only] = row
        if "--dry" not in sys.argv:
            with open(path, "w") as fh:
                json.dump(result, fh, indent=1)
        print(json.dumps({only: row}))
        return
    try:
        result = {
            "metric": "ingest_bench",
            "sf_dir": sf_dir,
            "manifest_sink": bench_manifest_sink(spark, rec, n_batches, root),
            "upsert_sink": bench_upsert_sink(
                spark, rec, max(4, n_batches // 2), root
            ),
            "index_sink": bench_index_sink(
                spark, sf_dir, max(4, n_batches // 2), root
            ),
            "neardup_growth": bench_neardup_growth(spark, sf_dir, root),
            "index_sink_tiered": bench_index_tiered(
                spark,
                sf_dir,
                int(os.environ.get("INGEST_TIERED_SEGMENTS", "200")),
                root,
            ),
            "manifest_sink_sustained": bench_manifest_sustained(
                spark,
                rec,
                int(os.environ.get("INGEST_SUSTAINED_BATCHES", "500")),
                root,
            ),
            "manifest_scan_ms_synthetic": bench_manifest_scan_synthetic(
                root, [100, 1000, 5000]
            ),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    if "--dry" not in sys.argv:
        with open(os.path.join(REPO, "INGEST_BENCH.json"), "w") as fh:
            json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
