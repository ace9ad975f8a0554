"""Custom stateful streaming operators (applyInPandasWithState).

``with_tracked_watermark`` reproduces the reference's
``MaxWatermarkProvider`` semantics EXACTLY (source/WatermarkProvider.scala:
50-77): every record is delivered downstream carrying the per-partition
watermark current at its position in the stream; records whose event
time is further than ``valid_diff_ms`` in the future of the processing
clock do NOT advance the watermark (but still flow). Spark's built-in
``withWatermark`` cannot express this ("deliver but don't advance"), so
the watermark lives in grouped state keyed by (topic, partition):

- state = the partition's watermark (one long — constant per partition,
  no growth);
- per batch, a vectorized cumulative max over valid event times,
  seeded from state, stamps each row;
- Arrow-batched pandas transfer, grouped by partition → parallel across
  partitions, exactly the reference's per-partition tracker layout.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_VALID_DIFF_MS = 3_600_000


def with_tracked_watermark(
    stream: DataFrame,
    valid_diff_ms: int = DEFAULT_VALID_DIFF_MS,
    now_ms_fn=lambda: int(time.time() * 1000),
) -> DataFrame:
    """stream(topic, partition, offset, ts, ...) → same + watermark_ms.

    Streaming-only (requires a streaming DataFrame). State per
    (topic, partition) is the last watermark; restarts recover it from
    the checkpoint's state store.
    """
    in_cols = stream.schema.fieldNames()
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in stream.schema.fields)
    out_schema += ", watermark_ms bigint"

    def track(key, pdfs, state: GroupState):
        wm = state.get[0] if state.exists else -1
        now_ms = now_ms_fn()
        # Arrow chunks of one group arrive in arbitrary shuffle order, so
        # the whole group is buffered and sorted by offset before the
        # cumulative max runs — the per-record stamp must reflect stream
        # order, not chunk arrival order. Memory is bounded by the
        # micro-batch's share of one (topic, partition).
        chunks = [pdf for pdf in pdfs]
        if not chunks:
            state.update((wm,))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["offset"]).reset_index(
            drop=True
        )
        ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
        valid = ts_ms <= now_ms + valid_diff_ms
        candidates = np.where(valid, ts_ms, -(2**62))
        # running max of valid event times, floored by the carried state
        running = np.maximum(np.maximum.accumulate(candidates), wm)
        wm = int(running[-1]) if len(running) else wm
        pdf["watermark_ms"] = running
        state.update((wm,))
        yield pdf[in_cols + ["watermark_ms"]]

    return (
        stream.groupBy("topic", "partition")
        .applyInPandasWithState(
            track,
            outputStructType=out_schema,
            stateStructType="watermark_ms bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


try:  # Spark 4+ API; absent on 3.5 — v2 entry point guards on this
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor as _SP
except ImportError:  # pragma: no cover
    _SP = object


class _WatermarkProcessor(_SP):
    """StatefulProcessor for the transformWithStateInPandas variant —
    defined module-level so cloudpickle ships only the tiny config."""

    def __init__(self, in_cols, valid_diff_ms, now_ms_fn):
        self.in_cols = in_cols
        self.valid_diff_ms = valid_diff_ms
        self.now_ms_fn = now_ms_fn

    def init(self, handle):
        self._wm = handle.getValueState("wm", "watermark_ms bigint")

    def handleInputRows(self, key, rows, timer_values):
        wm = self._wm.get()[0] if self._wm.exists() else -1
        now_ms = self.now_ms_fn()
        chunks = list(rows)
        if not chunks:
            self._wm.update((wm,))
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            .sort_values(["offset"])
            .reset_index(drop=True)
        )
        ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
        valid = ts_ms <= now_ms + self.valid_diff_ms
        candidates = np.where(valid, ts_ms, -(2**62))
        running = np.maximum(np.maximum.accumulate(candidates), wm)
        if len(running):
            wm = int(running[-1])
        pdf["watermark_ms"] = running
        self._wm.update((wm,))
        yield pdf[self.in_cols + ["watermark_ms"]]

    def close(self):
        pass


def with_tracked_watermark_v2(
    stream: DataFrame,
    valid_diff_ms: int = DEFAULT_VALID_DIFF_MS,
    now_ms_fn=lambda: int(time.time() * 1000),
) -> DataFrame:
    """``with_tracked_watermark`` on the transformWithState API (the
    arbitrary-stateful-processing successor to applyInPandasWithState,
    Spark 4+): identical MaxWatermarkProvider semantics, but state goes
    through a named ValueState handle, which buys schema evolution and
    the RocksDB state-store backend for free. Prefer this on Spark 4
    clusters; the v1 form remains for Spark 3.5 compatibility.

    Runtime requirement: the transformWithState state-server protocol
    speaks protobuf — environments without ``google.protobuf`` can
    build this plan but not run it (the streaming driver worker exits
    at init). The pytest is importorskip-gated on exactly that.
    """
    if _SP is object:  # pragma: no cover
        raise RuntimeError("transformWithStateInPandas requires Spark >= 4.0")

    in_cols = stream.schema.fieldNames()
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in stream.schema.fields
    )
    out_schema += ", watermark_ms bigint"

    proc = _WatermarkProcessor(in_cols, valid_diff_ms, now_ms_fn)

    return stream.groupBy("topic", "partition").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )
