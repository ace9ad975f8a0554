"""ClickHouse exactly-once storage over the public HTTP interface
(SURVEY §2.8 K7 — clickhouse/ClickHouseFileStorage.scala:27-89).

The reference inserts one RowBinary file per batch with an
``insert_deduplication_token`` and recovers positions with the in-row
A1 query. The Spark-native shape:

- the batch repartitions by (topic, partition) — deterministic hash
  partitioning, so a replayed batch produces byte-identical partition
  payloads;
- each partition encodes itself to ONE RowBinary blob (Arrow-batched,
  ``functions/rowbinary.py``) and derives its dedup token from the
  stream ranges it contains — recomputed identically on replay;
- each blob POSTs from ITS executor (``foreach``), so inserts scale
  with the cluster and never funnel through the driver;
- ClickHouse drops re-inserted blocks carrying a known token, which
  together with the replay guard gives exactly-once;
- ``committed_positions`` runs the A1 aggregation over the in-row
  ``_topic/_partition/_offset/_watermark`` columns via HTTP.

The HTTP client is stdlib ``urllib`` (no driver-only dependencies; the
callable travels to executors) and is injectable for tests — the unit
suite runs against a recording ``http.server`` double.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import urllib.parse
import urllib.request
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_loader_spark.functions.rowbinary import RowBinaryEncoder
from stream_loader_spark.model.position import StreamPosition

# (url, params, body, headers) -> response text; module-level so the
# default is picklable for executor-side use
def http_post(url: str, params: dict[str, str], body: bytes, headers: dict[str, str]) -> str:
    full = f"{url}/?{urllib.parse.urlencode(params)}"
    req = urllib.request.Request(full, data=body, headers=headers, method="POST")
    with urllib.request.urlopen(req) as resp:  # noqa: S310 — caller-supplied endpoint
        return resp.read().decode("utf-8", "replace")


def partition_token(table: str, range_keys: list[str]) -> str:
    """Deterministic dedup token for one insert block: the sorted stream
    ranges it covers, hashed. A replayed partition re-derives the same
    token, so ClickHouse drops the duplicate block."""
    h = hashlib.sha256()
    h.update(table.encode())
    for key in sorted(range_keys):
        h.update(b"|")
        h.update(key.encode())
    return h.hexdigest()


class ClickHouseHttpStorage:
    """foreachBatch sink + A1 recovery over ClickHouse HTTP.

    ``encoder`` maps the batch columns to RowBinary; the metadata
    projection columns (_topic/_partition/_offset/_watermark) must be
    part of the encoder schema for in-row recovery (reference
    loaders/ClickHouse.scala:77-97 projects exactly these).
    """

    def __init__(
        self,
        url: str,
        table: str,
        encoder: RowBinaryEncoder,
        client: Callable[[str, dict, bytes, dict], str] = http_post,
        compress: bool = False,
        insert_partitions: int = 32,
        topic_col: str = "topic",
        partition_col: str = "partition",
        offset_col: str = "offset",
        ts_col: str = "ts",
    ) -> None:
        self.url = url
        self.table = table
        self.encoder = encoder
        self.client = client
        self.compress = compress
        self.insert_partitions = insert_partitions
        self.meta = (topic_col, partition_col, offset_col, ts_col)

    # -- write path ------------------------------------------------------
    def encoded_blocks(self, batch_df: DataFrame) -> DataFrame:
        """(num_rows, payload, token) — one RowBinary block per insert
        partition, tokens derived from the ranges inside each block."""
        t, p, o, _ts = self.meta
        import pandas as pd

        enc, table = self.encoder, self.table

        def run(batches):
            total, chunks, keys = 0, [], []
            for pdf in batches:
                if not len(pdf):
                    continue
                chunks.append(enc.encode_batch(pdf))
                total += len(pdf)
                per = pdf.groupby([t, p])[o].agg(["min", "max"])
                for (topic, part), row in per.iterrows():
                    keys.append(f"{topic}:{part}:{row['min']}:{row['max']}")
            if total:
                yield pd.DataFrame(
                    {
                        "num_rows": [total],
                        "payload": [b"".join(chunks)],
                        "token": [partition_token(table, keys)],
                    }
                )

        # deterministic co-location: the same rows land in the same
        # insert block on every (re)run of the batch
        pre = batch_df.repartition(self.insert_partitions, t, p).sortWithinPartitions(t, p, o)
        return pre.mapInPandas(run, schema="num_rows bigint, payload binary, token string")

    def insert_batch(self, batch_df: DataFrame) -> None:
        """POST every block from its executor (no driver funnel)."""
        url, table, client, compress = self.url, self.table, self.client, self.compress

        def post(row) -> None:
            body = bytes(row["payload"])
            headers = {"Content-Type": "application/octet-stream"}
            if compress:
                body = gzip.compress(body)
                headers["Content-Encoding"] = "gzip"
            client(
                url,
                {
                    "query": f"INSERT INTO {table} FORMAT RowBinary",
                    "insert_deduplication_token": row["token"],
                },
                body,
                headers,
            )

        self.encoded_blocks(batch_df).foreach(post)

    # -- recovery (A1 in-row query) --------------------------------------
    def committed_positions(self) -> dict[tuple[str, int], StreamPosition]:
        """The reference's recovery aggregation
        (ClickHouseFileStorage.scala:38-47) over the in-row metadata."""
        query = (
            "SELECT _topic AS topic, _partition AS partition, "
            "max(_offset) + 1 AS next_offset, "
            "toUnixTimestamp64Milli(max(_watermark)) AS watermark_ms "
            f"FROM {self.table} GROUP BY _topic, _partition FORMAT JSON"
        )
        text = self.client(self.url, {"query": query}, b"", {})
        out: dict[tuple[str, int], StreamPosition] = {}
        for row in json.loads(text).get("data", []):
            out[(row["topic"], int(row["partition"]))] = StreamPosition(
                int(row["next_offset"]), int(row["watermark_ms"])
            )
        return out

    def is_batch_committed(self, ranges) -> bool:
        """Every range at-or-behind the recovered positions ⇒ replayed
        (RecordBatchStorage.scala:44-64 semantics)."""
        committed = self.committed_positions()
        if not committed:
            return False
        for r in ranges:
            pos = committed.get((r["topic"], r["partition"]))
            if pos is None or r["end_offset"] >= pos.offset:
                return False
        return True

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch entry: replay guard + tokened insert."""
        from stream_loader_spark.operators.recovery import stream_ranges

        t, p, o, ts = self.meta
        batch_df = batch_df.persist()
        try:
            ranges = stream_ranges(batch_df, t, p, o, ts).collect()
            if self.is_batch_committed(ranges):
                return
            self.insert_batch(batch_df)
        finally:
            batch_df.unpersist()
