"""Parquet writer configuration (SURVEY §2.7 E6).

The reference exposes Parquet knobs as a config object — compression,
row-group/page/dictionary sizes, writer version, bloom filters,
byte-stream-split (hadoop/parquet/ParquetConfig.scala:16-48). Spark's
writer takes the same knobs as options / hadoop confs; this maps a
declarative config onto them so sinks stay declarative.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrameWriter


@dataclass(frozen=True)
class ParquetConfig:
    compression: str = "zstd"  # none|snappy|gzip|zstd|lz4
    row_group_size_bytes: int | None = None  # parquet.block.size
    page_size_bytes: int | None = None  # parquet.page.size
    enable_dictionary: bool | None = None
    bloom_filter_columns: tuple[str, ...] = ()
    max_records_per_file: int | None = None  # commit-strategy count bound

    def options(self) -> dict[str, str]:
        out: dict[str, str] = {"compression": self.compression}
        if self.row_group_size_bytes is not None:
            out["parquet.block.size"] = str(self.row_group_size_bytes)
        if self.page_size_bytes is not None:
            out["parquet.page.size"] = str(self.page_size_bytes)
        if self.enable_dictionary is not None:
            out["parquet.enable.dictionary"] = str(self.enable_dictionary).lower()
        for col in self.bloom_filter_columns:
            out[f"parquet.bloom.filter.enabled#{col}"] = "true"
        if self.max_records_per_file is not None:
            out["maxRecordsPerFile"] = str(self.max_records_per_file)
        return out

    def apply(self, writer: DataFrameWriter) -> DataFrameWriter:
        for k, v in self.options().items():
            writer = writer.option(k, v)
        return writer
