"""Exactly-once sinks: manifest-committed files, in-row-offset tables,
external-offsets tables. Each is a ``foreachBatch`` callable plus a
position-recovery API mirroring the reference's RecordBatchStorage
contract (recover / commitBatch / committedPositions / isBatchCommitted,
sink/batch/storage/RecordBatchStorage.scala:22-64)."""
