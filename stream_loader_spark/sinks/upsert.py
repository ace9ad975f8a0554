"""Exactly-once key-value upsert sink (CDC / SCD-type-1 merge).

The reference's storages append batches; warehouse loaders frequently
need the MERGE form instead — each record carries a key and the sink
keeps only the latest row per key. This sink provides that on plain
parquet with the repo's manifest discipline (sinks/manifest.py crash
matrix), structured so a batch rewrites only the state it touches:

- State is hash-bucketed by key. A batch reduces to its latest-per-key
  rows, finds the (few) buckets those keys hash into, merges ONLY
  those buckets, and writes them in ONE job to
  ``versions/v=<batch_id>/_bucket=<b>/``. Untouched buckets keep their
  old version — at 100 TB a batch touching 1% of the key space
  rewrites 1% of the snapshot, not all of it (the pruning Delta/Hudi
  get from file stats; here it is deterministic by layout).
- One atomic manifest (temp + rename, driver-side) maps bucket → the
  version directory holding its current rows and records committed
  batch ids. Readers union exactly the manifest-named directories; a
  crash between data and manifest leaves invisible files that the
  deterministic replay overwrites. Data files are NEVER renamed —
  object-store safe, same as the manifest file sink.
- Replays are no-ops: the batch id is already in the manifest.

Within-batch ties (same key twice in one batch) resolve by the caller-
supplied ``order_col`` via ``max_by`` over a struct — one map-side-
combinable aggregate, no window. ``order_col`` must not be a key.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def null_safe_join(
    left: DataFrame, right: DataFrame, keys: list[str], how: str
) -> DataFrame:
    """Key-equality join where NULL == NULL matches.

    Name-list joins compile to null-unsafe ``=``: a NULL-keyed state
    row then never matches its NULL-keyed update, so anti-joins keep
    the stale row and semi-joins drop the prior state — both silently
    duplicate per-key state. NULL keys are legitimate here (they are
    whatever the upstream groupBy produced), so every key join in the
    upsert/matview family routes through this. The right side's key
    columns are renamed before the join and dropped from the result,
    preserving the name-list join's output shape."""
    renamed = right.select(
        *[F.col(c).alias(f"_nsj_{c}") for c in keys],
        *[c for c in right.columns if c not in keys],
    )
    cond = F.lit(True)
    for c in keys:
        cond = cond & left[c].eqNullSafe(renamed[f"_nsj_{c}"])
    out = left.join(renamed, cond, how)
    if how in ("left_semi", "semi", "left_anti", "anti"):
        return out  # semi/anti results carry only the left side
    return out.drop(*[f"_nsj_{c}" for c in keys])


class UpsertSink:
    def __init__(
        self,
        path: str,
        key_cols: list[str],
        order_col: str,
        num_buckets: int = 16,
        tombstone_col: str | None = None,
    ) -> None:
        if not key_cols:
            raise ValueError("key_cols must be non-empty")
        self.path = path
        self.key_cols = list(key_cols)
        if order_col in self.key_cols:
            raise ValueError("order_col must not be a key column")
        self.order_col = order_col
        self.num_buckets = num_buckets
        # CDC deletes: a batch row with this boolean column TRUE removes
        # its key from state. The marker participates in within-batch
        # ordering (delete-then-reinsert resolves by order_col) and is
        # never stored — state holds live rows only. Not pinned in the
        # manifest config: it names a batch column, not a layout choice.
        if tombstone_col in self.key_cols or tombstone_col == order_col:
            raise ValueError("tombstone_col must not be a key or order column")
        self.tombstone_col = tombstone_col

    # -- manifest -------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "manifest.json")

    def _read_manifest(self) -> dict:
        try:
            with open(self._manifest_path) as fh:
                m = json.load(fh)
                m.setdefault("history", {})
                self._check_config(m)
                return m
        except FileNotFoundError:
            return {"versions": {}, "batches": [], "history": {}}

    def _config(self) -> dict:
        return {
            "num_buckets": self.num_buckets,
            "key_cols": self.key_cols,
            "order_col": self.order_col,
        }

    def _check_config(self, manifest: dict) -> None:
        """Refuse to reopen state under a different layout: _bucket_col
        hashes under THIS sink's num_buckets/key_cols, while the
        manifest's version map reflects the layout that wrote it — a
        mismatch would silently merge the wrong bucket directories and
        duplicate keys. Config is pinned on first write."""
        stored = manifest.get("config")
        if stored is not None and stored != self._config():
            raise ValueError(
                f"upsert sink config mismatch at {self.path}: "
                f"manifest pinned {stored}, sink configured {self._config()}"
            )
        if stored is None and manifest.get("batches"):
            # Fail CLOSED on a data-bearing manifest with no pinned
            # config (written before config pinning existed): its
            # layout is unknowable from the dirs, and stamping THIS
            # sink's layout onto it would silently merge the wrong
            # bucket directories — the exact duplicate-key corruption
            # the pin exists to prevent.
            raise ValueError(
                f"upsert sink manifest at {self.path} has committed "
                "batches but no pinned config: it predates config "
                "pinning and its bucket layout is unknown; rebuild the "
                "state (or open it with the exact original layout and "
                "a version that does not enforce the pin)"
            )

    def _write_manifest(self, manifest: dict) -> None:
        manifest.setdefault("config", self._config())
        os.makedirs(self.path, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic on POSIX

    def _bucket_dir(self, bucket: int, version: int) -> str:
        return os.path.join(
            self.path, "versions", f"v={version}", f"_bucket={bucket}"
        )

    def _bucket_col(self) -> F.Column:
        return F.pmod(F.hash(*self.key_cols), F.lit(self.num_buckets))

    def is_batch_committed(self, batch_id: int) -> bool:
        return batch_id in self._read_manifest()["batches"]

    def bucket_versions(self) -> dict[int, int]:
        """bucket → committed version (test/inspection surface)."""
        return {int(b): v for b, v in self._read_manifest()["versions"].items()}

    # -- write path -----------------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.write_batch(batch_df, batch_id)

    @staticmethod
    def _aligned(df: DataFrame, types: dict, cols: list[str]) -> DataFrame:
        """Project onto ``cols``, filling columns the frame lacks with
        NULLs of the canonical type — the additive-schema-evolution
        contract: a batch may add columns (old rows read back NULL) or
        omit columns (carried rows keep their stored values), and
        neither direction crashes the merge or silently drops data."""
        have = set(df.columns)
        return df.select(
            *[
                F.col(c) if c in have else F.lit(None).cast(types[c]).alias(c)
                for c in cols
            ]
        )

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        manifest = self._read_manifest()
        if batch_id in manifest["batches"]:
            return  # replay of a committed batch: no-op
        spark = batch_df.sparkSession
        tomb = self.tombstone_col
        data_cols = [c for c in batch_df.columns if c != tomb]

        # latest row per key WITHIN the batch: one hash aggregate. The
        # tombstone marker rides through the max_by so delete-then-
        # reinsert (and the reverse) resolve by order_col like any
        # other same-key tie.
        others = [c for c in batch_df.columns if c not in self.key_cols]
        latest = (
            batch_df.groupBy(*self.key_cols)
            .agg(F.max_by(F.struct(*others), F.col(self.order_col)).alias("_row"))
            .select(*self.key_cols, "_row.*")
            .withColumn("_bucket", self._bucket_col())
            .persist()
        )
        try:
            touched = sorted(
                r["_bucket"] for r in latest.select("_bucket").distinct().collect()
            )
            if not touched:
                manifest["batches"].append(batch_id)
                self._write_manifest(manifest)
                return

            old_dirs = [
                self._bucket_dir(b, manifest["versions"][str(b)])
                for b in touched
                if str(b) in manifest["versions"]
            ]
            # a prior all-delete batch leaves empty-but-present bucket
            # dirs; zero-file paths carry no rows and would only break
            # schema inference when every old dir is empty
            old_dirs = [d for d in old_dirs if self._dirs_have_files([d])]
            # tombstoned keys leave state entirely: they still anti-join
            # the old rows away (via latest's keys) but contribute no
            # replacement row, and the marker itself is never stored
            live = latest
            if tomb is not None and tomb in latest.columns:
                live = latest.where(~F.coalesce(F.col(tomb), F.lit(False))).drop(tomb)
            merged = live.select(*data_cols, "_bucket")
            if old_dirs:
                # mergeSchema: touched buckets may span versions written
                # under different (additively evolved) schemas
                old = spark.read.option("mergeSchema", "true").parquet(*old_dirs)
                keep = null_safe_join(
                    old, latest.select(*self.key_cols), self.key_cols, "left_anti"
                ).withColumn("_bucket", self._bucket_col())
                # target schema = batch columns ∪ stored columns; the
                # side missing a column contributes NULLs (see _aligned)
                all_cols = data_cols + [
                    c for c in old.columns if c not in data_cols and c != "_bucket"
                ]
                types = {f.name: f.dataType for f in live.schema.fields}
                for f in old.schema.fields:
                    types.setdefault(f.name, f.dataType)
                merged = self._aligned(keep, types, all_cols + ["_bucket"]).unionByName(
                    self._aligned(live, types, all_cols + ["_bucket"])
                )
            # ONE job writes every touched bucket under the new version;
            # the deterministic path makes a crashed replay overwrite it
            (
                merged.write.partitionBy("_bucket")
                .mode("overwrite")
                .parquet(os.path.join(self.path, "versions", f"v={batch_id}"))
            )
            # a bucket whose every key was tombstoned writes NO partition
            # dir (dynamic partition writes skip empty groups) — create
            # it empty so the manifest never points at a missing path
            for b in touched:
                os.makedirs(self._bucket_dir(b, batch_id), exist_ok=True)
        finally:
            latest.unpersist()

        for bucket in touched:
            manifest["versions"][str(bucket)] = batch_id
        manifest["batches"].append(batch_id)
        # per-batch snapshot of the bucket→version map: time-travel reads
        manifest["history"][str(batch_id)] = dict(manifest["versions"])
        self._write_manifest(manifest)

    # -- read path ------------------------------------------------------
    def current_state(
        self, spark: SparkSession, as_of_batch: int | None = None
    ) -> DataFrame:
        """The committed key-value snapshot. ``as_of_batch`` reads the
        state as of an earlier committed batch (the manifest keeps one
        bucket→version snapshot per batch; ``vacuum`` prunes them)."""
        manifest = self._read_manifest()
        if as_of_batch is None:
            versions = manifest["versions"]
        else:
            versions = manifest["history"].get(str(as_of_batch))
            if versions is None:
                raise ValueError(
                    f"no retained snapshot for batch {as_of_batch} "
                    f"(committed: {sorted(int(b) for b in manifest['history'])})"
                )
        dirs = [self._bucket_dir(int(b), v) for b, v in versions.items()]
        if not dirs:
            raise ValueError(f"no committed state under {self.path}")
        if not self._dirs_have_files(dirs):
            # every key tombstoned: committed but empty — parquet can't
            # infer a schema from zero files, so say what happened
            raise ValueError(f"state under {self.path} is empty (all keys deleted)")
        # mergeSchema: untouched buckets may predate an additive schema
        # change — their rows read back with NULLs in the newer columns
        return spark.read.option("mergeSchema", "true").parquet(*dirs)

    @staticmethod
    def _dirs_have_files(dirs: list[str]) -> bool:
        return any(
            f.endswith(".parquet")
            for d in dirs
            for _r, _s, files in os.walk(d)
            for f in files
        )

    def change_feed(self, spark: SparkSession, batch_id: int) -> DataFrame:
        """CDC view of one committed batch: every key it wrote, labeled
        ``insert`` (key absent before), ``update`` (with the previous
        row's columns as ``_old_<col>``), or ``delete`` (tombstoned
        keys — old values attached, current columns NULL). Reads ONLY
        the batch's own version directories plus the touched buckets'
        prior versions — delta-sized, never a snapshot scan. Downstream
        consumers get a replayable changelog without the sink writing a
        second copy of anything."""
        manifest = self._read_manifest()
        snap = manifest["history"].get(str(batch_id))
        if snap is None:
            raise ValueError(
                f"no retained snapshot for batch {batch_id} "
                f"(committed: {sorted(int(b) for b in manifest['history'])})"
            )
        new_dirs = [
            self._bucket_dir(int(b), v) for b, v in snap.items() if v == batch_id
        ]
        if not new_dirs:
            raise ValueError(f"batch {batch_id} wrote no buckets")

        batches = sorted(int(b) for b in manifest["history"])
        prior = [b for b in batches if b < batch_id]
        old_dirs = []
        if prior:
            prev_snap = manifest["history"][str(prior[-1])]
            touched = {b for b, v in snap.items() if v == batch_id}
            old_dirs = [
                self._bucket_dir(int(b), v)
                for b, v in prev_snap.items()
                if b in touched
            ]
            # emptied-by-deletes prior buckets carry no rows: dropping
            # them routes a rebirth batch to the insert-only branch
            old_dirs = [d for d in old_dirs if self._dirs_have_files([d])]
        if self._dirs_have_files(new_dirs):
            new = spark.read.option("mergeSchema", "true").parquet(*new_dirs)
        else:
            # an all-delete batch left its buckets EMPTY: take the row
            # shape from the prior snapshot so every prior key can be
            # labeled 'delete' below
            if not old_dirs or not self._dirs_have_files(old_dirs):
                raise ValueError(
                    f"batch {batch_id} emptied its buckets and no prior "
                    "snapshot is readable"
                )
            new = (
                spark.read.option("mergeSchema", "true").parquet(*old_dirs).limit(0)
            )
        value_cols = [c for c in new.columns if c not in self.key_cols]
        if not old_dirs:
            # Schema-stable with the update branch: NULL-typed _old_
            # columns so consumers can unionByName feeds across batches.
            # Caveat (documented contract): on the OLDEST retained batch
            # after vacuum pruned earlier history, prior state is gone,
            # so pre-existing keys degrade to 'insert' with NULL olds.
            return new.select(
                F.lit("insert").alias("_change"),
                *new.columns,
                *[
                    F.lit(None).cast(new.schema[c].dataType).alias(f"_old_{c}")
                    for c in value_cols
                ],
            )
        old = spark.read.option("mergeSchema", "true").parquet(*old_dirs)
        # additive evolution: a value column the prior snapshot predates
        # reads back as NULL olds (and flags as 'update' when the new
        # value is non-null — correct CDC semantics for a backfill)
        old_have = set(old.columns)
        existed = old.select(
            *self.key_cols,
            F.lit(True).alias("_existed"),
            *[
                (
                    F.col(c) if c in old_have else F.lit(None).cast(new.schema[c].dataType)
                ).alias(f"_old_{c}")
                for c in value_cols
            ],
        )
        joined = null_safe_join(new, existed, self.key_cols, "left_outer")
        # the version dirs hold full merged buckets, so carried-over
        # rows appear identical on both sides — null-safe inequality on
        # any value column separates real writes from carry-over
        differs = F.lit(False)
        for c in value_cols:
            differs = differs | ~F.col(c).eqNullSafe(F.col(f"_old_{c}"))
        upserts = joined.where(F.col("_existed").isNull() | differs).select(
            F.when(F.col("_existed").isNull(), "insert")
            .otherwise("update")
            .alias("_change"),
            *new.columns,
            *[f"_old_{c}" for c in value_cols],
        )
        # tombstoned keys: present in the touched buckets' prior state,
        # absent from the rewritten buckets — labeled with their old
        # values and NULL current columns (same delta-sized reads)
        deletes = null_safe_join(
            old, new.select(*self.key_cols), self.key_cols, "left_anti"
        ).select(
            F.lit("delete").alias("_change"),
            *[
                F.col(c)
                if c in self.key_cols
                else F.lit(None).cast(new.schema[c].dataType).alias(c)
                for c in new.columns
            ],
            *[
                (
                    F.col(c) if c in old_have else F.lit(None).cast(new.schema[c].dataType)
                ).alias(f"_old_{c}")
                for c in value_cols
            ],
        )
        return upserts.unionByName(deletes)

    # -- maintenance ----------------------------------------------------
    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Drop version directories unreachable from the last
        ``keep_last`` batch snapshots (and the current map), pruning
        older history entries — the retention knob that bounds storage
        at a multiple of live state instead of all-versions-ever.
        Returns the removed directory paths."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        manifest = self._read_manifest()
        kept_batches = sorted(int(b) for b in manifest["history"])[-keep_last:]
        live: set[tuple[int, int]] = set()
        for b in kept_batches:
            for bucket, v in manifest["history"][str(b)].items():
                live.add((int(bucket), v))
        for bucket, v in manifest["versions"].items():
            live.add((int(bucket), v))

        # commit the pruned history FIRST: a crash mid-delete then
        # leaves only orphan directories (re-collected by the next
        # vacuum), never a retained snapshot pointing at deleted files
        manifest["history"] = {
            str(b): manifest["history"][str(b)] for b in kept_batches
        }
        self._write_manifest(manifest)

        removed = []
        root = os.path.join(self.path, "versions")
        if os.path.isdir(root):
            for vdir in os.listdir(root):
                version = int(vdir.split("=", 1)[1])
                for bdir in os.listdir(os.path.join(root, vdir)):
                    if not bdir.startswith("_bucket="):
                        continue
                    bucket = int(bdir.split("=", 1)[1])
                    if (bucket, version) not in live:
                        target = os.path.join(root, vdir, bdir)
                        shutil.rmtree(target)
                        removed.append(target)
        return removed
