"""Streaming corpus ingest: per-micro-batch dedup against history.

Composes the incremental training-corpus operators with Structured
Streaming: each micro-batch of documents is exact-deduped within
itself and against the persisted content-hash history, survivors land
in the corpus directory, and exactly their hashes are appended to the
history — so the history table stays the authoritative 32-bytes-per-
document dedup state across restarts.

Exactly-once shape (same discipline as sinks/manifest.py): both the
corpus rows and the history append for batch ``n`` write to
deterministic ``batch=n`` subdirectories in overwrite mode, so a
replayed batch overwrites its own output instead of duplicating it —
and because the batch's own hashes live in ``batch=n`` of the history,
a replay reads a history WITHOUT that batch's hashes (its own partial
write is overwritten, not double-counted).

Scale: the per-batch work is the batch's hash aggregate plus an
anti-join against the history table; with both sides bucketed on
content_hash (operators/bucketing.py) the anti-join co-locates. The
history grows 32 bytes per unique document — at 10B documents that is
~320 GB, a normal Spark table, never driver-resident.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_loader_spark.operators.dedup import incremental_exact_dedup


def _read_json(path: str) -> dict | None:
    import json

    try:
        with open(path) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _write_json_atomic(path: str, payload: dict) -> None:
    # one commit primitive for the whole repo — see sinks/manifest.py
    from stream_loader_spark.sinks.manifest import atomic_write_json

    atomic_write_json(os.path.dirname(path), payload, os.path.basename(path))


def _has_data_files(d: str) -> bool:
    """True if the directory tree contains at least one parquet part
    file. The honest emptiness test: deciding 'empty' from a failed
    spark.read would turn a transient IO error into silently-missing
    state — and, during compaction, into deleting data that was never
    folded."""
    for _root, _dirs, files in os.walk(d):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


class BatchDirState:
    """State stored as ``batch=<n>`` directories, with manifest-driven
    compaction bounding the directory count.

    The ingest sinks append one deterministic directory per micro-batch
    (replay-safe by overwrite), so state listings grow one directory
    per batch forever — at one batch per minute that is half a million
    directories a year, and every history read lists all of them. This
    helper folds all FULLY-COMMITTED batches (everything below the
    highest batch id present; only the in-flight batch can ever be
    replayed) into one consolidated generation directory:

    1. the consolidated rows are written to ``compact/g=<gen>`` — not
       yet referenced, so a crash here leaves an orphan, never a wrong
       read;
    2. ``compaction.json`` flips atomically (temp + rename) to
       ``{upto, gen}`` — the commit point;
    3. superseded batch dirs and old generations are deleted — a crash
       mid-cleanup leaves orphans that the next compaction removes.

    Readers take the referenced generation plus batch dirs ≥ ``upto``;
    the replay-exclusion contract is preserved because the excludable
    (in-flight) batch is always ≥ ``upto``. Run ``compact()`` between
    triggers, like ``vacuum`` — never concurrently with a writing
    batch.
    """

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(self.root, exist_ok=True)

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, "compaction.json")

    def _meta(self) -> dict:
        return _read_json(self._meta_path) or {"upto": 0, "gen": None}

    @staticmethod
    def _gens_of(meta: dict) -> list[int]:
        """Referenced generation ids, oldest first. Reads both the
        multi-generation format ({"gens": [...]}) and the pre-tiered
        single-generation one ({"gen": g})."""
        if "gens" in meta:
            return list(meta["gens"])
        return [meta["gen"]] if meta.get("gen") is not None else []

    def _gen_dir(self, gen: int) -> str:
        return os.path.join(self.root, "compact", f"g={gen}")

    @staticmethod
    def _dir_bytes(d: str) -> int:
        total = 0
        for dirpath, _dirnames, filenames in os.walk(d):
            for f in filenames:
                try:
                    total += os.path.getsize(os.path.join(dirpath, f))
                except OSError:
                    pass
        return total

    def batch_ids(self) -> list[int]:
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.root)
            if d.startswith("batch=")
        )

    def write_batch(self, df: DataFrame, batch_id: int, partition_by: str | None = None) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(os.path.join(self.root, f"batch={batch_id}"))

    def dirs(self, exclude_batch: int | None = None) -> list[str]:
        meta = self._meta()
        out = [self._gen_dir(g) for g in self._gens_of(meta)]
        out += [
            os.path.join(self.root, f"batch={b}")
            for b in self.batch_ids()
            if b >= meta["upto"] and b != exclude_batch
        ]
        return out

    @staticmethod
    def _read_dirs(spark: SparkSession, dirs: list[str]) -> DataFrame | None:
        """Union the given state directories. Empty directories are
        detected by LISTING (never by catching a failed read — a real
        read error must propagate, not masquerade as emptiness). Flat
        layouts read as ONE multi-root scan; only dirs with a Hive
        layout inside (e.g. cluster_id=<c>) are read per-dir under
        their own basePath, because a single multi-root read would
        conflict on the partition-style outer dir names (batch=<n>)."""
        nonempty = [d for d in dirs if _has_data_files(d)]
        if not nonempty:
            return None

        def _hive_inside(d: str) -> bool:
            return any(
                "=" in e and os.path.isdir(os.path.join(d, e)) for e in os.listdir(d)
            )

        nested = [d for d in nonempty if _hive_inside(d)]
        flat = [d for d in nonempty if d not in nested]
        parts = []
        if flat:
            parts.append(spark.read.parquet(*flat))
        for d in nested:
            parts.append(spark.read.option("basePath", d).parquet(d))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(self, spark: SparkSession, exclude_batch: int | None = None) -> DataFrame | None:
        return self._read_dirs(spark, self.dirs(exclude_batch))

    def _next_gen(self, meta: dict) -> int:
        gens = self._gens_of(meta)
        return int(meta.get("next_gen", (max(gens) + 1 if gens else 1)))

    def _write_gen(
        self,
        spark: SparkSession,
        df: DataFrame,
        gen: int,
        partition_by: str | None,
        fold=None,
    ) -> int:
        """Write one generation dir (not yet referenced — a crash here
        leaves an orphan, never a wrong read) and return its row count.
        ``fold`` optionally re-aggregates the unioned rows first (e.g.
        merging duplicate (token, doc) rows across segments)."""
        if fold is not None:
            df = fold(df)
        dest = self._gen_dir(gen)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(dest)
        return spark.read.parquet(dest).count()

    def _flip(self, upto: int, gens: list[int], next_gen: int) -> None:
        _write_json_atomic(
            self._meta_path,
            {"upto": upto, "gens": gens, "next_gen": next_gen},
        )

    def compact(
        self, spark: SparkSession, partition_by: str | None = None, fold=None
    ) -> int:
        """Fold every batch below the highest id present (plus ALL prior
        generations) into ONE new generation. Returns the number of rows
        consolidated (0 = nothing to do). This is the full refold — cost
        is O(total state) per call; for bounded maintenance at high
        batch counts use :meth:`compact_tiered`."""
        import shutil

        meta = self._meta()
        gens = self._gens_of(meta)
        ids = self.batch_ids()
        if not ids:
            return 0
        upto = ids[-1]  # highest id stays replayable, everything below folds
        # batches below the previous upto are crash-mid-cleanup orphans:
        # their rows are ALREADY in the current generation, so they are
        # deleted below but never folded again (double-count guard)
        new_fold = [
            os.path.join(self.root, f"batch={b}")
            for b in ids
            if meta["upto"] <= b < upto
        ]
        # no new batches AND at most one generation: nothing to do —
        # but a multi-generation (tiered) layout still consolidates,
        # so a full refold after compact_tiered() is never a silent no-op
        if not new_fold and len(gens) <= 1:
            return 0
        fold_dirs = [self._gen_dir(g) for g in gens] + new_fold
        gen = self._next_gen(meta)
        df = self._read_dirs(spark, fold_dirs)
        if df is None:
            # every foldable dir is empty (an all-duplicate stream
            # writes one empty dir per trigger): still advance upto and
            # drop them, or the directory growth this class exists to
            # bound continues unbounded — the generations are unchanged
            self._flip(upto, gens, gen)
            for b in ids:
                if b < upto:
                    shutil.rmtree(
                        os.path.join(self.root, f"batch={b}"), ignore_errors=True
                    )
            return 0
        n = self._write_gen(spark, df, gen, partition_by, fold)
        self._flip(upto, [gen], gen + 1)
        # post-commit cleanup; orphans from a crash here are re-collected
        for b in ids:
            if b < upto:
                shutil.rmtree(os.path.join(self.root, f"batch={b}"), ignore_errors=True)
        for g in gens:
            shutil.rmtree(self._gen_dir(g), ignore_errors=True)
        return n

    def compact_tiered(
        self,
        spark: SparkSession,
        partition_by: str | None = None,
        fold=None,
        fanout: int = 8,
    ) -> int:
        """Generational (Lucene-style tiered) compaction: fold the new
        fully-committed batches into ONE new generation — never
        re-reading prior generations — then, while more than ``fanout``
        generations exist, merge the ``fanout`` SMALLEST (by bytes)
        into one. Each byte is rewritten O(log_fanout(total/batch))
        times over the index's lifetime instead of once per compaction,
        so per-call cost tracks the tail of new data, not O(index).

        Same crash discipline as :meth:`compact`: a new generation dir
        is unreferenced until the atomic meta flip; superseded dirs are
        deleted post-commit, and orphans from a crash mid-cleanup are
        swept on the next call. Returns the row count folded from batch
        dirs this call (0 = no new batches; tier merges may still run).
        """
        import shutil

        fanout = max(2, fanout)  # merging k dirs into 1 must shrink the list
        meta = self._meta()
        gens = self._gens_of(meta)
        next_gen = self._next_gen(meta)
        upto = int(meta["upto"])
        ids = self.batch_ids()

        # sweep generation orphans (crash between a gen write and its
        # meta flip, or mid-cleanup): on-disk g dirs not referenced
        comp_root = os.path.join(self.root, "compact")
        if os.path.isdir(comp_root):
            for e in os.listdir(comp_root):
                if e.startswith("g=") and int(e.split("=", 1)[1]) not in gens:
                    shutil.rmtree(os.path.join(comp_root, e), ignore_errors=True)

        rows = 0
        if ids:
            new_upto = ids[-1]
            new_fold = [
                os.path.join(self.root, f"batch={b}")
                for b in ids
                if upto <= b < new_upto
            ]
            if new_fold:
                df = self._read_dirs(spark, new_fold)
                if df is not None:
                    rows = self._write_gen(spark, df, next_gen, partition_by, fold)
                    gens = gens + [next_gen]
                    next_gen += 1
                upto = new_upto
                self._flip(upto, gens, next_gen)
                for b in ids:
                    if b < upto:
                        shutil.rmtree(
                            os.path.join(self.root, f"batch={b}"), ignore_errors=True
                        )

        while len(gens) > fanout:
            by_size = sorted(gens, key=lambda g: self._dir_bytes(self._gen_dir(g)))
            victims = by_size[:fanout]
            df = self._read_dirs(spark, [self._gen_dir(g) for g in victims])
            survivors = [g for g in gens if g not in victims]
            if df is not None:
                self._write_gen(spark, df, next_gen, partition_by, fold)
                survivors = survivors + [next_gen]
            merged_next = next_gen + 1
            self._flip(upto, survivors, merged_next)
            for g in victims:
                shutil.rmtree(self._gen_dir(g), ignore_errors=True)
            gens, next_gen = survivors, merged_next
        return rows

    def replace_all(
        self, spark: SparkSession, df: DataFrame, partition_by: str | None = None
    ) -> int:
        """Replace the ENTIRE state (every batch dir and generation)
        with ``df`` as one new generation — the primitive behind index
        re-banding/rebuilds, where the replacement rows are derived
        under a different scheme than the rows they supersede.

        Same crash discipline as :meth:`compact`: the generation dir is
        unreferenced until the atomic meta flip, cleanup runs
        post-commit, and a crash mid-cleanup leaves orphans the next
        compaction sweeps. Caller contract (stricter than compact):
        the stream must be QUIESCED with its last batch fully
        committed — the replacement subsumes even the highest batch id,
        so a replay of that batch afterwards would see its own rows as
        history.
        """
        import shutil

        meta = self._meta()
        gens = self._gens_of(meta)
        ids = self.batch_ids()
        gen = self._next_gen(meta)
        n = self._write_gen(spark, df, gen, partition_by)
        upto = max([meta["upto"], *(b + 1 for b in ids)]) if ids else meta["upto"]
        self._flip(upto, [gen], gen + 1)
        for b in ids:
            shutil.rmtree(os.path.join(self.root, f"batch={b}"), ignore_errors=True)
        for g in gens:
            shutil.rmtree(self._gen_dir(g), ignore_errors=True)
        return n


class IndexGrowthGuard:
    """Build-time-N bookkeeping for persisted index sinks.

    A persisted index freezes its geometry at build time (banding
    scheme, quantizer cells) while the auto-sizers pick geometry from
    the LIVE corpus count (``auto_lsh_params``) — so a stream growing
    far past its build-time N silently re-enters the quadratic
    candidate floor the sizing removed, or strands an IVF quantizer
    with ever-fatter cells. Nothing fails: the scheme still matches
    itself. This guard records the count the geometry was sized for in
    the index manifest (``growth.json``), accumulates the live count
    as batches commit, and past ``growth_factor`` emits a LOUD
    ``RuntimeWarning`` on every append/probe plus a machine-readable
    :meth:`status` for maintenance jobs to trigger
    re-banding/retraining (``NearDupIngestSink.reband``).

    Counts are updated AFTER a batch commits and keyed by batch id, so
    a replayed batch does not double-count its rows.
    """

    def __init__(self, index_dir: str, growth_factor: float = 8.0) -> None:
        self.path = os.path.join(index_dir, "growth.json")
        self.growth_factor = float(growth_factor)

    def _state(self) -> dict:
        return _read_json(self.path) or {
            "built_n": None,
            "live_n": 0,
            "last_batch": None,
        }

    def observe(self, n_added: int, batch_id: int) -> None:
        st = self._state()
        if batch_id >= 0:
            # monotone stream space: at-or-below the high-water id means
            # a replayed batch whose rows are already counted
            if st["last_batch"] is not None and batch_id <= st["last_batch"]:
                return
            st["last_batch"] = batch_id
        else:
            # reserved negative backfill ids sit OUTSIDE the monotone
            # space (mirrors the manifest sink): a backfill ingested
            # AFTER stream batches must still count, so replays are
            # detected by exact id, not order. Bounded: backfills are
            # rare one-shot loads, not per-micro-batch events.
            seen_neg = set(st.get("seen_neg", []))
            if batch_id in seen_neg:
                return
            seen_neg.add(batch_id)
            st["seen_neg"] = sorted(seen_neg)
        st["live_n"] = int(st["live_n"]) + int(n_added)
        if st["built_n"] is None and st["live_n"] > 0:
            # geometry was sized by whatever built the first non-empty
            # state — that count is the baseline growth is measured from
            st["built_n"] = st["live_n"]
        _write_json_atomic(self.path, st)

    def reset(self, built_n: int | None = None) -> None:
        """Re-baseline after a rebuild sized the geometry for the
        current corpus (built_n defaults to the live count)."""
        st = self._state()
        st["built_n"] = int(st["live_n"] if built_n is None else built_n)
        _write_json_atomic(self.path, st)

    def status(self) -> dict:
        st = self._state()
        built, live = st["built_n"], int(st["live_n"])
        factor = (live / built) if built else 0.0
        return {
            "built_n": built,
            "live_n": live,
            "growth": round(factor, 2),
            "needs_rebuild": bool(built) and factor >= self.growth_factor,
        }

    def check(self, what: str) -> dict:
        import warnings

        st = self.status()
        if st["needs_rebuild"]:
            warnings.warn(
                f"{what}: index geometry was sized for ~{st['built_n']} items "
                f"but the corpus has grown {st['growth']}x to {st['live_n']} "
                f"(threshold {self.growth_factor}x) - candidate buckets no "
                "longer match the sizing rule; rebuild/re-band the index "
                "(e.g. NearDupIngestSink.reband) during a maintenance window.",
                RuntimeWarning,
                stacklevel=3,
            )
        return st


class DedupIngestSink:
    """``foreachBatch`` callable: dedup each batch against history and
    append survivors.

    Layout under ``out_dir``::

        corpus/batch=<n>/   surviving document rows (+ content_hash)
        hashes/batch=<n>/   exactly the hashes this batch added
    """

    def __init__(self, out_dir: str, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.out_dir = out_dir
        self.text_col = text_col
        self.id_col = id_col
        self._hash_state = BatchDirState(self._hashes_dir)

    @property
    def _corpus_dir(self) -> str:
        return os.path.join(self.out_dir, "corpus")

    @property
    def _hashes_dir(self) -> str:
        return os.path.join(self.out_dir, "hashes")

    def _history(self, spark: SparkSession, exclude_batch: int) -> DataFrame:
        """All committed hashes EXCEPT the given batch's own (a replay
        must not see its previous partial write as 'history')."""
        hist = self._hash_state.read(spark, exclude_batch=exclude_batch)
        if hist is None:
            return spark.createDataFrame([], "content_hash string")
        return hist.select("content_hash")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        seen = self._history(spark, exclude_batch=batch_id)
        survivors = incremental_exact_dedup(
            batch_df, seen, text_col=self.text_col, id_col=self.id_col
        )
        # deterministic dirs + overwrite = replay-safe (see module doc)
        survivors.write.mode("overwrite").parquet(
            os.path.join(self._corpus_dir, f"batch={batch_id}")
        )
        self._hash_state.write_batch(survivors.select("content_hash"), batch_id)

    def compact(self, spark: SparkSession) -> int:
        """Fold fully-committed hash batches into one generation (run
        between triggers; see BatchDirState)."""
        return self._hash_state.compact(spark)

    def committed_corpus(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self._corpus_dir).parquet(
            self._corpus_dir
        )


class NearDupIngestSink:
    """``foreachBatch`` callable: near-dup gate each batch against the
    corpus's persisted LSH band index.

    Policy per micro-batch (the practical ingest rule):

    - a batch document near-dup to ANY historical document is dropped
      (history always wins — it is already written);
    - within the batch, near-dup clusters keep their min-id member
      (connected components over the batch-only pairs);
    - survivors' band rows are appended to the index under
      ``bands/batch=<n>`` — deterministic dir + overwrite, so replays
      are idempotent and a replay never sees its own partial append
      as history.

    Scale: the per-batch cost is the batch's own MinHash (corpus text
    is shingled only for collision-touched ids, see
    ``incremental_near_dup_pairs``); the index grows NUM_BANDS rows
    (~a few hundred bytes) per kept document.
    """

    def __init__(
        self,
        out_dir: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_bands: int | None = None,
        growth_factor: float = 8.0,
    ) -> None:
        from stream_loader_spark.operators.dedup import NUM_BANDS

        self.out_dir = out_dir
        self.text_col = text_col
        self.id_col = id_col
        self.num_bands = NUM_BANDS if num_bands is None else int(num_bands)
        self._check_scheme()
        self._band_state = BatchDirState(self._bands_dir)
        self._doc_state = BatchDirState(self._docs_dir)
        self.growth = IndexGrowthGuard(self.out_dir, growth_factor)

    @property
    def _scheme(self) -> str:
        from stream_loader_spark.operators.dedup import signature_scheme

        return signature_scheme(self.num_bands)

    def _check_scheme(self) -> None:
        """Stamp the banding scheme on a fresh index; refuse to reopen
        an index built under a different one. Band hashes from two
        schemes never collide meaningfully, so mixing them would
        silently stop finding history duplicates instead of erroring.
        """
        SIGNATURE_SCHEME = self._scheme

        self._needs_reband = False
        path = os.path.join(self.out_dir, "scheme.json")
        existing = _read_json(path)
        if existing is not None and existing.get("rebanding"):
            # interrupted reband (crash between the band rewrite and the
            # scheme re-stamp): band rows may mix two schemes, so fail
            # CLOSED on probing — but let a ctor targeting the same
            # scheme open the index to rerun reband() and finish it
            if existing.get("scheme") != SIGNATURE_SCHEME:
                raise ValueError(
                    f"band index at {self.out_dir!r} has an interrupted "
                    f"reband toward scheme {existing.get('scheme')!r}; open "
                    "with that banding and rerun reband() to finish it"
                )
            self._needs_reband = True
            return
        if existing is None:
            # Only stamp a genuinely FRESH index. A directory that
            # already holds band/doc data but no scheme.json was built
            # by a version that predates scheme stamping — its band
            # hashes come from an unknown family, so stamping and
            # probing it would be exactly the silent recall loss this
            # guard exists to prevent.
            for sub in (self._bands_dir, self._docs_dir):
                if os.path.isdir(sub) and os.listdir(sub):
                    raise ValueError(
                        f"band index at {self.out_dir!r} has data but no "
                        "scheme.json: it predates banding-scheme stamping "
                        "and its band hashes are from an unknown scheme; "
                        "rebuild the index — probing across schemes "
                        "silently loses recall"
                    )
            os.makedirs(self.out_dir, exist_ok=True)
            _write_json_atomic(path, {"scheme": SIGNATURE_SCHEME})
        elif existing.get("scheme") != SIGNATURE_SCHEME:
            raise ValueError(
                f"band index at {self.out_dir!r} was built with scheme "
                f"{existing.get('scheme')!r} but this build uses "
                f"{SIGNATURE_SCHEME!r}; rebuild the index (or run the "
                "matching version) — probing across schemes silently "
                "loses recall"
            )

    @property
    def _corpus_dir(self) -> str:
        return os.path.join(self.out_dir, "corpus")

    @property
    def _bands_dir(self) -> str:
        return os.path.join(self.out_dir, "bands")

    @property
    def _docs_dir(self) -> str:
        return os.path.join(self.out_dir, "docs")

    def _index(self, spark: SparkSession, exclude_batch: int):
        bands = self._band_state.read(spark, exclude_batch=exclude_batch)
        docs = self._doc_state.read(spark, exclude_batch=exclude_batch)
        if bands is None or docs is None:
            return (
                spark.createDataFrame(
                    [], f"{self.id_col} long, band int, band_hash bigint"
                ),
                spark.createDataFrame(
                    [], f"{self.id_col} long, {self.text_col} string"
                ),
            )
        return (
            bands.select(self.id_col, "band", "band_hash"),
            docs.select(self.id_col, self.text_col),
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from stream_loader_spark.operators.dedup import (
            band_index,
            _paired_labels,
            incremental_near_dup_pairs,
        )

        spark = batch_df.sparkSession
        if self._needs_reband:
            raise ValueError(
                f"band index at {self.out_dir!r} has an interrupted reband; "
                "its band rows may mix two schemes - rerun reband() to "
                "finish the rebuild before probing"
            )
        self.growth.check("NearDupIngestSink")
        hist_bands, hist_docs = self._index(spark, exclude_batch=batch_id)
        batch_df = batch_df.persist()
        pairs = incremental_near_dup_pairs(
            batch_df,
            hist_docs,
            hist_bands,
            self.text_col,
            self.id_col,
            num_bands=self.num_bands,
        ).persist()

        hist_hit = (
            pairs.join(hist_docs.select(self.id_col).withColumnRenamed(self.id_col, "doc_a"), "doc_a")
            .select(F.col("doc_b").alias(self.id_col))
            .union(
                pairs.join(
                    hist_docs.select(self.id_col).withColumnRenamed(self.id_col, "doc_b"),
                    "doc_b",
                ).select(F.col("doc_a").alias(self.id_col))
            )
            .distinct()
        )
        remaining = batch_df.join(hist_hit, self.id_col, "left_anti")
        # batch-only pairs among still-standing docs -> min-id per cluster
        rem_ids = remaining.select(self.id_col)
        batch_pairs = (
            pairs.join(rem_ids.withColumnRenamed(self.id_col, "doc_a"), "doc_a")
            .join(rem_ids.withColumnRenamed(self.id_col, "doc_b"), "doc_b")
            .select("doc_a", "doc_b")
        )
        # losers are paired docs only — skip the corpus-sized
        # singleton labeling (see dedup._paired_labels)
        comps = _paired_labels(remaining, batch_pairs, self.id_col)
        losers = comps.where(F.col(self.id_col) != F.col("cluster_id")).select(self.id_col)
        survivors = remaining.join(losers, self.id_col, "left_anti").persist()

        survivors.write.mode("overwrite").parquet(
            os.path.join(self._corpus_dir, f"batch={batch_id}")
        )
        self._doc_state.write_batch(
            survivors.select(self.id_col, self.text_col), batch_id
        )
        self._band_state.write_batch(
            band_index(survivors, self.text_col, self.id_col, self.num_bands),
            batch_id,
        )
        self.growth.observe(survivors.count(), batch_id)
        pairs.unpersist()
        batch_df.unpersist()
        survivors.unpersist()

    def compact(self, spark: SparkSession) -> int:
        """Fold fully-committed band/doc index batches (run between
        triggers; see BatchDirState)."""
        return self._band_state.compact(spark) + self._doc_state.compact(spark)

    def reband(self, spark: SparkSession, num_bands: int | None = None) -> int:
        """Rebuild the band index from the persisted documents under a
        (possibly new) banding and re-baseline the growth guard — the
        maintenance op :class:`IndexGrowthGuard` points at when the
        corpus outgrows its build-time sizing.

        Cost is O(corpus text) — one re-shingle/re-hash pass — which is
        the honest price of changing LSH geometry; the guard's
        growth_factor spaces these rebuilds logarithmically over the
        stream's lifetime. MUST run on a quiesced stream whose last
        batch fully committed (``replace_all``'s contract). Crash
        discipline: the ``rebanding`` marker flips in scheme.json
        first, so a crash between the band rewrite and the scheme
        re-stamp fails CLOSED on reopen (mixed-scheme band rows are
        never silently probed); rerunning reband() completes the
        rebuild. Returns the number of band rows written.
        """
        from stream_loader_spark.operators.dedup import band_index

        if num_bands is not None:
            self.num_bands = int(num_bands)
        path = os.path.join(self.out_dir, "scheme.json")
        _write_json_atomic(path, {"scheme": self._scheme, "rebanding": True})
        docs = self._doc_state.read(spark)
        if docs is None:
            docs = spark.createDataFrame(
                [], f"{self.id_col} long, {self.text_col} string"
            )
        n = self._band_state.replace_all(
            spark, band_index(docs, self.text_col, self.id_col, self.num_bands)
        )
        _write_json_atomic(path, {"scheme": self._scheme})
        self._needs_reband = False
        self.growth.reset()
        return n

    def committed_corpus(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self._corpus_dir).parquet(
            self._corpus_dir
        )


class IvfIngestSink:
    """``foreachBatch`` callable: streaming maintenance of an IVF
    similarity index — the ANN twin of ``DedupIngestSink``.

    - The coarse quantizer (centroids) trains ONCE on the first
      non-empty batch (Lloyd refinement of the batch's smallest-id
      vectors) and is frozen thereafter — the standard IVF discipline:
      a quantizer that drifted per batch would strand earlier
      assignments in stale cells.
    - Every batch's vectors are assigned to their nearest centroid
      (broadcast argmax, one corpus pass) and land under
      ``assignments/batch=<n>/cluster_id=<c>/`` — Hive-partitioned by
      cluster, so a probe reads only its nprobe clusters' directories
      AT THE SCAN, at any index size.
    - Deterministic dirs + overwrite keep replays idempotent (same
      discipline as the dedup ingest sinks); training is deterministic,
      so a replayed first batch rewrites the identical quantizer.

    ``topk`` probes the persisted index via ``ivf_probe`` — queries
    never trigger an index rebuild.
    """

    def __init__(
        self,
        out_dir: str,
        num_centroids: int = 16,
        kmeans_iterations: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        self.out_dir = out_dir
        self.num_centroids = num_centroids
        self.kmeans_iterations = kmeans_iterations
        self.id_col = id_col
        self.vec_col = vec_col
        os.makedirs(self.out_dir, exist_ok=True)
        self._assign_state = BatchDirState(self._assignments_dir)
        # the frozen quantizer's cells fatten linearly as the corpus
        # grows past its training-time N (probe cost ~ nprobe * N / C);
        # the guard makes that drift loud instead of silent — the
        # remedy is a retrain + reassign maintenance pass, deliberately
        # NOT automatic (quantizer drift strands prior assignments)
        self.growth = IndexGrowthGuard(self.out_dir)

    @property
    def _centroids_dir(self) -> str:
        return os.path.join(self.out_dir, "centroids")

    @property
    def _assignments_dir(self) -> str:
        return os.path.join(self.out_dir, "assignments")

    def centroids(self, spark: SparkSession) -> DataFrame | None:
        """The frozen quantizer, or None if never trained. Existence is
        decided by LISTING, never by a swallowed read error — treating
        a transient IO failure as 'not trained' would silently retrain
        and strand every prior assignment in the old quantizer's cells
        (the exact failure the freeze exists to prevent)."""
        if not _has_data_files(self._centroids_dir):
            return None
        return spark.read.parquet(self._centroids_dir)

    def _train(self, batch_df: DataFrame) -> DataFrame:
        from stream_loader_spark.operators.similarity import kmeans_centroids

        spark = batch_df.sparkSession
        rows = (
            batch_df.orderBy(F.col(self.id_col))
            .limit(self.num_centroids)
            .select(self.vec_col)
            .collect()
        )  # ≤ num_centroids × dim values — never corpus-sized
        initial = spark.createDataFrame(
            [(i, [float(x) for x in r[0]]) for i, r in enumerate(rows)],
            "centroid_id int, centroid_vec array<double>",
        )
        if self.kmeans_iterations <= 0:
            return initial
        return kmeans_centroids(
            batch_df,
            min(self.num_centroids, len(rows)),
            self.kmeans_iterations,
            self.id_col,
            self.vec_col,
            initial=initial,
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from stream_loader_spark.operators.similarity import assign_clusters

        spark = batch_df.sparkSession
        # the batch is consumed several times on the training path
        # (take, seed collect, one pass per Lloyd iteration, assignment
        # write) and twice otherwise — recomputing a source-backed
        # micro-batch per action would re-fetch it from the source
        batch_df = batch_df.persist()
        try:
            cents = self.centroids(spark)
            if cents is None:
                if not batch_df.take(1):
                    return  # nothing to train on yet
                # atomic quantizer commit: write aside, one directory
                # rename publishes it — a crash mid-write leaves an
                # unreferenced tmp dir, never a partially-visible
                # quantizer that would be frozen forever
                tmp = self._centroids_dir + ".tmp"
                self._train(batch_df).write.mode("overwrite").parquet(tmp)
                if os.path.isdir(self._centroids_dir):
                    # crash leftover with no data files (centroids()
                    # returned None) — clear it so the rename lands
                    import shutil

                    shutil.rmtree(self._centroids_dir)
                os.rename(tmp, self._centroids_dir)
                cents = self.centroids(spark)
            assigned = assign_clusters(
                batch_df,
                self.num_centroids,
                self.id_col,
                self.vec_col,
                centroids=cents,
            )
            self._assign_state.write_batch(
                assigned, batch_id, partition_by="cluster_id"
            )
            self.growth.observe(batch_df.count(), batch_id)
            self.growth.check("IvfIngestSink")
        finally:
            batch_df.unpersist()

    def assignments(self, spark: SparkSession) -> DataFrame:
        idx = self._assign_state.read(spark)
        if idx is None:
            raise ValueError(f"no committed assignments under {self.out_dir}")
        return idx.select(self.id_col, self.vec_col, "cluster_id")

    def compact(self, spark: SparkSession) -> int:
        """Fold fully-committed assignment batches into one generation,
        keeping the cluster_id layout (run between triggers)."""
        return self._assign_state.compact(spark, partition_by="cluster_id")

    def topk(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 4,
    ) -> DataFrame:
        """Approximate top-k over the committed index. ``queries`` is
        (query_id, query_vec); with nprobe = num_centroids the probe is
        exhaustive and the result exact."""
        from stream_loader_spark.operators.similarity import ivf_probe

        self.growth.check("IvfIngestSink.topk")

        cents = self.centroids(spark)
        if cents is None:
            raise ValueError(f"no trained index under {self.out_dir}")
        return ivf_probe(
            self.assignments(spark),
            cents,
            queries,
            k,
            nprobe,
            self.id_col,
            self.vec_col,
        )

    def retrain(
        self, spark: SparkSession, num_centroids: int | None = None
    ) -> int:
        """Retrain the coarse quantizer on the CURRENT corpus and
        reassign every vector — the IVF twin of
        ``NearDupIngestSink.reband``, and the maintenance op
        :class:`IndexGrowthGuard` points at when the corpus outgrows
        its training-time N (cells fatten linearly; C should grow
        ~sqrt(N)). Deliberately manual, never automatic: a quantizer
        that drifted per batch would strand earlier assignments in
        stale cells, which is exactly what the full reassign here
        avoids.

        Cost is O(corpus) — Lloyd refinement plus one full
        reassignment pass — the honest price of changing quantizer
        geometry; the guard's growth factor spaces retrains
        logarithmically over the stream's lifetime. MUST run on a
        quiesced stream whose last batch fully committed
        (``replace_all``'s contract). Crash discipline: the new
        centroids land via write-aside + directory rename BEFORE the
        assignment swap — a crash between the two leaves new centroids
        with old assignments, which ``retrain()`` rerun repairs and
        which probes meanwhile treat consistently (every assignment is
        still a valid cell id; recall degrades, correctness of the
        probe contract does not). Returns the number of vectors
        reassigned.
        """
        import shutil

        from stream_loader_spark.operators.similarity import (
            assign_clusters,
            kmeans_centroids,
        )

        if num_centroids is not None:
            self.num_centroids = int(num_centroids)
        corpus = self.assignments(spark).select(self.id_col, self.vec_col)
        corpus = corpus.persist()
        try:
            seeds = (
                corpus.orderBy(F.col(self.id_col))
                .limit(self.num_centroids)
                .select(self.vec_col)
                .collect()
            )
            if not seeds:
                raise ValueError(f"no vectors to retrain on under {self.out_dir}")
            initial = spark.createDataFrame(
                [(i, [float(x) for x in r[0]]) for i, r in enumerate(seeds)],
                "centroid_id int, centroid_vec array<double>",
            )
            cents = kmeans_centroids(
                corpus,
                min(self.num_centroids, len(seeds)),
                max(self.kmeans_iterations, 1),
                self.id_col,
                self.vec_col,
                initial=initial,
            )
            tmp = self._centroids_dir + ".tmp"
            cents.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(self._centroids_dir, ignore_errors=True)
            os.rename(tmp, self._centroids_dir)
            assigned = assign_clusters(
                corpus,
                self.num_centroids,
                self.id_col,
                self.vec_col,
                centroids=self.centroids(spark),
            )
            n = self._assign_state.replace_all(
                spark, assigned, partition_by="cluster_id"
            )
        finally:
            corpus.unpersist()
        self.growth.reset()
        return n


class IndexIngestSink:
    """``foreachBatch`` callable: streaming maintenance of the n-gram
    inverted index — each micro-batch lands as a SEGMENT (its
    per-(term, doc) counts), compaction merges segments, and term
    lookups prune to the token's hash bucket. The Lucene shape on
    Spark primitives: segment-per-batch, merge-on-maintenance,
    partition-pruned postings reads.

    Layout under ``out_dir``::

        segments/batch=<n>/tbucket=<b>/   (token, doc_id, tc) rows

    Design notes:

    - Segments are pre-aggregated per (token, doc) — the narrowest
      exact state the index can keep. The df band is applied at READ
      time: document frequency is corpus-global and keeps changing as
      batches arrive, so banding at write time would silently freeze
      each term's verdict at whatever the corpus looked like when it
      first appeared.
    - Segments are hash-partitioned by ``tbucket = pmod(xxhash64(token),
      n_buckets)``: a term lookup filters on tbucket, so the scan
      reads 1/n_buckets of the index regardless of corpus size — the
      property that keeps single-term queries interactive at 100 TB.
    - Replay idempotence and compaction are ``BatchDirState``'s:
      deterministic ``batch=<n>`` dirs in overwrite mode, fold behind
      an atomic manifest flip (run ``compact()`` between triggers).
    """

    def __init__(
        self,
        out_dir: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        n: int = 2,
        n_buckets: int = 64,
    ) -> None:
        if n < 1:
            raise ValueError(f"n must be >= 1, got {n}")
        self.out_dir = out_dir
        self.text_col = text_col
        self.id_col = id_col
        self.n = n
        self.n_buckets = n_buckets
        self._seg_state = BatchDirState(os.path.join(out_dir, "segments"))

    def _segment(self, batch_df: DataFrame) -> DataFrame:
        # in-row run-length histogram (operators.text.doc_term_counts):
        # the (doc, token) aggregate never crosses document rows, so the
        # per-micro-batch exchange the old explode+groupBy paid bought
        # nothing — the segment build is a narrow map ahead of the
        # tbucket-partitioned write
        from stream_loader_spark.operators.text import doc_term_counts

        return doc_term_counts(
            batch_df, self.text_col, self.id_col, self.n
        ).withColumn(
            "tbucket", F.pmod(F.xxhash64("token"), F.lit(self.n_buckets))
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self._seg_state.write_batch(
            self._segment(batch_df), batch_id, partition_by="tbucket"
        )

    def _merge_segments(self, df: DataFrame) -> DataFrame:
        """Re-aggregate segment rows by (token, doc): a doc whose text
        arrives in more than one micro-batch lands one (token, doc, tc)
        row PER SEGMENT, and without this fold df counts it twice, tf
        double-groups, and the postings list emits the doc twice —
        silently breaking the inverted_postings output contract. Sum is
        associative, so applying this per compaction generation AND at
        read time composes correctly."""
        return df.groupBy("token", self.id_col, "tbucket").agg(
            F.sum("tc").alias("tc")
        )

    def compact(self, spark: SparkSession, tiered: bool = False) -> int:
        """Merge fully-committed segments, keeping the tbucket layout
        (run between triggers, like vacuum). ``tiered=False`` folds the
        whole index into one generation — O(index) per call;
        ``tiered=True`` uses generational merging
        (:meth:`BatchDirState.compact_tiered`) so per-call cost tracks
        newly-arrived segments, the shape that stays bounded at
        100k-micro-batch lifetimes. Duplicate (token, doc) rows across
        the folded segments are summed either way."""
        if tiered:
            return self._seg_state.compact_tiered(
                spark, partition_by="tbucket", fold=self._merge_segments
            )
        return self._seg_state.compact(
            spark, partition_by="tbucket", fold=self._merge_segments
        )

    def _state(self, spark: SparkSession) -> DataFrame | None:
        state = self._seg_state.read(spark)
        return None if state is None else self._merge_segments(state)

    def postings(
        self, spark: SparkSession, min_df: int = 2, max_df: int = 50
    ) -> DataFrame:
        """The committed index's df-banded postings — identical output
        contract to ``operators.text.inverted_postings`` over the
        ingested corpus (pinned by test, including docs split across
        micro-batches). A full-index aggregate: use ``lookup`` for term
        queries; this is the bulk/export path."""
        state = self._state(spark)
        if state is None:
            raise ValueError(f"no committed segments under {self.out_dir}")
        keep = (
            state.groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"), F.sum("tc").alias("tf"))
            .where((F.col("df") >= min_df) & (F.col("df") <= max_df))
        )
        return (
            state.join(F.broadcast(keep), "token")
            .groupBy("token", "df", "tf")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.col(self.id_col).cast("bigint"))
                        ),
                        lambda d: d.cast("string"),
                    ),
                    ",",
                ).alias("postings")
            )
            .select("token", "df", "tf", "postings")
        )

    def lookup(self, spark: SparkSession, terms: list[str]) -> DataFrame:
        """Posting rows for specific terms: (token, doc_id, tc).

        Read-time union PRE-PRUNE: the terms' ``tbucket=<b>`` leaf
        directories are enumerated driver-side across every live
        segment/generation and read as ONE multi-root scan, so the
        physical plan carries a single scan node however many tiered
        generations are live. The previous shape (union every live
        root, then filter tbucket) pruned the same FILES but paid one
        scan node + listing per generation — measured lookup latency
        drifting 1.2s → 2.4s as tiered compaction held six generations
        live, which is exactly the read-side fan-out Lucene bounds
        with its max-merged tier. Reads 1/n_buckets of the index per
        distinct bucket, never the corpus; per-segment duplicate
        (token, doc) rows merge in the aggregate."""
        if not terms:
            raise ValueError("terms must be non-empty")
        dirs = self._seg_state.dirs()
        if not any(_has_data_files(d) for d in dirs):
            raise ValueError(f"no committed segments under {self.out_dir}")
        term_lit = F.array(*[F.lit(t) for t in terms])
        buckets = sorted(
            {  # driver-side xxhash64 is not available: derive via a tiny job
                r.b
                for r in spark.createDataFrame(
                    [(t,) for t in terms], "token string"
                )
                .select(F.pmod(F.xxhash64("token"), F.lit(self.n_buckets)).alias("b"))
                .collect()
            }
        )
        pruned = [
            p
            for d in dirs
            for b in buckets
            if _has_data_files(p := os.path.join(d, f"tbucket={b}"))
        ]
        if not pruned:
            return spark.createDataFrame(
                [], f"token string, {self.id_col} long, tc bigint"
            )
        return (
            spark.read.parquet(*pruned)
            .where(F.array_contains(term_lit, F.col("token")))
            .groupBy("token", self.id_col)
            .agg(F.sum("tc").alias("tc"))
            .select("token", self.id_col, "tc")
        )
