"""Training-corpus operators: chunking, contamination, stratified
sampling, TF-IDF (operators/training.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stream_loader_spark.operators.training import (
    benchmark_contamination,
    chunk_documents,
    stratified_sample,
    tfidf_top_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


class TestChunkDocuments:
    def test_chunks_cover_with_overlap(self, spark):
        text = " ".join(f"w{i}" for i in range(40))
        out = chunk_documents(
            _docs(spark, [(1, text, "en")]), chunk_tokens=32, overlap=8
        ).collect()
        # stride 24 over 40 tokens → starts 0 and 24 → sizes 32 and 16
        by_idx = {r["chunk_index"]: r["n_tokens"] for r in out}
        assert by_idx == {0: 32, 1: 16}

    def test_short_doc_is_one_chunk(self, spark):
        out = chunk_documents(_docs(spark, [(1, "a b c", "en")])).collect()
        assert len(out) == 1 and out[0]["n_tokens"] == 3

    def test_empty_doc_has_no_chunks(self, spark):
        out = chunk_documents(_docs(spark, [(1, "   ", "en")])).collect()
        assert out == []

    def test_chunk_hash_pins_content(self, spark):
        import hashlib

        out = chunk_documents(_docs(spark, [(1, "a b c", "en")])).collect()
        assert out[0]["chunk_hash"] == hashlib.sha256(b"a b c").hexdigest()

    def test_overlap_must_be_smaller_than_chunk(self, spark):
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(_docs(spark, [(1, "a", "en")]), chunk_tokens=8, overlap=8)


class TestBenchmarkContamination:
    def test_copied_document_is_fully_contaminated(self, spark):
        bench_text = "alpha beta gamma delta epsilon zeta"
        corpus = _docs(
            spark,
            [
                (10, bench_text, "en"),  # verbatim copy of a benchmark doc
                (11, "one two three four five six", "en"),  # disjoint
            ],
        )
        bench = _docs(spark, [(1, bench_text, "en")])
        rows = {r["doc_id"]: r for r in benchmark_contamination(corpus, bench).collect()}
        assert rows[10]["contamination"] == 1.0
        assert rows[11]["contamination"] == 0.0
        assert rows[11]["n_contaminated"] == 0

    def test_partial_overlap_fraction(self, spark):
        # doc shares exactly its first 3-shingle with the benchmark
        bench = _docs(spark, [(1, "a b c", "en")])
        corpus = _docs(spark, [(2, "a b c d", "en")])  # shingles: "a b c", "b c d"
        (row,) = benchmark_contamination(corpus, bench).collect()
        assert row["n_shingles"] == 2 and row["n_contaminated"] == 1
        assert row["contamination"] == 0.5

    def test_plan_broadcasts_benchmark_side(self, spark):
        bench = _docs(spark, [(1, "a b c", "en")])
        corpus = _docs(spark, [(2, "a b c d", "en")])
        plan = benchmark_contamination(corpus, bench)._jdf.queryExecution().toString()
        assert "broadcast" in plan.lower()


class TestStratifiedSample:
    def test_caps_every_stratum(self, spark):
        rows = [(i, f"t{i}", "en" if i % 3 else "de") for i in range(100)]
        out = stratified_sample(_docs(spark, rows), per_stratum=5).collect()
        by_lang: dict[str, list] = {}
        for r in out:
            by_lang.setdefault(r["lang"], []).append(r["sample_rank"])
        assert set(by_lang) == {"en", "de"}
        assert all(sorted(v) == list(range(1, 6)) for v in by_lang.values())

    def test_deterministic_across_partitionings(self, spark):
        rows = [(i, f"t{i}", "en") for i in range(200)]
        df1 = _docs(spark, rows).repartition(1)
        df2 = _docs(spark, rows).repartition(7)
        pick1 = sorted(r["doc_id"] for r in stratified_sample(df1, 10).collect())
        pick2 = sorted(r["doc_id"] for r in stratified_sample(df2, 10).collect())
        assert pick1 == pick2

    def test_small_stratum_kept_whole(self, spark):
        rows = [(1, "x", "fr"), (2, "y", "fr")]
        out = stratified_sample(_docs(spark, rows), per_stratum=10).collect()
        assert len(out) == 2


class TestTfidfTopTerms:
    def test_rare_term_outranks_common(self, spark):
        docs = _docs(
            spark,
            [
                (1, "common common rare", "en"),
                (2, "common filler filler", "en"),
                (3, "common other other", "en"),
            ],
        )
        out = tfidf_top_terms(docs, k=1).collect()
        top = {r["doc_id"]: r["token"] for r in out}
        # "common" is in every doc → idf = ln(1) = 0; unique terms win
        assert top[1] == "rare"
        assert top[2] == "filler" and top[3] == "other"

    def test_k_and_rank_are_respected(self, spark):
        docs = _docs(spark, [(1, "a b c d e", "en"), (2, "a x", "en")])
        out = tfidf_top_terms(docs, k=3).collect()
        per_doc: dict[int, list[int]] = {}
        for r in out:
            per_doc.setdefault(r["doc_id"], []).append(r["term_rank"])
        assert sorted(per_doc[1]) == [1, 2, 3]
        assert all(rk <= 3 for rks in per_doc.values() for rk in rks)


class TestKeepBestDedup:
    def test_keeps_highest_quality_min_id_tiebreak(self, spark):
        from stream_loader_spark.operators.dedup import keep_best_dedup

        rows = [
            # group A: quality winner is doc 3 (longest)
            (1, "same text", 5),
            (3, "same text", 9),
            (2, "same text", 7),
            # group B: tie on quality -> lowest id (4) wins
            (6, "other text", 4),
            (4, "other text", 4),
            # singleton
            (9, "unique", 2),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
        out = {
            r["content_hash"]: r
            for r in keep_best_dedup(df).collect()
        }
        by_text = {}
        import hashlib

        for text in ("same text", "other text", "unique"):
            by_text[text] = hashlib.sha256(text.encode()).hexdigest()
        a = out[by_text["same text"]]
        assert (a["keep_id"], a["best_quality"], a["dup_count"]) == (3, 9, 3)
        b = out[by_text["other text"]]
        assert (b["keep_id"], b["best_quality"], b["dup_count"]) == (4, 4, 2)
        c = out[by_text["unique"]]
        assert (c["keep_id"], c["dup_count"]) == (9, 1)

    def test_plan_is_single_aggregate_no_window(self, spark):
        from stream_loader_spark.operators.dedup import keep_best_dedup

        df = spark.createDataFrame(
            [(1, "t", 1)], "doc_id long, text string, n_chars long"
        )
        plan = keep_best_dedup(df)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan


class TestRebalanceDomains:
    def test_small_domain_kept_whole_large_downsampled(self, spark):
        from stream_loader_spark.operators.sampling import rebalance_domains

        rows = [(i, "big") for i in range(400)] + [
            (1000 + i, "small") for i in range(40)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = rebalance_domains(df).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r)
        # small domain: thr = 256 -> everything kept
        assert len(by_src["small"]) == 40
        # big domain: thr = floor(256*40/400) = 25 -> ~10% kept, never 0
        big = by_src["big"]
        assert 0 < len(big) < 100
        assert all(r["sample_bucket"] < r["keep_thr"] for r in out)

    def test_threshold_never_zero(self, spark):
        from stream_loader_spark.operators.sampling import rebalance_domains

        rows = [(i, "huge") for i in range(1000)] + [(2000, "tiny")]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        thr = {
            r["source"]: r["keep_thr"]
            for r in rebalance_domains(df).select("source", "keep_thr").distinct().collect()
        }
        assert thr.get("huge", 1) >= 1


class TestEpochShuffle:
    def test_reproducible_and_seed_sensitive(self, spark):
        from stream_loader_spark.operators.sampling import epoch_shuffle

        df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
        a1 = sorted(
            epoch_shuffle(df, "s1").select("doc_id", "shard", "pos_in_shard").collect()
        )
        a2 = sorted(
            epoch_shuffle(df, "s1").select("doc_id", "shard", "pos_in_shard").collect()
        )
        b = sorted(
            epoch_shuffle(df, "s2").select("doc_id", "shard", "pos_in_shard").collect()
        )
        assert a1 == a2
        assert a1 != b

    def test_positions_dense_within_shard(self, spark):
        from stream_loader_spark.operators.sampling import epoch_shuffle

        df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
        out = epoch_shuffle(df, "s1").groupBy("shard").agg(
            F.count(F.lit(1)).alias("n"), F.max("pos_in_shard").alias("mx")
        )
        assert all(r["n"] == r["mx"] for r in out.collect())


class TestKeepBestInCluster:
    def test_cluster_winner_is_highest_quality(self, spark):
        from stream_loader_spark.operators.dedup import dedup_keep_best_in_cluster

        docs = spark.createDataFrame(
            [
                (1, "a", 5),
                (2, "b", 9),  # cluster {1,2,3}: winner 2 (quality 9)
                (3, "c", 7),
                (10, "d", 4),  # cluster {10,11}: tie -> min id 10
                (11, "e", 4),
                (20, "f", 1),  # singleton survives
            ],
            "doc_id long, text string, n_chars long",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
        )
        kept = sorted(
            r["doc_id"] for r in dedup_keep_best_in_cluster(docs, pairs).collect()
        )
        assert kept == [2, 10, 20]


class TestPackSequences:
    def test_spans_are_contiguous_per_shard(self, spark):
        from stream_loader_spark.operators.training import pack_sequences

        docs = spark.createDataFrame(
            [(i, "tok " * (i % 7 + 1)) for i in range(200)],
            "doc_id long, text string",
        )
        out = pack_sequences(docs, "s1", context_len=16).collect()
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r)
        for rows in by_shard.values():
            rows.sort(key=lambda r: r["start_tok"])
            expect = 0
            for r in rows:
                assert r["start_tok"] == expect  # no gaps, no overlap
                expect += r["n_tokens"]
                assert r["first_seq"] == r["start_tok"] // 16
                last_tok = max(r["start_tok"], r["start_tok"] + r["n_tokens"] - 1)
                assert r["last_seq"] == last_tok // 16

    def test_context_len_validated(self, spark):
        from stream_loader_spark.operators.training import pack_sequences

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            pack_sequences(docs, "s1", context_len=0)


class TestIncrementalNearDup:
    def test_probe_equals_batch_pairs_touching_new(self, spark, sf_small):
        """The incremental probe against a persisted band index finds
        exactly the batch-mode pairs that involve a new document."""
        from stream_loader_spark.operators.dedup import (
            band_index,
            incremental_near_dup_pairs,
            minhash_lsh_pairs,
        )
        from stream_loader_spark.operators.sampling import sample_bucket
        from stream_loader_spark.sources.tables import load_table

        docs = load_table(spark, sf_small, "documents")
        is_new = sample_bucket(F.col("doc_id")) < 64
        new_docs, corpus = docs.where(is_new), docs.where(~is_new)

        inc = {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 6))
            for r in incremental_near_dup_pairs(
                new_docs, corpus, band_index(corpus)
            ).collect()
        }
        new_ids = {r["doc_id"] for r in new_docs.select("doc_id").collect()}
        batch = {
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 6))
            for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
            if r["doc_a"] in new_ids or r["doc_b"] in new_ids
        }
        assert inc == batch
        assert len(inc) > 0  # fixture guarantees near-dups across the split


class TestIncrementalExactDedup:
    def test_batch_dedup_then_history_anti_join(self, spark):
        from stream_loader_spark.operators.dedup import incremental_exact_dedup

        new = spark.createDataFrame(
            [
                (10, "alpha"),
                (11, "alpha"),  # in-batch dup: 10 kept
                (12, "beta"),  # already in history: dropped
                (13, "gamma"),  # novel: kept
            ],
            "doc_id long, text string",
        )
        seen = spark.createDataFrame([("beta",)], "text string").select(
            F.sha2(F.col("text"), 256).alias("content_hash")
        )
        kept = sorted(
            r["doc_id"] for r in incremental_exact_dedup(new, seen).collect()
        )
        assert kept == [10, 13]

    def test_returned_hashes_extend_history(self, spark):
        from stream_loader_spark.operators.dedup import incremental_exact_dedup

        new = spark.createDataFrame(
            [(1, "x"), (2, "y")], "doc_id long, text string"
        )
        empty_seen = spark.createDataFrame([], "content_hash string")
        out = incremental_exact_dedup(new, empty_seen)
        assert "content_hash" in out.columns
        hashes = {r["content_hash"] for r in out.collect()}
        import hashlib

        assert hashes == {
            hashlib.sha256(b"x").hexdigest(),
            hashlib.sha256(b"y").hexdigest(),
        }

    def test_null_id_rows_are_dropped_not_corrupted(self, spark):
        # r13 (ADVICE): min_by over an all-NULL-id group returns a NULL
        # struct — without the id filter the group emitted a row with
        # every original column NULL but a valid content_hash, which a
        # sink would persist and whose hash would poison history.
        from stream_loader_spark.operators.dedup import incremental_exact_dedup

        new = spark.createDataFrame(
            [
                (None, "ghost"),  # all-NULL-id group: dropped entirely
                (None, "mixed"),
                (7, "mixed"),  # NULL id never beats a real id
                (8, "solo"),
            ],
            "doc_id long, text string",
        )
        empty_seen = spark.createDataFrame([], "content_hash string")
        rows = incremental_exact_dedup(new, empty_seen).collect()
        assert sorted(r["doc_id"] for r in rows) == [7, 8]
        assert all(r["text"] is not None for r in rows)

    def test_duplicate_hash_id_tie_keeps_one_row(self, spark):
        # Exactly-tying (content_hash, id) rows: the old semi-join kept
        # every tying row; min_by keeps ONE representative. Ids are
        # unique in every supported corpus — pin the tie rule so the
        # malformed-input behavior is explicit, not accidental.
        from stream_loader_spark.operators.dedup import incremental_exact_dedup

        new = spark.createDataFrame(
            [(1, "same"), (1, "same"), (2, "same")],
            "doc_id long, text string",
        )
        empty_seen = spark.createDataFrame([], "content_hash string")
        rows = incremental_exact_dedup(new, empty_seen).collect()
        assert len(rows) == 1 and rows[0]["doc_id"] == 1


class TestOversampleDomains:
    def test_small_domain_replicated_to_target(self, spark):
        from stream_loader_spark.operators.sampling import oversample_domains

        rows = [(i, "big") for i in range(400)] + [
            (1000 + i, "small") for i in range(40)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = oversample_domains(df).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r)
        assert len(by_src["big"]) == 400  # largest source: exactly 1 copy each
        # small source: 10x target, integer part 10 -> >= 400 copies,
        # fractional bucket can only add more
        n_small = len(by_src["small"])
        assert 400 <= n_small <= 440
        # copy_index dense per doc
        per_doc = {}
        for r in by_src["small"]:
            per_doc.setdefault(r["doc_id"], []).append(r["copy_index"])
        assert all(sorted(v) == list(range(len(v))) for v in per_doc.values())

    def test_deterministic_across_runs(self, spark):
        from stream_loader_spark.operators.sampling import oversample_domains

        rows = [(i, "a") for i in range(100)] + [(200 + i, "b") for i in range(33)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        r1 = sorted(map(tuple, oversample_domains(df).collect()))
        r2 = sorted(map(tuple, oversample_domains(df).collect()))
        assert r1 == r2


from hypothesis import given, settings, strategies as st  # noqa: E402


class TestPackSequencesProperties:
    @settings(max_examples=5, deadline=None)
    @given(
        lens=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=60),
        seed=st.sampled_from(["pa", "pb", "pc"]),
    )
    def test_spans_partition_the_stream(self, spark, lens, seed):
        """For ANY corpus (empty docs included): per shard, spans are
        contiguous, start at 0, and sum to the shard's token total."""
        from stream_loader_spark.operators.training import pack_sequences

        rows = [(i, "t " * n) for i, n in enumerate(lens)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = pack_sequences(docs, seed, context_len=7).collect()
        assert len(out) == len(lens)
        import hashlib

        def shuffle_key(doc_id):
            return hashlib.md5(f"{seed}{doc_id}".encode()).hexdigest()

        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r)
        for rows_ in by_shard.values():
            # the true epoch order is (shuffle_key, doc_id) — sorting by
            # start_tok would mis-order zero-token docs that tie on it
            rows_.sort(key=lambda r: (shuffle_key(r["doc_id"]), r["doc_id"]))
            expect = 0
            for r in rows_:
                assert r["start_tok"] == expect
                expect += r["n_tokens"]


class TestOversampleProperties:
    @settings(max_examples=5, deadline=None)
    @given(
        counts=st.lists(st.integers(min_value=1, max_value=50), min_size=2, max_size=5)
    )
    def test_every_row_replicated_at_least_base(self, spark, counts):
        from stream_loader_spark.operators.sampling import oversample_domains

        rows = []
        nid = 0
        for s_i, c in enumerate(counts):
            for _ in range(c):
                rows.append((nid, f"s{s_i}"))
                nid += 1
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = oversample_domains(df).groupBy("source", "doc_id").count().collect()
        mx = max(counts)
        by_src_count = {f"s{i}": c for i, c in enumerate(counts)}
        for r in out:
            base = mx // by_src_count[r["source"]]
            assert r["count"] in (base, base + 1)


class TestWeightedSample:
    """A-ES weighted sampling (operators/sampling.py::weighted_sample)."""

    def test_weight_proportional_inclusion(self, spark):
        """Heavy rows must be sampled far more often than light rows:
        across 40 independent salts, rows with weight 100 should beat
        weight-1 rows by roughly their weight ratio."""
        from stream_loader_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(i, 100 if i < 50 else 1) for i in range(500)], "id long, w int"
        ).cache()
        heavy_hits = light_hits = 0
        for s in range(40):
            got = weighted_sample(df, 25, "id", "w", salt=f"s{s}").collect()
            heavy_hits += sum(1 for r in got if r["id"] < 50)
            light_hits += sum(1 for r in got if r["id"] >= 50)
        assert heavy_hits > light_hits * 3  # 50x weight, 9x pop. disadvantage

    def test_deterministic_and_partition_independent(self, spark):
        from stream_loader_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame([(i, i + 1) for i in range(300)], "id long, w int")
        a = [r["id"] for r in weighted_sample(df, 20, "id", "w").collect()]
        b = [r["id"] for r in weighted_sample(df.repartition(13), 20, "id", "w").collect()]
        assert a == b

    def test_nonpositive_weights_excluded(self, spark):
        from stream_loader_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(1, 5), (2, 0), (3, -1), (4, 5)], "id long, w int"
        )
        got = sorted(r["id"] for r in weighted_sample(df, 10, "id", "w").collect())
        assert got == [1, 4]

    def test_topk_plan_is_heap_not_global_sort(self, spark):
        import contextlib
        import io

        from stream_loader_spark.operators.sampling import weighted_sample

        df = spark.range(1000).select(F.col("id"), (F.col("id") % 7 + 1).alias("w"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            weighted_sample(df, 10, "id", "w").explain()
        assert "TakeOrderedAndProject" in buf.getvalue()


class TestCorpusReviewRegressions:
    def test_null_domain_is_a_real_cohort(self, spark):
        """NULL domains previously set min_cnt AND vanished from the
        output (null-unsafe join) — both mixing ops must keep them."""
        from stream_loader_spark.operators.sampling import (
            oversample_domains,
            rebalance_domains,
        )

        rows = [(i, "big") for i in range(200)] + [(1000 + i, None) for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = rebalance_domains(df)
        by_dom = {r["source"]: 1 for r in out.collect()}
        assert None in by_dom  # NULL cohort retained
        over = oversample_domains(df)
        assert over.where(F.col("source").isNull()).count() >= 5  # replicated too

    def test_corpus_diff_handles_null_text(self, spark):
        from stream_loader_spark.operators.versioning import corpus_diff

        old = spark.createDataFrame(
            [(1, None), (2, "x"), (3, None)], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(1, None), (2, None), (4, "y")], "doc_id long, text string"
        )
        st = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
        assert st == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}

    def test_chunks_never_subset_their_predecessor(self, spark):
        """A 30-token doc with (32, 8) chunking used to emit a second
        chunk fully contained in the first — duplicated training data."""
        from stream_loader_spark.operators.training import chunk_documents

        df = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(30)))], "doc_id long, text string"
        )
        rows = chunk_documents(df, chunk_tokens=32, overlap=8).collect()
        assert len(rows) == 1 and rows[0]["n_tokens"] == 30
        # and a doc that genuinely needs two chunks still gets them
        df2 = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(40)))], "doc_id long, text string"
        )
        rows2 = sorted(
            chunk_documents(df2, chunk_tokens=32, overlap=8).collect(),
            key=lambda r: r["chunk_index"],
        )
        assert [r["n_tokens"] for r in rows2] == [32, 16]  # tokens 25..40

    def test_band_index_rejects_degenerate_band_counts(self, spark):
        from stream_loader_spark.operators.dedup import band_index

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="num_bands"):
            band_index(df, num_bands=128)  # rows_per_band would be 0
        with _pytest.raises(ValueError, match="num_bands"):
            band_index(df, num_bands=10)  # silently dropped hashes

    def test_components_small_graph_path_accepts_string_ids(self, spark):
        from stream_loader_spark.operators.dedup import dedup_components

        docs = spark.createDataFrame(
            [("u1",), ("u2",), ("u3",)], "url string"
        )
        pairs = spark.createDataFrame(
            [("u1", "u2")], "doc_a string, doc_b string"
        )
        got = {r["url"]: r["cluster_id"] for r in dedup_components(docs, pairs, "url").collect()}
        assert got == {"u1": "u1", "u2": "u1", "u3": "u3"}
