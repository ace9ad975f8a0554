"""Distributed BPE training vs a pure-Python reference (operators/bpe.py).

The reference implements the textbook algorithm (count pairs over the
word-frequency table, merge the best, repeat) directly on dicts; the
Spark result must match it merge-for-merge — including tie-breaks.
"""

import collections

import pytest

from stream_loader_spark.operators.bpe import (
    END_OF_WORD,
    bpe_segment,
    bpe_train,
    word_frequencies,
)


def reference_bpe(word_counts: dict[str, int], num_merges: int, min_pair_count: int = 2):
    vocab = {tuple(list(w) + [END_OF_WORD]): n for w, n in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # same tie-break as the operator: count desc, then lexicographic
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
]


class TestBpeTrain:
    def test_matches_reference_merge_for_merge(self, spark):
        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        counts = {
            r["word"]: r["n"] for r in word_frequencies(docs).collect()
        }
        expect = reference_bpe(counts, num_merges=12)
        got = bpe_train(docs, num_merges=12)
        assert got == expect
        assert len(got) > 5  # the corpus supports a real merge sequence

    def test_early_stop_on_min_count(self, spark):
        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        # every word is a single char + </w>; each pair occurs once < 2
        assert bpe_train(docs, num_merges=5, min_pair_count=2) == []

    def test_segment_applies_merges_in_order(self, spark):
        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        merges = bpe_train(docs, num_merges=12)
        segmented = bpe_segment("newest", merges)
        # round-trip: concatenation restores the word + sentinel
        assert "".join(segmented) == "newest" + END_OF_WORD
        # frequent words end up in few pieces
        assert len(segmented) < len("newest") + 1

    def test_validates_args(self, spark):
        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        with pytest.raises(ValueError):
            bpe_train(docs, num_merges=0)


class TestBpeEncode:
    def test_encode_matches_driver_segmentation(self, spark, sf_small):
        from stream_loader_spark.operators.bpe import bpe_train, bpe_encode, bpe_segment
        from stream_loader_spark.sources.tables import load_table

        docs = load_table(spark, sf_small, "documents").limit(40).cache()
        merges = bpe_train(docs, num_merges=12)
        assert merges
        got = {r.doc_id: r.bpe_tokens for r in bpe_encode(docs, merges).collect()}
        for row in docs.collect():
            expect = []
            for w in row.text.strip().split():
                expect.extend(bpe_segment(w, merges))
            assert got[row.doc_id] == expect, row.doc_id
            assert len(got[row.doc_id]) == len(expect)

    def test_encode_empty_and_whitespace_docs(self, spark):
        from stream_loader_spark.operators.bpe import bpe_encode

        docs = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "ab ab")], "doc_id long, text string"
        )
        rows = {r.doc_id: r for r in bpe_encode(docs, [("a", "b", 9)]).collect()}
        assert rows[1].bpe_tokens == [] and rows[1].n_bpe_tokens == 0
        assert rows[2].bpe_tokens == []
        assert rows[3].bpe_tokens == ["ab", "</w>", "ab", "</w>"]

    def test_plan_is_narrow(self, spark, sf_small):
        from stream_loader_spark.operators.bpe import bpe_encode
        from stream_loader_spark.sources.tables import load_table

        docs = load_table(spark, sf_small, "documents")
        plan = bpe_encode(docs, [("a", "b", 2)])._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # scatter round-robin only
