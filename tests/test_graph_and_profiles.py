"""Tests for the second-session round-9 additions: PageRank (plain,
broadcast, and seeded/personalized), shard bin-packing, robust
median/MAD outliers, key-skew profiling, n-gram inverted postings,
the bigram LM score, PMI collocations, BM25 scoring + search,
tf-idf cosine near-dup pairs, and semantic decontamination.

Each operator's exact-integer / exact-decimal contract is verified
against a hand-computed or pure-Python reference, plus the
partition-independence property the cross-engine oracles rely on.
"""

import math

import pytest
from pyspark.sql import functions as F

from stream_loader_spark.operators.graph import pagerank, pagerank_oracle_sql
from stream_loader_spark.operators.layout import shard_by_budget
from stream_loader_spark.operators.skew import key_skew_profile
from stream_loader_spark.operators.stats import robust_outliers
from stream_loader_spark.operators.text import bigram_logprob, inverted_postings


def _py_pagerank(edges, iterations=5, damping_pct=85, scale=10**9):
    """Driver-side reference: same integer fixed-point, plain dicts."""
    e = sorted(set(edges))
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    nodes = sorted({n for pair in e for n in pair})
    base = (100 - damping_pct) * scale // 100
    r = {n: scale for n in nodes}
    for _ in range(iterations):
        msg = {}
        for s, d in e:
            msg[d] = msg.get(d, 0) + r[s] // deg[s]
        r = {n: base + (damping_pct * msg.get(n, 0)) // 100 for n in nodes}
    return r


class TestPagerank:
    EDGES = [
        (1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1),  # triangle
        (4, 1), (1, 4),                                   # pendant
        (5, 1),                                           # directed-only in
    ]

    def test_matches_python_reference(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        got = {r.node: r.rank_scaled for r in pagerank(df, iterations=5).collect()}
        assert got == _py_pagerank(self.EDGES)

    def test_broadcast_path_identical(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        a = {r.node: r.rank_scaled for r in pagerank(df, iterations=3).collect()}
        b = {
            r.node: r.rank_scaled
            for r in pagerank(df, iterations=3, broadcast_ranks=True).collect()
        }
        assert a == b

    def test_symmetric_fast_path_identical(self, spark):
        sym = [(s, d) for s, d in self.EDGES if (d, s) in self.EDGES]
        df = spark.createDataFrame(sorted(set(sym)), "src long, dst long")
        a = {r.node: r.rank_scaled for r in pagerank(df, iterations=3).collect()}
        b = {
            r.node: r.rank_scaled
            for r in pagerank(
                df, iterations=3, assume_distinct=True, symmetric=True
            ).collect()
        }
        assert a == b

    def test_duplicate_edges_collapse(self, spark):
        df = spark.createDataFrame(self.EDGES * 3, "src long, dst long")
        got = {r.node: r.rank_scaled for r in pagerank(df, iterations=2).collect()}
        assert got == _py_pagerank(self.EDGES, iterations=2)

    def test_node_without_inedges_keeps_base(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        got = {r.node: r.rank_scaled for r in pagerank(df, iterations=1).collect()}
        # node 5 only emits, never receives: pure base rank
        assert got[5] == 15 * 10**9 // 100

    def test_oracle_sql_matches(self, spark):
        duckdb = pytest.importorskip("duckdb")
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        got = {r.node: r.rank_scaled for r in pagerank(df, iterations=4).collect()}
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE raw(src BIGINT, dst BIGINT)"
        )
        con.executemany("INSERT INTO raw VALUES (?, ?)", self.EDGES)
        sql = pagerank_oracle_sql(
            "edges AS (SELECT DISTINCT src, dst FROM raw)", iterations=4
        )
        oracle = dict(con.execute(sql).fetchall())
        assert got == oracle

    def test_validation(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        with pytest.raises(ValueError):
            pagerank(df, damping_pct=0)
        with pytest.raises(ValueError):
            pagerank(df, iterations=0)


class TestShardByBudget:
    def _docs(self, spark, n=200):
        rows = [(i, 10 + (i * 37) % 90) for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, sz long")

    def test_greedy_packing_invariants(self, spark):
        out = shard_by_budget(
            self._docs(spark), size_col="sz", budget=100, n_slices=4
        ).collect()
        assert len(out) == 200
        for r in out:
            assert 0 <= r.slice < 4
            assert r.shard >> 32 == r.slice
            assert 0 <= r.start_off < 100  # a row STARTS inside its shard

    def test_shards_fill_sequentially(self, spark):
        out = shard_by_budget(
            self._docs(spark), size_col="sz", budget=100, n_slices=4
        ).collect()
        # within a slice, cumulative sizes must reconstruct: each row's
        # start offset equals the running total of all earlier rows
        by_slice = {}
        for r in sorted(out, key=lambda r: (r.slice, r.shard, r.start_off)):
            tot = by_slice.get(r.slice, 0)
            assert (r.shard & 0xFFFFFFFF) == tot // 100
            assert r.start_off == tot % 100
            by_slice[r.slice] = tot + r.sz

    def test_partition_independent(self, spark):
        docs = self._docs(spark)
        a = sorted(
            shard_by_budget(docs, size_col="sz", budget=64, n_slices=8).collect()
        )
        b = sorted(
            shard_by_budget(
                docs.repartition(13), size_col="sz", budget=64, n_slices=8
            ).collect()
        )
        assert a == b


class TestRobustOutliers:
    def test_hand_computed(self, spark):
        # group 'a': values 1..7 plus outlier 1000 → med(percentile_disc)
        # over [1,2,3,4,5,6,7,1000] is 4th smallest = 4; devs sorted
        # [0,1,1,2,2,3,3,996] → mad = 4th = 2; outlier iff dev > 6
        vals = [1, 2, 3, 4, 5, 6, 7, 1000]
        rows = [(i, "a", v) for i, v in enumerate(vals)]
        out = robust_outliers(
            spark.createDataFrame(rows, "id long, g string, v long"),
            value_col="v", group_col="g", id_col="id", k=3,
        ).collect()
        assert {r.med for r in out} == {4}
        assert {r.mad for r in out} == {2}
        flagged = {r.v for r in out if r.is_outlier}
        assert flagged == {1000}

    def test_all_identical_values_never_flag(self, spark):
        rows = [(i, "g", 42) for i in range(10)]
        out = robust_outliers(
            spark.createDataFrame(rows, "id long, g string, v long"),
            value_col="v", group_col="g", id_col="id",
        ).collect()
        assert all(r.mad == 0 and not r.is_outlier for r in out)

    def test_groups_independent(self, spark):
        rows = [(1, "a", 10), (2, "a", 10), (3, "b", 10**6), (4, "b", 10**6)]
        out = robust_outliers(
            spark.createDataFrame(rows, "id long, g string, v long"),
            value_col="v", group_col="g", id_col="id",
        ).collect()
        assert not any(r.is_outlier for r in out)


class TestKeySkewProfile:
    def test_exact_integers(self, spark):
        # key 1 ×6, key 2 ×3, key 3 ×1 → total 10, nkeys 3
        rows = [(1,)] * 6 + [(2,)] * 3 + [(3,)]
        prof = {
            r.key: r
            for r in key_skew_profile(
                spark.createDataFrame(rows, "k long"), key_col="k"
            ).collect()
        }
        assert prof[1].cnt == 6 and prof[1].share_ppm == 600000
        assert prof[1].skew_x100 == 6 * 3 * 100 // 10  # 1.8x uniform → 180
        assert prof[3].share_ppm == 100000 and prof[3].skew_x100 == 30

    def test_top_k_order(self, spark):
        rows = [(k,) for k in range(50) for _ in range(k + 1)]
        out = key_skew_profile(
            spark.createDataFrame(rows, "k long"), key_col="k", top_k=5
        ).collect()
        assert [r.key for r in out] == [49, 48, 47, 46, 45]


class TestInvertedPostings:
    DOCS = [
        (1, "red fox red fox"),
        (2, "red fox jumps"),
        (3, "blue fox jumps"),
        (4, "red fox"),
    ]

    def test_bigram_postings(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        out = {
            r.token: r
            for r in inverted_postings(df, n=2, min_df=2, max_df=3).collect()
        }
        # 'red fox' df=3 (docs 1,2,4), tf=4 (twice in doc 1)
        assert out["red fox"].df == 3 and out["red fox"].tf == 4
        assert out["red fox"].postings == "1,2,4"
        assert out["fox jumps"].postings == "2,3"
        # df=1 terms ('blue fox', 'fox red') are dropped
        assert "blue fox" not in out and "fox red" not in out

    def test_max_df_ceiling(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        out = inverted_postings(df, n=2, min_df=2, max_df=2).collect()
        assert {r.token for r in out} == {"fox jumps"}

    def test_unigram_mode(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        out = {
            r.token: r for r in inverted_postings(df, n=1, min_df=4, max_df=4).collect()
        }
        assert out["fox"].df == 4 and out["fox"].postings == "1,2,3,4"

    def test_validation(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        with pytest.raises(ValueError):
            inverted_postings(df, n=0)


class TestBigramLogprob:
    DOCS = [
        (1, "a b a b"),
        (2, "a b c"),
        (3, "c"),          # <2 tokens: no row
        (4, "b a"),
    ]

    def _reference(self):
        """Pure-Python twin of the documented arithmetic."""
        from collections import Counter
        from decimal import Decimal

        docs = {i: t.split() for i, t in self.DOCS}
        bigrams = {
            i: list(zip(t, t[1:])) for i, t in docs.items() if len(t) >= 2
        }
        freq = Counter(b for bs in bigrams.values() for b in bs)
        cf = Counter()
        for (p, _), c in freq.items():
            cf[p] += c
        v = len({c for (_, c) in freq})
        out = {}
        for i, bs in bigrams.items():
            n = len(bs)
            tot = Decimal(0)
            for b in bs:
                lp = Decimal(
                    f"{round(math.log((freq[b] + 1.0) / (cf[b[0]] + v)), 6):.6f}"
                )
                tot += lp
            out[i] = (n, float(tot) / n)
        return out

    def test_matches_reference(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_bigrams, r.mean_logprob)
            for r in bigram_logprob(df).collect()
        }
        ref = self._reference()
        assert set(got) == set(ref)
        for k in ref:
            assert got[k][0] == ref[k][0]
            assert got[k][1] == pytest.approx(ref[k][1], abs=1e-9)

    def test_shuffle_join_fallback_identical(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        a = sorted(bigram_logprob(df, broadcast_vocab=True).collect())
        b = sorted(bigram_logprob(df, broadcast_vocab=False).collect())
        assert a == b


class TestMaxCosineToSet:
    def test_matches_numpy(self, spark):
        import numpy as np

        from stream_loader_spark.operators.similarity import max_cosine_to_set

        corpus = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]), (3, [0.6, 0.8, 0.0])]
        refs = [(10, [1.0, 1.0, 0.0]), (11, [0.0, 0.0, 1.0])]
        out = {
            r.vec_id: r
            for r in max_cosine_to_set(
                spark.createDataFrame(corpus, "vec_id long, embedding array<double>"),
                spark.createDataFrame(refs, "vec_id long, embedding array<double>"),
            ).collect()
        }
        for cid, cv in corpus:
            cos = [
                round(
                    float(np.dot(cv, rv))
                    / (np.linalg.norm(cv) * np.linalg.norm(rv)),
                    6,
                )
                for _, rv in refs
            ]
            best = max(range(len(refs)), key=lambda i: (cos[i], -refs[i][0]))
            assert out[cid].max_cos == pytest.approx(cos[best], abs=1e-9)
            assert out[cid].nearest_ref == refs[best][0]

    def test_tie_breaks_to_lowest_ref_id(self, spark):
        from stream_loader_spark.operators.similarity import max_cosine_to_set

        corpus = [(1, [1.0, 0.0])]
        refs = [(20, [2.0, 0.0]), (10, [3.0, 0.0])]  # both cosine 1.0
        row = max_cosine_to_set(
            spark.createDataFrame(corpus, "vec_id long, embedding array<double>"),
            spark.createDataFrame(refs, "vec_id long, embedding array<double>"),
        ).collect()[0]
        assert row.max_cos == 1.0 and row.nearest_ref == 10

    def test_empty_reference_yields_nulls(self, spark):
        from stream_loader_spark.operators.similarity import max_cosine_to_set

        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        refs = corpus.where(F.lit(False))
        row = max_cosine_to_set(corpus, refs).collect()[0]
        assert row.max_cos is None and row.nearest_ref is None


class TestCollocationsPmi:
    def test_hand_computed(self, spark):
        from stream_loader_spark.operators.text import collocations_pmi

        # "a b" ×6 in doc1, "c d" ×2 in doc2 → with min_count=2 both
        # qualify; PMI favors the pair whose marginals are tighter
        docs = [
            (1, "a b " * 6),
            (2, "c d c d x"),
        ]
        out = {
            (r.prev, r.cur): r
            for r in collocations_pmi(
                spark.createDataFrame(docs, "doc_id long, text string"),
                min_count=2, top_k=10,
            ).collect()
        }
        # totals: doc1 bigrams = 11 (a b ... alternating), doc2 = 4
        n = 11 + 4
        # c('c','d') = 2, cl('c') = 2 ('c d','c d'), cr('d') = 2
        got = out[("c", "d")]
        assert got.c == 2
        assert got.pmi == pytest.approx(round(math.log(2 * n / (2 * 2)), 6), abs=1e-9)

    def test_min_count_floor(self, spark):
        from stream_loader_spark.operators.text import collocations_pmi

        docs = [(1, "p q p q"), (2, "r s")]
        out = collocations_pmi(
            spark.createDataFrame(docs, "doc_id long, text string"),
            min_count=2, top_k=10,
        ).collect()
        assert ("r", "s") not in {(r.prev, r.cur) for r in out}


class TestBm25Postings:
    DOCS = [
        (1, "red fox red fox"),
        (2, "red fox jumps high"),
        (3, "blue fox jumps high"),
        (4, "red fox"),
    ]

    def _reference(self):
        """Pure-Python twin over bigram terms, df band [2, 3]."""
        docs = {i: t.split() for i, t in self.DOCS}
        grams = {
            i: [" ".join(t[j : j + 2]) for j in range(len(t) - 1)]
            for i, t in docs.items()
            if len(t) >= 2
        }
        dtc = {}
        for i, gs in grams.items():
            for g in gs:
                dtc[(i, g)] = dtc.get((i, g), 0) + 1
        dl = {i: len(gs) for i, gs in grams.items()}
        dl_sum, n_docs = sum(dl.values()), len(dl)
        df = {}
        for (i, g) in dtc:
            df[g] = df.get(g, 0) + 1
        out = {}
        for (i, g), tc in dtc.items():
            if not 2 <= df[g] <= 3:
                continue
            idf = round(math.log(1.0 + (n_docs - df[g] + 0.5) / (df[g] + 0.5)), 6)
            num = 100 * (12 + 10) * tc * dl_sum
            den = 1000 * dl_sum * tc + 12 * 25 * dl_sum + 12 * 75 * dl[i] * n_docs
            out[(i, g)] = round(idf * (num / den), 6)
        return out

    def test_matches_reference(self, spark):
        from stream_loader_spark.operators.text import bm25_postings

        got = {
            (r.doc_id, r.token): r.bm25
            for r in bm25_postings(
                spark.createDataFrame(self.DOCS, "doc_id long, text string"),
                n=2, min_df=2, max_df=3,
            ).collect()
        }
        ref = self._reference()
        assert set(got) == set(ref)
        for k in ref:
            assert got[k] == pytest.approx(ref[k], abs=1e-9)

    def test_rare_term_scores_higher(self, spark):
        from stream_loader_spark.operators.text import bm25_postings

        rows = {
            (r.doc_id, r.token): r.bm25
            for r in bm25_postings(
                spark.createDataFrame(self.DOCS, "doc_id long, text string"),
                n=2, min_df=2, max_df=4,
            ).collect()
        }
        # 'jumps high' (df=2) must outweigh 'red fox' (df=3) at equal tf
        assert rows[(2, "jumps high")] > rows[(2, "red fox")]


class TestTfidfCosinePairs:
    def test_planted_duplicates_found(self, spark):
        from stream_loader_spark.operators.text import tfidf_cosine_pairs

        docs = [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),   # near-dup of 1
            (3, "one two three four five six"),
            (4, "one two three four five six"),          # exact dup of 3
            (5, "totally different words here now ok"),
            (6, "m n o p"),
            (7, "m n x y"),                              # partial overlap w/ 6
            (8, "m n o p"),                              # keeps 'n o','o p' in band
        ]
        out = {
            (r.doc_a, r.doc_b): r.cosine
            for r in tfidf_cosine_pairs(
                spark.createDataFrame(docs, "doc_id long, text string"),
                n=2, min_df=2, max_df=4, threshold=0.3,
            ).collect()
        }
        assert (3, 4) in out and out[(3, 4)] == 1.0
        # docs 1/2 differ only in HAPAX bigrams, which fall below
        # min_df — their banded vectors are identical by design
        assert (1, 2) in out and out[(1, 2)] == 1.0
        # doc 7's banded vector is a strict subset of doc 6's: a true
        # partial-overlap cosine strictly inside (0, 1)
        assert (6, 7) in out and 0.3 <= out[(6, 7)] < 1.0
        assert not any(5 in p for p in out)

    def test_universal_terms_drop_without_dividing_by_zero(self, spark):
        from stream_loader_spark.operators.text import tfidf_cosine_pairs

        # every bigram appears in every doc → idf 0 → all weights would
        # be 0; the zero-idf drop must yield NO pairs, not an ANSI 0/0
        docs = [(i, "x y z w") for i in range(3)]
        out = tfidf_cosine_pairs(
            spark.createDataFrame(docs, "doc_id long, text string"),
            n=2, min_df=2, max_df=3, threshold=0.0,
        ).collect()
        assert out == []

    def test_exact_duplicates_within_band(self, spark):
        from stream_loader_spark.operators.text import tfidf_cosine_pairs

        # duplicates share all terms, and a fourth doc keeps idf > 0
        docs = [(0, "x y z w")] * 3 + [(3, "a b c d")]
        docs = [(i, t) for i, (_, t) in enumerate(docs)]
        out = tfidf_cosine_pairs(
            spark.createDataFrame(docs, "doc_id long, text string"),
            n=2, min_df=2, max_df=3, threshold=0.9,
        ).collect()
        assert len(out) == 3 and all(r.cosine == 1.0 for r in out)


class TestBm25Search:
    DOCS = [
        (1, "red fox red fox"),
        (2, "red fox jumps high"),
        (3, "blue fox jumps high"),
        (4, "red fox"),
    ]

    def test_list_and_dataframe_queries_agree(self, spark):
        from stream_loader_spark.operators.text import bm25_search

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        a = bm25_search(docs, ["red fox", "jumps high"], k=5, n=2,
                        min_df=2, max_df=3).collect()
        qdf = spark.createDataFrame([("red fox",), ("jumps high",)], "token string")
        b = bm25_search(docs, qdf, k=5, n=2, min_df=2, max_df=3).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        by_id = {r.doc_id: r for r in a}
        # doc 2 matches both terms — BM25 tf saturation (k1=1.2) makes
        # two distinct matches beat doc 1's tf=2 single term
        assert a[0].doc_id == 2 and by_id[2].matched_terms == 2
        # length normalization beats tf saturation: doc 4 ('red fox',
        # dl=1, below avgdl) outscores doc 1 (tf=2 but dl=3) on the
        # SAME term — the b=0.75 contract working as BM25 specifies
        assert by_id[4].score > by_id[1].score > 0
        assert by_id[3].matched_terms == 1

    def test_empty_query_rejected(self, spark):
        from stream_loader_spark.operators.text import bm25_search

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        with pytest.raises(ValueError):
            bm25_search(docs, [])


class TestSeededPagerank:
    EDGES = [(1, 2), (2, 1), (2, 3), (3, 2), (4, 5), (5, 4)]  # two components

    def test_unreachable_component_is_zero(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        got = {
            r.node: r.rank_scaled
            for r in pagerank(df, iterations=4, seed_nodes=[1]).collect()
        }
        assert got[4] == 0 and got[5] == 0
        assert got[1] > 0 and got[2] > 0 and got[3] > 0

    def test_matches_python_reference(self, spark):
        def ref(edges, seeds, iterations, scale=10**9, d=85):
            e = sorted(set(edges))
            deg = {}
            for s_, _ in e:
                deg[s_] = deg.get(s_, 0) + 1
            nodes = sorted({n for p in e for n in p})
            base = (100 - d) * scale // 100
            r = {n: (scale if n in seeds else 0) for n in nodes}
            for _ in range(iterations):
                msg = {}
                for s_, d_ in e:
                    msg[d_] = msg.get(d_, 0) + r[s_] // deg[s_]
                r = {
                    n: (base if n in seeds else 0) + (85 * msg.get(n, 0)) // 100
                    for n in nodes
                }
            return r

        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        got = {
            r.node: r.rank_scaled
            for r in pagerank(df, iterations=3, seed_nodes=[1, 4]).collect()
        }
        assert got == ref(self.EDGES, {1, 4}, 3)

    def test_empty_seed_list_rejected(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        with pytest.raises(ValueError):
            pagerank(df, seed_nodes=[])


class TestNgramContainment:
    def test_short_doc_inside_long_found(self, spark):
        from stream_loader_spark.operators.dedup import ngram_containment_pairs

        long_text = " ".join(f"w{i}" for i in range(40))
        short_text = " ".join(f"w{i}" for i in range(10, 18))  # verbatim slice
        docs = [
            (1, long_text),
            (2, short_text),
            (3, "completely different words entirely here now"),
        ]
        out = {
            (r.doc_a, r.doc_b): r
            for r in ngram_containment_pairs(
                spark.createDataFrame(docs, "doc_id long, text string"),
                threshold=0.9, shingle_size=3,
            ).collect()
        }
        # every shingle of doc 2 appears in doc 1 → containment 1.0,
        # while Jaccard is tiny (6/38) — the pair Jaccard misses
        assert (1, 2) in out
        assert out[(1, 2)].containment_b_in_a == 1.0
        assert out[(1, 2)].containment_a_in_b < 0.2
        assert not any(3 in p for p in out)

    def test_matches_brute_force(self, spark):
        from stream_loader_spark.operators.dedup import ngram_containment_pairs

        docs = [
            (i, " ".join(f"t{(i * 3 + j) % 11}" for j in range(9))) for i in range(12)
        ]
        got = {
            (r.doc_a, r.doc_b): (r.containment_a_in_b, r.containment_b_in_a)
            for r in ngram_containment_pairs(
                spark.createDataFrame(docs, "doc_id long, text string"),
                threshold=0.5, shingle_size=3,
            ).collect()
        }

        def sh(t):
            toks = t.split()
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

        ref = {}
        for i, ti in docs:
            for j, tj in docs:
                if i >= j:
                    continue
                inter = len(sh(ti) & sh(tj))
                if not inter:
                    continue
                ca, cb = round(inter / len(sh(ti)), 6), round(inter / len(sh(tj)), 6)
                if max(ca, cb) >= 0.5:
                    ref[(i, j)] = (ca, cb)
        assert got == ref
