"""Unit tests for the training-data selection surface: DSIR importance
resampling (operators/dsir.py), leakage-free splits (operators/
sampling.py), and CCNet-style perplexity bucketing (operators/text.py).
The cross-engine value contracts are additionally pinned by the
declared queries dsir_logratio_scores / dsir_gumbel_topk /
leakage_free_splits / perplexity_buckets vs their DuckDB oracles."""

import pytest
from pyspark.sql import functions as F

from stream_loader_spark.operators.dsir import (
    N_BUCKETS,
    dsir_logratio,
    gumbel_topk,
    hashed_feature_counts,
)
from stream_loader_spark.operators.sampling import leakage_free_splits
from stream_loader_spark.operators.text import perplexity_buckets


@pytest.fixture(scope="module")
def corpus(spark):
    """20 'target-like' docs about one topic, 20 raw docs about another,
    plus degenerate rows (empty / single-token)."""
    rows = []
    for i in range(20):
        rows.append((i, f"alpha beta gamma topic{i % 3} alpha beta", "wiki"))
    for i in range(20, 40):
        rows.append((i, f"spam junk offer{i % 5} click spam junk now", "web"))
    rows.append((100, "", "web"))
    rows.append((101, "solo", "web"))
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    ).cache()


class TestHashedFeatureCounts:
    def test_buckets_in_range_and_deterministic(self, corpus):
        fc = hashed_feature_counts(corpus)
        rows = fc.collect()
        assert all(0 <= r["bucket"] < N_BUCKETS for r in rows)
        again = {(r["doc_id"], r["bucket"]): r["tc"] for r in fc.collect()}
        assert {(r["doc_id"], r["bucket"]): r["tc"] for r in rows} == again

    def test_feature_count_is_unigrams_plus_bigrams(self, corpus):
        tot = {
            r["doc_id"]: r["n"]
            for r in hashed_feature_counts(corpus)
            .groupBy("doc_id")
            .agg(F.sum("tc").alias("n"))
            .collect()
        }
        # 6 tokens -> 6 unigrams + 5 bigrams
        assert tot[0] == 11
        # single token -> 1 unigram, 0 bigrams
        assert tot[101] == 1
        # zero-token docs contribute no rows at all
        assert 100 not in tot

    def test_extra_cols_pass_through(self, corpus):
        fc = hashed_feature_counts(corpus, extra_cols=("source",))
        src = {r["doc_id"]: r["source"] for r in fc.collect()}
        assert src[0] == "wiki" and src[25] == "web"


class TestDsirLogratio:
    def test_target_docs_score_higher(self, corpus):
        scores = {
            r["doc_id"]: r["logratio"]
            for r in dsir_logratio(corpus, is_target=F.col("source") == "wiki").collect()
        }
        wiki = [scores[i] for i in range(20)]
        web = [scores[i] for i in range(20, 40)]
        # every target-vocabulary doc outranks every raw-only doc
        assert min(wiki) > max(web)

    def test_deterministic_across_runs(self, corpus):
        a = dsir_logratio(corpus, is_target=F.col("source") == "wiki").collect()
        b = dsir_logratio(corpus, is_target=F.col("source") == "wiki").collect()
        assert {tuple(r) for r in a} == {tuple(r) for r in b}

    def test_zero_token_docs_excluded(self, corpus):
        ids = {
            r["doc_id"]
            for r in dsir_logratio(corpus, is_target=F.col("source") == "wiki").collect()
        }
        assert 100 not in ids and 101 in ids


class TestGumbelTopk:
    def test_rejects_k_below_one(self, corpus):
        scores = dsir_logratio(corpus, is_target=F.col("source") == "wiki")
        with pytest.raises(ValueError):
            gumbel_topk(scores, 0)

    def test_huge_weight_gaps_dominate_noise(self, spark):
        # Gumbel(0,1) spans roughly [-3.2, 22.2] on the md5 grid; weight
        # gaps of 100 make inclusion deterministic in rank order
        w = spark.createDataFrame(
            [(i, float(100 * i)) for i in range(20)], "doc_id bigint, logratio double"
        )
        top = gumbel_topk(w, 5, weight_col="logratio").collect()
        assert sorted(r["doc_id"] for r in top) == [15, 16, 17, 18, 19]
        # keys come back sorted descending
        keys = [r["gumbel_key"] for r in top]
        assert keys == sorted(keys, reverse=True)

    def test_salt_changes_the_draw(self, spark):
        w = spark.createDataFrame(
            [(i, 0.0) for i in range(200)], "doc_id bigint, logratio double"
        )
        a = {r["doc_id"] for r in gumbel_topk(w, 20, salt="a").collect()}
        b = {r["doc_id"] for r in gumbel_topk(w, 20, salt="b").collect()}
        assert a != b  # equal weights -> pure Gumbel order, salt-driven


class TestLeakageFreeSplits:
    @pytest.fixture(scope="class")
    def docs_and_pairs(self, spark):
        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(10)], "doc_id bigint, text string"
        )
        # two clusters: {0,1,2} (chained) and {5,6}; rest singletons
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (5, 6)], "doc_a bigint, doc_b bigint"
        )
        return docs, pairs

    def test_clusters_land_wholly_in_one_split(self, docs_and_pairs):
        docs, pairs = docs_and_pairs
        rows = leakage_free_splits(docs, pairs).collect()
        split = {r["doc_id"]: r["split"] for r in rows}
        cluster = {r["doc_id"]: r["cluster_id"] for r in rows}
        assert split[0] == split[1] == split[2]
        assert split[5] == split[6]
        assert cluster[0] == cluster[1] == cluster[2] == 0
        assert cluster[5] == cluster[6] == 5
        assert cluster[3] == 3  # singleton labels itself

    def test_assignment_stable_under_unrelated_additions(self, spark, docs_and_pairs):
        docs, pairs = docs_and_pairs
        before = {
            r["doc_id"]: r["split"] for r in leakage_free_splits(docs, pairs).collect()
        }
        more = docs.unionByName(
            spark.createDataFrame(
                [(i, f"new {i}") for i in range(1000, 1050)],
                "doc_id bigint, text string",
            )
        )
        after = {
            r["doc_id"]: r["split"] for r in leakage_free_splits(more, pairs).collect()
        }
        assert all(after[d] == s for d, s in before.items())

    def test_rejects_bad_bucket_bounds(self, docs_and_pairs):
        docs, pairs = docs_and_pairs
        with pytest.raises(ValueError):
            leakage_free_splits(docs, pairs, train_buckets=0)
        with pytest.raises(ValueError):
            leakage_free_splits(docs, pairs, train_buckets=230, val_buckets=204)
        with pytest.raises(ValueError):
            leakage_free_splits(docs, pairs, train_buckets=100, val_buckets=300)


class TestPerplexityBuckets:
    @pytest.fixture(scope="class")
    def langs(self, spark):
        rows = []
        # 'en': 30 docs from common vocab (low ppl) to rare (high ppl)
        for i in range(30):
            common = "the and of to in " * 3
            rare = f"zxq{i} vbn{i} "
            rows.append((i, common if i < 10 else (common + rare * i), "en"))
        # 'de': 9 docs, plus a zero-token doc
        for i in range(100, 109):
            rows.append((i, f"der die das wort{i % 3}", "de"))
        rows.append((200, "   ", "en"))
        return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")

    def test_terciles_per_language(self, langs):
        rows = perplexity_buckets(langs).collect()
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r["lang"], []).append(r["ppl_bucket"])
        # zero-token doc excluded
        assert len(by_lang["en"]) == 30 and len(by_lang["de"]) == 9
        for lang, buckets in by_lang.items():
            n = len(buckets)
            assert buckets.count("head") >= n // 3 - 1
            assert buckets.count("head") + buckets.count("middle") >= 2 * n // 3 - 1
            assert set(buckets) <= {"head", "middle", "tail"}

    def test_head_has_lower_ppl_than_tail(self, langs):
        from stream_loader_spark.operators.text import unigram_logprob

        ppl = {
            r["doc_id"]: -r["mean_logprob"] for r in unigram_logprob(langs).collect()
        }
        rows = perplexity_buckets(langs).collect()
        en = [(ppl[r["doc_id"]], r["ppl_bucket"]) for r in rows if r["lang"] == "en"]
        heads = [p for p, b in en if b == "head"]
        tails = [p for p, b in en if b == "tail"]
        assert heads and tails and max(heads) < min(tails)
