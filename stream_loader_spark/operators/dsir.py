"""DSIR importance resampling (training-data selection surface).

Implements the hashed n-gram importance-resampling recipe of Xie et
al. 2023, "Data Selection for Language Models via Importance
Resampling": featurize every document into a fixed hashed bag of
unigram+bigram counts, fit add-one-smoothed categorical distributions
over those buckets for a TARGET subset and for the RAW corpus, score
each document with the summed log-likelihood ratio
``sum_b tc_b * (ln p_target(b) - ln p_raw(b))``, then draw the top-k
under Gumbel perturbation — which IS sampling-without-replacement
proportional to the (temperature-1) importance weights.

Beyond-reference surface: the reference loader has no data-selection
stage; this module belongs to the engine's training-data-pipeline
scope alongside ``sampling``/``text``.

Scale design:
- Tokenize ONCE per document (hoisted token-array alias, see
  ``dedup.with_hash_shingles`` for why), explode features, and collapse to
  per-(doc, bucket) counts immediately. The only corpus-sized shuffle is
  the doc-id hash-scatter of the RAW rows — the per-(doc, bucket)
  aggregate groups on a superset of the id and reuses that exchange, so
  the exploded feature rows (≤4096 buckets × ~20 B per doc, more bytes
  than the raw text) never shuffle.
- Both distributions are ≤``N_BUCKETS`` rows (the whole point of
  DSIR's feature hashing), so the scoring join is a BROADCAST of a
  4096-row table — no second corpus shuffle; the smoothing totals come
  from an unpartitioned window over that same constant-sized table.
- The bucket hash, the Gumbel draw, and the per-bucket log-ratios are
  pure md5/decimal arithmetic: deterministic across reruns, engines,
  and partitionings (repo convention — ln rounded to 6/9 decimals
  before exact decimal summation, so results are independent of float
  summation order).
- Top-k is a TakeOrderedAndProject: per-partition heaps of k, then a
  k-sized driver merge — never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from stream_loader_spark.operators.text import tokens_sql
from stream_loader_spark.sources.tables import scatter

# 3 md5 hex nibbles -> 0..4095. Fixed (not a parameter) because the
# bucket id must be reproducible by an independent SQL oracle with the
# same nibble arithmetic; 4096 is the same order as the paper's 1e4.
N_BUCKETS = 4096

_BIGRAMS_OVER = (
    "transform(slice({t}, 1, greatest(size({t}) - 1, 0)), "
    "(x, i) -> concat(x, ' ', element_at({t}, i + 2)))"
)


def hashed_feature_counts(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *extra_cols, bucket, tc): per-document counts of hashed
    unigram+bigram features (bucket = first 3 md5 nibbles of the
    feature string, 0..4095).

    The token array is aliased in a child projection so the regex
    split runs once per row even though the feature expression
    references it three times (interpreted HOFs have no CSE); the
    bigram lambda is two-parameter, which Spark reads as
    (element, index) — index is 0-based, ``element_at`` 1-based, hence
    ``i + 2`` for the right neighbor. Documents with zero tokens
    contribute no rows (and therefore no weight) — mirrored by the
    oracle's inner joins.
    """
    # hash-scatter on the doc id: the per-(doc, bucket) aggregate below
    # groups on a superset of the id, so it reuses this exchange (explode
    # and projections preserve hash partitioning) — the shuffle moves
    # from the partial-aggregated (doc, bucket) rows (≤4096 × ~20 B per
    # document) to the raw document rows, which is strictly fewer bytes
    # for any non-trivial document. Same recipe as
    # training.benchmark_contamination / text.repetition_stats.
    toks = scatter(documents, by=(id_col,)).selectExpr(
        id_col, *extra_cols, f"{tokens_sql(text_col)} AS _toks"
    )
    feats = toks.selectExpr(
        id_col,
        *extra_cols,
        f"concat(_toks, {_BIGRAMS_OVER.format(t='_toks')}) AS _feats",
    )
    # NOT the in-row run-length histogram text.doc_term_counts uses:
    # hashing every feature inside a transform() lambda is INTERPRETED
    # per element, while md5 over exploded rows runs in whole-stage
    # codegen — the A/B measured 1.3s -> 5.9s for the in-row form at
    # sf0.1. Map-side combine still fires on the scatter-partitioned
    # rows, so codegen'd hashing + the fold into ≤4096 buckets/doc wins.
    exploded = feats.select(id_col, *extra_cols, F.explode("_feats").alias("_f"))
    bucket = F.conv(F.substring(F.md5("_f"), 1, 3), 16, 10).cast("int")
    return (
        exploded.select(id_col, *extra_cols, bucket.alias("bucket"))
        .groupBy(id_col, *extra_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("tc"))
    )


def dsir_logratio(
    documents: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_features, logratio): summed hashed-n-gram log-likelihood
    ratio of every document between the ``is_target`` subset's feature
    distribution and the raw corpus's.

    One feature derivation feeds all three consumers (raw distribution,
    target distribution, scoring join); the per-(doc, bucket) counts are
    ``localCheckpoint``-ed because the three-branch shape defeats
    exchange reuse in practice (same lesson as
    ``dedup.incremental_near_dup_pairs``) and the block is at most
    corpus-docs x 4096 rows — bounded by the bucket space, and released
    by the ContextCleaner when the result goes out of scope.

    Both distributions get add-one smoothing over the full bucket space
    (``(c + 1) / (total + N_BUCKETS)``), so buckets unseen in the target
    still score finitely; per-bucket log-ratios are rounded to 6
    decimals and summed as exact decimals (float-order independent).
    """
    flagged = documents.withColumn("_is_target", is_target)
    dbc = hashed_feature_counts(
        flagged, text_col, id_col, extra_cols=("_is_target",)
    ).localCheckpoint(eager=False)

    # BOTH distributions from one conditional aggregate — a separate
    # target aggregate plus a left join back costs three extra
    # exchanges for the same ≤N_BUCKETS-row result.
    dist = dbc.groupBy("bucket").agg(
        F.sum("tc").alias("cr"),
        F.sum(F.when(F.col("_is_target"), F.col("tc")).otherwise(F.lit(0))).alias(
            "ct"
        ),
    )
    # Totals via an unpartitioned window: dist is bounded by the bucket
    # space (≤4096 rows at ANY corpus size — the point of DSIR's feature
    # hashing), so the single-partition exchange is constant-sized and
    # replaces a separate aggregate + crossJoin round-trip.
    w_all = Window.partitionBy()
    lp = F.round(
        F.log(
            (F.col("ct") + 1).cast("double")
            / (F.sum("ct").over(w_all) + N_BUCKETS)
        )
        - F.log(
            (F.col("cr") + 1).cast("double")
            / (F.sum("cr").over(w_all) + N_BUCKETS)
        ),
        6,
    ).cast("decimal(18,6)")
    scored_dist = dist.select("bucket", lp.alias("lp"))
    return (
        dbc.join(F.broadcast(scored_dist), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("tc").alias("n_features"),
            (F.sum(F.col("lp") * F.col("tc")).cast("decimal(38,6)").cast("double")).alias(
                "logratio"
            ),
        )
    )


def gumbel_topk(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "logratio",
    salt: str = "",
) -> DataFrame:
    """Top-k rows by ``weight + Gumbel(0,1)`` — a without-replacement
    sample with inclusion odds proportional to ``exp(weight)``, entirely
    in log space (never exponentiates, so arbitrarily negative DSIR
    log-ratios can't underflow).

    The Gumbel draw is ``-ln(-ln(u))`` with ``u = (h + 0.5) / 2^32``
    from the id's md5 — strictly inside (0, 1), so neither log can hit
    an infinity; a pure function of (salt, id), same reproducibility
    stance as ``sampling.weighted_priority`` (which is the equivalent
    construction for POSITIVE weights). Rounded to 9 decimals before
    the add (cross-engine ln convention); ties broken on the id.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    u = (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << 32)
    )
    gumbel = F.round(-F.log(-F.log(u)), 9)
    return (
        weights.withColumn("gumbel_key", F.round(F.col(weight_col) + gumbel, 9))
        .orderBy(F.desc("gumbel_key"), id_col)
        .limit(k)
    )
