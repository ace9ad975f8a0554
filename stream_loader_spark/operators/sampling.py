"""Deterministic dataset sampling (training-data pipeline surface).

Random sampling is the standard way to carve eval/ablation subsets out
of a 100 TB corpus, but ``rand()`` samples are not reproducible across
reruns, engines, or partitionings. Hash-bucket sampling is: a row's
bucket is a pure function of its id (two md5 nibbles → 0..255), so the
sample is stable under retries, engine-agnostic (md5 is everywhere),
and composable (disjoint bucket ranges give disjoint splits). No
shuffle — the filter evaluates inside the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SAMPLE_BUCKETS = 256  # two md5 hex nibbles


def sample_bucket(id_col: Column, salt: str = "") -> Column:
    """Bucket 0..255 from the first two md5 nibbles of (salt + id) —
    identical arithmetic is expressible in any SQL engine."""
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def deterministic_sample(
    df: DataFrame,
    keep_buckets: int,
    id_col: str = "doc_id",
    salt: str = "",
    bucket_col: str = "sample_bucket",
) -> DataFrame:
    """Keep rows whose bucket < ``keep_buckets`` (rate ≈ keep/256).

    Different ``salt`` values draw independent samples; bucket ranges
    [0, a) and [a, b) from the same salt never overlap — use that for
    train/eval splits that must stay disjoint forever.
    """
    out = df.withColumn(bucket_col, sample_bucket(F.col(id_col), salt))
    return out.where(F.col(bucket_col) < keep_buckets)


def rebalance_domains(
    df: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
    salt: str = "",
) -> DataFrame:
    """Deterministic domain-mix rebalancing: downsample every domain to
    ≈ the smallest domain's row count via hash-bucket filtering.

    Data mixing is the standard final step of a training-corpus build
    (cap the over-represented crawl so curated sources keep weight).
    The per-domain counts aggregate is tiny (|domains| rows) and is
    broadcast back, so the only full-data work is the bucket filter
    riding the scan — one small shuffle total, independent of corpus
    size. The keep threshold is an integer bucket count, so the
    sampled set is exactly reproducible on any engine.
    """
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("cnt"))
    # min folded in with an unpartitioned window over the |domains|-row
    # aggregate (r13, same trick as unigram_logprob's vocab total): the
    # old separate min aggregate + crossJoin re-derived the counts
    # subtree — a second full corpus scan + aggregation at any scale —
    # because exchange reuse does not fire across the broadcast
    # boundary. The window runs on |domains| rows; same doubles, same
    # floor, bit-identical thresholds.
    min_cnt = F.min("cnt").over(Window.partitionBy())
    thr = counts.select(
        domain_col,
        F.greatest(
            F.lit(1).cast("bigint"),
            F.floor(F.lit(256.0) * min_cnt / F.col("cnt")),
        )
        .cast("int")
        .alias("keep_thr"),
    )
    out = df.withColumn("sample_bucket", sample_bucket(F.col(id_col), salt))
    # null-safe: a NULL domain is a real cohort — a name-list join would
    # both let it set min_cnt AND silently drop its rows from the output
    thr = thr.withColumnRenamed(domain_col, "_thr_dom")
    return (
        out.join(
            F.broadcast(thr), F.col(domain_col).eqNullSafe(F.col("_thr_dom"))
        )
        .drop("_thr_dom")
        .where(F.col("sample_bucket") < F.col("keep_thr"))
    )


def epoch_shuffle(
    df: DataFrame,
    seed: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training order for one epoch.

    ``shard`` is the md5 bucket (0..255) of (seed + id) and
    ``pos_in_shard`` the rank within the shard by md5 key — the global
    epoch order is (shard, pos_in_shard), fully reproducible from the
    seed alone. 256 windows run in parallel (≈400 GB per shard at
    100 TB), so no single-partition sort anywhere; a new seed draws an
    independent permutation. Writers consume shards in order and get
    sequential-read locality per shard file.
    """
    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    out = df.withColumn("shuffle_key", key).withColumn(
        "shard", sample_bucket(F.col(id_col), seed)
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return out.withColumn("pos_in_shard", F.row_number().over(w))


def oversample_domains(
    df: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
    salt: str = "",
) -> DataFrame:
    """Deterministic up-sampling: replicate every domain to ≈ the
    largest domain's row count — the other half of data mixing
    (``rebalance_domains`` caps the big sources; this up-weights the
    small ones, e.g. curated corpora trained for multiple epochs).

    Each row gets ``floor(max/cnt)`` copies plus one more when its md5
    bucket falls under the fractional remainder's threshold, so
    expected totals hit the target exactly while every decision stays
    a pure function of (salt, id). Replication is explode(sequence) —
    a narrow transform; the only shuffle is the tiny per-domain count
    aggregate, broadcast back. Emits ``copy_index`` (0-based) so
    downstream epoch shuffling can spread copies apart.
    """
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("cnt"))
    # max folded in with an unpartitioned window (r13, same change as
    # rebalance_domains): the separate max aggregate + crossJoin cost a
    # second corpus scan + aggregation of the counts subtree.
    ratio = F.lit(1.0) * F.max("cnt").over(Window.partitionBy()) / F.col("cnt")
    plan = counts.select(
        domain_col,
        F.floor(ratio).cast("bigint").alias("base_copies"),
        F.floor(F.lit(256.0) * (ratio - F.floor(ratio))).cast("int").alias("extra_thr"),
    )
    plan = plan.withColumnRenamed(domain_col, "_plan_dom")
    rows = (
        df.withColumn("_bkt", sample_bucket(F.col(id_col), salt))
        # null-safe for the same reason as rebalance_domains: NULL-domain
        # rows must replicate like any other cohort, not silently vanish
        .join(
            F.broadcast(plan), F.col(domain_col).eqNullSafe(F.col("_plan_dom"))
        )
        .drop("_plan_dom")
        .withColumn(
            "copies",
            F.col("base_copies")
            + F.when(F.col("_bkt") < F.col("extra_thr"), F.lit(1)).otherwise(F.lit(0)),
        )
        .where(F.col("copies") > 0)
    )
    return rows.select(
        id_col,
        domain_col,
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("copies") - 1)).alias(
            "copy_index"
        ),
    )


def weighted_priority(id_col: Column, weight_col: Column, salt: str = "") -> Column:
    """A-ES (Efraimidis–Spirakis) priority: -ln(u) / w with u drawn
    deterministically from the id's md5 — smaller is better; the
    top-k rows by this priority are a weighted sample WITHOUT
    replacement where inclusion probability tracks the weight.

    u = (first 8 md5 nibbles + 1) / 2^32 ∈ (0, 1] is a pure function
    of (salt, id), so the sample is reproducible across reruns,
    engines, and partitionings — same stance as ``sample_bucket``.
    The priority is rounded to 9 decimals (the repo's cross-engine
    float convention: ln differs in the last ulp between libms) and
    consumers MUST tie-break on the id.
    """
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    u = (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(1 << 32)
    )
    return F.round(-F.log(u) / weight_col.cast("double"), 9)


def weighted_sample(
    df: DataFrame,
    k: int,
    id_col: str,
    weight_col: str,
    salt: str = "",
) -> DataFrame:
    """k-row weighted sample without replacement (A-ES): rank by the
    deterministic priority, keep the k smallest.

    Weights must be strictly positive (zero/negative weights raise at
    plan level via a loud filter contract: such rows are EXCLUDED and
    a production caller should pre-filter). The global top-k is a
    TakeOrderedAndProject at any scale — per-partition heaps of k then
    a k-sized merge on the driver, never a full sort.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    pri = weighted_priority(F.col(id_col), F.col(weight_col), salt)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("priority", pri)
        .orderBy("priority", id_col)
        .limit(k)
    )


def leakage_free_splits(
    documents: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_buckets: int = 204,
    val_buckets: int = 230,
    salt: str = "split",
) -> DataFrame:
    """Near-dup-aware train/validation/test assignment: every near-dup
    CLUSTER lands wholly in one split, so evaluation can't leak through
    near-duplicates of training documents (the contamination vector a
    plain per-document hash split leaves open).

    (id, cluster_id, split): connected components over the given
    near-dup ``pairs`` label each document with its cluster (singletons
    label themselves — see ``dedup.dedup_components`` for the
    size-adaptive propagation), then the split is the md5 bucket of the
    CLUSTER id: train < ``train_buckets`` <= validation <
    ``val_buckets`` <= test, out of 256 (defaults 80/10/10). Hashing the
    cluster representative instead of the document id is the entire
    point — co-clustered documents share the bucket draw, and the
    assignment stays stable when unrelated documents are added or
    removed.
    """
    if not (0 < train_buckets < val_buckets <= SAMPLE_BUCKETS):
        raise ValueError(
            "need 0 < train_buckets < val_buckets <= 256 "
            f"(got {train_buckets}, {val_buckets})"
        )
    # local import: dedup pulls the whole minhash/banding surface, which
    # plain bucket-sampling users shouldn't pay for at import time
    from stream_loader_spark.operators.dedup import _paired_labels

    # every document needs a label, but synthesizing singleton labels
    # inside the components run costs a corpus-sized anti-join PLUS a
    # union; one LEFT join against the paired-only labels with a
    # coalesce to self assigns the identical labeling in a single pass
    # (the SQL oracle is written exactly this way)
    paired = _paired_labels(documents, pairs, id_col)
    comps = documents.select(id_col).join(paired, id_col, "left").select(
        id_col, F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id")
    )
    b = sample_bucket(F.col("cluster_id"), salt)
    return comps.select(
        id_col,
        "cluster_id",
        F.when(b < train_buckets, F.lit("train"))
        .when(b < val_buckets, F.lit("validation"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
