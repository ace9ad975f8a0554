"""Similarity search over embedding columns (array<float>).

Beyond-reference surface (BASELINE.json north star):

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the corpus; dot products via ``zip_with`` +
  ``aggregate`` higher-order functions (JVM-side, no Python). The
  baseline and the verifier for approximate variants.
- ``ivf_topk`` — IVF-style approximate search: corpus vectors are
  assigned to the nearest of C centroids once (broadcast join — no
  all-pairs), queries probe only the ``nprobe`` nearest clusters. At
  100 TB the cluster assignment is the only full pass; each query then
  touches ~nprobe/C of the corpus.
- ``cosine_near_dup_pairs`` — embedding near-duplicate pairs over an
  LSH bucketing (random-hyperplane signs), verified with exact cosine.

All cosines are computed in DOUBLE and rounded to 6 decimals before
ranking so results are stable across engines (ties then break by id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream_loader_spark.sources.tables import scatter

COSINE_SCALE = 6  # round cosine to this many decimals before ranking


def dot_col(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in DOUBLE via zip_with + ordered fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return F.round(dot_col(a, b) / (norm_col(a) * norm_col(b)), COSINE_SCALE)


MAX_BRUTE_FORCE_QUERIES = 1000


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query id (excluding self-matches).

    The query set is broadcast; ranking is a window over each query's
    candidates ordered by (cosine DESC, id ASC) for determinism.

    Cost is O(corpus × queries): correct at any corpus size but only
    affordable while the QUERY side is small, so the query count is
    hard-capped — route large query sets to ``ivf_topk``, which scans
    ~nprobe/num_centroids of the corpus per query instead.
    """
    from pyspark.sql import Window

    if len(query_ids) > MAX_BRUTE_FORCE_QUERIES:
        raise ValueError(
            f"brute_force_topk got {len(query_ids)} query ids "
            f"(cap {MAX_BRUTE_FORCE_QUERIES}): O(corpus x queries) exact scan "
            "does not scale on the query side - use ivf_topk for large query sets"
        )

    queries = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    corpus = scatter(embeddings).select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("match_vec")
    )
    scored = (
        corpus.join(F.broadcast(queries), F.col("match_id") != F.col("query_id"))
        .withColumn("cosine", cosine_col(F.col("query_vec"), F.col("match_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def seed_centroids(
    embeddings: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic seed centroids: the ``num_centroids`` smallest ids."""
    return embeddings.where(F.col(id_col) < num_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )


def kmeans_centroids(
    embeddings: DataFrame,
    num_centroids: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means refinement of the IVF coarse quantizer.

    Each iteration is one distributed pass: broadcast-join assignment
    (argmax cosine via max(struct)) then an element-wise mean per
    cluster computed with posexplode + avg — the per-iteration shuffle
    carries (k × dim) partial sums, and only k × dim values ever reach
    the driver, so the corpus size is irrelevant to driver memory.
    """
    spark = embeddings.sparkSession
    dim = len(embeddings.select(vec_col).first()[0])
    centroids = seed_centroids(embeddings, num_centroids, id_col, vec_col)

    for _ in range(iterations):
        assigned = (
            scatter(embeddings)
            .crossJoin(F.broadcast(centroids))
            .withColumn("cos", cosine_col(F.col(vec_col), F.col("centroid_vec")))
            .groupBy(id_col, vec_col)
            .agg(F.max(F.struct(F.col("cos"), (-F.col("centroid_id")).alias("neg_id"))).alias("m"))
            .select(id_col, vec_col, (-F.col("m.neg_id")).alias("cluster_id"))
        )
        means = (
            assigned.select("cluster_id", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cluster_id", "pos")
            .agg(F.avg("val").alias("mean"))
        )
        rows = means.collect()  # k × dim values only
        by_cluster: dict[int, list[float]] = {}
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], [0.0] * dim)[r["pos"]] = r["mean"]
        centroids = spark.createDataFrame(
            [(cid, vec) for cid, vec in sorted(by_cluster.items())],
            "centroid_id int, centroid_vec array<double>",
        )
    return centroids


def assign_clusters(
    embeddings: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantizer assignment: broadcast join + per-row argmax;
    one pass over the corpus. Centroids default to the deterministic
    seed set; pass ``kmeans_centroids(...)`` output for refined ones."""
    if centroids is None:
        centroids = seed_centroids(embeddings, num_centroids, id_col, vec_col)
    scored = scatter(embeddings).crossJoin(F.broadcast(centroids)).withColumn(
        "cos", cosine_col(F.col(vec_col), F.col("centroid_vec"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("cos"), F.asc("centroid_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(id_col, vec_col, F.col("centroid_id").alias("cluster_id"))
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iterations: int = 0,
) -> DataFrame:
    """Approximate cosine top-k: probe only the nprobe nearest clusters.
    ``kmeans_iterations > 0`` refines the coarse quantizer first."""
    from pyspark.sql import Window

    if kmeans_iterations > 0:
        centroids = kmeans_centroids(
            embeddings, num_centroids, kmeans_iterations, id_col, vec_col
        )
    else:
        centroids = seed_centroids(embeddings, num_centroids, id_col, vec_col)
    assigned = assign_clusters(embeddings, num_centroids, id_col, vec_col, centroids)
    queries = embeddings.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    qprobe = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("cos", cosine_col(F.col("query_vec"), F.col("centroid_vec")))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("centroid_id"))
            ),
        )
        .where(F.col("rnk") <= nprobe)
        .select("query_id", "query_vec", F.col("centroid_id").alias("cluster_id"))
    )
    scored = (
        assigned.join(F.broadcast(qprobe), "cluster_id")
        .where(F.col(id_col) != F.col("query_id"))
        .withColumn("cosine", cosine_col(F.col("query_vec"), F.col(vec_col)))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("match_id"), "cosine", "rank")
    )


# Sign-LSH hyperplanes: md5-derived coefficients in [-1, 1), generated
# once in Python and embedded as LITERALS in both engines' expressions —
# reproducible by an independent SQL oracle (the algorithm, not just its
# output, is cross-engine) AND high-quality pseudo-random. (A linear
# congruential formula evaluated in-engine was tried first: its planes
# are shifted linear ramps of each other, which collapses LSH buckets —
# 680k candidate pairs on 2k fixture vectors vs ~30k for random planes.)
LSH_DEFAULT_DIM = 64


def lsh_plane_coeffs(dim: int, total_planes: int) -> list[list[float]]:
    """coeff[p][i] = (md5("p:i") % 1000) / 500 - 1 — deterministic,
    near-orthogonal hyperplane matrix shared verbatim by Spark and SQL."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16) % 1000) / 500.0 - 1.0
            for i in range(dim)
        ]
        for p in range(total_planes)
    ]


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    num_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = LSH_DEFAULT_DIM,
) -> DataFrame:
    """Embedding near-dup pairs via banded sign-LSH + exact verify.

    ``num_bands`` independent bucketings of ``num_planes`` sign bits
    each; vectors agreeing on ALL signs of ANY band become candidates
    (OR-ing bands is how recall grows), and only candidates are
    verified with exact cosine. The banded join is the scale path: each
    vector appears in exactly ``num_bands`` rows and candidates come
    from bucket equality, never an all-pairs product. Signs are taken
    on the dot product ROUNDED to 6 decimals so an ulp of float-sum
    difference can never flip a boundary sign between engines.
    """

    total_planes = num_bands * num_planes
    coeffs = lsh_plane_coeffs(dim, total_planes)
    # fixed-dim contract: vectors of any other length have no defined
    # projection onto the plane matrix and are excluded (empty vectors
    # have no direction at all)
    nonempty = scatter(embeddings.where(F.size(F.col(vec_col)) == dim))

    # ALL plane dot products in one pass: posexplode the vector, then
    # one hash-aggregate with `total_planes` codegen'd sums — the same
    # explode+aggregate shape as MinHash (higher-order lambdas are
    # interpreted per element; conditional sums stay in whole-stage
    # codegen, with map-side combine carrying one row per vector).
    ex = nonempty.select(id_col, F.posexplode(vec_col).alias("pos", "val"))
    dot_sums = ex.groupBy(id_col).agg(
        *[
            F.sum(
                F.col("val").cast("double")
                * F.element_at(
                    F.array(*[F.lit(c) for c in coeffs[p]]), F.col("pos") + 1
                )
            ).alias(f"dot{p}")
            for p in range(total_planes)
        ]
    )

    def sign_bit(p: int) -> Column:
        return F.when(F.round(F.col(f"dot{p}"), COSINE_SCALE) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )

    banded = dot_sums.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "", *[sign_bit(b * num_planes + j) for j in range(num_planes)]
                        ).alias("sig"),
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("bs"),
    ).select(id_col, "bs.band", "bs.sig")
    left, right = banded.alias("l"), banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("vec_a"),
            F.col(f"r.{id_col}").alias("vec_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    # verify joins re-read the RAW vectors (cheap parquet re-scan) rather
    # than re-deriving the signature lineage
    vecs = nonempty.select(id_col, vec_col)
    return (
        cand.join(
            vecs.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va")), "vec_a"
        )
        .join(vecs.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb")), "vec_b")
        .select("vec_a", "vec_b", cosine_col(F.col("va"), F.col("vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
