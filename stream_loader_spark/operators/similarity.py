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
    initial: DataFrame | None = None,
) -> DataFrame:
    """Lloyd's k-means refinement of the IVF coarse quantizer.

    Each iteration is one distributed pass: broadcast-join assignment
    (argmax cosine via max(struct)) then an element-wise mean per
    cluster computed with posexplode + avg — the per-iteration shuffle
    carries (k × dim) partial sums, and only k × dim values ever reach
    the driver, so the corpus size is irrelevant to driver memory.
    """
    spark = embeddings.sparkSession
    head = embeddings.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError(
            "kmeans_centroids: no vectors to cluster (empty input or "
            f"NULL leading {vec_col!r})"
        )
    dim = len(head[0])
    # ``initial`` overrides the id-value-based seeds — required when the
    # corpus's ids don't start at 0 (e.g. a stream's first micro-batch)
    centroids = (
        initial
        if initial is not None
        else seed_centroids(embeddings, num_centroids, id_col, vec_col)
    )

    for _ in range(iterations):
        # same broadcast projection argmax as assign_clusters (its only
        # exchange is scatter()'s local-mode fan-out, a no-op on
        # already-split inputs)
        assigned = assign_clusters(
            embeddings, num_centroids, id_col, vec_col, centroids
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


def group_centroids(
    embeddings: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    micro_scale: int = 1_000_000,
) -> DataFrame:
    """Element-wise mean embedding per group (class centroids) with a
    DETERMINISTIC cross-engine contract.

    Float summation order varies with partitioning, so a plain
    ``avg(val)`` per (group, position) is not reproducible bit-for-bit
    across engines or even across runs. Here every element is
    floor-quantized to integer micros BEFORE any cross-row addition;
    the per-position sums are then exact integers and the derived
    means are identical on every engine and partitioning. The ≤1e-6
    per-element quantization bias is irrelevant for centroid
    analytics (class prototypes, drift monitoring, IVF seeding);
    ``kmeans_centroids`` keeps the full-float path where refinement
    quality matters more than reproducibility.

    Scale shape: posexplode → ONE map-side-combinable aggregate to
    (group, position) integer sums — the shuffle carries
    groups × dim rows, never the corpus — then a groups-sized rollup
    reassembles index-ordered centroid arrays.
    """
    sums = (
        scatter(embeddings)
        .select(group_col, F.posexplode(vec_col).alias("pos", "val"))
        .groupBy(group_col, "pos")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("val").cast("double") * F.lit(float(micro_scale))).cast(
                    "bigint"
                )
            ).alias("micro_sum"),
        )
    )
    mean = F.col("micro_sum").cast("double") / F.col("n") / F.lit(float(micro_scale))
    return (
        sums.select(group_col, "pos", "n", mean.alias("mean"))
        .groupBy(group_col)
        .agg(
            F.max("n").alias("n_vecs"),
            F.count(F.lit(1)).alias("dim"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mean"))),
                lambda s: s["mean"],
            ).alias("centroid"),
        )
    )


def assign_clusters(
    embeddings: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """IVF coarse quantizer assignment: broadcast join + per-row argmax;
    one pass over the corpus. Centroids default to the deterministic
    seed set; pass ``kmeans_centroids(...)`` output for refined ones.
    ``keep_cols`` names passenger columns to carry through the
    projection so callers that need (cluster_id, passenger) pairs don't
    re-join the assignment back onto the corpus — the assignment is a
    pure projection, so carrying a column is free while the join is a
    corpus-sized shuffle."""
    # fail fast on passenger-column collisions: a keep_col named like
    # an output/input column would only surface downstream as an
    # ambiguous-reference AnalysisException far from the cause
    if len(set(keep_cols)) != len(keep_cols):
        raise ValueError(f"keep_cols contains duplicates: {keep_cols}")
    clash = set(keep_cols) & {id_col, vec_col, "cluster_id"}
    if clash:
        raise ValueError(
            f"keep_cols {sorted(clash)} collide with id_col/vec_col/'cluster_id'"
        )
    if centroids is None:
        centroids = seed_centroids(embeddings, num_centroids, id_col, vec_col)
    # Pack the (tiny) centroid set into ONE array-of-structs row,
    # broadcast it, and take the argmax inside a single projection —
    # zero shuffles of the corpus. The dot products are interpreted
    # higher-order functions, so scatter() spreads the C × dim per-row
    # work across the cores. (A literal-unrolled codegen variant was
    # measured 7× SLOWER: a k·dim-deep nested Add tree overwhelms the
    # optimizer and falls out of codegen — keep the HOF form.)
    # Centroid norms ride the structs and the row norm is hoisted, so
    # each norm is computed once. Tie-break matches the k-means update
    # step: highest cosine, then lowest centroid_id (struct max over
    # (cos, neg_id)). coalesce(1) first: the centroid set is ≤
    # num_centroids rows by construction, so collapsing to one
    # partition before the global collect_list satisfies the
    # aggregate's AllTuples requirement without a shuffle — one fewer
    # exchange (and one fewer AQE stage) on every assignment.
    cents = centroids.coalesce(1).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("centroid_id"),
                    F.col("centroid_vec"),
                    norm_col(F.col("centroid_vec")).alias("cnorm"),
                )
            )
        ).alias("_cents")
    )
    best = F.array_max(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                F.round(
                    dot_col(F.col(vec_col), c["centroid_vec"])
                    / (F.col("_anorm") * c["cnorm"]),
                    COSINE_SCALE,
                ).alias("cos"),
                (-c["centroid_id"]).alias("neg_id"),
            ),
        )
    )
    return (
        scatter(embeddings)
        .crossJoin(F.broadcast(cents))
        .withColumn("_anorm", norm_col(F.col(vec_col)))
        .select(
            id_col,
            vec_col,
            *keep_cols,
            (-best["neg_id"]).alias("cluster_id"),
        )
        # empty centroid set → empty result, matching the old join form
        .where(F.col("cluster_id").isNotNull())
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
        assigned = assign_clusters(
            embeddings, num_centroids, id_col, vec_col, centroids
        )
        queries = embeddings.where(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
        )
        return ivf_probe(assigned, centroids, queries, k, nprobe, id_col, vec_col)

    # Seed-quantizer fast path: the composed seed→assign→probe plan
    # re-scanned the corpus parquet FOUR times across five exchanges
    # and, worse, paid ~0.8 s of CONSTRUCTION: every DataFrame step
    # eagerly re-ANALYZES its whole plan JVM-side, and each
    # Python-lambda higher-order function adds ~40 ms of py4j
    # round-trips — measured 1.0–1.2 s at sf0.1, in the bench weak set
    # two rounds running. The fast path is therefore ONE spark.sql()
    # statement over a temp view: a single analysis of the final plan,
    # ~3 py4j calls total. Shape: (a) the tiny rows (seeds + queries)
    # come off one pushdown-filtered scan folded into a SINGLE one-row
    # broadcast carrying centroids, per-query probe lists, and hoisted
    # norms; (b) one corpus pass fuses assignment + probe membership +
    # scoring, leaving the top-k window as the only corpus exchange.
    # Results are bit-identical to the composed path (same rounded
    # cosine expressions, same tie-breaks; test-pinned equality).
    def sql_dot(a: str, b: str) -> str:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> double(x) * double(y)), "
            "0D, (acc, v) -> acc + v)"
        )

    def sql_cosine(a: str, b: str) -> str:
        return (
            f"round({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * "
            f"sqrt({sql_dot(b, b)})), {COSINE_SCALE})"
        )

    spark = embeddings.sparkSession
    if not query_ids:
        # array() below would be an untyped-literal analysis error; the
        # composed path's contract for no queries is an empty result
        idt = embeddings.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"query_id {idt}, match_id {idt}, cosine double, rank int"
        )
    # the source DataFrame is bound via spark.sql's formatter kwarg: a
    # per-call uuid temp view, dropped after analysis — a FIXED view
    # name raced concurrent ivf_topk calls on one session and leaked
    # into the catalog. scatter() first: the bound view pins the
    # (possibly fanned-out) plan, so interpreted HOF work parallelizes
    # on single-split local fixtures
    view = "{src}"
    qid_lits = "array(" + ", ".join(str(int(q)) for q in query_ids) + ")"
    probe_clusters = (
        "transform(slice(reverse(array_sort(transform(_cents, c -> named_struct("
        f"'cos', {sql_cosine('q.' + vec_col, 'c.centroid_vec')}, "
        f"'neg_id', -c.centroid_id)))), 1, {int(nprobe)}), p -> -p.neg_id)"
    )
    sql = f"""
    WITH rows1 AS (
      SELECT collect_list(named_struct('{id_col}', {id_col}, '{vec_col}', {vec_col})) AS _rows
      FROM (SELECT /*+ COALESCE(1) */ {id_col}, {vec_col} FROM {view}
            WHERE {id_col} < {int(num_centroids)} OR array_contains({qid_lits}, {id_col}))),
    cents AS (
      SELECT array_sort(transform(filter(_rows, r -> r.{id_col} < {int(num_centroids)}),
               r -> named_struct('centroid_id', r.{id_col}, 'centroid_vec', r.{vec_col},
                                 'cnorm', sqrt({sql_dot('r.' + vec_col, 'r.' + vec_col)})))) AS _cents,
             _rows
      FROM rows1),
    qs AS (
      SELECT _cents,
             array_sort(transform(filter(_rows, r -> array_contains({qid_lits}, r.{id_col})),
               q -> named_struct('query_id', q.{id_col}, 'query_vec', q.{vec_col},
                                 'qnorm', sqrt({sql_dot('q.' + vec_col, 'q.' + vec_col)}),
                                 'probe_clusters', {probe_clusters}))) AS _qs
      FROM cents),
    assigned AS (
      SELECT /*+ BROADCAST(qs) */ e.{id_col}, e.{vec_col}, _qs, _anorm,
             -array_max(transform(_cents, c -> named_struct(
                'cos', round({sql_dot('e.' + vec_col, 'c.centroid_vec')} / (_anorm * c.cnorm), {COSINE_SCALE}),
                'neg_id', -c.centroid_id))).neg_id AS cluster_id
      FROM (SELECT *, sqrt({sql_dot(vec_col, vec_col)}) AS _anorm FROM {view}) e
           CROSS JOIN qs),
    scored AS (
      SELECT _q.query_id AS query_id, {id_col} AS match_id,
             round({sql_dot('_q.query_vec', vec_col)} / (_q.qnorm * _anorm), {COSINE_SCALE}) AS cosine
      FROM (SELECT {id_col}, {vec_col}, _anorm,
                   explode(filter(_qs, q -> array_contains(q.probe_clusters, cluster_id))) AS _q
            FROM assigned)
      WHERE {id_col} <> _q.query_id),
    ranked AS (
      SELECT query_id, match_id, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, match_id ASC) AS rank
      FROM scored)
    SELECT query_id, match_id, cosine, rank FROM ranked WHERE rank <= {int(k)}
    """
    return spark.sql(sql, src=scatter(embeddings))


def ivf_probe(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a PREBUILT IVF index: the ANN twin of dedup's
    ``band_index`` ingest path.

    ``assigned`` (vec_id, embedding, cluster_id) and ``centroids``
    (centroid_id, centroid_vec) are the persistable index — write both
    once per corpus snapshot; each query batch then costs one broadcast
    of the (tiny) probe set against only the probed clusters' rows,
    never a corpus rebuild. ``queries`` is (query_id, query_vec).
    """
    from pyspark.sql import Window

    # Top-nprobe centroids per query as an in-row array selection over
    # the one-row packed centroid set — no shuffle, no window sort: the
    # centroid set is tiny by construction, so sort-desc + slice inside
    # a projection replaces a row_number window (one fewer exchange and
    # AQE stage per probe). Order matches the window form: cos DESC,
    # then centroid_id ASC (neg_id DESC under reverse(array_sort)).
    cents = centroids.coalesce(1).agg(
        F.collect_list(F.struct("centroid_id", "centroid_vec")).alias("_cents")
    )
    ranked = F.slice(
        F.reverse(
            F.array_sort(
                F.transform(
                    F.col("_cents"),
                    lambda c: F.struct(
                        cosine_col(F.col("query_vec"), c["centroid_vec"]).alias("cos"),
                        (-c["centroid_id"]).alias("neg_id"),
                    ),
                )
            )
        ),
        1,
        nprobe,
    )
    qprobe = (
        queries.crossJoin(F.broadcast(cents))
        .select("query_id", "query_vec", F.explode(ranked).alias("_p"))
        .select("query_id", "query_vec", (-F.col("_p.neg_id")).alias("cluster_id"))
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
    """coeff[p][i] = ((md5("p:i") % 1000) * 2 - 1000) / 1000 — a
    deterministic, near-orthogonal hyperplane matrix shared verbatim by
    Spark and SQL. Each value is an EXACT 3-decimal string parsed to
    its nearest double (``float("-0.84")``), never arithmetic on
    doubles: ``repr()`` then round-trips as the same short string in
    both engines, keeping the embedded literal matrix ~6 chars/coeff
    instead of 17 — the generated SQL is parsed per query and its size
    was a measurable construction cost."""
    import hashlib

    return [
        [
            float(f"{(int(hashlib.md5(f'{p}:{i}'.encode()).hexdigest()[:8], 16) % 1000) * 2 - 1000}e-3")
            for i in range(dim)
        ]
        for p in range(total_planes)
    ]


def auto_lsh_params(
    n: int,
    threshold: float,
    target_bucket: int = 4,
    recall: float = 0.9,
    min_planes: int = 8,
    max_bands: int = 16,
) -> tuple[int, int]:
    """Size the banded sign-LSH for a corpus of ``n`` vectors.

    ``num_planes = max(min_planes, ceil(log2(n / target_bucket)))`` —
    a sign band has 2^planes buckets, so this holds the EXPECTED bucket
    population of unrelated vectors at ``target_bucket`` regardless of
    corpus size, which is exactly the knob that keeps the candidate
    floor ``num_bands · n² / 2^(planes+1)`` linear in n (the r9 scale
    probe measured exponent 1.83 with planes pinned at 8 vs 0.80 with
    planes grown by this rule). The default is deliberately SMALL: the
    per-vector verify overhead is ``max_bands · target_bucket / 2``
    exact cosines, so 4 costs ~32 stray verifies per vector while 64
    would re-create the quadratic-feeling floor the auto-sizing exists
    to remove; collision probability for true near-dups barely moves
    (they agree on almost every sign).

    ``num_bands`` then re-grows to hold recall: a pair at exactly
    ``threshold`` agrees on one sign with probability
    p = 1 − acos(threshold)/π, on a whole band with q = p^planes, and
    on ≥1 of b bands with 1 − (1−q)^b, so
    ``b = ceil(log(1−recall) / log(1−q))``. Bands are a LINEAR cost
    multiplier (one more corpus-sized bucketing each), so they are
    capped at ``max_bands``: low thresholds drive q → 0 and the exact
    recall target would demand thousands of bands — past the cap the
    function trades recall, which is the right trade for a NEAR-dup
    primitive (threshold ≈ 1) asked to do broad-similarity work
    (threshold ≪ 1, where the IVF/brute-force family is the documented
    tool).
    """
    import math
    import warnings

    planes = max(min_planes, math.ceil(math.log2(max(n, 1) / max(target_bucket, 1))))
    bands = _bands_for(planes, threshold, recall, max_bands)
    # When the band cap binds at low thresholds the trade is recall, by
    # orders of magnitude (threshold 0.35, n=2M: ~0.1% per-pair recall
    # at the threshold vs the requested 90%) — callers deserve a
    # runtime signal that the result is a sample of the near-dup pairs,
    # not the near-complete set the recall target implies.
    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    q = p**planes
    achieved = 1.0 if q >= 1.0 else 1.0 - (1.0 - q) ** bands
    if bands >= max_bands and achieved < recall * 0.8:
        warnings.warn(
            f"auto_lsh_params: the {max_bands}-band cap binds at threshold "
            f"{threshold} with {planes} planes - achieved recall for a pair "
            f"AT the threshold is ~{achieved:.3g} vs the requested {recall}. "
            "Thresholds this far below 1 are broad-similarity work: use the "
            "IVF/brute-force family, or raise max_bands knowingly (bands are "
            "a linear corpus-pass multiplier).",
            RuntimeWarning,
            stacklevel=2,
        )
    return planes, bands


def _bands_for(planes: int, threshold: float, recall: float, max_bands: int) -> int:
    """Bands needed for ``recall`` at ``threshold`` given ``planes``
    sign bits per band (capped — see ``auto_lsh_params``)."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    q = p**planes
    if q >= 1.0:  # threshold == 1: every band matches
        return 1
    if q <= 0.0:
        return max_bands
    bands = math.ceil(math.log(max(1.0 - recall, 1e-12)) / math.log(1.0 - q))
    return max(1, min(max_bands, bands))


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_planes: int | None = None,
    num_bands: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    max_bucket: int = 500,
    target_bucket: int = 4,
    recall: float = 0.9,
) -> DataFrame:
    """Embedding near-dup pairs via banded sign-LSH + exact verify.

    ``num_bands`` independent bucketings of ``num_planes`` sign bits
    each; vectors agreeing on ALL signs of ANY band become candidates
    (OR-ing bands is how recall grows), and only candidates are
    verified with exact cosine. Candidates come from bucket equality,
    never an all-pairs product. Signs are taken on the dot product
    ROUNDED to 6 decimals so an ulp of float-sum difference can never
    flip a boundary sign between engines.

    **Sizing num_planes (the scale knob the r9 probe measured):** a
    sign band has 2^num_planes buckets, so even fully UNRELATED
    vectors collide at rate 2^-num_planes per band and candidate
    volume has a floor of num_bands · N² / 2^(num_planes+1). With
    planes pinned at 8 that floor turned measured superlinear at
    ~64 k vectors (SCALE_TREND.md: exponent ~1.7–1.83). The DEFAULT
    (``num_planes=None``) therefore AUTO-SIZES from one cheap corpus
    count: ``num_planes = max(8, ceil(log2(N / target_bucket)))``
    holds expected bucket population constant, and ``num_bands=None``
    re-grows bands to hold ``recall`` at the chosen threshold
    (per-band match probability is p^num_planes, p = 1 − θ/π; see
    ``auto_lsh_params``) — the r9 probe measured the same corpus going
    from exponent 1.83 back to 0.80 under exactly this rule. Pass both
    explicitly to pin a banding (the declared queries pin (8, 4)
    because their DuckDB oracles replicate that banding in SQL, and
    pinning also skips the count job).

    **Bucket cap (the boilerplate guard, same discipline as
    ``minhash_lsh_pairs``):** a degenerate bucket — embeddings of
    near-identical boilerplate — would expand B·(B−1)/2 pairs from one
    aggregate row. Buckets over ``max_bucket`` are star-linked through
    their min-id representative instead: O(B) pairs that still pass
    exact verify, so clusters stay recoverable via connected
    components while enumeration is capped; capped volume is published
    as an ``observe()`` metric (``cosine_lsh_capped_*``). Pairs not
    involving the representative may be missed if they collide in no
    other band — acceptable for the dedup/clustering consumers. The
    default (500) is sized in BYTES, not just pairs: pair structs here
    carry both vectors, so a bucket's expansion array costs
    ~B²/2 · 2·dim·4 bytes (≈64 MB at B=500, dim=64) evaluated per
    bucket row — unlike minhash's id-only pairs, where a 2000 cap is
    cheap.

    ``dim`` defaults to None = INFER from the first non-empty vector (a
    LIMIT-1 job at build time) — a caller with 128-d embeddings must
    not silently get an empty result because a 64-d default filtered
    every row out. Pass ``dim`` explicitly to skip the probe job.
    Vectors of any OTHER length have no defined projection onto the
    plane matrix and are excluded.

    Plan shape (deliberate, measured at sf0.1):

    - The plane matrix and every per-row expression are built as ONE
      SQL string — composing them from python ``Column`` ops cost ~2 s
      of py4j round-trips per build, and the bench times construction.
    - All ``num_bands × num_planes`` dot products come out of a single
      narrow ``transform/zip_with/aggregate`` pass — no posexplode (a
      64× row blow-up), no hash aggregate, no exchange. The r2
      explode+32-conditional-sums shape was 2.25× slower end-to-end,
      dominated by the giant codegen'd aggregate's compile cost.
    - Candidate generation is GROUP-then-expand over the (band, sig)
      buckets, not a banded self-join: the join shuffled the
      vector-carrying banded table twice and sort-merged string keys,
      while the bucket aggregate shuffles it once (pinned to cluster
      parallelism — byte-targeted AQE coalescing is the wrong cost
      model for rows carrying quadratic expansion work) and expands
      each bucket's collisions locally — the same pairs. Vectors ride
      the bucket row (O(B·dim) per row, bounded by ``max_bucket``), so
      exact cosine verifies in the same stage with no fetch join.
    """

    if dim is None:
        probe = (
            embeddings.where(F.size(F.col(vec_col)) > 0)
            .select(F.size(F.col(vec_col)).alias("d"))
            .first()
        )
        if probe is None:  # no non-empty vectors: nothing can pair
            dim = LSH_DEFAULT_DIM
        else:
            dim = probe["d"]
    if num_planes is None or num_bands is None:
        # one cheap count aggregate sizes the banding to the corpus —
        # the default path must never be quadratic (r9 probe: exponent
        # 1.83 with planes pinned at 8 vs 0.80 grown by this rule)
        n = embeddings.where(F.size(F.col(vec_col)) == dim).count()
        if num_planes is None:
            num_planes, auto_bands = auto_lsh_params(
                n, threshold, target_bucket, recall
            )
        else:
            auto_bands = _bands_for(num_planes, threshold, recall, max_bands=16)
        if num_bands is None:
            num_bands = auto_bands
    total_planes = num_bands * num_planes
    coeffs = lsh_plane_coeffs(dim, total_planes)
    nonempty = scatter(embeddings.where(F.size(F.col(vec_col)) == dim))

    mat_sql = "array(%s)" % ",".join(
        "array(%s)" % ",".join(repr(c) for c in plane) for plane in coeffs
    )
    dots_sql = (
        f"transform({mat_sql}, plane -> aggregate("
        f"zip_with({vec_col}, plane, (x, y) -> cast(x as double) * y), "
        f"0.0d, (acc, v) -> acc + v))"
    )
    sigs = nonempty.selectExpr(id_col, vec_col, f"{dots_sql} AS dots")
    band_structs = ",".join(
        "named_struct('band', %d, 'sig', concat(%s))"
        % (
            b,
            ",".join(
                f"CASE WHEN round(dots[{b * num_planes + j}], {COSINE_SCALE}) >= 0 "
                "THEN '1' ELSE '0' END"
                for j in range(num_planes)
            ),
        )
        for b in range(num_bands)
    )
    banded = sigs.selectExpr(
        id_col, vec_col, f"explode(array({band_structs})) AS bs"
    ).selectExpr(id_col, vec_col, "bs.band AS band", "bs.sig AS sig")

    from stream_loader_spark.operators.dedup import _obs_name

    par = embeddings.sparkSession.sparkContext.defaultParallelism
    # ms sorts by id (struct ordering, id first), so ms[j].id < ms[i].id
    # for j < i — pair orientation (vec_a < vec_b) is positional
    grouped = (
        banded.repartition(par, F.col("band"), F.col("sig"))
        .groupBy("band", "sig")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
                )
            ).alias("ms")
        )
        .where(F.size("ms") >= 2)
    )
    candidates = (
        grouped.selectExpr(
            f"""explode(
                  if(size(ms) <= {int(max_bucket)},
                     flatten(transform(sequence(1, size(ms) - 1),
                       i -> transform(sequence(0, i - 1),
                         j -> struct(ms[j].id AS vec_a, ms[i].id AS vec_b,
                                     ms[j].vec AS va, ms[i].vec AS vb,
                                     false AS star)))),
                     transform(sequence(1, size(ms) - 1),
                       i -> struct(ms[0].id AS vec_a, ms[i].id AS vec_b,
                                   ms[0].vec AS va, ms[i].vec AS vb,
                                   true AS star)))
                ) AS p"""
        )
        .select("p.vec_a", "p.vec_b", "p.va", "p.vb", "p.star")
        .observe(
            _obs_name("cosine_lsh"),
            F.sum(F.col("star").cast("long")).alias("star_pairs"),
        )
    )
    sq = lambda side: (  # noqa: E731 — Σ x² of one side's vector
        f"aggregate(transform({side}, x -> cast(x as double) * cast(x as double)), "
        "0.0d, (a, v) -> a + v)"
    )
    cos_sql = (
        "round(aggregate(zip_with(va, vb, "
        "(x, y) -> cast(x as double) * cast(y as double)), 0.0d, (a, v) -> a + v)"
        f" / (sqrt({sq('va')}) * sqrt({sq('vb')})), {COSINE_SCALE})"
    )
    return (
        candidates.selectExpr("vec_a", "vec_b", f"{cos_sql} AS cosine")
        .where(F.col("cosine") >= threshold)
        .dropDuplicates(["vec_a", "vec_b"])
    )


def max_cosine_to_set(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per corpus vector: the exact maximum cosine to ANY reference
    vector, plus which reference achieves it — the semantic
    decontamination primitive (reference = benchmark/eval embeddings;
    corpus rows above a threshold are contamination candidates the
    n-gram check in ``training.benchmark_contamination`` cannot see).

    Same zero-shuffle shape as ``assign_clusters``: the reference set
    packs into one array-of-structs row (norms precomputed), broadcasts,
    and the max folds inside a single projection — the corpus is
    scanned once, never shuffled. The reference side must be
    executor-fit (benchmark suites are thousands of rows, not corpora);
    past that, the banded sign-LSH family (``cosine_near_dup_pairs``)
    is the documented scale path. Ties break to the LOWEST reference id
    (struct max over (cos, -id) — same convention as assign_clusters).
    An empty reference set yields NULL max_cos/nearest_ref.
    """
    refs = reference.coalesce(1).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).cast("bigint").alias("rid"),
                    F.col(vec_col).alias("rvec"),
                    norm_col(F.col(vec_col)).alias("rnorm"),
                )
            )
        ).alias("_refs")
    )
    best = F.array_max(
        F.transform(
            F.col("_refs"),
            lambda r: F.struct(
                F.round(
                    dot_col(F.col(vec_col), r["rvec"])
                    / (F.col("_anorm") * r["rnorm"]),
                    COSINE_SCALE,
                ).alias("cos"),
                (-r["rid"]).alias("neg_id"),
            ),
        )
    )
    return (
        scatter(corpus)
        .crossJoin(F.broadcast(refs))
        .withColumn("_anorm", norm_col(F.col(vec_col)))
        .select(
            id_col,
            best["cos"].alias("max_cos"),
            (-best["neg_id"]).alias("nearest_ref"),
        )
    )
