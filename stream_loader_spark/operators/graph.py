"""Iterative graph ranking (PageRank) as a Pregel-shaped DataFrame loop.

The reference engine has no graph operator; this exists for the
pipeline jobs a large corpus store runs around its tables — ranking
sources/domains by link mass, weighting crawl frontiers, propagating
authority from curated seeds. The shape (per-iteration message
aggregation over a static edge table) is the one every iterative graph
algorithm on Spark reduces to, so it doubles as the repo's template
for "loop until converged" jobs that must not melt at 100 TB.

Arithmetic is EXACT integer fixed-point so the result is
bit-reproducible on any engine, partitioning, or summation order:
ranks are BIGINT multiples of 1/scale, per-edge contributions use
integer division, and the damping update is ``base + (d_pct * Σcontrib)
div 100``. A DuckDB oracle can therefore unroll the same iterations in
SQL and hash-match exactly — no float-tolerance waiver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 10**9


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = DEFAULT_SCALE,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
    broadcast_ranks: bool = False,
    assume_distinct: bool = False,
    symmetric: bool = False,
    seed_nodes: list[int] | None = None,
    deg_col: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns ``(node BIGINT, rank_scaled BIGINT)`` where ``rank_scaled``
    is the rank in units of ``1/scale`` after ``iterations`` rounds of

        rank'(v) = (100 - damping_pct) * scale div 100
                   + damping_pct * Σ_{u→v} (rank(u) div outdeg(u)) div 100

    starting from ``rank = scale`` for every node. Every step is
    integer arithmetic on non-negative values (``div`` == floor here),
    so the result is independent of partitioning and engine — the
    property the driver's hash-compare oracle needs.

    Semantics notes:
    - edges are deduplicated; the node set is the set of edge
      endpoints (pass bidirectional edges for an undirected graph);
    - dangling mass (nodes with no out-edges) is dropped, the common
      simple variant — ranks then need not sum to N·scale;
    - overflow bound: ``damping_pct · N · scale < 2^63`` ⇒ with the
      default scale=1e9 the node count must stay < ~1e8; lower
      ``scale`` (ranks lose fractional digits, not correctness of the
      fixed-point contract) for larger graphs;
    - ``seed_nodes`` switches to PERSONALIZED PageRank (the
      crawl-frontier / curated-seed relevance variant): the teleport
      term lands only on the seeds (unnormalized e_S convention —
      per-seed base is the same constant, total mass shrinks, ranking
      semantics are standard PPR), initial rank is ``scale`` on seeds
      and 0 elsewhere, so after k rounds a node's rank is exactly the
      damped seed-reachability mass within k hops.

    Scale shape (the part that must survive 100 TB): the degree-joined
    edge table is localCheckpoint-ed ONCE. Two join strategies:

    - ``broadcast_ranks=False`` (default, fully distributed): edges are
      repartitioned by ``src`` before the checkpoint — LogicalRDD keeps
      that output partitioning, so each iteration's rank join
      reshuffles only the |V|-sized rank table, never the edges (the
      SMJ does re-sort the edge partitions each round — the cost of
      staying driver-independent).
    - ``broadcast_ranks=True``: the |V|-row rank and contribution
      tables are broadcast, so each iteration is a map-side hash join
      over the checkpointed edges plus ONE |V|-sized shuffle for the
      message SUM — no edge-side sort, ~an order of magnitude faster
      when |V| ≪ |E| (bipartite purchase graphs, domain link graphs).
      The driver must hold |V| rows per round; keep the default for
      graphs whose node table itself is executor-scale.

    Per iteration: one join on src, one map-side-combinable SUM by
    dst, and — only for non-symmetric graphs — one left join back to
    the node set (nodes without in-edges keep the base rank; with
    ``symmetric=True`` every node IS a dst, so the contribution table
    already covers the node set and the join is skipped). On the
    distributed path rank tables are localCheckpoint-ed LAZILY per
    round so the plan never grows with the iteration count; on the
    broadcast path rounds chain inside one plan (each round's
    broadcast build materializes the previous round exactly once —
    builds nest, single consumer) with a depth-bounding checkpoint
    every 8th round. Checkpoint blocks pin executor storage until the
    caller unpersists or the session ends (same caveat as every
    checkpoint-hygiene note in this repo).

    ``deg_col``: callers that run SEVERAL rankings over one edge table
    (plain + personalized) can pass a pre-deduplicated, degree-joined,
    materialized edge frame once and name its out-degree column here —
    the dedup/degree/checkpoint prep is then skipped entirely.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if deg_col is not None:
        # caller contract: edges are already deduplicated, carry the
        # src out-degree in-row, and are materialized (checkpointed /
        # persisted) — the shared-graph fast path for callers that run
        # several rankings over one edge table (e.g. plain + seeded)
        ed = edges.select(
            F.col(src_col).cast("bigint").alias("src"),
            F.col(dst_col).cast("bigint").alias("dst"),
            F.col(deg_col).cast("bigint").alias("deg"),
        )
    else:
        e = edges.select(
            F.col(src_col).cast("bigint").alias("src"),
            F.col(dst_col).cast("bigint").alias("dst"),
        )
        if not assume_distinct:
            # callers that just mirrored a distinct pair set (undirected
            # graphs) skip this edge-sized shuffle with assume_distinct
            e = e.distinct()
        if not broadcast_ranks:
            # pre-partition by the iteration join key so only ranks reshuffle
            e = e.repartition(num_partitions, "src") if num_partitions else e.repartition("src")
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        # iteration-invariant: materialize once, partitioned by the join
        # key. EVERYTHING downstream (the node set included) derives from
        # this checkpointed frame — deriving nodes from `e` instead
        # re-runs the whole upstream edge build once per checkpoint
        # (measured 3× the query's cost on the purchase graph).
        ed = e.join(deg, "src").localCheckpoint(eager=False)
    if symmetric:
        # every node appears as a src — distinct src IS the node set.
        # No checkpoint: on the symmetric path the node set has exactly
        # ONE consumer (the initial ranks), so pinning it would only
        # add a serialized build-time job.
        nodes = ed.select(F.col("src").alias("node")).distinct()
    else:
        nodes = (
            ed.select(F.col("src").alias("node"))
            .union(ed.select(F.col("dst").alias("node")))
            .distinct()
        ).localCheckpoint(eager=False)
    base = (100 - damping_pct) * scale // 100
    if seed_nodes is not None:
        if not seed_nodes:
            raise ValueError("seed_nodes must be non-empty when given")
        seed_arr = F.array(*[F.lit(int(x)).cast("bigint") for x in seed_nodes])

        def base_for(col):  # teleport mass lands only on the seeds
            return (
                F.when(F.array_contains(seed_arr, col), F.lit(base))
                .otherwise(F.lit(0))
                .cast("bigint")
            )

        init_col = (
            F.when(F.array_contains(seed_arr, F.col("node")), F.lit(scale))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
    else:

        def base_for(col):
            return F.lit(base).cast("bigint")

        init_col = F.lit(scale).cast("bigint")
    ranks = nodes.select("node", init_col.alias("rank"))
    hint = F.broadcast if broadcast_ranks else (lambda df: df)
    for i in range(iterations):
        contrib = (
            ed.join(hint(ranks.withColumnRenamed("node", "src")), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("rank div deg")).alias("s"))
        )
        if symmetric:
            # every node has an in-edge (it appears as a dst), so the
            # contribution table already covers the whole node set —
            # the per-round nodes left-join is provably redundant and
            # skipping it removes one join per iteration
            ranks = contrib.select(
                F.col("dst").alias("node"),
                (
                    base_for(F.col("dst"))
                    + F.expr(f"({damping_pct} * s) div 100")
                ).cast("bigint").alias("rank"),
            )
        else:
            ranks = nodes.join(
                hint(contrib.withColumnRenamed("dst", "node")), "node", "left"
            ).select(
                "node",
                (
                    base_for(F.col("node"))
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).cast("bigint").alias("rank"),
            )
        if not broadcast_ranks or (i + 1) % 8 == 0:
            # distributed path: truncate lineage every round (the rank
            # join would otherwise re-plan a growing tree). Broadcast
            # path: each round's broadcast build already materializes
            # the previous round exactly once (builds nest, single
            # consumer — no recompute), so per-round checkpoints only
            # added a serialized AQE job per iteration (measured ~0.4 s
            # over 5 rounds); a checkpoint every 8th round just bounds
            # analyzer depth for long loops.
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.col("rank").alias("rank_scaled"))


def pagerank_oracle_sql(
    edges_cte: str,
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = DEFAULT_SCALE,
    seed_nodes: list[int] | None = None,
) -> str:
    """Unrolled-SQL twin of :func:`pagerank` for the DuckDB oracle.

    ``edges_cte`` must be a complete CTE body named ``edges`` producing
    distinct ``(src, dst)``. Standard recursive CTEs cannot aggregate
    in the recursive term, so the fixed iteration count is unrolled as
    chained CTEs — an independent derivation of the same integer
    fixed-point, not a transliteration of the DataFrame loop.
    """
    base = (100 - damping_pct) * scale // 100
    if seed_nodes is not None:
        seeds = ", ".join(str(int(x)) for x in seed_nodes)
        base_sql = f"CASE WHEN n.node IN ({seeds}) THEN {base} ELSE 0 END"
        init_sql = f"CASE WHEN node IN ({seeds}) THEN {scale} ELSE 0 END"
    else:
        base_sql = str(base)
        init_sql = str(scale)
    parts = [
        f"WITH {edges_cte},",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),",
        "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges)),",
        f"r0 AS (SELECT node, CAST({init_sql} AS BIGINT) AS rank FROM nodes),",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, SUM(r.rank // d.deg) AS s"
            f" FROM edges e JOIN r{i - 1} r ON r.node = e.src"
            f" JOIN deg d ON d.src = e.src GROUP BY e.dst),"
        )
        parts.append(
            f"r{i} AS (SELECT n.node, CAST({base_sql} + ({damping_pct} *"
            f" COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank"
            f" FROM nodes n LEFT JOIN c{i} c USING (node)),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT node, rank AS rank_scaled FROM r{iterations}"
    )
    return "\n".join(parts)
