"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Beyond-reference surface (BASELINE.json north star). Design notes for
100 TB scale:

- **Exact** dedup is one hash-aggregate on a content digest — map-side
  partial aggregation means the shuffle carries ~one row per distinct
  digest, not per input row.
- **MinHash-LSH** is the shuffle-friendly near-dup algorithm: per-doc
  signatures are an IN-ROW aggregate fold over the hashed-shingle
  array (cheap seeded rehashes of ONE base shingle hash; zero
  exchanges — signatures materialize in the scan stage), then docs
  are exploded only into ``bands`` rows each (b = NUM_BANDS,
  constant), grouped by (band, band-hash) to find candidate buckets,
  and only candidate pairs are verified with true Jaccard. Work is
  proportional to input + number of colliding pairs — never all-pairs.
- **SimHash** gives a single 64-bit signature per doc (the same
  in-row fold over md5 token hashes); near-dup candidates collide on
  one of 4 16-bit chunks (Hamming-distance ≤ 3 over 64 bits is very
  likely to leave at least one chunk untouched... with 4 chunks,
  distance ≤ 3 GUARANTEES one identical chunk by pigeonhole).
- All pair outputs are canonicalized as (doc_a < doc_b) and distinct.

The reference itself only deduplicates replayed Kafka batches (SURVEY
§2.5); these operators generalize dedup to content level for
training-data pipelines.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from stream_loader_spark.operators.text import tokens_sql
from stream_loader_spark.sources.tables import scatter

# Signature length / banding. 32 hashes in 16 bands of 2 rows: the
# band-collision curve is P(candidate) = 1-(1-j^2)^16 — ~1 at j≥0.8,
# 0.99 at j=0.6, with the exact-Jaccard verify discarding the extra
# low-similarity candidates the 2-row bands admit. Chosen over the
# r1-r6 64/16 (4-row) scheme after measuring the signature stage at
# ~half the per-corpus hashing cost for identical verified pair sets:
# at j=0.8 a 4-row banding misses ~2e-4 of pairs ((1-0.8^4)^16),
# 2-row banding ~8e-8 ((1-0.64)^16) — recall AND cost favor r=2; the
# price is more sub-threshold candidates for the verify to discard.
NUM_HASHES = 32          # MinHash signature length
NUM_BANDS = 16           # LSH bands (rows per band = 32/16 = 2)
SHINGLE_SIZE = 3         # word shingles

# Identity of the banding scheme a persisted band index was built with
# (hash family, signature length, banding, shingle size). Index stores
# (streaming/ingest.py) stamp this on creation and refuse to reopen
# under a different scheme: band hashes from two schemes are mutually
# meaningless, so a silent mix would LOSE RECALL, not error.


def signature_scheme(num_bands: int | None = None) -> str:
    """Scheme string for a given banding (index stores stamp this per
    index so a re-banded index fails closed against a stale reader)."""
    return (
        f"xxh64-seeded-h{NUM_HASHES}-b{NUM_BANDS if num_bands is None else num_bands}"
        f"-s{SHINGLE_SIZE}"
    )


SIGNATURE_SCHEME = signature_scheme()

SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4
SMALL_GRAPH_EDGES = 1_000_000  # below this, components resolve driver-side
# Per-bucket pair-expansion cap: buckets up to this size enumerate all
# B·(B−1)/2 collisions locally (≤ ~0.5M pair evaluations per bucket —
# bounded task time AND a bounded collect_list array, far under the 2GB
# array limit); larger buckets switch to a sub-quadratic strategy — see
# each generator's docstring. A degenerate bucket (a million-doc
# boilerplate cluster) would otherwise put the whole cluster in ONE
# aggregate row and expand quadratically on a single task.
MAX_BUCKET = 1024

# Unique per-call observation names: Spark rejects duplicate observe()
# names inside one query, and a plan may compose several generators.
_OBS_IDS = itertools.count()


def _obs_name(prefix: str) -> str:
    return f"{prefix}_capped_{next(_OBS_IDS)}"


def _union_find_labels(spark, edges: list[tuple[int, int]], id_type: str = "bigint"):
    """Min-id connected components of a small edge list (path-halving
    union-find); returns a (node, label) DataFrame. ``id_type`` is the
    ids' Spark type — hardcoding bigint made string-keyed graphs crash
    ONLY on the small-graph path (a data-size-dependent failure)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so the root IS the cluster label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = {n for e in edges for n in e}
    return spark.createDataFrame(
        [(n, find(n)) for n in sorted(nodes)], f"node {id_type}, label {id_type}"
    )


def exact_dedup(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on a content digest: one representative (min id) and
    the duplicate count per distinct text."""
    return (
        documents.groupBy(F.sha2(F.col(text_col), 256).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def keep_best_dedup(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Exact dedup keeping the highest-QUALITY duplicate per content
    group (ties → lowest id), not an arbitrary representative — the
    policy real corpus pipelines want when duplicates differ in
    upstream cleaning.

    One hash-aggregate with map-side combine: ``max_by`` over a
    (quality, -id) struct picks the winner inside the partial
    aggregate, so no window, no second shuffle, and no per-group row
    materialization — the 100 TB-safe shape (a row_number window over
    content_hash would sort every group).
    """
    # min over (−quality, id): largest quality wins, ties take the
    # smallest id. Negating the QUALITY (numeric by contract) instead
    # of the id keeps the tie-break type-agnostic — string/uuid ids
    # have no negation, and the old (q, −id) max_by crashed on them.
    pref = F.struct(
        (-F.col(quality_col)).alias("nq"), F.col(id_col).alias("tie")
    )
    return documents.groupBy(
        F.sha2(F.col(text_col), 256).alias("content_hash")
    ).agg(
        F.min_by(F.col(id_col), pref).alias("keep_id"),
        F.max(quality_col).alias("best_quality"),
        F.count(F.lit(1)).alias("dup_count"),
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    seen_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-dedup a new batch against the corpus's content-hash set.

    ``seen_hashes`` is the persisted (content_hash) table — 32 bytes
    per historical document, appended after every ingest. The batch is
    first deduped within itself (min-id representative, same policy as
    ``exact_dedup``), then anti-joined against history. Only the batch
    is ever hashed; with the hash table bucketed on content_hash the
    anti-join co-locates and the historical side never re-shuffles.

    The in-batch dedup is ONE ``min_by`` aggregate that keeps the
    min-id row whole (r12: the previous groupBy + left-semi self-join
    shape scanned and sha2-hashed the batch text TWICE — once per join
    side, exchange reuse does not fire across the two subtrees — and
    paid a second exchange for the join; the aggregate shuffles the
    same full rows the semi-join's left side did, so the bytes moved
    are unchanged while the batch is read and hashed once). NULL-text
    AND NULL-id rows are excluded explicitly — the old semi-join
    dropped both as a side effect of NULL equi-join semantics (a
    NULL id can never equal the group's min id), and without the id
    filter ``min_by`` over an all-NULL-id group returns a NULL struct,
    emitting a corrupted all-NULL row with a valid content_hash. Both
    filters are plain column null-checks, not re-evaluations of the
    hash. Rows tying exactly on (content_hash, id) keep ONE
    representative (``min_by`` semantics); ids are unique in every
    supported corpus, so the tie rule only matters for malformed input.

    Returns the surviving batch rows plus their ``content_hash`` so
    the caller can append exactly these hashes to the history table.
    """
    hashed = new_docs.where(
        F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    ).withColumn("content_hash", F.sha2(F.col(text_col), 256))
    cols = [c for c in new_docs.columns]
    in_batch_unique = (
        hashed.groupBy("content_hash")
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("_row"))
        .select("_row.*", "content_hash")
    )
    return in_batch_unique.join(
        seen_hashes.select("content_hash"), "content_hash", "left_anti"
    )


def hash_shingles_over(toks_expr: str, size: int = SHINGLE_SIZE) -> str:
    """Distinct word ``size``-shingles of an EXISTING token-array
    expression as 64-BIT HASHES (array<bigint>), never materializing
    the shingle strings.

    The window hash is a multi-argument ``xxhash64`` over the window's
    tokens with a literal ``1L`` interleaved between them. Spark's
    multi-arg xxhash64 SEED-CHAINS per argument (each value is hashed
    with the running hash as the seed), so ("ab","c") and ("a","bc")
    cannot alias even without the separators — the ``1L``s are
    redundant, kept only because they are baked into
    ``SIGNATURE_SCHEME`` and removing them would invalidate persisted
    band indexes for no gain. Either way the map from string shingle
    to hash is injective up to 64-bit hash collisions
    (~1e-14 within even a 10k-shingle document), so Jaccard over these
    hash sets equals Jaccard over the string sets — which is what the
    exhaustive string-shingle oracles verify — while skipping the
    per-window string allocation and hashing each token's bytes once
    instead of re-concatenating. Docs shorter than ``size`` tokens
    hash their whole text as one shingle (the canonical string form:
    distinct space-joined word windows, whole text when shorter —
    exactly what the SQL oracles spell out).
    """
    t = toks_expr
    win = ", 1L, ".join(f"element_at({t}, i + {j})" for j in range(size))
    return (
        f"CASE WHEN size({t}) >= {size} THEN "
        f"array_distinct(transform(sequence(1, size({t}) - {size - 1}), "
        f"i -> xxhash64({win}))) "
        f"ELSE array(xxhash64(array_join({t}, ' '))) END"
    )


def with_hash_shingles(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
    size: int = SHINGLE_SIZE,
) -> DataFrame:
    """(id, *extra_cols, shingles: array<bigint>) — per-doc distinct
    hashed shingles (see ``hash_shingles_over``), with the tokenizer
    HOISTED into its own projection: the window expression references
    the token array ``size + 1`` times, interpreted HOFs have no
    common-subexpression elimination, and CollapseProject keeps a
    non-cheap alias referenced more than once — so the regex split
    runs once per row instead of once per reference."""
    toks = (
        scatter(documents)
        .selectExpr(id_col, *extra_cols, f"{tokens_sql(text_col)} AS _toks")
    )
    return toks.selectExpr(
        id_col, *extra_cols, f"{hash_shingles_over('_toks', size)} AS shingles"
    )


def with_minhash(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """id → MinHash signature (array<bigint> of per-seed minima).

    Computed as ONE in-row ``aggregate`` fold over the hashed-shingle
    array — a projection, ZERO shuffles: the accumulator starts at
    ``num_hashes`` × Long.MaxValue and each shingle folds in via
    ``zip_with(acc, rehashes, least)``. Rounds 1-6 used explode + 32
    codegen'd min-aggregates on the "HOFs are interpreted" rationale;
    a measured A/B at sf0.1 has the single-pass fold 5× FASTER
    (0.48s vs 2.61s) — the aggregate's per-row hash-table updates and
    the per-document shuffle cost more than interpreting the fold,
    and the projection form also drops the signature stage's exchange
    entirely (signatures materialize in the same stage as the scan at
    any corpus size).

    The ``num_hashes`` per-seed hash family is derived from ONE base
    hash per shingle (``hash_shingles_over``) by seeded fixed-width
    rehashes ``xxhash64(base, seed)`` — each seed's map is a uniform
    function of the base value, so the per-seed minima are independent
    MinHash draws up to base-hash collisions; hashing 8 fixed bytes
    per seed instead of the shingle string per seed is the cost win.
    Seeds are INT literals (``sequence(0, n-1)``), matching the
    round-7 explode form's literal types bit-for-bit — signatures and
    band hashes equal that form exactly. Indexes persisted under the
    PREVIOUS scheme (64 hashes of xxhash64 over shingle STRINGS) are
    a different hash family entirely; ``SIGNATURE_SCHEME`` exists to
    reject them rather than probe them with silent recall loss.
    """
    init = "array(" + ", ".join(["9223372036854775807L"] * num_hashes) + ")"
    merge = (
        f"(acc, s) -> zip_with(acc, transform(sequence(0, {num_hashes - 1}), "
        "i -> xxhash64(s, i)), (a, h) -> least(a, h))"
    )
    return with_hash_shingles(documents, text_col, id_col).selectExpr(
        id_col, f"aggregate(shingles, {init}, {merge}) AS minhash"
    )


def band_index(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """The slim LSH band table (id, band, band_hash) — ``num_bands``
    rows per document, no text, no shingles.

    This IS the persistable near-dup index: write it once per corpus
    snapshot (a few hundred bytes per document at any corpus size) and
    every future ingest probes it instead of re-hashing the corpus —
    see ``incremental_near_dup_pairs``.
    """
    if not 1 <= num_bands <= NUM_HASHES or NUM_HASHES % num_bands:
        # num_bands > NUM_HASHES makes rows_per_band 0: every band hash
        # becomes a constant and the LSH join degenerates to ALL-PAIRS;
        # a non-divisor silently ignores trailing hashes (recall drift)
        raise ValueError(
            f"num_bands must divide {NUM_HASHES} (got {num_bands})"
        )
    rows_per_band = NUM_HASHES // num_bands
    sig = with_minhash(documents, text_col, id_col)
    band_structs = ",".join(
        "named_struct('band', %d, 'band_hash', xxhash64(concat_ws(',', %s)))"
        % (
            b,
            ",".join(
                # [] indexing is 0-based in Spark SQL (element_at is 1-based)
                f"CAST(minhash[{b * rows_per_band + j}] AS STRING)"
                for j in range(rows_per_band)
            ),
        )
        for b in range(num_bands)
    )
    return sig.selectExpr(
        id_col, f"explode(array({band_structs})) AS bh"
    ).selectExpr(id_col, "bh.band AS band", "bh.band_hash AS band_hash")


def minhash_lsh_pairs(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_bands: int = NUM_BANDS,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    Returns (doc_a, doc_b, jaccard) with jaccard ≥ threshold.

    Candidate generation is group-then-expand over the band buckets,
    not a band-table self-join: both join sides would rebuild the full
    minhash pipeline (exchange reuse does not collapse the two-sided
    shape — the measured plan banded the corpus twice), while the
    bucket aggregate shuffles it once and expands each bucket's
    B·(B−1)/2 collisions locally — the same pairs a join on the bucket
    key would colocate anyway. Candidates and the collision-touched
    shingle sets are ``localCheckpoint``-ed: they feed 2-3 consumers
    each, and both scale with the DUPLICATE population (the operator's
    output magnitude — the same working set ``dedup_components``
    persists downstream), never with corpus size; the verify shingles
    only candidate-touched documents, so untouched corpus text never
    leaves the scan.

    **Bucket cap (the 100 TB guard):** a degenerate band bucket — a
    boilerplate cluster where millions of documents share a band hash —
    would otherwise become ONE aggregate row expanding B·(B−1)/2 pairs
    on a single task. Buckets larger than ``max_bucket`` are instead
    linked through their representative (the bucket's min id): O(B)
    star pairs that still pass the exact-Jaccard verify, so the full
    cluster remains recoverable via ``dedup_components`` while pair
    ENUMERATION within such a bucket is capped (pairs not involving the
    representative may be missed if they collide in no other band —
    acceptable for dedup, whose consumer is the connected-components
    clustering). The number of star-linked candidates is published as
    an ``observe()`` metric (``minhash_lsh_capped_*`` in the SQL UI /
    ``observedMetrics``), so the cap is never silent. Both expansion
    arms live in ONE ``if`` inside the single bucket aggregate — no
    window pass, no separate star branch (the first cap implementation
    fed two branches from a windowed band table, and each branch
    re-ran the full minhash pipeline — exchange reuse does not fire
    across that shape); buckets are round-robin repartitioned before
    expansion so the quadratic small-bucket work parallelizes instead
    of landing on whatever few partitions AQE coalesced the (byte-wise
    tiny) bucket table into.
    """
    bands = band_index(documents, text_col, id_col, num_bands)
    # ONE bucket aggregate with the cap folded into the expansion
    # expression (r7 follow-up: the first cap implementation windowed
    # the band table and fed small/star branches from it — exchange
    # reuse does not fire across that union shape, so each branch
    # re-ran the full minhash pipeline and the query doubled). The
    # collect_list holds a bucket's member IDS — LINEAR in bucket
    # size, unlike the B·(B−1)/2 pair expansion the cap exists to
    # bound; an oversized bucket's row stays O(B) (8 bytes/member:
    # even a pathological 10M-doc boilerplate cluster is an 80 MB row,
    # with the 2GB array limit ~8 orders past any real bucket).
    # ``sort_array`` makes ids[0] the bucket's min id = the star
    # representative, identical to the windowed form's min() — and
    # pair orientation (doc_a < doc_b) positional.
    par = documents.sparkSession.sparkContext.defaultParallelism
    # Pre-partition by the GROUP KEY at cluster parallelism and let the
    # aggregate reuse that exchange (same recipe as
    # cosine_near_dup_pairs): a user-specified repartition is exempt
    # from AQE coalescing, so the quadratic bucket expansion keeps
    # multi-core spread without the post-aggregate round-robin
    # repartition the r7 form paid — one exchange (and one AQE stage
    # job) less on the candidate path at any scale (r12: 2 exch -> 1
    # on the banding side, pair set bit-identical).
    grouped = (
        bands.repartition(par, "band", "band_hash")
        .groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    candidates = (
        grouped.selectExpr(
            f"""explode(
                  if(size(ids) <= {int(max_bucket)},
                     flatten(transform(sequence(1, size(ids) - 1),
                       i -> transform(sequence(0, i - 1),
                         j -> struct(ids[j] AS doc_a, ids[i] AS doc_b,
                                     false AS star)))),
                     transform(sequence(1, size(ids) - 1),
                       i -> struct(ids[0] AS doc_a, ids[i] AS doc_b,
                                   true AS star)))
                ) AS p"""
        )
        .select("p.doc_a", "p.doc_b", "p.star")
        .observe(
            _obs_name("minhash_lsh"),
            F.sum(F.col("star").cast("long")).alias("star_pairs"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )

    # Verify only candidate pairs with true Jaccard on the shingle
    # sets, derived solely for the touched documents.
    # one read of the candidate block instead of two (explode both ends
    # of each pair); LEFT SEMI against the raw exploded ids (r13): a
    # semi-join needs no distinct right side, so the touched-id
    # deduplication exchange is gone, and the tokenizer only ever sees
    # the semi-join survivors (candidate-scale), so the corpus-wide
    # scatter respread of the raw text rows bought nothing — two
    # exchanges (and two AQE stage jobs) off the verify branch at any
    # scale, same shingle sets.
    touched = candidates.select(
        F.explode(F.array("doc_a", "doc_b")).alias(id_col)
    )
    shingle_sets = (
        documents.select(id_col, text_col)
        .join(touched, id_col, "left_semi")
        .selectExpr(id_col, f"{tokens_sql(text_col)} AS _toks")
        .selectExpr(id_col, f"{hash_shingles_over('_toks')} AS shingles")
        .localCheckpoint(eager=False)
    )
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        candidates.join(
            shingle_sets.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a")),
            "doc_a",
        )
        .join(
            shingle_sets.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b")),
            "doc_b",
        )
        .withColumn("jaccard", jaccard)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def incremental_near_dup_pairs(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    corpus_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """Near-dup pairs TOUCHING a new batch, probed against a persisted
    band index — the 100 TB ingest path.

    Re-running ``minhash_lsh_pairs`` over corpus+batch re-hashes every
    historical document per ingest; this probes instead: only the new
    batch is shingled and banded, its bands join the stored
    ``band_index`` (plus the batch's own bands for new-new pairs), and
    the exact-Jaccard verify re-derives shingles ONLY for the touched
    corpus documents (candidate ids joined before shingling, so the
    text of unmatched corpus rows never leaves the scan). Ingest cost
    scales with batch size + collision count, not corpus size.

    Returns (doc_a, doc_b, jaccard) with at least one side in the
    batch; ids must be globally unique across corpus and batch.

    Materialization: the three BATCH-scaled intermediates (the new
    batch's bands, the candidate pairs, the touched-doc shingle sets)
    are ``localCheckpoint(eager=False)``-ed. Each feeds 2-4 downstream
    consumers, and exchange reuse is an optimizer courtesy the multi-
    branch union/join shapes here defeat in practice — without the
    checkpoints the measured physical plan re-derived the full banding
    pipeline per consumer (19 parquet scans for a 4-scan query).
    Everything checkpointed scales with batch size + collision count,
    NEVER corpus size (the corpus-sized ``corpus_index`` is read, not
    materialized), so the blocks are per-ingest small; localCheckpoint
    (not persist) because the ContextCleaner auto-releases the blocks
    when the result goes out of scope — a persist here had no owner to
    unpersist it and would leak once per ingest batch.
    """
    new_bands = band_index(new_docs, text_col, id_col, num_bands).localCheckpoint(
        eager=True
    )
    all_bands = corpus_index.select(id_col, "band", "band_hash").unionByName(
        new_bands
    )
    n = new_bands.alias("n")
    a = all_bands.alias("a")
    candidates = (
        n.join(
            a,
            (F.col("n.band") == F.col("a.band"))
            & (F.col("n.band_hash") == F.col("a.band_hash"))
            & (F.col(f"n.{id_col}") != F.col(f"a.{id_col}")),
        )
        .select(
            F.least(F.col(f"n.{id_col}"), F.col(f"a.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"n.{id_col}"), F.col(f"a.{id_col}")).alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .localCheckpoint(eager=False)
    )

    # shingle only the touched documents: candidate ids first, text
    # after. LEFT SEMI against the raw exploded ids (r13, same change
    # as minhash_lsh_pairs): no distinct exchange on the touched ids.
    touched = candidates.select(
        F.explode(F.array("doc_a", "doc_b")).alias(id_col)
    )
    all_docs = corpus_docs.select(id_col, text_col).unionByName(
        new_docs.select(id_col, text_col)
    )
    shingle_sets = (
        all_docs.join(touched, id_col, "left_semi")
        .selectExpr(id_col, f"{tokens_sql(text_col)} AS _toks")
        .selectExpr(id_col, f"{hash_shingles_over('_toks')} AS shingles")
        .localCheckpoint(eager=False)
    )
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        candidates.join(
            shingle_sets.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a")),
            "doc_a",
        )
        .join(
            shingle_sets.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b")),
            "doc_b",
        )
        .withColumn("jaccard", jaccard)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def near_dup_pairs_touching(
    documents: DataFrame,
    is_new: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """Batch (index-free) incremental near-dup: all near-dup pairs with
    at least one side in the ``is_new`` slice, from ONE banding pass.

    The streaming ingest path (``incremental_near_dup_pairs``) probes a
    PERSISTED band index so history is never re-hashed per batch; this
    is the batch form for when no index exists yet. Banding corpus and
    batch separately costs two full minhash pipelines over what is one
    underlying table — here the whole table is banded once, the "new"
    predicate (recomputable from the id alone) filters the slim band
    table into the probe side, and candidates keep only pairs touching
    the new slice. The exact-Jaccard verify then re-shingles only
    collision-touched documents, exactly like the probe form.

    The band table is ``localCheckpoint``-ed: both self-join sides
    consume it and the optimizer's exchange reuse does not collapse the
    filtered-vs-unfiltered subtrees (measured: the un-materialized plan
    re-ran the full minhash pipeline per consumer). In-session
    checkpointing of a corpus×num_bands table is the fixture/batch-job
    stance; at real scale you would write it to storage instead — which
    IS the persisted ``band_index`` the probe form consumes. Candidates
    and touched-shingle sets (collision-bounded) are checkpointed for
    the same reuse reason.
    """
    bands = band_index(documents, text_col, id_col, num_bands).localCheckpoint(
        eager=True
    )
    n = bands.where(is_new).alias("n")
    a = bands.alias("a")
    candidates = (
        n.join(
            a,
            (F.col("n.band") == F.col("a.band"))
            & (F.col("n.band_hash") == F.col("a.band_hash"))
            & (F.col(f"n.{id_col}") != F.col(f"a.{id_col}")),
        )
        .select(
            F.least(F.col(f"n.{id_col}"), F.col(f"a.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"n.{id_col}"), F.col(f"a.{id_col}")).alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .localCheckpoint(eager=False)
    )
    # LEFT SEMI against the raw exploded ids (r13, same change as
    # minhash_lsh_pairs): no distinct exchange on the touched ids.
    touched = candidates.select(
        F.explode(F.array("doc_a", "doc_b")).alias(id_col)
    )
    shingle_sets = (
        documents.select(id_col, text_col)
        .join(touched, id_col, "left_semi")
        .selectExpr(id_col, f"{tokens_sql(text_col)} AS _toks")
        .selectExpr(id_col, f"{hash_shingles_over('_toks')} AS shingles")
        .localCheckpoint(eager=False)
    )
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        candidates.join(
            shingle_sets.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a")),
            "doc_a",
        )
        .join(
            shingle_sets.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b")),
            "doc_b",
        )
        .withColumn("jaccard", jaccard)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    block_col: str | None = None,
    shingle_size: int = SHINGLE_SIZE,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via a count-aggregated shared-shingle
    equi-join.

    For ``threshold > 0`` a qualifying pair must share ≥ 1 shingle, so
    instead of enumerating every (blocked) document pair and
    intersecting shingle ARRAYS per pair — O(pairs × doc_len), the
    shape that made this the one bench-excluded query — the distinct
    shingles explode once and self-join on the shingle itself
    (plus the optional ``block_col``): |intersection| is the pair's
    row count, |union| = nsh_a + nsh_b − |intersection|, both from one
    hash aggregate. Work is proportional to shared-shingle
    co-occurrence, not to the pair count; the remaining hot spot is
    genuinely frequent shingles, which is inherent to exact Jaccard —
    the at-scale path stays MinHash-LSH (``minhash_lsh_pairs``), which
    bounds candidates by banding instead.

    With ``block_col`` set, only pairs sharing the blocking key are
    compared (e.g. language). Returns (doc_a, doc_b, jaccard) with
    jaccard ≥ threshold.
    """
    if threshold <= 0:
        # a 0-threshold would have to emit non-overlapping pairs too,
        # which only the all-pairs form can produce
        raise ValueError(
            f"ngram_jaccard_pairs requires threshold > 0, got {threshold}"
        )
    block = [block_col] if block_col else []
    # The shingle set size rides INSIDE the generator input (zip_with
    # pairing each shingle with the array length): expressions placed
    # NEXT TO an explode (``size(sh) …, explode(sh)``) end up in the
    # Project above Generate and are re-evaluated per OUTPUT row — the
    # whole shingle HOF re-ran once per exploded shingle, a measured
    # 30× on this pipeline. Inside the generator everything evaluates
    # once per input row.
    ex = (
        with_hash_shingles(documents, text_col, id_col, tuple(block), shingle_size)
        .selectExpr(
            id_col,
            *block,
            """explode(
                  zip_with(shingles, array_repeat(size(shingles), size(shingles)),
                           (s, n) -> struct(s AS shingle, n AS nsh))
                ) AS z""",
        )
        .select(id_col, *block, "z.shingle", "z.nsh")
    )
    # Group-then-expand, not a self-join: a shingle self-join shuffles
    # the exploded shingle table TWICE and sort-merges string keys;
    # grouping to (shingle → sorted doc list) shuffles it once, and the
    # co-occurring pairs expand locally per bucket with a generator
    # expression — the same pairs the join would emit. Docs sort by id
    # inside the bucket so pair orientation (doc_a < doc_b) is
    # positional, not re-compared.
    #
    # **Bucket cap (the 100 TB guard):** exact Jaccard cannot skip or
    # down-link a frequent shingle — every co-occurrence row feeds the
    # intersection COUNT — so a shingle shared by more than
    # ``max_bucket`` documents routes through a streamed self-join on
    # the shingle key instead: the same quadratic pair set, but emitted
    # as streamed join output rather than buffered as one
    # B·(B−1)/2-element array in one aggregate row (the 2GB-array /
    # executor-OOM failure mode). The quadratic WORK for a genuinely
    # frequent shingle is inherent to exact Jaccard — the at-scale
    # answer remains ``minhash_lsh_pairs``, which bounds candidates by
    # banding. Oversized-bucket row volume is published as an
    # ``observe()`` metric (``ngram_jaccard_capped_*``).
    #
    # ONE bucket aggregate feeds both routes (the first cap
    # implementation windowed the exploded shingle table and fed three
    # consumers from it — each re-ran the tokenize+explode pipeline, a
    # measured 3×); the oversized route re-explodes its buckets with
    # ``inline`` before the streamed self-join, so an oversized
    # bucket's aggregate row is O(B) member structs (~12 bytes each —
    # linear, with the 2GB array limit ~5 orders past any real
    # shingle frequency), never the quadratic pair expansion.
    # Explicit key-repartition (pinned to cluster parallelism) instead
    # of the groupBy's implicit exchange: the partitioning satisfies the
    # aggregate's clustering requirement, so no second exchange — and
    # the pinned width keeps the bucket/pair stages parallel where AQE's
    # byte-targeted coalescing would serialize them (shingle buckets are
    # byte-wise tiny but carry quadratic expansion work — bytes are the
    # wrong cost model for this stage). The bucket table is checkpointed
    # EAGERLY: three consumers read it (the small route plus BOTH sides
    # of the oversized-bucket self-join), and the r12 plan audit showed
    # the hoped-for cross-subtree ReusedExchange does NOT fire under
    # AQE/observe — each consumer re-ran the whole scan→shingle→
    # aggregate pipeline. One vocabulary-scale materialization replaces
    # three corpus passes (interleaved A/B at sf0.1: min 1.58→1.30 s,
    # identical pairs).
    par = documents.sparkSession.sparkContext.defaultParallelism
    grouped = (
        ex.repartition(par, *[F.col(c) for c in block], F.col("shingle"))
        .groupBy(*block, "shingle")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(id_col).alias("id"), F.col("nsh").alias("nsh"))
                )
            ).alias("docs")
        )
        .where(F.size("docs") >= 2)
        .localCheckpoint(eager=True)
    )
    # **Lossless size prefilter** (standard set-similarity join
    # pruning): |A∩B| ≤ min(|A|,|B|) and |A∪B| ≥ max(|A|,|B|), so
    # J(A,B) ≤ min/max — a pair whose shingle counts differ by more
    # than the threshold ratio can NEVER qualify and is dropped BEFORE
    # the intersection-count shuffle (inside the expansion array for
    # small buckets, in the join condition for oversized ones). The
    # 1e-9 slack keeps the double-arithmetic comparison conservative at
    # the exact boundary: a borderline pair is kept and decided by the
    # exact Jaccard filter, so output is bit-identical.
    size_ok = f"least(p.na, p.nb) >= {float(threshold)} * greatest(p.na, p.nb) - 1e-9"
    small_pairs = (
        grouped.where(F.size("docs") <= max_bucket)
        .selectExpr(
            f"""explode(
                 filter(
                   flatten(
                     transform(sequence(1, size(docs) - 1),
                       i -> transform(sequence(0, i - 1),
                         j -> struct(docs[j].id AS doc_a, docs[i].id AS doc_b,
                                     docs[j].nsh AS na, docs[i].nsh AS nb)))),
                   p -> {size_ok})
               ) AS p"""
        )
        .select("p.doc_a", "p.doc_b", "p.na", "p.nb")
        .toDF("doc_a", "doc_b", "na", "nb")
    )
    big = grouped.where(F.size("docs") > max_bucket).selectExpr(
        *block, "shingle", "inline(docs)"
    )
    # observe only the LEFT side: a CollectMetrics node on both sides of
    # the self-join would be a duplicate observation name in one query
    a = big.observe(
        _obs_name("ngram_jaccard"), F.count(F.lit(1)).alias("bucket_rows")
    ).alias("a")
    b = big.alias("b")
    big_pairs = a.join(
        b,
        [F.col(f"a.{c}") == F.col(f"b.{c}") for c in [*block, "shingle"]]
        + [
            F.col("a.id") < F.col("b.id"),
            # same lossless size prefilter as the small-bucket route
            F.least(F.col("a.nsh"), F.col("b.nsh"))
            >= float(threshold) * F.greatest(F.col("a.nsh"), F.col("b.nsh")) - 1e-9,
        ],
    ).select(
        F.col("a.id").alias("doc_a"),
        F.col("b.id").alias("doc_b"),
        F.col("a.nsh").alias("na"),
        F.col("b.nsh").alias("nb"),
    )
    pairs = small_pairs.unionByName(big_pairs)
    # same pinned-width exchange rationale as the bucket aggregate: the
    # co-occurrence rows are tiny but fan in from quadratic expansions
    inter = (
        pairs.repartition(par, F.col("doc_a"), F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("ninter"),
            F.any_value(F.col("na")).alias("na"),
            F.any_value(F.col("nb")).alias("nb"),
        )
    )
    return inter.select(
        "doc_a",
        "doc_b",
        (
            F.col("ninter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("ninter"))
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


def with_simhash(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """id → 64-bit SimHash (BIGINT): bit i is set iff at least half the
    distinct tokens have bit i set in their 64-bit hash.

    Like MinHash, this is ONE in-row ``aggregate`` fold — a projection,
    zero shuffles: tokens md5-hash once in an inner ``transform``, and
    the fold adds each token's 64 bit values into an accumulator array
    via ``zip_with``. Rounds 1-6 used explode + 64 conditional sums on
    the "HOFs are interpreted" rationale; the measured A/B at sf0.1 has
    the fold 3× faster (0.57s vs 1.67s, bit-identical signatures) — the
    hash-aggregate's per-row table updates and per-document shuffle
    cost more than interpreting the fold (same lesson as
    ``with_minhash``). Majority votes and bit assembly are plain
    integer arithmetic over the folded counts. Documents with no
    tokens emit no row (``size > 0`` guard), exactly like the explode
    form they replace.

    The per-token 64-bit hash is the md5 hex digest read nibble-wise
    (bit i = bit ``i % 4`` of hex digit ``i // 4``) — md5 is available
    with identical output in every engine, so the whole signature is
    reproducible by an independent SQL oracle (xxhash64 would tie the
    contract to one engine's hash).

    The digest is parsed with TWO ``conv`` calls (32-bit halves) and
    the per-bit values come from integer shifts on those longs —
    bit-identical to the per-nibble parse but 2.4× faster (16
    substring+conv string ops per token row were the measured
    signature bottleneck at sf0.1).

    The fold merge and the 64-term majority assembly are built as
    parsed SQL strings, not 128 Column objects: constructing the same
    tree through the Python Column API costs ~1 s of py4j round-trips
    per invocation (the measured driver-side bottleneck of
    ``simhash_pairs`` at r6), while the single-string build costs
    ~0.1 s for a bit-identical plan.
    """
    ths = (
        scatter(documents)
        .selectExpr(id_col, f"{tokens_sql(text_col)} AS _toks")
        .selectExpr(
            id_col,
            # inner transform hashes each token ONCE (interpreted HOFs
            # have no CSE — referencing md5(t) per 32-bit half would
            # hash every token twice)
            "transform(transform(array_distinct(_toks), t -> md5(t)), "
            "h -> struct(cast(conv(substring(h, 1, 8), 16, 10) as bigint) as hi, "
            "cast(conv(substring(h, 9, 8), 16, 10) as bigint) as lo)) AS ths",
        )
        .where("size(ths) > 0")
    )

    def shift_of(i: int) -> int:
        # hex digit j holds bits [4j, 4j+4) of the signature; digit j's
        # value sits at shift 4*(7 - j // 4) + j % 4 inside its 32-bit half
        j = i if i < 32 else i - 32
        return 4 * (7 - j // 4) + j % 4

    bits_expr = ", ".join(
        f"shiftright(h.{'hi' if i < 32 else 'lo'}, {shift_of(i)}) & 1"
        for i in range(bits)
    )
    counts = ths.selectExpr(
        id_col,
        "size(ths) AS n",
        f"aggregate(ths, array_repeat(0L, {bits}), "
        f"(acc, h) -> zip_with(acc, array({bits_expr}), (a, b) -> a + b)) AS cs",
    )
    terms = " + ".join(
        # bit 63 is the sign bit
        f"if(element_at(cs, {i + 1}) * 2 >= n, {2**i if i < 63 else -(2**63)}L, 0L)"
        for i in range(bits)
    )
    return counts.selectExpr(id_col, f"cast({terms} as bigint) as simhash")


def _paired_labels(
    spark_docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 50,
) -> DataFrame:
    """(id, cluster_id) for nodes that APPEAR IN A PAIR — the working
    set of every dedup policy. Documents touching no pair are
    singletons by definition; callers that need them labeled too
    (``dedup_components``) union them in with one corpus anti-join,
    and callers that don't (the keep-one-per-cluster policies, where
    singletons pass through untouched) skip that corpus-sized join
    entirely."""
    return dedup_components(
        spark_docs, pairs, id_col, max_iterations, _paired_only=True
    )


def dedup_components(
    documents: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 50,
    _paired_only: bool = False,
) -> DataFrame:
    """Connected components over near-dup pairs: (id → cluster_id).

    Near-dup relations are not transitive, but dedup policy usually is
    ("drop everything connected to a kept doc"), so pairs are clustered
    with iterative min-label propagation: every node starts labeled with
    its own id; each round, a node's label becomes the min of its own
    and its neighbors' labels; converged when no label changes. Rounds
    are O(graph diameter) — near-dup graphs are shallow, so this
    converges in a few rounds. ``localCheckpoint`` breaks lineage growth
    each round (essential for iterative DataFrame algorithms at scale).

    Only nodes that appear in a pair are iterated — documents touching
    no pair are singletons by definition and are unioned in unlabeled at
    the end, so iteration cost tracks the duplicate population, not the
    corpus.
    """
    # persist pairs first: the two-direction union below would otherwise
    # evaluate the (expensive) pair-finding pipeline twice
    pairs = pairs.persist()

    # Size-based strategy (the broadcast-vs-shuffle decision applied to
    # graphs): near-dup edge sets are usually a tiny fraction of the
    # corpus, and a small graph resolves in one driver-side union-find
    # pass instead of paying per-round join + checkpoint + count jobs.
    # Only the EDGES come to the driver (duplicate pairs, not corpus
    # rows); past the threshold the distributed iteration takes over.
    # count() populates the persist in one full compute; the collect()
    # below re-reads the cache (a limit(N+1) probe would instead pay
    # CollectLimit's incremental scale-up rounds — measured slower).
    n_pairs = pairs.count()
    if n_pairs <= SMALL_GRAPH_EDGES:
        labels = _union_find_labels(
            documents.sparkSession,
            [(r["doc_a"], r["doc_b"]) for r in pairs.collect()],
            id_type=pairs.schema["doc_a"].dataType.simpleString(),
        )
        pairs.unpersist()
        paired = labels.select(
            F.col("node").alias(id_col), F.col("label").alias("cluster_id")
        )
        if _paired_only:
            return paired
        singletons = documents.select(F.col(id_col)).join(
            labels.select(F.col("node").alias(id_col)), id_col, "left_anti"
        ).select(F.col(id_col), F.col(id_col).alias("cluster_id"))
        return paired.unionByName(singletons)

    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )

    converged = False
    try:
        for _ in range(max_iterations):
            neighbor_min = (
                edges.join(labels, edges.src == labels.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("label").alias("nbr_label"))
            )
            updated = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("new_label"),
                    F.col("label"),
                )
            ).localCheckpoint()
            changed = updated.where(F.col("new_label") != F.col("label")).count()
            labels = updated.select("node", F.col("new_label").alias("label"))
            if changed == 0:
                converged = True
                break
    finally:
        edges.unpersist()
    if not converged:
        pairs.unpersist()
        # silent partial convergence would split clusters and keep
        # near-duplicate "representatives" — fail loudly instead
        raise RuntimeError(
            f"connected components did not converge in {max_iterations} rounds; "
            "raise max_iterations (graph diameter exceeds it)"
        )
    pairs.unpersist()
    paired = labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))
    if _paired_only:
        return paired
    singletons = documents.select(F.col(id_col)).join(
        paired.select(id_col), id_col, "left_anti"
    ).select(F.col(id_col), F.col(id_col).alias("cluster_id"))
    return paired.unionByName(singletons)


def dedup_keep_representative(
    documents: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one document per near-dup cluster (the min id); singletons
    survive untouched. The standard end-to-end near-dup dedup:
    pairs → components → anti-join the losers. Losers can only be
    PAIRED documents, so the components run skips labeling singletons
    (which costs a corpus-sized anti-join it would then discard)."""
    comps = _paired_labels(documents, pairs, id_col)
    losers = comps.where(F.col(id_col) != F.col("cluster_id")).select(id_col)
    return documents.join(losers, id_col, "left_anti")


def dedup_keep_best_in_cluster(
    documents: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Near-dup dedup keeping the highest-QUALITY member per cluster
    (ties → lowest id) instead of the arbitrary min-id representative.

    Composition of two scale-safe pieces: connected components label
    the PAIRED documents (iteration cost tracks the duplicate
    population; singletons survive by definition, so they are never
    labeled, joined, or ranked), then ONE map-side-combinable
    aggregate picks each cluster's winner via max_by over a
    (quality, -id) struct, and an anti-join drops the losers from the
    corpus. No window over clusters, no per-cluster row
    materialization, no corpus-sized singleton labeling.
    """
    comps = _paired_labels(documents, pairs, id_col)
    labeled = documents.select(id_col, quality_col).join(comps, id_col)
    pref = F.struct(F.col(quality_col).alias("q"), (-F.col(id_col)).alias("tie"))
    winners = labeled.groupBy("cluster_id").agg(
        F.max_by(F.col(id_col), pref).alias(id_col)
    )
    losers = comps.select(id_col).join(winners.select(id_col), id_col, "left_anti")
    return documents.join(losers, id_col, "left_anti")


def simhash_pairs(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Candidates collide on one of SIMHASH_CHUNKS 16-bit chunks
    (pigeonhole: distance ≤ 3 < 4 chunks ⇒ some chunk is identical),
    then the true Hamming distance filters.

    Group-then-expand over the chunk buckets, not a self-join: the
    join's two sides would each rebuild the simhash pipeline (the
    measured plan computed it twice — exchange reuse does not fire
    across the two-sided shape), while the bucket aggregate shuffles
    it once. The Hamming filter runs INSIDE the expansion, so only
    true near-pairs survive to the dropDuplicates exchange.

    **Bucket cap (the 100 TB guard):** 16-bit chunks have only 65,536
    values per chunk position, so at a billion documents EVERY bucket
    is degenerate (~15k docs each) — the unbounded expansion would put
    whole clusters in single aggregate rows and evaluate B·(B−1)/2
    interpreted-HOF pair structs on single tasks. Buckets larger than
    ``max_bucket`` therefore link through their representative (the
    bucket's min-id member): O(B) star pairs, each still passing the
    exact ``bit_count`` Hamming filter, so identical/near-identical
    clusters stay fully connected for ``dedup_components`` while pair
    enumeration inside an oversized bucket is capped (a member whose
    distance to the representative exceeds ``max_hamming`` can still
    pair through its other three chunks). Star-pair volume is published
    as an ``observe()`` metric (``simhash_capped_*``). Both expansion
    arms live in ONE ``if`` inside the single bucket aggregate — no
    window, no second branch, so the signature pipeline runs exactly
    once; buckets are round-robin repartitioned before expansion so
    the quadratic small-bucket work spreads across cores instead of
    the 1-2 partitions AQE coalesces the byte-wise-tiny bucket table
    into (the measured r6 regression: ~1M pair evaluations on one
    task).
    """
    sh = with_simhash(documents, text_col, id_col)
    chunk_width = SIMHASH_BITS // SIMHASH_CHUNKS
    chunks = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", c * chunk_width)
                        .bitwiseAND(F.lit((1 << chunk_width) - 1))
                        .alias("chunk_val"),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("cv"),
    ).select(id_col, "simhash", "cv.chunk", "cv.chunk_val")

    # ONE bucket aggregate with the cap folded into the expansion
    # expression (same r7 follow-up as ``minhash_lsh_pairs``: the
    # windowed small/star branches re-ran the chunk explode + window
    # sort per branch). ``sort_array`` over (id, s) structs sorts by id
    # first ⇒ ds[0] is the min-id member WITH its signature — the star
    # representative. The Hamming filter runs INSIDE both expansion
    # arms, so only true near-pairs survive to the dropDuplicates
    # exchange; a bucket's aggregate row is O(B) member structs (16
    # bytes each), never the B·(B−1)/2 pair expansion.
    # Pre-partition by the GROUP KEY at cluster parallelism and let the
    # aggregate reuse the exchange (r12, same recipe as
    # minhash_lsh_pairs / cosine_near_dup_pairs): a user repartition is
    # exempt from AQE coalescing, so the quadratic bucket expansion
    # keeps its multi-core spread without a second post-aggregate
    # exchange — 2 exch -> 1 on the candidate path, pairs bit-identical.
    par = documents.sparkSession.sparkContext.defaultParallelism
    grouped = (
        chunks.repartition(par, "chunk", "chunk_val")
        .groupBy("chunk", "chunk_val")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("s"))
                )
            ).alias("ds")
        )
        .where(F.size("ds") >= 2)
    )
    return (
        grouped.selectExpr(
            f"""explode(
                  filter(
                    if(size(ds) <= {int(max_bucket)},
                       flatten(transform(sequence(1, size(ds) - 1),
                         i -> transform(sequence(0, i - 1),
                           j -> struct(ds[j].id AS doc_a, ds[i].id AS doc_b,
                                       bit_count(ds[j].s ^ ds[i].s) AS hamming,
                                       false AS star)))),
                       transform(sequence(1, size(ds) - 1),
                         i -> struct(ds[0].id AS doc_a, ds[i].id AS doc_b,
                                     bit_count(ds[0].s ^ ds[i].s) AS hamming,
                                     true AS star))),
                    p -> p.hamming <= {max_hamming})
                ) AS p"""
        )
        .select("p.doc_a", "p.doc_b", "p.hamming", "p.star")
        .observe(
            _obs_name("simhash"),
            F.sum(F.col("star").cast("long")).alias("star_pairs"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_containment_pairs(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    block_col: str | None = None,
    shingle_size: int = SHINGLE_SIZE,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Exact ASYMMETRIC shingle containment pairs: C(A→B) = |A∩B|/|A| —
    the partial-copy / quotation detector. Jaccard misses a short doc
    embedded verbatim in a long one (the union is dominated by the long
    doc); containment of the short side is 1.0 there BY DESIGN, which
    is exactly why this operator has NO size prefilter — the
    ``ngram_jaccard_pairs`` min/max-ratio prune would delete the only
    pairs this exists to find.

    Same count-aggregated shared-shingle shape as the Jaccard operator
    (candidates blocked on a shared shingle — lossless for containment
    > 0; group-then-expand with the identical ``max_bucket`` streamed
    self-join guard for frequent shingles). Emits each qualifying pair
    once with both directions: (doc_a, doc_b, containment_a_in_b,
    containment_b_in_a) where doc_a < doc_b and the LARGER direction
    clears ``threshold``; containments round to 6 decimals. The
    at-scale approximate path for symmetric near-dup remains
    MinHash-LSH; exact containment's work tracks shared-shingle
    co-occurrence, same as exact Jaccard.
    """
    if threshold <= 0:
        raise ValueError(
            f"ngram_containment_pairs requires threshold > 0, got {threshold}"
        )
    block = [block_col] if block_col else []
    ex = (
        with_hash_shingles(documents, text_col, id_col, tuple(block), shingle_size)
        .selectExpr(
            id_col,
            *block,
            """explode(
                  zip_with(shingles, array_repeat(size(shingles), size(shingles)),
                           (s, n) -> struct(s AS shingle, n AS nsh))
                ) AS z""",
        )
        .select(id_col, *block, "z.shingle", "z.nsh")
    )
    par = documents.sparkSession.sparkContext.defaultParallelism
    # eager checkpoint for the same three-consumer reason as
    # ngram_jaccard_pairs (cross-subtree exchange reuse does not fire)
    grouped = (
        ex.repartition(par, *[F.col(c) for c in block], F.col("shingle"))
        .groupBy(*block, "shingle")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(id_col).alias("id"), F.col("nsh").alias("nsh"))
                )
            ).alias("docs")
        )
        .where(F.size("docs") >= 2)
        .localCheckpoint(eager=True)
    )
    small_pairs = (
        grouped.where(F.size("docs") <= max_bucket)
        .selectExpr(
            """explode(
                 flatten(
                   transform(sequence(1, size(docs) - 1),
                     i -> transform(sequence(0, i - 1),
                       j -> struct(docs[j].id AS doc_a, docs[i].id AS doc_b,
                                   docs[j].nsh AS na, docs[i].nsh AS nb))))
               ) AS p"""
        )
        .select("p.doc_a", "p.doc_b", "p.na", "p.nb")
        .toDF("doc_a", "doc_b", "na", "nb")
    )
    big = grouped.where(F.size("docs") > max_bucket).selectExpr(
        *block, "shingle", "inline(docs)"
    )
    a = big.observe(
        _obs_name("ngram_containment"), F.count(F.lit(1)).alias("bucket_rows")
    ).alias("a")
    b = big.alias("b")
    big_pairs = a.join(
        b,
        [F.col(f"a.{c}") == F.col(f"b.{c}") for c in [*block, "shingle"]]
        + [F.col("a.id") < F.col("b.id")],
    ).select(
        F.col("a.id").alias("doc_a"),
        F.col("b.id").alias("doc_b"),
        F.col("a.nsh").alias("na"),
        F.col("b.nsh").alias("nb"),
    )
    pairs = small_pairs.unionByName(big_pairs)
    inter = (
        pairs.repartition(par, F.col("doc_a"), F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("ninter"),
            F.any_value(F.col("na")).alias("na"),
            F.any_value(F.col("nb")).alias("nb"),
        )
    )
    out = inter.select(
        "doc_a",
        "doc_b",
        F.round(F.col("ninter").cast("double") / F.col("na"), 6).alias(
            "containment_a_in_b"
        ),
        F.round(F.col("ninter").cast("double") / F.col("nb"), 6).alias(
            "containment_b_in_a"
        ),
    )
    return out.where(
        F.greatest(F.col("containment_a_in_b"), F.col("containment_b_in_a"))
        >= threshold
    )
