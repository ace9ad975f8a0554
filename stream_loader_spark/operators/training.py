"""Training-corpus preparation operators (beyond-reference surface).

The steps a large-scale LLM training-data pipeline runs after cleaning
and dedup: chunking documents into model-window-sized pieces,
screening against evaluation benchmarks (contamination), capped
per-stratum sampling, and TF-IDF term scoring. Each is built from
cross-engine primitives (word tokens, md5 buckets, ``ln``, sha256) so
a DuckDB oracle can replicate the algorithm, not just sample its
output.

Scale notes (100 TB):

- ``chunk_documents`` is a narrow transform+explode — no shuffle; rows
  grow by the chunk count, bytes stay ~constant (+overlap).
- ``benchmark_contamination`` broadcasts the DISTINCT benchmark
  shingle set: benchmarks are thousands of documents, corpora are
  billions — broadcasting the small side replaces the classic
  every-shingle shuffle with a map-side semi-join. If a benchmark set
  ever outgrows broadcast, swap in the same banded-LSH candidate
  pattern as ``dedup.py``.
- ``stratified_sample`` windows per stratum; strata are languages (a
  few hundred at most), and the per-stratum ORDER BY md5 makes the cap
  reproducible. For mega-strata, pre-thin with the hash-bucket filter
  from ``sampling.py`` before the exact window.
- ``tfidf_top_terms`` broadcasts the document-frequency vocabulary
  (sublinear in corpus size) — same Zipf-skew argument as
  ``unigram_logprob``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream_loader_spark.operators.text import tokens_col
from stream_loader_spark.operators.sampling import sample_bucket
from stream_loader_spark.sources.tables import scatter


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size token chunks with overlap — the standard shaping of
    documents into model context windows.

    Chunk k covers tokens [k·stride, k·stride + chunk_tokens) with
    stride = chunk_tokens − overlap; the final chunk may be shorter.
    Emits (doc_id, chunk_index, n_tokens, chunk_hash) — the hash is
    sha256 of the space-rejoined tokens, so chunk CONTENT is verified
    without shipping it.
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap {overlap} must be < chunk_tokens {chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    # k = 0 .. ceil((n - chunk_tokens)/stride) — the last chunk is the
    # FIRST one reaching the end of the document. The naive
    # floor((n-1)/stride) bound emitted one more chunk whenever
    # stride < n <= chunk_tokens-ish tails: a strict SUBSET of its
    # predecessor, silently duplicating that text into the training set.
    max_k = F.when(n <= chunk_tokens, F.lit(0)).otherwise(
        F.ceil((n - chunk_tokens) / F.lit(stride))
    )
    chunks = F.transform(
        F.sequence(F.lit(0), max_k.cast("int")),
        lambda k: F.struct(
            k.alias("chunk_index"),
            F.slice(toks, k * stride + 1, chunk_tokens).alias("chunk"),
        ),
    )
    return (
        scatter(documents)
        .where(F.size(toks) > 0)
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_index").alias("chunk_index"),
            F.size("c.chunk").alias("n_tokens"),
            F.sha2(F.array_join("c.chunk", " "), 256).alias("chunk_hash"),
        )
    )


def benchmark_contamination(
    documents: DataFrame,
    benchmark: DataFrame,
    shingle_size: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination screen: the fraction of each document's
    distinct word shingles that appear in ANY benchmark document.

    The benchmark shingle set is deduplicated and BROADCAST; each
    corpus document then answers its overlap with a map-side join —
    no corpus-sized shuffle. Emits (doc_id, n_shingles, n_contaminated,
    contamination) with the fraction as one exact IEEE division.

    Both sides compare 64-bit HASHED shingles (``hash_shingles_over``):
    membership over the hashes equals membership over the strings up
    to 64-bit collisions (the minhash-verify argument — the string
    oracle is the ground truth), the per-window string concat never
    materializes, and the broadcast set carries 8-byte longs instead
    of n-word strings.
    """
    from stream_loader_spark.operators.dedup import with_hash_shingles

    # hash-scatter the corpus on the doc id BEFORE shingling: the final
    # per-doc overlap aggregate reuses this exchange (explode and the
    # broadcast join preserve it), so the shingle-exploded rows — ~30×
    # the document count — never shuffle. with_hash_shingles' internal
    # scatter sees an already-wide input and no-ops.
    doc_shingles = with_hash_shingles(
        scatter(documents, by=(id_col,)), text_col, id_col, size=shingle_size
    ).select(F.col(id_col), F.explode("shingles").alias("shingle"))
    bench_shingles = (
        with_hash_shingles(benchmark, text_col, id_col, size=shingle_size)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = doc_shingles.join(F.broadcast(bench_shingles), "shingle", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_contaminated"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_contaminated",
            (F.col("n_contaminated") / F.col("n_shingles")).alias("contamination"),
        )
    )


def stratified_sample(
    df: DataFrame,
    per_stratum: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """At most ``per_stratum`` rows per stratum, chosen by the
    deterministic md5 order (then id as tie-break) — a reproducible
    balanced subset regardless of partitioning, engine, or rerun.
    Emits the kept rows with their ``sample_rank`` (1-based within the
    stratum)."""
    rank_order = [sample_bucket(F.col(id_col), salt), F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), F.col(id_col)]
    w = Window.partitionBy(stratum_col).orderBy(*rank_order)
    return (
        df.select(id_col, stratum_col)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= per_stratum)
    )


def tfidf_top_terms(
    documents: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    idf = ln(N / df) over distinct-doc term frequency; score =
    round(tf · idf, 6); ties break by token text so the top-k set is
    total-order deterministic.

    ONE corpus shuffle, keyed by the document id. The corpus is
    explicitly hash-partitioned on ``id_col`` up front and the MAIN
    path reuses that single partitioning end-to-end: the (doc, token)
    tf aggregate needs no exchange (clustering by doc alone co-locates
    every (doc, token) group) and the top-k window partitions by doc
    and needs no exchange. The df and N subtrees deliberately do NOT
    touch the repartitioned lineage: cross-subtree ReusedExchange does
    not fire across broadcast boundaries (r12 plan audit — each
    subtree re-ran the repartition), so df derives straight from the
    raw scan via an in-row ``array_distinct`` + explode (one
    vocabulary-sized token-keyed exchange, partial-aggregated map-side
    — sublinear in corpus size) and is BROADCAST back onto tf, so
    "the"-grade Zipf skew has no key to pile up on. The
    docs-with-tokens scalar N scans the raw text WITHOUT explode
    ("has ≥1 token" ⇔ "has a non-whitespace char" under the \\s+
    tokenizer — a regex FIND per doc), strictly cheaper than
    re-deriving tf for a COUNT DISTINCT. ``broadcast_vocab=False`` is
    the documented fallback for pathological vocabularies too large to
    broadcast; it reverts to the token-partitioned window and leaves
    the skew to AQE."""
    P = documents.sparkSession.sparkContext.defaultParallelism
    sdocs = documents.repartition(P, F.col(id_col))
    toks = sdocs.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    # "has at least one token" == "has a non-whitespace char": a regex
    # FIND per doc instead of re-running the full split-and-filter
    # tokenizer on the counting scan. From the RAW input, not sdocs: a
    # global count is partition-independent, and the repartition
    # exchange is NOT shared into this subtree in practice (broadcast
    # boundaries defeat cross-subtree exchange reuse — r12 plan audit
    # found the claimed ReusedExchange absent, each subtree re-ran the
    # repartition).
    n_docs = documents.select(
        F.count(F.when(F.col(text_col).rlike(r"\S"), 1))
        .cast("double")
        .alias("n_docs")
    )
    if broadcast_vocab:
        # Document frequency straight from the raw scan: one distinct
        # pass IN-ROW (array_distinct) then explode → one vocab-sized
        # token-keyed exchange. The previous shape derived df from the
        # tf aggregate, which re-ran the scan + doc-id repartition +
        # (doc, token) aggregate inside the broadcast branch (no reuse,
        # see above) — two exchanges and a corpus shuffle for the same
        # vocabulary-sized result.
        dfreq = (
            documents.select(
                F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias(
                    "token"
                )
            )
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        scored_in = tf.join(F.broadcast(dfreq.crossJoin(n_docs)), "token")
    else:
        with_df = tf.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("token"))
        )
        scored_in = with_df.crossJoin(F.broadcast(n_docs))
    scored = scored_in.select(
        id_col,
        "token",
        "tf",
        F.round(
            F.col("tf").cast("double") * F.log(F.col("n_docs") / F.col("df")), 6
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= k)
        .select(id_col, "term_rank", "token", "tf", "score")
    )


def pack_sequences(
    documents: DataFrame,
    seed: str,
    context_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-then-chunk sequence packing: map each document to its
    token span in the epoch's packed training stream.

    The standard GPT-style packing — documents concatenated in epoch
    order, the stream sliced into fixed ``context_len`` windows — is a
    per-shard running sum: a document's ``start_tok`` is the sum of
    the token counts before it, and its first/last training sequence
    is that offset integer-divided by the context length. Emitting the
    span (not materialized sequences) keeps this a metadata pass; the
    actual byte assembly happens in the per-shard writer that consumes
    it.

    Scale shape: everything is per-shard (md5 bucket of seed+id, 256
    shards ≈ 400 GB each at 100 TB) — one exchange on shard, parallel
    window cumsums, no global coordination. A fresh seed re-packs the
    whole corpus differently, which is exactly the per-epoch behavior
    training wants.
    """
    if context_len < 1:
        raise ValueError(f"context_len must be >= 1, got {context_len}")
    from stream_loader_spark.operators.sampling import epoch_shuffle

    toks = documents.select(
        id_col, F.size(tokens_col(F.col(text_col))).alias("n_tokens")
    )
    ordered = epoch_shuffle(toks, seed, id_col=id_col)
    w = (
        Window.partitionBy("shard")
        .orderBy("shuffle_key", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = ordered.withColumn(
        "start_tok", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    )
    # explicit floor (not a double->int cast): offsets are non-negative
    # and floor semantics must match any SQL engine bit-for-bit
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        "start_tok",
        F.floor(F.col("start_tok") / context_len).alias("first_seq"),
        F.floor(
            F.greatest(
                F.col("start_tok"),
                F.col("start_tok") + F.col("n_tokens") - 1,
            )
            / context_len
        ).alias("last_seq"),
    )


def build_training_order(
    documents: DataFrame,
    seed: str,
    context_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """The composed epoch-build pipeline: domain-mix rebalance →
    seeded epoch shuffle → sequence packing, in one declarative plan.

    Stage order is the cost order: the rebalance filter drops rows
    INSIDE the scan before any tokenization, the kept rows are
    tokenized once, and the packing cumsum runs per shard. Total
    shuffles: the tiny per-domain count aggregate (broadcast back) and
    one exchange on shard — nothing else, at any corpus size.
    """
    from stream_loader_spark.operators.sampling import rebalance_domains

    kept = rebalance_domains(
        documents.select(id_col, domain_col, text_col), id_col=id_col, domain_col=domain_col
    )
    return pack_sequences(
        kept.select(id_col, text_col), seed, context_len, text_col, id_col
    )
