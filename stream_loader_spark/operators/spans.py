"""Cross-document repeated n-gram span detection.

The substring-deduplication operator of Lee et al., "Deduplicating
Training Data Makes Language Models Better" (ACL 2022,
arxiv.org/abs/2107.06499), adapted to word-level n-grams: find, for
every document, the merged token spans covered by any n-gram that also
occurs in at least ``min_df`` distinct documents. Downstream pipelines
either drop the spans (ExactSubstr-style) or use the per-document
duplicated-token fraction as a filter signal (RefinedWeb-style).

Beyond-reference surface (no stream-loader equivalent; the reference's
dedup is record-level — see SURVEY §2.5). Pipeline shape:

1. n-gram occurrences ``(doc_id, start, md5(gram))`` via one
   whole-stage-codegen expression (no python-lambda HOFs — see
   ``dedup.shingles_sql`` for the measured py4j-build-cost rationale).
   The 32-hex md5 caps shuffle width per occurrence regardless of n.
2. duplicated grams = hash-aggregate on the digest with a two-phase
   ``count(DISTINCT doc_id)`` — map-side partial on a uniform key, the
   only corpus-sized shuffle.
3. occurrences LEFT SEMI join the duplicated digests (AQE broadcasts
   the duplicated side when small; sort-merge on the uniform digest
   otherwise — never a skewed key).
4. per-document gaps-and-islands merge of overlapping-or-adjacent
   spans: a window partitioned by ``doc_id`` (high-cardinality — task
   parallelism grows with the corpus, the round-1 sessionize lesson).

Grouping by md5 digest instead of the raw gram is exact absent md5
collisions (2^-128-scale; the DuckDB oracle groups by the raw gram
string and the driver hash-verifies equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream_loader_spark.sources.tables import scatter

NGRAM_SIZE = 5
MIN_DF = 2


def _gram_occurrences_sql(text_col: str, n: int) -> str:
    """One SQL expression: array of (start, md5-gram) structs, empty for
    documents shorter than ``n`` tokens. Guarded CASE (not bare
    sequence) because Spark's ``sequence(1, 0)`` counts DOWN."""
    toks = (
        "CASE WHEN length(trim({c})) = 0 THEN CAST(array() AS array<string>) "
        "ELSE split(trim({c}), '\\\\s+') END"
    ).format(c=text_col)
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> struct(i AS start, md5(array_join(slice({toks}, i, {n}), ' ')) AS h)) "
        f"ELSE CAST(array() AS array<struct<start:int,h:string>>) END"
    )


def ngram_occurrences(
    documents: DataFrame,
    n: int = NGRAM_SIZE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, start, h): every word n-gram occurrence, 1-based token
    start position, 32-hex md5 digest of the space-joined gram."""
    return (
        scatter(documents)
        .selectExpr(id_col, f"{_gram_occurrences_sql(text_col, n)} AS grams")
        .select(id_col, F.explode("grams").alias("g"))
        .select(id_col, F.col("g.start").alias("start"), F.col("g.h").alias("h"))
    )


def repeated_ngram_spans(
    documents: DataFrame,
    n: int = NGRAM_SIZE,
    min_df: int = MIN_DF,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Merged token spans covered by cross-document duplicated n-grams.

    Returns one row per maximal span: (doc_id, span_start, span_end,
    span_tokens), token positions 1-based inclusive. Spans from
    overlapping or ADJACENT duplicated grams merge into one island
    (``start <= prev_end + 1``), matching the drop-the-whole-run
    semantics of ExactSubstr deduplication.
    """
    occ = ngram_occurrences(documents, n, text_col, id_col)
    dup = (
        occ.groupBy("h")
        .agg(F.count_distinct(id_col).alias("df"))
        .where(F.col("df") >= min_df)
        .select("h")
    )
    hits = occ.join(dup, "h", "left_semi").select(
        id_col, "start", (F.col("start") + (n - 1)).alias("end")
    )
    w = Window.partitionBy(id_col).orderBy("start")
    prev_max = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = hits.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("start") > prev_max + 1), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("start").cast("int").alias("span_start"),
            F.max("end").cast("int").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def repeated_ngram_doc_stats(
    documents: DataFrame,
    n: int = NGRAM_SIZE,
    min_df: int = MIN_DF,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-token fraction (the RefinedWeb-style
    filter signal): (doc_id, n_tokens, dup_tokens, dup_fraction) for
    EVERY document — zero for documents with no duplicated span. The
    span merge runs first, so overlapping grams never double-count."""
    spans = repeated_ngram_spans(documents, n, min_df, text_col, id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_tokens").cast("int").alias("dup_tokens")
    )
    toks_sql = (
        "CASE WHEN length(trim({c})) = 0 THEN 0 "
        "ELSE size(split(trim({c}), '\\\\s+')) END"
    ).format(c=text_col)
    base = documents.selectExpr(id_col, f"CAST({toks_sql} AS INT) AS n_tokens")
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )
