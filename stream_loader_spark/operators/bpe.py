"""Distributed BPE vocabulary induction (tokenizer training).

Byte-pair encoding's training loop — count adjacent symbol pairs,
merge the most frequent, repeat — re-expressed for Spark:

- **One corpus-sized pass, total.** BPE statistics depend only on the
  distinct-word frequency table (Sennrich et al. 2016 train on word
  counts, not running text), so the corpus is reduced to
  (word, count) up front with a map-side-combinable aggregate; every
  merge iteration then touches vocabulary-scale data (≤ a few million
  rows at ANY corpus size — 100 TB of text changes the counts, not
  the row count of the distinct-word table).
- **Per round**: adjacent pairs come from a posexplode + lead-free
  slice (transform over ``sequence``), weighted by word count, and one
  hash-aggregate finds the best pair; only that single row reaches the
  driver per round. The merge itself is an Arrow-batched pandas UDF
  over the vocab rows (a per-row symbol-array rewrite — interpreted
  higher-order SQL would be no faster and far less readable).
- **Iteration hygiene**: the vocab DataFrame is persisted and
  ``localCheckpoint``-ed each round to cut lineage growth, the same
  discipline as k-means and connected components.

Ties break on (pair_count DESC, left, right) so training is
deterministic — two runs (or two engines) produce identical merge
tables. End-of-word is the explicit ``</w>`` sentinel symbol.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stream_loader_spark.operators.text import tokens_col
from stream_loader_spark.sources.tables import scatter

END_OF_WORD = "</w>"


def word_frequencies(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, n) over the corpus — the single corpus-sized pass."""
    toks = scatter(documents).select(
        F.explode(tokens_col(F.col(text_col))).alias("word")
    )
    return toks.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def _initial_vocab(word_freqs: DataFrame) -> DataFrame:
    # characters + the end-of-word sentinel; drop split()'s trailing ''
    return word_freqs.select(
        "n",
        F.expr(
            "concat(filter(split(word, '(?!^)'), x -> x != ''), "
            f"array('{END_OF_WORD}'))"
        ).alias("symbols"),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    # guard the single-symbol case: sequence(1, 0) is a DESCENDING
    # [1, 0] in Spark, which would index past the array under ANSI
    pairs = F.expr(
        "CASE WHEN size(symbols) < 2 THEN "
        "CAST(array() AS array<struct<left: string, right: string>>) "
        "ELSE transform(sequence(1, size(symbols) - 1), "
        "i -> struct(symbols[i - 1] AS left, symbols[i] AS right)) END"
    )
    return (
        vocab.select("n", F.explode(pairs).alias("p"))
        .groupBy("p.left", "p.right")
        .agg(F.sum("n").alias("pair_count"))
    )


def bpe_train(
    documents: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns [(left, right, count)]
    in merge order. Stops early when no pair reaches
    ``min_pair_count``."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    vocab = _initial_vocab(word_frequencies(documents, text_col)).persist()
    vocab = vocab.localCheckpoint()

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_count"] < min_pair_count:
            break
        a, b, cnt = best[0]["left"], best[0]["right"], best[0]["pair_count"]
        merges.append((a, b, cnt))

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def merge_pair(col: pd.Series) -> pd.Series:
            merged = a + b

            def apply(syms):
                out, i, ln = [], 0, len(syms)
                while i < ln:
                    if i + 1 < ln and syms[i] == a and syms[i + 1] == b:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                return out

            return col.map(apply)

        prev = vocab
        vocab = vocab.select("n", merge_pair("symbols").alias("symbols")).persist()
        vocab = vocab.localCheckpoint()  # cut lineage each round
        prev.unpersist()
    vocab.unpersist()
    return merges


def bpe_segment(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Apply a learned merge table to one word (driver-side helper for
    tests and tokenizer export)."""
    syms = list(word) + [END_OF_WORD]
    for a, b, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    documents: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize a corpus with a trained merge table (the inference half
    of BPE): (id, bpe_tokens, n_bpe_tokens) per document.

    Scale shape: a single Arrow-batched pandas UDF — narrow, no
    shuffle, linear in corpus size. The merge table is vocab-scale
    (a few MB at 32k merges) and ships once per task in the UDF
    closure. Within each Arrow batch, words are memoized: under a
    Zipf distribution the distinct-word count per batch is a small
    fraction of running text, so most words hit the cache instead of
    replaying the merge loop. Token-for-token identical to the
    driver-side ``bpe_segment`` (the per-word cache is keyed on the
    full word, and merges apply in training order both places).
    """
    pairs = [(a, b, 0) for a, b, _ in merges]

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            hit = cache.get(w)
            if hit is None:
                hit = cache[w] = bpe_segment(w, pairs)
            return hit

        # Tokenize EXACTLY like training (tokens_col = Java \s+ split +
        # empty filter). Python str.split()/strip() are Unicode-aware
        # (they split U+00A0 etc.) while Java's \s is ASCII-only — a
        # divergent tokenizer would emit words the merge table never
        # saw, silently breaking the train/encode consistency contract.
        import re

        java_ws = re.compile(r"[ \t\n\x0b\f\r]+")

        def enc(text) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in java_ws.split(text):
                if w:
                    out.extend(enc_word(w))
            return out

        return texts.map(enc)

    return scatter(documents).select(
        F.col(id_col),
        encode(F.col(text_col)).alias("bpe_tokens"),
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens"))
