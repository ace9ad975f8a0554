"""Text-analysis operators for training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting — each a pure
column-expression transform (no UDFs, no shuffle), so they run inside
whole-stage codegen and scale linearly with input size.

All expressions are chosen to be exactly reproducible in ANSI SQL
(DuckDB oracle): deterministic regex splits, integer arithmetic,
stable hash (sha256/md5 hex).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from stream_loader_spark.sources.tables import scatter

# Small per-language stopword lists (public knowledge). Kept tiny and
# frozen: they are part of the deterministic operator contract.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "y"],
}
LANGS = tuple(sorted(STOPWORDS))  # de, en, es, fr — fixed tie-break order

PUNCT_CLASS = r"[.,!?;:]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization: split on \\s+ and DROP empty tokens.

    The filter (not a trim) is what makes the edges correct: Spark's
    ``trim`` strips only spaces (0x20), so text with leading/trailing
    newlines or tabs produced phantom '' tokens that inflated every
    count downstream (quality ratios, word frequencies, BPE training,
    frequent tokens). Splitting first and filtering '' handles every
    whitespace class and makes empty/all-whitespace text → [] fall out
    naturally. NULL text stays NULL."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))



def tokens_sql(text_col: str) -> str:
    """SQL-string twin of ``tokens_col`` (same trim + \\s+ split, empty
    text → empty array), for operators that assemble expression strings
    (hot query builders avoid python-lambda HOF construction cost).
    ONE definition — the double-backslash escaping subtlety (Spark SQL
    unescapes string literals, so the parser must SEE \\\\s to yield
    the regex \\s+) previously lived copy-pasted in three modules."""
    # the parser unescapes string literals, so it must SEE \\\\s to
    # yield the regex \\s+; x != '' drops the edge artifacts (see
    # tokens_col — trim() strips only 0x20)
    return "filter(split({c}, '\\\\s+'), x -> x != '')".format(c=text_col)


def doc_term_counts(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-(document, n-gram) counts WITHOUT a corpus shuffle.

    The usual shape — explode the grams, groupBy(doc, token) — ships
    every gram occurrence through a corpus-wide exchange just to count
    duplicates that all live INSIDE one document row. The grouping key
    contains the doc id, so the aggregate never crosses rows: a per-row
    run-length histogram (sort the gram array, find run starts, emit
    (gram, run length)) is exactly equivalent and embarrassingly
    parallel — the retrieval family's term-count block becomes a narrow
    codegen'd map over the scan, and the first shuffle any consumer
    pays is its own (vocab- or doc-sized, partial-aggregated).

    Output: (id_col, *extra_cols, token string, tc bigint), one row per
    distinct gram per document — identical to the groupBy shape, so
    every downstream contract (df bands, idf, BM25 rationals) is
    unchanged. try_element_at guards the i−1 lookback at i=1 (OR does
    not short-circuit in Spark SQL, and element_at(_, 0) throws).
    Documents with fewer than ``n`` tokens emit no rows, matching the
    explode shape.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = documents.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        tokens_col(F.col(text_col)).alias("toks"),
    ).where(F.size("toks") >= n)
    grams = (
        "toks"
        if n == 1
        else (
            f"transform(sequence(1, size(toks) - {n} + 1),"
            f" i -> array_join(slice(toks, i, {n}), ' '))"
        )
    )
    return runlength_explode(
        toks.select(
            id_col, *extra_cols, F.expr(f"array_sort({grams})").alias("s")
        ),
        (id_col, *extra_cols),
    )


def runlength_explode(
    df: DataFrame, key_cols: tuple[str, ...], value_name: str = "token"
) -> DataFrame:
    """Explode a SORTED array column ``s`` into (value, run length) rows
    — the in-row equivalent of groupBy(keys, element).count() when the
    grouping keys make every group live inside one row. Rows with an
    empty ``s`` emit nothing (same as the explode+groupBy shape).
    try_element_at guards the lookback at i=1 and the lookahead at the
    last run (OR does not short-circuit in Spark SQL, and
    element_at(_, 0) throws).

    The empty-array guard is a CASE inside the ``starts`` expression,
    NOT a ``where``: predicate pushdown substitutes the caller's
    ``s``-defining alias into a Filter operator, and Filter cannot
    share subexpressions with the Project above it — a ``where(size(s)
    >= 1)`` re-evaluated the whole gram-build+sort per row just for
    the size check (measured 1.0 -> 5.0s on inverted_postings at
    sf0.1). ``sequence(1, 0)`` counts DOWN, hence the guard at all."""
    return (
        df.select(
            *key_cols,
            "s",
            F.expr(
                "CASE WHEN size(s) < 1 THEN array() ELSE"
                " filter(sequence(1, size(s)),"
                " i -> i = 1 OR try_element_at(s, i) != try_element_at(s, i - 1))"
                " END"
            ).alias("starts"),
        )
        .select(
            *key_cols,
            F.explode(
                F.expr(
                    f"transform(starts, (st, k) -> struct("
                    f"element_at(s, st) AS {value_name},"
                    " CAST(coalesce(try_element_at(starts, k + 2), size(s) + 1)"
                    " - st AS BIGINT) AS tc))"
                )
            ).alias("z"),
        )
        .select(*key_cols, f"z.{value_name}", "z.tc")
    )


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercased, whitespace-collapsed."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def stopword_hits(tokens: Column, words: list[str]) -> Column:
    """Count of tokens contained in a fixed word list (higher-order
    filter over the token array — no explode, no shuffle)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def with_text_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count, char counts, ratios, and a quality score per doc.

    The quality score is a deterministic arithmetic blend of length,
    mean token length, stopword ratio, and punctuation ratio — the
    standard cheap heuristics used to pre-filter web text.
    """
    df = scatter(documents).withColumn("tokens", tokens_col(F.col(text_col)))
    df = df.withColumn("token_count", F.size("tokens"))
    df = df.withColumn("char_count", F.length(F.col(text_col)))
    df = df.withColumn(
        "punct_count", F.size(F.split(F.col(text_col), PUNCT_CLASS)) - F.lit(1)
    )
    df = df.withColumn("stop_hits", stopword_hits(F.col("tokens"), STOPWORDS["en"]))
    df = df.withColumn(
        "avg_token_len",
        F.when(F.col("token_count") > 0,
               (F.col("char_count") - F.col("token_count") + 1) / F.col("token_count"))
        .otherwise(F.lit(0.0)),
    )
    df = df.withColumn(
        "stopword_ratio",
        F.when(F.col("token_count") > 0, F.col("stop_hits") / F.col("token_count"))
        .otherwise(F.lit(0.0)),
    )
    df = df.withColumn(
        "punct_ratio",
        F.when(F.col("char_count") > 0, F.col("punct_count") / F.col("char_count"))
        .otherwise(F.lit(0.0)),
    )
    df = df.withColumn(
        "quality_score",
        (
            F.least(F.col("token_count") / F.lit(100.0), F.lit(1.0)) * 0.4
            + F.least(F.col("stopword_ratio") * F.lit(5.0), F.lit(1.0)) * 0.3
            + F.when((F.col("avg_token_len") >= 3) & (F.col("avg_token_len") <= 10), 0.3)
            .otherwise(F.lit(0.0))
        ),
    )
    return df.drop("tokens", "stop_hits")


def with_lang_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits.

    Ties break in fixed language order (de < en < es < fr by name, with
    'und' = no hits at all). Purely column expressions → codegen.
    """
    df = scatter(documents).withColumn("tokens", tokens_col(F.col(text_col)))
    for lang in LANGS:
        df = df.withColumn(f"hits_{lang}", stopword_hits(F.col("tokens"), STOPWORDS[lang]))
    best = F.greatest(*[F.col(f"hits_{l}") for l in LANGS])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANGS:
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    df = df.withColumn("pred_lang", pred)
    return df.drop("tokens", *[f"hits_{l}" for l in LANGS])


def repetition_stats(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition metrics per document: type-token ratio and the share
    of the single most frequent token — the standard cheap detectors
    for degenerate/boilerplate text in corpus cleaning.

    explode → two hash-aggregates (map-side combine carries one row per
    (doc, token) then one per doc); empty docs have no tokens and are
    excluded, mirroring the SQL oracle's WHERE clause. Both aggregates
    cluster on a superset of the doc id, so the hash-scatter IS their
    exchange — the exploded token rows never shuffle.
    """
    toks = scatter(documents, by=(id_col,)).select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    per_tok = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_tok.groupBy(id_col)
        .agg(
            F.sum("cnt").alias("token_count"),
            F.count(F.lit(1)).alias("distinct_tokens"),
            F.max("cnt").alias("top_token_count"),
        )
        .select(
            id_col,
            "token_count",
            "distinct_tokens",
            (F.col("distinct_tokens") / F.col("token_count")).alias("type_token_ratio"),
            (F.col("top_token_count") / F.col("token_count")).alias("top_token_share"),
        )
    )


def unigram_logprob(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Mean unigram log-likelihood per document under the corpus's own
    unigram distribution — the cheap LM-based quality filter (docs with
    very unlikely token mixes are noise/garble candidates).

    Two aggregates over one explode: corpus token frequencies, then a
    frequency join back to the tokens. Per-token logprobs are rounded
    to 6 decimals and summed as exact decimals so the result is
    independent of float summation order (cross-engine stable); every
    token exists in the corpus by construction, so there is no OOV
    branch.

    The frequency join is BROADCAST by default: its key is a unigram
    token — the most Zipf-skewed key there is — so a shuffle join hangs
    every occurrence of "the" on one partition at 100 TB, while the
    vocabulary side (distinct words, sublinear in corpus size) fits an
    executor for any natural-language corpus. ``broadcast_vocab=False``
    is the documented fallback for pathological vocabularies (e.g.
    random-token corpora where distinct ≈ total): it reverts to the
    shuffle join and leaves the skew to AQE.
    """
    # Tokenize ONCE, count IN-ROW: the per-(doc, token) block is built
    # by doc_term_counts' run-length histogram — no corpus-wide
    # (doc, token) exchange at all (the grouping key contains the doc
    # id, so the old groupBy never crossed rows; the shuffle it paid
    # bought nothing). extra_cols ride along — callers pass columns
    # functionally dependent on the id (e.g. lang), saving a join back
    # against the source table.
    # The vocabulary branch and the scoring branch derive dtc
    # INDEPENDENTLY (two tokenize passes) and only the VOCAB-sized
    # frequency table is checkpointed — not the corpus-sized per-(doc,
    # token) block the previous shape materialized. Measured (r12
    # interleaved A/B at sf0.1, bit-identical output): min 1.86→1.50 s.
    # Why it also wins at scale: (a) nothing corpus-sized is written to
    # checkpoint storage; (b) the scoring branch hash-scatters on the
    # doc id and stays a NARROW pipeline end-to-end, so the final
    # per-doc aggregate reuses that exchange — the scored token rows
    # never shuffle (a localCheckpoint here would drop the partitioning
    # and re-add the exchange; see scatter()). The vocab branch keeps
    # the plain scatter: it re-keys on token immediately.
    dtc = doc_term_counts(
        scatter(documents, by=(id_col,)), text_col, id_col, 1, extra_cols
    )
    dtc_vocab = doc_term_counts(
        scatter(documents), text_col, id_col, 1, extra_cols
    )
    freq = dtc_vocab.groupBy("token").agg(F.sum("tc").alias("c"))
    if broadcast_vocab:
        # Fold the corpus total into the vocabulary table with an
        # unpartitioned window BEFORE broadcasting: the vocab must fit
        # in memory on this path anyway, and a separate totals
        # aggregate re-reads the whole freq subtree (no exchange reuse
        # across the broadcast boundary) plus costs a crossJoin stage.
        # Checkpointed EAGERLY so the one corpus pass it costs runs
        # exactly once (broadcast builds do not dedupe subtrees).
        freq = F.broadcast(
            freq.withColumn("n", F.sum("c").over(Window.partitionBy()))
            .localCheckpoint(eager=True)
        )
        scored_in = dtc.join(freq, "token")
    else:
        # shuffle-join fallback for pathological vocabularies: keep the
        # scalar-singleton total (a single-partition window over a
        # vocab that was too big to broadcast would be a new choke).
        freq = freq.localCheckpoint(eager=True)
        total = freq.agg(F.sum("c").alias("n"))
        scored_in = dtc.join(freq, "token").crossJoin(F.broadcast(total))
    scored = (
        scored_in
        .select(
            id_col,
            *extra_cols,
            "tc",
            F.round(F.log(F.col("c").cast("double") / F.col("n")), 6)
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    # lp·tc in exact decimal == summing lp once per occurrence
    return scored.groupBy(id_col, *extra_cols).agg(
        F.sum("tc").alias("n_tokens"),
        (
            F.sum(F.col("lp") * F.col("tc")).cast("decimal(38,6)").cast("double")
            / F.sum("tc")
        ).alias("mean_logprob"),
    )


# Conservative patterns shared verbatim by Java regex and RE2 (no
# lookarounds, no backrefs): emails and long digit-ish runs.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"[0-9][0-9 ()\-]{7,}[0-9]"


def redact_pii(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Count and redact email/phone-shaped spans; emits per-doc match
    counts and a fingerprint of the REDACTED text (the redacted content
    itself stays internal — downstream writers take it from the
    operator, hashes verify it).

    Phone matches are counted on the EMAIL-REDACTED text, because that
    is the text the phone replacement actually runs against — a digit
    run inside an email address must not count as a phone it never
    redacts, so ``n_phones`` equals the number of ``<PHONE>``
    substitutions in the fingerprinted output."""
    emails = F.size(F.regexp_extract_all(text_col, F.lit(PII_EMAIL), F.lit(0)))
    email_redacted = F.regexp_replace(F.col(text_col), PII_EMAIL, "<EMAIL>")
    redacted = F.regexp_replace(email_redacted, PII_PHONE, "<PHONE>")
    phones = F.size(F.regexp_extract_all(email_redacted, F.lit(PII_PHONE), F.lit(0)))
    return documents.select(
        F.col(id_col),
        emails.alias("n_emails"),
        phones.alias("n_phones"),
        F.sha2(redacted, 256).alias("redacted_fingerprint"),
    )


def with_fingerprint(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Stable document fingerprint: sha256 of the normalized text.

    No scatter: one sha256 per row is lighter than the repartition
    shuffle would cost — scatter only pays off for CPU-heavy per-row
    work (shingling, signatures), not single-hash projections.
    """
    return documents.withColumn(
        "fingerprint", F.sha2(normalized_text(F.col(text_col)), 256)
    )


def with_gopher_flags(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style heuristic quality rules (Rae et al. 2021, public)
    per document: word-count bounds, mean word length bounds,
    symbol-to-word ratio, alphabetic-word fraction, and a stopword
    floor, plus the conjunction ``keep``.

    Unlike ``with_text_stats`` (a blended score), this emits the
    individual rule verdicts — the form corpus pipelines actually act
    on, because per-rule rejection rates are how thresholds get tuned.

    Pure column expressions over the token array (higher-order
    ``aggregate``/``filter``, no explode, no shuffle): one codegen'd
    scan pass, linear at any corpus size. All ratios are exact integer
    counts divided once at the end — bit-stable across engines and
    partitionings.
    """
    toks = tokens_col(F.col(text_col))
    df = documents.select(
        F.col(id_col),
        F.size(toks).alias("word_count"),
        # exact sum of token lengths (NOT the char-count approximation)
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)).alias(
            "_len_sum"
        ),
        # '#' occurrences + '...' occurrences (Gopher's symbol set)
        (
            F.length(F.col(text_col))
            - F.length(F.replace(F.col(text_col), F.lit("#"), F.lit("")))
            + (
                F.length(F.col(text_col))
                - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
            )
            / F.lit(3)
        ).cast("double").alias("_symbols"),
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).alias("_alpha_words"),
        stopword_hits(toks, STOPWORDS["en"]).alias("stop_hits"),
    )
    wc = F.col("word_count")
    nonempty = wc > 0
    df = df.select(
        id_col,
        "word_count",
        F.when(nonempty, F.col("_len_sum") / wc).otherwise(F.lit(0.0)).alias("mean_word_len"),
        F.when(nonempty, F.col("_symbols") / wc).otherwise(F.lit(0.0)).alias("symbol_word_ratio"),
        F.when(nonempty, F.col("_alpha_words") / wc).otherwise(F.lit(0.0)).alias(
            "alpha_word_ratio"
        ),
        "stop_hits",
    )
    flags = {
        "flag_word_count": (wc >= min_words) & (wc <= max_words),
        "flag_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "flag_symbol_ratio": F.col("symbol_word_ratio") <= max_symbol_ratio,
        "flag_alpha_ratio": F.col("alpha_word_ratio") >= min_alpha_ratio,
        "flag_stopwords": F.col("stop_hits") >= min_stop_hits,
    }
    keep = F.lit(True)
    for name, expr in flags.items():
        df = df.withColumn(name, expr)
        keep = keep & F.col(name)
    return df.withColumn("keep", keep)


def approx_frequent_tokens(
    documents: DataFrame,
    min_count: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    capacity: int = 4096,
) -> DataFrame:
    """EXACT corpus-wide frequent tokens (count ≥ ``min_count``) via a
    bounded-memory two-phase plan.

    The naive ``explode → groupBy(token) → HAVING`` shuffles one row
    per distinct token per map task — at 100 TB of web text the
    long-tail vocabulary (typos, ids, urls) makes that shuffle, and
    each map task's aggregation hash table, vocabulary-sized. This
    operator bounds both:

    1. **Candidate phase** — per-partition Misra-Gries summaries
       (``capacity`` counters, maintained across Arrow batches in one
       ``mapInPandas`` pass). MG guarantees every token whose LOCAL
       count exceeds n_p/capacity survives partition p, so summing the
       bound over partitions: any token with GLOBAL count >
       N/capacity is in the candidate union. With
       ``min_count > N/capacity`` the union is a guaranteed superset
       of the answer — no false negatives (the operator raises if the
       observed N breaks that precondition rather than silently
       dropping tokens).
    2. **Recount phase** — a second scan recounts ONLY candidate
       tokens (broadcast hash semi-join; ≤ partitions×capacity rows)
       and applies the exact ``HAVING count ≥ min_count`` filter, so
       false candidates are eliminated and the result is exact.

    **No-eviction fast path**: when NO partition ever evicted (its
    vocabulary fit in ``capacity``), every MG counter is an exact
    local count — the summaries already hold the full answer, and
    the recount scan (a second tokenize of the whole corpus) is
    skipped for a cheap sum over the materialized summaries. Each
    partition reports an ``evicted`` flag; the driver reads it with
    the guard total it already fetches. At 100 TB web-scale the
    vocabulary always overflows capacity and the recount path runs —
    the fast path is for bounded-vocabulary corpora (labels, enums,
    small fixtures), where it removes the second corpus pass
    entirely. Both paths produce identical exact results.

    Shuffle/memory cost is O(partitions × capacity), independent of
    vocabulary size. Python is justified here: Spark has no
    bounded-memory frequent-items aggregate, and the MG loop is a
    per-partition stream algorithm — Arrow-batched, not per-row UDF.
    """
    toks = scatter(documents).select(
        F.explode(tokens_col(F.col(text_col))).alias("token")
    )

    def mg_partition(batches):
        import numpy as np
        import pandas as pd

        # Weighted bulk Misra-Gries: each Arrow batch is pre-reduced
        # with a vectorized value_counts (C speed), then merged as
        # (token, weight) updates — the per-token Python loop this
        # replaces was the operator's wall-clock hot spot. Eviction is
        # the bulk form: with size s > capacity, subtract the
        # (s-capacity)-th smallest count m from everyone and drop the
        # non-positive. Since m is the (s-capacity)-th smallest, at
        # least capacity+1 counters lose ≥ m each, so every evict
        # round removes ≥ (capacity+1)·m mass — total per-token
        # underestimate stays ≤ n_p/(capacity+1), the classic MG
        # bound, and the n_p/capacity superset guard below remains
        # valid (it is strictly weaker).
        counters: dict[str, int] = {}
        seen = 0
        evicted = False
        for pdf in batches:
            vc = pdf["token"].value_counts()
            seen += int(vc.sum())
            get = counters.get
            for tok, w in vc.items():
                counters[tok] = get(tok, 0) + int(w)
            excess = len(counters) - capacity
            if excess > 0:
                evicted = True
                vals = np.fromiter(
                    counters.values(), dtype=np.int64, count=len(counters)
                )
                m = int(np.partition(vals, excess - 1)[excess - 1])
                counters = {t: c - m for t, c in counters.items() if c > m}
        # one NULL-token row per partition carries n_p (the partition's
        # exact token total): the join below drops it from candidates,
        # while SUM over the NULL rows reconstructs the corpus total N
        # for the no-false-negative precondition check. Token rows
        # carry their counter value — an exact local count unless this
        # partition evicted (the flag rides on every row).
        yield pd.DataFrame(
            {
                "token": list(counters.keys()) + [None],
                "n_local": list(counters.values()) + [seen],
                "evicted": [evicted] * (len(counters) + 1),
            }
        )

    # Materialize the MG pass ONCE: the summary feeds both the guard
    # total and the candidate set, and mapInPandas subtrees are not
    # deduplicated by exchange reuse — without materialization the most
    # expensive phase would run twice. localCheckpoint (not persist):
    # checkpointed blocks are auto-released by the ContextCleaner when
    # the result DataFrame is garbage-collected, while a persist here
    # had no owner to unpersist it and leaked one O(partitions ×
    # capacity) cached relation per call for the session's life.
    cand = toks.mapInPandas(
        mg_partition, "token string, n_local bigint, evicted boolean"
    ).localCheckpoint(eager=False)
    # Enforce the superset guarantee EAGERLY on the 1-row total — not
    # as a predicate on the result rows, where an empty result (the
    # exact regime eviction causes) would mean the guard is evaluated
    # zero times and an incomplete answer escapes silently. The same
    # cheap pass over the materialized summaries reads the eviction
    # flag that picks the counting path.
    row = (
        cand.where(F.col("token").isNull())
        .agg(F.sum("n_local").alias("n"), F.max("evicted").alias("evicted"))
        .first()
    )
    corpus_n = int(row["n"] or 0)
    if corpus_n >= min_count * capacity:
        raise ValueError(
            f"approx_frequent_tokens: min_count={min_count} <= N/capacity "
            f"(capacity={capacity}, N={corpus_n}) voids the no-false-negative "
            f"guarantee - raise capacity or min_count"
        )
    if not row["evicted"]:
        # every partition's counters are exact and complete: the
        # answer is a sum over the (partitions × vocab)-sized summary
        # — no second corpus scan
        return (
            cand.where(F.col("token").isNotNull())
            .groupBy("token")
            .agg(F.sum("n_local").alias("n"))
            .where(F.col("n") >= F.lit(min_count))
            .select("token", "n")
        )
    candidates = cand.where(F.col("token").isNotNull()).select("token").distinct()
    return (
        toks.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= F.lit(min_count))
        .select("token", "n")
    )


def hashed_linear_quality(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Model-scored quality gate: a hashed-feature linear classifier
    over tokens — the shape of the fasttext-style filters production
    corpus pipelines apply after heuristic cleaning.

    Every token hashes to one of 256 md5 buckets; each bucket carries a
    deterministic integer milli-weight in [-500, 500] (a stand-in for
    trained weights — swap in a real table via the same broadcast-map
    shape); a document's logit is the exact integer SUM of its token
    weights and ``keep`` is ``logit_milli > 0``. Integer arithmetic
    end-to-end: the score is reproducible bit-for-bit on any engine and
    any partitioning (float sums would drift with reduction order).

    Scale (r13): the whole score is ONE in-row ``aggregate`` fold over
    the token array — a pure projection over the scan, ZERO exchanges,
    one corpus pass (same lesson as ``with_minhash``). The previous
    explode + per-doc hash aggregate + zero-token left join paid a raw-
    row exchange and a SECOND corpus scan just to re-attach keep=false
    for token-less documents; the fold scores every document in place
    (empty/NULL text folds to logit 0 → keep false, identical rows).
    Integer addition is order-independent, so the fold equals the
    aggregate bit-for-bit.
    """
    w = (
        "(CAST(conv(substring(md5(t), 1, 2), 16, 10) AS BIGINT)"
        " * 2654435761L) % 1001L - 500L"
    )
    toks = f"coalesce({tokens_sql(text_col)}, array())"
    return (
        scatter(documents)
        .selectExpr(id_col, f"{toks} AS _toks")
        .selectExpr(
            id_col,
            "CAST(size(_toks) AS BIGINT) AS n_tokens",
            f"aggregate(_toks, 0L, (acc, t) -> acc + ({w})) AS logit_milli",
        )
        .select(
            id_col,
            "n_tokens",
            "logit_milli",
            (F.col("logit_milli") > 0).alias("keep"),
        )
    )


def perplexity_buckets(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): label each
    document head / middle / tail by where its LM score falls within its
    LANGUAGE's score distribution — the standard quality stratification
    before mixing web data into a training set.

    The LM is the corpus's own unigram distribution (``unigram_logprob``
    — CCNet uses a pretrained 5-gram model; the bucketing machinery is
    identical and the score function is pluggable). ``ppl`` is the
    negated mean log-likelihood, so higher = more surprising = worse,
    and head = lowest third, matching CCNet's orientation.

    Tercile cutpoints are EXACT discrete quantiles computed without a
    global sort: a RANGE-framed windowed count per language (ties
    included, so it equals the value-level cumulative histogram), then
    ``cut_q = MIN(score WHERE cum >= q * total)`` — percentile_disc
    semantics, reproducible bit-for-bit by the SQL oracle (both engines
    compare the same IEEE doubles). At 100 TB the per-language window
    is the one non-linear stage; if documents per language ever strain
    a partition, swap the cutpoint estimate for the KLL sketch
    (``operators/sketches.py``) and keep the bucketing join unchanged.

    The per-document score table feeds two consumers (the histogram and
    the final bucketing join), so it is ``localCheckpoint``-ed: the
    block is three narrow columns PER DOCUMENT — the unavoidable state
    of any two-pass quantile algorithm, far smaller than re-running the
    token-scaled scoring pipeline twice, and auto-released by the
    ContextCleaner when the result goes out of scope.

    Documents with zero tokens have no LM score and are excluded (the
    oracle's joins mirror this); languages absent from the corpus can't
    occur by construction since cutpoints derive from the same rows.
    """
    scored = (
        unigram_logprob(documents, text_col, id_col, extra_cols=(lang_col,))
        .select(id_col, lang_col, (-F.col("mean_logprob")).alias("ppl"))
        .localCheckpoint(eager=False)
    )
    # RANGE frame ending at currentRow includes ties, so the windowed
    # count over the per-document rows IS the value-level cumulative
    # histogram — no separate (lang, ppl) aggregate shuffle needed.
    w_cum = (
        Window.partitionBy(lang_col)
        .orderBy("ppl")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(lang_col)
    cum = scored.select(
        lang_col,
        "ppl",
        F.count(F.lit(1)).over(w_cum).alias("cum"),
        F.count(F.lit(1)).over(w_tot).alias("tot"),
    )
    cuts = cum.groupBy(lang_col).agg(
        F.min(F.when(F.col("cum") >= F.col("tot") / F.lit(3.0), F.col("ppl"))).alias(
            "cut1"
        ),
        F.min(
            F.when(F.col("cum") >= (F.col("tot") * 2) / F.lit(3.0), F.col("ppl"))
        ).alias("cut2"),
    )
    return scored.join(F.broadcast(cuts), lang_col).select(
        id_col,
        lang_col,
        F.when(F.col("ppl") <= F.col("cut1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("cut2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )


def bigram_logprob(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Mean smoothed bigram log-likelihood per document under the
    corpus's own bigram distribution — the next step up from
    ``unigram_logprob`` as an LM-based quality signal (it catches
    word-salad documents whose unigram mix looks fine but whose local
    order is noise).

    Per bigram (prev, cur): p = (c(prev,cur) + 1) / (cf(prev) + V)
    with cf(prev) = occurrences of prev as a non-final token and
    V = the corpus's distinct CONTINUATION vocabulary (distinct ``cur``
    tokens) — the add-one denominator derivable from the bigram table
    itself, so the corpus is tokenized exactly once. Per-bigram logs
    round to 6 decimals and sum as exact decimals (float-order
    independent, cross-engine stable). Docs with < 2 tokens emit no
    row.

    Scale shape: bigrams are built IN-ROW with ``zip_with`` over two
    array slices — never a positional self-join. The exploded (doc,
    prev, cur) block is localCheckpoint-ed EAGERLY (lazy checkpoints
    raced this block's two consumers into double materialization —
    measured ~4× this plan's cost), so the corpus is scanned and
    tokenized exactly once; the model derives from those blocks with
    one vocab-scale aggregate, cf folding in as a prev-keyed window
    over the |bigram types|-row table and the continuation-vocabulary
    V as a broadcast SCALAR aggregate over the checkpointed blocks —
    never an unpartitioned window, whose collect_set would drag the
    whole type table to one partition (no second corpus pass either
    way). Scoring is then a broadcast hash join over the
    same blocks plus ONE map-side-combinable per-doc shuffle. The
    per-doc-bigram block is the same corpus-sized state note as
    ``unigram_logprob``'s dtc; ``broadcast_vocab=False`` is the
    shuffle-join fallback documented there. No ``scatter`` here: the
    in-row gram build is cheap enough that parallelism from the input
    splits suffices (at production split counts scatter is a no-op,
    and locally its repartition exchange costs more than the explode
    it parallelizes — measured).
    """
    toks = documents.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("toks")
    )
    bg = (
        toks.where(F.size("toks") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "zip_with(slice(toks, 1, size(toks) - 1),"
                    " slice(toks, 2, size(toks) - 1),"
                    " (a, b) -> struct(a AS prev, b AS cur))"
                )
            ).alias("z"),
        )
        .select(id_col, "z.prev", "z.cur")
        .localCheckpoint(eager=True)
    )
    freq = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c"))
    # continuation vocabulary |distinct cur| as a broadcast SCALAR
    # aggregate — NOT a collect_set over an unpartitioned window, which
    # would move the whole bigram-type table to one partition and hold
    # the full distinct-cur set in one task's memory (the
    # single-partition bottleneck at corpus scale). freq is deliberately
    # NOT checkpointed even though two consumers derive from it: both
    # recompute it from bg's PINNED blocks with a map-side-combinable
    # groupBy (vocab-scale shuffle bytes), which measured cheaper than
    # a checkpoint write+read of the type table — and at scale an extra
    # combiner shuffle beats serializing the vocabulary through one task
    vocab = freq.agg(F.count_distinct("cur").alias("v"))
    model = freq.select(
        "prev",
        "cur",
        "c",
        F.sum("c").over(Window.partitionBy("prev")).alias("cf"),
    ).crossJoin(F.broadcast(vocab))
    if broadcast_vocab:
        model = F.broadcast(model)
    scored = bg.join(model, ["prev", "cur"]).select(
        id_col,
        F.round(F.log((F.col("c") + F.lit(1.0)) / (F.col("cf") + F.col("v"))), 6)
        .cast("decimal(18,6)")
        .alias("lp"),
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum(F.col("lp")).cast("decimal(38,6)").cast("double")
            / F.count(F.lit(1))
        ).alias("mean_logprob"),
    )


def inverted_postings(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    min_df: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """Inverted-index construction: per n-gram term, its document
    frequency, total term frequency, and the posting list (ascending
    doc ids, comma-joined) — the retrieval-side artifact a corpus
    store builds next to its training shards. ``n=1`` indexes single
    tokens; the default phrase index (n=2) is what selective lookup
    queries actually hit.

    The df band [min_df, max_df] is the scale contract: terms above
    ``max_df`` (stopword-band — their posting lists grow with the
    corpus and answer no selective query) and below ``min_df`` are
    dropped BEFORE any list is materialized. Two phases over one
    per-(doc, term) count block: the df aggregate picks surviving
    terms, and only their rows flow into the collect. Posting lists
    are therefore bounded at ``max_df`` entries by construction — the
    collect_list can never see an unbounded group. Grams are built
    IN-ROW (one transform over the token array), never a positional
    self-join; the per-(doc, term) count block is localCheckpoint-ed
    EAGERLY so the corpus is tokenized and aggregated exactly once
    across the df pass and the posting collect (the same
    single-derivation rule as ``bigram_logprob``, and no ``scatter``
    for the same measured reason).
    """
    # in-row histogram, no corpus shuffle (see doc_term_counts) —
    # the checkpoint build is now a narrow map over the scan
    dtc = doc_term_counts(documents, text_col, id_col, n).localCheckpoint(
        eager=True
    )
    keep = (
        dtc.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tc").alias("tf"))
        .where((F.col("df") >= min_df) & (F.col("df") <= max_df))
    )
    return (
        dtc.join(F.broadcast(keep), "token")
        .groupBy("token", "df", "tf")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.col(id_col).cast("bigint"))),
                    lambda d: d.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
        .select("token", "df", "tf", "postings")
    )


def collocations_pmi(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Collocation mining: top-k bigrams by pointwise mutual
    information — the vocabulary-curation pass that finds multi-word
    units ("new york") worth single tokens before tokenizer training.

    PMI = ln(c(a,b)·N / (cl(a)·cr(b))) over the corpus bigram table,
    with cl/cr the left/right marginals and N the total bigram count —
    every input derives from ONE corpus aggregate (LAZY-checkpointed,
    two consumers), the marginals fold in as KEYED windows over the
    vocab-scale bigram table and N as a broadcast scalar aggregate (no
    second corpus pass, no unpartitioned window). The lazy shared
    checkpoint does not GUARANTEE single materialization: if AQE
    schedules the broadcast-N stage and the window shuffle stage
    concurrently before first materialization, partitions can compute
    twice — but because the checkpoint RDD is shared, the worst case
    is duplicated partition compute of the vocab-scale bigram table,
    never the full double corpus scan of a two-broadcast race.
    ``min_count`` kills the PMI-loves-rare-pairs
    pathology before ranking. PMI rounds to 6 decimals; top-k
    tie-breaks on the gram itself, so the ranking is total and
    engine-independent. Top-k compiles to TakeOrderedAndProject —
    never a global sort.
    """
    toks = documents.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("toks")
    )
    bg = (
        toks.where(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(toks, 1, size(toks) - 1),"
                    " slice(toks, 2, size(toks) - 1),"
                    " (a, b) -> struct(a AS prev, b AS cur))"
                )
            ).alias("z")
        )
        .select("z.prev", "z.cur")
    )
    # two consumers of the bigram-type table (scalar N, keyed
    # marginals): checkpoint it EAGERLY. A lazy checkpoint here can
    # still double-compute partitions if AQE schedules the broadcast-N
    # build and the window shuffle concurrently before first
    # materialization; the eager write is vocab-scale (|bigram types|
    # rows, not corpus-sized), so paying it once closes the race for
    # good — the corpus tokenize+aggregate runs exactly once.
    freq = (
        bg.groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    # N as a broadcast SCALAR aggregate, not SUM OVER () — the
    # unpartitioned window serializes the whole bigram-type table
    # through one partition (same fix as bigram_logprob's V)
    tot = freq.agg(F.sum("c").alias("n"))
    marged = freq.select(
        "prev",
        "cur",
        "c",
        F.sum("c").over(Window.partitionBy("prev")).alias("cl"),
        F.sum("c").over(Window.partitionBy("cur")).alias("cr"),
    ).crossJoin(F.broadcast(tot))
    return (
        marged.where(F.col("c") >= min_count)
        .select(
            "prev",
            "cur",
            "c",
            # cast each factor to double BEFORE multiplying: c·n and
            # cl·cr as bigint products silently wrap past 2^63 with
            # ANSI off (stopword-bigram marginals get there long before
            # 100 TB), corrupting PMI with no error; double·double
            # saturates gracefully and the oracle mirrors the same cast
            # order so fixture-scale values stay bit-identical
            F.round(
                F.log(
                    (F.col("c").cast("double") * F.col("n").cast("double"))
                    / (F.col("cl").cast("double") * F.col("cr").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "prev", "cur")
        .limit(top_k)
    )


def bm25_postings(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    min_df: int = 2,
    max_df: int = 50,
    k1_x10: int = 12,
    b_x100: int = 75,
) -> DataFrame:
    """BM25 term weights for the df-banded inverted index — the scoring
    layer over ``inverted_postings`` that turns it into a usable
    retrieval artifact. One (doc, term, weight) row per posting.

    The tf normalization is an EXACT integer rational: with
    k1 = k1_x10/10 and b = b_x100/100,

        tf_norm = tc·(k1+1) / (tc + k1·(1 − b) + k1·b·dl·N/DL)

    multiplies through by 1000·DL to bigint numerator
    ``100·(k1_x10+10)·tc·DL`` and denominator
    ``1000·DL·tc + k1_x10·(100−b_x100)·DL + k1_x10·b_x100·dl·N``, so
    the only float steps are one double division, the idf log (rounded
    to 6 decimals first — same ln-parity contract as
    ``unigram_logprob``), their product, and a final 6-decimal round:
    a composition both engines evaluate on bit-identical inputs.
    dl = the doc's term count, DL = Σdl, N = docs with ≥1 term; idf =
    ln(1 + (N − df + ½)/(df + ½)). Bigint-exact while DL·tc < ~9·10^15;
    past that the same expressions move to DECIMAL(38,0) unchanged.

    Scale shape: exactly ``inverted_postings``'s two phases over one
    eager-checkpointed per-(doc, term) block, plus a doc-length
    aggregate derived from the SAME block (no extra corpus pass); the
    df ceiling bounds every posting group before weights materialize.
    """
    # in-row histogram, no corpus shuffle (see doc_term_counts)
    dtc = doc_term_counts(documents, text_col, id_col, n).localCheckpoint(
        eager=True
    )
    return _bm25_weights_over(
        dtc, id_col, min_df=min_df, max_df=max_df, k1_x10=k1_x10, b_x100=b_x100
    )


def _bm25_weights_over(
    dtc: DataFrame,
    id_col: str = "doc_id",
    min_df: int = 2,
    max_df: int = 50,
    k1_x10: int = 12,
    b_x100: int = 75,
) -> DataFrame:
    """BM25 weights from a PREPARED per-(doc, term) count block — the
    shared core of ``bm25_postings`` and ``bm25_search``, split out
    (r12) so the search path can derive its query bag from the same
    pinned block instead of re-scanning and re-tokenizing the corpus."""
    dl = dtc.groupBy(id_col).agg(F.sum("tc").alias("dl"))
    corpus = dl.agg(
        F.sum("dl").alias("dl_sum"), F.count(F.lit(1)).alias("n_docs")
    )
    keep = (
        dtc.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= min_df) & (F.col("df") <= max_df))
        .crossJoin(F.broadcast(corpus))
        .select(
            "token",
            "df",
            "dl_sum",
            "n_docs",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                ),
                6,
            ).alias("idf"),
        )
    )
    num = F.expr(f"100L * ({k1_x10} + 10) * tc * dl_sum")
    den = F.expr(
        f"1000L * dl_sum * tc"
        f" + {k1_x10}L * (100 - {b_x100}) * dl_sum"
        f" + {k1_x10}L * {b_x100} * dl * n_docs"
    )
    return (
        dtc.join(F.broadcast(keep), "token")
        .join(dl, id_col)
        .select(
            id_col,
            "token",
            "tc",
            "df",
            F.round(
                F.col("idf") * (num.cast("double") / den.cast("double")), 6
            ).alias("bm25"),
        )
    )


def tfidf_cosine_pairs(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    min_df: int = 2,
    max_df: int = 50,
    threshold: float = 0.5,
) -> DataFrame:
    """Lexical near-duplicate pairs: cosine similarity over df-banded
    tf-idf vectors — the token-space member of the near-dup family
    (MinHash approximates Jaccard, SimHash approximates cosine over
    hashed features; this is the EXACT cosine over interpretable
    tf-idf weights, for the audit/threshold-calibration role).

    Exactness contract: idf rounds to 6 decimals, weights become
    integer MICROS (idf6·10^6 is exact, ×tc stays bigint), and every
    dot product / squared norm is a sum of bigint products carried in
    DECIMAL(38,0) — so the only float steps are two sqrt calls and one
    final division+round, identical on any engine or partitioning.

    Scale contract: vectors only contain df-banded terms, so candidate
    generation through the term self-join is LOSSLESS for pairs with
    cos > 0 while pair work is bounded by ``max_df``: each term
    contributes at most C(max_df, 2) candidate rows, never a corpus
    quadratic (the same co-occurrence bound as ``ngram_jaccard_pairs``;
    stopword-band terms would each contribute C(N, 2) and are exactly
    the ones the banding drops). One eager per-(doc, term) checkpoint
    = single corpus derivation for weights, norms, and the join.

    Candidate generation is GROUP-THEN-EXPAND, not a term self-join
    (the same shape as ``minhash_lsh_pairs``'s banding pass): per token
    the ≤ ``max_df`` banded postings are collected into one sorted
    array and the C(df, 2) ordered pairs expand IN-ROW, so the banded
    weight block crosses the wire ONCE — the naive self-join ships it
    twice (once per join side) and then sorts both copies. Per-token
    state is bounded at ``max_df`` structs by the band, never a
    corpus-sized group.
    """
    # in-row histogram, no corpus shuffle (see doc_term_counts)
    dtc = doc_term_counts(documents, text_col, id_col, n).localCheckpoint(
        eager=True
    )
    # n_docs folded into the plan as a broadcast scalar (r12): the old
    # eager ``dtc.select(id).distinct().count()`` was a separate driver
    # action — one more job per invocation for a value the keep
    # aggregate can carry via crossJoin. count_distinct over the pinned
    # block gives the identical integer; cast to double inside log
    # matches float(n_docs) bit-for-bit.
    nd = dtc.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    keep = (
        dtc.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= min_df) & (F.col("df") <= max_df))
        .crossJoin(F.broadcast(nd))
        .select(
            "token",
            # decimal staging: round(·,6)·10^6 is exact in DECIMAL but a
            # double detour would truncate vs the oracle's rounding
            (
                F.round(
                    F.log(F.col("n_docs").cast("double") / F.col("df")), 6
                )
                .cast("decimal(18,6)")
                * 1000000
            ).cast("bigint").alias("idf_micro"),
        )
        # idf == 0 (df == N, corpus-universal) contributes 0 to every
        # dot product and norm — dropping it is the identity, and it
        # keeps an all-universal-terms doc from reaching 0/0 under ANSI
        .where(F.col("idf_micro") > 0)
        # three consumers (weight join, both norm rebuilds) would each
        # re-aggregate the corpus block for df — pin the banded vocab
        # table once instead (small: banded terms only)
        .localCheckpoint(eager=True)
    )
    w = dtc.join(F.broadcast(keep), "token").select(
        id_col, "token", (F.col("idf_micro") * F.col("tc")).alias("w")
    )
    # w fits bigint (idf_micro ≤ ~2·10^7, tc per doc-term bounded by doc
    # length) but w·w would not for repetitive docs — go decimal FIRST
    wsq = F.col("w").cast("decimal(19,0)") * F.col("w")
    # NOT pinned: the final join's two sides each rebuild this with a
    # broadcast join + map-side-combined aggregate over the two PINNED
    # blocks — zero extra shuffles, and recompute-from-pinned beats a
    # serialized checkpoint job here (measured, same as bigram_logprob)
    norms = w.groupBy(id_col).agg(F.sum(wsq).alias("n2"))
    # one token shuffle: collect the ≤ max_df banded postings per token
    # (sort_array makes doc_a < doc_b deterministic — ids are unique
    # within a token group), expand the ordered pairs in-row with the
    # SAME decimal-first product as the self-join shape (decimal(19,0)
    # × bigint, identical result type, bit-identical sums)
    grouped = w.groupBy("token").agg(
        F.expr(f"sort_array(collect_list(struct({id_col} AS d, w)))").alias("arr")
    )
    dots = (
        grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(arr, (x, i) ->"
                    " transform(slice(arr, i + 2, size(arr)), y ->"
                    " struct(x.d AS doc_a, y.d AS doc_b,"
                    " CAST(x.w AS DECIMAL(19,0)) * y.w AS p))))"
                )
            ).alias("z")
        )
        .select("z.doc_a", "z.doc_b", "z.p")
        .groupBy("doc_a", "doc_b")
        .agg(F.sum("p").alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("doc_a"), F.col("n2").alias("n2a"))
    nb = norms.select(F.col(id_col).alias("doc_b"), F.col("n2").alias("n2b"))
    return (
        # norms is |docs|-sized (one decimal per doc): broadcast keeps
        # the pair table's (doc_a, doc_b) clustering intact. Fine at the
        # audit scales this exact baseline is for — the at-scale near-dup
        # path (MinHash/SimHash) never builds a dense norm table at all
        dots.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("n2a").cast("double"))
                    * F.sqrt(F.col("n2b").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def bm25_search(
    documents: DataFrame,
    query_terms: list[str] | DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    n: int = 2,
    min_df: int = 2,
    max_df: int = 50,
    query_doc: int | None = None,
) -> DataFrame:
    """BM25 top-k document search for a bag of query terms — the
    retrieval read path over ``bm25_postings`` (lookup terms → sum the
    matched posting weights per doc → top-k).

    ``query_terms`` is a term list (or a one-column DataFrame) in the
    same n-gram space as the index. Scores are EXACT: per-posting BM25
    weights are already 6-decimal-rounded, so they sum as
    DECIMAL(18,6) — no float-order nondeterminism — and ties break on
    the doc id. Top-k compiles to TakeOrderedAndProject.

    Scale: the term filter hits the posting table (df-banded, so each
    query term matches at most ``max_df`` docs); scoring touches only
    matched postings, never the corpus.

    ``query_doc`` is the more-like-this form: the query bag is that
    document's own distinct n-grams, read from the SAME pinned
    per-(doc, term) block the index derives from (r12) — the old
    caller-built bag re-scanned and re-tokenized the corpus and paid a
    distinct exchange for a set the block already holds one row each.
    """
    dtc = doc_term_counts(documents, text_col, id_col, n).localCheckpoint(
        eager=True
    )
    w = _bm25_weights_over(
        dtc, id_col, min_df=min_df, max_df=max_df
    )
    if query_doc is not None:
        # dtc holds one row per (doc, distinct term): the filter IS the
        # distinct query bag, no re-tokenize, no distinct exchange
        terms = F.broadcast(
            dtc.where(F.col(id_col) == query_doc).select("token")
        )
        matched = w.join(terms, "token")
    elif isinstance(query_terms, DataFrame):
        cols = query_terms.columns
        terms = F.broadcast(
            query_terms.select(F.col(cols[0]).alias("token")).distinct()
        )
        matched = w.join(terms, "token")
    else:
        if not query_terms:
            raise ValueError("query_terms must be non-empty (or pass query_doc)")
        matched = w.where(
            F.array_contains(F.array(*[F.lit(t) for t in query_terms]), F.col("token"))
        )
    return (
        matched.groupBy(id_col)
        .agg(
            F.sum(F.col("bm25").cast("decimal(18,6)"))
            .cast("double")
            .alias("score"),
            F.count(F.lit(1)).alias("matched_terms"),
        )
        .orderBy(F.col("score").desc(), id_col)
        .limit(k)
    )
