"""Embedding-space sufficient statistics: exact covariance blocks.

A training-data pipeline whitens / PCA-projects embeddings before
semantic dedup and clustering (SemDeDup, DSIR); the primitive under all
of those is the d×d covariance of the embedding column. At 100 TB this
must be a single pass with bounded state — the classic two-level
``treeAggregate`` shape:

* **level 1**: Arrow-batched ``mapInPandas`` folds each partition into
  ONE row of integer sufficient statistics ``(n, Σx, ΣxxT)`` — dim²
  longs ≈ 32 KB per partition for dim=64, regardless of row count;
* **level 2**: the per-partition rows explode to (index, partial) and a
  plain ``groupBy(index).sum`` combines them exactly (long addition is
  associative — no float-order nondeterminism), so the result is
  bit-identical to any SQL engine computing the same scaled sums.

Exactness contract: inputs are rounded half-away-from-zero to
``1/scale`` (default 1e-6, matching the repo's cross-engine rounding
convention) and scaled to int64. With \\|x\\| ≤ 1 embeddings the scaled
products are ≤ ~2.8e11, so int64 partial sums hold ~3e7 rows per
partition and the global long sums hold ~3e7 · 32e3 partitions — far
past any realistic corpus before needing a wider accumulator.

The reference has no statistics surface (its only aggregation is
per-partition MAX for offset recovery, e.g.
vertica/InRowOffsetVerticaRecordBatchStorage); this operator belongs to
the LLM-pipeline extension set.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000


def _scaled_int(x: np.ndarray, scale: int) -> np.ndarray:
    """Round half away from zero to 1/scale and scale to int64 — the
    same value ``CAST(ROUND(x * scale, 0) AS BIGINT)`` produces in both
    Spark and DuckDB."""
    return np.where(
        x >= 0,
        np.floor(x * scale + 0.5),
        -np.floor(-x * scale + 0.5),
    ).astype(np.int64)


def embedding_moment_partials(
    emb: DataFrame, vec_col: str = "embedding", dim: int = 64, scale: int = SCALE
) -> DataFrame:
    """Level-1 fold: one row per non-empty partition with exact integer
    sufficient statistics over the first ``dim`` embedding components.

    Output schema: ``n long, s array<long> (dim), xtx array<long>
    (dim*dim, row-major full matrix — the index arithmetic stays
    trivial and the upper triangle is selected downstream)``.
    """

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim, dtype=np.int64)
        xtx = np.zeros((dim, dim), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy())
            if X.shape[1] < dim:
                raise ValueError(
                    f"embedding dim {X.shape[1]} < requested dim {dim}"
                )
            xs = _scaled_int(X[:, :dim].astype(np.float64), scale)
            n += xs.shape[0]
            s += xs.sum(axis=0)
            xtx += xs.T @ xs
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "xtx": [xtx.reshape(-1).tolist()]}
            )

    return emb.select(vec_col).mapInPandas(
        fold, schema="n long, s array<long>, xtx array<long>"
    )


def embedding_covariance(
    emb: DataFrame, vec_col: str = "embedding", dim: int = 64, scale: int = SCALE
) -> DataFrame:
    """Population covariance of the first ``dim`` embedding components,
    upper triangle as ``(i, j, cov)`` with i ≤ j, rounded to 6 decimals
    through an exact DECIMAL cast (the repo's cross-engine convention).

    cov(i, j) = ΣxᵢxⱼT/(n·scale²) − (Σxᵢ/(n·scale))·(Σxⱼ/(n·scale))
    computed from exact integer sums, so the double expression tree is
    reproducible by any engine over the same scaled inputs.
    """
    partials = embedding_moment_partials(emb, vec_col=vec_col, dim=dim, scale=scale)
    # the partials table is tiny (one row per partition); evaluate it
    # once for the three derived aggregates below
    partials = partials.localCheckpoint(eager=False)

    total = partials.agg(F.sum("n").cast("double").alias("n"))
    sums = (
        partials.select(F.posexplode("s").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum("v").cast("double").alias("s"))
    )
    sscale = float(scale)
    xt = (
        partials.select(F.posexplode("xtx").alias("p", "v"))
        .groupBy("p")
        .agg(F.sum("v").cast("double").alias("sxx"))
        .select(
            (F.col("p") / dim).cast("int").alias("i"),
            (F.col("p") % dim).cast("int").alias("j"),
            "sxx",
        )
        .where(F.col("j") >= F.col("i"))
    )
    s1 = F.broadcast(sums.select(F.col("i").alias("i"), F.col("s").alias("s1")))
    s2 = F.broadcast(sums.select(F.col("i").alias("j"), F.col("s").alias("s2")))
    return (
        xt.join(s1, on="i")
        .join(s2, on="j")
        .crossJoin(F.broadcast(total))
        .select(
            "i",
            "j",
            (
                (
                    F.col("sxx") / F.lit(sscale * sscale)
                    - (F.col("s1") / F.lit(sscale))
                    * (F.col("s2") / F.lit(sscale))
                    / F.col("n")
                )
                / F.col("n")
            )
            .cast("decimal(18,6)")
            .cast("double")
            .alias("cov"),
        )
    )


def covariance_matrix_local(
    emb: DataFrame, vec_col: str = "embedding", dim: int = 64, scale: int = SCALE
) -> np.ndarray:
    """Collect the d×d covariance to the driver as a numpy array.

    The collect is d(d+1)/2 rows — bounded by the embedding width, never
    by the corpus — so this is safe at any scale (same contract as the
    k×dim centroid collect in operators/similarity.py)."""
    cov = np.zeros((dim, dim), dtype=np.float64)
    for r in embedding_covariance(emb, vec_col=vec_col, dim=dim, scale=scale).collect():
        cov[r.i, r.j] = r.cov
        cov[r.j, r.i] = r.cov
    return cov


def pca_components(cov: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k eigenpairs of a covariance matrix, deterministically
    oriented: eigenvalues descending, each eigenvector's largest-|.|
    component made positive (eigh's sign is otherwise arbitrary, which
    would make downstream projections run-to-run unstable)."""
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    for c in range(vecs.shape[1]):
        if vecs[np.argmax(np.abs(vecs[:, c])), c] < 0:
            vecs[:, c] = -vecs[:, c]
    return vals, vecs


def embedding_pca_project(
    emb: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Project embeddings onto their top-k principal components as
    scalar columns ``pc_0..pc_{k-1}`` (rounded to 6 decimals).

    Two passes: one distributed moments pass for the covariance (driver
    holds d² floats only), then one map-only pass where each projection
    is a JVM-side zip_with/aggregate dot product against the broadcast
    component literals — no shuffle, no Python in the projection."""
    keep = list(keep_cols or [])
    clash = {id_col, vec_col, *keep} & {f"pc_{c}" for c in range(k)}
    if clash:
        raise ValueError(f"output pc_* columns collide with: {sorted(clash)}")
    _, vecs = pca_components(
        covariance_matrix_local(emb, vec_col=vec_col, dim=dim), k
    )
    v = F.transform(F.slice(F.col(vec_col), 1, dim), lambda x: x.cast("double"))
    projections = [
        F.round(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(w)) for w in vecs[:, c]]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias(f"pc_{c}")
        for c in range(k)
    ]
    return emb.select(F.col(id_col), *keep, *projections)


def whitening_matrix(cov: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """PCA-whitening transform W with W·cov·Wᵀ ≈ I: rows are
    eigenvectors scaled by 1/sqrt(eigenvalue + eps)."""
    vals, vecs = pca_components(cov, cov.shape[0])
    return (vecs / np.sqrt(vals + eps)).T


def embedding_whiten(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    eps: float = 1e-6,
) -> DataFrame:
    """Whiten the embedding column (decorrelate + unit variance) —
    the preprocessing step in front of cosine/semantic dedup when raw
    dimensions are correlated. Output: ``(id, whitened array<double>)``,
    computed map-only against the broadcast d×d transform."""
    W = whitening_matrix(covariance_matrix_local(emb, vec_col=vec_col, dim=dim), eps)
    v = F.transform(F.slice(F.col(vec_col), 1, dim), lambda x: x.cast("double"))
    rows = [
        F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(float(w)) for w in W[r, :]]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for r in range(dim)
    ]
    return emb.select(F.col(id_col), F.array(*rows).alias("whitened"))
