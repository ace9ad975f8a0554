"""Per-vector scalar quantization of embedding columns (int8-style).

The storage-reduction half of an embedding pipeline: min-max scalar
quantization maps each float32 vector to 8-bit codes
(``q_i = round((v_i - vmin) / scale)``, ``scale = (vmax - vmin)/255``),
cutting an ANN index's footprint 4× — the standard companion to the
IVF index in operators/similarity.py (IVF-SQ in FAISS terms).

Everything is per-row array arithmetic (higher-order functions over
the vector column): a narrow, shuffle-free transform that pipelines
into whatever follows and scales linearly with the corpus. Expressions
are built as ONE selectExpr string — python-lambda HOFs cost py4j
round-trips per construction (see dedup.hash_shingles_over).

The driver's canonicalizer rejects array cells, so the verification
query surfaces scalars: the integer code CHECKSUM (exact — any
cross-engine rounding drift flips it), dimension count, the (vmin,
vmax, scale) reconstruction parameters (pure float→double casts and
one shared-tree division — bit-stable), and the mean absolute
reconstruction error snapped to scale-6 decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def quantized_embedding_stats(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 255,
) -> DataFrame:
    """(id, n_dims, vmin, vmax, scale, q_checksum, recon_mae) per
    vector. Constant vectors (scale 0) quantize to all-zero codes and
    reconstruct exactly (recon_mae 0)."""
    return embeddings.selectExpr(
        id_col,
        f"size({vec_col}) AS n_dims",
        f"CAST(array_min({vec_col}) AS DOUBLE) AS vmin",
        f"CAST(array_max({vec_col}) AS DOUBLE) AS vmax",
        f"(CAST(array_max({vec_col}) AS DOUBLE) - CAST(array_min({vec_col}) AS DOUBLE))"
        f" / {float(levels)} AS scale",
        vec_col,
    ).selectExpr(
        id_col,
        "n_dims",
        "vmin",
        "vmax",
        "scale",
        f"CASE WHEN scale = 0D THEN transform({vec_col}, v -> 0) "
        f"ELSE transform({vec_col}, v -> CAST(round((CAST(v AS DOUBLE) - vmin) / scale) AS INT)) "
        f"END AS codes",
        vec_col,
    ).selectExpr(
        id_col,
        "n_dims",
        "vmin",
        "vmax",
        "scale",
        "aggregate(codes, 0L, (acc, q) -> acc + q) AS q_checksum",
        # MAE of dequantized reconstruction; snapped to scale-6 decimal
        # because the left-to-right float sum is the one expression a
        # cross-engine oracle can differ on in the last ulp
        "CAST(CAST(CASE WHEN n_dims = 0 THEN 0D ELSE "
        f"aggregate(zip_with({vec_col}, codes, (v, q) -> abs(CAST(v AS DOUBLE) - (vmin + q * scale))), "
        "0D, (acc, x) -> acc + x) / n_dims END AS DECIMAL(18,6)) AS DOUBLE) AS recon_mae",
    )


def dequantized_embeddings(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 255,
) -> DataFrame:
    """Reconstruct vectors from their 8-bit codes: (id, vec_col as
    array<double>) with ``v'_i = vmin + q_i * scale``.

    Composes with the similarity operators to give quantized search
    (FAISS SQ-style): rank against reconstructions instead of raw
    floats, trading ≤ half a quantization step of per-dimension error
    for a 4× smaller index. Narrow per-row arithmetic, no shuffle —
    and because round/scale arithmetic is deterministic, the whole
    quantize→reconstruct→rank pipeline stays oracle-verifiable.
    """
    lv = float(levels)
    return embeddings.selectExpr(
        id_col,
        f"CAST(array_min({vec_col}) AS DOUBLE) AS vmin",
        f"(CAST(array_max({vec_col}) AS DOUBLE) - CAST(array_min({vec_col}) AS DOUBLE))"
        f" / {lv} AS scale",
        vec_col,
    ).selectExpr(
        id_col,
        f"CASE WHEN scale = 0D THEN transform({vec_col}, v -> vmin) "
        f"ELSE transform({vec_col}, "
        f"v -> vmin + CAST(round((CAST(v AS DOUBLE) - vmin) / scale) AS INT) * scale) "
        f"END AS {vec_col}",
    )
