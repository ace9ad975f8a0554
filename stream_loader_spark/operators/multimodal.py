"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct; decode/feature steps run as Arrow-batched pandas
functions over ``mapInPandas`` so each task processes whole record
batches (the right shape for 100 TB: partition-parallel, no driver
involvement, batch-wise Python↔JVM transfer).

The actual image/audio codecs are NOT available in this container, so
``decode`` is STUBBED: media libs are probed with an import-try and the
fallback is a clearly-marked deterministic fake (byte histogram /
chunked frame sampling). The Spark-side plumbing — schemas, UDF
signatures, batch iteration, partitioning — is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_loader_spark.sources.tables import scatter

MEDIA_SCHEMA = (
    "media_id BIGINT, media_type STRING, content BINARY, "
    "meta STRUCT<width: INT, height: INT, duration_ms: INT, codec: STRING>"
)

FEATURE_DIM = 16

try:  # media codecs are optional; absent in this environment
    import PIL.Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def synthetic_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents fixture:
    the UTF-8 text bytes stand in for an encoded payload."""
    return scatter(documents).select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit("synthetic").alias("codec"),
        ).alias("meta"),
    )


def _byte_histogram(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake feature vector: normalized byte histogram.

    Not called by the operators (they use ``_batch_histograms``): this
    per-row form is the INDEPENDENT reference the batched
    implementation is verified against in tests — an intentional twin,
    not dead code. Keep the bucket formula in both in sync."""
    if content is None or len(content) == 0:
        return [0.0] * dim
    arr = np.frombuffer(content, dtype=np.uint8)
    # byte b → bucket b*dim//256 maps 0..255 onto exactly 0..dim-1 for any
    # dim ≤ 256 (integer floor-division by a non-divisor would spill an
    # extra bucket)
    hist = np.bincount(arr.astype(np.int64) * dim // 256, minlength=dim).astype(np.float64)
    return (hist / hist.sum()).tolist()


def _batch_histograms(contents, dim: int = FEATURE_DIM) -> np.ndarray:
    """Normalized byte histograms for a whole Arrow batch at once.

    One pass over the concatenated buffer — no per-row Python loop:
    row indices come from ``np.repeat`` over the per-row lengths and a
    single ``np.add.at`` scatters every byte into its (row, bucket)
    cell. Empty/NULL payloads stay all-zero rows.
    """
    bufs = [bytes(b) if b is not None else b"" for b in contents]
    n = len(bufs)
    out = np.zeros((n, dim), dtype=np.float64)
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return out
    allbytes = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    buckets = allbytes.astype(np.int64) * dim // 256
    np.add.at(out, (rows, buckets), 1.0)
    sums = out.sum(axis=1, keepdims=True)
    np.divide(out, sums, out=out, where=sums > 0)
    return out


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """binary content → feature array<double> via mapInPandas.

    With a real codec installed this is where decode+embed would run;
    the stub emits the deterministic byte-histogram features.
    """
    out_schema = "media_id BIGINT, media_type STRING, feature ARRAY<DOUBLE>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hists = _batch_histograms(pdf["content"], dim)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": list(hists),
                }
            )

    return media.mapInPandas(batches, schema=out_schema)


def feature_summary(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Scalar feature digest per media row — the checked-query surface.

    Emits only scalar columns (the vector itself stays internal: hashed
    comparison layers choke on ARRAY cells), each chosen to be exactly
    reproducible by an independent SQL engine over the same bytes:

    - ``n_bytes`` / ``argmax_bucket`` — exact integers.
    - ``top_share`` — the RAW max histogram share. A share is one IEEE
      division ``count/total`` of exact integers, so its bits are
      engine-independent; no rounding is applied (two engines' ``round``
      can differ in the last ulp, raw division cannot).
    - ``entropy_q`` — Shannon entropy quantized to 1e-4 (``round(H *
      10000)`` as BIGINT): log2/summation order differ across engines
      at ~1e-16, so the raw double is NOT portable; the quantized
      integer is.
    - ``feature_digest`` — sha256 of the ``%.6f``-formatted vector
      (correctly-rounded decimal formatting of identical doubles is
      engine-independent, ties-to-even in both CPython and fmt).
    """
    import hashlib

    out_schema = (
        "media_id BIGINT, media_type STRING, n_bytes BIGINT, "
        "entropy_q BIGINT, argmax_bucket INT, top_share DOUBLE, feature_digest STRING"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hists = _batch_histograms(pdf["content"], dim)
            with np.errstate(divide="ignore", invalid="ignore"):
                logs = np.where(hists > 0, np.log2(hists, where=hists > 0), 0.0)
            entropy = -(hists * logs).sum(axis=1)
            digests = [
                hashlib.sha256(",".join(f"{v:.6f}" for v in row).encode()).hexdigest()
                for row in hists
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(b)) if b is not None else 0 for b in pdf["content"]],
                    "entropy_q": np.rint(entropy * 10000.0).astype(np.int64),
                    "argmax_bucket": hists.argmax(axis=1).astype(np.int32),
                    "top_share": hists.max(axis=1),
                    "feature_digest": digests,
                }
            )

    return media.mapInPandas(batches, schema=out_schema)


def decode_image(media: DataFrame) -> DataFrame:
    """Decode image payloads to (height, width, mode).

    STUB: raises unless an image codec is importable. Plumbing (schema,
    filter pushdown on media_type, batch signature) is real.
    """
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires an image codec (PIL); not available in this environment"
        )
    raise NotImplementedError("real decode path reserved for environments with codecs")


def sample_frames(media: DataFrame, every_k: int = 4, frame_size: int = 32) -> DataFrame:
    """Frame sampling for video payloads: split the byte stream into
    fixed-size 'frames' and keep every k-th (deterministic stub of a
    video frame sampler; real decoders slot into the same mapInPandas)."""
    out_schema = "media_id BIGINT, frame_index INT, frame BINARY"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # All frame geometry in numpy over the concatenated buffer
            # (same shape as _batch_histograms): per-row frame counts →
            # kept-frame ordinals → global byte ranges. The only Python
            # loop left is one slice per OUTPUT frame — each cell must
            # become its own bytes object regardless.
            bufs = [bytes(b) if b is not None else b"" for b in pdf["content"]]
            n = len(bufs)
            lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
            n_frames = -(-lens // frame_size)  # ceil; NULL/empty → 0 frames
            kept = -(-n_frames // every_k)
            total = int(kept.sum())
            row = np.repeat(np.arange(n, dtype=np.int64), kept)
            first = np.concatenate(([0], np.cumsum(kept)))[:-1]
            ordinal = np.arange(total, dtype=np.int64) - np.repeat(first, kept)
            fidx = ordinal * every_k
            base = np.concatenate(([0], np.cumsum(lens)))
            gs = base[row] + fidx * frame_size
            ge = np.minimum(gs + frame_size, base[row] + lens[row])
            allb = b"".join(bufs)
            frames = [allb[s:e] for s, e in zip(gs.tolist(), ge.tolist())]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy()[row],
                    "frame_index": fidx.astype(np.int32),
                    "frame": frames,
                }
            )

    return media.where(F.col("media_type") == "video").mapInPandas(batches, schema=out_schema)


def resize_media(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Nearest-neighbor resize for image payloads (deterministic stub of
    an image resizer; a real decoder slots into the same mapInPandas).

    Fake-decode contract: the byte stream is a grayscale grid of
    width = floor(sqrt(len)) and height = len // width (trailing
    remainder bytes ignored), matching what the SQL oracle can slice.
    The resize itself is the real algorithm — source pixel (i·h)//out_h,
    (j·w)//out_w per output pixel — and the whole batch is one numpy
    gather over the concatenated buffer (no per-pixel Python).
    Zero-length payloads emit no row, like ``sample_frames``.
    """
    out_schema = "media_id BIGINT, src_w INT, src_h INT, resized BINARY"
    if out_w < 1 or out_h < 1:
        raise ValueError("output dimensions must be >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cells = out_h * out_w
        gi = np.repeat(np.arange(out_h, dtype=np.int64), out_w)  # grid row
        gj = np.tile(np.arange(out_w, dtype=np.int64), out_h)  # grid col
        for pdf in it:
            bufs = [bytes(b) if b is not None else b"" for b in pdf["content"]]
            lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
            keep = lens >= 1
            if not keep.any():
                continue
            bufs = [b for b, k in zip(bufs, keep) if k]
            lens = lens[keep]
            ids = pdf["media_id"].to_numpy()[keep]
            n = len(bufs)
            # floor(sqrt) in float64 — the same expression the SQL
            # oracle evaluates, so both engines agree bit-for-bit
            w = np.floor(np.sqrt(lens.astype(np.float64))).astype(np.int64)
            h = lens // w
            base = np.concatenate(([0], np.cumsum(lens)))[:-1]
            rows_rep = np.repeat(np.arange(n, dtype=np.int64), cells)
            src = (
                base[rows_rep]
                + (np.tile(gi, n) * h[rows_rep]) // out_h * w[rows_rep]
                + (np.tile(gj, n) * w[rows_rep]) // out_w
            )
            arr = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            sampled = arr[src].reshape(n, cells)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "src_w": w.astype(np.int32),
                    "src_h": h.astype(np.int32),
                    "resized": [r.tobytes() for r in sampled],
                }
            )

    return media.where(F.col("media_type") == "image").mapInPandas(
        batches, schema=out_schema
    )
