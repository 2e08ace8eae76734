"""Multimodal column support (extension mandate).

Image/audio/video payloads are opaque `binary` columns with a typed
metadata struct. The real decoders (PIL / librosa / av) are NOT in this
image, so the decode step is a clearly-marked deterministic stub — but
everything Spark-side is real and tested: the binary schema, the
mapInPandas batch iteration, Arrow transfer, output schema, and the
partition-preserving plan shape (no shuffle: decode is a narrow map).

At 100 TB: binary payloads ride the same parquet scan (column pruning
keeps them off queries that don't touch them); decode parallelism is
partition parallelism; `spark.sql.files.maxPartitionBytes` sizes the
per-task batch so one task's Arrow batches fit executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes bigint, content_md5 string, "
    "width bigint, height bigint, n_frames bigint"
)


def with_media_column(
    df: DataFrame, text_col: str = "text", media_col: str = "media"
) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct. Here the
    payload is the utf-8 encoded text (the fixtures ship no real blobs);
    with real data this is the raw image/audio bytes column as ingested."""
    return df.withColumn(media_col, F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ),
    )


def decode_media_stub(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched, narrow map).

    STUB: features are deterministic functions of the raw bytes (length,
    md5, modular fake dimensions) standing in for decode->resize->
    feature-extract. Swap `_fake_features` for a real codec when the
    libraries exist — the Spark plumbing (schema, batching, partitioning)
    is unchanged.
    """
    id_name, media_name = id_col, media_col

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[media_name]
            n_bytes = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name],
                    "n_bytes": n_bytes.astype("int64"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "width": (n_bytes % 512 + 64).astype("int64"),
                    "height": (n_bytes * 7 % 512 + 64).astype("int64"),
                    "n_frames": (n_bytes % 16).astype("int64"),
                }
            )

    return df.mapInPandas(_decode, DECODED_SCHEMA)


def decode_image(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Real image decode (resize + pixel stats). NOT IMPLEMENTED in this
    image: PIL/opencv are absent. The call shape mirrors decode_media_stub."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow; this container ships none — "
            "use decode_media_stub for plumbing tests"
        ) from e
    raise NotImplementedError("real decoder wiring lands when a codec lib exists")


def sample_frames(
    df: DataFrame, every_n_bytes: int = 4096, media_col: str = "media"
) -> DataFrame:
    """Frame-sampling stand-in: deterministic byte-offset sampling of the
    payload (every_n_bytes stride), as an array<binary> column — the
    plan/partitioning shape of real video frame sampling."""
    n = F.octet_length(F.col(media_col))
    offsets = F.sequence(
        F.lit(1), F.greatest(n, F.lit(1)), F.lit(every_n_bytes)
    )
    return df.withColumn(
        "frames",
        F.transform(offsets, lambda o: F.substring(F.col(media_col), o, 16)),
    )


RESIZED_SCHEMA = (
    "doc_id long, media binary, width long, height long, "
    "orig_n_bytes long, n_bytes long"
)


def resize_media_stub(
    df: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Resize plumbing via mapInPandas (Arrow-batched, narrow map): each
    payload is deterministically resampled to exactly target_w*target_h
    bytes (stride-sample when shrinking, cyclic repeat when growing) —
    the batch shape, schema, and partitioning of a real image resize,
    with the pixel math stubbed (codec libs absent from this image; swap
    `_resample` for PIL/cv2 resize when they exist).

    Returns (id, media=resized bytes, width, height, orig_n_bytes,
    n_bytes) with n_bytes == target_w*target_h for every row.
    """
    id_name, media_name = id_col, media_col
    target = target_w * target_h

    def _resample(b: bytes) -> bytes:
        b = bytes(b)
        if not b:
            return bytes(target)
        if len(b) >= target:
            # stride-sample down to exactly `target` bytes
            step = len(b) / target
            return bytes(b[int(i * step)] for i in range(target))
        reps = target // len(b) + 1
        return (b * reps)[:target]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[media_name].map(bytes)
            resized = payloads.map(_resample)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name],
                    "media": resized,
                    "width": target_w,
                    "height": target_h,
                    "orig_n_bytes": payloads.map(len).astype("int64"),
                    "n_bytes": resized.map(len).astype("int64"),
                }
            )

    return df.mapInPandas(_resize, RESIZED_SCHEMA)
