"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB media corpora: the media bytes live in a single
``binary`` column (or an object-store URI for >row-group-size blobs);
typed metadata (modality, codec, dims, duration) travels alongside so
partition pruning and size-based bin-packing never touch the payload.
Decode / feature-extraction run as Arrow-batched ``mapInPandas`` UDFs —
one Python worker round-trip per batch, not per row.

The actual media decoders (PIL/ffmpeg/soundfile) are NOT available in
this environment, so the decode kernel is STUBBED: a deterministic
fake decoder (seeded from the payload digest) keeps the Spark-side
plumbing — schema, batch shape, partitioning — fully real and testable,
and raises ``NotImplementedError`` when a real decode is requested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, modality string, codec string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id string, modality string, n_bytes int, digest string, "
    "feature array<float>"
)

FEATURE_DIM = 8


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic fake media table from documents: payload
    = utf-8 bytes of the text (stand-in for image/audio bytes), typed
    metadata derived from doc fields.  Pure column expressions."""
    return docs.select(
        F.concat(F.lit("m-"), F.col("doc_id").cast("string")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.lit("raw").alias("codec"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("n_chars") % 640).cast("int").alias("width"),
        (F.col("n_chars") % 480).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: seed a tiny feature
    vector from the payload digest.  Replace with PIL/ffmpeg in a
    container that has them."""
    digest = hashlib.md5(payload).digest()
    seed = int.from_bytes(digest[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.rand(FEATURE_DIM).astype(np.float32)


def real_decode(payload: bytes, modality: str) -> np.ndarray:
    """The production decode slot — requires media libs absent here."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg/soundfile; not installed in "
        "this container — wire your decoder into extract_features(real=True)"
    )


def extract_features(media: DataFrame, real: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` so each Python worker sees whole Arrow batches
    (payload bytes stay zero-copy until the kernel touches them).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, digests, sizes = [], [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                raw = bytes(payload)
                sizes.append(len(raw))
                digests.append(hashlib.md5(raw).hexdigest())
                vec = (
                    real_decode(raw, modality) if real else _fake_decode(raw)
                )
                feats.append(vec.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "digest": digests,
                    "feature": feats,
                }
            )

    # opaque-function column pruning is on US (guide §4): Spark cannot
    # see which columns the kernel touches, so an explicit select
    # keeps metadata columns out of the Arrow transfer and lets the
    # scan prune to exactly the three inputs
    return media.select("media_id", "modality", "payload").mapInPandas(
        kernel, schema=FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_idx, frame_ts_ms): video frame-sampling plan —
    pure column math (no decode), so the sampling schedule can be
    planned/partitioned before any byte is touched."""
    video = media.where(F.col("modality") == "video")
    return video.select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.col("duration_ms") / every_ms).cast("int") - 1,
                    F.lit(0),
                ),
            )
        ).alias("frame_idx", "_i"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
    )
