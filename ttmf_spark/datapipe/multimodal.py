"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode/feature-extract as Arrow-batched mapInPandas stages.

The corpus's media spans (kind in image/audio/video, media_ref) model a
media lake: this module materializes a media table with a binary
``content`` column and runs per-item feature extraction. The actual
codec decode is STUBBED (image/audio libraries are not available in this
environment): ``decode_real`` raises NotImplementedError; the default
extractor is a deterministic fake (content-hash-seeded feature vector)
so all the Spark-side plumbing — schema, batching, partitioning, UDF
signature — is real and tested. Swapping in a real decoder is a drop-in
replacement of `_fake_features`.

Scale notes: media bytes never enter a shuffle — extraction is
mapInPandas over the scan (narrow); only the (ref, features) projection
flows downstream. Batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch to cap executor memory for
large payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "media_ref string, kind string, content binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)


def media_table(flat_spans: DataFrame) -> DataFrame:
    """Media spans -> (media_ref, kind, content binary, meta struct).

    ``content`` is a deterministic synthetic payload derived from the ref
    (sha2 digest bytes repeated); metadata fields are hash-derived. This
    is the *fixture generator* for the multimodal path — at production
    scale `content` would come from the lake, same schema.
    """
    media = flat_spans.filter(F.col("kind").isin("image", "audio", "video")).select(
        "media_ref", "kind"
    ).distinct()
    h = F.abs(F.xxhash64("media_ref"))
    return media.select(
        "media_ref",
        "kind",
        F.to_binary(F.sha2(F.col("media_ref"), 256), F.lit("hex")).alias("content"),
        F.struct(
            F.when(F.col("kind") == "image", (h % 1920 + 16).cast("int")).alias("width"),
            F.when(F.col("kind") == "image", (h % 1080 + 16).cast("int")).alias("height"),
            F.when(F.col("kind") != "image", (h % 600000).cast("int")).alias("duration_ms"),
            F.concat(F.lit("fake-"), F.col("kind")).alias("codec"),
        ).alias("meta"),
    )


def decode_real(content: bytes, kind: str):
    """Placeholder for the real codec decode (PIL/ffmpeg/soundfile)."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use the deterministic fake extractor"
    )


def _fake_features(content: pd.Series) -> np.ndarray:
    """Deterministic per-item feature vectors seeded by a content digest."""
    out = np.empty((len(content), FEATURE_DIM), dtype=np.float32)
    for i, payload in enumerate(content):
        digest = hashlib.sha256(bytes(payload)).digest()
        seed = int.from_bytes(digest[:8], "big")
        out[i] = np.random.default_rng(seed).normal(size=FEATURE_DIM)
    return out


FEATURES_SCHEMA = "media_ref string, kind string, features array<float>"


def extract_features(media: DataFrame, use_real_decode: bool = False) -> DataFrame:
    """(media_ref, kind, content, meta) -> (media_ref, kind, features).

    mapInPandas: one Arrow batch per call; per-item python only inside the
    (stubbed) decode — the surrounding pipeline is batch-vectorized.
    """

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"media_ref": [], "kind": [], "features": []})
                continue
            if use_real_decode:
                feats = [decode_real(c, k) for c, k in zip(pdf["content"], pdf["kind"])]
                arr = np.stack(feats)
            else:
                arr = _fake_features(pdf["content"])
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "features": list(arr),
                }
            )

    return media.select("media_ref", "kind", "content").mapInPandas(
        _batch, schema=FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per planned frame timestamp —
    the shuffle-free explode that precedes a real frame decode."""
    vids = media.filter(F.col("kind") == "video").select(
        "media_ref", F.col("meta.duration_ms").alias("dur")
    )
    return vids.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("dur") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ms"),
    )
