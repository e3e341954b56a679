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
from pyspark.sql import DataFrame, Window
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


def interleave_stats(flat: DataFrame) -> DataFrame:
    """(kind, n_spans, n_docs, n_refs, spans_per_doc): the per-modality
    interleaving profile of the corpus — how much of each payload kind
    the docs carry and how it spreads across documents. The audit a
    multimodal pipeline runs before sizing decode capacity (images per
    doc drives the mapInPandas batch budget).

    One map-side-combinable agg over the span scan; ``spans_per_doc`` is
    a single division of two exact counts rounded once (never an
    accumulated float). Output is modality-dim-sized.
    """
    return (
        flat.groupBy("kind")
        .agg(
            F.count("*").alias("n_spans"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("media_ref").alias("n_refs"),
        )
        .withColumn(
            "spans_per_doc",
            F.round(F.col("n_spans") / F.col("n_docs").cast("double"), 6),
        )
    )


def caption_pairs(flat: DataFrame, max_gap: int = 2) -> DataFrame:
    """(doc_id, pos, kind, media_ref, caption_pos, caption_text): each
    media span paired with its caption candidate — the nearest text span
    within ``max_gap`` positions, preceding preferred on distance ties —
    the alignment step that turns interleaved documents into
    (image, caption) training pairs (CLIP-style). Media spans with no
    text neighbor in range emit caption_pos = NULL (the QA remainder).

    Per-document windows only (two ignore-nulls scans over the span
    order, one preceding, one following) — a document's spans sort
    within one task, documents spread freely across the cluster; nothing
    ever joins across documents.
    """
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    tpos = F.when(F.col("kind") == "text", F.col("pos"))
    ttxt = F.when(F.col("kind") == "text", F.col("text"))
    d = (
        flat.withColumn("_ppos", F.last(tpos, ignorenulls=True).over(w_prev))
        .withColumn("_ptxt", F.last(ttxt, ignorenulls=True).over(w_prev))
        .withColumn("_npos", F.first(tpos, ignorenulls=True).over(w_next))
        .withColumn("_ntxt", F.first(ttxt, ignorenulls=True).over(w_next))
    )
    pd_ = F.col("pos") - F.col("_ppos")
    nd = F.col("_npos") - F.col("pos")
    prev_ok = F.col("_ppos").isNotNull() & (pd_ <= max_gap)
    next_ok = F.col("_npos").isNotNull() & (nd <= max_gap)
    use_prev = prev_ok & (~next_ok | (pd_ <= nd))
    use_next = next_ok & ~use_prev
    return (
        d.filter(F.col("kind") != "text")
        .select(
            "doc_id",
            "pos",
            "kind",
            "media_ref",
            F.when(use_prev, F.col("_ppos"))
            .when(use_next, F.col("_npos"))
            .cast("int")
            .alias("caption_pos"),
            F.when(use_prev, F.col("_ptxt"))
            .when(use_next, F.col("_ntxt"))
            .alias("caption_text"),
        )
    )
