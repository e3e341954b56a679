"""Mention detection over interleaved spans — vectorized, Arrow-batched.

Text spans are matched against the corpus templates with pandas ``.str``
regex ops (whole-column vectorized, no per-row Python loop); media spans
resolve via their ``media_ref`` scheme. Output is one row per detected
mention: (doc_id, pos, slot, surface).

Scale notes: runs as ``mapInPandas`` so a 10^12-doc scan stays embarrassingly
parallel — no shuffle, no state; column pruning pushes (doc_id, pos, kind,
text, media_ref) projection into the parquet/Iceberg scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# template patterns (kept in sync with ttmf_spark.corpus HEAD_TEXT/LINE_TEXT)
_HEAD_RE = r"^Order (O\d+) placed by (\S+) in (N\d+) of (R\d+)\.$"
_LINE_RE = r"^Includes part (Part#\d+) from (\S+) of (N\d+)\.$"

_HEAD_SLOTS = ["order", "customer", "nation_c", "region"]
_LINE_SLOTS = ["part", "supplier", "nation_s"]

MENTION_SCHEMA = "doc_id string, pos int, slot string, surface string"


def _detect_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out = []
        text_mask = pdf["kind"].eq("text") & pdf["text"].notna()
        if text_mask.any():
            tdf = pdf.loc[text_mask, ["doc_id", "pos", "text"]]
            for regex, slots in ((_HEAD_RE, _HEAD_SLOTS), (_LINE_RE, _LINE_SLOTS)):
                caps = tdf["text"].str.extract(regex)
                hit = caps[0].notna()
                if hit.any():
                    base = tdf.loc[hit, ["doc_id", "pos"]]
                    for i, slot in enumerate(slots):
                        m = base.copy()
                        m["slot"] = slot
                        m["surface"] = caps.loc[hit, i]
                        out.append(m)
        media_mask = pdf["kind"].isin(["image", "audio", "video"]) & pdf[
            "media_ref"
        ].notna()
        if media_mask.any():
            mdf = pdf.loc[media_mask, ["doc_id", "pos", "media_ref"]].copy()
            scheme = mdf["media_ref"].str.extract(r"^media://(\w+)/")[0]
            mdf["slot"] = "media_" + scheme.fillna("unknown")
            mdf["surface"] = mdf["media_ref"]
            out.append(mdf[["doc_id", "pos", "slot", "surface"]])
        if out:
            yield pd.concat(out, ignore_index=True)[
                ["doc_id", "pos", "slot", "surface"]
            ].astype({"pos": "int32"})
        else:
            yield pd.DataFrame(
                {"doc_id": pd.Series(dtype="str"), "pos": pd.Series(dtype="int32"),
                 "slot": pd.Series(dtype="str"), "surface": pd.Series(dtype="str")}
            )


def detect_mentions(flat_spans: DataFrame) -> DataFrame:
    """(doc_id, pos, kind, text, media_ref) -> (doc_id, pos, slot, surface)."""
    cols = ["doc_id", "pos", "kind", "text", "media_ref"]
    return flat_spans.select(*cols).mapInPandas(_detect_batch, schema=MENTION_SCHEMA)


# wide (one-row-per-span) detection: every mention in a span shares
# (doc_id, pos) and each slot captures AT MOST once per span
# (``.str.extract`` yields a single capture group match), so the narrow
# stream's downstream (doc_id, pos) pivot is the identity here. Emitting
# the pivot directly from the UDF cuts the Arrow return traffic ~3x (one
# wide row instead of up to 4 narrow rows + per-row key duplication) and
# removes the 20M-row groupBy exchange from the hot path entirely.
WIDE_SLOTS = ["order", "customer", "nation_c", "region", "part", "supplier",
              "nation_s", "media_part"]

WIDE_SCHEMA = "doc_id string, pos int, " + ", ".join(
    f"{s} string" for s in WIDE_SLOTS
)


def _detect_batch_wide(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out = pdf[["doc_id", "pos"]].copy()
        text = pdf["text"].where(pdf["kind"].eq("text"))
        caps_h = text.str.extract(_HEAD_RE)
        for i, slot in enumerate(_HEAD_SLOTS):
            out[slot] = caps_h[i]
        caps_l = text.str.extract(_LINE_RE)
        for i, slot in enumerate(_LINE_SLOTS):
            out[slot] = caps_l[i]
        media = pdf["media_ref"].where(
            pdf["kind"].isin(["image", "audio", "video"])
        )
        scheme = media.str.extract(r"^media://(\w+)/")[0]
        out["media_part"] = media.where(scheme.eq("part"))
        out = out[out[WIDE_SLOTS].notna().any(axis=1)]
        yield out.astype({"pos": "int32"})


def detect_mentions_wide(flat_spans: DataFrame) -> DataFrame:
    """(doc_id, pos, kind, text, media_ref) -> one row per mention-bearing
    span with a surface column per rule slot (null = slot absent)."""
    cols = ["doc_id", "pos", "kind", "text", "media_ref"]
    return flat_spans.select(*cols).mapInPandas(
        _detect_batch_wide, schema=WIDE_SCHEMA
    )


def flatten_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) -> one row per span with its position."""
    return docs.select("doc_id", F.posexplode("spans").alias("pos", "span")).select(
        "doc_id",
        "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
