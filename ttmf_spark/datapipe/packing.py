"""Sequence packing: the concat-and-chunk planner that turns a document
corpus into fixed-size context windows for LLM pre-training.

Standard pretraining packing concatenates the token streams of many
documents and slices the result into ``budget``-token windows, letting
documents straddle window boundaries (GPT-2/3-style "concat + chunk";
no padding waste, no bin-packing search). The *plan* for that — which
window(s) each document lands in and at what offset — is pure window
arithmetic, so this op emits the plan as columns and stays entirely
JVM-side:

1. shard documents into ``n_buckets`` deterministic packing streams by
   a salted hash of the id (each stream is packed independently — this
   is what makes the op parallel AND resumable: re-running any bucket
   reproduces exactly the same windows);
2. within a bucket, order by (hash, doc_id) — a deterministic,
   partition-invariant order — and take the running token sum;
3. a document starting at global stream offset ``start_off`` with
   ``n_tokens`` tokens occupies windows
   floor(start_off/budget) .. floor((start_off+n_tokens-1)/budget).

Scale shape: ONE shuffle, hash-partitioned on the bucket id; buckets
are uniform by construction (salted hash), so there is no skew and the
window sort is per-bucket, never global. Set ``n_buckets`` to a few ×
the executor count at 100 TB — each bucket's plan is independent of
every other bucket, so stream count, not corpus size, bounds the
sort's working set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ttmf_spark.datapipe.dedup import u60
from ttmf_spark.datapipe.textstats import _tokens


def pack_sequences(
    docs: DataFrame,
    budget: int = 256,
    n_buckets: int = 8,
    seed: int = 0,
    hash_fn: str = "xxhash64",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket, start_off, n_tokens, pack_first, pack_last).

    ``pack_first``/``pack_last`` are the first and last ``budget``-token
    windows of the doc's bucket stream that contain any of its tokens.
    A zero-token document is pinned to the single window at its offset
    (pack_last = pack_first) rather than the degenerate empty range.
    Token counts are whitespace tokens (textstats semantics).
    """
    u = u60(F.col(id_col).cast("string"), seed=seed, fn=hash_fn)
    d = docs.select(
        F.col(id_col),
        u.alias("_u"),
        F.size(_tokens(F.col(text_col))).alias("n_tokens"),
    ).withColumn("bucket", F.pmod(F.col("_u"), F.lit(n_buckets)).cast("int"))
    w = Window.partitionBy("bucket").orderBy("_u", id_col)
    start = F.coalesce(F.sum("n_tokens").over(w) - F.col("n_tokens"), F.lit(0))
    out = d.withColumn("start_off", start.cast("long"))
    last_tok = F.col("start_off") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    return out.select(
        id_col,
        "bucket",
        "start_off",
        "n_tokens",
        F.floor(F.col("start_off") / budget).cast("long").alias("pack_first"),
        F.floor(last_tok / budget).cast("long").alias("pack_last"),
    )
