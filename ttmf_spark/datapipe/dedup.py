"""Deduplication operators over `documents`: exact, n-gram Jaccard
(exact inverted-index), MinHash+LSH (approximate scale path), SimHash,
and embedding-cosine near-dup.

Scale design:

- exact_dedup: one hash-groupBy on the normalized-text digest; at 100 TB
  the digest (16 bytes) shuffles, never the text.
- jaccard_pairs: EXACT near-dup pairs via the inverted-index pattern:
  explode shingles -> self-join on shingle -> per-pair overlap count ->
  Jaccard from overlap and per-doc shingle counts. Guaranteed recall
  (J >= tau > 0 implies a shared shingle); df-pruning drops shingles in
  more than ``max_df`` docs (stopword shingles create quadratic hot keys —
  THE skew hazard of this operator; documented, and exactness holds
  whenever tau > (df-pruned loss bound)).
- minhash_lsh_pairs: the approximate scale path: k xxhash64 min-hashes ->
  b bands -> band-bucket join -> candidate pairs -> exact-Jaccard verify.
  Probabilistic recall (1-(1-J^r)^b); oracle-checked rows-only.
- simhash64: 64-bit SimHash from token hashes via bit-vote aggregation —
  pure expressions (explode + groupBy + bit ops).
- embedding_near_dup: cosine >= tau pairs over `embeddings` (exact
  brute-force via block self-join; the LSH-bucketed variant lives in
  similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ttmf_spark.datapipe.textstats import with_fingerprint


def hash64(col, seed: int = 0, fn: str = "xxhash64"):
    """Deterministic 64-bit-ish hash of a string column.

    ``xxhash64`` (default): JVM-native, fastest — the production path.
    ``md5``: first 15 hex digits of md5(seed || value) as a positive
    60-bit integer — byte-identical in DuckDB
    (``('0x'||substr(md5(seed||v),1,15))::BIGINT``), used wherever an
    exact cross-engine oracle is wanted.
    """
    if fn == "xxhash64":
        return F.xxhash64(col, F.lit(seed))
    return F.conv(F.substring(F.md5(F.concat(F.lit(str(seed)), col)), 1, 15), 16, 10).cast(
        "long"
    )


def u60(col, seed: int = 0, fn: str = "xxhash64"):
    """Uniform non-negative 60-bit draw from a string column — the single
    point of truth for the fold-to-60-bits idiom shared by mixture
    sampling, stratified sampling, and sequence packing (the SQL twins
    mirror it as ``% 2^60``; md5 mode is already 60-bit, xxhash64 folds
    exactly since 2^64 is a multiple of 2^60)."""
    return F.pmod(hash64(col, seed=seed, fn=fn), F.lit(1 << 60))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id document per exact (normalized) text duplicate set.

    Returns (doc_id, fingerprint, dup_count) for survivors.
    """
    fp = with_fingerprint(docs, text_col)
    return fp.groupBy("fingerprint").agg(
        F.min(id_col).alias(id_col), F.count("*").alias("dup_count")
    ).select(id_col, "fingerprint", "dup_count")


def shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(doc_id, shingle): distinct word n-grams of the normalized text.

    Word shingles via slide over the token array — built-ins only:
    transform over index sequence + array_join.
    """
    toks = F.filter(F.split(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "), " "), lambda t: t != "")
    d = docs.select(F.col(id_col), toks.alias("_toks")).withColumn(
        "_n", F.size("_toks")
    )
    grams = F.when(
        F.col("_n") >= n,
        F.transform(
            F.sequence(F.lit(0), F.col("_n") - n),
            lambda i: F.array_join(F.slice("_toks", i + 1, n), " "),
        ),
    ).otherwise(F.array(F.array_join("_toks", " ")))
    return (
        d.select(id_col, F.explode(F.array_distinct(grams)).alias("shingle"))
        .filter(F.col("shingle") != "")
    )


def jaccard_pairs(
    docs: DataFrame,
    tau: float = 0.8,
    n: int = 3,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs (a < b, jaccard >= tau).

    Inverted-index self-join; optional document-frequency pruning of hot
    shingles (skew guard). NOTE on max_df semantics: sizes AND overlaps
    are computed after pruning, so the Jaccard value SHIFTS for any pair
    that shares a pruned shingle (e.g. 9/11 -> 8/10) — pairs near tau can
    be both dropped and newly admitted. This matches the standard
    "stopword-shingle removal" semantics (the pruned shingle is treated
    as never part of either document); it is NOT a candidates-only prune.
    """
    sh = shingles(docs, text_col, id_col, n)
    if max_df:
        keep = sh.groupBy("shingle").count().filter(F.col("count") <= max_df)
        sh = sh.join(keep.select("shingle"), "shingle", "left_semi")
    # sizes + both self-join sides consume sh (and the max_df prune adds
    # two more consumers of the raw shingle stream): materialize once
    sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    overlap = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb"))
    return (
        overlap.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .filter(F.col("jaccard") >= tau)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    docs: DataFrame, k: int = 64, n: int = 3, text_col: str = "text", id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, sig array<long>[k]): k min-hashes per document.

    Fast path (xxhash64): ONE base hash per shingle + k affine
    permutations ``(a_i * h + b_i) mod p`` with p = 2^31 - 1 — the classic
    universal-hashing MinHash construction; k full hashes per shingle
    would cost k times the CPU for no extra quality. The md5 path keeps
    per-seed full hashes because it exists for byte-exact DuckDB oracle
    parity, not speed.
    """
    sh = shingles(docs, text_col, id_col, n)
    if hash_fn == "xxhash64":
        p = (1 << 31) - 1  # Mersenne prime: products stay < 2^62 (no ANSI overflow)
        rng = __import__("numpy").random.default_rng(1234567)
        a = F.array(*[F.lit(int(rng.integers(1, p))) for _ in range(k)])
        b = F.array(*[F.lit(int(rng.integers(0, p))) for _ in range(k)])
        # one base hash per shingle, ONE groupBy(doc) collecting the
        # base hashes, then all k mins as a single nested-transform
        # expression over the (a, b) literal array — data-side loops in
        # one generated operator. (Two rejected shapes: k wide min()
        # aggregates compile a pathologically large codegen stage —
        # seconds of Janino per run; and posexplode-ing the k
        # permutations into rows multiplies the shingle stream k-fold
        # through a two-level shuffle — ~256M rows at sf0.1, measured 8x
        # slower than this plan on the signatures stage alone, 3.9s vs
        # 0.5s warm.)
        base = F.pmod(F.xxhash64(F.col("shingle")), F.lit(p))
        ab = F.zip_with(a, b, lambda ai, bi: F.struct(ai.alias("a"), bi.alias("b")))
        return (
            sh.select(id_col, base.alias("_h"))
            .groupBy(id_col)
            .agg(F.collect_list("_h").alias("_hs"))
            .select(
                id_col,
                F.transform(
                    ab,
                    lambda s: F.array_min(
                        F.transform(
                            "_hs", lambda h: F.pmod(s["a"] * h + s["b"], F.lit(p))
                        )
                    ),
                ).alias("sig"),
            )
        )
    mins = [
        F.min(hash64(F.col("shingle"), i, hash_fn)).alias(f"_m{i}") for i in range(k)
    ]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(id_col, F.array(*[f"_m{i}" for i in range(k)]).alias("sig"))


def minhash_buckets(
    docs: DataFrame,
    k: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, band, bucket): the banded-LSH index rows for each doc —
    r = k/bands signature entries hashed per band. Per-doc independent
    (no cross-doc state), which is what lets the streaming path index
    each micro-batch with the identical code (streaming.near_dup_stream)
    and accumulate the rows as the index sink."""
    assert k % bands == 0
    r = k // bands
    sig = minhash_signatures(docs, k, n, text_col, id_col, hash_fn)
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        hash64(
                            F.concat_ws(",", *[F.element_at("sig", bi * r + j + 1) for j in range(r)]),
                            1000 + bi,
                            hash_fn,
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def minhash_lsh_pairs(
    docs: DataFrame,
    tau: float = 0.8,
    k: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Approximate near-dup pairs: banded minhash bucket join + exact
    Jaccard verification of the candidates. r = k/bands rows per band."""
    bucketed = minhash_buckets(docs, k, bands, n, text_col, id_col, hash_fn)
    # the index feeds both sides of the self-join; materialize once
    # (bands x n_docs rows — the index itself, linear state) instead of
    # recomputing the shingle->signature pipeline per side
    bucketed = bucketed.localCheckpoint(eager=True)
    ca = bucketed.select(F.col(id_col).alias("a"), "band", "bucket")
    cb = bucketed.select(F.col(id_col).alias("b"), "band", "bucket")
    cand = (
        ca.join(cb, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # exact verify on candidates only
    return verify_jaccard(docs, cand, tau, n, text_col, id_col)


def verify_jaccard(
    docs: DataFrame,
    cand: DataFrame,
    tau: float,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard over candidate (a, b) pairs only — the verification
    half shared by the batch LSH path and streaming.near_dup_stream. The
    re-shingle is a narrow recompute bounded by the candidate set: docs
    prune to the candidate ids BEFORE the shingle explode (the id dim is
    LSH-bounded — candidates, not corpus — so AQE broadcasts it and the
    three shingle consumers below scan only candidate docs; without the
    prune, sizes/sa/sb each re-shingled the full corpus, ~4.8s of the
    old 5.9s sf0.1 wall for 256 pairs)."""
    # candidates are consumed three times below (ids x2, common);
    # materialize once so a caller's expensive lineage (the whole LSH
    # index build) doesn't re-execute per consumer. Distributed +
    # candidate-set-bounded, never driver-resident.
    cand = cand.localCheckpoint(eager=True)
    ids = (
        cand.select(F.col("a").alias(id_col))
        .unionByName(cand.select(F.col("b").alias(id_col)))
        .distinct()
    )
    sh = shingles(docs.join(ids, id_col), text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col(id_col).alias("a"), "shingle")
    sb = sh.select(F.col(id_col).alias("b"), "shingle")
    common = (
        cand.join(sa, "a").join(sb, ["b", "shingle"]).groupBy("a", "b").agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb")), "b")
        .withColumn("jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common")))
        .filter(F.col("jaccard") >= tau)
    )
    return out.select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def simhash64(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", hash_fn: str = "xxhash64"
) -> DataFrame:
    """(doc_id, simhash): 64-bit SimHash over whitespace tokens.

    Bit b of the hash is 1 iff the sum over tokens of sign(bit b of
    xxhash64(token)) is positive. explode -> groupBy(doc) x 64 conditional
    sums — all JVM-side.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    t = docs.select(id_col, F.explode(toks).alias("tok")).withColumn(
        "th", hash64(F.col("tok"), 0, hash_fn)
    )
    votes = [
        F.sum(
            F.when(F.col("th").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"_v{b}")
        for b in range(63)  # bit 63 = sign bit; skip to stay positive
    ]
    agg = t.groupBy(id_col).agg(*votes)
    sim = None
    for b in range(63):
        bit = F.when(F.col(f"_v{b}") > 0, F.lit(1).cast("long") * (1 << b)).otherwise(
            F.lit(0).cast("long")
        )
        sim = bit if sim is None else sim + bit
    return agg.select(id_col, sim.alias("simhash"))


def simhash_near_dup(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Pairs within ``max_hamming`` SimHash bits, via 4-block bucketing
    (pigeonhole: <=3 differing bits => at least one of 4 16-bit blocks is
    equal) + exact popcount verify.

    Pigeonhole soundness: pairs within ``max_hamming`` differing bits are
    guaranteed a shared block only when the hash's 63 used bits partition
    into ``max_hamming + 1`` blocks — so the block count follows the
    threshold (the earlier fixed 4x16 scheme silently lost recall for any
    max_hamming > 3; caught when the exact DuckDB oracle replaced the
    rows-only check)."""
    sh = simhash64(docs, text_col, id_col, hash_fn)
    n_blocks = max_hamming + 1
    # contiguous cover of bits 0..62 (bit 63 is always 0 by construction)
    bounds = [round(i * 63 / n_blocks) for i in range(n_blocks + 1)]
    blocks = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("simhash", bounds[i])
                        .bitwiseAND(F.lit((1 << (bounds[i + 1] - bounds[i])) - 1))
                        .alias("val"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.blk", "bb.val")
    # both self-join sides consume the block index: materialize once
    # (n_blocks x n_docs narrow rows) instead of recomputing the
    # token-hash SimHash pipeline per side
    blocks = blocks.localCheckpoint(eager=True)
    a = blocks.select(F.col(id_col).alias("a"), F.col("simhash").alias("sa"), "blk", "val")
    b = blocks.select(F.col(id_col).alias("b"), F.col("simhash").alias("sb"), "blk", "val")
    cand = (
        a.join(b, ["blk", "val"]).filter(F.col("a") < F.col("b")).select("a", "b", "sa", "sb").distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("a", "b", "hamming")


def near_dup_clusters(
    docs: DataFrame,
    tau: float = 0.8,
    k: int = 64,
    bands: int = 16,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup cluster canonicalization: the dedup DECISION step.

    MinHash-LSH pairs (``minhash_lsh_pairs``) are the edges of an
    undirected near-dup graph; connected components — the same
    small/large-star loop + driver-union-find routing used for entity
    canonicalization (extract/canonicalize.py, Kiveris et al.) — label
    every cluster with its minimum doc id. Output is (doc_id, rep_id,
    keep) for EVERY input doc: unpaired docs represent themselves,
    ``keep = 1`` marks the one representative a training pipeline
    retains per cluster.

    Scale: the edge set is near-dup-bounded (≪ corpus), the component
    map is dim-sized and broadcast back against the corpus scan — the
    full text never shuffles.
    """
    from ttmf_spark.extract.canonicalize import canonical_map

    pairs = minhash_lsh_pairs(
        docs, tau=tau, k=k, bands=bands, n=n,
        text_col=text_col, id_col=id_col, hash_fn=hash_fn,
    )
    mapping = canonical_map(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    return (
        docs.select(id_col)
        .join(F.broadcast(mapping), F.col(id_col) == F.col("entity"), "left")
        .select(
            F.col(id_col),
            F.coalesce("canonical", F.col(id_col)).alias("rep_id"),
        )
        .withColumn("keep", (F.col("rep_id") == F.col(id_col)).cast("int"))
    )


def containment_pairs(
    docs: DataFrame,
    tau: float = 0.8,
    n: int = 3,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Broder CONTAINMENT near-dup pairs (a < b,
    common / min(|A|, |B|) >= tau): catches subset duplicates — a short
    doc quoted whole inside a longer one — which Jaccard misses (the
    union in its denominator dilutes the score as the container grows).
    Same inverted-index self-join and max_df skew-guard semantics as
    jaccard_pairs (pruning removes the shingle from both documents).
    """
    sh = shingles(docs, text_col, id_col, n)
    if max_df:
        keep = sh.groupBy("shingle").count().filter(F.col("count") <= max_df)
        sh = sh.join(keep.select("shingle"), "shingle", "left_semi")
    # sizes + both self-join sides consume sh (and the max_df prune adds
    # two more consumers of the raw shingle stream): materialize once
    sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    overlap = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb"))
    return (
        overlap.join(sa, "a")
        .join(sb, "b")
        .withColumn("containment", F.col("common") / F.least("na", "nb"))
        .filter(F.col("containment") >= tau)
        .select("a", "b", F.round("containment", 6).alias("containment"))
    )


def segment_dup_stats(
    docs: DataFrame,
    k: int = 20,
    tau: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment-level exact duplication profile (the Lee et al. 2021
    "Deduplicating Training Data" ExactSubstr idea at pipeline
    granularity, RefinedWeb's line-dedup analogue for unstructured
    text): chop each document into consecutive non-overlapping ``k``-word
    segments, hash every segment, count occurrences CORPUS-WIDE, and
    report per doc how much of it is duplicated text. A within-doc
    repeat counts too — suffix-array counting does not care which
    document the other copy lives in, and neither do we.

    Output: (doc_id, n_segs, n_dup_segs, dup_frac, keep) where a segment
    is "dup" iff its global occurrence count > 1 and
    ``keep = dup_frac < tau``.

    Scale shape: explode is linear in corpus words; the only shuffle is
    a groupBy on the 32-hex md5 segment digest (uniform by construction
    — no skew; a boilerplate segment repeated across millions of docs
    makes one hot COUNT cell, which map-side partial aggregation absorbs)
    followed by a digest-keyed broadcast-unfriendly join that stays a
    shuffle hash join on the same key — co-partitioned with the count,
    so AQE plans it without an extra exchange. Nothing quadratic: unlike
    pair-emitting dedup (jaccard/minhash), output is one row per doc.
    """
    w = docs.select(id_col, F.split(F.col(text_col), " ").alias("_w"))
    n_seg = F.ceil(F.size("_w") / F.lit(float(k))).cast("int")
    segs = (
        w.select(
            id_col,
            F.explode(F.sequence(F.lit(0), n_seg - 1)).alias("_i"),
            "_w",
        )
        .select(
            id_col,
            F.md5(
                F.array_join(F.slice("_w", F.col("_i") * k + 1, k), " ")
            ).alias("_h"),
        )
    )
    gc = segs.groupBy("_h").agg(F.count("*").alias("_c"))
    return (
        segs.join(gc, "_h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_segs"),
            F.sum((F.col("_c") > 1).cast("long")).alias("n_dup_segs"),
        )
        .withColumn(
            "dup_frac", F.round(F.col("n_dup_segs") / F.col("n_segs"), 6)
        )
        .withColumn("keep", F.col("dup_frac") < tau)
    )
