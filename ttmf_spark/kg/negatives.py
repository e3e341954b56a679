"""Deterministic negative-example generation (reference `KGE/src/data/Data.java`
and `get_triples/process_triples.py:35-63`).

The reference draws negatives with `Math.random()` / `np.random.randint`
(non-seeded), so exact value parity is impossible *by the reference's own
construction* — two reference runs disagree with each other. We therefore
make the draw a pure function of the triple content via ``xxhash64``
(documented deviation, SURVEY.md §7(e)): same input -> same negatives on
every run, every partitioning, every cluster size. No Python RNG, no UDF —
the whole generator is column expressions.

Scale notes: the candidate entity pool is dim-sized and broadcast; draws
are `pmod(xxhash64(...), |pool|)` joined back against the pool's dense row
index, so the fact side does one broadcast join per draw attempt, no
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# bounded rejection sampling: probability that k independent draws all
# collide with {h, t} is (2/|pool|)^k — at |pool|>=10 and k=8 it is < 1e-5
# per row; a final coalesce to a shifted draw keeps the column total.
N_ATTEMPTS = 8


def _indexed_pool(entities: DataFrame) -> DataFrame:
    """(name) -> (idx, name) with dense 0..n-1 index (distributed rank)."""
    from ttmf_spark.kg.encode import dense_ids

    pool = dense_ids(entities.select("name").distinct(), "name")
    return pool.select(F.col("id").alias("_idx"), "name")


def tc_pairs(triples: DataFrame, seed: int = 17) -> DataFrame:
    """(s, p, o) -> alternating pos/neg labeled pairs (s, p, o, flag, seq).

    Reference Data.java:52-79: per positive, corrupt head (draw>=0.5) or
    tail (draw<0.5) with a random entity from the *same split's* entity set,
    rejecting draws equal to either h or t; emit pos (flag 1) then neg
    (flag -1). ``seq`` preserves the pos/neg interleaving order the
    reference gets from file adjacency (needed by the stable-sort tie-break
    in threshold scans).
    """
    pool = _indexed_pool(
        triples.select(F.col("s").alias("name")).unionByName(
            triples.select(F.col("o").alias("name"))
        )
    )
    n = pool.count()
    base = triples.withColumn(
        # bounded positive row key: xxhash64 spans the full long range and
        # seq arithmetic (*2, +1) would overflow under ANSI mode
        "_row", F.pmod(F.xxhash64("s", "p", "o", F.lit(seed)), F.lit(1 << 61))
    ).withColumn("_side", (F.pmod(F.col("_row"), F.lit(2)) == 0))
    # k candidate draws per row; first one not in {s, o} wins
    draw_cols = [
        F.pmod(F.xxhash64("s", "p", "o", F.lit(seed + 1 + i)), F.lit(n)).alias(f"_d{i}")
        for i in range(N_ATTEMPTS)
    ]
    base = base.select("*", *draw_cols)
    pool_b = F.broadcast(pool)
    for i in range(N_ATTEMPTS):
        p = pool_b.select(
            F.col("_idx").alias(f"_d{i}"), F.col("name").alias(f"_c{i}")
        )
        base = base.join(p, f"_d{i}", "left")
    cand = F.coalesce(
        *[
            F.when(
                (F.col(f"_c{i}") != F.col("s")) & (F.col(f"_c{i}") != F.col("o")),
                F.col(f"_c{i}"),
            )
            for i in range(N_ATTEMPTS)
        ],
        F.col("_c0"),  # astronomically unlikely fallback; keeps NOT NULL
    )
    labeled = base.withColumn("_neg", cand)
    pos = labeled.select(
        "s", "p", "o", F.lit(1).alias("flag"), (F.col("_row") * 2).alias("seq")
    )
    neg = labeled.select(
        F.when(F.col("_side"), F.col("_neg")).otherwise(F.col("s")).alias("s"),
        F.col("p"),
        F.when(F.col("_side"), F.col("o")).otherwise(F.col("_neg")).alias("o"),
        F.lit(-1).alias("flag"),
        (F.col("_row") * 2 + 1).alias("seq"),
    )
    return pos.unionByName(neg)


def tc_pairs_ids(
    id_triples: DataFrame, n_ent: int, seed: int = 17, hash_fn: str = "xxhash64"
) -> DataFrame:
    """Id-level pos/neg pairs (h, t, r, flag, seq) — Data.java semantics on
    already-encoded triples; the corruption pool is the full dense entity id
    range [0, n_ent) so no pool join is needed at all: the draw IS the id.
    ``hash_fn='md5'`` is the DuckDB-portable variant (oracle parity).
    """
    hrt = ["h", "r", "t"]
    base = id_triples.withColumn(
        "_row", F.pmod(_portable_hash(hrt, seed, hash_fn), F.lit(1 << 61))
    ).withColumn("_side", (F.pmod(F.col("_row"), F.lit(2)) == 0))
    cand = F.coalesce(
        *[
            F.when(
                (F.pmod(_portable_hash(hrt, seed + 1 + i, hash_fn), F.lit(n_ent)) != F.col("h"))
                & (F.pmod(_portable_hash(hrt, seed + 1 + i, hash_fn), F.lit(n_ent)) != F.col("t")),
                F.pmod(_portable_hash(hrt, seed + 1 + i, hash_fn), F.lit(n_ent)),
            )
            for i in range(N_ATTEMPTS)
        ],
        F.pmod(F.col("h") + 1, F.lit(n_ent)),  # deterministic fallback != h
    )
    labeled = base.withColumn("_neg", cand)
    pos = labeled.select(
        "h", "t", "r", F.lit(1).alias("flag"), (F.col("_row") * 2).alias("seq")
    )
    neg = labeled.select(
        F.when(F.col("_side"), F.col("_neg")).otherwise(F.col("h")).alias("h"),
        F.when(F.col("_side"), F.col("t")).otherwise(F.col("_neg")).alias("t"),
        F.col("r"),
        F.lit(-1).alias("flag"),
        (F.col("_row") * 2 + 1).alias("seq"),
    )
    return pos.unionByName(neg)


def _portable_hash(cols, seed: int, fn: str):
    """xxhash64 (production) or the md5 60-bit trick (byte-identical in
    DuckDB: ``('0x'||substr(md5(seed||'|'||a||'|'||b),1,15))::BIGINT``)."""
    if fn == "xxhash64":
        return F.xxhash64(*cols, F.lit(seed))
    joined = F.concat_ws("|", F.lit(str(seed)), *[F.col(c).cast("string") for c in cols])
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")


def kgc_candidates(
    test2id: DataFrame,
    target: str,
    pool_size: int,
    incorrect_count: int = 5,
    seed: int = 23,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """KGC candidate sets (reference process_triples.py:35-63, hr_/h_t/_rt).

    ``target`` in {'h', 'r', 't'}: group test triples by the two non-target
    columns, keep the MINIMUM target per group (A2 dedup — the reference
    keeps pandas groupby().first(), i.e. file order; file order does not
    exist under arbitrary partitioning, so the documented tie rule here is
    min(target): deterministic under any partitioning, and identical to the
    reference whenever a (h, r) group has a single triple). Then emit
    ``incorrect_count`` hash-derived fills of the target slot (ids drawn
    uniformly from [0, pool_size) — the reference draws ids from the full
    dictionary range, NOT rejecting collisions with the truth) plus the true
    value, all flagged 1.
    """
    others = [c for c in ("h", "t", "r") if c != target]
    first = test2id.groupBy(*others).agg(F.min(target).alias(target))
    fills = F.array(
        *[
            F.pmod(_portable_hash(others, seed + i, hash_fn), F.lit(pool_size))
            for i in range(incorrect_count)
        ]
    )
    return (
        first.withColumn("_cand", F.concat(fills, F.array(F.col(target).cast("long"))))
        .select(*others, F.explode("_cand").alias(target))
        .select("h", "t", "r", F.lit(1).alias("flag"))
    )
