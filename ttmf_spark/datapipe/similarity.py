"""Similarity search over `embeddings(vec_id, embedding array<float>, label)`.

- brute_force_topk: exact cosine top-k per query — the correctness
  baseline. Dot products via F.zip_with + F.aggregate (JVM-side); top-k
  via a rank window. At scale the query side is broadcast (queries are
  few), so the corpus scan stays shuffle-free until the final per-query
  top-k (which AQE handles as a skewless k-row-per-query agg).
- lsh_topk: random-hyperplane (sign-LSH) bucketed variant — the scale
  path: corpus hashed once into 2^p buckets; each query probes its own
  bucket (+ Hamming-1 multi-probe when enabled), exact cosine within the
  probed buckets; ann_recall is the recall@k gate against the brute
  truth.
- embedding_near_dup_pairs: all corpus pairs with cosine >= tau via
  banded sign-LSH candidate equi-join + exact verification (the O(n^2)
  cross join survives only as ``embedding_near_dup_pairs_exact``, the
  tiny-scale test oracle twin).

Scores are computed in float64 and rounded to 6 decimals so results are
reproducible across engines (DuckDB oracle parity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def with_unit_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize vectors (cast to double) so cosine = dot."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = _norm(v)
    return emb.withColumn(
        "_unit", F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(v)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos) exact top-k by cosine.

    Self-matches (same id) are excluded. Ties broken by neighbor id asc.
    """
    c = with_unit_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_unit").alias("_cv")
    )
    q = with_unit_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_unit").alias("_qv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(_dot(F.col("_cv"), F.col("_qv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def hyperplanes(dim: int, p: int = 8, seed: int = 42) -> list[list[float]]:
    """p deterministic random hyperplanes (driver-side, tiny)."""
    rng = np.random.default_rng(seed)
    return rng.normal(size=(p, dim)).tolist()


def _bucket_expr(vec_col, planes: list[list[float]]):
    bits = []
    for i, h in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in h])
        d = _dot(F.transform(F.col(vec_col), lambda x: x.cast("double")), arr)
        bits.append(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    p: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    multi_probe: bool = False,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket equi-join then exact cosine.

    Recall < 1 by construction (candidates limited to the probed
    buckets); hash-gated against the driver oracle (seeded hyperplanes
    inlined as literals on both sides). One shuffle on bucket.

    ``multi_probe``: probe the query's own bucket PLUS every bucket at
    Hamming distance 1 (each of the p sign bits flipped) — the standard
    multi-probe LSH recall fix (measured on the driver gate at p=4, k=5:
    recall@5 0.14 -> ~3x better for (p+1)x candidate work; the
    `emb_ann_recall` query is the gate that quantifies this tradeoff).
    Probe buckets are distinct by construction, so no candidate dedup is
    needed; the corpus side is hashed ONCE either way.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, p, seed)
    c = with_unit_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_unit").alias("_cv"),
        _bucket_expr(vec_col, planes).alias("bucket"),
    )
    q = with_unit_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_unit").alias("_qv"),
        _bucket_expr(vec_col, planes).alias("bucket"),
    )
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(p)],
        )
        q = q.withColumn("bucket", F.explode(probes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(_dot(F.col("_cv"), F.col("_qv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def embedding_near_dup_pairs_exact(
    corpus: DataFrame,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact (a < b, cos >= tau) pairs via the O(n^2) cross join.

    Exactness baseline / test oracle twin ONLY — a cartesian product is
    the canonical scale-killer; the production path is
    ``embedding_near_dup_pairs`` (banded sign-LSH + exact verify).
    """
    u = with_unit_norm(corpus, vec_col)
    a = u.select(F.col(id_col).alias("a"), F.col("_unit").alias("_va"))
    b = u.select(F.col(id_col).alias("b"), F.col("_unit").alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", F.round(_dot(F.col("_va"), F.col("_vb")), 6))
        .filter(F.col("cos") >= tau)
        .select("a", "b", "cos")
    )


def band_bucket_udf(planes: np.ndarray):
    """pandas UDF: embedding -> array of per-band sign-LSH bucket codes.

    ``planes`` has shape (bands, bits, dim); element i of the output is
    band i's bucket in [0, 2^bits). One numpy matmul per Arrow batch —
    no per-row Python, no per-plane Catalyst fold.
    """
    bands, bits, dim = planes.shape
    flat = planes.reshape(bands * bits, dim).T  # (dim, bands*bits)
    weights = (1 << np.arange(bits)).astype(np.int64)

    @pandas_udf("array<long>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        X = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
        signs = (X @ flat >= 0).reshape(len(X), bands, bits)
        codes = signs @ weights  # (n, bands)
        return pd.Series(list(codes.astype(np.int64)))

    return _buckets


def embedding_near_dup_pairs(
    corpus: DataFrame,
    tau: float = 0.95,
    bands: int = 32,
    bits: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(a < b, cos >= tau) pairs: banded sign-LSH candidates + exact verify.

    Candidate generation: ``bands`` independent ``bits``-bit hyperplane
    sketches; a pair is a candidate iff it collides in >=1 band (equi-join
    on (band, bucket) — no cartesian). Exact cosine verification keeps
    only true pairs, so precision is 1.0; recall is 1-(1-p^bits)^bands
    with p = 1 - theta/pi per hyperplane. ``bits`` defaults from tau:
    low tau (far threshold) needs short band codes to keep per-band
    collision probability up; high tau (true near-dup) affords longer
    codes and therefore smaller buckets. The per-fixture recall of the
    default (tau=0.4 -> bits=2, bands=32: miss ~1e-7/pair) is pinned by
    the driver oracle at sf0.01.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    if bits is None:
        bits = 2 if tau < 0.6 else (4 if tau < 0.85 else 8)
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(bands, bits, dim))
    u = with_unit_norm(corpus, vec_col).select(
        F.col(id_col).alias("_id"), F.col("_unit")
    )
    bucketed = u.withColumn(
        "_bb", band_bucket_udf(planes)(F.col("_unit"))
    ).select("_id", F.posexplode("_bb").alias("_band", "_bucket"))
    # both self-join sides consume the sketch index, and it contains a
    # Python UDF pass over every vector — materialize once (bands x
    # n_vec narrow rows). The unit-norm frame u is deliberately NOT
    # checkpointed: its two verify-side consumers are a narrow
    # scan+normalize recompute, cheaper at corpus scale than
    # materializing a full float copy of the embedding table.
    bucketed = bucketed.localCheckpoint(eager=True)
    a = bucketed.select(
        F.col("_id").alias("a"), "_band", "_bucket"
    )
    b = bucketed.select(
        F.col("_id").alias("b"), "_band", "_bucket"
    )
    cand = (
        a.join(b, ["_band", "_bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    va = u.select(F.col("_id").alias("a"), F.col("_unit").alias("_va"))
    vb = u.select(F.col("_id").alias("b"), F.col("_unit").alias("_vb"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .withColumn("cos", F.round(_dot(F.col("_va"), F.col("_vb")), 6))
        .filter(F.col("cos") >= tau)
        .select("a", "b", "cos")
    )


# --- IVF (inverted-file) ANN ------------------------------------------------


def ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(cell, cv) centroid table: ``n_cells`` unit vectors hash-sampled
    from the corpus.

    Centroids are the corpus rows with the smallest
    ``hash64(id)`` (ties by id) — a deterministic sample, the standard
    centroid init for IVF training. Selection is a distributed top-k
    (``orderBy().limit()`` = TakeOrdered, no global window); cell ids are
    assigned on the driver over the n_cells-row result (model-sized).
    No cross-row float aggregation anywhere, so the md5 variant is
    byte-identical in the DuckDB oracle.
    """
    from ttmf_spark.datapipe.dedup import hash64

    spark = corpus.sparkSession
    u = with_unit_norm(corpus, vec_col)
    top = (
        u.select(
            F.col(id_col).alias("_id"),
            F.col("_unit"),
            hash64(F.col(id_col).cast("string"), seed, hash_fn).alias("_h"),
        )
        .orderBy("_h", "_id")
        .limit(n_cells)
        .collect()
    )
    rows = [(i, list(r["_unit"])) for i, r in enumerate(top)]
    return spark.createDataFrame(rows, schema="cell int, cv array<double>")


def ivf_assign(
    vecs: DataFrame,
    centroids: DataFrame,
    out_id: str,
    n_best: int = 1,
) -> DataFrame:
    """Assign each unit vector to its ``n_best`` nearest centroids.

    ``vecs`` must carry (out_id, _unit). One broadcast nested-loop against
    the (tiny) centroid table, then a per-vector rank window (partitioned
    by vector id — hash-distributed, NOT a global window). Cosines are
    rounded to 6 decimals before ranking so the argmax is reproducible
    across engines; ties break toward the lower cell id.
    """
    scored = vecs.crossJoin(F.broadcast(centroids)).withColumn(
        "_cc", F.round(_dot(F.col("_unit"), F.col("cv")), 6)
    )
    w = Window.partitionBy(out_id).orderBy(F.col("_cc").desc(), F.col("cell").asc())
    return (
        scored.withColumn("_cr", F.row_number().over(w))
        .filter(F.col("_cr") <= n_best)
        .drop("cv", "_cc", "_cr")
    )


def ivf_refine(
    corpus_units: DataFrame, centroids: DataFrame, iters: int = 2
) -> DataFrame:
    """Lloyd refinement of the centroid table (production path).

    Each iteration: assign every corpus vector to its nearest centroid,
    recompute per-cell element-wise means (dim-many ``avg`` aggregates —
    one map-side-combined groupBy, JVM-only), renormalize to unit. The
    cross-row float sums make results order-sensitive in the last ulp, so
    this path is pytest/rows-only; the oracle-exact driver query uses the
    unrefined hash-sampled centroids (iters=0).
    """
    dim = len(centroids.select("cv").first()[0])
    for _ in range(iters):
        assigned = ivf_assign(corpus_units, centroids, "_rid")
        means = assigned.groupBy("cell").agg(
            F.array(*[F.avg(F.col("_unit")[i]) for i in range(dim)]).alias("_m")
        )
        nrm = _norm(F.col("_m"))
        centroids = means.select(
            "cell",
            F.when(nrm > 0, F.transform(F.col("_m"), lambda x: x / nrm))
            .otherwise(F.col("_m"))
            .alias("cv"),
        ).localCheckpoint(eager=True)
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    refine_iters: int = 0,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Approximate top-k via an IVF index: (query_id, neighbor_id, rank, cos).

    Corpus vectors are bucketed by nearest centroid (the inverted file);
    each query probes its ``n_probe`` nearest cells and ranks candidates
    by exact cosine within them. Recall < 1 by construction (candidates
    limited to probed cells). Scale shape: the index assignment is a
    narrow scan x n_cells broadcast; the candidate join is a bucket
    equi-join on cell — never all-pairs. ``refine_iters > 0`` runs Lloyd
    steps on the centroids (see ivf_refine for why the oracle-exact
    driver query keeps 0).
    """
    cents = ivf_centroids(corpus, n_cells, seed, id_col, vec_col, hash_fn)
    if refine_iters:
        cu = with_unit_norm(corpus, vec_col).select(
            F.col(id_col).alias("_rid"), "_unit"
        )
        cents = ivf_refine(cu, cents, refine_iters)
    cents = cents.localCheckpoint(eager=True)
    c = with_unit_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_unit")
    )
    c_cells = ivf_assign(c, cents, "neighbor_id").withColumnRenamed("_unit", "_cv")
    q = with_unit_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_unit")
    )
    q_cells = ivf_assign(q, cents, "query_id", n_best=n_probe).withColumnRenamed(
        "_unit", "_qv"
    )
    scored = (
        c_cells.join(F.broadcast(q_cells), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(_dot(F.col("_cv"), F.col("_qv")), 6))
        .select("query_id", "neighbor_id", "cos")
    )
    # no distinct needed: each neighbor lives in exactly one cell, so a
    # (query, neighbor) pair appears at most once across the probes
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def ann_recall(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """(query_id, n_hits, recall): per-query overlap of an approximate
    top-k result with the exact top-k — the index-quality gate a pipeline
    runs before trusting an ANN index (recall@k). Both inputs are k rows
    per query (dim-sized relative to the corpus), so the semi-join and
    the per-query agg are trivially cheap at any corpus scale; the cost
    lives in the two top-k inputs, not here."""
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    qs = exact.select("query_id").distinct()
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        F.round(F.coalesce("n_hits", F.lit(0)) / F.lit(float(k)), 6).alias(
            "recall"
        ),
    )


def semantic_dedup(
    corpus: DataFrame,
    n_cells: int = 16,
    tau: float = 0.4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): assign
    every embedding to its nearest IVF cell, then inside each cell mark
    any vector whose rounded cosine to a LOWER-id cellmate reaches
    ``tau`` as a duplicate of the smallest such id. Output one row per
    vector: (vec_id, cell, dup_of, kept) with dup_of = -1 for keepers —
    the keep-list a curation pipeline joins against before training.

    Scale story: the quadratic compare is confined to one cell
    (the SemDeDup design point — clustering caps the pair space), so cost
    is sum over cells of |cell|^2, not N^2. In production n_cells grows
    with the corpus (~N / target_cell_size, e.g. 100k cells for 10^8
    docs) keeping |cell| constant and giving the self-join full shuffle
    parallelism on the cell key; at fixture scale 16 cells already bound
    the compare to ~1/16 of the cross product. Centroids are the
    hash-sampled deterministic init (ivf_centroids) so the DuckDB twin is
    byte-identical under hash_fn='md5'; the Lloyd-refined centroid path
    (ivf_refine) plugs in unchanged as the rows-only production variant.
    Same-cell misses (near-dups straddling a cell boundary) are the
    documented SemDeDup recall trade; the sign-LSH near-dup operator
    (embedding_near_dup_pairs) is the higher-recall alternative.
    """
    u = with_unit_norm(corpus, vec_col).select(id_col, "_unit")
    cents = ivf_centroids(
        corpus, n_cells=n_cells, seed=seed, id_col=id_col,
        vec_col=vec_col, hash_fn=hash_fn,
    )
    assign = ivf_assign(u, cents, id_col, n_best=1)
    assign = assign.localCheckpoint(eager=True)  # consumed twice below
    a = assign.select(
        F.col("cell"), F.col(id_col).alias("_a"), F.col("_unit").alias("_ua")
    )
    b = assign.select(
        F.col("cell"), F.col(id_col).alias("_b"), F.col("_unit").alias("_ub")
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("_a") < F.col("_b"))
        .withColumn("_cos", F.round(_dot(F.col("_ua"), F.col("_ub")), 6))
        .filter(F.col("_cos") >= tau)
    )
    dup = pairs.groupBy(F.col("_b").alias(id_col)).agg(
        F.min("_a").alias("_dup_of")
    )
    return (
        assign.select(id_col, "cell")
        .join(dup, id_col, "left")
        .select(
            id_col,
            F.col("cell").cast("int").alias("cell"),
            F.coalesce("_dup_of", F.lit(-1)).cast("long").alias("dup_of"),
            F.col("_dup_of").isNull().alias("kept"),
        )
    )
