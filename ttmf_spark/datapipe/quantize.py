"""Product quantization (PQ) for embedding compression — the codebook
side of billion-scale ANN (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011): split each D-dim vector into
``m`` subvectors, learn ``k`` codewords per subspace, store each vector
as m small codes (m*log2(k) bits instead of 4*D bytes). Complements the
IVF index (similarity.ivf_topk) — IVF prunes the search space, PQ
shrinks what's scanned inside a cell.

Codebook init mirrors similarity.ivf_centroids: per subspace, the k
corpus rows with the smallest salted hash (deterministic sample, the
standard kmeans init before Lloyd refinement — kept at init for the
oracle-exact driver query, same contract as ivf refine_iters=0).

Scale shape: the codebook is model-sized (m*k rows) and broadcast;
assignment explodes each vector into its m subvectors (m rows, narrow)
and hash-joins the broadcast codebook on the subspace id — k candidate
rows per subvector that collapse map-side in the min aggregation. No
all-pairs anything; cost is the unavoidable m*k distances per vector.
The subvector slice is a pure array expr, JVM-side end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _prep(corpus: DataFrame, id_col: str, vec_col: str, normalize: bool) -> DataFrame:
    """(id_col, vec_col) with doubles, unit-normalized when asked.

    Normalization makes PQ cosine-consistent: for unit vectors
    ||a - b||^2 = 2 - 2*cos(a, b), so the ADC distance ranks by cosine
    (what the rest of the similarity family measures)."""
    if not normalize:
        return corpus.select(id_col, vec_col)
    from ttmf_spark.datapipe.similarity import with_unit_norm

    return with_unit_norm(corpus, vec_col).select(
        id_col, F.col("_unit").alias(vec_col)
    )


def pq_codebook(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_fn: str = "xxhash64",
    normalize: bool = True,
) -> DataFrame:
    """(sub, code, cw): k codewords per subspace, hash-sampled.

    Per subspace j, codewords are the k corpus rows with the smallest
    ``hash64(id, seed + j)`` (ties by id), sliced to that subspace —
    a distributed TakeOrdered per subspace (no global window), collected
    driver-side only at model size (m*k rows).
    """
    from ttmf_spark.datapipe.dedup import hash64

    spark = corpus.sparkSession
    corpus = _prep(corpus, id_col, vec_col, normalize)
    dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    dlen = dim // m
    u = corpus.select(F.col(id_col).alias("_id"), _as_double(vec_col).alias("_v"))
    rows = []
    for j in range(m):
        top = (
            u.select(
                "_id",
                F.slice("_v", j * dlen + 1, dlen).alias("_sv"),
                hash64(F.col("_id").cast("string"), seed + j, hash_fn).alias("_h"),
            )
            .orderBy("_h", "_id")
            .limit(k)
            .collect()
        )
        rows += [(j, i, list(r["_sv"])) for i, r in enumerate(top)]
    return spark.createDataFrame(
        rows, schema="sub int, code int, cw array<double>"
    )


def pq_assign(
    corpus: DataFrame,
    codebook: DataFrame,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """(vec_id, sub, code, qerr): nearest codeword per subspace.

    ``qerr`` is the squared-L2 quantization error of that subvector
    (rounded 6). Argmin is ``min(struct(dist, code))`` — min-dist with
    min-code tie-break, permutation-invariant.
    """
    corpus = _prep(corpus, id_col, vec_col, normalize)
    # subvector slice bounds are compile-time constants per sub
    first = corpus.select(F.size(vec_col).alias("d")).first()
    dlen = first["d"] // m
    subs = F.array(
        *[
            F.struct(
                F.lit(j).alias("sub"),
                F.slice(_as_double(vec_col), j * dlen + 1, dlen).alias("sv"),
            )
            for j in range(m)
        ]
    )
    e = corpus.select(
        F.col(id_col).alias("vec_id"), F.explode(subs).alias("_s")
    ).select("vec_id", F.col("_s.sub").alias("sub"), F.col("_s.sv").alias("sv"))
    d = e.join(F.broadcast(codebook), "sub").withColumn(
        "_dist",
        F.aggregate(
            F.zip_with("sv", "cw", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    best = (
        d.groupBy("vec_id", "sub")
        .agg(F.min(F.struct(F.col("_dist"), F.col("code"))).alias("_m"))
        .select(
            "vec_id",
            "sub",
            F.col("_m.code").alias("code"),
            F.round(F.col("_m._dist"), 6).alias("qerr"),
        )
    )
    return best


def _explode_subs(
    df: DataFrame, m: int, dlen: int, id_col: str, vec_col: str, out_id: str
) -> DataFrame:
    """(out_id, sub, sv): one narrow row per subvector."""
    subs = F.array(
        *[
            F.struct(
                F.lit(j).alias("sub"),
                F.slice(_as_double(vec_col), j * dlen + 1, dlen).alias("sv"),
            )
            for j in range(m)
        ]
    )
    return df.select(
        F.col(id_col).alias(out_id), F.explode(subs).alias("_s")
    ).select(out_id, F.col("_s.sub").alias("sub"), F.col("_s.sv").alias("sv"))


def _sq_l2():
    return F.aggregate(
        F.zip_with("sv", "cw", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = 16,
    k_codes: int = 32,
    k: int = 5,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_fn: str = "xxhash64",
    normalize: bool = True,
) -> DataFrame:
    """ADC top-k over PQ codes: (query_id, neighbor_id, rank, adist).

    Asymmetric distance computation (Jégou §IV): each query precomputes
    its squared-L2 distance to every codeword (a model-sized table,
    |Q|*m*k rows, broadcast), and a candidate's approximate distance is
    the SUM over subspaces of table[code] — the corpus is scanned as
    codes, never as vectors. Per-entry distances are fixed-point 1e-9
    integers so the cross-row sum is permutation-invariant and the
    DuckDB twin ranks identically (the PCRA integer-sum contract).

    Scale shape: the candidate join is codes x broadcast(query table) on
    the (sub, code) key — m rows per (candidate, query) that collapse
    map-side in the integer sum. This IS a linear scan of the code table
    (what ADC is); production composes it with the IVF cell filter
    (IVF-PQ) so only probed cells are scanned — the composition is a
    filter on the codes frame, unchanged here.
    """
    corpus = _prep(corpus, id_col, vec_col, normalize)
    queries = _prep(queries, id_col, vec_col, normalize)
    dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    dlen = dim // m
    cb = pq_codebook(
        corpus, m, k_codes, seed, id_col, vec_col, hash_fn, normalize=False
    )
    cb = cb.localCheckpoint(eager=True)  # consumed by codes AND qtab
    codes = pq_assign(
        corpus, cb, m, id_col, vec_col, normalize=False
    ).select(F.col("vec_id").alias("neighbor_id"), "sub", "code")
    qe = _explode_subs(queries, m, dlen, id_col, vec_col, "query_id")
    qtab = (
        qe.join(F.broadcast(cb), "sub")
        .withColumn(
            "d_int",
            F.round(_sq_l2() * F.lit(1e9)).cast("long"),
        )
        .select("query_id", "sub", "code", "d_int")
    )
    agg = (
        codes.join(F.broadcast(qtab), ["sub", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d_int").alias("_di"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("_di").asc(), F.col("neighbor_id").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("_di") / F.lit(1e9), 6).alias("adist"),
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = 16,
    k_codes: int = 32,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 11,
    ivf_seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """IVF-PQ: the composed billion-scale ANN path — IVF prunes (only
    ``n_probe`` cells of codes are scanned per query), PQ compresses
    (candidates are ranked by ADC over codes, vectors never touched
    after indexing). (query_id, neighbor_id, rank, adist).

    This variant quantizes the raw unit vectors within cells (IVF-Flat
    cell layout + PQ codes); classic IVFADC quantizes per-cell RESIDUALS
    v - centroid(cell) for finer codes — the same plumbing with one
    zip_with subtraction before pq_assign, left to the production path
    (like ivf_refine) because residual codebooks need Lloyd refinement
    to pay off.

    Scale shape: cells and codes are both per-vector narrow frames
    keyed by id; the probe join is codes-for-candidates x broadcast
    (query cell list + query distance tables). Per query the scan cost
    drops from |corpus| to |probed cells| — the IVF pruning — and each
    candidate costs m integer lookups — the PQ compression.
    """
    # normalize ONCE: the ivf side consumes the same unit vectors the PQ
    # side quantizes (ivf_centroids re-normalizing a unit vector would
    # perturb last bits and desync the oracle)
    raw_corpus, raw_queries = corpus, queries
    corpus = _prep(raw_corpus, id_col, vec_col, normalize=True)
    queries = _prep(raw_queries, id_col, vec_col, normalize=True)
    dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    dlen = dim // m
    cb = pq_codebook(
        corpus, m, k_codes, seed, id_col, vec_col, hash_fn, normalize=False
    )
    cb = cb.localCheckpoint(eager=True)
    codes = pq_assign(
        corpus, cb, m, id_col, vec_col, normalize=False
    ).select(F.col("vec_id").alias("neighbor_id"), "sub", "code")
    qe = _explode_subs(queries, m, dlen, id_col, vec_col, "query_id")
    qtab = (
        qe.join(F.broadcast(cb), "sub")
        .withColumn("d_int", F.round(_sq_l2() * F.lit(1e9)).cast("long"))
        .select("query_id", "sub", "code", "d_int")
    )

    from ttmf_spark.datapipe.similarity import ivf_assign, ivf_centroids

    cents = ivf_centroids(
        raw_corpus, n_cells, ivf_seed, id_col, vec_col, hash_fn
    ).localCheckpoint(eager=True)
    cu = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("_unit"),
    )
    c_cells = ivf_assign(cu, cents, "neighbor_id").select(
        "neighbor_id", "cell"
    )
    qu = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("_unit")
    )
    q_cells = ivf_assign(qu, cents, "query_id", n_best=n_probe).select(
        "query_id", "cell"
    )
    cand = (
        c_cells.join(F.broadcast(q_cells), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    agg = (
        cand.join(codes, "neighbor_id")
        .join(F.broadcast(qtab), ["query_id", "sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("d_int").alias("_di"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("_di").asc(), F.col("neighbor_id").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("_di") / F.lit(1e9), 6).alias("adist"),
        )
    )


def pq_codes(
    corpus: DataFrame,
    m: int = 16,
    k: int = 32,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_fn: str = "xxhash64",
    normalize: bool = True,
) -> DataFrame:
    """Fit + assign in one call — the gated driver entry."""
    corpus = _prep(corpus, id_col, vec_col, normalize)
    cb = pq_codebook(corpus, m, k, seed, id_col, vec_col, hash_fn, normalize=False)
    return pq_assign(corpus, cb, m, id_col, vec_col, normalize=False)
