"""End-to-end TTMF trust scoring over an extracted triple table — the
Spark re-expression of the reference's `full_run.sh` + `Model1.py` flow
(SURVEY.md §3.1): encode -> labeled pairs -> embeddings -> subgraphs ->
personalized PageRank -> RR features -> thresholds -> TransE margins ->
path features -> fusion -> per-triple confidence.

``score_triples`` takes string (s, p, o) triples (e.g. the output of
ttmf_spark.extract.extract_triples) and returns them with a ``conf``
column plus the intermediate features. Stages checkpoint through an
optional StageStore for resume; every distributed step is a DataFrame
op or an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ttmf_spark.checkpoint import StageStore
from ttmf_spark.kg import crisscross, encode, fusion, graph, negatives, pagerank, paths, rrank, transe
from ttmf_spark.kg.threshold import best_threshold


@dataclass
class TTMFModel:
    """Driver-resident fitted artifacts (dim-bounded, broadcastable).

    ``path_ent_emb``/``path_rel_emb`` are the PATH-scoring vectors
    (reference: SearchPaths2 + Model1 load PTransE embeddings,
    Model1.py:162-164, while TransConfidence loads TransE ones). They
    default to the TransE matrices in single-embedding mode."""

    ent_emb: np.ndarray
    rel_emb: np.ndarray
    fusion_weights: object
    fusion_kind: str = "logistic"
    path_ent_emb: np.ndarray | None = None
    path_rel_emb: np.ndarray | None = None
    meta: dict = field(default_factory=dict)

    @property
    def p_ent(self) -> np.ndarray:
        return self.ent_emb if self.path_ent_emb is None else self.path_ent_emb

    @property
    def p_rel(self) -> np.ndarray:
        return self.rel_emb if self.path_rel_emb is None else self.path_rel_emb


@dataclass
class FeatureContext:
    """Shared per-KG DataFrames consumed by the feature attachers."""

    ent_dim: DataFrame
    rel_dim: DataFrame
    id_triples: DataFrame
    dev_pairs: DataFrame
    rr_features: DataFrame
    tc_thresholds: DataFrame
    ranked_paths: DataFrame
    energy_udf: object


def build_context(
    spark: SparkSession,
    triples: DataFrame,
    depth: int = graph.DEFAULT_DEPTH,
    seed: int = 42,
    store: StageStore | None = None,
    transe_kw: dict | None = None,
    ptranse_kw: dict | None = None,
) -> tuple[FeatureContext, TTMFModel]:
    """Fit all shared artifacts for a string (s, p, o) triple table.

    ``ptranse_kw`` (e.g. ``{"epochs": 10}``) switches path ranking and
    the crisscross net's frozen embeddings to a separate PTransE fit —
    the reference's two-embedding setup (TransE -> TransConfidence,
    PTransE -> SearchPaths2/Model1). Default None = single-embedding
    mode (TransE vectors everywhere), the cheap configuration.
    """

    def ck(stage: str, build, **kw) -> DataFrame:
        if store is None:
            df = build()
            return df.localCheckpoint(eager=True)
        return store.materialize(spark, stage, build, **kw)

    # snapshot the input first: it may carry an arbitrarily deep lineage
    # (e.g. the whole extraction pipeline) that every dim build would
    # otherwise recompute from scratch
    triples = ck("triples_raw", lambda: triples)
    ent_dim = ck("entity2id", lambda: encode.entity_dim(triples))
    rel_dim = ck("relation2id", lambda: encode.relation_dim(triples))
    n_ent, n_rel = ent_dim.count(), rel_dim.count()
    id_triples = ck(
        "triples2id", lambda: encode.encode_triples(triples, ent_dim, rel_dim)
    )

    # labeled pos/neg pairs (reference conf_valid2id) from a hash split
    dev_ids = id_triples.filter(
        F.pmod(F.xxhash64("h", "r", "t", F.lit(seed + 7)), F.lit(5)) == 0
    )
    dev_pairs = ck(
        "conf_dev2id", lambda: negatives.tc_pairs_ids(dev_ids, n_ent, seed=seed)
    )

    # embeddings: size-routed seeded trainer (SURVEY.md M4)
    t0 = time.perf_counter()
    ent_emb, rel_emb = transe.fit_embeddings_from_df(
        id_triples, n_ent, n_rel, seed=seed, **(transe_kw or {})
    )
    if store is not None:
        store.log_timing("transe_fit", time.perf_counter() - t0)
    energy_udf = transe.transe_energy_col(spark, ent_emb, rel_emb)
    if ptranse_kw is not None:
        t0 = time.perf_counter()
        p_ent, p_rel = transe.fit_embeddings_from_df(
            id_triples, n_ent, n_rel, seed=seed, kernel="ptranse", **ptranse_kw
        )
        if store is not None:
            store.log_timing("ptranse_fit", time.perf_counter() - t0)
    else:
        p_ent, p_rel = ent_emb, rel_emb

    # graph stages over the full extracted KG
    adj = ck("adjacency", lambda: graph.build_adjacency(id_triples))
    edges_w = graph.weighted_edges(adj)
    all_queries = (
        id_triples.select("h", "r", "t")
        .unionByName(dev_pairs.select("h", "r", "t"))
        .distinct()
    )
    cores = all_queries.select(F.col("h").alias("core")).distinct()
    reach = ck("reach", lambda: graph.reach_sets(adj, cores, depth))
    sg_edges = ck(
        "sg_edges",
        lambda: graph.subgraph_edges(edges_w, reach, depth),
        partition_by=None,
    )
    sg_nodes = graph.subgraph_nodes(sg_edges, cores)
    patched = pagerank.patched_edges(sg_edges, sg_nodes)
    ranks = ck("entity_rank", lambda: pagerank.pagerank_routed(patched, sg_nodes))

    rr_th = rrank.rr_thresholds(dev_pairs, ranks)
    degrees = graph.subgraph_degrees(sg_edges)
    depths = reach.select("core", "node", "depth")
    rr_feat = ck(
        "rr_features",
        lambda: rrank.rr_feature_table(ranks, degrees, depths, rr_th),
    )

    # TransE per-relation thresholds from dev-pair energies (asc variant)
    dev_scored = transe.add_transe_energy(dev_pairs, energy_udf).withColumn(
        "score", F.col("energy")
    )
    tc_th = ck(
        "tc_thresholds",
        lambda: best_threshold(dev_scored, "r", ascending=True),
    )

    # bounded paths for every query triple
    ex_edges = paths.exploded_edges(adj)
    seeds = all_queries.select("h").distinct()
    cand = paths.enumerate_paths(ex_edges, seeds)
    score_udf = paths.path_score_udf(spark, p_ent, p_rel)
    align_udf = paths.path_align_udf(spark, p_rel)
    ranked = ck(
        "ranked_paths",
        lambda: paths.ranked_paths(cand, all_queries, score_udf, align_udf),
    )

    ctx = FeatureContext(
        ent_dim=ent_dim,
        rel_dim=rel_dim,
        id_triples=id_triples,
        dev_pairs=dev_pairs,
        rr_features=rr_feat,
        tc_thresholds=tc_th,
        ranked_paths=ranked,
        energy_udf=energy_udf,
    )
    model = TTMFModel(
        ent_emb=ent_emb,
        rel_emb=rel_emb,
        fusion_weights=None,
        path_ent_emb=None if ptranse_kw is None else p_ent,
        path_rel_emb=None if ptranse_kw is None else p_rel,
        meta={"n_ent": n_ent, "n_rel": n_rel, "seed": seed},
    )
    return ctx, model


def attach_features(ctx: FeatureContext, query: DataFrame) -> DataFrame:
    """(h, r, t, ...) -> + trans_conf, rr_features, path summaries."""
    out = transe.add_transe_energy(query, ctx.energy_udf)
    out = transe.transe_confidence(out, ctx.tc_thresholds)
    out = rrank.attach_rr_features(out, ctx.rr_features)
    out = fusion.attach_path_summary(out, ctx.ranked_paths)
    return out


def fit_fusion(
    ctx: FeatureContext,
    model: TTMFModel,
    kind: str = "logistic",
    seed: int = 42,
    fit_kw: dict | None = None,
) -> TTMFModel:
    """Train the fusion layer on the labeled dev pairs (driver-side).

    ``fit_kw`` (crisscross only) forwards budget knobs to
    crisscross.fit_crisscross — e.g. {"epochs": 20, "max_steps": 4000}
    bounds the benched tier's fit wall time independent of dev-set size.
    ``fit_kw={"distributed": True/False}`` forces the M6 fit route;
    unset, it is SIZE-ROUTED like transe.fit_embeddings_from_df: labeled
    sets <= ``driver_max_rows`` (default 2M rows — a query-set-sized dev
    split; ~50 ms/step driver Adam beats per-epoch Spark rounds, BENCH.md
    "Distributed-fit M6 tier") fit on the driver, larger ones go through
    fit_crisscross_distributed and never land on the driver.
    """
    feats = attach_features(ctx, ctx.dev_pairs)
    if kind == "crisscross":
        feats = paths.path_features(feats, ctx.ranked_paths)
        kw = dict(fit_kw or {})
        driver_max_rows = kw.pop("driver_max_rows", 2_000_000)
        distributed = kw.pop("distributed", None)
        feats = feats.select(*crisscross.CC_INPUT_COLS, "flag")
        if distributed is None:
            # snapshot so the routing count and the fit's collect/shard
            # pass share ONE materialization of the feature joins
            feats = feats.localCheckpoint(eager=True)
            distributed = feats.count() > driver_max_rows
        if distributed:
            # labeled set never lands on the driver (M6 distributed route)
            model.fusion_weights = crisscross.fit_crisscross_distributed(
                feats, model.p_ent, model.p_rel, seed=seed, **kw,
            )
            model.fusion_kind = kind
            return model
        pdf = feats.toPandas()
        y = (pdf["flag"].to_numpy() == 1).astype(np.float64)
        # frozen embeddings = the PATH vectors (Model1 loads PTransE ones)
        model.fusion_weights = crisscross.fit_crisscross(
            crisscross.batch_from_pandas(pdf), y, model.p_ent, model.p_rel,
            seed=seed, **kw,
        )
        model.fusion_kind = kind
        return model
    pdf = feats.select(*fusion.FEATURE_COLS, "flag").toPandas()
    X = fusion.feature_matrix(pdf)
    y = (pdf["flag"].to_numpy() == 1).astype(np.float64)
    if kind == "mlp":
        model.fusion_weights = fusion.fit_mlp(X, y, seed=seed)
    else:
        model.fusion_weights = fusion.fit_logistic(X, y)
    model.fusion_kind = kind
    return model


def score_ids(
    spark: SparkSession,
    ctx: FeatureContext,
    model: TTMFModel,
    query: DataFrame,
    infer_partitions: int | str | None = "auto",
    emb_tables: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Attach the fused ``conf`` column to an id-triple query frame.

    ``emb_tables`` (ent_df, rel_df of (id, vec)) routes crisscross
    inference through ``add_confidence_gather`` — the billion-vocab
    path that ships each shard only the embedding rows it touches
    instead of broadcasting the full matrices (pairs with
    ``fit_embeddings_table``, whose entity output is already a table).

    ``infer_partitions`` sizes the inference stage's parallelism
    ("auto" = 2x defaultParallelism; None = inherit upstream). This
    repartition exists because nothing else sets it by COMPUTE: the
    feature joins are all broadcast (no shuffle) and scan/AQE
    partitioning sizes by BYTES, so a byte-small query frame — e.g. one
    read back from a checkpoint — reaches the pandas-UDF stage as a
    handful of partitions and the forward pass runs nearly serial (the
    round-3 "crisscross transfer" mystery: an event-level probe,
    scripts/probe_cc_infer2.py, measured the whole 74.5k-row stage in
    ONE Python worker — 5.8s of kernel on one core, with Arrow transfer
    of the nine padded path columns at ~0.2s and packing them into one
    column worth ~nothing). Python-UDF stages must be partitioned for
    CPU, not bytes; one narrow-row round-robin shuffle of the query
    stream buys full-cluster inference at any input size.
    """
    if infer_partitions == "auto":
        infer_partitions = 2 * spark.sparkContext.defaultParallelism
    feats = attach_features(ctx, query)
    if model.fusion_kind == "crisscross":
        feats = paths.path_features(feats, ctx.ranked_paths)
        if emb_tables is not None:
            # gather route shards itself (hash on (h, t, r)); the
            # cogroup exchange replaces the CPU repartition
            return crisscross.add_confidence_gather(
                feats, model.fusion_weights, *emb_tables
            )
        if infer_partitions:
            feats = feats.repartition(infer_partitions)
        udf = crisscross.crisscross_udf(
            spark, model.fusion_weights, model.p_ent, model.p_rel
        )
        return crisscross.add_confidence(feats, udf)
    if infer_partitions:
        feats = feats.repartition(infer_partitions)
    if model.fusion_kind == "mlp":
        udf = fusion.mlp_udf(spark, model.fusion_weights)
    else:
        udf = fusion.logistic_udf(spark, model.fusion_weights)
    return fusion.add_confidence(feats, udf)


def score_triples(
    spark: SparkSession,
    triples: DataFrame,
    kind: str = "logistic",
    depth: int = graph.DEFAULT_DEPTH,
    seed: int = 42,
    store: StageStore | None = None,
    transe_kw: dict | None = None,
    ptranse_kw: dict | None = None,
    fusion_kw: dict | None = None,
) -> tuple[DataFrame, TTMFModel]:
    """Full flow: string (s, p, o) -> (s, p, o, conf, ...features).

    The flagship "query" of the engine (SURVEY.md §3.3): per-triple
    confidence from the three fused trust levels. ``fusion_kw`` forwards
    fit-budget knobs to the fusion tier (see fit_fusion).
    """
    ctx, model = build_context(
        spark, triples, depth=depth, seed=seed, store=store,
        transe_kw=transe_kw, ptranse_kw=ptranse_kw,
    )
    t0 = time.perf_counter()
    model = fit_fusion(ctx, model, kind=kind, seed=seed, fit_kw=fusion_kw)
    if store is not None:
        store.log_timing("fusion_fit", time.perf_counter() - t0)
    scored = score_ids(spark, ctx, model, ctx.id_triples)
    names = scored.join(
        F.broadcast(ctx.ent_dim.select(F.col("id").alias("h"), F.col("name").alias("s"))),
        "h",
    ).join(
        F.broadcast(ctx.ent_dim.select(F.col("id").alias("t"), F.col("name").alias("o"))),
        "t",
    ).join(
        F.broadcast(ctx.rel_dim.select(F.col("id").alias("r"), F.col("name").alias("p"))),
        "r",
    )
    return names.select("s", "p", "o", "conf", "trans_conf", "rr_features"), model


def lowest_confidence(
    scored: DataFrame,
    k: int = 100,
    threshold: float | None = None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Error report (reference find_errors.py:54-67): optional conf<theta
    filter (P5) + global bottom-k (W5, TakeOrderedAndProject).

    ``tie_cols`` pins the order among equal-conf rows (the reference's
    list sort is stable on file order, which has no distributed analogue).
    """
    out = scored
    if threshold is not None:
        out = out.filter(F.col("conf") < threshold)
    order = [F.col("conf").asc()] + [F.col(c).asc() for c in (tie_cols or [])]
    return out.orderBy(*order).limit(k)
