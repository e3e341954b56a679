"""Driver-facing query builders: every entry in __spark_entry__.queries()
is defined here, one function per operator family, mirroring the DuckDB
oracles in ttmf_spark.oracles / oracles_kg / oracles_docs.

Each takes (spark, sf_dir) and returns a DataFrame whose column names and
values match the paired oracle SQL exactly (aliases + rounding included).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ttmf_spark import corpus
from ttmf_spark.datapipe import dedup, multimodal, similarity, textstats
from ttmf_spark.extract import extract_triples
from ttmf_spark.kg import encode, graph, negatives, pagerank, paths
from ttmf_spark.kg.threshold import best_threshold


# --- corpus / extraction (front end) ---------------------------------------


def q_span_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.flat_spans(spark, sf_dir)


def q_extract_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = corpus.interleaved_docs(spark, sf_dir)
    gaz = corpus.gazetteer(spark, sf_dir)
    same = corpus.same_as_edges(spark, sf_dir)
    return extract_triples(docs, gaz, same)


# --- KG layer ---------------------------------------------------------------


def _dims(spark, sf_dir):
    truth = corpus.truth_triples(spark, sf_dir)
    return truth, encode.entity_dim(truth), encode.relation_dim(truth)


def q_kg_entity2id(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, e_dim, _ = _dims(spark, sf_dir)
    return e_dim


def q_kg_triples2id(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth, e_dim, r_dim = _dims(spark, sf_dir)
    return encode.encode_triples(truth, e_dim, r_dim)


def _edges(spark, sf_dir):
    truth, e_dim, r_dim = _dims(spark, sf_dir)
    ids = encode.encode_triples(truth, e_dim, r_dim)
    adj = graph.build_adjacency(ids)
    return e_dim, graph.weighted_edges(adj), adj


def q_kg_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges, _ = _edges(spark, sf_dir)
    return edges.select(
        "src",
        "dst",
        "n_rels",
        F.array_join(F.transform("rels", lambda r: r.cast("string")), ",").alias(
            "rels_str"
        ),
        F.round("w", 6).alias("w"),
    )


def _cores(e_dim, like: str, mod: int):
    return e_dim.filter(
        F.col("name").startswith(like)
        & (F.substring("name", 2, 30).cast("long") % mod == 0)
    ).select(F.col("id").alias("core"))


def q_kg_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    e_dim, edges, adj = _edges(spark, sf_dir)
    cores = _cores(e_dim, "O", 100)
    return graph.reach_sets(adj, cores, depth=4, checkpoint=False)


def q_kg_subgraph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    e_dim, edges, adj = _edges(spark, sf_dir)
    cores = _cores(e_dim, "O", 100)
    reach = graph.reach_sets(adj, cores, depth=4, checkpoint=False)
    sg = graph.subgraph_edges(edges, reach, depth=4)
    return sg.select("core", "src", "dst", F.round("w", 6).alias("w"))


def q_kg_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    e_dim, edges, adj = _edges(spark, sf_dir)
    cores = _cores(e_dim, "O", 100)
    reach = graph.reach_sets(adj, cores, depth=4, checkpoint=False)
    sg = graph.subgraph_edges(edges, reach, depth=4).localCheckpoint(eager=True)
    return graph.subgraph_degrees(sg).unionByName(
        # isolated cores (no edges at all) still appear with 0/0 degrees
        cores.select(F.col("core"), F.col("core").alias("node"))
        .join(sg.select("core").distinct(), "core", "left_anti")
        .select(
            "core",
            "node",
            F.lit(0).cast("long").alias("in_deg"),
            F.lit(0).cast("long").alias("out_deg"),
        )
    )


def q_kg_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e_dim, _, adj = _edges(spark, sf_dir)
    heads = _cores(e_dim, "O", 500).select(F.col("core").alias("h"))
    p = paths.enumerate_paths(paths.exploded_edges(adj), heads)
    edge_strs = F.transform(
        F.arrays_zip("ph", "pt", "pr"),
        lambda e: F.concat(
            F.lit("("), e["ph"].cast("string"), F.lit(","),
            e["pt"].cast("string"), F.lit(","), e["pr"].cast("string"), F.lit(")"),
        ),
    )
    return p.select("h", "t", F.array_join(edge_strs, "").alias("path"), "len")


def q_kg_threshold_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pairs = cust.select(
        F.col("c_nationkey").cast("long").alias("grp"),
        (((F.col("c_custkey") * 2654435761) % 100000).cast("double") / 1000.0).alias(
            "score"
        ),
        F.when((F.col("c_custkey") * 7919) % 3 == 0, 1).otherwise(-1).alias("flag"),
        F.col("c_custkey").cast("long").alias("seq"),
    )
    out = best_threshold(pairs, "grp", ascending=True)
    return out.select("grp", F.round("threshold", 9).alias("threshold"))


def q_kg_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check (iterative fixpoint — not SQL-expressible)."""
    e_dim, edges, adj = _edges(spark, sf_dir)
    cores = _cores(e_dim, "O", 100)
    reach = graph.reach_sets(adj, cores, depth=4, checkpoint=False)
    # snapshot: the subgraph is referenced ~6x by nodes/dangling/patched —
    # without truncation the whole reach lineage recomputes each time
    sg = graph.subgraph_edges(edges, reach, depth=4).localCheckpoint(eager=True)
    nodes = graph.subgraph_nodes(sg, cores)
    patched = pagerank.patched_edges(sg, nodes)
    return pagerank.pagerank_grouped(patched).select(
        "core", "node", F.round("pr", 6).alias("pr")
    )


def q_kg_tc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check (xxhash64 draws have no DuckDB equivalent)."""
    truth, e_dim, r_dim = _dims(spark, sf_dir)
    ids = encode.encode_triples(truth, e_dim, r_dim)
    n_ent = e_dim.count()
    return negatives.tc_pairs_ids(ids, n_ent, seed=17)


# --- data pipeline: text ----------------------------------------------------


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.with_token_counts(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "n_subwords"
    )


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = textstats.with_quality_score(_docs(spark, sf_dir))
    return q.select(
        "doc_id",
        F.round("len_score", 6).alias("len_score"),
        F.round("stop_ratio", 6).alias("stop_ratio"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("mean_token_len", 6).alias("mean_token_len"),
        F.round("quality", 6).alias("quality"),
    )


def q_doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.with_lang_id(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.with_fingerprint(_docs(spark, sf_dir)).select(
        "doc_id", "fingerprint"
    )


def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_docs(spark, sf_dir))


def q_doc_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_pairs(_docs(spark, sf_dir), tau=0.8, n=3)


def q_doc_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir), tau=0.8, k=16, bands=8, n=3, hash_fn="md5"
    )


def q_doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash64(_docs(spark, sf_dir), hash_fn="md5")


def q_doc_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: pair set is determined by simhash (oracle-covered above)."""
    return dedup.simhash_near_dup(_docs(spark, sf_dir), max_hamming=8, hash_fn="md5")


# --- data pipeline: embeddings ---------------------------------------------


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_emb_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return similarity.brute_force_topk(emb, queries, k=5)


def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_near_dup_pairs(_emb(spark, sf_dir), tau=0.4)


def q_emb_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: approximate by construction."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return similarity.lsh_topk(emb, queries, k=5, p=4, dim=64)


# --- data pipeline: multimodal ---------------------------------------------


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: fake decode is hash-seeded (no SQL equivalent)."""
    flat = corpus.flat_spans(spark, sf_dir)
    media = multimodal.media_table(flat)
    feats = multimodal.extract_features(media)
    return feats.select(
        "media_ref", "kind", F.round(F.element_at("features", 1), 4).alias("f0")
    )
