"""Physical-plan audit: print .explain('formatted') for the flagship
stages and assert the plan properties we design for — broadcast joins on
dim tables, pushed filters/pruned schemas on parquet scans, whole-stage
codegen coverage, no unexpected cartesian products.

Usage: python scripts/explain_audit.py [sf_dir]  (writes PLANS.md)
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ttmf_spark import corpus  # noqa: E402
from ttmf_spark.datapipe import dedup, similarity  # noqa: E402
from ttmf_spark.extract import extract_triples  # noqa: E402
from ttmf_spark.kg import encode, graph  # noqa: E402
from ttmf_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


CHECKS = {
    "broadcast_joins": "BroadcastHashJoin",
    "codegen": "codegen id",
    "aqe": "AdaptiveSparkPlan",
}


def audit(name: str, df, out: list, expect: list[str] = (), forbid: list[str] = ()):
    p = plan_of(df)
    flags = {k: (pat in p) for k, pat in CHECKS.items()}
    problems = [e for e in expect if e not in p] + [f"FORBIDDEN:{f}" for f in forbid if f in p]
    out.append((name, p, flags, problems))
    status = "OK" if not problems else f"ISSUES: {problems}"
    print(f"[{name}] {flags} {status}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan_audit", cores=8)
    out: list = []

    docs = corpus.interleaved_docs(spark, sf_dir)
    gaz = corpus.gazetteer(spark, sf_dir)
    same = corpus.same_as_edges(spark, sf_dir)
    ext = extract_triples(docs, gaz, same)
    audit("extract_triples", ext, out,
          expect=["BroadcastHashJoin"], forbid=["CartesianProduct"])
    # the detect UDF must appear exactly ONCE: a two-consumer plan silently
    # recomputes the whole detect->link subtree (ReuseExchange does not
    # fire across differently-pruned branches)
    n_detect = plan_of(ext).count("MapInPandas (")
    print(f"[extract_single_detect] map_in_pandas_nodes={n_detect}")
    out.append(("extract_single_detect", "", {"nodes": n_detect},
                [] if n_detect == 1 else ["detect subtree computed twice"]))

    truth = corpus.truth_triples(spark, sf_dir)
    e_dim, r_dim = encode.entity_dim(truth), encode.relation_dim(truth)
    ids = encode.encode_triples(truth, e_dim, r_dim)
    audit("encode_triples", ids, out, expect=["BroadcastHashJoin"],
          forbid=["CartesianProduct"])

    adj = graph.build_adjacency(ids)
    audit("adjacency", adj, out, forbid=["CartesianProduct"])

    docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet")
    audit(
        "minhash_pairs",
        dedup.minhash_lsh_pairs(docs_tbl, tau=0.8, k=16, bands=8),
        out,
        forbid=["CartesianProduct"],
    )
    # column pruning: token-count scan should read only doc_id + text
    from ttmf_spark.datapipe import textstats

    tc = textstats.with_token_counts(docs_tbl).select("doc_id", "n_tokens")
    p = plan_of(tc)
    pruned = "ReadSchema: struct<doc_id:bigint,text:string>" in p
    print(f"[column_pruning] pruned_scan={pruned}")
    out.append(("token_count_pruning", p, {"pruned": pruned}, [] if pruned else ["scan reads extra columns"]))

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    audit("similarity_topk", similarity.brute_force_topk(emb, qs, k=5), out,
          expect=["BroadcastNestedLoopJoin"])  # deliberate broadcast cross join

    # all-pairs near-dup must go through LSH buckets, never a cartesian
    audit(
        "emb_near_dup_lsh",
        similarity.embedding_near_dup_pairs(emb, tau=0.4),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )

    # IVF: bucket equi-join on cell, no cartesian candidate generation
    audit(
        "emb_ivf_topk",
        similarity.ivf_topk(emb, qs, k=5, n_cells=8, n_probe=2),
        out,
        forbid=["CartesianProduct"],
    )

    # event ops: single hash shuffle each, codegen end to end, no UDFs
    from ttmf_spark.datapipe import events as evops

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    audit("evt_sessions", evops.sessionize(ev), out,
          forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython"])
    # (no codegen-marker expect: AQE's pre-execution formatted plan omits
    # codegen ids; the no-Python forbid below is the meaningful JVM check)
    audit("evt_windowed", evops.windowed_counts(ev), out,
          forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython"])

    # multimodal frame plan: pure column ops + explode — stays JVM-side
    from ttmf_spark import queries as Q

    audit(
        "media_frame_plan",
        Q.q_media_frame_plan(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BatchEvalPython"],
    )

    # near-dup clustering: LSH pairs -> iterative min-label CC. The loop
    # localCheckpoints between sweeps, so the audited plan is the final
    # join+agg sweep — must be hash joins, never cartesian.
    audit(
        "doc_near_dup_clusters",
        Q.q_doc_near_dup_clusters(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )

    # corpus top-k n-grams: explode -> partial+final hash agg -> one
    # top-k sort; all JVM-side (no Python), one shuffle for the count.
    audit(
        "doc_top_ngrams",
        Q.q_doc_top_ngrams(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython"],
    )

    # per-source curation stats: single hash agg w/ exact percentiles,
    # JVM-side end to end.
    audit(
        "doc_source_stats",
        Q.q_doc_source_stats(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython"],
    )

    # repetition stats: per-row array exprs only — NO shuffle (no
    # Exchange), no Python, no join; the whole op rides the scan
    audit(
        "doc_repetition",
        Q.q_doc_repetition(spark, sf_dir),
        out,
        forbid=["Exchange", "CartesianProduct", "MapInPandas", "BatchEvalPython"],
    )

    # Adamic-Adar: the z self-join must be a hash join with the degree
    # guard applied BEFORE it; no cartesian, no Python
    audit(
        "kg_common_neighbors",
        Q.q_kg_common_neighbors(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython"],
    )

    # decontamination: eval shingle dim must broadcast; the corpus-side
    # shingle rows must never hit a shuffle except the per-doc rollup
    audit(
        "doc_contamination",
        Q.q_doc_contamination(spark, sf_dir),
        out,
        expect=["BroadcastHashJoin"],
        forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # PII redaction: pure regexp projection — rides the scan, NO exchange
    # of any kind, no Python
    audit(
        "doc_pii_redact",
        Q.q_doc_pii_redact(spark, sf_dir),
        out,
        forbid=["Exchange", "CartesianProduct", "MapInPandas", "BatchEvalPython"],
    )

    # mixture sampling: weights dim broadcasts; the only exchange allowed
    # is that broadcast (no shuffle — the keep decision rides the scan)
    audit(
        "doc_mixture_sample",
        Q.q_doc_mixture_sample(spark, sf_dir),
        out,
        expect=["BroadcastHashJoin"],
        forbid=["Arguments: hashpartitioning", "Arguments: SinglePartition",
                "CartesianProduct", "MapInPandas", "BatchEvalPython"],
    )

    # sequence packing: exactly one hash shuffle (the bucket streams) and
    # NEVER a single-partition global window
    pk = Q.q_doc_pack_plan(spark, sf_dir)
    audit(
        "doc_pack_plan",
        pk,
        out,
        expect=["Arguments: hashpartitioning"],
        forbid=["Arguments: SinglePartition", "CartesianProduct",
                "MapInPandas", "BatchEvalPython"],
    )
    n_shuffle = plan_of(pk).count("Arguments: hashpartitioning")
    print(f"[doc_pack_plan_single_shuffle] shuffles={n_shuffle}")
    out.append(("doc_pack_plan_single_shuffle", "", {"shuffles": n_shuffle},
                [] if n_shuffle == 1 else ["more than one shuffle"]))

    # fixed-iteration PageRank: grouped-Arrow kernel (FlatMapGroupsInPandas
    # is the design), dim joins broadcast, never a cartesian
    audit(
        "kg_pagerank_fixed",
        Q.q_kg_pagerank_fixed(spark, sf_dir),
        out,
        expect=["FlatMapGroupsInPandas"],
        forbid=["CartesianProduct"],
    )

    # triangles: degree-ordered orientation -> equi-joins only, and the
    # skeleton snapshots keep the plan linear (bounded Exchange count)
    tr = Q.q_kg_triangles(spark, sf_dir)
    audit(
        "kg_triangles",
        tr,
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython"],
    )
    n_ex = plan_of(tr).count("Exchange")
    print(f"[kg_triangles_linear_plan] exchanges={n_ex}")
    out.append(("kg_triangles_linear_plan", "", {"exchanges": n_ex},
                [] if n_ex <= 40 else ["plan blowup: encode subtree replicated"]))

    # centroid classifier inference: model is inlined literals — the
    # classify map must ride the scan with NO exchange of any kind
    audit(
        "emb_classify",
        Q.q_emb_classify(spark, sf_dir),
        out,
        forbid=["Exchange", "CartesianProduct", "MapInPandas",
                "BatchEvalPython"],
    )

    # two-phase per-source rankings + samplers: no single-partition
    # window anywhere (the hot-domain killer), global top-k via
    # TakeOrderedAndProject
    audit(
        "doc_top_quality",
        Q.q_doc_top_quality(spark, sf_dir),
        out,
        forbid=["Arguments: SinglePartition", "CartesianProduct",
                "MapInPandas", "BatchEvalPython"],
    )
    audit(
        "doc_source_tfidf",
        Q.q_doc_source_tfidf(spark, sf_dir),
        out,
        forbid=["Arguments: SinglePartition", "CartesianProduct",
                "MapInPandas", "BatchEvalPython"],
    )
    audit(
        "doc_weighted_sample",
        Q.q_doc_weighted_sample(spark, sf_dir),
        out,
        expect=["TakeOrderedAndProject"],
        forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython"],
    )
    audit(
        "evt_funnel",
        Q.q_evt_funnel(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython"],
    )
    audit(
        "evt_retention",
        Q.q_evt_retention(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython"],
    )
    # LM score: the vocabulary model must BROADCAST to the token stream
    # (a shuffle join on the token would hot-key every stopword)
    audit(
        "doc_lm_score",
        Q.q_doc_lm_score(spark, sf_dir),
        out,
        expect=["BroadcastHashJoin"],
        forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython"],
    )
    audit(
        "doc_containment_pairs",
        Q.q_doc_containment_pairs(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython"],
    )
    audit(
        "kg_calibration",
        Q.q_kg_calibration(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # k-core peel: the audited plan is the final sweep (the loop
    # localCheckpoints between sweeps) — degree agg + two semi-joins,
    # equi only
    audit(
        "kg_kcore",
        Q.q_kg_kcore(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython"],
    )

    # co-occurrence PMI: gazetteer probes broadcast, per-doc pair
    # self-join is an equi-join on doc_id, marginals broadcast, top-k via
    # TakeOrderedAndProject — never a cartesian
    audit(
        "kg_cooccurrence",
        Q.q_kg_cooccurrence(spark, sf_dir),
        out,
        expect=["BroadcastHashJoin", "TakeOrderedAndProject"],
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )

    # label propagation: audited plan is the final sweep (loop
    # localCheckpoints) — one equi-join + two hash aggs, JVM-side
    audit(
        "kg_communities",
        Q.q_kg_communities(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # HITS: audited plan is the final round — equi-joins + map-side-
    # combinable sums; the 1-row max rejoins via broadcast (a deliberate
    # BroadcastNestedLoopJoin, like similarity_topk), never a global window
    audit(
        "kg_hits",
        Q.q_kg_hits(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # ER blocking: per-block equi self-join on the blocking key with the
    # size cap BEFORE it; trigram verify is pure array exprs — no Python
    audit(
        "kg_er_candidates",
        Q.q_kg_er_candidates(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # PQ assignment: subvector explode (x m, narrow) + broadcast hash
    # join on the subspace id + map-side-combinable struct-min argmin
    audit(
        "emb_pq_codes",
        Q.q_emb_pq_codes(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # PQ ADC top-k: code-table scan x broadcast query distance tables on
    # the (sub, code) key; integer-sum collapse + per-query top-k window
    audit(
        "emb_pq_topk",
        Q.q_emb_pq_topk(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # KMV sketch: distinct + two-phase bounded top-k (salt-bucket then
    # per-source) — per-key windows only, no global sort
    audit(
        "doc_kmv_distinct",
        Q.q_doc_kmv_distinct(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # IVF-PQ: cell equi-join prune + codes x broadcast query tables; the
    # centroid assignment is a deliberate tiny-table BNLJ (as in ivf_topk)
    audit(
        "emb_ivfpq_topk",
        Q.q_emb_ivfpq_topk(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # Random walks: per step two one-row-per-walk equi-joins (degree draw
    # + indexed neighbor lookup); the neighbor index is a PER-KEY window
    audit(
        "kg_walks",
        Q.q_kg_walks(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # Skip-gram pairs: per-walk band self-join (bounded 2*window*L rows
    # per sentence) + one map-side-combinable pair-count agg
    audit(
        "kg_walk_pairs",
        Q.q_kg_walk_pairs(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # PCRA 2-hop: midpoint self-equi-join with the degree guard applied
    # BEFORE the join; integer fixed-point agg, JVM-side end to end
    audit(
        "kg_path_reliability",
        Q.q_kg_path_reliability(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # segment dedup: explode + digest groupBy + same-key join — the only
    # shuffles are on the md5 digest and doc_id, no Python anywhere
    audit(
        "doc_segment_dedup",
        Q.q_doc_segment_dedup(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # connected components: audited plan is the post-convergence label
    # join (the contraction loop localCheckpoints per round) — equi-joins
    # only, JVM-side
    audit(
        "kg_components",
        Q.q_kg_components(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # SemDeDup: centroid assignment is the deliberate tiny-table BNLJ
    # (as in ivf_topk); the pair compare is a cell equi-join on the
    # checkpointed assignment — never a cartesian, no Python
    audit(
        "emb_semantic_dedup",
        Q.q_emb_semantic_dedup(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # length quantiles: one map-side-combinable hash agg per language —
    # no global sort, JVM-side end to end
    audit(
        "doc_length_quantiles",
        Q.q_doc_length_quantiles(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # anomaly z-scores: dim-sized stats table broadcast back onto the
    # scan — the event table itself never shuffles
    audit(
        "evt_anomaly",
        Q.q_evt_anomaly(spark, sf_dir),
        out,
        expect=["BroadcastHashJoin"],
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # CMS counts: events fold into a width*depth cell table (map-side
    # combinable hash agg) broadcast back onto the key side — the only
    # per-key shuffle is the exact-count QA agg, JVM-side end to end
    audit(
        "evt_cms_counts",
        Q.q_evt_cms_counts(spark, sf_dir),
        out,
        expect=["BroadcastHashJoin"],
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # Bloom decontamination: <= m_bits-row set-bit table probed via
    # k broadcast left joins over the shingle rows — the training side
    # shuffles only at the per-doc rollup, JVM-side end to end
    audit(
        "doc_bloom_contamination",
        Q.q_doc_bloom_contamination(spark, sf_dir),
        out,
        expect=["BroadcastHashJoin"],
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # CMS heavy hitters: cms_counts' broadcast-counter shape plus one
    # deliberate 1-row stream-length broadcast (the only BNLJ). The
    # SinglePartition exchange here is the global COUNT(*) reduce — a
    # 1-row result fed by map-side partials, not a global sort — so the
    # SinglePartition forbid is intentionally omitted for this query.
    audit(
        "evt_heavy_hitters",
        Q.q_evt_heavy_hitters(spark, sf_dir),
        out,
        expect=["BroadcastHashJoin"],
        forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython"],
    )

    # sampled quantiles: two-phase bounded top-k (per-(grp,salt) then
    # per-grp windows — never a global sort) + one percentile agg per
    # side, JVM-side end to end
    audit(
        "doc_sampled_quantiles",
        Q.q_doc_sampled_quantiles(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # ANF neighborhood sizes: audited plan is the post-loop estimate
    # join (each round localCheckpoints) — edge equi-joins + per-node
    # top-k windows only, JVM-side, never a global sort
    audit(
        "kg_anf",
        Q.q_kg_anf(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # DSIR selection: two model-sized bucket aggs -> broadcast lambda
    # table -> per-gram int lookup; the raw side shuffles once at the
    # per-doc rollup, JVM-side end to end
    audit(
        "doc_dsir",
        Q.q_doc_dsir(spark, sf_dir),
        out,
        expect=["BroadcastHashJoin"],
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # JL projection: the matrix is literals compiled into the plan —
    # scan-speed map, zero joins/shuffles/UDFs
    audit(
        "emb_project",
        Q.q_emb_project(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython", "Exchange",
                "Arguments: SinglePartition"],
    )

    # projection distortion gate: one m-keyed equi-join between the two
    # halves of the deterministic pair sample, per-row folds only
    audit(
        "emb_projection_qa",
        Q.q_emb_projection_qa(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # degree histogram: two map-side-combinable degree aggs + one
    # bucket rollup over the node-sized frame, pure integer exprs
    audit(
        "kg_degree_hist",
        Q.q_kg_degree_hist(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # snapshot diff: ONE co-partitioned full-outer join on the triple
    # key, then a relation-dim-sized rollup
    audit(
        "kg_snapshot_diff",
        Q.q_kg_snapshot_diff(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # ER clusters: blocked pair join + star-contraction rounds (each
    # localCheckpointed) + one size rollup; audited plan is the
    # post-contraction label/size join
    audit(
        "kg_er_clusters",
        Q.q_kg_er_clusters(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # by-category rank metrics: rank rows join a broadcast dim-sized
    # category table, then one small agg
    audit(
        "kg_rank_metrics_by_cat",
        Q.q_kg_rank_metrics_by_cat(spark, sf_dir),
        out,
        expect=["BroadcastHashJoin"],
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython"],
    )

    # caption alignment: per-doc windows over the span scan, no join
    # across documents, no UDF
    audit(
        "media_caption_pairs",
        Q.q_media_caption_pairs(spark, sf_dir),
        out,
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # incremental CC: audited plan is the label patch — the merge map
    # joins BROADCAST onto the base label table (the whole point: the
    # big side is touched by one broadcast join, never re-contracted)
    audit(
        "kg_components_delta",
        Q.q_kg_components_delta(spark, sf_dir),
        out,
        expect=["BroadcastHashJoin"],
        forbid=["CartesianProduct", "MapInPandas", "BatchEvalPython",
                "Arguments: SinglePartition"],
    )

    # triple provenance: same single-linear-plan assembly as
    # extract_triples (one MapInPandas detect, broadcast link joins) +
    # one full-triple-key agg — hub entities cannot skew either shuffle
    sup = Q.q_kg_triple_support(spark, sf_dir)
    audit(
        "kg_triple_support",
        sup,
        out,
        expect=["BroadcastHashJoin"],
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )
    n_detect_sup = plan_of(sup).count("MapInPandas (")
    print(f"[triple_support_single_detect] map_in_pandas_nodes={n_detect_sup}")
    out.append(("triple_support_single_detect", "", {"nodes": n_detect_sup},
                [] if n_detect_sup == 1 else ["detect subtree computed twice"]))

    # incremental support fold: the delta batch runs the same
    # single-linear-plan extraction; the fold itself is ONE full-outer
    # join on the full triple key (hub-skew-free) — the base table is
    # never re-derived from docs
    audit(
        "kg_support_delta",
        Q.q_kg_support_delta(spark, sf_dir),
        out,
        expect=["BroadcastHashJoin", "FullOuter"],
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )

    # round-4 retraction maintenance: deletion-side CC splice and
    # doc-retraction support re-aggregation — both delta-scoped; the
    # broadcast expectation pins the affected-set joins staying dim-sided
    audit(
        "kg_components_retract",
        Q.q_kg_components_retract(spark, sf_dir),
        out,
        expect=["BroadcastHashJoin"],
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )
    audit(
        "kg_support_retract",
        Q.q_kg_support_retract(spark, sf_dir),
        out,
        expect=["BroadcastHashJoin"],
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )

    # round-5 split-side re-key: the affected-label dim must BROADCAST
    # onto the maintained doc_level (naming affected rows without a
    # corpus shuffle); the re-extraction subtree is the same
    # single-linear assembly; splice joins equi only
    from ttmf_spark.extract.canonicalize import (
        components_decremental,
        connected_components,
        label_remap,
    )
    from ttmf_spark.extract.pipeline import (
        _support_agg,
        doc_triples,
        resupport_from_docs,
    )

    full_labels = connected_components(same).localCheckpoint(eager=True)
    dl0 = doc_triples(docs, gaz, same_as=same).localCheckpoint(eager=True)
    sup0 = _support_agg(dl0).localCheckpoint(eager=True)
    del_al = same.filter(F.crc32(F.concat_ws("|", "src", "dst")) % 3 == 1)
    split_labels = components_decremental(
        full_labels, same, del_al
    ).localCheckpoint(eager=True)
    remap5 = label_remap(full_labels, split_labels).localCheckpoint(eager=True)
    mapping5 = split_labels.select(
        F.col("node").alias("entity"), F.col("component").alias("canonical")
    )
    sup5, _dl5 = resupport_from_docs(sup0, dl0, remap5, docs, gaz, mapping5)
    audit(
        "resupport_from_docs",
        sup5,
        out,
        expect=["BroadcastHashJoin"],
        forbid=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )

    # round-5 crisscross gate: the forward is ONE ArrowEvalPython stage
    # (vectorized pandas UDF) over the feature projection — no per-row
    # Python, no join in the scoring plan
    cc5 = Q.q_kg_crisscross_conf(spark, sf_dir)
    audit(
        "kg_crisscross_conf",
        cc5,
        out,
        expect=["ArrowEvalPython"],
        forbid=["CartesianProduct", "BatchEvalPython"],
    )

    with open("PLANS.md", "w") as f:
        f.write("# Physical plan audit (auto-generated by scripts/explain_audit.py)\n")
        for name, p, flags, problems in out:
            f.write(f"\n## {name}\n\nflags: `{flags}`  problems: `{problems or 'none'}`\n")
            f.write("\n```\n" + p[:6000] + "\n```\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
