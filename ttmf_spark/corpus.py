"""Deterministic synthetic interleaved-document corpus + gazetteer.

The pipeline input contract (BASELINE.json input_hint) is an Iceberg/parquet
table ``(doc_id string, spans array<struct<kind string, text string,
media_ref string, offset int>>)`` of interleaved text + media documents.

We synthesize that corpus as a *pure function of the driver-provided TPC-H
tables* (orders, lineitem, customer, supplier) so that the exact expected
output of the whole extract -> link -> canonicalize -> materialize pipeline
is relationally derivable — which gives the end-to-end pipeline an exact
DuckDB-SQL oracle (see __spark_entry__.oracle_sql).

Document layout for order ``ok`` (doc_id = ``D{ok}``), spans in order:

  pos 0           text   "Order O{ok} placed by {csurf} in N{nk} of R{rk}."
  per lineitem    text   "Includes part Part#{pk} from {ssurf} of N{snk}."
  (sorted by      image  media://part/{pk}        iff pk % 7 == 0
   l_linenumber)  video  media://supplier/{sk}    iff sk % 13 == 0
  tail            audio  media://order/{ok}       iff ok % 11 == 0

Customer surfaces exercise aliasing + connected-components canonicalization
(SURVEY.md G7): ``CustomerAlt#{ck}`` links to the variant entity ``C{ck}A``
whose same_as chain ``C{ck}A -> C{ck}B -> C{ck}`` must be collapsed by CC.

Every SQL fragment the generator uses is a module constant written in the
common Spark-SQL/DuckDB dialect so the oracle queries reuse them verbatim.

All entity/relation *semantics* follow the reference's contract of flat
(subj, pred, obj) string triples (reference README.md:31-37); the document
stage itself is a new build (the reference starts from extracted triples).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Shared Spark-SQL / DuckDB dialect fragments (keep dialect-common!)
# ---------------------------------------------------------------------------

# surface form of a customer mention (aliased + variant forms, FIXTURES.md §2)
CSURF = (
    "CASE WHEN c_custkey % 10 = 0 THEN 'CustomerAlt#' || c_custkey "
    "WHEN c_custkey % 3 = 0 THEN 'CUST-' || c_custkey "
    "ELSE 'Customer#' || c_custkey END"
)
# surface form of a supplier mention
SSURF = (
    "CASE WHEN s_suppkey % 5 = 0 THEN 'SUPP_' || s_suppkey "
    "ELSE 'Supplier#' || s_suppkey END"
)

HEAD_TEXT = (
    "'Order O' || o_orderkey || ' placed by ' || ({csurf}) || "
    "' in N' || c_nationkey || ' of R' || n_regionkey || '.'"
).format(csurf=CSURF)

LINE_TEXT = (
    "'Includes part Part#' || l_partkey || ' from ' || ({ssurf}) || "
    "' of N' || s_nationkey || '.'"
).format(ssurf=SSURF)

MEDIA_PART_MOD = 7
MEDIA_ORDER_MOD = 11
MEDIA_SUPP_MOD = 13

SPAN_FIELDS = ["kind", "text", "media_ref", "offset"]
SPAN_STRUCT = "struct<kind:string,text:string,media_ref:string,offset:int>"


def _tpch(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _raw_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-assembled spans with their within-document order keys.

    Order key = (sort1, tie1, tie2, sort2): head = (-1,0,0,0); a lineitem's
    text/image/video = (l_linenumber, l_partkey, s_suppkey, 0/1/2);
    trailing audio = (2^31,0,0,0). tie1/tie2 break l_linenumber ties (the
    driver's synthetic lineitem reuses linenumbers within an order).
    ``pos``/``offset`` are assigned after sorting.
    """
    orders = _tpch(spark, sf_dir, "orders")
    customer = _tpch(spark, sf_dir, "customer")
    supplier = _tpch(spark, sf_dir, "supplier")
    nation = _tpch(spark, sf_dir, "nation")
    lineitem = _tpch(spark, sf_dir, "lineitem")

    oc = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("o_orderkey", "c_custkey", "c_nationkey", "n_regionkey")
    )
    head = oc.select(
        F.expr("'D' || o_orderkey").alias("doc_id"),
        F.lit(-1).cast("long").alias("sort1"),
        F.lit(0).cast("long").alias("tie1"),
        F.lit(0).cast("long").alias("tie2"),
        F.lit(0).alias("sort2"),
        F.lit("text").alias("kind"),
        F.expr(HEAD_TEXT).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )
    audio = oc.filter(F.expr(f"o_orderkey % {MEDIA_ORDER_MOD} = 0")).select(
        F.expr("'D' || o_orderkey").alias("doc_id"),
        F.lit(2**31).cast("long").alias("sort1"),
        F.lit(0).cast("long").alias("tie1"),
        F.lit(0).cast("long").alias("tie2"),
        F.lit(0).alias("sort2"),
        F.lit("audio").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.expr("'media://order/' || o_orderkey").alias("media_ref"),
    )
    li = lineitem.join(
        F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey
    ).select("l_orderkey", "l_linenumber", "l_partkey", "s_suppkey", "s_nationkey")
    ltext = li.select(
        F.expr("'D' || l_orderkey").alias("doc_id"),
        F.col("l_linenumber").cast("long").alias("sort1"),
        F.col("l_partkey").cast("long").alias("tie1"),
        F.col("s_suppkey").cast("long").alias("tie2"),
        F.lit(0).alias("sort2"),
        F.lit("text").alias("kind"),
        F.expr(LINE_TEXT).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )
    limg = li.filter(F.expr(f"l_partkey % {MEDIA_PART_MOD} = 0")).select(
        F.expr("'D' || l_orderkey").alias("doc_id"),
        F.col("l_linenumber").cast("long").alias("sort1"),
        F.col("l_partkey").cast("long").alias("tie1"),
        F.col("s_suppkey").cast("long").alias("tie2"),
        F.lit(1).alias("sort2"),
        F.lit("image").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.expr("'media://part/' || l_partkey").alias("media_ref"),
    )
    lvid = li.filter(F.expr(f"s_suppkey % {MEDIA_SUPP_MOD} = 0")).select(
        F.expr("'D' || l_orderkey").alias("doc_id"),
        F.col("l_linenumber").cast("long").alias("sort1"),
        F.col("l_partkey").cast("long").alias("tie1"),
        F.col("s_suppkey").cast("long").alias("tie2"),
        F.lit(2).alias("sort2"),
        F.lit("video").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.expr("'media://supplier/' || s_suppkey").alias("media_ref"),
    )
    return head.unionByName(ltext).unionByName(limg).unionByName(lvid).unionByName(audio)


def interleaved_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline input table: (doc_id, spans array<struct<...>>).

    Spans are ordered by (sort1, sort2); ``offset`` = position index (pos),
    strictly increasing within a document. One shuffle (groupBy doc_id);
    span assembly is array_sort over in-group structs — no UDF.
    """
    raw = _raw_spans(spark, sf_dir)
    assembled = (
        raw.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("sort1", "tie1", "tie2", "sort2", "kind", "text", "media_ref"))
            ).alias("sorted_spans")
        )
        .select(
            "doc_id",
            F.expr(
                "transform(sorted_spans, (s, i) -> "
                "struct(s.kind as kind, s.text as text, s.media_ref as media_ref, "
                "cast(i as int) as offset))"
            ).alias("spans"),
        )
    )
    return assembled


def flat_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode(spans) view: (doc_id, pos, kind, text, media_ref, offset).

    This is the span-sequence-invariant surface (BASELINE.json: per-row
    invariant is span-sequence equality on (kind, text, media_ref, order)).
    """
    return interleaved_docs(spark, sf_dir).select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id",
        "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def gazetteer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias table (surface, entity, prior) — FIXTURES.md §2.

    Built from the dim tables; broadcast-joined against detected mentions.
    ``CustomerAlt#k`` deliberately links to the *variant* entity ``C{k}A``
    so canonicalization has real work to do.
    """
    customer = _tpch(spark, sf_dir, "customer").select("c_custkey")
    supplier = _tpch(spark, sf_dir, "supplier").select("s_suppkey")
    part = _tpch(spark, sf_dir, "part").select("p_partkey")
    orders = _tpch(spark, sf_dir, "orders").select("o_orderkey")
    nation = _tpch(spark, sf_dir, "nation").select("n_nationkey")
    region = _tpch(spark, sf_dir, "region").select("r_regionkey")

    rows = [
        customer.select(
            F.expr("'Customer#' || c_custkey").alias("surface"),
            F.expr("'C' || c_custkey").alias("entity"),
            F.lit(1.0).alias("prior"),
        ),
        customer.filter("c_custkey % 3 = 0").select(
            F.expr("'CUST-' || c_custkey").alias("surface"),
            F.expr("'C' || c_custkey").alias("entity"),
            F.lit(0.9).alias("prior"),
        ),
        customer.filter("c_custkey % 10 = 0").select(
            F.expr("'CustomerAlt#' || c_custkey").alias("surface"),
            F.expr("'C' || c_custkey || 'A'").alias("entity"),
            F.lit(0.8).alias("prior"),
        ),
        supplier.select(
            F.expr("'Supplier#' || s_suppkey").alias("surface"),
            F.expr("'S' || s_suppkey").alias("entity"),
            F.lit(1.0).alias("prior"),
        ),
        supplier.filter("s_suppkey % 5 = 0").select(
            F.expr("'SUPP_' || s_suppkey").alias("surface"),
            F.expr("'S' || s_suppkey").alias("entity"),
            F.lit(0.9).alias("prior"),
        ),
        part.select(
            F.expr("'Part#' || p_partkey").alias("surface"),
            F.expr("'P' || p_partkey").alias("entity"),
            F.lit(1.0).alias("prior"),
        ),
        orders.select(
            F.expr("'O' || o_orderkey").alias("surface"),
            F.expr("'O' || o_orderkey").alias("entity"),
            F.lit(1.0).alias("prior"),
        ),
        nation.select(
            F.expr("'N' || n_nationkey").alias("surface"),
            F.expr("'N' || n_nationkey").alias("entity"),
            F.lit(1.0).alias("prior"),
        ),
        region.select(
            F.expr("'R' || r_regionkey").alias("surface"),
            F.expr("'R' || r_regionkey").alias("entity"),
            F.lit(1.0).alias("prior"),
        ),
        # media surfaces resolve media spans to entities
        part.select(
            F.expr("'media://part/' || p_partkey").alias("surface"),
            F.expr("'P' || p_partkey").alias("entity"),
            F.lit(1.0).alias("prior"),
        ),
        orders.select(
            F.expr("'media://order/' || o_orderkey").alias("surface"),
            F.expr("'O' || o_orderkey").alias("entity"),
            F.lit(1.0).alias("prior"),
        ),
        supplier.select(
            F.expr("'media://supplier/' || s_suppkey").alias("surface"),
            F.expr("'S' || s_suppkey").alias("entity"),
            F.lit(1.0).alias("prior"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def same_as_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias (same_as) edges between entity ids, with chains A->B->canonical
    so connected-components has multi-hop work (FIXTURES.md §2)."""
    customer = _tpch(spark, sf_dir, "customer").select("c_custkey").filter(
        "c_custkey % 10 = 0"
    )
    e1 = customer.select(
        F.expr("'C' || c_custkey || 'A'").alias("src"),
        F.expr("'C' || c_custkey || 'B'").alias("dst"),
    )
    e2 = customer.select(
        F.expr("'C' || c_custkey || 'B'").alias("src"),
        F.expr("'C' || c_custkey").alias("dst"),
    )
    return e1.unionByName(e2)


def truth_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ground-truth (s, p, o) triples planted in the corpus.

    The extraction pipeline's output (after canonicalization) must equal
    this set exactly — this is how triple P/R vs the planted reference is
    measured (P = R = 1.0 on the synthetic corpus by construction).
    """
    orders = _tpch(spark, sf_dir, "orders")
    customer = _tpch(spark, sf_dir, "customer")
    supplier = _tpch(spark, sf_dir, "supplier")
    nation = _tpch(spark, sf_dir, "nation")
    lineitem = _tpch(spark, sf_dir, "lineitem")

    oc = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("o_orderkey", "c_custkey", "c_nationkey", "n_regionkey")
    )
    t_placed = oc.select(
        F.expr("'O' || o_orderkey").alias("s"),
        F.lit("placed_by").alias("p"),
        F.expr("'C' || c_custkey").alias("o"),
    )
    t_cnat = oc.select(
        F.expr("'C' || c_custkey").alias("s"),
        F.lit("in_nation").alias("p"),
        F.expr("'N' || c_nationkey").alias("o"),
    ).distinct()
    t_nreg = oc.select(
        F.expr("'N' || c_nationkey").alias("s"),
        F.lit("in_region").alias("p"),
        F.expr("'R' || n_regionkey").alias("o"),
    ).distinct()
    li = lineitem.join(
        F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey
    ).select("l_orderkey", "l_partkey", "l_suppkey", "s_nationkey")
    t_contains = li.select(
        F.expr("'O' || l_orderkey").alias("s"),
        F.lit("contains").alias("p"),
        F.expr("'P' || l_partkey").alias("o"),
    ).distinct()
    t_supp = li.select(
        F.expr("'P' || l_partkey").alias("s"),
        F.lit("supplied_by").alias("p"),
        F.expr("'S' || l_suppkey").alias("o"),
    ).distinct()
    t_snat = li.select(
        F.expr("'S' || l_suppkey").alias("s"),
        F.lit("in_nation").alias("p"),
        F.expr("'N' || s_nationkey").alias("o"),
    ).distinct()
    out = t_placed
    for t in [t_cnat, t_nreg, t_contains, t_supp, t_snat]:
        out = out.unionByName(t)
    return out.distinct()

def shortcut_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived 1-hop shortcut relations for relation-path training.

    The planted KG is multipartite (O->C->N->R, O->P->S->N) — 2-hop
    paths NEVER parallel a direct edge, so PTransE's path-composition
    table (graph.pcra_path_triples) is structurally empty on it. The
    paper (Lin et al. 2015 §3.1) augments the graph so paths close;
    here the augmentation is two shortcut relations any KG-enrichment
    pass would emit, derived from the same source rows as the truth
    triples (no new information, just materialized composition):

      O -supplied_via-> S  (= contains . supplied_by, from lineitem)
      O -order_nation-> N  (= placed_by . in_nation, from orders|customer)

    On the augmented graph (placed_by, in_nation) closes with
    order_nation on every order, and (supplied_via, in_nation) ALSO
    reaches the customer nation whenever a supplier sits there — so the
    per-(h, t) PCRA normalizer Z produces genuinely fractional shares.
    """
    orders = _tpch(spark, sf_dir, "orders")
    customer = _tpch(spark, sf_dir, "customer")
    lineitem = _tpch(spark, sf_dir, "lineitem")
    t_via = lineitem.select(
        F.expr("'O' || l_orderkey").alias("s"),
        F.lit("supplied_via").alias("p"),
        F.expr("'S' || l_suppkey").alias("o"),
    ).distinct()
    t_onat = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            F.expr("'O' || o_orderkey").alias("s"),
            F.lit("order_nation").alias("p"),
            F.expr("'N' || c_nationkey").alias("o"),
        )
        .distinct()
    )
    return t_via.unionByName(t_onat)
