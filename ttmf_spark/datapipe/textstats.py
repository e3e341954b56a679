"""Text analysis operators over `documents(doc_id, text, lang, source,
n_chars)`: token counting, quality scoring, language ID, fingerprinting.

Everything is built-in column expressions — no UDFs, fully
codegen/pushdown friendly; each has an exact DuckDB oracle
(ttmf_spark.oracles) because the semantics are defined in portable SQL
terms (split/regexp/length/md5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# tiny built-in stopword lexicon (top function words per language) for the
# n-gram/stopword language-ID heuristic; deliberately small + deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de5", "shi4", "he2", "zai4", "le5"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["in", "is", "it", "for", "on"]


def _tokens(col):
    """Whitespace tokenization of lowercased text (empty tokens dropped)."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword-unit count.

    ``n_tokens``: whitespace tokens. ``n_subwords``: count of maximal
    letter-runs, digit-runs, and single non-alphanumeric marks — the
    greedy pre-tokenization regex most BPE vocabularies start from.
    """
    subs = F.size(
        F.expr(rf"regexp_extract_all({text_col}, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ])', 1)")
    )
    return docs.withColumn("n_tokens", F.size(_tokens(F.col(text_col)))).withColumn(
        "n_subwords", subs
    )


def with_quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + fused score in [0, 1]:

    - len_score: saturating length ratio min(n_chars/500, 1)
    - stop_ratio: fraction of tokens that are English stopwords
    - punct_ratio: punctuation chars / chars
    - mean_token_len
    score = 0.4*len_score + 0.4*min(stop_ratio*5, 1) + 0.2*(1 - min(punct_ratio*10, 1))
    """
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    mean_tok = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / n_tok,
    ).otherwise(F.lit(0.0))
    return (
        docs.withColumn("len_score", len_score)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("mean_token_len", mean_tok)
        .withColumn(
            "quality",
            0.4 * F.col("len_score")
            + 0.4 * F.least(F.col("stop_ratio") * 5.0, F.lit(1.0))
            + 0.2 * (1.0 - F.least(F.col("punct_ratio") * 10.0, F.lit(1.0))),
        )
    )


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language ID: count marker hits per language, argmax
    (ties -> lexicographically first language code); 'und' when no marker
    hits at all."""
    toks = _tokens(F.col(text_col))
    scores = []
    for lang in sorted(LANG_MARKERS):
        arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias("n"),
                F.lit(lang).alias("lang"),
            )
        )
    # array_max on struct(n desc, lang) — invert lang ordering by taking
    # max over (n, negated?) — simpler: reduce with explicit comparison
    best = F.aggregate(
        F.array(*scores),
        F.struct(F.lit(-1).alias("n"), F.lit("und").alias("lang")),
        lambda acc, s: F.when(s["n"] > acc["n"], s).otherwise(acc),
    )
    return docs.withColumn(
        "lang_pred", F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-normalized
    lowercased text (portable across engines — exact DuckDB oracle)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return docs.withColumn("fingerprint", F.md5(norm))


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level top-k word n-grams: (ngram, freq, rank).

    Count is over every occurrence (not per-doc distinct); ties break on
    the ngram string ascending so the result is deterministic. One
    shuffle on the ngram with map-side partial counts; the final top-k is
    a single-partition window over the (tiny) count table — at a 100 TB
    corpus swap the window for an aggregated TakeOrdered (orderBy+limit),
    which Spark plans without a global sort.
    """
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "), " "),
        lambda t: t != "",
    )
    d = docs.select(toks.alias("_toks")).withColumn("_n", F.size("_toks"))
    grams = F.when(
        F.col("_n") >= n,
        F.transform(
            F.sequence(F.lit(0), F.col("_n") - n),
            lambda i: F.array_join(F.slice("_toks", i + 1, n), " "),
        ),
    ).otherwise(F.array())
    counts = (
        d.select(F.explode(grams).alias("ngram"))
        .filter(F.col("ngram") != "")
        .groupBy("ngram")
        .agg(F.count("*").alias("freq"))
    )
    ranked = counts.orderBy(F.col("freq").desc(), F.col("ngram").asc()).limit(k)
    return ranked.select(
        "ngram",
        "freq",
        F.row_number()
        .over(Window.orderBy(F.col("freq").desc(), F.col("ngram").asc()))
        .alias("rank"),
    )


def source_stats(docs: DataFrame, source_col: str = "source", text_col: str = "text") -> DataFrame:
    """Per-source curation stats: (source, n_docs, avg_quality,
    p50_tokens, p90_tokens) — the "which sources produce junk" query of a
    training-data pipeline. Per-doc quality is rounded to 6 before the
    mean so the DuckDB twin is bit-exact; percentiles are EXACT linear
    interpolation (matches quantile_cont). Scale note: exact percentile
    buffers each group's values — at 100 TB swap for approx_percentile
    (same shape, sketch-based); the source key is dim-sized either way.
    """
    q = with_quality_score(with_token_counts(docs, text_col), text_col)
    return q.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.round("quality", 6)), 6).alias("avg_quality"),
        F.round(F.percentile("n_tokens", F.lit(0.5)), 6).alias("p50_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.9)), 6).alias("p90_tokens"),
    )


def langid_eval(docs: DataFrame, label_col: str = "lang", text_col: str = "text") -> DataFrame:
    """Evaluate the marker-based lang-ID against the labeled column:
    (lang, n_docs, n_correct, accuracy) per true language — the pipeline
    QA op that decides whether the heuristic is good enough per slice."""
    d = with_lang_id(docs, text_col)
    return (
        d.groupBy(F.col(label_col).alias("lang"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("lang_pred") == F.col(label_col)).cast("long")).alias(
                "n_correct"
            ),
        )
        .withColumn("accuracy", F.round(F.col("n_correct") / F.col("n_docs"), 6))
    )


def _rep_exprs(n: int):
    """Column exprs (total, dup_frac, top_frac) for word n-gram repetition
    over a `_toks` array column. All array/higher-order expressions — the
    whole computation is per-row JVM work, NO shuffle at any scale (the
    Gopher-style repetition signals are embarrassingly parallel and this
    keeps them that way; the exploded groupBy formulation would shuffle
    one row per n-gram occurrence).

    Run-length walk over the sorted n-gram array: `dup` = occurrences of
    n-grams appearing more than once, `top` = occurrences of the most
    frequent n-gram (ties need no break — only the count is used).
    """
    grams = (
        f"case when size(_toks) >= {n} then "
        f"transform(sequence(0, size(_toks) - {n}), "
        f"i -> concat_ws(' ', slice(_toks, i + 1, {n}))) "
        "else array() end"
    )
    agg = (
        f"aggregate(array_sort({grams}), "
        "named_struct('prev', cast(null as string), 'run', 0L, 'dup', 0L, 'top', 0L), "
        "(acc, g) -> if(acc.prev is not null and g = acc.prev, "
        "named_struct('prev', g, 'run', acc.run + 1L, 'dup', acc.dup, 'top', acc.top), "
        "named_struct('prev', g, 'run', 1L, "
        "'dup', acc.dup + if(acc.run > 1L, acc.run, 0L), "
        "'top', greatest(acc.top, acc.run))), "
        "acc -> named_struct("
        "'dup', acc.dup + if(acc.run > 1L, acc.run, 0L), "
        "'top', greatest(acc.top, acc.run)))"
    )
    total = F.expr(f"size({grams})").cast("long")
    st = F.expr(agg)
    dup_frac = F.when(total > 0, F.round(st["dup"] / total, 6)).otherwise(F.lit(0.0))
    top_frac = F.when(total > 0, F.round(st["top"] / total, 6)).otherwise(F.lit(0.0))
    return total, dup_frac, top_frac


def with_repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Boilerplate/repetition quality signals (the Gopher/MassiveText
    repetition rules, word-occurrence variant): per doc, for n in {2, 3},
    the fraction of n-gram occurrences belonging to repeated n-grams
    (`dup_Ngram_frac`) and to the single most frequent n-gram
    (`top_Ngram_frac`), plus the occurrence total. High values mark
    template/boilerplate docs a training-data pipeline should drop."""
    d = docs.withColumn("_toks", _tokens(F.col(text_col)))
    t2, d2, p2 = _rep_exprs(2)
    t3, d3, p3 = _rep_exprs(3)
    return (
        d.withColumn("n_2grams", t2)
        .withColumn("dup_2gram_frac", d2)
        .withColumn("top_2gram_frac", p2)
        .withColumn("n_3grams", t3)
        .withColumn("dup_3gram_frac", d3)
        .withColumn("top_3gram_frac", p3)
        .drop("_toks")
    )


def source_tfidf(
    docs: DataFrame,
    k: int = 10,
    n_salts: int = 64,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Top-k TF-IDF terms per source — the domain-signature analysis a
    curation pipeline reads to understand what each crawl source is
    about: tf = total occurrences of the term in the source, idf =
    ln(n_sources / n_sources_containing_term), ties broken by term asc.
    Score rounded to 6 (engine-portable ln).

    Scale: term counts are one map-side-combinable groupBy (source,
    term); the per-term source frequency is a second dim-shaped agg; the
    per-source top-k uses the same skew-safe two-phase ranking as
    curation.top_quality_per_source (phase 1 within a term-hash salt
    bucket, so a source with a 10^8-term vocabulary never sorts in one
    task). n_sources is a single driver scalar.
    """
    from pyspark.sql.window import Window

    from ttmf_spark.datapipe.dedup import u60

    terms = docs.select(
        source_col, F.explode(_tokens(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy(source_col, "term").agg(F.count("*").alias("tf"))
    n_sources = docs.select(source_col).distinct().count()
    sf = tf.groupBy("term").agg(F.count("*").alias("n_src"))
    scored = tf.join(sf, "term").select(
        source_col,
        "term",
        "tf",
        F.round(F.col("tf") * F.log(F.lit(float(n_sources)) / F.col("n_src")), 6).alias(
            "tfidf"
        ),
    )
    d = scored.withColumn(
        "_salt", F.pmod(u60(F.col("term"), seed=0), F.lit(n_salts))
    )
    order = [F.col("tfidf").desc(), F.col("term").asc()]
    w1 = Window.partitionBy(source_col, "_salt").orderBy(*order)
    survivors = d.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= k
    )
    w2 = Window.partitionBy(source_col).orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(source_col, "term", "tf", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


def with_lm_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Unigram cross-entropy per doc against the corpus unigram
    distribution: H(doc) = -(1/n) * sum ln p(tok), p(tok) = corpus
    count / corpus total — the language-model quality signal of
    CCNet-style filtering (a KenLM stand-in with the same dataflow:
    score every doc against a corpus-level model; high H = far from the
    corpus distribution = boilerplate/garbled/foreign). Docs with no
    tokens get H = 0.0 (n_tokens = 0 disambiguates).

    Scale: one map-side-combinable token count agg builds the "model";
    the vocabulary is dim-shaped next to the corpus (Heaps' law) and is
    broadcast to the token stream — the per-token probability lookup
    never shuffles the corpus (a shuffle join on the token would hot-key
    every stopword). Corpus total is one driver scalar.
    """
    toks = docs.select("doc_id", F.explode(_tokens(F.col(text_col))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt")).collect()[0][0] or 0
    scored = toks.join(F.broadcast(counts), "tok").select(
        "doc_id", (-F.log(F.col("cnt") / F.lit(float(total)))).alias("_nll")
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"), F.round(F.avg("_nll"), 6).alias("lm_ce")
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("lm_ce", F.lit(0.0)).alias("lm_ce"),
        )
    )


def length_quantiles(
    docs: DataFrame,
    group_col: str = "lang",
    len_col: str = "n_chars",
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Per-group document-length quantile profile (linear interpolation,
    the numpy/type-7 definition both Spark ``percentile`` and DuckDB
    ``quantile_cont`` implement): one row per group with n_docs and one
    p{xx} column per requested probability — the length-distribution
    audit a curation pass reads before picking min/max length cutoffs
    per language.

    Scale note: ``percentile`` is the exact aggregate — it buffers each
    group's values, which is fine while groups are language-sized shards
    of a scan but becomes the memory hot spot when a single group holds
    10^10 docs; the production swap is ``percentile_approx`` (bounded
    t-digest sketch, mergeable map-side) at an accuracy budget, kept out
    of the gated query because its sketch is not engine-portable.
    """
    arr = ", ".join(str(p) for p in probs)
    agg = [F.count("*").alias("n_docs"),
           F.expr(f"percentile({len_col}, array({arr}))").alias("_q")]
    out = docs.groupBy(F.col(group_col).alias("grp")).agg(*agg)
    cols = [F.col("grp"), F.col("n_docs")]
    for i, p in enumerate(probs):
        name = f"p{int(round(p * 100)):02d}"
        cols.append(F.round(F.col("_q")[i], 6).alias(name))
    return out.select(*cols)
