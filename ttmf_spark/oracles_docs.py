"""DuckDB oracle SQL for the data-pipeline operators (dedup, similarity,
text analysis) over the driver `documents` / `embeddings` views.

Semantics mirror ttmf_spark.datapipe exactly; hash-dependent operators
use the portable md5-60bit hash (datapipe.dedup.hash64 fn='md5') so even
MinHash/SimHash results are byte-identical across engines.
"""

from __future__ import annotations

from ttmf_spark.datapipe.textstats import LANG_MARKERS, STOPWORDS_EN

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"


def doc_stats_sql() -> str:
    return f"""
SELECT doc_id,
       len({_TOKS}) AS n_tokens,
       len(regexp_extract_all(text, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ])', 1)) AS n_subwords
FROM documents
"""


def doc_quality_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    return f"""
WITH base AS (
  SELECT doc_id, text, {_TOKS} AS toks, length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^a-zA-Z0-9_ \\t\\n]', '', 'g')) AS n_punct
  FROM documents
),
feats AS (
  SELECT doc_id,
         least(n_chars / 500.0, 1.0) AS len_score,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks, x -> x IN ({stop_list}))) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS stop_ratio,
         CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(toks) > 0
              THEN list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE))) / len(toks)
              ELSE 0.0 END AS mean_token_len
  FROM base
)
SELECT doc_id, ROUND(len_score, 6) AS len_score, ROUND(stop_ratio, 6) AS stop_ratio,
       ROUND(punct_ratio, 6) AS punct_ratio, ROUND(mean_token_len, 6) AS mean_token_len,
       ROUND(0.4 * len_score + 0.4 * least(stop_ratio * 5.0, 1.0)
             + 0.2 * (1.0 - least(punct_ratio * 10.0, 1.0)), 6) AS quality
FROM feats
"""


def doc_langid_sql() -> str:
    score_cols = []
    for lang in sorted(LANG_MARKERS):
        marks = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        score_cols.append(
            f"len(list_filter(toks, x -> x IN ({marks}))) AS n_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    # argmax with strict > over lex-ordered langs == first max (tie -> lex-first)
    best = "CASE "
    for lang in langs:
        cond = " AND ".join(
            f"n_{lang} >= n_{o}" if o > lang else f"n_{lang} > n_{o}"
            for o in langs
            if o != lang
        )
        best += f"WHEN {cond or 'TRUE'} THEN '{lang}' "
    best += "ELSE 'und' END"
    # note: reduce-with-> in Spark keeps the FIRST max (acc wins ties);
    # langs are visited in sorted order, so lex-smallest max wins there too.
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, {', '.join(score_cols)} FROM t)
SELECT doc_id,
       CASE WHEN greatest({', '.join('n_' + l for l in langs)}) > 0
            THEN {best}
            ELSE 'und' END AS lang_pred
FROM s
"""


def doc_fingerprint_sql() -> str:
    return f"SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents"


def doc_exact_dedup_sql() -> str:
    return f"""
SELECT MIN(doc_id) AS doc_id, md5({_NORM}) AS fingerprint, COUNT(*) AS dup_count
FROM documents GROUP BY 2
"""


_SHINGLES = """
toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS l
  FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(l) >= {n}
                THEN [array_to_string(l[i+1:i+{n}], ' ') for i in range(0, len(l)-{n}+1)]
                ELSE [array_to_string(l, ' ')] END)) AS shingle
  FROM toks
),
sh2 AS (SELECT doc_id, shingle FROM sh WHERE shingle <> ''),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh2 GROUP BY 1)
"""


def doc_jaccard_pairs_sql(tau: float = 0.8, n: int = 3, max_df: int = 100) -> str:
    """Mirrors dedup.jaccard_pairs(max_df=...): hot-shingle pruning happens
    BEFORE sizes and overlaps (same stopword-removal semantics)."""
    return f"""
WITH {_SHINGLES.format(n=n).strip()},
keep AS (SELECT shingle FROM sh2 GROUP BY shingle HAVING COUNT(*) <= {max_df}),
sh3 AS (SELECT s.doc_id, s.shingle FROM sh2 s JOIN keep k ON s.shingle = k.shingle),
sizes3 AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh3 GROUP BY 1),
ov AS (
  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS common
  FROM sh3 a JOIN sh3 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ov.a, ov.b,
       ROUND(CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
FROM ov JOIN sizes3 sa ON ov.a = sa.doc_id JOIN sizes3 sb ON ov.b = sb.doc_id
WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= {tau}
"""


def _md5h(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def doc_minhash_pairs_sql(
    tau: float = 0.8, k: int = 16, bands: int = 8, n: int = 3
) -> str:
    """MinHash-LSH with md5-60bit hashes — full value parity with
    datapipe.dedup.minhash_lsh_pairs(hash_fn='md5')."""
    r = k // bands
    min_cols = ", ".join(
        "MIN({h}) AS m{i}".format(h=_md5h("'%d' || shingle" % i), i=i)
        for i in range(k)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, "
        + _md5h(
            f"'{1000 + bi}' || "
            + " || ',' || ".join(f"CAST(m{bi * r + j} AS VARCHAR)" for j in range(r))
        )
        + " AS bucket FROM sig"
        for bi in range(bands)
    )
    return f"""
WITH {_SHINGLES.format(n=n).strip()},
sig AS (SELECT doc_id, {min_cols} FROM sh2 GROUP BY doc_id),
bucketed AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM bucketed a JOIN bucketed b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
ov AS (
  SELECT c.a, c.b, COUNT(*) AS common
  FROM cand c JOIN sh2 x ON x.doc_id = c.a JOIN sh2 y ON y.doc_id = c.b AND y.shingle = x.shingle
  GROUP BY 1, 2
)
SELECT ov.a, ov.b,
       ROUND(CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
FROM ov JOIN sizes sa ON ov.a = sa.doc_id JOIN sizes sb ON ov.b = sb.doc_id
WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= {tau}
"""


def doc_simhash_sql() -> str:
    """SimHash with the md5-60bit token hash (bits 60-62 vote all -1)."""
    votes = ", ".join(
        f"SUM(CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(63)
    )
    bits = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST(1 AS BIGINT) << {b} ELSE 0 END)" for b in range(63)
    )
    return f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
h AS (SELECT doc_id, {_md5h("'0' || tok")} AS th FROM t),
v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
SELECT doc_id, {bits} AS simhash FROM v
"""


def doc_simhash_near_dup_sql(max_hamming: int = 8) -> str:
    """Exact O(n^2) pair scan over the simhash table — the oracle twin of
    the blocked pigeonhole join (which is exact-by-construction when the
    63 used bits partition into max_hamming+1 blocks)."""
    inner = doc_simhash_sql().strip()
    return f"""
WITH sh AS ({inner})
SELECT x.doc_id AS a, y.doc_id AS b,
       bit_count(xor(x.simhash, y.simhash)) AS hamming
FROM sh x JOIN sh y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}
"""


_UNIT_EMB = """
u AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM u),
un AS (SELECT vec_id,
              CASE WHEN nrm > 0 THEN list_transform(v, x -> x / nrm) ELSE v END AS uv
       FROM n)
"""


def emb_topk_sql(k: int = 5, query_mod: int = 50) -> str:
    return f"""
WITH {_UNIT_EMB.strip()},
q AS (SELECT vec_id AS query_id, uv AS qv FROM un WHERE vec_id % {query_mod} = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         ROUND(list_dot_product(c.uv, q.qv), 6) AS cos
  FROM un c, q WHERE c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos FROM ranked WHERE rank <= {k}
"""


def emb_near_dup_sql(tau: float = 0.4) -> str:
    return f"""
WITH {_UNIT_EMB.strip()}
SELECT a.vec_id AS a, b.vec_id AS b,
       ROUND(list_dot_product(a.uv, b.uv), 6) AS cos
FROM un a JOIN un b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.uv, b.uv), 6) >= {tau}
"""


def emb_ivf_topk_sql(
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    query_mod: int = 50,
) -> str:
    """Mirrors similarity.ivf_topk(refine_iters=0, hash_fn='md5'):
    hash-sampled unit-vector centroids (no cross-row float math), rounded
    cosine cell assignment with lower-cell tie-break, n_probe cells per
    query, exact cosine rank within probed cells."""
    h = _md5h(f"'{seed}' || CAST(vec_id AS VARCHAR)")
    return f"""
WITH {_UNIT_EMB.strip()},
cents AS (
  SELECT uv AS cv, ROW_NUMBER() OVER (ORDER BY {h}, vec_id) - 1 AS cell
  FROM un ORDER BY {h}, vec_id LIMIT {n_cells}
),
cassign AS (
  SELECT vec_id AS neighbor_id, uv AS cvv, cell,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY ROUND(list_dot_product(uv, cv), 6) DESC, cell ASC
         ) AS rn
  FROM un, cents
),
cidx AS (SELECT neighbor_id, cvv, cell FROM cassign WHERE rn = 1),
q AS (SELECT vec_id AS query_id, uv AS qv FROM un WHERE vec_id % {query_mod} = 0),
qassign AS (
  SELECT query_id, qv, cell,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY ROUND(list_dot_product(qv, cv), 6) DESC, cell ASC
         ) AS rn
  FROM q, cents
),
qidx AS (SELECT query_id, qv, cell FROM qassign WHERE rn <= {n_probe}),
scored AS (
  SELECT qidx.query_id, cidx.neighbor_id,
         ROUND(list_dot_product(cidx.cvv, qidx.qv), 6) AS cos
  FROM cidx JOIN qidx USING (cell)
  WHERE cidx.neighbor_id <> qidx.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos FROM ranked WHERE rank <= {k}
"""


def media_frame_plan_sql() -> str:
    """Frame-sampling plan twin: videos from the flattened span table,
    duration = md5-60bit draw (hash64 fn='md5', seed=0), one row per
    1000ms frame timestamp in [0, max(dur-1, 0)]."""
    from ttmf_spark.oracles import span_flatten_sql

    return f"""
WITH flat AS ({span_flatten_sql()}),
vids AS (
  SELECT media_ref,
         {_md5h("'0' || media_ref")} % 600000 AS dur
  FROM (SELECT DISTINCT media_ref FROM flat WHERE kind = 'video')
)
SELECT media_ref,
       CAST(unnest(generate_series(0, greatest(dur - 1, 0), 1000)) AS BIGINT) AS frame_ms
FROM vids
"""


def emb_lsh_topk_sql(
    k: int = 5, p: int = 4, seed: int = 42, dim: int = 64, query_mod: int = 50,
    multi_probe: bool = False,
) -> str:
    """Exact twin of similarity.lsh_topk: the hyperplanes are driver-side
    constants injected as literals on BOTH sides (same seeded floats, full
    repr precision), so the bucket assignment — sign of a double dot
    against the raw embedding — is reproducible in SQL, and the
    bucket-join + exact-cosine rank is then plain relational algebra."""
    from ttmf_spark.datapipe.similarity import hyperplanes

    planes = hyperplanes(dim, p, seed)

    def lit(h: list[float]) -> str:
        return "[" + ", ".join(repr(float(x)) for x in h) + "]"

    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, {lit(h)}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, h in enumerate(planes)
    )
    if multi_probe:
        flips = ", ".join(f"xor(q0.bucket, {1 << i})" for i in range(p))
        probe_select = (
            "SELECT q0.query_id, q0.qv, pb.bucket "
            f"FROM q0, UNNEST([q0.bucket, {flips}]) AS pb(bucket)"
        )
    else:
        probe_select = "SELECT query_id, qv, bucket FROM q0"
    return f"""
WITH {_UNIT_EMB.strip()},
b AS (SELECT vec_id, CAST({bucket} AS BIGINT) AS bucket FROM u),
cset AS (SELECT un.vec_id, un.uv, b.bucket FROM un JOIN b USING (vec_id)),
q0 AS (SELECT vec_id AS query_id, uv AS qv, bucket FROM cset
      WHERE vec_id % {query_mod} = 0),
q AS ({probe_select}),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         ROUND(list_dot_product(c.uv, q.qv), 6) AS cos
  FROM cset c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos FROM ranked WHERE rank <= {k}
"""


def doc_near_dup_clusters_sql(rounds: int = 10) -> str:
    """Twin of dedup.near_dup_clusters(hash_fn='md5', k=16, bands=8, n=3):
    the md5 minhash pair list is the edge set; connected components are
    computed by ``rounds`` unrolled min-label-propagation steps (exact
    whenever every node is within ``rounds`` hops of its component's min
    member — near-dup clusters are tiny chains; the pytest/driver compare
    against the real union-find/star CC would catch any deeper cluster)."""
    parts = [
        f"pairs AS MATERIALIZED ({doc_minhash_pairs_sql()})",
        "e AS (SELECT a AS u, b AS v FROM pairs "
        "UNION ALL SELECT b AS u, a AS v FROM pairs)",
        "l0 AS (SELECT doc_id, doc_id AS lbl FROM documents)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT l.doc_id, "
            f"LEAST(l.lbl, COALESCE(m.nl, l.lbl)) AS lbl "
            f"FROM l{i - 1} l LEFT JOIN "
            f"(SELECT e.u AS doc_id, MIN(p.lbl) AS nl "
            f"FROM e JOIN l{i - 1} p ON p.doc_id = e.v GROUP BY e.u) m "
            f"USING (doc_id))"
        )
    return (
        "WITH " + ",\n".join(parts) + "\n"
        f"SELECT doc_id, lbl AS rep_id, CAST(lbl = doc_id AS INT) AS keep "
        f"FROM l{rounds}"
    )


def doc_top_ngrams_sql(n: int = 2, k: int = 20) -> str:
    """Twin of textstats.top_ngrams: every-occurrence n-gram counts,
    ties broken on the ngram string ascending."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS l
  FROM documents
),
grams AS (
  SELECT unnest(CASE WHEN len(l) >= {n}
                THEN [array_to_string(l[i+1:i+{n}], ' ') for i in range(0, len(l)-{n}+1)]
                ELSE [] END) AS ngram
  FROM toks
),
counts AS (
  SELECT ngram, COUNT(*) AS freq FROM grams WHERE ngram <> '' GROUP BY ngram
)
SELECT ngram, freq,
       CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, ngram ASC) AS INT) AS rank
FROM counts ORDER BY freq DESC, ngram ASC LIMIT {k}
"""


def doc_source_stats_sql() -> str:
    """Twin of textstats.source_stats: per-doc quality from
    doc_quality_sql (already rounded to 6), exact interpolated quantiles
    via quantile_cont."""
    return f"""
WITH q AS ({doc_quality_sql().strip()}),
t AS (SELECT doc_id, len({_TOKS}) AS n_tokens, source FROM documents)
SELECT t.source,
       COUNT(*) AS n_docs,
       ROUND(AVG(q.quality), 6) AS avg_quality,
       ROUND(quantile_cont(t.n_tokens, 0.5), 6) AS p50_tokens,
       ROUND(quantile_cont(t.n_tokens, 0.9), 6) AS p90_tokens
FROM t JOIN q ON t.doc_id = q.doc_id
GROUP BY t.source
"""


def doc_langid_eval_sql() -> str:
    """Twin of textstats.langid_eval over the labeled lang column."""
    return f"""
WITH pred AS ({doc_langid_sql().strip()})
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN pred.lang_pred = d.lang THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       ROUND(SUM(CASE WHEN pred.lang_pred = d.lang THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
FROM documents d JOIN pred ON d.doc_id = pred.doc_id
GROUP BY d.lang
"""


def doc_repetition_sql() -> str:
    """Twin of textstats.with_repetition_stats (dup/top word n-gram
    occurrence fractions, n in {2,3}) via unnest + two-level GROUP BY;
    docs too short for any n-gram rejoin with zeros."""
    per_n = """
  SELECT g.doc_id,
         CAST(SUM(c) AS BIGINT) AS total,
         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup,
         CAST(MAX(c) AS BIGINT) AS top
  FROM (
    SELECT doc_id, g, COUNT(*) AS c
    FROM (
      SELECT doc_id, UNNEST(
        CASE WHEN len(tk) >= {n}
        THEN list_transform(range(1, len(tk) - {n} + 2),
                            i -> array_to_string(tk[i : i + {n} - 1], ' '))
        ELSE [] END) AS g
      FROM toks
    )
    GROUP BY doc_id, g
  ) g
  GROUP BY g.doc_id
"""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, {_TOKS} AS tk FROM documents
),
a2 AS ({per_n.format(n=2)}),
a3 AS ({per_n.format(n=3)})
SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars,
       COALESCE(a2.total, 0) AS n_2grams,
       COALESCE(ROUND(a2.dup / CAST(a2.total AS DOUBLE), 6), 0.0) AS dup_2gram_frac,
       COALESCE(ROUND(a2.top / CAST(a2.total AS DOUBLE), 6), 0.0) AS top_2gram_frac,
       COALESCE(a3.total, 0) AS n_3grams,
       COALESCE(ROUND(a3.dup / CAST(a3.total AS DOUBLE), 6), 0.0) AS dup_3gram_frac,
       COALESCE(ROUND(a3.top / CAST(a3.total AS DOUBLE), 6), 0.0) AS top_3gram_frac
FROM documents d
LEFT JOIN a2 ON d.doc_id = a2.doc_id
LEFT JOIN a3 ON d.doc_id = a3.doc_id
"""


def doc_curation_sql(q_min: float = 0.3, rep_max: float = 0.5) -> str:
    """Twin of curation.curation_verdict: composed from the quality,
    repetition, and exact-dedup twins (same rounding, same precedence)."""
    return f"""
WITH q AS MATERIALIZED ({doc_quality_sql().strip()}),
r AS MATERIALIZED ({doc_repetition_sql().strip()}),
surv AS ({doc_exact_dedup_sql().strip()}),
v AS (
  SELECT d.doc_id, q.quality, r.dup_3gram_frac,
         CASE WHEN s.doc_id IS NULL THEN 'duplicate'
              WHEN q.quality < {{q_min}} THEN 'low_quality'
              WHEN r.dup_3gram_frac > {{rep_max}} THEN 'boilerplate'
              ELSE 'ok' END AS reason
  FROM documents d
  JOIN q ON d.doc_id = q.doc_id
  JOIN r ON d.doc_id = r.doc_id
  LEFT JOIN surv s ON d.doc_id = s.doc_id
)
SELECT doc_id, quality, dup_3gram_frac, reason, reason = 'ok' AS keep FROM v
""".format(q_min=q_min, rep_max=rep_max)


def doc_contamination_sql(n: int = 3, tau: float = 0.5, modulus: int = 17) -> str:
    """Twin of decontam.contamination_scores over the modulus eval split:
    same shingle pipeline as the jaccard twin, left-join count semantics."""
    return f"""
WITH {_SHINGLES.format(n=n).strip()},
eval_sh AS (SELECT DISTINCT shingle FROM sh2 WHERE doc_id % {modulus} = 0),
train AS (SELECT doc_id, shingle FROM sh2 WHERE doc_id % {modulus} <> 0),
agg AS (
  SELECT t.doc_id, COUNT(*) AS n_shingles, COUNT(e.shingle) AS n_hit
  FROM train t LEFT JOIN eval_sh e ON t.shingle = e.shingle
  GROUP BY 1
),
per_doc AS (
  -- one row per training doc even when it has no shingles at all
  -- (empty text): clean, not missing — mirrors contamination_scores
  SELECT d.doc_id, COALESCE(a.n_shingles, 0) AS n_shingles,
         COALESCE(a.n_hit, 0) AS n_hit
  FROM (SELECT doc_id FROM documents WHERE doc_id % {modulus} <> 0) d
  LEFT JOIN agg a ON d.doc_id = a.doc_id
)
SELECT doc_id, n_shingles, n_hit,
       ROUND(CASE WHEN n_shingles > 0 THEN CAST(n_hit AS DOUBLE) / n_shingles
                  ELSE 0.0 END, 6) AS contamination,
       ROUND(CASE WHEN n_shingles > 0 THEN CAST(n_hit AS DOUBLE) / n_shingles
                  ELSE 0.0 END, 6) >= {tau} AS contaminated
FROM per_doc
"""


def doc_bloom_contamination_sql(
    m_bits: int = 1024,
    k_hashes: int = 3,
    n: int = 3,
    seed: int = 0,
    modulus: int = 17,
) -> str:
    """Twin of decontam.bloom_contamination(hash_fn='md5') over the
    modulus eval split: same seeded md5-60bit bit positions, same
    distinct set-bit table, same all-k-bits-set membership rule."""
    two60 = 1 << 60

    def _pos(i: int, expr: str) -> str:
        return (
            f"CAST((('0x' || substr(md5('{seed + i}' || {expr}), 1, 15))::BIGINT"
            f" % {two60}) % {m_bits} AS INT)"
        )

    bit_branches = " UNION ALL ".join(
        f"SELECT {_pos(i, 'shingle')} AS pos FROM eval_sh"
        for i in range(k_hashes)
    )
    bloom_hit = " AND ".join(
        f"({_pos(i, 't.shingle')} IN (SELECT pos FROM bits))"
        for i in range(k_hashes)
    )
    return f"""
WITH {_SHINGLES.format(n=n).strip()},
eval_sh AS (SELECT DISTINCT shingle FROM sh2 WHERE doc_id % {modulus} = 0),
train AS (SELECT doc_id, shingle FROM sh2 WHERE doc_id % {modulus} <> 0),
bits AS (SELECT DISTINCT pos FROM ({bit_branches})),
probe AS (
  SELECT t.doc_id,
         CASE WHEN t.shingle IN (SELECT shingle FROM eval_sh) THEN 1 ELSE 0 END AS exact_hit,
         CASE WHEN {bloom_hit} THEN 1 ELSE 0 END AS bloom_hit
  FROM train t
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(exact_hit) AS BIGINT) AS n_hit_exact,
         CAST(SUM(bloom_hit) AS BIGINT) AS n_hit_bloom
  FROM probe GROUP BY 1
)
SELECT d.doc_id, COALESCE(a.n_shingles, 0) AS n_shingles,
       COALESCE(a.n_hit_exact, 0) AS n_hit_exact,
       COALESCE(a.n_hit_bloom, 0) AS n_hit_bloom,
       COALESCE(a.n_hit_bloom, 0) - COALESCE(a.n_hit_exact, 0) AS n_false_pos
FROM (SELECT doc_id FROM documents WHERE doc_id % {modulus} <> 0) d
LEFT JOIN agg a ON d.doc_id = a.doc_id
"""


def doc_pii_redact_sql(modulus: int = 7) -> str:
    """Twin of pii.redact_pii over pii.with_synthetic_pii: the patterns
    are written in the Java/RE2-portable subset (pii.py module doc)."""
    from ttmf_spark.datapipe.pii import EMAIL_RE, IPV4_RE, PHONE_RE

    return f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % {modulus} = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                   || '.1 tel +1415555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS text
  FROM documents
),
r1 AS (
  SELECT doc_id, text,
         regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS no_email
  FROM aug
),
r2 AS (
  SELECT doc_id, text, no_email,
         regexp_replace(no_email, '{IPV4_RE}', '<IP>', 'g') AS no_ip
  FROM r1
)
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(no_email, '{IPV4_RE}')) AS n_ips,
       len(regexp_extract_all(no_ip, '{PHONE_RE}')) AS n_phones,
       md5(regexp_replace(no_ip, '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_fp
FROM r2
"""


def doc_mixture_sample_sql(weights: dict[str, float], seed: int = 0) -> str:
    """Twin of curation.mixture_sample(hash_fn='md5'): the md5-60bit
    uniform draw is bit-identical on both engines; weights must be
    multiples of 1/1024 so p*2^60 is exact in a double (curation.py)."""
    rows = ", ".join(f"('{s}', {float(p)!r})" for s, p in sorted(weights.items()))
    u = _md5h(f"'{seed}' || CAST(doc_id AS VARCHAR)")
    two60 = 1 << 60
    return f"""
WITH w AS (SELECT * FROM (VALUES {rows}) AS t(source, p_keep))
SELECT d.doc_id, d.source, CAST(w.p_keep AS DOUBLE) AS p_keep,
       ROUND(CAST(1.0 AS DOUBLE) / CAST(w.p_keep AS DOUBLE), 6) AS sample_weight
FROM documents d JOIN w ON d.source = w.source
WHERE ({u} % {two60}) < CAST(floor(CAST(w.p_keep AS DOUBLE) * {float(two60)!r}) AS BIGINT)
"""


def doc_pack_plan_sql(budget: int = 256, n_buckets: int = 8, seed: int = 0) -> str:
    """Twin of packing.pack_sequences(hash_fn='md5'): same salted draw,
    same (hash, id) stream order, same concat-and-chunk window math."""
    u = _md5h(f"'{seed}' || CAST(doc_id AS VARCHAR)")
    two60 = 1 << 60
    return f"""
WITH base AS (
  SELECT doc_id, ({u} % {two60}) AS u, len({_TOKS}) AS n_tokens
  FROM documents
),
b AS (SELECT *, CAST(u % {n_buckets} AS INT) AS bucket FROM base),
s AS (
  SELECT doc_id, bucket, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY u, doc_id)
                       - n_tokens, 0) AS BIGINT) AS start_off
  FROM b
)
SELECT doc_id, bucket, start_off, n_tokens,
       CAST(floor(CAST(start_off AS DOUBLE) / {budget}) AS BIGINT) AS pack_first,
       CAST(floor(CAST(start_off + greatest(n_tokens, 1) - 1 AS DOUBLE) / {budget}) AS BIGINT) AS pack_last
FROM s
"""


def doc_stratified_sample_sql(k: int = 10, seed: int = 0) -> str:
    """Twin of curation.stratified_sample(hash_fn='md5'): the naive
    one-window rule — the two-phase Spark plan provably emits the same
    rows (global per-source top-k is contained in the per-bucket
    top-ks' union)."""
    u = _md5h(f"'{seed}' || CAST(doc_id AS VARCHAR)")
    two60 = 1 << 60
    return f"""
WITH h AS (SELECT doc_id, source, ({u} % {two60}) AS u FROM documents)
SELECT doc_id, source,
       CAST(row_number() OVER (PARTITION BY source ORDER BY u, doc_id) AS INT) AS rank
FROM h
QUALIFY rank <= {k}
"""


def emb_classify_sql(dim: int = 64) -> str:
    """Twin of classify.centroid_classify: per-class unit-vector mean
    centroids (rounded 8), rounded-6 dot scores, argmax with lowest-label
    tie-break."""
    cent_elems = ", ".join(f"ROUND(AVG(uv[{i + 1}]), 8)" for i in range(dim))
    return f"""
WITH {_UNIT_EMB.strip()},
lab AS (SELECT u2.vec_id, u2.uv, e.label
        FROM un u2 JOIN embeddings e ON e.vec_id = u2.vec_id),
cent AS (
  SELECT label AS cl, list_value({cent_elems}) AS cv
  FROM lab GROUP BY label
),
scored AS (
  SELECT l.vec_id, l.label, c.cl,
         ROUND(list_dot_product(l.uv, c.cv), 6) AS score
  FROM lab l CROSS JOIN cent c
),
ranked AS (
  SELECT vec_id, label, cl, score,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cl ASC) AS rn
  FROM scored
)
SELECT vec_id, CAST(label AS INT) AS label, CAST(cl AS INT) AS pred, score
FROM ranked WHERE rn = 1
"""


def emb_classifier_eval_sql(dim: int = 64) -> str:
    """Twin of classify.classifier_eval over emb_classify_sql."""
    return f"""
WITH cls AS ({emb_classify_sql(dim)})
SELECT CAST(label AS INT) AS label, COUNT(*) AS n,
       CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       ROUND(AVG(CASE WHEN pred = label THEN 1.0 ELSE 0.0 END), 6) AS accuracy
FROM cls GROUP BY label
"""


def emb_ann_recall_sql(k: int = 5, query_mod: int = 50) -> str:
    """Twin of similarity.ann_recall(lsh_topk, brute_force_topk): recall@k
    of the sign-LSH index against the exact cosine truth, per query."""
    return f"""
WITH b AS ({emb_topk_sql(k, query_mod)}),
l AS ({emb_lsh_topk_sql(k=k, query_mod=query_mod, multi_probe=True)}),
hits AS (
  SELECT b.query_id, COUNT(*) AS n_hits
  FROM b JOIN l ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
  GROUP BY b.query_id
)
SELECT q.query_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       ROUND(COALESCE(h.n_hits, 0) / {float(k)}, 6) AS recall
FROM (SELECT DISTINCT query_id FROM b) q
LEFT JOIN hits h ON h.query_id = q.query_id
"""


def emb_ivf_recall_sql(k: int = 5, query_mod: int = 50) -> str:
    """Twin of similarity.ann_recall(ivf_topk, brute_force_topk): recall@k
    of the IVF index (hash-sampled centroids, n_probe=4) vs the truth."""
    return f"""
WITH b AS ({emb_topk_sql(k, query_mod)}),
l AS ({emb_ivf_topk_sql(k=k, query_mod=query_mod)}),
hits AS (
  SELECT b.query_id, COUNT(*) AS n_hits
  FROM b JOIN l ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
  GROUP BY b.query_id
)
SELECT q.query_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       ROUND(COALESCE(h.n_hits, 0) / {float(k)}, 6) AS recall
FROM (SELECT DISTINCT query_id FROM b) q
LEFT JOIN hits h ON h.query_id = q.query_id
"""


def doc_top_quality_sql(k: int = 10) -> str:
    """Twin of curation.top_quality_per_source: naive per-source window
    top-k by (quality desc, doc_id) — the two-phase Spark plan is
    output-identical by construction."""
    return f"""
WITH q AS ({doc_quality_sql()})
SELECT doc_id, source, quality, CAST(rank AS INT) AS rank FROM (
  SELECT q.doc_id, d.source, q.quality,
         ROW_NUMBER() OVER (PARTITION BY d.source
                            ORDER BY q.quality DESC, q.doc_id ASC) AS rank
  FROM q JOIN documents d ON d.doc_id = q.doc_id
) t WHERE rank <= {k}
"""


def doc_weighted_sample_sql(k: int = 100, seed: int = 5) -> str:
    """Twin of curation.weighted_sample: same exact integer draw, same
    rounded Efraimidis-Spirakis key, same (key, doc_id) order."""
    h = _md5h(f"'{seed}' || CAST(q.doc_id AS VARCHAR)")
    two60 = 1 << 60
    u = f"(({h} % {two60}) + 1) / {two60}.0"
    return f"""
WITH q AS ({doc_quality_sql()}),
keyed AS (
  SELECT q.doc_id, d.source, q.quality,
         ROUND(-ln({u}) / (q.quality + 0.001), 12) AS key
  FROM q JOIN documents d ON d.doc_id = q.doc_id
)
SELECT doc_id, source, quality, key FROM keyed
ORDER BY key ASC, doc_id ASC
LIMIT {k}
"""


def doc_source_tfidf_sql(k: int = 10) -> str:
    """Twin of textstats.source_tfidf: naive per-source QUALIFY top-k —
    the two-phase Spark ranking is output-identical for any total order."""
    return f"""
WITH terms AS (
  SELECT source, unnest({_TOKS}) AS term FROM documents
),
tf AS (SELECT source, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
ns AS (SELECT COUNT(DISTINCT source) AS n FROM documents),
sf AS (SELECT term, COUNT(*) AS n_src FROM tf GROUP BY 1),
scored AS (
  SELECT tf.source, tf.term, tf.tf,
         ROUND(tf.tf * ln(ns.n * 1.0 / sf.n_src), 6) AS tfidf
  FROM tf JOIN sf ON sf.term = tf.term CROSS JOIN ns
)
SELECT source, term, tf, tfidf,
       CAST(ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY tfidf DESC, term ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def doc_lm_score_sql() -> str:
    """Twin of textstats.with_lm_score: same corpus unigram model, same
    per-doc mean negative log-probability (rounded 6)."""
    return f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
counts AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1),
tot AS (SELECT SUM(cnt) AS t FROM counts),
per_doc AS (
  SELECT toks.doc_id, COUNT(*) AS n_tokens,
         ROUND(AVG(-ln(counts.cnt / (SELECT t * 1.0 FROM tot))), 6) AS lm_ce
  FROM toks JOIN counts ON counts.tok = toks.tok
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       COALESCE(p.lm_ce, 0.0) AS lm_ce
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
"""


def doc_containment_pairs_sql(tau: float = 0.6, n: int = 3, max_df: int = 100) -> str:
    """Twin of dedup.containment_pairs: common / LEAST(|A|, |B|) with the
    same post-pruning size semantics as the jaccard twin."""
    return f"""
WITH {_SHINGLES.format(n=n).strip()},
keep AS (SELECT shingle FROM sh2 GROUP BY shingle HAVING COUNT(*) <= {max_df}),
sh3 AS (SELECT s.doc_id, s.shingle FROM sh2 s JOIN keep k ON s.shingle = k.shingle),
sizes3 AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh3 GROUP BY 1),
ov AS (
  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS common
  FROM sh3 a JOIN sh3 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ov.a, ov.b,
       ROUND(CAST(common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh), 6) AS containment
FROM ov JOIN sizes3 sa ON ov.a = sa.doc_id JOIN sizes3 sb ON ov.b = sb.doc_id
WHERE CAST(common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) >= {tau}
"""


def doc_segment_dedup_sql(k: int = 20, tau: float = 0.3) -> str:
    """Twin of dedup.segment_dup_stats(k, tau): non-overlapping k-word
    segments via list-slice over an exploded chunk index, md5 segment
    digests, corpus-wide occurrence counts, per-doc dup fraction."""
    return f"""
WITH w AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
idx AS (
  SELECT doc_id, ws,
         UNNEST(range(0, CAST(CEIL(len(ws) / {k}.0) AS BIGINT))) AS i
  FROM w
),
segs AS MATERIALIZED (
  SELECT doc_id,
         md5(array_to_string(ws[(i * {k} + 1):(i * {k} + {k})], ' ')) AS h
  FROM idx
),
gc AS (SELECT h, COUNT(*) AS c FROM segs GROUP BY 1)
SELECT s.doc_id,
       COUNT(*) AS n_segs,
       CAST(SUM(CASE WHEN gc.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segs,
       ROUND(CAST(SUM(CASE WHEN gc.c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS dup_frac,
       ROUND(CAST(SUM(CASE WHEN gc.c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) < {tau} AS keep
FROM segs s JOIN gc USING (h)
GROUP BY 1
"""


def _pq_parts(m: int = 16, k: int = 32, seed: int = 11, dim: int = 64):
    """Shared PQ CTE parts (u, cb, dist, md) + the per-sub slice CASE —
    used by both emb_pq_codes_sql and emb_pq_topk_sql."""
    dlen = dim // m
    cbs = []
    for j in range(m):
        a, b = j * dlen + 1, (j + 1) * dlen
        cbs.append(
            f"SELECT {j} AS sub, "
            f"ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS code, "
            f"v[{a}:{b}] AS cw FROM ("
            f"SELECT vec_id, v, ('0x' || substr(md5('{seed + j}' || "
            f"CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h "
            f"FROM u ORDER BY h, vec_id LIMIT {k})"
        )
    sv_cases = " ".join(
        f"WHEN cb.sub = {j} THEN t.v[{j * dlen + 1}:{(j + 1) * dlen}]"
        for j in range(m)
    )
    sq = (
        f"list_sum(list_transform(range(1, {dlen} + 1), "
        f"i -> (sv[i] - cb.cw[i]) * (sv[i] - cb.cw[i])))"
    )
    parts = f"""
u AS (SELECT vec_id,
           CASE WHEN nrm > 0 THEN list_transform(vr, x -> x / nrm)
                ELSE vr END AS v
      FROM (SELECT vec_id, vr,
                   sqrt(list_sum(list_transform(vr, x -> x * x))) AS nrm
            FROM (SELECT vec_id,
                         list_transform(embedding, x -> x::DOUBLE) AS vr
                  FROM embeddings) a) b),
cb AS MATERIALIZED ({' UNION ALL '.join(cbs)}),
dist AS MATERIALIZED (
  SELECT t.vec_id, cb.sub, cb.code, {sq} AS d
  FROM u t CROSS JOIN cb
  CROSS JOIN LATERAL (SELECT CASE {sv_cases} END AS sv) s
),
md AS (SELECT vec_id, sub, MIN(d) AS md FROM dist GROUP BY vec_id, sub)
"""
    return parts.strip(), sv_cases, sq


def emb_pq_codes_sql(m: int = 16, k: int = 32, seed: int = 11, dim: int = 64) -> str:
    """Twin of quantize.pq_codes (md5 hash mode): per-subspace codebook =
    k rows with the smallest md5 hash (ties by id), assignment = min
    squared-L2 with min-code tie-break, all over the UNIT-NORMALIZED
    vectors (cosine-consistent: unit-space L2^2 = 2 - 2cos). Distances are per-row sequential
    float folds on both engines; qerr ROUND(.,6) lands inside the gate's
    2e-6 comparator."""
    parts, _, _ = _pq_parts(m, k, seed, dim)
    return f"""
WITH {parts}
SELECT d.vec_id, CAST(d.sub AS INT) AS sub, CAST(MIN(d.code) AS INT) AS code,
       ROUND(MIN(d.d), 6) AS qerr
FROM dist d JOIN md ON md.vec_id = d.vec_id AND md.sub = d.sub AND d.d = md.md
GROUP BY d.vec_id, d.sub
"""


def emb_pq_topk_sql(
    m: int = 16,
    k_codes: int = 32,
    k: int = 5,
    seed: int = 11,
    dim: int = 64,
    query_mod: int = 50,
) -> str:
    """Twin of quantize.pq_topk: ADC ranking over the PQ code table.
    Per-entry query->codeword distances become 1e-9 fixed-point BIGINTs
    before the cross-row sum, so ranking is permutation-invariant and
    engine-exact (the PCRA integer-sum contract)."""
    parts, sv_cases, sq = _pq_parts(m, k_codes, seed, dim)
    return f"""
WITH {parts},
codes AS MATERIALIZED (
  SELECT d.vec_id AS neighbor_id, d.sub, MIN(d.code) AS code
  FROM dist d JOIN md ON md.vec_id = d.vec_id AND md.sub = d.sub AND d.d = md.md
  GROUP BY d.vec_id, d.sub
),
qd AS MATERIALIZED (
  SELECT t.vec_id AS query_id, cb.sub, cb.code,
         CAST(ROUND({sq} * 1e9) AS BIGINT) AS d_int
  FROM u t CROSS JOIN cb
  CROSS JOIN LATERAL (SELECT CASE {sv_cases} END AS sv) s
  WHERE t.vec_id % {query_mod} = 0
),
agg AS (
  SELECT qd.query_id, c.neighbor_id, SUM(qd.d_int) AS di
  FROM codes c JOIN qd ON qd.sub = c.sub AND qd.code = c.code
  WHERE c.neighbor_id <> qd.query_id
  GROUP BY qd.query_id, c.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, di,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY di ASC, neighbor_id ASC) AS rank
  FROM agg
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
       ROUND(di / 1e9, 6) AS adist
FROM ranked WHERE rank <= {k}
"""


def emb_pq_recall_sql(k: int = 5, query_mod: int = 50) -> str:
    """Twin of similarity.ann_recall(pq_topk, brute_force_topk) — but
    both sides rank the cosine neighborhood (PQ runs on unit vectors, so
    ADC distance estimates 2 - 2cos); recall@k reports how much of it
    the compression preserves — the trust gate before swapping the
    exact scan for the code scan."""
    return f"""
WITH b AS ({emb_topk_sql(k, query_mod)}),
l AS ({emb_pq_topk_sql(k=k, query_mod=query_mod)}),
hits AS (
  SELECT b.query_id, COUNT(*) AS n_hits
  FROM b JOIN l ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
  GROUP BY b.query_id
)
SELECT q.query_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       ROUND(COALESCE(h.n_hits, 0) / {float(k)}, 6) AS recall
FROM (SELECT DISTINCT query_id FROM b) q
LEFT JOIN hits h ON h.query_id = q.query_id
"""


def emb_ivfpq_topk_sql(
    m: int = 16,
    k_codes: int = 32,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 11,
    ivf_seed: int = 7,
    dim: int = 64,
    query_mod: int = 50,
) -> str:
    """Twin of quantize.ivfpq_topk: IVF cell pruning (hash-sampled
    centroids, rounded-cosine assignment, lower-cell tie-break — the
    emb_ivf_topk_sql rules) composed with ADC ranking over the PQ codes
    (the emb_pq_topk_sql integer-sum contract), all on ONE shared
    unit-vector CTE so neither side re-normalizes."""
    parts, sv_cases, sq = _pq_parts(m, k_codes, seed, dim)
    h = _md5h(f"'{ivf_seed}' || CAST(vec_id AS VARCHAR)")
    return f"""
WITH {parts},
codes AS MATERIALIZED (
  SELECT d.vec_id AS neighbor_id, d.sub, MIN(d.code) AS code
  FROM dist d JOIN md ON md.vec_id = d.vec_id AND md.sub = d.sub AND d.d = md.md
  GROUP BY d.vec_id, d.sub
),
qd AS MATERIALIZED (
  SELECT t.vec_id AS query_id, cb.sub, cb.code,
         CAST(ROUND({sq} * 1e9) AS BIGINT) AS d_int
  FROM u t CROSS JOIN cb
  CROSS JOIN LATERAL (SELECT CASE {sv_cases} END AS sv) s
  WHERE t.vec_id % {query_mod} = 0
),
cents AS (
  SELECT v AS cv, ROW_NUMBER() OVER (ORDER BY {h}, vec_id) - 1 AS cell
  FROM u ORDER BY {h}, vec_id LIMIT {n_cells}
),
cassign AS (
  SELECT vec_id AS neighbor_id, cell,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY ROUND(list_dot_product(v, cv), 6) DESC, cell ASC
         ) AS rn
  FROM u, cents
),
cidx AS (SELECT neighbor_id, cell FROM cassign WHERE rn = 1),
qassign AS (
  SELECT vec_id AS query_id, cell,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY ROUND(list_dot_product(v, cv), 6) DESC, cell ASC
         ) AS rn
  FROM u, cents WHERE vec_id % {query_mod} = 0
),
qidx AS (SELECT query_id, cell FROM qassign WHERE rn <= {n_probe}),
cand AS (
  SELECT qidx.query_id, cidx.neighbor_id
  FROM cidx JOIN qidx USING (cell)
  WHERE cidx.neighbor_id <> qidx.query_id
),
agg AS (
  SELECT c.query_id, c.neighbor_id, SUM(qd.d_int) AS di
  FROM cand c
  JOIN codes co ON co.neighbor_id = c.neighbor_id
  JOIN qd ON qd.query_id = c.query_id AND qd.sub = co.sub AND qd.code = co.code
  GROUP BY c.query_id, c.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, di,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY di ASC, neighbor_id ASC) AS rank
  FROM agg
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
       ROUND(di / 1e9, 6) AS adist
FROM ranked WHERE rank <= {k}
"""


def doc_kmv_distinct_sql(k: int = 64, n: int = 3, seed: int = 0) -> str:
    """Twin of sketch.kmv_distinct_shingles (md5 hash mode): distinct
    (source, word-n-gram), 60-bit md5 hashes, k-th smallest per source,
    est = (k-1) * 2^60 / h_(k) (exact count below k). One cast + one
    division — byte-identical, ROUND(.,6) on both engines."""
    two60 = float(1 << 60)
    return f"""
WITH stoks AS (
  SELECT source,
         list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS l
  FROM documents
),
ssh AS (
  SELECT source, unnest(list_distinct(
           CASE WHEN len(l) >= {n}
                THEN [array_to_string(l[i+1:i+{n}], ' ') for i in range(0, len(l)-{n}+1)]
                ELSE [array_to_string(l, ' ')] END)) AS tok
  FROM stoks
),
toks AS MATERIALIZED (
  SELECT DISTINCT source, tok,
         ('0x' || substr(md5('{seed}' || tok), 1, 15))::BIGINT AS u
  FROM ssh WHERE tok <> ''
),
exact AS (SELECT source, COUNT(*) AS n_exact FROM toks GROUP BY source),
ranked AS (
  SELECT source, u,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY u, tok) AS r
  FROM toks
),
sk AS (
  SELECT source, MAX(u) AS hk, COUNT(*) AS have
  FROM ranked WHERE r <= {k} GROUP BY source
),
j AS (
  SELECT e.source, e.n_exact,
         ROUND(CASE WHEN sk.have < {k} THEN CAST(e.n_exact AS DOUBLE)
               ELSE {float(k - 1)} * {two60} / CAST(sk.hk AS DOUBLE)
               END, 6) AS est
  FROM exact e JOIN sk ON sk.source = e.source
)
SELECT source, n_exact, est,
       ROUND(ABS(est - n_exact) / n_exact, 6) AS rel_err
FROM j
"""


def emb_semantic_dedup_sql(n_cells: int = 16, tau: float = 0.4, seed: int = 7) -> str:
    """Twin of similarity.semantic_dedup(hash_fn='md5'): md5-hash-sampled
    unit centroids, rounded-cosine nearest-cell assignment with lower-cell
    tie-break, intra-cell rounded-cosine >= tau pairs, dup_of = min
    lower-id cellmate (-1 for keepers)."""
    h = _md5h(f"'{seed}' || CAST(vec_id AS VARCHAR)")
    return f"""
WITH {_UNIT_EMB.strip()},
cents AS (
  SELECT uv AS cv, ROW_NUMBER() OVER (ORDER BY {h}, vec_id) - 1 AS cell
  FROM un ORDER BY {h}, vec_id LIMIT {n_cells}
),
cassign AS (
  SELECT vec_id, uv, cell,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY ROUND(list_dot_product(uv, cv), 6) DESC, cell ASC
         ) AS rn
  FROM un, cents
),
cidx AS MATERIALIZED (SELECT vec_id, uv, cell FROM cassign WHERE rn = 1),
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM cidx a JOIN cidx b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE ROUND(list_dot_product(a.uv, b.uv), 6) >= {tau}
),
dup AS (SELECT b AS vec_id, MIN(a) AS dup_of FROM pairs GROUP BY b)
SELECT c.vec_id, CAST(c.cell AS INT) AS cell,
       COALESCE(d.dup_of, -1) AS dup_of,
       (d.vec_id IS NULL) AS kept
FROM cidx c LEFT JOIN dup d ON d.vec_id = c.vec_id
"""


def doc_length_quantiles_sql(probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)) -> str:
    """Twin of textstats.length_quantiles: per-lang n_chars quantile_cont
    (linear interpolation = Spark's exact percentile)."""
    qcols = ", ".join(
        f"ROUND(quantile_cont(n_chars, {p}), 6) AS p{int(round(p * 100)):02d}"
        for p in probs
    )
    return f"""
SELECT lang AS grp, COUNT(*) AS n_docs, {qcols}
FROM documents GROUP BY lang
"""


def doc_shuffle_shards_sql(n_shards: int = 8, seed: int = 11) -> str:
    """Twin of curation.shuffle_shards(hash_fn='md5'): same salted
    60-bit order key + shard draw, same (ord, id) within-shard order."""
    u_ord = _md5h(f"'{seed}' || CAST(doc_id AS VARCHAR)")
    u_sh = _md5h(f"'{seed + 1}' || CAST(doc_id AS VARCHAR)")
    two60 = 1 << 60
    return f"""
WITH h AS (
  SELECT doc_id,
         ({u_ord} % {two60}) AS ord_key,
         CAST(({u_sh} % {two60}) % {n_shards} AS INT) AS shard
  FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY ord_key, doc_id) - 1
            AS BIGINT) AS pos
FROM h
"""


def doc_token_budget_sql(budget: int, weights: dict[str, float]) -> str:
    """Twin of curation.token_budget_plan: same token expression as
    doc_stats, floor(budget*weight) target, epochs from the floored
    integer target (round 6 on identical doubles in both engines)."""
    rows = ", ".join(f"('{s}', {float(p)!r})" for s, p in sorted(weights.items()))
    return f"""
WITH w AS (SELECT * FROM (VALUES {rows}) AS t(source, weight)),
s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
j AS (
  SELECT s.source, s.n_docs, s.n_tokens,
         CAST(COALESCE(w.weight, 0.0) AS DOUBLE) AS weight,
         CAST(floor(CAST({budget} AS DOUBLE) * COALESCE(w.weight, 0.0)) AS BIGINT)
           AS target_tokens
  FROM s LEFT JOIN w ON s.source = w.source
),
e AS (
  SELECT *, ROUND(CAST(target_tokens AS DOUBLE) / greatest(n_tokens, 1), 6) AS epochs
  FROM j
)
SELECT source, n_docs, n_tokens, weight, target_tokens, epochs,
       CAST(floor(epochs) AS BIGINT) AS full_passes,
       ROUND(epochs - floor(epochs), 6) AS tail_rate
FROM e
"""


def doc_sampled_quantiles_sql(
    k: int = 64,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    n_salts: int = 16,
    seed: int = 0,
) -> str:
    """Twin of sketch.sampled_quantiles(hash_fn='md5') over documents
    (grp=lang, v=n_chars): same seeded bottom-k-by-hash sample, same
    two-phase selection, same type-7 quantile (quantile_cont)."""
    two60 = 1 << 60
    arr = ", ".join(str(p) for p in probs)
    branches = " UNION ALL ".join(
        f"SELECT grp, n_docs, n_sample, {int(round(p * 100))} AS pct,"
        f" ROUND(qs[{i + 1}], 6) AS est, ROUND(qe[{i + 1}], 6) AS exact,"
        f" ROUND(ABS(ROUND(qs[{i + 1}], 6) - ROUND(qe[{i + 1}], 6)), 6) AS abs_err"
        f" FROM j"
        for i, p in enumerate(probs)
    )
    return f"""
WITH d AS (
  SELECT lang AS grp, n_chars AS v, doc_id AS id,
         ('0x' || substr(md5('{seed}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % {two60} AS u
  FROM documents
),
exact AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_docs,
         quantile_cont(v, [{arr}]) AS qe
  FROM d GROUP BY 1
),
s1 AS (
  SELECT * FROM d
  QUALIFY row_number() OVER (PARTITION BY grp, u % {n_salts} ORDER BY u, id) <= {k}
),
s2 AS (
  SELECT * FROM s1
  QUALIFY row_number() OVER (PARTITION BY grp ORDER BY u, id) <= {k}
),
est AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_sample,
         quantile_cont(v, [{arr}]) AS qs
  FROM s2 GROUP BY 1
),
j AS (
  SELECT e.grp, e.n_docs, s.n_sample, e.qe, s.qs
  FROM exact e JOIN est s USING (grp)
)
{branches}
"""


def doc_dsir_sql(
    n_buckets: int = 1024,
    ns: tuple[int, ...] = (1, 2),
    seed: int = 0,
    target_lang: str = "en",
) -> str:
    """Twin of dsir.dsir_scores(hash_fn='md5') with target = lang-
    filtered docs and raw = all documents: same every-occurrence hashed
    n-grams, same Laplace-smoothed bucket models, same 1e-9 fixed-point
    log-ratio and exact-integer per-doc sums."""
    two60 = 1 << 60
    bucket = (
        f"CAST((('0x' || substr(md5('{seed}' || gram), 1, 15))::BIGINT"
        f" % {two60}) % {n_buckets} AS INT)"
    )
    branches = " UNION ALL ".join(
        f"SELECT doc_id, lang, unnest(CASE WHEN len(l) >= {n} THEN "
        f"[array_to_string(l[i+1:i+{n}], ' ') for i in range(0, len(l)-{n}+1)]"
        f" ELSE [] END) AS gram FROM toks"
        for n in ns
    )
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                     x -> x <> '') AS l
  FROM documents
),
grams AS MATERIALIZED (
  SELECT doc_id, lang, gram, {bucket} AS bucket
  FROM ({branches}) WHERE gram <> ''
),
ct AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS _ct FROM grams
       WHERE lang = '{target_lang}' GROUP BY 1),
cr AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS _cr FROM grams GROUP BY 1),
tt AS (SELECT COUNT(*) AS n FROM grams WHERE lang = '{target_lang}'),
tr AS (SELECT COUNT(*) AS n FROM grams),
lam AS (
  SELECT CAST(b.range AS INT) AS bucket,
         CAST(ROUND((ln((COALESCE(ct._ct, 0) + 1) / ((SELECT n FROM tt) + {n_buckets}))
                   - ln((COALESCE(cr._cr, 0) + 1) / ((SELECT n FROM tr) + {n_buckets})))
                    * 1000000000) AS BIGINT) AS lam_fp
  FROM range({n_buckets}) b
  LEFT JOIN ct ON ct.bucket = b.range
  LEFT JOIN cr ON cr.bucket = b.range
),
per_doc AS (
  SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(lam.lam_fp) AS BIGINT) AS _s
  FROM grams g JOIN lam ON lam.bucket = g.bucket
  GROUP BY 1
)
SELECT d.doc_id, COALESCE(p.n_grams, 0) AS n_grams,
       ROUND(COALESCE(p._s, 0) / 1000000000.0, 6) AS logw,
       COALESCE(p._s, 0) > 0 AS selected
FROM (SELECT doc_id FROM documents) d
LEFT JOIN per_doc p ON p.doc_id = d.doc_id
"""


def _proj_sum_sql(entries_col: list, scale: float) -> str:
    """Chained +-CAST(embedding[j+1] AS DOUBLE) sum in ascending j —
    the same left-to-right IEEE addition order the Spark expression
    uses, so both engines agree bit-for-bit before ROUND."""
    expr = "0.0"
    for j, sign in entries_col:
        term = f"CAST(embedding[{j + 1}] AS DOUBLE)"
        expr = f"({expr} {'+' if sign > 0 else '-'} {term})"
    return f"ROUND({expr} * {scale!r}, 9)"


def emb_project_sql(k: int = 16, seed: int = 0, s: int = 3, dim: int = 64) -> str:
    """Twin of project.project_embeddings: identical Achlioptas entries
    (same seeded generator, inlined), identical chained-sum order."""
    from ttmf_spark.datapipe.project import _scale, projection_entries

    entries = projection_entries(dim, k, seed, s)
    sc = _scale(k, s)
    branches = " UNION ALL ".join(
        f"SELECT vec_id, CAST({i} AS INT) AS dim_i,"
        f" {_proj_sum_sql(entries[i], sc)} AS val FROM embeddings"
        for i in range(k)
    )
    return branches


def emb_projection_qa_sql(
    k: int = 16, seed: int = 0, s: int = 3, dim: int = 64, pair_mod: int = 2
) -> str:
    """Twin of project.projection_distortion: unit-space cosine of the
    raw 64-dim vectors vs of the k-dim projections on the deterministic
    (4m, 4m+2) pair sample; per-row list folds only (emb_topk numerics
    contract)."""
    from ttmf_spark.datapipe.project import _scale, projection_entries

    entries = projection_entries(dim, k, seed, s)
    sc = _scale(k, s)
    plist = ", ".join(_proj_sum_sql(entries[i], sc) for i in range(k))
    return f"""
WITH {_UNIT_EMB.strip()},
p AS (SELECT vec_id, [{plist}] AS pv FROM embeddings),
pn AS (SELECT vec_id, pv, sqrt(list_sum(list_transform(pv, x -> x * x))) AS nrm FROM p),
pun AS (SELECT vec_id,
               CASE WHEN nrm > 0 THEN list_transform(pv, x -> x / nrm) ELSE pv END AS up
        FROM pn),
base AS (SELECT un.vec_id, un.uv, pun.up FROM un JOIN pun ON un.vec_id = pun.vec_id),
a AS (SELECT CAST(vec_id / 2 AS BIGINT) AS m, vec_id AS a, uv AS uva, up AS upa
      FROM base WHERE vec_id % {2 * pair_mod} = 0),
b AS (SELECT CAST((vec_id - {pair_mod}) / 2 AS BIGINT) AS m, vec_id AS b, uv AS uvb, up AS upb
      FROM base WHERE vec_id % {2 * pair_mod} = {pair_mod})
SELECT a.a, b.b,
       ROUND(list_dot_product(a.uva, b.uvb), 6) AS cos_full,
       ROUND(list_dot_product(a.upa, b.upb), 6) AS cos_proj,
       ROUND(ABS(ROUND(list_dot_product(a.uva, b.uvb), 6)
               - ROUND(list_dot_product(a.upa, b.upb), 6)), 6) AS abs_err
FROM a JOIN b ON a.m = b.m
"""
