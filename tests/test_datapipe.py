"""Unit tests for the data-pipeline operators (dedup / similarity / text /
multimodal) against hand-computed and numpy oracles."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ttmf_spark.datapipe import dedup, multimodal, similarity, textstats

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (3, "completely different content about spark engines"),
    (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (5, "a b"),                                            # shorter than n
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _shingle_set(text, n=3):
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_exact_dedup(docs):
    out = {r["doc_id"]: r["dup_count"] for r in dedup.exact_dedup(docs).collect()}
    assert out[1] == 2  # docs 1 and 4 collapse, min id survives
    assert 4 not in out and out[2] == 1 and out[3] == 1


def test_jaccard_pairs_matches_set_oracle(docs):
    got = {(r["a"], r["b"]): r["jaccard"] for r in dedup.jaccard_pairs(docs, tau=0.3).collect()}
    for (a, ta), (b, tb) in [((1, DOCS[0][1]), (2, DOCS[1][1])), ((1, DOCS[0][1]), (4, DOCS[3][1]))]:
        sa, sb = _shingle_set(ta), _shingle_set(tb)
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.3:
            assert got[(a, b)] == pytest.approx(round(j, 6))
    assert (1, 4) in got and got[(1, 4)] == 1.0
    assert all(j >= 0.3 for j in got.values())


def test_minhash_recovers_exact_pairs(docs):
    exact = {(r["a"], r["b"]) for r in dedup.jaccard_pairs(docs, tau=0.6).collect()}
    approx = {(r["a"], r["b"]) for r in dedup.minhash_lsh_pairs(docs, tau=0.6, k=32, bands=16).collect()}
    # high-sim pairs survive LSH at r=2 with high probability; the exact
    # verify step guarantees no false positives
    assert approx <= exact
    assert (1, 4) in approx  # identical docs always collide


def test_simhash_identical_and_hamming(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(docs).collect()}
    assert sh[1] == sh[4]
    nd = {(r["a"], r["b"]): r["hamming"] for r in dedup.simhash_near_dup(docs, max_hamming=16).collect()}
    assert nd.get((1, 4)) == 0
    # recall guarantee (pigeonhole): every pair sharing a 16-bit block AND
    # within max_hamming must be found; pairs with hamming <= 3 always
    # share a block. Verify against a python oracle.
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(sh[a] ^ sh[b]).count("1")
            blocks_equal = any(
                (sh[a] >> (16 * k)) & 0xFFFF == (sh[b] >> (16 * k)) & 0xFFFF
                for k in range(4)
            )
            if ham <= 16 and blocks_equal:
                assert (a, b) in nd and nd[(a, b)] == ham
            if ham <= 3:
                assert (a, b) in nd


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(30, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)], ["vec_id", "embedding"]
    )
    queries = emb.filter(F.col("vec_id") < 3)
    got = dedup_rows = similarity.brute_force_topk(emb, queries, k=4).collect()
    unit = vecs.astype(np.float64)
    unit = unit / np.linalg.norm(unit, axis=1, keepdims=True)
    sims = unit @ unit.T
    for q in range(3):
        order = [
            i for i in sorted(range(30), key=lambda i: (-round(sims[q, i], 6), i)) if i != q
        ][:4]
        mine = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"]) if r["query_id"] == q]
        assert mine == order
        for r in got:
            if r["query_id"] == q:
                assert r["cos"] == pytest.approx(round(sims[q, r["neighbor_id"]], 6), abs=2e-6)


def test_lsh_topk_subset_of_brute(spark):
    rng = np.random.default_rng(1)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)], ["vec_id", "embedding"]
    )
    queries = emb.filter(F.col("vec_id") < 2)
    lsh = similarity.lsh_topk(emb, queries, k=40, p=3, dim=8).collect()
    # every returned neighbor shares the query's bucket and cosine is exact
    unit = vecs.astype(np.float64)
    unit = unit / np.linalg.norm(unit, axis=1, keepdims=True)
    for r in lsh:
        want = round(float(unit[r["query_id"]] @ unit[r["neighbor_id"]]), 6)
        assert r["cos"] == pytest.approx(want, abs=2e-6)


def test_token_counts_and_quality(docs):
    tc = {r["doc_id"]: (r["n_tokens"], r["n_subwords"]) for r in
          textstats.with_token_counts(docs).collect()}
    assert tc[1][0] == 9 and tc[5][0] == 2
    q = {r["doc_id"]: r for r in textstats.with_quality_score(docs).collect()}
    assert q[1]["stop_ratio"] == pytest.approx(2 / 9)  # 'the' twice
    assert q[1]["punct_ratio"] == 0.0
    assert 0.0 <= q[1]["quality"] <= 1.0


def test_langid(spark):
    d = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house"),
            (2, "el gato y la casa de que"),
            (3, "der hund und die katze ist"),
            (4, "xyz qqq zzz"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["lang_pred"] for r in textstats.with_lang_id(d).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_media_pipeline(spark):
    flat = spark.createDataFrame(
        [
            ("d1", 0, "image", None, "media://part/7"),
            ("d1", 1, "video", None, "media://supplier/13"),
            ("d2", 0, "audio", None, "media://order/11"),
            ("d2", 1, "text", "hello", None),
        ],
        ["doc_id", "pos", "kind", "text", "media_ref"],
    )
    media = multimodal.media_table(flat)
    rows = media.collect()
    assert len(rows) == 3
    img = [r for r in rows if r["kind"] == "image"][0]
    assert img["meta"]["width"] is not None and img["meta"]["codec"] == "fake-image"
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 3
    assert all(len(r["features"]) == multimodal.FEATURE_DIM for r in feats)
    # deterministic: same content -> same features
    again = multimodal.extract_features(media).collect()
    assert {r["media_ref"]: tuple(r["features"]) for r in feats} == {
        r["media_ref"]: tuple(r["features"]) for r in again
    }
    plan = multimodal.frame_sample_plan(media, every_ms=60000).collect()
    assert all(r["frame_ms"] % 60000 == 0 for r in plan)
    with pytest.raises(NotImplementedError):
        multimodal.decode_real(b"x", "image")


def test_ivf_topk_exact_within_probed_cells(spark):
    """IVF: every returned cosine is exact; full-probe == brute force;
    the Lloyd-refined variant returns the same contract."""
    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)], ["vec_id", "embedding"]
    )
    queries = emb.filter(F.col("vec_id") < 2)
    unit = vecs.astype(np.float64)
    unit = unit / np.linalg.norm(unit, axis=1, keepdims=True)

    ivf = similarity.ivf_topk(emb, queries, k=40, n_cells=4, n_probe=2).collect()
    assert len(ivf) > 0
    for r in ivf:
        want = round(float(unit[r["query_id"]] @ unit[r["neighbor_id"]]), 6)
        assert r["cos"] == pytest.approx(want, abs=2e-6)

    # probing ALL cells makes IVF exhaustive -> identical to brute force
    brute = similarity.brute_force_topk(emb, queries, k=5).collect()
    full = similarity.ivf_topk(emb, queries, k=5, n_cells=4, n_probe=4).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted([(r["query_id"], r["rank"], r["neighbor_id"]) for r in full]) == \
        sorted([(r["query_id"], r["rank"], r["neighbor_id"]) for r in brute])

    refined = similarity.ivf_topk(
        emb, queries, k=5, n_cells=4, n_probe=2, refine_iters=2
    ).collect()
    assert {tuple(r.asDict()) or () for r in refined} is not None
    assert all(1 <= r["rank"] <= 5 for r in refined)


def test_near_dup_clusters_chain(spark):
    """near_dup_clusters: a duplicate CHAIN (a~b, b~c, but a!~c after LSH
    thresholding would still connect via CC) collapses to ONE representative
    = min doc_id; unpaired docs keep themselves. Also pins the min-label
    semantics the DuckDB oracle unrolls."""
    from ttmf_spark.datapipe import dedup

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (10, base),                         # chain member
        (11, base + " extra"),              # near-dup of 10
        (12, base + " extra more"),         # near-dup of 11 (chain)
        (30, "completely different text about spark dataframes and arrow"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.near_dup_clusters(docs, tau=0.5, k=16, bands=8, n=3)
    got = {r["doc_id"]: (r["rep_id"], r["keep"]) for r in out.collect()}
    assert got[30] == (30, 1)                     # unpaired -> itself
    reps = {got[i][0] for i in (10, 11, 12)}
    assert reps == {10}, got                      # one cluster, min id wins
    assert [got[i][1] for i in (10, 11, 12)] == [1, 0, 0]
    assert out.count() == 4


def test_curation_verdict_reason_precedence(spark):
    from ttmf_spark.datapipe.curation import curation_verdict

    rep = "spam ham " * 40  # boilerplate: one repeated 2/3-gram
    good = " ".join(
        f"the w{i} of a v{i} and" for i in range(40)
    )  # long, stopword-rich, no repeated 3-gram ("and the" 2-grams repeat but <50%)
    rows = [
        (1, good, "en", "s", len(good)),       # ok
        (2, good, "en", "s", len(good)),       # duplicate of 1 (higher id loses)
        (3, "zz", "en", "s", 2),               # low_quality (tiny, no stopwords)
        (4, rep, "en", "s", len(rep)),         # boilerplate but ALSO low quality?
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    got = {r["doc_id"]: (r["reason"], r["keep"]) for r in curation_verdict(docs).collect()}
    assert got[1] == ("ok", True)
    assert got[2] == ("duplicate", False)
    assert got[3] == ("low_quality", False)
    # precedence: whatever the quality of 4, duplicate/low_quality outrank
    # boilerplate only if triggered; assert it is dropped as boilerplate
    # when its quality clears the bar
    assert got[4][1] is False and got[4][0] in ("boilerplate", "low_quality")


# --- decontamination / PII / mixture sampling -------------------------------


def test_contamination_scores_hand_oracle(spark):
    from ttmf_spark.datapipe import decontam

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),       # shares 'the quick brown'
            (2, "totally novel words only here"),   # zero overlap
            (3, "the quick brown fox jumps over"),  # superset of eval doc
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in decontam.contamination_scores(train, ev, n=3, tau=0.5).collect()
    }
    # train doc 1 == eval doc: all 3 shingles hit
    assert out[1]["n_shingles"] == 3 and out[1]["n_hit"] == 3
    assert out[1]["contamination"] == 1.0 and out[1]["contaminated"]
    assert out[2]["n_hit"] == 0 and not out[2]["contaminated"]
    # doc 3 has 4 shingles, 3 of which are eval shingles
    assert out[3]["n_shingles"] == 4 and out[3]["n_hit"] == 3
    assert out[3]["contamination"] == 0.75 and out[3]["contaminated"]


def test_contamination_short_doc_degenerate_shingle(spark):
    from ttmf_spark.datapipe import decontam

    train = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    ev = spark.createDataFrame([(2, "a b")], ["doc_id", "text"])
    row = decontam.contamination_scores(train, ev, n=3).collect()[0]
    assert row["n_shingles"] == 1 and row["n_hit"] == 1 and row["contaminated"]


def test_redact_pii_counts_and_fingerprint(spark):
    import hashlib

    from ttmf_spark.datapipe import pii

    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "host 192.168.0.1 and 10.0.0.2 up"),
            (3, "call +14155551234 today"),
            (4, "clean text no pii at all"),
            # the dotted-digit run inside the email host must be counted
            # as part of the email, not as an extra IP
            (5, "edge a@1.2.3.4.example.com end"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in pii.redact_pii(docs).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (1, 0, 0)
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (0, 2, 0)
    assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_phones"]) == (0, 0, 1)
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_phones"]) == (0, 0, 0)
    assert (out[5]["n_emails"], out[5]["n_ips"], out[5]["n_phones"]) == (1, 0, 0)
    expect = {
        1: "mail <EMAIL> now",
        2: "host <IP> and <IP> up",
        3: "call <PHONE> today",
        4: "clean text no pii at all",
        5: "edge <EMAIL> end",
    }
    for i, txt in expect.items():
        assert out[i]["redacted_fp"] == hashlib.md5(txt.encode()).hexdigest()


def test_mixture_sample_deterministic_and_unbiased(spark):
    from ttmf_spark.datapipe.curation import mixture_sample

    rows = [(i, f"s{i % 3}") for i in range(3000)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    weights = {"s0": 0.25, "s1": 0.5}  # s2 absent -> dropped entirely
    out = mixture_sample(docs, weights, seed=7).toPandas()
    assert set(out["source"]) <= {"s0", "s1"}
    # partitioning-invariant: identical keep set at any parallelism
    out2 = mixture_sample(docs.repartition(13), weights, seed=7).toPandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # empirical rate within 4 sigma of the Bernoulli expectation
    for s, p in weights.items():
        n = 1000
        got = (out["source"] == s).sum()
        assert abs(got - n * p) < 4 * (n * p * (1 - p)) ** 0.5
    # importance weight restores the unbiased count estimate
    est = out["sample_weight"].sum()
    assert abs(est - 2000) < 350
    # md5 mode (the oracle path) is deterministic too and close to p
    out3 = mixture_sample(docs, weights, seed=7, hash_fn="md5").toPandas()
    assert abs(len(out3) - (1000 * 0.25 + 1000 * 0.5)) < 120


def test_pack_sequences_window_math(spark):
    from ttmf_spark.datapipe.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, "tok " * (i * 3 + 1)) for i in range(40)] + [(99, "")],
        ["doc_id", "text"],
    )
    out = pack_sequences(docs, budget=16, n_buckets=2, seed=3).toPandas()
    assert len(out) == 41
    for b, grp in out.groupby("bucket"):
        # sort zero-token docs before any same-offset successor so the
        # running-sum walk is deterministic regardless of pandas tie order
        g = grp.sort_values(["start_off", "n_tokens"]).reset_index(drop=True)
        # offsets are the exact running sum of the stream
        run = 0
        for _, r in g.iterrows():
            assert r["start_off"] == run
            run += r["n_tokens"]
            first, last = r["pack_first"], r["pack_last"]
            assert first == r["start_off"] // 16
            span = max(r["n_tokens"], 1)
            assert last == (r["start_off"] + span - 1) // 16
            assert last >= first
    # zero-token doc occupies exactly one window
    z = out[out.doc_id == 99].iloc[0]
    assert z["n_tokens"] == 0 and z["pack_first"] == z["pack_last"]
    # partitioning-invariant plan
    out2 = pack_sequences(docs.repartition(7), budget=16, n_buckets=2, seed=3).toPandas()
    assert out.sort_values("doc_id").reset_index(drop=True).equals(
        out2.sort_values("doc_id").reset_index(drop=True)
    )


def test_stratified_sample_exact_k_and_two_phase_equivalence(spark):
    from pyspark.sql import functions as SF
    from pyspark.sql.window import Window

    from ttmf_spark.datapipe.curation import stratified_sample
    from ttmf_spark.datapipe.dedup import hash64

    rows = [(i, "big" if i < 900 else f"s{i % 5}") for i in range(1000)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    out = stratified_sample(docs, k=7, seed=1, n_salts=8).toPandas()
    sizes = out.groupby("source").size().to_dict()
    assert sizes["big"] == 7
    assert all(v <= 7 for v in sizes.values())
    # two-phase output == the naive single-window rule
    u = SF.pmod(hash64(SF.col("doc_id").cast("string"), seed=1), SF.lit(1 << 60))
    w = Window.partitionBy("source").orderBy("_u", "doc_id")
    naive = (
        docs.withColumn("_u", u)
        .withColumn("rank", SF.row_number().over(w))
        .filter(SF.col("rank") <= 7)
        .select("doc_id", "source", "rank")
        .toPandas()
    )
    key = ["source", "rank", "doc_id"]
    assert out.sort_values(key).reset_index(drop=True).equals(
        naive.sort_values(key).reset_index(drop=True)
    )
    # partitioning-invariant
    out2 = stratified_sample(docs.repartition(11), k=7, seed=1, n_salts=8).toPandas()
    assert out.sort_values(key).reset_index(drop=True).equals(
        out2.sort_values(key).reset_index(drop=True)
    )


def test_contamination_empty_doc_emits_clean_row(spark):
    from ttmf_spark.datapipe import decontam

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, ""), (3, "   ")],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(9, "the quick brown fox jumps")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in decontam.contamination_scores(train, ev).collect()}
    assert set(out) == {1, 2, 3}  # one row per training doc, always
    for i in (2, 3):
        assert out[i]["n_shingles"] == 0 and out[i]["n_hit"] == 0
        assert out[i]["contamination"] == 0.0 and not out[i]["contaminated"]


# --- centroid classifier (datapipe/classify.py) ------------------------------


def _np_centroid_classify(vecs, labels):
    """Numpy replica of classify.centroid_classify's contract: unit norm,
    per-class mean rounded 8, dot rounded 6, argmax ties to lowest label."""
    v = np.asarray(vecs, dtype=np.float64)
    n = np.linalg.norm(v, axis=1, keepdims=True)
    u = np.where(n > 0, v / np.where(n == 0, 1, n), v)
    labs = np.asarray(labels)
    classes = sorted(set(labels))
    cents = {c: np.round(u[labs == c].mean(axis=0), 8) for c in classes}
    out = []
    for i in range(len(v)):
        scores = [(round(float(u[i] @ cents[c]), 6), c) for c in classes]
        best = max(scores, key=lambda sc: (sc[0], -sc[1]))
        out.append((i, int(labs[i]), int(best[1]), best[0]))
    return out


@pytest.fixture(scope="module")
def labeled_emb(spark):
    rng = np.random.default_rng(11)
    labels = [i % 3 for i in range(30)]
    base = rng.normal(size=(3, 8))
    vecs = [base[l] + 0.3 * rng.normal(size=8) for l in labels]
    rows = [
        (i, [float(x) for x in vecs[i]], labels[i]) for i in range(30)
    ] + [(30, [0.0] * 8, 0)]  # zero vector: unit-norm guard path
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_centroid_classify_matches_numpy(spark, labeled_emb):
    from ttmf_spark.datapipe import classify

    got = sorted(
        map(tuple, classify.centroid_classify(labeled_emb, dim=8).collect())
    )
    rows = sorted(map(tuple, labeled_emb.collect()))
    exp = _np_centroid_classify([r[1] for r in rows], [r[2] for r in rows])
    exp = sorted((rows[i][0], l, p, s) for i, (_, l, p, s) in enumerate(exp))
    assert [g[:3] for g in got] == [e[:3] for e in exp]
    assert got == pytest.approx(exp, abs=1e-6)


def test_centroid_classify_partition_invariant(spark, labeled_emb):
    from ttmf_spark.datapipe import classify

    a = sorted(map(tuple, classify.centroid_classify(labeled_emb, dim=8).collect()))
    b = sorted(
        map(
            tuple,
            classify.centroid_classify(labeled_emb.repartition(7), dim=8).collect(),
        )
    )
    assert a == b


def test_classifier_eval_counts(spark, labeled_emb):
    from ttmf_spark.datapipe import classify

    cls = classify.centroid_classify(labeled_emb, dim=8)
    rows = cls.collect()
    ev = {r["label"]: (r["n"], r["n_correct"], r["accuracy"])
          for r in classify.classifier_eval(cls).collect()}
    for lab in {r["label"] for r in rows}:
        n = sum(1 for r in rows if r["label"] == lab)
        c = sum(1 for r in rows if r["label"] == lab and r["pred"] == lab)
        assert ev[lab] == (n, c, pytest.approx(round(c / n, 6)))
    # well-separated synthetic classes: the classifier should mostly work
    assert sum(e[1] for e in ev.values()) >= 25


def test_multi_probe_recall_dominates_single(spark):
    """Hamming-1 multi-probe can only improve recall@k vs the true top-k:
    its candidate set is a superset, and any candidate that displaces a
    true member must itself be a true member (higher exact cosine)."""
    from tests.conftest import SF_UNIT

    emb = spark.read.parquet(f"{SF_UNIT}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    brute = similarity.brute_force_topk(emb, queries, k=5)
    single = similarity.lsh_topk(emb, queries, k=5, p=4, dim=64)
    multi = similarity.lsh_topk(emb, queries, k=5, p=4, dim=64, multi_probe=True)
    r_s = {r["query_id"]: r["recall"]
           for r in similarity.ann_recall(single, brute, k=5).collect()}
    r_m = {r["query_id"]: r["recall"]
           for r in similarity.ann_recall(multi, brute, k=5).collect()}
    assert set(r_s) == set(r_m)
    assert all(r_m[q] >= r_s[q] for q in r_s)
    assert sum(r_m.values()) > sum(r_s.values())  # strictly better overall


def test_weighted_sample_deterministic_and_weighted(spark):
    from ttmf_spark.datapipe import curation

    from tests.conftest import SF_UNIT

    docs = spark.read.parquet(f"{SF_UNIT}/documents.parquet")
    a = [tuple(r) for r in curation.weighted_sample(docs, k=50, hash_fn="md5").collect()]
    b = [tuple(r) for r in
         curation.weighted_sample(docs.repartition(7), k=50, hash_fn="md5").collect()]
    assert a == b  # pure function of ids + quality, any partitioning
    # weighting sanity: the selected docs skew toward higher quality
    sel_q = sum(r[2] for r in a) / len(a)
    all_q = [r["quality"] for r in
             curation.weighted_sample(docs, k=docs.count(), hash_fn="md5").collect()]
    assert sel_q > sum(all_q) / len(all_q)


def test_segment_dup_stats_planted(spark):
    """segment_dup_stats on crafted docs: doc 1 and 2 share their first
    20-word segment exactly (aligned copy), doc 3 is unique, doc 4
    repeats its own first segment (within-doc dup counts too)."""
    seg_a = " ".join(f"w{i}" for i in range(20))
    seg_b = " ".join(f"x{i}" for i in range(20))
    seg_c = " ".join(f"y{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, seg_a + " " + seg_b),
            (2, seg_a + " " + seg_c),
            (3, seg_c.replace("y", "z")),
            (4, seg_a.replace("w", "v") + " " + seg_a.replace("w", "v")),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_segs"], r["n_dup_segs"], r["dup_frac"], r["keep"])
        for r in dedup.segment_dup_stats(docs, k=20, tau=0.6).collect()
    }
    assert got[1] == (2, 1, 0.5, True)
    assert got[2] == (2, 1, 0.5, True)
    assert got[3] == (1, 0, 0.0, True)
    assert got[4] == (2, 2, 1.0, False)  # self-repeat is still dup text


def test_pq_codes_properties(spark):
    """quantize.pq_codes: every vector gets exactly one code per
    subspace, codes are in range, a row sampled INTO the codebook
    self-assigns with qerr 0 in every subspace, and the assignment is
    the argmin a numpy replica computes from the same codebook."""
    from ttmf_spark.datapipe import quantize

    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(8).astype(float).tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    m, k = 2, 4
    cb = quantize.pq_codebook(emb, m=m, k=k, seed=5, hash_fn="md5", normalize=False)
    got = quantize.pq_assign(emb, cb, m=m, normalize=False).collect()

    per_vec = {}
    for r in got:
        per_vec.setdefault(r["vec_id"], {})[r["sub"]] = (r["code"], r["qerr"])
    assert set(per_vec) == {i for i, _ in rows}
    assert all(set(v) == {0, 1} for v in per_vec.values())
    assert all(0 <= c < k and q >= 0 for v in per_vec.values() for c, q in v.values())

    # numpy replica of the argmin against the fitted codebook
    cbl = {(r["sub"], r["code"]): np.array(r["cw"]) for r in cb.collect()}
    vecs = {i: np.array(v) for i, v in rows}
    for vid, subs in per_vec.items():
        for sub, (code, qerr) in subs.items():
            sv = vecs[vid][sub * 4:(sub + 1) * 4]
            dists = [float(((sv - cbl[(sub, c)]) ** 2).sum()) for c in range(k)]
            assert code == int(np.argmin(dists))
            assert abs(qerr - min(dists)) < 1e-6

    # codebook rows self-assign at zero error: find a sampled vec by
    # matching a codeword to its source subvector
    zero_rows = [r for r in got if r["qerr"] == 0.0]
    assert len(zero_rows) >= k  # every sampled row is exact in its subspace


def test_kmv_distinct_shingles(spark):
    """KMV sketch: exact path below k (est == n_exact, rel_err 0) and
    estimator path above k (est within 4/sqrt(k) of truth — 4 sigma on
    the KMV std of ~1/sqrt(k-2)); deterministic across runs."""
    from ttmf_spark.datapipe import sketch

    rows = [(i, " ".join(f"w{(i * 37 + j) % 500}" for j in range(40)),
             "big" if i % 2 == 0 else "small")
            for i in range(60)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    # "small" keeps ONE doc (38 shingles, below k); "big" keeps many
    docs = docs.filter((F.col("source") == "big") | (F.col("doc_id") == 1))
    k = 64
    got = {r["source"]: r for r in
           sketch.kmv_distinct_shingles(docs, k=k, hash_fn="md5").collect()}
    big, small = got["big"], got["small"]
    assert small["n_exact"] < k and small["est"] == float(small["n_exact"])
    assert small["rel_err"] == 0.0
    assert big["n_exact"] > k
    assert big["rel_err"] <= 4.0 / (k - 2) ** 0.5
    again = {r["source"]: r for r in
             sketch.kmv_distinct_shingles(docs, k=k, hash_fn="md5").collect()}
    assert again == got


def test_semantic_dedup_keep_rule(spark):
    """semantic_dedup on planted vectors: identical vectors in one cell
    collapse to the lowest id; orthogonal vectors all survive; dup_of is
    always a lower id in the same cell above tau."""
    from ttmf_spark.datapipe import similarity as S

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [1.0, 0.0, 0.0, 0.0], 0),   # dup of 1
        (3, [0.999, 0.01, 0.0, 0.0], 0),  # near-dup of 1
        (4, [0.0, 1.0, 0.0, 0.0], 0),
        (5, [0.0, 0.0, 1.0, 0.0], 0),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r["vec_id"]: (r["dup_of"], r["kept"])
           for r in S.semantic_dedup(emb, n_cells=3, tau=0.9).collect()}
    assert out[1] == (-1, True)
    assert out[2][0] == 1 and not out[2][1]
    # 3 collapses to 1 iff same cell; either way never to a higher id
    assert out[3][0] in (-1, 1, 2)
    assert out[4] == (-1, True) and out[5] == (-1, True)


def test_length_quantiles_match_numpy(spark):
    """length_quantiles equals numpy linear-interpolation percentiles."""
    import numpy as np
    from ttmf_spark.datapipe import textstats as T

    vals = {"en": [10, 20, 30, 40, 50, 60, 61], "fr": [5, 7]}
    rows = [(i, "x", lang, "s", n)
            for i, (lang, ns) in enumerate(
                (lg, n) for lg, lst in vals.items() for n in lst
            ) for n in [ns]]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["grp"]: r for r in T.length_quantiles(docs).collect()}
    for lang, lst in vals.items():
        for p, col in [(25, "p25"), (50, "p50"), (75, "p75"), (95, "p95")]:
            exp = round(float(np.percentile(lst, p)), 6)
            assert abs(got[lang][col] - exp) < 1e-9, (lang, col)
        assert got[lang]["n_docs"] == len(lst)


def test_value_anomalies_planted_outlier(spark):
    """value_anomalies flags exactly the planted spike and nothing from a
    constant-valued (zero-variance) type."""
    from ttmf_spark.datapipe import events as E
    import datetime

    ts = datetime.datetime(2026, 1, 1)
    rows = [(i, ts, 1, "a", 10.0 + (i % 3) * 0.1, "{}") for i in range(20)]
    rows.append((99, ts, 1, "a", 1000.0, "{}"))            # spike
    rows += [(200 + i, ts, 2, "b", 5.0, "{}") for i in range(5)]  # zero var
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = E.value_anomalies(ev)
    got = [(r["event_id"], r["event_type"]) for r in out.collect()]
    assert got == [(99, "a")]


def test_shuffle_shards_is_permutation_and_partition_invariant(spark):
    """Every doc appears exactly once; per-shard positions are dense
    0..n_s-1; and the plan is identical when the input arrives in a
    different partitioning/order (the no-rand() contract)."""
    from ttmf_spark.datapipe.curation import shuffle_shards

    docs = spark.createDataFrame(
        [(f"d{i:03d}", f"text {i}") for i in range(97)], "doc_id string, text string"
    )
    out = shuffle_shards(docs, n_shards=4, seed=11).collect()
    assert len(out) == 97 and len({r["doc_id"] for r in out}) == 97
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    out2 = shuffle_shards(docs.repartition(7).orderBy("text"), n_shards=4, seed=11)
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2.collect()))
    # a different seed produces a different order (not a degenerate key)
    out3 = shuffle_shards(docs, n_shards=4, seed=12).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, out3))


def test_token_budget_plan_math(spark):
    """epochs/full_passes/tail_rate satisfy their defining identities and
    an unweighted source is reported with weight 0, not dropped."""
    from ttmf_spark.datapipe.curation import token_budget_plan

    docs = spark.createDataFrame(
        [("a1", "one two three", "web"), ("a2", "four five", "web"),
         ("b1", "x y z w", "code"), ("c1", "lone doc here", "ghost")],
        "doc_id string, text string, source string",
    )
    rows = {r["source"]: r for r in token_budget_plan(
        docs, budget=16, weights={"web": 0.5, "code": 0.25}
    ).collect()}
    assert set(rows) == {"web", "code", "ghost"}
    web = rows["web"]
    assert (web["n_docs"], web["n_tokens"], web["target_tokens"]) == (2, 5, 8)
    assert web["epochs"] == 1.6 and web["full_passes"] == 1
    assert abs(web["tail_rate"] - 0.6) < 1e-9
    assert rows["code"]["target_tokens"] == 4 and rows["code"]["epochs"] == 1.0
    assert rows["code"]["full_passes"] == 1 and rows["code"]["tail_rate"] == 0.0
    ghost = rows["ghost"]
    assert ghost["weight"] == 0.0 and ghost["target_tokens"] == 0
    assert ghost["epochs"] == 0.0 and ghost["full_passes"] == 0


def test_cms_counts_one_sided_and_collision_overcount(spark):
    """CMS estimates are >= exact for every key (one-sided error), exact
    totals are right, and a deliberately tiny width forces at least one
    collision overcount; depth=width-large recovers exactness."""
    from ttmf_spark.datapipe.sketch import cms_counts

    rows = [(i, 1000 + (i % 7), "t") for i in range(140)]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    out = {r["user_id"]: r for r in cms_counts(ev, width=2, depth=2).collect()}
    assert len(out) == 7
    assert all(r["est"] >= r["n_exact"] for r in out.values())
    assert all(r["overcount"] == r["est"] - r["n_exact"] for r in out.values())
    assert sum(r["n_exact"] for r in out.values()) == 140
    assert any(r["overcount"] > 0 for r in out.values())  # width 2, 7 keys
    wide = cms_counts(ev, width=4096, depth=4).collect()
    assert all(r["overcount"] == 0 for r in wide)


def test_bloom_contamination_one_sided_and_fp_forcing(spark):
    """Bloom decontamination never misses a real hit (no false negatives,
    any m), a tiny filter forces false positives, and a wide filter with
    the same seeds recovers the exact join."""
    from ttmf_spark.datapipe import decontam

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),       # 3/3 shingles hit
            (2, "totally novel words only here"),   # zero true overlap
            (3, "the quick brown fox jumps over"),  # 3/4 shingles hit
            (4, "x y"),                             # degenerate, clean
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], ["doc_id", "text"]
    )

    tiny = {
        r["doc_id"]: r
        for r in decontam.bloom_contamination(
            train, ev, m_bits=2, k_hashes=2, n=3
        ).collect()
    }
    assert set(tiny) == {1, 2, 3, 4}
    # exact side matches contamination_scores semantics
    assert tiny[1]["n_hit_exact"] == 3 and tiny[3]["n_hit_exact"] == 3
    assert tiny[2]["n_hit_exact"] == 0 and tiny[4]["n_hit_exact"] == 0
    # one-sided: bloom >= exact everywhere, and m=2 bits saturate -> FPs
    assert all(r["n_hit_bloom"] >= r["n_hit_exact"] for r in tiny.values())
    assert all(
        r["n_false_pos"] == r["n_hit_bloom"] - r["n_hit_exact"]
        for r in tiny.values()
    )
    assert sum(r["n_false_pos"] for r in tiny.values()) > 0

    wide = decontam.bloom_contamination(
        train, ev, m_bits=1 << 16, k_hashes=3, n=3
    ).collect()
    assert all(r["n_false_pos"] == 0 for r in wide)
    assert {r["doc_id"]: r["n_hit_bloom"] for r in wide} == {
        1: 3, 2: 0, 3: 3, 4: 0
    }


def test_cms_heavy_hitters_superset_guarantee(spark):
    """The CMS shortlist contains EVERY true phi-heavy hitter (one-sided),
    a tiny width adds collision keys flagged is_true_hh=false, and a wide
    sketch returns exactly the true heavy hitters."""
    from ttmf_spark.datapipe.sketch import cms_heavy_hitters

    # 1 hot key (500 events), 20 cold keys (5 each): N=600, phi=1/4 -> 150
    rows = [(i, 1, "t") for i in range(500)]
    rows += [(1000 + i, 2 + (i % 20), "t") for i in range(100)]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")

    wide = cms_heavy_hitters(ev, phi_num=1, phi_den=4, width=4096, depth=4)
    assert [(r["user_id"], r["n_exact"], r["is_true_hh"]) for r in wide.collect()] == [
        (1, 500, True)
    ]

    tiny = {r["user_id"]: r for r in
            cms_heavy_hitters(ev, phi_num=1, phi_den=4, width=2, depth=1).collect()}
    assert 1 in tiny and tiny[1]["is_true_hh"]          # never dropped
    assert any(not r["is_true_hh"] for r in tiny.values())  # collision flags
    assert all(r["est"] >= r["n_exact"] for r in tiny.values())


def test_sampled_quantiles_exact_below_k_and_bounded_error(spark):
    """Groups with <= k rows recover the exact quantiles (the sample IS
    the group); a large group samples exactly k rows, estimates within a
    sane band, and the choice of rows is a pure function of the id set
    (identical under repartitioning)."""
    from ttmf_spark.datapipe.sketch import sampled_quantiles

    rows = [(i, "big", i % 1000) for i in range(5000)]
    rows += [(10000 + i, "tiny", 10 * i) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")

    out = sampled_quantiles(docs, k=64, n_salts=4).collect()
    by = {(r["grp"], r["pct"]): r for r in out}

    # tiny group: n_docs == n_sample -> est == exact, abs_err == 0
    for pct in (25, 50, 75, 95):
        r = by[("tiny", pct)]
        assert r["n_docs"] == 20 and r["n_sample"] == 20
        assert r["est"] == r["exact"] and r["abs_err"] == 0.0

    # big group: exactly k sampled; uniform 0..999 -> p50 within ~4/sqrt(64)*250
    big = by[("big", 50)]
    assert big["n_docs"] == 5000 and big["n_sample"] == 64
    assert abs(big["est"] - big["exact"]) < 200

    # partitioning-invariance of the whole result
    again = sampled_quantiles(docs.repartition(13), k=64, n_salts=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_dsir_prefers_target_like_docs(spark):
    """Docs whose n-gram bag matches the target domain score higher than
    off-domain docs, empty docs emit a clean zero row, and the result is
    partitioning-invariant (exact-integer per-doc sums)."""
    from ttmf_spark.datapipe import dsir

    raw = spark.createDataFrame(
        [
            (1, "cats purr and cats nap on warm mats"),
            (2, "the compiler emits llvm bytecode for the loop"),
            (3, "cats chase mice while cats purr"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(100, "cats purr cats nap cats play"), (101, "warm cats on mats")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dsir.dsir_scores(raw, target, n_buckets=512).collect()}
    assert set(out) == {1, 2, 3, 4}
    # cat docs beat the compiler doc; selected is exactly the sign rule
    assert out[1]["logw"] > out[2]["logw"] and out[3]["logw"] > out[2]["logw"]
    assert not out[2]["selected"]
    assert all(r["selected"] == (r["logw"] > 0) for r in out.values())
    # empty doc: present, zero grams, never selected
    assert out[4]["n_grams"] == 0 and out[4]["logw"] == 0.0 and not out[4]["selected"]

    again = {r["doc_id"]: r for r in
             dsir.dsir_scores(raw.repartition(7), target, n_buckets=512).collect()}
    assert {k: tuple(v) for k, v in out.items()} == {k: tuple(v) for k, v in again.items()}


def test_jl_projection_matches_numpy_and_preserves_cosine(spark):
    """project_embeddings equals the numpy Achlioptas replica, the
    distortion gate's full-space cosine is the true cosine, and the JL
    promise holds loosely (mean distortion well under the random-guess
    level) — all partitioning-invariant."""
    import numpy as np
    from ttmf_spark.datapipe import project

    rng = np.random.default_rng(7)
    dim, k, n = 32, 12, 40
    vecs = rng.normal(size=(n, dim)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        ["vec_id", "embedding"],
    )
    out = project.project_embeddings(emb, k=k, seed=3, dim=dim).toPandas()
    assert len(out) == n * k

    # numpy replica: same entries, same order of addition
    entries = project.projection_entries(dim, k, seed=3)
    sc = project._scale(k, 3)
    got = {(r.vec_id, r.dim_i): r.val for r in out.itertuples()}
    for i in range(n):
        v = vecs[i].astype("float64")
        for d in range(k):
            acc = 0.0
            for j, sign in entries[d]:
                acc = acc + v[j] if sign > 0 else acc - v[j]
            assert got[(i, d)] == round(acc * sc, 9)

    qa = project.projection_distortion(emb, k=k, seed=3, dim=dim).toPandas()
    assert len(qa) == n // 4
    for r in qa.itertuples():
        a, b = vecs[int(r.a)], vecs[int(r.b)]
        true_cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.cos_full - true_cos) < 1e-5
    assert qa["abs_err"].mean() < 0.5  # JL: far better than uninformative

    again = project.project_embeddings(
        emb.repartition(9), k=k, seed=3, dim=dim
    ).toPandas()
    assert sorted(map(tuple, again.values.tolist())) == sorted(
        map(tuple, out.values.tolist())
    )


def test_caption_pairs_nearest_with_preceding_tie(spark):
    """Caption rule pinned on a crafted doc: preceding text wins distance
    ties, following text wins when strictly nearer, out-of-gap media
    emits NULL caption, text spans never emit rows."""
    from ttmf_spark.datapipe.multimodal import caption_pairs, interleave_stats

    rows = [
        # doc A: text(0), image(1) -> prev at gap 1
        ("A", 0, "text", "alpha", None),
        ("A", 1, "image", None, "m://1"),
        # doc A: image(2) equidistant between text(1)? no — text(0) at 2,
        # text(3) at 1 -> following strictly nearer
        ("A", 2, "image", None, "m://2"),
        ("A", 3, "text", "beta", None),
        # doc B: image(0) then text(1): only following
        ("B", 0, "video", None, "m://3"),
        ("B", 1, "text", "gamma", None),
        # doc B: audio(4) -> nearest text at distance 3 > max_gap=2 -> NULL
        ("B", 4, "audio", None, "m://4"),
    ]
    flat = spark.createDataFrame(
        rows, ["doc_id", "pos", "kind", "text", "media_ref"]
    )
    out = {(r.doc_id, r.pos): r for r in caption_pairs(flat, max_gap=2).collect()}
    assert set(out) == {("A", 1), ("A", 2), ("B", 0), ("B", 4)}
    assert out[("A", 1)].caption_text == "alpha"          # preceding
    assert out[("A", 2)].caption_text == "beta"           # following nearer
    assert out[("B", 0)].caption_text == "gamma"          # only following
    assert out[("B", 4)].caption_pos is None              # out of gap

    # equidistant tie prefers the PRECEDING text
    tie = spark.createDataFrame(
        [("C", 0, "text", "before", None),
         ("C", 1, "image", None, "m://5"),
         ("C", 2, "text", "after", None)],
        ["doc_id", "pos", "kind", "text", "media_ref"],
    )
    t = caption_pairs(tie, max_gap=2).collect()[0]
    assert t.caption_text == "before" and t.caption_pos == 0

    stats = {r.kind: r for r in interleave_stats(flat).collect()}
    assert stats["image"].n_spans == 2 and stats["image"].n_docs == 1
    assert stats["text"].n_refs == 0
    assert stats["image"].spans_per_doc == 2.0
