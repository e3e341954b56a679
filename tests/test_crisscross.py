"""Crisscross fusion net (kg/crisscross.py — reference Model1.py:23-160):
gradient check, loop-oracle forward parity, determinism, e2e scoring."""

from __future__ import annotations

import numpy as np

from ttmf_spark.kg import crisscross as cc


def _tiny_setup(seed=7, B=9, ent_dim=5, rel_dim=4, n_ent=11, n_rel=6, L=3):
    rng = np.random.default_rng(seed)
    E = rng.normal(0, 0.4, (n_ent, ent_dim))
    R = rng.normal(0, 0.4, (n_rel, rel_dim))
    batch = {
        "h": rng.integers(0, n_ent, B),
        "t": rng.integers(0, n_ent, B),
        "r": rng.integers(0, n_rel, B),
        "transe": rng.normal(0, 1, B),
        "rrank": rng.normal(0, 1, (B, 6)),
    }
    for k in (1, 2, 3):
        for nm in ("h", "t", "r"):
            n_vocab = n_rel if nm == "r" else n_ent
            toks = rng.integers(0, n_vocab, (B, L))
            # sprinkle padding: some suffix steps zeroed
            cut = rng.integers(0, L + 1, B)
            for i, ci in enumerate(cut):
                toks[i, ci:] = 0
            batch[f"p{k}_{nm}"] = toks
    y = rng.integers(0, 2, B).astype(np.float64)
    params = cc.init_params(ent_dim, rel_dim, rnn_h=6, rr_h=5, bp_h=4, seed=seed)
    return batch, y, params, (E, R)


def test_gradient_check_finite_difference():
    """Analytic grads == central finite differences (train-mode BN,
    dropout off) for every trained tensor, sampled entries."""
    batch, y, params, emb = _tiny_setup()
    loss0, g = cc.loss_and_grads(batch, y, params, emb)
    rng = np.random.default_rng(0)
    eps = 1e-6
    for key in cc._trained_keys(params):
        base = np.atleast_1d(np.asarray(params[key], dtype=np.float64))
        flat_idx = rng.choice(base.size, size=min(4, base.size), replace=False)
        for fi in flat_idx:
            pert = base.copy().reshape(-1)
            pert[fi] += eps
            params2 = dict(params)
            params2[key] = pert.reshape(np.shape(params[key])) if np.ndim(params[key]) else float(pert[0])
            lp, _ = cc.loss_and_grads(batch, y, params2, emb)
            pert[fi] -= 2 * eps
            params2[key] = pert.reshape(np.shape(params[key])) if np.ndim(params[key]) else float(pert[0])
            lm, _ = cc.loss_and_grads(batch, y, params2, emb)
            fd = (lp - lm) / (2 * eps)
            an = np.atleast_1d(np.asarray(g[key])).reshape(-1)[fi]
            assert abs(fd - an) <= 1e-5 * max(1.0, abs(fd), abs(an)), (
                key, fi, fd, an,
            )


def _loop_forward_one(i, batch, params, emb):
    """Per-example pure-loop eval-mode forward (independent oracle)."""
    E, R = emb
    pvs = []
    for k in (1, 2, 3):
        Wx, Wh, b = params[f"rnn{k}_Wx"], params[f"rnn{k}_Wh"], params[f"rnn{k}_b"]
        s = np.zeros(Wh.shape[0])
        for step in range(batch[f"p{k}_h"].shape[1]):
            ph = batch[f"p{k}_h"][i, step]
            pt = batch[f"p{k}_t"][i, step]
            pr = batch[f"p{k}_r"][i, step]
            if ph == 0 or pt == 0 or pr == 0:
                continue  # Keras mask: state carries through
            x = np.concatenate(
                [E[batch["h"][i]], R[batch["r"][i]], E[batch["t"][i]],
                 E[ph], R[pr], E[pt]]
            )
            s = np.tanh(x @ Wx + s @ Wh + b)
        xhat = (s - params[f"bn{k}_mean"]) / np.sqrt(params[f"bn{k}_var"] + cc.BN_EPS)
        bn = params[f"bn{k}_gamma"] * xhat + params[f"bn{k}_beta"]
        pvs.append(1 / (1 + np.exp(-(bn @ params[f"pv{k}_W"] + params[f"pv{k}_b"]))))
    h_rr = np.tanh(batch["rrank"][i] @ params["rr_W1"] + params["rr_b1"])
    rr_v = 1 / (1 + np.exp(-(h_rr @ params["rr_W2"] + params["rr_b2"])))
    bp_in = np.array([*pvs, batch["transe"][i], rr_v])
    z1 = bp_in @ params["bp_W1"] + params["bp_b1"]
    logits = z1 @ params["bp_W2"] + params["bp_b2"]
    ez = np.exp(logits - logits.max())
    return ez / ez.sum()


def test_forward_matches_loop_oracle():
    batch, _y, params, emb = _tiny_setup(seed=3, B=13)
    # non-trivial BN stats
    rng = np.random.default_rng(5)
    for k in (1, 2, 3):
        params[f"bn{k}_mean"] = rng.normal(0, 0.1, 6)
        params[f"bn{k}_var"] = rng.uniform(0.5, 2.0, 6)
    probs, _ = cc.forward(batch, params, emb, train=False)
    for i in range(13):
        expect = _loop_forward_one(i, batch, params, emb)
        np.testing.assert_allclose(probs[i], expect, rtol=1e-10, atol=1e-12)


def test_fit_deterministic_and_separates():
    """Same seed -> identical weights; fitted net separates a linearly
    separable synthetic pair set (signal in transE + rrank + paths)."""
    rng = np.random.default_rng(11)
    B = 240
    batch, _, _, emb = _tiny_setup(seed=11, B=B)
    y = (rng.random(B) < 0.5).astype(np.float64)
    # plant signal: positives get higher transe margin + rrank shift
    batch["transe"] = y * 1.5 + rng.normal(0, 0.3, B)
    batch["rrank"] = rng.normal(0, 0.5, (B, 6)) + y[:, None]
    w1 = cc.fit_crisscross(batch, y, *emb, epochs=12, seed=9)
    w2 = cc.fit_crisscross(batch, y, *emb, epochs=12, seed=9)
    for k in cc._trained_keys(w1):
        np.testing.assert_array_equal(np.asarray(w1[k]), np.asarray(w2[k]))
    probs, _ = cc.forward(batch, w1, emb, train=False)
    assert probs[y == 1, 1].mean() > probs[y == 0, 1].mean() + 0.1


def test_score_triples_crisscross_end_to_end(spark):
    from tests.test_kg import TINY_TRIPLES
    from ttmf_spark.kg.pipeline import build_context, fit_fusion, score_ids

    tiny = spark.createDataFrame(TINY_TRIPLES, ["s", "p", "o"])
    ctx, model = build_context(spark, tiny, transe_kw={"epochs": 5})
    model = fit_fusion(ctx, model, kind="crisscross")
    pairs = ctx.dev_pairs
    scored = score_ids(spark, ctx, model, pairs.select("h", "r", "t", "flag"))
    pdf = scored.select("flag", "conf").toPandas()
    assert ((pdf["conf"] >= 0) & (pdf["conf"] <= 1)).all()
    pos = pdf[pdf.flag == 1]["conf"].mean()
    neg = pdf[pdf.flag == -1]["conf"].mean()
    assert pos > neg, (pos, neg)


def test_add_confidence_gather_parity(spark):
    """Billion-vocab gather route == broadcast route, per (h, r, t).

    Same fitted model, same query frame; the gather route receives the
    embeddings as (id, vec) tables (fit_embeddings_table's output form)
    and must reproduce the broadcast route's confidences — the only
    difference allowed is which executors hold which embedding rows."""
    from tests.test_kg import TINY_TRIPLES
    from ttmf_spark.kg.pipeline import build_context, fit_fusion, score_ids

    tiny = spark.createDataFrame(TINY_TRIPLES, ["s", "p", "o"])
    ctx, model = build_context(spark, tiny, transe_kw={"epochs": 5})
    model = fit_fusion(ctx, model, kind="crisscross")
    q = ctx.dev_pairs.select("h", "r", "t", "flag")
    key = ["h", "r", "t", "flag"]
    base = (
        score_ids(spark, ctx, model, q)
        .select(*key, "conf")
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    ent_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(model.p_ent)],
        "id long, vec array<double>",
    )
    rel_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(model.p_rel)],
        "id long, vec array<double>",
    )
    got = (
        score_ids(spark, ctx, model, q, emb_tables=(ent_df, rel_df))
        .select(*key, "conf")
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(base) == len(got) > 0
    for c in key:
        np.testing.assert_array_equal(base[c].to_numpy(), got[c].to_numpy())
    np.testing.assert_allclose(
        base["conf"].to_numpy(), got["conf"].to_numpy(), rtol=1e-10, atol=1e-12
    )


def test_fit_max_steps_budget_and_determinism():
    """max_steps bounds total minibatch updates (the bench tier's
    wall-time knob): a 3-step budget returns a valid, deterministic
    params dict and differs from the unbudgeted fit (i.e. the cap
    actually cut training short)."""
    batch, y, params, emb = _tiny_setup(B=40)
    a = cc.fit_crisscross(batch, y, emb[0], emb[1], mb=8, epochs=5,
                          max_steps=3, seed=3)
    b = cc.fit_crisscross(batch, y, emb[0], emb[1], mb=8, epochs=5,
                          max_steps=3, seed=3)
    full = cc.fit_crisscross(batch, y, emb[0], emb[1], mb=8, epochs=5, seed=3)
    for k in cc._trained_keys(a):
        assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k
        assert np.isfinite(np.asarray(a[k])).all(), k
    assert any(
        not np.array_equal(np.asarray(a[k]), np.asarray(full[k]))
        for k in cc._trained_keys(a)
    )


def _feats_df(spark, seed=11, n=240, n_ent=30, n_rel=7, L=cc.MAX_EDGES):
    """Synthetic CC_INPUT_COLS + flag frame with a learnable signal
    (positive rows get shifted transe/rr features)."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    flag = rng.integers(0, 2, n)
    pdf = pd.DataFrame(
        {
            "h": rng.integers(0, n_ent, n),
            "t": rng.integers(0, n_ent, n),
            "r": rng.integers(0, n_rel, n),
            "trans_conf": rng.normal(0, 0.3, n) + 0.8 * flag,
            "rr_features": list(
                (rng.normal(0, 0.3, (n, 6)) + 0.5 * flag[:, None])
            ),
            "flag": flag * 2 - 1,  # {-1, 1} like tc pairs
        }
    )
    for k in (1, 2, 3):
        for nm in ("h", "t", "r"):
            n_vocab = n_rel if nm == "r" else n_ent
            toks = rng.integers(0, n_vocab, (n, L))
            cut = rng.integers(0, L + 1, n)
            for i, ci in enumerate(cut):
                toks[i, ci:] = 0
            pdf[f"path{k}_{nm}"] = list(toks)
    emb_E = rng.normal(0, 0.4, (n_ent, 8)).astype(np.float64)
    emb_R = rng.normal(0, 0.4, (n_rel, 8)).astype(np.float64)
    return spark.createDataFrame(pdf[cc.CC_INPUT_COLS + ["flag"]]), emb_E, emb_R


def test_fit_distributed_partition_invariant_and_learns(spark):
    """fit_crisscross_distributed is bit-deterministic under ANY input
    partitioning (content-hash shards + in-shard content sort + ordered
    delta fold) and drives the full-set eval loss below the init params'
    loss — the labeled frame never lands on the driver."""
    feats, E, R = _feats_df(spark)
    # val_cap=12 forces the content-hash holdout-thinning branch (the
    # ~10% holdout of 240 rows is > 12): determinism must survive it
    kw = dict(lr=1e-2, mb=32, epochs=4, n_shards=5, dropout=False,
              val_cap=12)
    p1 = cc.fit_crisscross_distributed(feats.repartition(2), E, R, **kw)
    p2 = cc.fit_crisscross_distributed(feats.repartition(13), E, R, **kw)
    for k in cc._delta_keys(p1):
        assert np.array_equal(np.asarray(p1[k]), np.asarray(p2[k])), k

    pdf = feats.toPandas().sort_values(["h", "t", "r", "flag"]).reset_index(drop=True)
    batch = cc.batch_from_pandas(pdf)
    y = (pdf["flag"].to_numpy() == 1).astype(np.float64)

    def ce(params):
        pv, _ = cc.forward(batch, params, (E, R), train=False)
        p1_ = pv[np.arange(len(y)), y.astype(np.int64)]
        return float(-np.mean(np.log(p1_ + 1e-12)))

    init = cc.init_params(E.shape[1], R.shape[1], seed=42)
    assert ce(p1) < ce(init)


def test_fit_distributed_gather_route_parity(spark):
    """emb_tables gather route == broadcast route, bit-for-bit.

    Same seed/shards/budget; the only difference is how the frozen
    embeddings reach the shard tasks (one-time broadcast vs per-shard
    plan->gather->cogroup slices). The monotonic local remap after the
    content sort must leave the Adam trajectory — and the holdout
    early-stop decisions — unchanged."""
    feats, E, R = _feats_df(spark)
    kw = dict(lr=1e-2, mb=32, epochs=4, n_shards=5, dropout=False,
              val_cap=12)
    base = cc.fit_crisscross_distributed(feats, E, R, **kw)
    ent_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(E)],
        "id long, vec array<double>",
    )
    rel_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(R)],
        "id long, vec array<double>",
    )
    got = cc.fit_crisscross_distributed(
        feats, None, None, emb_tables=(ent_df, rel_df), **kw
    )
    for k in cc._delta_keys(base):
        assert np.array_equal(np.asarray(base[k]), np.asarray(got[k])), k


def test_score_triples_crisscross_distributed_end_to_end(spark):
    """kind='crisscross' with driver_max_rows=0 SIZE-ROUTES the M6 fit to
    fit_crisscross_distributed (any labeled set is 'too big'), training
    without collecting the labeled set and emitting finite confidences —
    covers both the size router and the distributed route."""
    from tests.test_kg import TINY_TRIPLES
    from ttmf_spark.kg.pipeline import score_triples

    tiny = spark.createDataFrame(TINY_TRIPLES, ["s", "p", "o"])
    scored, model = score_triples(
        spark, tiny, kind="crisscross",
        transe_kw={"epochs": 2},
        fusion_kw={"driver_max_rows": 0, "epochs": 2, "max_steps": 6,
                   "n_shards": 3},
    )
    rows = scored.collect()
    assert len(rows) == len(TINY_TRIPLES)
    for r in rows:
        assert 0.0 <= r["conf"] <= 1.0
