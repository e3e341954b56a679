"""TransE embeddings: seeded numpy trainer (M4) + distributed energy scoring
(M1/M2) via Arrow-batched pandas UDFs.

Reference: `KGE/src/approaches/TransE.java` (margin-based SGD: dim=100,
margin=1.0, lr=0.001, L2, 50 epochs, per-epoch entity renormalization,
head-or-tail corruption — KGE_config_template.properties:6-13,
TransE.java:245-356) and `TransConfidence.py:35-43` (true-L2 energy
``E = ||e_h + r_r - e_t||_2``, the canonical scoring semantics; the Java
side's un-rooted L2 — TransE.java:567-574 — is a train-time-only detail).

Exact value parity with the Java trainer is impossible (unseeded
`java.util.Random` + `Collections.shuffle`); per FIXTURES.md §7 the fixture
embeddings are produced ONCE by this seeded trainer and shared by our
pipeline and the reference-semantics oracles, so downstream feature parity
tests are exact.

Scale notes: the model is dim-bounded (|V| x 100 floats; 1e5 entities =
40 MB) and driver-resident, but TRAINING is distributed
(``fit_embeddings_distributed``): triples never collect to the driver —
each epoch broadcasts the model, trains every hash-shard independently
in one mapInPandas pass, and parameter-averages the shard deltas.
SCORING is likewise distributed: the matrices ship to executors as a
Spark broadcast and each Arrow batch computes energies with one fused
numpy expression — no per-row Python, no shuffle, no join.
``train_transe`` stays as the single-node numpy kernel (fixtures +
per-shard inner step shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

DIM = 100  # KGE_config_template.properties:6
MARGIN = 1.0
LR = 0.001
EPOCHS = 50


def _transe_sgd_epoch(
    ent: np.ndarray,
    rel: np.ndarray,
    triples: np.ndarray,
    rng: np.random.Generator,
    n_ent: int,
    lr: float = LR,
    margin: float = MARGIN,
    batch: int = 4096,
) -> None:
    """One margin-hinge SGD epoch over ``triples``, mutating ent/rel in
    place (the shared inner kernel of the driver trainer and the
    per-shard distributed step — identical rng call sequence in both)."""
    n = len(triples)
    order = rng.permutation(n)
    for s in range(0, n, batch):
        idx = order[s : s + batch]
        h, r, t = triples[idx, 0], triples[idx, 1], triples[idx, 2]
        corrupt_head = rng.random(len(idx)) < 0.5
        neg_e = rng.integers(0, n_ent, len(idx))
        nh = np.where(corrupt_head, neg_e, h)
        nt = np.where(corrupt_head, t, neg_e)
        d_pos = ent[h] + rel[r] - ent[t]
        d_neg = ent[nh] + rel[r] - ent[nt]
        s_pos = (d_pos**2).sum(axis=1)
        s_neg = (d_neg**2).sum(axis=1)
        viol = margin + s_pos - s_neg > 0
        if not viol.any():
            continue
        g_pos = 2.0 * lr * d_pos[viol]
        g_neg = 2.0 * lr * d_neg[viol]
        np.add.at(ent, h[viol], -g_pos)
        np.add.at(ent, t[viol], g_pos)
        np.add.at(rel, r[viol], -g_pos + g_neg)
        np.add.at(ent, nh[viol], g_neg)
        np.add.at(ent, nt[viol], -g_neg)


def _ptranse_sgd_epoch(
    ent: np.ndarray,
    rel: np.ndarray,
    triples: np.ndarray,
    rng: np.random.Generator,
    n_ent: int,
    n_rel: int,
    lr: float = LR,
    n_neg: int = 15,
    bias: float = 7.0,
    batch: int = 2048,
) -> None:
    """One PTransE logistic epoch (sigma(bias - 0.5E), 15 neg/side +
    relation corruption), mutating ent/rel in place."""

    def sig(x):
        return 1.0 / (1.0 + np.exp(-np.clip(x, -60, 60)))

    n = len(triples)
    order = rng.permutation(n)
    for s in range(0, n, batch):
        idx = order[s : s + batch]
        h, r, t = triples[idx, 0], triples[idx, 1], triples[idx, 2]
        # reference loop shape (PTransE.java:325-380): per positive,
        # NEG_SAMPLE_COUNT head-corrupt AND NEG_SAMPLE_COUNT tail-corrupt
        # negatives (both inside the same k loop), plus ONE relation
        # corruption — 2*n_neg + 1 negatives, not n_neg coin-flipped sides
        for kind in ("pos", "head_neg", "tail_neg", "rel_neg"):
            if kind == "pos":
                hh, rr, tt, sign = h, r, t, 1.0
                reps = 1
            else:
                reps = n_neg if kind in ("head_neg", "tail_neg") else 1
            for _rep in range(reps):
                if kind == "head_neg":
                    hh = rng.integers(0, n_ent, len(idx))
                    tt, rr, sign = t, r, -1.0
                elif kind == "tail_neg":
                    hh = h
                    tt = rng.integers(0, n_ent, len(idx))
                    rr, sign = r, -1.0
                elif kind == "rel_neg":
                    hh, tt = h, t
                    rr = rng.integers(0, n_rel, len(idx))
                    sign = -1.0
                d = ent[hh] + rel[rr] - ent[tt]
                E = (d**2).sum(axis=1)
                p = sig(bias - 0.5 * E)
                # dL/dE for label y in {1 pos, 0 neg}: (p - y) * (-0.5)
                coef = (p - (1.0 if sign > 0 else 0.0)) * (-0.5)
                g = (2.0 * lr) * coef[:, None] * d
                np.add.at(ent, hh, -g)
                np.add.at(ent, tt, g)
                np.add.at(rel, rr, -g)


def _ptranse_path_epoch(
    rel: np.ndarray,
    paths: np.ndarray,
    weights: np.ndarray,
    rng: np.random.Generator,
    n_rel: int,
    lr: float = LR,
    bias: float = 7.0,
    batch: int = 2048,
) -> None:
    """One PCRA-weighted relation-path epoch (Lin et al. 2015, "Modeling
    Relation Paths for Representation Learning"), mutating ``rel`` in
    place — the path-composition term the reference ships commented out
    (KGE/src/approaches/PTransE.java:373-394) restored per the paper.

    ``paths``: (n, 3) int (r1, r2, r) — a 2-hop relation path p=(r1,r2)
    co-occurring with direct relation r; ``weights``: (n,) float — the
    summed per-instance PCRA reliabilities R(p|h,t)/Z(h,t) over every
    (h,t) edge the path supports (graph.pcra_path_triples). Summing the
    per-instance weights into one relation-level row is gradient-exact
    for the epoch because the path energy E(p,r) = ||r1 + r2 - r||^2
    (ADD composition) depends on relations only, and the loss is linear
    in the weight.

    Objective per row: logistic sigma(bias - 0.5*E), weight-scaled,
    positive on the observed r plus one corrupted-relation negative —
    the same loss shape (and hence the same gradient/update algebra) as
    ``_ptranse_sgd_epoch``, with (rel[r1]+rel[r2]) standing in for the
    entity translation.
    """

    def sig(x):
        return 1.0 / (1.0 + np.exp(-np.clip(x, -60, 60)))

    n = len(paths)
    if n == 0:
        return
    order = rng.permutation(n)
    for s in range(0, n, batch):
        idx = order[s : s + batch]
        r1, r2, r = paths[idx, 0], paths[idx, 1], paths[idx, 2]
        w = weights[idx]
        neg_r = rng.integers(0, n_rel, len(idx))
        for rr, y in ((r, 1.0), (neg_r, 0.0)):
            d = rel[r1] + rel[r2] - rel[rr]
            E = (d**2).sum(axis=1)
            p = sig(bias - 0.5 * E)
            coef = w * (p - y) * (-0.5)
            g = (2.0 * lr) * coef[:, None].astype(rel.dtype) * d
            np.add.at(rel, r1, -g)
            np.add.at(rel, r2, -g)
            np.add.at(rel, rr, g)


def train_transe(
    triples: np.ndarray,
    n_ent: int,
    n_rel: int,
    dim: int = DIM,
    epochs: int = EPOCHS,
    lr: float = LR,
    margin: float = MARGIN,
    seed: int = 42,
    batch: int = 4096,
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded vectorized TransE SGD. ``triples`` is (n, 3) int array (h, r, t).

    Returns (entity_matrix [n_ent, dim], relation_matrix [n_rel, dim]).
    Uniform Xavier-style init + L2 entity renorm per epoch mirror
    TransE.java:188-243; the SGD step uses the margin hinge with L2
    distance gradient, minibatched instead of per-example.
    """
    rng = np.random.default_rng(seed)
    bound = 6.0 / np.sqrt(dim)
    # train in float32: the SGD is bandwidth-bound (gathers + np.add.at
    # scatters dominate), halving bytes is ~1.5x wall on the bench box and
    # the returned matrices are float32 anyway; the rng draw sequence is
    # unchanged (cast AFTER each float64 draw), so seeds stay comparable
    ent = rng.uniform(-bound, bound, (n_ent, dim)).astype(np.float32)
    rel = rng.uniform(-bound, bound, (n_rel, dim)).astype(np.float32)
    rel /= np.maximum(np.linalg.norm(rel, axis=1, keepdims=True), 1e-12).astype(
        np.float32
    )
    if len(triples) == 0:
        return ent, rel
    for _ in range(epochs):
        ent /= np.maximum(np.linalg.norm(ent, axis=1, keepdims=True), 1e-12).astype(
            np.float32
        )
        _transe_sgd_epoch(
            ent, rel, triples, rng, n_ent, lr=lr, margin=margin, batch=batch
        )
    return ent, rel


def train_ptranse(
    triples: np.ndarray,
    n_ent: int,
    n_rel: int,
    dim: int = DIM,
    epochs: int = EPOCHS,
    lr: float = LR,
    n_neg: int = 15,
    bias: float = 7.0,
    seed: int = 42,
    batch: int = 2048,
    paths: np.ndarray | None = None,
    path_weights: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """PTransE-style trainer (reference KGE/src/approaches/PTransE.java:
    logistic loss sigma(bias - 0.5 * E) with 15 negative samples per side
    plus relation corruption, accumulated gradients —
    KGE_config_template.properties:11-13, PTransE.java:20-21,279-460).
    Vectorized + seeded like train_transe; used for path-ranking
    embeddings (SearchPaths2 loads PTransE vectors, SearchPaths2.py:187).

    Parity note (verified round 2): despite the name, the reference
    PTransE trains NO relation-path composition term — the per-negative
    relation-corruption block inside the k-loop is commented out
    (PTransE.java:373-394) and the only "path" in the file is configPath;
    the live loss is exactly positive + NEG_SAMPLE_COUNT x (head-corrupt
    + tail-corrupt) + one relation corruption per example, which is what
    this trainer implements. Path evidence enters TTMF downstream via
    SearchPaths2 SD-scoring over these vectors (kg/paths.py), not via the
    embedding objective.

    Round-3 addition: pass ``paths`` ((n, 3) int (r1, r2, r)) +
    ``path_weights`` ((n,) float PCRA reliabilities,
    graph.pcra_path_triples) to restore the paper's path-composition
    term the reference ships commented out — each epoch then runs one
    ``_ptranse_path_epoch`` over the relation matrix after the triple
    epoch. With ``paths=None`` the rng call sequence (and hence the
    result) is bit-identical to the pre-path trainer.
    """
    rng = np.random.default_rng(seed)
    bound = 6.0 / np.sqrt(dim)
    # float32 for the same bandwidth reason as train_transe
    ent = rng.uniform(-bound, bound, (n_ent, dim)).astype(np.float32)
    rel = rng.uniform(-bound, bound, (n_rel, dim)).astype(np.float32)
    if len(triples) == 0:
        return ent, rel
    for _ in range(epochs):
        ent /= np.maximum(np.linalg.norm(ent, axis=1, keepdims=True), 1e-12).astype(
            np.float32
        )
        _ptranse_sgd_epoch(
            ent, rel, triples, rng, n_ent, n_rel,
            lr=lr, n_neg=n_neg, bias=bias, batch=batch,
        )
        if paths is not None and len(paths):
            _ptranse_path_epoch(
                rel, paths, path_weights, rng, n_rel,
                lr=lr, bias=bias, batch=batch,
            )
    return ent, rel


def dev_hinge_loss(
    pairs: DataFrame, energy_col: str = "energy", margin: float = MARGIN
) -> DataFrame:
    """A10 (TransE.java:357-380): mean hinge over aligned pos/neg pairs.

    ``pairs``: (..., flag, seq, energy) with seq pairing pos 2k / neg 2k+1
    (negatives.tc_pairs layout). One self-join on the pair key.
    """
    # exact integer halving (shiftright), NOT `/ 2`: seq is a 60-bit+
    # hash-derived key, and long / int goes through double (53-bit
    # mantissa), which can collide distinct pair keys near 2^62
    pos = pairs.filter(F.col("flag") == 1).select(
        F.shiftright(F.col("seq"), 1).alias("k"), F.col(energy_col).alias("e_pos")
    )
    neg = pairs.filter(F.col("flag") == -1).select(
        F.shiftright(F.col("seq") - 1, 1).alias("k"),
        F.col(energy_col).alias("e_neg"),
    )
    return pos.join(neg, "k").agg(
        F.avg(F.greatest(F.lit(margin) + F.col("e_pos") - F.col("e_neg"), F.lit(0.0))).alias(
            "dev_loss"
        )
    )


def _epoch_shard_trainer(
    b_params, dim, n_ent, n_rel, lr, margin, batch, seed, epoch,
    kernel="transe", n_neg=15, bias=7.0,
):
    """mapInPandas closure: per-shard one-epoch SGD emitting parameter deltas.

    Each shard trains on its own triples starting from the broadcast
    epoch-start parameters (the SAME per-epoch kernel as the driver
    trainers: ``_transe_sgd_epoch`` / ``_ptranse_sgd_epoch``) and emits
    (kind, id, delta) rows only for rows it touched — bounded by shard
    size, NOT by |V|. Seeded per (seed, epoch, shard) so the result is
    deterministic under any partition placement.
    """

    def _run(it):
        chunks = list(it)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        ent0, rel0 = b_params.value
        for sh, g in pdf.groupby("_sh", sort=True):
            tri = g[["h", "r", "t"]].to_numpy(dtype=np.int64)
            # canonical row order BEFORE the seeded permutation: row order
            # within a shard group depends on upstream partitioning (shuffle
            # reader interleaving), and the permutation below is positional —
            # without this sort the SGD visit order (and result) would vary
            # across repartitionings of the same input.
            tri = tri[np.lexsort((tri[:, 2], tri[:, 1], tri[:, 0]))]
            rng = np.random.default_rng((seed, epoch, int(sh)))
            ent = ent0.copy()
            rel = rel0.copy()
            if kernel == "ptranse":
                _ptranse_sgd_epoch(
                    ent, rel, tri, rng, n_ent, n_rel,
                    lr=lr, n_neg=n_neg, bias=bias, batch=batch,
                )
            else:
                _transe_sgd_epoch(
                    ent, rel, tri, rng, n_ent, lr=lr, margin=margin, batch=batch
                )
            de = ent - ent0
            ent_ids = np.nonzero(np.abs(de).sum(axis=1) > 0)[0]
            dr = rel - rel0
            rel_ids = np.nonzero(np.abs(dr).sum(axis=1) > 0)[0]
            out = pd.DataFrame(
                {
                    "sh": np.full(len(ent_ids) + len(rel_ids), int(sh), dtype=np.int64),
                    "kind": np.concatenate(
                        [np.zeros(len(ent_ids), dtype=np.int32),
                         np.ones(len(rel_ids), dtype=np.int32)]
                    ),
                    "id": np.concatenate([ent_ids, rel_ids]).astype(np.int64),
                    "delta": list(de[ent_ids]) + list(dr[rel_ids]),
                }
            )
            if len(out):
                yield out

    return _run


def _ordered_delta_sum(deltas: DataFrame, dim: int) -> DataFrame:
    """Fold per-shard (sh, kind, id, delta) rows into one delta per
    (kind, id), summed in SHARD order (sort_array on the sh key): float
    addition is not associative, so an unordered collect_list fold would
    drift ~1e-16/step across partitionings — amplified over epochs into
    visible divergence."""
    zero = F.array(*[F.lit(0.0)] * dim)
    return deltas.groupBy("kind", "id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sh", "delta"))),
                lambda x: x["delta"],
            ),
            zero,
            lambda acc, v: F.zip_with(acc, v, lambda a, b_: a + b_),
        ).alias("delta")
    )


def _shard_triples(id_triples: DataFrame, n_shards: int, seed: int) -> DataFrame:
    """Hash-shard triples ONCE, deterministically in the triple content."""
    return (
        id_triples.select("h", "r", "t")
        .withColumn(
            "_sh", F.pmod(F.xxhash64("h", "r", "t", F.lit(seed)), F.lit(n_shards))
        )
        .repartition(n_shards, "_sh")
        .localCheckpoint(eager=True)  # reused every epoch
    )


def _default_shards(spark, n_total: int) -> int:
    # size shards by data: each delta row costs dim floats across the
    # shuffle, and every shard emits a row per touched id — 64 shards
    # on a 75k-triple input would move 16x the deltas of 4 shards for
    # zero extra parallelism benefit. ~100k triples per shard, capped
    # by the session's shuffle parallelism.
    cap = max(8, int(spark.conf.get("spark.sql.shuffle.partitions")))
    return int(max(1, min(cap, -(-n_total // 100_000))))


def fit_embeddings_distributed(
    id_triples: DataFrame,
    n_ent: int,
    n_rel: int,
    dim: int = DIM,
    epochs: int = EPOCHS,
    lr: float = LR,
    margin: float = MARGIN,
    seed: int = 42,
    batch: int = 4096,
    n_shards: int | None = None,
    kernel: str = "transe",
    n_neg: int = 15,
    bias: float = 7.0,
    paths: np.ndarray | None = None,
    path_weights: np.ndarray | None = None,
    init: tuple[np.ndarray, np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Distributed TransE/PTransE: per-shard SGD + parameter averaging per epoch.

    With ``kernel='ptranse'`` and ``paths``/``path_weights`` set, each
    epoch additionally runs the PCRA path-composition step
    (``_ptranse_path_epoch``) on the driver after the shard-delta fold:
    the path table is RELATION-vocab bounded (distinct (r1, r2, r)
    combinations — thousands, not billions, even at 100 TB corpora whose
    relation vocabulary is schema-sized), so driver-side is the scalable
    placement; only the entity side ever needs sharding.

    The round-2 replacement for the full-dataset ``toPandas`` (VERDICT
    "What's wrong" #5): triples are hash-sharded ONCE (deterministic in
    the triple content), and each epoch broadcasts the current model,
    trains every shard independently in a mapInPandas pass (vectorized
    numpy, same inner step as ``train_transe``), and averages the shard
    deltas — avg_s(init + delta_s) = init + sum(delta_s)/S. Delta traffic
    is bounded by touched rows (<= 5x shard triples), never |V| x S; the
    aggregated pull is <= model-sized. The model itself stays dim-bounded
    and driver-resident (SURVEY.md M4 scope; an embedding-TABLE variant
    for |V| beyond driver memory is ``add_transe_energy_join``).

    Reference: KGE/src/approaches/TransE.java:245-356 trains single-node;
    this is the multi-executor re-expression, seeded and deterministic
    under any partitioning.
    """
    spark = id_triples.sparkSession
    if n_shards is None:
        n_shards = _default_shards(spark, id_triples.count())
    sharded = _shard_triples(id_triples, n_shards, seed)
    if init is not None:  # test hook: shared start point for parity checks
        ent, rel = init[0].astype(np.float64).copy(), init[1].astype(np.float64).copy()
    else:
        rng = np.random.default_rng(seed)
        bound = 6.0 / np.sqrt(dim)
        ent = rng.uniform(-bound, bound, (n_ent, dim))
        rel = rng.uniform(-bound, bound, (n_rel, dim))
        if kernel != "ptranse":  # TransE init normalizes relations; PTransE not
            rel /= np.maximum(np.linalg.norm(rel, axis=1, keepdims=True), 1e-12)
    if sharded.isEmpty():
        return ent.astype(np.float32), rel.astype(np.float32)
    sc = spark.sparkContext
    for ep in range(epochs):
        ent /= np.maximum(np.linalg.norm(ent, axis=1, keepdims=True), 1e-12)
        b = sc.broadcast((ent, rel))
        deltas = sharded.mapInPandas(
            _epoch_shard_trainer(
                b, dim, n_ent, n_rel, lr, margin, batch, seed, ep,
                kernel=kernel, n_neg=n_neg, bias=bias,
            ),
            schema="sh long, kind int, id long, delta array<double>",
        )
        summed = _ordered_delta_sum(deltas, dim)
        pdf = summed.toPandas()  # <= (touched ids) rows — model-bounded
        b.unpersist()
        if len(pdf) == 0:
            continue
        for kind, mat in ((0, ent), (1, rel)):
            part = pdf[pdf["kind"] == kind]
            if len(part):
                ids = part["id"].to_numpy(dtype=np.int64)
                ds = np.stack(part["delta"].to_numpy()) / float(n_shards)
                mat[ids] += ds
        if kernel == "ptranse" and paths is not None and len(paths):
            # deterministic per-epoch stream, disjoint from every shard's
            # (seed, epoch, shard<n_shards) tuple
            path_rng = np.random.default_rng((seed, ep, 10**9 + 7))
            _ptranse_path_epoch(
                rel, paths, path_weights, path_rng, n_rel,
                lr=lr, bias=bias, batch=batch,
            )
    return ent.astype(np.float32), rel.astype(np.float32)


def _epoch_negative_draws(
    kernel: str,
    n: int,
    rng: np.random.Generator,
    n_ent: int,
    n_rel: int,
    batch: int,
    n_neg: int,
) -> np.ndarray:
    """Replay one epoch's rng call sequence and return every ENTITY id
    drawn as a negative. Both kernels' rng consumption is value-
    independent — permutation(n), then fixed-size draws per batch — so
    the exact set of entity rows an epoch will touch is knowable from
    (seed, epoch, shard) and the shard's triple count alone, BEFORE any
    embedding is read. This is what makes the gather-join ("parameter
    pull") of the table-sharded trainer exact rather than approximate.

    MUST mirror _transe_sgd_epoch / _ptranse_sgd_epoch call-for-call;
    the bit-parity pytest vs fit_embeddings_distributed pins the two.
    """
    rng.permutation(n)  # consumed identically by the kernel
    out = []
    for s in range(0, n, batch):
        m = min(batch, n - s)
        if kernel == "ptranse":
            for _ in range(2 * n_neg):  # head_neg reps, then tail_neg reps
                out.append(rng.integers(0, n_ent, m))
            rng.integers(0, n_rel, m)  # rel_neg — rel matrix is global
        else:
            rng.random(m)  # corrupt_head coin flips
            out.append(rng.integers(0, n_ent, m))
    return np.concatenate(out) if out else np.empty(0, dtype=np.int64)


class _RemapRng:
    """Generator shim for the table-sharded trainer: delegates every rng
    call, but remaps entity-range integer draws (hi == n_ent) into LOCAL
    row indices of the shard's gathered embedding block via searchsorted
    over the sorted gathered ids. Because the plan pass replayed the
    identical draw sequence, every drawn id is guaranteed gathered. The
    underlying rng stream — and hence the arithmetic — is bit-identical
    to the broadcast trainer's."""

    def __init__(self, rng: np.random.Generator, sorted_ids: np.ndarray, n_ent: int):
        self._rng, self._ids, self._n_ent = rng, sorted_ids, n_ent

    def permutation(self, n):
        return self._rng.permutation(n)

    def random(self, size=None):
        return self._rng.random(size)

    def integers(self, lo, hi, size=None):
        raw = self._rng.integers(lo, hi, size)
        if hi == self._n_ent:
            return np.searchsorted(self._ids, raw)
        return raw


def _canon_tri(pdf: pd.DataFrame) -> np.ndarray:
    tri = pdf[["h", "r", "t"]].to_numpy(dtype=np.int64)
    if len(tri):
        tri = tri[np.lexsort((tri[:, 2], tri[:, 1], tri[:, 0]))]
    return tri


def _epoch_planner(dim, n_ent, n_rel, batch, seed, epoch, kernel, n_neg):
    """mapInPandas closure: per shard, emit the (sh, id) entity rows the
    training pass will need — {h, t} plus the replayed negative draws.
    Integer-only work; no vectors move."""

    def _run(it):
        chunks = list(it)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        for sh, g in pdf.groupby("_sh", sort=True):
            tri = _canon_tri(g)
            rng = np.random.default_rng((seed, epoch, int(sh)))
            draws = _epoch_negative_draws(
                kernel, len(tri), rng, n_ent, n_rel, batch, n_neg
            )
            ids = np.unique(np.concatenate([tri[:, 0], tri[:, 2], draws]))
            yield pd.DataFrame({"sh": np.full(len(ids), int(sh), dtype=np.int64),
                                "id": ids.astype(np.int64)})

    return _run


def _epoch_table_trainer(
    b_rel, dim, n_ent, n_rel, lr, margin, batch, seed, epoch,
    kernel="transe", n_neg=15, bias=7.0,
):
    """Cogrouped applyInPandas closure: (shard triples, shard gathered
    entity rows) -> parameter deltas. Runs the SAME per-epoch kernel as
    the broadcast trainer on a compact local entity block (global ids
    remapped positionally), so per-id arithmetic — and the emitted
    deltas — are bit-identical. Only the relation matrix (schema-sized
    even at 10^12 docs) ships as a broadcast."""

    def _run(key, tri_pdf, vec_pdf):
        if len(tri_pdf) == 0 or len(vec_pdf) == 0:
            return pd.DataFrame(
                {
                    "sh": np.empty(0, dtype=np.int64),
                    "kind": np.empty(0, dtype=np.int32),
                    "id": np.empty(0, dtype=np.int64),
                    "delta": pd.Series([], dtype=object),
                }
            )
        sh = int(key[0])
        tri = _canon_tri(tri_pdf)
        vp = vec_pdf.sort_values("id")
        ids = vp["id"].to_numpy(dtype=np.int64)
        ent0 = np.stack(vp["vec"].to_numpy()).astype(np.float64)
        rel0 = b_rel.value
        ent = ent0.copy()
        rel = rel0.copy()
        ltri = tri.copy()
        ltri[:, 0] = np.searchsorted(ids, tri[:, 0])
        ltri[:, 2] = np.searchsorted(ids, tri[:, 2])
        rng = _RemapRng(np.random.default_rng((seed, epoch, sh)), ids, n_ent)
        if kernel == "ptranse":
            _ptranse_sgd_epoch(
                ent, rel, ltri, rng, n_ent, n_rel,
                lr=lr, n_neg=n_neg, bias=bias, batch=batch,
            )
        else:
            _transe_sgd_epoch(
                ent, rel, ltri, rng, n_ent, lr=lr, margin=margin, batch=batch
            )
        de = ent - ent0
        loc = np.nonzero(np.abs(de).sum(axis=1) > 0)[0]
        dr = rel - rel0
        rel_ids = np.nonzero(np.abs(dr).sum(axis=1) > 0)[0]
        return pd.DataFrame(
            {
                "sh": np.full(len(loc) + len(rel_ids), sh, dtype=np.int64),
                "kind": np.concatenate(
                    [np.zeros(len(loc), dtype=np.int32),
                     np.ones(len(rel_ids), dtype=np.int32)]
                ),
                "id": np.concatenate([ids[loc], rel_ids]).astype(np.int64),
                # explicit object dtype: a zero-delta epoch would otherwise
                # infer an empty float64 column, which Arrow cannot convert
                # to list<double>
                "delta": pd.Series(list(de[loc]) + list(dr[rel_ids]), dtype=object),
            }
        )

    return _run


def _normalize_ent_rows(it):
    """mapInPandas: per-row L2 normalization of (id, vec) — the same
    numpy call the broadcast trainer applies to the full matrix, row-
    independent, so results are identical under any batching."""
    for pdf in it:
        if len(pdf) == 0:
            continue
        m = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        yield pd.DataFrame({"id": pdf["id"].to_numpy(dtype=np.int64), "vec": list(m)})


def init_embedding_table(
    spark, n_ent: int, dim: int = DIM, seed: int = 42
) -> DataFrame:
    """Distributed (id, vec array<double>) init — per-id counter-keyed
    rng, so no row ever depends on |V| or on any other row, and the
    matrix is NEVER materialized in one place."""
    bound = 6.0 / np.sqrt(dim)

    def _init(it):
        for pdf in it:
            vecs = [
                np.random.default_rng((seed, 0xE27, int(i))).uniform(
                    -bound, bound, dim
                )
                for i in pdf["id"]
            ]
            yield pd.DataFrame({"id": pdf["id"].to_numpy(dtype=np.int64), "vec": vecs})

    return spark.range(n_ent).mapInPandas(_init, schema="id long, vec array<double>")


def fit_embeddings_table(
    id_triples: DataFrame,
    n_ent: int,
    n_rel: int,
    dim: int = DIM,
    epochs: int = EPOCHS,
    lr: float = LR,
    margin: float = MARGIN,
    seed: int = 42,
    batch: int = 4096,
    n_shards: int | None = None,
    kernel: str = "transe",
    n_neg: int = 15,
    bias: float = 7.0,
    paths: np.ndarray | None = None,
    path_weights: np.ndarray | None = None,
    init: tuple[np.ndarray, np.ndarray] | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """Table-sharded TransE/PTransE: entity embeddings live as an
    (id, vec) DataFrame for the WHOLE training run — the entity matrix
    is never materialized on the driver, removing the |V| <= driver-
    memory cap of ``fit_embeddings_distributed`` (round-2 VERDICT
    "What's wrong" #2). Returns (ent_df(id, vec array<float>), rel).

    Per epoch (same parameter-averaging semantics as the broadcast
    trainer, bit-identical given the same init — pinned by pytest):

      1. normalize: mapInPandas row L2 (numpy, row-independent);
      2. plan:      replay each shard's rng draw sequence (value-
                    independent) -> the exact (sh, id) set the shard
                    will touch, integers only;
      3. gather:    plan JOIN ent_df on id — the "parameter pull",
                    bounded by (2 + draws/triple) x shard triples,
                    never |V| x S;
      4. train:     cogrouped applyInPandas (shard triples x gathered
                    rows): the SAME sgd kernel on a compact local block
                    (_RemapRng remaps entity draws to local indices);
      5. apply:     ordered shard-fold of deltas; entity rows merge
                    back by JOIN (vec + delta/S, one zip_with); the
                    schema-sized relation deltas fold on the driver
                    (relation vocab stays thousands at 10^12 docs, so
                    driver-resident IS the scalable placement — same
                    argument as the PCRA path table).

    The per-epoch state is localCheckpoint-ed (lineage truncation; on a
    real cluster swap for checkpoint.StageStore parquet rounds to make
    epochs resumable). ``kernel='ptranse'`` requires n_ent != n_rel —
    _RemapRng disambiguates entity vs relation draws by range, which is
    exact for every real vocabulary (entities >> relations); use the
    broadcast trainer for degenerate toy graphs.

    Scoring composes without any driver hop: feed the returned ent_df
    straight to ``add_transe_energy_join``.
    """
    if kernel == "ptranse" and n_ent == n_rel:
        raise ValueError(
            "fit_embeddings_table(kernel='ptranse') needs n_ent != n_rel "
            "(draw-range disambiguation); use fit_embeddings_distributed"
        )
    spark = id_triples.sparkSession
    if n_shards is None:
        n_shards = _default_shards(spark, id_triples.count())
    sharded = _shard_triples(id_triples, n_shards, seed)
    if init is not None:  # test hook: shared start point for parity checks
        ent_df = spark.createDataFrame(
            [(int(i), [float(x) for x in row]) for i, row in enumerate(init[0])],
            schema="id long, vec array<double>",
        ).localCheckpoint(eager=True)
        rel = init[1].astype(np.float64).copy()
    else:
        ent_df = init_embedding_table(spark, n_ent, dim, seed).localCheckpoint(
            eager=True
        )
        # rel stream key disjoint from every entity row's (seed, 0xE27, id)
        rel = np.random.default_rng((seed, 0xE28)).uniform(
            -6.0 / np.sqrt(dim), 6.0 / np.sqrt(dim), (n_rel, dim)
        )
        if kernel != "ptranse":
            rel /= np.maximum(np.linalg.norm(rel, axis=1, keepdims=True), 1e-12)
    to_f32 = F.transform(F.col("vec"), lambda x: x.cast("float")).alias("vec")
    if sharded.isEmpty():
        return ent_df.select("id", to_f32), rel.astype(np.float32)
    sc = spark.sparkContext
    for ep in range(epochs):
        ent_df = ent_df.mapInPandas(
            _normalize_ent_rows, schema="id long, vec array<double>"
        ).localCheckpoint(eager=True)
        b_rel = sc.broadcast(rel)
        plan = sharded.mapInPandas(
            _epoch_planner(dim, n_ent, n_rel, batch, seed, ep, kernel, n_neg),
            schema="sh long, id long",
        )
        gathered = plan.join(ent_df, "id").select("sh", "id", "vec")
        deltas = (
            sharded.groupBy("_sh")
            .cogroup(gathered.groupBy("sh"))
            .applyInPandas(
                _epoch_table_trainer(
                    b_rel, dim, n_ent, n_rel, lr, margin, batch, seed, ep,
                    kernel=kernel, n_neg=n_neg, bias=bias,
                ),
                schema="sh long, kind int, id long, delta array<double>",
            )
        )
        summed = _ordered_delta_sum(deltas, dim).localCheckpoint(eager=True)
        rel_pdf = summed.filter(F.col("kind") == 1).toPandas()  # n_rel-bounded
        b_rel.unpersist()
        if len(rel_pdf):
            rids = rel_pdf["id"].to_numpy(dtype=np.int64)
            rel[rids] += np.stack(rel_pdf["delta"].to_numpy()) / float(n_shards)
        ent_delta = summed.filter(F.col("kind") == 0).select("id", "delta")
        s_inv = F.lit(float(n_shards))
        ent_df = (
            ent_df.join(ent_delta, "id", "left")
            .select(
                "id",
                F.when(F.col("delta").isNull(), F.col("vec"))
                .otherwise(
                    F.zip_with(
                        F.col("vec"), F.col("delta"), lambda a, d: a + d / s_inv
                    )
                )
                .alias("vec"),
            )
            .localCheckpoint(eager=True)
        )
        if kernel == "ptranse" and paths is not None and len(paths):
            path_rng = np.random.default_rng((seed, ep, 10**9 + 7))
            _ptranse_path_epoch(
                rel, paths, path_weights, path_rng, n_rel,
                lr=lr, bias=bias, batch=batch,
            )
    return ent_df.select("id", to_f32), rel.astype(np.float32)


DRIVER_FIT_MAX_TRIPLES = 5_000_000


def fit_embeddings_from_df(
    id_triples: DataFrame,
    n_ent: int,
    n_rel: int,
    seed: int = 42,
    driver_max_triples: int = DRIVER_FIT_MAX_TRIPLES,
    kernel: str = "transe",
    paths: np.ndarray | None = None,
    path_weights: np.ndarray | None = None,
    **kw,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit TransE/PTransE embeddings from an id-triple DataFrame, size-routed.

    ``paths``/``path_weights`` (kernel='ptranse' only): relation-level
    PCRA path triples (graph.pcra_path_triples, collected — the table is
    relation-vocab bounded) enabling the paper's path-composition term
    on both routes.

    ``kernel`` picks the objective: ``"transe"`` (margin hinge — the
    TransConfidence energy source) or ``"ptranse"`` (logistic, 15
    neg/side + relation corruption — the vectors SearchPaths2 ranks
    with, SearchPaths2.py:187 / Model1.py:162-164). Model-scale inputs
    (<= ``driver_max_triples``; the model itself is dim-bounded and
    driver-resident anyway) train on the driver with the seeded numpy
    kernel — paying per-epoch Spark-job overhead for a 40 MB dataset is
    pure waste. Larger inputs route to ``fit_embeddings_distributed``
    (per-shard SGD + parameter averaging; no full-dataset collect) with
    the same per-epoch kernel. Beyond that, when the VOCABULARY itself
    outgrows driver memory (|V| >= ~1e8 at dim=100), call
    ``fit_embeddings_table`` directly — same epoch semantics
    (bit-identical given the same init), entity matrix kept as an
    (id, vec) table end to end, composing with
    ``add_transe_energy_join`` for scoring; it returns a DataFrame, so
    it is a deliberate caller choice, not a size-route here. Same routing pattern as the CC union-find
    (extract/canonicalize.py). The driver path sorts triples canonically
    first, so both paths are deterministic under any input partitioning.
    """
    # validate kernel-specific options UP FRONT so a bad call fails the
    # same way on both routes — the distributed path's **kw would silently
    # swallow e.g. margin= with kernel='ptranse' while the driver path
    # raised TypeError, making success depend on dataset size
    allowed = {"dim", "epochs", "lr", "batch", "n_shards"} | (
        {"n_neg", "bias"} if kernel == "ptranse" else {"margin"}
    )
    bad = set(kw) - allowed
    if bad:
        raise TypeError(
            f"fit_embeddings_from_df(kernel={kernel!r}): unsupported "
            f"option(s) {sorted(bad)}; allowed: {sorted(allowed)}"
        )
    if paths is not None and kernel != "ptranse":
        raise TypeError("paths/path_weights require kernel='ptranse'")
    pkw = {"paths": paths, "path_weights": path_weights} if kernel == "ptranse" else {}
    n = id_triples.count()
    if n <= driver_max_triples:
        kw.pop("n_shards", None)
        pdf = id_triples.select("h", "r", "t").toPandas()
        tri = pdf.to_numpy(dtype=np.int64)
        if len(tri):
            tri = tri[np.lexsort((tri[:, 2], tri[:, 1], tri[:, 0]))]
        trainer = train_ptranse if kernel == "ptranse" else train_transe
        return trainer(tri, n_ent, n_rel, seed=seed, **pkw, **kw)
    return fit_embeddings_distributed(
        id_triples, n_ent, n_rel, seed=seed, kernel=kernel, **pkw, **kw
    )


def collect_path_triples(paths_df: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Collect a graph.pcra_path_triples table into kernel arrays.

    Returns ((n, 3) int64 (r1, r2, r), (n,) float64 weights), sorted
    canonically so the path epoch's positional permutation — and hence
    the trained model — is invariant to the table's partitioning. The
    collect is relation-vocab bounded (see fit_embeddings_distributed).
    """
    pdf = paths_df.select("r1", "r2", "r", "weight").toPandas()
    tri = pdf[["r1", "r2", "r"]].to_numpy(dtype=np.int64)
    w = pdf["weight"].to_numpy(dtype=np.float64)
    if len(tri):
        o = np.lexsort((tri[:, 2], tri[:, 1], tri[:, 0]))
        tri, w = tri[o], w[o]
    return tri, w


def embeddings_to_df(spark, mat: np.ndarray) -> DataFrame:
    """(id, vec array<float>) table — the S9 sink (TransE.java:773-789)."""
    pdf = pd.DataFrame(
        {"id": np.arange(len(mat), dtype=np.int64), "vec": list(mat.astype("float32"))}
    )
    return spark.createDataFrame(pdf)


def transe_energy_col(spark, ent: np.ndarray, rel: np.ndarray):
    """Column factory: (h, r, t) id cols -> double energy ||e_h + r_r - e_t||_2.

    True-L2 python semantics (TransConfidence.py:37-38). Matrices are a
    SparkContext broadcast; each Arrow batch is one fused numpy expression.
    """
    b_ent = spark.sparkContext.broadcast(ent.astype(np.float64))
    b_rel = spark.sparkContext.broadcast(rel.astype(np.float64))

    @pandas_udf("double")
    def _energy(h: pd.Series, r: pd.Series, t: pd.Series) -> pd.Series:
        E, R = b_ent.value, b_rel.value
        d = E[h.to_numpy()] + R[r.to_numpy()] - E[t.to_numpy()]
        return pd.Series(np.linalg.norm(d, axis=1))

    return _energy


def add_transe_energy(df: DataFrame, energy_udf, out_col: str = "energy") -> DataFrame:
    return df.withColumn(out_col, energy_udf(F.col("h"), F.col("r"), F.col("t")))


def add_transe_energy_join(
    triples: DataFrame,
    ent_df: DataFrame,
    rel_df: DataFrame,
    out_col: str = "energy",
    broadcast_tables: bool = False,
) -> DataFrame:
    """Energy via (id, vec) TABLE joins — the beyond-broadcast path.

    When |V| x dim no longer fits a broadcast (>= ~1e8 entities at
    dim=100), the driver-resident-matrix ``transe_energy_col`` UDF stops
    working; this variant joins the h/t/r id columns against embedding
    TABLES (``embeddings_to_df`` layout) and computes
    ``||e_h + r_r - e_t||_2`` with built-in array expressions
    (zip_with/aggregate — JVM-side, no Python). Three shuffle-hash joins
    on dense ids; hot entities (hubs) are handled by AQE skew-join since
    the embedding side is uniform. Same true-L2 semantics as
    ``transe_energy_col`` (TransConfidence.py:37-38), pinned by
    tests/test_kg.py::test_energy_join_matches_broadcast.
    """
    def _tbl(df, idc, vecc):
        t = df.select(F.col("id").alias(idc), F.col("vec").alias(vecc))
        return F.broadcast(t) if broadcast_tables else t

    joined = (
        triples.join(_tbl(ent_df, "_hid", "_hv"), triples["h"] == F.col("_hid"))
        .join(_tbl(ent_df, "_tid", "_tv"), triples["t"] == F.col("_tid"))
        .join(_tbl(rel_df, "_rid", "_rv"), triples["r"] == F.col("_rid"))
    )
    diff = F.zip_with(
        F.zip_with(F.col("_hv"), F.col("_rv"), lambda a, b: a + b),
        F.col("_tv"),
        lambda s, c: s - c,
    )
    energy = F.sqrt(
        F.aggregate(
            diff,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return joined.withColumn(out_col, energy).drop(
        "_hid", "_hv", "_tid", "_tv", "_rid", "_rv"
    )


def transe_confidence(
    scored: DataFrame, thresholds: DataFrame, energy_col: str = "energy"
) -> DataFrame:
    """conf = theta_r - energy (TransConfidence.py:78-81 raw-margin
    semantics — the sigmoid at :80 is dead code, overwritten at :81);
    theta defaults to 0.0 for unseen relations (TransConfidence.py:72-76).
    """
    th = thresholds.select(F.col("r"), F.col("threshold").alias("_theta"))
    return (
        scored.join(F.broadcast(th), "r", "left")
        .withColumn(
            "trans_conf",
            F.coalesce(F.col("_theta"), F.lit(0.0)) - F.col(energy_col),
        )
        .drop("_theta")
    )


def fit_embeddings_fixed(
    spark,
    id_triples: DataFrame,
    n_ent: int,
    n_rel: int,
    paths: DataFrame | None = None,
    dim: int = 4,
    epochs: int = 2,
    lr: float = 0.01,
    bias: float = 7.0,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic FULL-BATCH gradient-descent TransE/PTransE sweep,
    expressed entirely in DataFrame ops — the fixed-iteration twin of
    the SGD trainers, exactly as ``pagerank_routed(max_iter=k)`` has
    ``kg_pagerank_fixed``: no rng, no driver state, every draw a
    portable md5 hash, so the whole training recurrence is
    SQL-expressible and the driver's DuckDB oracle can replay it
    bit-for-~1e-13 (ROUND(.,6) hashes identically — the
    kg_pagerank_fixed portability contract).

    Embeddings live as (id, k, val) DataFrames (k < ``dim``); init is
    hash-uniform in [-0.5, 0.5). Per epoch, ONE aggregated update from
    all terms at once (full batch):

    - triple terms: per distinct (h, r, t), a positive plus one
      hash-drawn corrupted-tail negative, logistic loss
      sigma(bias - 0.5 * ||h + r - t||^2) — the same loss shape and
      gradient algebra as ``_ptranse_sgd_epoch``;
    - path terms (``paths``: (r1, r2, r, weight), e.g.
      ``graph.pcra_path_triples``): the PCRA-weighted relation-path
      composition term of ``_ptranse_path_epoch`` (Lin et al. 2015,
      restoring PTransE.java:373-394), positive on r plus one
      hash-corrupted relation negative, weight-scaled.

    Scale notes: this is ALSO the most scalable trainer shape — model
    state never leaves the cluster (no |V|-sized driver array, no
    broadcast), updates are joins + one groupBy per epoch. Under a
    different partitioning the per-key float64 sums reassociate, so
    values agree to ~1e-13 rather than bit-exactly (pytest-pinned);
    the gated output rounds to 6 decimals, far above that noise. The
    tradeoff is optimizer quality (full-batch GD needs more epochs
    than SGD), which is why the SGD trainers remain the production
    route; this one is the verifiable-numerics route and the driver
    gate for the PTransE path-composition wiring.
    """
    from ttmf_spark.kg.negatives import _portable_hash

    ks = spark.range(dim).select(F.col("id").cast("long").alias("k"))

    def _init(ids_df, tag: str) -> DataFrame:
        h = _portable_hash(["id", "k"], f"fx{tag}{seed}", "md5")
        return ids_df.crossJoin(ks).select(
            "id", "k", (F.pmod(h, F.lit(1_000_000)) / 1e6 - 0.5).alias("val")
        )

    ent = _init(spark.range(n_ent).select(F.col("id")), "e")
    rel = _init(spark.range(n_rel).select(F.col("id")), "r")

    trip = id_triples.select("h", "r", "t")
    neg_t = F.pmod(_portable_hash(["h", "r", "t"], f"fxnt{seed}", "md5"), F.lit(n_ent))
    terms = trip.select(
        "h", "r", F.col("t").alias("t0"), F.lit("p").alias("kind"),
        F.col("t").alias("tail"), F.lit(1.0).alias("y"),
    ).unionByName(
        trip.select(
            "h", "r", F.col("t").alias("t0"), F.lit("n").alias("kind"),
            neg_t.alias("tail"), F.lit(0.0).alias("y"),
        )
    ).localCheckpoint(eager=True)
    if paths is not None:
        neg_r = F.pmod(
            _portable_hash(["r1", "r2", "r"], f"fxnr{seed}", "md5"), F.lit(n_rel)
        )
        pterms = paths.select(
            "r1", "r2", F.col("r").alias("r0"), F.lit("p").alias("kind"),
            F.col("r").alias("rr"), F.lit(1.0).alias("y"),
            F.col("weight").alias("wgt"),
        ).unionByName(
            paths.select(
                "r1", "r2", F.col("r").alias("r0"), F.lit("n").alias("kind"),
                neg_r.alias("rr"), F.lit(0.0).alias("y"),
                F.col("weight").alias("wgt"),
            )
        ).localCheckpoint(eager=True)
    else:
        pterms = None

    def sig(x):
        return 1.0 / (1.0 + F.exp(-F.greatest(F.least(x, F.lit(60.0)), F.lit(-60.0))))

    for _ep in range(epochs):
        e_at = lambda alias_col, nm: ent.select(
            F.col("id").alias(alias_col), "k", F.col("val").alias(nm)
        )
        r_at = lambda alias_col, nm: rel.select(
            F.col("id").alias(alias_col), "k", F.col("val").alias(nm)
        )
        td = (
            terms.crossJoin(ks)
            .join(e_at("h", "_eh"), ["h", "k"])
            .join(r_at("r", "_rr"), ["r", "k"])
            .join(e_at("tail", "_et"), ["tail", "k"])
            .withColumn("d", F.col("_eh") + F.col("_rr") - F.col("_et"))
        )
        tkey = ["h", "r", "t0", "kind"]
        ts = td.groupBy(*tkey).agg(F.sum(F.col("d") * F.col("d")).alias("S"))
        tg = td.join(ts, tkey).withColumn(
            "g",
            F.lit(2.0 * lr)
            * (sig(F.lit(bias) - 0.5 * F.col("S")) - F.col("y"))
            * F.lit(-0.5)
            * F.col("d"),
        ).localCheckpoint(eager=True)
        ent_contrib = tg.select(F.col("h").alias("id"), "k", (-F.col("g")).alias("g")).unionByName(
            tg.select(F.col("tail").alias("id"), "k", F.col("g").alias("g"))
        )
        rel_contrib = tg.select(F.col("r").alias("id"), "k", (-F.col("g")).alias("g"))
        if pterms is not None:
            pd_ = (
                pterms.crossJoin(ks)
                .join(r_at("r1", "_a"), ["r1", "k"])
                .join(r_at("r2", "_b"), ["r2", "k"])
                .join(r_at("rr", "_c"), ["rr", "k"])
                .withColumn("d", F.col("_a") + F.col("_b") - F.col("_c"))
            )
            pkey = ["r1", "r2", "r0", "kind"]
            ps = pd_.groupBy(*pkey).agg(F.sum(F.col("d") * F.col("d")).alias("S"))
            pg = pd_.join(ps, pkey).withColumn(
                "g",
                F.lit(2.0 * lr)
                * F.col("wgt")
                * (sig(F.lit(bias) - 0.5 * F.col("S")) - F.col("y"))
                * F.lit(-0.5)
                * F.col("d"),
            ).localCheckpoint(eager=True)
            rel_contrib = rel_contrib.unionByName(
                pg.select(F.col("r1").alias("id"), "k", (-F.col("g")).alias("g"))
            ).unionByName(
                pg.select(F.col("r2").alias("id"), "k", (-F.col("g")).alias("g"))
            ).unionByName(
                pg.select(F.col("rr").alias("id"), "k", F.col("g").alias("g"))
            )
        eu = ent_contrib.groupBy("id", "k").agg(F.sum("g").alias("_g"))
        ru = rel_contrib.groupBy("id", "k").agg(F.sum("g").alias("_g"))
        ent = (
            ent.join(eu, ["id", "k"], "left")
            .select("id", "k", (F.col("val") - F.coalesce("_g", F.lit(0.0))).alias("val"))
            .localCheckpoint(eager=True)
        )
        rel = (
            rel.join(ru, ["id", "k"], "left")
            .select("id", "k", (F.col("val") - F.coalesce("_g", F.lit(0.0))).alias("val"))
            .localCheckpoint(eager=True)
        )
    return ent, rel


def add_energy_from_tables(
    pairs: DataFrame, ent_df: DataFrame, rel_df: DataFrame, dim: int
) -> DataFrame:
    """True-L2 TransE energy from (id, k, val) embedding TABLES (join
    form, no broadcast) — the scoring twin of ``fit_embeddings_fixed``:
    at billion-entity vocab the energy join is the only route that never
    materializes the model anywhere."""
    spark = pairs.sparkSession
    ks = spark.range(dim).select(F.col("id").cast("long").alias("k"))
    cols = pairs.columns
    d = (
        pairs.crossJoin(ks)
        .join(
            ent_df.select(F.col("id").alias("h"), "k", F.col("val").alias("_eh")),
            ["h", "k"],
        )
        .join(
            rel_df.select(F.col("id").alias("r"), "k", F.col("val").alias("_rr")),
            ["r", "k"],
        )
        .join(
            ent_df.select(F.col("id").alias("t"), "k", F.col("val").alias("_et")),
            ["t", "k"],
        )
        .withColumn("_d", F.col("_eh") + F.col("_rr") - F.col("_et"))
    )
    return d.groupBy(*cols).agg(
        F.sqrt(F.sum(F.col("_d") * F.col("_d"))).alias("energy")
    )
