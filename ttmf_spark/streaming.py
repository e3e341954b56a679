"""Incremental / streaming ingestion of interleaved documents.

The reference is pure batch (SURVEY.md §2.11); the north rule requires
batch with resumable checkpoints, which `checkpoint.StageStore` covers.
This module adds the *incremental arrival* path a production corpus has:
new document files land continuously, and triples must be extracted
exactly-once without reprocessing the corpus.

Design: Structured Streaming file source -> foreachBatch(extract + append).
Inside each micro-batch we run the SAME batch extraction pipeline (one
code path for batch and streaming — the Spark-first way), then drop
already-emitted triples with an anti-join against the sink before
appending. Spark's checkpointLocation gives exactly-once file-source
progress tracking; the anti-join makes the append idempotent even across
manual re-runs.

Scale: the sink is hash-bucketed on (s, p, o) into ``n_buckets``
partition directories, and the anti-join key includes the bucket — both
sides hash-partition identically, so each task probes only its own
1/n_buckets slice of sink history instead of the whole table (round-2
fix for the grows-with-history anti-join). Production swaps the
partitioned-parquet sink for an Iceberg table with a bucket(s,p,o)
partition transform and a MERGE.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ttmf_spark.extract import extract_triples

DOCS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def stream_docs(spark: SparkSession, input_dir: str, max_files: int = 16) -> DataFrame:
    """File-source stream of interleaved-doc parquet drops."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def incremental_extract(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    checkpoint_dir: str,
    gazetteer: DataFrame,
    same_as: DataFrame | None = None,
    trigger_once: bool = True,
    n_buckets: int = 64,
):
    """Start the incremental extraction query; returns the StreamingQuery.

    ``trigger_once`` processes the current backlog then stops (the
    batch-resume pattern); set False for continuous micro-batches.
    """
    gaz = gazetteer.localCheckpoint(eager=True)
    same = same_as.localCheckpoint(eager=True) if same_as is not None else None

    def _sink_exists() -> bool:
        # existence must be checked on the SINK's filesystem (s3/hdfs/
        # local alike) — a driver-local os.path probe is always False for
        # remote URIs and would silently disable dedup, duplicating every
        # replayed batch; a transient FS error still propagates
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(output_path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs.exists(jpath)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        triples = extract_triples(batch_df, gaz, same).withColumn(
            "bucket", F.pmod(F.xxhash64("s", "p", "o"), F.lit(n_buckets))
        )
        if _sink_exists():
            # explicit schema: an empty first commit (zero extracted
            # triples -> _SUCCESS only) must read back as an empty frame,
            # not crash parquet schema inference and wedge the query
            existing = (
                spark.read.schema("s string, p string, o string")
                .option("basePath", output_path)
                .parquet(output_path)
                .withColumn(
                    "bucket", F.pmod(F.xxhash64("s", "p", "o"), F.lit(n_buckets))
                )
                .select("bucket", "s", "p", "o")
            )
            fresh = triples.join(
                existing, ["bucket", "s", "p", "o"], "left_anti"
            )
        else:  # first batch: sink does not exist yet
            fresh = triples
        fresh.write.mode("append").partitionBy("bucket").parquet(output_path)

    writer = (
        stream_docs(spark, input_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


EVENTS_SCHEMA = (
    # ts is declared TIMESTAMP (not the parquet file's TIMESTAMP_NTZ):
# watermarks require an event-time TIMESTAMP, and reading the stored naive
# micros as UTC keeps epoch math identical to the batch twin's
# component-derived seconds, independent of the session timezone.
"event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts_stream(
    spark: SparkSession,
    input_dir: str,
    width_minutes: int = 60,
    watermark: str = "2 hours",
    query_name: str = "evt_windowed_stream",
):
    """Streaming twin of ``datapipe.events.windowed_counts``: file source
    -> watermark -> tumbling event-time window -> append-mode memory sink.

    Watermark semantics (the whole point of the twin): a window only
    EMITS once the watermark (max event time - ``watermark``) passes its
    end, so late events inside the allowance still land in their window
    and the trailing windows of a bounded input never finalize — callers
    compare against the batch operator restricted to emitted windows
    (tests/test_streaming.py does exactly that). State is per-(window,
    event_type) — bounded by the watermark horizon, the canonical
    streaming-agg scale shape.

    Uses the same DECIMAL value sums as the batch twin; window start is
    re-expressed as component-derived epoch seconds so rows are directly
    comparable with ``windowed_counts`` output.
    """
    from ttmf_spark.datapipe.events import DEC

    sdf = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    agg = (
        sdf.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", f"{width_minutes} minutes").alias("_w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.col("_w.start").cast("long").alias("window_start_s"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return q


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    query_name: str = "evt_sessions_stream",
    max_files_per_trigger: int = 1,
):
    """Streaming twin of ``datapipe.events.sessionize`` via
    applyInPandasWithState — the custom stateful operator pattern.

    Per-user GroupState buffers (sec, cents) events still inside the
    watermark horizon; each invocation re-splits the buffer into
    gap-sessions and EMITS every session provably closed — one whose
    ``end + gap < watermark``, so the watermark guarantee (no event older
    than the horizon will arrive) means nothing can extend or merge it.
    Later-closing sessions stay buffered, so emitted sessions carry the
    same consecutive ``session_seq`` numbering as the batch operator and
    agree with it EXACTLY (pinned by tests/test_streaming.py). Value
    sums ride as integer cents (order-free exact; emitted as the same
    double the batch DECIMAL path produces).

    Scale shape: state per user is bounded by the watermark horizon (not
    history); the shuffle is one hash partition by user_id — identical to
    the batch window partitioning.
    """
    import numpy as np

    gap_s = gap_minutes * 60
    sdf = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    ev = sdf.select(
        "user_id",
        "ts",
        F.col("ts").cast("long").alias("sec"),
        # cents via the SAME per-event DECIMAL(18,2) rounding as the batch
        # twin (events.sessionize) — round(value*100) in double disagrees
        # at half-cent inputs (8.165*100 = 816.499... -> 816 vs 8.17)
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    ).withWatermark("ts", watermark)

    out_type = (
        "user_id long, session_seq long, n_events long, "
        "start_s long, end_s long, total_value double"
    )
    state_type = "secs array<long>, cents array<long>, next_seq long"

    def _fn(key, pdfs, state):
        user = int(key[0])
        if state.exists:
            st_secs, st_cents, next_seq = state.get
            secs_l = list(st_secs)
            cents_l = list(st_cents)
            next_seq = int(next_seq)
        else:
            secs_l, cents_l, next_seq = [], [], 1
        for pdf in pdfs:
            secs_l.extend(int(x) for x in pdf["sec"])
            cents_l.extend(int(x) for x in pdf["cents"])
        wm = state.getCurrentWatermarkMs() // 1000
        order = np.argsort(np.asarray(secs_l, dtype=np.int64), kind="stable")
        secs = np.asarray(secs_l, dtype=np.int64)[order]
        cents = np.asarray(cents_l, dtype=np.int64)[order]
        rows, start, keep_from = [], 0, None
        n = len(secs)
        for j in range(1, n + 1):
            if j == n or secs[j] - secs[j - 1] > gap_s:
                if secs[j - 1] + gap_s < wm:
                    rows.append(
                        (
                            user,
                            next_seq,
                            j - start,
                            int(secs[start]),
                            int(secs[j - 1]),
                            float(cents[start:j].sum()) / 100.0,
                        )
                    )
                    next_seq += 1
                    start = j
                else:
                    # first still-open session: everything from here stays
                    # buffered (later sessions close even later)
                    keep_from = start
                    break
        if keep_from is None:
            keep_from = n
        state.update(
            (
                [int(x) for x in secs[keep_from:]],
                [int(x) for x in cents[keep_from:]],
                next_seq,
            )
        )
        if keep_from < n:
            # re-arm an event-time timeout at the earliest instant the
            # first still-open session COULD close — so a user with no
            # further events still gets their provably-closed sessions
            # emitted once the watermark passes (NoTimeout would buffer
            # them forever). (last buffered event + gap + 1) s is
            # strictly above the current watermark by the open-session
            # invariant. A drained buffer keeps only the (tiny) seq
            # counter in state, with no timeout pending.
            state.setTimeoutTimestamp((int(secs[n - 1]) + gap_s + 1) * 1000)
        import pandas as pd

        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "user_id", "session_seq", "n_events",
                    "start_s", "end_s", "total_value",
                ],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    agg = ev.groupBy("user_id").applyInPandasWithState(
        _fn,
        outputStructType=out_type,
        stateStructType=state_type,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    return q


def dedup_stream(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "doc_dedup_stream",
):
    """Streaming twin of ``datapipe.dedup.exact_dedup``'s decision: emit
    each document whose normalized-content fingerprint has not been seen
    anywhere earlier in the stream (file source -> ``dropDuplicates`` on
    the fingerprint -> append-mode memory sink).

    Semantics vs the batch op: the batch survivor set is one doc per
    distinct fingerprint (min doc_id); the stream keeps the FIRST
    arrival per fingerprint — same fingerprint set, arrival-order
    representative (tests compare the fingerprint sets and dup-group
    membership, not the representative ids).

    Scale shape: state is one entry per DISTINCT fingerprint (16-byte
    digest + small row), hash-partitioned across executors by the dedup
    key — the streaming analogue of the batch groupBy shuffle. For a
    corpus where duplicates are temporally local, swap to
    ``dropDuplicatesWithinWatermark`` to bound state by the horizon;
    global exact dedup inherently carries all-history state.
    """
    from ttmf_spark.datapipe.textstats import with_fingerprint

    sdf = spark.readStream.schema(
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).parquet(input_dir)
    kept = (
        with_fingerprint(sdf)
        .select("doc_id", "fingerprint")
        .dropDuplicates(["fingerprint"])
    )
    return (
        kept.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def near_dup_stream(
    spark: SparkSession,
    input_dir: str,
    pairs_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    tau: float = 0.8,
    k: int = 64,
    bands: int = 16,
    n: int = 3,
    trigger_once: bool = True,
):
    """Streaming MinHash-LSH near-dup: as document files land, index each
    micro-batch with the SAME banded-LSH code as the batch path
    (dedup.minhash_buckets) and emit verified near-dup pairs against
    everything seen so far — the incremental twin of
    dedup.minhash_lsh_pairs, converging to the identical pair set
    (pinned by test_streaming_near_dup_matches_batch).

    Per micro-batch:
      1. band-bucket rows for the new docs (per-doc independent, so a
         subset yields identical rows to the full-corpus run);
      2. candidates = new-vs-new (within batch) + new-vs-history (join
         against the accumulated index sink on (band, bucket));
      3. exact-Jaccard verify (dedup.verify_jaccard) — old-doc text is
         re-read from the landed files pruned to candidate ids, the
         streaming analogue of the batch path's narrow re-shingle;
      4. append verified pairs; append the batch's index rows.

    Exactly-once: the file-source checkpoint processes each file once,
    and every emitted pair contains >= 1 doc from the current batch, so
    pairs can never repeat across batches (new-new and new-old by
    construction; old-old pairs were emitted when the younger doc
    arrived).

    Scale shape: state is the (doc_id, band, bucket) index — bands rows
    of ~24 bytes per doc, hash-partitionable by bucket; the history join
    touches only matching buckets. Production swaps the parquet index
    dir for an Iceberg table bucketed by (band, bucket) so the
    new-vs-history join prunes to matching files (same upgrade path as
    incremental_extract's sink).
    """
    import os

    from ttmf_spark.datapipe.dedup import minhash_buckets, verify_jaccard

    docs_schema = (
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    sdf = spark.readStream.schema(docs_schema).parquet(input_dir)

    def _index_exists() -> bool:
        return os.path.isdir(index_dir) and any(
            f.endswith(".parquet") for f in os.listdir(index_dir)
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        b = minhash_buckets(batch_df, k, bands, n).localCheckpoint(eager=True)
        ca = b.select(F.col("doc_id").alias("a"), "band", "bucket")
        cb = b.select(F.col("doc_id").alias("b"), "band", "bucket")
        cand = (
            ca.join(cb, ["band", "bucket"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
        )
        if _index_exists():
            hist = spark.read.parquet(index_dir)
            hb = hist.select(F.col("doc_id").alias("h"), "band", "bucket")
            nb = b.select(F.col("doc_id").alias("d"), "band", "bucket")
            mixed = (
                nb.join(hb, ["band", "bucket"])
                .select(
                    F.least("d", "h").alias("a"),
                    F.greatest("d", "h").alias("b"),
                )
            )
            cand = cand.unionByName(mixed)
        cand = cand.distinct().localCheckpoint(eager=True)
        # candidate-pruned text re-read over everything landed so far
        ids = cand.select(F.col("a").alias("doc_id")).unionByName(
            cand.select(F.col("b").alias("doc_id"))
        ).distinct()
        texts = (
            spark.read.schema(docs_schema)
            .parquet(input_dir)
            .join(ids, "doc_id", "left_semi")
        )
        verified = verify_jaccard(texts, cand, tau, n)
        verified.write.mode("append").parquet(pairs_dir)
        b.write.mode("append").parquet(index_dir)

    return (
        sdf.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


ALIAS_SCHEMA = "src string, dst string"


def _list_label_versions(spark: SparkSession, labels_dir: str) -> list[int]:
    """COMMITTED batch-id versions under a versioned state sink (Hadoop
    FS, so the probe works for s3/hdfs/local URIs alike; missing dir =
    no versions). A v=N dir counts only when its ``_SUCCESS`` marker
    exists — the committer drops it last, so a crashed (or in-flight)
    batch's partial parquet dir is invisible to readers AND to the next
    batch's fold-from-highest-prior probe; the replaying batch simply
    overwrites the uncommitted residue. Same contract as
    io_util.committed_versions."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(labels_dir)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.startswith("v="):
            try:
                v = int(name[2:])
            except ValueError:
                continue
            if fs.exists(
                jvm.org.apache.hadoop.fs.Path(f"{labels_dir}/v={v}/_SUCCESS")
            ):
                out.append(v)
    return sorted(out)


def read_canonical_labels(spark: SparkSession, labels_dir: str) -> DataFrame:
    """The CURRENT (node, component) labeling: the highest committed
    version under the sink."""
    versions = _list_label_versions(spark, labels_dir)
    if not versions:
        raise FileNotFoundError(f"no label versions under {labels_dir}")
    return spark.read.schema("node string, component string").parquet(
        f"{labels_dir}/v={versions[-1]}"
    )


def canonicalize_stream(
    spark: SparkSession,
    input_dir: str,
    labels_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    max_files: int = 16,
    on_remap=None,
):
    """Incremental alias-graph canonicalization: as same_as edge files
    land, maintain the (node, component) canonical-label table by folding
    each micro-batch into the previous labeling with
    ``canonicalize.components_incremental`` — the trillion-row base graph
    is never re-contracted; each batch costs one relabel join plus a CC
    on the batch-sized merge graph.

    Exactly-once / resume: the file-source checkpoint assigns each file
    to exactly one ``batch_id``; labels are written to
    ``{labels_dir}/v={batch_id}`` (mode overwrite) and each batch folds
    into the highest version STRICTLY BELOW its own id, so a replayed
    batch (crash after write, before checkpoint commit) rebuilds from the
    same predecessor state and overwrites its own partial output —
    idempotent by construction. ``read_canonical_labels`` serves the
    newest committed version; after any prefix of the stream it equals a
    from-scratch ``connected_components`` over every edge landed so far
    (min-member labels are merge-stable; pinned by
    tests/test_streaming.py against the batch twin).

    Scale shape: per batch, the big side (the label table) is touched by
    ONE join against a delta-bounded broadcast merge map; state is the
    label table itself, stored versioned (production swaps the versioned
    parquet dirs for Iceberg snapshots of one table and keeps only the
    newest — same contract, catalog-managed retention).

    ``on_remap(remap_df, batch_id)``, if given, is the mapping-version
    hook: called after each batch's labels COMMIT with the
    ``label_remap`` merge map (CHANGED (old, new) canonical pairs,
    delta-bounded; called only when non-empty). This is where maintained
    tables keyed by canonical ids re-key themselves — e.g.
    ``extract.pipeline.resupport_after_merge`` for the triple-support
    table (pinned by tests/test_streaming.py). Replay safety: the hook
    fires again if the batch replays after a crash; consumers must be
    idempotent per batch_id (version their outputs like this sink does).
    """
    from ttmf_spark.extract.canonicalize import (
        components_incremental,
        connected_components,
        label_remap,
    )

    sdf = (
        spark.readStream.schema(ALIAS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        prior = [v for v in _list_label_versions(spark, labels_dir) if v < batch_id]
        if prior:
            base = spark.read.schema("node string, component string").parquet(
                f"{labels_dir}/v={prior[-1]}"
            )
            labels = components_incremental(base, batch_df)
        else:
            base = None
            labels = connected_components(batch_df)
        labels.write.mode("overwrite").parquet(f"{labels_dir}/v={batch_id}")
        if on_remap is not None and base is not None:
            committed = spark.read.schema(
                "node string, component string"
            ).parquet(f"{labels_dir}/v={batch_id}")
            remap = label_remap(base, committed).localCheckpoint(eager=True)
            if remap.count() > 0:
                on_remap(remap, batch_id)

    writer = sdf.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


RETRACTION_SCHEMA = "doc_id string"
_SUPPORT_SCHEMA = "s string, p string, o string, n_docs bigint, first_doc string"
_DOC_LEVEL_SCHEMA = "doc_id string, s string, p string, o string"


def read_support_state(
    spark: SparkSession, state_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The CURRENT maintained (support, doc_level) pair: the highest
    committed version under the retraction-stream sink. The support dir
    is the pair's commit marker (the stream writes doc_level first,
    support last), so any version listed here has a complete doc_level
    half."""
    versions = _list_label_versions(spark, f"{state_dir}/support")
    if not versions:
        raise FileNotFoundError(f"no support versions under {state_dir}")
    v = versions[-1]
    return (
        spark.read.schema(_SUPPORT_SCHEMA).parquet(f"{state_dir}/support/v={v}"),
        spark.read.schema(_DOC_LEVEL_SCHEMA).parquet(
            f"{state_dir}/doc_level/v={v}"
        ),
    )


def retraction_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    init_support: DataFrame,
    init_doc_level: DataFrame,
    trigger_once: bool = True,
    max_files: int = 16,
):
    """ST6 — streaming document retraction: as takedown/correction files
    (doc_id rows, RETRACTION_SCHEMA) land, maintain the (support,
    doc_level) provenance pair by folding each micro-batch OUT with
    ``extract.pipeline.triple_support_decremental`` — affected triples
    re-aggregate from their surviving witnesses, zero-witness triples
    drop, unaffected rows splice verbatim; the corpus is never rescanned.

    The streaming twin of ST1's append side and the third consumer of
    the versioned-state contract ``canonicalize_stream`` established:
    each batch writes ``{state_dir}/{support,doc_level}/v={batch_id}``
    (mode overwrite) and folds from the highest version STRICTLY BELOW
    its own id — a replayed batch rebuilds from the same predecessor and
    overwrites its own partial output, idempotent by construction. The
    first batch folds from the caller's ``init_support``/
    ``init_doc_level`` (the batch-built tables). After any prefix of the
    stream the served state equals ``triple_support`` recomputed on the
    surviving corpus (pinned by tests/test_streaming.py). Retraction of
    an unknown or already-retracted doc_id is a no-op, so duplicate
    deliveries are safe.
    """
    from ttmf_spark.extract.pipeline import triple_support_decremental

    sdf = (
        spark.readStream.schema(RETRACTION_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        prior = [
            v
            for v in _list_label_versions(spark, f"{state_dir}/support")
            if v < batch_id
        ]
        if prior:
            sup = spark.read.schema(_SUPPORT_SCHEMA).parquet(
                f"{state_dir}/support/v={prior[-1]}"
            )
            dl = spark.read.schema(_DOC_LEVEL_SCHEMA).parquet(
                f"{state_dir}/doc_level/v={prior[-1]}"
            )
        else:
            sup, dl = init_support, init_doc_level
        new_sup, new_dl = triple_support_decremental(sup, dl, batch_df)
        # doc_level FIRST, support LAST: version listing (both the
        # fold-side `prior` probe above and read_support_state) keys off
        # the support dir, so writing support last makes it the commit
        # marker for the PAIR — a crash (or a reader racing the batch)
        # between the two writes can never observe a support version
        # whose doc_level half is missing or partial
        new_dl.write.mode("overwrite").parquet(
            f"{state_dir}/doc_level/v={batch_id}"
        )
        new_sup.write.mode("overwrite").parquet(
            f"{state_dir}/support/v={batch_id}"
        )

    writer = sdf.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_alias_state(
    spark: SparkSession, state_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The CURRENT maintained (labels, edges) pair of the alias-retraction
    stream: highest committed version, labels dir as the pair's commit
    marker (the stream writes edges first, labels last)."""
    versions = _list_label_versions(spark, f"{state_dir}/labels")
    if not versions:
        raise FileNotFoundError(f"no label versions under {state_dir}")
    v = versions[-1]
    return (
        spark.read.schema("node string, component string").parquet(
            f"{state_dir}/labels/v={v}"
        ),
        spark.read.schema(ALIAS_SCHEMA).parquet(f"{state_dir}/edges/v={v}"),
    )


def alias_retraction_stream(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    init_labels: DataFrame,
    init_edges: DataFrame,
    trigger_once: bool = True,
    max_files: int = 16,
    on_remap=None,
):
    """ST7 — streaming ALIAS-EDGE retraction: as same_as withdrawal files
    land (src, dst rows — delete what was inserted), maintain the
    (labels, edges) canonicalization state by folding each micro-batch
    out with ``canonicalize.components_decremental`` — affected
    components re-derive from their surviving edges (clusters can
    SPLIT), unaffected label rows splice verbatim, and the surviving
    edge set itself is maintained so the next batch's carve has its
    input. The deletion twin of ``canonicalize_stream`` (which folds
    edge ADDITIONS) and the final streaming lifecycle event: with ST1
    ingestion, the canonicalize/merge stream, ST6 doc retraction, and
    this, every batch maintenance path has a streaming twin.

    Versioned-state contract as everywhere: each batch writes
    ``{state_dir}/{edges,labels}/v={batch_id}`` (edges FIRST, labels
    LAST, so the labels listing is the pair's commit marker) and folds
    from the highest version strictly below its own id — replayed
    batches rebuild from the same predecessor, idempotent; retracting an
    absent (or already-retracted) edge is a no-op, so duplicate
    deliveries are safe. After any stream prefix the served labels equal
    a cold ``connected_components`` over the surviving edges with
    self-labels for stranded nodes (pinned by tests/test_streaming.py).

    ``on_remap(remap_df, batch_id)``: the split-side re-key hook, fired
    after each batch's labels COMMIT with the ``label_remap`` (old, new)
    map when non-empty. Downstream maintained tables re-key through
    ``extract.pipeline.resupport_from_docs`` here — NOT the merge hook:
    a split maps one old label to several new ones, and only the
    affected documents know which branch each mention takes (see
    canonicalize.components_decremental's docstring). Replay safety as
    in canonicalize_stream: consumers version their outputs per
    batch_id.
    """
    from ttmf_spark.extract.canonicalize import (
        components_decremental,
        label_remap,
    )

    sdf = (
        spark.readStream.schema(ALIAS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        prior = [
            v
            for v in _list_label_versions(spark, f"{state_dir}/labels")
            if v < batch_id
        ]
        if prior:
            labels = spark.read.schema("node string, component string").parquet(
                f"{state_dir}/labels/v={prior[-1]}"
            )
            edges = spark.read.schema(ALIAS_SCHEMA).parquet(
                f"{state_dir}/edges/v={prior[-1]}"
            )
        else:
            labels, edges = init_labels, init_edges
        new_labels = components_decremental(labels, edges, batch_df)
        new_edges = edges.join(
            batch_df.select("src", "dst"), ["src", "dst"], "left_anti"
        )
        new_edges.write.mode("overwrite").parquet(
            f"{state_dir}/edges/v={batch_id}"
        )
        new_labels.write.mode("overwrite").parquet(
            f"{state_dir}/labels/v={batch_id}"
        )
        if on_remap is not None:
            committed = spark.read.schema(
                "node string, component string"
            ).parquet(f"{state_dir}/labels/v={batch_id}")
            remap = label_remap(labels, committed).localCheckpoint(eager=True)
            if remap.count() > 0:
                on_remap(remap, batch_id)

    writer = sdf.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cms_stream(
    spark: SparkSession,
    input_dir: str,
    key_col: str = "user_id",
    width: int = 8,
    depth: int = 3,
    seed: int = 0,
    hash_fn: str = "xxhash64",
    query_name: str = "evt_cms_stream",
):
    """Streaming twin of ``datapipe.sketch.cms_counts``' counter table:
    the width*depth Count-Min cells maintained as streaming-aggregation
    state while event files land (file source -> cell groupBy ->
    complete-mode memory sink).

    This is the sketch property doing real work: counters are a
    commutative monoid, so Structured Streaming's incremental hash-agg
    state IS the sketch — every micro-batch folds in map-side, no
    reprocessing, and the state is O(width*depth) regardless of stream
    length (contrast dedup_stream, whose state grows with distinct
    keys). After any prefix of the stream, the sink table equals the
    batch ``cms_counts`` counter table over the same events — pinned by
    test_cms_stream_matches_batch — so estimates made from it inherit
    the batch one-sided guarantee.
    """
    from ttmf_spark.datapipe.dedup import u60

    sdf = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).parquet(input_dir)
    key_s = F.col(key_col).cast("string")
    cells = sdf.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            u60(key_s, seed=seed + d, fn=hash_fn),
                            F.lit(width),
                        )
                        .cast("int")
                        .alias("cell"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("dc")
    ).select("dc.d", "dc.cell")
    counters = cells.groupBy("d", "cell").agg(F.count("*").alias("c"))
    return (
        counters.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
