"""Streaming ingest-time dedup: new documents arrive as a file
stream, each micro-batch probes the persisted corpus LSH index, and
only novel documents are admitted.

This wires the batch incremental-dedup operator
(operators/dedup.py probe_band_index — corpus signature work paid once
at index build, probe cost scales with the batch) into Structured
Streaming's delivery semantics:

- source: ``readStream`` over a landing directory (schema-explicit —
  streaming readers must not infer);
- per batch: probe -> split into accepted docs and rejected
  (batch_doc_id, corpus_doc_id, jac) pairs;
- sink: the idempotent per-batch-overwrite writer
  (streaming/sinks.py), so a crash-replayed micro-batch rewrites its
  own output instead of double-admitting documents. Accepted docs and
  rejection evidence land under ``accepted/batch=N`` /
  ``rejected/batch=N``.

At cluster scale the admitted batch's band rows would also be
APPENDED to the bucketed index tables inside the same foreachBatch
(so later batches dedup against earlier ones); that append is a
second idempotent write keyed by batch_id. Kept out of the test-scale
path here — batches dedup against the fixed corpus — because catalog
appends inside foreachBatch need a transactional table format
(Iceberg/Delta) to also be replay-safe, which this container lacks;
the swap is documented in SCALE.md §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import probe_band_index
from .sinks import idempotent_batch_writer


def dedup_admission_writer(
    index_name: str, out_path: str, threshold: float = 0.9
):
    """foreachBatch function: probe the persisted index, write
    accepted docs + rejected pairs idempotently per batch."""
    accept_w = idempotent_batch_writer(f"{out_path}/accepted")
    reject_w = idempotent_batch_writer(f"{out_path}/rejected")

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        pairs = probe_band_index(batch_df, index_name, threshold=threshold)
        # the probe runs twice (pairs + anti) per batch; tiny batch
        # side makes recompute cheaper than a persist/unpersist cycle
        # at test scale — at cluster scale persist pairs here.
        dup_ids = pairs.select(F.col("batch_doc_id").alias("doc_id")).distinct()
        accepted = batch_df.join(dup_ids, "doc_id", "left_anti")
        accept_w(accepted, batch_id)
        reject_w(pairs, batch_id)

    return admit


def run_dedup_ingest(
    spark: SparkSession,
    landing_dir: str,
    schema: str,
    index_name: str,
    out_path: str,
    checkpoint: str,
    threshold: float = 0.9,
    timeout: int = 120,
) -> StreamingQuery:
    """Drain all pending files from ``landing_dir`` through the
    dedup-admission gate (availableNow trigger: process everything
    queued, then stop; offsets checkpoint, so a re-run picks up only
    NEW files)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one landing file per micro-batch
        .parquet(landing_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            dedup_admission_writer(index_name, out_path, threshold)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    q.stop()
    return q


def lm_gate_writer(
    model_counts: DataFrame,
    model_contexts: DataFrame,
    model_vocab: DataFrame,
    out_path: str,
    max_nll: float,
):
    """foreachBatch function for the streaming LM quality gate: score
    each micro-batch against a PRE-TRAINED bigram model
    (operators/lm_score.lm_score_against — the train-once /
    gate-every-batch deployment) and split into accepted docs and
    rejected (doc_id, avg_nll) evidence, written idempotently per
    batch.

    The model tables are static DataFrames captured in the closure:
    counts/contexts join the batch's bigram stream (broadcast-sized
    under a capped vocabulary — SCALE.md §6), vocab is a one-row
    broadcast. Unseen text backs off to the smoothing floor, so
    out-of-model gibberish scores HIGH and is rejected, never
    admitted by accident.

    Docs too short to score (< 2 tokens) produce no bigrams; they are
    rejected with a NULL avg_nll (a 100 TB corpus gate drops them —
    admitting unscoreable input silently is the wrong default).
    """
    accept_w = idempotent_batch_writer(f"{out_path}/accepted")
    reject_w = idempotent_batch_writer(f"{out_path}/rejected")

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.lm_score import lm_score_against

        scores = lm_score_against(
            model_counts, model_contexts, model_vocab, batch_df
        )
        scored = batch_df.join(scores.select("doc_id", "avg_nll"), "doc_id", "left")
        accepted = scored.filter(F.col("avg_nll") <= max_nll).drop("avg_nll")
        rejected = scored.filter(
            F.col("avg_nll").isNull() | (F.col("avg_nll") > max_nll)
        ).select("doc_id", "avg_nll")
        accept_w(accepted, batch_id)
        reject_w(rejected, batch_id)

    return gate


def run_lm_gate(
    spark: SparkSession,
    landing_dir: str,
    schema: str,
    model_counts: DataFrame,
    model_contexts: DataFrame,
    model_vocab: DataFrame,
    out_path: str,
    checkpoint: str,
    max_nll: float,
    timeout: int = 120,
) -> StreamingQuery:
    """Drain pending document files through the LM quality gate
    (availableNow; same replay-safe offsets+idempotent-write contract
    as run_dedup_ingest)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lm_gate_writer(model_counts, model_contexts, model_vocab, out_path, max_nll)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    q.stop()
    return q


def drift_gate_writer(
    base_hist: DataFrame,
    out_path: str,
    max_psi: float,
    value_col: str = "n_chars",
    bin_width: int = 50,
):
    """foreachBatch function for the streaming distribution-drift
    gate: PSI of each micro-batch's ``value_col`` histogram against a
    PERSISTED baseline histogram (operators/profile.py::psi_between —
    the compute-baseline-once / check-every-batch deployment of
    distribution_psi). Batches at or under ``max_psi`` land in
    ``accepted/``; drifted batches are quarantined WHOLE with their
    psi stamped on every row — drift is a batch-level property (a
    shifted source, a broken upstream filter), so admitting the
    "good-looking" rows of a drifted batch would defeat the alarm.

    The per-batch psi is a one-row driver witness (same bounded class
    as the report collects, SURVEY §4.2); all histogram work is
    executor-side and histogram-sized. A batch with no measurable
    values (zero rows, or all-NULL ``value_col`` — NULL bins are
    filtered by value_histogram) yields an EMPTY histogram and is
    quarantined with psi NULL — an unmeasurable batch must not pass a
    measurement gate, and must not pass it by the accident of a large
    ε-floor PSI either.
    """
    from ..operators.profile import psi_between, value_histogram

    accept_w = idempotent_batch_writer(f"{out_path}/accepted")
    quarantine_w = idempotent_batch_writer(f"{out_path}/quarantined")

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        hist = value_histogram(batch_df, value_col, bin_width)
        # histogram-sized collect: one row per occupied bin
        bins = hist.collect()
        if not bins:
            psi = None  # unmeasurable batch: explicit NULL verdict
        else:
            cur = batch_df.sparkSession.createDataFrame(
                bins, schema=hist.schema
            )
            psi = psi_between(cur, base_hist).collect()[0][0]
        if psi is not None and psi <= max_psi:
            accept_w(batch_df, batch_id)
        else:
            quarantine_w(
                batch_df.withColumn("psi", F.lit(psi).cast("double")),
                batch_id,
            )

    return gate


def run_drift_gate(
    spark: SparkSession,
    landing_dir: str,
    schema: str,
    base_hist: DataFrame,
    out_path: str,
    checkpoint: str,
    max_psi: float,
    value_col: str = "n_chars",
    bin_width: int = 50,
    timeout: int = 120,
) -> StreamingQuery:
    """Drain pending document files through the drift gate
    (availableNow; same replay-safe offsets+idempotent-write contract
    as run_dedup_ingest / run_lm_gate)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            drift_gate_writer(base_hist, out_path, max_psi, value_col, bin_width)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    q.stop()
    return q
