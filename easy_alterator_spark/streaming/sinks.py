"""Streaming file sinks with exactly-once semantics.

Spark's built-in file sink is already exactly-once via its metadata
log, but it can only APPEND. Real pipelines need per-batch OVERWRITE
shapes (dedup'd upserts, partition rewrites) — those go through
``foreachBatch``, where Spark's guarantee degrades to at-least-once:
after a crash the SAME (batch_id, data) pair can be replayed. The
sink function must therefore be IDEMPOTENT in batch_id.

``write_stream_idempotent`` makes the canonical move: every
micro-batch lands in a ``batch_id``-derived subdirectory written with
``mode=overwrite``. Replaying batch N rewrites ``batch=N`` with
identical bytes instead of duplicating rows; readers glob the
directory (``batch=*`` is a normal partition column). This is the
file-sink analogue of the MERGE-on-batch_id idiom the Structured
Streaming docs recommend for foreachBatch sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def idempotent_batch_writer(base_path: str):
    """A ``foreachBatch`` function: deterministic per-batch overwrite.

    Safe under replay: the batch id (not a timestamp, not a UUID) names
    the output, so a retried batch replaces itself byte-for-byte.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{base_path}/batch={batch_id}")

    return write_batch


def write_stream_idempotent(
    stream: DataFrame,
    base_path: str,
    checkpoint: str,
    output_mode: str = "append",
    timeout: int = 120,
) -> StreamingQuery:
    """Drain ``stream`` to ``base_path`` exactly-once via the
    idempotent foreachBatch writer (availableNow trigger — process all
    pending input, then stop; the checkpoint carries offsets so the
    next call resumes, never re-reads)."""
    q = (
        stream.writeStream.foreachBatch(idempotent_batch_writer(base_path))
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    q.stop()
    return q
