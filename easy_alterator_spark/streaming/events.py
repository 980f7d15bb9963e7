"""Structured Streaming façade over the events table (SURVEY.md §2.9).

The reference has zero streaming constructs; these are the Spark
built-ins the extended engine gets, declared V4 scope. Every operator
here is the streaming twin of a batch query in queries/extensions.py,
so tests can assert stream-vs-batch equality by running the stream
with ``trigger(availableNow=True)`` over the same parquet input.

Scale notes (100 TB posture):
- watermarks bound state: tumbling/sliding window state is evicted
  once the watermark passes the window end; without one, state grows
  unboundedly at production event rates.
- ``dropDuplicatesWithinWatermark`` keeps only the watermark-window's
  worth of dedup keys, unlike ``dropDuplicates`` whose state never
  shrinks on a stream.
- the custom stateful op uses ``applyInPandasWithState`` — state is
  partitioned by key across executors and timed out by the watermark,
  never collected to the driver.
"""

from __future__ import annotations

import os
import threading
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# events.parquet physical schema: naive TIMESTAMP(MICROS). Declaring
# TimestampType here (instead of letting inference pick TIMESTAMP_NTZ)
# pins epoch semantics under the UTC session — see sources/tables.py.
_EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch under availableNow; a directory of files streams
    incrementally on a real deployment)."""
    # the file source wants a directory; select the single events file
    # out of the shared sf dir with a glob
    raw = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw


def tumbling_counts(
    events: DataFrame, window: str = "1 day", watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window count/sum per event_type — the
    streaming twin of q18_date_bucket."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sv",
        )
    )


def sliding_user_activity(
    events: DataFrame,
    window: str = "2 days",
    slide: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding-window distinct-ish activity: events per user per
    overlapping window (approx_count_distinct stays mergeable in
    streaming state, unlike exact distinct)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("event_type").alias("approx_types"),
        )
        .select(F.col("w.start").alias("window_start"), "user_id", "n_events", "approx_types")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows (gap-based) per user — the streaming twin of
    events_sessionize, whose batch form derives sessions with a lag()
    window + cumulative sum."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Late-data-safe exact dedup on (user_id, event_type): state holds
    only keys younger than the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


_RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
        StructField("last_ts", TimestampType(), True),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("total", DoubleType(), True),
    ]
)


def _running_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        ts_max = pdf["ts"].max()
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    state.update((n, float(total)))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_ts": [last_ts],
        }
    )


def running_user_totals(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Custom stateful operator: running per-user event count + value
    total via applyInPandasWithState (arbitrary state, Arrow-batched)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals,
            outputStructType=_RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def enrich_with_customers(
    events: DataFrame,
    customers: DataFrame,
    watermark: str = "1 hour",
    window: str = "1 day",
) -> DataFrame:
    """Stream-static join + windowed agg: enrich the event stream with
    the customer dimension (market segment) and count per segment per
    day — the classic streaming-enrichment shape.

    The static side is re-read per micro-batch by Structured Streaming
    (picking up dimension updates); with the default broadcast
    threshold a small dimension joins map-side, so the stream never
    shuffles before its window aggregate. Stream-static joins need no
    watermark on the static side and the state store holds only the
    window aggregate."""
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return (
        events.withWatermark("ts", watermark)
        .join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", window).alias("w"), "segment")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .select(F.col("w.start").alias("window_start"), "segment", "n", "sv")
    )


def view_click_stream_join(
    events: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: every click paired with the same
    user's views from the preceding `max_gap` — the attribution shape
    (streaming twin of the batch as-of join `events_asof_join`, which
    keeps only the latest view; the stream emits every qualifying
    view, since "latest before X" is not monotone under late data).

    State-boundedness is the whole game in stream-stream joins: both
    sides carry a watermark AND the join condition brackets event time
    from both ends (view <= click AND view >= click - max_gap), so
    each side's state store evicts rows older than
    watermark + max_gap. An unbracketed condition would grow state
    forever."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    return views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {max_gap}")),
    ).select(
        F.col("c_user").alias("user_id"), "click_id", "click_ts", "view_ts"
    )


# serializes shuffle-partition overrides across concurrent drains:
# the runtime conf is session-global, so an unlocked override would
# leak into queries planned concurrently in the same SparkSession
_SHUFFLE_CONF_LOCK = threading.Lock()


def run_to_memory(
    stream: DataFrame,
    name: str,
    output_mode: str = "append",
    timeout: int = 120,
    state_partitions: int | None = None,
) -> None:
    """Drain the stream into an in-memory table with availableNow (test
    helper; production sinks are kafka/delta/parquet writeStream).

    ``state_partitions`` sizes the query's state stores: a stateful
    operator provisions one store per shuffle partition (a
    stream-stream join provisions FOUR), and the partition count is
    frozen into the checkpoint at first start — so it is a per-query
    sizing decision tracking STREAM volume, not the batch session's
    CPU count (measured: the sf0.1 view-click join spends 3.5 s of
    its 5.8 s provisioning 32 partitions' stores; 8 is right-sized).

    The override is set on the session-global runtime conf for the
    duration of start(): any query PLANNED concurrently in the same
    SparkSession during the drain would inherit it, so a process-wide
    lock serializes overriding drains against each other and the
    restore. (A spark.newSession() clone would scope the conf
    perfectly, but the memory-sink table registers in the clone's
    catalog, invisible to `spark.table(name)` callers — the lock keeps
    the sink visible to the caller's session.) Non-overriding drains
    (``state_partitions=None``) ALSO take the lock: they never touch
    the conf themselves, but planning one concurrently with an
    overriding drain would silently inherit the temporary override —
    holding the lock guarantees no override is in effect while any
    drain plans.

    NOT REENTRANT: the (non-reentrant) lock is held across the whole
    drain — start() through awaitTermination — so a nested
    run_to_memory on the same thread (e.g. from a foreachBatch
    callback) deadlocks, and concurrent drains fully serialize. Both
    are acceptable for a test helper; releasing after start() would
    only be safe for non-overriding drains (the override must stay
    pinned until the conf is restored), so the simple full-drain hold
    is kept deliberately.
    """
    spark = stream.sparkSession
    with _SHUFFLE_CONF_LOCK:
        old = None
        if state_partitions is not None:
            old = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(state_partitions)
            )
        try:
            q = (
                stream.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(timeout)
            q.stop()
        finally:
            if old is not None:
                spark.conf.set("spark.sql.shuffle.partitions", old)


def latest_by_key_stream(events: DataFrame) -> DataFrame:
    """Latest-wins materialized view over the stream — the streaming
    twin of queries/analytics.py::events_latest_by_key (CDC upsert
    compaction). State per key is ONE row: the max_by aggregate folds
    each micro-batch into the running (ts, event_id)-max, so state
    size is bounded by key cardinality, not stream length — no
    watermark needed (nothing is ever evicted; the view is the point).
    """
    return (
        events.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("event_id", "event_type", "value"),
                F.struct("ts", "event_id"),
            ).alias("r")
        )
        .select(
            "user_id",
            F.col("r.event_id").alias("event_id"),
            F.col("r.event_type").alias("event_type"),
            F.round(F.col("r.value"), 2).alias("value"),
        )
    )
