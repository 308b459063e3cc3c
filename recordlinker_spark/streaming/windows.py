"""Watermarked streaming window aggregation over the events stream.

The batch engine answers ``q_events_window`` (plans/demo.py) with a
plain groupBy over a bucketed timestamp; this module is the Structured
Streaming twin for a LIVE event feed: ``readStream`` -> watermark ->
tumbling ``F.window`` aggregation -> append-mode sink.  Semantics
match the batch query exactly — same 5-minute tumbling buckets, same
per-user (n_events, sum_value) aggregates — which the test asserts by
streaming a static parquet directory through the operator and
comparing against the batch answer row-for-row.

Why this shape at scale:

* **Watermark bounds state.**  ``withWatermark(ts, delay)`` lets Spark
  drop window state once the event-time high-water mark passes
  window_end + delay; without it, append mode is rejected and state
  grows without bound (every open window for every user lives in the
  state store forever on an unbounded feed).
* **Append output mode** emits each (user, window) row exactly once,
  when its window is finalized — the contract a downstream Iceberg /
  parquet sink wants.  Update mode would rewrite rows per batch and
  needs an upsert sink.
* **Late data** inside the watermark delay is merged into its proper
  window (the state store keeps the window open); data later than the
  delay is dropped, by design — the knob is explicit for callers.
* The aggregation itself is one shuffle keyed (user_id, window),
  hash-partitioned across the cluster like any streaming state op;
  skewed users shard no worse than the batch groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recordlinker_spark.functions.aggregates import exact_micros_sum


def windowed_event_aggregates(
    events: DataFrame,
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user tumbling-window aggregates for a (streaming or batch)
    events frame: ``user_id, bucket_start, n_events, sum_value``.

    On a streaming input the watermark is applied so the plan runs in
    append mode with bounded state; on a batch input ``withWatermark``
    is a no-op and the result equals the batch ``q_events_window``
    (the test asserts this equivalence through a real stream).
    """
    ev = events
    if dict(ev.dtypes).get(ts_col) == "timestamp_ntz":
        # event-time watermarks require TIMESTAMP (LTZ); NTZ parquet
        # columns are interpreted in the session timezone — the same
        # interpretation unix_timestamp gives the batch query, so the
        # bucket values stay equal between the twins
        ev = ev.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if ev.isStreaming:
        ev = ev.withWatermark(ts_col, watermark_delay)
    win = F.window(F.col(ts_col), window_duration)
    return (
        ev.groupBy(F.col(user_col), win.alias("_w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact integer-micros sum, same convention as the batch
            # twin (plans/demo.q_events_window) and the sessionizer:
            # bit-identical regardless of micro-batch arrival order,
            # all-NULL buckets 0.0
            exact_micros_sum(value_col).alias("sum_value"),
        )
        .select(
            user_col,
            F.unix_timestamp(F.col("_w.start")).alias("bucket_start"),
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_parquet(
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
    max_files_per_trigger: int = 1,
    timeout_sec: float = 300.0,
) -> None:
    """Drive the windowed aggregation as a real file-source stream:
    ``readStream.parquet(events_dir)`` -> watermark -> window agg ->
    append-mode parquet sink, processing ``availableNow`` and stopping.

    ``availableNow`` processes everything present then finishes the
    query — the batch-of-streams pattern for backfill jobs; a live
    deployment drops that trigger and the same plan runs forever with
    state bounded by the watermark.
    """
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    agg = windowed_event_aggregates(
        stream, window_duration=window_duration, watermark_delay=watermark_delay
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream did not finish within {timeout_sec}s")
