"""Watermarked streaming window aggregation (streaming/windows.py).

Drives a REAL file-source stream (readStream -> withWatermark ->
tumbling window agg -> append-mode parquet sink) over the testdata
events table, split into time-ordered files so availableNow processes
them as successive micro-batches (state for windows straddling a file
boundary must merge across batches), and asserts:

1. the streamed result equals the batch ``q_events_window`` answer on
   every FINALIZED window (append mode can only emit windows whose end
   precedes the final watermark = max event time - delay);
2. rows arriving later than the watermark delay are dropped, and rows
   within it are merged — the documented late-data contract.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available"
)


def _write_time_ordered_files(spark, events_dir: str, n_files: int = 4):
    """Split events into n_files contiguous time ranges, one parquet
    file each, with strictly increasing mtimes so FileStreamSource
    (oldest-first) processes them in time order."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    bounds = ev.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo).total_seconds()
    os.makedirs(events_dir, exist_ok=True)
    # half-open intervals, last one unbounded: unix_timestamp truncates
    # to seconds, so an inclusive upper bound computed from the float
    # span can exclude the max row (truncation asymmetry) — losing it
    # silently lowers the stream's final watermark
    d = F.unix_timestamp("ts") - F.unix_timestamp(F.lit(lo))
    for i in range(n_files):
        if i == n_files - 1:
            cond = d >= span * i / n_files
        else:
            cond = (d >= span * i / n_files) & (d < span * (i + 1) / n_files)
        if i == 0:
            cond = cond | F.col("ts").isNull()
        part = ev.filter(cond)
        tmp = f"{events_dir}/_stage{i}"
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(
            f"{tmp}/{n}" for n in os.listdir(tmp) if n.endswith(".parquet")
        )
        dst = f"{events_dir}/part-{i:02d}.parquet"
        shutil.move(src, dst)
        shutil.rmtree(tmp)
        # explicit increasing mtimes: deterministic source order
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return ev, hi


def test_stream_matches_batch_on_finalized_windows(spark, tmp_path):
    from recordlinker_spark.streaming.windows import (
        run_stream_to_parquet,
        windowed_event_aggregates,
    )

    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev, max_ts = _write_time_ordered_files(spark, events_dir)

    delay = "10 minutes"
    run_stream_to_parquet(
        events_dir, out_dir, ckpt, ev.schema,
        window_duration="5 minutes", watermark_delay=delay,
    )
    streamed = spark.read.parquet(out_dir)

    # batch ground truth via the same operator on a batch frame
    # (equals plans/demo.q_events_window bucketing by construction)
    batch = windowed_event_aggregates(ev, window_duration="5 minutes")
    final_wm = F.unix_timestamp(F.lit(max_ts)) - 600  # 10 min
    finalized = batch.filter(F.col("bucket_start") + 300 <= final_wm)

    # row-for-row equality on the finalized set (sum_value within a
    # rounding ulp: streaming state sums incrementally across batches,
    # so float addition order differs from the batch single-pass agg)
    n_final = finalized.count()
    assert n_final > 0
    joined = streamed.withColumnRenamed("n_events", "n_s").withColumnRenamed(
        "sum_value", "v_s"
    ).join(finalized, ["user_id", "bucket_start"])
    assert joined.count() == n_final
    bad = joined.filter(
        (F.col("n_s") != F.col("n_events"))
        | (F.abs(F.col("v_s") - F.col("sum_value")) > 1e-5)
    )
    assert bad.count() == 0
    # nothing emitted beyond the finalized set except possibly the
    # boundary windows Spark finalized on the terminal empty batch
    extra = streamed.join(
        finalized, ["user_id", "bucket_start"], "left_anti"
    )
    assert extra.filter(F.col("bucket_start") + 300 <= final_wm).count() == 0

    # sanity: also matches the demo batch query's aggregates
    from recordlinker_spark.plans.demo import q_events_window

    demo_rows = {
        (r["user_id"], r["bucket_start"]): (r["n_events"], r["sum_value"])
        for r in q_events_window(spark, SF_DIR).collect()
    }
    for r in streamed.limit(50).collect():
        n, v = demo_rows[(r["user_id"], r["bucket_start"])]
        assert n == r["n_events"] and abs(v - r["sum_value"]) < 1e-5


def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path):
    """A fifth file replaying the OLDEST quarter of events (mtime
    latest, so processed after the watermark has advanced past them)
    must not change the finalized output: the replayed rows are later
    than the watermark delay and are dropped, not double-counted."""
    from recordlinker_spark.streaming.windows import run_stream_to_parquet

    events_dir = str(tmp_path / "events")
    ev, max_ts = _write_time_ordered_files(spark, events_dir)

    # run 1: clean stream
    out1, ck1 = str(tmp_path / "out1"), str(tmp_path / "ck1")
    run_stream_to_parquet(events_dir, out1, ck1, ev.schema)
    clean = {
        (r["user_id"], r["bucket_start"], r["n_events"])
        for r in spark.read.parquet(out1).collect()
    }

    # run 2: same files + a late replay of the oldest file
    shutil.copy(
        f"{events_dir}/part-00.parquet", f"{events_dir}/part-99.parquet"
    )
    os.utime(
        f"{events_dir}/part-99.parquet", (1_700_000_010, 1_700_000_010)
    )
    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    run_stream_to_parquet(events_dir, out2, ck2, ev.schema)
    replayed = {
        (r["user_id"], r["bucket_start"], r["n_events"])
        for r in spark.read.parquet(out2).collect()
    }

    assert replayed == clean
