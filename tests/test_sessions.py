"""Sessionization: batch window twin vs applyInPandasWithState stream.

The streaming operator must emit exactly the batch twin's sessions for
every session that CLOSES during the stream (a later event beyond the
gap arrives); each user's final session stays open in the state store
and is not emitted — the test derives that expected closed set from
the batch answer by dropping each user's last session.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from test_streaming_windows import _write_time_ordered_files

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available"
)


def test_batch_sessionize_gap_semantics(spark):
    """Hand-built corpus: gaps strictly over 30 min split, <= merge."""
    import datetime as dt

    from recordlinker_spark.operators.sessions import sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: three events 29 min apart -> ONE session
        (0, t0, 1, "a", 1.0, None),
        (1, t0 + dt.timedelta(minutes=29), 1, "a", 2.0, None),
        (2, t0 + dt.timedelta(minutes=58), 1, "a", 3.0, None),
        # user 1: 31-min gap -> second session
        (3, t0 + dt.timedelta(minutes=89, seconds=1), 1, "a", 4.0, None),
        # user 2: exactly 30 min gap -> still one session (<= gap)
        (4, t0, 2, "a", 5.0, None),
        (5, t0 + dt.timedelta(minutes=30), 2, "a", 6.0, None),
        # user 3: null ts dropped
        (6, None, 3, "a", 7.0, None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    got = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["sum_value"])
        for r in sessionize(ev, gap_minutes=30.0).collect()
    }
    assert got == {
        (1, 1): (3, 6.0),
        (1, 2): (1, 4.0),
        (2, 1): (2, 11.0),
    }


def test_stream_sessions_match_batch_closed_set(spark, tmp_path):
    from recordlinker_spark.operators.sessions import (
        sessionize,
        sessionize_stream,
    )

    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev, _max_ts = _write_time_ordered_files(spark, events_dir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    q = (
        sessionize_stream(stream, gap_minutes=30.0)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive

    streamed = spark.read.parquet(out_dir)
    batch = sessionize(ev, gap_minutes=30.0)
    # expected = batch sessions minus each user's LAST (still open)
    w = Window.partitionBy("user_id")
    closed = batch.withColumn(
        "_max", F.max("session_seq").over(w)
    ).filter(F.col("session_seq") < F.col("_max")).drop("_max")

    n_closed = closed.count()
    assert n_closed > 0
    assert streamed.count() == n_closed
    j = (
        streamed.withColumnRenamed("n_events", "n_s")
        .withColumnRenamed("sum_value", "v_s")
        .withColumnRenamed("session_start", "ss_s")
        .withColumnRenamed("session_end", "se_s")
        .join(closed, ["user_id", "session_seq"])
    )
    assert j.count() == n_closed
    bad = j.filter(
        (F.col("n_s") != F.col("n_events"))
        | (F.col("ss_s") != F.col("session_start"))
        | (F.col("se_s") != F.col("session_end"))
        | (F.abs(F.col("v_s") - F.col("sum_value")) > 1e-5)
    )
    assert bad.count() == 0


def test_kernel_epochs_are_session_timezone_correct():
    """applyInPandasWithState hands the kernel NAIVE session-local
    datetimes; the kernel must localize to the session timezone before
    taking epochs, or every emitted session_start/end is shifted by the
    UTC offset whenever the session tz is not UTC."""
    import pandas as pd

    from recordlinker_spark.operators.sessions import _ts_to_micros

    # 2024-01-01T12:00:00Z rendered as New-York wall time is 07:00 naive
    s = pd.Series(pd.to_datetime(["2024-01-01 07:00:00"]))
    assert s.dt.tz is None
    (micros,) = _ts_to_micros(s, "America/New_York").tolist()
    assert micros == 1_704_110_400_000_000
    # UTC session: naive wall time IS the epoch time
    (micros_utc,) = _ts_to_micros(s, "UTC").tolist()
    assert micros_utc == 1_704_092_400_000_000
    # resolution-agnostic: a us-backed series gives the same answer
    try:
        s_us = s.astype("datetime64[us]")
    except TypeError:  # pandas < 2 has no sub-ns resolutions
        return
    (micros_us,) = _ts_to_micros(s_us, "America/New_York").tolist()
    assert micros_us == 1_704_110_400_000_000


def test_round6_matches_spark_half_up(spark):
    """The kernel's _round6 must reproduce F.round(x, 6) exactly —
    Python's builtin round() is half-to-even on the binary double and
    diverges on decimal half-points (0.0078125 -> 0.007812 vs Spark's
    0.007813)."""
    from recordlinker_spark.operators.sessions import _round6

    vals = [
        0.0078125, -0.0078125, 2.5e-7, -2.5e-7, 1.0000005, 0.1234565,
        123.4567895, 0.0, 1e-7, 9.9999995, 1234567.1234567, -0.9999995,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r["r"]
        for r in df.select(F.round(F.col("v"), 6).alias("r")).collect()
    ]
    assert got == [_round6(v) for v in vals]


def test_value_micros_matches_spark_expression(spark):
    """_value_micros must reproduce F.round(value * 1e6).cast('long')
    bit-for-bit — multiply in IEEE double first, then HALF_UP over the
    product's shortest decimal repr — since the streaming kernel's
    integer sums are asserted identical to the batch twin's."""
    from recordlinker_spark.operators.sessions import _value_micros

    vals = [
        0.1, 0.0078125, -0.0078125, 2.5e-7, -2.5e-7, 1.0000005,
        0.1234565, 123.456789, 0.0, 1e-7, 9.9999995, 1234.5678915,
        -0.9999995, 3.0000001, 7.25, 1e-8,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r["m"]
        for r in df.select(
            F.round(F.col("v") * 1_000_000).cast("long").alias("m")
        ).collect()
    ]
    assert got == [_value_micros(v) for v in vals]


def test_sessionize_sum_is_order_and_partition_invariant(spark):
    """The integer-micros sum must hash-match across shuffle-partition
    counts and input row orders — the exact degree of freedom that made
    the float-sum version nondeterministic between engines."""
    import datetime as dt
    import random

    from recordlinker_spark.operators.sessions import sessionize

    rng = random.Random(5)
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=i * 60), 1, "e",
         round(rng.uniform(0, 10), 6) if i % 7 else None, None)
        for i in range(500)
    ]
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    base = None
    for order, parts in [(rows, 1), (rows[::-1], 7), (rows[250:] + rows[:250], 32)]:
        ev = spark.createDataFrame(order, schema).repartition(parts)
        got = sorted(
            (r["user_id"], r["session_seq"], r["sum_value"].hex())
            for r in sessionize(ev, gap_minutes=30.0).collect()
        )
        if base is None:
            base = got
        assert got == base


def test_cross_batch_late_event_contract():
    """Contract: an event within gap of an already-EMITTED session's
    end raises (that session is sealed); events merely older than the
    OPEN session merge retroactively — directly, via an in-batch
    chain, or as a new earlier session with time-ordered ordinals."""
    import pandas as pd
    import pytest

    from recordlinker_spark.operators.sessions import _sessionize_group

    gap = 30 * 60_000_000
    T = 100_000_000_000  # open session start (us)
    PREV_END = T - 10 * gap  # last emitted session sealed long ago

    class _State:
        exists = True
        # (seq, start, end, n_events, sum_micros, prev_end)
        get = (3, T, T + 60_000_000, 2, 5_000_000, PREV_END)

        def update(self, v):
            self.val = v

    def batch(*offsets_us):
        return pd.DataFrame({
            "ts": pd.to_datetime([T + o for o in offsets_us], unit="us"),
            "value": pd.array([1.0] * len(offsets_us), dtype="float64"),
        })

    # 1. event within gap of the SEALED session's end -> raise
    with pytest.raises(ValueError, match="already-emitted"):
        list(_sessionize_group((7,), [batch(PREV_END - T + gap)], _State(), gap))

    # 2. in-batch chain: T-1.5gap and T-0.8gap each within gap of the
    #    next -> ALL merge into the open session (full-event semantics)
    st = _State()
    (out,) = _sessionize_group(
        (7,), [batch(-int(1.5 * gap), -int(0.8 * gap))], st, gap
    )
    assert len(out) == 0  # nothing closed; one big open session
    assert st.val[1] == T - int(1.5 * gap)  # extended start
    assert st.val[3] == 4  # 2 state events + 2 batch events

    # 3. an isolated earlier event (> gap from both the sealed end and
    #    the open start) closes as a NEW session with the next ordinal,
    #    BEFORE the still-open one
    st = _State()
    (out,) = _sessionize_group((7,), [batch(-3 * gap)], st, gap)
    assert len(out) == 1
    assert out.iloc[0]["session_seq"] == 3  # takes the stored ordinal
    st_seq, st_start = st.val[0], st.val[1]
    assert st_seq == 4 and st_start == T  # open session renumbered after
    assert st.val[5] == T - 3 * gap  # guard anchor advanced
