"""Per-user event sessionization — batch twin + custom stateful
streaming operator (``applyInPandasWithState``).

A *session* is a maximal run of one user's events where consecutive
events are separated by at most ``gap``.  The batch form is pure
window algebra (lag -> gap flag -> running sum -> groupBy) and has a
DuckDB oracle; the streaming form is the pattern the engine needs for
a LIVE event feed, where no built-in aggregation expresses "emit a row
when a user goes quiet": per-group state via
``applyInPandasWithState`` holding each user's open session across
micro-batches and emitting sessions as they CLOSE (a newer event
arrives more than ``gap`` later).

Scale notes (batch): one shuffle keyed user_id for the window; the
session groupBy reuses that partitioning (no second exchange), and the
running-sum window is bounded by per-user event counts — the same
skew profile as any per-user analysis.  Streaming: state is one small
struct per user (open-session event arrays), hash-partitioned by user
across executors; per-batch work is a vectorized pandas pass over that
user's new rows.  Arrival order ACROSS micro-batches must be
non-decreasing per user (the file/Kafka-partition-time norm); rows
within a batch may be arbitrarily ordered (sorted in the kernel), and
a batch row older than the open session's end merges into it
retroactively — state + batch are re-sorted together, so the kernel is
order-insensitive within the gap horizon.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_seq", LongType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

#: open-session state per user: next session ordinal + the open
#: session's event times (epoch micros) and values
_STATE_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("ts_us", ArrayType(LongType())),
        StructField("vals", ArrayType(DoubleType())),
    ]
)


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Batch sessionization: ``user_id, session_seq, session_start,
    session_end, n_events, sum_value`` (epochs floored to seconds, sums
    rounded to 6 — the oracle-comparison convention).

    lag -> new-session flag -> running sum = session ordinal, then one
    groupBy; ties broken by event_id so the plan is deterministic."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap_us = int(gap_minutes * 60 * 1_000_000)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    new_s = F.when(
        prev_us.isNull() | (us - prev_us > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = (
        events.filter(F.col(ts_col).isNotNull())
        .withColumn("_new", new_s)
        .withColumn("session_seq", F.sum("_new").over(run))
    )
    return (
        tagged.groupBy(F.col(user_col).alias("user_id"), "session_seq")
        .agg(
            F.min(F.unix_timestamp(F.col(ts_col).cast("timestamp"))).alias(
                "session_start"
            ),
            F.max(F.unix_timestamp(F.col(ts_col).cast("timestamp"))).alias(
                "session_end"
            ),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            "session_seq",
            "session_start",
            "session_end",
            "n_events",
            "sum_value",
        )
    )


def _ts_to_micros(s: pd.Series, tz: str) -> "pd.api.extensions.ExtensionArray":
    """Timestamp series -> epoch microseconds.  applyInPandasWithState
    hands the kernel NAIVE datetimes in the SESSION timezone, so the
    wall time must be localized to ``tz`` before taking the epoch (a
    naive-as-UTC read shifts every epoch by the UTC offset whenever
    ``spark.sql.session.timeZone`` is not UTC).  Resolution-agnostic:
    works for ns- and us-backed datetime64 alike."""
    idx = pd.DatetimeIndex(pd.to_datetime(s))
    if idx.tz is None:
        idx = idx.tz_localize(tz, ambiguous=True, nonexistent="shift_forward")
    idx = idx.tz_convert("UTC")
    try:
        return idx.as_unit("us").asi8
    except AttributeError:  # pandas < 2: always ns-backed
        return idx.asi8 // 1000


def _sessionize_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: Any,
    gap_us: int,
    tz: str = "UTC",
) -> Iterator[pd.DataFrame]:
    """Stateful kernel: merge the user's open session with this batch's
    rows, emit every session that closed, keep the last one open."""
    rows: list[tuple[int, float]] = []
    next_seq = 1
    if state.exists:
        seq0, ts_us, vals = state.get
        next_seq = seq0
        rows.extend(zip(ts_us, vals))
    for pdf in pdfs:
        ts = _ts_to_micros(pdf["ts"], tz)
        rows.extend(zip(ts.tolist(), pdf["value"].astype(float).tolist()))
    cols = [f.name for f in SESSION_SCHEMA.fields]
    if not rows:
        yield pd.DataFrame(columns=cols)
        return
    rows.sort(key=lambda r: r[0])
    sessions: list[list[tuple[int, float]]] = [[rows[0]]]
    for r in rows[1:]:
        if r[0] - sessions[-1][-1][0] > gap_us:
            sessions.append([r])
        else:
            sessions[-1].append(r)
    uid = key[0]
    out = []
    for s in sessions[:-1]:  # every session but the last has closed
        # NULL event values arrive as NaN through astype(float); the
        # batch twin's F.sum skips NULLs (all-NULL -> NULL), so the
        # kernel must do the same or the twins diverge on the first
        # null value (NaN would otherwise poison the whole sum).
        # Known limit: Arrow hands the kernel float64 ndarrays, which
        # fold SQL NULL and a literal double NaN into the same NaN —
        # the kernel treats both as NULL, while the batch twin's F.sum
        # propagates a literal NaN.  Distinguishing them would need a
        # sidecar isnull column; not worth it for a sentinel value no
        # event source emits deliberately.
        vals = [v for _, v in s if not math.isnan(v)]
        out.append(
            (
                uid,
                next_seq,
                s[0][0] // 1_000_000,
                s[-1][0] // 1_000_000,
                len(s),
                round(sum(vals), 6) if vals else None,
            )
        )
        next_seq += 1
    open_s = sessions[-1]
    state.update(
        (next_seq, [t for t, _ in open_s], [v for _, v in open_s])
    )
    yield pd.DataFrame(out, columns=cols)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Streaming sessionization over a streaming events frame: emits a
    row per CLOSED session (append semantics); each user's open session
    lives in the state store until a later event closes it.

    Uses ``applyInPandasWithState`` — the custom-stateful-operator
    escape hatch for semantics no built-in streaming aggregation
    expresses.  NoTimeout: a session closes only on evidence (a later
    event beyond the gap), never on wall-clock, so replaying the same
    input from checkpoint yields the same output."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_minutes * 60 * 1_000_000)
    ev = events.filter(F.col("ts").isNotNull())
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")

    def fn(key, pdfs, state):
        yield from _sessionize_group(key, pdfs, state, gap_us, tz)

    return ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
