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
skew profile as any per-user analysis.  Streaming: state is one FIXED
SIZE struct per user (seq + the open session's interval and running
aggregates — NOT its events, so a never-quiet user costs O(1) state
no matter how long its session runs), hash-partitioned by user across
executors; per-batch work is a vectorized pandas pass over that
user's new rows.  Arrival order ACROSS micro-batches must be
non-decreasing per user (the file/Kafka-partition-time norm); rows
within a batch may be arbitrarily ordered, and a batch row older than
the open session's end merges into it retroactively — adding events
can only extend or fill a session, never split it, so interval-merge
over (state ∪ batch) reproduces the full-event-list semantics with
scalar state.  Late events older than the open session merge into it
retroactively or close as new earlier sessions with correctly
time-ordered ordinals; what CANNOT be honored is an event within
``gap`` of an already-EMITTED session's end (it would have merged
into a session that is sealed), so the kernel carries that end in
state and RAISES on such events instead of silently emitting
duplicate/overlapping sessions.

Schema columns are fixed (``user_id, ts, value`` + ``event_id``
tiebreak in the batch window) — rename upstream with ``select`` if
your frame differs.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from recordlinker_spark.functions.aggregates import exact_micros_sum

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

#: open-session state per user — FIXED width: next session ordinal,
#: the open session's interval and running aggregates, and the end of
#: the most recently EMITTED (sealed) session, which anchors the
#: out-of-order guard.  (A previous layout stored the open session's
#: full event arrays; a never-quiet user grew it without bound.
#: Resuming a checkpoint written by that layout — or by the pre-r5
#: double-sum / n_nonnull layouts — fails loudly on the state-schema
#: mismatch — wipe and reprocess.)
_STATE_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_micros", LongType()),
        StructField("prev_end_us", LongType()),
    ]
)


def sessionize(events: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """Batch sessionization: ``user_id, session_seq, session_start,
    session_end, n_events, sum_value`` (epochs floored to seconds).

    ``sum_value`` is computed in EXACT integer microunits —
    ``sum(round(value*1e6) as long) / 1e6`` — so the result is
    bit-identical regardless of aggregation order, engine, or
    partitioning (float partial-sum order was the last
    nondeterminism); an all-NULL-value session emits 0.0, never NULL
    (NULL would round-trip as NaN through Arrow and break
    hash-equality with a SQL oracle).  The streaming kernel and the
    DuckDB oracle follow the identical convention.

    lag -> new-session flag -> running sum = session ordinal, then one
    groupBy; ties broken by event_id so the plan is deterministic."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = int(gap_minutes * 60 * 1_000_000)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    new_s = F.when(
        prev_us.isNull() | (us - prev_us > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = (
        events.filter(F.col("ts").isNotNull())
        .withColumn("_new", new_s)
        .withColumn("session_seq", F.sum("_new").over(run))
    )
    return (
        tagged.groupBy("user_id", "session_seq")
        .agg(
            F.min(F.unix_timestamp(F.col("ts").cast("timestamp"))).alias(
                "session_start"
            ),
            F.max(F.unix_timestamp(F.col("ts").cast("timestamp"))).alias(
                "session_end"
            ),
            F.count(F.lit(1)).alias("n_events"),
            exact_micros_sum("value").alias("sum_value"),
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


def _round6(v: float) -> float:
    """Spark-parity rounding: ``F.round(x, 6)`` is HALF_UP over the
    double's shortest decimal representation (java BigDecimal.valueOf
    + setScale).  Python's builtin ``round`` is half-to-even on the
    BINARY value, which diverges on decimal half-points — e.g.
    round(0.0078125, 6) = 0.007812 but F.round gives 0.007813.
    Production sums now go through exact ``_value_micros`` longs; this
    stays as the documented/tested model of F.round's rounding mode
    (test_sessions.test_round6_matches_spark_half_up) on which
    ``_value_micros`` relies."""
    return float(
        Decimal(repr(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def _value_micros(v: float) -> int:
    """Python twin of the batch twin's ``F.round(value * 1e6)
    .cast("long")``: multiply in IEEE double FIRST (matching Spark's
    expression tree — the product, not the operand, is what gets
    rounded), then HALF_UP over the product's shortest decimal
    representation (java BigDecimal.valueOf + setScale(0,
    HALF_UP)).  Summing these longs is exact, so the stream/batch
    twins and the SQL oracle agree bit-for-bit in any order."""
    return int(
        Decimal(repr(v * 1_000_000.0)).quantize(
            Decimal("1"), rounding=ROUND_HALF_UP
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
    """Stateful kernel: interval-merge the user's open session with this
    batch's rows, emit every session that closed, keep the last open.

    Each session is a segment ``[start, end, n_events, sum_micros]``;
    batch events are unit segments; merging segments
    whose start is within ``gap_us`` of the running end is exactly the
    full-event-list split (events can extend or fill a session, never
    split one), with O(1) state per user.  Sums are EXACT integer
    microunits (``_value_micros``) so partial-merge order cannot
    perturb the result."""
    # segments: [start_us, end_us, n_events, sum_micros]
    segs: list[list] = []
    next_seq = 1
    prev_end_us: int | None = None
    if state.exists:
        seq0, start_us, end_us, n_ev, sv, pe = state.get
        next_seq = seq0
        prev_end_us = pe
        segs.append([start_us, end_us, n_ev, sv or 0])
    for pdf in pdfs:
        ts = _ts_to_micros(pdf["ts"], tz)
        # cross-batch order contract, enforced against the last EMITTED
        # session's end (carried in state): an event within ``gap`` of
        # a sealed session would have merged into it (or bridged it
        # with the open one) under full-event-list semantics, but that
        # session is already emitted — silently sessionizing the event
        # would yield duplicate/overlapping sessions.  Fail loudly (the
        # upstream fix is watermarking or per-user-ordered sources).
        # Events merely older than the OPEN session are fine: they
        # merge into it retroactively or form new earlier sessions,
        # which close with correctly time-ordered ordinals below.
        if prev_end_us is not None and len(ts) > 0:
            batch_min = int(ts.min())
            if batch_min <= prev_end_us + gap_us:
                raise ValueError(
                    f"out-of-order event for user {key[0]}: batch ts "
                    f"{batch_min}us falls within {gap_us}us of an "
                    f"already-emitted session ending {prev_end_us}us "
                    "— that session is sealed; feed per-user "
                    "time-ordered batches (e.g. a watermarked, "
                    "ordered source)"
                )
        # NULL event values arrive as NaN through astype(float); the
        # batch twin's F.sum skips NULLs (contributing 0 micros, and
        # an all-NULL session coalesces to 0.0), so the kernel must do
        # the same or the twins diverge on the first null value (NaN
        # would otherwise poison the whole sum).
        # Known limit: Arrow hands the kernel float64 ndarrays, which
        # fold SQL NULL and a literal double NaN into the same NaN —
        # the kernel treats both as NULL.  The batch twin's
        # round(NaN*1e6).cast(long) folds a literal NaN to 0 micros
        # too (non-ANSI; ANSI errors instead), so the twins agree for
        # a sentinel value no event source emits deliberately.
        for t, v in zip(ts.tolist(), pdf["value"].astype(float).tolist()):
            nn = 0 if math.isnan(v) else 1
            segs.append([t, t, 1, _value_micros(v) if nn else 0])
    cols = [f.name for f in SESSION_SCHEMA.fields]
    if not segs:
        yield pd.DataFrame(columns=cols)
        return
    segs.sort(key=lambda s: (s[0], s[1]))
    merged: list[list] = [segs[0]]
    for s in segs[1:]:
        cur = merged[-1]
        if s[0] - cur[1] <= gap_us:
            cur[1] = max(cur[1], s[1])
            cur[2] += s[2]
            cur[3] += s[3]
        else:
            merged.append(s)
    uid = key[0]
    out = []
    for s in merged[:-1]:  # every session but the last has closed
        out.append(
            (
                uid,
                next_seq,
                s[0] // 1_000_000,
                s[1] // 1_000_000,
                s[2],
                s[3] / 1_000_000.0,
            )
        )
        next_seq += 1
    o = merged[-1]
    # the guard anchor advances to the newest sealed end: this call's
    # last emitted session if any closed, else the prior anchor
    new_prev_end = merged[-2][1] if len(merged) > 1 else prev_end_us
    state.update((next_seq, o[0], o[1], o[2], o[3], new_prev_end))
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
