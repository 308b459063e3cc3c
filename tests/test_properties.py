"""Cross-implementation property tests: distributed operators vs
trivially-correct driver-side references on seeded random inputs."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F


def test_connected_components_matches_union_find(spark):
    """large-star/small-star CC on a seeded random graph partitions
    nodes exactly like a driver-side union-find."""
    from recordlinker_spark.operators.cluster import connected_components

    rng = random.Random(1234)
    n_nodes, n_edges = 300, 260  # sparse -> many nontrivial components
    edges = [
        (f"n{rng.randrange(n_nodes):03d}", f"n{rng.randrange(n_nodes):03d}")
        for _ in range(n_edges)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    # driver-side union-find ground truth
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth: dict[str, str] = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["record_id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert set(got) == set(truth)
    # same partition AND the same canonical (min) label per component
    assert got == truth


def test_batch_sessionize_matches_python_reference(spark):
    """Window-algebra sessionization equals a pure-Python scan on a
    seeded random event stream (gap boundaries, sums, ordinals)."""
    from recordlinker_spark.operators.sessions import sessionize

    rng = random.Random(99)
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for user in range(12):
        t = t0 + dt.timedelta(minutes=rng.randrange(0, 600))
        for _ in range(rng.randrange(1, 25)):
            t = t + dt.timedelta(seconds=rng.randrange(1, 3600))
            rows.append((eid, t, user, "e", round(rng.uniform(0, 10), 3), None))
            eid += 1

    # pure-Python reference
    gap = 30 * 60
    expected: dict[tuple, tuple] = {}
    by_user: dict[int, list] = {}
    for _, ts, user, _, val, _ in rows:
        by_user.setdefault(user, []).append((ts, val))
    for user, evs in by_user.items():
        evs.sort()
        seq, cur = 0, []
        for ts, val in evs:
            if cur and (ts - cur[-1][0]).total_seconds() > gap:
                seq += 1
                expected[(user, seq)] = _summary(cur)
                cur = []
            cur.append((ts, val))
        expected[(user, seq + 1)] = _summary(cur)

    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    got = {
        (r["user_id"], r["session_seq"]): (
            r["session_start"], r["session_end"], r["n_events"], r["sum_value"]
        )
        for r in sessionize(ev, gap_minutes=30.0).collect()
    }
    # reference enumerates sessions 1..k in time order, same as the
    # engine's running-sum ordinal — compare keyed tuples exactly
    fixed = {}
    for (user, seq), v in expected.items():
        fixed[(user, seq)] = v
    assert got == fixed


def _summary(cur):
    import calendar

    from recordlinker_spark.operators.sessions import _value_micros

    start = int(calendar.timegm(cur[0][0].utctimetuple()))
    end = int(calendar.timegm(cur[-1][0].utctimetuple()))
    # exact-integer-micros convention, same as both sessionize twins
    micros = sum(_value_micros(v) for _, v in cur if v is not None)
    return (start, end, len(cur), micros / 1_000_000.0)
