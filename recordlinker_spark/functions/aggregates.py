"""Engine-independent exact aggregation expressions.

Float sums are the classic cross-engine hash-mismatch source: the
result of ``sum(double)`` depends on partial-aggregation order, so a
Spark query and a SQL oracle (or two Spark runs with different
partitioning) can differ in the last ulp.  The convention used by the
windowed event aggregation, the sessionizer (batch, streaming, and
Python-kernel twins), and their DuckDB oracles is to sum in exact
integer microunits instead — associative, commutative, and identical
in every engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_micros_sum(col: str | Column) -> Column:
    """``coalesce(sum(round(col*1e6) as long), 0) / 1e6``.

    Exact for values with up to 6 decimal places (integer micros never
    lose precision in a long; sums are order-independent), NULLs skip,
    and an all-NULL group is 0.0 rather than NULL — one convention,
    shared by every Spark twin and mirrored literally in the DuckDB
    oracle SQL (``coalesce(sum(cast(round(value*1000000) as bigint)),
    0) / 1000000.0``).  The Python-kernel twin is
    ``operators.sessions._value_micros``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.coalesce(
            F.sum(F.round(c * 1_000_000).cast("long")),
            F.lit(0).cast("long"),
        )
        / F.lit(1_000_000.0)
    )
