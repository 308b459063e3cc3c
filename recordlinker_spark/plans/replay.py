"""Sequential replay: reference-exact record-at-a-time linkage.

The reference links records one at a time — each insert changes the MPI
that later records block against (link.py:184-381 + insert at
link.py:343-353).  Pure-batch linkage (linkjob.py) is order-independent
within a batch; to reproduce the reference's pytest scenarios *exactly*
(match vectors, cluster sizes, median feature scores — e.g.
tests/unit/linking/test_link.py:277-424) this plan replays the batch
engine with batch-size 1, accumulating the MPI between steps.

This is a correctness harness for small fixtures, not the scale path:
at 10^12 documents the engine runs linkjob.link_batch per partition of
arriving documents (micro-batch), and entity resolution across a whole
corpus bootstrap runs blocking+scoring once and clusters with
operators/cluster.py connected components.
"""

from __future__ import annotations

import dataclasses
import typing

from pyspark.sql import DataFrame, Row, SparkSession

from recordlinker_spark.config import Algorithm
from recordlinker_spark.operators.linkjob import link_batch
from recordlinker_spark.schemas import (
    EXTERNAL_PERSON_FIELDS,
    EXTERNAL_PERSON_SOURCE,
    PII_FIELDS,
    PII_SCHEMA,
    SPAN_TYPE,
)

import pyspark.sql.types as T

MPI_SCHEMA = T.StructType(
    PII_FIELDS
    + [
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
        T.StructField("person_id", T.StringType()),
    ]
    + EXTERNAL_PERSON_FIELDS
)


def mpi_projection(df: DataFrame) -> DataFrame:
    """Project ``df`` onto the MPI columns, defaulting the
    external-person metadata the reference persists on every insert
    (database/mpi_service.py:255-258): a missing ``external_person_id``
    column becomes NULL, and ``external_person_source`` is derived as
    the fixed "IRIS" label iff an identifier is present — matching the
    reference's invariant — unless the frame already carries a source
    column (rows read back from an MPI keep theirs)."""
    from pyspark.sql import functions as F

    if "external_person_id" not in df.columns:
        df = df.withColumn("external_person_id", F.lit(None).cast("string"))
    if "external_person_source" not in df.columns:
        df = df.withColumn(
            "external_person_source",
            F.when(
                F.col("external_person_id").isNotNull(),
                F.lit(EXTERNAL_PERSON_SOURCE),
            ),
        )
    # cast to the declared types: a caller-supplied external_person_id
    # typed e.g. INT64 in the source parquet would otherwise be written
    # verbatim and break every later MPI_SCHEMA read of the store
    return df.select(
        *[F.col(f.name).cast(f.dataType) for f in MPI_SCHEMA.fields]
    )


def attach_external_person_id(records: DataFrame, docs: DataFrame) -> DataFrame:
    """Batch analog of the link request's optional external_person_id
    (reference schemas/link.py:29-33): when the documents table carries
    the column, ride it along into the MPI insert.  Shared by the
    plain, --run-dir, and streaming link paths — the modes of the SAME
    logical job must not diverge (e.g. NULL external ids only under
    --run-dir or only via the stream).  Join at the MPI-append site,
    not upstream of the linking DAG: only the insert needs the column,
    and an upstream join would be recomputed in every blocking/scoring
    branch."""
    from pyspark.sql import functions as F

    if (
        "external_person_id" not in docs.columns
        or "external_person_id" in records.columns
    ):
        return records
    return records.join(
        docs.select(
            F.col("doc_id").alias("record_id"),
            "external_person_id",
        ),
        "record_id",
        "left",
    )


@dataclasses.dataclass
class ReplayStep:
    record_id: str
    final_grade: str
    person_id: str | None
    best_rms: float | None
    matching_pass_label: str | None
    results: list[Row]  # folded LinkResults incl. median feature columns


def replay_link(
    spark: SparkSession,
    records: DataFrame,
    algorithm: Algorithm,
    order: typing.Sequence[str] | None = None,
) -> tuple[list[ReplayStep], list[Row]]:
    """Link records one at a time in ``order`` (default: record_id order).

    :returns: (per-record decisions, final MPI rows incl. person_id).
    """
    import collections

    collected = records.collect()
    rows = {r["record_id"]: r for r in collected}
    if len(rows) != len(collected):
        # the dict would silently keep only the LAST row per id and the
        # harness would replay fewer records than supplied — parity
        # claims must not quietly cover partial data
        counts = collections.Counter(r["record_id"] for r in collected)
        dupes = sorted(rid for rid, n in counts.items() if n > 1)
        raise ValueError(f"duplicate record_ids in replay input: {dupes}")
    ordered = list(order) if order is not None else sorted(rows)

    mpi_rows: list[Row] = []
    steps: list[ReplayStep] = []
    for rid in ordered:
        incoming = spark.createDataFrame([rows[rid]], PII_SCHEMA)
        mpi = spark.createDataFrame(mpi_rows, MPI_SCHEMA)
        # with-block: replay calls link_batch once per record; the
        # exit releases this step's cached projections even when a
        # collect raises, so the block manager never accumulates
        # frames across steps
        with link_batch(incoming, mpi, algorithm) as out:
            decision = out.decisions.collect()[0]
            results = out.results.collect()
            steps.append(
                ReplayStep(
                    record_id=rid,
                    final_grade=decision["final_grade"],
                    person_id=decision["person_id"],
                    best_rms=decision["best_rms"],
                    matching_pass_label=decision["matching_pass_label"],
                    # person_id tiebreak: equal-rms results otherwise
                    # land in Spark task order, flipping results[0]
                    # across runs
                    results=sorted(
                        results, key=lambda r: (-r["rms"], r["person_id"] or "")
                    ),
                )
            )
            mpi_rows.extend(mpi_projection(out.new_patients).collect())
    return steps, mpi_rows
