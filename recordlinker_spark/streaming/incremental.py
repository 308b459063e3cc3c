"""Structured-Streaming ingestion: incremental linkage via foreachBatch.

The reference is request/response — each POST /link sees the MPI as
left by all prior requests (SURVEY §2.9/§3.1).  The streaming analog
is micro-batch linkage: a ``readStream`` of span documents, each
micro-batch linked against the current MPI with the SAME batch
operators (operators/linkjob.py), and the decided records appended to
the MPI store before the next batch — exactly the reference's
sequential semantics at batch granularity.

``foreachBatch`` (not stateful operators) is the right tool: the MPI
is a table, not stream state — it must be queryable/seedable/mergeable
outside the stream (person CRUD, S3/S7), and blocking needs full
joins against it.  applyInPandasWithState would trap the MPI in one
stream's state store.

Exactly-once: the micro-batch writes (patients append + decisions
append) key on ``(batch_id, record_id)``; on restart Spark replays the
last uncommitted batch and the append is idempotent because the
decision is a deterministic function of (records, MPI-at-batch-start)
and the MPI store ignores duplicate record_ids (parquet dedup on read;
an Iceberg deployment uses MERGE for true idempotence).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recordlinker_spark.config import Algorithm
from recordlinker_spark.operators.linkjob import link_batch
from recordlinker_spark.plans.replay import MPI_SCHEMA
from recordlinker_spark.sources.ingest import parse_documents


class IncrementalLinker:
    """foreachBatch sink: link each micro-batch against the MPI store."""

    def __init__(
        self,
        spark: SparkSession,
        mpi_dir: str,
        decisions_dir: str,
        algorithm: Algorithm,
        **block_kwargs,
    ):
        self.spark = spark
        self.mpi_dir = mpi_dir
        self.decisions_dir = decisions_dir
        self.algorithm = algorithm
        self.block_kwargs = block_kwargs

    def current_mpi(self) -> DataFrame:
        has_data = os.path.isdir(self.mpi_dir) and any(
            n.endswith(".parquet") for n in os.listdir(self.mpi_dir)
        )
        if has_data:
            return (
                self.spark.read.schema(MPI_SCHEMA)
                .parquet(self.mpi_dir)
                .dropDuplicates(["record_id"])
            )
        return self.spark.createDataFrame([], MPI_SCHEMA)

    def __call__(self, batch_docs: DataFrame, batch_id: int) -> None:
        if batch_docs.isEmpty():
            return
        records = parse_documents(batch_docs.select("doc_id", "spans"))
        out = link_batch(records, self.current_mpi(), self.algorithm, **self.block_kwargs)
        # order matters for restart idempotence: decisions first (audit),
        # then the patients append that changes future batches
        out.decisions.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(self.decisions_dir)
        out.new_patients.select(*[f.name for f in MPI_SCHEMA.fields]).write.mode(
            "append"
        ).parquet(self.mpi_dir)


def link_stream(
    spark: SparkSession,
    source_dir: str,
    mpi_dir: str,
    decisions_dir: str,
    checkpoint_dir: str,
    algorithm: Algorithm,
    max_files_per_trigger: int = 1,
    **block_kwargs,
):
    """File-source stream of span documents -> incremental linkage.

    Returns the started StreamingQuery (caller awaits/stops)."""
    from recordlinker_spark.schemas import DOCUMENTS_SCHEMA

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    sink = IncrementalLinker(spark, mpi_dir, decisions_dir, algorithm, **block_kwargs)
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
