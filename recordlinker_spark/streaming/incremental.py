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

Exactly-once: foreachBatch is at-least-once, so idempotence is built
in two layers — (1) a replay whose records are ALL already in the MPI
is skipped outright (the batch fully committed before the crash); (2)
decisions land in a ``run_id=R/batch_id=N`` partition directory (R
derived from the checkpoint location, since batch ids restart at 0
per checkpoint) with overwrite,
so a replay that got past the guard replaces its own partial output
instead of appending a second copy.  The MPI store ignores duplicate
record_ids (parquet dedup on read; an Iceberg deployment uses MERGE
for true idempotence).
"""

from __future__ import annotations

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
        run_id: str = "0",
        **block_kwargs,
    ):
        self.spark = spark
        self.mpi_dir = mpi_dir
        self.decisions_dir = decisions_dir
        self.algorithm = algorithm
        # batch_id restarts at 0 for every new checkpoint location, so
        # the idempotent decision slot must be (run_id, batch_id) — the
        # caller derives run_id from the checkpoint dir
        self.run_id = run_id
        self.block_kwargs = block_kwargs

    def current_mpi(self) -> DataFrame:
        from pyspark.errors import AnalysisException

        # probe through Spark's reader, not os.path: the MPI store can
        # live on any Hadoop-compatible FS (hdfs://, s3a://), where a
        # driver-local isdir() would silently report "no data" and every
        # batch would link against an empty MPI
        try:
            return (
                self.spark.read.schema(MPI_SCHEMA)
                .parquet(self.mpi_dir)
                .dropDuplicates(["record_id"])
            )
        except AnalysisException as exc:
            get_cond = getattr(exc, "getCondition", None) or getattr(
                exc, "getErrorClass", lambda: None
            )  # getCondition supersedes getErrorClass (Spark 4)
            cond = get_cond() or ""
            if "PATH_NOT_FOUND" in cond or "Path does not exist" in str(exc):
                return self.spark.createDataFrame([], MPI_SCHEMA)
            raise

    def __call__(self, batch_docs: DataFrame, batch_id: int) -> None:
        if batch_docs.isEmpty():
            return
        records = parse_documents(batch_docs.select("doc_id", "spans"))
        mpi = self.current_mpi()
        # restart replay guard: foreachBatch is at-least-once — if every
        # record of this batch is already in the MPI, the batch fully
        # committed before a crash, so re-linking it (now against an MPI
        # containing its own records) would emit contradictory decisions
        if (
            batch_docs.select(F.col("doc_id").alias("record_id"))
            .join(mpi.select("record_id"), "record_id", "left_anti")
            .isEmpty()
        ):
            return
        out = link_batch(records, mpi, self.algorithm, **self.block_kwargs)
        # decisions land in a batch-scoped partition dir with overwrite:
        # a replay that got past the guard (crash between the two
        # writes) REPLACES its own partial output instead of appending a
        # second copy; readers see batch_id as a partition column
        out.decisions.write.mode("overwrite").parquet(
            f"{self.decisions_dir.rstrip('/')}"
            f"/run_id={self.run_id}/batch_id={batch_id}"
        )
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
    import hashlib

    run_id = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
    sink = IncrementalLinker(
        spark, mpi_dir, decisions_dir, algorithm, run_id=run_id, **block_kwargs
    )
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
