"""Table I/O that targets either an Iceberg catalog table or parquet.

The north rule targets Iceberg tables; the reference's analog is its
transactional DB layer (reference: src/recordlinker/database/__init__.py
— SQLAlchemy sessions with commit/rollback).  On Spark the transactional
write is the DataFrameWriterV2 (``df.writeTo(table)``) against an
Iceberg catalog: ``append()`` is an atomic snapshot commit and
``createOrReplace()`` an atomic table swap — no rename dance, readers
always see a complete snapshot, and concurrent writers serialize via
optimistic retry.

This sandbox has no Iceberg jars, so the mode is behind a flag: a
:class:`TableTarget` built with ``catalog=True`` routes every write
through ``writeTo`` (unit-tested by asserting the generated writer
calls); built with ``catalog=False`` (default) it falls back to parquet
paths with the rename-swap pseudo-transaction in plans/jobs.py.
"""

from __future__ import annotations

import dataclasses

from pyspark.sql import DataFrame, SparkSession


def _is_table_exists(exc: Exception) -> bool:
    """TABLE_OR_VIEW_ALREADY_EXISTS classification (same pattern as
    errors.is_missing_table)."""
    cond = getattr(exc, "getCondition", None) or getattr(
        exc, "getErrorClass", None
    )
    if cond is not None:
        try:
            name = cond()
        except Exception:
            name = None
        if name:
            return "ALREADY_EXISTS" in name
    return "already exists" in str(exc).lower()


@dataclasses.dataclass(frozen=True)
class TableTarget:
    """One logical table: an Iceberg identifier or a parquet path.

    :param ident: ``catalog.db.table`` (catalog mode) or a filesystem /
        object-store path (parquet mode).
    :param catalog: route through DataFrameWriterV2 (Iceberg) when True.
    """

    ident: str
    catalog: bool = False

    def read(self, spark: SparkSession, schema=None) -> DataFrame:
        if self.catalog:
            return spark.table(self.ident)
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(self.ident)

    def append(self, df: DataFrame) -> None:
        """Atomic append: Iceberg snapshot commit, or parquet append
        (atomic only at file granularity — the documented fallback).

        First-run bootstrap: ``DataFrameWriterV2.append`` requires an
        existing table, so a not-found error falls back to an atomic
        ``create()`` — without this the catalog path could never create
        the MPI table the read side treats as 'empty MPI, first run'."""
        if self.catalog:
            from pyspark.errors import AnalysisException

            from recordlinker_spark.errors import is_missing_table

            try:
                df.writeTo(self.ident).append()
            except AnalysisException as exc:
                if not is_missing_table(exc):
                    raise
                try:
                    df.writeTo(self.ident).using("iceberg").create()
                except AnalysisException as create_exc:
                    # bootstrap race: a concurrent writer created the
                    # table between our failed append and the create —
                    # the append is valid NOW, so retry it once instead
                    # of failing a first-run batch on table-exists
                    if not _is_table_exists(create_exc):
                        raise
                    df.writeTo(self.ident).append()
        else:
            df.write.mode("append").parquet(self.ident)

    def overwrite(self, df: DataFrame) -> None:
        """Atomic full replace: Iceberg ``createOrReplace`` (one
        metadata swap), or the parquet rename-swap the caller provides
        via :func:`plans.jobs._rewrite_mpi` — parquet callers should
        prefer that helper; this method exists so catalog-mode callers
        need no branching."""
        if self.catalog:
            df.writeTo(self.ident).using("iceberg").createOrReplace()
        else:
            from recordlinker_spark.plans.jobs import _rewrite_mpi

            _rewrite_mpi(df, self.ident)

    @staticmethod
    def _describe_shows_partitioning(rows) -> bool:
        """Parse DESCRIBE TABLE output for a real partition field.

        Only rows INSIDE a ``# Partition...`` section count ("#
        Partitioning" for Iceberg/v2 tables, "# Partition Information"
        for v1) — a data COLUMN whose name merely contains "Partition"
        sits above any section header and must not satisfy the guard.
        Iceberg renders unpartitioned tables as an explicit "Not
        partitioned" row; v1 nests a "# col_name" subheader before the
        field rows; any other "#" header ends the section."""
        in_section = False
        for r in rows:
            name = (r["col_name"] or "").strip()
            if name.startswith("# Partition"):
                in_section = True
                continue
            if not in_section or not name:
                continue
            if name.startswith("#"):
                if name.lower().startswith("# col_name"):
                    continue
                in_section = False  # next section (e.g. # Detailed Table…)
                continue
            if name.lower() == "not partitioned":
                return False
            return True  # a real partition-field row
        return False

    def overwrite_partitions(self, df: DataFrame, partition_by: list[str] | None = None) -> None:
        """Dynamic partition overwrite — the idempotent re-run
        primitive for checkpointed stages (replaces only the partitions
        present in ``df``).

        Iceberg mode derives the partition spec from the table — but an
        UNPARTITIONED table (e.g. one bootstrap-created by
        :meth:`append`) makes ``overwritePartitions`` swap the whole
        table, the same silent hazard the parquet branch raises for.
        Symmetric guard: catalog mode verifies the table is partitioned
        (via ``DESCRIBE TABLE``) before the dynamic overwrite; the
        parquet fallback requires explicit ``partition_by`` columns."""
        if self.catalog:
            spark = df.sparkSession
            from recordlinker_spark.errors import is_missing_table

            try:
                rows = spark.sql(f"DESCRIBE TABLE {self.ident}").collect()
                partitioned = self._describe_shows_partitioning(rows)
            except Exception as exc:
                # ONLY a genuinely-missing table bypasses the guard
                # (first run: the write itself surfaces the real
                # error).  Any other DESCRIBE failure propagates — a
                # broad pass-through would let a permissions blip or
                # catalog hiccup skip straight to the whole-table swap
                # this guard exists to prevent.
                if not is_missing_table(exc):
                    raise
                partitioned = True
            if not partitioned:
                raise ValueError(
                    f"overwrite_partitions on unpartitioned table "
                    f"{self.ident!r} would silently replace the entire "
                    "table; partition it (ALTER TABLE ... ADD PARTITION "
                    "FIELD) or use overwrite()"
                )
            df.writeTo(self.ident).overwritePartitions()
        else:
            if not partition_by:
                raise ValueError(
                    "overwrite_partitions on a parquet target requires "
                    "partition_by columns (an unpartitioned dynamic "
                    "overwrite would replace the entire path)"
                )
            df.write.mode("overwrite").option(
                "partitionOverwriteMode", "dynamic"
            ).partitionBy(*partition_by).parquet(self.ident)
