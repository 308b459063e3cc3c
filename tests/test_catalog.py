"""TableTarget: Iceberg writeTo routing (asserted via recorded writer
calls — no Iceberg jars in this sandbox) + parquet fallback."""

import pytest

from recordlinker_spark.sinks.catalog import TableTarget


class _WriterSpy:
    def __init__(self, calls, table):
        self.calls = calls
        self.table = table

    def using(self, fmt):
        self.calls.append(("using", self.table, fmt))
        return self

    def append(self):
        self.calls.append(("append", self.table))

    def createOrReplace(self):
        self.calls.append(("createOrReplace", self.table))

    def overwritePartitions(self):
        self.calls.append(("overwritePartitions", self.table))


@pytest.fixture
def writeto_spy(spark, monkeypatch):
    # patch the concrete runtime class: pyspark 4's classic DataFrame
    # overrides the pyspark.sql.DataFrame base's writeTo
    calls = []
    cls = type(spark.range(1))
    monkeypatch.setattr(
        cls, "writeTo", lambda self, table: _WriterSpy(calls, table), raising=True
    )
    return calls


def test_catalog_append_routes_through_writeto(spark, writeto_spy):
    df = spark.range(3)
    TableTarget("cat.db.mpi", catalog=True).append(df)
    assert writeto_spy == [("append", "cat.db.mpi")]


def test_catalog_overwrite_is_one_atomic_swap(spark, writeto_spy):
    df = spark.range(3)
    TableTarget("cat.db.mpi", catalog=True).overwrite(df)
    assert writeto_spy == [
        ("using", "cat.db.mpi", "iceberg"),
        ("createOrReplace", "cat.db.mpi"),
    ]


def _stub_describe(spark, monkeypatch, col_names):
    """Route DESCRIBE TABLE to canned rows (no Iceberg catalog in this
    sandbox); other SQL passes through."""
    class _Desc:
        def __init__(self, rows):
            self._rows = rows

        def collect(self):
            return self._rows

    real_sql = type(spark).sql

    def fake_sql(self, q, *a, **kw):
        if q.strip().upper().startswith("DESCRIBE TABLE"):
            return _Desc([{"col_name": n} for n in col_names])
        return real_sql(self, q, *a, **kw)

    monkeypatch.setattr(type(spark), "sql", fake_sql, raising=True)


def test_catalog_overwrite_partitions(spark, writeto_spy, monkeypatch):
    df = spark.range(3)
    _stub_describe(spark, monkeypatch,
                   ["id", "", "# Partitioning", "Part 0"])
    TableTarget("cat.db.stage", catalog=True).overwrite_partitions(df)
    assert writeto_spy == [("overwritePartitions", "cat.db.stage")]


def test_catalog_overwrite_partitions_unpartitioned_refused(
    spark, writeto_spy, monkeypatch
):
    """Iceberg's 'Not partitioned' DESCRIBE row must refuse the dynamic
    overwrite — on an unpartitioned table it swaps the WHOLE table."""
    df = spark.range(3)
    _stub_describe(spark, monkeypatch,
                   ["id", "", "# Partitioning", "Not partitioned"])
    with pytest.raises(ValueError, match="unpartitioned"):
        TableTarget("cat.db.stage", catalog=True).overwrite_partitions(df)
    assert writeto_spy == []


def test_catalog_overwrite_partitions_missing_table_passes_through(
    spark, writeto_spy, monkeypatch
):
    """A TABLE_OR_VIEW_NOT_FOUND DESCRIBE (first run) defers to the
    write itself for the real error."""
    real_sql = type(spark).sql

    def fake_sql(self, q, *a, **kw):
        if q.strip().upper().startswith("DESCRIBE TABLE"):
            raise Exception("[TABLE_OR_VIEW_NOT_FOUND] no such table")
        return real_sql(self, q, *a, **kw)

    monkeypatch.setattr(type(spark), "sql", fake_sql, raising=True)
    TableTarget("cat.db.stage", catalog=True).overwrite_partitions(
        spark.range(3)
    )
    assert writeto_spy == [("overwritePartitions", "cat.db.stage")]


def test_parquet_fallback_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    target = TableTarget(path, catalog=False)
    target.append(spark.range(3).toDF("id"))
    target.append(spark.range(3, 5).toDF("id"))
    assert target.read(spark).count() == 5
    # overwrite routes through the rename-swap replace
    target.overwrite(spark.range(2).toDF("id"))
    assert target.read(spark).count() == 2


def test_jobs_catalog_mode_uses_writeto(spark, tmp_path, writeto_spy, monkeypatch):
    """job_seed with --catalog appends via writeTo, never parquet."""
    from recordlinker_spark.plans import jobs
    from recordlinker_spark.schemas import DOCUMENTS_SCHEMA
    from recordlinker_spark.sources.spandoc import docs_to_rows

    import sys

    sys.path.insert(0, "tests")
    from fixtures_patients import SIX_PATIENTS

    docs_dir = str(tmp_path / "docs")
    labels_dir = str(tmp_path / "labels")
    spark.createDataFrame(
        docs_to_rows([("r0", SIX_PATIENTS[0], [])]), DOCUMENTS_SCHEMA
    ).write.parquet(docs_dir)
    spark.createDataFrame(
        [("r0", "p0")], "record_id string, person_id string"
    ).write.parquet(labels_dir)

    class A:
        documents = docs_dir
        labels = labels_dir
        mpi = "cat.db.mpi"
        catalog = True

    jobs.job_seed(spark, A())
    assert writeto_spy == [("append", "cat.db.mpi")]


def test_describe_partitioning_parser():
    """The unpartitioned-table guard must read the # Partition...
    SECTION, not substring-match 'Partition' anywhere: a data column
    named 'PartitionKey' is not partitioning, Iceberg's explicit 'Not
    partitioned' row means unpartitioned, and v1's '# col_name'
    subheader must be skipped."""
    class _DescRow(dict):
        def __init__(self, name):
            super().__init__(col_name=name)

    f = TableTarget._describe_shows_partitioning

    # data column containing 'Partition', no section -> unpartitioned
    assert not f([_DescRow("id"), _DescRow("PartitionKey")])
    # Iceberg v2: explicit Not partitioned
    assert not f([_DescRow("id"), _DescRow(""),
                  _DescRow("# Partitioning"), _DescRow("Not partitioned")])
    # Iceberg v2: real partition field
    assert f([_DescRow("id"), _DescRow(""),
              _DescRow("# Partitioning"), _DescRow("Part 0")])
    # v1: subheader then field row
    assert f([_DescRow("id"), _DescRow(""),
              _DescRow("# Partition Information"),
              _DescRow("# col_name"), _DescRow("ds")])
    # section ends at the next header; Detailed Table rows don't count
    assert not f([_DescRow("id"), _DescRow(""),
                  _DescRow("# Partitioning"), _DescRow("Not partitioned"),
                  _DescRow(""), _DescRow("# Detailed Table Information"),
                  _DescRow("Name")])
    # empty describe -> not partitioned (guard refuses, write can't swap)
    assert not f([])


def test_overwrite_partitions_unreadable_catalog_raises(spark, writeto_spy, monkeypatch):
    """A DESCRIBE failure that is NOT table-missing must propagate —
    the old broad except treated any failure as 'partitioned' and let
    the whole-table swap through."""
    class _Boom(Exception):
        pass

    def boom(q):
        raise _Boom("permission denied listing catalog")

    monkeypatch.setattr(type(spark), "sql", lambda self, q: boom(q), raising=True)
    with pytest.raises(_Boom):
        TableTarget("cat.db.stage", catalog=True).overwrite_partitions(
            spark.range(3)
        )
    assert writeto_spy == []  # the guard fired before any write
