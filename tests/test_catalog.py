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


def test_catalog_overwrite_partitions(spark, writeto_spy):
    df = spark.range(3)
    TableTarget("cat.db.stage", catalog=True).overwrite_partitions(df)
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
