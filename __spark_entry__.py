"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship batch-link pipeline end-to-end at
sf0.001 — span-encoded documents built from the customer table, parsed
by sources/ingest.py, linked by operators/linkjob.py — and returns the
per-record decisions.

``queries()`` / ``oracle_sql()`` expose each implemented operator from
SURVEY.md §2 (and the training-data extensions) paired with a DuckDB
oracle; see recordlinker_spark/plans/demo.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: span documents -> ingest -> batch link -> decisions."""
    from recordlinker_spark.plans.demo import (
        INC_WHERE,
        demo_algorithm,
        derivation_sql,
    )
    from recordlinker_spark.operators.linkjob import link_batch
    from recordlinker_spark.sources.ingest import parse_documents

    sf_dir = "/root/testdata/sf0.001"
    spark.read.parquet(f"{sf_dir}/customer.parquet").createOrReplaceTempView(
        "customer"
    )
    flat = spark.sql(derivation_sql("spark"))
    # encode each derived record as an interleaved span document
    # (text spans + one media span) to exercise the full ingest path
    docs = flat.select(
        F.col("record_id").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("birth_date").alias("kind"),
                F.col("bd").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("media").alias("kind"),
                F.lit("").alias("text"),
                F.concat(F.lit("media://img/"), F.col("record_id")).alias("media_ref"),
                F.lit(1).alias("offset"),
            ),
            F.struct(
                F.lit("sex").alias("kind"),
                F.col("sex").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(2).alias("offset"),
            ),
            F.struct(
                F.lit("name[0].given").alias("kind"),
                F.col("first").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(3).alias("offset"),
            ),
            F.struct(
                F.lit("name[0].family").alias("kind"),
                F.col("last").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(4).alias("offset"),
            ),
        ).alias("spans"),
    )
    records = parse_documents(docs)
    incoming = records.filter(F.expr(INC_WHERE))
    mpi = records.join(
        flat.select("record_id", "person_id"), "record_id"
    )
    out = link_batch(incoming, mpi, demo_algorithm())
    return out.decisions


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from recordlinker_spark.plans.demo import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from recordlinker_spark.plans.demo import oracle_queries

    return oracle_queries()
