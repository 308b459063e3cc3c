"""Plan-shape regression guards: the properties BENCH/PLANS.md audits,
asserted so they can't silently rot.

* The scoring path's only Python is Arrow-batched (`ArrowEvalPython`)
  — a change that introduces a row-at-a-time UDF (`BatchEvalPython`)
  is a 10-100x scale regression and must fail loudly.
* The blocking join builds candidate pairs without a cartesian
  product at any size.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def linked(spark):
    from recordlinker_spark.operators.linkjob import link_batch
    from recordlinker_spark.plans.demo import demo_algorithm
    from recordlinker_spark.sources.ingest import parse_documents
    from recordlinker_spark.synth import synth_documents

    docs = synth_documents(spark, 80, seed=5)
    recs = parse_documents(docs.select("doc_id", "spans"))
    labels = docs.select(F.col("doc_id").alias("record_id"), "person_key")
    firsts = labels.groupBy("person_key").agg(
        F.min("record_id").alias("record_id")
    )
    mpi = recs.join(
        firsts.withColumnRenamed("person_key", "person_id"), "record_id"
    )
    incoming = recs.join(firsts.select("record_id"), "record_id", "left_anti")
    return link_batch(
        incoming, mpi, demo_algorithm(), keep_pair_scores=True
    )


def test_scoring_python_is_arrow_batched_only(linked):
    plan = _plan(linked.pair_scores)
    assert "BatchEvalPython" not in plan, (
        "row-at-a-time Python UDF in the scoring path"
    )
    assert "ArrowEvalPython" in plan  # the fused similarity UDF


def test_no_cartesian_anywhere(linked):
    for df in (linked.pair_scores, linked.decisions):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_decisions_have_no_python_at_all(linked):
    # everything after scoring (median/RMS/grade/fold/decide) is pure
    # Catalyst: introducing Python there would break codegen fusion
    plan = _plan(linked.decisions.select("record_id", "final_grade"))
    assert "BatchEvalPython" not in plan
