"""Possible-grade and multiple-matches decision semantics
(reference link.py:316-341, include_multiple_matches
schemas/algorithm.py:164-171)."""

import copy
import dataclasses

from pyspark.sql import functions as F

from recordlinker_spark.config import dibbs_default
from recordlinker_spark.operators.linkjob import link_batch
from recordlinker_spark.plans.replay import replay_link

from fixtures_patients import SIX_PATIENTS
from test_link_parity import to_records


def test_possible_match_no_link(spark):
    """A fuzzy variant inside the (mmt, cmt) window grades 'possible':
    reported for review, NOT linked (person NULL), and the patient is
    persisted unassigned — invisible to later blocking."""
    algorithm = dibbs_default()
    passes = list(algorithm.passes)
    # raise cmt so the Jon/John fuzzy score (rms ~0.965) lands between
    passes[0] = dataclasses.replace(passes[0], possible_match_window=(0.8, 0.99))
    passes[1] = dataclasses.replace(passes[1], possible_match_window=(0.815, 0.99))
    algorithm = dataclasses.replace(algorithm, passes=tuple(passes))

    records = to_records(spark, [SIX_PATIENTS[0], SIX_PATIENTS[1]])
    steps, mpi_rows = replay_link(spark, records, algorithm, order=["r0", "r1"])

    assert steps[0].final_grade == "certainly-not"
    assert steps[1].final_grade == "possible"
    assert steps[1].person_id is None  # pending manual review
    assert steps[1].results and steps[1].results[0]["grade"] == "possible"
    # unassigned patient persisted but NULL person
    persons = {r["record_id"]: r["person_id"] for r in mpi_rows}
    assert persons["r1"] is None


def test_include_multiple_matches(spark):
    """Two identical-scoring certain clusters: include_multiple_matches
    returns both; disabling it returns only the top one."""
    a = copy.deepcopy(SIX_PATIENTS[0])
    b = copy.deepcopy(SIX_PATIENTS[0])
    b["external_id"] = "twin"
    probe = copy.deepcopy(SIX_PATIENTS[0])
    probe["external_id"] = "probe"

    records = to_records(spark, [a, b, probe])
    seeded = records.filter(F.col("record_id").isin("r0", "r1")).withColumn(
        "person_id", F.col("record_id")  # two separate person clusters
    )
    incoming = records.filter(F.col("record_id") == "r2")

    alg = dibbs_default()
    out = link_batch(incoming, seeded, alg)
    res = out.results.collect()
    assert len(res) == 2 and all(r["grade"] == "certain" for r in res)

    alg_single = dataclasses.replace(
        alg, context=dataclasses.replace(alg.context, include_multiple_matches=False)
    )
    out1 = link_batch(incoming, seeded, alg_single)
    res1 = out1.results.collect()
    assert len(res1) == 1 and res1[0]["grade"] == "certain"
    # the decision links to the deterministic top person either way
    d = out.decisions.collect()[0]
    d1 = out1.decisions.collect()[0]
    assert d["final_grade"] == d1["final_grade"] == "certain"
    assert d["person_id"] == d1["person_id"]
