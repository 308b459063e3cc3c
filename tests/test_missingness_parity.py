"""Missingness-semantics parity (reference test_link.py:430-524)."""

import copy
import dataclasses

from recordlinker_spark.config import dibbs_default
from recordlinker_spark.plans.replay import replay_link

from fixtures_patients import SIX_PATIENTS
from test_link_parity import to_records


def _with(algorithm, *, windows=None, max_missing=None, missing_points=None):
    ctx = algorithm.context
    if max_missing is not None:
        ctx = dataclasses.replace(ctx, max_missing_allowed_proportion=max_missing)
    if missing_points is not None:
        ctx = dataclasses.replace(ctx, missing_field_points_proportion=missing_points)
    passes = list(algorithm.passes)
    for i, w in (windows or {}).items():
        passes[i] = dataclasses.replace(passes[i], possible_match_window=w)
    return dataclasses.replace(algorithm, passes=tuple(passes), context=ctx)


def test_match_with_missing_field(spark):
    """missing family+address still matches under a lowered window;
    median feature scores reflect the missing-points award
    (test_link.py:430-459: FIRST_NAME 6.849, LAST_NAME 3.175)"""
    base = copy.deepcopy(SIX_PATIENTS[0])
    dup = copy.deepcopy(base)
    dup["external_id"] = "dup-1"
    dup["name"][0]["family"] = ""
    dup["address"][0]["line"][0] = ""

    algorithm = _with(dibbs_default(), windows={0: (0.7, 0.75)})
    records = to_records(spark, [base, dup])
    steps, _ = replay_link(spark, records, algorithm, order=["r0", "r1"])
    assert [s.final_grade == "certain" for s in steps] == [False, True]
    mf = steps[1].results[0]["median_features"]
    assert round(mf["FIRST_NAME"], 3) == 6.849
    assert round(mf["LAST_NAME"], 3) == 3.175


def test_reject_too_many_missing_fields(spark):
    """missing given+address with max_missing 0.3 -> no results at all
    (test_link.py:461-489)"""
    base = copy.deepcopy(SIX_PATIENTS[0])
    dup = copy.deepcopy(base)
    dup["external_id"] = "dup-2"
    dup["name"][0]["given"][0] = ""
    dup["address"][0]["line"][0] = ""

    algorithm = _with(dibbs_default(), max_missing=0.3)
    records = to_records(spark, [base, dup])
    steps, _ = replay_link(spark, records, algorithm, order=["r0", "r1"])
    assert [s.final_grade == "certain" for s in steps] == [False, False]
    assert steps[0].results == [] and steps[1].results == []


def test_both_missingness_params_zero(spark):
    """zero missing-points + zero allowed missingness disqualify even a
    score that would otherwise clear a low window (test_link.py:491-524)"""
    base = copy.deepcopy(SIX_PATIENTS[0])
    dup = copy.deepcopy(base)
    dup["external_id"] = "dup-3"
    dup["name"][0]["given"][0] = ""
    dup["address"][0]["line"][0] = ""

    algorithm = _with(
        dibbs_default(),
        windows={0: (0.2, 0.3), 1: (0.2, 0.3)},
        max_missing=0.0,
        missing_points=0.0,
    )
    records = to_records(spark, [base, dup])
    steps, _ = replay_link(spark, records, algorithm, order=["r0", "r1"])
    assert [s.final_grade == "certain" for s in steps] == [False, False]
