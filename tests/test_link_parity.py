"""End-to-end linkage parity with the reference's pytest scenarios.

Replays the reference's 6-patient linking suite
(tests/unit/linking/test_link.py:277-424) through the Spark engine in
sequential-replay mode and asserts the same match vectors, cluster
sizes, matching passes, and median feature scores.
"""

import copy

import pytest

from recordlinker_spark.config import dibbs_default
from recordlinker_spark.plans.replay import replay_link
from recordlinker_spark.schemas import DOCUMENTS_SCHEMA
from recordlinker_spark.sources.ingest import parse_documents
from recordlinker_spark.sources.spandoc import docs_to_rows

from fixtures_patients import SIX_PATIENTS


def to_records(spark, patients):
    """patients -> span documents -> parsed pii records DataFrame."""
    docs = [
        (f"r{i}", p, [(2, f"media://img/{i}")]) for i, p in enumerate(patients)
    ]
    df = spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA)
    return parse_documents(df)


def run_replay(spark, patients):
    records = to_records(spark, patients)
    order = [f"r{i}" for i in range(len(patients))]
    return replay_link(spark, records, dibbs_default(), order=order)


def cluster_sizes(steps):
    counts: dict[str, int] = {}
    for s in steps:
        if s.person_id is not None:
            counts[s.person_id] = counts.get(s.person_id, 0) + 1
    return sorted(counts.values())


@pytest.fixture(scope="module")
def six_replay(spark):
    return run_replay(spark, SIX_PATIENTS)


class TestDefaultMatch:
    def test_match_vector_and_clusters(self, six_replay):
        """reference test_default_match_two (test_link.py:298-337)"""
        steps, _ = six_replay
        matches = [s.final_grade == "certain" for s in steps]
        assert matches == [False, True, False, True, False, False]
        assert steps[1].matching_pass_label == (
            "BLOCK_birthdate_identifier_sex_MATCH_first_name_last_name"
        )
        assert steps[3].matching_pass_label == (
            "BLOCK_zip_first_name_last_name_sex_MATCH_address_birthdate"
        )
        assert cluster_sizes(steps) == [1, 1, 1, 3]

    def test_no_results_for_non_matches(self, six_replay):
        steps, _ = six_replay
        for i in (0, 2, 4, 5):
            assert steps[i].results == []

    def test_median_features(self, six_replay):
        """median feature scores (test_link.py:330-337)"""
        steps, _ = six_replay
        mf1 = steps[1].results[0]["median_features"]
        assert round(mf1["FIRST_NAME"], 3) == 6.393
        assert round(mf1["LAST_NAME"], 3) == 6.351
        mf3 = steps[3].results[0]["median_features"]
        assert round(mf3["ADDRESS"], 3) == 8.438
        assert round(mf3["BIRTHDATE"], 3) == 10.127


def test_default_match_three(spark):
    """fuzzy 'Jhon' variant joins the 3-cluster (test_link.py:339-369)"""
    patients = [copy.deepcopy(p) for p in SIX_PATIENTS]
    extra = copy.deepcopy(SIX_PATIENTS[0])
    extra["external_id"] = "11111111-2222-3333-4444-555555555555"
    extra["name"][0]["given"][0] = "Jhon"
    patients.append(extra)

    steps, _ = run_replay(spark, patients)
    matches = [s.final_grade == "certain" for s in steps]
    assert matches == [False, True, False, True, False, False, True]
    assert cluster_sizes(steps) == [1, 1, 1, 4]
    mf = steps[6].results[0]["median_features"]
    assert round(mf["FIRST_NAME"], 3) == 6.336
    assert round(mf["LAST_NAME"], 3) == 6.351


def test_match_with_certain_first_pass(spark):
    """fold keeps the pass-1 certain over a pass-2 possible
    (test_link.py:371-397)"""
    import dataclasses

    algorithm = dibbs_default()
    passes = list(algorithm.passes)
    passes[1] = dataclasses.replace(passes[1], possible_match_window=(0.4, 0.9))
    algorithm = dataclasses.replace(algorithm, passes=tuple(passes))

    patients = [copy.deepcopy(SIX_PATIENTS[0]), copy.deepcopy(SIX_PATIENTS[2])]
    new_record = copy.deepcopy(SIX_PATIENTS[0])
    new_record["address"][0]["line"][0] = "4444 Different Street"
    patients.append(new_record)

    records = to_records(spark, patients)
    steps, _ = replay_link(spark, records, algorithm, order=["r0", "r1", "r2"])
    assert [s.final_grade == "certain" for s in steps] == [False, False, True]
    assert steps[2].results[0]["grade"] == "certain"
    assert steps[2].results[0]["pass_label"] == (
        "BLOCK_birthdate_identifier_sex_MATCH_first_name_last_name"
    )


def test_match_change_in_second_pass(spark):
    """pass-2 certain wins over a pass-1 possible (test_link.py:399-424)"""
    import dataclasses

    algorithm = dibbs_default()
    passes = list(algorithm.passes)
    passes[0] = dataclasses.replace(passes[0], possible_match_window=(0.4, 0.9))
    algorithm = dataclasses.replace(algorithm, passes=tuple(passes))

    patients = [copy.deepcopy(SIX_PATIENTS[0]), copy.deepcopy(SIX_PATIENTS[2])]
    new_record = copy.deepcopy(SIX_PATIENTS[0])
    new_record["name"][0]["family"] = "Shepley"
    patients.append(new_record)

    records = to_records(spark, patients)
    steps, _ = replay_link(spark, records, algorithm, order=["r0", "r1", "r2"])
    assert [s.final_grade == "certain" for s in steps] == [False, False, True]
    assert steps[2].results[0]["grade"] == "certain"
    assert steps[2].results[0]["pass_label"] == (
        "BLOCK_zip_first_name_last_name_sex_MATCH_address_birthdate"
    )
