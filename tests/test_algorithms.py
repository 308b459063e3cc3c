"""Algorithm JSON loader: parity with the reference's shipped config +
its pydantic validation rules (reference schemas/algorithm.py:19-304)."""

from __future__ import annotations

import copy
import json
import os

import pytest

from recordlinker_spark.algorithms import (
    AlgorithmValidationError,
    algorithm_from_dict,
    load_algorithm,
    load_algorithms,
)
from recordlinker_spark.config import dibbs_default

REF_JSON = "/root/reference/src/recordlinker/assets/testing_algorithms.json"


@pytest.fixture(scope="module")
def base() -> dict:
    """A small valid algorithm dict to mutate in rejection tests."""
    return {
        "label": "test-alg",
        "algorithm_context": {
            "log_odds": [
                {"feature": "BIRTHDATE", "value": 10.0},
                {"feature": "FIRST_NAME", "value": 6.8},
                {"feature": "LAST_NAME", "value": 6.3},
                {"feature": "SEX", "value": 0.75},
            ],
        },
        "passes": [
            {
                "blocking_keys": ["BIRTHDATE", "SEX"],
                "evaluators": [
                    {
                        "feature": "FIRST_NAME",
                        "func": "COMPARE_PROBABILISTIC_FUZZY_MATCH",
                    },
                    {
                        "feature": "LAST_NAME",
                        "func": "COMPARE_PROBABILISTIC_EXACT_MATCH",
                    },
                ],
                "possible_match_window": [0.8, 0.925],
            }
        ],
    }


@pytest.mark.skipif(not os.path.exists(REF_JSON), reason="reference absent")
def test_loads_reference_shipped_config_to_dibbs_default():
    algs = load_algorithms(REF_JSON)
    assert "dibbs-default" in algs
    got = algs["dibbs-default"]
    want = dibbs_default()
    assert got.label == want.label
    assert got.context == want.context
    assert got.passes == want.passes
    # is_default selection
    assert load_algorithm(REF_JSON).label == "dibbs-default"


def test_valid_roundtrip(base):
    alg = algorithm_from_dict(base)
    assert alg.label == "test-alg"
    assert alg.passes[0].blocking_keys == ("BIRTHDATE", "SEX")
    assert alg.passes[0].evaluators[0].feature == "FIRST_NAME"
    # default label synthesized like the reference (algorithm.py:236-243)
    assert alg.passes[0].resolved_label == (
        "BLOCK_birthdate_sex_MATCH_first_name_last_name"
    )


def _mutate(base, fn):
    d = copy.deepcopy(base)
    fn(d)
    return d


@pytest.mark.parametrize(
    "mutate, match",
    [
        (lambda d: d["passes"][0]["evaluators"][0].update(feature="NOPE"),
         "Invalid feature"),
        (lambda d: d["passes"][0]["evaluators"][0].update(feature="FIRST_NAME:SS"),
         "Suffix is not allowed"),
        (lambda d: d["passes"][0]["evaluators"][0].update(feature="IDENTIFIER:ZZZ"),
         "Invalid feature"),
        (lambda d: d["passes"][0]["evaluators"][0].update(func="EXACT"),
         "Invalid evaluator func"),
        (lambda d: d["passes"][0]["evaluators"][0].update(fuzzy_match_threshold=1.5),
         "within \\[0, 1\\]"),
        (lambda d: d["passes"][0]["evaluators"][0].update(fuzzy_match_measure="Cosine"),
         "Invalid fuzzy_match_measure"),
        (lambda d: d["passes"][0].update(possible_match_window=[0.9, 0.8]),
         "Lower bound must be less than upper bound"),
        (lambda d: d["passes"][0].update(possible_match_window=[0.8, 1.2]),
         "within \\[0, 1\\]"),
        (lambda d: d["passes"][0].update(blocking_keys=["BIRTHDATE", "EYECOLOR"]),
         "Invalid blocking key"),
        (lambda d: d.update(label="bad label!"), "Invalid algorithm label"),
        (lambda d: d["algorithm_context"]["log_odds"].append(
            {"feature": "ZIP", "value": -1.0}), "Log odds must be a finite"),
        # malformed configs report config errors, not bare KeyError
        (lambda d: d.pop("label"), "missing required key 'label'"),
        (lambda d: d.update(label=None), "label must be a string"),
        (lambda d: d.pop("passes"), "missing required key 'passes'"),
        (lambda d: d["passes"][0].pop("blocking_keys"),
         "missing required key 'blocking_keys'"),
        (lambda d: d["passes"][0].pop("evaluators"),
         "missing required key 'evaluators'"),
        (lambda d: d["passes"][0].pop("possible_match_window"),
         "missing required key 'possible_match_window'"),
        (lambda d: d["passes"][0]["evaluators"][0].pop("feature"),
         "missing required key 'feature'"),
        (lambda d: d["algorithm_context"]["log_odds"].append({"feature": "ZIP"}),
         "missing required key 'value'"),
    ],
)
def test_rejects_invalid(base, mutate, match):
    with pytest.raises(AlgorithmValidationError, match=match):
        algorithm_from_dict(_mutate(base, mutate))


def test_rejects_missing_log_odds_for_blocking_key(base):
    d = copy.deepcopy(base)
    d["algorithm_context"]["log_odds"] = [
        o for o in d["algorithm_context"]["log_odds"] if o["feature"] != "SEX"
    ]
    with pytest.raises(
        AlgorithmValidationError, match="defined for all blocking keys"
    ):
        algorithm_from_dict(d)


def test_rejects_missing_log_odds_for_evaluator(base):
    d = copy.deepcopy(base)
    d["algorithm_context"]["log_odds"] = [
        o for o in d["algorithm_context"]["log_odds"] if o["feature"] != "LAST_NAME"
    ]
    with pytest.raises(
        AlgorithmValidationError, match="defined for all evaluators"
    ):
        algorithm_from_dict(d)


def test_identifier_suffix_falls_back_to_identifier_odds(base):
    d = copy.deepcopy(base)
    d["algorithm_context"]["log_odds"].append(
        {"feature": "IDENTIFIER", "value": 0.3}
    )
    d["passes"][0]["evaluators"].append(
        {"feature": "IDENTIFIER:SS", "func": "COMPARE_PROBABILISTIC_EXACT_MATCH"}
    )
    alg = algorithm_from_dict(d)
    assert alg.context.get_log_odds("IDENTIFIER:SS") == 0.3


def test_rejects_duplicate_pass_labels(base):
    d = copy.deepcopy(base)
    d["passes"].append(copy.deepcopy(d["passes"][0]))
    with pytest.raises(AlgorithmValidationError, match="unique label"):
        algorithm_from_dict(d)


def test_link_job_runs_with_loaded_algorithm(spark, tmp_path):
    """End-to-end: a link job with the algorithm loaded from JSON equals
    one run with the built-in dibbs_default."""
    if not os.path.exists(REF_JSON):
        pytest.skip("reference absent")
    from recordlinker_spark.operators.linkjob import link_batch
    from recordlinker_spark.sources.ingest import parse_documents
    from recordlinker_spark.synth import synth_documents

    alg_json = load_algorithm(REF_JSON, "dibbs-default")
    docs = synth_documents(spark, 200, seed=5, partitions=4)
    records = parse_documents(docs.select("doc_id", "spans"))
    from pyspark.sql import functions as F

    split = F.abs(F.xxhash64("record_id")) % 5
    incoming = records.filter(split == 0)
    truth = docs.select(F.col("doc_id").alias("record_id"), "person_key")
    mpi = (
        records.filter(split != 0)
        .join(truth, "record_id")
        .withColumnRenamed("person_key", "person_id")
    )
    got = {
        r["record_id"]: (r["final_grade"], r["person_id"])
        for r in link_batch(incoming, mpi, alg_json).decisions.collect()
    }
    want = {
        r["record_id"]: (r["final_grade"], r["person_id"])
        for r in link_batch(incoming, mpi, dibbs_default()).decisions.collect()
    }
    assert got == want


def test_load_single_object_file(base, tmp_path):
    p = tmp_path / "alg.json"
    p.write_text(json.dumps(base))
    assert load_algorithm(str(p)).label == "test-alg"


def test_nan_and_inf_log_odds_rejected():
    import pytest as _pytest

    from recordlinker_spark.algorithms import (
        AlgorithmValidationError,
        algorithm_from_dict,
    )

    def alg(value):
        return {
            "label": "x",
            "algorithm_context": {"log_odds": [{"feature": "ZIP", "value": value}]},
            "passes": [{
                "blocking_keys": ["ZIP"],
                "evaluators": [{"feature": "ZIP",
                                "func": "COMPARE_PROBABILISTIC_EXACT_MATCH"}],
                "possible_match_window": [0.8, 0.9],
            }],
        }

    for bad in (float("nan"), float("inf")):
        with _pytest.raises(AlgorithmValidationError, match="finite"):
            algorithm_from_dict(alg(bad))
    # explicit 0.0 is DEFINED (reference falsy-lookup semantics):
    # validation accepts it
    assert algorithm_from_dict(alg(0.0)).context.get_log_odds("ZIP") == 0.0


def test_non_string_pass_label_rejected():
    import pytest as _pytest

    from recordlinker_spark.algorithms import (
        AlgorithmValidationError,
        algorithm_from_dict,
    )

    with _pytest.raises(AlgorithmValidationError, match="label"):
        algorithm_from_dict({
            "label": "x",
            "algorithm_context": {"log_odds": [{"feature": "ZIP", "value": 1.0}]},
            "passes": [{
                "label": 123,
                "blocking_keys": ["ZIP"],
                "evaluators": [{"feature": "ZIP",
                                "func": "COMPARE_PROBABILISTIC_EXACT_MATCH"}],
                "possible_match_window": [0.8, 0.9],
            }],
        })
