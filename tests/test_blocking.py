"""Blocking-semantics parity with the reference's BlockData tests.

Ports the 9-patient ``prime_index`` fixture and the candidate-count
assertions of tests/unit/database/test_mpi_service.py:396-780 onto the
batch blocking operator (J1-J4).
"""

import pytest
from pyspark.sql import functions as F

from recordlinker_spark.config import (
    Algorithm,
    AlgorithmContext,
    AlgorithmPass,
)
from recordlinker_spark.functions.features import (
    blocking_key_columns,
    feature_columns,
)
from recordlinker_spark.operators.blocking import candidate_pairs
from recordlinker_spark.schemas import DOCUMENTS_SCHEMA
from recordlinker_spark.sources.ingest import parse_documents
from recordlinker_spark.sources.spandoc import docs_to_rows

# (record, person_label) — reference test_mpi_service.py:398-536
PRIME_INDEX = [
    ({"name": [{"given": ["Johnathon", "Bill"], "family": "Smith"}],
      "birth_date": "01/01/1980"}, "person_1"),
    ({"name": [{"given": ["George"], "family": "Harrison"}],
      "birth_date": "1943-2-25"}, "p_harrison"),
    ({"name": [{"given": ["John"], "family": "Doe"},
               {"given": ["John"], "family": "Lewis"}],
      "birth_date": "1980-01-01"}, "p_doe"),
    ({"name": [{"given": ["Bill"], "family": "Smith"}],
      "birth_date": "1980-01-01"}, "person_1"),
    ({"name": [{"given": ["John"], "family": "Smith"}],
      "birth_date": "1980-01-01"}, "person_1"),
    ({"name": [{"given": ["John"], "family": "Smith"}],
      "birth_date": "1985-11-12"}, "p_smith85"),
    ({"name": [{"given": ["Ferris"], "family": "Bueller"}],
      "birth_date": ""}, "person_2"),
    ({"name": [{"given": ["Ferris"], "family": "Bueller"}],
      "birth_date": "1974-11-07"}, "person_2"),
    ({"name": [{"given": ["Ferris"], "family": "Bueller"}],
      "birth_date": "1983-08-17"}, "person_2"),
]

KEYS = ["BIRTHDATE", "FIRST_NAME", "LAST_NAME"]


def _records(spark, data):
    docs = [(f"m{i}", rec, []) for i, (rec, _) in enumerate(data)]
    df = spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA)
    return parse_documents(df)


@pytest.fixture(scope="module")
def mpi_bk(spark):
    recs = _records(spark, PRIME_INDEX)
    labels = spark.createDataFrame(
        [(f"m{i}", p) for i, (_, p) in enumerate(PRIME_INDEX)],
        "record_id string, person_id string",
    )
    bk = blocking_key_columns(feature_columns(recs), KEYS)
    return bk.select("record_id", *[f"bk_{k}" for k in KEYS]).join(
        labels, "record_id"
    ).cache()


def _incoming_bk(spark, record):
    df = spark.createDataFrame(
        docs_to_rows([("probe", record, [])]), DOCUMENTS_SCHEMA
    )
    recs = parse_documents(df)
    return blocking_key_columns(feature_columns(recs), KEYS).select(
        "record_id", *[f"bk_{k}" for k in KEYS]
    )


def _block(spark, mpi_bk, record, keys, odds, max_missing=0.3):
    alg = Algorithm(
        label="t",
        passes=(
            AlgorithmPass(
                label="pass",
                blocking_keys=tuple(keys),
                evaluators=(),
                possible_match_window=(0.0, 1.0),
            ),
        ),
        context=AlgorithmContext(
            log_odds=odds, max_missing_allowed_proportion=max_missing
        ),
    )
    pairs = candidate_pairs(
        _incoming_bk(spark, record), mpi_bk, alg, alg.passes[0]
    )
    return pairs.select("record_id_r").collect()


SMITH_PROBE = {
    "name": [{"given": ["Johnathon", "Bill"], "family": "Smith"}],
    "birth_date": "01/01/1980",
}


def test_block_missing_data(spark, mpi_bk):
    """missing BIRTHDATE + max_missing 0.3 -> no candidates (:538-564)"""
    probe = {"name": [{"given": ["Johnathon", "Bill"], "family": "Smith"}]}
    out = _block(spark, mpi_bk, probe, ["BIRTHDATE"], {"BIRTHDATE": 10.1})
    assert len(out) == 0


def test_block_empty_block_key(spark, mpi_bk):
    """empty birthdate string -> missing key -> abort (:566-591)"""
    probe = {
        "name": [{"given": ["Ferris"], "family": "Bueller"}],
        "birth_date": "",
    }
    out = _block(
        spark, mpi_bk, probe, ["BIRTHDATE", "FIRST_NAME"],
        {"BIRTHDATE": 10.1, "FIRST_NAME": 6.8},
    )
    assert len(out) == 0


def test_block_filter_mpi_candidates(spark, mpi_bk):
    """cluster expansion + conflict filter: 3 Buellers pulled, the one
    with a conflicting birthdate dropped -> 2 (:593-628)"""
    probe = {
        "name": [{"given": ["Ferris"], "family": "Bueller"}],
        "birth_date": "1974-11-07",
    }
    out = _block(
        spark, mpi_bk, probe, ["BIRTHDATE", "FIRST_NAME"],
        {"BIRTHDATE": 10.1, "FIRST_NAME": 6.8},
    )
    assert len(out) == 2


def test_block_on_birthdate(spark, mpi_bk):
    out = _block(spark, mpi_bk, SMITH_PROBE, ["BIRTHDATE"], {"BIRTHDATE": 10.1})
    assert len(out) == 4
    probe85 = dict(SMITH_PROBE, birth_date="11/12/1985")
    out = _block(spark, mpi_bk, probe85, ["BIRTHDATE"], {"BIRTHDATE": 10.1})
    assert len(out) == 1


def test_block_on_first_name(spark, mpi_bk):
    out = _block(spark, mpi_bk, SMITH_PROBE, ["FIRST_NAME"], {"FIRST_NAME": 6.8})
    assert len(out) == 4


def test_block_on_birthdate_and_first_name(spark, mpi_bk):
    out = _block(
        spark, mpi_bk, SMITH_PROBE, ["BIRTHDATE", "FIRST_NAME"],
        {"BIRTHDATE": 10.1, "FIRST_NAME": 6.8},
    )
    assert len(out) == 3


def test_block_on_birthdate_first_last(spark, mpi_bk):
    odds = {"BIRTHDATE": 10.1, "FIRST_NAME": 6.8, "LAST_NAME": 6.3}
    out = _block(spark, mpi_bk, SMITH_PROBE, KEYS, odds)
    assert len(out) == 2
    probe = {
        "name": [{"given": ["Billy"], "family": "Smitty"}],
        "birth_date": "Jan 1 1980",
    }
    out = _block(spark, mpi_bk, probe, KEYS, odds)
    assert len(out) == 1


def test_salted_capped_and_broadcast_paths_agree(spark):
    """The broadcast fast path, the census+salted path, and the
    max_block_size cap produce identical candidate sets — the path
    choice is a physical-plan decision only."""
    from recordlinker_spark.operators.blocking import blocked_persons

    alg = Algorithm(
        label="t",
        passes=(
            AlgorithmPass(
                label="p",
                blocking_keys=("BIRTHDATE",),
                evaluators=(),
                possible_match_window=(0.0, 1.0),
            ),
        ),
        context=AlgorithmContext(log_odds={"BIRTHDATE": 10.0}),
    )
    p = alg.passes[0]
    # 120 patients share one hot birthdate; 30 cold distinct ones
    mpi_rows = [(f"h{i}", ["1980-01-01"], f"ph{i}") for i in range(120)] + [
        (f"c{i}", [f"19{i:02d}-05-05"], f"pc{i}") for i in range(30)
    ]
    mpi = spark.createDataFrame(
        mpi_rows, "record_id string, bk_BIRTHDATE array<string>, person_id string"
    )
    inc = spark.createDataFrame(
        [("q1", ["1980-01-01"]), ("q2", ["1905-05-05"]), ("q3", ["2000-01-01"])],
        "record_id string, bk_BIRTHDATE array<string>",
    )

    def got(**kw):
        return {
            (r["record_id_l"], r["person_id"])
            for r in blocked_persons(inc, mpi, alg, p, **kw).collect()
        }

    bcast = got()
    salted = got(
        broadcast_probe_rows=0, salt_threshold=50, num_salts=4,
        census_fraction=1.0,
    )
    assert bcast == salted
    assert len(bcast) == 121  # q1 -> 120 hot persons, q2 -> pc5, q3 -> none

    # the cap drops the pathological block identically on both paths
    capped_b = got(max_block_size=50)
    capped_s = got(
        broadcast_probe_rows=0, salt_threshold=50, num_salts=4,
        census_fraction=1.0, max_block_size=50,
    )
    assert capped_b == capped_s == {("q2", "pc5")}
