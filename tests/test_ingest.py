"""Ingest + feature extraction parity with the reference validators
(pii.py:195-336,467-621) on the 6-patient fixture."""

import pytest

from fixtures_patients import SHEPARD_JOHN, SIX_PATIENTS, TALI
from recordlinker_spark.functions.features import (
    blocking_key_columns,
    feature_columns,
)
from recordlinker_spark.schemas import DOCUMENTS_SCHEMA
from recordlinker_spark.sources.ingest import parse_documents
from recordlinker_spark.sources.spandoc import docs_to_rows


@pytest.fixture(scope="module")
def parsed(spark):
    rows = docs_to_rows(
        [(str(i), rec, [(1, f"media://img/{i}")]) for i, rec in enumerate(SIX_PATIENTS)]
    )
    docs = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    df = blocking_key_columns(feature_columns(parse_documents(docs)))
    return {r["record_id"]: r.asDict(recursive=True) for r in df.collect()}


def test_scalar_normalization(parsed):
    p0 = parsed["0"]
    assert p0["birth_date"] == "2013-11-07"
    assert p0["sex"] == "M"
    assert p0["address"][0]["state"] == "MA"
    assert p0["telecom"][0]["value"] == "1234567890"
    p2 = parsed["2"]
    assert p2["sex"] == "F"
    assert p2["address"][0]["state"] == "MT"
    assert p2["address"][1]["state"] == "NY"
    # SSN formatting left as-is when not 9 digits
    assert p2["identifiers"][0]["value"] == "649-555-0120"


def test_span_passthrough(parsed):
    """Per-row invariant: span sequence preserved exactly, media included."""
    from recordlinker_spark.sources.spandoc import pii_to_spans

    expected = pii_to_spans(SHEPARD_JOHN, [(1, "media://img/0")])
    got = [
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in parsed["0"]["spans"]
    ]
    assert got == expected
    assert got[1] == ("media", "", "media://img/0", 1)


def test_feature_values(parsed):
    p0 = parsed["0"]
    assert p0["feat_BIRTHDATE"] == ["2013-11-07"]
    assert p0["feat_SEX"] == ["M"]
    assert p0["feat_FIRST_NAME"] == ["john"]
    assert p0["feat_LAST_NAME"] == ["shepard"]
    assert p0["feat_GIVEN_NAME"] == ["johntiberius"]
    assert p0["feat_NAME"] == ["johnshepard"]
    assert p0["feat_ADDRESS"] == ["1234silversunstrip"]
    assert p0["feat_CITY"] == ["boston"]
    assert p0["feat_STATE"] == ["MA"]
    assert p0["feat_ZIP"] == ["99999"]
    assert p0["feat_PHONE"] == ["1234567890"]
    assert p0["feat_IDENTIFIER"] == ["1234567890::MR"]
    p2 = parsed["2"]
    assert p2["feat_LAST_NAME"] == ["vasnormandy", "vasneema", "narraya"]
    assert p2["feat_FIRST_NAME"] == ["tali", "tali", "tali"]
    assert p2["feat_IDENTIFIER"] == ["6495550120::SS", "7894561235::MR"]
    assert p2["feat_ADDRESS"] == ["pobox1", "bay16"]


def test_blocking_keys(parsed):
    p0 = parsed["0"]
    assert p0["bk_BIRTHDATE"] == ["2013-11-07"]
    assert p0["bk_IDENTIFIER"] == ["7890:MR"]
    assert p0["bk_SEX"] == ["M"]
    assert p0["bk_ZIP"] == ["99999"]
    assert p0["bk_FIRST_NAME"] == ["john"]
    assert p0["bk_LAST_NAME"] == ["shep"]
    assert p0["bk_ADDRESS"] == ["1234"]
    assert p0["bk_PHONE"] == ["7890"]
    assert p0["bk_EMAIL"] == []
    p2 = parsed["2"]
    assert sorted(p2["bk_IDENTIFIER"]) == ["0120:SS", "1235:MR"]
    assert p2["bk_FIRST_NAME"] == ["tali"]
    assert sorted(p2["bk_LAST_NAME"]) == ["narr", "vasn"]


def test_usps_and_suffix_normalization(spark):
    rec = {
        "birth_date": "11/7/13",
        "sex": "Female",
        "name": [{"family": "Doe", "given": ["Jane"], "suffix": ["Junior", "III"]}],
        "address": [
            {"line": ["123 Main Street", "Apt 4 Boulevard"], "state": "new  york"}
        ],
        "identifiers": [{"type": "SS", "value": "123456789"}],
    }
    docs = spark.createDataFrame(docs_to_rows([("x", rec, [])]), DOCUMENTS_SCHEMA)
    import datetime

    row = (
        parse_documents(docs, today=datetime.date(2025, 8, 8))
        .collect()[0]
        .asDict(recursive=True)
    )
    # two-digit year pivot: '13' <= 25 -> 2013
    assert row["birth_date"] == "2013-11-07"
    assert row["sex"] == "F"
    assert row["name"][0]["suffix"] == ["Jr", "III"]  # Junior->Jr, III reverts raw
    assert row["address"][0]["line"] == ["123 Main ST", "Apt 4 BLVD"]
    assert row["address"][0]["state"] == "NY"
    assert row["identifiers"][0]["value"] == "123-45-6789"


def test_birthdate_bounds(spark):
    import datetime

    recs = [
        ("future", {"birth_date": "2030-01-01"}),
        ("old", {"birth_date": "1840-01-01"}),
        ("pivot_old", {"birth_date": "3/15/74"}),
    ]
    docs = spark.createDataFrame(
        docs_to_rows([(i, r, []) for i, r in recs]), DOCUMENTS_SCHEMA
    )
    rows = {
        r["record_id"]: r["birth_date"]
        for r in parse_documents(docs, today=datetime.date(2025, 8, 8)).collect()
    }
    assert rows["future"] is None
    assert rows["old"] is None
    assert rows["pivot_old"] == "1974-03-15"
