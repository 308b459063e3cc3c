"""FHIR bundle ingest: field mapping parity (hl7/fhir.py:26-66) and
end-to-end linkage over the reference's own FHIR fixture."""

from __future__ import annotations

import json
import os

import pytest

from recordlinker_spark.sources.fhir import (
    add_person_resource,
    parse_fhir_bundles,
)

REF_BUNDLE = (
    "/root/reference/tests/unit/assets/simple_patient_bundle_to_link_with_mpi.json"
)


def _bundle(resource: dict) -> str:
    return json.dumps({"resourceType": "Bundle", "entry": [{"resource": resource}]})


FULL_PATIENT = {
    "resourceType": "Patient",
    "id": "pat-1",
    "gender": "female",
    "birthDate": "1985-07-04",
    "name": [
        {
            "family": "  Smith ",
            "given": ["Jane", " Q "],
            "suffix": ["JR"],
            "use": "official",
        }
    ],
    "address": [
        {
            "line": ["123 Main Street", "Apt 4"],
            "city": "Boston",
            "state": "Massachusetts",
            "postalCode": "02101",
            "district": "Suffolk",
        }
    ],
    "telecom": [
        {"system": "phone", "value": "+1 (555) 123-4567"},
        {"system": "email", "value": "  Jane.Smith@EXAMPLE.com "},
    ],
    "identifier": [
        {
            "value": "123456789",
            "type": {"coding": [{"code": "SS"}]},
            "assigner": {"identifier": {"value": "SSA"}},
        },
        {
            "value": "MRN-77",
            "type": {"coding": [{"code": "MR"}, {"code": "PI"}]},
        },
    ],
    "extension": [
        {
            "url": "http://hl7.org/fhir/us/core/StructureDefinition/us-core-race",
            "extension": [
                {"url": "ombCategory", "valueCoding": {"display": "White"}},
                {"url": "ombCategory", "valueCoding": {"display": "Asian"}},
            ],
        }
    ],
}


def test_field_mapping(spark):
    df = spark.createDataFrame(
        [("d1", _bundle(FULL_PATIENT))], "doc_id string, bundle string"
    )
    row = parse_fhir_bundles(df).collect()[0].asDict(recursive=True)
    assert row["record_id"] == "d1"
    assert row["external_id"] == "pat-1"
    assert row["sex"] == "F"
    assert row["birth_date"] == "1985-07-04"
    # pydantic Name validator: whitespace strip + suffix canonicalized
    assert row["name"] == [
        {"family": "Smith", "given": ["Jane", "Q"], "suffix": ["Jr"], "use": "official"}
    ]
    # Address: USPS street suffix, state code, district -> county
    assert row["address"] == [
        {
            "line": ["123 Main ST", "Apt 4"],
            "city": "Boston",
            "state": "MA",
            "postal_code": "02101",
            "county": "Suffolk",
        }
    ]
    # Telecom: phone digits (US country code stripped), email lowercase
    assert row["telecom"] == [
        {"value": "5551234567", "system": "phone"},
        {"value": "jane.smith@example.com", "system": "email"},
    ]
    assert row["race"] == ["WHITE", "ASIAN"]
    # identifier coding fan-out + SS hyphenation + authority
    assert row["identifiers"] == [
        {"type": "SS", "value": "123-45-6789", "authority": "SSA"},
        {"type": "MR", "value": "MRN-77", "authority": ""},
        {"type": "PI", "value": "MRN-77", "authority": ""},
    ]
    assert row["spans"] is None


def test_bundle_without_patient_yields_empty_record(spark):
    df = spark.createDataFrame(
        [
            (
                "d0",
                json.dumps(
                    {
                        "resourceType": "Bundle",
                        "entry": [{"resource": {"resourceType": "Observation"}}],
                    }
                ),
            )
        ],
        "doc_id string, bundle string",
    )
    row = parse_fhir_bundles(df).collect()[0]
    assert row["record_id"] == "d0"
    assert row["external_id"] is None
    assert row["name"] == [] and row["identifiers"] == []


def test_first_patient_resource_wins(spark):
    two = {
        "resourceType": "Bundle",
        "entry": [
            {"resource": {**FULL_PATIENT, "id": "first"}},
            {"resource": {**FULL_PATIENT, "id": "second"}},
        ],
    }
    df = spark.createDataFrame(
        [("d2", json.dumps(two))], "doc_id string, bundle string"
    )
    assert parse_fhir_bundles(df).collect()[0]["external_id"] == "first"


@pytest.mark.skipif(not os.path.exists(REF_BUNDLE), reason="reference absent")
def test_reference_fixture_reproduces_link_decisions(spark):
    """The reference's 6-patient FHIR fixture, ingested through the
    engine FHIR source, reproduces the linking-suite decisions
    (reference test_link.py:298-337: match vector + cluster sizes)."""
    from recordlinker_spark.config import dibbs_default
    from recordlinker_spark.plans.replay import replay_link

    with open(REF_BUNDLE) as fh:
        entries = json.load(fh)["entry"]
    patients = [
        e["resource"]
        for e in entries
        if e.get("resource", {}).get("resourceType") == "Patient"
    ]
    assert len(patients) == 6
    rows = [(f"r{i}", _bundle(p)) for i, p in enumerate(patients)]
    records = parse_fhir_bundles(
        spark.createDataFrame(rows, "doc_id string, bundle string")
    )
    steps, _ = replay_link(
        spark, records, dibbs_default(), order=[f"r{i}" for i in range(6)]
    )
    assert [s.final_grade == "certain" for s in steps] == [
        False, True, False, True, False, False,
    ]
    sizes: dict[str, int] = {}
    for s in steps:
        if s.person_id is not None:
            sizes[s.person_id] = sizes.get(s.person_id, 0) + 1
    assert sorted(sizes.values()) == [1, 1, 1, 3]
    mf1 = steps[1].results[0]["median_features"]
    assert round(mf1["FIRST_NAME"], 3) == 6.393
    assert round(mf1["LAST_NAME"], 3) == 6.351


def test_add_person_resource():
    bundle = {"entry": [{"resource": {"resourceType": "Patient", "id": "p0"}}]}
    out = add_person_resource("per-1", "p0", bundle)
    added = out["entry"][-1]
    assert added["resource"]["resourceType"] == "Person"
    assert added["resource"]["id"] == "per-1"
    assert added["resource"]["link"] == [
        {"target": {"reference": "Patient/p0"}}
    ]
    assert added["request"] == {"method": "PUT", "url": "Person/per-1"}


def test_link_fhir_job(spark, tmp_path):
    """--fhir job mode: a directory of bundle JSON files links end to
    end and <out>.fhir carries Person-enriched bundles (the POST
    /link/fhir analog, link_router.py:90-122)."""
    from recordlinker_spark.plans import jobs

    class A:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    bdir = tmp_path / "bundles"
    bdir.mkdir()
    (bdir / "b1.json").write_text(_bundle(FULL_PATIENT))
    (bdir / "b2.json").write_text(
        _bundle(
            {
                "resourceType": "Patient",
                "id": "pat-2",
                "gender": "male",
                "birthDate": "1990-01-02",
                "name": [{"family": "Jones", "given": ["Al"], "use": "official"}],
            }
        )
    )
    out = str(tmp_path / "decisions")
    jobs.job_link(
        spark,
        A(documents=str(bdir), mpi=str(tmp_path / "mpi"), out=out, fhir=True),
        persist=True,
    )
    assert spark.read.parquet(out).count() == 2
    # doc_id = basename-md5(content): strip the 32-hex content hash
    fh = {
        os.path.basename(r["doc_id"]).rsplit("-", 1)[0]: r
        for r in spark.read.parquet(out + ".fhir").collect()
    }
    assert set(fh) == {"b1.json", "b2.json"}
    for r in fh.values():
        assert r["final_grade"] == "certainly-not"  # empty MPI, new persons
        ub = json.loads(r["updated_bundle"])
        persons = [
            e for e in ub["entry"]
            if e["resource"]["resourceType"] == "Person"
        ]
        assert len(persons) == 1
        assert persons[0]["resource"]["id"] == r["person_id"]
    # the enriched b1 bundle links the Person to the Patient external id
    link = json.loads(fh["b1.json"]["updated_bundle"])
    person = [e for e in link["entry"] if e["resource"]["resourceType"] == "Person"][0]
    assert person["resource"]["link"][0]["target"]["reference"] == "Patient/pat-1"
    # patients persisted to the MPI
    assert spark.read.parquet(str(tmp_path / "mpi")).count() == 2


def test_enrich_bundles_null_person_gives_null_bundle(spark):
    """Possible-grade decisions carry no person; like the reference's
    `updated_bundle = person and ...`, the enriched bundle is NULL."""
    from recordlinker_spark.sources.fhir import enrich_bundles

    bundles = spark.createDataFrame(
        [("d1", _bundle(FULL_PATIENT))], "doc_id string, bundle string"
    )
    decisions = spark.createDataFrame(
        [("d1", "possible", None)],
        "record_id string, final_grade string, person_id string",
    )
    records = spark.createDataFrame(
        [("d1", "pat-1")], "record_id string, external_id string"
    )
    (row,) = enrich_bundles(bundles, decisions, records).collect()
    assert row["final_grade"] == "possible"
    assert row["updated_bundle"] is None


def test_degenerate_bundles_yield_all_missing_records(spark):
    """NULL / malformed-JSON / non-dict bundle values must produce
    all-missing PII records (the documented no-Patient behavior), not
    an AttributeError that kills the job on one bad row."""
    from recordlinker_spark.sources.fhir import parse_fhir_bundles

    bundles = spark.createDataFrame(
        [("b1", None), ("b2", "{not json"), ("b3", "[1, 2]"),
         ("b4", '{"entry": []}')],
        "doc_id string, bundle string",
    )
    rows = {r["record_id"]: r for r in parse_fhir_bundles(bundles).collect()}
    assert set(rows) == {"b1", "b2", "b3", "b4"}
    for r in rows.values():
        assert r["birth_date"] is None and r["name"] in ([], None)


def test_link_fhir_record_ids_are_content_qualified(spark, tmp_path):
    """Two DIFFERENT bundles sharing a filename (patient.json from two
    directories, linked in separate runs) must not collide on
    record_id — basename-only ids made the MPI's dedup-on-read silently
    drop one patient; re-linking an IDENTICAL bundle must still dedup."""
    from recordlinker_spark.plans import jobs

    class A:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    mpi = str(tmp_path / "mpi")
    p1 = {
        "resourceType": "Patient", "id": "pat-A", "gender": "female",
        "birthDate": "1980-03-04",
        "name": [{"family": "Smith", "given": ["Ann"], "use": "official"}],
    }
    p2 = {
        "resourceType": "Patient", "id": "pat-B", "gender": "male",
        "birthDate": "1955-07-08",
        "name": [{"family": "Nguyen", "given": ["Bo"], "use": "official"}],
    }
    for i, p in enumerate([p1, p2]):
        d = tmp_path / f"dir{i}"
        d.mkdir()
        (d / "patient.json").write_text(_bundle(p))
        jobs.job_link(
            spark,
            A(documents=str(d), mpi=mpi,
              out=str(tmp_path / f"dec{i}"), fhir=True),
            persist=True,
        )
    assert spark.read.parquet(mpi).count() == 2  # no silent drop

    # idempotence: re-link dir0's identical bundle -> still 2 patients
    jobs.job_link(
        spark,
        A(documents=str(tmp_path / "dir0"), mpi=mpi,
          out=str(tmp_path / "dec2"), fhir=True),
        persist=True,
    )
    from recordlinker_spark.plans.jobs import _read_mpi

    assert _read_mpi(spark, mpi).count() == 2
