"""The reference's 6-patient linkage fixture, re-encoded as PII dicts.

Semantics from tests/unit/assets/simple_patient_bundle_to_link_with_mpi.json
run through the reference FHIR mapping (hl7/fhir.py:26-66: gender -> sex,
identifier codings -> typed identifiers with empty authority). Used by the
pytest linking-scenario parity tests (test_link.py:245-424).
"""

SHEPARD_JOHN = {
    "external_id": "f6a16ff7-4a31-11eb-be7b-8344edc8f36b",
    "birth_date": "2013-11-07",
    "sex": "male",
    "name": [{"family": "Shepard", "given": ["John", "Tiberius"], "use": "official"}],
    "address": [
        {
            "line": ["1234 Silversun Strip"],
            "city": "Boston",
            "state": "Massachusetts",
            "postal_code": "99999",
            "county": "",
        }
    ],
    "telecom": [{"value": "123-456-7890", "system": "phone"}],
    "identifiers": [{"type": "MR", "value": "1234567890", "authority": ""}],
}

SHEPARD_JON = {
    "external_id": "2fdd0b8b-4a70-11eb-99fd-ad786a821574",
    "birth_date": "2013-11-07",
    "sex": "male",
    "name": [{"family": "Shepard", "given": ["Jon", "Tiberius"], "use": "official"}],
    "address": [
        {
            "line": ["1234 Silversun Strip", "Apartment 2A", "Building 3"],
            "city": "Boston",
            "state": "Massachusetts",
            "postal_code": "99999",
            "county": "",
        }
    ],
    "telecom": [{"value": "123-456-7890", "system": "phone"}],
    "identifiers": [{"type": "MR", "value": "1234567890", "authority": ""}],
}

TALI = {
    "external_id": "2c6d5fd1-4a70-11eb-99fd-ad786a821574",
    "birth_date": "2020-05-14",
    "sex": "female",
    "name": [
        {"family": "Vas Normandy", "given": ["Tali", "Zora"], "use": "official"},
        {"family": "Vas Neema", "given": ["Tali", "Zora"], "use": "official"},
        {"family": "Nar Raya", "given": ["Tali", "Zora"], "use": "official"},
    ],
    "address": [
        {
            "line": ["PO Box 1", "First Rock"],
            "city": "Bozeman",
            "state": "Montana",
            "postal_code": "11111",
            "county": "",
        },
        {
            "line": ["Bay 16", "Ward Sector 24"],
            "city": "Brooklyn",
            "state": "New York",
            "postal_code": "11111",
            "county": "",
        },
    ],
    "identifiers": [
        {"type": "SS", "value": "649-555-0120", "authority": ""},
        {"type": "MR", "value": "7894561235", "authority": ""},
    ],
}

SHEPARD_PASS2 = {
    "external_id": "fd645c21-4a6f-11eb-99fd-ad786a821574",
    "birth_date": "2013-11-07",
    "sex": "male",
    "name": [{"family": "Shepard", "given": ["John"], "use": "official"}],
    "address": [
        {
            "line": ["1234 Silversun Strip"],
            "city": "Boston",
            "state": "Massachusetts",
            "postal_code": "99999",
            "county": "",
        }
    ],
    "telecom": [{"value": "123-456-7890", "system": "phone"}],
    "identifiers": [{"type": "MR", "value": "7845451380", "authority": ""}],
}

SHEPARD_MISMATCH = {
    "external_id": "a81bc81b-dead-4e5d-abff-90865d1e13b1",
    "birth_date": "2013-11-07",
    "sex": "female",
    "name": [{"family": "Shepard", "given": ["John"], "use": "official"}],
    "address": [
        {
            "line": ["PO Box 1", "First Rock"],
            "city": "Bozeman",
            "state": "Montana",
            "postal_code": "11111",
            "county": "",
        }
    ],
    "identifiers": [{"type": "MR", "value": "7894561235", "authority": ""}],
}

SHEPARD_TIBERIA = {
    "external_id": "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11",
    "birth_date": "2013-11-07",
    "sex": "female",
    "name": [{"family": "Shepard", "given": ["John", "Tiberia"], "use": "official"}],
    "address": [
        {
            "line": ["1234 Silversun Strip"],
            "city": "Bozeman",
            "state": "Montana",
            "postal_code": "11111",
            "county": "",
        },
        {
            "line": ["Bay 16", "Ward Sector 24"],
            "city": "Brooklyn",
            "state": "New York",
            "postal_code": "11111",
            "county": "",
        },
    ],
    "identifiers": [{"type": "MR", "value": "1234567890", "authority": ""}],
}

SIX_PATIENTS = [
    SHEPARD_JOHN,
    SHEPARD_JON,
    TALI,
    SHEPARD_PASS2,
    SHEPARD_MISMATCH,
    SHEPARD_TIBERIA,
]
