"""FHIR bundle ingest: the engine-side source for the reference's
primary interchange format.

Re-expresses ``fhir_record_to_pii_record`` + the pydantic PII
validators (reference: src/recordlinker/hl7/fhir.py:15-66 and
schemas/pii.py:195-336,383-450) as a Spark source: a DataFrame of FHIR
bundle JSON strings becomes a PII-record DataFrame with the exact
schema ``sources.ingest.parse_documents`` produces, so the whole link
pipeline (blocking keys, features, scoring) runs unchanged on FHIR
input.

Field-for-field mapping (hl7/fhir.py:29-66):

* the FIRST ``Patient`` resource per bundle is used
  (``get_first_patient_resource``); bundles without one yield an
  all-missing record (the reference returns ``{}`` and lets the
  PIIRecord default every field);
* ``id`` -> external_id; ``birthDate`` -> birth_date (two-digit-year
  pivot parser); ``gender`` -> sex; ``name``/``address``/``telecom``
  pass through their pydantic normalizers (suffix canonicalization,
  USPS street suffixes, state codes, email lowercase, phone digits);
* ``identifier[].type.coding[].code`` fan-out with
  ``assigner.identifier.value`` as authority (one PII identifier per
  coding, hl7/fhir.py:40-50);
* the ``us-core-race`` extension's ``ombCategory`` displays -> race
  (hl7/fhir.py:59-64); ``address.district`` -> county
  (hl7/fhir.py:52-53). Geolocation lat/long extensions are parsed by
  the reference but unused by every comparator, so they are dropped
  here.

JSON decoding is per-row Python by necessity (nested, irregular FHIR),
batched through ``mapInPandas`` (Arrow) exactly like the span decoder —
one pass, no shuffle; at scale the decode parallelizes with the scan.
"""

from __future__ import annotations

import datetime
import json
import typing

import pandas as pd
from pyspark.sql import DataFrame

from recordlinker_spark.schemas import PII_SCHEMA
from recordlinker_spark.sources.ingest import (
    _make_birthdate_parser,
    _py_norm_address_line,
    _py_norm_identifier_value,
    _py_norm_name_suffix,
    _py_norm_phone,
    _py_norm_race,
    _py_norm_sex,
    _py_norm_state,
    _py_trim,
)

RACE_EXT_URL = "http://hl7.org/fhir/us/core/StructureDefinition/us-core-race"


def first_patient_resource(bundle: dict) -> dict:
    """First Patient resource of a bundle (hl7/fhir.py:15-23)."""
    for entry in bundle.get("entry") or []:
        resource = entry.get("resource") or {}
        if resource.get("resourceType") == "Patient":
            return resource
    return {}


def _names(resource: dict) -> list[dict]:
    out = []
    for n in resource.get("name") or []:
        out.append(
            {
                "family": _py_trim(n.get("family")),
                "given": [_py_trim(g) for g in n.get("given") or []],
                "suffix": [
                    _py_norm_name_suffix(_py_trim(s)) for s in n.get("suffix") or []
                ],
                "use": _py_trim(n.get("use")),
            }
        )
    return out


def _addresses(resource: dict) -> list[dict]:
    out = []
    for a in resource.get("address") or []:
        out.append(
            {
                "line": [
                    _py_norm_address_line(line)
                    for line in a.get("line") or []
                    if line is not None
                ],
                "city": _py_trim(a.get("city")),
                "state": _py_norm_state(a.get("state")),
                # pydantic Address accepts postal_code via alias choices
                # (postalCode is FHIR's spelling, pii.py:252-256)
                "postal_code": _py_trim(
                    a.get("postalCode") or a.get("postal_code") or a.get("zip")
                ),
                # hl7/fhir.py:52: district -> county
                "county": _py_trim(a.get("district") or ""),
            }
        )
    return out


def _telecoms(resource: dict) -> list[dict]:
    out = []
    for t in resource.get("telecom") or []:
        value = t.get("value")
        system = _py_trim(t.get("system"))
        if value is not None:
            if system == "email":
                # _py_trim, not str.strip(): the span-ingest twin uses
                # Spark trim() semantics (SQL space set), and str.strip
                # would remove tabs/newlines it keeps — the same email
                # would then disagree between the two sources
                value = _py_trim(value).lower()
            elif system == "phone":
                value = _py_norm_phone(value)
            else:
                value = _py_trim(value)
        out.append({"value": value, "system": system})
    return out


def _identifiers(resource: dict) -> list[dict]:
    """identifier[].type.coding[] fan-out (hl7/fhir.py:40-50)."""
    out = []
    for ident in resource.get("identifier") or []:
        authority = (
            (ident.get("assigner") or {}).get("identifier") or {}
        ).get("value", "")
        for code in (ident.get("type") or {}).get("coding") or []:
            typ = _py_trim(code.get("code"))
            out.append(
                {
                    "type": typ,
                    "value": _py_norm_identifier_value(
                        _py_trim(ident.get("value")), typ
                    ),
                    "authority": _py_trim(authority),
                }
            )
    return out


def _races(resource: dict) -> list[str]:
    out = []
    for extension in resource.get("extension") or []:
        if extension.get("url") == RACE_EXT_URL:
            for ext in extension.get("extension") or []:
                if ext.get("url") == "ombCategory":
                    display = (ext.get("valueCoding") or {}).get("display")
                    if display is not None:
                        out.append(_py_norm_race(display))
    return out


def fhir_resource_to_pii(
    record_id: str, resource: dict, parse_bd: typing.Callable
) -> dict:
    """One Patient resource -> one PII row (engine schema)."""
    return {
        "record_id": record_id,
        "external_id": _py_trim(resource.get("id")),
        "birth_date": parse_bd(resource.get("birthDate")),
        "sex": _py_norm_sex(resource.get("gender")),
        "name": _names(resource),
        "address": _addresses(resource),
        "telecom": _telecoms(resource),
        "race": _races(resource),
        "identifiers": _identifiers(resource),
        "spans": None,  # FHIR input carries no span sequence
    }


def parse_fhir_bundles(
    bundles: DataFrame,
    id_col: str = "doc_id",
    bundle_col: str = "bundle",
    today: datetime.date | None = None,
) -> DataFrame:
    """(id, FHIR-bundle JSON string) rows -> PII records.

    Output schema matches ``parse_documents`` exactly, so the result
    feeds straight into ``operators.linkjob.link_batch``.
    """
    pinned = today or datetime.date.today()

    def gen(batches: typing.Iterator[pd.DataFrame]) -> typing.Iterator[pd.DataFrame]:
        parse_bd = _make_birthdate_parser(pinned)
        cols = [f.name for f in PII_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf[id_col], pdf[bundle_col]):
                # degenerate bundles (NULL, malformed JSON, non-dict)
                # yield an all-missing record — the module's documented
                # no-Patient-resource behavior — instead of killing the
                # whole job on one bad row with AttributeError
                if isinstance(raw, str):
                    try:
                        bundle = json.loads(raw)
                    except ValueError:
                        bundle = {}
                else:
                    bundle = raw
                if not isinstance(bundle, dict):
                    bundle = {}
                resource = first_patient_resource(bundle)
                rows.append(fhir_resource_to_pii(rid, resource, parse_bd))
            yield pd.DataFrame(rows, columns=cols)

    return bundles.select(id_col, bundle_col).mapInPandas(gen, PII_SCHEMA)


def add_person_resource(
    person_id: str, patient_id: str | None = "", bundle: dict | None = None
) -> dict:
    """Append the matched Person resource to a FHIR bundle — the
    response enrichment of the reference's /link/fhir endpoint
    (hl7/fhir.py:69-99). Driver-side helper (the per-record result is
    already collected when responses are assembled)."""
    bundle = bundle if bundle is not None else {}
    bundle.setdefault("entry", []).append(
        {
            "fullUrl": f"urn:uuid:{person_id}",
            "resource": {
                "resourceType": "Person",
                "id": f"{person_id}",
                "link": [{"target": {"reference": f"Patient/{patient_id}"}}],
            },
            "request": {"method": "PUT", "url": f"Person/{person_id}"},
        }
    )
    return bundle


def enrich_bundles(
    bundles: DataFrame,
    decisions: DataFrame,
    records: DataFrame,
    id_col: str = "doc_id",
    bundle_col: str = "bundle",
) -> DataFrame:
    """Distributed twin of :func:`add_person_resource` — the batch
    analog of the reference's ``POST /link/fhir`` response
    (link_router.py:90-122): per bundle, ``final_grade`` /
    ``person_id`` plus ``updated_bundle`` (the input bundle with a
    Person resource appended, linked to the record's external patient
    id).  Like the reference (``updated_bundle = person and ...``),
    rows whose decision carries no person (possible grade pending
    review) get a NULL ``updated_bundle``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    joined = bundles.select(id_col, bundle_col).join(
        decisions.select(
            F.col("record_id").alias(id_col), "final_grade", "person_id"
        ),
        id_col,
    ).join(
        records.select(F.col("record_id").alias(id_col), "external_id"),
        id_col,
    )

    @F.pandas_udf(T.StringType())
    def _enrich(
        bundle: pd.Series, person: pd.Series, patient: pd.Series
    ) -> pd.Series:
        out = []
        for b, p, pid in zip(bundle, person, patient):
            if p is None:
                out.append(None)
                continue
            doc = json.loads(b) if isinstance(b, str) else dict(b)
            out.append(
                json.dumps(add_person_resource(p, pid or "", doc))
            )
        return pd.Series(out, dtype="object")

    return joined.select(
        id_col,
        "final_grade",
        "person_id",
        _enrich(F.col(bundle_col), F.col("person_id"), F.col("external_id")).alias(
            "updated_bundle"
        ),
    )
