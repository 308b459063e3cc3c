"""The arrow and sql ingest decoders must be bit-identical."""

from pyspark.sql import functions as F

from recordlinker_spark.sources.ingest import (
    parse_documents_arrow,
    parse_documents_sql,
)
from recordlinker_spark.schemas import DOCUMENTS_SCHEMA
from recordlinker_spark.sources.spandoc import docs_to_rows
from recordlinker_spark.synth import synth_documents

from fixtures_patients import SIX_PATIENTS

import datetime

PINNED = datetime.date(2026, 1, 1)


def _diff(a, b):
    cols = sorted(set(a.columns) - {"spans"})
    al = {r["record_id"]: r for r in a.select("record_id", *cols).collect()}
    bl = {r["record_id"]: r for r in b.select("record_id", *cols).collect()}
    assert set(al) == set(bl)
    mism = []
    for rid in al:
        if al[rid] != bl[rid]:
            mism.append((rid, al[rid], bl[rid]))
    return mism


def test_engines_match_on_fixtures(spark):
    extra = [
        # edge shapes: gapped/odd values, unicode, whitespace, 2-digit years
        {
            "external_id": "  padded  ",
            "birth_date": "1/2/99",
            "sex": "FEMALE",
            "name": [
                {"family": "  Núñez ", "given": ["José", ""], "suffix": ["JUNIOR"]},
                {"family": None, "given": [], "suffix": []},
            ],
            "address": [
                {
                    "line": ["12 Main Street", "Apt. 9"],
                    "city": " Boston ",
                    "state": "new  york",
                    "postal_code": "021341234",
                    "county": "",
                }
            ],
            "telecom": [
                {"value": "+1 (617) 555-0101", "system": "phone"},
                {"value": "Foo@Bar.COM ", "system": "email"},
                {"value": "raw", "system": None},
            ],
            "race": ["Black or African American", "unknown", None],
            "identifiers": [
                {"type": "SS", "value": "123456789", "authority": " ssa "},
                {"type": "MR", "value": "mrn-1", "authority": None},
            ],
        }
    ]
    docs = [
        (f"r{i}", p, [(1, f"m://{i}")]) for i, p in enumerate(SIX_PATIENTS + extra)
    ]
    df = spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA)
    a = parse_documents_arrow(df, PINNED)
    s = parse_documents_sql(df, PINNED)
    assert _diff(a, s) == []
    # spans passthrough identical on both
    orig = {r["doc_id"]: r["spans"] for r in df.collect()}
    for eng in (a, s):
        for r in eng.select("record_id", "spans").collect():
            assert r["spans"] == orig[r["record_id"]]


def test_engines_match_on_synth(spark):
    docs = synth_documents(spark, 120, seed=11).select("doc_id", "spans")
    a = parse_documents_arrow(docs, PINNED)
    s = parse_documents_sql(docs, PINNED)
    mism = _diff(a, s)
    assert mism == [], mism[:3]


def test_degenerate_spans_parity(spark):
    """NULL spans column, NULL kind, malformed/indexed span kinds: both
    engines must produce the SAME record (previously the arrow engine
    crashed on NULL spans/kind and dropped 'birth_date[0]'; the SQL
    engine died on 'name[x].given' under the ANSI cast)."""
    from recordlinker_spark.sources.ingest import (
        parse_documents_arrow,
        parse_documents_sql,
    )

    schema = (
        "doc_id string, spans array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>"
    )
    rows = [
        ("n1", None),
        ("n2", [{"kind": None, "text": "x", "media_ref": "", "offset": 0}]),
        ("n3", [{"kind": "birth_date[0]", "text": "1990-01-02",
                 "media_ref": "", "offset": 0},
                {"kind": "race[1]", "text": "WHITE", "media_ref": "", "offset": 1}]),
        ("n4", [{"kind": "name[x].given", "text": "Bad", "media_ref": "", "offset": 0},
                {"kind": "name[0].family", "text": "Good", "media_ref": "", "offset": 1}]),
    ]
    docs = spark.createDataFrame(rows, schema)
    a = {r["record_id"]: r.asDict() for r in parse_documents_arrow(docs).collect()}
    s = {r["record_id"]: r.asDict() for r in parse_documents_sql(docs).collect()}
    assert set(a) == set(s) == {"n1", "n2", "n3", "n4"}
    for rid in a:
        da, ds = dict(a[rid]), dict(s[rid])
        da.pop("spans"), ds.pop("spans")
        assert da == ds, rid
    assert a["n3"]["birth_date"] == "1990-01-02"
    assert a["n4"]["name"][0]["family"] == "Good"
