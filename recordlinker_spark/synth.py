"""Deterministic synthetic corpus generator (span documents).

Produces the pipeline's input table
``documents(doc_id, spans:array<struct<kind,text,media_ref,offset>>)``
— K persons x 1..max_dups records each, duplicates perturbed with the
reference load-scrambler's model (reference:
tests/load/scrambler/utils.py:9-46 — 1-2 char edits
insert/delete/transpose, date shifts by day/month/year, field
dropout), skip-value placeholders sprinkled in, 0-3 media spans
interleaved per document, and an injectable hot-block fraction (a few
shared birthdates/zips) to exercise the salted blocking join.

Everything is seeded (`random.Random(seed)`) and generated
*distributed*: the driver plans (person_id ranges per partition), the
executors generate rows via ``mapInPandas`` so a 10^9-person corpus
never funnels through the driver.  No external data.
"""

from __future__ import annotations

import datetime
import random
import string
import typing

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from recordlinker_spark.schemas import DOCUMENTS_SCHEMA
from recordlinker_spark.sources.spandoc import pii_to_spans, spans_to_rows

_FIRST = [
    "james", "mary", "robert", "patricia", "john", "jennifer", "michael",
    "linda", "david", "elizabeth", "william", "barbara", "richard", "susan",
    "joseph", "jessica", "thomas", "karen", "charles", "sarah", "chris",
    "nancy", "daniel", "lisa", "matthew", "betty", "anthony", "margaret",
    "mark", "sandra", "donald", "ashley", "steven", "kimberly", "paul",
    "emily", "andrew", "donna", "joshua", "michelle",
]
_LAST = [
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "thomas", "taylor", "moore", "jackson", "martin",
    "lee", "perez", "thompson", "white", "harris", "sanchez", "clark",
    "ramirez", "lewis", "robinson", "walker", "young", "allen", "king",
]
_STREETS = ["Maple", "Oak", "Cedar", "Pine", "Elm", "Walnut", "Lake", "Hill"]
_SUFFIXES = ["Street", "Avenue", "Road", "Drive", "Lane", "Court", "Boulevard"]
_CITIES = [
    ("Boston", "Massachusetts"), ("Austin", "Texas"), ("Denver", "Colorado"),
    ("Portland", "Oregon"), ("Madison", "Wisconsin"), ("Tucson", "Arizona"),
]
_SKIP_PLACEHOLDERS = ["Unknown", "Anonymous", "John Doe"]


def _scramble_text(rng: random.Random, value: str, max_edits: int = 2) -> str:
    """reference tests/load/scrambler/utils.py:9-26"""
    if not value:
        return value
    chars = list(value)
    for _ in range(rng.randint(1, max_edits)):
        action = rng.choice(["add", "delete", "transpose"])
        if action == "add":
            chars.insert(rng.randint(0, len(chars)), rng.choice(string.ascii_lowercase))
        elif action == "delete" and chars:
            del chars[rng.randint(0, len(chars) - 1)]
        elif action == "transpose" and len(chars) > 1:
            i = rng.randint(0, len(chars) - 2)
            chars[i], chars[i + 1] = chars[i + 1], chars[i]
    return "".join(chars)


def _scramble_date(rng: random.Random, value: str) -> str:
    """reference tests/load/scrambler/utils.py:29-45"""
    d = datetime.datetime.strptime(value, "%Y-%m-%d")
    action = rng.choice(["year", "month", "day"])
    days = {"month": rng.randint(1, 12) * 30, "day": rng.randint(0, 30),
            "year": rng.randint(0, 10) * 365}[action]
    return (d - datetime.timedelta(days=days)).strftime("%Y-%m-%d")


def _base_record(rng: random.Random, person_idx: int, hot_bd: str | None, hot_zip: str | None) -> dict:
    first = rng.choice(_FIRST).title()
    last = rng.choice(_LAST).title()
    if hot_bd is not None:
        bd = hot_bd
    else:
        bd = datetime.date(
            1920 + rng.randint(0, 100), rng.randint(1, 12), rng.randint(1, 28)
        ).isoformat()
    city, state = rng.choice(_CITIES)
    zipc = hot_zip or f"{rng.randint(10000, 99999)}"
    mrn = f"{person_idx:010d}"
    return {
        "external_id": f"person-{person_idx}",
        "birth_date": bd,
        "sex": rng.choice(["male", "female", "M", "F"]),
        "name": [{"family": last, "given": [first], "use": "official"}],
        "address": [
            {
                "line": [f"{rng.randint(1, 9999)} {rng.choice(_STREETS)} {rng.choice(_SUFFIXES)}"],
                "city": city,
                "state": state,
                "postal_code": zipc,
                "county": "",
            }
        ],
        "telecom": [
            {"value": f"{rng.randint(200, 989)}-555-{rng.randint(0, 9999):04d}", "system": "phone"}
        ],
        "identifiers": [{"type": "MR", "value": mrn, "authority": "GEN"}],
    }


def _perturb(rng: random.Random, rec: dict) -> dict:
    """A duplicate: copy + scramble 1-2 fields + occasional dropout/skip
    placeholders, per the reference scrambler semantics."""
    import copy as _copy

    out = _copy.deepcopy(rec)
    # "zip" and "none" are deliberate no-op slots: they dial DOWN the
    # effective perturbation frequency without changing the rng draw
    # sequence (corpus checksums across recorded scaling runs depend on
    # this sequence — do not add branches for them)
    choices = rng.sample(
        ["first", "last", "address", "birth_date", "zip", "none"],
        k=rng.randint(1, 2),
    )
    for what in choices:
        if what == "first":
            out["name"][0]["given"][0] = _scramble_text(rng, out["name"][0]["given"][0]).title()
        elif what == "last":
            out["name"][0]["family"] = _scramble_text(rng, out["name"][0]["family"]).title()
        elif what == "address":
            out["address"][0]["line"][0] = _scramble_text(rng, out["address"][0]["line"][0])
        elif what == "birth_date" and rng.random() < 0.3:
            out["birth_date"] = _scramble_date(rng, out["birth_date"])
    if rng.random() < 0.05:
        out["name"][0]["given"][0] = rng.choice(_SKIP_PLACEHOLDERS)
    if rng.random() < 0.1:
        out["identifiers"] = []
    if rng.random() < 0.05:
        out["sex"] = ""
    return out


def _gen_person_docs(
    rng: random.Random,
    person_idx: int,
    max_dups: int,
    hot_block_prob: float,
    hot_birthdates: list[str],
    hot_zips: list[str],
) -> typing.Iterator[dict]:
    hot = rng.random() < hot_block_prob
    hot_bd = rng.choice(hot_birthdates) if hot else None
    hot_zip = rng.choice(hot_zips) if hot else None
    base = _base_record(rng, person_idx, hot_bd, hot_zip)
    n = 1 + min(rng.randint(0, max_dups - 1), rng.randint(0, max_dups - 1))
    for dup_idx in range(n):
        rec = base if dup_idx == 0 else _perturb(rng, base)
        media = [
            (rng.randint(0, 8), f"media://blob/{person_idx}/{dup_idx}/{m}")
            for m in range(rng.randint(0, 3))
        ]
        yield {
            "doc_id": f"d{person_idx:09d}-{dup_idx}",
            "person_key": f"person-{person_idx}",
            "spans": spans_to_rows(pii_to_spans(rec, media)),
        }


SYNTH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("person_key", T.StringType(), False),  # ground truth
        DOCUMENTS_SCHEMA["spans"],
    ]
)


def synth_documents(
    spark: SparkSession,
    num_persons: int,
    seed: int = 42,
    max_dups: int = 4,
    hot_block_prob: float = 0.01,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus: ``num_persons`` persons with
    1..max_dups span-documents each + ``person_key`` ground truth."""
    hot_birthdates = [
        datetime.date(1970 + i, 1, 1).isoformat() for i in range(4)
    ]
    hot_zips = [f"{90000 + i}" for i in range(4)]

    parts = partitions or max(1, num_persons // 5000)
    idx = spark.range(num_persons, numPartitions=parts).withColumnRenamed("id", "pid")

    def gen(batches: typing.Iterator[pd.DataFrame]) -> typing.Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid in pdf["pid"]:
                rng = random.Random((seed << 20) ^ int(pid))
                rows.extend(
                    _gen_person_docs(
                        rng, int(pid), max_dups, hot_block_prob, hot_birthdates, hot_zips
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "person_key", "spans"])

    return idx.mapInPandas(gen, SYNTH_SCHEMA)
