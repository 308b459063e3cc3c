"""documents -> normalized PII records, as pure Spark expressions.

Stage 0 of the pipeline: decode the interleaved span documents into typed
nested PII columns and apply every parse-time normalization the reference
bakes into its pydantic validators (reference:
src/recordlinker/schemas/pii.py:195-336,383-450 and
src/recordlinker/schemas/identifier.py:186-195).

Everything here is built-in Catalyst expressions (higher-order array
functions, regexp, map lookups) that stay inside whole-stage codegen —
except birth-date parsing, which needs the reference's two-digit-year
pivot rule and runs as one Arrow-batched pandas UDF.

The ``spans`` column passes through untouched (per-row invariant:
span-sequence equality on kind/text/media_ref/order).
"""

from __future__ import annotations

import datetime

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from recordlinker_spark.functions.assets import (
    CANONICAL_NAME_SUFFIXES,
    NAME_SUFFIX_VARIANTS,
    STATE_CODES,
    STATE_NAME_TO_CODE,
    USPS_STREET_SUFFIXES,
)

# --------------------------------------------------------------------------
# span decoding helpers (pure SQL expressions over the spans array)
# --------------------------------------------------------------------------


# One pre-split pass over the span list: kind "name[0].given" ->
# (grp='name', idx=0, fld='given'); unindexed kinds keep grp=kind,
# idx=-1, fld=''.  CRITICAL perf note: every filter below is pure
# EQUALITY on these struct fields — pattern-matching expressions
# (LIKE / regexp / startswith) inside higher-order-function lambdas
# degrade catastrophically with executor-thread count (measured 0.7s ->
# 16s from local[8] to local[32] on 17.5M spans for a single
# `s.kind LIKE 'name[%'` filter; equality stays flat).
_PARSED_SPANS = (
    "transform(spans, s -> named_struct("
    "'grp', case when instr(s.kind, '[') > 0"
    "  then substring(s.kind, 1, instr(s.kind, '[') - 1) else s.kind end, "
    "'idx', case when instr(s.kind, '[') > 0 and instr(s.kind, ']') > 0"
    # try_cast, not cast: a malformed span index ('name[].given',
    # 'name[x].given') must skip the span (NULL idx, matching the
    # arrow engine's int() -> continue), not kill the job under the
    # ANSI default's CAST_INVALID_INPUT
    "  then try_cast(substring(s.kind, instr(s.kind, '[') + 1,"
    "       instr(s.kind, ']') - instr(s.kind, '[') - 1) as int) else -1 end, "
    "'fld', case when instr(s.kind, ']') > 0"
    "  then substring(s.kind, instr(s.kind, ']') + 2, 1000) else '' end, "
    "'txt', trim(s.text)))"
)


def _scalar_span(kind: str) -> str:
    """SQL expr: first trimmed text of spans with exactly this kind."""
    return (
        f"try_element_at(transform(filter({_PARSED_SPANS},"
        f" p -> p.grp = '{kind}'), p -> p.txt), 1)"
    )


def _repeated_span(kind: str) -> str:
    """SQL expr: all trimmed texts of spans with exactly this kind, in
    order.  Coalesced: a NULL spans column yields [] like the arrow
    twin (transform(NULL) would propagate NULL)."""
    return (
        f"coalesce(transform(filter({_PARSED_SPANS}, p -> p.grp = '{kind}'),"
        " p -> p.txt), array())"
    )


def _group_expr(group: str, fields: dict[str, bool]) -> str:
    """SQL expr building array<struct> for an index-addressed span group.

    :param group: span kind prefix, e.g. 'name' (spans look like
        'name[0].given').
    :param fields: field name -> is_repeated.
    """
    count = (
        f"(coalesce(array_max(transform({_PARSED_SPANS},"
        f" p -> if(p.grp = '{group}', p.idx, -1))), -1) + 1)"
    )
    parts = []
    for field, repeated in fields.items():
        texts = (
            f"transform(filter({_PARSED_SPANS}, p -> p.grp = '{group}'"
            f" and p.idx = i and p.fld = '{field}'), p -> p.txt)"
        )
        value = texts if repeated else f"try_element_at({texts}, 1)"
        parts.append(f"'{field}', {value}")
    struct = "named_struct(" + ", ".join(parts) + ")"
    # slice(..., 1, count) yields a correctly-typed empty array when count=0
    return (
        f"slice(transform(sequence(0, greatest({count}, 1) - 1), i -> {struct}), 1, {count})"
    )


# --------------------------------------------------------------------------
# normalization expressions (reference validator parity)
# --------------------------------------------------------------------------


def _map_literal(mapping: dict[str, str]) -> Column:
    pairs: list = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)


def _norm_name_suffix(col: Column) -> Column:
    """Reference pii.py:208-226: title-case, map known variants to Sr/Jr,
    otherwise revert to the raw value."""
    titled = F.initcap(col)
    mapped = F.try_element_at(_map_literal(NAME_SUFFIX_VARIANTS), titled)
    return (
        F.when(mapped.isNotNull(), mapped)
        .when(titled.isin(*sorted(CANONICAL_NAME_SUFFIXES)), titled)
        .otherwise(col)
    )


def _norm_address_line(col: Column) -> Column:
    """Reference pii.py:266-282: uppercase/alnum the last token, replace it
    with the USPS standard abbreviation when recognized."""
    parts = F.split(F.trim(col), " ")
    last = F.upper(F.regexp_replace(F.try_element_at(parts, F.lit(-1)), "[^A-Za-z0-9]", ""))
    common = F.try_element_at(_map_literal(USPS_STREET_SUFFIXES), last)
    replaced = F.array_join(
        F.concat(F.slice(parts, 1, F.size(parts) - 1), F.array(common)), " "
    )
    return F.when(col.isNull(), None).when(common.isNotNull(), replaced).otherwise(F.trim(col))


def _norm_state(col: Column) -> Column:
    """Reference pii.py:284-299: 2-letter codes uppercased; full names
    title-cased (inner whitespace collapsed) and mapped to USPS codes;
    anything else passes through."""
    cleaned = F.initcap(F.regexp_replace(F.trim(col), " +", " "))
    upper2 = F.upper(cleaned)
    mapped = F.try_element_at(_map_literal(STATE_NAME_TO_CODE), cleaned)
    return (
        F.when(col.isNull(), None)
        .when((F.length(cleaned) == 2) & upper2.isin(*sorted(STATE_CODES)), upper2)
        .when(mapped.isNotNull(), mapped)
        .otherwise(col)
    )


def _norm_sex(col: Column) -> Column:
    """Reference pii.py:430-441."""
    low = F.lower(F.trim(col))
    return (
        F.when(low.isin("m", "male"), F.lit("M"))
        .when(low.isin("f", "female"), F.lit("F"))
        .otherwise(F.lit(None).cast("string"))
    )


# Ordered substring mapping, reference pii.py:165-186 (order matters).
_RACE_MAPPING: list[tuple[list[str], str]] = [
    (["american indian", "alaska native"], "AMERICAN_INDIAN"),
    (["asian"], "ASIAN"),
    (["black", "african american"], "BLACK"),
    (["white"], "WHITE"),
    (["hawaiian", "pacific islander"], "HAWAIIAN"),
    (["asked unknown", "asked but unknown"], "ASKED_UNKNOWN"),
    (["unknown"], "UNKNOWN"),
]


def _norm_race(col: Column) -> Column:
    low = F.lower(F.trim(col))
    expr = None
    for substrings, race in _RACE_MAPPING:
        cond = None
        for sub in substrings:
            c = low.contains(sub)
            cond = c if cond is None else (cond | c)
        expr = F.when(cond, race) if expr is None else expr.when(cond, race)
    return expr.otherwise("OTHER")


def _norm_phone(col: Column) -> Column:
    """US-default national-number extraction (reference pii.py:313-334 uses
    the phonenumbers library; this reproduces its behavior for NANP inputs,
    the only format the corpus generators emit: strip punctuation, drop a
    leading country-code 1)."""
    digits = F.regexp_replace(col, "[^0-9]", "")
    return F.when(
        (F.length(digits) == 11) & digits.startswith("1"), F.substring(digits, 2, 10)
    ).otherwise(digits)


def _norm_telecom_value(value: Column, system: Column) -> Column:
    return (
        F.when(system == "email", F.lower(F.trim(value)))
        .when(system == "phone", _norm_phone(value))
        .otherwise(value)
    )


def _norm_identifier_value(value: Column, typ: Column) -> Column:
    """SSN reformatting, reference identifier.py:186-195."""
    is_ssn9 = (typ == "SS") & (F.length(value) == 9) & value.rlike("^[0-9]{9}$")
    formatted = F.concat_ws(
        "-", F.substring(value, 1, 3), F.substring(value, 4, 2), F.substring(value, 6, 4)
    )
    return F.when(is_ssn9, formatted).otherwise(value)


_MIN_BIRTHDATE = datetime.date(1850, 1, 1)


def _make_birthdate_udf(today: datetime.date | None = None):
    """Arrow-batched parser reproducing the reference's two-digit-year pivot
    (reference pii.py:391-428): two-digit years pivot at the current year,
    future dates and pre-1850 dates are rejected (nulled here; the
    reference rejects the whole record at the API boundary).

    :param today: pin for reproducibility; defaults to the real today.
    """
    pinned = today or datetime.date.today()

    from pyspark.sql import types as T

    @pandas_udf(T.StringType())
    def parse_birthdate(vals: pd.Series) -> pd.Series:
        # ONE construction site for the pivot/fill/bounds logic: this
        # UDF wraps the plain-Python twin so a future fix cannot land
        # in only one of the two (they already share one subtle fix —
        # the missing-component ``default`` pin); built once per Arrow
        # batch call, not per row
        return vals.map(_make_birthdate_parser(pinned))

    return parse_birthdate


# --------------------------------------------------------------------------
# the ingest projection
# --------------------------------------------------------------------------


def parse_documents(
    docs: DataFrame, today: datetime.date | None = None, engine: str = "arrow"
) -> DataFrame:
    """documents(doc_id, spans) -> normalized PII record DataFrame.

    No shuffle; the ``spans`` column passes through untouched (per-row
    invariant: span-sequence equality).

    :param engine: ``arrow`` (the default) decodes in ONE
        ``mapInPandas`` pass — per-row Python, but Arrow-batched and
        embarrassingly parallel; measured ~10x faster than the
        expression path at 1M docs in this sandbox and, unlike
        interpreted higher-order functions, it scales with cores (the
        nested ``aggregate``/``transform``/``regexp`` span decode is
        CodegenFallback: at local[32] it ran 2.3x SLOWER than local[8]
        from allocation/GC contention).  ``sql`` keeps the
        pure-Catalyst projection (equality-only span filters after the
        HOF perf note above) — prefer it where JVM-side decode
        outweighs Python worker transfer on real clusters; both
        engines are asserted identical in tests/test_ingest_engines.py.
    """
    if engine == "arrow":
        return parse_documents_arrow(docs, today)
    return parse_documents_sql(docs, today)


def parse_documents_sql(docs: DataFrame, today: datetime.date | None = None) -> DataFrame:
    """The pure-expression decoder (reference normalizer semantics
    expressed in Catalyst; see module docstring)."""
    parse_bd = _make_birthdate_udf(today)

    raw = docs.select(
        F.col("doc_id").alias("record_id"),
        F.expr(_scalar_span("external_id")).alias("external_id"),
        F.expr(_scalar_span("birth_date")).alias("_birth_date_raw"),
        F.expr(_scalar_span("sex")).alias("_sex_raw"),
        F.expr(
            _group_expr("name", {"family": False, "given": True, "suffix": True, "use": False})
        ).alias("_name_raw"),
        F.expr(
            _group_expr(
                "address",
                {
                    "line": True,
                    "city": False,
                    "state": False,
                    "postal_code": False,
                    "county": False,
                },
            )
        ).alias("_address_raw"),
        F.expr(_group_expr("telecom", {"value": False, "system": False})).alias("_telecom_raw"),
        F.expr(_repeated_span("race")).alias("_race_raw"),
        F.expr(
            _group_expr("identifier", {"type": False, "value": False, "authority": False})
        ).alias("_identifier_raw"),
        F.col("spans"),
    )

    name_norm = F.transform(
        F.col("_name_raw"),
        lambda n: F.struct(
            n["family"].alias("family"),
            n["given"].alias("given"),
            F.transform(n["suffix"], _norm_name_suffix).alias("suffix"),
            n["use"].alias("use"),
        ),
    )
    address_norm = F.transform(
        F.col("_address_raw"),
        lambda a: F.struct(
            F.transform(a["line"], _norm_address_line).alias("line"),
            a["city"].alias("city"),
            _norm_state(a["state"]).alias("state"),
            a["postal_code"].alias("postal_code"),
            a["county"].alias("county"),
        ),
    )
    telecom_norm = F.transform(
        F.col("_telecom_raw"),
        lambda t: F.struct(
            _norm_telecom_value(t["value"], t["system"]).alias("value"),
            t["system"].alias("system"),
        ),
    )
    identifier_norm = F.transform(
        F.col("_identifier_raw"),
        lambda i: F.struct(
            i["type"].alias("type"),
            _norm_identifier_value(i["value"], i["type"]).alias("value"),
            i["authority"].alias("authority"),
        ),
    )

    return raw.select(
        "record_id",
        "external_id",
        parse_bd(F.col("_birth_date_raw")).alias("birth_date"),
        _norm_sex(F.col("_sex_raw")).alias("sex"),
        name_norm.alias("name"),
        address_norm.alias("address"),
        telecom_norm.alias("telecom"),
        F.transform(F.col("_race_raw"), _norm_race).alias("race"),
        identifier_norm.alias("identifiers"),
        "spans",
    )


# --------------------------------------------------------------------------
# arrow-native decoder (python twins of the expression normalizers)
# --------------------------------------------------------------------------

_SQL_SPACE = " "  # Spark trim() strips the space char only, not all whitespace


def _py_trim(v: str | None) -> str | None:
    return None if v is None else v.strip(_SQL_SPACE)


def _py_initcap(v: str) -> str:
    return " ".join(w[:1].upper() + w[1:].lower() for w in v.split(" "))


def _py_norm_name_suffix(v: str | None) -> str | None:
    if v is None:
        return None
    titled = _py_initcap(v)
    mapped = NAME_SUFFIX_VARIANTS.get(titled)
    if mapped is not None:
        return mapped
    if titled in CANONICAL_NAME_SUFFIXES:
        return titled
    return v


def _py_norm_address_line(v: str | None) -> str | None:
    if v is None:
        return None
    trimmed = v.strip(_SQL_SPACE)
    parts = trimmed.split(" ")
    last = "".join(c for c in parts[-1] if c.isascii() and c.isalnum()).upper()
    common = USPS_STREET_SUFFIXES.get(last)
    if common is not None:
        return " ".join(parts[:-1] + [common])
    return trimmed


def _py_norm_state(v: str | None) -> str | None:
    if v is None:
        return None
    import re as _re

    cleaned = _py_initcap(_re.sub(" +", " ", v.strip(_SQL_SPACE)))
    if len(cleaned) == 2 and cleaned.upper() in STATE_CODES:
        return cleaned.upper()
    mapped = STATE_NAME_TO_CODE.get(cleaned)
    if mapped is not None:
        return mapped
    return v


def _py_norm_sex(v: str | None) -> str | None:
    if v is None:
        return None
    low = v.strip(_SQL_SPACE).lower()
    if low in ("m", "male"):
        return "M"
    if low in ("f", "female"):
        return "F"
    return None


def _py_norm_race(v: str | None) -> str:
    if v is None:  # SQL twin's when-conditions fall through to OTHER
        return "OTHER"
    low = v.strip(_SQL_SPACE).lower()
    for substrings, race in _RACE_MAPPING:
        if any(s in low for s in substrings):
            return race
    return "OTHER"


_ASCII_DIGITS = frozenset("0123456789")


def _py_norm_phone(v: str) -> str:
    # ASCII [0-9] only, like the SQL twin's regexp: str.isdigit() also
    # accepts Unicode digits ('²', Arabic-Indic numerals), which would
    # make the two engines normalize the same phone differently
    digits = "".join(c for c in v if c in _ASCII_DIGITS)
    if len(digits) == 11 and digits.startswith("1"):
        return digits[1:]
    return digits


def _py_norm_identifier_value(value: str | None, typ: str | None) -> str | None:
    if (
        typ == "SS"
        and value is not None
        and len(value) == 9
        and all(c in _ASCII_DIGITS for c in value)  # SQL twin: ^[0-9]{9}$
    ):
        return f"{value[0:3]}-{value[3:5]}-{value[5:9]}"
    return value


def _make_birthdate_parser(today: datetime.date | None = None):
    """Plain-Python twin of the pandas-UDF birthdate parser."""
    pinned = today or datetime.date.today()
    from dateutil.parser import parse, parserinfo

    class PivotInfo(parserinfo):
        def convertyear(self, year, *args):
            if year < 100:
                year += (pinned.year // 100) * 100
                if year > pinned.year:
                    year -= 100
            return year

    info = PivotInfo()
    upper = datetime.datetime(pinned.year, pinned.month, pinned.day, 23, 59, 59)
    lower = datetime.datetime(1850, 1, 1)
    # dateutil fills MISSING date components from ``default`` — and with
    # no default, from the real wall clock no matter what ``today`` pin
    # the caller gave (the parserinfo only governs 2-digit years).  The
    # reference (schemas/pii.py:423, bare ``parse``) therefore gives a
    # partial birthdate like nbs_test.csv's ``1964-10`` a different day
    # every day it runs; threading the pin through ``default`` makes a
    # pinned clock pin the whole parse.  With ``today=None`` both
    # behaviors coincide (default == the real today), preserving parity.
    fill = datetime.datetime(pinned.year, pinned.month, pinned.day)

    def one(v):
        if v is None or not str(v).strip():
            return None
        try:
            d = parse(str(v), info, default=fill)
        except (ValueError, OverflowError):
            return None
        if d > upper or d < lower:
            return None
        return d.date().isoformat()

    return one


_GROUP_FIELDS = {
    "name": {"family": False, "given": True, "suffix": True, "use": False},
    "address": {
        "line": True,
        "city": False,
        "state": False,
        "postal_code": False,
        "county": False,
    },
    "telecom": {"value": False, "system": False},
    "identifier": {"type": False, "value": False, "authority": False},
}


def _decode_spans(spans) -> dict:
    """One pass over the span list -> raw (trimmed, un-normalized) field
    groups, identical shapes to the expression decoder: group indices
    0..max_idx materialize even when gapped; scalar fields keep only the
    first span; repeated fields keep order."""
    scalars: dict[str, str] = {}
    race: list[str] = []
    groups: dict[str, dict[int, dict]] = {g: {} for g in _GROUP_FIELDS}

    for s in spans if spans is not None else ():  # NULL spans: empty record
        kind = s["kind"]
        text = s["text"]
        if kind is None:  # SQL twin's instr/case yields no match; skip
            continue
        if kind == "media":
            continue
        # match on the BRACKET-STRIPPED base like the SQL twin's `grp`
        # (it strips '[...]' before comparing): 'birth_date[0]' must
        # parse as birth_date on both engines, not silently drop here
        bracket = kind.find("[")
        base = kind[:bracket] if bracket > 0 else kind
        if base in ("external_id", "birth_date", "sex"):
            scalars.setdefault(base, _py_trim(text))
            continue
        if base == "race":
            race.append(_py_trim(text))
            continue
        if bracket <= 0:
            continue
        group = kind[:bracket]
        fields = _GROUP_FIELDS.get(group)
        if fields is None:
            continue
        close = kind.find("]", bracket)
        try:
            idx = int(kind[bracket + 1 : close])
        except ValueError:
            continue
        field = kind[close + 2 :]  # skip "]."
        if field not in fields:
            continue
        inst = groups[group].setdefault(idx, {})
        if fields[field]:
            inst.setdefault(field, []).append(_py_trim(text))
        else:
            inst.setdefault(field, _py_trim(text))

    out: dict = dict(scalars)
    out["race"] = race
    for group, fields in _GROUP_FIELDS.items():
        insts = groups[group]
        n = (max(insts) + 1) if insts else 0
        rows = []
        for i in range(n):
            inst = insts.get(i, {})
            rows.append(
                {f: inst.get(f, [] if rep else None) for f, rep in fields.items()}
            )
        out[group] = rows
    return out


def parse_documents_arrow(
    docs: DataFrame, today: datetime.date | None = None
) -> DataFrame:
    """Arrow-batched single-pass decoder + normalizers (see
    :func:`parse_documents`)."""
    import typing

    from recordlinker_spark.schemas import PII_SCHEMA

    pinned = today or datetime.date.today()

    def gen(batches: typing.Iterator[pd.DataFrame]) -> typing.Iterator[pd.DataFrame]:
        parse_bd = _make_birthdate_parser(pinned)
        for pdf in batches:
            rows = []
            for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
                raw = _decode_spans(spans)
                name = [
                    {
                        "family": n["family"],
                        "given": n["given"],
                        "suffix": [_py_norm_name_suffix(s) for s in n["suffix"]],
                        "use": n["use"],
                    }
                    for n in raw["name"]
                ]
                address = [
                    {
                        "line": [_py_norm_address_line(l) for l in a["line"]],
                        "city": a["city"],
                        "state": _py_norm_state(a["state"]),
                        "postal_code": a["postal_code"],
                        "county": a["county"],
                    }
                    for a in raw["address"]
                ]
                telecom = [
                    {
                        "value": (
                            t["value"].strip(_SQL_SPACE).lower()
                            if t["system"] == "email" and t["value"] is not None
                            else _py_norm_phone(t["value"])
                            if t["system"] == "phone" and t["value"] is not None
                            else t["value"]
                        ),
                        "system": t["system"],
                    }
                    for t in raw["telecom"]
                ]
                identifiers = [
                    {
                        "type": i["type"],
                        "value": _py_norm_identifier_value(i["value"], i["type"]),
                        "authority": i["authority"],
                    }
                    for i in raw["identifier"]
                ]
                rows.append(
                    {
                        "record_id": doc_id,
                        "external_id": raw.get("external_id"),
                        "birth_date": parse_bd(raw.get("birth_date")),
                        "sex": _py_norm_sex(raw.get("sex")),
                        "name": name,
                        "address": address,
                        "telecom": telecom,
                        "race": [_py_norm_race(r) for r in raw["race"]],
                        "identifiers": identifiers,
                        "spans": spans,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "record_id", "external_id", "birth_date", "sex", "name",
                    "address", "telecom", "race", "identifiers", "spans",
                ],
            )

    return docs.select("doc_id", "spans").mapInPandas(gen, PII_SCHEMA)
