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


def _scalar_span(kind: str) -> str:
    """SQL expr: first trimmed text of spans with exactly this kind."""
    return f"trim(try_element_at(transform(filter(spans, s -> s.kind = '{kind}'), s -> s.text), 1))"


def _repeated_span(kind: str) -> str:
    """SQL expr: all trimmed texts of spans with exactly this kind, in order."""
    return f"transform(filter(spans, s -> s.kind = '{kind}'), s -> trim(s.text))"


def _group_expr(group: str, fields: dict[str, bool]) -> str:
    """SQL expr building array<struct> for an index-addressed span group.

    :param group: span kind prefix, e.g. 'name' (spans look like
        'name[0].given').
    :param fields: field name -> is_repeated.
    """
    count = (
        f"(aggregate(filter(spans, s -> s.kind like '{group}[%'), -1, "
        f"(acc, s) -> greatest(acc, cast(regexp_extract(s.kind, '^{group}\\\\[(\\\\d+)\\\\]', 1) as int))) + 1)"
    )
    parts = []
    for field, repeated in fields.items():
        kind = f"concat('{group}[', i, '].{field}')"
        texts = f"transform(filter(spans, s -> s.kind = {kind}), s -> trim(s.text))"
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

        def one(v):
            if v is None or not str(v).strip():
                return None
            try:
                d = parse(str(v), info)
            except (ValueError, OverflowError):
                return None
            if d > upper or d < lower:
                return None
            return d.date().isoformat()

        return vals.map(one)

    return parse_birthdate


# --------------------------------------------------------------------------
# the ingest projection
# --------------------------------------------------------------------------


def parse_documents(docs: DataFrame, today: datetime.date | None = None) -> DataFrame:
    """documents(doc_id, spans) -> normalized PII record DataFrame.

    One narrow projection; no shuffle. The spans column is passed through
    untouched so downstream sinks preserve span-sequence equality.
    """
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
