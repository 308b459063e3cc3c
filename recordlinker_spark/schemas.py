"""Spark StructTypes for every table the engine reads or writes.

The input contract (driver ``input_hint``) is an Iceberg/parquet table
``documents(doc_id, spans)`` of interleaved text+media spans; one patient
record per document. PII field shapes mirror the reference's nested
pydantic document (reference: src/recordlinker/schemas/pii.py:339-356)
re-expressed as Spark nested types — fixed, declared schemas (the
reference validates with pydantic; we validate by construction).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- documents
SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), nullable=False),
        T.StructField("spans", T.ArrayType(SPAN_TYPE), nullable=False),
    ]
)

# ---------------------------------------------------------------- pii record
NAME_TYPE = T.StructType(
    [
        T.StructField("family", T.StringType()),
        T.StructField("given", T.ArrayType(T.StringType())),
        T.StructField("suffix", T.ArrayType(T.StringType())),
        T.StructField("use", T.StringType()),
    ]
)

ADDRESS_TYPE = T.StructType(
    [
        T.StructField("line", T.ArrayType(T.StringType())),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("postal_code", T.StringType()),
        T.StructField("county", T.StringType()),
    ]
)

TELECOM_TYPE = T.StructType(
    [
        T.StructField("value", T.StringType()),
        T.StructField("system", T.StringType()),
    ]
)

IDENTIFIER_TYPE = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("authority", T.StringType()),
    ]
)

PII_FIELDS = [
    T.StructField("record_id", T.StringType(), nullable=False),
    T.StructField("external_id", T.StringType()),
    T.StructField("birth_date", T.StringType()),  # ISO yyyy-MM-dd
    T.StructField("sex", T.StringType()),  # 'M' | 'F' | null
    T.StructField("name", T.ArrayType(NAME_TYPE)),
    T.StructField("address", T.ArrayType(ADDRESS_TYPE)),
    T.StructField("telecom", T.ArrayType(TELECOM_TYPE)),
    T.StructField("race", T.ArrayType(T.StringType())),
    T.StructField("identifiers", T.ArrayType(IDENTIFIER_TYPE)),
]

PII_SCHEMA = T.StructType(PII_FIELDS + [T.StructField("spans", T.ArrayType(SPAN_TYPE))])

# Client-supplied person metadata persisted alongside PII on every MPI
# insert (reference: src/recordlinker/models/mpi.py:44-50 columns,
# database/mpi_service.py:188-210,255-258 insert paths): an external
# person identifier plus its source label, which the reference fixes
# to "IRIS" whenever an identifier is present and leaves NULL
# otherwise.
EXTERNAL_PERSON_SOURCE = "IRIS"
EXTERNAL_PERSON_FIELDS = [
    T.StructField("external_person_id", T.StringType()),
    T.StructField("external_person_source", T.StringType()),
]

# ------------------------------------------------------------- mpi / outputs
# patients: pii columns + cluster label. person_id is a string label
# (seeded cluster id or minted CC label), not an auto-increment.
PATIENTS_EXTRA_FIELDS = [
    T.StructField("person_id", T.StringType()),
]

BLOCKING_VALUES_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType(), nullable=False),
        T.StructField("key_id", T.IntegerType(), nullable=False),
        T.StructField("value", T.StringType(), nullable=False),
    ]
)

PAIR_SCORES_SCHEMA = T.StructType(
    [
        T.StructField("record_id_l", T.StringType(), nullable=False),
        T.StructField("record_id_r", T.StringType(), nullable=False),
        T.StructField("pass_label", T.StringType(), nullable=False),
        T.StructField("score", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("grade", T.StringType()),
    ]
)

CLUSTERS_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.StringType(), nullable=False),
        T.StructField("person_id", T.StringType(), nullable=False),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("metric", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)
