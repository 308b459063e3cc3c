"""Algorithm-accuracy harness: seed CSV + labeled test CSV -> F1.

Port of the reference's manual accuracy workflow
(tests/algorithm/scripts/run_test.py + calculate_metrics.py:1-80):
each seed row becomes its own single-record Person cluster
(seed_db.py:7-34), each test row links against the seeded MPI, and the
final grade is scored against ``Expected Result``:

    TP: certain & match        FN: certainly-not & match
    TN: certainly-not & no_match   FP: certain & no_match
    possible-grade / possible_match rows tracked separately (manual
    review in the reference workflow)

Field mapping mirrors scripts/helpers.py:dict_to_pii — notably the
harness's ``ssn``/``race`` keys never reach PIIRecord identifiers/race
(pydantic extra="allow" swallows ``ssn``; dibbs-default uses neither),
so SSN is NOT an identifier here, exactly as in the reference harness.

Also computes the BASELINE.json headline: pairwise F1 over labeled
pairs at identical blocking keys — every (test record, seeded patient)
pair produced by blocking is labeled by Match Id equality and
predicted by its pair grade.
"""

from __future__ import annotations

import dataclasses
import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recordlinker_spark.config import Algorithm, dibbs_default
from recordlinker_spark.operators.linkjob import link_batch
from recordlinker_spark.sources.ingest import parse_documents
from recordlinker_spark.schemas import DOCUMENTS_SCHEMA
from recordlinker_spark.sources.spandoc import docs_to_rows


def csv_row_to_pii(row: dict) -> dict:
    """scripts/helpers.py:dict_to_pii semantics (ssn/race dropped)."""
    return {
        "external_id": row.get("ID") or None,
        "birth_date": row.get("BIRTHDATE") or None,
        "sex": row.get("GENDER") or None,
        "address": [
            {
                "line": (row.get("ADDRESS") or "").split(","),
                "city": row.get("CITY") or None,
                "state": row.get("STATE") or None,
                "county": row.get("COUNTY") or None,
                "postal_code": str(row.get("ZIP") or ""),
            }
        ],
        "name": [
            {
                "given": [row.get("FIRST") or ""],
                "family": row.get("LAST") or None,
                "suffix": [row.get("SUFFIX") or ""],
            }
        ],
    }


def load_labeled_records(
    spark: SparkSession, csv_path: str, id_prefix: str,
    today: datetime.date | None = None,
) -> DataFrame:
    """CSV -> parsed pii records + ``match_id`` (+ ``expected`` when the
    CSV carries Expected Result). Encodes through span documents so the
    full ingest path is exercised.

    :param today: pins the birthdate parser's clock.  The reference's
        own validator (schemas/pii.py:423 ``parse(str(value), ...)``)
        fills MISSING date components from the day it runs — a
        year-month birthdate like better_test.csv's ``1964-10`` parses
        to a different day every day — so exact confusion counts are
        only reproducible with a pinned clock, here as there."""
    import csv as _csv

    with open(csv_path, newline="", encoding="utf-8") as fh:
        rows = list(_csv.DictReader(fh))
    docs = []
    meta = []
    for i, row in enumerate(rows):
        rid = f"{id_prefix}{i}"
        docs.append((rid, csv_row_to_pii(row), []))
        # a blank Match Id means UNLABELED, not "shares the '' cluster
        # with every other blank row" — fall back to a per-row id so
        # each such seed stays its own single-record Person cluster and
        # no blank==blank pair is labeled a true match
        mid = str(row.get("Match Id", "")).strip() or f"solo-{rid}"
        meta.append(
            (rid, mid, (row.get("Expected Result") or "").strip() or None)
        )
    records = parse_documents(
        spark.createDataFrame(docs_to_rows(docs), DOCUMENTS_SCHEMA),
        today=today,
    )
    meta_df = spark.createDataFrame(
        meta, "record_id string, match_id string, expected string"
    )
    return records.join(meta_df, "record_id")


@dataclasses.dataclass
class AccuracyReport:
    tp: int
    tn: int
    fp: int
    fn: int
    possible_pred: int  # rows we graded possible
    sensitivity: float
    specificity: float
    f1: float
    ppv: float
    # pairwise metrics over blocked labeled pairs
    pair_tp: int = 0
    pair_fp: int = 0
    pair_fn: int = 0
    pair_f1: float = 0.0


def run_accuracy(
    spark: SparkSession,
    seed_csv: str,
    test_csv: str,
    algorithm: Algorithm | None = None,
    today: datetime.date | None = None,
) -> AccuracyReport:
    algorithm = algorithm or dibbs_default()
    seed = load_labeled_records(spark, seed_csv, "s", today=today)
    test = load_labeled_records(spark, test_csv, "t", today=today)

    mpi = seed.withColumn("person_id", F.col("match_id")).drop(
        "match_id", "expected"
    )
    incoming = test.drop("match_id", "expected")
    # keep_pair_scores + cache: ONE blocking+scoring computation feeds
    # both the decision metrics and the pairwise-F1 section (the old
    # code re-ran prepare/block/score per pass, doubling the job)
    out = link_batch(
        incoming, mpi, algorithm, keep_pair_scores=True, cache_intermediate=True
    )

    labeled = out.decisions.join(
        test.select("record_id", "match_id", "expected"), "record_id"
    )
    agg = labeled.agg(
        F.sum(
            ((F.col("final_grade") == "certain") & (F.col("expected") == "match")).cast("int")
        ).alias("tp"),
        F.sum(
            ((F.col("final_grade") == "certainly-not") & (F.col("expected") == "no_match")).cast("int")
        ).alias("tn"),
        F.sum(
            ((F.col("final_grade") == "certain") & (F.col("expected") == "no_match")).cast("int")
        ).alias("fp"),
        F.sum(
            ((F.col("final_grade") == "certainly-not") & (F.col("expected") == "match")).cast("int")
        ).alias("fn"),
        F.sum((F.col("final_grade") == "possible").cast("int")).alias("pp"),
    ).collect()[0]
    tp, tn, fp, fn, pp = agg["tp"], agg["tn"], agg["fp"], agg["fn"], agg["pp"]

    # ---- pairwise F1 at identical blocking keys (BASELINE headline):
    # reuses the per-pass scored pairs link_batch already computed
    pred = F.lit(False)
    for algorithm_pass in algorithm.passes:
        _, cmt = algorithm_pass.possible_match_window
        max_points = algorithm.max_points(algorithm_pass)
        pred = pred | (
            (F.col("pass_label") == algorithm_pass.resolved_label)
            & (F.col("score") / F.lit(max_points) >= F.lit(cmt))
        )
    # best grade across passes per pair
    pair_pred = (
        out.pair_scores.select("record_id_l", "record_id_r", pred.alias("pred"))
        .groupBy("record_id_l", "record_id_r")
        .agg(F.max(F.col("pred").cast("int")).alias("pred"))
    )
    truth = pair_pred.join(
        test.select(F.col("record_id").alias("record_id_l"),
                    F.col("match_id").alias("mid_l")), "record_id_l"
    ).join(
        seed.select(F.col("record_id").alias("record_id_r"),
                    F.col("match_id").alias("mid_r")), "record_id_r"
    ).withColumn("label", (F.col("mid_l") == F.col("mid_r")).cast("int"))
    pagg = truth.agg(
        F.sum(((F.col("pred") == 1) & (F.col("label") == 1)).cast("int")).alias("tp"),
        F.sum(((F.col("pred") == 1) & (F.col("label") == 0)).cast("int")).alias("fp"),
        F.sum(((F.col("pred") == 0) & (F.col("label") == 1)).cast("int")).alias("fn"),
    ).collect()[0]
    ptp, pfp, pfn = pagg["tp"], pagg["fp"], pagg["fn"]

    def safe(n, d):
        return float(n) / d if d else 0.0

    return AccuracyReport(
        tp=tp, tn=tn, fp=fp, fn=fn, possible_pred=pp,
        sensitivity=safe(tp, tp + fn),
        specificity=safe(tn, tn + fp),
        f1=safe(2 * tp, 2 * tp + fp + fn),
        ppv=safe(tp, tp + fp),
        pair_tp=ptp, pair_fp=pfp, pair_fn=pfn,
        pair_f1=safe(2 * ptp, 2 * ptp + pfp + pfn),
    )
