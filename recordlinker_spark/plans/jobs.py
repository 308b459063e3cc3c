"""spark-submit entry points — the batch equivalents of the reference's
REST surface (reference: src/recordlinker/routes/*, SURVEY §2.10).

    python -m recordlinker_spark.plans.jobs seed    --documents D --labels L --mpi M
    python -m recordlinker_spark.plans.jobs link    --documents D --mpi M --out O [--no-persist]
    python -m recordlinker_spark.plans.jobs match   --documents D --mpi M --out O
    python -m recordlinker_spark.plans.jobs cluster --documents D --out O
    python -m recordlinker_spark.plans.jobs tune    --mpi M --out O
    python -m recordlinker_spark.plans.jobs reset   --mpi M
    python -m recordlinker_spark.plans.jobs orphans --mpi M

Semantics mapping:
  seed    = POST /seed (bulk insert pre-labeled clusters, seed_router.py:28-88)
  link    = POST /link (link + persist, link_router.py:60-87)
  match   = POST /match (dry-run, link_router.py:125-149)
  cluster = batch bootstrap: all-pairs within blocks -> certain edges ->
            connected components (the batch analog of person merges,
            mpi_service.py:436-450)
  tune    = POST /tuning (tuning_router.py:45-95)
  reset   = DELETE /seed (mpi_service.py:453-468)
  orphans = GET orphaned patients/persons (mpi_service.py:502-547):
            patients with NULL person + persons with no patients

Run via ``spark-submit --py-files recordlinker_spark.zip`` on a
cluster, or plain ``python`` locally (a local session is created when
none exists).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recordlinker_spark.config import Algorithm, dibbs_default
from recordlinker_spark.plans.replay import MPI_SCHEMA
from recordlinker_spark.sources.ingest import parse_documents


def _spark() -> SparkSession:
    return (
        SparkSession.builder.appName("recordlinker-spark-job")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def _read_mpi(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.schema(MPI_SCHEMA).parquet(path).dropDuplicates(
            ["record_id"]
        )
    except Exception:
        return spark.createDataFrame([], MPI_SCHEMA)


def job_seed(spark: SparkSession, args) -> None:
    """documents + (record_id, person_id) labels -> MPI append (S3)."""
    records = parse_documents(spark.read.parquet(args.documents))
    labels = spark.read.parquet(args.labels)
    out = records.join(labels, "record_id")
    out.select(*[f.name for f in MPI_SCHEMA.fields]).write.mode("append").parquet(
        args.mpi
    )


def job_link(spark: SparkSession, args, persist: bool = True) -> None:
    from recordlinker_spark.operators.linkjob import link_batch

    records = parse_documents(spark.read.parquet(args.documents))
    mpi = _read_mpi(spark, args.mpi)
    out = link_batch(records, mpi, _algorithm(args))
    out.decisions.write.mode("overwrite").parquet(args.out)
    if persist:
        out.new_patients.select(*[f.name for f in MPI_SCHEMA.fields]).write.mode(
            "append"
        ).parquet(args.mpi)


def job_cluster(spark: SparkSession, args) -> None:
    """Corpus bootstrap: dedupe a whole documents table into persons."""
    from recordlinker_spark.operators.blocking import candidate_pairs
    from recordlinker_spark.operators.cluster import assign_persons
    from recordlinker_spark.operators.linkjob import prepare_incoming, prepare_mpi
    from recordlinker_spark.operators.scoring import attach_pair_features, score_pairs

    algorithm = _algorithm(args)
    records = parse_documents(spark.read.parquet(args.documents)).cache()
    # self-linkage: every record probes against every record
    inc_feats, inc_bk = prepare_incoming(records, algorithm)
    selfmpi = records.withColumn("person_id", F.col("record_id"))
    mpi_feats, mpi_bk = prepare_mpi(selfmpi, algorithm)

    edges = None
    for algorithm_pass in algorithm.passes:
        pairs = candidate_pairs(inc_bk, mpi_bk, algorithm, algorithm_pass).filter(
            F.col("record_id_l") < F.col("record_id_r")
        )
        scored = score_pairs(
            attach_pair_features(pairs, inc_feats, mpi_feats, algorithm_pass),
            algorithm,
            algorithm_pass,
        )
        _, cmt = algorithm_pass.possible_match_window
        max_points = algorithm.max_points(algorithm_pass)
        certain = scored.filter(
            F.col("score") / F.lit(max_points) >= F.lit(cmt)
        ).select("record_id_l", "record_id_r")
        edges = certain if edges is None else edges.unionByName(certain)

    labels = assign_persons(records, edges)
    labels.write.mode("overwrite").parquet(args.out)


def job_tune(spark: SparkSession, args) -> None:
    from recordlinker_spark.operators.tuning import tune

    mpi = _read_mpi(spark, args.mpi)
    result = tune(
        mpi,
        _algorithm(args),
        n_true_pairs=args.n_pairs,
        n_non_pairs=args.n_pairs,
    )
    with open(args.out, "w") as fh:
        json.dump(
            {
                "log_odds": result.log_odds,
                "bounds": {k: list(v) for k, v in result.bounds.items()},
                "true_pairs": result.true_pairs,
                "non_pairs": result.non_pairs,
            },
            fh,
            indent=2,
        )


def job_reset(spark: SparkSession, args) -> None:
    shutil.rmtree(args.mpi, ignore_errors=True)


def _rewrite_mpi(df: DataFrame, path: str) -> None:
    """Replace the MPI table contents (parquet is immutable: write a
    sibling then swap — the batch analog of a transactional delete)."""
    import os

    tmp = path.rstrip("/") + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def job_delete(spark: SparkSession, args) -> None:
    """Granular deletes — the batch analog of DELETE /patient/{id} and
    DELETE /person/{id} (mpi_service.py:464-499, patient_router.py:187-203).

    * ``--record-ids``: drop those patients from the MPI (blocking
      values are derived at link time, so nothing else to clean).
    * ``--person-ids``: refuse while the person still has patients
      (the reference's check_person_for_patients guard,
      mpi_service.py:493-499); with a ``--persons`` registry, remove
      the ids from it.
    """
    mpi = _read_mpi(spark, args.mpi)
    report: dict = {}
    if getattr(args, "record_ids", None):
        ids = [s for s in args.record_ids.split(",") if s]
        kept = mpi.filter(~F.col("record_id").isin(ids))
        report["patients_deleted"] = mpi.count() - kept.count()
        _rewrite_mpi(kept, args.mpi)
        mpi = _read_mpi(spark, args.mpi)
    if getattr(args, "person_ids", None):
        ids = [s for s in args.person_ids.split(",") if s]
        with_patients = [
            r["person_id"]
            for r in mpi.filter(F.col("person_id").isin(ids))
            .select("person_id")
            .distinct()
            .collect()
        ]
        if with_patients:
            raise ValueError(
                f"Persons still have patients: {sorted(with_patients)}"
            )
        report["persons_deleted"] = len(ids)
        if getattr(args, "persons", None):
            persons = spark.read.parquet(args.persons)
            _rewrite_mpi(
                persons.filter(~F.col("person_id").isin(ids)), args.persons
            )
    print(json.dumps(report))


def job_orphans(spark: SparkSession, args) -> None:
    """Orphaned patients (NULL person, mpi_service.py:502-521) and —
    when a persons registry is given — orphaned persons: registry ids
    with no patient (mpi_service.py:524-547, the NOT EXISTS anti-join
    re-expressed as a left-anti join)."""
    mpi = _read_mpi(spark, args.mpi)
    orphan_patients = mpi.filter(F.col("person_id").isNull())
    report = {
        "orphaned_patients": orphan_patients.count(),
        "orphaned_patient_ids": [
            r["record_id"]
            for r in orphan_patients.select("record_id")
            .orderBy("record_id")
            .limit(50)
            .collect()
        ],
    }
    if getattr(args, "persons", None):
        persons = spark.read.parquet(args.persons).select("person_id").distinct()
        orphan_persons = persons.join(
            mpi.select("person_id").filter(F.col("person_id").isNotNull()),
            "person_id",
            "left_anti",
        )
        report["orphaned_persons"] = orphan_persons.count()
        report["orphaned_person_ids"] = [
            r["person_id"]
            for r in orphan_persons.orderBy("person_id").limit(50).collect()
        ]
    print(json.dumps(report))


def _algorithm(args) -> Algorithm:
    """--algorithm JSON (reference config format, validated) or the
    built-in dibbs-default (assets/testing_algorithms.json parity)."""
    path = getattr(args, "algorithm", None)
    if not path:
        return dibbs_default()
    from recordlinker_spark.algorithms import load_algorithm

    return load_algorithm(path, getattr(args, "algorithm_label", None))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="recordlinker-spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in (
        "seed", "link", "match", "cluster", "tune", "reset", "orphans", "delete",
    ):
        sp = sub.add_parser(name)
        sp.add_argument("--documents")
        sp.add_argument("--labels")
        sp.add_argument("--mpi")
        sp.add_argument("--out")
        sp.add_argument("--n-pairs", type=int, default=1000)
        sp.add_argument("--algorithm", help="algorithm-config JSON path")
        sp.add_argument("--persons", help="persons registry parquet (orphans)")
        sp.add_argument("--record-ids", help="comma-joined patient ids (delete)")
        sp.add_argument("--person-ids", help="comma-joined person ids (delete)")
        sp.add_argument(
            "--algorithm-label", help="label to pick from a multi-algorithm file"
        )
    args = p.parse_args(argv)
    spark = _spark()
    if args.cmd == "seed":
        job_seed(spark, args)
    elif args.cmd == "link":
        job_link(spark, args, persist=True)
    elif args.cmd == "match":
        job_link(spark, args, persist=False)
    elif args.cmd == "cluster":
        job_cluster(spark, args)
    elif args.cmd == "tune":
        job_tune(spark, args)
    elif args.cmd == "reset":
        job_reset(spark, args)
    elif args.cmd == "orphans":
        job_orphans(spark, args)
    elif args.cmd == "delete":
        job_delete(spark, args)


if __name__ == "__main__":
    main()
