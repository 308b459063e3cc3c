"""Per-phase scaling profiler for the link job.

Runs the identical 400k-person workload as scripts/bench_scaling.py but
materializes each pipeline phase separately (cache + count) so the
phase wall-times at local[2] vs local[8] expose which stage fails to
scale.  Diagnostic only — the official number stays bench_scaling.py.

Usage: python scripts/profile_link.py [n_persons] [cpus ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = os.environ.get("SPARK_GRAFT_SCALE_CORPUS", "/tmp/rlspark_scale_corpus")

RUN_ONE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F

master = sys.argv[1]
cpus = int(sys.argv[2])
spark = (SparkSession.builder.master(master)
         .appName(f"rlspark-profile-{{cpus}}")
         .config("spark.sql.shuffle.partitions", str(max(cpus * 4, 16)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "24g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
if master.startswith("local-cluster"):
    spark.sparkContext.addPyFile("/tmp/recordlinker_spark_pkg.zip")

from recordlinker_spark.config import dibbs_default
from recordlinker_spark.sources.ingest import parse_documents
from recordlinker_spark.operators.linkjob import prepare_incoming, prepare_mpi
from recordlinker_spark.operators.blocking import candidate_pairs
from recordlinker_spark.operators.scoring import attach_pair_features, score_pairs
from recordlinker_spark.operators.decide import cluster_scores, decide, fold_passes

docs = spark.read.parquet({corpus!r})
records = parse_documents(docs.select("doc_id", "spans")).drop("spans")
split = F.abs(F.xxhash64("record_id")) % 5
incoming = records.filter(split == 0)
truth = docs.select(F.col("doc_id").alias("record_id"), "person_key")
mpi = records.filter(split != 0).join(truth, "record_id") \
    .withColumnRenamed("person_key", "person_id")
incoming = incoming.cache(); mpi = mpi.cache()
incoming.count(); mpi.count()
alg = dibbs_default()

phases = {{}}
def tick(name, fn):
    t0 = time.perf_counter()
    out = fn()
    phases[name] = phases.get(name, 0.0) + round(time.perf_counter() - t0, 3)
    return out

def mat(df):
    df = df.cache(); df.count(); return df

def run_once(record):
    t = {{}}
    def tk(name, fn):
        t0 = time.perf_counter(); out = fn(); t[name] = round(time.perf_counter()-t0,3)
        return out
    inc_feats, inc_bk = prepare_incoming(incoming, alg)
    mpi_feats, mpi_bk = prepare_mpi(mpi, alg)
    inc_bk = tk("1_inc_bk", lambda: mat(inc_bk))
    mpi_bk = tk("2_mpi_bk", lambda: mat(mpi_bk))
    inc_feats = tk("3_inc_feats", lambda: mat(inc_feats))
    mpi_feats = tk("4_mpi_feats", lambda: mat(mpi_feats))
    per_pass = []
    for i, p in enumerate(alg.passes, 1):
        pairs = tk(f"5_block_p{i}", lambda: mat(candidate_pairs(inc_bk, mpi_bk, alg, p)))
        feats = tk(f"6_attach_p{i}", lambda: mat(attach_pair_features(pairs, inc_feats, mpi_feats, p)))
        scored = tk(f"7_score_p{i}", lambda: mat(score_pairs(feats, alg, p)))
        per_pass.append(tk(f"8_cluster_p{i}", lambda: mat(cluster_scores(scored, alg, p))))
    folded = fold_passes(per_pass)
    tk("9_decide", lambda: decide(folded, incoming, alg.context.include_multiple_matches)[0].count())
    if record:
        for k, v in t.items():
            phases[k] = v
    spark.catalog.clearCache()
    incoming.cache().count(); mpi.cache().count()

run_once(record=False)   # warmup
t0 = time.perf_counter()
run_once(record=True)
phases["total"] = round(time.perf_counter() - t0, 3)
print(json.dumps({{"cpus": cpus, "phases": phases}}))
spark.stop()
"""


def main() -> None:
    n_persons = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
    mode = os.environ.get("SPARK_GRAFT_SCALE_MODE", "threads")
    if mode == "executors":
        levels = {2: "local-cluster[1,2,12288]", 8: "local-cluster[4,2,12288]"}
    else:
        levels = {2: "local[2]", 8: "local[8]"}
    cpus_list = [int(c) for c in sys.argv[2:]] or [2, 8]
    sys.path.insert(0, REPO)
    from scripts.bench_scaling import ensure_corpus

    ensure_corpus(n_persons)
    script = RUN_ONE.format(repo=REPO, corpus=CORPUS)
    results = {}
    for cpus in cpus_list:
        proc = subprocess.run(
            [sys.executable, "-c", script, levels[cpus], str(cpus)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(json.dumps(results[cpus]))
    if len(cpus_list) == 2:
        a, b = cpus_list
        pa, pb = results[a]["phases"], results[b]["phases"]
        print(f"\n{'phase':<16}{a:>8}c {b:>8}c   speedup")
        for k in sorted(pa):
            su = pa[k] / pb[k] if pb.get(k) else float("nan")
            print(f"{k:<16}{pa[k]:>8.2f} {pb.get(k, 0):>8.2f}   {su:>6.2f}x")


if __name__ == "__main__":
    main()
