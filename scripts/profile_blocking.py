"""Sub-step profiler for blocked_persons: which part of the blocking
join fails to scale 2c -> 8c. Diagnostic only."""

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

cpus = int(sys.argv[1])
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .appName(f"rlspark-blockprof-{{cpus}}")
         .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "24g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from recordlinker_spark.config import dibbs_default
from recordlinker_spark.sources.ingest import parse_documents
from recordlinker_spark.operators.linkjob import prepare_incoming, prepare_mpi
from recordlinker_spark.operators import blocking as B

docs = spark.read.parquet({corpus!r})
records = parse_documents(docs.select("doc_id", "spans"))
split = F.abs(F.xxhash64("record_id")) % 5
incoming = records.filter(split == 0)
truth = docs.select(F.col("doc_id").alias("record_id"), "person_key")
mpi = records.filter(split != 0).join(truth, "record_id") \
    .withColumnRenamed("person_key", "person_id")
alg = dibbs_default()
inc_feats, inc_bk = prepare_incoming(incoming, alg)
mpi_feats, mpi_bk = prepare_mpi(mpi, alg)
inc_bk = inc_bk.cache(); inc_bk.count()
mpi_bk = mpi_bk.cache(); mpi_bk.count()

p = alg.passes[0]
keys = p.blocking_keys
t = {{}}
def tk(name, fn):
    t0 = time.perf_counter(); out = fn(); t[name] = round(time.perf_counter()-t0,3)
    return out

def run(tag):
    inc = B.missingness_filter(inc_bk, alg, p)
    inc = inc.select("record_id", "_subset", *[f"bk_{{k}}" for k in keys])
    subsets = tk(f"{{tag}}a_subsets", lambda: [
        tuple(s["_subset"].split(","))
        for s in inc.select("_subset").distinct().collect() if s["_subset"]
    ])
    mpi_sel = mpi_bk.select("record_id", "person_id", *[f"bk_{{k}}" for k in keys])
    tk(f"{{tag}}b_count", lambda: mpi_sel.count())
    # census per subset
    def census():
        out = 0
        for subset in subsets:
            build = B.composite_values(mpi_sel, subset).select("person_id", "_block")
            frac = 0.04
            c = (build.sample(fraction=frac, seed=42).groupBy("_block").count()
                 .filter((F.col("count")/frac) > 2500).orderBy(F.desc("count"))
                 .limit(1024).collect())
            out += len(c)
        return out
    nhot = tk(f"{{tag}}c_census", census)
    blocked = B.blocked_persons(inc_bk, mpi_bk, alg, p)
    tk(f"{{tag}}d_blocked_full", lambda: blocked.count())
    pairs = B.candidate_pairs(inc_bk, mpi_bk, alg, p)
    tk(f"{{tag}}e_pairs_full", lambda: pairs.count())
    return nhot, subsets

nhot, subsets = run("w")   # warmup
nhot, subsets = run("m")   # measured
t["hot"] = nhot
t["subsets"] = len(subsets)
print(json.dumps({{"cpus": cpus, "t": t}}))
spark.stop()
"""


def main() -> None:
    cpus_list = [int(c) for c in sys.argv[1:]] or [2, 8]
    script = RUN_ONE.format(repo=REPO, corpus=CORPUS)
    for cpus in cpus_list:
        proc = subprocess.run(
            [sys.executable, "-c", script, str(cpus)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        print(line)


if __name__ == "__main__":
    main()
