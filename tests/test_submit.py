"""Literal ``spark-submit --py-files`` packaging smoke test.

The north-rule deployment mode is ``spark-submit --py-files
recordlinker_spark.zip`` on a multi-executor cluster.  The scaling
protocol exercises the equivalent (``sc.addPyFile`` of the same zip on
``local-cluster``); this test runs the REAL thing end-to-end: zip the
package, write a driver file, launch it through the ``spark-submit``
binary against a separate-JVM ``local-cluster[2,2,1024]`` master with
``--py-files``, and assert the link job's decisions from the cold
process.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import json, sys
from pyspark.sql import SparkSession, functions as F

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

# imports resolve from the --py-files zip on executors AND driver
from recordlinker_spark.config import dibbs_default
from recordlinker_spark.synth import synth_documents
from recordlinker_spark.sources.ingest import parse_documents
from recordlinker_spark.operators.linkjob import link_batch

docs = synth_documents(spark, 200, seed=7, partitions=4)
records = parse_documents(docs.select("doc_id", "spans")).drop("spans")
split = F.abs(F.xxhash64("record_id")) % 5
incoming = records.filter(split == 0)
truth = docs.select(F.col("doc_id").alias("record_id"), "person_key")
mpi = (records.filter(split != 0).join(truth, "record_id")
       .withColumnRenamed("person_key", "person_id"))
out = link_batch(incoming, mpi, dibbs_default(), keep_pair_scores=True)
print("RESULT " + json.dumps({
    "incoming": incoming.count(),
    "pairs": out.pair_scores.count(),
    "decisions": out.decisions.count(),
    "grades": {r["final_grade"] or "none": r["n"] for r in
               out.decisions.groupBy("final_grade")
               .agg(F.count("*").alias("n")).collect()},
}))
spark.stop()
"""


def _spark_submit_bin() -> str | None:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    try:
        import pyspark
    except ImportError:
        return None
    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.mark.skipif(_spark_submit_bin() is None, reason="spark-submit not found")
def test_spark_submit_py_files(tmp_path):
    pkg_zip = str(tmp_path / "recordlinker_spark.zip")
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "recordlinker_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    driver_py = tmp_path / "driver.py"
    driver_py.write_text(DRIVER)

    env = dict(os.environ)
    # keep the child cluster small; don't inherit the test session's conf
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [_spark_submit_bin(),
         "--master", "local-cluster[2,2,1024]",
         "--conf", "spark.executor.memory=1g",
         "--conf", "spark.driver.memory=2g",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", pkg_zip,
         str(driver_py)],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
    assert line, proc.stdout[-2000:]
    res = json.loads(line[-1][len("RESULT "):])
    assert res["incoming"] > 0
    assert res["pairs"] > 0
    assert res["decisions"] == res["incoming"]
    # synthetic dup corpus must yield real matches, not all-new persons
    assert res["grades"].get("certain", 0) > 0
