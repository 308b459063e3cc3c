"""Contention-matched executor scaling: replicas vs a coordinated job.

The wide N->4N protocol (BENCH/BASELINE.md) compares 2 busy host
cores against 8 busy host cores, so the one-box per-core slowdown
(measured by scripts/probe_host.py: 0.772x ALU / 0.864x DRAM at 8
busy vs 2) books into the "non-scaling" term.  This protocol cancels
that artifact BY CONSTRUCTION instead of dividing it out:

* **N side**: FOUR independent copies of the single-executor job
  (``local-cluster[1,2,M]``), run concurrently, each taskset-pinned
  to its own disjoint 3-core set (2 executor cores + driver) — 12
  pinned cores busy.
* **4N side**: ONE job with four executors (``local-cluster[4,2,M]``),
  taskset-pinned to the same 12-core budget.

Both sides see identical hardware pressure (12 busy cores of 32,
same per-executor core count and heap, same total heap); the ONLY
variable is whether the four executors cooperate in one job or run
as zero-coordination replicas.  That is exactly the north-rule
question — does the job scale from N to 4N executors — measured
against the ideal baseline of perfect replication:

    efficiency = aggregate pairs/s of the 4-executor job
               / aggregate pairs/s of 4 independent 1-executor replicas
               = median(T_replica) / (4 * T_4N)

A real multi-host cluster pays the coordination cost this measures
(remote shuffle, broadcast duplication, barrier stages) but NOT the
shared-bus cost the wide protocol conflates with it.

Usage: python scripts/bench_matched.py [n_persons] [--replica-runs 2]
       [--coord-runs 3] [--exec-mb 12288] [--driver-mb 8192]
Writes BENCH/scaling_matched_<persons>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_scaling as bs  # noqa: E402

# disjoint 3-core pins for the four replicas; the coordinated job gets
# the union, so both sides have the same 12-core budget
REPLICA_PINS = ["0-2", "3-5", "6-8", "9-11"]
COORD_PIN = "0-11"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_persons", type=int, nargs="?", default=1600000)
    ap.add_argument("--replica-runs", type=int, default=2)
    ap.add_argument("--coord-runs", type=int, default=3)
    ap.add_argument("--exec-mb", type=int, default=12288)
    ap.add_argument("--driver-mb", type=int, default=8192)
    ap.add_argument("--tag", default="", help="output-file suffix, e.g. "
                    "_t2 for an independent reproducibility trial")
    args = ap.parse_args()

    bs.ensure_corpus(args.n_persons)
    bs.ensure_parsed(args.n_persons)
    bs.ensure_pkg_zip()
    script = bs.RUN_ONE.format(
        repo=bs.REPO, corpus=bs.corpus_dir(args.n_persons), pkg=bs.PKG_ZIP
    )
    env = dict(os.environ)
    env["SPARK_GRAFT_EXEC_MB"] = str(args.exec_mb)
    env["SPARK_GRAFT_DRIVER_MB"] = str(args.driver_mb)

    # --- N side: four concurrent pinned replicas -------------------
    master_n = f"local-cluster[1,2,{args.exec_mb}]"
    procs = []
    for i, pin in enumerate(REPLICA_PINS):
        errf = open(f"/tmp/rlspark_matched_{args.n_persons}_r{i}.err", "w")
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", pin, sys.executable, "-c", script,
                 master_n, "2", str(args.replica_runs)],
                stdout=subprocess.PIPE, stderr=errf, text=True, env=env,
            )
        )
    replicas = []
    for i, p in enumerate(procs):
        out, _ = p.communicate()
        if p.returncode != 0:
            raise SystemExit(
                f"replica {i} failed rc={p.returncode}; see "
                f"/tmp/rlspark_matched_{args.n_persons}_r{i}.err")
        replicas.append(json.loads(
            [l for l in out.splitlines() if l.startswith("{")][-1]))
        print(f"replica {i}: median {replicas[i]['seconds']}s "
              f"runs {replicas[i]['runs']}", flush=True)

    all_replica_walls = sorted(w for r in replicas for w in r["runs"])
    t_replica = statistics.median(all_replica_walls)
    pairs = replicas[0]["pairs"]

    # --- 4N side: one coordinated job on the same core budget ------
    master_c = f"local-cluster[4,2,{args.exec_mb}]"
    errf = open(f"/tmp/rlspark_matched_{args.n_persons}_coord.err", "w")
    proc = subprocess.run(
        ["taskset", "-c", COORD_PIN, sys.executable, "-c", script,
         master_c, "8", str(args.coord_runs)],
        stdout=subprocess.PIPE, stderr=errf, text=True, env=env,
    )
    if proc.returncode != 0:
        raise SystemExit(
            f"coordinated level failed rc={proc.returncode}; see "
            f"/tmp/rlspark_matched_{args.n_persons}_coord.err")
    coord = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    print(f"coordinated: median {coord['seconds']}s runs {coord['runs']}",
          flush=True)

    eff = t_replica / (4.0 * coord["seconds"])
    report = {
        "mode": "matched",
        "corpus_persons": args.n_persons,
        "exec_mb": args.exec_mb,
        "driver_mb": args.driver_mb,
        "note": ("4 independent pinned 1-executor replicas (12 busy cores) "
                 "vs 1 pinned 4-executor job (same 12-core budget, same "
                 "per-executor shape/heap): host contention identical at "
                 "both levels, only executor coordination varies"),
        "replica_walls_all": all_replica_walls,
        "replica_median_s": t_replica,
        "replicas": replicas,
        "coordinated": coord,
        "pairs": pairs,
        "scaling_efficiency": round(eff, 3),
    }
    out_path = os.path.join(
        bs.REPO, "BENCH",
        f"scaling_matched_{args.n_persons}{args.tag}.json")
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps({"persons": args.n_persons,
                      "replica_median_s": t_replica,
                      "coord_median_s": coord["seconds"],
                      "scaling_efficiency": report["scaling_efficiency"]}))


if __name__ == "__main__":
    main()
