"""Decompose the one-box scaling gap: executor count vs busy cores.

The wide N->4N protocol (BENCH/BASELINE.md) conflates two variables:
going from ``local-cluster[1,2]`` to ``local-cluster[4,2]`` multiplies
the executor count (1 -> 4: remote-shuffle fraction 0% -> 75%,
broadcast deserialized 4x, four python-worker pools that don't share
the similarity memo) AND the busy-core count (2 -> 8: shared
memory-bus / hypervisor pressure).  This probe holds total cores and
total executor memory FIXED and varies only the split into executors:

    local-cluster[1,8]  local-cluster[2,4]  local-cluster[4,2]
    local-cluster[8,1]

at the same corpus, same job, same total heap.  Wall-clock deltas
across the row are pure executor-count overhead; scripts/probe_host.py
measures the busy-core artifact separately.

Usage: python scripts/probe_executor_grid.py [n_persons] [--configs 1x8,2x4,4x2,8x1]
Writes BENCH/executor_grid_<persons>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_scaling as bs  # noqa: E402  (RUN_ONE, corpus helpers)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_persons", type=int, nargs="?", default=1600000)
    ap.add_argument("--configs", default="1x8,2x4,4x2,8x1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--total-mb", type=int, default=49152,
                    help="total executor memory, split evenly across executors")
    args = ap.parse_args()

    bs.ensure_corpus(args.n_persons)
    bs.ensure_parsed(args.n_persons)
    bs.ensure_pkg_zip()
    script = bs.RUN_ONE.format(
        repo=bs.REPO, corpus=bs.corpus_dir(args.n_persons), pkg=bs.PKG_ZIP
    )

    results = {}
    for cfg in args.configs.split(","):
        k, c = (int(x) for x in cfg.split("x"))
        exec_mb = args.total_mb // k
        master = f"local-cluster[{k},{c},{exec_mb}]"
        env = dict(os.environ)
        env["SPARK_GRAFT_EXEC_MB"] = str(exec_mb)
        proc = subprocess.run(
            [sys.executable, "-c", script, master, str(k * c), str(args.runs)],
            capture_output=True, text=True, env=env,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-6000:])
            raise SystemExit(f"config {cfg} ({master}) failed rc={proc.returncode}")
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cfg] = json.loads(line)
        r = results[cfg]
        print(f"{cfg:>5} ({master}): median {r['seconds']}s runs {r['runs']} "
              f"pairs/s {r['pairs_per_sec']}", flush=True)

    report = {
        "n_persons": args.n_persons,
        "total_cores_per_config": None,
        "total_exec_mb": args.total_mb,
        "note": ("fixed total cores + fixed total executor memory; only the "
                 "executor split varies — wall deltas are executor-count "
                 "overhead (remote shuffle, broadcast duplication, per-"
                 "executor python worker pools)"),
        "configs": results,
    }
    out = os.path.join(bs.REPO, "BENCH", f"executor_grid_{args.n_persons}.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps({cfg: r["seconds"] for cfg, r in results.items()}))


if __name__ == "__main__":
    main()
