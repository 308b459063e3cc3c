"""Quantify the one-box concurrency artifact outside Spark.

The scaling protocol's non-scaling term F (BENCH/BASELINE.md) grows
with corpus size even though the AQE stage count saturates; the
suspected cause is per-core slowdown when more host cores are busy
(hypervisor steal / shared memory bus / LLC).  This probe measures it
directly: N identical worker processes, each taskset-pinned to its own
core, each running a fixed-size kernel; report per-worker throughput
vs busy-core count.

Two kernels bracket the workload spectrum:
* cpu  — tight integer/float loop over a small (L1-resident) numpy
  array: pure ALU, no memory pressure.  Any slowdown here is
  frequency/steal, not bandwidth.
* mem  — streaming sum over a 256 MB array (far beyond LLC): bound by
  DRAM bandwidth, the worst case for bus sharing.

Usage: python scripts/probe_host.py [--counts 2,4,8,16,32] [--reps 3]
Writes BENCH/host_probe.json and prints a table.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys, time
import numpy as np

kind = sys.argv[1]
seconds = float(sys.argv[2])
if kind == "cpu":
    a = np.arange(4096, dtype=np.float64)  # 32 KB: L1-resident
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < seconds:
        # ~4096 fused mul-adds per iteration, no allocation
        a *= 1.0000001
        a[0] += 1e-12
        iters += 1
    dt = time.perf_counter() - t0
    print(iters * 4096 / dt)  # element-ops/sec
elif kind == "mem":
    a = np.ones(32 * 1024 * 1024, dtype=np.float64)  # 256 MB stream
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < seconds:
        float(a.sum())
        iters += 1
    dt = time.perf_counter() - t0
    print(iters * a.nbytes / dt / 1e9)  # GB/s read per worker
else:
    raise SystemExit(f"unknown kernel {kind}")
"""


def run_level(kind: str, n_busy: int, seconds: float) -> list[float]:
    procs = []
    for i in range(n_busy):
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", str(i), sys.executable, "-c", WORKER,
                 kind, str(seconds)],
                stdout=subprocess.PIPE, text=True,
            )
        )
    vals = []
    for p in procs:
        out, _ = p.communicate()
        if p.returncode != 0:
            raise SystemExit(f"worker failed rc={p.returncode}")
        vals.append(float(out.strip()))
    return vals


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--counts", default="2,4,8,16,32")
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    counts = [int(c) for c in args.counts.split(",")]

    report: dict = {"host_cores": os.cpu_count(), "kernels": {}}
    for kind in ("cpu", "mem"):
        rows = {}
        for n in counts:
            per_worker = []
            for _ in range(args.reps):
                vals = run_level(kind, n, args.seconds)
                per_worker.append(statistics.median(vals))
            rows[n] = round(statistics.median(per_worker), 3)
        base = rows[counts[0]]
        report["kernels"][kind] = {
            "unit": "elem-ops/s/worker" if kind == "cpu" else "GB/s/worker",
            "per_worker_throughput": rows,
            "relative_to_first": {
                n: round(v / base, 4) for n, v in rows.items()
            },
        }
        print(f"[{kind}] per-worker throughput by busy-core count:")
        for n, v in rows.items():
            print(f"  {n:3d} busy: {v:14.3f}  ({v / base:.3f}x of {counts[0]}-busy)")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "host_probe.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
