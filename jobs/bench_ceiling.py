"""Largest-single-box PageRank run (BENCH.md "Largest single-box run").

Builds the deterministic synthetic graph at --multiplier (2000 => 300M
edges / 100k vertices) in a FRESH subprocess JVM and measures
steady-state iteration throughput for both physical strategies:

  * spmv='dataframe' — fully-distributed join+agg loop, partitions
    autotuned (tuned_partitions full-wave rule);
  * spmv='blocks'    — broadcast-vertex on-disk CSR blocks.

Usage: python jobs/bench_ceiling.py [--multiplier 2000] [--iters 6]
Prints one JSON line; paste the numbers into BENCH.md's ceiling section.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def run_worker(multiplier: int, iters: int, modes: list[str]) -> None:
    from jobs.bench_scaling import build_graph
    from pagerankproject_spark.graph.pagerank import pagerank
    from pagerankproject_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="ceiling",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_HEAP", "48g")
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    g = build_graph(spark, multiplier=multiplier)
    out = {
        "edges": g.num_edges,
        "vertices": g.n,
        "num_partitions": g.num_partitions,
        "build_wall_sec": round(time.time() - t0, 1),
        "cpus": cpus,
    }
    for mode in modes:
        t0 = time.time()
        res = pagerank(spark, g, epsilon=0.0, max_iterations=iters, spmv=mode)
        res.ranks.count()
        walls = [m["wall_sec"] for m in res.metrics]
        steady = statistics.median(walls[2:] if len(walls) > 3 else walls)
        out[mode] = {
            "sec_per_iteration_steady": round(steady, 3),
            "edges_per_sec_per_iteration": round(g.num_edges / steady, 1),
            "iter_walls": [round(w, 2) for w in walls],
            "total_wall_sec": round(time.time() - t0, 1),
        }
    print("CEILING " + json.dumps(out))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multiplier", type=int, default=2000)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--modes", default="dataframe,blocks")
    ap.add_argument("--worker", action="store_true")
    args = ap.parse_args()
    modes = args.modes.split(",")

    if args.worker:
        run_worker(args.multiplier, args.iters, modes)
        return

    proc = subprocess.run(
        [
            sys.executable, __file__, "--worker",
            "--multiplier", str(args.multiplier),
            "--iters", str(args.iters),
            "--modes", args.modes,
        ],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=str(REPO),
    )
    for line in proc.stdout.splitlines():
        if line.startswith("CEILING "):
            print(line[len("CEILING "):])
            return
    sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
    raise RuntimeError("ceiling worker produced no result")


if __name__ == "__main__":
    main()
