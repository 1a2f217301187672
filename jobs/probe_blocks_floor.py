"""One-off probe: decompose the blocks-SpMV per-iteration wall at 120M
edges into (a) raw no-op job launch on the same parts_df, (b) the full
blocks_spmv (broadcast + kernel + Arrow collect + scatter).

Usage: python jobs/probe_blocks_floor.py [--cpus 8] [--multiplier 800]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--multiplier", type=int, default=800)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import numpy as np

    from jobs.bench_scaling import build_graph, NUM_VERTICES
    from pagerankproject_spark.ingest.csr import blocks_spmv, write_npy_blocks
    from pagerankproject_spark.session import get_spark

    spark = get_spark(
        app_name="probe-blocks-floor",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
        extra_conf={"spark.driver.memory": "20g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    g = build_graph(spark, args.multiplier, args.cpus * 2)
    bdir = tempfile.mkdtemp(prefix="probe-blocks-")
    blocks = write_npy_blocks(spark, g, bdir)
    x = np.full(NUM_VERTICES, 1.0 / np.sqrt(NUM_VERTICES))

    # warm-up (JIT, page cache first touch)
    for _ in range(2):
        blocks_spmv(blocks, x)

    noop_walls = []
    for _ in range(args.reps):
        t0 = time.time()
        blocks.parts_df.count()
        noop_walls.append(time.time() - t0)

    spmv_walls = []
    for _ in range(args.reps):
        t0 = time.time()
        y = blocks_spmv(blocks, x)
        spmv_walls.append(time.time() - t0)

    print(
        "PROBE",
        {
            "cpus": args.cpus,
            "edges": g.num_edges,
            "noop_job_median": round(statistics.median(noop_walls), 3),
            "spmv_median": round(statistics.median(spmv_walls), 3),
            "noop_walls": [round(w, 3) for w in noop_walls],
            "spmv_walls": [round(w, 3) for w in spmv_walls],
            "y_sum": float(y.sum()),
        },
        flush=True,
    )
    blocks.cleanup()
    spark.stop()


if __name__ == "__main__":
    main()
