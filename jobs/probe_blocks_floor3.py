"""Probe 3: where does the per-task mapInArrow round-trip cost live?

Runs a trivial mapInArrow over a tiny persisted df (P rows, P
partitions) and has every task record its UDF entry/exit wallclocks.
Driver records job start/end. Reports, per job: wall, earliest
entry - job start (pre-UDF: scheduling + task ship + worker dispatch),
latest exit - earliest entry (UDF span), job end - latest exit
(post-UDF: result ship + commit + driver fetch).

Usage: python jobs/probe_blocks_floor3.py [--cpus 8] [--parts 8] [--jobs 6]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from collections.abc import Iterator
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--jobs", type=int, default=6)
    args = ap.parse_args()

    import pyarrow as pa
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("probe-floor3")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.python.worker.reuse", "true")
        .getOrCreate()
    )
    df = spark.range(args.parts, numPartitions=args.parts).persist()
    df.count()

    def f(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        t_in = time.time()
        n = 0
        for b in batches:
            n += b.num_rows
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([t_in], pa.float64()),
                pa.array([time.time()], pa.float64()),
                pa.array([n], pa.int64()),
            ],
            ["t_in", "t_out", "n"],
        )

    out = df.mapInArrow(f, "t_in double, t_out double, n long")
    rows_pre, rows_span, rows_post, walls = [], [], [], []
    for j in range(args.jobs):
        t0 = time.time()
        t = out.toArrow()
        t1 = time.time()
        tin = min(t["t_in"].to_pylist())
        tout = max(t["t_out"].to_pylist())
        walls.append(t1 - t0)
        rows_pre.append(tin - t0)
        rows_span.append(tout - tin)
        rows_post.append(t1 - tout)
        print(
            f"job {j}: wall={t1 - t0:.3f} pre-udf={tin - t0:.3f} "
            f"udf-span={tout - tin:.3f} post-udf={t1 - tout:.3f}"
        )
    print(
        f"medians over last {args.jobs - 1} (skip warmup): "
        f"wall={statistics.median(walls[1:]):.3f} "
        f"pre={statistics.median(rows_pre[1:]):.3f} "
        f"span={statistics.median(rows_span[1:]):.3f} "
        f"post={statistics.median(rows_post[1:]):.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
