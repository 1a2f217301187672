"""Probe 2: decompose the blocks iteration — trivial mapInArrow job
(Python worker round-trip, no kernel), kernel-only mapInArrow (no
broadcast: x rebuilt with np.full inside), and full blocks_spmv."""

from __future__ import annotations

import argparse
import statistics
import sys
import tempfile
import time
from collections.abc import Iterator
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--multiplier", type=int, default=800)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa

    from jobs.bench_scaling import build_graph, NUM_VERTICES
    from pagerankproject_spark.ingest.csr import blocks_spmv, write_npy_blocks
    from pagerankproject_spark.session import get_spark

    spark = get_spark(
        app_name="probe-blocks-floor2",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
        extra_conf={"spark.driver.memory": "20g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    g = build_graph(spark, args.multiplier, args.cpus * 2)
    bdir = tempfile.mkdtemp(prefix="probe-blocks-")
    blocks = write_npy_blocks(spark, g, bdir)
    # free the cached edge table: isolate the iteration from JVM cache
    g.weighted_edges.unpersist(blocking=True)
    x = np.full(NUM_VERTICES, 1.0 / np.sqrt(NUM_VERTICES))
    n = NUM_VERTICES

    def trivial(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            for part in b.column("part_id").to_pylist():
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.zeros(1, np.int64), pa.int64()),
                        pa.array(np.zeros(1, np.float64), pa.float64()),
                    ],
                    ["dst", "partial"],
                )

    def kernel_nobc(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        xvec = np.full(n, 1.0 / np.sqrt(n))
        for b in batches:
            for part in b.column("part_id").to_pylist():
                dst = np.load(f"{bdir}/p{part}.dst.npy")
                indptr = np.load(f"{bdir}/p{part}.indptr.npy")
                src = np.load(f"{bdir}/p{part}.src.npy", mmap_mode="r")
                w = np.load(f"{bdir}/p{part}.w.npy", mmap_mode="r")
                contrib = np.asarray(w) * xvec[np.asarray(src)]
                vals = np.add.reduceat(contrib, indptr[:-1]) if len(dst) else np.zeros(0)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(dst, pa.int64()), pa.array(vals, pa.float64())],
                    ["dst", "partial"],
                )

    schema = "dst long, partial double"

    def timeit(label, fn):
        walls = []
        for _ in range(args.reps):
            t0 = time.time()
            fn()
            walls.append(time.time() - t0)
        print(
            f"{label}: median={statistics.median(walls):.3f}",
            [round(w, 3) for w in walls],
            flush=True,
        )

    # warm-up
    blocks.parts_df.mapInArrow(trivial, schema).toArrow()
    blocks_spmv(blocks, x)
    blocks_spmv(blocks, x)

    timeit("trivial_mapInArrow", lambda: blocks.parts_df.mapInArrow(trivial, schema).toArrow())
    timeit("kernel_no_broadcast", lambda: blocks.parts_df.mapInArrow(kernel_nobc, schema).toArrow())
    timeit("full_blocks_spmv", lambda: blocks_spmv(blocks, x))
    blocks.cleanup()
    spark.stop()


if __name__ == "__main__":
    main()
