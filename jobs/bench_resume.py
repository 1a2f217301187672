"""Checkpoint/resume identity AT SCALE (north-rule resumability): the
T4 kill/resume lifecycle test proves identity on the small fixture;
this job proves it at 45M edges — interrupt the PageRank loop after 2
iterations, resume from the parquet checkpoint to convergence, and compare the
final ranks against the uninterrupted run with ONE distributed join
(max |x_full - x_resumed| over all vertices, never collected).

Expected: max abs rank delta at float64 reduction-noise scale (the
resumed run re-sums partial aggregates over parquet-read partition
order instead of join-output order — SURVEY §4.3); the job asserts
< 1e-9, far below the 1e-6 contract epsilon, and reports the measured
value plus walls and checkpoint size. The dense synthetic expander
converges FAST (measured residuals 3.2e-3, 1.3e-4, 5.1e-6, 2.1e-7,
then a bit-exact 0.0 at iteration 5 — the update contracts ~25x per
iteration, far beyond the 0.85 damping bound, because the stationary
vector is near-uniform), so the interrupt lands at iteration 2 and
both runs terminate on the SAME 1e-9 convergence test.

Usage: python jobs/bench_resume.py [--multiplier 300] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multiplier", type=int, default=300)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--cut", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from jobs.bench_scaling import build_graph
    from pagerankproject_spark.graph.pagerank import pagerank
    from pagerankproject_spark.session import get_spark

    spark = get_spark(
        app_name="bench_resume",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    g = build_graph(spark, multiplier=args.multiplier)
    build_wall = time.time() - t0
    print(f"graph: {g.num_edges} edges, {g.n} vertices "
          f"({build_wall:.1f}s build)")

    ck = tempfile.mkdtemp(prefix="bench_resume_ck_")
    try:
        # uninterrupted reference: fixed iteration count
        t0 = time.time()
        full = pagerank(spark, g, epsilon=1e-9, max_iterations=args.iters)
        full.ranks.count()
        full_wall = time.time() - t0

        # interrupted run: stop at the cut (simulated crash), then resume
        t0 = time.time()
        partial = pagerank(
            spark, g, epsilon=1e-9, max_iterations=args.cut,
            checkpoint_dir=ck, checkpoint_interval=1,
        )
        partial.ranks.count()
        partial_wall = time.time() - t0
        assert not partial.converged

        ck_bytes = sum(p.stat().st_size for p in Path(ck).rglob("*") if p.is_file())

        t0 = time.time()
        resumed = pagerank(
            spark, g, epsilon=1e-9, max_iterations=args.iters,
            checkpoint_dir=ck, checkpoint_interval=1, resume=True,
        )
        resumed.ranks.count()
        resume_wall = time.time() - t0

        # distributed comparison — never collect n ranks to the driver
        delta = (
            full.ranks.select(F.col("url"), F.col("x").alias("xf"))
            .join(resumed.ranks.select("url", F.col("x").alias("xr")), "url", "full")
            .agg(
                F.max(F.abs(F.coalesce("xf", F.lit(float("inf")))
                            - F.coalesce("xr", F.lit(float("-inf"))))).alias("d"),
                F.count("*").alias("n"),
            )
            .collect()[0]
        )
        assert delta["n"] == g.n, (delta["n"], g.n)
        assert delta["d"] < 1e-9, f"resume diverged: max |delta| = {delta['d']}"
        assert len(resumed.residuals) == len(full.residuals)

        out = {
            "edges": g.num_edges,
            "vertices": g.n,
            "iterations": args.iters,
            "cut_at": args.cut,
            "full_wall_s": round(full_wall, 1),
            "interrupted_wall_s": round(partial_wall, 1),
            "resume_wall_s": round(resume_wall, 1),
            "checkpoint_mb": round(ck_bytes / 1e6, 1),
            "max_rank_delta": delta["d"],
        }
        print(f"resume identity @ {g.num_edges} edges: max|delta|="
              f"{delta['d']:.3e} over {delta['n']} vertices "
              f"(full {full_wall:.1f}s; interrupted {partial_wall:.1f}s + "
              f"resume {resume_wall:.1f}s; checkpoint {out['checkpoint_mb']} MB)")
        print(json.dumps(out))
    finally:
        shutil.rmtree(ck, ignore_errors=True)


if __name__ == "__main__":
    main()
