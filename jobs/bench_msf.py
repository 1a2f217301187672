"""Scale evidence for Boruvka MSF (graph/mst.py): recover a PLANTED
spanning forest exactly at millions of edges, verified IN-JOB with
exact distributed join counts (no sampling, no tolerance).

Construction: a random recursive tree over N vertices (parent(i) =
xxhash64(i) mod i — deterministic at any parallelism) plus a separate
K-vertex path (the adversarial long-diameter component: contraction
must stay O(log) rounds, never O(chain)), all planted edges w=1; M
distractor edges with w=2 among the tree vertices (anti-joined against
the planted set so no distractor collides with a planted pair). Every
distractor closes a cycle whose planted edges all weigh 1 < 2, so by
the cycle property the MSF is EXACTLY the planted forest:

  |forest| = (N-1) + (K-1), forest == planted as a set (both
  anti-join directions 0), total weight = N + K - 2.

  python jobs/bench_msf.py [--tree 1000000] [--path 200000] \
      [--distractors 5000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", type=int, default=1_000_000)
    ap.add_argument("--path", type=int, default=200_000)
    ap.add_argument("--distractors", type=int, default=5_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pagerankproject_spark.graph.mst import boruvka_msf
    from pagerankproject_spark.session import get_spark

    spark = get_spark(
        app_name="bench_msf",
        master=f"local[{args.cpus}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    url = lambda pre, c: F.concat(F.lit(pre), c.cast("string"))

    tree = (
        spark.range(1, args.tree)
        .select(
            url("t", F.col("id")).alias("x"),
            url("t", F.pmod(F.xxhash64(F.col("id")), F.col("id"))).alias("y"),
            F.lit(1).cast("long").alias("w"),
        )
    )
    path = (
        spark.range(1, args.path)
        .select(
            url("p", F.col("id")).alias("x"),
            url("p", F.col("id") - 1).alias("y"),
            F.lit(1).cast("long").alias("w"),
        )
    )
    planted = (
        tree.unionByName(path)
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"), "w")
        .repartition(64, "a")
        .persist()
    )
    n_planted = planted.count()

    d = spark.range(args.distractors)
    distract = (
        d.select(
            url("t", F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(args.tree))).alias("x"),
            url("t", F.pmod(F.xxhash64(F.col("id") * 2), F.lit(args.tree))).alias("y"),
        )
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
        .join(planted.select("a", "b"), ["a", "b"], "left_anti")
        .select("a", "b", F.lit(2).cast("long").alias("w"))
        .repartition(64, "a")
        .persist()
    )
    n_distract = distract.count()
    wedges = planted.unionByName(distract)
    print(f"graph: {n_planted} planted (tree {args.tree - 1} + path "
          f"{args.path - 1}) + {n_distract} distractors")

    t0 = time.time()
    res = boruvka_msf(spark, wedges)
    forest = res.forest.persist()
    n_forest = forest.count()
    wall = time.time() - t0

    want = (args.tree - 1) + (args.path - 1)
    missing = planted.join(forest.select("a", "b"), ["a", "b"], "left_anti").count()
    extra = forest.join(planted.select("a", "b"), ["a", "b"], "left_anti").count()
    weight = forest.agg(F.sum("w")).collect()[0][0]
    assert n_forest == want, f"forest size {n_forest} != {want}"
    assert missing == 0 and extra == 0, f"forest != planted: {missing}/{extra}"
    assert weight == want, f"forest weight {weight} != {want}"
    edges_total = n_planted + n_distract
    print(f"boruvka_msf: {wall:.1f}s rounds={res.rounds} forest={n_forest} "
          f"({edges_total / wall:.0f} edges/s; planted forest recovered "
          f"EXACTLY, both anti-join directions 0, weight exact)")
    print(json.dumps({
        "edges": edges_total, "vertices": args.tree + args.path,
        "wall_s": round(wall, 1), "rounds": res.rounds,
        "per_round": [
            {k: (round(v, 2) if isinstance(v, float) else v)
             for k, v in m.items()} for m in res.metrics
        ],
    }))


if __name__ == "__main__":
    main()
