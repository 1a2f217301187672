#!/usr/bin/env python3
"""HyperBall scale measurement: register-merge throughput on the same
deterministic synthetic web graph family as jobs/bench_scaling.py
(orders x multiplier, endpoints hashed into a fixed vertex space,
url-string endpoints because the sketch registers derive from md5(url)).

Per merge round the dataflow is: dst-partitioned edges JOIN sketch ->
groupBy url with 16 partial-aggregable max registers — one sketch-side
shuffle + one agg exchange, the PageRank-loop shape with a 16-int
payload instead of one double. Reported: steady-state seconds/round and
edge-merges/sec/round (each edge row contributes one 16-register merge
candidate per round).

Usage: python jobs/bench_hyperball.py [--multiplier 100] [--rounds 5]
       [--vertices 100000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--multiplier", type=int, default=100)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--vertices", type=int, default=100_000)
    p.add_argument("--cpus", type=int, default=32)
    p.add_argument(
        "--mode", choices=["strings", "ids"], default="strings",
        help="ids: run the merge loop on dense long keys via GraphTables",
    )
    args = p.parse_args()

    from pyspark.sql import functions as F

    from pagerankproject_spark.graph.hyperball import hyperball
    from pagerankproject_spark.session import get_spark

    spark = get_spark(
        app_name="bench-hyperball",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={
            "spark.driver.memory": "20g",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    m = spark.range(args.multiplier).select(F.col("id").alias("m"))
    nv = args.vertices
    edges = o.crossJoin(m).select(
        F.concat(
            F.lit("p"),
            F.pmod(F.col("o_custkey") * 1009 + F.col("m") * 31, F.lit(nv)).cast(
                "string"
            ),
        ).alias("src"),
        F.concat(
            F.lit("p"),
            F.pmod(F.col("o_orderkey") * 2003 + F.col("m") * 17, F.lit(nv)).cast(
                "string"
            ),
        ).alias("dst"),
    )

    t0 = time.time()
    if args.mode == "ids":
        from pagerankproject_spark.ingest.edges import build_graph_tables

        gt = build_graph_tables(spark, edges)
        res = hyperball(spark, g=gt, t_max=args.rounds, early_stop=False)
    else:
        res = hyperball(spark, edges, t_max=args.rounds, early_stop=False)
    res.balls.count()
    total = time.time() - t0
    # distinct simple edges = what each round actually merges
    n_edges = edges.filter(F.col("src") != F.col("dst")).distinct().count()
    walls = res.round_walls or []
    steady = statistics.median(walls[1:]) if len(walls) > 1 else walls[0]
    print(
        json.dumps(
            {
                "mode": args.mode,
                "edges_distinct": n_edges,
                "vertices": nv,
                "rounds": args.rounds,
                "cpus": args.cpus,
                "total_wall_sec": round(total, 2),
                "round_walls": [round(w, 3) for w in walls],
                "sec_per_round_steady": round(steady, 3),
                "edge_merges_per_sec_per_round": round(n_edges / steady, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
