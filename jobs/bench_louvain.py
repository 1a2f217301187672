"""Scale evidence for full Louvain (phases 1+2, graph/louvain.py):
recover a planted partition at millions of edges and verify the
recovery IN-JOB with the exact-integer modularity metric
(graph/metrics.py::modularity — integer moments, one division).

Graph: k planted communities over a deterministic synthetic edge
stream (orders x multiplier, the bench_symmetry generator
discipline). ~95% of edges land inside a hash-chosen community,
~5% cross communities — so the planted partition's modularity is
known-high and any community structure Louvain finds is measured
against it on the SAME exact scale:

    recovery = Q(found) / Q(planted)

The job asserts recovery >= 0.5 (fail-loud floor; the measured value
is the reported headline) and reports per-level round walls and move
counts, plus the found-community count vs the planted k.

Usage: python jobs/bench_louvain.py [--multiplier 42] [--k 512]
       [--vertices 100000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multiplier", type=int, default=42)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--vertices", type=int, default=100_000)
    ap.add_argument("--rounds-per-level", type=int, default=6)
    ap.add_argument("--levels", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pagerankproject_spark.graph.louvain import louvain_multilevel
    from pagerankproject_spark.graph.metrics import modularity
    from pagerankproject_spark.ingest.edges import build_graph_tables
    from pagerankproject_spark.session import get_spark

    spark = get_spark(
        app_name="bench_louvain",
        master=f"local[{args.cpus}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    k = args.k
    size = args.vertices // k
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey", "o_custkey")
    m = spark.range(args.multiplier).select(F.col("id").alias("m"))
    h1 = F.col("o_custkey") * 1009 + F.col("m") * 31
    h2 = F.col("o_orderkey") * 2003 + F.col("m") * 17
    h3 = F.col("o_orderkey") * 7919 + F.col("m") * 13
    c_a = F.pmod(h3, F.lit(k))
    # ~5% of rows cross into the hash-adjacent community
    cross = F.pmod(h1 + h2, F.lit(20)) == 0
    c_b = F.when(cross, F.pmod(h3 + 1, F.lit(k))).otherwise(c_a)
    url = lambda c, i: F.concat(
        F.lit("site.com/c"), c.cast("string"), F.lit("v"), i.cast("string")
    )
    edges = (
        o.crossJoin(m)
        .select(
            url(c_a, F.pmod(h1, F.lit(size))).alias("src"),
            url(c_b, F.pmod(h2, F.lit(size))).alias("dst"),
        )
        .repartition(64, "src")
        .persist()
    )
    n_edges = edges.count()
    g = build_graph_tables(spark, edges)
    n_verts = g.vertices.count()
    print(f"graph: {n_edges} edges, {n_verts} vertices, k={k} planted")

    t0 = time.time()
    res = louvain_multilevel(
        spark, g, rounds_per_level=args.rounds_per_level, levels=args.levels
    )
    found = res.communities.persist()
    n_found = found.select("community").distinct().count()
    wall = time.time() - t0

    planted = g.vertices.select(
        "url", F.regexp_extract("url", r"site\.com/(c\d+)v", 1).alias("label")
    )
    q_planted = modularity(edges, planted).collect()[0]["modularity"]
    q_found = modularity(
        edges, found.select("url", F.col("community").alias("label"))
    ).collect()[0]["modularity"]
    recovery = q_found / q_planted
    assert recovery >= 0.5, (
        f"Louvain recovered Q={q_found:.4f} vs planted Q={q_planted:.4f} "
        f"(recovery {recovery:.3f} < 0.5 floor)"
    )

    per_level = [
        {
            "level": li,
            "rounds": len(rounds),
            "moves": [r["moved"] for r in rounds],
            "round_walls_s": [round(r["wall_sec"], 2) for r in rounds],
        }
        for li, rounds in enumerate(res.metrics)
    ]
    out = {
        "edges": n_edges,
        "vertices": n_verts,
        "k_planted": k,
        "communities_found": n_found,
        "wall_s": round(wall, 1),
        "q_planted": round(q_planted, 4),
        "q_found": round(q_found, 4),
        "recovery": round(recovery, 3),
        "levels": per_level,
    }
    print(f"louvain_multilevel: {wall:.1f}s Q_found={q_found:.4f} "
          f"Q_planted={q_planted:.4f} recovery={recovery:.3f} "
          f"found={n_found} communities (k={k} planted)")
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
