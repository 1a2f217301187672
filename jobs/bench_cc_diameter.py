"""High-diameter CC experiment: min-label propagation vs alternating
large-star/small-star contraction (graph/components.py::
connected_components_twophase).

Builds a deterministic "chain of communities" graph — K dense clusters
connected in a single long chain by one bridge edge each, the worst
case for min-propagation (the minimum label crawls the chain one hop
per iteration, so iterations ~ chain length) and the motivating case
for star contraction (rounds ~ log^2 of the chain length). Times both
on the same input; both outputs are exact (verified equal here).

At 100 TB the round count IS the wall clock — each round is a full
shuffle of the edge set — so the crossover measured here is the basis
for the engine's guidance: default min-propagation for low-diameter
web crawls (bow-tie cores have diameter ~ tens), switch to two-phase
when diameter is unknown or the graph has long chain/tendril
structure.

Appends a measured section to BENCH.md.

Usage: python jobs/bench_cc_diameter.py [--clusters 96] [--size 600]
       [--intra 5] [--cpus 32]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def build_chain_of_clusters(spark, k_clusters: int, size: int, intra: int):
    """k clusters of `size` vertices; `intra` pseudo-random internal
    edges per vertex; cluster i bridges to i+1 with ONE edge. All
    arithmetic — deterministic, no RNG state."""
    from pyspark.sql import functions as F

    from pagerankproject_spark.ingest.edges import build_graph_tables

    n = k_clusters * size
    base = spark.range(n * intra).select(
        (F.col("id") % n).alias("v"),
        (F.col("id") / n).cast("long").alias("j"),
    )
    cluster = (F.col("v") / size).cast("long")
    # intra-cluster pseudo-random partner: affine hash inside the cluster
    partner = cluster * size + F.pmod(
        F.col("v") * 2654435761 + F.col("j") * 40503 + 17, F.lit(size)
    )
    intra_e = base.select(
        F.concat(F.lit("v"), F.col("v")).alias("src"),
        F.concat(F.lit("v"), partner).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    bridges = spark.range(k_clusters - 1).select(
        F.concat(F.lit("v"), (F.col("id") * size + size - 1)).alias("src"),
        F.concat(F.lit("v"), ((F.col("id") + 1) * size)).alias("dst"),
    )
    return build_graph_tables(spark, intra_e.union(bridges))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clusters", type=int, default=64)
    ap.add_argument("--size", type=int, default=600)
    ap.add_argument("--intra", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--max_prop_iters", type=int, default=800)
    args = ap.parse_args()

    from pagerankproject_spark.graph.components import (
        connected_components,
        connected_components_twophase,
    )
    from pagerankproject_spark.session import get_spark

    spark = get_spark(
        master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    g = build_chain_of_clusters(spark, args.clusters, args.size, args.intra)
    print(f"edges={g.num_edges} vertices={g.n}")

    t0 = time.time()
    prop = connected_components(spark, g, max_iterations=args.max_prop_iters)
    n_prop = prop.components.select("component").distinct().count()
    prop_wall = time.time() - t0

    t0 = time.time()
    two = connected_components_twophase(spark, g)
    n_two = two.components.select("component").distinct().count()
    two_wall = time.time() - t0

    assert prop.converged and two.converged, (prop.converged, two.converged)
    assert n_prop == n_two == 1, (n_prop, n_two)
    same = (
        prop.components.join(
            two.components.withColumnRenamed("component", "c2"), "url"
        )
        .filter("component <> c2")
        .count()
    )
    assert same == 0, f"{same} label mismatches"

    lines = [
        "",
        "## High-diameter CC: star contraction vs min-propagation "
        f"(measured local[{args.cpus}])",
        "",
        f"Chain of {args.clusters} dense clusters x {args.size} vertices "
        f"(one bridge edge between consecutive clusters): {g.num_edges:,} "
        f"edges, graph diameter ~ chain length. Outputs verified identical.",
        "",
        "| algorithm | rounds/iterations | wall | converged |",
        "|---|---|---|---|",
        f"| min-label propagation | {prop.iterations} iterations "
        f"| {prop_wall:.1f} s | {prop.converged} |",
        f"| two-phase star contraction | {two.iterations} rounds "
        f"| {two_wall:.1f} s | {two.converged} |",
        "",
        "Interpretation: min-propagation pays one shuffle round per hop of",
        "graph diameter (the minimum label crawls the bridge chain), while",
        "large-star/small-star collapses the chain in O(log^2) rounds —",
        "at petabyte scale, where every round is a full shuffle of the",
        "edge set, round count is the wall clock. Low-diameter graphs",
        "(bow-tie web cores) invert the choice: propagation's rounds are",
        "fewer AND cheaper (one join + one combinable agg vs two",
        "groupBy+join+distinct phases). Both are exact; pick by diameter.",
        "",
    ]
    with open(REPO / "BENCH.md", "a") as f:
        f.write("\n".join(lines))
    print(f"prop: {prop.iterations} iters {prop_wall:.1f}s | "
          f"two-phase: {two.iterations} rounds {two_wall:.1f}s")
    print(f"appended high-diameter CC section to {REPO / 'BENCH.md'}")
    spark.stop()


if __name__ == "__main__":
    main()
