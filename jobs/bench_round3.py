"""Round-3 evidence bench: the four VERDICT-r2 "Done =" measurements.

1. **BFS flat per-round walls** — frontier-restricted bfs_distances on a
   deterministic chain-of-clusters graph (the settled set grows ~30x
   over the run). Evidence: mean round wall in the first/middle/last
   third of the run stays flat; the round-2 full-settled-set rescan
   grew linearly with the settled set by construction.
2. **SSSP flat per-round walls** — same chain, worklist-restricted
   Bellman-Ford (sssp_weighted), same flatness table.
3. **Dense-id random walks** — random_walks(g=) (8-byte long join keys
   per step) vs the string-keyed loop on the same 15M-edge graph;
   corpora verified row-count-identical here.
4. **LPA frontier-restricted tail** — per-iteration walls at 120M
   edges / 100k vertices (the dense worst case from the round-2 table,
   15-65 s/iter there), annotated with full/frontier mode per round.

Plus a betweenness_sampled timing row (16 sources, 15M edges) so
round-over-round regressions in the Brandes path are visible.

Appends ONE section to BENCH.md between its markers (idempotent).

Usage: python jobs/bench_round3.py [--cpus 32]
       [--only bfs,sssp,walks,lpa,betweenness]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

BEGIN = "<!-- BEGIN round3-evidence -->"
END = "<!-- END round3-evidence -->"


def thirds(walls: list[float]) -> tuple[float, float, float]:
    k = max(1, len(walls) // 3)
    return (
        round(statistics.mean(walls[:k]), 3),
        round(statistics.mean(walls[len(walls) // 2 - k // 2:][:k]), 3),
        round(statistics.mean(walls[-k:]), 3),
    )


def build_chain_edges(spark, k_clusters: int, size: int, intra: int):
    """String (src, dst) chain-of-clusters edge list, symmetrized —
    same arithmetic as jobs/bench_cc_diameter.py::build_chain_of_clusters
    but returning the raw url edges so SSSP can reuse them with weights."""
    from pyspark.sql import functions as F

    n = k_clusters * size
    base = spark.range(n * intra).select(
        (F.col("id") % n).alias("v"),
        (F.col("id") / n).cast("long").alias("j"),
    )
    cluster = (F.col("v") / size).cast("long")
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
    e = intra_e.union(bridges)
    return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def bench_bfs_sssp(spark, clusters: int, size: int, intra: int) -> dict:
    from pyspark.sql import functions as F

    from pagerankproject_spark.graph.kcore import bfs_distances, sssp_weighted
    from pagerankproject_spark.ingest.edges import build_graph_tables

    edges = build_chain_edges(spark, clusters, size, intra).persist()
    edges.count()
    g = build_graph_tables(spark, edges)

    t0 = time.time()
    bfs = bfs_distances(spark, g, ["v0"], max_iterations=2000)
    bfs_reached = bfs.distances.count()
    bfs_wall = time.time() - t0
    bfs_walls = [m["wall_sec"] for m in bfs.metrics]

    wedges = edges.select("src", "dst", F.lit(1.0).alias("w"))
    t0 = time.time()
    sp = sssp_weighted(spark, wedges, "v0", max_iterations=2000)
    sp_reached = sp.distances.count()
    sp_wall = time.time() - t0
    sp_walls = [m["wall_sec"] for m in sp.metrics]
    edges.unpersist()
    return {
        "vertices": g.n,
        "edges": g.num_edges,
        "bfs": {
            "rounds": bfs.iterations,
            "converged": bfs.converged,
            "reached": bfs_reached,
            "total_wall": round(bfs_wall, 1),
            "thirds": thirds(bfs_walls),
        },
        "sssp": {
            "rounds": sp.iterations,
            "converged": sp.converged,
            "reached": sp_reached,
            "total_wall": round(sp_wall, 1),
            "thirds": thirds(sp_walls),
        },
    }


def bench_walks(spark, multiplier: int) -> dict:
    from pyspark.sql import functions as F

    from jobs.bench_scaling import build_graph
    from pagerankproject_spark.graph.walks import random_walks

    g = build_graph(spark, multiplier=multiplier)
    strings = (
        g.weighted_edges.join(
            g.vertices.select(F.col("id").alias("src_id"), F.col("url").alias("src")),
            "src_id",
        )
        .join(
            g.vertices.select(F.col("id").alias("dst_id"), F.col("url").alias("dst")),
            "dst_id",
        )
        .select("src", "dst")
        .persist()
    )
    strings.count()

    t0 = time.time()
    n_dense = random_walks(g=g, walk_length=4, walks_per_vertex=1).count()
    dense_wall = time.time() - t0
    t0 = time.time()
    n_str = random_walks(strings, walk_length=4, walks_per_vertex=1).count()
    str_wall = time.time() - t0
    assert n_dense == n_str, (n_dense, n_str)
    strings.unpersist()
    return {
        "edges": g.num_edges,
        "vertices": g.n,
        "corpus_rows": n_dense,
        "dense_wall": round(dense_wall, 1),
        "string_wall": round(str_wall, 1),
        "speedup": round(str_wall / dense_wall, 2),
    }


def bench_betweenness(spark, multiplier: int, n_sources: int) -> dict:
    from jobs.bench_scaling import build_graph
    from pagerankproject_spark.graph.betweenness import betweenness_sampled

    g = build_graph(spark, multiplier=multiplier)
    sources = [f"site.com/p{i * 997}" for i in range(n_sources)]
    t0 = time.time()
    rows = betweenness_sampled(spark, g, sources).count()
    wall = time.time() - t0
    return {
        "edges": g.num_edges,
        "vertices": g.n,
        "sources": n_sources,
        "rows": rows,
        "wall": round(wall, 1),
    }


def bench_lpa(spark, multiplier: int, iters: int) -> dict:
    from jobs.bench_scaling import build_graph
    from pagerankproject_spark.graph.labelprop import label_propagation

    g = build_graph(spark, multiplier=multiplier)
    t0 = time.time()
    res = label_propagation(spark, g, max_iterations=iters)
    wall = time.time() - t0
    return {
        "edges": g.num_edges,
        "vertices": g.n,
        "iterations": res.iterations,
        "converged": res.converged,
        "total_wall": round(wall, 1),
        "rounds": [
            {
                "i": m["i"],
                "mode": m["mode"],
                "changed": m["changed"],
                "wall": round(m["wall_sec"], 1),
            }
            for m in res.metrics
        ],
    }


def render(results: dict, cpus: int) -> str:
    lines = [
        BEGIN,
        "## Round-3 operator evidence (measured, idle local"
        f"[{cpus}])",
        "",
    ]
    if "chain" in results:
        c = results["chain"]
        lines += [
            "### BFS / weighted SSSP: round cost tracks the frontier, not the settled set",
            "",
            f"Chain-of-clusters graph, {c['vertices']:,} vertices / "
            f"{c['edges']:,} directed edges; source in cluster 0, so the",
            "settled set grows ~30x while the frontier stays ~one cluster.",
            "Mean per-round wall by run third (the round-2 full-settled-set",
            "rescan grew with the settled set; flat = fixed):",
            "",
            "| algorithm | rounds | reached | wall 1st third (s) | middle | last | total (s) |",
            "|---|---|---|---|---|---|---|",
        ]
        for name in ("bfs", "sssp"):
            r = c[name]
            a, b, d = r["thirds"]
            lines.append(
                f"| {name} (frontier/worklist) | {r['rounds']} | {r['reached']:,} "
                f"| {a} | {b} | {d} | {r['total_wall']} |"
            )
        lines.append("")
    if "walks" in results:
        w = results["walks"]
        lines += [
            "### Random walks: dense-id loop vs string keys",
            "",
            f"{w['edges']:,} edges / {w['vertices']:,} vertices, walk_length=4,",
            f"1 walker/vertex ({w['corpus_rows']:,} corpus rows, verified",
            "row-count-identical between the two paths; exact-row parity is",
            "pytest-asserted in tests/test_graph_ops.py):",
            "",
            "| loop key space | wall (s) |",
            "|---|---|",
            f"| url strings (round-2 path) | {w['string_wall']} |",
            f"| dense longs (`random_walks(g=)`) | {w['dense_wall']} |",
            "",
            f"Speedup {w['speedup']}x — same lever as HyperBall's dense-id",
            "mode (2.1x, BENCH.md above): per-step shuffles move 8-byte",
            "longs instead of ~20-byte urls.",
            "",
        ]
    if "betweenness" in results:
        b = results["betweenness"]
        lines += [
            "### Sampled betweenness at bench scale (regression sentinel)",
            "",
            f"| edges | sources | output rows | wall (s) |",
            "|---|---|---|---|",
            f"| {b['edges']:,} | {b['sources']} | {b['rows']:,} | {b['wall']} |",
            "",
            "One Spark job per BFS level (frontier count rides the level",
            "checkpoint's Observation) for the whole batched source sample.",
            "",
        ]
    if "lpa" in results:
        lpa = results["lpa"]
        rounds = ", ".join(
            f"i{r['i']}:{r['wall']}s/{r['mode']}/{r['changed']:,}ch"
            for r in lpa["rounds"]
        )
        lines += [
            "### LPA frontier-restricted tail at 120M edges (dense worst case)",
            "",
            f"{lpa['edges']:,} edges / {lpa['vertices']:,} vertices (mean degree",
            "1200 — same graph as the round-2 iteration-walls table, which",
            "measured 15-65 s/iter). Per-round wall / recompute mode /",
            "changed labels:",
            "",
            f"    {rounds}",
            "",
            f"Total {lpa['total_wall']} s for {lpa['iterations']} rounds"
            f" (converged={lpa['converged']}). Once the changed fraction"
            " drops below 20% the loop recomputes only destinations whose",
            "in-neighborhood changed — the converged tail no longer pays",
            "the full (dst,label) aggregation. Outputs byte-identical to",
            "the full recompute (tests/test_graph_ops.py).",
            "",
        ]
    lines.append(END)
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--only", type=str, default="bfs,walks,lpa,betweenness")
    ap.add_argument("--clusters", type=int, default=40)
    ap.add_argument("--size", type=int, default=1500)
    ap.add_argument("--intra", type=int, default=5)
    ap.add_argument("--walks_multiplier", type=int, default=100)
    ap.add_argument("--lpa_multiplier", type=int, default=800)
    ap.add_argument("--lpa_iters", type=int, default=8)
    ap.add_argument("--bc_sources", type=int, default=16)
    args = ap.parse_args()
    legs = set(args.only.split(","))

    from pagerankproject_spark.session import get_spark

    spark = get_spark(
        app_name="bench-round3",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict = {}
    if {"bfs", "sssp"} & legs:
        results["chain"] = bench_bfs_sssp(spark, args.clusters, args.size, args.intra)
        print("chain:", results["chain"], flush=True)
    if "walks" in legs:
        results["walks"] = bench_walks(spark, args.walks_multiplier)
        print("walks:", results["walks"], flush=True)
    if "betweenness" in legs:
        results["betweenness"] = bench_betweenness(
            spark, args.walks_multiplier, args.bc_sources
        )
        print("betweenness:", results["betweenness"], flush=True)
    if "lpa" in legs:
        results["lpa"] = bench_lpa(spark, args.lpa_multiplier, args.lpa_iters)
        print("lpa:", results["lpa"], flush=True)

    section = render(results, args.cpus)
    bench_md = REPO / "BENCH.md"
    text = bench_md.read_text()
    if BEGIN in text:
        pre, rest = text.split(BEGIN, 1)
        _, post = rest.split(END, 1)
        text = pre + section + post
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    bench_md.write_text(text)
    print("wrote BENCH.md (round3-evidence section)")


if __name__ == "__main__":
    main()
