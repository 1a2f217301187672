"""Scale evidence for the two round-4 heavyweights (VERDICT r4 item 4):
`coloring_auto` and `leiden_communities` at construction-verified
multi-million-edge graphs, each verifying its defining invariant
IN-JOB with exact distributed checks before reporting.

- coloring_auto on the bench_symmetry graph (orders x84 hashed into 1M
  vertices, ~12.6M simple edges): properness (zero same-color edges,
  exact join count), full coverage, and the bounded round schedule
  (probe_rounds JP + palette finish) that is the operator's 100x
  claim — compare against palette_coloring's 29 rounds on the same
  graph (BENCH.md symmetry-scale table).

- leiden_communities on a planted-partition graph (~95% intra edges,
  ~6.3M edges). The operator is ONE Leiden level (a fixed-round
  local-moving phase, then constrained refinement FROM SINGLETONS on
  the intra-community subgraph — the OUTPUT labels are the
  refinement's, phase A only constrains them), so its aggregation
  reach from singletons is ~2^(rounds/2) members: planted communities
  are sized INSIDE that operating range (size 6, k=16384) and
  rounds/refine_rounds are 8/8 — recovering ~200-member communities
  is the multilevel contraction's job (BENCH.md louvain-scale row,
  recovery 0.966), not a single level's. Verified IN-JOB, all exact:
  (1) recovery = Q(found)/Q(planted) on the exact-integer modularity
  scale, fail-loud floor 0.5; (2) the SUB-PARTITION property — phase
  A is deterministically replayed by louvain(rounds=8) (same
  _move_rounds, same init), and every refined community must sit
  inside exactly one phase-A community; (3) the Leiden
  well-connectedness guarantee — every multi-member refined community
  is internally CONNECTED (connected_components over the
  intra-community subgraph, one component per community, no member
  stranded without an intra-community edge). Connectivity is the
  property Louvain alone cannot promise (Traag 2019 fig. 2) and
  exactly what from-singletons constrained refinement guarantees by
  induction.

Usage: python jobs/bench_round5.py [--cpus 32]
       [--coloring-multiplier 84] [--leiden-multiplier 42]
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
    ap.add_argument("--coloring-multiplier", type=int, default=84)
    ap.add_argument("--coloring-vertices", type=int, default=1_000_000)
    ap.add_argument("--leiden-multiplier", type=int, default=42)
    ap.add_argument("--leiden-k", type=int, default=16384)
    ap.add_argument("--leiden-vertices", type=int, default=98_304)
    ap.add_argument("--leiden-rounds", type=int, default=8)
    ap.add_argument("--ktruss-multiplier", type=int, default=8)
    ap.add_argument("--ktruss-k", type=int, default=2048)
    ap.add_argument("--ktruss-vertices", type=int, default=98_304)
    ap.add_argument("--ktruss-truss-k", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--skip-coloring", action="store_true")
    ap.add_argument("--skip-leiden", action="store_true")
    ap.add_argument("--skip-ktruss", action="store_true")
    args = ap.parse_args()

    from jobs.bench_symmetry import build_edges
    from pagerankproject_spark.session import get_spark

    spark = get_spark(
        app_name="bench_round5",
        master=f"local[{args.cpus}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    # --- coloring_auto at 12.6M edges + exact properness -------------
    if not args.skip_coloring:
        edges, n_edges = build_edges(
            spark, args.coloring_multiplier, args.coloring_vertices
        )
        _run_coloring(spark, edges, n_edges, out)

    if not args.skip_leiden:
        _run_leiden(spark, args, out)

    if not args.skip_ktruss:
        _run_ktruss(spark, args, out)
    print(json.dumps(out, default=str))


def _planted_edges(spark, multiplier: int, k: int, vertices: int):
    """The bench_louvain planted-partition generator (shared by the
    leiden and ktruss sections): ~95% of edges inside a hash-chosen
    size-(vertices//k) community — near-clique pockets, so the graph
    is triangle-RICH, unlike the uniform-hash bench_symmetry graph."""
    size = vertices // k
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    m = spark.range(multiplier).select(F.col("id").alias("m"))
    h1 = F.col("o_custkey") * 1009 + F.col("m") * 31
    h2 = F.col("o_orderkey") * 2003 + F.col("m") * 17
    h3 = F.col("o_orderkey") * 7919 + F.col("m") * 13
    c_a = F.pmod(h3, F.lit(k))
    cross = F.pmod(h1 + h2, F.lit(20)) == 0
    c_b = F.when(cross, F.pmod(h3 + 1, F.lit(k))).otherwise(c_a)
    url = lambda c, i: F.concat(
        F.lit("site.com/c"), c.cast("string"), F.lit("v"), i.cast("string")
    )
    e = (
        o.crossJoin(m)
        .select(
            url(c_a, F.pmod(h1, F.lit(size))).alias("src"),
            url(c_b, F.pmod(h2, F.lit(size))).alias("dst"),
        )
        .repartition(64, "src")
        .persist()
    )
    return e, e.count()


def _run_ktruss(spark, args, out) -> None:
    # --- ktruss: delta form vs recount form at a triangle-rich scale --
    # The round-5 rewrite (graph/triangles.py::ktruss) picks the
    # recount form below `recount_floor` triangle-edge rows and the
    # delta-maintained form above it. This section runs BOTH forms on
    # the same multi-round peel over a triangle-rich planted graph
    # (forced via recount_floor=0 / huge) and asserts edge-for-edge
    # identical fixpoints + identical round counts — the identical-
    # iterates claim, verified at millions of triangles, plus both
    # walls so the crossover is measured rather than argued.
    from pagerankproject_spark.graph.triangles import ktruss
    from pagerankproject_spark.ingest.edges import build_graph_tables

    e, n_e = _planted_edges(
        spark, args.ktruss_multiplier, args.ktruss_k, args.ktruss_vertices
    )
    g = build_graph_tables(spark, e)
    kk = args.ktruss_truss_k
    print(f"ktruss graph: {n_e} raw edges, k={kk}")

    t0 = time.time()
    res_d = ktruss(spark, g, k=kk, recount_floor=0)  # force delta
    ed = res_d.edges.persist()
    n_d = ed.count()
    wall_d = time.time() - t0

    t0 = time.time()
    res_r = ktruss(spark, g, k=kk, recount_floor=10**18)  # force recount
    er = res_r.edges.persist()
    n_r = er.count()
    wall_r = time.time() - t0

    assert res_d.converged and res_r.converged
    assert n_d == n_r, f"edge counts differ: delta {n_d} vs recount {n_r}"
    diff = ed.join(er, ["a", "b", "support"], "left_anti").count()
    assert diff == 0, f"{diff} delta edges missing from recount result"
    assert res_d.rounds == res_r.rounds, (
        f"round counts differ: {res_d.rounds} vs {res_r.rounds}"
    )
    print(f"ktruss k={kk}: delta {wall_d:.1f}s == recount {wall_r:.1f}s, "
          f"{n_d} truss edges, {res_d.rounds} rounds, outputs identical")
    out["ktruss"] = {
        "edges_raw": n_e, "k": kk,
        "truss_edges": n_d, "rounds": res_d.rounds,
        "delta_wall_s": round(wall_d, 1),
        "recount_wall_s": round(wall_r, 1),
        "outputs_identical": True,
    }
    ed.unpersist(); er.unpersist(); e.unpersist()


def _run_coloring(spark, edges, n_edges, out) -> None:
    from pagerankproject_spark.graph.coloring import coloring_auto

    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"))
        .distinct()
        .persist()
    )
    n_und = und.count()
    n_verts = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .distinct()
        .count()
    )
    print(f"coloring graph: {n_edges} raw / {n_und} simple edges, "
          f"{n_verts} vertices")

    t0 = time.time()
    ca = coloring_auto(spark, edges)
    colors = ca.colors.persist()
    n_colored = colors.count()
    wall = time.time() - t0
    conflicts = (
        und.join(colors.select(F.col("url").alias("a"),
                               F.col("color").alias("ca")), "a")
        .join(colors.select(F.col("url").alias("b"),
                            F.col("color").alias("cb")), "b")
        .filter(F.col("ca") == F.col("cb"))
        .count()
    )
    n_colors = colors.agg(F.countDistinct("color")).collect()[0][0]
    jp_rounds = sum(1 for m in ca.metrics if m["algo"] == "jp")
    pal_rounds = sum(1 for m in ca.metrics if m["algo"] == "palette")
    assert n_colored == n_verts, "coloring_auto left vertices uncolored"
    assert conflicts == 0, f"coloring_auto not proper: {conflicts}"
    print(f"coloring_auto: {wall:.1f}s rounds={ca.rounds} "
          f"(jp={jp_rounds} + palette={pal_rounds}) colors={n_colors} "
          f"(properness+coverage verified exactly)")
    out["coloring_auto"] = {
        "edges_simple": n_und, "vertices": n_verts,
        "wall_s": round(wall, 1), "rounds": ca.rounds,
        "jp_rounds": jp_rounds, "palette_rounds": pal_rounds,
        "colors": int(n_colors),
        "round_walls_s": [round(m["wall_sec"], 2) for m in ca.metrics],
        "worklist": [m["uncolored"] for m in ca.metrics],
    }
    colors.unpersist(); und.unpersist(); edges.unpersist()


def _run_leiden(spark, args, out) -> None:
    # --- leiden at 6.3M planted-partition edges ----------------------
    from pagerankproject_spark.graph.components import connected_components
    from pagerankproject_spark.graph.louvain import leiden_communities, louvain
    from pagerankproject_spark.graph.metrics import modularity
    from pagerankproject_spark.ingest.edges import build_graph_tables

    k = args.leiden_k
    ledges, n_ledges = _planted_edges(
        spark, args.leiden_multiplier, k, args.leiden_vertices
    )
    g = build_graph_tables(spark, ledges)
    n_lverts = g.vertices.count()
    print(f"leiden graph: {n_ledges} edges, {n_lverts} vertices, "
          f"k={k} planted")

    R = args.leiden_rounds
    t0 = time.time()
    res = leiden_communities(spark, g, rounds=R, refine_rounds=R)
    found = res.communities.persist()
    n_found = found.select("community").distinct().count()
    wall = time.time() - t0

    planted = g.vertices.select(
        "url", F.regexp_extract("url", r"site\.com/(c\d+)v", 1).alias("label")
    )
    q_planted = modularity(ledges, planted).collect()[0]["modularity"]
    q_found = modularity(
        ledges, found.select("url", F.col("community").alias("label"))
    ).collect()[0]["modularity"]
    recovery = q_found / q_planted
    assert recovery >= 0.5, (
        f"leiden recovered Q={q_found:.4f} vs planted Q={q_planted:.4f} "
        f"(recovery {recovery:.3f} < 0.5 floor)"
    )

    # well-connectedness: every multi-member refined community is one
    # connected piece of its intra-community subgraph (exact check)
    cf = found.select("url", "community")
    intra = (
        ledges.filter(F.col("src") != F.col("dst"))
        .join(cf.select(F.col("url").alias("src"),
                        F.col("community").alias("cs")), "src")
        .join(cf.select(F.col("url").alias("dst"),
                        F.col("community").alias("cd")), "dst")
        .filter(F.col("cs") == F.col("cd"))
        .select("src", "dst")
    )
    gi = build_graph_tables(spark, intra)
    cc = connected_components(spark, gi)
    labeled = cf.join(cc.components, "url", "left")
    per_comm = labeled.groupBy("community").agg(
        F.count("*").alias("members"),
        F.count("component").alias("members_with_intra_edge"),
        F.countDistinct("component").alias("pieces"),
    ).persist()
    bad = per_comm.filter(
        (F.col("members") > 1)
        & (
            (F.col("pieces") != 1)
            | (F.col("members_with_intra_edge") != F.col("members"))
        )
    ).count()
    n_multi = per_comm.filter(F.col("members") > 1).count()
    assert bad == 0, (
        f"{bad} refined communities are not internally connected"
    )

    # sub-partition property: phase A replayed deterministically by
    # louvain(rounds=R) (identical _move_rounds + init); every refined
    # community sits inside exactly one phase-A community
    louv = louvain(spark, g, rounds=R).communities.select(
        "url", F.col("community").alias("phase_a")
    )
    crossed = (
        cf.join(louv, "url")
        .groupBy("community")
        .agg(F.countDistinct("phase_a").alias("n_parents"))
        .filter(F.col("n_parents") != 1)
        .count()
    )
    assert crossed == 0, (
        f"{crossed} refined communities straddle phase-A communities"
    )
    print(f"leiden_communities: {wall:.1f}s Q_found={q_found:.4f} "
          f"Q_planted={q_planted:.4f} recovery={recovery:.3f} "
          f"found={n_found} (k={k} planted); "
          f"well-connectedness verified exactly over {n_multi} "
          f"multi-member communities; sub-partition of the replayed "
          f"phase A verified exactly")
    out["leiden_communities"] = {
        "edges": n_ledges, "vertices": n_lverts, "k_planted": k,
        "wall_s": round(wall, 1),
        "q_planted": round(q_planted, 4), "q_found": round(q_found, 4),
        "recovery": round(recovery, 3),
        "communities_found": n_found,
        "multi_member_communities": n_multi,
        "disconnected_communities": 0,
        "straddling_communities": 0,
        "move_rounds": res.rounds,
    }


if __name__ == "__main__":
    main()
