"""Scale evidence for the symmetry-breaking family (MIS / maximal
matching / palette coloring / pointer-doubling rooting): run each on a
deterministic synthetic url-space graph and verify its defining
invariant IN-JOB with exact distributed checks (join counts — no
sampling, no tolerance), then report rounds + wall so BENCH.md shows
the O(log)-round behavior at millions of edges.

  python jobs/bench_symmetry.py [--multiplier 84] [--vertices 1000000]

Same generator discipline as jobs/bench_scaling.py: orders x
range(multiplier), endpoints hashed into [0, vertices) — identical
rows at any parallelism. Urls are synthesized strings because these
operators are url-keyed (the dense-id overload is a known 2x lever,
BENCH.md hyperball row; rounds, not per-round constants, are what
this harness pins).
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


def build_edges(spark, multiplier: int, vertices: int):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    m = spark.range(multiplier).select(F.col("id").alias("m"))
    url = lambda c: F.concat(F.lit("site.com/p"), c.cast("string"))
    e = (
        o.crossJoin(m)
        .select(
            url(F.pmod(F.col("o_custkey") * 1009 + F.col("m") * 31,
                       F.lit(vertices))).alias("src"),
            url(F.pmod(F.col("o_orderkey") * 2003 + F.col("m") * 17,
                       F.lit(vertices))).alias("dst"),
        )
        .repartition(64, "src")
        .persist()
    )
    return e, e.count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multiplier", type=int, default=84)
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pagerankproject_spark.session import get_spark

    spark = get_spark(
        app_name="bench_symmetry",
        master=f"local[{args.cpus}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges, n_edges = build_edges(spark, args.multiplier, args.vertices)
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"))
        .distinct()
        .persist()
    )
    n_und = und.count()
    sym = und.select(F.col("a").alias("w"), F.col("b").alias("x")).union(
        und.select(F.col("b").alias("w"), F.col("a").alias("x"))
    )
    n_verts = und.select(F.col("a").alias("v")).union(
        und.select(F.col("b").alias("v"))
    ).distinct().count()
    print(f"graph: {n_edges} raw / {n_und} simple edges, {n_verts} vertices")
    out = {"edges_raw": n_edges, "edges_simple": n_und, "vertices": n_verts}

    # --- Luby MIS + exact invariants ---------------------------------
    from pagerankproject_spark.graph.mis import luby_mis

    t0 = time.time()
    mis = luby_mis(spark, edges)
    members = mis.members.select(F.col("url").alias("v")).persist()
    n_mis = members.count()
    wall = time.time() - t0
    viol = (
        und.join(members.withColumnRenamed("v", "a"), "a", "left_semi")
        .join(members.withColumnRenamed("v", "b"), "b", "left_semi")
        .count()
    )
    uncovered = (
        sym.join(members.withColumnRenamed("v", "x"), "x", "left_semi")
        .select(F.col("w").alias("v")).distinct()
        .unionByName(members)
        .distinct()
    )
    n_cov = uncovered.count()
    assert viol == 0, f"MIS independence violated: {viol} internal edges"
    assert n_cov == n_verts, f"MIS maximality violated: {n_verts - n_cov}"
    print(f"luby_mis: {wall:.1f}s rounds={mis.rounds} members={n_mis} "
          f"(independence+maximality verified exactly)")
    out["luby_mis"] = {"wall_s": round(wall, 1), "rounds": mis.rounds,
                       "members": n_mis}

    # --- Luby MIS again in dense-id mode (the BENCH known-lever note:
    # 8-byte long join keys, url strings frozen once into the priority
    # payload) — exact member-set equality vs the url-space run above
    # quantifies the lever on this family
    from pagerankproject_spark.ingest.edges import build_graph_tables

    t0 = time.time()
    gt = build_graph_tables(spark, edges)
    build_wall = time.time() - t0
    t0 = time.time()
    mis_d = luby_mis(spark, g=gt)
    members_d = mis_d.members.select(F.col("url").alias("v")).persist()
    n_mis_d = members_d.count()
    wall_d = time.time() - t0
    assert n_mis_d == n_mis and members_d.join(members, "v", "left_anti").count() == 0, \
        "dense-id MIS diverged from the url-space member set"
    print(f"luby_mis dense-id: {wall_d:.1f}s (+{build_wall:.1f}s tables) "
          f"rounds={mis_d.rounds} members={n_mis_d} "
          f"(member set identical to url-space run)")
    out["luby_mis_dense"] = {"wall_s": round(wall_d, 1),
                             "tables_wall_s": round(build_wall, 1),
                             "rounds": mis_d.rounds, "members": n_mis_d}

    # --- maximal matching + exact invariants -------------------------
    from pagerankproject_spark.graph.matching import maximal_matching

    t0 = time.time()
    mm = maximal_matching(spark, edges)
    pairs = mm.pairs.persist()
    n_pairs = pairs.count()
    wall = time.time() - t0
    used = pairs.select(F.col("a").alias("v")).union(
        pairs.select(F.col("b").alias("v"))
    )
    n_used, n_used_distinct = used.count(), used.distinct().count()
    unmatched_edges = (
        und.join(used.distinct().withColumnRenamed("v", "a"), "a", "left_anti")
        .join(used.distinct().withColumnRenamed("v", "b"), "b", "left_anti")
        .count()
    )
    assert n_used == n_used_distinct, "matching not vertex-disjoint"
    assert unmatched_edges == 0, f"matching not maximal: {unmatched_edges}"
    print(f"maximal_matching: {wall:.1f}s rounds={mm.rounds} pairs={n_pairs} "
          f"(disjointness+maximality verified exactly)")
    out["maximal_matching"] = {"wall_s": round(wall, 1), "rounds": mm.rounds,
                               "pairs": n_pairs}

    # --- palette coloring + exact invariants -------------------------
    from pagerankproject_spark.graph.coloring import palette_coloring

    t0 = time.time()
    pc = palette_coloring(spark, edges)
    colors = pc.colors.persist()
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
    assert n_colored == n_verts, "palette coloring left vertices uncolored"
    assert conflicts == 0, f"palette coloring not proper: {conflicts}"
    print(f"palette_coloring: {wall:.1f}s rounds={pc.rounds} "
          f"colors={n_colors} (properness verified exactly)")
    out["palette_coloring"] = {"wall_s": round(wall, 1), "rounds": pc.rounds,
                               "colors": int(n_colors)}

    # --- pointer-doubling rooting + exact idempotence ----------------
    from pagerankproject_spark.graph.pointers import functional_rooting

    ptr = edges.groupBy(F.col("src").alias("v")).agg(F.min("dst").alias("nxt"))
    t0 = time.time()
    fr = functional_rooting(spark, ptr)
    canon = fr.canonical.persist()
    n_canon = canon.count()
    wall = time.time() - t0
    not_idem = (
        canon.join(
            canon.select(F.col("url").alias("canonical"),
                         F.col("canonical").alias("canon2")),
            "canonical",
        )
        .filter(F.col("canonical") != F.col("canon2"))
        .count()
    )
    assert not_idem == 0, f"rooting not idempotent: {not_idem}"
    print(f"functional_rooting: {wall:.1f}s rounds={fr.rounds} "
          f"resolved={n_canon} (idempotence verified exactly)")
    out["functional_rooting"] = {"wall_s": round(wall, 1),
                                 "rounds": fr.rounds, "resolved": n_canon}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
