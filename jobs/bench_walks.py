"""Scale evidence for the walk-corpus family (DeepWalk random_walks +
node2vec second-order walks, both dense-id loops): generate corpora
over a deterministic synthetic graph at millions of edges and verify
the defining invariants IN-JOB with exact distributed join counts:

  * every consecutive (step t-1 -> step t) pair of every walk is an
    edge of the simple graph (anti-join count = 0);
  * a walk stops before walk_length only standing at a DANGLING vertex
    (terminal positions with outdegree > 0 at step < L: count = 0);
  * corpus sizes: step-0 rows = vertices x walks_per_vertex.

  python jobs/bench_walks.py [--multiplier 42] [--vertices 1000000]

Same generator discipline as jobs/bench_symmetry.py.
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
    ap.add_argument("--vertices", type=int, default=1_000_000)
    ap.add_argument("--walk-length", type=int, default=4)
    ap.add_argument("--walks-per-vertex", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pagerankproject_spark.graph.walks import node2vec_walks, random_walks
    from pagerankproject_spark.ingest.edges import build_graph_tables, simple_edges
    from pagerankproject_spark.session import get_spark

    spark = get_spark(
        app_name="bench_walks",
        master=f"local[{args.cpus}]",
        shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey", "o_custkey")
    m = spark.range(args.multiplier).select(F.col("id").alias("m"))
    url = lambda c: F.concat(F.lit("site.com/p"), c.cast("string"))
    edges = (
        o.crossJoin(m)
        .select(
            url(F.pmod(F.col("o_custkey") * 1009 + F.col("m") * 31,
                       F.lit(args.vertices))).alias("src"),
            url(F.pmod(F.col("o_orderkey") * 2003 + F.col("m") * 17,
                       F.lit(args.vertices))).alias("dst"),
        )
        .repartition(64, "src")
        .persist()
    )
    n_edges = edges.count()
    g = build_graph_tables(spark, edges)
    se = simple_edges(g).persist()
    n_simple = se.count()
    n_verts = g.vertices.count()
    print(f"graph: {n_edges} raw / {n_simple} simple edges, {n_verts} vertices")
    out = {"edges_raw": n_edges, "edges_simple": n_simple, "vertices": n_verts}

    # url-space simple edge set + outdegrees for the invariant checks
    v = g.vertices
    eu = (
        se.join(v.select(F.col("id").alias("src_id"), F.col("url").alias("u")), "src_id")
        .join(v.select(F.col("id").alias("dst_id"), F.col("url").alias("x")), "dst_id")
        .select("u", "x")
        .persist()
    )
    eu.count()
    outdeg = eu.groupBy("u").agg(F.count("*").alias("outdeg"))

    def verify(corpus, tag: str, wall: float) -> None:
        c = corpus.persist()
        n_rows = c.count()
        steps0 = c.filter(F.col("step") == 0).count()
        assert steps0 == n_verts * args.walks_per_vertex, (steps0, n_verts)
        # consecutive pairs must be edges
        a = c.select("walk_id", F.col("step").alias("s"), F.col("url").alias("u"))
        b = c.select(
            "walk_id", (F.col("step") - 1).alias("s"), F.col("url").alias("x")
        )
        hops = a.join(b, ["walk_id", "s"]).select("u", "x")
        n_hops = hops.count()
        bad = hops.join(eu, ["u", "x"], "left_anti").count()
        assert bad == 0, f"{tag}: {bad} non-edge hops"
        # early terminals must be dangling
        last = c.groupBy("walk_id").agg(
            F.max(F.struct("step", "url")).alias("t")
        ).select(F.col("t.step").alias("s"), F.col("t.url").alias("u"))
        early = last.filter(F.col("s") < args.walk_length)
        bad2 = early.join(outdeg, "u", "left_semi").count()
        assert bad2 == 0, f"{tag}: {bad2} early stops at non-dangling vertices"
        print(f"{tag}: {wall:.1f}s corpus={n_rows} rows, {n_hops} hops "
              f"(edge-membership + dangling-stop verified exactly)")
        out[tag] = {"wall_s": round(wall, 1), "corpus_rows": n_rows,
                    "hops": n_hops}
        c.unpersist()

    t0 = time.time()
    rw = random_walks(g=g, walk_length=args.walk_length,
                      walks_per_vertex=args.walks_per_vertex)
    rw = rw.localCheckpoint(eager=True)
    rw_wall = time.time() - t0
    verify(rw, "random_walks", rw_wall)

    t0 = time.time()
    n2v = node2vec_walks(g=g, walk_length=args.walk_length,
                         walks_per_vertex=args.walks_per_vertex)
    n2v = n2v.localCheckpoint(eager=True)
    n2v_wall = time.time() - t0
    verify(n2v, "node2vec_walks", n2v_wall)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
