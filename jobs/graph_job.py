#!/usr/bin/env python3
"""Graph-ops CLI: connected components / label propagation / triangle
counting / SCC / k-core / k-truss / BFS / clustering coefficients /
assortativity / deterministic random walks / co-citation / coupling /
Adamic-Adar / reciprocity / HyperBall over an edge CSV (same source
format as pagerank_job).

    spark-submit jobs/graph_job.py --algo cc|cc2|lpa|triangles|hits|scc|kcore|ktruss|bfs|lcc|assortativity|walks|katz|eigenvector|cocitation|coupling|adamicadar|reciprocity|hyperball|harmonic|hostrank|khop|hostsssp|betweenness|closeness|squares|densest|mis|coloring|matching|louvain|leiden|coloringauto|coreness|salsa|bowtie|scan|pprpush --data edges.csv.gz
        [--max_iterations N] [--salt_buckets S] [--checkpoint_dir DIR]
        [--resume] [--output DIR] [--master local[32]]
        [--source URL] [--sources a,b,c] [--k K] [--t_max T]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401 (katz ordering)
    p = argparse.ArgumentParser()
    p.add_argument(
        "--algo",
        required=True,
        choices=[
            "cc", "cc2", "lpa", "triangles", "hits", "scc", "kcore",
            "ktruss", "bfs", "lcc", "assortativity", "walks", "katz",
            "cocitation", "coupling", "adamicadar", "reciprocity",
            "hyperball", "harmonic", "hostrank", "khop", "hostsssp",
            "betweenness", "louvain", "coreness", "salsa", "bowtie",
            "eigenvector", "closeness", "squares", "densest", "mis",
            "coloring", "palette", "matching", "trussness", "doulion",
            "richclub", "powerlaw", "scan", "pprpush", "leiden", "coloringauto",
        ],
    )
    p.add_argument(
        "--sources", default=None,
        help="comma-separated sampled source urls for betweenness",
    )
    p.add_argument("--min_count", type=int, default=1, help="cocitation/coupling floor")
    p.add_argument(
        "--degree_cap", type=int, default=None,
        help="hub df-cap for cocitation/coupling/adamicadar",
    )
    p.add_argument("--t_max", type=int, default=16, help="hyperball/harmonic depth")
    p.add_argument("--k", type=int, default=3, help="k for kcore/ktruss/khop depth; doulion q; powerlaw dmin")
    p.add_argument("--source", default=None, help="source url (bfs/khop/hostsssp)")
    p.add_argument("--walk_length", type=int, default=10)
    p.add_argument("--walks_per_vertex", type=int, default=2)
    p.add_argument("--data", required=True)
    p.add_argument("--max_iterations", type=int, default=100)
    p.add_argument("--salt_buckets", type=int, default=0)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--output", default=None)
    p.add_argument("--show", type=int, default=10)
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pagerankproject_spark.graph.components import connected_components
    from pagerankproject_spark.graph.labelprop import label_propagation
    from pagerankproject_spark.graph.triangles import triangle_counts
    from pagerankproject_spark.ingest.edges import build_graph_tables, read_edge_csv
    from pagerankproject_spark.session import get_spark

    spark = get_spark(app_name=f"graph-{args.algo}", master=args.master)
    # the co-link/walk/host branches consume raw (filtered) edges and
    # never touch GraphTables — skip the dense-id build + two persisted
    # shuffles for them (it roughly doubled their wall-clock)
    needs_g = args.algo not in {
        "assortativity", "walks", "cocitation", "coupling",
        "adamicadar", "reciprocity", "hostrank", "hostsssp", "squares", "mis",
        "coloring", "palette", "matching", "doulion", "scan",
    }
    g = None
    if needs_g:
        g = build_graph_tables(spark, read_edge_csv(spark, args.data))
        print(f"n= {g.n} edges= {g.num_edges}")

    if args.algo == "cc":
        res = connected_components(
            spark,
            g,
            max_iterations=args.max_iterations,
            salt_buckets=args.salt_buckets,
            checkpoint_dir=args.checkpoint_dir,
            resume=args.resume,
        )
        out = res.components.orderBy("component", "url")
        print(f"iterations= {res.iterations} converged= {res.converged}")
        n_comp = out.select("component").distinct().count()
        print(f"components= {n_comp}")
    elif args.algo == "hits":
        from pagerankproject_spark.graph.hits import hits

        res = hits(spark, g, max_iterations=args.max_iterations)
        out = res.scores.orderBy("url")
        print(f"iterations= {res.iterations} converged= {res.converged}")
    elif args.algo == "lpa":
        res = label_propagation(
            spark,
            g,
            max_iterations=args.max_iterations,
            checkpoint_dir=args.checkpoint_dir,
            resume=args.resume,
        )
        out = res.labels.orderBy("label", "url")
        print(f"iterations= {res.iterations} converged= {res.converged}")
    elif args.algo == "cc2":
        from pagerankproject_spark.graph.components import (
            connected_components_twophase,
        )

        res = connected_components_twophase(spark, g)
        out = res.components.orderBy("component", "url")
        print(f"rounds= {res.iterations} converged= {res.converged}")
    elif args.algo == "scc":
        from pagerankproject_spark.graph.scc import strongly_connected_components

        res = strongly_connected_components(spark, g)
        out = res.components.orderBy("component", "url")
        print(f"rounds= {res.rounds}")
    elif args.algo == "kcore":
        from pagerankproject_spark.graph.kcore import kcore

        res = kcore(spark, g, k=args.k)
        out = res.vertices.orderBy("url")
        print(f"iterations= {res.iterations}")
    elif args.algo == "ktruss":
        from pagerankproject_spark.graph.triangles import ktruss

        res = ktruss(spark, g, k=args.k)
        out = res.edges.orderBy("a", "b")
        print(f"rounds= {res.rounds} converged= {res.converged}")
    elif args.algo == "bfs":
        from pagerankproject_spark.graph.kcore import bfs_distances

        if not args.source:
            p.error("--source required for bfs")
        res = bfs_distances(spark, g, [args.source])
        out = res.distances.orderBy("distance", "url")
        print(f"iterations= {res.iterations} converged= {res.converged}")
    elif args.algo == "katz":
        from pagerankproject_spark.graph.metrics import katz_centrality

        out = katz_centrality(
            spark, g, iterations=min(args.max_iterations, 20)
        ).orderBy(F.desc("katz"), "url")
    elif args.algo == "eigenvector":
        from pagerankproject_spark.graph.metrics import eigenvector_centrality

        # k capped low: walk counts grow ~lambda_max^k and must stay <2^63
        out = eigenvector_centrality(
            spark, g, iterations=min(args.max_iterations, 8)
        ).orderBy(F.desc("eigenvector"), "url")
    elif args.algo == "lcc":
        from pagerankproject_spark.graph.triangles import clustering_coefficients

        out = clustering_coefficients(spark, g).orderBy("url")
    elif args.algo == "assortativity":
        from pagerankproject_spark.graph.metrics import degree_assortativity
        from pagerankproject_spark.ingest.edges import regex_filter

        out = degree_assortativity(regex_filter(read_edge_csv(spark, args.data)))
    elif args.algo == "cocitation":
        from pagerankproject_spark.graph.linkpred import cocitation
        from pagerankproject_spark.ingest.edges import regex_filter

        out = cocitation(
            regex_filter(read_edge_csv(spark, args.data)),
            min_count=args.min_count,
            max_out_degree=args.degree_cap,
        ).orderBy(F.desc("cocitations"), "a", "b")
    elif args.algo == "coupling":
        from pagerankproject_spark.graph.linkpred import bibliographic_coupling
        from pagerankproject_spark.ingest.edges import regex_filter

        out = bibliographic_coupling(
            regex_filter(read_edge_csv(spark, args.data)),
            min_count=args.min_count,
            max_in_degree=args.degree_cap,
        ).orderBy(F.desc("couplings"), "a", "b")
    elif args.algo == "adamicadar":
        from pagerankproject_spark.graph.linkpred import adamic_adar
        from pagerankproject_spark.ingest.edges import regex_filter

        out = adamic_adar(
            regex_filter(read_edge_csv(spark, args.data)),
            max_degree=args.degree_cap,
            exclude_existing=True,
        ).orderBy(F.desc("aa_score"), "a", "b")
    elif args.algo == "reciprocity":
        from pagerankproject_spark.graph.linkpred import reciprocity
        from pagerankproject_spark.ingest.edges import regex_filter

        out = reciprocity(regex_filter(read_edge_csv(spark, args.data)))
    elif args.algo == "hyperball":
        from pagerankproject_spark.graph.hyperball import hyperball

        # dense-id loop (2.1x over url-string keys at 45M edges, BENCH.md)
        res = hyperball(spark, g=g, t_max=args.t_max)
        out = res.balls.orderBy(F.desc("ball_est"), "url")
        print(
            f"iterations= {res.iterations} converged= {res.converged} "
            f"effective_diameter= {res.effective_diameter} nf= {res.nf}"
        )
    elif args.algo == "harmonic":
        from pagerankproject_spark.graph.hyperball import harmonic_centrality

        out = harmonic_centrality(spark, g=g, t_max=args.t_max).orderBy(
            F.desc("harmonic"), "url"
        )
    elif args.algo == "khop":
        from pagerankproject_spark.graph.kcore import khop_subgraph

        if not args.source:
            p.error("--source required for khop")
        out = khop_subgraph(spark, g, [args.source], k=args.k).orderBy("src", "dst")
    elif args.algo == "betweenness":
        from pagerankproject_spark.graph.betweenness import betweenness_sampled

        if not (args.sources or args.source):
            p.error("--sources (comma-separated) or --source required")
        srcs = (
            [s.strip() for s in args.sources.split(",") if s.strip()]
            if args.sources
            else [args.source]
        )
        out = betweenness_sampled(spark, g, srcs).orderBy(
            F.desc("bc"), "url"
        )
    elif args.algo == "closeness":
        from pagerankproject_spark.graph.betweenness import closeness_sampled

        if not (args.sources or args.source):
            p.error("--sources (comma-separated) or --source required")
        srcs = (
            [s.strip() for s in args.sources.split(",") if s.strip()]
            if args.sources
            else [args.source]
        )
        out = closeness_sampled(spark, g, srcs).orderBy(
            F.desc("closeness_est"), "url"
        )
    elif args.algo == "densest":
        from pagerankproject_spark.graph.densest import densest_subgraph

        res = densest_subgraph(spark, g)
        out = res.members.orderBy("url")
        print(f"n= {res.n} e= {res.e} density= {res.e / res.n} rounds= {res.rounds}")
    elif args.algo == "mis":
        from pagerankproject_spark.graph.mis import luby_mis
        from pagerankproject_spark.ingest.edges import regex_filter

        res = luby_mis(spark, regex_filter(read_edge_csv(spark, args.data)))
        out = res.members.orderBy("mis_round", "url")
        print(f"rounds= {res.rounds} members= {res.members.count()}")
    elif args.algo == "coloring":
        from pagerankproject_spark.graph.coloring import greedy_coloring
        from pagerankproject_spark.ingest.edges import regex_filter

        res = greedy_coloring(spark, regex_filter(read_edge_csv(spark, args.data)))
        out = res.colors.orderBy("color", "url")
        n_colors = out.agg({"color": "max"}).collect()[0][0] + 1
        print(f"rounds= {res.rounds} colors= {n_colors}")
    elif args.algo == "palette":
        from pagerankproject_spark.graph.coloring import palette_coloring
        from pagerankproject_spark.ingest.edges import regex_filter

        res = palette_coloring(spark, regex_filter(read_edge_csv(spark, args.data)))
        out = res.colors.orderBy("color", "url")
        n_colors = out.agg({"color": "max"}).collect()[0][0] + 1
        print(f"rounds= {res.rounds} colors= {n_colors}")
    elif args.algo == "matching":
        from pagerankproject_spark.graph.matching import maximal_matching
        from pagerankproject_spark.ingest.edges import regex_filter

        res = maximal_matching(spark, regex_filter(read_edge_csv(spark, args.data)))
        out = res.pairs.orderBy("match_round", "a", "b")
        print(f"rounds= {res.rounds} pairs= {res.pairs.count()}")
    elif args.algo == "squares":
        from pagerankproject_spark.graph.linkpred import square_count
        from pagerankproject_spark.ingest.edges import regex_filter

        out = square_count(
            regex_filter(read_edge_csv(spark, args.data)),
            max_degree=args.degree_cap,
        )
    elif args.algo == "hostsssp":
        from pagerankproject_spark.graph.kcore import sssp_weighted
        from pagerankproject_spark.ingest.edges import regex_filter
        from pagerankproject_spark.text.pipeline import host_graph

        if not args.source:
            p.error("--source required for hostsssp (a host, e.g. h1.com)")
        hedges = host_graph(regex_filter(read_edge_csv(spark, args.data)))
        res = sssp_weighted(
            spark,
            hedges.select(
                F.col("src_host").alias("src"),
                F.col("dst_host").alias("dst"),
                (F.lit(1.0) / F.col("n_links").cast("double")).alias("w"),
            ),
            args.source,
            max_iterations=args.max_iterations,
        )
        out = res.distances.orderBy("dist", "url")
        print(f"iterations= {res.iterations} converged= {res.converged}")
    elif args.algo == "hostrank":
        from pagerankproject_spark.graph.pagerank import pagerank
        from pagerankproject_spark.ingest.edges import (
            build_weighted_graph_tables,
            regex_filter,
        )
        from pagerankproject_spark.text.pipeline import host_graph

        hedges = host_graph(regex_filter(read_edge_csv(spark, args.data)))
        gw = build_weighted_graph_tables(
            spark,
            hedges.select(
                F.col("src_host").alias("src"),
                F.col("dst_host").alias("dst"),
                F.col("n_links").alias("w"),
            ),
        )
        res = pagerank(spark, gw, max_iterations=args.max_iterations)
        out = res.ranks.orderBy(F.desc("x"), "url")
        print(f"hosts= {gw.n} iterations= {res.iterations} converged= {res.converged}")
    elif args.algo == "walks":
        from pagerankproject_spark.graph.walks import random_walks

        from pagerankproject_spark.ingest.edges import regex_filter

        out = random_walks(
            regex_filter(read_edge_csv(spark, args.data)),
            walk_length=args.walk_length,
            walks_per_vertex=args.walks_per_vertex,
        ).orderBy("walk_id", "step")
    elif args.algo == "louvain":
        from pagerankproject_spark.graph.louvain import louvain_multilevel

        res = louvain_multilevel(g=g, spark=spark)
        out = res.communities.orderBy("community", "url")
        n_comm = out.select("community").distinct().count()
        print(f"communities= {n_comm}")
    elif args.algo == "leiden":
        from pagerankproject_spark.graph.louvain import leiden_communities

        res = leiden_communities(g=g, spark=spark)
        out = res.communities.orderBy("community", "url")
        n_comm = out.select("community").distinct().count()
        print(f"communities= {n_comm}")
    elif args.algo == "coloringauto":
        from pagerankproject_spark.graph.coloring import coloring_auto

        res = coloring_auto(spark, g.weighted_edges.join(
            g.vertices.select(F.col("id").alias("src_id"),
                              F.col("url").alias("src")), "src_id"
        ).join(
            g.vertices.select(F.col("id").alias("dst_id"),
                              F.col("url").alias("dst")), "dst_id"
        ).select("src", "dst"))
        out = res.colors.orderBy("url")
        n_colors = out.select("color").distinct().count()
        print(f"colors= {n_colors} rounds= {res.rounds}")
    elif args.algo == "coreness":
        from pagerankproject_spark.graph.kcore import coreness

        res = coreness(spark, g, max_iterations=args.max_iterations)
        out = res.vertices.orderBy(F.desc("coreness"), "url")
        print(f"rounds= {res.iterations} converged= {res.converged}")
    elif args.algo == "salsa":
        from pagerankproject_spark.graph.salsa import salsa

        out = salsa(spark, g).orderBy(F.desc("authority"), "url")
    elif args.algo == "bowtie":
        from pagerankproject_spark.graph.bowtie import bowtie

        res = bowtie(spark, g, max_iterations=args.max_iterations)
        out = res.regions.orderBy("region", "url")
        print(f"core_label= {res.core_label} sweeps= {res.sweeps}")
    elif args.algo == "trussness":
        from pagerankproject_spark.graph.triangles import trussness

        res = trussness(spark, g, max_iterations=args.max_iterations)
        out = res.edges.orderBy(F.desc("trussness"), "a", "b")
        print(f"iterations= {res.iterations} converged= {res.converged}")
    elif args.algo == "richclub":
        from pagerankproject_spark.graph.metrics import rich_club
        from pagerankproject_spark.ingest.edges import regex_filter

        out = rich_club(regex_filter(read_edge_csv(spark, args.data))).orderBy("k")
    elif args.algo == "powerlaw":
        from pagerankproject_spark.graph.metrics import powerlaw_alpha
        from pagerankproject_spark.ingest.edges import regex_filter

        out = powerlaw_alpha(
            regex_filter(read_edge_csv(spark, args.data)), dmin=args.k
        )
    elif args.algo == "scan":
        from pagerankproject_spark.graph.scan import scan_clusters
        from pagerankproject_spark.ingest.edges import regex_filter

        out = scan_clusters(
            spark, edges=regex_filter(read_edge_csv(spark, args.data)),
            mu=args.k,
        ).orderBy("role", "url")
    elif args.algo == "pprpush":
        from pagerankproject_spark.graph.pushppr import ppr_push

        if not args.source:
            raise SystemExit("pprpush requires --source <seed url>")
        out = ppr_push(
            spark, g, args.source, max_rounds=args.max_iterations
        ).orderBy(F.desc("p"), "url")
    elif args.algo == "doulion":
        from pagerankproject_spark.graph.triangles import (
            triangle_count_sampled,
        )
        from pagerankproject_spark.ingest.edges import regex_filter

        out = triangle_count_sampled(
            spark, regex_filter(read_edge_csv(spark, args.data)), q=args.k
        )
    else:
        res = triangle_counts(spark, g)
        out = res.per_edge.orderBy("a", "b")
        print(f"total_triangles= {res.total}")

    out.show(args.show, truncate=False)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
