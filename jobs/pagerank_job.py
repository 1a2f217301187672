#!/usr/bin/env python3
"""PageRank CLI — SURVEY.md §2a operator #21.

Flag-compatible with the reference driver (/root/reference/pagerank.py:321-343):

    spark-submit jobs/pagerank_job.py --data=edges.csv.gz \
        [--personalization_vector_query Q] [--search_query Q] \
        [--filter_ratio R] [--alpha 0.85] [--max_iterations 1000] \
        [--epsilon 1e-6] [--max_results 10] [--verbose] \
        [--checkpoint_dir DIR] [--resume] [--master local[32]]

Output format mirrors the reference's logging
(`i=K residual=...` per iteration, `rank = K ranking = ... url= ...`).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", required=True)
    parser.add_argument("--personalization_vector_query")
    parser.add_argument("--search_query", default="")
    parser.add_argument("--filter_ratio", type=float, default=None)
    parser.add_argument("--alpha", type=float, default=0.85)
    parser.add_argument("--max_iterations", type=int, default=1000)
    parser.add_argument("--epsilon", type=float, default=1e-6)
    parser.add_argument("--max_results", type=int, default=10)
    parser.add_argument(
        "--synonyms_file",
        default=None,
        help="word->neighbors table (.json or .parquet) standing in for "
        "the reference's gensim glove-twitter-50 top-5 expansion; applies "
        "to both --search_query and --personalization_vector_query, like "
        "the reference's url_satisfies_query",
    )
    parser.add_argument(
        "--synonyms_corpus",
        default=None,
        help="parquet with a `text` column: train distributional term "
        "vectors on it (windowed co-occurrence -> PPMI -> cosine top-5, "
        "search/synonyms.py) and expand query terms with their nearest "
        "neighbors — the gensim-free, corpus-trained completion of the "
        "reference's glove most_similar expansion; mutually exclusive "
        "with --synonyms_file",
    )
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--checkpoint_dir", default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--master", default=None)
    args = parser.parse_args()

    if args.synonyms_file and args.synonyms_corpus:
        parser.error("--synonyms_file and --synonyms_corpus are mutually exclusive")

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(levelname)s:%(name)s:%(message)s",
    )
    log = logging.getLogger("root")

    from pagerankproject_spark.graph.pagerank import pagerank
    from pagerankproject_spark.ingest.edges import build_graph_tables, read_edge_csv
    from pagerankproject_spark.search.query import (
        file_synonyms,
        no_synonyms,
        query_predicate_expr,
        search,
    )
    from pagerankproject_spark.session import get_spark

    spark = get_spark(app_name="pagerank-job", master=args.master)

    if args.synonyms_file:
        synonyms = file_synonyms(args.synonyms_file)
    elif args.synonyms_corpus:
        from pagerankproject_spark.search.synonyms import corpus_synonyms

        # expansion applies to both queries; train for the union of
        # their positive terms in one Spark job (negated terms are
        # never expanded, matching the reference's url_satisfies_query)
        terms = [
            t
            for q in (args.search_query, args.personalization_vector_query)
            for t in (q or "").split()
            if not t.startswith("-")
        ]
        synonyms = corpus_synonyms(spark, args.synonyms_corpus, terms)
    else:
        synonyms = no_synonyms
    edges = read_edge_csv(spark, args.data)
    g = build_graph_tables(spark, edges, filter_ratio=args.filter_ratio)
    print(f"n= {g.n}")

    v_expr = (
        query_predicate_expr(args.personalization_vector_query, synonyms)
        if args.personalization_vector_query
        else None
    )
    res = pagerank(
        spark,
        g,
        v_expr=v_expr,
        alpha=args.alpha,
        epsilon=args.epsilon,
        max_iterations=args.max_iterations,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
    )
    for i, r in enumerate(res.residuals):
        log.debug(f"i={i} residual={r}")

    rows = search(
        res.ranks,
        args.search_query,
        max_results=args.max_results,
        synonyms=synonyms,
    )
    for rank, (url, ranking) in enumerate(rows):
        log.info(f"rank = {rank} ranking = {ranking:0.4e} url= {url}")

    spark.stop()


if __name__ == "__main__":
    main()
