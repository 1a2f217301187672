#!/usr/bin/env python3
"""End-to-end pages pipeline — the engine's primary lifecycle
(SURVEY §3.4): Iceberg/parquet `pages` table -> outlink extraction ->
salted edge/vertex tables -> PageRank -> ranks sink.

    spark-submit --py-files engine.zip jobs/pages_job.py \
        --pages /path/to/pages.parquet --output /path/to/ranks \
        [--table catalog.db.pages]  (Iceberg form when a catalog is up) \
        [--alpha 0.85] [--epsilon 1e-6] [--max_iterations 1000] \
        [--filter_ratio R] [--salt_buckets S] \
        [--checkpoint_dir DIR] [--resume] [--master local[32]]
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="parquet path of the pages table")
    src.add_argument("--table", help="catalog table name (Iceberg)")
    p.add_argument("--output", required=True)
    p.add_argument("--alpha", type=float, default=0.85)
    p.add_argument("--epsilon", type=float, default=1e-6)
    p.add_argument("--max_iterations", type=int, default=1000)
    p.add_argument("--filter_ratio", type=float, default=None)
    p.add_argument("--salt_buckets", type=int, default=0)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--master", default=None)
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()

    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO)

    from pagerankproject_spark.graph.pagerank import pagerank
    from pagerankproject_spark.ingest.edges import build_edges
    from pagerankproject_spark.session import get_spark

    spark = get_spark(app_name="pages-pipeline", master=args.master)
    pages = (
        spark.read.table(args.table) if args.table else spark.read.parquet(args.pages)
    )
    g = build_edges(
        spark,
        pages,
        filter_ratio=args.filter_ratio,
        salt_buckets=args.salt_buckets,
    )
    logging.info("graph built: n=%d edges=%d", g.n, g.num_edges)
    res = pagerank(
        spark,
        g,
        alpha=args.alpha,
        epsilon=args.epsilon,
        max_iterations=args.max_iterations,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
    )
    res.ranks.write.mode("overwrite").parquet(args.output)
    logging.info(
        "pagerank: %d iterations converged=%s final_residual=%.3e -> %s",
        res.iterations,
        res.converged,
        res.residuals[-1] if res.residuals else float("nan"),
        args.output,
    )
    spark.stop()


if __name__ == "__main__":
    main()
