#!/usr/bin/env python3
"""Corpus dedup pipeline job — the at-scale cleaning entry point.

    spark-submit --py-files engine.zip jobs/dedup_job.py \
        --documents /path/docs.parquet --output /path/out \
        --method exact|minhash|simhash [--threshold 0.8] \
        [--master local[32]]

Writes:
  exact    -> survivors (fingerprint, survivor_id, n_dupes)
  minhash  -> verified near-dup pairs (a, b, jaccard >= threshold)
  simhash  -> near-dup pairs (a, b, hamming <= 3)
  cluster  -> minhash pairs -> transitive clusters -> survivors
              (doc_id, cluster_id, is_survivor)
  imagehash-> near-dup IMAGE pairs (a, b, hamming <= 3) via aHash over
              a (url, media binary) table — PNG/BMP decoded natively
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--documents", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--method", required=True, choices=["exact", "minhash", "simhash", "cluster", "imagehash"])
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--master", default=None)
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO)

    from pagerankproject_spark.dedup.exact import dedup_exact
    from pagerankproject_spark.dedup.minhash import minhash_verified_pairs
    from pagerankproject_spark.dedup.simhash import simhash_pairs
    from pagerankproject_spark.session import get_spark

    spark = get_spark(app_name=f"dedup-{args.method}", master=args.master)
    docs = spark.read.parquet(args.documents)
    if args.method == "exact":
        out = dedup_exact(docs)
    elif args.method == "minhash":
        out = minhash_verified_pairs(docs, threshold=args.threshold)
    elif args.method == "cluster":
        from pagerankproject_spark.dedup.clusters import dedup_clusters

        pairs = minhash_verified_pairs(docs, threshold=args.threshold)
        out = dedup_clusters(spark, pairs)
    elif args.method == "imagehash":
        from pagerankproject_spark.multimodal.media import (
            image_ahash,
            image_near_dup_ahash,
        )

        out = image_near_dup_ahash(image_ahash(docs))
    else:
        out = simhash_pairs(docs)
    out.write.mode("overwrite").parquet(args.output)
    logging.info("%s dedup -> %d rows -> %s", args.method, out.count(), args.output)
    spark.stop()


if __name__ == "__main__":
    main()
