#!/usr/bin/env python3
"""Text relevance / corpus-statistics job — the retrieval-side entry
point next to dedup_job.py's cleaning ops.

    spark-submit --py-files engine.zip jobs/text_job.py \
        --documents /path/docs.parquet --output /path/out \
        --op bm25|ql|heavyhitters|mirrors|weightedsample|tempsample|winnowpairs \
        [--query 'spark window merge'] [--denom 200] [--mu 2000] \
        [--threshold 0.03] [--host_mod 23] [--k 100] [--tau 0.5] \
        [--group_col lang] [--weight_col n_chars] [--master local[32]]

Writes:
  bm25         -> (doc_id, matched, score) for docs matching >= 1
                  query term (Okapi BM25, text/bm25.py); --top_k
                  limits to the k best by (score desc, doc_id)
  heavyhitters -> tokens with frequency > 1/denom, EXACT
                  (Misra-Gries candidates + exact rescore,
                  text/heavyhitters.py)
  mirrors      -> host pairs with shingle-set resemblance >= threshold
                  (Bharat-Broder 1999, dedup/mirrors.py); hosts come
                  from a deterministic doc_id % host_mod assignment
                  unless the table has a url column to derive domains
  ql           -> (doc_id, matched, score) Dirichlet query-likelihood
                  (Zhai-Lafferty 2001, text/bm25.py; --mu smoothing)
  weightedsample -> k-row Efraimidis-Spirakis weighted sample per
                  --group_col (or global with --group_col ''),
                  weight = --weight_col (text/sampling.py)
  tempsample   -> temperature-flattened mixture sample: --k total rows
                  across --group_col groups at temperature --tau
  synonyms     -> (term, neighbor, cosine, rank) corpus-trained
                  distributional synonyms (windowed co-occurrence ->
                  PPMI -> cosine, search/synonyms.py): top --top_k
                  per term for --query's terms, or for the --k most
                  frequent corpus terms with no --query
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
    p.add_argument(
        "--op", required=True,
        choices=["bm25", "ql", "heavyhitters", "mirrors",
                 "weightedsample", "tempsample", "synonyms", "bpe", "dsir",
                 "winnowpairs"],
    )
    p.add_argument("--query", default=None, help="bm25 query terms (spaces)")
    p.add_argument("--top_k", type=int, default=None, help="bm25 result cap")
    p.add_argument("--denom", type=int, default=200, help="heavyhitters 1/phi")
    p.add_argument("--threshold", type=float, default=0.03, help="mirrors")
    p.add_argument(
        "--host_mod", type=int, default=23,
        help="mirrors host assignment when no url column exists",
    )
    p.add_argument("--mu", type=float, default=2000.0, help="ql smoothing")
    p.add_argument("--k", type=int, default=100,
                   help="weightedsample per-group k / tempsample total")
    p.add_argument("--tau", type=float, default=0.5, help="tempsample temperature")
    p.add_argument("--merges", type=int, default=12, help="bpe merge rounds")
    p.add_argument("--target_mod", type=int, default=5,
                   help="dsir: every Nth doc_id is the target corpus")
    p.add_argument("--buckets", type=int, default=10000, help="dsir buckets")
    p.add_argument("--group_col", default="lang")
    p.add_argument("--weight_col", default="n_chars")
    p.add_argument("--key_col", default="doc_id")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO)

    from pyspark.sql import functions as F

    from pagerankproject_spark.session import get_spark

    spark = get_spark(app_name=f"text-{args.op}", master=args.master)
    docs = spark.read.parquet(args.documents)
    if args.op == "bm25":
        from pagerankproject_spark.text.bm25 import bm25_scores

        if not args.query:
            p.error("--query required for bm25")
        terms = args.query.lower().split()
        out = bm25_scores(docs, terms, top_k=args.top_k)
    elif args.op == "ql":
        from pagerankproject_spark.text.bm25 import ql_dirichlet_scores

        if not args.query:
            p.error("--query required for ql")
        terms = args.query.lower().split()
        out = ql_dirichlet_scores(docs, terms, mu=args.mu, top_k=args.top_k)
    elif args.op == "weightedsample":
        from pagerankproject_spark.text.sampling import weighted_sample

        out = weighted_sample(
            docs, k=args.k, weight_col=args.weight_col,
            key_col=args.key_col, group_col=args.group_col or None,
        )
    elif args.op == "tempsample":
        from pagerankproject_spark.text.sampling import temperature_sample

        out = temperature_sample(
            docs, total=args.k, tau=args.tau,
            group_col=args.group_col, key_col=args.key_col,
        )
    elif args.op == "synonyms":
        from pagerankproject_spark.search.synonyms import term_synonyms

        probes = args.query.lower().split() if args.query else args.k
        out = term_synonyms(docs, probes=probes, k=args.top_k or 5)
    elif args.op == "bpe":
        from pagerankproject_spark.text.bpe import bpe_merges

        out = bpe_merges(docs, num_merges=args.merges)
    elif args.op == "winnowpairs":
        from pagerankproject_spark.text.spans import winnow_match_pairs

        out = winnow_match_pairs(docs)
    elif args.op == "dsir":
        from pagerankproject_spark.text.dsir import dsir_weights

        m = args.target_mod
        out = dsir_weights(
            docs.filter(f"doc_id % {m} != 0"),
            docs.filter(f"doc_id % {m} = 0"),
            n_buckets=args.buckets,
        )
    elif args.op == "heavyhitters":
        from pagerankproject_spark.text.heavyhitters import heavy_hitters

        out = heavy_hitters(docs, denom=args.denom)
    else:
        from pagerankproject_spark.dedup.mirrors import mirror_host_pairs
        from pagerankproject_spark.text.pipeline import domain_expr

        if "url" in docs.columns:
            host = domain_expr(F.col("url"))
        else:
            host = F.concat(
                F.lit("h"),
                (F.col("doc_id") % args.host_mod).cast("string"),
                F.lit(".com"),
            )
        out = mirror_host_pairs(docs, host, threshold=args.threshold)
    out.write.mode("overwrite").parquet(args.output)
    logging.info("%s -> %d rows -> %s", args.op, out.count(), args.output)
    spark.stop()


if __name__ == "__main__":
    main()
