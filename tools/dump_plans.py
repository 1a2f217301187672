"""Generate PLANS.md: the formatted physical plan of each headline
query at sf0.01, so plan-level claims (pushdown, pruning, broadcast,
TakeOrderedAndProject, Arrow-only Python) are inspectable without
running anything.

Usage: python tools/dump_plans.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.01"

# the plan-interesting subset: one per physical pattern
PLAN_QUERIES = [
    "edge_regex_filter",       # filter pushdown into scan
    "top_pages_by_indegree",   # TakeOrderedAndProject
    "degree_histogram",        # two-level hash aggregate
    "spmv_step",               # the PageRank iteration join+agg shape
    "ratio_filter",            # broadcast anti-join
    "triangles_per_edge",      # wedge join cascade
    "corpus_filter",           # scan-riding projections, no shuffle
    "minhash_verified_pairs",  # LSH candidate join + verification
    "ivf_topk_fullprobe",      # cell-join ANN
    "events_sessionize",       # window functions
    "nation_volume",           # 6-way star join w/ broadcasts
    "outlink_extract",         # extraction (JVM regexp path)
    "decontaminate_overlap",   # broadcast eval-shingle probe
    "sequence_pack",           # two-phase prefix sum (no global window)
    "tfidf_topterms",          # two-level aggs + vocab join + per-doc top-k
    "cocitation",              # df-capped co-occurrence self-join
    "adamic_adar",             # degree-capped wedge join + weighted agg
    "hyperball_nf",            # register max-merge rounds (16 partial maxes)
    "latest_snapshot",         # ONE combinable max(struct), no window sort
    "anchor_extract",          # arrays_zip dual-capture extraction
    "modularity_lpa",          # integer moments + single division
    "ppr_walks",               # walk corpus -> combinable weighted sum
    "duplicate_spans",         # zero-shuffle window explode + digest aggs
    "domain_cap_sample",       # hash-order per-domain top-k window
    "crawl_frontier",          # semi/anti joins + per-host top-k window
    "bm25_scores",             # inverted-index postings + fixed-order pivot
    "mirror_hosts",            # host shingle-set self-join + df-cap
    "weighted_sample",         # A-ES per-group top-k (WindowGroupLimit)
    "rich_club",               # histogram reduction + tiny cumulative window
    "hll_distinct",            # combinable register max-merge + 16-col pivot
    "simrank_mc",              # (step, vertex) meeting self-join + min/sum aggs
    "term_synonyms",           # PPMI vectors + probe-restricted cosine join
    "ccnet_buckets",           # composed dedup/lang/LM stages + ntile terciles
    # bpe_merges / ppr_push / scan_clusters are excluded like
    # triangles_doulion: their driver loops materialize eagerly, so the
    # returned frame is a LocalTableScan / checkpoint scan, not the
    # per-round join+agg (spmv_step and triangles_per_edge already
    # show those shapes).
    # triangles_doulion is excluded: its counts are actions, so the
    # returned one-row frame is a LocalTableScan, not the sampled
    # wedge join (which shares triangles_per_edge's plan shape).
]


def main() -> None:
    import __spark_entry__ as entry
    from pagerankproject_spark.session import get_spark

    spark = get_spark(app_name="plans", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._sc._jvm

    out = [
        "# PLANS — physical plans of the headline queries (sf0.01, auto-generated)",
        "",
        "Regenerate: `python tools/dump_plans.py`. What to look for:",
        "`PushedFilters`/`ReadSchema` on scans (pushdown + pruning),",
        "`TakeOrderedAndProject` for top-k, `BroadcastHashJoin` for dims,",
        "no `BatchEvalPython` anywhere (row-at-a-time Python is banned;",
        "the only Python boundary is `ArrowEvalPython`/`MapInPandas`).",
        "",
    ]
    qs = entry.queries()
    for name in PLAN_QUERIES:
        if name == "triangles_per_edge":
            # plan-inspection mode: skip the eager localCheckpoint so the
            # wedge-join cascade (not a checkpointed RDD scan) is dumped
            from pagerankproject_spark.graph.triangles import triangle_counts

            df = triangle_counts(
                spark, edges=entry._edges(spark, SF), materialize=False
            ).per_edge
        else:
            df = qs[name](spark, SF)
        plan = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]

    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote {REPO / 'PLANS.md'} ({len(PLAN_QUERIES)} plans)")


if __name__ == "__main__":
    main()
