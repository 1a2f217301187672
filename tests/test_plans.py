"""T4 plan assertions (SURVEY §5.2): the physical plans the engine claims
are the plans Catalyst actually produces. These tests read
`explain("formatted")` output, the same evidence a human would check with
`.explain()` before signing off a plan for the 100-TB cluster.

Claims pinned here (SURVEY §4.2-4.4):
  * column pruning — a query over `pages` that never touches `html`
    must not read the (dominant) binary column from parquet;
  * outlink extraction is Arrow-vectorized (ArrowEvalPython), and no
    engine plan ever falls back to row-at-a-time Python (BatchEvalPython);
  * top-k = orderBy+limit compiles to TakeOrderedAndProject, not a full
    sort-exchange;
  * predicate pushdown — filters over parquet scans appear as
    PushedFilters in the scan node;
  * the PageRank iteration body stays inside whole-stage codegen and
    contains no Python evaluation at all.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fixtures.pages import make_pages
from pagerankproject_spark.ingest.edges import build_graph_tables
from pagerankproject_spark.ingest.extract import extract_outlinks

from .conftest import edges_df


def plan(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._sc._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def scan_detail(p: str) -> str:
    """The detail block of the (last) parquet scan node in a formatted plan
    (the tree at the top also contains the literal 'Scan parquet')."""
    return p[p.rindex("Scan parquet"):].split("\n\n")[0]


def has_codegen(df) -> bool:
    # 'simple' mode marks whole-stage-codegen stages with '*(<id>)'
    return "*(" in plan(df, "simple")


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory) -> str:
    rows, _, _ = make_pages(seed=7, n_pages=50)
    path = str(tmp_path_factory.mktemp("plans") / "pages.parquet")
    spark.createDataFrame(rows).write.mode("overwrite").parquet(path)
    return path


def test_html_column_pruned_when_unused(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    q = pages.groupBy("lang").agg(F.count("*").alias("cnt"))
    scan = scan_detail(plan(q))
    assert "ReadSchema" in scan
    assert "html" not in scan, f"html not pruned from scan:\n{scan}"


def test_extraction_is_arrow_not_row_python(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    out = extract_outlinks(pages, impl="arrow")
    p = plan(out)
    assert "ArrowEvalPython" in p
    assert "BatchEvalPython" not in p  # row-at-a-time Python forbidden


def test_extraction_sql_impl_has_no_python_at_all(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    out = extract_outlinks(pages, impl="sql")
    assert "EvalPython" not in plan(out)
    assert has_codegen(out)


def test_topk_is_take_ordered_not_full_sort(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    q = (
        pages.groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"))
        .limit(5)
    )
    assert "TakeOrderedAndProject" in plan(q)


def test_filter_pushed_down_to_parquet_scan(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    q = pages.filter(F.col("lang") == "en").select("url")
    scan = scan_detail(plan(q))
    assert "PushedFilters" in scan
    assert "lang" in scan.split("PushedFilters")[1].split("\n")[0]


def test_pagerank_iteration_plan_is_jvm_only(spark):
    g = build_graph_tables(
        spark,
        edges_df(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]),
    )
    ranks = g.vertices.select("id", F.lit(0.5).alias("x"))
    we = g.weighted_edges
    contribs = (
        we.join(ranks, we.src_id == ranks.id)
        .groupBy("dst_id")
        .agg(F.sum(F.col("weight") * F.col("x")).alias("msg"))
    )
    assert "EvalPython" not in plan(contribs), "hot path must stay JVM-side"
    assert has_codegen(contribs)
    g.unpersist()


def test_bucketed_edge_table_join_has_no_bigside_exchange(spark, tmp_path):
    """The per-iteration join against a bucketed edge table shuffles ONLY
    the ranks side: exactly one Exchange in the whole plan, and the
    bucketed scan feeds the join directly."""
    from pagerankproject_spark.io.tables import read_table, write_bucketed_edges

    edges = spark.range(0, 1000).select(
        (F.col("id") % 97).alias("src_id"),
        (F.col("id") % 89).alias("dst_id"),
        F.lit(0.5).alias("weight"),
    )
    write_bucketed_edges(edges, "bucketed_edges_test", buckets=4)
    try:
        be = read_table(spark, "bucketed_edges_test")
        ranks = spark.range(0, 97).select(
            F.col("id"), F.lit(1.0).alias("x")
        )
        joined = (
            be.join(ranks, be.src_id == ranks.id)
            .groupBy("dst_id")
            .agg(F.sum(F.col("weight") * F.col("x")).alias("msg"))
        )
        p = plan(joined)
        # formatted plans list each physical node once in the detail section
        detail_exchanges = [
            ln for ln in p.splitlines() if ln.lstrip().startswith("(") and "Exchange" in ln
        ]
        # one exchange for the ranks side + one for the final aggregation;
        # the 1000-row edge side must NOT appear under an Exchange.
        scan = scan_detail(p)
        assert "Bucketed: true" in scan, scan
        assert len(detail_exchanges) <= 2, p
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_edges_test")


def test_near_dup_pairs_plan_is_bucketed_not_cartesian(spark):
    """The default embedding near-dup path must never produce a
    cartesian/nested-loop pair space: every candidate join is a bucket
    equi-join (the brute-force baseline, by contrast, IS a cross join —
    asserted as the contrast so the test can't pass vacuously)."""
    from pagerankproject_spark.similarity.cosine import cosine_similar_pairs
    from pagerankproject_spark.similarity.lsh import near_dup_pairs

    emb = spark.range(0, 50).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 7).cast("double") for i in range(8)]).alias(
            "embedding"
        ),
    )
    p_fast = plan(near_dup_pairs(emb, 0.9, dim=8))
    assert "CartesianProduct" not in p_fast and "NestedLoop" not in p_fast, p_fast
    assert "EvalPython" not in p_fast  # JVM-side fold dot products

    p_brute = plan(cosine_similar_pairs(emb, 0.9))
    assert "CartesianProduct" in p_brute or "NestedLoop" in p_brute


def test_sequence_pack_has_no_global_sort_window(spark):
    """The distributed prefix sum must never plan a single-partition
    global window: the only windows run per-pid partitions and the
    plan contains no 'Exchange SinglePartition'."""
    from pagerankproject_spark.text.packing import pack_offsets

    docs = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(50)], "doc_id long, text string"
    )
    p = plan(pack_offsets(docs, context_len=16, num_partitions=4))
    assert "Exchange SinglePartition" not in p, p
    assert "BatchEvalPython" not in p


def test_domain_cap_sample_plan_has_partial_window_group_limit(spark):
    """The per-domain top-k must shuffle at most k rows per domain per
    input partition: Catalyst's rank-limit pushdown plants a Partial
    WindowGroupLimit BEFORE the exchange (the docstring's mega-domain
    bound relies on it), and the whole plan stays JVM-side."""
    from pyspark.sql import functions as F

    from pagerankproject_spark.text.pipeline import domain_cap_sample

    docs = spark.createDataFrame(
        [(i, f"ex{i % 3}.com/p{i}") for i in range(60)],
        "doc_id long, url string",
    )
    p = plan(domain_cap_sample(docs, F.col("url"), F.col("doc_id"), k=5))
    # two WindowGroupLimit nodes: the map-side Partial below the
    # exchange and the Final above it
    assert p.count("WindowGroupLimit") >= 2, p
    assert ", Partial" in p, p
    assert "BatchEvalPython" not in p


def test_random_walks_step_is_jvm_only(spark):
    from pagerankproject_spark.graph.walks import random_walks

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    p = plan(random_walks(e, walk_length=2, walks_per_vertex=1))
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p  # pure column expressions end-to-end


def test_tfidf_plan_no_python_no_cartesian(spark):
    from pagerankproject_spark.text.tfidf import tfidf_topterms

    docs = spark.createDataFrame(
        [(i, "a b c d " * (i + 1)) for i in range(5)], "doc_id long, text string"
    )
    p = plan(tfidf_topterms(docs, k=2))
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p


def test_linkpred_plans_no_python_no_cartesian_partial_agg(spark):
    from pagerankproject_spark.graph.linkpred import adamic_adar, cocitation

    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("d", "b"), ("d", "c"), ("b", "c")],
        "src string, dst string",
    )
    for df in (cocitation(e, max_out_degree=10), adamic_adar(e, max_degree=10)):
        p = plan(df)
        assert "BatchEvalPython" not in p
        assert "CartesianProduct" not in p
        # pair counting must partial-aggregate map-side (hub-skew immunity)
        assert "partial_count" in p or "partial_sum" in p


def test_hyperball_merge_round_is_one_exchange_jvm_only(spark):
    from pagerankproject_spark.graph.hyperball import (
        _REG_COLS,
        init_sketches,
    )
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    verts = (
        e.select(F.col("src").alias("url"))
        .union(e.select(F.col("dst").alias("url")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sketch = init_sketches(verts).localCheckpoint(eager=True)
    msgs = e.join(sketch.withColumnRenamed("url", "dst"), "dst").select(
        F.col("src").alias("url"), *_REG_COLS
    )
    merged = (
        sketch.unionByName(msgs)
        .groupBy("url")
        .agg(*[F.max(c).alias(c) for c in _REG_COLS])
    )
    p = plan(merged)
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p
    # register merge combines map-side: max is partial-aggregable, so
    # hub fan-in collapses per partition before the single exchange
    assert "partial_max" in p
    # <= 3 shuffle nodes: the two join inputs + the merge groupBy —
    # the same per-round shape as the PageRank/CC loops (a persisted
    # pre-partitioned edge table removes its side on a real run)
    import re

    n_shuffles = len(re.findall(r"\(\d+\) Exchange", p))
    assert n_shuffles <= 3, p
