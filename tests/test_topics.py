"""Batched topic-sensitive PageRank (graph/topics.py) vs sequential
personalized `pagerank` runs — the batched loop must be numerically
identical to k independent runs (same x0, same fixed iteration count),
because its contract oracle IS k independent recursive chains.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import edges_df

EDGES = [
    ("g.com/p1", "g.com/p2"),
    ("g.com/p1", "g.com/p3"),
    ("g.com/p3", "g.com/p1"),
    ("g.com/p3", "g.com/p2"),
    ("g.com/p3", "g.com/p5"),
    ("g.com/p4", "g.com/p5"),
    ("g.com/p4", "g.com/p6"),
    ("g.com/p5", "g.com/p6"),
    ("g.com/p5", "g.com/p4"),
    ("g.com/p6", "g.com/p4"),
    ("g.com/p2", "g.com/p7"),  # p7: dangling
]

PREDS = {
    "odd": "url like '%p1' or url like '%p3' or url like '%p5'",
    "hub4": "url like '%p4'",
    "all": "true",
}


def test_batched_equals_sequential(spark):
    from pagerankproject_spark.graph.pagerank import pagerank
    from pagerankproject_spark.graph.topics import pagerank_topics
    from pagerankproject_spark.ingest.edges import build_graph_tables

    g = build_graph_tables(spark, edges_df(spark, EDGES))
    T = 8
    res = pagerank_topics(
        spark, g, {nm: F.expr(p) for nm, p in PREDS.items()}, iterations=T
    )
    assert res.iterations == T
    batched = {
        (r["topic"], r["url"]): r["x"] for r in res.ranks.collect()
    }
    assert len(batched) == 3 * g.n
    for nm, pred in PREDS.items():
        solo = pagerank(
            spark, g, v_expr=F.expr(pred), epsilon=0.0, max_iterations=T,
            spmv="dataframe",
        )
        for r in solo.ranks.select("url", "x").collect():
            assert batched[(nm, r["url"])] == pytest.approx(
                r["x"], abs=1e-12
            ), (nm, r["url"])
    g.unpersist()


def test_topic_sums_and_errors(spark):
    from pagerankproject_spark.graph.topics import pagerank_topics
    from pagerankproject_spark.ingest.edges import build_graph_tables

    g = build_graph_tables(spark, edges_df(spark, EDGES))
    with pytest.raises(ValueError, match="at least one topic"):
        pagerank_topics(spark, g, {})
    with pytest.raises(ValueError, match="sums to 0"):
        pagerank_topics(spark, g, {"none": F.expr("url like '%zzz%'")})
    g.unpersist()


def test_spam_mass_all_trusted_is_zero(spark):
    """If every page is a trusted seed, TrustRank IS PageRank and the
    relative spam mass is exactly 0 everywhere."""
    from pagerankproject_spark.graph.topics import spam_mass
    from pagerankproject_spark.ingest.edges import build_graph_tables

    g = build_graph_tables(spark, edges_df(spark, EDGES))
    rows = spam_mass(spark, g, F.expr("true"), iterations=6).collect()
    assert len(rows) == g.n
    for r in rows:
        assert r["spam_mass"] == 0.0, r
        assert r["rank"] == r["trust"]
    g.unpersist()


def test_spam_mass_untrusted_region_scores_high(spark):
    """Pages unreachable from the trusted seeds receive trust only
    from the uniform x0, which decays like alpha^T with no teleport
    replenishment — their relative mass tends to 1; the seeds
    themselves score negative (trust concentrates on them)."""
    from pagerankproject_spark.graph.topics import spam_mass
    from pagerankproject_spark.ingest.edges import build_graph_tables

    # two disconnected areas: p1<->p2 (trusted side), p8<->p9 (spam side)
    edges = [
        ("g.com/p1", "g.com/p2"),
        ("g.com/p2", "g.com/p1"),
        ("g.com/p8", "g.com/p9"),
        ("g.com/p9", "g.com/p8"),
    ]
    g = build_graph_tables(spark, edges_df(spark, edges))
    out = {
        r["url"]: r
        for r in spam_mass(
            spark, g, F.expr("url like '%p1' or url like '%p2'"), iterations=40
        ).collect()
    }
    assert out["g.com/p8"]["trust"] < 0.01
    assert out["g.com/p8"]["spam_mass"] > 0.98
    assert out["g.com/p9"]["spam_mass"] > 0.98
    assert out["g.com/p1"]["spam_mass"] < 0.0  # trust CONCENTRATES on seeds
    g.unpersist()
