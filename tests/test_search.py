"""Search-layer tests — the reference's 8 doctests
(/root/reference/pagerank.py:281-296) plus scoring semantics with an
injected synonym table (SURVEY §2.4.8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerankproject_spark.search.query import (
    query_predicate_expr,
    score_expr,
    search,
)

URL = "www.lawfareblog.com/covid-19-speech"

# (query, expected) — exactly the reference doctests
DOCTESTS = [
    ("covid", True),
    ("coronavirus covid", True),
    ("coronavirus", False),
    ("covid -speech", False),
    ("covid -corona", True),
    ("-speech", False),
    ("-corona", True),
    ("", True),
]


@pytest.mark.parametrize("query,expected", DOCTESTS)
def test_url_satisfies_query_doctests(spark, query, expected):
    df = spark.createDataFrame([(URL,)], "url string")
    got = df.filter(query_predicate_expr(query)).count() == 1
    assert got == expected


def test_predicate_uses_synonyms(spark):
    syn = lambda t: [("covid", 0.9)] if t == "corona" else []
    df = spark.createDataFrame([(URL,)], "url string")
    assert df.filter(query_predicate_expr("corona", syn)).count() == 1
    assert df.filter(query_predicate_expr("corona")).count() == 0


def test_scoring_counts_only_synonyms(spark):
    """pagerank.py:225-243: score = sum over synonym words of
    count(word in url) * s^p, the query term itself NOT counted;
    ranking = pagerank * score."""
    rows = [("a/covid-covid-news", 0.5), ("b/vaccine-report", 0.25), ("c/other", 0.125)]
    df = spark.createDataFrame(rows, "url string, x double")
    syn = lambda t: [("covid", 0.5), ("vaccine", 0.2)] if t == "corona" else []
    p = 3
    out = {
        r["url"]: r["ranking"]
        for r in df.withColumn("ranking", score_expr("corona", syn, p=p)).collect()
    }
    assert out["a/covid-covid-news"] == pytest.approx(0.5 * (2 * 0.5**p))
    assert out["b/vaccine-report"] == pytest.approx(0.25 * (1 * 0.2**p))
    assert out["c/other"] == pytest.approx(0.0)


def test_search_empty_query_is_pagerank_topk(spark):
    rows = [(f"u{i}", float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "url string, x double")
    got = search(df, "", max_results=3)
    assert got == [("u19", 19.0), ("u18", 18.0), ("u17", 17.0)]


def test_search_filters_negation(spark):
    rows = [("aaa", 3.0), ("abb", 2.0), ("bbb", 1.0)]
    df = spark.createDataFrame(rows, "url string, x double")
    got = search(df, "-a", max_results=10)
    assert [u for u, _ in got] == ["bbb"]
