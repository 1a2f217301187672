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


def _write_synonym_files(tmp_path):
    """covid's neighbors include a low scorer beyond top_k=2 that must
    be truncated, plus a tie broken by neighbor asc."""
    rows = [
        ("covid", "vaccine", 0.9),
        ("covid", "corona", 0.9),
        ("covid", "mask", 0.1),
    ]
    jpath = tmp_path / "syn.json"
    import json

    jpath.write_text(
        json.dumps({"covid": [[n, s] for _, n, s in rows]})
    )
    ppath = tmp_path / "syn.parquet"
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "term": [r[0] for r in rows],
                "neighbor": [r[1] for r in rows],
                "score": [r[2] for r in rows],
            }
        ),
        ppath,
    )
    return jpath, ppath


def test_file_synonyms_load_order_and_topk(tmp_path):
    from pagerankproject_spark.search.query import file_synonyms

    jpath, ppath = _write_synonym_files(tmp_path)
    for path in (jpath, ppath):
        prov = file_synonyms(str(path), top_k=2)
        # score desc, neighbor asc tie-break, truncated to top_k
        assert prov("covid") == [("corona", 0.9), ("vaccine", 0.9)]
        assert prov("unknown-term") == []
    with pytest.raises(ValueError, match="json/.parquet"):
        file_synonyms("model.bin")


def test_file_synonyms_scoring_matches_static_table(spark, tmp_path):
    """The file-backed provider reproduces the injected-table scoring
    semantics end-to-end through score_expr / query_predicate_expr —
    the reference's --search_query flow with a static stand-in for
    glove (pagerank.py:259-269)."""
    from pagerankproject_spark.search.query import file_synonyms

    jpath, _ = _write_synonym_files(tmp_path)
    prov = file_synonyms(str(jpath))
    static = lambda t: (
        [("corona", 0.9), ("vaccine", 0.9), ("mask", 0.1)] if t == "covid" else []
    )
    rows = [("a/corona-news", 0.5), ("b/vaccine", 0.25), ("c/mask-mask", 0.125)]
    df = spark.createDataFrame(rows, "url string, x double")
    got_file = {
        r["url"]: r["ranking"]
        for r in df.withColumn("ranking", score_expr("covid", prov, p=3)).collect()
    }
    got_static = {
        r["url"]: r["ranking"]
        for r in df.withColumn("ranking", score_expr("covid", static, p=3)).collect()
    }
    assert got_file == got_static
    assert df.filter(query_predicate_expr("covid", prov)).count() == 3
