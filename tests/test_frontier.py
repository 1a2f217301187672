"""Hand-fixture oracles for ingest/frontier.py::crawl_frontier and
text/pipeline.py::domain_cap_sample (python replays of the exact
deterministic orderings both operators promise)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pagerankproject_spark.ingest.frontier import crawl_frontier
from pagerankproject_spark.text.pipeline import domain_cap_sample

from .conftest import edges_df

# crawled: a.com/1, a.com/2, b.com/1
# uncrawled targets seen from crawled pages:
#   b.com/2 cited by a.com/1 and a.com/2 (citers 2)
#   b.com/3 cited by a.com/1 (citers 1)
#   c.com/1 cited by b.com/1 (citers 1)
#   a.com/9 cited by b.com/1 (citers 1)
# NOT frontier: d.com/1 only cited by the UNcrawled c.com/1;
#   a.com/2 is already crawled; self-loop and dup edges dropped.
EDGES = [
    ("a.com/1", "b.com/2"),
    ("a.com/2", "b.com/2"),
    ("a.com/2", "b.com/2"),        # duplicate edge, one citer
    ("a.com/1", "b.com/3"),
    ("b.com/1", "c.com/1"),
    ("b.com/1", "a.com/9"),
    ("b.com/1", "a.com/2"),        # target already crawled
    ("c.com/1", "d.com/1"),        # citer not crawled
    ("a.com/1", "a.com/1"),        # self-loop
]
CRAWLED = ["a.com/1", "a.com/2", "b.com/1"]


def _crawled_df(spark):
    return spark.createDataFrame([(u,) for u in CRAWLED], "url string")


def test_crawl_frontier_citers_and_membership(spark):
    got = {
        r["url"]: (r["host"], r["citers"], r["host_rank"])
        for r in crawl_frontier(edges_df(spark, EDGES), _crawled_df(spark)).collect()
    }
    assert got == {
        "b.com/2": ("b.com", 2, 1),
        "b.com/3": ("b.com", 1, 2),
        "c.com/1": ("c.com", 1, 1),
        "a.com/9": ("a.com", 1, 1),
    }


def test_crawl_frontier_per_host_cap_and_min_citers(spark):
    capped = crawl_frontier(
        edges_df(spark, EDGES), _crawled_df(spark), per_host_cap=1
    ).collect()
    assert {r["url"] for r in capped} == {"b.com/2", "c.com/1", "a.com/9"}
    assert all(r["host_rank"] == 1 for r in capped)

    popular = crawl_frontier(
        edges_df(spark, EDGES), _crawled_df(spark), min_citers=2
    ).collect()
    assert [(r["url"], r["citers"]) for r in popular] == [("b.com/2", 2)]


def test_crawl_frontier_empty_crawled_set(spark):
    empty = spark.createDataFrame([], "url string")
    assert crawl_frontier(edges_df(spark, EDGES), empty).count() == 0


def test_domain_cap_sample_matches_python_replay(spark):
    from pagerankproject_spark.text.pipeline import (
        SAMPLE_SALT,
        domain_expr,
        sample_hash_expr,
    )
    import hashlib

    rows = [(i, f"ex{i % 3}.com/p{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    k = 5
    got = sorted(
        (r["doc_id"], r["domain"], r["domain_rank"])
        for r in domain_cap_sample(
            df, F.col("url"), F.col("doc_id"), k=k
        ).collect()
    )

    def h(key: int) -> int:
        v = int(hashlib.md5(f"{SAMPLE_SALT}{key}".encode()).hexdigest()[:15], 16)
        return v % 1000

    by_dom: dict[str, list[int]] = {}
    for i, url in rows:
        by_dom.setdefault(url.split("/")[0], []).append(i)
    expect = []
    for dom, ids in by_dom.items():
        ordered = sorted(ids, key=lambda i: (h(i), i))
        expect.extend((i, dom, rk + 1) for rk, i in enumerate(ordered[:k]))
    assert got == sorted(expect)
    # cap respected per domain, all domains present
    per_dom: dict[str, int] = {}
    for _, dom, _ in got:
        per_dom[dom] = per_dom.get(dom, 0) + 1
    assert per_dom == {f"ex{j}.com": k for j in range(3)}
