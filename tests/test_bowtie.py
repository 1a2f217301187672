"""Bow-tie decomposition (graph/bowtie.py) on a handcrafted graph where
every one of the seven Broder regions is populated, plus invariants on
the weblike fixture. Regions verified by hand:

    core cycle a -> b -> c -> a            CORE  {a, b, c}
    i1 -> i2 -> a                          IN    {i1, i2}
    c -> o1 -> o2                          OUT   {o1, o2}
    i1 -> t1 (dead end off IN)             TENDRIL_IN  {t1}
    i2 -> u1 -> o1 (IN-to-OUT avoiding core)  TUBE  {u1}
    t2 -> o1 (no in-edges, leads into OUT) TENDRIL_OUT {t2}
    d1 -> d2 (separate island)             DISC  {d1, d2}
"""

from __future__ import annotations

from pagerankproject_spark.graph.bowtie import bowtie
from pagerankproject_spark.ingest.edges import build_graph_tables

from .conftest import edges_df

BOWTIE_EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("i1", "i2"), ("i2", "a"),
    ("c", "o1"), ("o1", "o2"),
    ("i1", "t1"),
    ("i2", "u1"), ("u1", "o1"),
    ("t2", "o1"),
    ("d1", "d2"),
]

EXPECTED = {
    "a": "CORE", "b": "CORE", "c": "CORE",
    "i1": "IN", "i2": "IN",
    "o1": "OUT", "o2": "OUT",
    "t1": "TENDRIL_IN",
    "u1": "TUBE",
    "t2": "TENDRIL_OUT",
    "d1": "DISC", "d2": "DISC",
}


def test_bowtie_handcrafted(spark):
    g = build_graph_tables(spark, edges_df(spark, BOWTIE_EDGES))
    res = bowtie(spark, g)
    got = {r["url"]: r["region"] for r in res.regions.collect()}
    assert got == EXPECTED
    assert res.core_label == "a"
    g.unpersist()


def test_bowtie_partition_invariance(spark):
    g = build_graph_tables(
        spark, edges_df(spark, BOWTIE_EDGES).repartition(7)
    )
    res = bowtie(spark, g)
    got = {r["url"]: r["region"] for r in res.regions.collect()}
    assert got == EXPECTED
    g.unpersist()


def test_bowtie_weblike_invariants(spark):
    """On the synthetic weblike fixture: every vertex classified exactly
    once, CORE matches the largest SCC, and IN/OUT are disjoint from
    CORE and each other."""
    from fixtures.graphs import make_weblike
    from pagerankproject_spark.graph.scc import strongly_connected_components

    pairs = make_weblike(seed=23, n_nodes=200, m_edges=1200)
    g = build_graph_tables(spark, edges_df(spark, pairs))
    res = bowtie(spark, g)
    rows = res.regions.collect()
    assert len(rows) == g.n
    by_region: dict[str, set] = {}
    for r in rows:
        by_region.setdefault(r["region"], set()).add(r["url"])

    comp = strongly_connected_components(spark, g).components.collect()
    sizes: dict[str, int] = {}
    for r in comp:
        sizes[r["component"]] = sizes.get(r["component"], 0) + 1
    biggest = max(sizes.values())
    # deterministic pick: largest size, then min label
    core_label = min(c for c, s in sizes.items() if s == biggest)
    core_urls = {r["url"] for r in comp if r["component"] == core_label}
    assert by_region.get("CORE", set()) == core_urls
    assert not by_region.get("IN", set()) & by_region.get("OUT", set())
    g.unpersist()
