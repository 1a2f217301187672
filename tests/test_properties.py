"""T5 property tests (SURVEY §5.2): seeded random graphs, invariants
the algorithms must hold regardless of topology.

  * PageRank: unit-L2 output, strictly positive ranks under uniform
    personalization, per-url agreement with the float64 numpy oracle.
  * Connected components: idempotence (re-running on the labeled output
    is a fixpoint) and label = min url of the component.
  * Triangles: per-undirected-edge counts invariant under edge-direction
    reversal.
"""

from __future__ import annotations

import math
import random

import pytest

from fixtures.graphs import make_weblike
from pagerankproject_spark.graph.components import connected_components
from pagerankproject_spark.graph.pagerank import pagerank
from pagerankproject_spark.graph.triangles import triangle_counts
from pagerankproject_spark.ingest.edges import build_graph_tables
from pagerankproject_spark.oracle import numpy_ref as oracle

from .conftest import edges_df

SEEDS = [3, 17, 29]


def _random_graph(seed: int, n: int = 30, m: int = 120) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    # plain node names that survive the regex filter
    return [
        (f"n{rng.randrange(n)}.page", f"n{rng.randrange(n)}.page")
        for _ in range(m)
    ]


@pytest.mark.parametrize("seed", SEEDS)
def test_pagerank_invariants_random_graph(spark, seed):
    pairs = _random_graph(seed)
    g = build_graph_tables(spark, edges_df(spark, pairs))
    res = pagerank(spark, g, alpha=0.85, epsilon=1e-7, max_iterations=200)
    got = {r["url"]: r["x"] for r in res.ranks.collect()}

    l2 = math.sqrt(sum(x * x for x in got.values()))
    assert abs(l2 - 1.0) < 1e-9  # unit-L2 every iteration incl. the last
    assert all(x > 0 for x in got.values())  # teleport keeps ranks positive

    want, _ = oracle.pagerank_by_url(pairs, alpha=0.85, epsilon=1e-7, max_iterations=200)
    assert set(got) == set(want)
    for url, w in want.items():
        assert abs(got[url] - w) < 1e-6, (seed, url, got[url], w)
    g.unpersist()


@pytest.mark.parametrize("seed", SEEDS[:2])
def test_connected_components_idempotent_and_min_label(spark, seed):
    pairs = _random_graph(seed, n=25, m=60)
    g = build_graph_tables(spark, edges_df(spark, pairs))
    res = connected_components(spark, g)
    labels = {r["url"]: r["component"] for r in res.components.collect()}

    # label = min url of the component (oracle recomputes components)
    want = oracle.connected_components(pairs)
    assert labels == want

    # idempotence: treat (url -> label) as edges url->label; components of
    # that graph reproduce the same assignment.
    relabel_pairs = [(u, c) for u, c in labels.items()]
    g2 = build_graph_tables(spark, edges_df(spark, relabel_pairs))
    res2 = connected_components(spark, g2)
    labels2 = {r["url"]: r["component"] for r in res2.components.collect()}
    for u, c in labels.items():
        assert labels2[u] == c
    g.unpersist()
    g2.unpersist()


@pytest.mark.parametrize("seed", SEEDS[:2])
def test_triangles_direction_invariant(spark, seed):
    pairs = _random_graph(seed, n=20, m=80)
    rev = [(b, a) for a, b in pairs]
    g1 = build_graph_tables(spark, edges_df(spark, pairs))
    g2 = build_graph_tables(spark, edges_df(spark, rev))
    c1 = {
        (r["a"], r["b"]): r["triangles"]
        for r in triangle_counts(spark, g1).per_edge.collect()
    }
    c2 = {
        (r["a"], r["b"]): r["triangles"]
        for r in triangle_counts(spark, g2).per_edge.collect()
    }
    assert c1 == c2
    g1.unpersist()
    g2.unpersist()


def test_pagerank_invariant_to_partitioning(spark):
    """Distributed-correctness: the result must not depend on the
    physical partition count (sum order, id assignment, join layout)."""
    pairs = _random_graph(11, n=35, m=150)
    outs = []
    # fixed iteration count: with an epsilon stop, the two layouts can
    # converge one iteration apart when the residual grazes epsilon
    # (float sum-order noise), which would leak ~epsilon-sized diffs.
    for p in (2, 8):
        g = build_graph_tables(spark, edges_df(spark, pairs), num_partitions=p)
        res = pagerank(spark, g, alpha=0.85, epsilon=0.0, max_iterations=80)
        outs.append({r["url"]: r["x"] for r in res.ranks.collect()})
        g.unpersist()
    a, b = outs
    assert set(a) == set(b)
    for url in a:
        assert abs(a[url] - b[url]) < 1e-9, (url, a[url], b[url])


def test_lpa_invariant_to_partitioning(spark):
    """LPA's min-label tie-breaks must not depend on physical layout."""
    from pagerankproject_spark.graph.labelprop import label_propagation

    pairs = _random_graph(19, n=30, m=100)
    outs = []
    for p in (2, 8):
        g = build_graph_tables(spark, edges_df(spark, pairs), num_partitions=p)
        res = label_propagation(spark, g, max_iterations=8)
        outs.append({r["url"]: r["label"] for r in res.labels.collect()})
        g.unpersist()
    assert outs[0] == outs[1]


def test_hits_invariant_to_partitioning(spark):
    from pagerankproject_spark.graph.hits import hits

    pairs = _random_graph(23, n=25, m=90)
    outs = []
    for p in (2, 8):
        g = build_graph_tables(spark, edges_df(spark, pairs), num_partitions=p)
        res = hits(spark, g, epsilon=0.0, max_iterations=25)
        outs.append(
            {r["url"]: (r["hub"], r["authority"]) for r in res.scores.collect()}
        )
        g.unpersist()
    a, b = outs
    assert set(a) == set(b)
    for url in a:
        assert abs(a[url][0] - b[url][0]) < 1e-9
        assert abs(a[url][1] - b[url][1]) < 1e-9
