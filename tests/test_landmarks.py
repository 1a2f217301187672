"""Python BFS oracles for graph/landmarks.py — exact sketch distances
in both directions, the triangle-inequality estimate for query pairs
(including NULL / missing-vertex pairs), and the upper-bound +
exactness-through-a-landmark guarantees from Potamias et al. 2009."""

from __future__ import annotations

from collections import deque

import pytest

from pagerankproject_spark.graph.landmarks import (
    distance_upper_bounds,
    landmark_distances,
)
from pagerankproject_spark.ingest.edges import build_graph_tables

from .conftest import edges_df

# Two lobes joined only through hub h: every a->b path crosses h, so
# landmark {h} estimates are EXACT for cross-lobe pairs; the in-lobe
# shortcut b1->b3 makes the through-h bound strictly loose (est 4 via
# b1->..->h->..->b3 vs true 1). z2 is a sink no landmark reaches.
EDGES = [
    ("a1", "a2"), ("a2", "a3"), ("a1", "a3"), ("a3", "h"),
    ("h", "b1"), ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
    ("b3", "h"),                     # back-edge: b-lobe can reach a side's hub
    ("a2", "z2"),                    # z2 reachable, but reaches nothing
]


def _adj(edges, reverse=False):
    adj: dict[str, list[str]] = {}
    for s, d in edges:
        if reverse:
            s, d = d, s
        adj.setdefault(s, []).append(d)
    return adj


def _bfs(adj, s):
    dist, q = {s: 0}, deque([s])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _oracle_est(edges, landmarks, u, v):
    fwd = {l: _bfs(_adj(edges), l) for l in landmarks}
    rev = {l: _bfs(_adj(edges, reverse=True), l) for l in landmarks}
    cands = [
        rev[l][u] + fwd[l][v]
        for l in landmarks
        if u in rev[l] and v in fwd[l]
    ]
    return min(cands) if cands else None


def test_landmark_distances_both_directions_match_bfs(spark):
    g = build_graph_tables(spark, edges_df(spark, EDGES))
    landmarks = ["h", "a1"]

    fwd = {
        (r["landmark"], r["url"]): r["dist"]
        for r in landmark_distances(spark, g, landmarks, "forward").collect()
    }
    expect_fwd = {
        (l, v): d for l in landmarks for v, d in _bfs(_adj(EDGES), l).items()
    }
    assert fwd == expect_fwd

    rev = {
        (r["landmark"], r["url"]): r["dist"]
        for r in landmark_distances(spark, g, landmarks, "reverse").collect()
    }
    expect_rev = {
        (l, v): d
        for l in landmarks
        for v, d in _bfs(_adj(EDGES, reverse=True), l).items()
    }
    assert rev == expect_rev


def test_distance_upper_bounds_matches_python_oracle(spark):
    g = build_graph_tables(spark, edges_df(spark, EDGES))
    landmarks = ["h"]
    pairs = [
        ("a1", "b3"),   # cross-lobe: exact through h
        ("b1", "a1"),   # b-lobe reaches h but h never reaches a-lobe -> NULL
        ("b1", "b3"),   # in-lobe shortcut: bound 2+2=4 > true 1
        ("a1", "z2"),   # z2 unreachable FROM h -> NULL
        ("h", "h"),     # landmark itself: 0 + 0
        ("nope", "b1"),  # u not a vertex -> NULL, no error
    ]
    got = {
        (r["u"], r["v"]): r["est"]
        for r in distance_upper_bounds(
            spark, g, landmarks, spark.createDataFrame(pairs, "u string, v string")
        ).collect()
    }
    assert got == {
        (u, v): _oracle_est(EDGES, landmarks, u, v) for u, v in pairs
    }
    assert got[("a1", "b3")] == 4      # 2 hops to h + 2 from h, exact
    assert got[("b1", "a1")] is None
    assert got[("b1", "b3")] == 4      # true distance 1: upper bound, not exact
    assert got[("h", "h")] == 0
    assert got[("nope", "b1")] is None


def test_upper_bound_dominates_true_distance_everywhere(spark):
    g = build_graph_tables(spark, edges_df(spark, EDGES))
    landmarks = ["h", "b1"]
    verts = sorted({x for e in EDGES for x in e})
    pairs = [(u, v) for u in verts for v in verts]
    got = {
        (r["u"], r["v"]): r["est"]
        for r in distance_upper_bounds(
            spark, g, landmarks, spark.createDataFrame(pairs, "u string, v string")
        ).collect()
    }
    fwd_all = {u: _bfs(_adj(EDGES), u) for u in verts}
    for u, v in pairs:
        true_d = fwd_all[u].get(v)
        est = got[(u, v)]
        if est is not None:
            # est is realized by a concatenation of real paths
            assert true_d is not None and est >= true_d
        assert est == _oracle_est(EDGES, landmarks, u, v)


def test_missing_landmark_raises(spark):
    g = build_graph_tables(spark, edges_df(spark, EDGES))
    with pytest.raises(ValueError, match="source urls"):
        landmark_distances(spark, g, ["h", "ghost"], "forward")
    with pytest.raises(ValueError, match="direction"):
        landmark_distances(spark, g, ["h"], "sideways")
