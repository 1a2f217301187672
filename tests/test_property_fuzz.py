"""Property-based fuzzing (hypothesis): random small digraphs through
the engine vs the pure-python oracles in oracle/numpy_ref.

The fixed fixtures elsewhere pin known answers on known shapes; these
pin the same contracts on the shapes hypothesis enumerates —
self-loops, parallel edges, loop-only vertices, stars, near-cliques,
disconnected scraps — exactly the degenerate corners hand-written
fixtures under-sample. Deterministic (`derandomize=True`): the example
sequence is a pure function of the strategy, so failures reproduce and
CI never flakes. Examples are deliberately tiny (<= 10 vertices, <= 40
edge slots): the value here is shape diversity; scale evidence lives
in jobs/bench_*.py.
"""

from __future__ import annotations

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from .conftest import edges_df
from pagerankproject_spark.oracle import numpy_ref as oracle

VERTS = [f"v{i}" for i in range(10)]

edges_strategy = st.lists(
    st.tuples(st.sampled_from(VERTS), st.sampled_from(VERTS)),
    min_size=1,
    max_size=40,
)

FUZZ = settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _tables(spark, pairs):
    from pagerankproject_spark.ingest.edges import build_graph_tables

    return build_graph_tables(spark, edges_df(spark, pairs))


def _simple(pairs):
    return {tuple(sorted((s, t))) for s, t in pairs if s != t}


@FUZZ
@given(pairs=edges_strategy)
def test_fuzz_connected_components(spark, pairs):
    from pagerankproject_spark.graph.components import connected_components

    g = _tables(spark, pairs)
    try:
        res = connected_components(spark, g)
        got = {r["url"]: r["component"] for r in res.components.collect()}
    finally:
        g.unpersist()
    assert got == oracle.connected_components(pairs)


@FUZZ
@given(pairs=edges_strategy)
def test_fuzz_triangles(spark, pairs):
    from pagerankproject_spark.graph.triangles import triangle_counts

    assume(_simple(pairs))  # per-edge output is over the simple graph
    res = triangle_counts(spark, edges=edges_df(spark, pairs))
    got = {(r["a"], r["b"]): r["triangles"] for r in res.per_edge.collect()}
    per_edge, total = oracle.triangle_counts(pairs)
    assert got == per_edge
    assert res.total == total


@FUZZ
@given(pairs=edges_strategy)
def test_fuzz_coreness(spark, pairs):
    from pagerankproject_spark.graph.kcore import coreness

    g = _tables(spark, pairs)
    try:
        res = coreness(spark, g)
        got = {r["url"]: r["coreness"] for r in res.vertices.collect()}
    finally:
        g.unpersist()
    assert got == oracle.coreness_by_url(pairs)


@FUZZ
@given(pairs=edges_strategy, src_i=st.integers(min_value=0, max_value=9))
def test_fuzz_bfs_distances(spark, pairs, src_i):
    from pagerankproject_spark.graph.kcore import bfs_distances

    present = sorted({v for e in pairs for v in e})
    source = present[src_i % len(present)]
    g = _tables(spark, pairs)
    try:
        res = bfs_distances(spark, g, sources=[source])
        got = {r["url"]: r["distance"] for r in res.distances.collect()}
    finally:
        g.unpersist()
    assert got == oracle.bfs_distances_by_url(pairs, [source])


@FUZZ
@given(pairs=edges_strategy)
def test_fuzz_pagerank(spark, pairs):
    from pagerankproject_spark.graph.pagerank import pagerank

    g = _tables(spark, pairs)
    try:
        res = pagerank(spark, g, epsilon=1e-7, max_iterations=60)
        got = {r["url"]: r["x"] for r in res.ranks.collect()}
    finally:
        g.unpersist()
    want, _ = oracle.pagerank_by_url(pairs, epsilon=1e-7, max_iterations=60)
    assert set(got) == set(want)
    for url, w in want.items():
        assert abs(got[url] - w) < 1e-5, (url, got[url], w)


@FUZZ
@given(pairs=edges_strategy)
def test_fuzz_label_propagation(spark, pairs):
    from pagerankproject_spark.graph.labelprop import label_propagation

    # dedupe: the python oracle counts parallel edges as extra votes,
    # the engine's GraphTables path aggregates the simple adjacency
    dedup = sorted(set(pairs))
    g = _tables(spark, dedup)
    try:
        res = label_propagation(spark, g, max_iterations=20)
        got = {r["url"]: r["label"] for r in res.labels.collect()}
    finally:
        g.unpersist()
    assert got == oracle.label_propagation(dedup, max_iterations=20)
