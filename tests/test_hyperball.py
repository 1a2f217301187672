"""HyperBall (graph/hyperball.py): exact-reachability accuracy gates,
convergence semantics, and effective-diameter geometry."""

from __future__ import annotations

import hashlib

from pagerankproject_spark.graph.hyperball import (
    ALPHA_M,
    M,
    harmonic_centrality,
    hyperball,
    init_sketches,
)

from .conftest import edges_df


def _exact_balls(edges, t=None):
    adj = {}
    nodes = set()
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        nodes.update((s, d))
    balls = {}
    for v in nodes:
        frontier, seen, depth = {v}, {v}, 0
        while frontier and (t is None or depth < t):
            frontier = {
                u for w in frontier for u in adj.get(w, ()) if u not in seen
            }
            seen |= frontier
            depth += 1
        balls[v] = seen
    return balls


def test_path_graph_converges_with_exact_diameter_geometry(spark):
    # 0 -> 1 -> ... -> 9: ball sizes are exact ranks; N(t) grows until t=9
    pairs = [(f"v{i}", f"v{i+1}") for i in range(9)]
    res = hyperball(spark, edges_df(spark, pairs), t_max=32)
    assert res.converged
    assert res.iterations == 9  # = graph diameter
    assert len(res.nf) == 10  # N(0)..N(9)
    assert all(b >= a for a, b in zip(res.nf, res.nf[1:]))
    assert res.effective_diameter is not None
    assert 0 < res.effective_diameter <= 9


def test_estimates_track_exact_ball_sizes(spark):
    # dense-ish deterministic digraph, 60 vertices
    pairs = [
        (f"p{i}", f"p{(i * 7 + j * j) % 60}") for i in range(60) for j in range(4)
    ]
    exact = _exact_balls(pairs)
    res = hyperball(spark, edges_df(spark, pairs), t_max=32)
    got = {r["url"]: r["ball_est"] for r in res.balls.collect()}
    assert set(got) == set(exact)
    # m=16 HLL: small sets sit in the linear-counting regime; gate the
    # mean relative error well inside the estimator's theoretical rse
    rel = [abs(got[v] - len(exact[v])) / len(exact[v]) for v in exact]
    assert sum(rel) / len(rel) < 0.30
    assert max(rel) < 0.80


def test_fixed_depth_equals_truncated_exact_ball_registers(spark):
    # early_stop=False at depth t must estimate B(v, t), not B(v, inf)
    pairs = [(f"v{i}", f"v{i+1}") for i in range(9)]
    res3 = hyperball(spark, edges_df(spark, pairs), t_max=3, early_stop=False)
    exact3 = _exact_balls(pairs, t=3)
    got = {r["url"]: r["ball_est"] for r in res3.balls.collect()}
    # every true ball here has <= 4 elements -> linear-counting regime,
    # where distinct register patterns imply distinct estimates; check
    # monotonicity vs the 1-hop run instead of absolute values
    res1 = hyperball(spark, edges_df(spark, pairs), t_max=1, early_stop=False)
    got1 = {r["url"]: r["ball_est"] for r in res1.balls.collect()}
    assert all(got[v] >= got1[v] for v in got)
    # and the deepest vertex's 3-ball strictly exceeds its 1-ball
    assert got["v0"] > got1["v0"]
    assert set(got) == set(exact3)


def test_singleton_sketch_has_exactly_one_register(spark):
    verts = spark.createDataFrame([("site.com/a",), ("site.com/b",)], "url string")
    rows = init_sketches(verts).collect()
    for r in rows:
        regs = [r[f"r{k}"] for k in range(M)]
        assert sum(1 for x in regs if x > 0) == 1
        assert all(x >= 0 for x in regs)


def _py_estimate(regs):
    import math

    s = sum(2.0 ** -r for r in regs)
    v = sum(1 for r in regs if r == 0)
    raw = ALPHA_M * M * M / s
    if raw <= 2.5 * M and v > 0:
        return M * math.log(M / float(v))
    return raw


def _py_registers(urls):
    regs = [0] * M
    for u in urls:
        h = hashlib.md5(u.encode()).hexdigest()
        j = int(h[0], 16)
        rest = h[1:32]
        z = len(rest) - len(rest.lstrip("0"))
        extra = 0
        if z < len(rest):
            extra = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}.get(
                rest[z], 0
            )
        rho = 4 * z + extra + 1
        regs[j] = max(regs[j], rho)
    return regs


def test_harmonic_centrality_matches_python_replay(spark):
    pairs = [
        (f"p{i}", f"p{(i * 5 + j) % 17}") for i in range(17) for j in range(1, 3)
    ]
    t_max = 3
    # exact min-hop distances
    adj = {}
    nodes = set()
    for s, d in set(pairs):
        if s != d:
            adj.setdefault(s, set()).add(d)
            nodes.update((s, d))
    expect = {}
    for v in sorted(nodes):
        dist = {v: 0}
        frontier = {v}
        for t in range(1, t_max + 1):
            frontier = {
                u for w in frontier for u in adj.get(w, ()) if u not in dist
            }
            for u in frontier:
                dist[u] = t
        ests = [
            _py_estimate(_py_registers([w for w, dw in dist.items() if dw <= t]))
            for t in range(t_max + 1)
        ]
        h = 0.0
        for t in range(1, t_max + 1):
            h = h + (ests[t] - ests[t - 1]) / float(t)
        expect[v] = round(h, 6)
    got = {
        r["url"]: r["harmonic"]
        for r in harmonic_centrality(spark, edges_df(spark, pairs), t_max=3).collect()
    }
    assert got == expect


def test_duplicate_edges_and_self_loops_do_not_change_sketches(spark):
    pairs = [("a", "b"), ("b", "c"), ("a", "c")]
    noisy = pairs + [("a", "b"), ("a", "a"), ("c", "c")]
    r1 = hyperball(spark, edges_df(spark, pairs), t_max=8)
    r2 = hyperball(spark, edges_df(spark, noisy), t_max=8)
    assert sorted(map(tuple, r1.balls.collect())) == sorted(
        map(tuple, r2.balls.collect())
    )
    assert r1.nf == r2.nf


def test_graphtables_id_path_equals_string_path(spark):
    from pagerankproject_spark.ingest.edges import build_graph_tables

    pairs = [
        (f"site.com/p{i}", f"site.com/p{(i * 7 + j * j) % 40}")
        for i in range(40)
        for j in range(3)
    ]
    e = edges_df(spark, pairs)
    g = build_graph_tables(spark, e)
    r_str = hyperball(spark, edges=e, t_max=32)
    r_ids = hyperball(spark, g=g, t_max=32)
    assert r_ids.converged and r_str.converged
    assert r_ids.iterations == r_str.iterations
    assert r_ids.nf == r_str.nf
    got_str = sorted(map(tuple, r_str.balls.collect()))
    got_ids = sorted(map(tuple, r_ids.balls.collect()))
    assert got_ids == got_str


def test_harmonic_id_path_equals_string_path(spark):
    from pagerankproject_spark.graph.hyperball import harmonic_centrality
    from pagerankproject_spark.ingest.edges import build_graph_tables

    pairs = [
        (f"site.com/p{i}", f"site.com/p{(i * 7 + j * j) % 40}")
        for i in range(40)
        for j in range(3)
    ]
    e = edges_df(spark, pairs)
    g = build_graph_tables(spark, e)
    got_str = sorted(map(tuple, harmonic_centrality(spark, edges=e, t_max=3).collect()))
    got_ids = sorted(map(tuple, harmonic_centrality(spark, g=g, t_max=3).collect()))
    assert got_ids == got_str


def test_selfloop_only_vertex_excluded_in_both_key_spaces(spark):
    import pytest

    from pagerankproject_spark.ingest.edges import build_graph_tables

    pairs = [("site.com/a", "site.com/b"), ("site.com/b", "site.com/c"),
             ("site.com/s", "site.com/s")]
    e = edges_df(spark, pairs)
    g = build_graph_tables(spark, e)
    r_str = hyperball(spark, edges=e, t_max=8)
    r_ids = hyperball(spark, g=g, t_max=8)
    # s has only a self-loop: not a vertex of the simple graph in EITHER path
    assert sorted(map(tuple, r_ids.balls.collect())) == sorted(
        map(tuple, r_str.balls.collect())
    )
    assert r_ids.nf == r_str.nf
    assert all(r["url"] != "site.com/s" for r in r_str.balls.collect())

    # empty simple graph fails fast instead of float(None) crashing
    loops = edges_df(spark, [("a", "a"), ("b", "b")])
    with pytest.raises(ValueError, match="empty graph"):
        hyperball(spark, edges=loops, t_max=4)
    with pytest.raises(ValueError, match="empty graph"):
        harmonic_centrality(spark, edges=loops, t_max=2)
