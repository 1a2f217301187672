"""Brute-force oracles for graph/linkpred.py on a hand-sized graph."""

from __future__ import annotations

import math
from itertools import combinations

from pyspark.sql import functions as F

from pagerankproject_spark.graph.linkpred import (
    adamic_adar,
    bibliographic_coupling,
    cocitation,
    common_neighbors,
    preferential_attachment,
    reciprocity,
    resource_allocation,
    square_count,
)

from .conftest import edges_df

# hub cites everything; a/b co-cited by x and y; b->a reciprocated by a->b
PAIRS = [
    ("x", "a"), ("x", "b"),
    ("y", "a"), ("y", "b"), ("y", "c"),
    ("z", "c"), ("z", "z"),          # self-loop dropped
    ("x", "a"),                      # duplicate dropped
    ("a", "b"), ("b", "a"),          # reciprocated pair
    ("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "x"), ("hub", "y"),
]


def _simple():
    return {(s, d) for s, d in PAIRS if s != d}


def _brute_copairs(edges, cap):
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    kept = [(s, d) for s, d in edges if outdeg[s] <= cap]
    by_src = {}
    for s, d in kept:
        by_src.setdefault(s, set()).add(d)
    counts = {}
    for nbrs in by_src.values():
        for a, b in combinations(sorted(nbrs), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return counts


def test_cocitation_matches_brute_force(spark):
    got = {
        (r["a"], r["b"]): r["cocitations"]
        for r in cocitation(edges_df(spark, PAIRS), max_out_degree=4).collect()
    }
    assert got == _brute_copairs(_simple(), 4)


def test_cocitation_hub_cap_drops_hub_citations(spark):
    capped = cocitation(edges_df(spark, PAIRS), max_out_degree=4).collect()
    uncapped = cocitation(edges_df(spark, PAIRS)).collect()
    # hub has outdeg 5: its C(5,2)=10 pair contributions exist only uncapped
    assert sum(r["cocitations"] for r in uncapped) - sum(
        r["cocitations"] for r in capped
    ) == 10


def test_bibliographic_coupling_is_cocitation_of_reverse(spark):
    got = {
        (r["a"], r["b"]): r["couplings"]
        for r in bibliographic_coupling(edges_df(spark, PAIRS)).collect()
    }
    rev = {(d, s) for s, d in _simple()}
    assert got == _brute_copairs(rev, 10**9)


def test_adamic_adar_matches_brute_force(spark):
    und = {tuple(sorted(p)) for p in _simple()}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {}
    nodes = sorted(adj)
    for u, v in combinations(nodes, 2):
        common = adj[u] & adj[v]
        score = sum(1.0 / math.log(len(adj[w])) for w in common if len(adj[w]) >= 2)
        if score > 0:
            expect[(u, v)] = round(score, 6)
    got = {
        (r["a"], r["b"]): r["aa_score"]
        for r in adamic_adar(edges_df(spark, PAIRS)).collect()
    }
    assert got == expect


def test_adamic_adar_exclude_existing(spark):
    und = {tuple(sorted(p)) for p in _simple()}
    got = adamic_adar(edges_df(spark, PAIRS), exclude_existing=True).collect()
    assert all((r["a"], r["b"]) not in und for r in got)
    assert len(got) > 0


def _und_adj():
    adj = {}
    for a, b in {tuple(sorted(p)) for p in _simple()}:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def test_common_neighbors_matches_brute_force(spark):
    adj = _und_adj()
    expect = {}
    for u, v in combinations(sorted(adj), 2):
        cn = len(adj[u] & adj[v])
        if cn >= 1:
            expect[(u, v)] = cn
    got = {
        (r["a"], r["b"]): r["cn"]
        for r in common_neighbors(edges_df(spark, PAIRS)).collect()
    }
    assert got == expect


def test_common_neighbors_degree_cap_and_exclude_existing(spark):
    adj = _und_adj()
    cap = 3
    expect = {}
    und = {tuple(sorted(p)) for p in _simple()}
    for u, v in combinations(sorted(adj), 2):
        cn = len({w for w in adj[u] & adj[v] if len(adj[w]) <= cap})
        if cn >= 1 and (u, v) not in und:
            expect[(u, v)] = cn
    got = {
        (r["a"], r["b"]): r["cn"]
        for r in common_neighbors(
            edges_df(spark, PAIRS), max_degree=cap, exclude_existing=True
        ).collect()
    }
    assert got == expect


def test_resource_allocation_matches_brute_force(spark):
    adj = _und_adj()
    expect = {}
    for u, v in combinations(sorted(adj), 2):
        common = adj[u] & adj[v]
        score = sum(1.0 / len(adj[w]) for w in common if len(adj[w]) >= 2)
        if score > 0:
            expect[(u, v)] = round(score, 6)
    got = {
        (r["a"], r["b"]): r["ra_score"]
        for r in resource_allocation(edges_df(spark, PAIRS)).collect()
    }
    assert got == expect


def test_preferential_attachment_on_candidate_pairs(spark):
    adj = _und_adj()
    expect = {}
    for u, v in combinations(sorted(adj), 2):
        if adj[u] & adj[v]:
            expect[(u, v)] = len(adj[u]) * len(adj[v])
    got = {
        (r["a"], r["b"]): r["pa_score"]
        for r in preferential_attachment(edges_df(spark, PAIRS)).collect()
    }
    assert got == expect


def _brute_squares(adj):
    # count 4-cycles by diagonal-pair identity; verify evenness
    total_pairs = 0
    for u, v in combinations(sorted(adj), 2):
        cn = len(adj[u] & adj[v])
        total_pairs += cn * (cn - 1) // 2
    assert total_pairs % 2 == 0
    return total_pairs // 2


def test_square_count_on_k4_and_cycle(spark):
    # C4: exactly one square
    c4 = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    assert square_count(edges_df(spark, c4)).collect()[0]["n_squares"] == 1
    # K4 contains 3 distinct 4-cycles
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    assert square_count(edges_df(spark, k4)).collect()[0]["n_squares"] == 3
    # triangle has none; empty simple graph has none
    tri = [("a", "b"), ("b", "c"), ("c", "a")]
    assert square_count(edges_df(spark, tri)).collect()[0]["n_squares"] == 0
    assert square_count(edges_df(spark, [("a", "a")])).collect()[0]["n_squares"] == 0


def test_square_count_matches_brute_force_on_fixture(spark):
    adj = _und_adj()
    got = square_count(edges_df(spark, PAIRS)).collect()[0]["n_squares"]
    assert got == _brute_squares(adj)


def test_reciprocity(spark):
    simple = _simple()
    recip = sum(1 for s, d in simple if (d, s) in simple)
    row = reciprocity(edges_df(spark, PAIRS)).collect()[0]
    assert row["total_edges"] == len(simple)
    assert row["reciprocated"] == recip  # (a,b) and (b,a)
    assert row["reciprocity"] == recip / len(simple)


def test_reciprocity_empty_graph_is_null(spark):
    # self-loops only -> simple graph is empty; ratio must be NULL in
    # both engines (guarded division), not NULL-vs-NaN divergence
    row = reciprocity(edges_df(spark, [("a", "a"), ("b", "b")])).collect()[0]
    assert row["total_edges"] == 0
    assert row["reciprocated"] == 0
    assert row["reciprocity"] is None


def test_ppr_from_walks_matches_python_replay(spark):
    from pagerankproject_spark.graph.walks import ppr_from_walks, random_walks

    pairs = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
        # d is dangling: walks through it absorb
    ]
    L, W, A = 3, 2, 0.5  # exact-grid alpha: 6dp round is an identity
    walks = random_walks(edges_df(spark, pairs), walk_length=L, walks_per_vertex=W)
    rows = walks.collect()
    expect = {}
    for r in rows:
        seed = r["walk_id"].split("#")[0]
        w = (1.0 - A) * A ** r["step"] / W
        k = (seed, r["url"])
        expect[k] = expect.get(k, 0.0) + w
    expect = {k: round(v, 6) for k, v in expect.items()}
    got = {
        (r["seed"], r["url"]): r["ppr_est"]
        for r in ppr_from_walks(walks, walk_length=L, walks_per_vertex=W, alpha=A).collect()
    }
    assert got == expect
    # per-seed mass never exceeds the full truncated series (absorbing
    # walks only ever REMOVE mass)
    full = sum((1.0 - A) * A**t for t in range(L + 1))
    per_seed = {}
    for (s, _), v in got.items():
        per_seed[s] = per_seed.get(s, 0.0) + v
    assert all(m <= full + 1e-9 for m in per_seed.values())
    # every seed's own step-0 mass is present
    assert all(got[(s, s)] >= (1.0 - A) / W - 1e-9 for s in per_seed)


def test_modularity_two_triangles_with_bridge(spark):
    from pagerankproject_spark.graph.metrics import modularity

    tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
    tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
    bridge = [("c", "x")]
    edges = edges_df(spark, tri1 + tri2 + bridge)
    labels = spark.createDataFrame(
        [("a", "L"), ("b", "L"), ("c", "L"), ("x", "R"), ("y", "R"), ("z", "R")],
        "url string, label string",
    )
    row = modularity(edges, labels).collect()[0]
    # m=7, intra=6, deg sums 7+7 -> Q = (4*7*6 - 98) / (4*49) = 70/196
    assert row["m_edges"] == 7
    assert row["intra_edges"] == 6
    assert row["degsq_sum"] == 98
    assert row["modularity"] == 70 / 196

    # everything in one community: Q = 0 by definition
    one = labels.select("url", F.lit("all").alias("label"))
    assert modularity(edges, one).collect()[0]["modularity"] == 0.0

    # missing labels fall back to singleton communities
    partial = labels.filter(F.col("label") == "L")
    row2 = modularity(edges, partial).collect()[0]
    assert row2["intra_edges"] == 3  # only tri1 is intra now
    assert row2["degsq_sum"] == 49 + 4 + 4 + 9  # L=7, then y,z deg 2, x deg 3


def test_ppr_seed_survives_hash_in_url(spark):
    from pagerankproject_spark.graph.walks import ppr_from_walks, random_walks

    # a start url containing '#' must come back intact as the seed, and
    # must NOT merge with a distinct seed sharing its pre-'#' prefix
    pairs = [("site.com/p#frag", "site.com/q"), ("site.com/p", "site.com/q"),
             ("site.com/q", "site.com/p")]
    walks = random_walks(edges_df(spark, pairs), walk_length=2, walks_per_vertex=2)
    got = ppr_from_walks(walks, walk_length=2, walks_per_vertex=2, alpha=0.5)
    seeds = {r["seed"] for r in got.collect()}
    assert "site.com/p#frag" in seeds
    assert "site.com/p" in seeds


def test_modularity_label_url_collision_stays_singleton(spark):
    from pagerankproject_spark.graph.metrics import modularity

    # vertex x is unlabeled and its URL equals community label 'x' —
    # it must stay a singleton, not merge into that community
    edges = edges_df(spark, [("a", "x")])
    labels = spark.createDataFrame([("a", "x")], "url string, label string")
    row = modularity(edges, labels).collect()[0]
    assert row["intra_edges"] == 0
    assert row["degsq_sum"] == 1 + 1  # two singleton-degree communities
