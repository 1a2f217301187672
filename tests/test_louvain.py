"""Louvain local-moving pass (graph/louvain.py) vs an exact pure-Python
replay of the same rules (integer gains, parity gating, strict
improvement, min-label ties) — the engine must reproduce the replay
EXACTLY, plus a semantic planted-communities check.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from .conftest import edges_df


def _replay_louvain(edges: list[tuple[str, str]], rounds: int) -> dict[str, str]:
    """Reference replay: identical rules on url-sort-rank vertices."""
    urls = sorted({u for e in edges for u in e})
    ridx = {u: i for i, u in enumerate(urls)}
    w: dict[tuple[int, int], int] = defaultdict(int)
    for s, t in edges:
        a, b = ridx[s], ridx[t]
        if a == b:
            continue
        w[(a, b)] += 1
        w[(b, a)] += 1
    deg = defaultdict(int)
    for (a, _), x in w.items():
        deg[a] += x
    m2 = sum(deg.values())
    lab = {i: i for i in range(len(urls))}
    for r in range(rounds):
        tot = defaultdict(int)
        for v, l in lab.items():
            tot[l] += deg[v]
        newlab = dict(lab)
        for u in range(len(urls)):
            if (u + r) % 2 != 0 or deg[u] == 0:
                continue
            kin = defaultdict(int)
            kin[lab[u]] += 0  # own row always present
            for (a, b), x in w.items():
                if a == u:
                    kin[lab[b]] += x
            best = None
            for c, k_in in kin.items():
                t = tot[c] - (deg[u] if c == lab[u] else 0)
                gain = m2 * k_in - deg[u] * t
                key = (gain, -c)
                if best is None or key > best[0]:
                    best = (key, c)
            stay_gain = m2 * kin[lab[u]] - deg[u] * (tot[lab[u]] - deg[u])
            if best[0][0] > stay_gain:
                newlab[u] = best[1]
        lab = newlab
    groups = defaultdict(list)
    for v, l in lab.items():
        groups[l].append(urls[v])
    out = {}
    for members in groups.values():
        rep = min(members)
        for u in members:
            out[u] = rep
    return out


# two 4-cliques bridged by one edge + a pendant; multi-edges + self-loop
CLIQUE_A = ["a.com/p1", "a.com/p2", "a.com/p3", "a.com/p4"]
CLIQUE_B = ["b.com/q1", "b.com/q2", "b.com/q3", "b.com/q4"]
EDGES = (
    [(x, y) for x in CLIQUE_A for y in CLIQUE_A if x < y]
    + [(x, y) for x in CLIQUE_B for y in CLIQUE_B if x < y]
    + [
        ("a.com/p1", "b.com/q1"),       # the bridge
        ("b.com/q4", "b.com/q5"),       # pendant
        ("a.com/p1", "a.com/p2"),       # parallel link (weight 2)
        ("a.com/p3", "a.com/p3"),       # self-loop (dropped)
    ]
)


@pytest.fixture(scope="module")
def louvain_out(spark):
    from pagerankproject_spark.graph.louvain import louvain
    from pagerankproject_spark.ingest.edges import build_graph_tables

    g = build_graph_tables(spark, edges_df(spark, EDGES))
    res = louvain(spark, g, rounds=6)
    rows = {r["url"]: r["community"] for r in res.communities.collect()}
    g.unpersist()
    return res, rows


def test_louvain_matches_exact_replay(louvain_out):
    _, rows = louvain_out
    assert rows == _replay_louvain(EDGES, rounds=6)


def test_louvain_recovers_planted_cliques(louvain_out):
    _, rows = louvain_out
    assert len({rows[u] for u in CLIQUE_A}) == 1
    assert len({rows[u] for u in CLIQUE_B + ["b.com/q5"]}) == 1
    assert rows["a.com/p1"] != rows["b.com/q1"]


def test_louvain_moves_recorded(louvain_out):
    res, _ = louvain_out
    assert res.rounds == 6
    assert sum(m["moved"] for m in res.metrics) > 0
    assert res.metrics[-1]["moved"] == 0  # settled by the last round


def _replay_move_rounds(nodes, w, deg, m2, rounds):
    """Local-moving rounds over a weighted graph; w may carry diagonal
    self-loop entries (excluded from k_in, included in deg upstream)."""
    lab = {v: v for v in nodes}
    for r in range(rounds):
        tot = defaultdict(int)
        for v, l in lab.items():
            tot[l] += deg.get(v, 0)
        newlab = dict(lab)
        for u in nodes:
            if (u + r) % 2 != 0:
                continue
            kin = defaultdict(int)
            kin[lab[u]] += 0  # own row always present
            for (a, b), x in w.items():
                if a == u and b != u:
                    kin[lab[b]] += x
            ku = deg.get(u, 0)
            best = None
            for c, k_in in kin.items():
                t = tot[c] - (ku if c == lab[u] else 0)
                gain = m2 * k_in - ku * t
                key = (gain, -c)
                if best is None or key > best[0]:
                    best = (key, c)
            stay = m2 * kin[lab[u]] - ku * (tot[lab[u]] - ku)
            if best[0][0] > stay:
                newlab[u] = best[1]
        lab = newlab
    return lab


def _replay_multilevel(
    edges: list[tuple[str, str]], rounds: int, levels: int
) -> dict[str, str]:
    urls = sorted({u for e in edges for u in e})
    ridx = {u: i for i, u in enumerate(urls)}
    w: dict[tuple[int, int], int] = defaultdict(int)
    for s, t in edges:
        a, b = ridx[s], ridx[t]
        if a == b:
            continue
        w[(a, b)] += 1
        w[(b, a)] += 1
    deg = defaultdict(int)
    for (a, _), x in w.items():
        deg[a] += x
    m2 = sum(deg.values())
    nodes = list(range(len(urls)))
    mapping = {v: v for v in nodes}
    for lvl in range(levels):
        cur = sorted(set(mapping.values()))
        lab = _replay_move_rounds(cur, w, deg, m2, rounds)
        mapping = {v: lab[mapping[v]] for v in nodes}
        if lvl == levels - 1:
            break
        nw: dict[tuple[int, int], int] = defaultdict(int)
        for (a, b), x in w.items():
            nw[(lab[a], lab[b])] += x
        w = nw
        deg = defaultdict(int)
        for (a, b), x in w.items():
            deg[a] += x  # diagonal (2x intra) counted once, like csym
    groups = defaultdict(list)
    for v, l in mapping.items():
        groups[l].append(urls[v])
    out = {}
    for members in groups.values():
        rep = min(members)
        for u in members:
            out[u] = rep
    return out


def test_louvain_multilevel_matches_exact_replay(spark):
    from pagerankproject_spark.graph.louvain import louvain_multilevel
    from pagerankproject_spark.ingest.edges import build_graph_tables

    g = build_graph_tables(spark, edges_df(spark, EDGES))
    res = louvain_multilevel(spark, g, rounds_per_level=4, levels=2)
    rows = {r["url"]: r["community"] for r in res.communities.collect()}
    assert rows == _replay_multilevel(EDGES, rounds=4, levels=2)
    assert len(res.metrics) == 2
    # cliques survive contraction intact
    assert len({rows[u] for u in CLIQUE_A}) == 1
    assert len({rows[u] for u in CLIQUE_B + ["b.com/q5"]}) == 1
    g.unpersist()


def test_louvain_multilevel_single_level_equals_phase1(spark):
    from pagerankproject_spark.graph.louvain import louvain, louvain_multilevel
    from pagerankproject_spark.ingest.edges import build_graph_tables

    g = build_graph_tables(spark, edges_df(spark, EDGES))
    one = louvain(spark, g, rounds=6)
    ml = louvain_multilevel(spark, g, rounds_per_level=6, levels=1)
    assert {tuple(r) for r in one.communities.collect()} == {
        tuple(r) for r in ml.communities.collect()
    }
    g.unpersist()


def _replay_leiden(edges, rounds=4, refine_rounds=3):
    """Reference replay of leiden_communities: the louvain replay's
    move rule twice — full graph from singletons, then the constrained
    intra-community subgraph from singletons with its own deg/2m."""
    urls = sorted({u for e in edges for u in e})
    ridx = {u: i for i, u in enumerate(urls)}

    def move_rounds(w, lab, n, nrounds):
        deg = defaultdict(int)
        for (a, _), x in w.items():
            deg[a] += x
        m2 = sum(deg.values())
        if m2 == 0 or nrounds == 0:
            return lab
        for r in range(nrounds):
            tot = defaultdict(int)
            for v, l in lab.items():
                tot[l] += deg[v]
            newlab = dict(lab)
            for u in range(n):
                if (u + r) % 2 != 0 or deg[u] == 0:
                    continue
                kin = defaultdict(int)
                kin[lab[u]] += 0
                for (a, b), x in w.items():
                    if a == u:
                        kin[lab[b]] += x
                best = None
                for c, k_in in kin.items():
                    t = tot[c] - (deg[u] if c == lab[u] else 0)
                    gain = m2 * k_in - deg[u] * t
                    key = (gain, -c)
                    if best is None or key > best:
                        best = key
                sg = m2 * kin[lab[u]] - deg[u] * (tot[lab[u]] - deg[u])
                if best[0] > sg:
                    newlab[u] = -best[1]
            lab = newlab
        return lab

    w = defaultdict(int)
    for s, t in edges:
        a, b = ridx[s], ridx[t]
        if a == b:
            continue
        w[(a, b)] += 1
        w[(b, a)] += 1
    n = len(urls)
    labA = move_rounds(w, {i: i for i in range(n)}, n, rounds)
    wc = {
        (a, b): x for (a, b), x in w.items() if labA[a] == labA[b]
    }
    lab2 = move_rounds(wc, {i: i for i in range(n)}, n, refine_rounds)
    groups = defaultdict(list)
    for i in range(n):
        groups[lab2[i]].append(urls[i])
    out = {}
    for members in groups.values():
        rep = min(members)
        for u in members:
            out[u] = rep
    return out, labA, lab2


def test_leiden_matches_replay_and_subpartitions_louvain(spark):
    from pagerankproject_spark.graph.louvain import leiden_communities, louvain
    from pagerankproject_spark.ingest.edges import build_graph_tables

    g = build_graph_tables(spark, edges_df(spark, EDGES))
    res = leiden_communities(spark, g, rounds=4, refine_rounds=3)
    got = {r["url"]: r["community"] for r in res.communities.collect()}
    want, labA, lab2 = _replay_leiden(EDGES, rounds=4, refine_rounds=3)
    assert got == want

    # every refined community is a SUB-partition of a louvain-phase
    # community: two urls sharing a leiden label share the phase-A one
    lv = louvain(spark, g, rounds=4)
    lvrows = {r["url"]: r["community"] for r in lv.communities.collect()}
    by_leiden = defaultdict(set)
    for u, c in got.items():
        by_leiden[c].add(lvrows[u])
    assert all(len(s) == 1 for s in by_leiden.values())
    g.unpersist()
