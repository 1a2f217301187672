"""SCAN structural clustering: engine vs a pure-python replay of the
deterministic spec AND the DuckDB twin, plus a hand-checked fixture
exercising all four roles.
"""

from __future__ import annotations

import random
from collections import defaultdict

import duckdb
import pytest

from pagerankproject_spark.graph.scan import scan_clusters, sql_scan_clusters


def _py_scan(pairs, eps_num=3, eps_den=5, mu=3):
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adjm: dict[str, set] = defaultdict(set)
    for a, b in und:
        adjm[a].add(b)
        adjm[b].add(a)

    def similar(a, b):
        c2 = len(adjm[a] & adjm[b]) + 2
        return (
            c2 * c2 * eps_den * eps_den
            >= eps_num * eps_num * (len(adjm[a]) + 1) * (len(adjm[b]) + 1)
        )

    sim = {(a, b) for a, b in und if similar(a, b)}
    simadj: dict[str, set] = defaultdict(set)
    for a, b in sim:
        simadj[a].add(b)
        simadj[b].add(a)
    cores = {v for v in adjm if len(simadj[v]) + 1 >= mu}

    cluster: dict[str, str] = {}
    for start in cores:
        if start in cluster:
            continue
        comp, frontier = {start}, [start]
        while frontier:
            v = frontier.pop()
            for w in simadj[v] & cores:
                if w not in comp:
                    comp.add(w)
                    frontier.append(w)
        lbl = min(comp)
        for v in comp:
            cluster[v] = lbl

    out = {v: ("core", cluster[v]) for v in cores}
    for v in adjm:
        if v in cores:
            continue
        adj_cores = simadj[v] & cores
        if adj_cores:
            out[v] = ("border", min(cluster[c] for c in adj_cores))
    classified = dict(out)  # cores + borders only
    for v in adjm:
        if v in classified:
            continue
        ncl = {classified[w][1] for w in adjm[v] if w in classified}
        out[v] = ("hub", None) if len(ncl) >= 2 else ("outlier", None)
    return {v: r for v, r in out.items()}


def _run_engine(spark, pairs, **kw):
    edges = spark.createDataFrame(list(pairs), "src string, dst string")
    rows = scan_clusters(spark, edges=edges, **kw).collect()
    assert len(rows) == len({r["url"] for r in rows})
    return {r["url"]: (r["role"], r["cluster"]) for r in rows}


def _run_sql(pairs, eps_num=3, eps_den=5, mu=3):
    con = duckdb.connect()
    con.execute("create table edges(src varchar, dst varchar)")
    con.executemany("insert into edges values (?, ?)", list(pairs))
    q = "with " + sql_scan_clusters(eps_num, eps_den, mu)
    return {r[0]: (r[1], r[2]) for r in con.execute(q).fetchall()}


# two 4-cliques bridged by a hub; a pendant outlier
FIXTURE = (
    [(a, b) for i, a in enumerate("abcd") for b in "abcd"[i + 1:]]
    + [(a, b) for i, a in enumerate("wxyz") for b in "wxyz"[i + 1:]]
    + [("h", "a"), ("h", "w"), ("o", "h")]
)


def test_scan_fixture_roles(spark):
    expected = _py_scan(FIXTURE)
    got = _run_engine(spark, FIXTURE)
    assert got == expected
    roles = {r for r, _ in got.values()}
    assert {"core", "hub", "outlier"} <= roles
    assert got["h"][0] == "hub"
    assert got["o"][0] == "outlier"
    assert {got[v] for v in "abcd"} == {("core", "a")}
    assert {got[v] for v in "wxyz"} == {("core", "w")}
    assert _run_sql(FIXTURE) == expected


def test_scan_border_attachment(spark):
    # 'p' touches the abcd clique through one similar edge but is no core
    pairs = FIXTURE + [("p", "a"), ("p", "b"), ("p", "c")]
    expected = _py_scan(pairs)
    got = _run_engine(spark, pairs)
    assert got == expected
    assert _run_sql(pairs) == expected


@pytest.mark.parametrize("seed,mu", [(3, 2), (11, 3), (29, 4)])
def test_scan_random_graph_fuzz(spark, seed, mu):
    rng = random.Random(seed)
    n = 24
    verts = [f"v{i:02d}" for i in range(n)]
    pairs = {
        (rng.choice(verts), rng.choice(verts)) for _ in range(3 * n)
    }
    pairs = [(a, b) for a, b in pairs if a != b]
    expected = _py_scan(pairs, mu=mu)
    got = _run_engine(spark, pairs, mu=mu)
    assert got == expected
    assert _run_sql(pairs, mu=mu) == expected
