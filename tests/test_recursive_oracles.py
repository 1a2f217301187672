"""Pin the DuckDB recursive-CTE oracles (oracle/recursive_sql.py)
against independent Python/NumPy references.

These oracles are the driver-side truth for the iterative contract keys
(pagerank*, hits_scores, connected_components, kcore, bfs_distances,
label_propagation, search_top10, dedup_clusters). The Spark engine is
compared against them by tools/check_contract.py and the external
driver; THIS file closes the loop by checking the oracles themselves
against a third implementation — the float64 numpy reference chain
(oracle/numpy_ref.py, itself pinned to the reference README goldens)
and small hand-rolled fixpoint simulators. Pure DuckDB + numpy: no
SparkSession, so the whole file runs in seconds.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from pathlib import Path

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entry
from pagerankproject_spark.dedup.minhash import sql_minhash_verified_pairs
from pagerankproject_spark.oracle import recursive_sql as rs
from pagerankproject_spark.oracle.numpy_ref import pagerank_by_url

SF_DIR = Path("/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "documents"):
        c.execute(
            f"create view {t} as select * from "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.fixture(scope="module")
def g():
    return "with " + entry._EDGES_CTE


@pytest.fixture(scope="module")
def graph(con, g):
    edges = con.execute(g + " select src, dst from edges").fetchall()
    verts = sorted(
        r[0] for r in con.execute(g + " select url from vertices").fetchall()
    )
    return edges, verts


def test_pagerank_oracle_matches_numpy(con, g):
    rows = con.execute(g + " select src, dst from edges_raw").fetchall()
    ranks, residuals = pagerank_by_url(rows, epsilon=1e-6, max_iterations=60)
    want = {u: round(x, 6) for u, x in ranks.items()}
    got = dict(con.execute(g + "," + rs.sql_pagerank_ranks()).fetchall())
    assert got == want
    assert 1 < len(residuals) <= 60


def test_personalized_pagerank_oracle_matches_numpy(con, g, graph):
    _, verts = graph
    rows = con.execute(g + " select src, dst from edges_raw").fetchall()
    matches = {u for u in verts if "p1" in u}
    ranks, _ = pagerank_by_url(
        rows, epsilon=1e-6, max_iterations=60, personalization_matches=matches
    )
    want = {u: round(x, 6) for u, x in ranks.items()}
    got = dict(
        con.execute(
            g + "," + rs.sql_pagerank_ranks(v_pred="url like '%p1%'")
        ).fetchall()
    )
    assert got == want


def test_hits_oracle_matches_numpy_twin(con, g, graph):
    edges, verts = graph
    idx = {u: i for i, u in enumerate(verts)}
    n = len(verts)
    src = np.array([idx[s] for s, _ in edges])
    dst = np.array([idx[t] for _, t in edges])
    h = np.full(n, 1.0 / math.sqrt(n))
    aprev = np.zeros(n)
    for it in range(60):
        araw = np.zeros(n)
        np.add.at(araw, dst, h[src])
        na = np.linalg.norm(araw)
        anew = araw / na
        resid = (
            float("inf")
            if it == 0
            else math.sqrt(max(0.0, 2.0 - 2.0 * float(araw @ aprev) / na))
        )
        hraw = np.zeros(n)
        np.add.at(hraw, src, anew[dst])
        h = hraw / np.linalg.norm(hraw)
        aprev = anew
        if resid < 1e-6:
            break
    want = {
        verts[i]: (round(h[i], 6), round(aprev[i], 6)) for i in range(n)
    }
    got = {
        r[0]: (float(r[1]), float(r[2]))
        for r in con.execute(g + "," + rs.sql_hits_scores()).fetchall()
    }
    assert got == want


def test_connected_components_oracle_matches_union_find(con, g, graph):
    edges, verts = graph
    parent = {u: u for u in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs_, rd = find(s), find(d)
        if rs_ != rd:
            parent[max(rs_, rd)] = min(rs_, rd)
    # min url per component
    comp_min: dict[str, str] = {}
    for u in verts:
        r = find(u)
        comp_min[r] = min(comp_min.get(r, u), u)
    want = {u: comp_min[find(u)] for u in verts}
    got = dict(con.execute(g + "," + rs.sql_connected_components()).fetchall())
    assert got == want


def test_bfs_oracle_matches_python_bfs(con, g, graph):
    edges, verts = graph
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
    want = {}
    frontier = {"site.com/p1"}
    d = 0
    while frontier:
        for u in frontier:
            want[u] = d
        frontier = {
            w for u in frontier for w in adj[u] if w not in want
        }
        d += 1
    got = dict(
        con.execute(g + "," + rs.sql_bfs_distances("site.com/p1")).fetchall()
    )
    assert got == want


def _python_kcore(edges, k):
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    alive = set(adj)
    while True:
        victims = {
            v for v in alive if sum(1 for w in adj[v] if w in alive) < k
        }
        if not victims:
            break
        alive -= victims
    return {v: sum(1 for w in adj[v] if w in alive) for v in alive}


@pytest.mark.parametrize("k", [3, 9, 10_000])
def test_kcore_oracle_matches_python_peeler(con, g, graph, k):
    """k=3 is the contract key; k=9 forces several peel rounds at this
    SF; k=10000 empties the core (the recursion's empty-stop path)."""
    edges, _ = graph
    want = _python_kcore(edges, k)
    got = dict(con.execute(g + "," + rs.sql_kcore(k)).fetchall())
    assert got == want


def test_lpa_oracle_matches_python_simulator(con, g, graph):
    edges, verts = graph
    incoming = defaultdict(list)  # multiplicities matter
    for s, d in edges:
        incoming[d].append(s)
        incoming[s].append(d)
    lbl = {v: v for v in verts}
    for _ in range(5):
        new = {}
        for v in verts:
            c = Counter(lbl[s] for s in incoming[v])
            new[v] = (
                min((-cnt, l) for l, cnt in c.items())[1] if c else lbl[v]
            )
        if new == lbl:
            break
        lbl = new
    got = dict(con.execute(g + "," + rs.sql_label_propagation(5)).fetchall())
    assert got == lbl


def test_scc_oracle_matches_tarjan(con, g, graph):
    from .test_scc import python_scc

    edges, _ = graph
    want = python_scc(edges)
    got = dict(con.execute(g + "," + rs.sql_scc()).fetchall())
    assert got == want
    # sanity: the fixture graph must actually contain a non-trivial SCC
    assert any(v != c for v, c in got.items())


def test_dedup_clusters_oracle_matches_union_find(con):
    pairs_sql = sql_minhash_verified_pairs("documents", threshold=0.2, n=2)
    pairs = con.execute(pairs_sql).fetchall()
    assert pairs, "fixture should produce near-dup pairs"
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: (find(x), x == find(x)) for x in parent}
    got = {
        r[0]: (r[1], bool(r[2]))
        for r in con.execute(rs.sql_dedup_clusters(pairs_sql)).fetchall()
    }
    assert got == want


def test_search_top10_oracle_matches_numpy_composition(con, g):
    rows = con.execute(g + " select src, dst from edges_raw").fetchall()
    ranks, _ = pagerank_by_url(rows, epsilon=1e-6, max_iterations=60)
    scored = []
    for u, x in ranks.items():
        if "page" in u or "p1" in u or "p2" in u:
            occ1 = (len(u) - len(u.replace("p1", ""))) / 2
            occ2 = (len(u) - len(u.replace("p2", ""))) / 2
            scored.append(
                (u, round(x * (occ1 * 0.9**45 + occ2 * 0.5**45), 6))
            )
    scored.sort(key=lambda t: (-t[1], t[0]))
    want = scored[:10]
    got = [
        (r[0], float(r[1]))
        for r in con.execute(g + "," + rs.sql_search_top10()).fetchall()
    ]
    assert got == want


def test_coreness_oracle_matches_python_peeler(con, g, graph):
    """The fixed-round h-index replay (rs.sql_coreness) must land on
    the Matula-Beck peel's core numbers once rounds >= convergence —
    pinning the oracle itself to an independent third implementation
    (the engine is compared to the oracle by check_contract)."""
    from pagerankproject_spark.oracle.numpy_ref import coreness_by_url

    edges, verts = graph
    want = coreness_by_url(edges)
    for v in verts:  # isolated vertices: coreness 0
        want.setdefault(v, 0)
    got = dict(con.execute(g + "," + rs.sql_coreness(rounds=30)).fetchall())
    assert got == want


def test_densest_subgraph_oracle_matches_python_replay(con, g, graph):
    """sql_densest_subgraph (unrolled integer-exact peel) vs a literal
    python replay of the same rule on the real derived edge table."""
    from pagerankproject_spark.graph.densest import sql_densest_subgraph

    edges, _ = graph
    und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    alive = {v for e in und for v in e}
    best = (0, 0, set())
    while True:
        n, e = len(alive), len(und)
        if e == 0:
            break
        if e * best[1] > best[0] * n or best[0] == 0:
            best = (e, n, set(alive))
        deg = Counter()
        for a, b in und:
            deg[a] += 1
            deg[b] += 1
        victims = {v for v in alive if deg.get(v, 0) * n * 2 <= 6 * e}
        alive -= victims
        und = {(a, b) for a, b in und if a not in victims and b not in victims}
    e_b, n_b, members = best

    rows = con.execute(g + "," + sql_densest_subgraph()).fetchall()
    assert {r[0] for r in rows} == members
    assert {r[1] for r in rows} == {e_b / n_b}


def test_luby_mis_oracle_matches_python_replay(con, g, graph):
    """sql_luby_mis (unrolled fixed-priority rounds) vs a literal python
    replay on the real derived edge table."""
    import hashlib

    from pagerankproject_spark.graph.mis import sql_luby_mis

    def pri(v):
        return (int(hashlib.md5(v.encode()).hexdigest()[:15], 16), v)

    edges, _ = graph
    und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    alive, mis, r = set(adj), {}, 0
    while alive:
        winners = {
            v for v in alive
            if not (adj[v] & alive)
            or pri(v) < min(pri(u) for u in adj[v] & alive)
        }
        for v in winners:
            mis[v] = r
        dead = set(winners)
        for v in winners:
            dead |= adj[v] & alive
        alive -= dead
        r += 1

    rows = con.execute(g + "," + sql_luby_mis()).fetchall()
    assert {u: rr for u, rr in rows} == mis


def test_greedy_coloring_oracle_matches_python_replay(con, g, graph):
    """sql_greedy_coloring (unrolled Jones-Plassmann rounds) vs a
    literal python replay on the real derived edge table."""
    import hashlib

    from pagerankproject_spark.graph.coloring import sql_greedy_coloring

    def pri(v):
        return (int(hashlib.md5(v.encode()).hexdigest()[:15], 16), v)

    edges, _ = graph
    und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    unc, colors = set(adj), {}
    while unc:
        winners = {
            v for v in unc
            if not (adj[v] & unc)
            or pri(v) < min(pri(u) for u in adj[v] & unc)
        }
        newc = {}
        for v in winners:
            used = {colors[u] for u in adj[v] if u in colors}
            c = 0
            while c in used:
                c += 1
            newc[v] = c
        colors.update(newc)
        unc -= winners

    rows = con.execute(g + "," + sql_greedy_coloring()).fetchall()
    assert {u: c for u, c in rows} == colors


def test_maximal_matching_oracle_matches_python_replay(con, g, graph):
    """sql_maximal_matching (unrolled local-dominant rounds) vs a
    literal python replay on the real derived edge table."""
    import hashlib

    from pagerankproject_spark.graph.matching import sql_maximal_matching

    def epri(a, b):
        return (
            int(hashlib.md5((a + "|" + b).encode()).hexdigest()[:15], 16), a, b
        )

    edges, _ = graph
    und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    eds = {e: epri(*e) for e in und}
    matched, r = {}, 0
    while eds:
        vmin = {}
        for e, pe in eds.items():
            for v in e:
                if v not in vmin or pe < vmin[v]:
                    vmin[v] = pe
        winners = [
            e for e, pe in eds.items()
            if vmin[e[0]] == pe and vmin[e[1]] == pe
        ]
        for e in winners:
            matched[e] = r
        used = {v for e in winners for v in e}
        eds = {
            e: p for e, p in eds.items()
            if e[0] not in used and e[1] not in used
        }
        r += 1

    rows = con.execute(g + "," + sql_maximal_matching()).fetchall()
    assert {(a, b): rr for a, b, rr in rows} == matched


def test_coarsen_graph_oracle_matches_python_replay(con, g, graph):
    """sql_coarsen_graph (matching chain + contraction) vs a literal
    python replay on the real derived edge table."""
    import hashlib

    from pagerankproject_spark.graph.matching import sql_coarsen_graph

    def epri(a, b):
        return (
            int(hashlib.md5((a + "|" + b).encode()).hexdigest()[:15], 16), a, b
        )

    edges, _ = graph
    und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    eds = {e: epri(*e) for e in und}
    matched = {}
    while eds:
        vmin = {}
        for e, pe in eds.items():
            for v in e:
                if v not in vmin or pe < vmin[v]:
                    vmin[v] = pe
        winners = [
            e for e, pe in eds.items()
            if vmin[e[0]] == pe and vmin[e[1]] == pe
        ]
        for e in winners:
            matched[e] = True
        used = {v for e in winners for v in e}
        eds = {
            e: p for e, p in eds.items()
            if e[0] not in used and e[1] not in used
        }
    smap = {}
    for a, b in matched:
        smap[a] = a
        smap[b] = a
    want = defaultdict(int)
    for a, b in und:
        u, w = smap.get(a, a), smap.get(b, b)
        if u != w:
            want[(min(u, w), max(u, w))] += 1

    rows = con.execute(g + "," + sql_coarsen_graph()).fetchall()
    assert {(a, b): w for a, b, w in rows} == dict(want)


def test_palette_coloring_oracle_matches_python_replay(con, g, graph):
    """sql_palette_coloring (unrolled hash-trial rounds) vs a literal
    python replay on the real derived edge table."""
    import hashlib

    from pagerankproject_spark.graph.coloring import sql_palette_coloring

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    edges, _ = graph
    und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(s) for v, s in adj.items()}
    unc, colors, r = set(adj), {}, 0
    while unc:
        pick = {v: h60(f"{v}#{r}") % (deg[v] + 1) for v in unc}
        win = {}
        for v in unc:
            if any(colors.get(u) == pick[v] for u in adj[v]):
                continue
            if any(u in unc and pick[u] == pick[v] for u in adj[v]):
                continue
            win[v] = pick[v]
        colors.update(win)
        unc -= set(win)
        r += 1

    rows = con.execute(g + "," + sql_palette_coloring()).fetchall()
    assert {u: c for u, c in rows} == colors


def test_functional_rooting_oracle_matches_python_replay(con, g, graph):
    """sql_functional_rooting (recursive orbit closure) vs a literal
    python orbit walk on the derived min-outlink map."""
    from pagerankproject_spark.graph.pointers import sql_functional_rooting

    edges, _ = graph
    nxt = {}
    for s, t in edges:
        nxt[s] = min(nxt.get(s, t), t)

    def orbit_min(v):
        seen, cur, best = {v}, v, v
        while cur in nxt:
            cur = nxt[cur]
            best = min(best, cur)
            if cur in seen:
                break
            seen.add(cur)
        return best

    want = {v: orbit_min(v) for v in set(nxt) | set(nxt.values())}
    sql = sql_functional_rooting(
        "select src as v, min(dst) as nxt from edges group by src"
    )
    rows = con.execute(g + "," + sql).fetchall()
    assert dict(rows) == want


def test_weighted_matching_oracle_matches_python_replay(con, g, graph):
    """sql_weighted_matching (locally-heaviest unrolled rounds,
    multiplicity weights) vs a literal python replay."""
    import hashlib
    from collections import Counter

    from pagerankproject_spark.graph.matching import sql_weighted_matching

    edges, _ = graph
    mult = Counter((min(s, t), max(s, t)) for s, t in edges if s != t)

    def epri(a, b, w):
        return (
            -w,
            int(hashlib.md5((a + "|" + b).encode()).hexdigest()[:15], 16),
            a,
            b,
        )

    eds = {(a, b): epri(a, b, w) for (a, b), w in mult.items()}
    matched, r = {}, 0
    while eds:
        vmin = {}
        for e, pe in eds.items():
            for v in e:
                if v not in vmin or pe < vmin[v]:
                    vmin[v] = pe
        winners = [
            e for e, pe in eds.items()
            if vmin[e[0]] == pe and vmin[e[1]] == pe
        ]
        for e in winners:
            matched[e] = r
        used = {v for e in winners for v in e}
        eds = {
            e: p for e, p in eds.items()
            if e[0] not in used and e[1] not in used
        }
        r += 1

    sql = sql_weighted_matching(
        "select least(src, dst) as a, greatest(src, dst) as b, "
        "count(*) as w from edges where src <> dst group by 1, 2"
    )
    rows = con.execute(g + "," + sql).fetchall()
    assert {(a, b): rr for a, b, rr in rows} == matched


def test_boruvka_msf_oracle_matches_python_replay(con, g, graph):
    """sql_boruvka_msf (unrolled rounds + recursive contraction
    closure) vs a literal python Boruvka replay on multiplicity
    weights."""
    import hashlib
    from collections import Counter

    from pagerankproject_spark.graph.mst import sql_boruvka_msf

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    edges, _ = graph
    mult = Counter((min(s, t), max(s, t)) for s, t in edges if s != t)
    pe = {(a, b): (w, h60(a + "|" + b), a, b) for (a, b), w in mult.items()}
    comp = {v: v for e in pe for v in e}
    forest, r = {}, 0
    while True:
        live = {e: p for e, p in pe.items() if comp[e[0]] != comp[e[1]]}
        if not live:
            break
        picks = {}
        for (a, b), p in live.items():
            for cv in (comp[a], comp[b]):
                if cv not in picks or p < picks[cv][1]:
                    picks[cv] = ((a, b), p)
        chosen = {e for e, _ in picks.values()}
        for e in chosen:
            forest[e] = r
        parent = {c: c for c in set(comp.values())}

        def find(x):
            while parent[x] != x:
                x = parent[x]
            return x

        for a, b in chosen:
            ra, rb = find(comp[a]), find(comp[b])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp = {v: find(c) for v, c in comp.items()}
        r += 1

    sql = sql_boruvka_msf(
        "select least(src, dst) as a, greatest(src, dst) as b, "
        "count(*) as w from edges where src <> dst group by 1, 2"
    )
    rows = con.execute(g + "," + sql).fetchall()
    assert {(a, b): rr for a, b, w, rr in rows} == forest


def test_single_linkage_oracle_matches_union_find(con, g, graph):
    from collections import Counter

    from pagerankproject_spark.graph.mst import sql_single_linkage

    edges, _ = graph
    mult = Counter((min(s, t), max(s, t)) for s, t in edges if s != t)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            x = parent[x]
        return x

    verts = {v for e in mult for v in e}
    for v in verts:
        find(v)
    for (a, b), w in mult.items():
        if -w <= -2:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for v in verts:
        clusters.setdefault(find(v), []).append(v)
    want = {}
    for members in clusters.values():
        m = min(members)
        for v in members:
            want[v] = m

    sql = sql_single_linkage(
        "select least(src, dst) as a, greatest(src, dst) as b, "
        "-count(*) as w from edges where src <> dst group by 1, 2",
        threshold=-2,
    )
    rows = con.execute(g + "," + sql).fetchall()
    assert {v: c for v, c in rows} == want


def test_affinity_levels_oracle_matches_python_replay(con, g, graph):
    """bv_comp{level} after `level` unrolled rounds == union-find over
    the replay forest's round<level edges."""
    from collections import Counter

    from pagerankproject_spark.graph.mst import sql_affinity_levels
    from tests.test_graph_ops import _boruvka_replay

    edges, _ = graph
    mult = Counter((min(s, t), max(s, t)) for s, t in edges if s != t)
    wtriples = [(a, b, w) for (a, b), w in mult.items()]
    want_forest, _, _ = _boruvka_replay(wtriples)
    verts = {v for e in wtriples for v in e[:2]}
    for level in (0, 1, 2):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                x = parent[x]
            return x

        for v in verts:
            find(v)
        for (a, b), r in want_forest.items():
            if r < level:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        clusters = {}
        for v in verts:
            clusters.setdefault(find(v), []).append(v)
        want = {}
        for members in clusters.values():
            m = min(members)
            for v in members:
                want[v] = m
        sql = sql_affinity_levels(
            "select least(src, dst) as a, greatest(src, dst) as b, "
            "count(*) as w from edges where src <> dst group by 1, 2",
            level=level,
        )
        rows = con.execute(g + "," + sql).fetchall()
        assert {v: c for v, c in rows} == want, f"level {level}"


def test_node2vec_oracle_matches_engine_shape(con, g, graph):
    """sql_node2vec_walks replays the identical biased choices: checked
    against a python replay (same rule as the engine test) on the
    oracle fixture graph."""
    import hashlib

    from pagerankproject_spark.graph.walks import sql_node2vec_walks

    def h60(x):
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    edges, _ = graph
    post = sorted({(s, t) for s, t in edges if s != t})
    adj = {}
    for s, t in post:
        adj.setdefault(s, []).append(t)
    for s in adj:
        adj[s].sort()
    eset = set(post)
    verts = sorted({v for e in post for v in e})
    L, W = 4, 2
    RW, CW, FW = 1, 2, 1

    want = {}
    for start in verts:
        for w in range(W):
            wid = f"{start}#{w}"
            want[(wid, 0)] = start
            cur, prev = start, None
            for t in range(1, L + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                if t == 1:
                    nxt = nbrs[h60(f"{cur}|{start}|{w}|1") % len(nbrs)]
                else:
                    wgts = [
                        RW if x == prev else (CW if (prev, x) in eset else FW)
                        for x in nbrs
                    ]
                    r = h60(f"{cur}|{prev}|{start}|{w}|{t}") % sum(wgts)
                    cum = 0
                    for x, g_ in zip(nbrs, wgts):
                        cum += g_
                        if r < cum:
                            nxt = x
                            break
                prev, cur = cur, nxt
                want[(wid, t)] = cur

    sql = sql_node2vec_walks(walk_length=L, walks_per_vertex=W)
    rows = con.execute(g + "," + sql).fetchall()
    assert {(wid, s): u for wid, s, u in rows} == want


def test_simrank_oracle_matches_python_replay(con, g, graph):
    """sql_simrank_mc replays the identical reverse hash-walks and
    first-meeting estimator: checked against the pure-python replay
    over the standard fixture."""
    from pagerankproject_spark.graph.walks import sql_simrank_mc
    from tests.test_graph_ops import _simrank_python_replay

    edges, _ = graph
    post = sorted({(s, t) for s, t in edges if s != t})
    L, W = 4, 2
    want = _simrank_python_replay(post, L, W)
    assert want, "fixture must produce meetings"

    got = {
        (a, b): v
        for a, b, v in con.execute(
            g + ",\n" + sql_simrank_mc(walk_length=L, walks_per_vertex=W)
        ).fetchall()
    }
    assert got == want
