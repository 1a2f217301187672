"""SALSA (graph/salsa.py) vs a numpy random-walk oracle.

The engine computes Lempel & Moran's CLOSED FORM (bipartite CC +
per-component degree moments); the oracle here is the definition it
claims to equal — explicit power iteration of the authority and hub
Markov chains from the uniform start. Agreement on a multi-component
graph exercises both the within-component in-degree proportionality
and the uniform-start component weighting (A_C/N_a), i.e. the whole
theorem, not just the arithmetic.
"""

from __future__ import annotations

import numpy as np
import pytest

from .conftest import edges_df

# two non-trivial components + a self-loop + a reciprocal pair; urls
# survive the build regex (no trailing slash, single path segment)
EDGES = [
    # component 1: hubs a,b,c over authorities x,y,z (dense-ish)
    ("a.com/h1", "a.com/x1"),
    ("a.com/h1", "a.com/x2"),
    ("a.com/h2", "a.com/x1"),
    ("a.com/h2", "a.com/x3"),
    ("a.com/h3", "a.com/x2"),
    ("a.com/h3", "a.com/x3"),
    ("a.com/x1", "a.com/x2"),  # an authority that is also a hub
    # component 2: star + self-loop (h(p)-a(p) is a regular bip. edge)
    ("b.com/s1", "b.com/t1"),
    ("b.com/s1", "b.com/t2"),
    ("b.com/s2", "b.com/t1"),
    ("b.com/t1", "b.com/t1"),  # self-link
]


def _numpy_salsa(edges: list[tuple[str, str]]):
    """Power-iterate the SALSA authority/hub chains from uniform."""
    se = sorted(set(edges))
    hubs = sorted({s for s, _ in se})
    auths = sorted({t for _, t in se})
    hi = {u: i for i, u in enumerate(hubs)}
    ai = {u: i for i, u in enumerate(auths)}
    A = np.zeros((len(hubs), len(auths)))
    for s, t in se:
        A[hi[s], ai[t]] = 1.0
    # row/col stochastic versions (every hub has outdeg>=1, every
    # authority indeg>=1 by construction of the node sets)
    Wr = A / A.sum(axis=1, keepdims=True)          # forward, by outdeg
    Wc = A / A.sum(axis=0, keepdims=True)          # backward, by indeg
    Pa = Wc.T @ Wr                                 # authority chain
    Ph = Wr @ Wc.T                                 # hub chain
    pa = np.full(len(auths), 1.0 / len(auths))
    ph = np.full(len(hubs), 1.0 / len(hubs))
    for _ in range(500):
        pa = pa @ Pa
        ph = ph @ Ph
    return dict(zip(hubs, ph)), dict(zip(auths, pa))


@pytest.fixture(scope="module")
def salsa_result(spark):
    from pagerankproject_spark.graph.salsa import salsa
    from pagerankproject_spark.ingest.edges import build_graph_tables

    # duplicate one edge: SALSA is on the DISTINCT support, so the
    # duplicate must not change any score
    g = build_graph_tables(spark, edges_df(spark, EDGES + [EDGES[0]]))
    rows = salsa(spark, g).collect()
    g.unpersist()
    return {r["url"]: (r["hub"], r["authority"]) for r in rows}


def test_salsa_matches_power_iteration(salsa_result):
    hub_o, auth_o = _numpy_salsa(EDGES)
    all_urls = sorted({u for e in EDGES for u in e})
    assert set(salsa_result) == set(all_urls)
    for u in all_urls:
        h, a = salsa_result[u]
        assert h == pytest.approx(hub_o.get(u, 0.0), abs=1e-9), u
        assert a == pytest.approx(auth_o.get(u, 0.0), abs=1e-9), u


def test_salsa_global_sums(salsa_result):
    assert sum(h for h, _ in salsa_result.values()) == pytest.approx(1.0, abs=1e-12)
    assert sum(a for _, a in salsa_result.values()) == pytest.approx(1.0, abs=1e-12)


def test_salsa_closed_form_hand_values(salsa_result):
    # component 2 in isolation: edges (s1,t1),(s1,t2),(s2,t1),(t1,t1);
    # its bipartite component has E_C=4, authorities {t1,t2} with
    # in-degrees 3,1, hubs {s1,s2,t1} with out-degrees 2,1,1.
    # Component 1 has E_C=7, 3 authorities, 4 hubs. N_a=5, N_h=7.
    assert salsa_result["b.com/t1"][1] == pytest.approx((2 * 3) / (5 * 4), abs=0)
    assert salsa_result["b.com/t2"][1] == pytest.approx((2 * 1) / (5 * 4), abs=0)
    assert salsa_result["b.com/s1"][0] == pytest.approx((3 * 2) / (7 * 4), abs=0)
    # pure authority: hub score exactly literal 0.0
    assert salsa_result["a.com/x2"][0] == 0.0
