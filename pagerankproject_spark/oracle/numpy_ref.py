"""Float64 NumPy oracle implementing the reference semantics literally.

This module is a TEST ORACLE ONLY — it re-implements, in float64 NumPy,
the exact dataflow of the reference (``/root/reference/pagerank.py``):

* regex URL filter before id assignment   (pagerank.py:41-46)
* first-appearance dictionary encoding     (pagerank.py:45-46, 80-86)
* in-link-ratio edge filter, strict ``<``  (pagerank.py:51-56) — edges only,
  node set frozen at post-regex ``n``
* out-degree 1/d weight normalization      (pagerank.py:59-70)
* damped power iteration, Eq 5.1 of *Deeper Inside PageRank*:
  ``x <- alpha*P^T x + (alpha*(x.a) + (1-alpha))*v``, L2-normalized every
  iteration, L2 residual early stop        (pagerank.py:139-205)
* double normalization of v: sum-normalized at build
  (pagerank.py:132-134) then L2-normalized inside power_method
  (pagerank.py:160)

The engine (Spark) is verified against this oracle to allclose 1e-6;
the oracle itself is verified against the README golden logs
(/root/reference/README.md:414-449) to 1e-4 (float32 printing noise).

No Spark imports here — pure numpy, importable from any test.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import numpy as np

# The reference's URL drop-regex (pagerank.py:42). ``re.match`` with
# leading/trailing ``.*`` behaves as an unanchored search for the inner group.
URL_DROP_REGEX = re.compile(r".*((/$)|(/.*/)).*")


@dataclass
class OracleGraph:
    """Mirror of the reference WebGraph state, in numpy."""

    url_dict: dict[str, int]
    edges: list[tuple[int, int]]  # post-filter (src_id, dst_id), input order
    weights: np.ndarray  # float64, parallel to edges
    n: int
    index_dict: dict[int, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.index_dict:
            self.index_dict = {v: k for k, v in self.url_dict.items()}


def build_graph(
    rows: list[tuple[str, str]],
    max_nnz: int | None = None,
    filter_ratio: float | None = None,
) -> OracleGraph:
    """Reference WebGraph.__init__ (pagerank.py:21-77), numpy edition.

    ``rows`` are (source, target) pairs in file order (header excluded).
    """
    url_dict: dict[str, int] = {}
    target_counts: dict[int, int] = {}
    indices: list[tuple[int, int]] = []

    def url_to_index(url: str) -> int:
        if url not in url_dict:
            url_dict[url] = len(url_dict)
        return url_dict[url]

    for i, (source, target) in enumerate(rows):
        # reference reads i in 0..max_nnz inclusive (strict '>': pagerank.py:39)
        if max_nnz is not None and i > max_nnz:
            break
        if URL_DROP_REGEX.match(source) or URL_DROP_REGEX.match(target):
            continue
        s = url_to_index(source)
        t = url_to_index(target)
        target_counts[t] = target_counts.get(t, 0) + 1
        indices.append((s, t))

    n = len(url_dict)

    if filter_ratio is not None:
        # edges only; n frozen; strict < keep (pagerank.py:51-56)
        indices = [
            (s, t) for (s, t) in indices if target_counts[t] < filter_ratio * n
        ]

    # out-degree normalization — global per-source count (equivalent to the
    # reference's run-length pass under the sorted-input precondition,
    # pagerank.py:27,59-70)
    out_deg: dict[int, int] = {}
    for s, _ in indices:
        out_deg[s] = out_deg.get(s, 0) + 1
    weights = np.array([1.0 / out_deg[s] for s, _ in indices], dtype=np.float64)

    return OracleGraph(url_dict=url_dict, edges=indices, weights=weights, n=n)


def make_personalization_vector(
    g: OracleGraph, matches: set[str] | None = None
) -> np.ndarray:
    """Reference make_personalization_vector (pagerank.py:96-136).

    ``matches`` is the set of urls satisfying the query (the query-predicate
    itself is tested separately); None means uniform ones.
    Returns the SUM-normalized vector (the L2 normalization happens inside
    power_method, mirroring the reference's double normalization).
    """
    if matches is None:
        v = np.ones(g.n, dtype=np.float64)
    else:
        v = np.zeros(g.n, dtype=np.float64)
        for url, idx in g.url_dict.items():
            if url in matches:
                v[idx] = 1.0
    s = v.sum()
    assert s > 0
    return v / s


def power_method(
    g: OracleGraph,
    v: np.ndarray | None = None,
    x0: np.ndarray | None = None,
    alpha: float = 0.85,
    max_iterations: int = 1000,
    epsilon: float = 1e-6,
) -> tuple[np.ndarray, list[float]]:
    """Reference power_method (pagerank.py:139-205), float64.

    Returns (x, residuals) where residuals[i] is the L2 residual logged at
    iteration i (reference logs i=0..k).
    """
    n = g.n
    # dangling indicator: a[i]=1 iff src i has no out-edges post-filter
    a = np.ones(n, dtype=np.float64)
    for s, _ in g.edges:
        a[s] = 0.0

    if v is None:
        v = np.full(n, 1.0 / n, dtype=np.float64)
    v = v / np.linalg.norm(v)

    if x0 is None:
        x0 = np.full(n, 1.0 / math.sqrt(n), dtype=np.float64)
    x = x0 / np.linalg.norm(x0)

    src = np.array([s for s, _ in g.edges], dtype=np.int64)
    dst = np.array([t for _, t in g.edges], dtype=np.int64)

    residuals: list[float] = []
    for _ in range(max_iterations):
        xprev = x
        # P^T x via scatter-add over the edge list
        pt_x = np.zeros(n, dtype=np.float64)
        np.add.at(pt_x, dst, g.weights * x[src])
        dangling_mass = float(x @ a)
        x = alpha * pt_x + (alpha * dangling_mass + (1.0 - alpha)) * v
        x = x / np.linalg.norm(x)
        residual = float(np.linalg.norm(x - xprev))
        residuals.append(residual)
        if residual < epsilon:
            break
    return x, residuals


def pagerank_by_url(
    rows: list[tuple[str, str]],
    alpha: float = 0.85,
    epsilon: float = 1e-6,
    max_iterations: int = 1000,
    filter_ratio: float | None = None,
    max_nnz: int | None = None,
    personalization_matches: set[str] | None = None,
) -> tuple[dict[str, float], list[float]]:
    """End-to-end: rows -> {url: rank} plus residual trajectory."""
    g = build_graph(rows, max_nnz=max_nnz, filter_ratio=filter_ratio)
    v = (
        make_personalization_vector(g, personalization_matches)
        if personalization_matches is not None
        else None
    )
    x, residuals = power_method(
        g, v=v, alpha=alpha, max_iterations=max_iterations, epsilon=epsilon
    )
    return {g.index_dict[i]: float(x[i]) for i in range(g.n)}, residuals


# ---------------------------------------------------------------------------
# Graph-ops oracles (connected components / label propagation / triangles)
# for SURVEY.md §2b #24-#26. Brute force, for small fixtures only.
# ---------------------------------------------------------------------------


def connected_components(edges: list[tuple[str, str]], vertices: set[str] | None = None) -> dict[str, str]:
    """Undirected connected components; label = min vertex name in component."""
    verts: set[str] = set(vertices or set())
    adj: dict[str, set[str]] = {}
    for s, t in edges:
        verts.add(s)
        verts.add(t)
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    label = {u: u for u in verts}
    changed = True
    while changed:
        changed = False
        for u in verts:
            m = min([label[u]] + [label[w] for w in adj.get(u, ())])
            if m < label[u]:
                label[u] = m
                changed = True
    return label


def label_propagation(
    edges: list[tuple[str, str]], max_iterations: int = 20
) -> dict[str, str]:
    """Synchronous LPA over the undirected graph, deterministic tie-break:
    most frequent neighbor label, ties broken by min label. Vertices with no
    neighbors keep their own label. Stops when no label changes."""
    adj: dict[str, list[str]] = {}
    verts: set[str] = set()
    for s, t in edges:
        verts.add(s)
        verts.add(t)
        adj.setdefault(s, []).append(t)
        adj.setdefault(t, []).append(s)
    label = {u: u for u in verts}
    for _ in range(max_iterations):
        new = {}
        changed = 0
        for u in verts:
            nbrs = adj.get(u, [])
            if not nbrs:
                new[u] = label[u]
                continue
            counts: dict[str, int] = {}
            for w in nbrs:
                counts[label[w]] = counts.get(label[w], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[u] = best
            if best != label[u]:
                changed += 1
        label = new
        if changed == 0:
            break
    return label


def triangle_counts(
    edges: list[tuple[str, str]]
) -> tuple[dict[tuple[str, str], int], int]:
    """Per-undirected-edge triangle counts + total triangle count.

    Edges are canonicalized (min,max); duplicates and self-loops dropped.
    """
    und = {tuple(sorted((s, t))) for s, t in edges if s != t}
    adj: dict[str, set[str]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    per_edge: dict[tuple[str, str], int] = {}
    total = 0
    for a, b in und:
        c = len(adj[a] & adj[b])
        per_edge[(a, b)] = c
        total += c
    return per_edge, total // 3


def hits_by_url(
    rows: list[tuple[str, str]],
    epsilon: float = 1e-6,
    max_iterations: int = 100,
) -> dict[str, tuple[float, float]]:
    """float64 HITS oracle over the engine's graph construction (regex
    filter + dense ids): url -> (hub, authority). Same update order as
    graph/hits.py: a from h, L2-normalize; h from NEW a, L2-normalize;
    stop on ||a - a_prev||_2 < epsilon. Duplicate edges count twice
    (the engine never dedups — duplicates are real links)."""
    g = build_graph(rows)
    n = g.n
    A = np.zeros((n, n), dtype=np.float64)
    for s, t in g.edges:
        A[s, t] += 1.0
    h = np.full(n, 1.0 / math.sqrt(n), dtype=np.float64)
    a_prev = None
    a = np.zeros(n)
    for _ in range(max_iterations):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
        if a_prev is not None and np.linalg.norm(a - a_prev) < epsilon:
            break
        a_prev = a
    inv = {i: u for u, i in g.url_dict.items()}
    return {inv[i]: (float(h[i]), float(a[i])) for i in range(n)}


def kcore_vertices(
    edges: list[tuple[str, str]], k: int
) -> dict[str, int]:
    """Brute-force k-core: peel degree<k until fixpoint; returns
    {vertex: degree-in-core} over the simple undirected graph."""
    und = {tuple(sorted((s, t))) for s, t in edges if s != t}
    while True:
        deg: dict[str, int] = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        victims = {v for v, d in deg.items() if d < k}
        if not victims:
            return deg
        und = {(a, b) for a, b in und if a not in victims and b not in victims}


def coreness_by_url(edges: list[tuple[str, str]]) -> dict[str, int]:
    """Brute-force core decomposition (Matula & Beck 1983 peel):
    repeatedly remove all vertices of minimum remaining degree; a
    vertex's core number is the peel threshold in force when it is
    removed. Over the simple undirected graph; vertices that appear
    only in self-loops get core number 0."""
    und = {tuple(sorted((s, t))) for s, t in edges if s != t}
    verts = {v for e in und for v in e}
    loop_only = {v for s, t in edges if s == t for v in (s,)} - verts
    adj: dict[str, set[str]] = {v: set() for v in verts}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    core: dict[str, int] = {v: 0 for v in loop_only}
    deg = {v: len(ns) for v, ns in adj.items()}
    k = 0
    while deg:
        k = max(k, min(deg.values()))
        victims = [v for v, d in deg.items() if d <= k]
        while victims:
            v = victims.pop()
            if v not in deg:
                continue
            core[v] = k
            del deg[v]
            for u in adj[v]:
                if u in deg:
                    deg[u] -= 1
                    if deg[u] <= k:
                        victims.append(u)
    return core


def bfs_distances_by_url(
    edges: list[tuple[str, str]], sources: list[str]
) -> dict[str, int]:
    """Brute-force undirected multi-source BFS over the engine's
    post-regex vertex set; unreached vertices omitted."""
    g = build_graph(edges)
    adj: dict[int, set[int]] = {}
    for s, t in g.edges:
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    inv = {i: u for u, i in g.url_dict.items()}
    frontier = {g.url_dict[u] for u in sources if u in g.url_dict}
    dist = {v: 0 for v in frontier}
    d = 0
    while frontier:
        d += 1
        nxt = set()
        for v in frontier:
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = d
                    nxt.add(w)
        frontier = nxt
    return {inv[v]: dd for v, dd in dist.items()}
