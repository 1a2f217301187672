"""Deterministic graph fixtures (FIXTURES.md §A/§C/§D). Seeded, pure.

No Spark imports — generators return plain Python lists of (src, dst)
string pairs so both the NumPy oracle and the Spark engine can consume
them (tests create DataFrames / parquet from these).
"""

from __future__ import annotations

import random

# §A — the reference's canonical small graph, reconstructed verbatim from
# /root/reference/README.md:21-32 (file data/small.csv.gz, not shipped).
SMALL_GRAPH_EDGES: list[tuple[str, str]] = [
    ("1", "2"),
    ("1", "3"),
    ("3", "1"),
    ("3", "2"),
    ("3", "5"),
    ("4", "5"),
    ("4", "6"),
    ("5", "6"),
    ("5", "4"),
    ("6", "4"),
]

# Golden final ranks, /root/reference/README.md:444-449 (float32-printed,
# compare at 1e-4 abs). alpha=0.85 eps=1e-6 uniform personalization.
SMALL_GRAPH_GOLDEN_RANKS: dict[str, float] = {
    "4": 6.6270e-01,
    "6": 5.2179e-01,
    "5": 4.1434e-01,
    "2": 2.3175e-01,
    "3": 1.8590e-01,
    "1": 1.6917e-01,
}

SMALL_GRAPH_GOLDEN_ITERATIONS = 24  # i=0..23, README.md:420-443
SMALL_GRAPH_GOLDEN_FINAL_RESIDUAL = 6.322027275018627e-07


def make_weblike(
    seed: int = 42, n_nodes: int = 1000, m_edges: int = 8000
) -> list[tuple[str, str]]:
    """§C — lawfareblog-shaped synthetic graph, sorted by src.

    Structural triggers for every reference behavior:
      * root "site.com/" and hub pages "site.com/topic/{k}" match the
        drop-regex; articles "site.com/article-{i}" survive;
      * menu skew: every article links to a few fixed menu articles
        (in-link ratio above typical filter_ratio thresholds);
      * ~10% dangling tail (no out-edges);
      * Zipf-ish out-degree.
    """
    rng = random.Random(seed)
    n_hubs = max(2, n_nodes // 50)
    hubs = [f"site.com/topic/{k}" for k in range(n_hubs)]
    articles = [f"site.com/article-{i}" for i in range(n_nodes)]
    menu = articles[: max(3, n_nodes // 200)]  # hot in-link targets
    dangling_cut = int(n_nodes * 0.9)  # articles past this emit no links

    edges: list[tuple[str, str]] = []
    for i, src in enumerate(articles):
        if i >= dangling_cut:
            continue
        # every live article links to the root, one hub, and all menu pages
        edges.append((src, "site.com/"))
        edges.append((src, hubs[i % n_hubs]))
        for m in menu:
            if m != src:
                edges.append((src, m))
        # Zipf-ish extra out-links
        extra = min(int(rng.paretovariate(1.5)), 50)
        for _ in range(extra):
            dst = articles[rng.randrange(n_nodes)]
            if dst != src:
                edges.append((src, dst))
        if len(edges) >= m_edges:
            break
    edges.sort(key=lambda e: (e[0], e[1]))
    return edges


# §D — exact-output fixtures for CC / LPA / triangles.

TWO_COMPONENTS_EDGES = [("a", "b"), ("b", "c"), ("d", "e")]
TWO_COMPONENTS_VERTICES = {"a", "b", "c", "d", "e", "f"}  # f isolated
TWO_COMPONENTS_EXPECTED = {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "f": "f"}

# two triangles sharing edge (b,c): {a,b,c} and {b,c,d}
TRIANGLE_CHAIN_EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("b", "d"),
    ("c", "d"),
]
TRIANGLE_CHAIN_PER_EDGE = {
    ("a", "b"): 1,
    ("a", "c"): 1,
    ("b", "c"): 2,
    ("b", "d"): 1,
    ("c", "d"): 1,
}
TRIANGLE_CHAIN_TOTAL = 2


def make_two_cliques_bridge(k: int = 5) -> list[tuple[str, str]]:
    """§D.3 — two dense k-cliques joined by one bridge edge."""
    left = [f"l{i}" for i in range(k)]
    right = [f"r{i}" for i in range(k)]
    edges = []
    for grp in (left, right):
        for i in range(k):
            for j in range(i + 1, k):
                edges.append((grp[i], grp[j]))
    edges.append((left[0], right[0]))
    return edges


def make_clustered_random(
    seed: int = 42, k_clusters: int = 4, n: int = 200, p_in: float = 0.1
) -> tuple[list[tuple[str, str]], int]:
    """§D.4 — k disjoint Erdos-Renyi blobs; returns (edges, k)."""
    rng = random.Random(seed)
    edges = []
    per = n // k_clusters
    for c in range(k_clusters):
        nodes = [f"c{c}n{i}" for i in range(per)]
        # spanning path guarantees connectivity within the blob
        for i in range(per - 1):
            edges.append((nodes[i], nodes[i + 1]))
        for i in range(per):
            for j in range(i + 2, per):
                if rng.random() < p_in:
                    edges.append((nodes[i], nodes[j]))
    return edges, k_clusters
