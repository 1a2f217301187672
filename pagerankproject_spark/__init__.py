"""PySpark-native link-graph analytics engine (see repo README.md).

Top-level API — the names a user of the reference needs:

    from pagerankproject_spark import (
        get_spark,                      # configured SparkSession
        build_edges, build_graph_tables, append_edges,   # ingest
        pagerank, connected_components, label_propagation,
        triangle_counts, hits,          # graph suite
        search,                         # PageRank-weighted url search
    )

Heavy submodules (dedup, similarity, streaming, multimodal, text) are
imported explicitly — they are independent operator families, not part
of the core graph path.
"""

from __future__ import annotations

from .graph.components import connected_components
from .graph.hits import hits
from .graph.labelprop import label_propagation
from .graph.pagerank import pagerank, pagerank_from_edges
from .graph.triangles import triangle_counts
from .ingest.edges import (
    append_edges,
    build_edges,
    build_graph_tables,
    read_edge_csv,
)
from .ingest.extract import extract_outlinks
from .search.query import search
from .session import get_spark

__all__ = [
    "append_edges",
    "build_edges",
    "build_graph_tables",
    "connected_components",
    "extract_outlinks",
    "get_spark",
    "hits",
    "label_propagation",
    "pagerank",
    "pagerank_from_edges",
    "read_edge_csv",
    "search",
    "triangle_counts",
]
