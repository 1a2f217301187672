"""SALSA (Stochastic Approach for Link-Structure Analysis) — Lempel &
Moran 2000 (public; WWW9 / Computer Networks 33). Engine-added
link-analysis operator: no reference implementation exists
(/root/reference/pagerank.py computes only PageRank); added as the
natural companion to HITS (graph/hits.py) for the same audience.

SALSA replaces HITS's mutual-reinforcement iteration with two random
walks on the bipartite hub/authority graph B: every page with outlinks
gets a hub copy h(p), every page with inlinks an authority copy a(p),
one bipartite edge h(s)—a(t) per DISTINCT link (s,t) (self-links kept:
h(p)—a(p) is a regular bipartite edge). The authority chain steps
a(t) -> h(s) -> a(t') uniformly backward then forward; the hub chain
symmetrically. Lempel & Moran's key theorem (§3.2) is that the
stationary distribution is CLOSED-FORM — within a connected component
C of B the authority weight of j is proportional to its in-degree, and
a chain started uniform never moves mass between components, so with
the paper's uniform-start convention:

    authority(j) = (A_C / N_a) * in_deg(j)  / E_C
    hub(i)       = (H_C / N_h) * out_deg(i) / E_C

where C is the bipartite component containing a(j) / h(i), A_C / H_C
its authority / hub copy counts, E_C its edge count (= the component's
in-degree sum = its out-degree sum), and N_a / N_h the global authority
/ hub copy counts. Degrees count DISTINCT links.

So what HITS does in O(iterations) join+agg rounds, SALSA does with ONE
connected-components run plus two degree aggregations — the Spark-first
formulation: the bipartite CC reuses graph/components.py (auto
algorithm pick, skew salting, star contraction for high-diameter
graphs) on dense long ids (hub copy 2*id, authority copy 2*id+1), and
everything after it is map-side-combinable counts.

Cross-engine exactness (the repo's float convention, SURVEY §2.4):
each score is exact int64 moments -> ONE double division,
(A_C * in_deg) / (N_a * E_C), written with the same association in the
DuckDB oracle (oracle/recursive_sql.py::sql_salsa_scores) — both
engines convert exact integers and round once, so the contract key
needs no decimal rounding. int64 products overflow only past ~3e9
copies x 3e9 degree, far beyond any real link graph's component sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ingest.edges import GraphTables


def salsa(
    spark: SparkSession,
    g: GraphTables,
    max_iterations: int = 100,
) -> DataFrame:
    """SALSA hub/authority scores for every vertex of `g`.

    Returns (url: string, hub: double, authority: double); pages with
    no outlinks score hub = 0.0, pages with no inlinks authority = 0.0
    (exact literal zero, matching the oracle's COALESCE). Global sums:
    sum(hub) = sum(authority) = 1.0 up to one rounding per score.
    """
    P = g.num_partitions
    # distinct-link support (SALSA is defined on the simple directed
    # graph; the engine's edge table is a multigraph — parallel links
    # count in PageRank's P but not here). Self-loops stay: they are
    # ordinary h(p)-a(p) bipartite edges.
    se = (
        g.weighted_edges.select("src_id", "dst_id")
        .distinct()
        .repartition(P, "src_id")
        .persist()
    )
    num_links = se.count()
    if num_links == 0:
        raise ValueError("graph has no edges; SALSA undefined")

    # bipartite graph as a GraphTables: hub copy 2*id ('h:'+url),
    # authority copy 2*id+1 ('a:'+url). Isolated copies (no-outlink
    # hubs / no-inlink authorities) form singleton CC components and
    # never join a score aggregation — harmless.
    from .components import connected_components_auto

    bvert = (
        g.vertices.select(
            (F.col("id") * 2).alias("id"),
            F.concat(F.lit("h:"), "url").alias("url"),
        )
        .union(
            g.vertices.select(
                (F.col("id") * 2 + 1).alias("id"),
                F.concat(F.lit("a:"), "url").alias("url"),
            )
        )
        .repartition(P, "id")
        .persist()
    )
    bedges = (
        se.select(
            (F.col("src_id") * 2).alias("src_id"),
            (F.col("dst_id") * 2 + 1).alias("dst_id"),
            F.lit(1.0).alias("weight"),
        )
        .repartition(P, "src_id")
        .persist()
    )
    bg = GraphTables(
        vertices=bvert,
        weighted_edges=bedges,
        n=2 * g.n,
        num_partitions=P,
        num_edges=num_links,
    )
    comp = connected_components_auto(
        spark, bg, max_iterations=max_iterations
    ).components.localCheckpoint(eager=True)

    # back to url space once: component per hub copy keys every edge
    # (an edge's two copies share a component by construction).
    hub_comp = comp.filter(F.col("url").startswith("h:")).select(
        F.expr("substring(url, 3)").alias("src"), "component"
    )
    src_urls = g.vertices.select(
        F.col("id").alias("src_id"), F.col("url").alias("src")
    )
    dst_urls = g.vertices.select(
        F.col("id").alias("dst_id"), F.col("url").alias("dst")
    )
    ecomp = (
        se.join(src_urls, "src_id")
        .join(dst_urls, "dst_id")
        .join(hub_comp, "src")
        .select("src", "dst", "component")
        .persist()
    )

    e_c = ecomp.groupBy("component").agg(F.count("*").alias("e_c"))
    # per-authority in-degree; component is functionally determined by
    # dst over edges, so the composite key just carries it along.
    ind = ecomp.groupBy("dst", "component").agg(F.count("*").alias("ind"))
    outd = ecomp.groupBy("src", "component").agg(F.count("*").alias("outd"))
    a_c = ind.groupBy("component").agg(F.count("*").alias("a_c"))
    h_c = outd.groupBy("component").agg(F.count("*").alias("h_c"))
    n_a = ind.agg(F.count("*").alias("n_a"))
    n_h = outd.agg(F.count("*").alias("n_h"))

    authority = (
        ind.join(a_c, "component")
        .join(e_c, "component")
        .crossJoin(F.broadcast(n_a))
        .select(
            F.col("dst").alias("url"),
            (
                (F.col("a_c") * F.col("ind"))
                / (F.col("n_a") * F.col("e_c"))
            ).alias("authority"),
        )
    )
    hub = (
        outd.join(h_c, "component")
        .join(e_c, "component")
        .crossJoin(F.broadcast(n_h))
        .select(
            F.col("src").alias("url"),
            (
                (F.col("h_c") * F.col("outd"))
                / (F.col("n_h") * F.col("e_c"))
            ).alias("hub"),
        )
    )
    out = (
        g.vertices.select("url")
        .join(hub, "url", "left")
        .join(authority, "url", "left")
        .select(
            "url",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
        .localCheckpoint(eager=True)
    )
    for df in (se, bvert, bedges, ecomp):
        df.unpersist()
    return out
