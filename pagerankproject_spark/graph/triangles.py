"""Per-edge triangle counting via two-phase sorted-neighbor (wedge)
joins — SURVEY.md §2b operator #26 (north_rule mandate; no reference
implementation).

Semantics (exact-match): the graph is simplified first — self-loops
dropped, edges canonicalized to (least, greatest) and deduplicated. For
each undirected edge, the number of triangles containing it; plus the
global triangle count.

Algorithm (the classic degree-ordered wedge enumeration, shuffle-bound
O(sum of C(outdeg+, 2)) which orientation bounds by O(m^1.5)):

  1. orient every edge from the endpoint with smaller (degree, url) to
     the larger — struct comparison gives the total order directly;
  2. wedges: self-join oriented edges on their source u -> (u, v, w)
     with rk(v) < rk(w) — each potential triangle generated exactly once
     from its lowest-rank vertex;
  3. close: join wedges against oriented edges on (v, w) — every match
     is one triangle;
  4. per-edge counts: explode each triangle into its 3 canonical edges,
     count, right-join back onto the edge list (zero-fill).

Everything is DataFrame joins/aggs — no UDF, no collect. The orientation
step is exactly what makes hub vertices (web-graph skew) survivable: a
hub's edges are almost all oriented INTO it, so it never fans out wedges.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ingest.edges import GraphTables


@dataclass
class TriangleResult:
    per_edge: DataFrame  # a: string, b: string (a<b), triangles: long
    total: int


def triangle_counts(
    spark: SparkSession,
    g: GraphTables | None = None,
    edges: DataFrame | None = None,
    materialize: bool = True,
) -> TriangleResult:
    """`edges` (src,dst string columns) overrides `g` if given.

    `materialize=True` (default) localCheckpoints the per-edge result
    and releases every intermediate cache (long-lived sessions stay
    clean); `materialize=False` keeps the lazy plan — used by
    tools/dump_plans.py so PLANS.md shows the wedge-join cascade, and
    by callers that only want the plan. The total count still runs.

    With a GraphTables input the wedge enumeration runs on the dense
    LONG ids (the dominant shuffles move 8-byte keys, not urls); the
    translation back to url space happens once, on the per-edge output
    (two joins against the small vertices dim). Any total order is a
    valid orientation, so id-order and url-order tie-breaks give
    identical counts; the output is re-canonicalized by url."""
    if edges is None:
        und_ids = (
            g.weighted_edges.select("src_id", "dst_id")
            .filter(F.col("src_id") != F.col("dst_id"))
            .select(
                F.least("src_id", "dst_id").alias("a"),
                F.greatest("src_id", "dst_id").alias("b"),
            )
            .distinct()
        ).persist()
        per_edge_ids, total = _count(und_ids, materialize)
        if materialize:
            und_ids.unpersist()
        v = g.vertices
        per_edge = (
            per_edge_ids.join(
                v.select(F.col("id").alias("a"), F.col("url").alias("url_a")), "a"
            )
            .join(v.select(F.col("id").alias("b"), F.col("url").alias("url_b")), "b")
            .select(
                F.least("url_a", "url_b").alias("a"),
                F.greatest("url_a", "url_b").alias("b"),
                "triangles",
            )
        )
        return TriangleResult(per_edge=per_edge, total=total)

    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .persist()
    )
    per_edge, total = _count(und, materialize)
    if materialize:
        und.unpersist()
    return TriangleResult(per_edge=per_edge, total=total)


def clustering_coefficients(
    spark: SparkSession, g: GraphTables
) -> DataFrame:
    """Per-vertex local clustering coefficient over the simple
    undirected graph (Watts-Strogatz 1998):

        lcc(v) = 2 * tri(v) / (deg(v) * (deg(v) - 1))

    Composed from the per-edge triangle counts: a triangle at v covers
    exactly two edges incident to v, so tri(v) = sum of t(e) over v's
    incident edges / 2, and lcc(v) = sum_incident(t) / (deg*(deg-1)).
    One explode of the (already materialized) per-edge table + one
    combinable sum/count aggregation — no new wedge work, so the scale
    profile is the per-edge counter's. Vertices of degree < 2 (and
    vertices isolated after simplification) get lcc = 0.0.

    Output: url, degree (simple undirected), triangles (long), lcc
    (double in [0, 1]).
    """
    per_edge = triangle_counts(spark, g).per_edge
    incident = per_edge.select(
        F.col("a").alias("url"), "triangles"
    ).union(per_edge.select(F.col("b").alias("url"), "triangles"))
    stats = incident.groupBy("url").agg(
        F.count("*").alias("degree"),
        (F.sum("triangles") / 2).cast("long").alias("triangles"),
    )
    return (
        g.vertices.select("url")
        .join(stats, "url", "left")
        .select(
            "url",
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.col("triangles")
                / (F.col("degree") * (F.col("degree") - 1)),
            )
            .otherwise(0.0)
            .alias("lcc"),
        )
    )


@dataclass
class KTrussResult:
    edges: DataFrame  # a: string, b: string (a<b), support: long
    rounds: int
    converged: bool


def ktruss(
    spark: SparkSession, g: GraphTables, k: int, max_rounds: int = 100
) -> KTrussResult:
    """Maximal k-truss (Cohen 2008): the largest subgraph in which every
    edge participates in >= k-2 triangles WITHIN the subgraph — the
    edge-level analog of k-core, the standard cohesive-community
    extractor on web/social graphs (k=3 is "every edge closes a
    triangle").

    Peel to fixpoint: count per-edge support on the CURRENT edge set
    (the degree-ordered wedge join above — orientation keeps hubs from
    fanning out wedges each round), drop edges below k-2, repeat until
    no edge drops. Support shrinks monotonically as edges leave, so the
    fixpoint is the maximal k-truss (greedy peel is exact here, like
    k-core). Each round is one triangle pass over a shrinking edge set;
    round count is bounded by the peel depth (small on power-law
    graphs). Output edges are relabeled (a, b = min/max url) with their
    final in-truss support.
    """
    und = (
        g.weighted_edges.select("src_id", "dst_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = und.count()
    rounds, converged = 0, False
    per_edge = None
    while rounds < max_rounds:
        per_edge, _ = _count(und)
        survivors = per_edge.filter(
            F.col("triangles") >= k - 2
        ).localCheckpoint(eager=True)
        n_new = survivors.count()
        rounds += 1
        if n_new == n_edges:
            converged = True
            break
        n_edges = n_new
        und = survivors.select("a", "b")
        if n_new == 0:
            converged = True
            break

    v = g.vertices
    out = (
        per_edge.filter(F.col("triangles") >= k - 2)
        .join(v.select(F.col("id").alias("a"), F.col("url").alias("url_a")), "a")
        .join(v.select(F.col("id").alias("b"), F.col("url").alias("url_b")), "b")
        .select(
            F.least("url_a", "url_b").alias("a"),
            F.greatest("url_a", "url_b").alias("b"),
            F.col("triangles").alias("support"),
        )
    )
    return KTrussResult(edges=out, rounds=rounds, converged=converged)


def _count(und: DataFrame, materialize: bool = True) -> tuple[DataFrame, int]:
    """Degree-ordered wedge enumeration over a canonical undirected
    edge list (a < b, deduped). Key type agnostic (long ids or urls)."""
    deg = (
        und.select(F.col("a").alias("x"))
        .union(und.select(F.col("b").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("deg"))
    )

    # rank = struct(deg, url): total order; orient small -> large
    ranked = (
        und.join(deg.withColumnRenamed("x", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("x", "b").withColumnRenamed("deg", "db"), "b")
        .select(
            "a",
            "b",
            F.struct(F.col("da").alias("d"), F.col("a").alias("u")).alias("ra"),
            F.struct(F.col("db").alias("d"), F.col("b").alias("u")).alias("rb"),
        )
    )
    oriented = ranked.select(
        F.when(F.col("ra") < F.col("rb"), F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(F.col("ra") < F.col("rb"), F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(F.col("ra") < F.col("rb"), F.col("rb")).otherwise(F.col("ra")).alias("rv"),
    ).persist()

    e1 = oriented.select("u", F.col("v").alias("v1"), F.col("rv").alias("r1"))
    e2 = oriented.select("u", F.col("v").alias("v2"), F.col("rv").alias("r2"))
    wedges = e1.join(e2, "u").filter(F.col("r1") < F.col("r2")).select(
        "u", "v1", "v2"
    )
    closing = oriented.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    triangles = wedges.join(closing, ["v1", "v2"]).persist()

    total = triangles.count()

    tri_edges = triangles.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("u", "v1").alias("a"), F.greatest("u", "v1").alias("b")
                ),
                F.struct(
                    F.least("u", "v2").alias("a"), F.greatest("u", "v2").alias("b")
                ),
                F.struct(
                    F.least("v1", "v2").alias("a"), F.greatest("v1", "v2").alias("b")
                ),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    counts = tri_edges.groupBy("a", "b").agg(F.count("*").alias("triangles"))
    per_edge = und.join(counts, ["a", "b"], "left").select(
        "a", "b", F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles")
    )
    # materialize the result, then release every intermediate cache —
    # repeated triangle_counts calls in a long-lived session must not
    # accumulate blocks (round-1 advice). localCheckpoint also cuts the
    # 5-join lineage, so the caller's downstream plans stay flat.
    if materialize:
        per_edge = per_edge.localCheckpoint(eager=True)
        oriented.unpersist()
        triangles.unpersist()
    return per_edge, int(total)
