"""Landmark-based shortest-path distance sketches — Potamias, Bonchi,
Castillo & Gionis 2009 ("Fast shortest path distance estimation in
large networks", CIKM), public literature; no reference implementation
(/root/reference/pagerank.py computes no distances). Web-graph use:
exact point-to-point BFS on a 10^12-page graph is a full traversal per
query, so production systems precompute distances to/from a small set
of landmark vertices and answer d(u, v) queries from the triangle
inequality:

    d(u, v) <= min over landmarks l of  d(u -> l) + d(l -> v)

which is EXACT whenever some shortest u->v path passes through a
landmark (Potamias et al. §3; picking high-centrality landmarks makes
that common on web graphs, whose shortest paths concentrate through
the dense core).

Scale design: the offline phase is 2 batched multi-source BFS passes
(graph/betweenness.py::multi_source_distances — one Spark job per
level for ALL k landmarks at once, state keyed (landmark, vertex)):
one pass over the forward edge table for d(l -> v), one over the
reversed table for d(u -> l). The sketch is 2·k·n rows of 3 longs —
for k=16 landmarks that is the same order as the edge table's vertex
side and is written once, reused by every query batch. The online
phase is two hash equi-joins per query batch (pairs ⋈ to-landmark on
u, then ⋈ from-landmark on (landmark, v)) and a min-aggregate — per
pair work O(k), no traversal, no full-graph scan. All distances are
exact integers (hop counts), so the cross-engine contract needs no
rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ingest.edges import GraphTables, simple_edges
from .betweenness import multi_source_distances, resolve_seed_ids


def landmark_distances(
    spark: SparkSession,
    g: GraphTables,
    landmarks: list[str],
    direction: str = "forward",
    max_depth: int = 64,
) -> DataFrame:
    """Exact hop distances between every landmark and every vertex it
    reaches, over the simple directed graph of `g`.

    direction='forward' rows are (landmark, url, dist) = d(landmark ->
    url); direction='reverse' runs the same BFS over the transposed
    edge table, so rows are d(url -> landmark). Raises when a landmark
    url is not a vertex of the simple graph (the closeness_sampled
    convention)."""
    if direction not in ("forward", "reverse"):
        raise ValueError(f"direction must be forward|reverse, got {direction!r}")
    e = simple_edges(g)
    seeds = resolve_seed_ids(spark, g, e, landmarks)
    if direction == "reverse":
        e = (
            e.select(
                F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id")
            )
            .repartition(g.num_partitions, "src_id")
            .localCheckpoint(eager=True)
        )
    dist = multi_source_distances(spark, e, seeds, max_depth)
    return (
        dist.join(
            g.vertices.select(F.col("id").alias("s"), F.col("url").alias("landmark")),
            "s",
        )
        .join(g.vertices.select(F.col("id").alias("v"), "url"), "v")
        .select("landmark", "url", F.col("d").alias("dist"))
    )


def distance_upper_bounds(
    spark: SparkSession,
    g: GraphTables,
    landmarks: list[str],
    pairs: DataFrame,
    max_depth: int = 64,
) -> DataFrame:
    """Landmark estimate of d(u -> v) for every query pair: the
    module-docstring triangle-inequality upper bound over the 2·k·n
    distance sketch. `pairs` is a DataFrame (u, v) of url pairs
    (vertices need not exist or reach a landmark — such pairs get a
    NULL estimate rather than an error, matching the production shape
    where query urls are user input).

    Output: u, v, est (long — min over landmarks of d(u -> l) +
    d(l -> v); NULL when no landmark both receives u and reaches v).
    est >= true d(u, v) always; equality when a shortest path meets a
    landmark (pytest-asserted against the BFS oracle)."""
    to_l = landmark_distances(spark, g, landmarks, "reverse", max_depth)
    from_l = landmark_distances(spark, g, landmarks, "forward", max_depth)
    est = (
        pairs.join(
            to_l.select(
                F.col("url").alias("u"), "landmark", F.col("dist").alias("d_ul")
            ),
            "u",
        )
        .join(
            from_l.select(
                F.col("url").alias("v"), "landmark", F.col("dist").alias("d_lv")
            ),
            ["landmark", "v"],
        )
        .groupBy("u", "v")
        .agg(F.min(F.col("d_ul") + F.col("d_lv")).cast("long").alias("est"))
    )
    return pairs.join(est, ["u", "v"], "left").select("u", "v", "est")


def _sql_bfs_from(seed_rows: str, edges_cte: str, name: str) -> str:
    """One level-synced seed-anchored BFS recursion over the directed
    `{edges_cte}(src, dst)` CTE (the closeness oracle's chg pattern:
    w=0 self-loops keep current values, recursion stops when a round
    improves nothing). Emits CTE `{name}(s, v, d)`."""
    return f"""
{name}_symw as (
    select src, dst, 1 as w from {edges_cte}
    union all
    select u, u, 0 from lm_allv
),
{name} as (
    with recursive st(s, v, d, chg) as (
        select s, s, 0::bigint, 1 from (values {seed_rows}) seeds(s)
        union all
        select s, v, d,
               max(case when old is null or d < old then 1 else 0 end)
                   over () as chg
        from (
            select st.s as s, e.dst as v,
                   min(st.d + e.w) as d,
                   min(st.d) filter (where e.w = 0) as old
            from st join {name}_symw e on e.src = st.v
            where st.chg = 1
            group by st.s, e.dst
        )
    )
    select s, v, min(d) as d from st group by s, v
)"""


def sql_distance_upper_bounds(landmarks: list[str], pairs: list[tuple[str, str]]) -> str:
    """DuckDB twin over the `edges` CTE: the identical two BFS passes
    (forward + transposed) as seed-anchored recursions, then the same
    two joins + min-aggregate + left join back to the query pairs."""
    seed_rows = ", ".join("('" + s.replace("'", "''") + "')" for s in set(landmarks))
    pair_rows = ", ".join(
        "('" + u.replace("'", "''") + "', '" + v.replace("'", "''") + "')"
        for u, v in pairs
    )
    fwd = _sql_bfs_from(seed_rows, "lm_simple", "lm_fwd")
    rev = _sql_bfs_from(seed_rows, "lm_rsimple", "lm_rev")
    return f"""
lm_simple as (select distinct src, dst from edges where src <> dst),
lm_rsimple as (select dst as src, src as dst from lm_simple),
lm_allv as (select src as u from lm_simple union select dst from lm_simple),
{fwd},
{rev},
lm_pairs as (select u, v from (values {pair_rows}) p(u, v)),
lm_est as (
    select p.u, p.v, min(r.d + f.d)::bigint as est
    from lm_pairs p
    join lm_rev r on r.v = p.u
    join lm_fwd f on f.s = r.s and f.v = p.v
    group by p.u, p.v
)
select p.u, p.v, e.est
from lm_pairs p left join lm_est e on e.u = p.u and e.v = p.v"""
