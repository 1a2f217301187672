"""k-core subgraph + BFS hop distances — engine-added classic
link-graph operators (no reference implementation; standard definitions,
e.g. Seidman 1983 for cores).

Both reuse the engine's iterative skeleton: DataFrame join/agg body,
Observation-borne convergence scalar riding a localCheckpoint
materialization (one Spark job per iteration), lineage truncated every
iteration.

k-core: iteratively peel vertices whose UNDIRECTED degree < k until a
fixpoint; returns the surviving vertex set (the k-core). The peeled
set is materialized per round and anti-joined WITHOUT a broadcast hint
(round 1 can peel most of the graph; Spark broadcasts automatically
only when the set fits).

BFS: multi-source hop distances over the symmetrized graph; frontier
expansion is the same join+MIN aggregate as connected components with
distance+1 instead of min-label — restricted to the FRONTIER (vertices
first reached last round), so total join work is O(total edges), not
O(diameter x reached-edges). sssp_weighted applies the same worklist
restriction (classic Bellman-Ford worklist: only relax out-edges of
vertices whose distance improved last round).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..ingest.edges import GraphTables
from ..session import loop_shuffle_partitions, no_aqe


@dataclass
class KCoreResult:
    vertices: DataFrame  # url: string, degree: long (degree within the core)
    iterations: int
    metrics: list[dict] = field(default_factory=list)


def kcore(
    spark: SparkSession,
    g: GraphTables,
    k: int,
    max_iterations: int = 100,
) -> KCoreResult:
    P = g.num_partitions
    e = g.weighted_edges.select("src_id", "dst_id").filter(
        F.col("src_id") != F.col("dst_id")
    )
    # undirected simple edges (a < b, deduped) — degree = simple-graph degree
    und = (
        e.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
        .repartition(P, "a")
        .localCheckpoint(eager=True)
    )

    metrics: list[dict] = []
    it = 0
    with no_aqe(spark), loop_shuffle_partitions(spark, g.num_edges):
        for it in range(max_iterations):
            t0 = time.time()
            deg = (
                und.select(F.col("a").alias("v"))
                .union(und.select(F.col("b").alias("v")))
                .groupBy("v")
                .agg(F.count("*").alias("deg"))
            )
            # materialize once (the set is reused 3x: count + 2 anti-joins);
            # round-1 victims can be MOST of the graph, so no broadcast
            # hint — Spark picks broadcast only when it actually fits.
            victims = deg.filter(F.col("deg") < k).select("v").localCheckpoint(
                eager=True
            )
            n_victims = victims.count()
            metrics.append(
                {"i": it, "peeled": n_victims, "wall_sec": time.time() - t0}
            )
            if n_victims == 0:
                break
            und = (
                und.join(victims, und.a == victims.v, "left_anti")
                .join(victims, und.b == victims.v, "left_anti")
                .localCheckpoint(eager=True)
            )

    deg = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    out = deg.join(
        g.vertices.select(F.col("id").alias("v"), "url"), "v"
    ).select("url", "degree")
    return KCoreResult(vertices=out, iterations=it + 1, metrics=metrics)


@dataclass
class BFSResult:
    distances: DataFrame  # url: string, distance: long (unreached omitted)
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def bfs_distances(
    spark: SparkSession,
    g: GraphTables,
    sources: list[str],
    max_iterations: int = 100,
) -> BFSResult:
    """Hop distance from the nearest of `sources` (urls), undirected.

    Frontier-restricted expansion: in synchronous unweighted BFS a
    vertex's distance is final the round it is first reached, so each
    round only the LAST round's newly-reached vertices (the frontier,
    carried as an `nw` flag on the settled table) join against the edge
    table; already-settled vertices are excluded with one anti-join.
    Total join work is O(total edges) instead of the full-settled-set
    rescan's O(diameter x reached-edges). One Spark job per round: the
    frontier count rides an Observation on the localCheckpoint
    materialization of the merged settled table.
    """
    P = g.num_partitions
    e = g.weighted_edges.select("src_id", "dst_id")
    sym = (
        e.union(
            e.select(F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id"))
        )
        .repartition(P, "src_id")
        .persist()
    )
    src_df = spark.createDataFrame([(u,) for u in sources], "url string")
    dist = (
        g.vertices.join(F.broadcast(src_df), "url", "left_semi")
        .select(
            "id",
            F.lit(0).cast("long").alias("d"),
            F.lit(1).alias("nw"),
        )
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )
    if dist.isEmpty():
        raise ValueError("no source url found in the vertex set")

    metrics: list[dict] = []
    converged = False
    it = 0
    with no_aqe(spark), loop_shuffle_partitions(spark, g.num_edges):
        for it in range(max_iterations):
            t0 = time.time()
            frontier = dist.filter(F.col("nw") == 1).select("id", "d")
            cand = (
                sym.join(frontier, sym.src_id == frontier.id)
                .groupBy(F.col("dst_id").alias("id"))
                .agg((F.min("d") + 1).alias("d"))
                .join(dist, "id", "left_anti")
            )
            obs = Observation()
            staged = (
                dist.select("id", "d", F.lit(0).alias("nw"))
                .union(cand.select("id", "d", F.lit(1).alias("nw")))
                .observe(obs, F.sum("nw").alias("c"))
                # union CONCATENATES partitions; without this narrow
                # (no-shuffle) merge the settled table gains one
                # partition set per round and late rounds pay
                # O(rounds x P) task dispatch — measured as linearly
                # growing stage sizes on an 80-round chain graph
                .coalesce(P)
            )
            dist = staged.localCheckpoint(eager=True)
            changed = int(obs.get["c"] or 0)
            metrics.append({"i": it, "changed": changed, "wall_sec": time.time() - t0})
            if changed == 0:
                converged = True
                break

    out = dist.join(g.vertices, "id").select(
        "url", F.col("d").cast("long").alias("distance")
    )
    sym.unpersist()
    return BFSResult(
        distances=out, iterations=it + 1, converged=converged, metrics=metrics
    )


def khop_subgraph(
    spark: SparkSession,
    g: GraphTables,
    seeds: list[str],
    k: int,
    directed: bool = True,
) -> DataFrame:
    """Ego-net extraction: the edge set of the subgraph INDUCED on the
    k-hop ball around `seeds` — the standard neighborhood sampler for
    graph-ML minibatching (GraphSAGE-style) and for interactive "show
    me the region around this page" drill-downs.

    Ball membership grows by k rounds of frontier expansion (directed:
    out-edges; undirected: symmetrized), each one join + distinct on
    dense long ids; the output is the simple directed edge list with
    BOTH endpoints inside the ball, translated back to urls. Work per
    round is proportional to the frontier's out-edges, never the whole
    graph; the final induced-edge step is two semi-joins against the
    (ball-sized) membership table.

    Output: src, dst (urls). Exact, fully declarative — the DuckDB
    oracle replays it with a depth-bounded recursive CTE.
    """
    from ..ingest.edges import simple_edges

    e = simple_edges(g)
    step = (
        e
        if directed
        else e.union(
            e.select(F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id"))
        )
    )
    src_df = spark.createDataFrame([(u,) for u in set(seeds)], "url string")
    ball = (
        g.vertices.join(F.broadcast(src_df), "url", "left_semi")
        .select("id")
        .localCheckpoint(eager=True)
    )
    if ball.count() != len(set(seeds)):
        raise ValueError(
            "no seed url found in the vertex set"
            if ball.isEmpty()
            else "some seed urls are not in the vertex set"
        )
    # expand only the FRONTIER each round (vertices first reached in the
    # previous round) — rescanning the whole ball would re-visit every
    # settled vertex's out-edges k - hop(v) times
    frontier = ball
    for _ in range(k):
        new = (
            step.join(frontier.withColumnRenamed("id", "src_id"), "src_id")
            .select(F.col("dst_id").alias("id"))
            .distinct()
            .join(ball, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        ball = ball.union(new).localCheckpoint(eager=True)
        frontier = new
    induced = e.join(ball.withColumnRenamed("id", "src_id"), "src_id").join(
        ball.withColumnRenamed("id", "dst_id"), "dst_id"
    )
    v = g.vertices
    return (
        induced.join(v.select(F.col("id").alias("src_id"), F.col("url").alias("src")), "src_id")
        .join(v.select(F.col("id").alias("dst_id"), F.col("url").alias("dst")), "dst_id")
        .select("src", "dst")
    )


def sql_khop_subgraph(seeds: list[str], k: int) -> str:
    """DuckDB twin over the `edges` CTE: depth-bounded reach from the
    seed set, then the induced simple directed edge list."""
    seed_rows = ", ".join("('" + s.replace("'", "''") + "')" for s in seeds)
    return f"""
simple as (select distinct src, dst from edges where src <> dst),
ball as (
    with recursive reach(w, d) as (
        select s.u as w, 0 from (values {seed_rows}) s(u)
        union
        select e.dst as w, r.d + 1
        from reach r join simple e on e.src = r.w
        where r.d < {k}
    )
    select distinct w from reach
)
select e.src, e.dst
from simple e
join ball ba on ba.w = e.src
join ball bb on bb.w = e.dst"""


@dataclass
class SSSPResult:
    distances: DataFrame  # url: string, dist: double (unreached omitted)
    iterations: int
    converged: bool
    # per-round diagnostics: {"i", "changed", "wall_sec"} — the worklist
    # restriction's evidence that round cost tracks the worklist, not
    # the settled set (BENCH.md round-3 section)
    metrics: list[dict] = field(default_factory=list)


def sssp_weighted(
    spark: SparkSession,
    edges_w: DataFrame,
    source: str,
    max_iterations: int = 200,
) -> SSSPResult:
    """Weighted single-source shortest paths over a directed graph with
    POSITIVE edge costs (src, dst, w) — synchronous Bellman-Ford
    relaxation, the weighted twin of bfs_distances:

        d_i(v) = min( d_{i-1}(v), min over (u,v,w) of d_{i-1}(u) + w )

    restricted to the WORKLIST: only out-edges of vertices whose
    distance improved last round are relaxed (if d(u) did not change in
    round i-1, every d(u)+w candidate was already offered in an earlier
    round), so total work is O(edges x avg-relaxations-per-vertex)
    instead of the full-settled-set rescan's O(diameter x
    reached-edges). The changed flag is carried as a `chg` column on
    the settled table, so the worklist filter is free at the next
    round's join. Each iteration is one join + one combinable min
    aggregate keyed by dst (the PageRank-loop shape); the
    changed-vertex count rides an Observation on the checkpoint
    materialization, so convergence costs no extra job. Positive costs make distances strictly monotone
    decreasing per vertex, which is what lets the DuckDB oracle replay
    the run as min-over-trajectory (sql_sssp_weighted). Every relaxed
    candidate is one float addition of the same two doubles on both
    engines, so distances are bit-identical; the contract key rounds to
    6dp by module convention only.

    Natural input at corpus scale: the host graph with cost = 1/n_links
    (strongly-linked hosts are "close"). Unreached vertices are omitted.
    """
    e = (
        edges_w.select("src", "dst", F.col("w").cast("double").alias("w"))
        .filter((F.col("src") != F.col("dst")) & (F.col("w") > 0))
        .localCheckpoint(eager=True)
    )
    dist = (
        e.select(F.col("src").alias("url"))
        .union(e.select(F.col("dst").alias("url")))
        .distinct()
        .filter(F.col("url") == source)
        .select("url", F.lit(0.0).alias("d"), F.lit(1).alias("chg"))
        .localCheckpoint(eager=True)
    )
    if dist.isEmpty():
        raise ValueError("source url not found in the vertex set")

    converged, it = False, 0
    metrics: list[dict] = []
    m_e = e.count()
    with no_aqe(spark), loop_shuffle_partitions(spark, m_e):
        for it in range(max_iterations):
            t0 = time.time()
            work = dist.filter(F.col("chg") == 1).select("url", "d")
            cand = (
                e.join(work, e.src == work.url)
                .groupBy(F.col("dst").alias("url"))
                .agg(F.min(F.col("d") + F.col("w")).alias("nd"))
            )
            obs = Observation()
            staged = (
                dist.drop("chg")
                .join(cand, "url", "full")
                .select(
                    "url",
                    F.least(
                        F.coalesce(F.col("d"), F.lit(float("inf"))),
                        F.coalesce(F.col("nd"), F.lit(float("inf"))),
                    ).alias("d"),
                    F.when(
                        F.col("d").isNull() | (F.col("nd") < F.col("d")), 1
                    )
                    .otherwise(0)
                    .alias("chg"),
                )
                .observe(obs, F.sum("chg").alias("c"))
            )
            dist = staged.localCheckpoint(eager=True)
            changed = int(obs.get["c"] or 0)
            metrics.append({"i": it, "changed": changed, "wall_sec": time.time() - t0})
            if changed == 0:
                converged = True
                break
    return SSSPResult(
        distances=dist.select("url", F.col("d").alias("dist")),
        iterations=it + 1,
        converged=converged,
        metrics=metrics,
    )


def sql_sssp_weighted(
    source: str, edges_rel: str = "wedges", round_digits: int = 6
) -> str:
    """DuckDB twin of sssp_weighted: the sql_bfs_distances recursion
    with real weights. `edges_rel` must expose (src, dst, w) with
    positive w and no self-loops; distances are min-over-trajectory
    (monotone), rounded like the engine's contract output."""
    s = source.replace("'", "''")
    return f"""
ew0 as (
  select src, dst, w::double as w from {edges_rel} where src <> dst and w > 0
),
vv as (select src as url from ew0 union select dst from ew0),
eww as (
  select src, dst, w, 0 as own from ew0
  union all
  select url, url, 0.0::double, 1 from vv
),
sp as (
  -- the anchor literal PINS st.d's type for every round: a bare 0.0
  -- would make it DECIMAL(2,1), silently rounding each round's float
  -- distances to one decimal and looping forever (pre-cast d < old
  -- keeps reporting an improvement the cast then throws away)
  with recursive st(v, d, chg) as (
    select url, 0.0::double, 1 from vv where url = '{s}'
    union all
    select v, d,
           max(case when old is null or d < old then 1 else 0 end) over () as chg
    from (
      select e.dst as v,
             min(s.d + e.w) as d,
             min(s.d) filter (where e.own = 1) as old
      from st s join eww e on e.src = s.v
      where s.chg = 1
      group by e.dst
    )
  )
  select v as url, min(d) as dist from st group by v
)
select url, round(dist, {round_digits}) as dist from sp"""


@dataclass
class CorenessResult:
    vertices: DataFrame  # url: string, coreness: long
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)



def hindex_expr(arr):
    """h-index of a value multiset as one JVM-side integer fold:
    sort the collected values descending, then h = max_i min(i, m_i)
    (1-indexed). Identical to the row_number-window formulation
    max(least(rn, value)) — and like it, invariant to the order among
    equal values — but runs as a plain hash aggregate: one shuffle, no
    per-group sort stage. Shared by coreness (vertex h-index) and
    trussness (edge-triangle h-index)."""
    return F.aggregate(
        F.reverse(F.array_sort(arr)),
        F.struct(
            F.lit(0).cast("long").alias("i"), F.lit(0).cast("long").alias("h")
        ),
        lambda acc, x: F.struct(
            (acc["i"] + F.lit(1).cast("long")).alias("i"),
            F.greatest(
                acc["h"], F.least(acc["i"] + F.lit(1).cast("long"), x)
            ).alias("h"),
        ),
        lambda acc: acc["h"],
    )


def coreness(
    spark: SparkSession,
    g: GraphTables,
    max_iterations: int = 30,
) -> CorenessResult:
    """Full core decomposition: every vertex's core number in ONE pass,
    where kcore(k) answers only membership for a single k.

    Algorithm: the neighborhood h-index fixpoint (Lu, Zhou, Zhang,
    Li & Stanley 2016, "The H-index of a network node and its relation
    to degree and coreness" — public): c_0(v) = simple undirected
    degree; c_{t+1}(v) = H({c_t(u) : u ~ v}) with H the classic
    h-index (the largest h such that >= h neighbors have value >= h).
    The iterates are non-increasing and converge exactly to the core
    number — no peeling rounds, no per-k loop, and every round is one
    edge-scan join + one hash aggregate computing the h-index as a
    JVM-side integer fold (hindex_expr), all shuffled on the same
    vertex key.

    Scale shape: state is one long per vertex; per-round cost is
    O(edges) with the same key partitioning reused across the join
    and the aggregate (a single exchange per round). The
    changed-vertex count rides the localCheckpoint Observation, so the
    loop costs one Spark job per round. Rounds needed are bounded by
    the longest strictly-decreasing h-index trajectory — tens, not
    thousands, on web-shaped graphs (convergence is checked and
    reported, and a fixed `max_iterations` replays exactly in the
    DuckDB oracle since post-fixpoint rounds are no-ops).

    H-index tie handling: the descending fold in hindex_expr (like the
    rank-window formulation it replaces) is invariant to the order
    among equal values, so the result is deterministic without a
    tie-break key.

    Isolated vertices (no non-loop edges) have core number 0 and are
    restored from g.vertices at the end.
    """
    P = g.num_partitions
    e = g.weighted_edges.select("src_id", "dst_id").filter(
        F.col("src_id") != F.col("dst_id")
    )
    und = (
        e.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
    )
    usym = (
        und.select(F.col("a").alias("v"), F.col("b").alias("w"))
        .union(und.select(F.col("b").alias("v"), F.col("a").alias("w")))
        .repartition(P, "v")
        .localCheckpoint(eager=True)
    )
    c = (
        usym.groupBy("v")
        .agg(F.count("*").cast("long").alias("c"))
        .repartition(P, "v")
        .localCheckpoint(eager=True)
    )

    m_sym = usym.count()
    metrics: list[dict] = []
    converged = False
    it = -1
    with no_aqe(spark), loop_shuffle_partitions(spark, m_sym):
        for it in range(max_iterations):
            t0 = time.time()
            h = (
                usym.join(
                    c.select(F.col("v").alias("w"), F.col("c").alias("cw")), "w"
                )
                .groupBy("v")
                .agg(hindex_expr(F.collect_list("cw")).alias("h"))
            )
            obs = Observation()
            staged = (
                c.join(h, "v")
                .select(
                    "v",
                    F.col("h").alias("c"),
                    (F.col("h") != F.col("c")).cast("long").alias("chg"),
                )
                .observe(obs, F.sum("chg").alias("n"))
                .select("v", "c")
                .repartition(P, "v")
            )
            c = staged.localCheckpoint(eager=True)
            changed = int(obs.get["n"] or 0)
            metrics.append(
                {"i": it, "changed": changed, "wall_sec": time.time() - t0}
            )
            if changed == 0:
                converged = True
                break

    out = (
        g.vertices.select(F.col("id").alias("v"), "url")
        .join(c, "v", "left")
        .select("url", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("coreness"))
    )
    return CorenessResult(
        vertices=out, iterations=it + 1, converged=converged, metrics=metrics
    )

def double_sweep(
    spark: SparkSession,
    g: GraphTables,
    source: str,
) -> DataFrame:
    """Double-sweep diameter lower bound (Magnien, Latapy & Habib,
    ACM JEA 2009: two BFS sweeps give a lower bound on the diameter
    that is exact on trees and empirically tight on web graphs —
    the standard cheap companion to HyperBall's full neighborhood
    function): BFS from `source`, take the farthest reached vertex
    (max distance, min-url tie-break — deterministic), BFS again from
    it, report that sweep's eccentricity. Cost: exactly two
    frontier-restricted BFS runs; the only driver-side value is the
    1-row peak pick (same class as the top-k sink).

    Returns one row (seed, sweep_peak, far_url, diameter_lb).
    """
    d1 = bfs_distances(spark, g, sources=[source]).distances
    peak = d1.orderBy(F.desc("distance"), F.asc("url")).limit(1).collect()[0]
    u = str(peak["url"])
    d2 = bfs_distances(spark, g, sources=[u]).distances
    return (
        d2.orderBy(F.desc("distance"), F.asc("url"))
        .limit(1)
        .select(
            F.lit(source).alias("seed"),
            F.lit(u).alias("sweep_peak"),
            F.col("url").alias("far_url"),
            F.col("distance").alias("diameter_lb"),
        )
    )
