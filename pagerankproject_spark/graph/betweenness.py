"""Sampled-source betweenness centrality — Brandes' algorithm
(Brandes 2001, "A faster algorithm for betweenness centrality"),
batched over all sampled sources at once — engine-added operator
(SURVEY.md §2 round-2 additions; no reference implementation).

Betweenness of v = sum over source/target pairs of the fraction of
shortest paths through v. Exact computation is all-sources Brandes
(O(nm)); at web scale the standard estimator fixes a SAMPLE of sources
(Brandes & Pich 2007) — deterministic here: the caller names the seed
urls, so the result is exactly reproducible and oracle-checkable.

Dataflow (all sources batched in one state table keyed (s, v) — one
Spark job sequence regardless of sample size):

  forward   level-synchronous BFS carrying shortest-path counts:
            sigma(s,v) = sum of sigma(s,u) over edges u->v with
            dist(s,u) = dist(s,v) - 1. Each level is one join + one
            combinable sum + one anti-join against the settled set.
            Path counts are EXACT LONGS (no float drift).
  backward  Brandes' dependency accumulation, levels descending:
            delta(s,u) = sum over successors w of
            sigma(s,u)/sigma(s,w) * (1 + delta(s,w)).
            Level L's deltas are a pure function of level L+1's — one
            join + one combinable sum per level.
  output    bc(v) = sum over sampled s != v of delta(s,v), rounded 6dp
            (raw sampled sum; divide by len(sources) outside if a
            per-source average is wanted).

The DuckDB oracle (sql_betweenness_sampled) avoids replaying the
backward recursion: by Brandes' pair-dependency identity,
bc(v) = sum over s in sample, all t, s != v != t, with
d(s,v) + d(v,t) = d(s,t), of sigma(s,v) * sigma(v,t) / sigma(s,t) —
computable from an ALL-pairs (dist, sigma) table built by one
level-synced recursive CTE (fine at oracle scale). The two float
summation structures agree to ~1e-15; both round once at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..ingest.edges import GraphTables, simple_edges
from ..session import loop_shuffle_partitions, no_aqe


def betweenness_sampled(
    spark: SparkSession,
    g: GraphTables,
    sources: list[str],
    max_depth: int = 64,
) -> DataFrame:
    """Directed betweenness contributions from the sampled sources.

    Output: url, bc (double, 6dp) — one row per vertex reached by any
    sample's forward pass (vertices with bc 0 included when reached).
    """
    e = simple_edges(g)
    # seeds must be vertices OF THE SIMPLE GRAPH (a url whose only
    # edges are self-loops is not — same rule as HyperBall), and ALL
    # requested sources must resolve: silently dropping one would skew
    # the deterministic sample (and any per-source average) without a
    # trace
    graph_vids = (
        e.select(F.col("src_id").alias("id"))
        .union(e.select(F.col("dst_id").alias("id")))
        .distinct()
    )
    src_df = spark.createDataFrame(
        [(u,) for u in set(sources)], "url string"
    )
    seeds = (
        g.vertices.join(F.broadcast(src_df), "url", "left_semi")
        .join(graph_vids, "id", "left_semi")
        .select(F.col("id").alias("s"))
        .localCheckpoint(eager=True)
    )
    n_seeds = seeds.count()
    if n_seeds != len(set(sources)):
        raise ValueError(
            f"only {n_seeds} of {len(set(sources))} source urls are "
            "vertices of the simple graph"
        )

    # ---- forward: levels of (s, v, d, sigma) ----
    level = seeds.select(
        "s", F.col("s").alias("v"), F.lit(0).alias("d"), F.lit(1).cast("long").alias("sigma")
    ).localCheckpoint(eager=True)
    settled = level
    levels = [level]
    with no_aqe(spark), loop_shuffle_partitions(spark, g.num_edges):
        # one probe level past the cap: a frontier still alive there
        # would silently corrupt EVERY bc value (the backward pass would
        # run on a truncated shortest-path DAG), not just omit the tail.
        # ONE job per level: the frontier-size count rides an Observation
        # on the level's checkpoint materialization, and the settled set
        # is a lazy union of the already-checkpointed levels (scanning
        # them for the anti-join is cheap; re-materializing the whole
        # settled set each level is not).
        for depth in range(1, max_depth + 2):
            cand = (
                level.join(e, level.v == e.src_id)
                .groupBy("s", F.col("dst_id").alias("v"))
                .agg(F.sum("sigma").alias("sigma"))
            )
            obs = Observation()
            nxt = (
                cand.join(settled.select("s", "v"), ["s", "v"], "left_anti")
                .select("s", "v", F.lit(depth).alias("d"), "sigma")
                .observe(obs, F.count(F.lit(1)).alias("c"))
                .localCheckpoint(eager=True)
            )
            if int(obs.get["c"] or 0) == 0:
                break
            if depth > max_depth:
                raise ValueError(
                    f"forward BFS still expanding past max_depth={max_depth}; "
                    "raise max_depth"
                )
            levels.append(nxt)
            settled = settled.unionByName(nxt)
            level = nxt

        # ---- backward: deltas, deepest level first ----
        delta_next = levels[-1].select(
            "s", "v", F.lit(0.0).alias("delta")
        ).localCheckpoint(eager=True)
        acc = [delta_next]
        for li in range(len(levels) - 2, -1, -1):
            u_lvl = levels[li]
            # rename s on the w side: both levels descend from the same
            # checkpointed lineage, so an s == s join predicate is only
            # disambiguated by Spark's dataset-id metadata (it already
            # logs the trivially-true-predicate warning) — aliasing makes
            # the join unambiguous by construction
            w_lvl = levels[li + 1].join(delta_next, ["s", "v"]).select(
                F.col("s").alias("sw"),
                F.col("v").alias("w"),
                F.col("sigma").alias("sigma_w"),
                F.col("delta").alias("delta_w"),
            )
            contrib = (
                u_lvl.join(e, u_lvl.v == e.src_id)
                .join(
                    w_lvl,
                    (F.col("dst_id") == w_lvl.w) & (u_lvl.s == F.col("sw")),
                )
                .select(
                    u_lvl.s.alias("s"),
                    u_lvl.v.alias("v"),
                    (
                        F.col("sigma").cast("double")
                        / F.col("sigma_w").cast("double")
                        * (F.lit(1.0) + F.col("delta_w"))
                    ).alias("part"),
                )
                .groupBy("s", "v")
                .agg(F.sum("part").alias("delta"))
            )
            delta_next = (
                u_lvl.select("s", "v")
                .join(contrib, ["s", "v"], "left")
                .select("s", "v", F.coalesce("delta", F.lit(0.0)).alias("delta"))
                .localCheckpoint(eager=True)
            )
            acc.append(delta_next)

    deltas = acc[0]
    for d in acc[1:]:
        deltas = deltas.unionByName(d)
    bc = (
        deltas.filter(F.col("v") != F.col("s"))
        .groupBy("v")
        .agg(F.round(F.sum("delta"), 6).alias("bc"))
    )
    # include reached vertices with zero dependency (e.g. sinks)
    reached = settled.select("v").distinct()
    out = (
        reached.join(bc, "v", "left")
        .select("v", F.coalesce("bc", F.lit(0.0)).alias("bc"))
        .withColumnRenamed("v", "id")
        .join(g.vertices, "id")
        .select("url", "bc")
    )
    return out


def resolve_seed_ids(
    spark: SparkSession, g: GraphTables, e: DataFrame, sources: list[str]
) -> DataFrame:
    """Map source urls to dense ids restricted to the simple graph's
    vertex universe, failing loudly when any url is missing (shared by
    closeness_sampled and the landmark-distance family). Output: one
    column `s` (long), eagerly checkpointed."""
    graph_vids = (
        e.select(F.col("src_id").alias("id"))
        .union(e.select(F.col("dst_id").alias("id")))
        .distinct()
    )
    src_df = spark.createDataFrame([(u,) for u in set(sources)], "url string")
    seeds = (
        g.vertices.join(F.broadcast(src_df), "url", "left_semi")
        .join(graph_vids, "id", "left_semi")
        .select(F.col("id").alias("s"))
        .localCheckpoint(eager=True)
    )
    n_seeds = seeds.count()
    if n_seeds != len(set(sources)):
        raise ValueError(
            f"only {n_seeds} of {len(set(sources))} source urls are "
            "vertices of the simple graph"
        )
    return seeds


def multi_source_distances(
    spark: SparkSession, e: DataFrame, seeds: DataFrame, max_depth: int = 64
) -> DataFrame:
    """Batched one-job-per-level BFS from every seed at once over the
    directed dense-id edge table `e(src_id, dst_id)`: state keyed
    (s, v), each frontier anti-joined against the lazy union of
    checkpointed levels — per level one join + one distinct + one
    anti-join, with the empty-frontier check riding the Observation on
    the level checkpoint (the betweenness forward-pass shape minus the
    sigma bookkeeping). Output: s (long), v (long), d (long) for every
    (seed, reached vertex)."""
    level = seeds.select(
        "s", F.col("s").alias("v"), F.lit(0).cast("long").alias("d")
    ).localCheckpoint(eager=True)
    settled = level
    levels = [level]
    m_e = e.count()
    with no_aqe(spark), loop_shuffle_partitions(spark, m_e):
        for depth in range(1, max_depth + 2):
            cand = (
                level.join(e, level.v == e.src_id)
                .select("s", F.col("dst_id").alias("v"))
                .distinct()
            )
            obs = Observation()
            nxt = (
                cand.join(settled.select("s", "v"), ["s", "v"], "left_anti")
                .select("s", "v", F.lit(depth).cast("long").alias("d"))
                .observe(obs, F.count(F.lit(1)).alias("c"))
                .localCheckpoint(eager=True)
            )
            if int(obs.get["c"] or 0) == 0:
                break
            if depth > max_depth:
                raise ValueError(
                    f"forward BFS still expanding past max_depth={max_depth}; "
                    "raise max_depth"
                )
            levels.append(nxt)
            settled = settled.unionByName(nxt)
            level = nxt

    dist = levels[0]
    for lv in levels[1:]:
        dist = dist.unionByName(lv)
    return dist


def closeness_sampled(
    spark: SparkSession,
    g: GraphTables,
    sources: list[str],
    max_depth: int = 64,
) -> DataFrame:
    """Sampled-source closeness centrality (Eppstein & Wang 2004
    estimator, deterministic source set like betweenness_sampled):
    for every vertex v reached by any sampled source,
        closeness_est(v) = |S_v| / sum over s in S_v of d(s, v)
    where S_v = the sampled sources reaching v — the inverse of v's
    mean observed distance FROM the sample (in-closeness; run on the
    reversed graph for out-closeness). Scaling to Eppstein-Wang's
    normalized form is a global constant (n, k) left to the caller.

    Output: url, n_sources (long), dist_total (long), closeness_est
    (double — NULL when dist_total = 0, i.e. v is only reached as a
    seed at distance 0). The two aggregates are EXACT INTEGERS and the
    score is one final division, so the cross-engine contract needs no
    rounding (the degree_assortativity/modularity discipline).

    Same batched one-job-per-level forward pass as betweenness_sampled
    (state keyed (s, v), frontier anti-joined against the lazy union of
    checkpointed levels), minus the sigma bookkeeping and the whole
    backward phase — per level: one join + one distinct + one anti-join.
    """
    e = simple_edges(g)
    seeds = resolve_seed_ids(spark, g, e, sources)
    dist = multi_source_distances(spark, e, seeds, max_depth)
    agg = dist.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum("d").cast("long").alias("dist_total"),
    )
    score = F.when(
        F.col("dist_total") > 0,
        F.col("n_sources").cast("double") / F.col("dist_total").cast("double"),
    )
    return (
        agg.withColumnRenamed("v", "id")
        .join(g.vertices, "id")
        .select("url", "n_sources", "dist_total", score.alias("closeness_est"))
    )


def sql_closeness_sampled(sources: list[str]) -> str:
    """DuckDB twin over the `edges` CTE: seed-anchored level-synced BFS
    recursion (the engine BFS oracle's chg pattern), then the same
    integer aggregates and single division."""
    seed_rows = ", ".join("('" + s.replace("'", "''") + "')" for s in sources)
    return f"""
simple as (select distinct src, dst from edges where src <> dst),
allv as (select src as u from simple union select dst from simple),
symw as (
    select src, dst, 1 as w from simple
    union all
    select u, u, 0 from allv
),
cl_dist as (
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
            from st join symw e on e.src = st.v
            where st.chg = 1
            group by st.s, e.dst
        )
    )
    select s, v, min(d) as d from st group by s, v
)
select d.v as url,
       count(*)::bigint as n_sources,
       sum(d.d)::bigint as dist_total,
       case when sum(d.d) > 0
            then count(*)::double / sum(d.d)::double
       end as closeness_est
from cl_dist d
group by d.v"""


def sql_betweenness_sampled(sources: list[str]) -> str:
    """DuckDB twin over the `edges` CTE: all-pairs (dist, sigma) by one
    level-synced recursion, then the closed-form pair-dependency sum
    restricted to the sampled sources. Output rows match the engine:
    every vertex reached from any sample (zero-dependency included)."""
    seed_rows = ", ".join("('" + s.replace("'", "''") + "')" for s in sources)
    return f"""
simple as (select distinct src, dst from edges where src <> dst),
allv as (select src as u from simple union select dst from simple),
symw as (
    select src, dst, 1 as w from simple
    union all
    select u, u, 0 from allv
),
dist as (
    -- all-pairs min-hop distances: the engine BFS oracle's chg pattern
    -- (self-row keeps the current value; recursion stops when a round
    -- improves nothing), anchored at EVERY vertex at once
    with recursive st(s, v, d, chg) as (
        select u, u, 0::bigint, 1 from allv
        union all
        select s, v, d,
               max(case when old is null or d < old then 1 else 0 end)
                   over () as chg
        from (
            select st.s as s, e.dst as v,
                   min(st.d + e.w) as d,
                   min(st.d) filter (where e.w = 0) as old
            from st join symw e on e.src = st.v
            where st.chg = 1
            group by st.s, e.dst
        )
    )
    select s, v, min(d) as d from st group by s, v
),
dsx as (
    -- exact shortest-path counts: level-synced recursion GUARDED by the
    -- materialized dist table (referenced non-recursively), so a (s,v)
    -- row is produced exactly once, at its true level, with the full
    -- sum over its shortest-DAG predecessors
    with recursive sg(s, v, d, sigma) as (
        select u, u, 0::bigint, 1::bigint from allv
        union all
        select sg.s, e.dst, sg.d + 1, sum(sg.sigma)::bigint
        from sg
        join simple e on e.src = sg.v
        join dist dd on dd.s = sg.s and dd.v = e.dst and dd.d = sg.d + 1
        group by sg.s, e.dst, sg.d + 1
    )
    select s, v, d, sigma from sg
),
bc0 as (
    select sv.v as v,
           sum(sv.sigma * vt.sigma / st.sigma::double) as bc
    from (values {seed_rows}) seeds(s)
    join dsx sv on sv.s = seeds.s
    join dsx vt on vt.s = sv.v
    join dsx st on st.s = seeds.s and st.v = vt.v
    where sv.v <> seeds.s and vt.v <> sv.v and vt.v <> seeds.s
      and sv.d + vt.d = st.d
    group by sv.v
),
reached as (
    select distinct d.v
    from (values {seed_rows}) seeds(s) join dsx d on d.s = seeds.s
)
select r.v as url, round(coalesce(b.bc, 0.0), 6) as bc
from reached r left join bc0 b on b.v = r.v"""
