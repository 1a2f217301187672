"""Maximal matching — the parallel local-dominant (locally-lightest)
edge rule: an edge joins the matching when its priority is the minimum
among ALL edges sharing either endpoint; matched endpoints leave the
graph; repeat until no edges survive. This is the random-permutation
greedy maximal matching of Israeli & Itai 1986 / Blelloch, Fineman &
Shun 2012 ("Greedy sequential maximal independent set and matching are
parallel on average") — O(log m) rounds w.h.p. over the priority hash.
Public literature; no reference implementation
(/root/reference/pagerank.py has no matching). Web-pipeline use:
maximal matching is the pairing primitive — graph coarsening for
multilevel partitioners (METIS-style), 1-to-1 near-duplicate pairing,
and load-balanced merge scheduling all start from one.

DERANDOMIZED the repo's way: each simple undirected edge (a<b)
carries the fixed priority
    (hash60(a || '|' || b), a, b)
— portable md5-derived 60-bit integer, (a,b) as the total-order
tie-break, identical in Spark and DuckDB — so the matching is a pure
function of the edge set: exactly reproducible, oracle-replayable,
resumable. Winners are vertex-disjoint by construction (a vertex's
incident minimum is a single edge), and termination with an empty
residual edge set IS maximality: every unmatched edge lost an endpoint
to an earlier winner.

Per round: one explode of the residual edge set to (endpoint,
priority), one map-side-combinable per-vertex min, two equi-joins back
to find edges that are the minimum at BOTH endpoints, two anti-joins
to drop matched endpoints — the residual graph shrinks by at least
half the edges in expectation per round. The matched log accumulates
with a coalesce(P) before each checkpoint (see
[[spark-iterative-loop-pitfalls]]: union concatenates partition sets).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import loop_shuffle_partitions, no_aqe
from ..text.analysis import hash60_expr, sql_hash60


@dataclass
class MatchingResult:
    pairs: DataFrame  # a: string, b: string (a<b), match_round: long
    rounds: int
    metrics: list[dict] = field(default_factory=list)


def maximal_matching(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 64,
) -> MatchingResult:
    """Maximal matching of the simple undirected graph of
    `edges(src, dst)` (self-loops dropped, directions merged).

    Output: a, b (the matched pair, a<b), match_round (the 0-based
    round the pair matched). Guarantees (pytest-asserted): no vertex
    appears in two pairs (matching); every simple-graph edge has at
    least one matched endpoint (maximality). Raises on an edgeless
    simple graph.
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .select(
            "a",
            "b",
            F.struct(
                hash60_expr(F.concat_ws("|", "a", "b")).alias("h"),
                F.col("a").alias("ta"),
                F.col("b").alias("tb"),
            ).alias("pe"),
        )
        .localCheckpoint(eager=True)
    )
    return _match_loop(spark, und, max_rounds)


def weighted_matching(
    spark: SparkSession,
    wedges: DataFrame,
    max_rounds: int = 64,
) -> MatchingResult:
    """Greedy WEIGHTED maximal matching — the locally-heaviest edge
    rule (Preis 1999 / Avis 1983's greedy, a 1/2-approximation of
    maximum weight matching): identical round structure to
    maximal_matching, but the priority orders by weight DESC first
    (then the hash, then (a,b)), so each round matches edges that are
    the heaviest at both endpoints. This is what makes METIS-style
    coarsening weight-aware: heavy edges contract first, preserving
    cut structure across levels.

    `wedges(a, b, w)`: simple undirected weighted edges, a < b
    expected, integer weights (the repo's exact-arithmetic convention
    — multiplicities, counts — so the priority compare is exact;
    fractional weights would reintroduce cross-engine float ordering).
    Output as maximal_matching.
    """
    und = wedges.select(
        "a",
        "b",
        F.struct(
            (-F.col("w").cast("long")).alias("nw"),
            hash60_expr(F.concat_ws("|", "a", "b")).alias("h"),
            F.col("a").alias("ta"),
            F.col("b").alias("tb"),
        ).alias("pe"),
    ).localCheckpoint(eager=True)
    return _match_loop(spark, und, max_rounds)


def _match_loop(
    spark: SparkSession, und: DataFrame, max_rounds: int
) -> MatchingResult:
    """Shared local-dominant rounds over (a, b, pe): an edge matches
    when pe is the minimum among all edges at BOTH endpoints."""
    P = max(und.rdd.getNumPartitions(), 1)

    matched: DataFrame | None = None
    metrics: list[dict] = []
    rounds = 0
    # size the many small rounds to the worklist (no-op at scale)
    m0 = und.count()
    with no_aqe(spark), loop_shuffle_partitions(spark, m0):
        for r in range(max_rounds):
            t0 = time.time()
            m = und.count()
            if m == 0:
                break
            rounds = r + 1
            vmin = (
                und.select(F.col("a").alias("v"), "pe")
                .union(und.select(F.col("b").alias("v"), "pe"))
                .groupBy("v")
                .agg(F.min("pe").alias("pmin"))
            )
            winners = (
                und.join(
                    vmin.select(F.col("v").alias("a"), F.col("pmin").alias("pa")),
                    "a",
                )
                .join(
                    vmin.select(F.col("v").alias("b"), F.col("pmin").alias("pb")),
                    "b",
                )
                .filter((F.col("pe") == F.col("pa")) & (F.col("pe") == F.col("pb")))
                .select("a", "b")
                .localCheckpoint(eager=True)
            )
            n_win = winners.count()
            metrics.append(
                {"r": r, "edges": m, "matched": n_win,
                 "wall_sec": time.time() - t0}
            )
            tagged = winners.select(
                "a", "b", F.lit(r).cast("long").alias("match_round")
            )
            matched = tagged.localCheckpoint(eager=True) if matched is None else (
                matched.unionByName(tagged)
                .coalesce(P)
                .localCheckpoint(eager=True)
            )
            used = (
                winners.select(F.col("a").alias("v"))
                .union(winners.select(F.col("b").alias("v")))
                .distinct()
                .localCheckpoint(eager=True)
            )
            und = (
                und.join(used, und.a == used.v, "left_anti")
                .join(used, und.b == used.v, "left_anti")
                .localCheckpoint(eager=True)
            )
        else:
            raise ValueError(
                f"matching still peeling after max_rounds={max_rounds}; "
                "raise max_rounds"
            )

    if matched is None:
        raise ValueError(
            "simple graph has no edges; maximal matching of the edge "
            "universe is empty"
        )
    return MatchingResult(pairs=matched, rounds=rounds, metrics=metrics)


def sql_maximal_matching(rounds: int = 32) -> str:
    """DuckDB twin over the `edges` CTE: the identical fixed-priority
    local-dominant rounds unrolled (MATERIALIZED — plain CTEs inline
    per reference and the round recurrence would expand exponentially,
    see sql_densest_subgraph). rounds=32 is far beyond the O(log m)
    need at oracle scale; tail rounds are empty and idempotent."""
    h = sql_hash60("a || '|' || b")
    parts = [
        f"""
    mm_e0 as materialized (
        select a, b, ({h}, a, b) as pe from (
            select distinct least(src, dst) as a, greatest(src, dst) as b
            from edges where src <> dst))"""
    ]
    for r in range(rounds):
        parts.append(f"""
    mm_vmin{r} as materialized (
        select v, min(pe) as pmin from (
            select a as v, pe from mm_e{r}
            union all select b, pe from mm_e{r}
        ) group by v),
    mm_win{r} as materialized (
        select e.a, e.b from mm_e{r} e
        join mm_vmin{r} va on va.v = e.a
        join mm_vmin{r} vb on vb.v = e.b
        where e.pe = va.pmin and e.pe = vb.pmin),
    mm_used{r} as materialized (
        select a as v from mm_win{r} union select b from mm_win{r}),
    mm_e{r + 1} as materialized (
        select a, b, pe from mm_e{r}
        where a not in (select v from mm_used{r})
          and b not in (select v from mm_used{r}))""")
    members = "\n        union all ".join(
        f"select a, b, {r}::bigint as match_round from mm_win{r}"
        for r in range(rounds)
    )
    parts.append(f"""
    mm_members as ({members})
    select a, b, match_round from mm_members""")
    return ",".join(parts)


def coarsen_graph(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """One coarsening level of the multilevel-partitioner pipeline
    (Karypis & Kumar 1998, METIS; Hendrickson & Leland 1995): contract
    each maximal-matching pair into a supervertex named by its smaller
    endpoint, map every simple undirected edge through the contraction,
    drop the now-internal pair edges, and sum multiplicities.

    Output: sa, sb (supervertex pair, sa<sb), weight (count of merged
    simple edges — exact long). Unmatched vertices map to themselves,
    so iterating this roughly halves the graph per level while edge
    weights preserve total cut structure. One broadcast-sized mate map
    at web scale? No — the map is O(n); it shuffles as an equi-join on
    the vertex key, the same partitioning the matching rounds already
    used.
    """
    mates = maximal_matching(spark, edges).pairs
    vmap = mates.select(
        F.col("a").alias("v"), F.col("a").alias("s")
    ).unionByName(mates.select(F.col("b").alias("v"), F.col("a").alias("s")))
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    mapped = (
        und.join(vmap.withColumnRenamed("v", "a").withColumnRenamed("s", "sa0"),
                 "a", "left")
        .join(vmap.withColumnRenamed("v", "b").withColumnRenamed("s", "sb0"),
              "b", "left")
        .select(
            F.coalesce("sa0", F.col("a")).alias("u"),
            F.coalesce("sb0", F.col("b")).alias("w"),
        )
        .filter(F.col("u") != F.col("w"))
    )
    return (
        mapped.select(
            F.least("u", "w").alias("sa"), F.greatest("u", "w").alias("sb")
        )
        .groupBy("sa", "sb")
        .agg(F.count("*").cast("long").alias("weight"))
    )


def sql_coarsen_graph(rounds: int = 32) -> str:
    """DuckDB twin: the matching CTE chain plus the identical
    contraction (map through mates, drop internal edges, sum)."""
    return (
        sql_maximal_matching(rounds)
        .replace(
            "select a, b, match_round from mm_members",
            """,
    cg_map as (
        select a as v, a as s from mm_members
        union all select b, a from mm_members),
    cg_und as (
        select distinct least(src, dst) as a, greatest(src, dst) as b
        from edges where src <> dst),
    cg_mapped as (
        select coalesce(ma.s, e.a) as u, coalesce(mb.s, e.b) as w
        from cg_und e
        left join cg_map ma on ma.v = e.a
        left join cg_map mb on mb.v = e.b)
    select least(u, w) as sa, greatest(u, w) as sb,
           count(*)::bigint as weight
    from cg_mapped where u <> w
    group by 1, 2""",
        )
    )


def sql_weighted_matching(wedges_sql: str, rounds: int = 32) -> str:
    """DuckDB twin of weighted_matching: identical locally-heaviest
    rounds unrolled over `wedges_sql` (must select a, b, w with a < b;
    see sql_maximal_matching for the unroll discipline)."""
    h = sql_hash60("a || '|' || b")
    parts = [
        f"""
    wm_e0 as materialized (
        select a, b, (-(w::bigint), {h}, a, b) as pe from ({wedges_sql}))"""
    ]
    for r in range(rounds):
        parts.append(f"""
    wm_vmin{r} as materialized (
        select v, min(pe) as pmin from (
            select a as v, pe from wm_e{r}
            union all select b, pe from wm_e{r}
        ) group by v),
    wm_win{r} as materialized (
        select e.a, e.b from wm_e{r} e
        join wm_vmin{r} va on va.v = e.a
        join wm_vmin{r} vb on vb.v = e.b
        where e.pe = va.pmin and e.pe = vb.pmin),
    wm_used{r} as materialized (
        select a as v from wm_win{r} union select b from wm_win{r}),
    wm_e{r + 1} as materialized (
        select a, b, pe from wm_e{r}
        where a not in (select v from wm_used{r})
          and b not in (select v from wm_used{r}))""")
    members = "\n        union all ".join(
        f"select a, b, {r}::bigint as match_round from wm_win{r}"
        for r in range(rounds)
    )
    parts.append(f"""
    wm_members as ({members})
    select a, b, match_round from wm_members""")
    return ",".join(parts)
