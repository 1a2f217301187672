"""Densest-subgraph extraction — the batched greedy peel of Bahmani,
Kumar & Vassilvitskii 2012 ("Densest subgraph in streaming and
MapReduce", a (2+2ε)-approximation of Charikar 2000's greedy), public
literature; no reference implementation (/root/reference/pagerank.py
has no subgraph mining). Web-mining use: dense bipartite-ish cores are
link farms and emerging communities (Kleinberg trawling; Gibson,
Kumar & Tomkins 2005 use exactly this primitive for spam detection).

Algorithm over the SIMPLE undirected graph, density rho(S) =
|E(S)| / |S|:

  repeat until no edges survive:
    record (n_r, e_r) of the current subgraph;
    remove EVERY vertex with deg(v) <= 2*(1+eps)*e_r/n_r
  answer = the recorded round with maximum density.

Each round strips at least a (2eps-ish) fraction of vertices — always
a constant fraction, because vertices above the threshold number fewer
than n/(1+eps) by the handshake lemma — so the loop is O(log n) rounds
regardless of graph shape: the 100-TB iteration-count story.

Exactness discipline (the repo's integer-moments convention): eps is a
RATIONAL (eps_num/eps_den), so the peel condition is evaluated as
    deg * n * eps_den <= 2 * (eps_den + eps_num) * e
— pure int64 cross-multiplication, no float anywhere in the loop; the
best-round comparison is the strict integer cross-multiply
    e_r * n_best > e_best * n_r
(earliest round wins ties), and the ONLY float in the output is the
final density division of two exact integers — bit-identical
cross-engine. The DuckDB twin replays the identical rounds unrolled.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ingest.edges import GraphTables
from ..session import loop_shuffle_partitions, no_aqe


@dataclass
class DensestSubgraphResult:
    members: DataFrame  # url: string, density: double (same value per row)
    n: int
    e: int
    rounds: int
    metrics: list[dict] = field(default_factory=list)


def densest_subgraph(
    spark: SparkSession,
    g: GraphTables,
    eps_num: int = 1,
    eps_den: int = 2,
    max_rounds: int = 64,
) -> DensestSubgraphResult:
    """Greedy-peel densest subgraph, eps = eps_num/eps_den (default
    1/2: a 3-approximation, threshold deg*n <= 3*e).

    Returns the vertex set of the densest recorded round; `members`
    carries each url with the subgraph's density. Vertices with no
    simple-graph edges are excluded up front (a degree-0 vertex only
    ever dilutes density). Raises on an edgeless simple graph.
    """
    if eps_num < 0 or eps_den <= 0:
        raise ValueError(f"eps must be a nonnegative rational, got {eps_num}/{eps_den}")
    P = g.num_partitions
    e_df = g.weighted_edges.select("src_id", "dst_id").filter(
        F.col("src_id") != F.col("dst_id")
    )
    und = (
        e_df.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        )
        .distinct()
        .repartition(P, "a")
        .localCheckpoint(eager=True)
    )
    alive = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    thr = 2 * (eps_den + eps_num)  # deg * n * eps_den <= thr * e
    best_n = best_e = 0
    best_alive = alive
    metrics: list[dict] = []
    rounds = 0
    with no_aqe(spark), loop_shuffle_partitions(spark, g.num_edges):
        for r in range(max_rounds):
            t0 = time.time()
            n = alive.count()
            e = und.count()
            if e == 0:
                break
            rounds = r + 1
            # integer cross-multiply: e/n > best_e/best_n, earliest wins
            if e * best_n > best_e * n or best_e == 0:
                best_n, best_e, best_alive = n, e, alive
            deg = (
                und.select(F.col("a").alias("v"))
                .union(und.select(F.col("b").alias("v")))
                .groupBy("v")
                .agg(F.count("*").alias("deg"))
            )
            victims = (
                alive.join(deg, "v", "left")
                .filter(
                    F.coalesce(F.col("deg"), F.lit(0)) * F.lit(n) * F.lit(eps_den)
                    <= F.lit(thr) * F.lit(e)
                )
                .select("v")
                .localCheckpoint(eager=True)
            )
            metrics.append(
                {"r": r, "n": n, "e": e, "peeled": victims.count(),
                 "wall_sec": time.time() - t0}
            )
            alive = alive.join(victims, "v", "left_anti").localCheckpoint(eager=True)
            und = (
                und.join(victims, und.a == victims.v, "left_anti")
                .join(victims, und.b == victims.v, "left_anti")
                .localCheckpoint(eager=True)
            )
        else:
            raise ValueError(
                f"peel still running after max_rounds={max_rounds}; "
                "raise max_rounds"
            )

    if best_e == 0:
        raise ValueError("simple graph has no edges; densest subgraph undefined")
    density = best_e / best_n
    members = (
        best_alive.join(g.vertices.select(F.col("id").alias("v"), "url"), "v")
        .select("url", F.lit(density).alias("density"))
    )
    return DensestSubgraphResult(
        members=members, n=best_n, e=best_e, rounds=rounds, metrics=metrics
    )


def sql_densest_subgraph(
    eps_num: int = 1, eps_den: int = 2, rounds: int = 24
) -> str:
    """DuckDB twin over the `edges` CTE (urls): the same integer-exact
    rounds unrolled `rounds` times (each round strips >= a constant
    fraction of vertices, so rounds=24 covers n up to ~1.5^24 ~ 1.7e4
    at the default eps; the contract fixture is far below that — the
    engine's dynamic loop would simply run fewer rounds and the tail
    rounds here are empty and idempotent).

    Density ordering uses double division of int64 counts: exact for
    n below 2^26 (distinct rationals e1/n1 != e2/n2 with n <= 2^26
    differ by >= 1/(n1*n2) > ulp), far above oracle scale; ties break
    to the earliest round like the engine's strict integer compare."""
    thr = 2 * (eps_den + eps_num)
    # every per-round CTE is MATERIALIZED: DuckDB inlines plain CTEs at
    # each reference, and the round recurrence references its
    # predecessors several times — unmaterialized, the expansion is
    # exponential in `rounds` (observed as thousands of parquet scans).
    parts = [
        """
    d0 as materialized (
        select distinct least(src, dst) as a, greatest(src, dst) as b
        from edges where src <> dst),
    a0 as materialized (select a as v from d0 union select b from d0)"""
    ]
    for r in range(rounds):
        parts.append(f"""
    s{r} as materialized (
        select (select count(*) from a{r}) as n,
               (select count(*) from d{r}) as e),
    rem{r} as materialized (
        select av.v from a{r} av
        left join (
            select v, count(*) as deg from (
                select a as v from d{r} union all select b from d{r}
            ) group by 1
        ) dg using (v), s{r} s
        where coalesce(dg.deg, 0) * s.n * {eps_den} <= {thr} * s.e
    ),
    a{r + 1} as materialized (
        select v from a{r}
        where v not in (select v from rem{r})),
    d{r + 1} as materialized (
        select a, b from d{r}
        where a not in (select v from rem{r})
          and b not in (select v from rem{r}))""")
    rounds_union = "\n        union all ".join(
        f"select {r} as r, n, e from s{r}" for r in range(rounds)
    )
    alive_union = "\n        union all ".join(
        f"select {r} as r, v from a{r}" for r in range(rounds)
    )
    parts.append(f"""
    ds_rounds as ({rounds_union}),
    ds_best as (
        select r, n, e from ds_rounds
        where n > 0 and e > 0
        order by e::double / n::double desc, r asc limit 1
    ),
    ds_alive as ({alive_union})
    select av.v as url, (b.e::double / b.n::double) as density
    from ds_best b join ds_alive av on av.r = b.r""")
    return ",".join(parts)
