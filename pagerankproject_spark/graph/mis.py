"""Maximal independent set — Luby's algorithm (Luby 1986, "A simple
parallel algorithm for the maximal independent set problem"), public
literature; no reference implementation (/root/reference/pagerank.py
has no set-system ops). MIS is THE building block of distributed
symmetry breaking: greedy graph coloring, maximal matching, vertex
cover, and cluster-head election (e.g. affinity clustering) all reduce
to it, so an engine claiming distributed-graph completeness needs it.

Luby's round, DERANDOMIZED the repo's way: instead of fresh randomness
per round, every vertex carries the fixed priority
    (hash60(url), url)
— the portable md5-derived 60-bit integer with the url itself as the
total-order tie-break, identical in Spark and DuckDB. A vertex joins
the MIS when its priority is a local minimum among ALIVE neighbors
(vertices with no alive neighbor join unconditionally); winners and
their neighbors leave the graph; repeat until empty. Fixed priorities
keep the O(log n)-round behavior on non-adversarial graphs (this is
the standard "random-permutation" variant of Luby — one global random
order, here a hash order — whose round count is O(log n) w.h.p. over
the hash; Blelloch, Fineman & Shun 2012 analyze exactly this variant)
and make the output a pure function of the edge set: exactly
reproducible, oracle-replayable, resumable.

Per round: one neighbor-min aggregate (map-side-combinable min of a
(hash, url) struct), one join back, two anti-joins to shrink the
graph — all equi-joins on url keys. The MIS log accumulates with a
coalesce(P) before each checkpoint (see
[[spark-iterative-loop-pitfalls]] in-repo: union concatenates
partition sets).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import loop_shuffle_partitions, no_aqe
from ..text.analysis import hash60_expr, sql_hash60


@dataclass
class MISResult:
    members: DataFrame  # url: string, mis_round: long
    rounds: int
    metrics: list[dict] = field(default_factory=list)


def luby_mis(
    spark: SparkSession,
    edges: DataFrame | None = None,
    max_rounds: int = 64,
    g=None,
) -> MISResult:
    """Maximal independent set of the simple undirected graph of
    `edges(src, dst)` (self-loops dropped, directions merged).

    Output: url, mis_round (the 0-based round the vertex entered the
    set). Guarantees (pytest-asserted): no two members are adjacent
    (independence); every non-member has a member neighbor
    (maximality). Vertices with no simple-graph edge are not part of
    the input universe (same convention as kcore/densest_subgraph);
    they are trivially independent and callers can union them in.

    Pass `g` (GraphTables) instead of `edges` to run the loop in
    DENSE-ID key space — the hyperball/betweenness/walks lever
    (BENCH.md: ~2x from 8-byte join keys): per-round joins key on
    longs, while the exact (hash60(url), url) priority is computed
    ONCE into a payload struct, so the member set and round numbers
    are BIT-IDENTICAL to the url-space path (tested); urls translate
    back once at emit.
    """
    if (edges is None) == (g is None):
        raise ValueError("pass exactly one of edges= or g=")
    if g is not None:
        from ..ingest.edges import simple_edges

        e = simple_edges(g)
        und = e.select(
            F.least("src_id", "dst_id").alias("a"),
            F.greatest("src_id", "dst_id").alias("b"),
        ).distinct()
        pri_tbl = g.vertices.select(
            F.col("id").alias("v"),
            F.struct(
                hash60_expr(F.col("url")).alias("h"), F.col("url").alias("u")
            ).alias("p"),
        )
    else:
        und = (
            edges.filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
            )
            .distinct()
        )
        pri_tbl = None
    sym = (
        und.select(F.col("a").alias("w"), F.col("b").alias("x"))
        .union(und.select(F.col("b").alias("w"), F.col("a").alias("x")))
        .localCheckpoint(eager=True)
    )
    P = max(sym.rdd.getNumPartitions(), 1)
    alive = sym.select(F.col("w").alias("v")).distinct().localCheckpoint(eager=True)
    if pri_tbl is not None:
        # dense-id mode: freeze the (hash, url) priority payload once
        pri_all = alive.join(pri_tbl, "v").localCheckpoint(eager=True)

    mis: DataFrame | None = None
    metrics: list[dict] = []
    rounds = 0
    # size the many small rounds to the worklist (no-op at scale)
    m_sym = sym.count()
    with no_aqe(spark), loop_shuffle_partitions(spark, m_sym):
        for r in range(max_rounds):
            t0 = time.time()
            n = alive.count()
            if n == 0:
                break
            rounds = r + 1
            if pri_tbl is not None:
                pri = alive.join(pri_all, "v")
            else:
                pri = alive.select(
                    "v",
                    F.struct(
                        hash60_expr(F.col("v")).alias("h"), F.col("v").alias("u")
                    ).alias("p"),
                )
            nbr_min = (
                sym.join(pri.select(F.col("v").alias("x"), F.col("p").alias("px")), "x")
                .groupBy("w")
                .agg(F.min("px").alias("pmin"))
            )
            winners = (
                pri.join(nbr_min.withColumnRenamed("w", "v"), "v", "left")
                .filter(F.col("pmin").isNull() | (F.col("p") < F.col("pmin")))
                .select("v")
                .localCheckpoint(eager=True)
            )
            n_win = winners.count()
            metrics.append({"r": r, "alive": n, "winners": n_win,
                            "wall_sec": time.time() - t0})
            tagged = winners.select("v", F.lit(r).cast("long").alias("mis_round"))
            mis = tagged if mis is None else (
                mis.unionByName(tagged).coalesce(P).localCheckpoint(eager=True)
            )
            dead_nbrs = (
                sym.join(winners.withColumnRenamed("v", "w"), "w", "left_semi")
                .select(F.col("x").alias("v"))
                .distinct()
            )
            removed = winners.unionByName(dead_nbrs).distinct().localCheckpoint(
                eager=True
            )
            alive = alive.join(removed, "v", "left_anti").localCheckpoint(eager=True)
            sym = (
                sym.join(removed, sym.w == removed.v, "left_anti")
                .join(removed, sym.x == removed.v, "left_anti")
                .localCheckpoint(eager=True)
            )
        else:
            raise ValueError(
                f"MIS still peeling after max_rounds={max_rounds}; raise max_rounds"
            )

    if mis is None:
        raise ValueError("simple graph has no edges; MIS of the edge universe is empty")
    if pri_tbl is not None:
        members = mis.join(
            g.vertices.select(F.col("id").alias("v"), "url"), "v"
        ).select("url", "mis_round")
    else:
        members = mis.withColumnRenamed("v", "url")
    return MISResult(members=members, rounds=rounds, metrics=metrics)


def sql_luby_mis(rounds: int = 24) -> str:
    """DuckDB twin over the `edges` CTE: the identical fixed-priority
    rounds unrolled (MATERIALIZED — plain CTEs inline per reference and
    the recurrence would expand exponentially, see sql_densest_subgraph).
    rounds=24 is far beyond the O(log n) need at oracle scale; tail
    rounds are empty and idempotent."""
    h = sql_hash60("v")
    parts = [
        f"""
    m_und as materialized (
        select distinct least(src, dst) as a, greatest(src, dst) as b
        from edges where src <> dst),
    m_sym0 as materialized (
        select a as w, b as x from m_und union all select b, a from m_und),
    m_alive0 as materialized (select distinct w as v from m_sym0),
    m_pri as materialized (
        select v, {h} as h from m_alive0)"""
    ]
    for r in range(rounds):
        parts.append(f"""
    m_win{r} as materialized (
        select av.v from m_alive{r} av
        join m_pri p using (v)
        left join (
            select s.w, min((p2.h, p2.v)) as pmin
            from m_sym{r} s
            join m_pri p2 on p2.v = s.x
            where s.x in (select v from m_alive{r})
            group by s.w
        ) nm on nm.w = av.v
        where nm.pmin is null or (p.h, p.v) < nm.pmin
    ),
    m_rem{r} as materialized (
        select v from m_win{r}
        union
        select s.x as v from m_sym{r} s
        where s.w in (select v from m_win{r})
    ),
    m_alive{r + 1} as materialized (
        select v from m_alive{r}
        where v not in (select v from m_rem{r})),
    m_sym{r + 1} as materialized (
        select w, x from m_sym{r}
        where w not in (select v from m_rem{r})
          and x not in (select v from m_rem{r}))""")
    members = "\n        union all ".join(
        f"select v as url, {r}::bigint as mis_round from m_win{r}"
        for r in range(rounds)
    )
    parts.append(f"""
    m_members as ({members})
    select url, mis_round from m_members""")
    return ",".join(parts)
