"""Functional-graph rooting via pointer doubling — the Wyllie 1979 /
JáJá list-ranking primitive (public literature; no reference
implementation — /root/reference/pagerank.py has no pointer ops). Web
use: redirect/alias canonicalization. A redirect (or rel=canonical,
or mirror) map is a FUNCTIONAL graph — every url has exactly one
successor — and resolving "where does this url ultimately land" means
following chains that can be thousands of hops (and, in crawled data,
can close into cycles). Following them one hop per Spark job is
O(chain length) rounds; pointer doubling halves the remaining distance
every round, so resolution is O(log n) rounds — the distributed
path-compression story.

Semantics: canonical(v) = min url over {v} ∪ the forward orbit of v
(the chain and, if it ends in a cycle, the whole cycle). On an acyclic
chain this is the terminal iff the terminal is the orbit minimum; with
the min-convention the output is total, deterministic, and well-defined
EVEN ON CYCLES (every member of a cycle gets the same canonical — the
cycle's min — so the operator doubles as redirect-loop detection:
v != canonical(v) with canonical(canonical(v)) == canonical(v)).

Round state per vertex: (pointer p, running min m). One self-join per
round computes p <- p∘p and m <- min(m, m[p]) — after k rounds m
covers the first 2^k orbit steps, so m stabilizes at the orbit min in
ceil(log2(orbit)) rounds; convergence is the changed-count riding the
round (one job per round). DuckDB twin: the orbit as a recursive
union-distinct (cycle-safe), then min per vertex.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import loop_shuffle_partitions, no_aqe, reset_stats_checkpoint


@dataclass
class RootingResult:
    canonical: DataFrame  # url: string, canonical: string
    rounds: int
    metrics: list[dict] = field(default_factory=list)


def functional_rooting(
    spark: SparkSession,
    pointers: DataFrame,
    max_rounds: int = 64,
) -> RootingResult:
    """Resolve `pointers(v, nxt)` — a functional map, at most one nxt
    per v (raises otherwise); vertices appearing only as targets get a
    self-pointer — to canonical(v) = min url of {v} ∪ forward orbit.

    Work per round is one equi-join + one projection over n rows;
    rounds = ceil(log2(longest orbit)) + 1, verified by the metrics
    list (pytest pins a 1000-hop chain to <= 11 doubling rounds).
    """
    dup = (
        pointers.groupBy("v").agg(F.count("*").alias("c")).filter("c > 1")
    )
    if not dup.isEmpty():
        raise ValueError("pointers is not functional: a v has multiple nxt")
    sinks = (
        pointers.select(F.col("nxt").alias("v"))
        .distinct()
        .join(pointers.select("v"), "v", "left_anti")
        .select("v", F.col("v").alias("nxt"))
    )
    state = (
        pointers.select("v", "nxt").unionByName(sinks)
        .select("v", F.col("nxt").alias("p"), F.least("v", "nxt").alias("m"))
        .transform(reset_stats_checkpoint)
    )
    metrics: list[dict] = []
    rounds = 0
    # size the doubling rounds to the pointer table (no-op at scale)
    n_state = state.count()
    with no_aqe(spark), loop_shuffle_partitions(spark, n_state):
        for r in range(max_rounds):
            t0 = time.time()
            rounds = r + 1
            hop = state.select(
                F.col("v").alias("p"), F.col("p").alias("pp"), F.col("m").alias("mp")
            )
            nxt_state = (
                state.join(hop, "p")
                .select(
                    "v",
                    F.col("pp").alias("p"),
                    F.least("m", "mp").alias("m"),
                    (F.col("m") != F.least("m", "mp")).cast("long").alias("chg"),
                )
            ).transform(reset_stats_checkpoint)
            changed = nxt_state.agg(F.sum("chg")).collect()[0][0] or 0
            metrics.append(
                {"r": r, "changed": int(changed), "wall_sec": time.time() - t0}
            )
            state = nxt_state.select("v", "p", "m")
            if changed == 0:
                break
        else:
            raise ValueError(
                f"rooting still changing after max_rounds={max_rounds}; "
                "raise max_rounds"
            )

    return RootingResult(
        canonical=state.select(F.col("v").alias("url"), F.col("m").alias("canonical")),
        rounds=rounds,
        metrics=metrics,
    )


def sql_functional_rooting(pointers_sql: str) -> str:
    """DuckDB twin: the forward orbit as a recursive union-distinct
    (cycle-safe — revisited (v, cur) pairs dedup), then min over
    {v} ∪ orbit. `pointers_sql` must select (v, nxt)."""
    return f"""
fr_ptr0 as ({pointers_sql}),
fr_ptr as (
    select v, nxt from fr_ptr0
    union all
    select t.v, t.v from (
        select distinct nxt as v from fr_ptr0
        where nxt not in (select v from fr_ptr0)
    ) t
),
fr_orbit as (
    with recursive o(v, cur) as (
        select v, v from fr_ptr
        union
        select o.v, p.nxt from o join fr_ptr p on p.v = o.cur
    )
    select v, cur from o
)
select v as url, min(cur) as canonical from fr_orbit group by v"""
