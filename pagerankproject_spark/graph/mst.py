"""Minimum spanning forest — Borůvka 1926 (the original O(log n)-round
algorithm and still THE distributed MST: every round each component
picks its lightest outgoing edge, picked edges merge components,
repeat until no outgoing edges remain). Public literature; no
reference implementation (/root/reference/pagerank.py has no MST).
Web-graph use: the MSF of a similarity- or traffic-weighted host graph
is the backbone — single-linkage clustering's dendrogram edges,
the skeleton for visualization/sparsification, and the first stage of
affinity clustering (Bateni et al. 2017 use exactly distributed
Borůvka).

DERANDOMIZED the repo's way: edge priority is
    (w, hash60(a || '|' || b), a, b)
— integer weight first (the repo's exact-arithmetic convention), the
portable md5 hash and the (a, b) pair as total-order tie-breaks,
identical in Spark and DuckDB — so the forest is a PURE FUNCTION of
the weighted edge set (with distinct priorities the MSF is unique:
the cut property applies per component pick), exactly reproducible
and oracle-replayable.

Per outer round: one per-component min over outgoing edges (a
map-side-combinable min(struct) aggregate after relabeling endpoints
by component), then HOOK-AND-JUMP contraction: every active component
hooks to the other endpoint of its pick; because priorities strictly
decrease along hook chains (a neighbor's own min is <= the edge that
reached it), the hook graph's only cycles are mutual-min 2-CYCLES, so
after ceil(log2(C)) + 2 pointer-doubling steps every pointer sits on
its terminal 2-cycle and label = min(p, hook(p)) is the cycle min —
consistent across the whole selection component in O(log C) inner
joins, never O(chain length) (the failure mode of min-label
propagation on a sorted-weight path). The forest depends only on the
component PARTITION, not the label values, so the DuckDB twin may
contract with a recursive reachability closure instead and still
replay the forest exactly. Components at least halve per round:
O(log n) outer rounds.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..session import (
    loop_shuffle_partitions,
    no_aqe,
    reset_stats_checkpoint,
)
from ..text.analysis import hash60_expr, sql_hash60


@dataclass
class MSFResult:
    forest: DataFrame  # a: string, b: string (a<b), w: long, msf_round: long
    components: DataFrame  # url: string, component: string (min url)
    rounds: int
    metrics: list[dict] = field(default_factory=list)


def boruvka_msf(
    spark: SparkSession,
    wedges: DataFrame,
    max_rounds: int = 48,
) -> MSFResult:
    """Minimum spanning forest of the weighted simple undirected graph
    `wedges(a, b, w)` (a < b expected, integer weights — fractional
    weights would reintroduce cross-engine float ordering).

    Output: the forest edges (a, b, w, msf_round — the 0-based round
    the edge was picked) and the final per-vertex component labels
    (identical to connected components of the input). Guarantees
    (pytest-asserted): |forest| = n - #components, forest weight and
    edge set equal the tie-broken-Kruskal replay exactly.
    """
    pe = F.struct(
        F.col("w").cast("long").alias("tw"),
        hash60_expr(F.concat_ws("|", "a", "b")).alias("h"),
        F.col("a").alias("ta"),
        F.col("b").alias("tb"),
    )
    edges = (
        wedges.select("a", "b", F.col("w").cast("long").alias("w"), pe.alias("pe"))
        .transform(reset_stats_checkpoint)
    )
    P = max(edges.rdd.getNumPartitions(), 1)
    comp = (
        edges.select(F.col("a").alias("v"))
        .union(edges.select(F.col("b").alias("v")))
        .distinct()
        .select("v", F.col("v").alias("c"))
        .transform(reset_stats_checkpoint)
    )

    forest: DataFrame | None = None
    metrics: list[dict] = []
    rounds = 0
    # live = edges whose endpoints are in different components,
    # relabeled to (component-a, component-b)
    live = edges.select(
        "a", "b", "w", "pe",
        F.col("a").alias("ca"), F.col("b").alias("cb"),
    ).transform(reset_stats_checkpoint)
    # size the many contraction rounds to the worklist (no-op at scale)
    m0 = live.count()
    with no_aqe(spark), loop_shuffle_partitions(spark, m0):
        for r in range(max_rounds):
            t0 = time.time()
            m = live.count()
            if m == 0:
                break
            rounds = r + 1
            # lightest outgoing edge per ACTIVE component
            payload = F.struct(
                "pe", "a", "b", "w", F.col("ca").alias("xa"), F.col("cb").alias("xb")
            ).alias("cand")
            percomp = (
                live.select(F.col("ca").alias("c"), payload)
                .union(live.select(F.col("cb").alias("c"), payload))
                .groupBy("c")
                .agg(F.min("cand").alias("cand"))
                .transform(reset_stats_checkpoint)
            )
            n_active = percomp.count()
            cmin = percomp.select("cand.a", "cand.b", "cand.w").distinct()
            tagged = cmin.select(
                "a", "b", "w", F.lit(r).cast("long").alias("msf_round")
            )
            forest = tagged.transform(reset_stats_checkpoint) if forest is None else (
                forest.unionByName(tagged).coalesce(P).transform(reset_stats_checkpoint)
            )
            n_pick = tagged.count()
            # hook-and-jump contraction (see module docstring): hook =
            # the other endpoint component of the pick; double until the
            # pointer map reaches its fixpoint (every pointer sits on its
            # terminal 2-cycle — one more doubling changes nothing), the
            # change count riding the checkpoint job as an Observation.
            # ceil(log2(C)) + 2 steps is the guaranteed cap; typical hook
            # chains are far shorter, so fixpoint detection saves most
            # of the per-round fixed job latency.
            hook = percomp.select(
                "c",
                F.when(F.col("cand.xa") == F.col("c"), F.col("cand.xb"))
                .otherwise(F.col("cand.xa"))
                .alias("p"),
            ).transform(reset_stats_checkpoint)
            p = hook
            inner_cap = max(1, (max(n_active, 2) - 1).bit_length() + 2)
            inner_used = 0
            for _ in range(inner_cap):
                obs = Observation()
                stepped = (
                    p.join(
                        p.select(F.col("c").alias("p"), F.col("p").alias("pp")),
                        "p",
                    )
                    .select(
                        "c",
                        F.col("pp").alias("np"),
                        (F.col("pp") != F.col("p")).cast("long").alias("chg"),
                    )
                    .observe(obs, F.sum("chg").alias("chg"))
                )
                p = stepped.select("c", F.col("np").alias("p")).transform(
                    reset_stats_checkpoint
                )
                inner_used += 1
                if not (obs.get["chg"] or 0):
                    break
            lab = (
                p.join(hook.select(F.col("c").alias("p"),
                                   F.col("p").alias("hp")), "p")
                .select("c", F.least("p", "hp").alias("l"))
                .transform(reset_stats_checkpoint)
            )
            # relabel with the per-round DELTA (lab covers exactly the
            # active components — both endpoints of a live edge are
            # active, so the left-join coalesce only fires for comp's
            # settled vertices), never re-deriving from the n-sized map
            delta = lab.filter(F.col("c") != F.col("l"))
            comp = (
                comp.join(delta, "c", "left")
                .select("v", F.coalesce("l", F.col("c")).alias("c"))
                .transform(reset_stats_checkpoint)
            )
            live = (
                live.join(delta.select(F.col("c").alias("ca"),
                                       F.col("l").alias("na")), "ca", "left")
                .join(delta.select(F.col("c").alias("cb"),
                                   F.col("l").alias("nb")), "cb", "left")
                .select(
                    "a", "b", "w", "pe",
                    F.coalesce("na", F.col("ca")).alias("ca"),
                    F.coalesce("nb", F.col("cb")).alias("cb"),
                )
                .filter(F.col("ca") != F.col("cb"))
                .transform(reset_stats_checkpoint)
            )
            metrics.append(
                {"r": r, "live_edges": m, "picked": n_pick,
                 "inner_joins": inner_used, "wall_sec": time.time() - t0}
            )
        else:
            # the range can exhaust on the round that finishes the
            # forest (live-emptiness is only observed at the top of the
            # NEXT iteration) — raise only if edges actually remain
            if live.count() != 0:
                raise ValueError(
                    f"MSF still merging after max_rounds={max_rounds}; "
                    "raise max_rounds"
                )

    if forest is None:
        raise ValueError("weighted graph has no edges; MSF is empty")
    # cycle-min labels are consistent partitions but not minima;
    # one group-min relabel restores the CC output convention
    relabel = comp.groupBy("c").agg(F.min("v").alias("component"))
    components = comp.join(relabel, "c").select(
        F.col("v").alias("url"), "component"
    )
    return MSFResult(
        forest=forest, components=components, rounds=rounds, metrics=metrics
    )


def sql_boruvka_msf(
    wedges_sql: str, rounds: int = 24, with_round: bool = True
) -> str:
    """DuckDB twin over `wedges_sql` (must select a, b, w with a < b):
    the identical priority-ordered Borůvka rounds unrolled
    (MATERIALIZED, see sql_densest_subgraph), each round's contraction
    as a recursive min-label closure over the tiny selection graph.
    rounds=24 covers components halving from ~16M; tail rounds are
    empty and idempotent. with_round=False drops the msf_round column
    from the final projection (the msf_incremental contract key
    compares round-free forests, since append rounds are numbered
    relative to the append, not the cold build)."""
    parts = _sql_boruvka_parts(wedges_sql, rounds)
    members = "\n        union all ".join(
        f"select a, b, w, {r}::bigint as msf_round from bv_pick{r}"
        for r in range(rounds)
    )
    proj = "a, b, w, msf_round" if with_round else "a, b, w"
    parts.append(f"""
    bv_forest as ({members})
    select {proj} from bv_forest""")
    return ",".join(parts)


def sql_affinity_levels(wedges_sql: str, level: int) -> str:
    """DuckDB twin of affinity_levels: the label table after exactly
    `level` unrolled Borůvka rounds (bv_comp{level} is the min-url
    cluster id by induction — round 0 seeds every vertex with itself
    and each contraction takes the min over the merged selection
    component). Independent of the engine's route (one contraction
    over the round-<level forest edges)."""
    parts = _sql_boruvka_parts(wedges_sql, int(level))
    parts.append(f"""
    bv_out as (select v as url, c as cluster from bv_comp{int(level)})
    select url, cluster from bv_out""")
    return ",".join(parts)


def _sql_boruvka_parts(wedges_sql: str, rounds: int) -> list[str]:
    h = sql_hash60("a || '|' || b")
    # NOTE: the priority row is kept FLAT (w, h, a, b) — DuckDB 1.0's
    # min() mis-compares rows that contain a nested row field (verified
    # in-sandbox: min of ((11,big,..),'n10',..) beat a smaller nested
    # hash); every other oracle in the repo already uses flat rows.
    parts = [
        f"""
    bv_e as materialized (
        select a, b, w::bigint as w, {h} as h
        from ({wedges_sql})),
    bv_comp0 as materialized (
        select v, v as c from (
            select a as v from bv_e union select b from bv_e)),
    bv_live0 as materialized (
        select a, b, w, h, a as ca, b as cb from bv_e)"""
    ]
    for r in range(rounds):
        parts.append(f"""
    bv_pick{r} as materialized (
        select distinct cand[3] as a, cand[4] as b, cand[1] as w
        from (
            select c, min(cand) as cand from (
                select ca as c, (w, h, a, b) as cand from bv_live{r}
                union all
                select cb, (w, h, a, b) from bv_live{r}
            ) group by c)),
    bv_lab{r} as materialized (
        with recursive sel as (
            select c1.c as sa, c2.c as sb
            from bv_pick{r} p
            join bv_comp{r} c1 on c1.v = p.a
            join bv_comp{r} c2 on c2.v = p.b
        ),
        ssym as (
            select sa, sb from sel union select sb, sa from sel
        ),
        rr(s, l) as (
            select sa, sa from ssym
            union
            select ssym.sa, rr.l from ssym join rr on rr.s = ssym.sb
        )
        select s, min(l) as l from rr group by s),
    bv_comp{r + 1} as materialized (
        select cm.v, coalesce(lb.l, cm.c) as c
        from bv_comp{r} cm left join bv_lab{r} lb on lb.s = cm.c),
    bv_live{r + 1} as materialized (
        select e.a, e.b, e.w, e.h, c1.c as ca, c2.c as cb
        from bv_live{r} e
        join bv_comp{r + 1} c1 on c1.v = e.a
        join bv_comp{r + 1} c2 on c2.v = e.b
        where c1.c <> c2.c)""")
    return parts


def single_linkage_clusters(
    spark: SparkSession,
    wedges: DataFrame,
    threshold: int,
    msf: MSFResult | None = None,
) -> DataFrame:
    """Single-linkage dendrogram cut at `threshold`: clusters = the
    connected components of {e : w(e) <= threshold} (w is a DISTANCE;
    for similarity weights pass their negation). Kruskal's cut
    property makes the MSF a reusable index for this: the <=t edges of
    the forest induce exactly the same vertex partition as the <=t
    edges of the FULL graph — so one boruvka_msf (m edges) answers
    every threshold afterwards with a contraction over <= n-1 forest
    edges. Contraction reuses the MSF machinery itself (on a forest
    every edge is its own MSF, so only the O(log n) hook-and-jump
    rounds do work). The independent DuckDB twin deliberately takes
    the OTHER route — a reachability closure over the filtered
    original edges — so the two engines cross-verify the cut theorem,
    not just each other's arithmetic.

    Output: (url, cluster) for every vertex of `wedges`; vertices with
    no <=t incident edge are singleton clusters of themselves; cluster
    id is the min url of the cluster (the repo's components
    convention). Pass `msf=` to amortize one forest across cuts.
    """
    res = msf if msf is not None else boruvka_msf(spark, wedges)
    cut = res.forest.filter(F.col("w") <= F.lit(int(threshold)))
    return _cut_components(spark, wedges, cut)


def _cut_components(
    spark: SparkSession, wedges: DataFrame, cut: DataFrame
) -> DataFrame:
    """(url, cluster) for every vertex of `wedges` under the partition
    induced by the `cut` subset of forest edges; vertices incident to
    no cut edge are singletons. Contraction reuses boruvka_msf (on a
    forest every edge is picked, so only the O(log n) hook-and-jump
    rounds do work)."""
    verts = (
        wedges.select(F.col("a").alias("url"))
        .union(wedges.select("b"))
        .distinct()
    )
    if cut.isEmpty():
        return verts.select("url", F.col("url").alias("cluster"))
    sub = boruvka_msf(spark, cut.select("a", "b", "w"))
    return (
        verts.join(
            sub.components.withColumnRenamed("component", "cluster"), "url", "left"
        )
        .select("url", F.coalesce("cluster", F.col("url")).alias("cluster"))
    )


def affinity_levels(
    spark: SparkSession,
    wedges: DataFrame,
    level: int,
    msf: MSFResult | None = None,
) -> DataFrame:
    """Affinity-clustering level cut (Bateni, Behnezhad, Derakhshan,
    Hajiaghayi, Kiveris, Lattanzi, Mirrokni, NeurIPS 2017: distributed
    Boruvka rounds AS the clustering hierarchy): level-k clusters are
    the connected components of the forest edges picked in rounds < k.
    The MSF's `msf_round` column IS the dendrogram level, so any level
    is a contraction over <= n-1 forest edges — same amortization as
    single_linkage_clusters, cut on pick round instead of weight.
    Level 0 = all singletons; level >= rounds = connected components
    of the weighted graph. The DuckDB twin reads the label table after
    exactly `level` unrolled oracle rounds — an independent derivation
    of the same partition (engine: one contraction over the round-<k
    forest edges; oracle: k sequential contractions).

    Output: (url, cluster), cluster = min url (components convention).
    """
    if level < 0:
        raise ValueError("level must be >= 0")
    res = msf if msf is not None else boruvka_msf(spark, wedges)
    cut = res.forest.filter(F.col("msf_round") < F.lit(int(level)))
    return _cut_components(spark, wedges, cut)


def sql_single_linkage(wedges_sql: str, threshold: int) -> str:
    """DuckDB twin: min-label reachability closure over the <=threshold
    edges of the ORIGINAL weighted graph (columns a, b, w), seeded from
    every vertex of the graph so singletons survive. Independent of the
    MSF path by design (see single_linkage_clusters docstring)."""
    return f"""
    sl_w as materialized (select a, b, w from ({wedges_sql})),
    sl_e as materialized (select a, b from sl_w where w <= {int(threshold)}),
    sl_v as (select a as v from sl_w union select b from sl_w),
    sl_pe as (select a as src, b as dst from sl_e
              union all select b, a from sl_e),
    sl_cl as (
        with recursive rr(v, lbl) as (
            select v, v from sl_v
            union
            select sl_pe.dst, rr.lbl from rr join sl_pe on sl_pe.src = rr.v
        )
        select v, min(lbl) as cluster from rr group by v
    )
    select v as url, cluster from sl_cl"""


def msf_append(
    spark: SparkSession,
    forest: DataFrame,
    new_wedges: DataFrame,
) -> MSFResult:
    """Incremental MSF maintenance for a growing crawl: by the
    sparsification property (Eppstein et al. 1997 framing; for distinct
    edge priorities the MSF is unique and MSF(A ∪ B) =
    MSF(MSF(A) ∪ B) — non-forest edges of A are heaviest on some cycle
    and stay non-forest in any supergraph), appending Δ edges re-runs
    Boruvka over old_forest (<= n-1 edges) ∪ Δ: work O(n + Δ),
    independent of the original graph's m. The repo's derandomized
    priority (w, hash60, a, b) is a total order, so the incremental
    forest is EXACTLY the cold-rebuild forest (contract-checked:
    engine = append path, oracle = cold full-graph MSF).

    On a duplicate (a, b) between forest and delta the lighter w wins
    (min — distance semantics; with multiplicity weights pre-aggregate
    the union instead). msf_round in the result refers to the APPEND
    run's rounds, not the original build's.
    """
    merged = (
        forest.select("a", "b", "w")
        .unionByName(new_wedges.select("a", "b", "w"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )
    return boruvka_msf(spark, merged)
