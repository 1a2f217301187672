"""Louvain local-moving pass (Blondel, Guillaume, Lambiotte & Lefebvre
2008, "Fast unfolding of communities in large networks" — public).

The engine's third community-detection operator, complementing LPA
(most-frequent-neighbor labels, no objective) and the modularity
metric (graph/metrics.py): a synchronous, parity-gated round of
Blondel et al.'s phase-1 local moves — every vertex greedily joins the
neighboring community with the largest modularity gain. Design choices
that make the distributed pass deterministic AND oracle-checkable:

* **Integer gain arithmetic.** On the symmetrized multigraph with
  integer weights, the modularity gain of moving u into community c
  (after removal from its own) is proportional to

      gain(u, c) = 2m * k_in(u, c) - k_u * tot(c \\ u)

  with 2m = total symmetrized weight, k_in = weight from u into c,
  k_u = u's weighted degree, tot = sum of member degrees. All int64 —
  gains compare EXACTLY, no float argmax ambiguity (overflows only
  past ~3e9 total weight x degree; raise the scale by sampling or
  switching the comparison to float128 off-engine before that).
* **Synchronous parity gating.** Only vertices with (v + round) % 2
  == 0 may move in a round — the classic two-coloring guard against
  the synchronous swap oscillation (Prat-Perez et al.). Two rounds =
  one full sweep.
* **Cross-engine vertex numbering.** Tie-breaks (min community label
  on equal gain) and the parity gate must agree with the DuckDB
  oracle, but GraphTables ids are hash-partition-dependent. The pass
  numbers vertices by GLOBAL URL-SORT RANK — a one-time
  repartitionByRange + per-partition row_number + offset pass (no
  single-partition window) that the oracle reproduces exactly as
  row_number() over (order by url).
* **Strict-improvement moves.** A vertex moves only when the best
  candidate STRICTLY beats staying; equal-gain candidates tie-break
  to the smallest label. Fixed `rounds` (no early-stop) replays
  identically in the oracle (oracle/recursive_sql.py::sql_louvain).

Per-round cost is LPA-shaped: ONE edge-scan join against the label
table (parity pre-filtered arithmetically, so each round scans half
the symmetrized edges) plus grouped integer aggregations. The label
state carries the static weighted degree so no round re-joins it, the
stay-gain and the argmax ride the same aggregate (no pick-vs-stay
join), lineage is truncated per round, and the move count rides the
localCheckpoint as an Observation — one Spark job per round.
Self-loops are dropped (standard phase-1 treatment of the input
graph); parallel links count as weight.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from ..ingest.edges import GraphTables
from ..session import loop_shuffle_partitions, no_aqe


@dataclass
class LouvainResult:
    communities: DataFrame  # url: string, community: string (min url)
    rounds: int
    metrics: list[dict] = field(default_factory=list)


def _url_rank_ids(
    spark: SparkSession, vertices: DataFrame, num_partitions: int
) -> DataFrame:
    """(url, v) with v = global url-sort rank in [0, n) — distributed:
    range-partition by url, row_number inside each sorted partition,
    add collected per-partition offsets (num_partitions scalars). The
    sampled range boundaries are nondeterministic but the produced
    rank is the exact url order regardless of where the cuts fall."""
    parts = (
        vertices.select("url")
        .repartitionByRange(num_partitions, "url")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in parts.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    offset_df = spark.createDataFrame(offsets, "pid int, offset long")
    w = Window.partitionBy("pid").orderBy("url")
    return (
        parts.withColumn("rn", F.row_number().over(w).cast("long") - 1)
        .join(F.broadcast(offset_df), "pid")
        .select("url", (F.col("rn") + F.col("offset")).alias("v"))
    )


def _move_rounds(
    spark: SparkSession,
    sym: DataFrame,
    lab: DataFrame,
    m2: int,
    P: int,
    rounds: int,
    metrics: list[dict],
) -> DataFrame:
    """`rounds` parity-gated synchronous local-moving rounds over a
    weighted graph. `sym` is (u, v, w) symmetric and MAY carry diagonal
    rows (u == v, the coarse graph's 2x-intra self-loop weight): the
    diagonal feeds the degree k (carried in `lab`) but is excluded from
    every k_in — a vertex's self-weight moves with it, adding the same
    constant to every candidate's gain, so it cancels in the argmax.
    `lab` is the checkpointed (v, lbl, k) state; returns the state
    after the final round (checkpointed)."""
    # size the fixed-round stages to the working set (no-op at scale)
    m_sym = sym.count()
    with no_aqe(spark), loop_shuffle_partitions(spark, m_sym):
        for r in range(rounds):
            t0 = time.time()
            # the label state carries (v, lbl, k) — tot, the mover set,
            # and the gain's k term all read it directly; the parity
            # gate is an ARITHMETIC filter (on lab and on the edge
            # scan's u side), never a join.
            tot = lab.groupBy("lbl").agg(F.sum("k").alias("tot"))
            mv = lab.filter((F.col("v") + F.lit(r)) % 2 == 0).select(
                F.col("v").alias("u"), F.col("lbl").alias("own"), "k"
            )
            nbr = (
                sym.filter(
                    ((F.col("u") + F.lit(r)) % 2 == 0)
                    & (F.col("u") != F.col("v"))
                )
                .join(
                    lab.select(F.col("v").alias("nv"), F.col("lbl").alias("c")),
                    sym.v == F.col("nv"),
                )
                .select("u", "c", "w")
            )
            kin = (
                nbr.union(
                    mv.select(
                        "u",
                        F.col("own").alias("c"),
                        F.lit(0).cast("long").alias("w"),
                    )
                )
                .groupBy("u", "c")
                .agg(F.sum("w").alias("kin"))
            )
            cand = (
                kin.join(mv, "u")
                .join(tot.withColumnRenamed("lbl", "c"), "c")
                .select(
                    "u",
                    "own",
                    "c",
                    (
                        F.lit(m2) * F.col("kin")
                        - F.col("k")
                        * (
                            F.col("tot")
                            - F.when(
                                F.col("c") == F.col("own"), F.col("k")
                            ).otherwise(F.lit(0))
                        )
                    ).alias("gain"),
                )
            )
            # stay-gain rides the same aggregate as the argmax: the
            # union above guarantees the own-community row exists, so
            # sg is never null and no pick-vs-stay join is needed.
            pick = cand.groupBy("u").agg(
                F.max(F.struct(F.col("gain"), (-F.col("c")).alias("negc"))).alias(
                    "best"
                ),
                F.max(
                    F.when(F.col("c") == F.col("own"), F.col("gain"))
                ).alias("sg"),
                F.min("own").alias("own"),
            )
            moves = pick.select(
                F.col("u").alias("v"),
                F.when(F.col("best.gain") > F.col("sg"), -F.col("best.negc"))
                .otherwise(F.col("own"))
                .alias("newlbl"),
            )
            obs = Observation()
            staged = (
                lab.join(moves, "v", "left")
                .select(
                    "v",
                    F.coalesce("newlbl", F.col("lbl")).alias("lbl"),
                    "k",
                    (
                        F.coalesce("newlbl", F.col("lbl")) != F.col("lbl")
                    ).cast("int").alias("chg"),
                )
                .observe(obs, F.sum("chg").alias("c"))
                .select("v", "lbl", "k")
                .repartition(P, "v")
            )
            lab = staged.localCheckpoint(eager=True)
            metrics.append(
                {
                    "i": r,
                    "moved": int(obs.get["c"] or 0),
                    "wall_sec": time.time() - t0,
                }
            )
    return lab


def _init_lab(rid_or_ids: DataFrame, deg: DataFrame, P: int) -> DataFrame:
    """(v, lbl=v, k) singleton state; k=0 for vertices absent from deg."""
    return (
        rid_or_ids.join(deg.select(F.col("u").alias("v"), "k"), "v", "left")
        .select(
            "v",
            F.col("v").alias("lbl"),
            F.coalesce("k", F.lit(0)).cast("long").alias("k"),
        )
        .repartition(P, "v")
        .localCheckpoint(eager=True)
    )


def louvain(
    spark: SparkSession,
    g: GraphTables,
    rounds: int = 6,
) -> LouvainResult:
    """One Louvain local-moving phase: `rounds` parity-gated synchronous
    move rounds from singleton communities. Returns (url, community)
    with community = the minimum url of the final group."""
    P = g.num_partitions
    rid = _url_rank_ids(spark, g.vertices, P).persist()

    vmap = g.vertices.join(rid, "url").select("id", "v")
    e = (
        g.weighted_edges.select("src_id", "dst_id")
        .join(vmap.select(F.col("id").alias("src_id"), F.col("v").alias("u")), "src_id")
        .join(vmap.select(F.col("id").alias("dst_id"), F.col("v").alias("v")), "dst_id")
        .filter(F.col("u") != F.col("v"))
        .select("u", "v")
    )
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("w"))
        .repartition(P, "u")
        .persist()
    )
    deg = sym.groupBy("u").agg(F.sum("w").alias("k")).persist()
    m2 = deg.agg(F.sum("k")).first()[0] or 0
    if m2 == 0:
        raise ValueError("graph has no non-loop edges; Louvain undefined")

    metrics: list[dict] = []
    lab = _init_lab(rid.select("v"), deg, P)
    lab = _move_rounds(spark, sym, lab, m2, P, rounds, metrics)

    rep = (
        lab.join(rid, lab.v == rid.v)
        .groupBy("lbl")
        .agg(F.min("url").alias("community"))
    )
    out = (
        lab.join(rid, lab.v == rid.v)
        .join(rep, "lbl")
        .select("url", "community")
        .localCheckpoint(eager=True)
    )
    for df in (rid, sym, deg):
        df.unpersist()
    return LouvainResult(communities=out, rounds=rounds, metrics=metrics)


@dataclass
class LouvainMultilevelResult:
    communities: DataFrame  # url: string, community: string (min url)
    levels: int
    rounds_per_level: int
    metrics: list[list[dict]] = field(default_factory=list)


def louvain_multilevel(
    spark: SparkSession,
    g: GraphTables,
    rounds_per_level: int = 4,
    levels: int = 2,
) -> LouvainMultilevelResult:
    """Full multi-level Louvain (Blondel et al. 2008 phases 1+2): run
    the local-moving pass, contract each community to a supernode, and
    repeat on the coarse graph.

    The coarse graph is built by ONE relabel-and-sum over the
    symmetrized weight table: inter-community rows keep both
    directions, and intra-community rows collapse onto the diagonal —
    since the symmetric table counts each undirected edge twice, the
    diagonal lands at exactly the standard 2x-intra self-loop weight.
    Coarse vertex ids ARE the phase-1 labels (deterministic integers
    in [0, n)), so the parity gate and min-label tie-breaks replay
    identically in the DuckDB oracle; total weight 2m is invariant
    under contraction, so the integer gain arithmetic carries over
    unchanged. Communities that end a level isolated (no external
    edges) enter the next level with k = their self-loop weight and
    never move — they are preserved through the final composition.

    Cost: each level is `rounds_per_level` jobs over a graph no larger
    than the previous level's community count — phase 2 onward is
    usually negligible next to phase 1."""
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    P = g.num_partitions
    rid = _url_rank_ids(spark, g.vertices, P).persist()

    vmap = g.vertices.join(rid, "url").select("id", "v")
    e = (
        g.weighted_edges.select("src_id", "dst_id")
        .join(vmap.select(F.col("id").alias("src_id"), F.col("v").alias("u")), "src_id")
        .join(vmap.select(F.col("id").alias("dst_id"), F.col("v").alias("v")), "dst_id")
        .filter(F.col("u") != F.col("v"))
        .select("u", "v")
    )
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("w"))
        .repartition(P, "u")
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("u").agg(F.sum("w").alias("k"))
    m2 = deg.agg(F.sum("k")).first()[0] or 0
    if m2 == 0:
        raise ValueError("graph has no non-loop edges; Louvain undefined")

    all_metrics: list[list[dict]] = []
    # mapping from ORIGINAL vertex v to its current community label;
    # refined (composed) after every level.
    mapping = rid.select("v", F.col("v").alias("lbl")).repartition(P, "v")
    for lvl in range(levels):
        metrics: list[dict] = []
        lab = _init_lab(
            mapping.select(F.col("lbl").alias("v")).distinct(), deg, P
        )
        lab = _move_rounds(spark, sym, lab, m2, P, rounds_per_level, metrics)
        all_metrics.append(metrics)
        mapping = (
            mapping.join(
                lab.select(F.col("v").alias("lbl"), F.col("lbl").alias("nl")),
                "lbl",
            )
            .select("v", F.col("nl").alias("lbl"))
            .repartition(P, "v")
            .localCheckpoint(eager=True)
        )
        if lvl == levels - 1:
            break
        # contract: relabel both endpoints and sum — diagonal rows are
        # the 2x-intra self-loops (symmetric table counts edges twice).
        lv_u = lab.select(F.col("v").alias("u"), F.col("lbl").alias("lu"))
        lv_v = lab.select(F.col("v").alias("v"), F.col("lbl").alias("lv"))
        sym = (
            sym.join(lv_u, "u")
            .join(lv_v, "v")
            .groupBy(F.col("lu").alias("u"), F.col("lv").alias("v"))
            .agg(F.sum("w").alias("w"))
            .repartition(P, "u")
            .localCheckpoint(eager=True)
        )
        deg = sym.groupBy("u").agg(F.sum("w").alias("k"))

    rep = (
        mapping.join(rid, "v")
        .groupBy("lbl")
        .agg(F.min("url").alias("community"))
    )
    out = (
        mapping.join(rid, "v")
        .join(rep, "lbl")
        .select("url", "community")
        .localCheckpoint(eager=True)
    )
    rid.unpersist()
    return LouvainMultilevelResult(
        communities=out,
        levels=levels,
        rounds_per_level=rounds_per_level,
        metrics=all_metrics,
    )


def leiden_communities(
    spark: SparkSession,
    g: GraphTables,
    rounds: int = 4,
    refine_rounds: int = 3,
) -> LouvainResult:
    """Leiden-style refinement (Traag, Waltman & van Eck 2019, "From
    Louvain to Leiden: guaranteeing well-connected communities" —
    public) in the repo's deterministic fixed-round form: one Louvain
    local-moving phase, then CONSTRAINED local moves from singletons on
    the intra-community subgraph — the refinement pass that splits a
    badly-connected Louvain community into its well-connected parts
    (Louvain alone can glue parts that are only connected through a
    vertex that has since moved away; the paper's fig. 2 pathology).

    Simplified vs the paper, chosen for exact oracle replay: the
    refinement reuses the SAME parity-gated strict-improvement integer
    move rule (graph/louvain.py::_move_rounds) on the constrained
    subgraph with the subgraph's own degrees and 2m, rather than the
    paper's randomized merge rule. Refined communities are exact
    sub-partitions of the Louvain phase: the edge filter keeps only
    intra-community edges, so by induction every refinement community
    is cons-pure (a vertex can only ever join a community reached
    through a same-community neighbor).

    Output: (url, community) with community = min url of the REFINED
    group. Determinism: both phases are pure functions of the edge set
    (url-sort-rank ids, parity gates, min-label ties), replayed exactly
    by oracle/recursive_sql.py::sql_leiden.
    """
    P = g.num_partitions
    rid = _url_rank_ids(spark, g.vertices, P).persist()

    vmap = g.vertices.join(rid, "url").select("id", "v")
    e = (
        g.weighted_edges.select("src_id", "dst_id")
        .join(vmap.select(F.col("id").alias("src_id"), F.col("v").alias("u")), "src_id")
        .join(vmap.select(F.col("id").alias("dst_id"), F.col("v").alias("v")), "dst_id")
        .filter(F.col("u") != F.col("v"))
        .select("u", "v")
    )
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("w"))
        .repartition(P, "u")
        .persist()
    )
    deg = sym.groupBy("u").agg(F.sum("w").alias("k")).persist()
    m2 = deg.agg(F.sum("k")).first()[0] or 0
    if m2 == 0:
        raise ValueError("graph has no non-loop edges; Leiden undefined")

    metrics: list[dict] = []
    labA = _move_rounds(
        spark, sym, _init_lab(rid.select("v"), deg, P), m2, P, rounds, metrics
    )

    # constrained subgraph: only edges INSIDE a phase-A community
    cons = labA.select("v", F.col("lbl").alias("cons")).localCheckpoint(
        eager=True
    )
    sym_c = (
        sym.join(
            cons.select(F.col("v").alias("u"), F.col("cons").alias("cu")), "u"
        )
        .join(cons.select("v", F.col("cons").alias("cv")), "v")
        .filter(F.col("cu") == F.col("cv"))
        .select("u", "v", "w")
        .repartition(P, "u")
        .persist()
    )
    deg_c = sym_c.groupBy("u").agg(F.sum("w").alias("k")).persist()
    m2_c = deg_c.agg(F.sum("k")).first()[0] or 0

    lab2 = _init_lab(rid.select("v"), deg_c, P)
    if m2_c > 0 and refine_rounds > 0:
        lab2 = _move_rounds(
            spark, sym_c, lab2, m2_c, P, refine_rounds, metrics
        )

    rep = (
        lab2.join(rid, lab2.v == rid.v)
        .groupBy("lbl")
        .agg(F.min("url").alias("community"))
    )
    out = (
        lab2.join(rid, lab2.v == rid.v)
        .join(rep, "lbl")
        .select("url", "community")
        .localCheckpoint(eager=True)
    )
    for df in (rid, sym, deg, sym_c, deg_c):
        df.unpersist()
    return LouvainResult(
        communities=out, rounds=rounds + refine_rounds, metrics=metrics
    )
