"""Bow-tie decomposition of the web link graph (Broder et al. 2000,
"Graph structure in the Web") — engine-added directed-graph operator,
companion of graph/scc.py (no SURVEY §2 number; the reference computes
only PageRank, reference pagerank.py:1-343).

Classifies every vertex into the seven classic regions relative to the
largest strongly connected component:

  CORE         the largest SCC (ties broken by minimum component label,
               i.e. minimum url — fully deterministic)
  IN           reaches CORE, not in CORE
  OUT          reachable from CORE, not in CORE
  TUBE         on an IN -> OUT path that avoids CORE: reachable from IN
               AND reaches OUT, not in CORE/IN/OUT (any such vertex
               avoids CORE automatically — reaching CORE would make it
               IN, being reached from CORE would make it OUT)
  TENDRIL_IN   reachable from IN only (hangs off IN)
  TENDRIL_OUT  reaches OUT only (leads into OUT)
  DISC         none of the above (disconnected from the bow-tie)

Dataflow: one exact SCC run (graph/scc.py FW-BW-Trim) to find CORE,
then four frontier-restricted multi-source reachability sweeps — FWD
from CORE, BWD to CORE, FWD from IN, BWD from OUT — each the directed
flag-only variant of bfs_distances' frontier loop (graph/kcore.py:114):
per round only last round's newly-reached ids join the edge table, one
Spark job per round (changed-count rides an Observation on the
localCheckpoint), so total join work per sweep is O(edges). The forward
and reversed edge tables are each partitioned by their join key and
persisted once, shared across the two sweeps in that direction.

Scale notes (100 TB): the sweeps shuffle 8-byte ids with a distinct
(map-side-combinable) per round; the only driver-side data is the
1-row largest-SCC pick. Web graphs have ~O(log n) effective diameter,
so round counts stay small; `max_iterations` fail-fast guards the
pathological chain case rather than silently misclassifying.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..ingest.edges import GraphTables
from ..session import no_aqe
from .scc import strongly_connected_components

REGIONS = ("CORE", "IN", "OUT", "TUBE", "TENDRIL_IN", "TENDRIL_OUT", "DISC")


@dataclass
class BowtieResult:
    regions: DataFrame  # url: string, region: string (one of REGIONS)
    core_label: str  # min url of the largest SCC
    sweeps: int  # total reachability rounds across the four sweeps
    metrics: list[dict] = field(default_factory=list)


def _reach(
    spark: SparkSession,
    edges: DataFrame,  # src_id, dst_id — partitioned by src_id, persisted
    seeds: DataFrame,  # id
    P: int,
    max_iterations: int,
    metrics: list[dict],
    tag: str,
) -> DataFrame:
    """Ids reachable from `seeds` (seeds included) along edge direction.

    Frontier-restricted: a vertex joins the edge scan only the round it
    is first reached (`nw` flag), exactly bfs_distances' loop minus the
    distance column. One Spark job per round."""
    reached = (
        seeds.select("id", F.lit(1).alias("nw"))
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )
    with no_aqe(spark):
        for it in range(max_iterations):
            t0 = time.time()
            frontier = reached.filter(F.col("nw") == 1).select("id")
            cand = (
                edges.join(frontier, edges.src_id == frontier.id)
                .select(F.col("dst_id").alias("id"))
                .distinct()
                .join(reached, "id", "left_anti")
            )
            obs = Observation()
            staged = (
                reached.select("id", F.lit(0).alias("nw"))
                .union(cand.select("id", F.lit(1).alias("nw")))
                .observe(obs, F.sum("nw").alias("c"))
                # narrow merge: union concatenates partition sets; see
                # the identical note in bfs_distances
                .coalesce(P)
            )
            reached = staged.localCheckpoint(eager=True)
            changed = int(obs.get["c"] or 0)
            metrics.append(
                {"sweep": tag, "i": it, "changed": changed, "wall_sec": time.time() - t0}
            )
            if changed == 0:
                return reached.select("id")
    raise RuntimeError(
        f"bowtie reachability sweep '{tag}' did not converge in "
        f"{max_iterations} rounds; raise max_iterations"
    )


def bowtie(
    spark: SparkSession,
    g: GraphTables,
    max_iterations: int = 100,
) -> BowtieResult:
    """Exact bow-tie region of every vertex. Deterministic: the CORE is
    the largest SCC with ties broken by minimum component label, and
    every region is a set intersection of exact reachability sets."""
    P = g.num_partitions
    comp = strongly_connected_components(spark, g).components  # url, component

    core_row = (
        comp.groupBy("component")
        .agg(F.count("*").alias("sz"))
        .orderBy(F.col("sz").desc(), F.col("component").asc())
        .limit(1)
        .collect()[0]
    )
    core_label = core_row["component"]

    ids = g.vertices  # id, url
    core = (
        comp.filter(F.col("component") == F.lit(core_label))
        .join(ids, "url")
        .select("id")
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )

    e = g.weighted_edges.select("src_id", "dst_id").filter(
        F.col("src_id") != F.col("dst_id")
    )
    fwd_e = e.distinct().repartition(P, "src_id").persist()
    bwd_e = (
        e.select(F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id"))
        .distinct()
        .repartition(P, "src_id")
        .persist()
    )

    metrics: list[dict] = []
    reach_fwd = _reach(spark, fwd_e, core, P, max_iterations, metrics, "fwd_core")
    reach_bwd = _reach(spark, bwd_e, core, P, max_iterations, metrics, "bwd_core")
    out_ids = reach_fwd.join(core, "id", "left_anti").localCheckpoint(eager=True)
    in_ids = reach_bwd.join(core, "id", "left_anti").localCheckpoint(eager=True)

    settled = core.union(in_ids).union(out_ids).select("id")
    from_in = (
        _reach(spark, fwd_e, in_ids, P, max_iterations, metrics, "fwd_in")
        .join(settled, "id", "left_anti")
    )
    to_out = (
        _reach(spark, bwd_e, out_ids, P, max_iterations, metrics, "bwd_out")
        .join(settled, "id", "left_anti")
    )

    flag = lambda df, name: df.select("id", F.lit(1).alias(name))  # noqa: E731
    regions = (
        ids.join(flag(core, "f_core"), "id", "left")
        .join(flag(in_ids, "f_in"), "id", "left")
        .join(flag(out_ids, "f_out"), "id", "left")
        .join(flag(from_in, "f_fi"), "id", "left")
        .join(flag(to_out, "f_to"), "id", "left")
        .select(
            "url",
            F.when(F.col("f_core") == 1, "CORE")
            .when(F.col("f_in") == 1, "IN")
            .when(F.col("f_out") == 1, "OUT")
            .when((F.col("f_fi") == 1) & (F.col("f_to") == 1), "TUBE")
            .when(F.col("f_fi") == 1, "TENDRIL_IN")
            .when(F.col("f_to") == 1, "TENDRIL_OUT")
            .otherwise("DISC")
            .alias("region"),
        )
    )
    fwd_e.unpersist()
    bwd_e.unpersist()
    return BowtieResult(
        regions=regions,
        core_label=core_label,
        sweeps=len(metrics),
        metrics=metrics,
    )
