"""HITS (hubs & authorities) — engine-added link-analysis operator.

No reference implementation (/root/reference/pagerank.py computes only
PageRank); added because a link-graph engine's users expect the classic
companion algorithm (Kleinberg 1999, public). Semantics chosen for
exact reproducibility:

    a <- L2-normalize( sum over edges (s,t):  h[s]  accumulated at t )
    h <- L2-normalize( sum over edges (s,t):  a[t]  accumulated at s )
    residual = ||a - a_prev||_2,  stop when < epsilon

Unweighted adjacency (HITS is defined on the raw link structure, not
the out-degree-normalized PageRank matrix). Initial h = 1/sqrt(n).

Execution shape per iteration: two join+aggregate passes (authority
from hubs, then hub from the JUST-updated authorities — the sequential
dependency makes this two Spark jobs per iteration, inherent to HITS's
two-phase update; each pass is the same skew-tolerant partial-agg
shape as the PageRank SpMV). Norms and the residual ride the
localCheckpoint materializations as Observations, so no extra actions.
Lineage is truncated every iteration like the other iterative ops.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..ingest.edges import GraphTables
from ..session import no_aqe


@dataclass
class HITSResult:
    scores: DataFrame  # url: string, hub: double, authority: double
    iterations: int
    residuals: list[float]
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _propagate(edges: DataFrame, scores: DataFrame, from_col: str, to_col: str,
               obs: Observation) -> DataFrame:
    """sum score[from] grouped by `to`, then L2-normalize via the
    Observation riding the localCheckpoint materialization."""
    summed = (
        edges.join(scores, edges[from_col] == scores.id)
        .groupBy(F.col(to_col).alias("id"))
        .agg(F.sum("s").alias("raw"))
    )
    return summed.observe(obs, F.sum(F.col("raw") * F.col("raw")).alias("ss"))


def hits(
    spark: SparkSession,
    g: GraphTables,
    epsilon: float = 1e-6,
    max_iterations: int = 100,
) -> HITSResult:
    P = g.num_partitions
    edges = (
        g.weighted_edges.select("src_id", "dst_id")
        .repartition(P, "src_id")
        .persist()
    )
    n = g.n
    h = g.vertices.select("id", F.lit(1.0 / math.sqrt(n)).alias("s"))
    h = h.repartition(P, "id").localCheckpoint(eager=True)
    a_prev: DataFrame | None = None

    residuals: list[float] = []
    metrics: list[dict] = []
    converged = False
    it = 0
    with no_aqe(spark):
        for it in range(max_iterations):
            t0 = time.time()
            obs_a = Observation()
            a_raw = _propagate(edges, h, "src_id", "dst_id", obs_a)
            a_raw = a_raw.localCheckpoint(eager=True)
            a_norm = math.sqrt(obs_a.get["ss"] or 0.0)
            if a_norm == 0.0:
                raise ValueError("graph has no edges; HITS undefined")
            a = a_raw.select("id", (F.col("raw") / F.lit(a_norm)).alias("s"))

            obs_h = Observation()
            h_raw = _propagate(edges, a, "dst_id", "src_id", obs_h)
            h_raw = h_raw.localCheckpoint(eager=True)
            h_norm = math.sqrt(obs_h.get["ss"] or 0.0)
            h = h_raw.select("id", (F.col("raw") / F.lit(h_norm)).alias("s"))

            if a_prev is not None:
                # residual over the (sparse) authority vectors: missing id
                # on either side contributes its full square.
                both = a.select("id", F.col("s").alias("x")).join(
                    a_prev.select("id", F.col("s").alias("y")), "id", "full"
                )
                resid = math.sqrt(
                    both.select(
                        F.sum(
                            (F.coalesce("x", F.lit(0.0)) - F.coalesce("y", F.lit(0.0)))
                            ** 2
                        ).alias("r")
                    ).first()["r"]
                    or 0.0
                )
            else:
                resid = float("inf")
            residuals.append(resid)
            metrics.append(
                {"i": it, "residual": resid, "edges": g.num_edges,
                 "wall_sec": time.time() - t0}
            )
            a_prev = a
            if resid < epsilon:
                converged = True
                break

    out = (
        g.vertices.join(
            h.select("id", F.col("s").alias("hub")), "id", "left"
        )
        .join(a_prev.select("id", F.col("s").alias("authority")), "id", "left")
        .select(
            "url",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
    )
    edges.unpersist()
    return HITSResult(
        scores=out,
        iterations=it + 1,
        residuals=residuals,
        converged=converged,
        metrics=metrics,
    )
