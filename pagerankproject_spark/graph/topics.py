"""Batched topic-sensitive PageRank (Haveliwala, WWW 2002 — public).

At web scale the dominant cost of personalized PageRank is the edge
scan: every iteration reads the whole weighted edge table once per
rank vector. Topic-sensitive PageRank needs k such vectors (one per
topic seed set), and running `pagerank(v_expr=...)` k times reads the
edges k times per iteration round. This module batches all k vectors
through ONE join + ONE aggregate per iteration — the edge table is
scanned once and the k message sums (`sum(weight * x_i)`) are computed
as k map-side-combinable aggregates in the same shuffle, so the
per-iteration cost is one edge pass + k extra doubles per vertex row.
At 100 TB that is the difference between k full-table scans and one.

Semantics per topic are EXACTLY the engine's personalized PageRank
(graph/pagerank.py equations; reference Eq 5.1 anchors, SURVEY §2.4):
x0 uniform 1/sqrt(n), v = unit-L2 indicator of the topic predicate,
u = alpha*msg + (alpha*dm + 1-alpha)*v, x' = u/||u||_2, dm' over
dangling vertices. The batched update never reads another topic's
column, so the k columns evolve exactly as k independent runs
(pytest-asserted against sequential `pagerank` calls at 1e-12).

The loop runs a FIXED iteration count instead of a residual stop: with
per-topic epsilon stopping, a batch would either keep iterating
already-converged topics (changing their result vs a standalone run)
or need per-topic freezing; a fixed count keeps every topic's
trajectory identical to its standalone fixed-count run AND makes the
contract oracle exact (oracle/recursive_sql.py::sql_pagerank_topics —
k independent epsilon=0 recursive chains). Callers who want converged
vectors pick `iterations` from a single-topic probe run's iteration
count.

Scale shape: same as the `spmv='dataframe'` PageRank loop — one
shuffle per iteration keyed by dst_id over pre-partitioned persisted
edges, all 2k scalar reductions (norms, dangling masses) riding the
localCheckpoint materialization as a single Observation, lineage
truncated every round. k is bounded by row width, not by jobs: 16
topics adds 128 bytes/vertex-row, still one Spark job per iteration.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..ingest.edges import GraphTables
from ..session import loop_shuffle_partitions, no_aqe


@dataclass
class TopicPageRankResult:
    ranks: DataFrame  # topic: string, url: string, x: double
    iterations: int
    metrics: list[dict] = field(default_factory=list)


def pagerank_topics(
    spark: SparkSession,
    g: GraphTables,
    topics: dict[str, Column],
    alpha: float = 0.85,
    iterations: int = 15,
) -> TopicPageRankResult:
    """k personalized PageRank vectors in one edge-scan per iteration.

    `topics`: name -> boolean/weight Column over the vertices table
    (`url` available), each normalized to a unit-L2 personalization
    vector like `pagerank(v_expr=)`. Returns long-format ranks
    (topic, url, x) with one row per (topic, vertex).
    """
    if not topics:
        raise ValueError("pagerank_topics needs at least one topic")
    names = list(topics)
    k = len(names)
    P = g.num_partitions
    n = g.n
    we = g.weighted_edges.select("src_id", "dst_id", "weight")

    srcs = g.weighted_edges.select("src_id").distinct()
    base = (
        g.vertices.join(
            srcs.withColumn("has_out", F.lit(True)),
            g.vertices.id == srcs.src_id,
            "left",
        )
        .select(
            "id",
            "url",
            F.col("has_out").isNull().alias("is_dangling"),
            *[
                topics[nm].cast("double").alias(f"vr_{i}")
                for i, nm in enumerate(names)
            ],
        )
        .repartition(P, "id")
        .persist()
    )
    agg = base.agg(
        F.sum(F.when(F.col("is_dangling"), 1).otherwise(0)).alias("d_cnt"),
        *[
            F.sum(F.col(f"vr_{i}") * F.col(f"vr_{i}")).alias(f"sq_{i}")
            for i in range(k)
        ],
        *[F.sum(F.col(f"vr_{i}")).alias(f"sm_{i}") for i in range(k)],
    ).first()
    for i, nm in enumerate(names):
        if not agg[f"sm_{i}"] or agg[f"sm_{i}"] <= 0:
            raise ValueError(f"topic {nm!r}: personalization vector sums to 0")
    base = base.select(
        "id",
        "url",
        "is_dangling",
        *[
            (F.col(f"vr_{i}") / F.lit(math.sqrt(agg[f"sq_{i}"]))).alias(f"v_{i}")
            for i in range(k)
        ],
    ).persist()

    # x0 uniform 1/sqrt(n) for every topic (graph/pagerank.py:252-255);
    # dm0 = dangling count / sqrt(n)
    uniform = 1.0 / math.sqrt(n)
    ranks = base.select(
        "id", *[F.lit(uniform).alias(f"x_{i}") for i in range(k)]
    ).localCheckpoint(eager=True)
    dm = [int(agg["d_cnt"]) * uniform] * k

    metrics: list[dict] = []
    with no_aqe(spark), loop_shuffle_partitions(spark, g.num_edges):
        for it in range(iterations):
            t0 = time.time()
            contribs = (
                we.join(ranks, we.src_id == ranks.id)
                .groupBy("dst_id")
                .agg(
                    *[
                        F.sum(F.col("weight") * F.col(f"x_{i}")).alias(f"m_{i}")
                        for i in range(k)
                    ]
                )
            )
            u_full = base.join(
                contribs, base.id == contribs.dst_id, "left"
            ).select(
                "id",
                "is_dangling",
                *[
                    (
                        F.lit(alpha) * F.coalesce(F.col(f"m_{i}"), F.lit(0.0))
                        + F.lit(alpha * dm[i] + (1.0 - alpha)) * F.col(f"v_{i}")
                    ).alias(f"u_{i}")
                    for i in range(k)
                ],
            )
            obs = Observation()
            u_full = u_full.observe(
                obs,
                *[
                    F.sum(F.col(f"u_{i}") * F.col(f"u_{i}")).alias(f"uu_{i}")
                    for i in range(k)
                ],
                *[
                    F.sum(
                        F.when(F.col("is_dangling"), F.col(f"u_{i}")).otherwise(
                            0.0
                        )
                    ).alias(f"du_{i}")
                    for i in range(k)
                ],
            )
            u_df = u_full.select(
                "id", *[f"u_{i}" for i in range(k)]
            ).localCheckpoint(eager=True)
            s = obs.get
            norms = [math.sqrt(s[f"uu_{i}"]) for i in range(k)]
            dm = [s[f"du_{i}"] / norms[i] for i in range(k)]
            ranks = u_df.select(
                "id",
                *[
                    (F.col(f"u_{i}") / F.lit(norms[i])).alias(f"x_{i}")
                    for i in range(k)
                ],
            )
            metrics.append(
                {
                    "i": it,
                    "dangling_mass": dict(zip(names, dm)),
                    "wall_sec": time.time() - t0,
                }
            )

    stack_expr = "stack({}, {}) as (topic, x)".format(
        k, ", ".join(f"'{nm}', x_{i}" for i, nm in enumerate(names))
    )
    long = base.select("id", "url").join(ranks, "id").select(
        "url", F.expr(stack_expr)
    )
    out = long.select("topic", "url", "x").localCheckpoint(eager=True)
    base.unpersist()
    return TopicPageRankResult(ranks=out, iterations=iterations, metrics=metrics)


def spam_mass(
    spark: SparkSession,
    g: GraphTables,
    trusted: Column,
    alpha: float = 0.85,
    iterations: int = 15,
) -> DataFrame:
    """Relative spam mass (Gyongyi, Garcia-Molina & Pedersen's
    TrustRank, VLDB 2004; spam mass estimation, VLDB 2006 — public):
    m(p) = (r(p) - t(p)) / r(p), where r is plain PageRank and t is
    TrustRank (PageRank personalized to the `trusted` seed set). Pages
    whose rank is mostly NOT derived from trusted seeds score near 1.

    Both vectors run through ONE `pagerank_topics` batch — a single
    edge-scan per iteration computes r and t together — with the same
    fixed iteration count, so the contract oracle is two independent
    epsilon=0 recursive chains plus arithmetic.

    Cross-engine float discipline: r and t are rounded to 6dp FIRST
    (the granularity at which the PageRank trajectory is verified
    engine-identical), and the mass is computed FROM the rounded
    values — (r6 - t6) / r6 on engine-identical doubles is
    deterministic, where dividing unrounded last-ulp-noisy doubles
    would amplify cancellation when t is close to r. r6 = 0 (a rank
    below 5e-7) yields NULL, mirrored by the oracle's CASE.

    Returns (url, rank, trust, spam_mass), each rounded to 6dp.
    """
    res = pagerank_topics(
        spark,
        g,
        {"base": F.lit(True), "trust": trusted},
        alpha=alpha,
        iterations=iterations,
    )
    wide = res.ranks.groupBy("url").agg(
        F.max(F.when(F.col("topic") == "base", F.col("x"))).alias("r"),
        F.max(F.when(F.col("topic") == "trust", F.col("x"))).alias("t"),
    )
    r6 = F.round(F.col("r"), 6)
    t6 = F.round(F.col("t"), 6)
    return wide.select(
        "url",
        r6.alias("rank"),
        t6.alias("trust"),
        F.when(r6 > 0, F.round((r6 - t6) / r6, 6)).alias("spam_mass"),
    )
