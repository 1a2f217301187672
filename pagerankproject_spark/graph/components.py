"""Connected components via iterative min-label propagation — SURVEY.md
§2b operator #24 (north_rule: "connected components via iterative
min-label hash-join propagation with large-vertex skew salting").

No reference implementation exists (the reference computes only
PageRank); semantics: undirected components, output keyed by url with
the component labeled by its minimum url (exact-match per north_rule).

Execution shape per iteration (all DataFrame, one scalar action):
  msgs  = sym_edges JOIN labels ON src -> groupBy dst MIN(label)
          (min is algebraic: map-side partial aggregation absorbs
          in-degree skew; with salt_buckets the aggregation is an
          explicit two-phase (dst, salt) -> dst reduction)
  new   = labels LEFT JOIN msgs: least(old, min_incoming)
  changed = SUM(new < old)   -- drives convergence, logged per iteration

Internally labels are dense long ids (cheap shuffles); min-id and
min-url induce the same partition of the vertex set, so after
convergence each component is relabeled by its minimum url for the
exact-match contract.

Lineage is truncated every iteration (localCheckpoint); durable
checkpoints + resume via ParquetCheckpointer, same protocol as PageRank.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..ingest.edges import GraphTables
from ..io.checkpoint import ParquetCheckpointer
from ..session import no_aqe


@dataclass
class ComponentsResult:
    components: DataFrame  # url: string, component: string (min url)
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def connected_components(
    spark: SparkSession,
    g: GraphTables,
    max_iterations: int = 100,
    salt_buckets: int | str = "auto",
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    job_name: str = "components",
) -> ComponentsResult:
    """`salt_buckets="auto"` (default) probes the symmetrized degree
    distribution once and enables salting only when a hot vertex would
    dominate a task (max degree > max(1M, 4 * edges/partitions)) — the
    measured regime where the salted two-phase aggregation wins 2x+
    (BENCH.md skew experiment). Pass 0 to force off, an int to force
    a bucket count."""
    P = g.num_partitions
    # symmetrize once; duplicates are harmless under MIN
    e = g.weighted_edges.select("src_id", "dst_id")
    sym = (
        e.union(
            e.select(F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id"))
        )
        .repartition(P, "src_id")
        .persist()
    )
    if salt_buckets == "auto":
        max_deg = sym.groupBy("src_id").count().agg(F.max("count")).first()[0] or 0
        threshold = max(1_000_000, 4 * (2 * g.num_edges) // max(P, 1))
        salt_buckets = 8 if max_deg > threshold else 0
    if salt_buckets > 0:
        sym = sym.withColumn(
            "salt", F.pmod(F.hash("src_id"), F.lit(salt_buckets))
        ).persist()

    labels = g.vertices.select(
        "id", F.col("id").alias("label")
    ).repartition(P, "id")

    start_iter, converged = 0, False
    ckpt = ParquetCheckpointer(checkpoint_dir, job_name) if checkpoint_dir else None
    if ckpt and resume:
        info = ckpt.latest()
        if info is not None:
            labels = ckpt.read(spark, info.iteration).repartition(P, "id")
            start_iter = info.iteration + 1
            converged = bool(info.metrics.get("converged", False))

    labels = labels.localCheckpoint(eager=True)
    metrics: list[dict] = []
    it = start_iter
    with no_aqe(spark):
        while it < max_iterations and not converged:
            t0 = time.time()
            if salt_buckets > 0:
                # explicit two-phase min: (id, salt) partial, then id final —
                # splits hot destination keys across salt buckets (#23).
                incoming = sym.join(labels, sym.src_id == labels.id).select(
                    F.col("dst_id").alias("id"), "salt", "label"
                )
                msgs = (
                    incoming.groupBy("id", "salt")
                    .agg(F.min("label").alias("m"))
                    .groupBy("id")
                    .agg(F.min("m").alias("min_in"))
                )
            else:
                incoming = sym.join(labels, sym.src_id == labels.id).select(
                    F.col("dst_id").alias("id"), "label"
                )
                msgs = incoming.groupBy("id").agg(F.min("label").alias("min_in"))
            obs = Observation()
            staged = (
                labels.join(msgs, "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("label"), F.coalesce(F.col("min_in"), F.col("label"))
                    ).alias("new_label"),
                    F.col("label").alias("old_label"),
                )
                .observe(
                    obs,
                    F.sum(
                        F.when(F.col("new_label") < F.col("old_label"), 1).otherwise(0)
                    ).alias("c"),
                )
            )
            # changed-count rides the checkpoint materialization: 1 job/iter
            labels = staged.select(
                "id", F.col("new_label").alias("label")
            ).localCheckpoint(eager=True)
            changed = obs.get["c"]
            metrics.append(
                {"i": it, "changed": int(changed), "wall_sec": time.time() - t0}
            )
            converged = changed == 0
            if ckpt and (converged or it % checkpoint_interval == 0):
                ckpt.write(
                    labels, it, {"changed": int(changed), "converged": converged}
                )
            it += 1

    # relabel components by their minimum url (exact-match output contract)
    v = g.vertices
    lab_urls = labels.join(v, "id").select("url", "label")
    rep = lab_urls.groupBy("label").agg(F.min("url").alias("component"))
    out = lab_urls.join(rep, "label").select("url", "component")
    sym.unpersist()
    return ComponentsResult(
        components=out,
        iterations=it - start_iter,
        converged=converged,
        metrics=metrics,
    )
