"""Near-dup clustering: candidate pairs -> connected components ->
one survivor per cluster. The step between pair generation
(jaccard/minhash/simhash/embedding) and corpus filtering: transitive
duplicates (A~B, B~C) must collapse into ONE cluster even when (A,C)
was never emitted as a pair.

Min-id label propagation directly on the long doc ids (same iterative
shape as graph/components.py, without the url detour): per iteration
one join + one combinable MIN aggregate, changed-count riding the
localCheckpoint as an Observation, lineage truncated every iteration.
Survivor = min doc_id per cluster (same keep-rule as dedup_exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..session import no_aqe


def dedup_clusters(
    spark: SparkSession,
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iterations: int = 50,
) -> DataFrame:
    """(a, b) near-dup pairs -> (doc_id, cluster_id, is_survivor).

    cluster_id = min doc_id of the connected component; is_survivor
    marks that minimum. Docs never appearing in a pair are their own
    singleton cluster by definition and are NOT emitted (join the
    output back onto the corpus with a coalesce to keep singletons).
    """
    P = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = pairs.select(
        F.col(a_col).cast("long").alias("src"), F.col(b_col).cast("long").alias("dst")
    )
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition(P, "src")
        .persist()
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )
    with no_aqe(spark):
        for _ in range(max_iterations):
            msgs = (
                sym.join(labels, sym.src == labels.id)
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("label").alias("min_in"))
            )
            obs = Observation()
            staged = (
                labels.join(msgs, "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("label"), F.coalesce("min_in", F.col("label"))
                    ).alias("new_label"),
                    F.col("label").alias("old"),
                )
                .observe(
                    obs,
                    F.sum(
                        F.when(F.col("new_label") < F.col("old"), 1).otherwise(0)
                    ).alias("c"),
                )
            )
            labels = staged.select(
                "id", F.col("new_label").alias("label")
            ).localCheckpoint(eager=True)
            if int(obs.get["c"] or 0) == 0:
                break
    sym.unpersist()
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("id") == F.col("label")).alias("is_survivor"),
    )
