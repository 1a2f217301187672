"""Sketch-path corpus statistics — the operators you actually run at
100 TB, where the exact twins stop being affordable:

  * approx_count_distinct  — HyperLogLog++ (Heule et al. 2013): fixed
    few-KB state per group, mergeable across partitions, relative
    standard deviation `rsd` configurable. The exact COUNT(DISTINCT)
    twin shuffles every distinct value.
  * percentile_approx      — Greenwald-Khanna/KLL-style quantile
    sketch: bounded state, one pass, `accuracy` trades memory for
    rank error. The exact percentile() twin (doc_length_quantiles)
    sorts each group.

Both are Spark-native aggregate sketches (JVM-side, partial+final
merge — no shuffle of raw values beyond the group key). No DuckDB
contract key: sketch outputs are estimator-specific by design, so the
correctness pin is a TOLERANCE test against the exact twins
(tests/test_pipeline_ops.py), exactly how a production pipeline
validates its sketch path before switching it on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_corpus_stats(
    docs: DataFrame,
    group_col: str = "lang",
    rsd: float = 0.05,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group: estimated distinct document count (by content
    fingerprint — so exact duplicates collapse) and approximate
    n_chars quartiles. Output (group, n_docs, approx_distinct_docs,
    p25, p50, p75)."""
    return docs.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.approx_count_distinct(
            F.md5(F.lower(F.trim(F.col("text")))), rsd
        ).alias("approx_distinct_docs"),
        F.percentile_approx(
            "n_chars", [0.25, 0.5, 0.75], accuracy
        ).alias("pq"),
    ).select(
        group_col,
        "n_docs",
        "approx_distinct_docs",
        F.col("pq")[0].alias("p25"),
        F.col("pq")[1].alias("p50"),
        F.col("pq")[2].alias("p75"),
    )
