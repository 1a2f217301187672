"""Similarity search over an embedding column (array<float/double>).

Brute-force cosine is the correctness baseline: normalize once, then a
self-join + JVM-side fold for the dot product (`F.aggregate` over
`F.zip_with` — no Python in the hot path). Quadratic in rows, so at
scale it runs only WITHIN candidate buckets produced by `lsh.py`; the
module keeps both so tests can measure the approximate variant's
recall against this exact one.

Determinism for the cross-engine oracle: similarities are rounded to
6dp BEFORE thresholding/ranking, and top-k ties break by neighbor id,
so Spark and DuckDB (`list_cosine_similarity`) order identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SIM_ROUND = 6


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), SIM_ROUND)


def _pairs(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    left = emb.select(
        F.col(id_col).alias("a"), F.col(vec_col).cast("array<double>").alias("va")
    )
    right = emb.select(
        F.col(id_col).alias("b"), F.col(vec_col).cast("array<double>").alias("vb")
    )
    return (
        left.crossJoin(right)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", cosine_expr(F.col("va"), F.col("vb")).alias("sim"))
    )


def cosine_similar_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with rounded cosine >= threshold — the
    embedding-space near-duplicate detector."""
    return _pairs(emb, id_col, vec_col).filter(F.col("sim") >= threshold)


def cosine_topk(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k nearest neighbors per vector (self excluded), both
    directions of each pair. Deterministic: rank by (rounded sim desc,
    neighbor id asc)."""
    sym = _pairs(emb, id_col, vec_col)
    both = sym.select("a", "b", "sim").union(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"), "sim")
    )
    w = Window.partitionBy("a").orderBy(F.desc("sim"), F.asc("b"))
    return (
        both.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("a").alias("query_id"),
            F.col("b").alias("neighbor_id"),
            "sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def sql_cosine_similar_pairs(
    table: str, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    sim = (
        f"round(list_cosine_similarity(l.{vec_col}::double[], r.{vec_col}::double[]),"
        f" {SIM_ROUND})"
    )
    return f"""
        select l.{id_col} as a, r.{id_col} as b, {sim} as sim
        from {table} l join {table} r on l.{id_col} < r.{id_col}
        where {sim} >= {threshold}
    """


def sql_cosine_topk(
    table: str, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    sim = (
        f"round(list_cosine_similarity(l.{vec_col}::double[], r.{vec_col}::double[]),"
        f" {SIM_ROUND})"
    )
    return f"""
        with sims as (
            select l.{id_col} as a, r.{id_col} as b, {sim} as sim
            from {table} l join {table} r on l.{id_col} <> r.{id_col}
        ),
        ranked as (
            select a, b, sim,
                   row_number() over (partition by a order by sim desc, b asc) as rank
            from sims
        )
        select a as query_id, b as neighbor_id, sim, rank::bigint as rank
        from ranked where rank <= {k}
    """
