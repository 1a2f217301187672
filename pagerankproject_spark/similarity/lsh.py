"""Approximate nearest neighbors: random-hyperplane (sign) LSH.

The scale path for similarity search: each vector gets a `num_planes`-
bit signature (sign of the dot product against fixed random
hyperplanes); vectors sharing a signature land in one bucket and only
within-bucket pairs are scored exactly. Expected bucket count 2^P, so
the quadratic cosine join shrinks by ~2^P while keeping high recall
for near-identical vectors (a near-dup pair flips a given plane with
probability theta/pi).

Hyperplanes come from a seeded RNG at import — deterministic across
runs, tests, and the DuckDB oracle (the same float literals are
embedded in the generated SQL). The dot products are JVM-side folds;
no Python in the hot path.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .cosine import SIM_ROUND, cosine_expr

DEFAULT_NUM_PLANES = 12
EMBED_DIM = 64

_rng = random.Random(42)
# planes[j][d] in [-1, 1); regenerated lazily for non-default dims.
_PLANES_CACHE: dict[tuple[int, int], list[list[float]]] = {}


def hyperplanes(dim: int = EMBED_DIM, num_planes: int = DEFAULT_NUM_PLANES):
    key = (dim, num_planes)
    if key not in _PLANES_CACHE:
        rng = random.Random(1000003 * dim + num_planes)
        _PLANES_CACHE[key] = [
            [rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(num_planes)
        ]
    return _PLANES_CACHE[key]


def _bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(x) for x in plane]), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def hyperplane_buckets(
    emb: DataFrame,
    dim: int = EMBED_DIM,
    num_planes: int = DEFAULT_NUM_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, bucket) — the LSH index table. At scale this is what
    gets written out hash-partitioned by bucket."""
    planes = hyperplanes(dim, num_planes)
    return emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        _bucket_expr(F.col(vec_col).cast("array<double>"), planes).alias("bucket"),
    )


def ann_lsh_pairs(
    emb: DataFrame,
    threshold: float,
    dim: int = EMBED_DIM,
    num_planes: int = DEFAULT_NUM_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate near-dup pairs: same bucket AND rounded cosine >=
    threshold. Subset of `cosine_similar_pairs` output (tests measure
    the recall)."""
    b = hyperplane_buckets(emb, dim, num_planes, id_col, vec_col)
    left = b.select(F.col("id").alias("a"), F.col("vec").alias("va"), "bucket")
    right = b.select(F.col("id").alias("b"), F.col("vec").alias("vb"), "bucket")
    return (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", cosine_expr(F.col("va"), F.col("vb")).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def sql_ann_lsh_pairs(
    table: str,
    threshold: float,
    dim: int = EMBED_DIM,
    num_planes: int = DEFAULT_NUM_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    planes = hyperplanes(dim, num_planes)
    terms = []
    for j, plane in enumerate(planes):
        lits = ", ".join(repr(x) for x in plane)
        terms.append(
            f"case when list_dot_product({vec_col}::double[], [{lits}]) > 0 "
            f"then {1 << j}::bigint else 0::bigint end"
        )
    bucket = " + ".join(terms)
    sim = (
        f"round(list_cosine_similarity(l.vec, r.vec), {SIM_ROUND})"
    )
    return f"""
        with b as (
            select {id_col} as id, {vec_col}::double[] as vec, ({bucket}) as bucket
            from {table}
        )
        select l.id as a, r.id as b, {sim} as sim
        from b l join b r on l.bucket = r.bucket and l.id < r.id
        where {sim} >= {threshold}
    """
