"""Whole-graph summary metrics — degree assortativity (Newman 2002:
the Pearson correlation between the degrees at either end of an edge;
negative on the web's hub-and-spoke structure, positive on social
graphs).

Numeric portability: instead of calling an engine's corr() aggregate
(whose summation order differs between engines and perturbs the last
ulps), the correlation is assembled from EXACT integer moments —
degrees are integers, so Σx, Σy, Σxy, Σx², Σy² over the symmetrized
edge list are exact BIGINTs in any engine — followed by a single
double-precision expression. Spark and DuckDB then agree bit-for-bit.

Scale shape: one degree aggregation (map-side combinable), one join of
edges to degrees per endpoint (the SpMV join shape), one scalar
moment aggregation. No window, no sort, no collect beyond 1 row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """`edges`: (src, dst) strings. Undirected treatment: each edge
    contributes both (deg_u, deg_v) and (deg_v, deg_u) — the standard
    symmetrized definition, which also makes Σx == Σy. Returns one row
    (n_pairs, assortativity) with assortativity rounded to 6dp."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count("*").cast("long").alias("deg")
    )
    pairs = (
        sym.join(deg.select(F.col("v").alias("src"), F.col("deg").alias("dx")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("deg").alias("dy")), "dst")
        .select("dx", "dy")
    )
    m = pairs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = n * F.col("sxy") - sx * sy
    den = F.sqrt(
        (n * F.col("sxx") - sx * sx).cast("double")
        * (n * F.col("syy") - sy * sy).cast("double")
    )
    # try_divide: zero degree variance (regular graphs) is 0/0 -> NULL,
    # not an ANSI error
    return m.select(
        F.col("n").alias("n_pairs"),
        F.round(F.try_divide(num.cast("double"), den), 6).alias("assortativity"),
    )


def sql_degree_assortativity() -> str:
    """DuckDB twin over the `edges` CTE, identical integer moments."""
    return """
    e as (select distinct src, dst from edges where src <> dst),
    symd as (select src, dst from e union all select dst, src from e),
    deg as (select src as v, count(*)::bigint as deg from symd group by 1),
    pairs as (
        select dx.deg as dx, dy.deg as dy
        from symd
        join deg dx on dx.v = symd.src
        join deg dy on dy.v = symd.dst
    ),
    m as (
        select count(*)::bigint as n,
               sum(dx)::bigint as sx, sum(dy)::bigint as sy,
               sum(dx * dy)::bigint as sxy,
               sum(dx * dx)::bigint as sxx,
               sum(dy * dy)::bigint as syy
        from pairs
    )
    select n as n_pairs,
           round(case when (n * sxx - sx * sx) = 0 or (n * syy - sy * sy) = 0
                      then null
                      else (n * sxy - sx * sy)::double
                           / sqrt((n * sxx - sx * sx)::double
                                  * (n * syy - sy * sy)::double) end, 6)
               as assortativity
    from m
    """
