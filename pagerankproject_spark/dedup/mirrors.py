"""Mirror-host detection via host-level shingle resemblance.

Bharat & Broder, "Mirror, mirror on the web: a study of host pairs
with replicated content" (WWW 1999 — public): two hosts mirror each
other when the UNION of their pages' shingle sets has high Jaccard
resemblance. Finding mirrors early matters at crawl scale — a mirror
pair duplicates its entire subtree, so one host-level decision
replaces millions of page-level dedup decisions.

This is the host-granularity lift of dedup/jaccard.py: per-host
shingle SETS come from explode + distinct (the set union of the
host's documents — no text concatenation, so no artificial
cross-document boundary shingles and no ordering sensitivity), then
the same inverted-index self-join. The df-cap drops shingles present
on more than `max_host_freq` hosts before the join (boilerplate
chrome shared by every host is the skew hazard AND carries no mirror
signal — exactly Bharat-Broder's "popular shingle" pruning).

Float discipline: exact integer moments (common, sa, sb) into one
division, rounded once at 6dp — the proven jaccard_pairs pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .shingles import DEFAULT_SHINGLE_N, shingles_expr, sql_shingles

MIRROR_ROUND = 6


def mirror_host_pairs(
    docs: DataFrame,
    host: Column,
    threshold: float,
    n: int = DEFAULT_SHINGLE_N,
    text_col: str = "text",
    max_host_freq: int | None = None,
) -> DataFrame:
    """Host pairs (host_a < host_b) with shingle-set resemblance
    >= threshold.

    `host` is the host-assignment expression evaluated over `docs`
    (e.g. `domain_expr(url_col)`). Output: host_a, host_b,
    resemblance (double, 6dp).
    """
    sh = (
        docs.select(
            host.alias("host"),
            F.explode(
                F.array_distinct(shingles_expr(F.col(text_col), n))
            ).alias("s"),
        )
        .distinct()
        .persist()
    )
    if max_host_freq is not None:
        hot = (
            sh.groupBy("s")
            .agg(F.count("*").alias("hf"))
            .filter(F.col("hf") > max_host_freq)
            .select("s")
        )
        sh = sh.join(F.broadcast(hot), "s", "left_anti")
    sizes = sh.groupBy("host").agg(F.count("*").cast("long").alias("sz"))
    left = sh.select(F.col("host").alias("host_a"), "s")
    right = sh.select(F.col("host").alias("host_b"), "s")
    common = (
        left.join(right, "s")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("long").alias("common"))
    )
    return (
        common.join(
            sizes.select(F.col("host").alias("host_a"), F.col("sz").alias("sa")),
            "host_a",
        )
        .join(
            sizes.select(F.col("host").alias("host_b"), F.col("sz").alias("sb")),
            "host_b",
        )
        .withColumn(
            "resemblance",
            F.round(
                F.col("common")
                / (F.col("sa") + F.col("sb") - F.col("common")).cast("double"),
                MIRROR_ROUND,
            ),
        )
        .filter(F.col("resemblance") >= threshold)
        .select("host_a", "host_b", "resemblance")
    )


def sql_mirror_host_pairs(
    table: str,
    host_sql: str,
    threshold: float,
    n: int = DEFAULT_SHINGLE_N,
    text_col: str = "text",
    max_host_freq: int | None = None,
) -> str:
    """DuckDB twin: same host shingle-set union, same df-cap, same
    single rounded division."""
    cap = (
        f"""
    , mh_hot as (select s from mh_sh group by s
                 having count(*) > {max_host_freq}),
    mh_kept as (select * from mh_sh where s not in (select s from mh_hot))
    """
        if max_host_freq is not None
        else ", mh_kept as (select * from mh_sh)"
    )
    return f"""
    with mh_sh as (
        select distinct {host_sql} as host, unnest(list_distinct({sql_shingles(text_col, n)})) as s
        from {table}
    ){cap},
    mh_sizes as (select host, count(*)::bigint as sz from mh_kept group by 1),
    mh_common as (
        select a.host as host_a, b.host as host_b, count(*)::bigint as common
        from mh_kept a join mh_kept b on a.s = b.s and a.host < b.host
        group by 1, 2
    )
    select host_a, host_b,
           round(common / (sa.sz + sb.sz - common)::double, {MIRROR_ROUND})
             as resemblance
    from mh_common
    join mh_sizes sa on sa.host = mh_common.host_a
    join mh_sizes sb on sb.host = mh_common.host_b
    where round(common / (sa.sz + sb.sz - common)::double, {MIRROR_ROUND})
          >= {threshold}
    """
