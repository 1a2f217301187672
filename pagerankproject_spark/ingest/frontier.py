"""Crawl-frontier selection — the next-wave URL chooser of a web
crawler (the upstream producer of the reference's edge CSV; no
reference implementation — /root/reference/pagerank.py consumes an
already-crawled edge list, README.md:37-59 describes the crawl that
produced it).

Semantics (standard BFS-frontier crawling with per-host budgets, as in
Mercator / IRLbot frontier design, public literature): given the
directed link graph discovered so far and the set of already-crawled
URLs, the frontier is every uncrawled link TARGET reachable from a
crawled page, scored by the number of DISTINCT crawled pages citing it
(in-link popularity ordering), and optionally capped to the top-k per
destination host — the politeness budget that stops one mega-host from
monopolizing the next wave.

Scale profile: two equi-joins against the crawled set (left_semi +
left_anti on url keys — both plain hash joins, broadcastable when the
crawled set is small early in a crawl), one map-side-combinable
distinct-citer count, and one per-host top-k window. Host cardinality
is ~4 orders of magnitude below page cardinality, and the window input
is the CANDIDATE set (uncrawled dsts), not the edge table, so the sort
is small; a mega-host's candidates sort in one partition — cap k keeps
the useful output tiny, and the same permille-hash pre-prune documented
in text/pipeline.py::domain_cap_sample applies if a host ever dominates
the candidate set.

Determinism: ranks break ties (citers desc, url asc) — total order, so
the output is exactly reproducible and the DuckDB twin row-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..text.pipeline import domain_expr, sql_domain


def crawl_frontier(
    edges: DataFrame,
    crawled: DataFrame,
    per_host_cap: int | None = None,
    min_citers: int = 1,
) -> DataFrame:
    """Next-wave crawl frontier from `edges(src, dst)` and
    `crawled(url)`.

    Output: url (the uncrawled target), host, citers (distinct crawled
    citing pages, long), host_rank (1-based rank within host by
    citers desc / url asc, long). Rows with fewer than `min_citers`
    citers are dropped; with `per_host_cap` set, only the top-k per
    host survive.
    """
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    crawled_urls = crawled.select("url").distinct()
    discovered = e.join(
        crawled_urls.withColumnRenamed("url", "src"), "src", "left_semi"
    )
    uncrawled = discovered.join(
        crawled_urls.withColumnRenamed("url", "dst"), "dst", "left_anti"
    )
    cand = (
        uncrawled.groupBy("dst")
        .agg(F.count("*").cast("long").alias("citers"))
        .filter(F.col("citers") >= min_citers)
    )
    out = cand.select(
        F.col("dst").alias("url"),
        domain_expr(F.col("dst")).alias("host"),
        "citers",
    )
    w = Window.partitionBy("host").orderBy(F.desc("citers"), F.asc("url"))
    out = out.withColumn("host_rank", F.row_number().over(w).cast("long"))
    if per_host_cap is not None:
        out = out.filter(F.col("host_rank") <= per_host_cap)
    return out


def sql_crawl_frontier(
    edges_rel: str,
    crawled_rel: str,
    per_host_cap: int | None = None,
    min_citers: int = 1,
) -> str:
    """DuckDB twin of crawl_frontier, in CTE-continuation form: the
    returned string continues an already-open WITH clause (the repo's
    `{g}, <more CTEs> select ...` embedding convention), so it starts
    with a CTE name, not the WITH keyword. `crawled_rel` must expose
    `url`."""
    cap = f"where host_rank <= {per_host_cap}" if per_host_cap is not None else ""
    return f"""
    fr_e as (select distinct src, dst from {edges_rel} where src <> dst),
    fr_c as (select distinct url from {crawled_rel}),
    fr_cand as (
        select e.dst, count(*)::bigint as citers
        from fr_e e
        join fr_c cs on cs.url = e.src
        where not exists (select 1 from fr_c cd where cd.url = e.dst)
        group by e.dst
        having count(*) >= {min_citers}
    )
    select url, host, citers, host_rank from (
        select dst as url, {sql_domain('dst')} as host, citers,
               row_number() over (
                   partition by {sql_domain('dst')}
                   order by citers desc, dst asc
               )::bigint as host_rank
        from fr_cand
    ) {cap}
    """
