"""Co-link analytics and link prediction over the page graph —
engine-added operators (SURVEY.md §2c family; no reference
implementation, reference anchor: the (src,dst) edge table of
pagerank.py:91-117 is the shared input).

All four operators are single-shot DataFrame compositions (joins +
map-side-combinable aggregates, no UDF, no collect), built on the
SIMPLE graph: self-loops dropped, duplicate (src,dst) rows deduped
first, so counts mean "number of distinct citing pages", never "number
of crawl records".

Public-literature semantics:

- **co-citation** (Small 1973): pages a and b are co-cited when some
  third page links to both; the count is the number of distinct common
  citers. Pair generation fans out C(outdeg, 2) per citing page, so a
  menu/boilerplate hub with 10^4 outlinks would emit 5*10^7 pairs —
  the `max_out_degree` cap drops such citers BEFORE the self-join
  (the standard document-frequency cap of co-occurrence mining; same
  discipline as dedup/jaccard.py's `max_shingle_freq`). Dropping hubs
  is also statistically right: a page that cites everything carries no
  co-citation signal.
- **bibliographic coupling** (Kessler 1963): the dual — pages a and b
  are coupled when they both link to some common target; `max_in_degree`
  caps mega-indegree targets (home pages) the same way. Implemented as
  co-citation on the reversed edge set.
- **Adamic-Adar** (Adamic & Adamic 2003): undirected common-neighbor
  link-prediction score  AA(u,v) = sum over common neighbors w of
  1/ln(deg(w)).  Wedges are generated from their CENTER w, so the
  per-key fan-out is C(deg(w), 2) — `max_degree` caps wedge centers;
  high-degree centers contribute the least weight (1/ln d), so the cap
  tightens the candidate set at almost no score cost. Scores are
  rounded to 6dp (ln differs in the last ulp across engines; module
  convention, see __spark_entry__ docstring).
- **reciprocity**: the fraction of directed edges whose reverse edge
  also exists (Newman 2002 graph-reciprocity measure) — a one-join
  corpus health metric (link farms show near-1.0, organic web ~0.3).

Scale profile: every shuffle key is a page url (or a url pair); the
caps bound per-key fan-out, the aggregates are partial-aggregable
counts/sums, and the joins are plain equi-joins — the same shapes as
the triangle counter, which survives web-graph skew by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _simple(edges: DataFrame) -> DataFrame:
    """Distinct directed edges, self-loops dropped."""
    return edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()


def cocitation(
    edges: DataFrame,
    min_count: int = 1,
    max_out_degree: int | None = None,
) -> DataFrame:
    """Pairs of pages co-cited by >= min_count distinct common citers.

    Output: a, b (urls, a < b), cocitations (long).
    """
    e = _simple(edges)
    if max_out_degree is not None:
        keep = (
            e.groupBy("src")
            .agg(F.count("*").alias("outdeg"))
            .filter(F.col("outdeg") <= max_out_degree)
            .select("src")
        )
        e = e.join(keep, "src")
    left = e.select("src", F.col("dst").alias("a"))
    right = e.select("src", F.col("dst").alias("b"))
    pairs = left.join(right, "src").filter(F.col("a") < F.col("b"))
    return (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("cocitations"))
        .filter(F.col("cocitations") >= min_count)
    )


def bibliographic_coupling(
    edges: DataFrame,
    min_count: int = 1,
    max_in_degree: int | None = None,
) -> DataFrame:
    """Pairs of pages sharing >= min_count distinct outlink targets.

    Output: a, b (urls, a < b), couplings (long). Dual of co-citation
    on the reversed edge set.
    """
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    out = cocitation(rev, min_count=min_count, max_out_degree=max_in_degree)
    return out.withColumnRenamed("cocitations", "couplings")


def adamic_adar(
    edges: DataFrame,
    max_degree: int | None = None,
    exclude_existing: bool = False,
) -> DataFrame:
    """Adamic-Adar scores for every unordered pair with >= 1 common
    neighbor in the simple undirected graph.

    Output: a, b (urls, a < b), aa_score (double, 6dp). With
    `exclude_existing=True`, pairs that are already edges are dropped
    (the link-prediction candidate set proper).
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    sym = und.select(F.col("a").alias("w"), F.col("b").alias("x")).union(
        und.select(F.col("b").alias("w"), F.col("a").alias("x"))
    )
    deg = sym.groupBy("w").agg(F.count("*").alias("deg"))
    centers = deg.filter(F.col("deg") >= 2)
    if max_degree is not None:
        centers = centers.filter(F.col("deg") <= max_degree)
    weighted = sym.join(centers, "w").select(
        "w", "x", (F.lit(1.0) / F.log(F.col("deg").cast("double"))).alias("wgt")
    )
    e1 = weighted.select("w", F.col("x").alias("a"), "wgt")
    e2 = weighted.select("w", F.col("x").alias("b"))
    wedges = e1.join(e2, "w").filter(F.col("a") < F.col("b"))
    scores = wedges.groupBy("a", "b").agg(
        F.round(F.sum("wgt"), 6).alias("aa_score")
    )
    if exclude_existing:
        scores = scores.join(und, ["a", "b"], "left_anti")
    return scores


def reciprocity(edges: DataFrame) -> DataFrame:
    """One-row reciprocity summary of the simple directed graph.

    Output: total_edges (long), reciprocated (long), reciprocity
    (double = reciprocated / total_edges; NULL when the simple graph
    is empty — guarded explicitly so the engine and the DuckDB twin
    agree on degenerate input instead of diverging NULL-vs-NaN).
    """
    e = _simple(edges)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    ratio = F.when(
        F.col("total_edges") > 0,
        F.col("reciprocated").cast("double") / F.col("total_edges").cast("double"),
    )
    return e.agg(F.count("*").alias("total_edges")).crossJoin(
        recip.agg(F.count("*").alias("reciprocated"))
    ).select("total_edges", "reciprocated", ratio.alias("reciprocity"))
