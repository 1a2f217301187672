"""Co-link analytics and link prediction over the page graph —
engine-added operators (SURVEY.md §2c family; no reference
implementation, reference anchor: the (src,dst) edge table of
pagerank.py:91-117 is the shared input).

All operators here are single-shot DataFrame compositions (joins +
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
- **common neighbors / resource allocation / preferential attachment**
  (Newman 2001; Zhou, Lü & Zhang 2009; Liben-Nowell & Kleinberg 2003):
  the standard link-prediction index family over the same wedge-center
  candidate generation as Adamic-Adar — CN is the raw integer count,
  RA decays by 1/deg, PA is the degree product on the candidate set.
- **square count** (4-cycle motif): every 4-cycle has exactly two
  diagonal pairs, so n_squares = sum over pairs of C(cn,2) / 2 —
  integer-exact off the same codegree table; web graphs are C4-heavy
  (bipartite link-farm cores, Kleinberg et al. 1999 trawling).

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


def _und_sym(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(undirected simple edge set `und(a<b)`, its symmetrized form
    `sym(w,x)`) — the shared prep of every common-neighbor operator."""
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
    return und, sym


def _codegree_pairs(
    edges: DataFrame, max_degree: int | None
) -> tuple[DataFrame, DataFrame]:
    """Common-neighbor counts for every unordered 2-hop pair of the
    simple undirected graph: (und, pairs(a, b, cn)). Wedges are
    generated from their center w (fan-out C(deg(w),2)); `max_degree`
    caps wedge centers — the hub/boilerplate df-cap shared with
    adamic_adar. Integer-exact."""
    und, sym = _und_sym(edges)
    deg = sym.groupBy("w").agg(F.count("*").alias("deg"))
    centers = deg.filter(F.col("deg") >= 2)
    if max_degree is not None:
        centers = centers.filter(F.col("deg") <= max_degree)
    hop = sym.join(centers.select("w"), "w")
    e1 = hop.select("w", F.col("x").alias("a"))
    e2 = hop.select("w", F.col("x").alias("b"))
    wedges = e1.join(e2, "w").filter(F.col("a") < F.col("b"))
    pairs = wedges.groupBy("a", "b").agg(F.count("*").cast("long").alias("cn"))
    return und, pairs


def common_neighbors(
    edges: DataFrame,
    min_count: int = 1,
    max_degree: int | None = None,
    exclude_existing: bool = False,
) -> DataFrame:
    """Common-neighbor link-prediction counts (Newman 2001 CN index)
    over every unordered pair with >= min_count shared neighbors in the
    simple undirected graph.

    Output: a, b (urls, a < b), cn (long). Integer-exact, so the
    cross-engine contract needs no rounding at all. With
    `exclude_existing=True`, already-linked pairs are dropped (the
    candidate set proper). Same wedge-center shape and df-cap
    discipline as adamic_adar — see the module docstring's scale
    profile."""
    und, pairs = _codegree_pairs(edges, max_degree)
    out = pairs.filter(F.col("cn") >= min_count)
    if exclude_existing:
        out = out.join(und, ["a", "b"], "left_anti")
    return out


def resource_allocation(
    edges: DataFrame,
    max_degree: int | None = None,
    exclude_existing: bool = False,
) -> DataFrame:
    """Resource-allocation link-prediction scores (Zhou, Lü & Zhang
    2009):  RA(u,v) = sum over common neighbors w of 1/deg(w)  — the
    stronger-decay sibling of Adamic-Adar (1/d vs 1/ln d), empirically
    better on dense webby graphs because mega-hubs contribute ~0.

    Output: a, b (urls, a < b), ra_score (double, 6dp — module float
    convention; the per-term values 1/deg are shortest-repr doubles
    both engines parse identically, the sum is rounded once)."""
    und, sym = _und_sym(edges)
    deg = sym.groupBy("w").agg(F.count("*").alias("deg"))
    centers = deg.filter(F.col("deg") >= 2)
    if max_degree is not None:
        centers = centers.filter(F.col("deg") <= max_degree)
    weighted = sym.join(centers, "w").select(
        "w", "x", (F.lit(1.0) / F.col("deg").cast("double")).alias("wgt")
    )
    e1 = weighted.select("w", F.col("x").alias("a"), "wgt")
    e2 = weighted.select("w", F.col("x").alias("b"))
    wedges = e1.join(e2, "w").filter(F.col("a") < F.col("b"))
    scores = wedges.groupBy("a", "b").agg(
        F.round(F.sum("wgt"), 6).alias("ra_score")
    )
    if exclude_existing:
        scores = scores.join(und, ["a", "b"], "left_anti")
    return scores


def preferential_attachment(
    edges: DataFrame,
    max_degree: int | None = None,
    exclude_existing: bool = False,
) -> DataFrame:
    """Preferential-attachment scores deg(u)*deg(v) (Barabási-Albert
    growth model as a link predictor, Liben-Nowell & Kleinberg 2003)
    — restricted to the 2-hop candidate set (pairs with >= 1 common
    neighbor): all-pairs PA is O(n^2) and meaningless at web scale,
    and every standard evaluation scores it on the same candidate set
    as CN/AA/RA anyway.

    Output: a, b (urls, a < b), pa_score (long — exact integer degree
    product, bit-identical cross-engine)."""
    und, pairs = _codegree_pairs(edges, max_degree)
    _, sym = _und_sym(edges)
    deg = sym.groupBy("w").agg(F.count("*").cast("long").alias("deg"))
    out = (
        pairs.join(deg.select(F.col("w").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("w").alias("b"), F.col("deg").alias("deg_b")), "b")
        .select("a", "b", (F.col("deg_a") * F.col("deg_b")).alias("pa_score"))
    )
    if exclude_existing:
        out = out.join(und, ["a", "b"], "left_anti")
    return out


def square_count(edges: DataFrame, max_degree: int | None = None) -> DataFrame:
    """Total 4-cycle (square/rectangle) count of the simple undirected
    graph — the companion motif of the triangle counter: web graphs are
    square-heavy (bipartite-core link-farm and template structure shows
    up as C4s long before cliques; Kleinberg et al. 1999 trawling).

    Identity: every 4-cycle {u,w1,v,w2} has exactly two diagonals
    (u,v) and (w1,w2), and a diagonal pair with cn common neighbors
    carries C(cn,2) cycles through it, so
        n_squares = sum over unordered pairs C(cn, 2) / 2
    computed here as sum(cn*(cn-1)) DIV 4 — exact integer arithmetic
    end-to-end, no float anywhere.

    `max_degree` caps wedge CENTERS (the C(deg,2) fan-out bound needed
    on boilerplate hubs at 100 TB); a cap makes the result a lower
    bound and may make the diagonal-pair sum odd, so the DIV-4 floor is
    only exact uncapped — the capped form is an estimator, documented,
    like DOULION-style sampled motif counts.

    Output: one row, n_squares (long)."""
    _, pairs = _codegree_pairs(edges, max_degree)
    quad = F.sum(F.col("cn") * (F.col("cn") - F.lit(1)))
    return pairs.agg(F.coalesce(quad, F.lit(0)).alias("_q")).select(
        F.expr("_q div 4").cast("long").alias("n_squares")
    )


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
