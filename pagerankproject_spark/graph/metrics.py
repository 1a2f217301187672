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


def katz_centrality(
    spark,
    g,
    alpha: float = 0.05,
    iterations: int = 10,
) -> DataFrame:
    """Katz centrality (Katz 1953), fixed-iteration form:

        x_{t+1}(v) = 1 + alpha * sum over in-edges (u, v) of x_t(u)

    x_0 = 1; edge multiplicity counts (parallel links add influence,
    the same convention as the engine's degree/PageRank accounting).
    A fixed iteration count (not a convergence test) keeps the value
    exactly defined for the cross-engine oracle; for the measure to be
    the convergent Katz series pick alpha < 1/lambda_max — on web-ish
    graphs alpha in [0.01, 0.1] is the usual safe band.

    Execution shape = the PageRank skeleton without normalization:
    per iteration one equi-join of the edge table with the x vector
    and one map-side-combinable SUM keyed by dst, lineage cut per
    iteration. Returns (url, katz) with katz rounded to 6dp.
    """
    from ..session import loop_shuffle_partitions, no_aqe

    P = g.num_partitions
    e = (
        g.weighted_edges.select("src_id", "dst_id")
        .repartition(P, "src_id")
        .localCheckpoint(eager=True)
    )
    x = g.vertices.select("id", F.lit(1.0).alias("x")).repartition(P, "id")
    with no_aqe(spark), loop_shuffle_partitions(spark, g.num_edges):
        for _ in range(iterations):
            msgs = (
                e.join(x, e.src_id == x.id)
                .groupBy(F.col("dst_id").alias("id"))
                .agg(F.sum("x").alias("m"))
            )
            x = (
                x.select("id")
                .join(msgs, "id", "left")
                .select(
                    "id",
                    (1.0 + alpha * F.coalesce(F.col("m"), F.lit(0.0))).alias("x"),
                )
                .localCheckpoint(eager=True)
            )
    return x.join(g.vertices, "id").select(
        "url", F.round("x", 6).alias("katz")
    )


def sql_katz_centrality(alpha: float = 0.05, iterations: int = 10) -> str:
    """DuckDB recursive-CTE twin over the edges/vertices CTEs (the
    self-row trick keeps in-degree-0 vertices in every iteration)."""
    return f"""
kew as (
    select src, dst, 1.0 as w from edges
    union all
    select url, url, 0.0 from vertices
),
katz as (
    with recursive st(i, v, x) as (
        select 0, url, 1.0::double from vertices
        union all
        select s.i + 1, e.dst as v,
               1.0 + {alpha} * sum(s.x * e.w)
        from st s join kew e on e.src = s.v
        where s.i < {iterations}
        group by s.i, e.dst
    )
    select v as url, round(x, 6) as katz
    from st where i = {iterations}
)
select url, katz from katz
"""


def eigenvector_centrality(
    spark,
    g,
    iterations: int = 6,
) -> DataFrame:
    """Eigenvector centrality (Bonacich 1972) by fixed-k power iteration,
    in EXACT integer arithmetic:

        x_0 = 1;  x_{t+1}(v) = sum over in-edges (u, v) of x_t(u)

    so x_k(v) is the number of k-walks ending at v — an exact BIGINT in
    any engine (edge multiplicity counts, matching the engine's
    degree/PageRank accounting). The score is one final double division
    x_k / max(x_k), rounded once to 6dp: the repo's integer-moments
    convention (see degree_assortativity above) — no per-iteration float
    normalization, so Spark and the DuckDB oracle agree bit-for-bit.

    Caller contract: pick `iterations` small enough that the largest
    k-walk count stays below 2^63 (growth ~ lambda_max^k; k=6 is safe up
    to lambda_max ~ 1000). The DuckDB twin casts its 128-bit sum back to
    BIGINT and errors loudly on overflow; Spark's non-ANSI sum would wrap
    silently, so the bound is the caller's responsibility.

    max(x_k) = 0 (a DAG shallower than k has no k-walks) yields NULL
    scores rather than a division error, in both engines.

    Execution shape = katz_centrality without the +1/alpha affine step:
    per iteration one equi-join of the src_id-partitioned edge table with
    the x vector and one map-side-combinable SUM keyed by dst, lineage
    cut per iteration; the normalizing max is a 1-row scalar crossJoin
    (the repo's established scalar pattern). Returns (url, eigenvector).
    """
    from ..session import loop_shuffle_partitions, no_aqe

    P = g.num_partitions
    e = (
        g.weighted_edges.select("src_id", "dst_id")
        .repartition(P, "src_id")
        .localCheckpoint(eager=True)
    )
    x = g.vertices.select("id", F.lit(1).cast("long").alias("x")).repartition(
        P, "id"
    )
    with no_aqe(spark), loop_shuffle_partitions(spark, g.num_edges):
        for _ in range(iterations):
            msgs = (
                e.join(x, e.src_id == x.id)
                .groupBy(F.col("dst_id").alias("id"))
                .agg(F.sum("x").alias("m"))
            )
            x = (
                x.select("id")
                .join(msgs, "id", "left")
                .select(
                    "id",
                    F.coalesce(F.col("m"), F.lit(0)).cast("long").alias("x"),
                )
                .localCheckpoint(eager=True)
            )
    mx = x.agg(F.max("x").alias("mx"))
    return (
        x.join(g.vertices, "id")
        .crossJoin(mx)
        .select(
            "url",
            F.round(
                F.col("x").cast("double")
                / F.when(F.col("mx") > 0, F.col("mx")).cast("double"),
                6,
            ).alias("eigenvector"),
        )
    )


def sql_eigenvector_centrality(iterations: int = 6) -> str:
    """DuckDB recursive-CTE twin over the edges/vertices CTEs — the katz
    oracle's shape with BIGINT walk counts (anchor-typed ::bigint; the
    128-bit sum is cast back so overflow fails loudly) and the self-row
    trick keeping in-degree-0 vertices in every iteration. nullif guards
    the shallow-DAG max=0 case with NULL, matching the Spark side."""
    return f"""
kew as (
    select src, dst, 1::bigint as w from edges
    union all
    select url, url, 0::bigint from vertices
),
eig as (
    with recursive st(i, v, x) as (
        select 0, url, 1::bigint from vertices
        union all
        select s.i + 1, e.dst as v,
               sum(s.x * e.w)::bigint
        from st s join kew e on e.src = s.v
        where s.i < {iterations}
        group by s.i, e.dst
    )
    select v as url, x from st where i = {iterations}
)
select url,
       round(x::double / nullif((select max(x) from eig), 0)::double, 6)
           as eigenvector
from eig
"""


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


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman-Girvan modularity of a vertex partition over the simple
    undirected graph (Newman & Girvan 2004):

        Q = sum_c ( l_c / m  -  (d_c / 2m)^2 )
          = ( 4m * sum_c l_c  -  sum_c d_c^2 ) / (4 m^2)

    where l_c = intra-community edges, d_c = community degree sum, m =
    total undirected edges. Computed the degree_assortativity way: the
    three moments (m, sum l_c, sum d_c^2) are EXACT INTEGER aggregates
    (order-insensitive), and the single float division happens once at
    the end — bit-identical across Spark, DuckDB and python. Vertices
    missing from `labels` form singleton communities implicitly (their
    d_c^2 still counts), matching the standard definition.

    At 10^12-edge scale sum d_c^2 can exceed int64 ((2m)^2 ~ 4e24);
    promote the moment columns to decimal(38,0) there — the contract
    scales stay exact in bigint, which the driver hashes natively.

    Output (one row): m_edges, intra_edges, degsq_sum (long),
    modularity (double).

    `labels`: (url, label) — e.g. label_propagation / connected
    components output.
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    verts = und.select(F.col("a").alias("url")).union(
        und.select(F.col("b").alias("url"))
    )
    deg = verts.groupBy("url").agg(F.count("*").alias("deg"))
    lab = labels.select("url", "label")
    # vertices absent from `labels` form singleton communities; the
    # community key is (labeled, value) — TWO columns, so a singleton's
    # url can never collide with a real label that happens to equal it
    vlab = deg.join(lab, "url", "left").select(
        "url",
        "deg",
        F.col("label").isNotNull().alias("labeled"),
        F.coalesce("label", F.col("url")).alias("label"),
    )
    dsq = (
        vlab.groupBy("labeled", "label")
        .agg(F.sum("deg").alias("d"))
        .agg(F.sum(F.col("d") * F.col("d")).cast("long").alias("degsq_sum"))
    )
    la = vlab.select(
        F.col("url").alias("a"), F.col("labeled").alias("fa"), F.col("label").alias("la")
    )
    lb = vlab.select(
        F.col("url").alias("b"), F.col("labeled").alias("fb"), F.col("label").alias("lb")
    )
    # intra edges need BOTH endpoints labeled with the same label —
    # singleton communities have one member, so they never contribute
    intra = (
        und.join(la, "a")
        .join(lb, "b")
        .filter(F.col("fa") & F.col("fb") & (F.col("la") == F.col("lb")))
        .agg(F.count("*").cast("long").alias("intra_edges"))
    )
    m = und.agg(F.count("*").cast("long").alias("m_edges"))
    return (
        m.crossJoin(intra)
        .crossJoin(dsq)
        .select(
            "m_edges",
            "intra_edges",
            "degsq_sum",
            (
                (
                    F.lit(4) * F.col("m_edges") * F.col("intra_edges")
                    - F.col("degsq_sum")
                ).cast("double")
                / (F.lit(4) * F.col("m_edges") * F.col("m_edges")).cast("double")
            ).alias("modularity"),
        )
    )


def sql_modularity(labels_rel: str, edges_rel: str = "edges") -> str:
    """DuckDB twin of modularity() — same integer moments, same single
    division. `labels_rel` must expose (url, label)."""
    return f"""
    und as (select distinct least(src, dst) as a, greatest(src, dst) as b
            from {edges_rel} where src <> dst),
    dv as (select url, count(*) as deg from (
               select a as url from und union all select b as url from und
           ) group by 1),
    vlab as (select dv.url, dv.deg,
                    l.label is not null as labeled,
                    coalesce(l.label, dv.url) as label
             from dv left join {labels_rel} l on l.url = dv.url),
    dsq as (select sum(d * d)::bigint as degsq_sum from (
                select labeled, label, sum(deg) as d from vlab group by 1, 2
            )),
    intra as (select count(*)::bigint as intra_edges
              from und
              join vlab va on va.url = und.a
              join vlab vb on vb.url = und.b
              where va.labeled and vb.labeled and va.label = vb.label),
    mm as (select count(*)::bigint as m_edges from und)
    select m_edges, intra_edges, degsq_sum,
           (4 * m_edges * intra_edges - degsq_sum)::double
               / (4 * m_edges * m_edges)::double as modularity
    from mm, intra, dsq
    """


def conductance(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community conductance over the symmetrized multigraph
    (Kannan, Vempala & Vetta, JACM 2004 — the standard cluster-quality
    score; Leskovec et al. 2009 use exactly this for web-community
    evaluation):

        phi(S) = cut(S) / min(vol(S), vol(V) - vol(S))

    with cut(S) = directed symmetrized edges leaving S and vol(S) =
    symmetrized out-degree mass of S — both exact integers; the single
    float division is rounded once to 6 dp (cross-engine convention).
    Communities covering everything (or nothing) get NULL conductance
    (guarded min = 0) instead of a non-portable division-by-zero.

    `edges`: (src, dst) urls; `labels`: (url, label) covering every
    endpoint. Shape: symmetrize, two label joins, one combinable
    count aggregate, one scalar crossJoin for the total volume.
    Returns (label, cut_edges, volume, conductance).
    """
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    e2 = (
        sym.join(labels.select(F.col("url").alias("src"),
                               F.col("label").alias("ls")), "src")
        .join(labels.select(F.col("url").alias("dst"),
                            F.col("label").alias("ld")), "dst")
    )
    vols = e2.groupBy(F.col("ls").alias("label")).agg(
        F.count("*").alias("volume"),
        F.sum((F.col("ls") != F.col("ld")).cast("long")).alias("cut_edges"),
    ).localCheckpoint(eager=True)
    # total volume = Σ per-label volumes — no second pass over the
    # symmetrized edge set with both label joins
    tot = vols.agg(F.sum("volume").alias("t"))
    denom = F.least(F.col("volume"), F.col("t") - F.col("volume"))
    return vols.crossJoin(tot).select(
        "label",
        "cut_edges",
        "volume",
        F.round(
            F.col("cut_edges").cast("double")
            / F.when(denom > 0, denom).cast("double"),
            6,
        ).alias("conductance"),
    )


def sql_conductance(labels_sql: str) -> str:
    """DuckDB twin over the `sym` CTE and a labels relation (url,
    label): identical integer counts, identical guarded round-once
    division."""
    return f"""
    cd_lab as ({labels_sql}),
    cd_e as materialized (
        select l1.label as ls, l2.label as ld
        from sym s
        join cd_lab l1 on l1.url = s.src
        join cd_lab l2 on l2.url = s.dst
    ),
    cd_vol as (
        select ls as label, count(*) as volume,
               sum(case when ls <> ld then 1 else 0 end)::bigint as cut_edges
        from cd_e group by 1
    ),
    cd_tot as (select sum(volume) as t from cd_vol)
    select label, cut_edges, volume,
           round(cut_edges::double
                 / nullif(least(volume, t - volume), 0)::double, 6) as conductance
    from cd_vol cross join cd_tot"""


def rich_club(edges: DataFrame) -> DataFrame:
    """Rich-club coefficient curve (Zhou & Mondragon 2004): for each
    degree threshold k, the edge density among the "rich" vertices of
    undirected degree > k,

        phi(k) = 2 E_k / (N_k (N_k - 1))

    with N_k the number of vertices of degree > k and E_k the number of
    undirected edges whose BOTH endpoints have degree > k. (The Colizza
    2006 random-rewiring normalization needs a null model and is left
    to callers.) Web graphs show a pronounced rich club among hub
    hosts — this is the classic curve for quantifying it.

    `edges`: directed (src, dst) strings; treated as the SIMPLE
    UNDIRECTED support (self-loops dropped, direction and multiplicity
    collapsed), matching the definition's domain.

    Output: one row per DISTINCT degree value k present in the graph
    with N_k >= 2: k, n_rich, e_rich (exact longs) and phi (double,
    6dp). Everything up to the final division is exact integer
    arithmetic, so the value is bit-identical across engines
    (degree_assortativity pattern).

    Scale shape: degree aggregation, the SpMV-shaped edges->degree
    join per endpoint, then TWO TINY histograms (one row per distinct
    degree — thousands of rows at any scale, the web's degree support
    is small) merged under a single-partition cumulative window. The
    window never sees row-level data, only the histogram.
    """
    from pyspark.sql import Window

    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count("*").cast("long").alias("deg")
    )
    und = sym.filter(F.col("src") < F.col("dst"))
    emin = (
        und.join(deg.select(F.col("v").alias("src"), F.col("deg").alias("dx")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("deg").alias("dy")), "dst")
        .select(F.least("dx", "dy").alias("d"))
    )
    vh = deg.groupBy(F.col("deg").alias("d")).agg(
        F.count("*").cast("long").alias("nv")
    )
    eh = emin.groupBy("d").agg(F.count("*").cast("long").alias("ne"))
    h = vh.join(eh, "d", "left").select(
        "d", "nv", F.coalesce("ne", F.lit(0)).cast("long").alias("ne")
    )
    w = (
        Window.orderBy(F.desc("d"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = h.select(
        F.col("d").alias("k"),
        F.coalesce(F.sum("nv").over(w), F.lit(0)).cast("long").alias("n_rich"),
        F.coalesce(F.sum("ne").over(w), F.lit(0)).cast("long").alias("e_rich"),
    )
    return cum.filter(F.col("n_rich") >= 2).select(
        "k",
        "n_rich",
        "e_rich",
        F.round(
            (F.lit(2) * F.col("e_rich")).cast("double")
            / (F.col("n_rich") * (F.col("n_rich") - F.lit(1))).cast("double"),
            6,
        ).alias("phi"),
    )


def sql_rich_club() -> str:
    """DuckDB twin over the `edges` CTE: identical integer histograms
    and cumulative window, identical round-once division."""
    return """
    rc_e as (select src, dst from edges where src <> dst),
    rc_sym as (select src, dst from rc_e union select dst, src from rc_e),
    rc_deg as (select src as v, count(*)::bigint as deg from rc_sym group by 1),
    rc_und as (select src, dst from rc_sym where src < dst),
    rc_emin as (
        select least(dx.deg, dy.deg) as d
        from rc_und u
        join rc_deg dx on dx.v = u.src
        join rc_deg dy on dy.v = u.dst
    ),
    rc_vh as (select deg as d, count(*)::bigint as nv from rc_deg group by 1),
    rc_eh as (select d, count(*)::bigint as ne from rc_emin group by 1),
    rc_h as (
        select v.d, v.nv, coalesce(e.ne, 0)::bigint as ne
        from rc_vh v left join rc_eh e on e.d = v.d
    ),
    rc_cum as (
        select d as k,
               coalesce(sum(nv) over (order by d desc
                   rows between unbounded preceding and 1 preceding),
                   0)::bigint as n_rich,
               coalesce(sum(ne) over (order by d desc
                   rows between unbounded preceding and 1 preceding),
                   0)::bigint as e_rich
        from rc_h
    )
    select k, n_rich, e_rich,
           round((2 * e_rich)::double
                 / (n_rich * (n_rich - 1))::double, 6) as phi
    from rc_cum where n_rich >= 2
    """


def powerlaw_alpha(
    edges: DataFrame, dmin: int = 3, degree: str = "in"
) -> DataFrame:
    """Continuous maximum-likelihood power-law exponent of the degree
    distribution (Clauset, Shalizi & Newman, "Power-law distributions
    in empirical data", SIAM Review 2009, eq. 3.1):

        alpha = 1 + n_tail / sum over degrees d >= dmin of ln(d / dmin)

    The classic webgraph statistic — Broder et al. 2000 report the
    crawl in-degree exponent ~2.1. `degree` picks "in" or "out" degree
    of the simple directed graph (self-loops and duplicate edges
    dropped); zero-degree vertices are naturally absent.

    Output: ONE row (dmin, n_tail, alpha) with alpha rounded once to
    6dp; alpha is NULL when every tail degree equals dmin (the MLE
    diverges). Raises if the tail is empty.

    Float note: the log-sum is grouped by DISTINCT degree value first
    (cnt_d are exact longs; one ln per distinct degree), so the
    unordered float reduction spans only the degree support — the
    adamic_adar precedent; round-once applies. Scale shape: one degree
    aggregation, one tiny histogram, one scalar aggregate.
    """
    if dmin < 1:
        raise ValueError("powerlaw_alpha: dmin must be >= 1")
    if degree not in ("in", "out"):
        raise ValueError("powerlaw_alpha: degree must be 'in' or 'out'")
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    key = "dst" if degree == "in" else "src"
    deg = e.groupBy(F.col(key).alias("v")).agg(
        F.count("*").cast("long").alias("deg")
    )
    dh = (
        deg.filter(F.col("deg") >= dmin)
        .groupBy("deg")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    m = dh.agg(
        F.sum("cnt").cast("long").alias("n_tail"),
        F.sum(
            F.col("cnt").cast("double")
            * F.log(F.col("deg").cast("double") / F.lit(float(dmin)))
        ).alias("s"),
    )
    row_probe = m.select("n_tail").first()
    if row_probe["n_tail"] is None or row_probe["n_tail"] == 0:
        raise ValueError(
            f"powerlaw_alpha: no vertices with {degree}-degree >= {dmin}"
        )
    return m.select(
        F.lit(dmin).cast("long").alias("dmin"),
        "n_tail",
        F.round(
            F.lit(1.0)
            + F.try_divide(F.col("n_tail").cast("double"), F.col("s")),
            6,
        ).alias("alpha"),
    )


def sql_powerlaw_alpha(dmin: int = 3, degree: str = "in") -> str:
    """DuckDB twin over the `edges` CTE: identical histogram moments,
    identical single ln-per-distinct-degree expression, round once."""
    if dmin < 1:
        raise ValueError("powerlaw_alpha: dmin must be >= 1")
    if degree not in ("in", "out"):
        raise ValueError("powerlaw_alpha: degree must be 'in' or 'out'")
    key = "dst" if degree == "in" else "src"
    return f"""
    pl_e as (select distinct src, dst from edges where src <> dst),
    pl_deg as (select {key} as v, count(*)::bigint as deg from pl_e group by 1),
    pl_dh as (
        select deg, count(*)::bigint as cnt
        from pl_deg where deg >= {dmin} group by 1
    ),
    pl_m as (
        select sum(cnt)::bigint as n_tail,
               sum(cnt::double * ln(deg::double / {float(dmin)!r})) as s
        from pl_dh
    )
    select {dmin}::bigint as dmin, n_tail,
           round(1.0 + case when s = 0 then null
                            else n_tail::double / s end, 6) as alpha
    from pl_m
    """
