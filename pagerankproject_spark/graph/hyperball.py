"""HyperBall: per-vertex neighborhood-function estimation with
HyperLogLog counters (Boldi & Vigna 2013, "In-Core Computation of
Geometric Centralities with HyperBall"; the HyperANF successor used
for the "four degrees of separation" measurement) — engine-added
operator (SURVEY.md §2 round-2 additions; no reference implementation).

Why this exists at 100 TB: the exact out-ball B(v,t) = {w reachable
from v in <= t hops} needs O(n^2) state; HyperBall keeps ONE m-register
HLL counter per vertex (m * 1 small int) and exploits that HLL union is
register-wise max, so

    sketch_t(v) = elementwise_max( sketch_{t-1}(v),
                                   max over v->u of sketch_{t-1}(u) )

is EXACTLY the sketch of B(v,t). Each iteration is one equi-join of the
edge table with the sketch table plus one groupBy with m max-aggregates
— map-side combinable, hub-skew-immune (max collapses per partition),
the same dataflow skeleton as the engine's PageRank/CC loops. From the
per-iteration global sums the neighborhood function N(t) and the
effective diameter (90th-percentile interpolation, the HyperANF
definition) fall out.

Determinism (the reason this operator is driver-oracle-checkable even
though it is an *approximate* sketch): registers derive from md5(url),
identical in Spark and DuckDB —

  - register index j  = first hex digit of md5(url)   (m = 16)
  - rho(url)          = 1 + #leading zero BITS of the next 31 hex
                        digits, computed with integer/string ops only
                        (hex-zero prefix length * 4 + a 16-way CASE on
                        the first nonzero digit) — no floats, no clz
  - estimator         = HLL-84: E = alpha_16 * 16^2 / sum_j 2^-r_j with
                        the standard small-range linear-counting
                        correction E <= 2.5m & V>0 -> m*ln(m/V); the
                        2^-r_j sum is written as one fixed-order chain
                        so both engines round identically; the final
                        estimate is rounded to 6dp (module convention).

Iterated max = max over the ball, so a recursive-CTE oracle that
computes exact t-hop reachability and takes the same register maxima
reproduces the Spark output bit-for-bit (tests + contract key
`hyperball_nf`). Accuracy vs the exact ball sizes is a separate pytest
(HLL m=16 has ~26% rse; small balls hit the linear-counting regime and
are near-exact).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

M = 16  # registers per counter; alpha_16 from Flajolet et al. 2007
ALPHA_M = 0.673
_REG_COLS = [f"r{k}" for k in range(M)]


def _rho_sql(hex31: str) -> str:
    """SQL for 1 + leading-zero-bit count of a 31-hex-digit string —
    portable across Spark SQL and DuckDB (string + integer ops only)."""
    z = f"length(regexp_extract({hex31}, '^(0*)', 1))"
    first = f"substring({hex31}, {z} + 1, 1)"
    extra = (
        f"(case {first} when '1' then 3 when '2' then 2 when '3' then 2 "
        f"when '4' then 1 when '5' then 1 when '6' then 1 when '7' then 1 "
        f"when '' then 0 else 0 end)"
    )
    return f"(4 * {z} + {extra} + 1)"


def _init_register_sql(url: str, k: int) -> str:
    """Register k of the singleton sketch {url}: rho if the url hashes
    to bucket k, else 0 (empty)."""
    md5 = f"md5({url})"
    # first hex digit -> bucket 0..15 (engine-specific hex->int spelled
    # by the caller); substring(md5, 2, 31) -> rho bits
    return (
        f"(case when {{hex1int}} = {k} then {_rho_sql(f'substring({md5}, 2, 31)')} "
        f"else 0 end)"
    )


def _spark_hex1int(url: str) -> str:
    return f"cast(conv(substring(md5({url}), 1, 1), 16, 10) as int)"


def _duckdb_hex1int(url: str) -> str:
    return f"cast(('0x' || substring(md5({url}), 1, 1))::bigint as int)"


def init_sketches(vertices: DataFrame, url_col: str = "url") -> DataFrame:
    """One row per vertex: url, r0..r15 (the singleton-set sketch)."""
    exprs = [url_col] + [
        F.expr(
            _init_register_sql(url_col, k).format(hex1int=_spark_hex1int(url_col))
        ).alias(f"r{k}")
        for k in range(M)
    ]
    return vertices.select(*exprs)


def _estimate_sql(prefix: str = "", rounded: bool = True) -> str:
    """HLL-84 estimate over columns {prefix}r0..r15 as one fixed-order
    expression — the string is engine-portable (Spark SQL == DuckDB), so
    both sides evaluate the identical operation sequence. `rounded=False`
    is for folds that accumulate several estimates: per-term 6dp rounding
    would park /2- and /3-divided differences exactly on the 7th-decimal
    .5 boundary, where cross-engine decimal rounding diverges (HALF_UP on
    the shortest repr vs binary) — round ONCE at the end instead (the
    module-wide convention, cf. __spark_entry__'s money aggregates)."""
    s = " + ".join(f"pow(2.0, -{prefix}r{k})" for k in range(M))
    v = " + ".join(f"(case when {prefix}r{k} = 0 then 1 else 0 end)" for k in range(M))
    raw = f"({ALPHA_M} * {M * M} / ({s}))"
    est = (
        f"(case when {raw} <= {2.5 * M} and ({v}) > 0 "
        f"then {M} * ln({M} / cast(({v}) as double)) "
        f"else {raw} end)"
    )
    return f"round({est}, 6)" if rounded else est


def estimate_expr(rounded: bool = True) -> F.Column:
    """Spark Column form of _estimate_sql over columns r0..r15."""
    return F.expr(_estimate_sql("", rounded))


def sql_estimate(prefix: str = "", rounded: bool = True) -> str:
    """The DuckDB twin of estimate_expr()."""
    return _estimate_sql(prefix, rounded)


def _dst_partitioned_simple(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Simple directed edges, hash-partitioned by dst ONCE and lineage-
    truncated — every merge round joins the sketch on dst, and a
    localCheckpoint'ed plan keeps its outputPartitioning, so only the
    (n-sized) sketch side shuffles per round while the (m-sized) edge
    table never moves again (the same pre-partitioning contract the
    PageRank loop puts on weighted_edges)."""
    from ..ingest.edges import tuned_partitions

    simple = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    parts = tuned_partitions(
        simple.count(), spark.sparkContext.defaultParallelism
    )
    e = simple.repartition(parts, "dst").localCheckpoint(eager=True)
    simple.unpersist()
    return e


def _sketch_inputs(spark: SparkSession, edges: DataFrame | None, g):
    """Shared loop inputs for hyperball()/harmonic_centrality():
    (e, base_sketch, vertices_dim). Both key spaces use the SAME vertex
    set — endpoints of the self-loop-free simple edge table — so the
    dense-id and string paths produce identical outputs (a g.vertices
    entry whose only edges are self-loops is excluded in both).
    Raises on an empty simple graph (fail-fast, like
    build_graph_tables)."""
    if g is not None:
        from ..ingest.edges import simple_edges

        e = simple_edges(g, partition_col="dst_id").select(
            F.col("src_id").alias("src"), F.col("dst_id").alias("dst")
        )
        if e.isEmpty():
            raise ValueError("empty graph: no non-self-loop edges")
        vids = e.select(F.col("src").alias("id")).union(
            e.select(F.col("dst").alias("id"))
        ).distinct()
        reg_exprs = [
            F.expr(
                _init_register_sql("url", k).format(hex1int=_spark_hex1int("url"))
            ).alias(f"r{k}")
            for k in range(M)
        ]
        base = (
            g.vertices.join(vids, "id")
            .select(F.col("id").alias("_k"), *reg_exprs)
            .withColumnRenamed("_k", "url")
        )
        return e, base, g.vertices
    e = _dst_partitioned_simple(spark, edges)
    if e.isEmpty():
        raise ValueError("empty graph: no non-self-loop edges")
    verts = (
        e.select(F.col("src").alias("url"))
        .union(e.select(F.col("dst").alias("url")))
        .distinct()
    )
    return e, init_sketches(verts), None


@dataclass
class HyperBallResult:
    balls: DataFrame  # url, ball_est (double): estimated |B(v, t_final)|
    nf: list[float]  # N(t) = sum_v est|B(v,t)| for t = 0..t_final
    effective_diameter: float | None  # 90th-pct interpolated; None if t_max hit
    iterations: int
    converged: bool
    round_walls: list[float] | None = None  # seconds per merge round


def hyperball(
    spark: SparkSession,
    edges: DataFrame | None = None,
    t_max: int = 32,
    early_stop: bool = True,
    g=None,
) -> HyperBallResult:
    """Run HyperBall over the directed simple graph of `edges`
    (src, dst string columns). Convergence is detected on the global
    register sum — an integer that grows monotonically and is constant
    iff every sketch is at its fixpoint (all balls closed), so the test
    is exact and rides the same action that materializes the iteration.

    `early_stop=False` runs exactly t_max merge rounds with no
    per-round action (the fixed-depth mode the contract key uses —
    deterministic work, single final job).

    `g` (a GraphTables, overrides `edges`) runs the SAME loop on dense
    long ids: registers are still derived from md5(url) (so estimates
    are identical to the string path — tested), but every per-round
    shuffle moves 8-byte keys instead of url strings. Measured 2.1x at
    45M edges (BENCH.md); the production mode at corpus scale.

    Determinism note: `balls` (the per-vertex registers and estimates)
    is bit-exact — registers are integers, the estimate is one fixed
    expression over them. `nf` and `effective_diameter` are DIAGNOSTICS
    outside that contract: each nf value is an unordered F.sum over
    per-vertex rounded doubles, so the trailing ulps (and the
    interpolated diameter built from them) can jitter between
    runs/partitionings. No contract key reads them."""
    e, base, vertices_dim = _sketch_inputs(spark, edges, g)
    sketch = base.localCheckpoint(eager=True)

    nf = []
    if early_stop:
        first = sketch.agg(
            F.round(F.sum(estimate_expr()), 6).alias("n"),
            F.sum(sum(F.col(c) for c in _REG_COLS)).alias("regsum"),
        ).collect()[0]
        nf.append(float(first["n"]))
        prev_regsum = first["regsum"]

    iterations, converged = 0, False
    round_walls: list[float] = []
    for _ in range(t_max):
        t_start = time.monotonic()
        msgs = e.join(
            sketch.withColumnRenamed("url", "dst"), "dst"
        ).select(F.col("src").alias("url"), *_REG_COLS)
        merged = (
            sketch.unionByName(msgs)
            .groupBy("url")
            .agg(*[F.max(c).alias(c) for c in _REG_COLS])
        )
        sketch = merged.localCheckpoint(eager=True)
        round_walls.append(time.monotonic() - t_start)
        iterations += 1
        if not early_stop:
            continue
        row = sketch.agg(
            F.round(F.sum(estimate_expr()), 6).alias("n"),
            F.sum(sum(F.col(c) for c in _REG_COLS)).alias("regsum"),
        ).collect()[0]
        nf.append(float(row["n"]))
        if row["regsum"] == prev_regsum:
            converged = True
            nf.pop()  # the stable round added no information
            iterations -= 1
            break
        prev_regsum = row["regsum"]

    eff_d = None
    if converged and len(nf) >= 1:
        target = 0.9 * nf[-1]
        for t, n in enumerate(nf):
            if n >= target:
                if t == 0 or nf[t] == nf[t - 1]:
                    eff_d = float(t)
                else:
                    eff_d = (t - 1) + (target - nf[t - 1]) / (nf[t] - nf[t - 1])
                break

    balls = sketch.select("url", estimate_expr().alias("ball_est"))
    if vertices_dim is not None:
        # translate dense ids back to url space on the (n-sized) output
        balls = (
            balls.withColumnRenamed("url", "id")
            .join(vertices_dim, "id")
            .select("url", "ball_est")
        )
    return HyperBallResult(
        balls=balls,
        nf=nf,
        effective_diameter=eff_d,
        iterations=iterations,
        converged=converged,
        round_walls=round_walls[:iterations],
    )


def harmonic_centrality(
    spark: SparkSession,
    edges: DataFrame | None = None,
    t_max: int = 3,
    g=None,
) -> DataFrame:
    """HyperBall harmonic-centrality estimates — the paper's headline
    application (Boldi & Vigna 2013 §3): H(v) = sum over reachable w of
    1/d(v,w), estimated from per-round ball growth as

        H(v) ~= sum_{t=1..t_max} ( est|B(v,t)| - est|B(v,t-1)| ) / t .

    The per-round estimates use the UNROUNDED estimator (see
    _estimate_sql on why per-term rounding breaks cross-engine ties),
    the running sum folds left-to-right with the same literal divisors,
    and only the final sum is rounded, so the DuckDB twin
    (sql_harmonic_centrality) reproduces the output despite the float
    accumulation. The h/prev_est scalars
    ride the register groupBy as max-of-one-non-null (messages carry
    nulls), keeping the loop at one join + one combinable aggregate per
    round — the engine's standard iteration shape.

    Output: url, harmonic (double, 6dp). Fixed depth: run t_max rounds,
    no early stop (balls past t_max contribute (e_t - e_{t-1})/t ~ 0
    once growth stops, and fixed work keeps the contract deterministic).

    `g` (GraphTables, overrides `edges`): dense-id loop, same 2.1x as
    hyperball(g=) — registers from md5(url), identical output (tested).
    """
    e, base, vertices_dim = _sketch_inputs(spark, edges, g)
    sketch = (
        base.withColumn("h", F.lit(0.0))
        .withColumn("prev_est", estimate_expr(rounded=False))
        .localCheckpoint(eager=True)
    )
    for t in range(1, t_max + 1):
        msgs = (
            e.join(sketch.withColumnRenamed("url", "dst"), "dst")
            .select(F.col("src").alias("url"), *_REG_COLS)
            .withColumn("h", F.lit(None).cast("double"))
            .withColumn("prev_est", F.lit(None).cast("double"))
        )
        merged = (
            sketch.unionByName(msgs)
            .groupBy("url")
            .agg(
                *[F.max(c).alias(c) for c in _REG_COLS],
                F.max("h").alias("h"),
                F.max("prev_est").alias("prev_est"),
            )
        )
        stepped = (
            merged.withColumn("est", estimate_expr(rounded=False))
            .withColumn(
                "h", F.col("h") + (F.col("est") - F.col("prev_est")) / F.lit(float(t))
            )
            .withColumn("prev_est", F.col("est"))
            .drop("est")
        )
        sketch = stepped.localCheckpoint(eager=True)
    out = sketch.select("url", F.round("h", 6).alias("harmonic"))
    if vertices_dim is not None:
        out = (
            out.withColumnRenamed("url", "id")
            .join(vertices_dim, "id")
            .select("url", "harmonic")
        )
    return out


def sql_harmonic_centrality(t_max: int, edges_rel: str = "edges") -> str:
    """DuckDB oracle for harmonic_centrality at fixed depth: min-hop
    distances by recursive CTE, per-depth register maxima as conditional
    aggregates (dist <= t), the same per-depth estimator, and the same
    left-to-right harmonic fold."""
    rho = _rho_sql("substring(md5(w), 2, 31)")
    regsets = []
    for t in range(t_max + 1):
        regsets.append(
            ", ".join(
                f"max(case when dist <= {t} and {_duckdb_hex1int('w')} = {k} "
                f"then {rho} else 0 end) as t{t}_r{k}"
                for k in range(M)
            )
        )
    ests = ", ".join(
        f"{sql_estimate(f't{t}_', rounded=False)} as e{t}"
        for t in range(t_max + 1)
    )
    fold = " + ".join(f"(e{t} - e{t - 1}) / {float(t)}" for t in range(1, t_max + 1))
    return f"""
simple as (select distinct src, dst from {edges_rel} where src <> dst),
dists as (
    with recursive reach(v, w, d) as (
        select src as v, src as w, 0 from simple
        union
        select dst as v, dst as w, 0 from simple
        union
        select r.v, s.dst as w, r.d + 1
        from reach r join simple s on s.src = r.w
        where r.d < {t_max}
    )
    select v, w, min(d) as dist from reach group by 1, 2
),
sk as (select v as url, {', '.join(regsets)} from dists group by v),
es as (select url, {ests} from sk)
select url, round({fold}, 6) as harmonic from es"""


def sql_hyperball_balls(t: int, edges_rel: str = "edges") -> str:
    """DuckDB oracle for the fixed-depth contract key: exact t-hop
    reachability by recursive CTE, then the same register maxima and
    the same estimator expression as the Spark path (iterated max over
    neighbors == max over the ball, so the two agree bit-for-bit)."""
    rho = _rho_sql("substring(md5(w), 2, 31)")
    regs = ", ".join(
        f"max(case when {_duckdb_hex1int('w')} = {k} then {rho} else 0 end) as r{k}"
        for k in range(M)
    )
    return f"""
simple as (select distinct src, dst from {edges_rel} where src <> dst),
ball as (
    with recursive reach(v, w, d) as (
        select src as v, src as w, 0 from simple
        union
        select dst as v, dst as w, 0 from simple
        union
        select r.v, s.dst as w, r.d + 1
        from reach r join simple s on s.src = r.w
        where r.d < {t}
    )
    select distinct v, w from reach
),
sk as (select v as url, {regs} from ball group by v)
select url, {sql_estimate()} as ball_est from sk"""
