"""Deterministic random walks — DeepWalk-style training-corpus
generation over the link graph (Perozzi et al. 2014: truncated random
walks as "sentences" for skip-gram embedding training).

Determinism instead of RNG: step t of walk (start, w) standing at
vertex v moves to neighbor number

    H(v | start | w | t)  mod  outdeg(v)

where H is the engine's portable 60-bit md5 hash (text/analysis.py:
hash60_expr — bit-identical in DuckDB, so the contract oracle replays
the exact walks) and neighbors are ranked by destination url. Same
distribution properties as seeded pseudo-randomness, plus exact
reproducibility across engines, partitionings, and reruns — which is
what a training pipeline actually wants from its corpus generator.

Walks stop early at dangling vertices (no out-edges), like the
truncated walks in the paper.

Execution shape, per step (no Python in the hot path, no fixpoint —
the step count is the literal walk length):

    state(cur) JOIN outdeg ON cur          -> idx = H(...) % outdeg
    ... JOIN adj ON (cur, idx)             -> next vertex

Both are plain equi-joins: the first shuffles walkers to their current
vertex (skew = vertex popularity, partial-aggregation-free but the
(src, idx) second join spreads a hub's walkers across its neighbor
index space). Lineage is cut per step (localCheckpoint) so the plan
stays flat for long walks.

Two key spaces, one corpus: pass `g=GraphTables` (the default for the
contract keys) to run the step joins on dense 8-byte long ids — the
same change that bought HyperBall 2.1x (BENCH.md) — with urls
appearing only as carried payload (`start`, needed by the hash and the
walk_id) and inside the once-built adjacency tables; walker positions
are translated back to urls in ONE id-keyed join at emit. Pass raw
(src, dst) url `edges` for the portable string-space loop the DuckDB
oracle replays literally. Both paths consume the identical hash inputs
(url strings) and the identical dst-url neighbor ranking, so the
corpora are row-identical (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..ingest.edges import GraphTables, simple_edges
from ..text.analysis import hash60_expr, sql_hash60


def _adjacency(edges: DataFrame) -> DataFrame:
    """(src, dst, idx, outdeg): neighbors deduplicated and ranked by
    dst; idx in [0, outdeg)."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    w = Window.partitionBy("src").orderBy("dst")
    return e.select(
        "src",
        "dst",
        (F.row_number().over(w) - 1).alias("idx"),
        F.count("*").over(Window.partitionBy("src")).alias("outdeg"),
    )


def random_walks(
    edges: DataFrame | None = None,
    walk_length: int = 4,
    walks_per_vertex: int = 2,
    *,
    g: GraphTables | None = None,
) -> DataFrame:
    """`edges`: (src, dst) string urls — or `g`: a GraphTables for the
    dense-id loop (see module docstring; identical corpus). Returns
    (walk_id, step, url) long-format walk corpus: walk_id = start ||
    '#' || w, step 0 is the start vertex, early-stopped at dangling
    vertices."""
    if (edges is None) == (g is None):
        raise ValueError("pass exactly one of `edges` or `g`")
    if g is not None:
        return _random_walks_dense(g, walk_length, walks_per_vertex)
    adj = _adjacency(edges).localCheckpoint(eager=True)
    deg = adj.select("src", "outdeg").distinct()

    verts = (
        edges.select(F.col("src").alias("url"))
        .union(edges.select(F.col("dst").alias("url")))
        .distinct()
    )
    state = verts.crossJoin(
        F.broadcast(
            verts.sparkSession.range(walks_per_vertex).select(
                F.col("id").cast("int").alias("w")
            )
        )
    ).select(F.col("url").alias("start"), "w", F.col("url").alias("cur"))

    out = state.select(
        "start", "w", F.lit(0).alias("step"), F.col("cur").alias("url")
    )
    for t in range(1, walk_length + 1):
        choice = F.pmod(
            hash60_expr(
                F.concat_ws(
                    "|",
                    F.col("cur"),
                    F.col("start"),
                    F.col("w").cast("string"),
                    F.lit(str(t)),
                )
            ),
            F.col("outdeg"),
        )
        state = (
            state.join(deg, state.cur == deg.src)  # dangling cur drops: walk ends
            .select("start", "w", "cur", choice.alias("idx"))
            .join(
                adj.select(F.col("src").alias("cur"), "idx", "dst"),
                ["cur", "idx"],
            )
            .select("start", "w", F.col("dst").alias("cur"))
            .localCheckpoint(eager=True)
        )
        out = out.union(
            state.select("start", "w", F.lit(t).alias("step"), F.col("cur").alias("url"))
        )
    return out.select(
        F.concat_ws("#", F.col("start"), F.col("w").cast("string")).alias(
            "walk_id"
        ),
        "step",
        "url",
    )


def _dense_adjacency(g: GraphTables) -> tuple[DataFrame, DataFrame]:
    """The dense-id walk tables shared by _random_walks_dense and
    _node2vec_walks_dense: adj = (src_id, dst_id, idx, outdeg) with the
    neighbor ranking by destination URL (string-path parity — the url
    join happens here once, then drops out of the loops) and deg =
    (src_id, outdeg, cur_url) surfacing the current vertex's url (the
    hash input must be the url to replay the string path
    bit-for-bit)."""
    v = g.vertices
    e = simple_edges(g)  # (src_id, dst_id), deduped, no self-loops
    wnd = Window.partitionBy("src_id").orderBy("dst_url")
    adj = (
        e.join(
            v.select(F.col("id").alias("dst_id"), F.col("url").alias("dst_url")),
            "dst_id",
        )
        .select(
            "src_id",
            "dst_id",
            (F.row_number().over(wnd) - 1).alias("idx"),
            F.count("*").over(Window.partitionBy("src_id")).alias("outdeg"),
        )
        .drop("dst_url")
        .localCheckpoint(eager=True)
    )
    deg = (
        adj.select("src_id", "outdeg")
        .distinct()
        .join(v.select(F.col("id").alias("src_id"), F.col("url").alias("cur_url")), "src_id")
        .localCheckpoint(eager=True)
    )
    return adj, deg


def _random_walks_dense(
    g: GraphTables,
    walk_length: int,
    walks_per_vertex: int,
) -> DataFrame:
    """The dense-id twin of the string loop: per-step join keys are
    8-byte longs (cur_id, then (cur_id, idx)); urls ride along only
    where the semantics need them (see _dense_adjacency). Walker
    positions stay ids until a single vertices join at emit."""
    v = g.vertices
    adj, deg = _dense_adjacency(g)

    state = v.crossJoin(
        F.broadcast(
            v.sparkSession.range(walks_per_vertex).select(
                F.col("id").cast("int").alias("w")
            )
        )
    ).select(F.col("url").alias("start"), "w", F.col("id").alias("cur_id"))

    out = state.select("start", "w", F.lit(0).alias("step"), "cur_id")
    for t in range(1, walk_length + 1):
        choice = F.pmod(
            hash60_expr(
                F.concat_ws(
                    "|",
                    F.col("cur_url"),
                    F.col("start"),
                    F.col("w").cast("string"),
                    F.lit(str(t)),
                )
            ),
            F.col("outdeg"),
        )
        state = (
            state.join(deg, state.cur_id == deg.src_id)  # dangling cur drops
            .select("start", "w", "cur_id", choice.alias("idx"))
            .join(
                adj.select(F.col("src_id").alias("cur_id"), "idx", "dst_id"),
                ["cur_id", "idx"],
            )
            .select("start", "w", F.col("dst_id").alias("cur_id"))
            .localCheckpoint(eager=True)
        )
        out = out.union(state.select("start", "w", F.lit(t).alias("step"), "cur_id"))
    return out.join(v.select(F.col("id").alias("cur_id"), "url"), "cur_id").select(
        F.concat_ws("#", F.col("start"), F.col("w").cast("string")).alias("walk_id"),
        "step",
        "url",
    )


def _sql_walk_ctes(
    walk_length: int = 4, walks_per_vertex: int = 2, reverse: bool = False
) -> list[str]:
    """The s0..sN step CTEs shared by sql_random_walks and
    sql_ppr_from_walks. reverse=True walks the transposed graph
    (IN-links) — the corpus sql_simrank_mc replays."""
    base = (
        "select distinct dst as src, src as dst from edges where src <> dst"
        if reverse
        else "select distinct src, dst from edges where src <> dst"
    )
    walks = ", ".join(f"({w})" for w in range(walks_per_vertex))
    parts = [
        f"""adj as (
            select src, dst,
                   row_number() over (partition by src order by dst) - 1 as idx,
                   count(*) over (partition by src) as outdeg
            from ({base})
        ),
        deg as (select distinct src, outdeg from adj),
        s0 as (
            select url as start, w, url as cur
            from vertices cross join (values {walks}) t(w)
        )"""
    ]
    for t in range(1, walk_length + 1):
        h = sql_hash60(
            f"concat_ws('|', s.cur, s.start, s.w::varchar, '{t}')"
        )
        parts.append(
            f"""s{t} as (
            select s.start, s.w, a.dst as cur
            from s{t - 1} s
            join deg d on d.src = s.cur
            join adj a on a.src = s.cur and a.idx = ({h}) % d.outdeg
        )"""
        )
    return parts


def sql_random_walks(
    walk_length: int = 4, walks_per_vertex: int = 2
) -> str:
    """DuckDB twin over the `edges`/`vertices` CTEs (unrolled — one CTE
    per step), replaying the identical md5-derived choices."""
    parts = _sql_walk_ctes(walk_length, walks_per_vertex)
    union = "\nunion all\n".join(
        f"select start || '#' || w::varchar as walk_id, {t} as step, cur as url from s{t}"
        for t in range(walk_length + 1)
    )
    return ",\n".join(parts) + "\n" + union


def step_weights(
    walk_length: int, walks_per_vertex: int, alpha: float
) -> list[float]:
    """(1-alpha) * alpha^t / walks_per_vertex per step, computed ONCE in
    python and inlined as decimal literals on both engines — shortest
    round-trip repr parses to the identical double in Spark and DuckDB,
    so the cross-engine pow()-ulp hazard never arises."""
    return [
        (1.0 - alpha) * alpha**t / walks_per_vertex
        for t in range(walk_length + 1)
    ]


def ppr_from_walks(
    walks: DataFrame,
    walk_length: int = 4,
    walks_per_vertex: int = 2,
    alpha: float = 0.85,
) -> DataFrame:
    """Monte-Carlo personalized PageRank estimates from the
    deterministic walk corpus (Fogaras et al. 2005 "Towards Scaling
    Fully Personalized PageRank": the power series PPR_s = (1-a) *
    sum_t a^t P^t e_s estimated by per-step visit frequencies).

        ppr_est(seed, u) = sum over walk rows (seed, t, u) of
                           (1-a) * a^t / walks_per_vertex

    Walks absorb at dangling vertices (the corpus early-stops), so the
    truncated-series mass of dead walks is dropped rather than
    teleported — documented estimator semantics, matching the walk
    generator. One groupBy with a combinable sum over a corpus that is
    already O(n * walks * length) rows: the fully-distributed shape for
    "PPR for EVERY seed at once", which no power-iteration formulation
    can do in one pass at web scale.

    Output: seed, url, ppr_est (double, 6dp; round-once convention).

    Rounding caveat: with wpv a power of two, alpha = 0.5 makes every
    step weight an exact 6-decimal binary value ((1/2)^(t+2) for
    wpv=2, L<=4), so sums are exact and the 6dp round is an identity —
    bit-exact across Spark/DuckDB/python. Short-decimal alphas like
    0.85 put single-visit sums EXACTLY on the 7th-decimal .5 boundary
    (0.15*0.85^2/2 = 0.0541875), where engines' decimal rounding
    disagrees — the contract key therefore pins alpha = 0.5.
    """
    wts = step_weights(walk_length, walks_per_vertex, alpha)
    wgt = F.array(*[F.lit(w) for w in wts])[F.col("step")]
    # seed = walk_id minus its trailing '#<w>' suffix — anchored at the
    # END, so a start url that itself contains '#' (fragments) survives
    # intact (splitting at the FIRST '#' would truncate it and merge
    # mass across distinct seeds sharing a prefix)
    return (
        walks.select(
            F.regexp_replace(F.col("walk_id"), r"#\d+$", "").alias("seed"),
            "url",
            wgt.alias("wgt"),
        )
        .groupBy("seed", "url")
        .agg(F.round(F.sum("wgt"), 6).alias("ppr_est"))
    )


def sql_ppr_from_walks(
    walk_length: int = 4,
    walks_per_vertex: int = 2,
    alpha: float = 0.85,
) -> str:
    """DuckDB twin of ppr_from_walks over the same step CTEs, same
    per-step decimal literals, same round-once."""
    parts = _sql_walk_ctes(walk_length, walks_per_vertex)
    wts = step_weights(walk_length, walks_per_vertex, alpha)
    union = "\nunion all\n".join(
        f"select start as seed, cur as url, {wts[t]!r} as wgt from s{t}"
        for t in range(walk_length + 1)
    )
    body = ",\n".join(parts) + f",\nvisits as (\n{union}\n)"
    return (
        f"{body}\nselect seed, url, round(sum(wgt), 6) as ppr_est "
        f"from visits group by 1, 2"
    )


def node2vec_walks(
    edges: DataFrame | None = None,
    walk_length: int = 4,
    walks_per_vertex: int = 2,
    return_w: int = 1,
    common_w: int = 2,
    far_w: int = 1,
    *,
    g: GraphTables | None = None,
) -> DataFrame:
    """Second-order biased walks (Grover & Leskovec, KDD 2016 —
    node2vec): standing at `cur` having arrived from `prev`, each
    out-neighbor x of cur gets the paper's search bias as an INTEGER
    weight (the repo's exact-arithmetic convention; the paper's
    1/p, 1, 1/q correspond to return_w : common_w : far_w after
    clearing denominators — the defaults (1, 2, 1) encode p = q = 2):

        return_w  if x == prev          (the return step, alpha = 1/p)
        common_w  if (prev, x) is an edge  (distance 1, alpha = 1)
        far_w     otherwise             (exploration, alpha = 1/q)

    Deterministic choice by cumulative-weight inverse sampling on the
    portable hash: r = H(cur|prev|start|w|t) mod sum(weights), pick
    the dst-ranked neighbor whose cumulative range contains r — the
    discrete analogue of the paper's alias sampling, bit-identical in
    the DuckDB twin. Step 1 has no prev and uses the first-order rule
    (H mod outdeg), exactly random_walks' step. Walks stop early at
    dangling vertices.

    Per step: one equi-join expanding each walker to cur's neighbor
    list, one left join flagging (prev, x) edges, one walker-keyed
    window for the cumulative pick — work is O(sum outdeg(cur) over
    walkers), the inherent node2vec cost (it reads every candidate's
    bias); no Python, no RNG state. Lineage cut per step.

    Returns (walk_id, step, url) long-format corpus like random_walks.

    Two key spaces, one corpus (the random_walks convention): pass
    `g=GraphTables` for the dense-id loop — 8-byte long join keys for
    the neighbor expansion, the (prev, x) edge flag, and the emit
    translation; url strings ride only as hash payload (`start`,
    `prev_url`, `cur_url`) and the cumulative ordering reuses the
    precomputed dst-url rank `idx`, so the corpus is row-identical to
    the string path (tested). Pass raw `edges` for the string loop the
    DuckDB oracle replays literally.
    """
    if min(return_w, common_w, far_w) < 1:
        raise ValueError("bias weights must be positive integers")
    if (edges is None) == (g is None):
        raise ValueError("pass exactly one of `edges` or `g`")
    if g is not None:
        return _node2vec_walks_dense(
            g, walk_length, walks_per_vertex, return_w, common_w, far_w
        )
    adj = _adjacency(edges).localCheckpoint(eager=True)
    deg = adj.select("src", "outdeg").distinct()
    pairs = adj.select(F.col("src").alias("prev"), F.col("dst").alias("x"))

    verts = (
        edges.select(F.col("src").alias("url"))
        .union(edges.select(F.col("dst").alias("url")))
        .distinct()
    )
    state = verts.crossJoin(
        F.broadcast(
            verts.sparkSession.range(walks_per_vertex).select(
                F.col("id").cast("int").alias("w")
            )
        )
    ).select(F.col("url").alias("start"), "w", F.col("url").alias("cur"))

    out = state.select(
        "start", "w", F.lit(0).alias("step"), F.col("cur").alias("url")
    )
    if walk_length >= 1:
        # step 1: first-order (no prev), random_walks' exact rule
        choice1 = F.pmod(
            hash60_expr(
                F.concat_ws(
                    "|", F.col("cur"), F.col("start"),
                    F.col("w").cast("string"), F.lit("1"),
                )
            ),
            F.col("outdeg"),
        )
        state = (
            state.join(deg, state.cur == deg.src)
            .select("start", "w", "cur", choice1.alias("idx"))
            .join(
                adj.select(F.col("src").alias("cur"), "idx", "dst"), ["cur", "idx"]
            )
            .select("start", "w", F.col("cur").alias("prev"), F.col("dst").alias("cur"))
            .localCheckpoint(eager=True)
        )
        out = out.union(
            state.select("start", "w", F.lit(1).alias("step"), F.col("cur").alias("url"))
        )

    wk = Window.partitionBy("start", "w")
    wcum = wk.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    for t in range(2, walk_length + 1):
        cand = (
            state.join(
                adj.select(
                    F.col("src").alias("cur"), F.col("dst").alias("x")
                ),
                "cur",
            )
            .join(pairs.select("prev", "x", F.lit(1).alias("pn")),
                  ["prev", "x"], "left")
            .select(
                "start", "w", "prev", "cur", "x",
                F.when(F.col("x") == F.col("prev"), F.lit(return_w))
                .when(F.col("pn").isNotNull(), F.lit(common_w))
                .otherwise(F.lit(far_w))
                .cast("long")
                .alias("wgt"),
            )
        )
        r = F.pmod(
            hash60_expr(
                F.concat_ws(
                    "|", F.col("cur"), F.col("prev"), F.col("start"),
                    F.col("w").cast("string"), F.lit(str(t)),
                )
            ),
            F.sum("wgt").over(wk),
        )
        cum = F.sum("wgt").over(wcum)
        state = (
            cand.select(
                "start", "w", "cur", "x", "wgt",
                cum.alias("cum"), r.alias("r"),
            )
            .filter(
                (F.col("r") >= F.col("cum") - F.col("wgt"))
                & (F.col("r") < F.col("cum"))
            )
            .select("start", "w", F.col("cur").alias("prev"), F.col("x").alias("cur"))
            .localCheckpoint(eager=True)
        )
        out = out.union(
            state.select(
                "start", "w", F.lit(t).alias("step"), F.col("cur").alias("url")
            )
        )
    return out.select(
        F.concat_ws("#", F.col("start"), F.col("w").cast("string")).alias("walk_id"),
        "step",
        "url",
    )


def _node2vec_walks_dense(
    g: GraphTables,
    walk_length: int,
    walks_per_vertex: int,
    return_w: int,
    common_w: int,
    far_w: int,
) -> DataFrame:
    """Dense-id twin of the string loop (see node2vec_walks docstring).
    The walker key stays (start, w) for the pick window — one walker,
    one position — while every graph-sized join (neighbor expansion on
    cur_id, (prev_id, x_id) edge flag, emit translation) runs on
    longs; `idx` (the dst-url rank baked into the adjacency once) is
    the cumulative order, so no url leaves the adjacency build."""
    v = g.vertices
    adj, deg = _dense_adjacency(g)
    pairs = adj.select(
        F.col("src_id").alias("prev_id"), F.col("dst_id").alias("x_id")
    )

    state = v.crossJoin(
        F.broadcast(
            v.sparkSession.range(walks_per_vertex).select(
                F.col("id").cast("int").alias("w")
            )
        )
    ).select(F.col("url").alias("start"), "w", F.col("id").alias("cur_id"))

    out = state.select("start", "w", F.lit(0).alias("step"), "cur_id")
    if walk_length >= 1:
        choice1 = F.pmod(
            hash60_expr(
                F.concat_ws(
                    "|", F.col("cur_url"), F.col("start"),
                    F.col("w").cast("string"), F.lit("1"),
                )
            ),
            F.col("outdeg"),
        )
        state = (
            state.join(deg, state.cur_id == deg.src_id)
            .select("start", "w", "cur_id", "cur_url", choice1.alias("idx"))
            .join(
                adj.select(F.col("src_id").alias("cur_id"), "idx", "dst_id"),
                ["cur_id", "idx"],
            )
            .select(
                "start", "w",
                F.col("cur_id").alias("prev_id"),
                F.col("cur_url").alias("prev_url"),
                F.col("dst_id").alias("cur_id"),
            )
            .localCheckpoint(eager=True)
        )
        out = out.union(state.select("start", "w", F.lit(1).alias("step"), "cur_id"))

    wk = Window.partitionBy("start", "w")
    wcum = wk.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    for t in range(2, walk_length + 1):
        cand = (
            state.join(deg.select("src_id", "cur_url"),
                       state.cur_id == F.col("src_id"))
            .drop("src_id")
            .join(
                adj.select(
                    F.col("src_id").alias("cur_id"),
                    F.col("dst_id").alias("x_id"),
                    "idx",
                ),
                "cur_id",
            )
            .join(pairs.select("prev_id", "x_id", F.lit(1).alias("pn")),
                  ["prev_id", "x_id"], "left")
            .select(
                "start", "w", "cur_id", "cur_url", "x_id", "idx",
                F.when(F.col("x_id") == F.col("prev_id"), F.lit(return_w))
                .when(F.col("pn").isNotNull(), F.lit(common_w))
                .otherwise(F.lit(far_w))
                .cast("long")
                .alias("wgt"),
                F.col("prev_url"),
            )
        )
        r = F.pmod(
            hash60_expr(
                F.concat_ws(
                    "|", F.col("cur_url"), F.col("prev_url"), F.col("start"),
                    F.col("w").cast("string"), F.lit(str(t)),
                )
            ),
            F.sum("wgt").over(wk),
        )
        cum = F.sum("wgt").over(wcum)
        state = (
            cand.select(
                "start", "w", "cur_id", "cur_url", "x_id", "wgt",
                cum.alias("cum"), r.alias("r"),
            )
            .filter(
                (F.col("r") >= F.col("cum") - F.col("wgt"))
                & (F.col("r") < F.col("cum"))
            )
            .select(
                "start", "w",
                F.col("cur_id").alias("prev_id"),
                F.col("cur_url").alias("prev_url"),
                F.col("x_id").alias("cur_id"),
            )
            .localCheckpoint(eager=True)
        )
        out = out.union(state.select("start", "w", F.lit(t).alias("step"), "cur_id"))
    return out.join(v.select(F.col("id").alias("cur_id"), "url"), "cur_id").select(
        F.concat_ws("#", F.col("start"), F.col("w").cast("string")).alias("walk_id"),
        "step",
        "url",
    )


def sql_node2vec_walks(
    walk_length: int = 4,
    walks_per_vertex: int = 2,
    return_w: int = 1,
    common_w: int = 2,
    far_w: int = 1,
) -> str:
    """DuckDB twin over the `edges`/`vertices` CTEs: identical
    first-order step 1, then per step the identical candidate
    expansion + bias weights + cumulative-pick windows."""
    walks = ", ".join(f"({w})" for w in range(walks_per_vertex))
    h1 = sql_hash60("concat_ws('|', s.cur, s.start, s.w::varchar, '1')")
    parts = [
        f"""adj as (
            select src, dst,
                   row_number() over (partition by src order by dst) - 1 as idx,
                   count(*) over (partition by src) as outdeg
            from (select distinct src, dst from edges where src <> dst)
        ),
        deg as (select distinct src, outdeg from adj),
        n0 as (
            select url as start, w, url as cur
            from vertices cross join (values {walks}) t(w)
        ),
        n1 as (
            select s.start, s.w, s.cur as prev, a.dst as cur
            from n0 s
            join deg d on d.src = s.cur
            join adj a on a.src = s.cur and a.idx = ({h1}) % d.outdeg
        )"""
    ]
    for t in range(2, walk_length + 1):
        h = sql_hash60(
            f"concat_ws('|', cur, prev, start, w::varchar, '{t}')"
        )
        parts.append(
            f"""n{t} as (
            select start, w, cur as prev, x as cur from (
                select c.*,
                       sum(wgt) over (partition by start, w order by x
                                      rows unbounded preceding) as cum,
                       ({h}) % (sum(wgt) over (partition by start, w)) as r
                from (
                    select s.start, s.w, s.prev, s.cur, a.dst as x,
                           case when a.dst = s.prev then {int(return_w)}
                                when p.src is not null then {int(common_w)}
                                else {int(far_w)} end::bigint as wgt
                    from n{t - 1} s
                    join adj a on a.src = s.cur
                    left join (select distinct src, dst from adj) p
                           on p.src = s.prev and p.dst = a.dst
                ) c
            ) where r >= cum - wgt and r < cum
        )"""
        )
    union = "\nunion all\n".join(
        ["select start || '#' || w::varchar as walk_id, 0 as step, cur as url from n0"]
        + [
            f"select start || '#' || w::varchar as walk_id, {t} as step, cur as url from n{t}"
            for t in range(1, walk_length + 1)
        ]
    )
    return ",\n".join(parts) + "\n" + union


def walk_ppmi(
    corpus: DataFrame,
    context: int = 2,
    min_count: int = 2,
) -> DataFrame:
    """Skip-gram co-occurrence + PPMI over a walk corpus (walk_id,
    step, url) — the word2vec-as-implicit-matrix-factorization stage
    (Levy & Goldberg, NeurIPS 2014: skip-gram with negative sampling
    factorizes the shifted PPMI matrix; DeepWalk/node2vec inherit this
    through their corpora). For every center position i, every context
    position j with 0 < |i - j| <= context in the same walk yields a
    directed (x, y) pair; then

        ppmi(x, y) = max(0, ln(n_xy * N / (n_x * n_y)))

    over the pair counts. Counts and marginals are exact integers —
    the only float is the final single ln, rounded once to 6 dp (the
    repo's cross-engine float convention, as in bigram_logloss).

    Shape: one walk_id-keyed self-join with the step-window predicate
    (fan-out <= 2*context per row, linear in corpus size), one
    map-combinable pair count, two marginal joins, one 1-row scalar
    crossJoin for N. Returns (x, y, n_pairs, ppmi), pairs with
    n_pairs >= min_count.
    """
    a = corpus.select("walk_id", F.col("step").alias("si"), F.col("url").alias("x"))
    b = corpus.select("walk_id", F.col("step").alias("sj"), F.col("url").alias("y"))
    d = F.col("sj") - F.col("si")
    pairs = (
        a.join(b, "walk_id")
        .filter((d != 0) & (d <= context) & (d >= -context))
        .select("x", "y")
    )
    # the heavy self-join runs ONCE: marginals and the total are exact
    # sums over the materialized pair-count table (n_x = Σ_y n_xy etc.)
    nxy = (
        pairs.groupBy("x", "y")
        .agg(F.count("*").alias("n_pairs"))
        .localCheckpoint(eager=True)
    )
    nx = nxy.groupBy("x").agg(F.sum("n_pairs").alias("n_x"))
    ny = nxy.groupBy("y").agg(F.sum("n_pairs").alias("n_y"))
    ntot = nxy.agg(F.sum("n_pairs").alias("n_tot"))
    return (
        nxy.filter(F.col("n_pairs") >= min_count)
        .join(nx, "x")
        .join(ny, "y")
        .crossJoin(ntot)
        .select(
            "x", "y", "n_pairs",
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.log(
                        F.col("n_pairs").cast("double")
                        * F.col("n_tot").cast("double")
                        / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
                    ),
                ),
                6,
            ).alias("ppmi"),
        )
    )


def meeting_weights(walk_length: int, c: float) -> list[float]:
    """c^t per step, computed ONCE in python and inlined as literals on
    both engines (the step_weights convention — no cross-engine pow()
    in the hot path). c = 0.5 (the contract pin) makes every weight an
    exact binary fraction, so the estimator sums are bit-exact."""
    return [c**t for t in range(walk_length + 1)]


def simrank_mc(
    edges: DataFrame | None = None,
    walk_length: int = 4,
    walks_per_vertex: int = 2,
    c: float = 0.5,
    *,
    g: GraphTables | None = None,
) -> DataFrame:
    """Monte-Carlo SimRank via first-meeting times of reverse walks
    (Jeh & Widom, KDD 2002 define SimRank; Fogaras & Racz, WWW 2005
    "Scaling link-based similarity search" give the estimator:
    s(a, b) = E[c^tau] where tau is the first time two independent
    uniform reverse walks from a and b occupy the same vertex at the
    same step, 0 if they never meet).

    The walks are the engine's deterministic hash-walks (module
    docstring) on the TRANSPOSED graph — SimRank recurses over
    in-neighbors — so the corpus, and therefore the estimate, is
    bit-reproducible across engines, partitionings and reruns; the
    DuckDB twin replays it exactly. tau >= 1 always (step 0 has the
    two walks at their distinct start vertices).

        s_hat(a, b) = (1 / wpv^2) * sum over walk pairs (wa, wb) of
                      c^tau(wa, wb)

    Execution shape: walk corpus O(n * wpv * L) rows; ONE self-join on
    (step, vertex) — meetings — then two combinable aggregations
    (min step per walk pair, sum per vertex pair). Never all-pairs:
    output is exactly the pairs whose walks met, the natural sparse
    support of the estimator. Skew note: the (step, vertex) join
    fans out quadratically in the number of reverse walks AT a vertex
    at a step, i.e. popular (high in-degree) pages attract meetings —
    that concentration IS the signal SimRank measures, and the cell
    population is bounded by n * wpv per step with wpv a small
    constant; at 100 TB the same df-cap discipline as jaccard_pairs
    can bound a pathological cell, biasing only the capped cell's
    pairs (not applied here — the estimator stays unbiased).

    Output: (a, b, simrank) with a < b, simrank rounded once to 6 dp
    (exact for c = 0.5, walk_length <= 4, wpv a power of two: every
    c^tau / wpv^2 term is a 6-dp-exact binary fraction).
    """
    if (edges is None) == (g is None):
        raise ValueError("pass exactly one of `edges` or `g`")
    if g is not None:
        from dataclasses import replace

        rev = replace(
            g,
            weighted_edges=g.weighted_edges.select(
                F.col("dst_id").alias("src_id"),
                F.col("src_id").alias("dst_id"),
            ),
        )
        corpus = random_walks(g=rev, walk_length=walk_length,
                              walks_per_vertex=walks_per_vertex)
    else:
        corpus = random_walks(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            walk_length=walk_length,
            walks_per_vertex=walks_per_vertex,
        )
    # (start, w) back out of walk_id — the ppr_from_walks convention
    # (suffix-anchored so '#' inside urls survives)
    pos = corpus.select(
        F.regexp_replace(F.col("walk_id"), r"#\d+$", "").alias("v"),
        F.regexp_extract(F.col("walk_id"), r"#(\d+)$", 1).cast("int").alias("w"),
        "step",
        "url",
    ).localCheckpoint(eager=True)
    a = pos.select(
        F.col("v").alias("a"), F.col("w").alias("wa"), "step", "url"
    )
    b = pos.select(
        F.col("v").alias("b"), F.col("w").alias("wb"), "step", "url"
    )
    first = (
        a.join(b, ["step", "url"])
        .filter((F.col("a") < F.col("b")) & (F.col("step") >= 1))
        .groupBy("a", "wa", "b", "wb")
        .agg(F.min("step").alias("tau"))
    )
    wts = meeting_weights(walk_length, c)
    contrib = F.array(*[F.lit(x) for x in wts])[F.col("tau")]
    return first.groupBy("a", "b").agg(
        F.round(
            F.sum(contrib) / F.lit(float(walks_per_vertex**2)), 6
        ).alias("simrank")
    )


def sql_simrank_mc(
    walk_length: int = 4,
    walks_per_vertex: int = 2,
    c: float = 0.5,
) -> str:
    """DuckDB twin: the reverse-walk CTEs replayed literally, the
    identical (step, vertex) meeting join, min-step first meetings,
    and the identical inlined c^tau literals + round-once."""
    parts = _sql_walk_ctes(walk_length, walks_per_vertex, reverse=True)
    union = "\nunion all\n".join(
        f"select start, w, {t} as step, cur from s{t}"
        for t in range(1, walk_length + 1)
    )
    wts = meeting_weights(walk_length, c)
    case = " ".join(
        f"when {t} then {wts[t]!r}" for t in range(1, walk_length + 1)
    )
    return (
        ",\n".join(parts)
        + f""",
    pos as (\n{union}\n),
    meets as (
        select pa.start as a, pa.w as wa, pb.start as b, pb.w as wb,
               min(pa.step) as tau
        from pos pa join pos pb
          on pa.step = pb.step and pa.cur = pb.cur
        where pa.start < pb.start
        group by 1, 2, 3, 4
    )
    select a, b,
           round(sum(case tau {case} end) / {float(walks_per_vertex**2)!r}, 6)
               as simrank
    from meets group by 1, 2"""
    )


def sql_walk_ppmi(
    walk_length: int = 4,
    walks_per_vertex: int = 2,
    context: int = 2,
    min_count: int = 2,
) -> str:
    """DuckDB twin: the replayed walk-corpus CTEs piped through the
    identical integer pair counting and the identical round-once ln."""
    parts = _sql_walk_ctes(walk_length, walks_per_vertex)
    union = "\nunion all\n".join(
        f"select start || '#' || w::varchar as walk_id, {t} as step, cur as url from s{t}"
        for t in range(walk_length + 1)
    )
    return (
        ",\n".join(parts)
        + f""",
    corpus as (\n{union}\n),
    pp as (
        select a.url as x, b.url as y
        from corpus a join corpus b on a.walk_id = b.walk_id
        where b.step - a.step <> 0
          and b.step - a.step <= {int(context)}
          and b.step - a.step >= -{int(context)}
    ),
    pxy as materialized (select x, y, count(*) as n_pairs from pp group by 1, 2),
    px as (select x, sum(n_pairs) as n_x from pxy group by 1),
    py as (select y, sum(n_pairs) as n_y from pxy group by 1),
    pn as (select sum(n_pairs) as n_tot from pxy)
    select x, y, n_pairs,
           round(greatest(0.0,
               ln(n_pairs::double * n_tot::double
                  / (n_x::double * n_y::double))), 6) as ppmi
    from pxy join px using (x) join py using (y) cross join pn
    where n_pairs >= {int(min_count)}"""
    )
